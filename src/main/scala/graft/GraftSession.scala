package graft

import org.apache.spark.sql.SparkSession

/** Session factory used by specs and standalone runs.
  *
  * Scale posture: shuffle partitions match local cores here; on a real
  * cluster the same code relies on AQE (enabled) to coalesce/split
  * post-shuffle partitions, so no operator hard-codes partition counts.
  */
object GraftSession {
  def local(cores: Int = 4, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // reliable-checkpoint files (Tables.materialize on a session
      // with a checkpoint dir) are only GC-reclaimed with this on;
      // the default (false) leaks them for the session's lifetime
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    quietCheckpointNoise()
    spark
  }

  /** The bounded-loop release pattern (Tables.materialize + release)
    * makes Spark WARN once per freed local-checkpoint RDD ("lineage
    * has been truncated and cannot be recomputed") — expected and
    * harmless here, but dozens per run bury real warnings. RDD-class
    * loggers go to ERROR; everything else stays at WARN. */
  def quietCheckpointNoise(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
}
