package graft.tools

import org.apache.spark.sql.functions._

/** Times vs_hybrid's building blocks in isolation (noop-style counts)
  * to attribute its wall: scan+tokenize, embed, tf channel, full. */
object HybridCostProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, "graft-hybrid-cost")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[cost] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s rows $n")
    }
    val docs = graft.Tables.spread(graft.Tables.load(spark, sf, "documents"))
    // warm
    docs.count(); docs.count()
    time("scan only")(docs.select($"doc_id").count())
    time("scan+spread+text")(docs.select($"doc_id", $"text").count())
    time("tokenize size")(docs.select(size(tokens($"text")).as("s")).agg(sum($"s")).count())
    time("tokenize size (2nd)")(docs.select(size(tokens($"text")).as("s")).agg(sum($"s")).count())
    time("explode tokens")(docs.select(explode(tokens($"text"))).count())
    time("embedText")(docs.select(graft.operators.VectorStore.embedText($"text")).count())
    time("embed+norm+crossjoin topk") {
      val corpus = docs.filter($"doc_id" >= 10).select($"doc_id".as("n_id"),
        graft.operators.VectorStore.embedText($"text").as("v"))
        .withColumn("nrm", graft.functions.VectorFunctions.l2Norm($"v"))
      val q = docs.filter($"doc_id" < 10).select($"doc_id".as("q_id"),
        graft.operators.VectorStore.embedText($"text").as("qv"))
        .withColumn("qnrm", graft.functions.VectorFunctions.l2Norm($"qv"))
      corpus.crossJoin(broadcast(q))
        .select($"q_id", $"n_id", round(graft.functions.VectorFunctions.cosine(
          $"qv", $"v", $"qnrm", $"nrm"), 4).as("sim_r"))
        .groupBy($"q_id")
        .agg(graft.functions.expressions.TopKByScore($"sim_r", $"n_id", 20).as("top"))
        .count()
    }
    time("tf channel") {
      val queries = docs.filter($"doc_id" < 10)
      val qterms = queries.select(explode(array_distinct(tokens($"text"))).as("term"))
      docs.filter($"doc_id" >= 10)
        .select($"doc_id", size(tokens($"text")).cast("long").as("dl"),
          explode(tokens($"text")).as("term"))
        .join(broadcast(qterms.distinct()), Seq("term"))
        .groupBy($"doc_id", $"term")
        .agg(count(lit(1)).as("tf"), first($"dl").as("dl"))
        .count()
    }
    time("full vs_hybrid")(graft.operators.HybridSearch.hybrid(spark, sf).count())
    time("full vs_hybrid (2nd)")(graft.operators.HybridSearch.hybrid(spark, sf).count())
    spark.stop()
  }
}
