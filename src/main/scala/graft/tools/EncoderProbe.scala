package graft.tools

import org.apache.spark.sql.functions._

/** Fitted-encoder scale probe (round 11): fit the adaptive-V LSA
  * channel (dual kernel path past DriverGramVocab) and the SGNS
  * word2vec channel on a real sf1-scale corpus and time the fits plus
  * a warm in-plan encode pass — evidence that the round's encoder
  * work holds at 10× data, not just on the 160-doc spec plants.
  * Prints one JSON line. */
object EncoderProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("data/sf1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, "encoder-probe")
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time[T](tag: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[encoder-probe] $tag: $s%.2f s")
      (r, s)
    }
    val docs = graft.Tables.load(spark, dir, "documents")
    val n = docs.count()
    import graft.functions.TextFunctions.tokens
    val distinct = docs.select(explode(array_distinct(tokens($"text"))).as("t"))
      .filter($"t" =!= "").agg(count_distinct($"t")).head().getLong(0)
    val vAdaptive = math.min(
      graft.operators.LsaEncoder.adaptiveVocab(n), distinct.toInt)
    println(s"[encoder-probe] corpus $n docs, $distinct distinct tokens " +
      s"($dir); effective adaptive V = $vAdaptive " +
      s"(dual path past ${graft.operators.LsaEncoder.DriverGramVocab})")
    val (lsa, lsaSec) = time(s"LsaEncoder.fitAdaptive(dim=64, V=$vAdaptive)")(
      graft.operators.LsaEncoder.fitAdaptive(docs, "text", "lsa", Seq("d"), dim = 64))
    val sgnsV = math.min(1024L, distinct).toInt
    val (sgns, sgnsSec) = time(s"SgnsEncoder.fit(dim=64, V=$sgnsV)")(
      graft.operators.SgnsEncoder.fit(docs, "text", "sgns", Seq("d"),
        dim = 64, vocabSize = sgnsV))
    // warm in-plan encode over the corpus through the fused native
    // expression — the serving-side cost at scale
    def encodePass(tag: String, enc: graft.operators.GraftVectorDB.ChannelDef): Double = {
      docs.limit(100).select(enc.encode($"text")).collect() // warm
      val t0 = System.nanoTime()
      val s = docs.select(enc.encode($"text").as("v"))
        .select(sum(element_at($"v", 1))).head().getDouble(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[encoder-probe] $tag full-corpus encode: $sec%.2f s (checksum $s%.3f)")
      sec
    }
    val lsaEnc = encodePass("lsa", lsa)
    val sgnsEnc = encodePass("sgns", sgns)
    // V-independence sweep of the fused ProjectTfidf serving path:
    // the corpus vocabulary is tiny, so pad it with absent terms to
    // the target V — per-row serving cost must NOT grow with V (the
    // r11 verdict's weak: the old implementation allocated and walked
    // a V-sized buffer per row, ~256 KB/row at V=65536)
    def projSweep(v: Int): Double = {
      val present = docs.select(explode(tokens($"text")).as("t"))
        .filter($"t" =!= "").distinct().limit(v).as[String].collect()
      val vocab: Seq[String] = (present ++
        (present.length until v).map(i => f"__pad_$i%06d")).toSeq
      val rng = new java.util.SplittableRandom(7L)
      val proj = Array.tabulate(64)(_ => Array.tabulate(v)(_ => rng.nextDouble() - 0.5))
      val col = graft.functions.expressions.ProjectTfidf(
        tokens($"text"), vocab.toArray, Array.fill(v)(1.0), proj, 64)
      docs.limit(100).select(col).collect() // warm
      val t0 = System.nanoTime()
      docs.select(col.as("v")).select(sum(element_at($"v", 1))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[encoder-probe] ProjectTfidf V=$v%5d full-corpus encode: $sec%.2f s")
      if (sys.env.contains("PROBE_TASKS")) {
        val many = docs.repartition(64)
        val few = docs.coalesce(2)
        val t1 = System.nanoTime(); many.select(col.as("v")).select(sum(element_at($"v", 1))).head()
        println(f"[encoder-probe]   V=$v%5d 64 tasks: ${(System.nanoTime()-t1)/1e9}%.2f s")
        val t2 = System.nanoTime(); few.select(col.as("v")).select(sum(element_at($"v", 1))).head()
        println(f"[encoder-probe]   V=$v%5d 2 tasks: ${(System.nanoTime()-t2)/1e9}%.2f s")
      }
      sec
    }
    val v1k = projSweep(1024)
    val v64k = projSweep(65536)
    println(s"""{"metric":"encoder_probe","sf_dir":"$dir","docs":$n,""" +
      s""""distinct_tokens":$distinct,"adaptive_v":$vAdaptive,"sgns_v":$sgnsV,""" +
      f""""lsa_fit_sec":$lsaSec%.2f,"sgns_fit_sec":$sgnsSec%.2f,""" +
      f""""lsa_encode_sec":$lsaEnc%.2f,"sgns_encode_sec":$sgnsEnc%.2f,""" +
      f""""proj_v1024_sec":$v1k%.2f,"proj_v65536_sec":$v64k%.2f}""")
    spark.stop()
  }
}
