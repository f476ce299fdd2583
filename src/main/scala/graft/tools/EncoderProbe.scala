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
    println(s"""{"metric":"encoder_probe","sf_dir":"$dir","docs":$n,""" +
      s""""distinct_tokens":$distinct,"adaptive_v":$vAdaptive,"sgns_v":$sgnsV,""" +
      f""""lsa_fit_sec":$lsaSec%.2f,"sgns_fit_sec":$sgnsSec%.2f,""" +
      f""""lsa_encode_sec":$lsaEnc%.2f,"sgns_encode_sec":$sgnsEnc%.2f}""")
    spark.stop()
  }
}
