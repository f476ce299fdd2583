package graft

import org.apache.spark.sql.functions._

/** Throughput probe for the external-model bridge (BENCH_gem_r16):
  * a realistically-sized GEM model (16384-bucket featurizer, 256
  * hidden, 384 out ≈ MiniLM-class output width, ~17 MB of float64
  * weights) over the sf1 documents corpus, through both serving
  * forms. */
object GemProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "gem-probe")
    import spark.implicits._
    import graft.functions.expressions.{MlpModel, MlpEncode}
    import graft.operators.ExternalModelEncoder
    val dir = "data/sf1"
    def mix(x0: Long): Iterator[Double] = new Iterator[Double] {
      var s = x0
      def hasNext = true
      def next(): Double = {
        s += 0x9e3779b97f4a7c15L
        var z = s
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble - 0.5
      }
    }
    val featDim = 16384; val hid = 256; val dim = 384
    def layer(out: Int, in: Int, act: Int, seed: Long) = {
      val it = mix(seed)
      new MlpModel.Layer(out, in, act,
        Array.fill(out)(Array.fill(in)(it.next() / math.sqrt(in))),
        Array.fill(out)(it.next() * 0.1))
    }
    val t0 = System.nanoTime()
    val model = new MlpModel(featDim, 7L,
      Array(layer(hid, featDim, 2, 11L), layer(dim, hid, 0, 23L)))
    val path = "target/gem_probe.gem"
    ExternalModelEncoder.save(model, path)
    val sizeMb = new java.io.File(path).length / 1e6
    println(f"## model build+save: ${(System.nanoTime() - t0) / 1e9}%.1f s, $sizeMb%.1f MB")
    val docs = Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id", $"text")
    val n = docs.count()
    spark.range(100000).selectExpr("sum(id)").collect()
    def t(name: String)(f: => Long): Double = {
      val s0 = System.nanoTime()
      val c = f
      val secs = (System.nanoTime() - s0) / 1e9
      println(f"## $name: $secs%.2f s (${c / secs}%.0f docs/s)")
      secs
    }
    val bc = spark.sparkContext.broadcast(model)
    val tPlan = t("in-plan MlpEncode (broadcast expression)") {
      docs.select(MlpEncode(graft.functions.TextFunctions.tokens($"text"), bc).as("v"))
        .select(sum(element_at($"v", 1))).collect(); n
    }
    val tBatch = t("embedBatch (mapPartitions, batch 64)") {
      ExternalModelEncoder.embedBatch(docs, "text", "v", path, batchSize = 64)
        .select(sum(element_at($"v", 1))).collect(); n
    }
    println(s"""{"metric":"gem_probe","docs":$n,"model_mb":${math.round(sizeMb)},""" +
      s""""featdim":$featDim,"hidden":$hid,"dim":$dim,""" +
      f""""inplan_s":$tPlan%.2f,"batch_s":$tBatch%.2f}""")
    spark.stop()
  }
}
