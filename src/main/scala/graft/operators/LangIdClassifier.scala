package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINED language identification — fastText's supervised shape
  * (Joulin et al. 2016, "Bag of Tricks for Efficient Text
  * Classification") re-expressed for this stack: hashed character
  * n-gram features (2–4-grams of `<token>`-padded words plus the
  * word hash itself, bucketed into a fixed [[Dim]] space — no
  * dictionary, so serving is vocabulary-free) into a multinomial
  * logistic regression trained by seeded, sequential SGD on a BOUNDED
  * sample — the [[SgnsEncoder]] discipline: ≤ [[AnnIndex.SampleTarget]]
  * labeled docs collected in xxhash64 order, the loop runs on the
  * driver in a fixed order, so refits are bit-identical.
  *
  * The marker heuristic ([[TextAnalysis.Markers]]) scores a fixed
  * word list; this learns whatever n-gram structure the labeled data
  * actually carries (script, orthography, function words — and, when
  * text and label are independent as in the synthetic corpus, the
  * class priors, which is the Bayes-optimal fallback). The curation
  * gate consumes it behind [[TextAnalysis.curate]]'s
  * `trainedLangId` config.
  *
  * 100 TB shape: fit = one bounded sample collect + a driver-local
  * loop; serve = one narrow per-row expression
  * ([[graft.functions.expressions.LangIdPredict]]), weights riding
  * the task binary (L × [[Dim]] doubles), zero shuffle. */
object LangIdClassifier {

  /** Hash-bucket count. 2^11 buckets × 5 classes = 80 KB of weights —
    * small enough to ship in the plan, large enough that the ~30-word
    * synthetic vocabulary never saturates it. */
  val Dim = 2048

  /** Trained model: langs SORTED (stable argmax tie order), row-major
    * class weights, bias = learned log-priors. */
  final case class Model(langs: Seq[String], dim: Int,
      w: Seq[Seq[Double]], b: Seq[Double]) {
    def predict(text: Column): Column =
      graft.functions.expressions.LangIdPredict(text, langs, dim, w, b)
    def predictLocal(text: String): String =
      langs(predictIndex(text, dim, w.map(_.toArray).toArray, b.toArray))
    /** Softmax probability of one class — the SCORE serving shape
      * (a quality gate thresholds a probability; argmax throws the
      * margin away). Same narrow-expression economics as predict. */
    def probability(text: Column, label: String): Column = {
      require(langs.contains(label), s"unknown class '$label' ($langs)")
      graft.functions.expressions.LangIdProb(
        text, langs.indexOf(label), dim, w, b)
    }
    def probabilityLocal(text: String, label: String): Double = {
      require(langs.contains(label), s"unknown class '$label' ($langs)")
      classProb(text, langs.indexOf(label), dim,
        w.map(_.toArray).toArray, b.toArray)
    }
  }

  /** Feature stream of a text: hashed 2–4-grams of each `<token>`
    * plus the token hash. Deterministic (MurmurHash3 over chars, no
    * JVM-varying hashCode), identical at train and serve time. */
  private[graft] def featureIndices(text: String, dim: Int): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").iterator.filter(_.nonEmpty)
    while (toks.hasNext) {
      val padded = "<" + toks.next() + ">"
      out += (scala.util.hashing.MurmurHash3.stringHash(padded, 7)
        & 0x7fffffff) % dim
      var n = 2
      while (n <= 4) {
        var i = 0
        while (i + n <= padded.length) {
          out += (scala.util.hashing.MurmurHash3
            .stringHash(padded.substring(i, i + n), n)
            & 0x7fffffff) % dim
          i += 1
        }
        n += 1
      }
    }
    out.toArray
  }

  /** Argmax class for a text under (w, b); L1-normalized counts. */
  private[graft] def predictIndex(text: String, dim: Int,
      w: Array[Array[Double]], b: Array[Double]): Int = {
    val idx = featureIndices(text, dim)
    val scores = b.clone()
    if (idx.nonEmpty) {
      val inv = 1.0 / idx.length
      var k = 0
      while (k < idx.length) {
        val j = idx(k)
        var l = 0
        while (l < scores.length) { scores(l) += w(l)(j) * inv; l += 1 }
        k += 1
      }
    }
    var best = 0
    var l = 1
    while (l < scores.length) {
      if (scores(l) > scores(best)) best = l
      l += 1
    }
    best
  }

  /** Softmax probability of class `cls` for a text under (w, b) —
    * the same linear scores as [[predictIndex]], normalized with the
    * max-shift the fit loop uses (bit-stable across refits). */
  private[graft] def classProb(text: String, cls: Int, dim: Int,
      w: Array[Array[Double]], b: Array[Double]): Double = {
    val idx = featureIndices(text, dim)
    val scores = b.clone()
    if (idx.nonEmpty) {
      val inv = 1.0 / idx.length
      var k = 0
      while (k < idx.length) {
        val j = idx(k)
        var l = 0
        while (l < scores.length) { scores(l) += w(l)(j) * inv; l += 1 }
        k += 1
      }
    }
    var mx = scores(0)
    var l = 1
    while (l < scores.length) { if (scores(l) > mx) mx = scores(l); l += 1 }
    var z = 0.0
    l = 0
    while (l < scores.length) { z += math.exp(scores(l) - mx); l += 1 }
    math.exp(scores(cls) - mx) / z
  }

  /** Fit on (textCol, labelCol): bounded xxhash64-ordered sample,
    * sequential seeded SGD with 1/√t learning-rate decay. Labels are
    * the distinct values of labelCol in the SAMPLE, sorted. */
  def fit(docs: DataFrame, textCol: String, labelCol: String,
      dim: Int = Dim, epochs: Int = 30, lr0: Double = 0.5,
      seed: Long = 42L): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sample: Array[(String, String)] = docs
      .select(col(textCol).as("t"), col(labelCol).cast("string").as("y"))
      .filter($"t".isNotNull && $"y".isNotNull)
      .select(xxhash64($"t", $"y").as("k"), $"t", $"y")
      .orderBy($"k", $"t", $"y").limit(AnnIndex.SampleTarget.toInt)
      .collect().map(r => (r.getString(1), r.getString(2)))
    require(sample.nonEmpty, "LangIdClassifier.fit: no labeled rows")
    val langs = sample.map(_._2).distinct.sorted.toSeq
    val lIdx = langs.zipWithIndex.toMap
    val L = langs.length
    val w = Array.fill(L)(new Array[Double](dim))
    val b = new Array[Double](L)
    // features once per doc; fixed doc order; epoch-shuffle via a
    // seeded Fisher-Yates so refits stay bit-identical
    val feats = sample.map { case (t, _) => featureIndices(t, dim) }
    val ys = sample.map { case (_, y) => lIdx(y) }
    val order = Array.tabulate(sample.length)(identity)
    val rng = new java.util.SplittableRandom(seed)
    var t = 0L
    val p = new Array[Double](L)
    var e = 0
    while (e < epochs) {
      var i = order.length - 1
      while (i > 0) {
        val j = rng.nextInt(i + 1)
        val tmp = order(i); order(i) = order(j); order(j) = tmp
        i -= 1
      }
      var s = 0
      while (s < order.length) {
        val d = order(s)
        val idx = feats(d)
        val lr = lr0 / math.sqrt(1.0 + t)
        // softmax scores over the doc's L1-normalized counts
        var l = 0
        while (l < L) { p(l) = b(l); l += 1 }
        val inv = if (idx.isEmpty) 0.0 else 1.0 / idx.length
        var k = 0
        while (k < idx.length) {
          val j = idx(k)
          l = 0
          while (l < L) { p(l) += w(l)(j) * inv; l += 1 }
          k += 1
        }
        var mx = p(0)
        l = 1
        while (l < L) { if (p(l) > mx) mx = p(l); l += 1 }
        var z = 0.0
        l = 0
        while (l < L) { p(l) = math.exp(p(l) - mx); z += p(l); l += 1 }
        l = 0
        while (l < L) {
          val g = p(l) / z - (if (l == ys(d)) 1.0 else 0.0)
          b(l) -= lr * g
          if (idx.nonEmpty) {
            val gw = lr * g * inv
            k = 0
            while (k < idx.length) { w(l)(idx(k)) -= gw; k += 1 }
          }
          l += 1
        }
        t += 1
        s += 1
      }
      e += 1
    }
    Model(langs, dim, w.map(_.toSeq).toSeq, b.toSeq)
  }
}
