package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained byte-pair-encoding tokenizer (Sennrich et al. 2016, the
  * algorithm under GPT-2/SentencePiece-BPE vocabularies) — the real
  * token-budget machinery of a pretraining pipeline: `tx_shard`/
  * `tx_pack` count whitespace tokens, but production budgets count
  * SUBWORDS under the training tokenizer, and the two disagree
  * enough to blow sequence lengths.
  *
  * fit = ONE bounded xxhash64-ordered sample collect → driver-local
  * merge learning, fully DETERMINISTIC without a seed: the next merge
  * is the most frequent adjacent symbol pair, ties broken by the
  * lexicographically smallest pair — bit-identical refits by
  * construction (the SgnsEncoder discipline, minus the RNG).
  * Serving = [[graft.functions.expressions.BpeTokenize]], one narrow
  * expression with the merge table in the plan (≤ a few KB — no
  * broadcast needed at this size). Words end with the `</w>` marker
  * so merges never cross word boundaries and detokenization is exact:
  * concatenating a word's subwords reproduces the word. */
object BpeTokenizer {

  val EndOfWord = "</w>"

  final case class Model(merges: Seq[(String, String)]) {
    @transient private lazy val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Standard BPE application: repeatedly merge the present pair
      * with the LOWEST learned rank until none applies. */
    def tokenizeWord(word: String): Seq[String] = {
      if (word.isEmpty) return Seq.empty
      var syms = word.map(_.toString) :+ EndOfWord
      var done = false
      while (!done && syms.length > 1) {
        var best = -1
        var bestRank = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; best = i }
          i += 1
        }
        if (best < 0) done = true
        else {
          val merged = syms(best) + syms(best + 1)
          val out = Seq.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == syms(best) &&
                syms(j + 1) == syms(best + 1)) {
              out += merged; j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result().toIndexedSeq
        }
      }
      syms
    }

    def tokenizeLocal(text: String): Seq[String] =
      VectorStore.tokensLocal(text).toSeq.filter(_.nonEmpty)
        .flatMap(tokenizeWord)

    /** In-plan form: text column → array of subword tokens. */
    def tokenize(c: Column): Column =
      graft.functions.expressions.BpeTokenize(c, merges)
  }

  /** Learn `numMerges` merges from a bounded corpus sample. */
  def fit(docs: DataFrame, textCol: String, numMerges: Int = 256): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sample: Array[String] = docs
      .select(col(textCol).as("t")).filter($"t".isNotNull)
      .select(xxhash64($"t").as("k"), $"t")
      .orderBy($"k", $"t").limit(AnnIndex.SampleTarget.toInt)
      .collect().map(_.getString(1))
    // word frequency table; each word as its symbol sequence
    val wordFreq = scala.collection.mutable.HashMap.empty[String, Long]
    sample.foreach(t => VectorStore.tokensLocal(t).foreach { w =>
      if (w.nonEmpty) wordFreq(w) = wordFreq.getOrElse(w, 0L) + 1L
    })
    require(wordFreq.nonEmpty, "BpeTokenizer.fit: sample has no words")
    var words: Vector[(IndexedSeq[String], Long)] = wordFreq.toVector
      .sortBy(_._1) // deterministic iteration order
      .map { case (w, n) => (w.map(_.toString).toIndexedSeq :+ EndOfWord, n) }
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairs(p) = pairs.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (pairs.isEmpty) exhausted = true
      else {
        // most frequent pair; ties → lexicographically smallest, so
        // refits are bit-identical with no seed at all
        val best = pairs.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val merged = best._1 + best._2
        words = words.map { case (syms, n) =>
          if (!syms.exists(_ == best._1)) (syms, n)
          else {
            val out = IndexedSeq.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 &&
                  syms(j + 1) == best._2) {
                out += merged; j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.result(), n)
          }
        }
        m += 1
      }
    }
    Model(merges.result())
  }
}
