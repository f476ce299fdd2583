package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BpeTokenizer

/** The trained BPE tokenizer: the merge sequence on a hand-computable
  * corpus, seedless determinism, exact detokenization, and in-plan /
  * driver-local parity. */
class BpeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("merge learning follows frequency with lexicographic ties — hand-checked") {
    val df = Seq("low low low lower lowest").toDF("text")
    val m = BpeTokenizer.fit(df, "text", numMerges = 5)
    // (l,o) ties (o,w) at 5 → lexicographic; then (lo,w)@5,
    // (low,</w>)@3, (low,e)@2, then the all-@1 tie resolves to (lowe,r)
    assert(m.merges == Seq(("l", "o"), ("lo", "w"), ("low", "</w>"),
      ("low", "e"), ("lowe", "r")), m.merges.toString)
    assert(m.tokenizeWord("low") == Seq("low</w>"))
    assert(m.tokenizeWord("lower") == Seq("lower", "</w>"))
    assert(m.tokenizeWord("lowest") == Seq("lowe", "s", "t", "</w>"))
    // unseen characters degrade to singles, never throw
    assert(m.tokenizeWord("løw") == Seq("l", "ø", "w", "</w>"))
  }

  test("refits are bit-identical without any seed") {
    val docs = Tables.load(spark, sf, "documents")
    val m1 = BpeTokenizer.fit(docs, "text", numMerges = 64)
    val m2 = BpeTokenizer.fit(docs, "text", numMerges = 64)
    assert(m1 == m2)
  }

  test("detokenization is exact; in-plan tokenize matches the local twin") {
    val docs = Tables.load(spark, sf, "documents")
    val m = BpeTokenizer.fit(docs, "text", numMerges = 128)
    val texts = docs.select($"text").limit(50).as[String].collect()
    texts.foreach { t =>
      val words = t.trim.split("\\s+").filter(_.nonEmpty)
      val sub = m.tokenizeLocal(t)
      // subwords concat (minus markers) reproduce the words in order
      assert(sub.mkString.replace(BpeTokenizer.EndOfWord, "") ==
        words.mkString)
      // compression sits between words and characters
      assert(sub.length >= words.length, s"${sub.length} < ${words.length}")
      assert(sub.length <= words.map(_.length + 1).sum)
    }
    val served = docs.limit(50)
      .select($"text", m.tokenize($"text").as("sub")).collect()
    served.foreach { r =>
      assert(r.getSeq[String](1) == m.tokenizeLocal(r.getString(0)),
        "expression/local drift")
    }
    // 128 merges fully cover this ~31-word vocabulary: every word is
    // ONE token, the converged regime (bpe == whitespace). A SMALL
    // merge budget is the genuine subword regime, where the trained
    // budget exceeds whitespace counting — the reason a production
    // pipeline budgets in tokenizer units, not words
    val ws = texts.map(_.trim.split("\\s+").count(_.nonEmpty)).sum
    val bpe = texts.map(m.tokenizeLocal(_).length).sum
    assert(bpe == ws, s"converged model: bpe $bpe vs whitespace $ws")
    val small = BpeTokenizer.fit(docs, "text", numMerges = 16)
    val bpeSmall = texts.map(small.tokenizeLocal(_).length).sum
    assert(bpeSmall > ws, s"subword regime: bpe $bpeSmall vs whitespace $ws")
  }

  test("packWithTokenizer budgets sequences in trained-tokenizer units") {
    import graft.operators.TextAnalysis
    val docs = Tables.load(spark, sf, "documents")
    val m = BpeTokenizer.fit(docs, "text", numMerges = 16)
    val packed = TextAnalysis.packWithTokenizer(spark, sf, m).collect()
    val texts = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // n_tokens is the MODEL's count per doc, not whitespace
    packed.foreach { r =>
      assert(r.getAs[Long]("n_tokens") ==
        m.tokenizeLocal(texts(r.getAs[Long]("doc_id"))).length.toLong)
    }
    // spans still tile contiguously per source: each doc starts where
    // the previous ended (the pack invariant, now in subword units)
    packed.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("seq_first") == cum / TextAnalysis.SeqLen)
        assert(r.getAs[Long]("pos_in_seq") == cum % TextAnalysis.SeqLen)
        cum += r.getAs[Long]("n_tokens")
      }
    }
    // and the budget genuinely differs from the whitespace packing
    val ws = TextAnalysis.pack(spark, sf).collect()
      .map(r => r.getAs[Long]("n_tokens")).sum
    assert(packed.map(_.getAs[Long]("n_tokens")).sum > ws)
  }
}
