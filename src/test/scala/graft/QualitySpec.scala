package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{LangIdClassifier, TextAnalysis}

/** The distilled quality classifier (TextAnalysis.fitQuality): weak
  * labels from the heuristic's confident extremes, a hashed-n-gram
  * softmax generalizing them. The controlled corpus here makes the
  * distillation claim falsifiable: in TRAINING data, content quality
  * and length are correlated (clean docs long, junk docs short), so
  * the teacher's labels are right; HELD-OUT docs break the
  * correlation (clean-short, junk-long) — the student, which reads
  * n-gram bags and never sees length, must beat its own teacher
  * there. */
class QualitySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val clean = Seq("the", "a", "of", "and", "data", "table", "row",
    "query", "fast", "slow", "join", "merge", "sort", "line", "stream")
  private def rng(seed: Long) = new java.util.SplittableRandom(seed)
  private def cleanDoc(seed: Long, n: Int): String = {
    val r = rng(seed)
    (0 until n).map(_ => clean(r.nextInt(clean.size))).mkString(" ")
  }
  private def junkDoc(seed: Long, n: Int): String = {
    val r = rng(seed)
    (0 until n).map(_ => (0 until 5).map(_ =>
      "bcdfghjkmpqvwxz983471".charAt(r.nextInt(21))).mkString).mkString(" ")
  }

  private def writeDocs(rows: Seq[(Long, String)], tag: String): String = {
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"quality_spec_${tag}_${System.nanoTime()}").getPath
    rows.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("distilled scorer beats its teacher where length and content diverge") {
    // train: 120-token clean docs (teacher: stop-rich AND long -> hi)
    // vs 18-token junk (teacher: stopless AND short -> lo)
    val train = (0L until 150L).map(i => (i, cleanDoc(i, 120))) ++
      (150L until 300L).map(i => (i, junkDoc(i, 18)))
    val dir = writeDocs(train, "train")
    val m = TextAnalysis.fitQuality(spark, dir)
    assert(m.langs == Seq("hi", "lo"))
    // held-out breaks the correlation: clean-SHORT and junk-LONG
    val cleanShort = (1000L until 1050L).map(i => cleanDoc(i, 18))
    val junkLong = (2000L until 2050L).map(i => junkDoc(i, 120))
    def p(t: String) = m.probabilityLocal(t, "hi")
    val accStudent = (cleanShort.count(p(_) > 0.5) +
      junkLong.count(p(_) <= 0.5)).toDouble / 100
    assert(accStudent >= 0.95, s"student held-out accuracy $accStudent")
    // the TEACHER misreads both held-out shapes: clean-short scores
    // ~0.4*stop_ratio + 0.11 (< QualityHi), junk-long scores 0.6 (> it)
    val teacher = TextAnalysis.scoreDocs(
      (cleanShort ++ junkLong).zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_r")).toMap
    val accTeacher = ((0 until 50).count(i => teacher(i.toLong) >= TextAnalysis.QualityHi) +
      (50 until 100).count(i => teacher(i.toLong) < TextAnalysis.QualityHi)).toDouble / 100
    assert(accTeacher <= 0.5, s"the controlled split must fool the teacher ($accTeacher)")
  }

  test("refits are bit-identical; the probability column matches the local scorer") {
    val train = (0L until 60L).map(i => (i, cleanDoc(i, 120))) ++
      (60L until 120L).map(i => (i, junkDoc(i, 18)))
    val dir = writeDocs(train, "refit")
    val m1 = TextAnalysis.fitQuality(spark, dir)
    val m2 = TextAnalysis.fitQuality(spark, dir)
    assert(m1 == m2, "seeded sequential SGD must refit bit-identically")
    val got = train.take(5).map(_._2).toDF("text")
      .select(m1.probability($"text", "hi").as("p")).collect().map(_.getDouble(0))
    val want = train.take(5).map { case (_, t) => m1.probabilityLocal(t, "hi") }
    assert(got.toSeq == want.toSeq, "expression and local scorer must agree exactly")
    // probabilities are a proper binary softmax
    val both = train.take(5).map { case (_, t) =>
      m1.probabilityLocal(t, "hi") + m1.probabilityLocal(t, "lo") }
    assert(both.forall(s => math.abs(s - 1.0) < 1e-12))
  }

  test("curate trainedQuality floor composes with the gate") {
    val m = TextAnalysis.fitQuality(spark, sf)
    val base = TextAnalysis.curate(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val floored = TextAnalysis.curate(spark, sf, None, None, Some((m, 0.0)))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(floored == base, "floor 0 admits everything the default admits")
    val strict = TextAnalysis.curate(spark, sf, None, None, Some((m, 0.9)))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(strict.subsetOf(base) && strict.size < base.size,
      s"a 0.9 floor must cut the sf corpus (kept ${strict.size}/${base.size})")
  }
}
