package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{LangIdClassifier, TextAnalysis}

/** The trained langid channel: proof the supervised learner actually
  * LEARNS (a controlled task with genuine n-gram signal), bit-stable
  * refits, and the corpus/curation integration — where the honest
  * claim is priors-only (the synthetic corpus draws `lang` independent
  * of `text`, so Bayes-optimal accuracy IS the majority prior; the
  * marker heuristic sits below chance there). */
class LangIdSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Five synthetic "languages" with disjoint letter inventories plus
    * shared digits/noise — real n-gram signal, deterministic draw. */
  private def controlled(n: Int, seedBase: Int): Seq[(String, String)] = {
    val alphabets = Seq(
      "aa" -> "abcdef", "bb" -> "ghijkl", "cc" -> "mnopqr",
      "dd" -> "stuvwx", "ee" -> "yzabcd") // ee overlaps aa: not trivial
    (0 until n).map { i =>
      val (lang, alpha) = alphabets(i % alphabets.length)
      val rng = new java.util.SplittableRandom(seedBase + i)
      val words = (0 until 20).map { _ =>
        val len = 3 + rng.nextInt(5)
        val sb = new StringBuilder
        (0 until len).foreach(_ => sb.append(alpha.charAt(rng.nextInt(alpha.length))))
        if (rng.nextInt(4) == 0) sb.append(rng.nextInt(10)) // shared noise
        sb.result()
      }
      (words.mkString(" "), lang)
    }
  }

  test("learns real n-gram structure: held-out accuracy > 0.95 on a controlled task") {
    val train = controlled(400, seedBase = 1000)
    val test = controlled(200, seedBase = 900000) // disjoint draws
    val model = LangIdClassifier.fit(
      train.toDF("text", "lang"), "text", "lang")
    val acc = test.count { case (t, y) => model.predictLocal(t) == y }
      .toDouble / test.size
    assert(acc > 0.95, s"held-out accuracy $acc")
    // and the serving EXPRESSION agrees with the local path row-for-row
    val served = test.toDF("text", "lang")
      .select($"lang", model.predict($"text").as("pred")).collect()
    val servedAcc = served.count(r => r.getString(0) == r.getString(1))
    assert(served.zip(test).forall { case (r, (t, _)) =>
      r.getString(1) == model.predictLocal(t) }, "expression/local drift")
    assert(servedAcc.toDouble / test.size > 0.95)
  }

  test("refits are bit-identical (seeded, sequential, bounded sample)") {
    val df = controlled(300, seedBase = 5000).toDF("text", "lang")
    val m1 = LangIdClassifier.fit(df, "text", "lang")
    val m2 = LangIdClassifier.fit(df, "text", "lang")
    assert(m1 == m2)
  }

  test("on the corpus: beats the marker heuristic on held-out docs") {
    // the synthetic corpus assigns lang INDEPENDENT of text — the
    // trained model converges to the prior (the Bayes-optimal rule
    // there), which still clears the below-chance marker heuristic;
    // this is the honest corpus claim, the learning claim is above
    val docs = Tables.load(spark, sf, "documents")
    val train = docs.filter($"doc_id" % 2 === 0)
    val heldOut = docs.filter($"doc_id" % 2 === 1)
    val model = LangIdClassifier.fit(train, "text", "lang")
    val n = heldOut.count().toDouble
    val trainedAcc = heldOut
      .filter(model.predict($"text") === $"lang").count() / n
    val markerAcc = TextAnalysis.langId(spark, sf)
      .join(heldOut.select($"doc_id", $"lang"), "doc_id")
      .filter($"predicted" === $"lang").count() / n
    assert(trainedAcc > markerAcc,
      s"trained $trainedAcc vs marker $markerAcc")
  }

  test("curate consumes the trained classifier behind its config") {
    val model = LangIdClassifier.fit(
      Tables.load(spark, sf, "documents"), "text", "lang")
    val gated = TextAnalysis.curate(spark, sf, Some(model))
    val rows = gated.collect()
    assert(rows.nonEmpty)
    // the swapped column really is the model's output: every surviving
    // lang_pred matches a local re-prediction of that doc's text
    val texts = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("lang_pred") == model.predictLocal(texts(id)))
    }
    // and the gate's language filter applied to the MODEL's labels
    assert(rows.forall(r => Set("en", "es")(r.getAs[String]("lang_pred"))))
  }
}
