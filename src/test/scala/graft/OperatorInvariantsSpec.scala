package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Semantic invariants beyond row counts. */
class OperatorInvariantsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("vs_embed vectors are unit-norm after rounding") {
    val sq = VectorStore.embed(spark, sf)
      .groupBy("doc_id").agg(sum(col("val") * col("val")).as("n2"))
      .agg(min("n2"), max("n2")).head()
    assert(math.abs(sq.getDouble(0) - 1.0) < 1e-3 &&
      math.abs(sq.getDouble(1) - 1.0) < 1e-3)
  }

  test("vs_knn ranks are dense 1..5 per query and sims descend") {
    val rows = KnnSearch.knn(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    byQ.values.foreach { hits =>
      assert(hits.map(_.getAs[Long]("rnk")).sorted.sameElements(1L to 5L))
      val sims = hits.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("sim_r"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("vs_knn_filtered respects the metadata predicate") {
    val hits = KnnSearch.knnFiltered(spark, sf)
    val emb = Tables.load(spark, sf, "embeddings").select("vec_id", "label")
    val bad = hits.join(emb, hits("n_id") === emb("vec_id"))
      .filter(col("label") =!= 3).count()
    assert(bad == 0)
  }

  test("vs_rerank diversifies: first pick is the top hit, pool membership holds, sets diverge") {
    val mmr = KnnSearch.mmr(spark, sf).collect()
    val knn = KnnSearch.knn(spark, sf).collect()
    val mmrByQ = mmr.groupBy(_.getAs[Long]("q_id"))
    val knnByQ = knn.groupBy(_.getAs[Long]("q_id"))
    assert(mmrByQ.size == 10)
    mmrByQ.foreach { case (q, hits) =>
      // score-level invariant (id equality would be brittle: the 4dp
      // round of 0.6·sim can merge two sims and flip the id tie-break)
      val firstScore = hits.minBy(_.getAs[Long]("rnk")).getAs[Double]("mmr_r")
      val top1Score = BigDecimal(
          0.6 * knnByQ(q).minBy(_.getAs[Long]("rnk")).getAs[Double]("sim_r"))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(firstScore == top1Score,
        s"q$q: MMR step 1 must carry the relevance-only top score")
      assert(hits.map(_.getAs[Long]("rnk")).sorted.sameElements(1L to 5L))
    }
    // the re-rank is not a no-op: at least one query's set differs from plain top-5
    val differs = mmrByQ.exists { case (q, hits) =>
      hits.map(_.getAs[Long]("n_id")).toSet != knnByQ(q).map(_.getAs[Long]("n_id")).toSet
    }
    assert(differs, "MMR must trade some relevance for diversity on this corpus")
  }

  test("vs_rerank_li matches a plain-Scala MaxSim model, and trigrams grade orthography") {
    import SparkTestSession.spark.implicits._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def r(x: Double, n: Int) =
      BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
    def embed(toks: Seq[String], dim: Int, salt: String => String): Array[Double] = {
      val v = new Array[Double](dim)
      toks.foreach(t => v(Integer.parseInt(md5hex(salt(t)).take(2), 16) % dim) += 1)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => r(x / n, 6))
    }
    def trig(tok: String): Array[Double] = {
      val pd = "<" + tok + ">"
      embed((0 to pd.length - 3).map(i => pd.substring(i, i + 3)), 48, identity)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def nrm(x: Array[Double]) = math.sqrt(x.map(y => y * y).sum)
      r(a.zip(b).map { case (x, y) => x * y }.sum / (nrm(a) * nrm(b)), 4)
    }
    // the trigram space grades near-orthography — the reason MaxSim
    // re-ranking adds signal over whole-document hashing
    assert(cos(trig("fastly"), trig("fast")) > cos(trig("fastly"), trig("table")))
    assert(cos(trig("queried"), trig("query")) > cos(trig("queried"), trig("merge")))
    // full plain-Scala MaxSim replay of the operator
    val docs = Tables.load(SparkTestSession.spark, SparkTestSession.sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(row => row.getLong(0) -> row.getString(1)).toMap
    def toks(s: String) = s.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    val expected = KnnSearch.LiQueries.flatMap { case (qId, qtext) =>
      val qv = embed(toks(qtext), 64, identity)
      def nrm(x: Array[Double]) = math.sqrt(x.map(y => y * y).sum)
      val pool = docs.toSeq.map { case (id, text) =>
        val dv = embed(toks(text), 64, identity)
        (id, r(qv.zip(dv).map { case (x, y) => x * y }.sum / (nrm(qv) * nrm(dv)), 4))
      }.sortBy { case (id, s) => (-s, id) }.take(KnnSearch.LiPool)
      val qts = toks(qtext).distinct.map(trig)
      pool.map { case (id, simR) =>
        val dts = toks(docs(id)).distinct.map(trig)
        val li = r(qts.map(qt => dts.map(dt => cos(qt, dt)).max).sum, 4)
        (qId, id, li, simR)
      }.sortBy { case (_, id, li, _) => (-li, id) }.take(KnnSearch.LiK)
        .zipWithIndex.map { case ((q, id, li, s), i) => (q, i + 1L, id, li, s) }
    }
    val got = KnnSearch.rerankLate(SparkTestSession.spark, SparkTestSession.sf)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getDouble(3), row.getDouble(4))).toSeq
    assert(got == expected, s"\ngot      $got\nexpected $expected")
  }

  test("tx_contam flags only non-benchmark docs, each with a real hit") {
    val rows = TextAnalysis.contam(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("doc_id") % TextAnalysis.ContamBenchMod != 0),
      "benchmark docs must never appear as contaminated training docs")
    assert(rows.forall(r => r.getAs[Long]("n_contam") >= 1 &&
      r.getAs[Long]("n_bench_docs") >= 1))
  }

  test("tx_mix keeps a deterministic subset within the target machinery") {
    val rows = TextAnalysis.mix(spark, sf).collect()
    assert(rows.length == 20) // one manifest row per source
    rows.foreach { r =>
      val (in, kept) = (r.getAs[Long]("n_in"), r.getAs[Long]("n_kept"))
      assert(kept >= 0 && kept <= in)
      val t = r.getAs[Long]("target_permille")
      assert(t >= 100 && t < 1000)
    }
    // reproducible: a second run yields the identical manifest
    assert(TextAnalysis.mix(spark, sf).collect().toSeq == rows.toSeq)
  }

  test("tx_ppl scores are positive, finite, and bigram-backed") {
    val rows = TextAnalysis.ppl(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("n_bigrams") > 0 &&
      r.getAs[Double]("nll") > 0 && !r.getAs[Double]("nll").isInfinite))
  }

  test("canonicalUrl applies each rule and keeps what it must") {
    import spark.implicits._
    val cases = Seq(
      // case folding + default-port strip + fragment drop
      "HTTPS://A.COM:443/x#frag" -> "https://a.com/x",
      // non-default port KEPT
      "http://a.com:8080/x" -> "http://a.com:8080/x",
      // slash collapse + trailing strip; root path stays "/"
      "http://a.com//x//y/" -> "http://a.com/x/y",
      "http://a.com" -> "http://a.com/",
      // tracking params drop, survivors sort, empty query vanishes
      "http://a.com/p?utm_source=x&z=1&a=2&gclid=g" -> "http://a.com/p?a=2&z=1",
      "http://a.com/p?utm_campaign=x" -> "http://a.com/p",
      // a bare ref param drops, ref-ish names do not
      "http://a.com/p?ref=rss&refresh=1" -> "http://a.com/p?refresh=1")
    val got = cases.map(_._1).toDF("u")
      .select(graft.operators.Dedup.canonicalUrl($"u")).collect()
      .map(_.getString(0)).toSeq
    assert(got == cases.map(_._2), got.zip(cases).toString)
  }

  test("tx_passage interval union is exact on a controlled corpus") {
    import spark.implicits._
    val k = TextAnalysis.PassageTokens
    def words(tag: String, n: Int): String =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    // doc 1 and 2 share a k-token passage mid-text (one merged span,
    // k+2 window starts in doc 1 would over-count without the union);
    // doc 3 shares NOTHING; docs 4/5 are verbatim copies (full cover)
    val shared = words("s", k + 2) // k+2 tokens -> 3 dup windows, 1 span
    val docs = Seq(
      (1L, words("a", 5) + " " + shared + " " + words("b", 5)),
      (2L, words("c", 3) + " " + shared + " " + words("d", 7)),
      (3L, words("e", k * 3)),
      (4L, words("f", k * 2)),
      (5L, words("f", k * 2))).toDF("doc_id", "text")
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"tx_passage_spec_${System.nanoTime()}").getPath
    docs.write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.passageDedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_grams"),
          r.getAs[Long]("dup_spans"), r.getAs[Long]("dup_tokens"),
          r.getAs[Double]("dup_ratio")))).toMap
    // the shared run has k+2 tokens = 3 window starts merging to ONE
    // span of k+2 covered tokens
    assert(rows(1L) == ((k + 12L, 3L, 1L, k + 2L,
      BigDecimal((k + 2.0) / (k + 12)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)), rows(1L).toString)
    assert(rows(2L)._2 == 3L && rows(2L)._3 == 1L && rows(2L)._4 == k + 2L)
    assert(rows(3L) == ((k * 3L, 0L, 0L, 0L, 0.0)), rows(3L).toString)
    // verbatim copies: every window duplicated, one span, full cover
    assert(rows(4L) == ((k * 2L, k + 1L, 1L, k * 2L, 1.0)), rows(4L).toString)
    assert(rows(5L) == rows(4L))
  }

  test("curate passageMaxRatio gate drops exactly the over-covered docs") {
    val base = TextAnalysis.curate(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    // ceiling 1.0 admits everything the default admits
    val loose = TextAnalysis.curate(spark, sf, None, Some(1.0)).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(loose == base)
    // ceiling 0.0 = the default minus every doc with ANY duplicated
    // passage — exactly the dup_ratio > 0 set from tx_passage
    val dup = TextAnalysis.passageDedup(spark, sf).collect()
      .filter(_.getAs[Double]("dup_ratio") > 0.0)
      .map(_.getAs[Long]("doc_id")).toSet
    val strict = TextAnalysis.curate(spark, sf, None, Some(0.0)).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(strict == base -- dup)
    assert(strict != base, "the sf corpus must exercise the gate (has near-dups)")
  }

  test("tx_pii classes scrub typed placeholders; counts and ratio are per-class exact") {
    import spark.implicits._
    val raw = "reach me at jane.doe+x@mail.example.org or +1-415-555-0199 " +
      "from 203.0.113.7 and 2001:db8:85a3:1:8a2e:370:7334 thanks"
    val row = Seq(raw).toDF("payload")
      .select(
        TextAnalysis.PiiClasses.map { case (n, re, _) =>
          size(regexp_extract_all($"payload", lit(re), lit(0))).as(s"n_$n")
        } ++ Seq(TextAnalysis.piiScrub($"payload").as("scrubbed"),
          TextAnalysis.piiRatio($"payload").as("ratio")): _*)
      .head()
    assert(row.getAs[Int]("n_email") == 1 && row.getAs[Int]("n_phone") == 1 &&
      row.getAs[Int]("n_ip4") == 1 && row.getAs[Int]("n_ip6") == 1)
    val scrubbed = row.getAs[String]("scrubbed")
    assert(scrubbed == "reach me at <EMAIL> or <PHONE> from <IP4> and <IP6> thanks",
      scrubbed)
    val piiChars = Seq("jane.doe+x@mail.example.org", "+1-415-555-0199",
      "203.0.113.7", "2001:db8:85a3:1:8a2e:370:7334").map(_.length).sum
    assert(row.getAs[Double]("ratio") ==
      BigDecimal(piiChars.toDouble / raw.length).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    // clean text: zero everything (the curate clip's common case)
    val clean = Seq("no personal data here at all").toDF("payload")
      .select(TextAnalysis.piiRatio($"payload").as("r")).head().getAs[Double]("r")
    assert(clean == 0.0)
    // the driver query draws all four classes AND zero-count gates
    // somewhere in the corpus (the injection is md5-gated per class)
    val out = TextAnalysis.pii(spark, sf).collect()
    for (c <- Seq("n_email", "n_phone", "n_ip4", "n_ip6")) {
      assert(out.exists(_.getAs[Long](c) > 0L), s"$c never drawn")
      assert(out.exists(_.getAs[Long](c) == 0L), s"$c never gated off")
    }
    assert(out.forall(r => r.getAs[Double]("pii_ratio") >= 0.0 &&
      r.getAs[Double]("pii_ratio") < 1.0))
  }

  test("curate piiMaxRatio clips injected-PII docs and is a no-op on the clean corpus") {
    import spark.implicits._
    val base = TextAnalysis.curate(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    // the driver corpus is PII-free: any ceiling admits everything
    val gated = TextAnalysis.curate(spark, sf, None, piiMaxRatio = Some(0.0))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(gated == base, "clean corpus must pass the clip untouched")
    // injected corpus: a PII-carrying doc that passes every OTHER
    // gate (en markers, 100+ tokens, unique shingles) drops at the
    // ceiling; the rest of the corpus is untouched
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    val body = Seq.fill(12)("the cat and the dog are with a friend " +
      "because it is good that they have the time").mkString(" ")
    val heavyText = body + " a@b.io c@d.io e@f.io 10.0.0.1 10.0.0.2 " +
      "+1-200-300-4000 +1-200-300-4001 g@h.io 10.0.0.3"
    val heavy = spark.createDataFrame(Seq(
      (999999L, heavyText, "en", "web", heavyText.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"tx_pii_curate_${System.nanoTime()}").getPath
    docs.unionByName(heavy).write.parquet(s"$dir/documents.parquet")
    val open = TextAnalysis.curate(spark, dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val clipped = TextAnalysis.curate(spark, dir, None, piiMaxRatio = Some(0.05))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(open.contains(999999L),
      "the injected doc must pass the non-PII gates (the clip is what drops it)")
    assert(clipped == open - 999999L,
      "the ceiling must drop exactly the PII-heavy doc")
  }

  test("tx_gopher rules: each signal trips on its own injected violator") {
    import spark.implicits._
    val good = Seq.fill(15)("the fast scan and a slow merge of the row").mkString(" ")
    val docs = Seq(
      (1L, good), // passes everything
      (2L, "the a of and"), // word_count 4 < 50
      (3L, Seq.fill(30)("a I " + "supercalifragilistic" * 3).mkString(" ")), // mwl > 10
      (4L, good + " " + Seq.fill(20)("#").mkString(" ")), // symbols
      (5L, (1 to 20).map(i => s"- item $i the a of and fast scan").mkString("\n")), // bullets
      (6L, (1 to 20).map(i => s"the a of and fast scan row $i...").mkString("\n")), // ellipses
      (7L, good + " " + Seq.fill(60)("12345").mkString(" ")), // alpha < 0.8
      (8L, Seq.fill(60)("fast slow merge scan").mkString(" "))) // no stopwords
      .toDF("doc_id", "text")
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"tx_gopher_spec_${System.nanoTime()}").getPath
    docs.write.parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.gopher(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("gopher_pass"), out(1L).toString)
    for (d <- 2L to 8L)
      assert(!out(d).getAs[Boolean]("gopher_pass"), s"doc $d must fail: ${out(d)}")
    // and each fails for ITS OWN signal
    assert(out(2L).getAs[Long]("word_count") < 50)
    assert(out(3L).getAs[Double]("mean_word_len") > 10.0)
    assert(out(4L).getAs[Double]("symbol_ratio") >= 0.1)
    assert(out(5L).getAs[Double]("bullet_ratio") >= 0.9)
    assert(out(6L).getAs[Double]("ellipsis_ratio") >= 0.3)
    assert(out(7L).getAs[Double]("alpha_ratio") < 0.8)
    assert(out(8L).getAs[Long]("stop_hits") < 2)
    // driver-corpus shape, measured: the clean word salad trips only
    // the word-count floor and (for stopword-free draws) the stopword
    // minimum; the punctuation/alpha signals are clean on every doc,
    // and both outcomes occur
    val corpus = TextAnalysis.gopher(spark, sf).collect()
    assert(corpus.exists(_.getAs[Boolean]("gopher_pass")))
    assert(corpus.exists(r => !r.getAs[Boolean]("gopher_pass")))
    corpus.foreach { r =>
      assert(r.getAs[Boolean]("gopher_pass") ==
        (r.getAs[Long]("word_count") >= 50 && r.getAs[Long]("stop_hits") >= 2),
        s"only the word floor / stopword minimum may trip here: $r")
      assert(r.getAs[Double]("symbol_ratio") == 0.0 &&
        r.getAs[Double]("bullet_ratio") == 0.0 &&
        r.getAs[Double]("ellipsis_ratio") == 0.0 &&
        r.getAs[Double]("alpha_ratio") == 1.0)
    }
  }

  test("tx_rep battery: hand-computed fractions on fixed payloads") {
    import spark.implicits._
    val docs = Seq(
      // 3 kept lines, one duplicated; tokens aa bb cc aa bb cc dd
      (1L, "aa bb cc\naa bb cc\ndd"),
      // an 11-token stream with one repeated 5-token phrase
      (2L, "x1 x2 x3 x4 x5 y x1 x2 x3 x4 x5"),
      // 8 identical tokens: overlapping dup 5-grams must union, and
      // the overlap-counted top fraction may legitimately exceed 1
      (3L, "a a a a a a a a"),
      // a duplicated paragraph (and nothing else repeated at n >= 5)
      (4L, "p q r\n\ns t u v\n\np q r"))
      .toDF("doc_id", "payload")
    val out = graft.operators.TextAnalysis.repetitionSignals(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    def d(id: Long, c: String) = out(id).getAs[Double](c)
    // doc 1: lines [8,8,2] chars, dup mass 8/18; normalized 20 chars;
    // top 2-gram "aa bb"x2 (len 5) = 10/20; top 3-gram 16/20; the
    // 4-grams are all singletons so the top is 1 x 11 chars
    assert(d(1L, "dup_line_frac") == 0.3333 &&
      d(1L, "dup_line_char_frac") == 0.4444)
    assert(d(1L, "dup_para_frac") == 0.0 && d(1L, "dup_para_char_frac") == 0.0)
    assert(d(1L, "top_2gram_frac") == 0.5 && d(1L, "top_3gram_frac") == 0.8 &&
      d(1L, "top_4gram_frac") == 0.55)
    assert((5 to 10).forall(n => d(1L, s"dup_${n}gram_frac") == 0.0))
    // doc 2: the repeated 5-gram covers [0,14) and [17,31) of 31
    // normalized chars = 28/31; no dup at n >= 6
    assert(d(2L, "dup_5gram_frac") == 0.9032)
    assert((6 to 10).forall(n => d(2L, s"dup_${n}gram_frac") == 0.0))
    // doc 3: four overlapping copies of "a a a a a" union to the whole
    // 15-char stream; the top 2-gram is overlap-counted (7 x 3 chars)
    assert(d(3L, "dup_5gram_frac") == 1.0)
    assert(d(3L, "top_2gram_frac") == 1.4)
    assert(!out(3L).getAs[Boolean]("rep_pass"))
    // doc 4: paragraphs [5,7,5] chars with 5 duplicated; the single-\n
    // split's empty entries drop, leaving 3 lines (1 duplicated)
    assert(d(4L, "dup_para_frac") == 0.3333 &&
      d(4L, "dup_para_char_frac") == 0.2941)
    assert(d(4L, "dup_line_frac") == 0.3333)
  }

  test("tx_rep driver injections: every axis drawn AND gated off") {
    val out = TextAnalysis.repetition(spark, sf).collect()
    // md5-gated per axis: each repetition class appears somewhere and
    // is absent somewhere (the zero draw proves the gate is live)
    for (c <- Seq("dup_line_frac", "dup_para_frac", "dup_5gram_frac")) {
      assert(out.exists(_.getAs[Double](c) > 0.0), s"$c never drawn")
      assert(out.exists(_.getAs[Double](c) == 0.0), s"$c never gated off")
    }
    // the 3x-repeated 8-token phrase has period 8 over 24 tokens:
    // whenever the phrase gate draws, EVERY n in 5..10 sees dup mass
    val g = out.filter(_.getAs[Double]("dup_10gram_frac") > 0.0)
    assert(g.nonEmpty)
    g.foreach { r =>
      (5 to 10).foreach(n =>
        assert(r.getAs[Double](s"dup_${n}gram_frac") > 0.0, r.toString))
    }
    assert(out.forall { r =>
      (5 to 10).forall(n => r.getAs[Double](s"dup_${n}gram_frac") <= 1.0) &&
        r.getAs[Double]("dup_line_frac") < 1.0
    })
    assert(out.exists(_.getAs[Boolean]("rep_pass")) &&
      out.exists(!_.getAs[Boolean]("rep_pass")),
      "both pass outcomes must occur on the injected corpus")
  }

  test("ol_moving: trailing-30-day RANGE frame hand-pinned; same-day ties need no order") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(
      java.time.LocalDate.ofEpochDay(day.toLong).atStartOfDay())
    // customer 1: days 0, 10, 35, 40 — day 35 still sees day 10
    // (35-29=6 <= 10), day 40 does not (40-29=11 > 10); customer 2:
    // two SAME-DAY orders — the value-based frame includes both in
    // both rows, no tiebreak involved
    val orders = Seq(
      (101L, 1L, "O", 1.0, ts(0), "1-URGENT"),
      (102L, 1L, "O", 2.0, ts(10), "1-URGENT"),
      (103L, 1L, "O", 4.0, ts(35), "1-URGENT"),
      (104L, 1L, "O", 8.0, ts(40), "1-URGENT"),
      (201L, 2L, "F", 5.0, ts(100), "2-HIGH"),
      (202L, 2L, "F", 7.0, ts(100), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"ol_moving_${System.nanoTime()}").getPath
    orders.write.parquet(s"$dir/orders.parquet")
    val got = Relational.movingWindow(spark, dir).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        (r.getAs[Long]("mov_cnt"), r.getAs[Double]("mov_rev"))).toMap
    assert(got(101L) == (1L, 1.0))
    assert(got(102L) == (2L, 3.0))
    assert(got(103L) == (2L, 6.0), got(103L).toString)
    assert(got(104L) == (2L, 12.0), got(104L).toString)
    assert(got(201L) == (2L, 12.0) && got(202L) == (2L, 12.0),
      "same-day peers must both see the full frame")
  }

  test("curate gopherRules/c4Rules gates compose: battery verdicts decide membership") {
    import spark.implicits._
    // gopher gate on the raw corpus: exactly the gopher_pass docs of
    // the open set survive (the battery and the gate share one unit)
    val open = TextAnalysis.curate(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val passes = TextAnalysis.gopher(spark, sf).collect()
      .filter(_.getAs[Boolean]("gopher_pass")).map(_.getAs[Long]("doc_id")).toSet
    val gated = TextAnalysis.curate(spark, sf, None, gopherRules = true)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(gated == (open & passes), s"gated=${gated.size} open=${open.size}")
    assert(gated != open, "the word-count floor must bite on the salad corpus")
    // c4 gate: the raw corpus has no terminal punctuation, so ONLY a
    // crafted doc with 3 kept sentence-lines (that also passes the
    // language/quality/dedup gates) survives
    val body = Seq.fill(12)("the cat and the dog are with a friend " +
      "because it is good that they have the time").mkString(" ")
    val crafted = body + "\nthis line ends with a period one.\n" +
      "this line ends with a period two.\nthis line ends with a period three."
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    val extra = spark.createDataFrame(Seq(
      (888888L, crafted, "en", "web", crafted.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"tx_c4_curate_${System.nanoTime()}").getPath
    docs.unionByName(extra).write.parquet(s"$dir/documents.parquet")
    val c4Open = TextAnalysis.curate(spark, dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(c4Open.contains(888888L), "the crafted doc must pass the open gates")
    val c4Gated = TextAnalysis.curate(spark, dir, None, c4Rules = true)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(c4Gated == Set(888888L),
      s"only the sentence-lined doc may survive c4Rules: $c4Gated")
    // r17: the blocklist is an actual CONFIG seam — a file-loaded
    // caller list naming a word of the crafted doc flips its verdict,
    // while the driver default stays the oracle-pinned stand-in
    val blPath = new java.io.File(sys.props("java.io.tmpdir"),
      s"c4_blocklist_${System.nanoTime()}.txt").getPath
    java.nio.file.Files.writeString(java.nio.file.Paths.get(blPath),
      "# corpus-specific bad words\nPERIOD\n\n")
    val loaded = TextAnalysis.loadBlocklist(blPath)
    assert(loaded == Seq("period"),
      s"loader must trim/lowercase/drop comments: $loaded")
    val blGated = TextAnalysis.curate(spark, dir, None, c4Rules = true,
      c4Blocklist = loaded).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(blGated.isEmpty,
      s"the swapped blocklist must drop the crafted doc too: $blGated")
    // loud edges: a missing or word-free file must not silently pass
    // every page
    intercept[Exception](TextAnalysis.loadBlocklist(blPath + ".missing"))
    val emptyPath = blPath + ".empty"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(emptyPath), "# only comments\n\n")
    assert(intercept[IllegalArgumentException] {
      TextAnalysis.loadBlocklist(emptyPath)
    }.getMessage.contains("no words"))
  }

  test("tx_c4 battery: a plain-Scala replay of every rule matches the operator") {
    import spark.implicits._
    val texts = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = TextAnalysis.c4(spark, sf).collect()
    assert(out.length == texts.size)
    var keeps = 0
    out.foreach { r =>
      val text = texts(r.getAs[Long]("doc_id"))
      val h = md5hex(text)
      def gate(pos: Int, m: Int, v: Int) =
        Integer.parseInt(h.substring(pos - 1, pos + 1), 16) % m == v
      val lines = Seq(
        Some(text.take(40) + " end of part one."),
        Some("too short."),
        Some(text.slice(40, 70)),
        if (gate(1, 2, 0))
          Some(s"the second sentence arrives here ${h.take(6)}.") else None,
        if (gate(3, 2, 0))
          Some(s"a third sentence lands too ${h.slice(6, 12)}.") else None,
        if (gate(5, 2, 0))
          Some("please enable javascript to view this content.") else None,
        if (gate(7, 4, 0)) Some("lorem ipsum dolor sit amet.") else None,
        if (gate(9, 4, 0)) Some("config { display }") else None,
        if (gate(11, 4, 0))
          Some("the forum post mentions xbadword openly.") else None
      ).flatten
      val payload = lines.mkString("\n")
      val kept = lines.filter(l => l.replaceAll("\\s+$", "")
        .matches("""(?s).*[.!?"]$""") &&
        l.trim.split("\\s+").length >= 5 &&
        !l.toLowerCase.contains("javascript"))
      assert(r.getAs[Long]("n_lines") == lines.size, r.toString)
      assert(r.getAs[Long]("kept_lines") == kept.size, r.toString)
      assert(r.getAs[Long]("js_lines") ==
        lines.count(_.toLowerCase.contains("javascript")), r.toString)
      assert(r.getAs[Boolean]("has_lorem") ==
        payload.toLowerCase.contains("lorem ipsum"))
      assert(r.getAs[Boolean]("has_brace") ==
        (payload.contains("{") || payload.contains("}")))
      assert(r.getAs[Boolean]("has_badword") ==
        TextAnalysis.C4Blocklist.exists(payload.toLowerCase.contains))
      assert(r.getAs[String]("clean_md5") == md5hex(kept.mkString("\n")))
      val keep = kept.size >= 3 && !r.getAs[Boolean]("has_lorem") &&
        !r.getAs[Boolean]("has_brace") && !r.getAs[Boolean]("has_badword")
      assert(r.getAs[Boolean]("c4_keep") == keep, r.toString)
      if (keep) keeps += 1
    }
    // the md5 gates draw both verdicts and every drop reason
    assert(keeps > 0 && keeps < out.length)
    assert(out.exists(_.getAs[Boolean]("has_lorem")))
    assert(out.exists(_.getAs[Boolean]("has_brace")))
    assert(out.exists(_.getAs[Boolean]("has_badword")))
    assert(out.exists(_.getAs[Long]("js_lines") > 0))
  }

  test("tx_selfrep ratios are consistent fractions") {
    val rows = TextAnalysis.selfrep(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val (n, rep) = (r.getAs[Long]("n_ngrams"), r.getAs[Long]("n_repeated"))
      val ratio = r.getAs[Double]("rep_ratio")
      rep >= 0 && rep <= n && ratio >= 0.0 && ratio <= 1.0
    })
  }

  test("tx_dsir scores only the training pool with finite weights") {
    val rows = TextAnalysis.dsir(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("doc_id") % TextAnalysis.ContamBenchMod != 0))
    assert(rows.forall(r => !r.getAs[Double]("dsir_w").isNaN &&
      !r.getAs[Double]("dsir_w").isInfinite))
  }

  test("mm_phash pairs are ordered and hamming-bounded") {
    val rows = Multimodal.phash(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("a_id") < r.getAs[Long]("b_id") &&
      r.getAs[Long]("hamming") <= Multimodal.PhashMaxHamming))
  }

  test("dd_minhash results all meet the jaccard threshold") {
    val mins = Dedup.minhashLsh(spark, sf).agg(min("j_r")).head().getDouble(0)
    assert(mins >= Dedup.JaccardThreshold)
  }

  test("dd_incr plan: broadcast band join, no cartesian, subsets disjoint, threshold met") {
    // the incremental check must never cross the corpus with the batch
    // (or itself): candidates come from a band equi-join whose NEW side
    // broadcasts — the O(new)-per-batch shape is the operator's point.
    // Pinned on the LAZY plan (the public entry materializes, which
    // truncates lineage)
    val plan = Dedup.incrementalPairsPlan(spark, sf)
      .queryExecution.executedPlan
    assert(plan.toString.contains("BroadcastHashJoin"),
      "the band join must broadcast the new batch's band keys")
    assert(!plan.toString.contains("CartesianProduct"),
      "no all-pairs cross product anywhere in the incremental check")
    val rows = Dedup.incrementalPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("new_id") % 10 == 0 &&
      r.getAs[Long]("base_id") % 10 != 0))
    assert(rows.forall(_.getAs[Double]("j_r") >= Dedup.JaccardThreshold))
  }

  test("dd_simhash hamming bounded and symmetric-free (a < b)") {
    val rows = Dedup.simhashPairs(spark, sf).collect()
    assert(rows.forall(r => r.getAs[Long]("hamming") <= Dedup.HammingMax))
    assert(rows.forall(r => r.getAs[Long]("a_id") < r.getAs[Long]("b_id")))
  }

  test("tx_curate output respects every gate") {
    val curated = TextAnalysis.curate(spark, sf)
    val rows = curated.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("en", "es")(r.getAs[String]("lang_pred"))))
    assert(rows.forall(_.getAs[Double]("quality_r") >= 0.25))
    val losers = Dedup.minhashLsh(spark, sf)
      .select(col("b_id")).collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => !losers(r.getAs[Long]("doc_id"))),
      "near-dup losers must not survive curation")
  }

  test("tx_shard packs within budget given max doc size") {
    val rows = TextAnalysis.shard(spark, sf).collect()
    val maxDoc = rows.map(_.getAs[Long]("n_tokens")).max
    val byShard = rows.groupBy(r =>
      (r.getAs[String]("source"), r.getAs[Long]("shard_id")))
    byShard.foreach { case ((src, sid), docs) =>
      val total = docs.map(_.getAs[Long]("n_tokens")).sum
      assert(total < TextAnalysis.ShardBudget + maxDoc,
        s"shard $src/$sid holds $total tokens")
    }
    // shards fill in order: ids are dense from 0 per source
    byShard.keys.groupBy(_._1).foreach { case (_, keys) =>
      val ids = keys.map(_._2).toSeq.sorted
      assert(ids == (0L until ids.length))
    }
  }

  test("dd_semdedup plan: broadcast seed assignment, equi-join pairs, no shuffled cartesian") {
    val plan = Dedup.semdedup(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      "the seed assignment must broadcast the centroid frame")
    assert(!plan.contains("CartesianProduct"),
      "the within-cluster pair stage must be an equi-join on cl, " +
        s"never a shuffled cartesian:\n$plan")
  }

  test("tx_pack spans tile the per-source token stream exactly") {
    val rows = TextAnalysis.pack(spark, sf).collect()
    val L = TextAnalysis.SeqLen
    rows.foreach { r =>
      val (n, pos, nSeqs) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("pos_in_seq"), r.getAs[Long]("n_seqs"))
      assert(pos >= 0 && pos < L)
      // span accounting: crossing count derives from (pos, n) alone
      assert(nSeqs == (pos + n - 1) / L + 1, s"row $r")
    }
    // docs tile each source contiguously: next doc starts exactly
    // where the previous ended (seq_first·L + pos advances by n_tokens)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, ds) =>
      val sorted = ds.sortBy(_.getAs[Long]("doc_id"))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        val endA = a.getAs[Long]("seq_first") * L +
          a.getAs[Long]("pos_in_seq") + a.getAs[Long]("n_tokens")
        val startB = b.getAs[Long]("seq_first") * L + b.getAs[Long]("pos_in_seq")
        assert(endA == startB, s"gap between ${a} and ${b}")
      }
      assert(sorted.head.getAs[Long]("seq_first") == 0 &&
        sorted.head.getAs[Long]("pos_in_seq") == 0)
    }
  }

  test("tx_pack plan: the prefix sum is partition-distributed, never one window task per source") {
    // the running sum must ride (pid, source) — a Window partitioned
    // by source alone serializes a dominant source's whole doc list
    // into a single straggler task at 100 TB
    val (spans, base) = TextAnalysis.packFrame(spark, sf)
    try {
      spans.collect()
      val plan = spans.queryExecution.executedPlan.toString
      val winSpecs = "windowspecdefinition\\(([^)]*)\\)".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(winSpecs.nonEmpty, s"expected a Window node:\n$plan")
      winSpecs.foreach(sp =>
        assert(sp.contains("pid#"),
          s"window partition spec must include the range-partition id, got: $sp"))
      // and the distributed form must agree with the one-window oracle
      // shape row-for-row (the CORRECTNESS gate pins it against DuckDB;
      // this is the in-suite twin)
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions._
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val L = TextAnalysis.SeqLen
      val oracle = Tables.load(spark, sf, "documents")
        .select(col("source"), col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .select(col("source"), col("doc_id"), col("n_tokens"),
          expr(s"(cum - n_tokens) div $L").as("seq_first"),
          expr(s"(cum - n_tokens) % $L").as("pos_in_seq"),
          expr(s"(cum - 1) div $L - (cum - n_tokens) div $L + 1").as("n_seqs"))
        .collect().map(_.toSeq).toSet
      assert(spans.collect().map(_.toSeq).toSet == oracle,
        "distributed prefix sum must be value-identical to the single-window form")
    } finally base.unpersist(blocking = false)
  }

  test("ol_retention plan: ONE events scan feeds both the cohort and the matrix") {
    val restoreAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Relational.retention(spark, sf)
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.metadata.get("Location").exists(_.contains("events")) => f
      }
      assert(scans.length == 1,
        s"retention must scan events exactly once, found ${scans.length}:\n" +
          df.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", restoreAqe)
  }

  test("sessionize covers every event exactly once") {
    val total = Relational.sessionize(spark, sf).agg(sum("n_events")).head().getLong(0)
    val events = Tables.load(spark, sf, "events").count()
    assert(total == events)
  }

  test("asof match is never later than the event") {
    val bad = Relational.asofJoin(spark, sf)
      .join(Tables.load(spark, sf, "events").select("event_id", "ts"), "event_id")
      .filter(col("o_orderdate") > col("ts")).count()
    assert(bad == 0)
  }

  test("chunks reassemble to full documents (stride < size overlap)") {
    val c = VectorStore.chunk(spark, sf)
    // every doc's chunk 0 starts the text; lengths bounded by ChunkSize
    assert(c.filter(col("chunk_len") > VectorStore.ChunkSize).count() == 0)
    val docs = Tables.load(spark, sf, "documents").count()
    assert(c.filter(col("chunk_id") === 0).count() == docs)
  }

  // ---- broadcast-boundedness pins: no operator may FORCE a broadcast
  // of a frame that grows with the corpus. A forced hint removes AQE's
  // freedom to fall back to a shuffle join, which at 100× data is the
  // difference between a slow join and a driver/executor OOM. ----

  /** Every ResolvedHint subtree in the analyzed plan — the frames the
    * operator FORCES to broadcast (AQE's own choices don't appear
    * here, which is exactly the distinction the pins assert). */
  private def hintSubtrees(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint =>
        h.child.toString
    }

  test("tx_curate plan: the near-dup loser anti-join carries no forced broadcast") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    val df = TextAnalysis.curate(spark, sf)
    val anti = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == LeftAnti => j
    }
    assert(anti.nonEmpty, "curate must anti-join the loser set")
    anti.foreach(j => assert(j.hint.leftHint.isEmpty && j.hint.rightHint.isEmpty,
      s"loser set is corpus-sized: the anti-join must stay unhinted, got ${j.hint}"))
  }

  test("tx_tfidf plan: the full-vocabulary df frame is never force-broadcast") {
    val ranked = TextAnalysis.tfidfRanked(spark, sf)
    hintSubtrees(ranked).foreach(s =>
      assert(!s.contains("AS df#"),
        s"vocabulary grows with the corpus — dfreq must stay unhinted:\n$s"))
    // round-16 shape: term counts are a narrow run-length encode — the
    // plan must carry NO aggregate keyed by (doc_id, token)
    val aggs = ranked.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.groupingExpressions.length
    }
    assert(!aggs.contains(2),
      s"tf must come from the per-row run-length encode, not a corpus groupBy: $aggs")
  }

  test("tx_ppl plan: every forced broadcast derives from the bounded top-V vocabulary") {
    val (scored, persisted) =
      TextAnalysis.pplScored(spark, sf, TextAnalysis.PplGateV)
    try {
      val hinted = hintSubtrees(scored)
      assert(hinted.nonEmpty, "ppl should broadcast its bounded LM frames")
      hinted.foreach(s => assert(s.contains("GlobalLimit"),
        s"broadcast frame does not derive from the top-V limit (unbounded LM?):\n$s"))
      // the GlobalLimit test alone is too weak: the BIGRAM count frame
      // also descends from the top-V join yet has a (V+1)² key space —
      // it must never carry a hint (it joins unhinted; AQE decides)
      hinted.foreach(s => assert(!s.contains("AS c_bg#"),
        s"the bigram-keyed LM frame must stay unhinted ((V+1)² keys):\n$s"))
    } finally persisted.foreach(_.unpersist(blocking = false))
  }

  test("vs_hybrid plan: corpus term rows prune against query terms before any aggregation") {
    val (ranked, persisted) = HybridSearch.hybridRanked(spark, sf)
    try {
      // round-17 shape: NO full-vocabulary frame exists anywhere —
      // the corpus explode joins the broadcast distinct query-term
      // set inside the scan stage, and df is a PARTIAL-AGG groupBy
      // over the PRUNED frame (the r16 window-df concentrated a
      // stop-word term's rows on one task; HybridSearchSpec pins the
      // no-Window-over-term side). Here: the df aggregate must exist
      // AND sit above the query-term prune — a df aggregate whose
      // subtree lacks the broadcast prune would be the full-voc
      // abulary table the r16 rework removed.
      val plan = ranked.queryExecution.optimizedPlan
      val termAggs = plan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
            if a.groupingExpressions.length == 1 &&
              a.aggregateExpressions.exists(_.name == "df") => a
      }
      assert(termAggs.nonEmpty, "the partial-agg df node is missing")
      termAggs.foreach(a => assert(a.toString.contains("array_distinct"),
        "the df aggregate must sit above the query-term-pruned table " +
          "(its subtree must carry the broadcast distinct-query-term join)"))
      val winDf = plan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.windowExpressions.exists(_.name == "df") => w
      }
      assert(winDf.isEmpty,
        "df must never be a window over a corpus term partition (r16 hot-key)")
    } finally persisted.foreach(_.unpersist(blocking = false))
  }

  test("tx_ppl OOV machinery: a tighter cap collapses rarer tokens and changes scores") {
    // at V=5 most of the 31-term vocabulary funnels through <oov>;
    // n_bigrams must be unchanged (mapping never drops bigrams) while
    // scores shift — and V >= |vocab| must reproduce identity mapping
    val tight = TextAnalysis.pplTopV(spark, sf, 5).collect()
    val base = TextAnalysis.ppl(spark, sf).collect()
    assert(tight.length == base.length)
    val tB = tight.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bigrams")).toMap
    base.foreach(r =>
      assert(tB(r.getAs[Long]("doc_id")) == r.getAs[Long]("n_bigrams")))
    assert(tight.map(_.getAs[Double]("nll")).toSeq !=
      base.map(_.getAs[Double]("nll")).toSeq,
      "a 5-term vocabulary must perturb the LM scores")
    // the PRODUCTION default is CCNet-scale, not the test-gate cap: a
    // real corpus scored with ppl() must not collapse virtually every
    // token to <oov> (round-10 advice)
    assert(TextAnalysis.PplTopV >= 10000,
      s"production PplTopV regressed to a test-scale cap: ${TextAnalysis.PplTopV}")
    assert(TextAnalysis.PplGateV < 31,
      "the gate cap must stay below the synthetic vocabulary so the " +
        "oracle keeps exercising the OOV collapse")
  }
}
