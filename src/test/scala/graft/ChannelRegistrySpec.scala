package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{GraftVectorDB, VectorStore}

/** The channel registry (round-7): a training-data store has N
  * embedding spaces, not a hardcoded two. A declared channel (name →
  * content-type claim + encoder pair + dim) gets the ENTIRE lifecycle
  * surface — ingest-with-index-append, build, exact + ANN + PQ search,
  * takedown delete, scheduled maintenance — with no per-channel code.
  * Driven end-to-end here with a third "audio" space. */
class ChannelRegistrySpec extends AnyFunSuite {
  import SparkTestSession._

  private val dbDir = "target/vdb_channel_registry"
  private val q = "fast query join table"

  // a deterministic third space: the image-space hash family under a
  // distinct salt — genuinely different vectors from both built-ins,
  // the same drop-in seam a real audio model encoder would use
  private val audio = GraftVectorDB.ChannelDef("audio", Seq("audio"),
    c => VectorStore.embedImage(concat(lit("audio|"), c)),
    s => VectorStore.embedImageLocal("audio|" + s),
    VectorStore.ImageEmbedDim)

  private def rmRf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRf))
    f.delete()
  }

  private def audioRecords(ids: Column => Column): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    GraftVectorDB.pipeline(docs.filter(ids($"doc_id"))).filter($"page_num" === 0)
      .withColumn("content_type", lit("audio"))
      .withColumn("embedding", audio.encode($"content_raw"))
  }

  private lazy val db = {
    rmRf(new java.io.File(dbDir))
    val d = new GraftVectorDB(spark, dbDir)
    val docs = Tables.load(spark, sf, "documents")
    assert(d.ingest(docs.filter(col("doc_id") < 40)) > 0)
    d.registerChannel(audio)
    assert(d.ingestRecords(audioRecords(id => id >= 100 && id < 140)) > 0)
    d.buildAnnIndex(cells = 8, channel = "text")
    d.buildAnnIndex(cells = 4, channel = "audio")
    d
  }

  private def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
    (r.getAs[Long]("rnk"), r.getAs[Double]("sim_r"),
      r.getAs[String]("doc_name"), r.getAs[String]("content_id"))).toSeq

  test("registry contract: overlap, duplicates, dim mismatch, unknown names fail loudly") {
    assert(db.channelNames == Seq("text", "image", "audio"))
    intercept[IllegalArgumentException] { db.registerChannel(audio) }
    intercept[IllegalArgumentException] {
      db.registerChannel(audio.copy(name = "video")) // claims "audio" again
    }
    intercept[IllegalArgumentException] {
      db.registerChannel(GraftVectorDB.ChannelDef("video", Seq("video"),
        audio.encode, audio.encodeLocal, dim = 7)) // encoder yields 48
    }
    val e = intercept[IllegalArgumentException] { db.searchAnnIn("vdieo", q) }
    assert(e.getMessage.contains("audio"), "the error must list registered channels")
  }

  test("the third channel is searchable: exact scan, full-probe ANN parity, PQ parity") {
    import spark.implicits._
    val exact = db.searchIn("audio", q, 5)
    val rows = exact.collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[String]("channel") == "audio"))
    assert(rows.forall(_.getAs[String]("content_type") == "audio"))
    // its OWN space: the same query scores differently than text/image
    assert(key(db.searchAnn(q, 5, nProbe = 8).collect()) != key(rows))
    // full probe == exact; PQ exhaustive == exact
    assert(key(db.searchAnnIn("audio", q, 5, nProbe = 4).collect()) == key(rows))
    val n = spark.read.parquet(db.annPath("audio")).count().toInt
    assert(key(db.searchAnnPqIn("audio", q, 5, nProbe = 4, shortlist = n)
      .collect()) == key(rows))
    // and the text channel does NOT see audio rows (disjoint claims)
    assert(db.search(q, 50).collect()
      .forall(_.getAs[String]("content_type") != "audio"))
  }

  test("ingest routes appends into the third channel's index; drift accounting runs") {
    assert(db.annAppendFraction("audio") == 0.0)
    assert(db.ingestRecords(audioRecords(id => id >= 140 && id < 160),
      indexChannels = Seq("audio")) > 0)
    assert(db.annAppendFraction("audio") > 0.0, "appends must count against audio")
    // the appended rows serve from the index without a rebuild
    assert(key(db.searchAnnIn("audio", q, 5, nProbe = 4).collect()) ==
      key(db.searchIn("audio", q, 5).collect()))
  }

  test("a corpus-FITTED (non-hash) encoder channel serves end to end") {
    import spark.implicits._
    db // build the fixture (and its registry) first
    // FIT a real learned model from data: vocabulary + idf weights are
    // parameters estimated from the corpus, not a hash family — the
    // round-8 proof that the ChannelDef seam carries a genuine encoder
    val fitCorpus = Tables.load(spark, sf, "documents").filter($"doc_id" < 200)
    val tfidf = graft.operators.TfidfEncoder.fit(
      fitCorpus, "text", "tfidf", Seq("tfidf_doc"), dim = 24)
    // encode/encodeLocal parity on raw corpus text (the property the
    // one-job warm serving path depends on)
    val samples = fitCorpus.limit(20).select($"text").collect().map(_.getString(0))
    samples.foreach { s =>
      val inPlan = Seq(s).toDF("t").select(tfidf.encode($"t").as("v"))
        .head().getSeq[Double](0).toArray
      assert(inPlan.sameElements(tfidf.encodeLocal(s)),
        s"encode/encodeLocal diverge on: ${s.take(40)}")
    }
    // a fitted vector is NOT the hash-family embedding of either
    // built-in space: genuinely new geometry
    assert(!tfidf.encodeLocal(q).sameElements(VectorStore.embedTextLocal(q).take(24)))
    db.registerChannel(tfidf)
    val recs = GraftVectorDB.pipeline(
      Tables.load(spark, sf, "documents")
        .filter($"doc_id" >= 200 && $"doc_id" < 240))
      .filter($"page_num" === 0)
      .withColumn("content_type", lit("tfidf_doc"))
      .withColumn("embedding", tfidf.encode($"content_raw"))
    assert(db.ingestRecords(recs) > 0)
    db.buildAnnIndex(cells = 4, channel = "tfidf")
    val exact = db.searchIn("tfidf", q, 5).collect()
    assert(exact.length == 5 && exact.forall(_.getAs[String]("channel") == "tfidf"))
    assert(key(db.searchAnnIn("tfidf", q, 5, nProbe = 4).collect()) == key(exact),
      "full-probe ANN over the fitted space must equal its exact scan")
    val n = spark.read.parquet(db.annPath("tfidf")).count().toInt
    assert(key(db.searchAnnPqIn("tfidf", q, 5, nProbe = 4, shortlist = n)
      .collect()) == key(exact))
  }

  test("an LSA channel learns DENSE semantics: disjoint-vocab synonyms land close; bit-parity; serves end to end") {
    import spark.implicits._
    db // build the fixture (and its registry) first
    // a co-occurrence corpus: 'car' and 'automobile' never appear
    // together, but share their context words; 'banana' lives in a
    // different context. A bag-of-words encoder gives the one-word
    // docs "car" vs "automobile" cosine EXACTLY 0 (disjoint terms);
    // LSA must place them close because the fit corpus ties them to
    // the same latent component — the learned-semantics property that
    // separates a dense encoder from every hash/tfidf family
    // four synonym-pair clusters: at dim = 4 the kept eigenbasis is
    // the four cluster directions, and the within-pair DIFFERENCE
    // directions (whose retention would keep synonyms apart — LSA
    // merges by truncation, the projection does not weight by
    // singular value) fall outside the basis; the occasional doc
    // carrying both synonyms makes their covariance positive
    val clusters = Seq(
      ("car", "automobile", "engine wheel road drive"),
      ("banana", "mango", "fruit yellow peel sweet"),
      ("river", "stream", "water bank flow current"),
      ("piano", "violin", "music note play sound"))
    val fitDocs = (0 until 120).map { i =>
      val (a, b, ctx) = clusters(i % 4)
      val body = ((i / 4) % 3) match {
        case 0 => s"$a $ctx"
        case 1 => s"$b $ctx"
        case _ => s"$a $b $ctx"
      }
      (i.toLong, s"$body x$i")
    }.toDF("doc_id", "text")
    val lsa = graft.operators.LsaEncoder.fit(
      fitDocs, "text", "lsa", Seq("lsa_doc"), dim = 4, vocabSize = 24)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.max(1e-12, math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val car = lsa.encodeLocal("car")
    val auto = lsa.encodeLocal("automobile")
    val banana = lsa.encodeLocal("banana")
    assert(cos(car, auto) > 0.8,
      f"co-occurring synonyms must embed close, got ${cos(car, auto)}%.3f")
    assert(cos(car, banana) < 0.3,
      f"cross-context words must embed apart, got ${cos(car, banana)}%.3f")
    assert(cos(car, auto) > cos(car, banana) + 0.5)
    // refit determinism (sign canonicalization + LAPACK eigSym)
    val again = graft.operators.LsaEncoder.fit(
      fitDocs, "text", "lsa2", Seq("lsa_doc2"), dim = 4, vocabSize = 24)
    assert(again.encodeLocal("car engine road").sameElements(
      lsa.encodeLocal("car engine road")), "refit must be bit-stable")
    // Column/local bit-parity on raw corpus text — the warm serving
    // path's contract, same grid as every other encoder
    val samples = Tables.load(spark, sf, "documents").limit(12)
      .select($"text").collect().map(_.getString(0)) ++
      Seq("car", "automobile engine", "", " banana  fruit ")
    samples.foreach { s =>
      val inPlan = Seq(s).toDF("t").select(lsa.encode($"t").as("v"))
        .head().getSeq[Double](0).toArray
      assert(inPlan.sameElements(lsa.encodeLocal(s)),
        s"encode/encodeLocal diverge on: ${s.take(40)}")
    }
    // end to end through the registry: ingest → build → exact/ANN/PQ —
    // over docs IN the learned space (a doc with no vocab term embeds
    // to the zero vector, the degenerate case every fitted encoder
    // shares; production ingest filters those upstream)
    db.registerChannel(lsa)
    val recs = GraftVectorDB.pipeline(fitDocs
        .withColumn("lang", lit("en")).withColumn("source", lit("lsa")))
      .filter($"page_num" === 0)
      .withColumn("content_type", lit("lsa_doc"))
      .withColumn("embedding", lsa.encode($"content_raw"))
    assert(db.ingestRecords(recs) > 0)
    db.buildAnnIndex(cells = 4, channel = "lsa")
    val lq = "car engine road"
    val exact = db.searchIn("lsa", lq, 5).collect()
    assert(exact.length == 5 && exact.forall(_.getAs[String]("channel") == "lsa"))
    // the top hits are car-cluster docs — the learned space RANKS by
    // semantics, including automobile-only docs for a car query
    assert(exact.forall(r => clusters.take(1).exists { case (a, b, _) =>
      r.getAs[String]("content_raw").contains(a) ||
        r.getAs[String]("content_raw").contains(b) }),
      s"car-cluster docs must lead: ${exact.map(_.getAs[String]("content_raw")).toSeq}")
    assert(key(db.searchAnnIn("lsa", lq, 5, nProbe = 4).collect()) == key(exact),
      "full-probe ANN over the LSA space must equal its exact scan")
    val n = spark.read.parquet(db.annPath("lsa")).count().toInt
    assert(key(db.searchAnnPqIn("lsa", lq, 5, nProbe = 4, shortlist = n)
      .collect()) == key(exact))
  }

  test("LSA dual fit == primal fit; V=4096 fit never builds a V x V Gram, is bit-stable, and serves") {
    import spark.implicits._
    // (1) path equivalence where both run: the dual kernel fit must
    // reproduce the primal Gram eigenbasis (same truncated SVD, sign-
    // canonicalized) on the same data — pinned on real corpus text
    val docs = Tables.load(spark, sf, "documents").filter($"doc_id" < 150)
    val primal = graft.operators.LsaEncoder.fitPath(
      docs, "text", "lsap", Seq("p"), dim = 8, vocabSize = 24, forceDual = false)
    val dual = graft.operators.LsaEncoder.fitPath(
      docs, "text", "lsad", Seq("d"), dim = 8, vocabSize = 24, forceDual = true)
    val probes = docs.limit(10).select($"text").collect().map(_.getString(0))
    probes.foreach { s =>
      val a = primal.encodeLocal(s); val b = dual.encodeLocal(s)
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 2e-6,
          f"primal/dual diverge past the 6dp grid: $x%.7f vs $y%.7f") }
    }
    // (2) the scale path: a 5000-token universe, V=4096 (> DriverGramVocab
    // → dual; the V² Gram would be 128 MB, the kernel is n² ≤ 32 MB)
    val big = (0 until 600).map { i =>
      (i.toLong, (0 until 12).map(j => s"tok${(i * 31 + j * 577) % 5000}")
        .mkString(" "))
    }.toDF("doc_id", "text")
    assert(4096 > graft.operators.LsaEncoder.DriverGramVocab)
    val lsa = graft.operators.LsaEncoder.fit(
      big, "text", "lsa4k", Seq("lsa4k_doc"), dim = 16, vocabSize = 4096)
    val again = graft.operators.LsaEncoder.fit(
      big, "text", "lsa4k2", Seq("lsa4k_doc2"), dim = 16, vocabSize = 4096)
    val probe = "tok0 tok577 tok1154 tok31"
    assert(again.encodeLocal(probe).sameElements(lsa.encodeLocal(probe)),
      "V=4096 refit must be bit-stable")
    // in-plan parity at large V rides the fused native expression
    (probes.take(3) ++ Seq(probe, "")).foreach { s =>
      val inPlan = Seq(s).toDF("t").select(lsa.encode($"t").as("v"))
        .head().getSeq[Double](0).toArray
      assert(inPlan.sameElements(lsa.encodeLocal(s)),
        s"encode/encodeLocal diverge at V=4096 on: ${s.take(40)}")
    }
    // (3) the footer-stat-adaptive rule: Heaps-shaped, clamped to the
    // corpus's actual distinct-token count
    assert(graft.operators.LsaEncoder.adaptiveVocab(262144) == 4096)
    assert(graft.operators.LsaEncoder.adaptiveVocab(10) == 256)
    assert(graft.operators.LsaEncoder.adaptiveVocab(100000000L) == 65536)
    val small = (0 until 40).map(i => (i.toLong,
      s"alpha beta gamma delta w$i")).toDF("doc_id", "text")
    val ad = graft.operators.LsaEncoder.fitAdaptive(
      small, "text", "lsaad", Seq("ad"), dim = 4)
    assert(ad.encodeLocal("alpha beta").length == 4)
  }

  test("an SGNS channel learns paradigmatic semantics: HELD-OUT synonym pairs beat the LSA bound; bit-parity; serves end to end") {
    import spark.implicits._
    db // build the fixture (and its registry) first
    // the HARDER corpus than the LSA test's: synonym pairs NEVER
    // co-occur in any fit document (no mixed docs — the pairs are held
    // out of the fit's co-occurrence evidence entirely); the only tie
    // is the shared CONTEXT words. LSA's term-document factorization
    // at serving dim keeps within-pair difference directions, while
    // SGNS's sliding-window objective ties each synonym to the same
    // context vectors directly — the word2vec property the reference's
    // neural encoders inherit
    val clusters = Seq(
      ("car", "automobile", "engine wheel road drive"),
      ("banana", "mango", "fruit yellow peel sweet"),
      ("river", "stream", "water bank flow current"),
      ("piano", "violin", "music note play sound"))
    val fitDocs = (0 until 160).map { i =>
      val (a, b, ctx) = clusters(i % 4)
      val w = if ((i / 4) % 2 == 0) a else b
      (i.toLong, s"$w $ctx x$i")
    }.toDF("doc_id", "text")
    val sgns = graft.operators.SgnsEncoder.fit(
      fitDocs, "text", "sgns", Seq("sgns_doc"),
      dim = 16, vocabSize = 24, epochs = 40, seed = 7)
    // the LSA reference fit: SAME corpus, SAME vocab, SAME serving dim
    val lsaRef = graft.operators.LsaEncoder.fit(
      fitDocs, "text", "lsaref", Seq("lsaref_doc"), dim = 16, vocabSize = 24)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.max(1e-12, math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val sgnsCos = clusters.map { case (a, b, _) =>
      cos(sgns.encodeLocal(a), sgns.encodeLocal(b)) }
    val lsaCos = clusters.map { case (a, b, _) =>
      cos(lsaRef.encodeLocal(a), lsaRef.encodeLocal(b)) }
    sgnsCos.zip(clusters).foreach { case (c, (a, b, _)) =>
      assert(c > 0.8, f"held-out pair ($a,$b) must embed close, got $c%.3f") }
    assert(sgnsCos.sum / 4 > lsaCos.sum / 4,
      f"SGNS must beat LSA on the held-out pairs: " +
        f"sgns=${sgnsCos.sum / 4}%.3f lsa=${lsaCos.sum / 4}%.3f")
    // cross-context words stay apart — word-vector cosines carry a
    // positive background (shared negative-sampling geometry), so the
    // absolute bound is looser than LSA's orthogonal-basis 0.3; the
    // MARGIN is the discriminative contract
    val cross = cos(sgns.encodeLocal("car"), sgns.encodeLocal("banana"))
    assert(cross < 0.5, f"cross-context words must embed apart, got $cross%.3f")
    assert(sgnsCos.min > cross + 0.5,
      f"synonym/cross margin collapsed: ${sgnsCos.min}%.3f vs $cross%.3f")
    // refit determinism (seeded sequential SGD — bit-stable)
    val again = graft.operators.SgnsEncoder.fit(
      fitDocs, "text", "sgns2", Seq("sgns_doc2"),
      dim = 16, vocabSize = 24, epochs = 40, seed = 7)
    assert(again.encodeLocal("car engine road").sameElements(
      sgns.encodeLocal("car engine road")), "refit must be bit-stable")
    // Column/local bit-parity on raw corpus text — the warm serving
    // path's contract, same grid as every other encoder
    val samples = Tables.load(spark, sf, "documents").limit(12)
      .select($"text").collect().map(_.getString(0)) ++
      Seq("car", "automobile engine", "", " banana  fruit ")
    samples.foreach { s =>
      val inPlan = Seq(s).toDF("t").select(sgns.encode($"t").as("v"))
        .head().getSeq[Double](0).toArray
      assert(inPlan.sameElements(sgns.encodeLocal(s)),
        s"encode/encodeLocal diverge on: ${s.take(40)}")
    }
    // end to end through the registry: ingest → build → exact/ANN/PQ
    db.registerChannel(sgns)
    val recs = GraftVectorDB.pipeline(fitDocs
        .withColumn("lang", lit("en")).withColumn("source", lit("sgns")))
      .filter($"page_num" === 0)
      .withColumn("content_type", lit("sgns_doc"))
      .withColumn("embedding", sgns.encode($"content_raw"))
    assert(db.ingestRecords(recs) > 0)
    db.buildAnnIndex(cells = 4, channel = "sgns")
    val sq = "car engine road"
    val exact = db.searchIn("sgns", sq, 5).collect()
    assert(exact.length == 5 && exact.forall(_.getAs[String]("channel") == "sgns"))
    // the learned space RANKS by semantics: automobile-only docs
    // answer a car query even though the words never co-occurred
    assert(exact.forall(r => clusters.take(1).exists { case (a, b, _) =>
      r.getAs[String]("content_raw").contains(a) ||
        r.getAs[String]("content_raw").contains(b) }),
      s"car-cluster docs must lead: ${exact.map(_.getAs[String]("content_raw")).toSeq}")
    assert(key(db.searchAnnIn("sgns", sq, 5, nProbe = 4).collect()) == key(exact),
      "full-probe ANN over the SGNS space must equal its exact scan")
    val n = spark.read.parquet(db.annPath("sgns")).count().toInt
    assert(key(db.searchAnnPqIn("sgns", sq, 5, nProbe = 4, shortlist = n)
      .collect()) == key(exact))
  }

  test("takedown delete sweeps the third channel's index; maintain covers it") {
    import spark.implicits._
    val victim = spark.read.parquet(db.annPath("audio"))
      .select($"doc_name").orderBy($"doc_name").head().getString(0)
    assert(db.delete(Seq(victim)) > 0)
    assert(db.store.filter($"doc_name" === victim).count() == 0)
    assert(spark.read.parquet(db.annPath("audio"))
      .filter($"doc_name" === victim).count() == 0,
      "the registry sweep must clean the audio index")
    assert(key(db.searchAnnIn("audio", q, 5, nProbe = 4).collect()) ==
      key(db.searchIn("audio", q, 5).collect()))
    // scheduled maintenance on the third channel: the ladder runs and
    // serving stays exact afterwards
    val (_, _) = db.maintain("audio")
    assert(key(db.searchAnnIn("audio", q, 5,
      nProbe = db.annCellHistogram("audio").size).collect()) ==
      key(db.searchIn("audio", q, 5).collect()))
  }

  test("an EXTERNAL model file serves a channel end to end: load, three-way parity, ANN/PQ, batch bridge") {
    import spark.implicits._
    import graft.functions.expressions.{MlpModel, MlpEncode}
    import graft.operators.ExternalModelEncoder
    db // build the fixture (and its registry) first
    // a deterministic externally-authored net: 2 layers (tanh hidden),
    // weights from a seeded splitmix stream — standing in for a
    // checkpoint some training run exported into the GEM1 format
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
    val featDim = 96; val hid = 32; val dim = 24
    def layer(out: Int, in: Int, act: Int, seed: Long) = {
      val it = mix(seed)
      new MlpModel.Layer(out, in, act,
        Array.fill(out)(Array.fill(in)(it.next() / math.sqrt(in))),
        Array.fill(out)(it.next() * 0.1))
    }
    val model = new MlpModel(featDim, 7L,
      Array(layer(hid, featDim, 2, 11L), layer(dim, hid, 0, 23L)))
    val path = "target/ext_model.gem"
    ExternalModelEncoder.save(model, path)

    // loader validation: truncation and bad magic are loud
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(java.nio.file.Paths.get(path + ".trunc"),
      raw.take(raw.length - 9))
    assert(intercept[IllegalArgumentException] {
      ExternalModelEncoder.load(path + ".trunc")
    }.getMessage.contains("truncated"))
    java.nio.file.Files.write(java.nio.file.Paths.get(path + ".bad"),
      "nope".getBytes ++ raw.drop(4))
    assert(intercept[IllegalArgumentException] {
      ExternalModelEncoder.load(path + ".bad")
    }.getMessage.contains("bad magic"))

    // the file-loaded channel: registry end-to-end with ZERO
    // channel-specific code
    val ext = ExternalModelEncoder.channel(spark, "ext", Seq("ext_doc"), path)
    assert(ext.dim == dim)
    db.registerChannel(ext)
    val recs = GraftVectorDB.pipeline(
      Tables.load(spark, sf, "documents")
        .filter($"doc_id" >= 300 && $"doc_id" < 340))
      .filter($"page_num" === 0)
      .withColumn("content_type", lit("ext_doc"))
      .withColumn("embedding", ext.encode($"content_raw"))
    assert(db.ingestRecords(recs) > 0)
    db.buildAnnIndex(cells = 4, channel = "ext")
    val exact = db.searchIn("ext", q, 5).collect()
    assert(exact.length == 5 && exact.forall(_.getAs[String]("channel") == "ext"))
    assert(key(db.searchAnnIn("ext", q, 5, nProbe = 4).collect()) == key(exact),
      "full-probe ANN over the external space must equal its exact scan")
    val n = spark.read.parquet(db.annPath("ext")).count().toInt
    assert(key(db.searchAnnPqIn("ext", q, 5, nProbe = 4, shortlist = n)
      .collect()) == key(exact))

    // THREE-WAY parity on raw corpus text: in-plan Column ==
    // driver-local == mapPartitions batch bridge, bit-identical
    val samples = Tables.load(spark, sf, "documents")
      .filter($"doc_id" < 20).select($"doc_id", $"text")
    val inPlan = samples.select($"doc_id",
        MlpEncode(graft.functions.TextFunctions.tokens($"text"),
          spark.sparkContext.broadcast(model)).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val viaBatch = ExternalModelEncoder
      .embedBatch(samples, "text", "v", path, batchSize = 7)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Double](r.fieldIndex("v")).toArray).toMap
    val texts = samples.collect().map(r => r.getLong(0) -> r.getString(1))
    texts.foreach { case (id, t) =>
      val local = model.embed(t)
      assert(inPlan(id).sameElements(local), s"doc $id: in-plan != local")
      assert(viaBatch(id).sameElements(local), s"doc $id: batch != local")
    }
    // the external space is genuinely its own geometry
    assert(!model.embed(q).sameElements(VectorStore.embedTextLocal(q).take(dim)))
  }
}
