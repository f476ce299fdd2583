package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorFunctions._

/** Brute-force cosine top-k search — the reference's return_similar /
  * run_search surface (vector_db.py:615-759), re-shaped for scale.
  *
  * Layout: the query side is small (a user's search batch) and gets
  * `broadcast()`; the corpus side streams through the scan once with a
  * per-pair cosine expression — no shuffle of corpus rows to form
  * pairs. Ranking shuffles only (q_id, n_id, sim) tuples, which is
  * |corpus|·|queries| rows locally but at cluster scale is cut to k per
  * partition by the partial top-k aggregation path (see TopK notes in
  * SURVEY §5).
  *
  * Scores: double-precision cosine rounded to 4dp *before* ranking,
  * ties broken by neighbor id — deterministic and oracle-stable.
  */
object KnnSearch {

  /** (vec_id, v, nrm) with double vectors + precomputed norms. */
  private def vecs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.load(spark, dir, "embeddings"))
      .select($"vec_id", $"label", toDouble($"embedding").as("v"))
      .withColumn("nrm", l2Norm($"v"))
  }

  /** Rank pairs into per-query top-k via the partial aggregate
    * ([[graft.functions.expressions.TopKByScore]]) — each partition
    * contributes at most k candidates per query to the shuffle,
    * instead of the window-ranking form that exchanges every pair. */
  private[graft] def rankTopK(pairs: DataFrame, k: Int): DataFrame =
    pairs.groupBy(col("q_id"))
      .agg(graft.functions.expressions.TopKByScore(col("sim_r"), col("n_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.id").as("n_id"), col("col.score").as("sim_r"))

  /** KNN join through the logical operator ([[graft.plans.KnnJoinPlan]]
    * + the ResolveKnnJoin expansion rule) — requires a session built
    * `withExtensions(new GraftExtensions)`. Same contract and output
    * as the Column-API path. */
  def knnJoin(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    try {
      val df = ColumnBridge.ofRows(corpus.sparkSession,
        graft.plans.KnnJoinPlan(ColumnBridge.plan(corpus), ColumnBridge.plan(queries), k))
      df.queryExecution.analyzed // force analysis so a missing extension fails HERE
      df
    } catch {
      case e: Throwable if String.valueOf(e.getMessage).contains("KnnJoinPlan") =>
        throw new IllegalStateException(
          "knnJoin needs the graft extensions: build the session with " +
            ".withExtensions(new graft.GraftExtensions) or " +
            "spark.sql.extensions=graft.GraftExtensions", e)
    }
  }

  private def topK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    rankTopK(
      corpus.crossJoin(broadcast(queries))
        .select(col("q_id"), col("vec_id").as("n_id"),
          round(cosine(col("qv"), col("v"), col("qnrm"), col("nrm")), 4).as("sim_r")),
      k)

  private def queriesOf(v: DataFrame, n: Int): DataFrame =
    v.filter(col("vec_id") < n)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))

  /** Text-vs-text search: first 10 vectors as the query batch, the rest
    * as corpus (return_similar, vector_db.py:684-696). */
  def knn(spark: SparkSession, dir: String): DataFrame = {
    val v = vecs(spark, dir)
    topK(v.filter(col("vec_id") >= 10), queriesOf(v, 10), 5)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Search restricted by a metadata predicate — the reference's
    * search_location folder filter (get_search_range,
    * vector_db.py:673-682). The filter is applied *before* the join so
    * it pushes into the parquet scan. */
  def knnFiltered(spark: SparkSession, dir: String): DataFrame = {
    val v = vecs(spark, dir)
    topK(v.filter(col("vec_id") >= 10 && col("label") === 3), queriesOf(v, 10), 5)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Multimodal combined search: two stores (label partitions standing
    * in for the text/image stores), per-channel top-k, unioned with the
    * channel tag — run_search's text_image mode concatenating
    * text-vs-text and text-vs-image results (vector_db.py:656-671). */
  def searchMulti(spark: SparkSession, dir: String): DataFrame = {
    val v = vecs(spark, dir)
    val q = queriesOf(v, 10)
    val text = topK(v.filter(col("vec_id") >= 10 && col("label") < 5), q, 3)
      .withColumn("channel", lit("text"))
    val image = topK(v.filter(col("vec_id") >= 10 && col("label") >= 5), q, 3)
      .withColumn("channel", lit("image"))
    text.unionByName(image)
      .select(col("q_id"), col("channel"), col("rnk"), col("n_id"), col("sim_r"))
      .orderBy(col("q_id"), col("channel"), col("rnk"))
  }

  /** Cross-modal search with genuinely DISTINCT embedding spaces — the
    * reference's text→image search embeds the query with a CLIP *text*
    * encoder into the *image* space (run_image_search,
    * vector_db.py:738-759; clip_base_text_embedder :492-508). Here the
    * text channel lives in the 64-dim [[VectorStore.embedText]] space
    * and the image channel in the independent 48-dim
    * [[VectorStore.embedImage]] hash family; each query is encoded
    * once per channel. Corpus split: even doc_ids are text assets, odd
    * are image assets. Per-channel top-3, channel-tagged union. */
  def xmodal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.spread(Tables.load(spark, dir, "documents"))
    def corpus(embed: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
        parity: Int) =
      docs.filter($"doc_id" >= 10 && $"doc_id" % 2 === parity)
        .select($"doc_id".as("vec_id"), embed($"text").as("v"))
        .withColumn("nrm", l2Norm($"v"))
    def queries(embed: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      docs.filter($"doc_id" < 10)
        .select($"doc_id".as("q_id"), embed($"text").as("qv"))
        .withColumn("qnrm", l2Norm($"qv"))
    def channel(name: String,
        embed: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
        parity: Int) =
      rankTopK(
        corpus(embed, parity).crossJoin(broadcast(queries(embed)))
          .select($"q_id", $"vec_id".as("n_id"),
            round(cosine($"qv", $"v", $"qnrm", $"nrm"), 4).as("sim_r")), 3)
        .withColumn("channel", lit(name))
    channel("text", VectorStore.embedText, 0)
      .unionByName(channel("image", VectorStore.embedImage, 1))
      .select($"q_id", $"channel", $"rnk", $"n_id", $"sim_r")
      .orderBy($"q_id", $"channel", $"rnk")
  }

  /** Source manifest for hits: join hit ids back to document metadata —
    * generate_source_list (vector_db.py:903-916). The top-k result is
    * tiny, so it broadcasts into the documents join. */
  def sources(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hits = knn(spark, dir)
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source", $"lang")
    docs.join(broadcast(hits), docs("doc_id") === hits("n_id"))
      .select($"q_id", $"rnk", $"n_id", $"source", $"lang")
      .orderBy($"q_id", $"rnk")
  }

  /** MMR diversity re-rank — the result-diversification pass a RAG
    * retrieval layer runs so five near-identical chunks don't crowd
    * out coverage: greedy maximal marginal relevance over each query's
    * exact top-[[MmrPool]], score = round(0.6·sim(q,d) −
    * 0.4·max_{s∈S} sim(d,s), 4), ties to the lower n_id.
    *
    * Shapes for 100 TB: candidate generation is the bounded brute
    * top-k (broadcast queries, TopKByScore partial agg — ≤ pool rows
    * per query reach the shuffle); the greedy selection is inherently
    * sequential per query over ≤ pool² pairwise sims, so it runs as
    * `mapGroups` over bounded groups — the documented legitimate
    * imperative seam (typed Dataset, ~pool·k dot products per query,
    * no driver involvement). Weights 0.6/0.4 keep the 5th decimal
    * even, so the 4dp round never lands on a cross-engine half-tie
    * (oracle-parity rule). */
  val MmrPool = 20
  val MmrK = 5

  /** Late-interaction pool/result sizes and the fixed query batch.
    * The queries carry deliberately OOV-but-orthographically-near
    * tokens ("fastly" vs "fast") — the trigram token space grades
    * those, which is exactly what MaxSim re-ranking adds over the
    * whole-document embedding. */
  val LiPool = 20
  val LiK = 5
  val LiQueries: Seq[(Long, String)] = Seq(
    0L -> "fastly queried joins",
    1L -> "vectoring streamer hashing",
    2L -> "tabled scanning merges")

  /** 48-dim hashed char-trigram embedding of one `<`-padded token.
    * Bucket rule = first md5 byte mod dim — exactly
    * [[graft.functions.expressions.HashingCounts]]'s, and its
    * `normalized` rounding is `l2Normalize`'s 6dp HALF_UP, so the
    * native expression IS the formula the SQL oracle replays
    * (`conv(substr(md5(tri),1,2),16,10) % 48` = the first byte). It
    * replaced an equivalent 48-wide HOF tree whose per-run
    * optimize+codegen cost dominated the whole query: a constant
    * ~3.5 s of driver time at ANY corpus size (measured identical at
    * sf0.001 and sf0.1) — the expression-size trap, not a data cost. */
  private def tokenTrigramEmb(tok: Column): Column = {
    val padded = concat(lit("<"), tok, lit(">"))
    graft.functions.expressions.HashingCounts.normalized(
      transform(sequence(lit(0), length(padded) - 3),
        i => padded.substr(i + 1, lit(3))), 48)
  }

  /** vs_rerank_li — ColBERT-style LATE-INTERACTION re-rank (Khattab &
    * Zaharia 2020's MaxSim, re-expressed relationally): stage 1 pools
    * the top-[[LiPool]] documents per query by whole-document hash
    * embedding; stage 2 re-scores the pool at TOKEN level —
    * S(q, d) = Σ_{t∈q} max_{u∈d} cos(E(t), E(u)) over distinct
    * tokens in the 48-dim trigram space — and keeps the top-[[LiK]].
    *
    * Scale shape: the corpus is touched ONLY by the stage-1 scan
    * (one pass, query batch broadcast); everything token-level is
    * bounded by queries × pool — the pool frame broadcasts back into
    * the document fetch, the query-token frame broadcasts into the
    * MaxSim join, and the MaxSim row count is |pool| · |doc tokens| ·
    * |query tokens|, independent of corpus size. That is the ColBERT
    * serving economics: exhaustive interaction only over a candidate
    * pool someone cheaper already chose. */
  def rerankLate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    val docs = Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id", $"text")
    val docEmb = docs.select($"doc_id",
      VectorStore.embedText($"text").as("v"))
      .withColumn("nrm", l2Norm($"v"))
    val qDf = LiQueries.toDF("q_id", "qtext")
    val qEmb = qDf.select($"q_id", VectorStore.embedText($"qtext").as("qv"))
      .withColumn("qnrm", l2Norm($"qv"))
    val pool = rankTopK(
      docEmb.crossJoin(broadcast(qEmb))
        .select($"q_id", $"doc_id".as("n_id"),
          round(cosine($"qv", $"v", $"qnrm", $"nrm"), 4).as("sim_r")),
      LiPool)
    val dtok = docs.select($"doc_id".as("n_id"), $"text")
      .join(broadcast(pool.select($"q_id", $"n_id", $"sim_r")), "n_id")
      .select($"q_id", $"n_id", $"sim_r",
        explode(array_distinct(tokens($"text"))).as("tok"))
      .filter($"tok" =!= "")
      .withColumn("dv", tokenTrigramEmb($"tok"))
      .withColumn("dnrm", l2Norm($"dv"))
    val qtok = qDf
      .select($"q_id", explode(array_distinct(tokens($"qtext"))).as("qtok"))
      .withColumn("tv", tokenTrigramEmb($"qtok"))
      .withColumn("tnrm", l2Norm($"tv"))
    dtok.join(broadcast(qtok), "q_id")
      .select($"q_id", $"n_id", $"sim_r", $"qtok",
        round(cosine($"tv", $"dv", $"tnrm", $"dnrm"), 4).as("c"))
      .groupBy($"q_id", $"n_id", $"sim_r", $"qtok").agg(max($"c").as("mx"))
      .groupBy($"q_id", $"n_id", $"sim_r").agg(round(sum($"mx"), 4).as("li_r"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"li_r".desc, $"n_id")).cast("long"))
      .filter($"rnk" <= LiK)
      .select($"q_id", $"rnk", $"n_id", $"li_r", $"sim_r")
      .orderBy($"q_id", $"rnk")
  }

  def mmr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = vecs(spark, dir)
    val corpus = v.filter($"vec_id" >= 10)
    // re-attach candidate vectors: the POOL side (≤ queries·pool rows)
    // broadcasts into the corpus scan, never the reverse
    val pool = corpus.select($"vec_id".as("n_id"), $"v", $"nrm")
      .join(broadcast(rankTopK(
        corpus.crossJoin(broadcast(queriesOf(v, 10)))
          .select($"q_id", $"vec_id".as("n_id"),
            round(cosine($"qv", $"v", $"qnrm", $"nrm"), 4).as("sim_r")), MmrPool)), "n_id")
    pool.select($"q_id", $"n_id", $"sim_r", $"v", $"nrm")
      .as[(Long, Long, Double, Seq[Double], Double)]
      .groupByKey(_._1)
      .flatMapGroups { (qId, it) =>
        def r4(x: Double) =
          BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        val cand = it.toArray.sortBy { case (_, nId, simR, _, _) => (-simR, nId) }
        val vs = cand.map(_._4.toArray)
        def cos(i: Int, j: Int): Double = {
          var acc = 0.0; var d = 0
          val a = vs(i); val b = vs(j)
          while (d < math.min(a.length, b.length)) { acc += a(d) * b(d); d += 1 }
          r4(acc / (cand(i)._5 * cand(j)._5))
        }
        val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
        (1 to math.min(MmrK, cand.length)).map { step =>
          val best = cand.indices.filterNot(selected.contains).minBy { i =>
            val m =
              if (selected.isEmpty) r4(0.6 * cand(i)._3)
              else r4(0.6 * cand(i)._3 - 0.4 * selected.map(cos(i, _)).max)
            (-m, cand(i)._2)
          }
          val m =
            if (selected.isEmpty) r4(0.6 * cand(best)._3)
            else r4(0.6 * cand(best)._3 - 0.4 * selected.map(cos(best, _)).max)
          selected += best
          (qId, step.toLong, cand(best)._2, m)
        }
      }
      .toDF("q_id", "rnk", "n_id", "mmr_r")
      .orderBy($"q_id", $"rnk")
  }

  /** Left-to-right primitive dot — the closure twin of the codegen'd
    * [[graft.functions.expressions.DotProduct]] loop: identical
    * summation order, so values are bit-identical. */
  private[operators] def dotLocal(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0; var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** `round(x, 4)` exactly as Spark's Round evaluates it on DoubleType
    * (NaN/Infinity pass through; otherwise decimal HALF_UP on the
    * shortest-decimal form, i.e. `BigDecimal.valueOf`) — pinned
    * bit-identical to the Column form in KnnSpec. */
  private[graft] def round4(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Exact all-pairs cosine top-3 (self-excluded) — the brute-force ANN
    * baseline and the heavyweight bench workload (the declared
    * quadratic audit: n² rounded cosines by contract).
    *
    * r17 shape: the n² loop runs as a mapPartitions KERNEL over
    * primitive double arrays with the query matrix broadcast — the
    * same bytes the old plan's BroadcastExchange shipped — and each
    * partition emits only its top-3 candidates per query into the
    * unchanged [[rankTopK]] merge. The previous crossJoin form paid,
    * PER PAIR, the BroadcastNestedLoopJoin row machinery, an
    * interpreted TypedImperativeAggregate update, and — dominating
    * everything — a `BigDecimal.valueOf().setScale()` rounding
    * (4×10⁸ of them at sf1 ≈ the entire 26 s wall). The kernel
    * computes the identical raw cosine (same left-to-right dot, same
    * `qnrm*nrm` product), and rounds ONLY candidates that can still
    * enter that partition's rounded top-3: with the buffer's 3rd-best
    * rounded score s₃, any raw < s₃ − 1e-4 has round(raw) ≤ raw +
    * 0.51e-4 < s₃, so skipping it cannot change the buffer — every
    * surviving candidate is rounded with the exact Spark semantics
    * ([[round4]]) before insertion, and the per-partition buffers use
    * the same (score desc, id asc) comparator as the aggregate, so the
    * merged result is row-identical (oracle hash-checked; kernel-vs-
    * crossJoin parity pinned in KnnSpec). */
  def annBrute(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = vecs(spark, dir)
    val qRows = v.select($"vec_id", $"v").as[(Long, Array[Double])]
      .collect().sortBy(_._1)
    val qIds = qRows.map(_._1)
    val qVecs = qRows.map(_._2)
    val qNrms = qVecs.map(w => math.sqrt(dotLocal(w, w)))
    val bc = spark.sparkContext.broadcast((qIds, qVecs, qNrms))
    val cands = v.select($"vec_id", $"v").as[(Long, Array[Double])]
      .mapPartitions { it =>
        val (ids, qs, nrms) = bc.value
        val nq = ids.length
        val bufs = Array.fill(nq)(new graft.functions.expressions.TopKBuffer(3))
        it.foreach { case (vid, arr) =>
          val nrm = math.sqrt(dotLocal(arr, arr))
          var j = 0
          while (j < nq) {
            if (ids(j) != vid) {
              val raw = dotLocal(qs(j), arr) / (nrms(j) * nrm)
              val b = bufs(j)
              if (b.n < b.k || raw >= b.scores(b.k - 1) - 1e-4 ||
                  java.lang.Double.isNaN(raw))
                b.insert(round4(raw), vid)
            }
            j += 1
          }
        }
        (0 until nq).iterator.flatMap { j =>
          val b = bufs(j)
          (0 until b.n).map(i => (ids(j), b.ids(i), b.scores(i)))
        }
      }.toDF("q_id", "n_id", "sim_r")
    rankTopK(cands, 3).orderBy($"q_id", $"rnk")
  }
}
