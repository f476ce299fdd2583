package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every query is deterministic and totally ordered; every oracle is the
  * same computation in DuckDB SQL with bit-stable arithmetic (decimal
  * sums, md5 hashing, rounded similarity scores). Column names are
  * aligned pairwise.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricing(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ol_pricing" -> (Relational.pricing _),
    "ol_topcustomers" -> (Relational.topCustomers _),
    "ol_regionrev" -> (Relational.regionRevenue _),
    "ol_window" -> (Relational.windowTop _),
    "ol_moving" -> (Relational.movingWindow _),
    "ol_sessionize" -> (Relational.sessionize _),
    "ol_json" -> (Relational.jsonProps _),
    "ol_rollup" -> (Relational.rollupOrders _),
    "ol_percentile" -> (Relational.percentiles _),
    "ol_asof" -> (Relational.asofJoin _),
    "ol_range" -> (Relational.rangeJoin _),
    "ol_retention" -> (Relational.retention _),
    "ol_profile" -> (Relational.profile _),
    "ol_exists" -> (Relational.noOrders _),
    "ol_cube" -> (Relational.cubeOrders _),
    "ol_distinct" -> (Relational.distinctCounts _),
    "ol_setops" -> (Relational.setOps _),
    "ol_topk_group" -> (Relational.topPerBrand _),
    "ol_pivot" -> (Relational.pivotEvents _),
    "ol_gsets" -> (Relational.groupingSetsOrders _),
    "ol_orderdist" -> (Relational.orderCountDist _),
    "vs_chunk" -> (VectorStore.chunk _),
    "vs_file_hash" -> (VectorStore.fileHash _),
    "vs_dedup_ingest" -> (VectorStore.dedupIngest _),
    "vs_tokenize" -> (VectorStore.tokenize _),
    "vs_embed" -> (VectorStore.embed _),
    "vs_pipeline" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.col
      GraftVectorDB.pipeline(Tables.load(s, dir, "documents"))
        .select(col("doc_name"), col("doc_type"), col("page_num"),
          col("content_type"), col("content_id"), col("content_raw"),
          col("file_hash"), col("ts"))
        .orderBy(col("doc_name"), col("page_num"))
    }),
    "vs_knn" -> (KnnSearch.knn _),
    "vs_knn_filtered" -> (KnnSearch.knnFiltered _),
    "vs_search_multi" -> (KnnSearch.searchMulti _),
    "vs_xmodal" -> (KnnSearch.xmodal _),
    "vs_parse" -> (DocParse.parse _),
    "vs_parse_pdf" -> (DocParse.parsePdf _),
    "vs_parse_pptx" -> (DocParse.parsePptx _),
    "vs_parse_docx" -> (DocParse.parseDocx _),
    "vs_parse_html" -> (DocParse.parseHtml _),
    "vs_parse_xlsx" -> (DocParse.parseXlsx _),
    "vs_parse_md" -> (DocParse.parseMd _),
    "vs_html_quality" -> (DocParse.htmlQuality _),
    "vs_parse_warc" -> (DocParse.parseWarc _),
    "vs_parse_epub" -> (DocParse.parseEpub _),
    "vs_parse_odt" -> (DocParse.parseOdt _),
    "vs_parse_rtf" -> (DocParse.parseRtf _),
    "vs_parse_jsonl" -> (DocParse.parseJsonl _),
    "vs_parse_csv" -> (DocParse.parseCsv _),
    "vs_sources" -> (KnnSearch.sources _),
    "vs_mm_pipeline" -> (GraftVectorDB.mmPipeline _),
    "vs_rerank" -> (KnnSearch.mmr _),
    "vs_rerank_li" -> (KnnSearch.rerankLate _),
    "vs_hybrid" -> (HybridSearch.hybrid _),
    "vs_response" -> (ResponseGen.response _),
    "ann_brute" -> (KnnSearch.annBrute _),
    "dd_exact" -> (Dedup.exact _),
    "dd_jaccard" -> (Dedup.jaccardPairs _),
    "dd_minhash" -> (Dedup.minhashLsh _),
    "dd_incr" -> (Dedup.incrementalPairs _),
    "dd_urls" -> (Dedup.urlDedup _),
    "dd_cluster" -> (Dedup.cluster _),
    "dd_simhash" -> (Dedup.simhashPairs _),
    // dd_embed is the EXACT audit config (all-pairs verifier, flagged
    // audit=true, test-scale guarded like ann_pq_exh); dd_embed_lsh is
    // the default scale path — RP-LSH candidates + exact verify —
    // whose oracle mirrors the signature machinery, so the plan a user
    // actually runs at corpus scale is itself hash-checked
    "dd_embed" -> ((s: SparkSession, dir: String) => {
      val n = Tables.load(s, dir, "embeddings").count()
      require(n <= 1000000, s"dd_embed audit=true is a test-scale harness (corpus $n)")
      Dedup.embedPairs(s, dir, audit = true)
    }),
    "dd_embed_lsh" -> ((s: SparkSession, dir: String) => Dedup.embedPairs(s, dir)),
    // the scale-adaptive config: geometry derived from the corpus row
    // count (footer stats) so bucket occupancy — and candidate work per
    // vector — stays bounded as the corpus grows. Hash-checked against
    // the shared embedLshOracle: at the oracle-checked scales the
    // adaptive sizing returns EXACTLY the pinned geometry
    // (DedupExactnessSpec pins result-identity there)
    "dd_embed_lsha" -> ((s: SparkSession, dir: String) => Dedup.embedPairsAdaptive(s, dir)),
    // SemDeDup: clustering-bucketed embedding dedup — seeded centroids
    // make the whole plan (argmax assignment included) SQL-replayable,
    // so the bucketing itself hash-checks; the fitted-centroid
    // production config swaps only the seed frame
    "dd_semdedup" -> ((s: SparkSession, dir: String) => {
      // the SEEDED config holds k fixed for SQL replay, so its
      // within-cluster term is quadratic/k — a test-scale oracle
      // harness (same bound as dd_embed); production runs the fitted
      // adaptive-k config below
      val n = Tables.load(s, dir, "embeddings").count()
      require(n <= 1000000, s"dd_semdedup (seeded, fixed k) is a test-scale harness (corpus $n)")
      Dedup.semdedup(s, dir)
    }),
    // the fitted production config: k scales with the corpus at the
    // occupancy anchor (linear total pair work); [rows-only] — the
    // fit is the one non-oracle step, everything else hash-checks
    // through the seeded twin
    "dd_semdedupf" -> ((s: SparkSession, dir: String) => Dedup.semdedupFitted(s, dir)),
    "tx_langid" -> (TextAnalysis.langId _),
    "tx_quality" -> (TextAnalysis.quality _),
    "tx_tokens" -> (TextAnalysis.tokenCounts _),
    "tx_fingerprint" -> (TextAnalysis.fingerprint _),
    "tx_ngrams" -> (TextAnalysis.ngrams _),
    "tx_scrub" -> (TextAnalysis.scrub _),
    "tx_pii" -> (TextAnalysis.pii _),
    "tx_gopher" -> (TextAnalysis.gopher _),
    "tx_rep" -> (TextAnalysis.repetition _),
    "tx_c4" -> (TextAnalysis.c4 _),
    "tx_vocab" -> (TextAnalysis.vocab _),
    "tx_tfidf" -> (TextAnalysis.tfidf _),
    "tx_curate" -> (TextAnalysis.curate _),
    "tx_crawl" -> (CrawlPipeline.crawl _),
    // the crawl's IMAGE half: container -> canonical-url keeper ->
    // ONE real pixel decode per kept image -> exact hash grouping;
    // urls/formats/dims/group sizes all replay from md5(text)
    "mm_crawl" -> (CrawlPipeline.crawlImages _),
    // the two crawl halves joined back into interleaved (text, image,
    // ...) page records in DOM order — the MMC4/OBELICS pretraining
    // shape; refs and group sizes replay from md5(text)
    "mm_interleave" -> (CrawlPipeline.interleaveDocs _),
    "tx_shard" -> (TextAnalysis.shard _),
    "tx_pack" -> (TextAnalysis.pack _),
    "tx_contam" -> (TextAnalysis.contam _),
    "tx_mix" -> (TextAnalysis.mix _),
    // the GATE vocabulary cap (24 < the 31-term corpus) so the oracle
    // exercises the OOV collapse; production `ppl` defaults to the
    // CCNet-scale PplTopV
    "tx_ppl" -> ((s, dir) => TextAnalysis.pplTopV(s, dir, TextAnalysis.PplGateV)),
    "tx_selfrep" -> (TextAnalysis.selfrep _),
    "tx_dsir" -> (TextAnalysis.dsir _),
    "tx_linededup" -> (TextAnalysis.lineDedup _),
    "tx_passage" -> (TextAnalysis.passageDedup _),
    "mm_meta" -> (Multimodal.meta _),
    "mm_media" -> (Multimodal.media _),
    "mm_audio" -> (Multimodal.audio _),
    "mm_frames" -> (Multimodal.frames _),
    "mm_resize" -> (Multimodal.resize _),
    "mm_phash" -> (Multimodal.phash _),
    "mm_exif" -> (Multimodal.exif _),
    // rows-only: the 32x32-DCT hash over decoded pixels has no SQL
    // ground truth; PixelSpec carries the correctness burden
    "mm_phash_px" -> (Multimodal.phashPx _),
    "st_window" -> (graft.streaming.EventStreams.windowAggBatch _),
    "st_topk" -> ((s: SparkSession, dir: String) =>
      graft.streaming.EventStreams.topkBatch(s, dir)),
    "st_dedup" -> (graft.streaming.EventStreams.dedupBatch _),
    "st_enrich" -> (graft.streaming.EventStreams.enrichBatch _),
    // [rows-only]: approximate operators have no SQL ground truth;
    // recall/error bounds are asserted in specs instead.
    "ann_ivf" -> (AnnIndex.ivf _),
    "ann_lsh" -> ((s: SparkSession, dir: String) => AnnIndex.lsh(s, dir)),
    "ann_lsh_exh" -> ((s: SparkSession, dir: String) =>
      AnnIndex.lsh(s, dir, probeAll = true)),
    "ann_pq" -> (AnnIndex.pq _),
    // inverted multi-index: K² cells routed by 2·K half-space
    // centroids — the second routing level for ≥10⁸-row channels;
    // approximate config [rows-only] (recall spec), exhaustive config
    // hash-checked like the other _exh machinery harnesses
    "ann_imi" -> (AnnIndex.imi _),
    "ann_imi_exh" -> ((s: SparkSession, dir: String) =>
      AnnIndex.imi(s, dir, AnnIndex.ImiK, AnnIndex.ImiK * AnnIndex.ImiK)),
    // exhaustive-probe IVF: nProbe = cells makes the index path exact,
    // so the whole routing/probe/rank machinery hash-checks against
    // the brute-force oracle (the approximation, not the machinery,
    // is what [rows-only] ann_ivf leaves to its recall spec)
    "ann_ivf_exh" -> ((s: SparkSession, dir: String) =>
      AnnIndex.ivf(s, dir, AnnIndex.IvfCells, AnnIndex.IvfCells)),
    // exhaustive-shortlist PQ: same exact-by-construction trick. This
    // is a TEST-SCALE correctness harness: a corpus-sized k turns the
    // TopKByScore insertion buffer quadratic (and toInt would overflow
    // past 2^31), so the guard keeps it off production-sized inputs.
    "ann_pq_exh" -> ((s: SparkSession, dir: String) => {
      val n = Tables.load(s, dir, "embeddings").count()
      require(n <= 1000000, s"ann_pq_exh is a test-scale harness (corpus $n)")
      AnnIndex.pq(s, dir, n.toInt)
    }),
    // IVF+PQ composed (the 100 TB architecture: pruned cells → ADC
    // shortlist → exact re-rank); approximate config is [rows-only]
    // with a recall spec, the exhaustive config (every cell probed,
    // corpus-sized shortlist) is exact and hash-checked like the other
    // _exh harnesses
    "ann_ivfpq" -> (AnnIndex.ivfpq _),
    "ann_ivfpq_exh" -> ((s: SparkSession, dir: String) => {
      val n = Tables.load(s, dir, "embeddings").count()
      require(n <= 1000000, s"ann_ivfpq_exh is a test-scale harness (corpus $n)")
      AnnIndex.ivfpq(s, dir, AnnIndex.IvfCells, AnnIndex.IvfCells, n.toInt)
    }),
    "ol_approx" -> (Relational.approxStats _),
    "ol_approx_exh" -> (Relational.approxStatsExhaustive _)
  )

  /** Shared oracle fragment: distinct word-bigram shingle sets. */
  private val bigramCte =
    """bg AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)),
      |   i -> w[i::INT] || ' ' || w[(i+1)::INT])) s
      | FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents))""".stripMargin
  private val jaccardExpr =
    "round(len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))), 4)"

  /** Scalable oracle fragment: near-dup pairs (Jaccard >= threshold on distinct
   *  word-bigram shingles) via a shingle co-occurrence equi-join instead of the
   *  O(n^2) all-pairs cross join. Exact for any threshold > 0: a qualifying pair
   *  must share at least one shingle, and |A u B| = |A| + |B| - |A n B|, so the
   *  join enumerates every candidate and computes the identical rounded Jaccard.
   *  This keeps the DuckDB oracle runnable at bench scale (sf0.1+). */
  private def shinglePairsCte(threshold: String): String =
    s"""sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)),
      |   i -> w[i::INT] || ' ' || w[(i+1)::INT]))) s
      | FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') w FROM documents)),
      |sz AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) i
      | FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |pr AS (SELECT a_id, b_id, round(i::DOUBLE / (sa.n + sb.n - i), 4) j_r
      | FROM inter JOIN sz sa ON sa.doc_id = inter.a_id
      |            JOIN sz sb ON sb.doc_id = inter.b_id
      | WHERE round(i::DOUBLE / (sa.n + sb.n - i), 4) >= $threshold)""".stripMargin

  /** Shared oracle fragment: double vectors + norms over embeddings. */
  private val normCte =
    """n AS (SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) v,
      |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) nrm
      | FROM embeddings)""".stripMargin
  private val dotExpr =
    "list_sum(list_transform(range(1, 65), i -> q.v[i::INT] * c.v[i::INT]))"

  /** The ADAPTIVE-geometry RP-LSH pair oracle for `dd_embed_lsha`:
    * identical to [[embedLshOracle]] except the plane/table counts
    * derive from count(*) inside the SQL — the same closed forms
    * `Dedup.adaptivePlanes`/`adaptiveTables` evaluate on footer stats
    * (planes = max(12, ceil(log2(n/0.5))); tables = smallest t whose
    * GW 1-bit-multiprobe recall bound at cos 0.9 reaches 0.99, i.e.
    * ceil(ln 0.01 / ln(1 - perTable))). DuckDB's range() table
    * function takes constants only, so plane/table indices
    * over-generate to 64 and filter against the derived geometry
    * (log₂-growth: 64 planes covers any n ≤ 2⁶³ — far past every
    * gate scale). */
  private val embedLshaOracle: String =
    """WITH geom0 AS (SELECT
      |  GREATEST(12, CAST(ceil(ln(GREATEST(1.0, count(*)/0.5))/ln(2)) AS INT)) AS p,
      |  1.0 - acos(0.9)/pi() AS pb
      | FROM embeddings),
      |geom AS (SELECT p, CAST(ceil(ln(0.01) /
      |   ln(1.0 - (pow(pb, p) + p*pow(pb, p-1)*(1.0-pb)))) AS INT) AS t
      | FROM geom0),
      |n AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) v,
      |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) nrm
      | FROM embeddings),
      |pw AS (SELECT tt.range::INT t, pp.range::INT p,
      |  list_transform(range(0, 64), d ->
      |   (CASE WHEN ('0x' || substr(md5('plane:' || tt.range || ':' || pp.range || ':' || d),1,8))::BIGINT >= 2147483648
      |     THEN ('0x' || substr(md5('plane:' || tt.range || ':' || pp.range || ':' || d),1,8))::BIGINT - 4294967296
      |     ELSE ('0x' || substr(md5('plane:' || tt.range || ':' || pp.range || ':' || d),1,8))::BIGINT END)::DOUBLE
      |    / 2147483647) w
      | FROM range(0, 64) tt CROSS JOIN range(0, 64) pp CROSS JOIN geom g
      | WHERE tt.range < g.t AND pp.range < g.p),
      |bits AS (SELECT n.vec_id, pw.t, pw.p,
      |  CASE WHEN list_sum(list_transform(range(1, 65), i -> n.v[i::INT] * pw.w[i::INT])) >= 0
      |   THEN 1 ELSE 0 END b
      | FROM n, pw),
      |sg AS (SELECT vec_id, t, string_agg(b::VARCHAR, '' ORDER BY p) s
      | FROM bits GROUP BY vec_id, t),
      |cand AS (SELECT DISTINCT a.vec_id a_id, b.vec_id b_id
      | FROM sg a JOIN sg b ON a.t = b.t AND a.vec_id < b.vec_id
      |   CROSS JOIN geom g
      | WHERE list_sum(list_transform(range(1, g.p + 1), i ->
      |    CASE WHEN substr(a.s, i::INT, 1) = substr(b.s, i::INT, 1) THEN 0 ELSE 1 END)) <= 1)
      |SELECT c.a_id, c.b_id,
      | round(list_sum(list_transform(range(1, 65), i -> a.v[i::INT] * b.v[i::INT]))
      |   / (a.nrm * b.nrm), 4) AS sim_r
      |FROM cand c JOIN n a ON a.vec_id = c.a_id JOIN n b ON b.vec_id = c.b_id
      |WHERE round(list_sum(list_transform(range(1, 65), i -> a.v[i::INT] * b.v[i::INT]))
      |   / (a.nrm * b.nrm), 4) >= 0.35
      |ORDER BY a_id, b_id""".stripMargin

  /** The RP-LSH pair oracle for `dd_embed_lsh` (pinned 8×12
    * geometry); `dd_embed_lsha`'s [[embedLshaOracle]] is this SQL
    * with the geometry derived from count(*). */
  private val embedLshOracle: String =
    """WITH n AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) v,
      |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) nrm
      | FROM embeddings),
      |pw AS (SELECT t.range::INT t, p.range::INT p,
      |  list_transform(range(0, 64), d ->
      |   (CASE WHEN ('0x' || substr(md5('plane:' || t.range || ':' || p.range || ':' || d),1,8))::BIGINT >= 2147483648
      |     THEN ('0x' || substr(md5('plane:' || t.range || ':' || p.range || ':' || d),1,8))::BIGINT - 4294967296
      |     ELSE ('0x' || substr(md5('plane:' || t.range || ':' || p.range || ':' || d),1,8))::BIGINT END)::DOUBLE
      |    / 2147483647) w
      | FROM range(0, 8) t, range(0, 12) p),
      |bits AS (SELECT n.vec_id, pw.t, pw.p,
      |  CASE WHEN list_sum(list_transform(range(1, 65), i -> n.v[i::INT] * pw.w[i::INT])) >= 0
      |   THEN 1 ELSE 0 END b
      | FROM n, pw),
      |sg AS (SELECT vec_id, t, string_agg(b::VARCHAR, '' ORDER BY p) s
      | FROM bits GROUP BY vec_id, t),
      |cand AS (SELECT DISTINCT a.vec_id a_id, b.vec_id b_id
      | FROM sg a JOIN sg b ON a.t = b.t AND a.vec_id < b.vec_id
      | WHERE list_sum(list_transform(range(1, 13), i ->
      |    CASE WHEN substr(a.s, i::INT, 1) = substr(b.s, i::INT, 1) THEN 0 ELSE 1 END)) <= 1)
      |SELECT c.a_id, c.b_id,
      | round(list_sum(list_transform(range(1, 65), i -> a.v[i::INT] * b.v[i::INT]))
      |   / (a.nrm * b.nrm), 4) AS sim_r
      |FROM cand c JOIN n a ON a.vec_id = c.a_id JOIN n b ON b.vec_id = c.b_id
      |WHERE round(list_sum(list_transform(range(1, 65), i -> a.v[i::INT] * b.v[i::INT]))
      |   / (a.nrm * b.nrm), 4) >= 0.35
      |ORDER BY a_id, b_id""".stripMargin

  /** SynthHtml's charset-share aside, replayed in SQL: the share is
    * the text-md5 first hex nibble mod 3, and the per-share string
    * literal interpolates from the ONE definition in SynthHtml (the
    * oracle proves the non-UTF-8 decode, so both sides must agree on
    * the exact Unicode content). */
  private val HtmlAsideCase: String =
    "CASE (strpos('0123456789abcdef', substr(md5(text),1,1)) - 1) % 3" +
      s" WHEN 0 THEN '${graft.functions.expressions.SynthHtml.Aside0}'" +
      s" WHEN 1 THEN '${graft.functions.expressions.SynthHtml.Aside1}'" +
      s" ELSE '${graft.functions.expressions.SynthHtml.Aside2}' END"

  def oracleSql: Map[String, String] = Map(
    "ol_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | (SUM(CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE AS sum_qty,
        | (SUM(CAST(l_extendedprice AS DECIMAL(18,2))))::DOUBLE AS sum_base_price,
        | (SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))))::DOUBLE AS sum_disc_price,
        | (SUM(CAST(l_quantity AS DECIMAL(18,2))))::DOUBLE / COUNT(*) AS avg_qty,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "ol_topcustomers" ->
      """SELECT o.o_orderkey, o.o_orderdate,
        | (SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))))::DOUBLE AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY o.o_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, o.o_orderkey LIMIT 10""".stripMargin,
    "ol_regionrev" ->
      """SELECT n_name,
        | (SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))))::DOUBLE AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "ol_window" ->
      """SELECT o_custkey, o_orderkey, rnk, run_total FROM (
        | SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
        |  (SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE AS run_total
        | FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    // ol_moving: the RANGE frame is value-based over epoch days, so
    // same-day ties need no ordering tiebreak on either engine
    "ol_moving" ->
      """SELECT o_custkey, o_orderkey,
        | count(*) OVER w::BIGINT AS mov_cnt,
        | (SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w)::DOUBLE AS mov_rev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY (o_orderdate::DATE - DATE '1970-01-01')
        |  RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "ol_sessionize" ->
      """WITH g AS (
        | SELECT user_id, event_id, ts,
        |  epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        | FROM events),
        |s AS (
        | SELECT user_id, event_id, ts,
        |  SUM(CASE WHEN gap_us IS NULL OR gap_us > 21600000000 THEN 1 ELSE 0 END)
        |   OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM g)
        |SELECT user_id, session_id::BIGINT AS session_id, COUNT(*) AS n_events,
        |  MIN(ts) AS t_start, MAX(ts) AS t_end
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "ol_json" ->
      """SELECT event_type,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        | COUNT(*) AS n, (SUM(CAST(value AS DECIMAL(18,2))))::DOUBLE AS sum_value
        |FROM events GROUP BY event_type, k_mod ORDER BY event_type, k_mod""".stripMargin,
    "ol_rollup" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        | COALESCE(o_orderpriority, 'ALL') AS priority,
        | COUNT(*) AS n, (SUM(CAST(o_totalprice AS DECIMAL(18,2))))::DOUBLE AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    // the exact twin of the rows-only ol_approx: same shape, exact
    // distincts + exact interpolated median (quantile_cont = Spark's
    // percentile), so only the sketch config stays unhashed
    "ol_approx_exh" ->
      """SELECT event_type,
        | COUNT(DISTINCT user_id) AS exact_users,
        | round(quantile_cont(value, 0.5), 6) AS exact_p50,
        | COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ol_percentile" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.25), 6) AS p25,
        | round(quantile_cont(value, 0.5), 6) AS p50,
        | round(quantile_cont(value, 0.75), 6) AS p75,
        | COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ol_asof" ->
      """SELECT e.event_id, e.user_id, m.o_orderkey, m.o_orderdate
        |FROM events e, LATERAL (
        | SELECT o_orderkey, o_orderdate FROM orders o
        | WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        | ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) m
        |ORDER BY e.event_id""".stripMargin,
    "ol_range" ->
      """SELECT e.event_id, e.user_id, (
        |  SELECT COUNT(*) FROM events c
        |  WHERE c.user_id = e.user_id AND c.event_type = 'click'
        |    AND c.ts > e.ts - INTERVAL 1 HOUR AND c.ts <= e.ts) AS n_clicks
        |FROM events e WHERE e.event_type = 'error' ORDER BY e.event_id""".stripMargin,
    // week-truncated dates differ by exact multiples of 7 days, so the
    // weeks_since integer is engine-parity-safe by construction
    "ol_retention" ->
      """WITH w AS (SELECT user_id, date_trunc('week', ts)::DATE wk FROM events),
        |c AS (SELECT user_id, min(wk) cohort_week FROM w GROUP BY user_id)
        |SELECT c.cohort_week,
        |  (date_diff('day', c.cohort_week, w.wk) // 7)::BIGINT AS weeks_since,
        |  count(DISTINCT w.user_id)::BIGINT AS n_users
        |FROM w JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // profile: typed min/max (numeric vs string lanes), so no
    // cross-engine string-formatting surface exists
    "ol_profile" ->
      """WITH n AS (SELECT count(*) n_rows FROM lineitem)
        |SELECT p.* FROM n, LATERAL (
        | SELECT 'l_discount' AS col_name, n.n_rows::BIGINT AS n_rows,
        |  count(l_discount)::BIGINT AS n_nonnull,
        |  count(DISTINCT l_discount)::BIGINT AS n_distinct,
        |  min(l_discount)::DOUBLE AS min_num, max(l_discount)::DOUBLE AS max_num,
        |  NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str FROM lineitem
        | UNION ALL
        | SELECT 'l_extendedprice', n.n_rows::BIGINT, count(l_extendedprice)::BIGINT,
        |  count(DISTINCT l_extendedprice)::BIGINT,
        |  min(l_extendedprice)::DOUBLE, max(l_extendedprice)::DOUBLE,
        |  NULL::VARCHAR, NULL::VARCHAR FROM lineitem
        | UNION ALL
        | SELECT 'l_linestatus', n.n_rows::BIGINT, count(l_linestatus)::BIGINT,
        |  count(DISTINCT l_linestatus)::BIGINT, NULL::DOUBLE, NULL::DOUBLE,
        |  min(l_linestatus), max(l_linestatus) FROM lineitem
        | UNION ALL
        | SELECT 'l_orderkey', n.n_rows::BIGINT, count(l_orderkey)::BIGINT,
        |  count(DISTINCT l_orderkey)::BIGINT,
        |  min(l_orderkey)::DOUBLE, max(l_orderkey)::DOUBLE,
        |  NULL::VARCHAR, NULL::VARCHAR FROM lineitem
        | UNION ALL
        | SELECT 'l_quantity', n.n_rows::BIGINT, count(l_quantity)::BIGINT,
        |  count(DISTINCT l_quantity)::BIGINT,
        |  min(l_quantity)::DOUBLE, max(l_quantity)::DOUBLE,
        |  NULL::VARCHAR, NULL::VARCHAR FROM lineitem
        | UNION ALL
        | SELECT 'l_returnflag', n.n_rows::BIGINT, count(l_returnflag)::BIGINT,
        |  count(DISTINCT l_returnflag)::BIGINT, NULL::DOUBLE, NULL::DOUBLE,
        |  min(l_returnflag), max(l_returnflag) FROM lineitem
        |) p ORDER BY col_name""".stripMargin,
    "ol_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "ol_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        | COALESCE(o_orderpriority, 'ALL') AS priority,
        | COUNT(*) AS n, (SUM(CAST(o_totalprice AS DECIMAL(18,2))))::DOUBLE AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "ol_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ol_setops" ->
      """SELECT n_nationkey, n_name FROM nation
        |WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
        |  AND n_nationkey NOT IN (SELECT s_nationkey FROM supplier)
        |ORDER BY n_nationkey""".stripMargin,
    "ol_pivot" ->
      """SELECT user_id % 10 AS user_decile,
        | COUNT(*) FILTER (event_type = 'click') AS click,
        | COUNT(*) FILTER (event_type = 'error') AS error,
        | COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        | COUNT(*) FILTER (event_type = 'signup') AS signup,
        | COUNT(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY user_decile""".stripMargin,
    "ol_gsets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        | COALESCE(o_orderpriority, 'ALL') AS priority,
        | COUNT(*) AS n, (SUM(CAST(o_totalprice AS DECIMAL(18,2))))::DOUBLE AS total
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status, priority""".stripMargin,
    "ol_orderdist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        | SELECT c_custkey, COUNT(o_orderkey) AS c_count
        | FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        | GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "ol_topk_group" ->
      """SELECT p_brand, rnk, p_partkey, p_retailprice FROM (
        | SELECT p_brand, p_partkey, p_retailprice,
        |  row_number() OVER (PARTITION BY p_brand
        |    ORDER BY p_retailprice DESC, p_partkey) AS rnk
        | FROM part) t
        |WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin,
    "vs_chunk" ->
      """WITH c AS (SELECT doc_id, text,
        |  unnest(range(0, ((length(text)-1)//200)::BIGINT + 1)) AS i FROM documents)
        |SELECT doc_id, i::BIGINT AS chunk_id,
        | substr(text, (i*200 + 1)::INT, 256) AS chunk_text,
        | length(substr(text, (i*200 + 1)::INT, 256))::BIGINT AS chunk_len
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "vs_file_hash" ->
      """SELECT doc_id, file_hash,
        | row_number() OVER (PARTITION BY file_hash ORDER BY doc_id) > 1 AS is_dup
        |FROM (SELECT doc_id, md5(text) AS file_hash FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "vs_dedup_ingest" ->
      """SELECT md5(text) AS file_hash, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keeper_doc_id""".stripMargin,
    "vs_tokenize" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') toks FROM documents)
        |SELECT doc_id, len(toks)::BIGINT AS n_tokens,
        | len(list_distinct(toks))::BIGINT AS n_distinct,
        | toks[1] AS first_token, toks[-1] AS last_token
        |FROM t ORDER BY doc_id""".stripMargin,
    "vs_embed" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') tk FROM documents),
        |bs AS (SELECT doc_id, list_transform(tk, t -> ('0x' || substr(md5(t),1,2))::BIGINT % 64) b FROM toks),
        |cnt AS (SELECT doc_id, list_transform(range(0, 64), i -> len(list_filter(b, x -> x = i))::DOUBLE) v FROM bs),
        |nrm AS (SELECT doc_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) n FROM cnt)
        |SELECT doc_id, i::BIGINT AS dim, round(v[(i+1)::INT] / n, 6) AS val
        |FROM nrm, range(0, 64) t(i)
        |ORDER BY doc_id, dim""".stripMargin,
    "vs_pipeline" ->
      """WITH c AS (SELECT doc_id, source, text, md5(text) AS file_hash,
        |  unnest(range(0, ((length(text)-1)//200)::BIGINT + 1)) AS i FROM documents)
        |SELECT 'corpus/' || source || '/doc_' || doc_id || '.txt' AS doc_name,
        | 'txt' AS doc_type, i::BIGINT AS page_num, 'text_chunk' AS content_type,
        | i::VARCHAR AS content_id, substr(text, (i*200+1)::INT, 256) AS content_raw,
        | file_hash, make_timestamp(doc_id * 1000000) AS ts
        |FROM c ORDER BY doc_name, page_num""".stripMargin,
    "vs_knn" ->
      s"""WITH $normCte,
        |p AS (SELECT q.vec_id q_id, c.vec_id n_id,
        |  round($dotExpr / (q.nrm * c.nrm), 4) sim_r
        | FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id >= 10),
        |r AS (SELECT q_id, n_id, sim_r,
        |  row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, n_id) rnk FROM p)
        |SELECT q_id, rnk::BIGINT AS rnk, n_id, sim_r FROM r WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin,
    // greedy MMR unrolled into 5 argmax steps (no recursion): each
    // step's score table joins the candidate pool against the
    // already-selected ids' pairwise sims
    "vs_rerank" ->
      s"""WITH $normCte,
        |p AS (SELECT q.vec_id q_id, c.vec_id n_id,
        |  round($dotExpr / (q.nrm * c.nrm), 4) sim_r
        | FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id >= 10),
        |cand AS (SELECT q_id, n_id, sim_r FROM (SELECT p.*,
        |  row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, n_id) rr FROM p)
        | WHERE rr <= 20),
        |ps AS (SELECT a.q_id, a.n_id aa, b.n_id bb,
        |  round(list_sum(list_transform(range(1, 65), i -> x.v[i::INT] * y.v[i::INT]))
        |    / (x.nrm * y.nrm), 4) s
        | FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.n_id <> b.n_id
        | JOIN n x ON x.vec_id = a.n_id JOIN n y ON y.vec_id = b.n_id),
        |s1 AS (SELECT q_id, n_id, m FROM (SELECT q_id, n_id, round(0.6*sim_r, 4) m,
        |  row_number() OVER (PARTITION BY q_id ORDER BY round(0.6*sim_r, 4) DESC, n_id) rr
        |  FROM cand) WHERE rr = 1),
        |sc2 AS (SELECT c.q_id, c.n_id, round(0.6*c.sim_r - 0.4*max(p.s), 4) m
        | FROM cand c JOIN s1 ON s1.q_id = c.q_id AND c.n_id <> s1.n_id
        | JOIN ps p ON p.q_id = c.q_id AND p.aa = c.n_id AND p.bb = s1.n_id
        | GROUP BY c.q_id, c.n_id, c.sim_r),
        |s2 AS (SELECT q_id, n_id, m FROM (SELECT sc2.*,
        |  row_number() OVER (PARTITION BY q_id ORDER BY m DESC, n_id) rr FROM sc2)
        | WHERE rr = 1),
        |sc3 AS (SELECT c.q_id, c.n_id, round(0.6*c.sim_r - 0.4*max(p.s), 4) m
        | FROM cand c JOIN s1 ON s1.q_id = c.q_id JOIN s2 ON s2.q_id = c.q_id
        | JOIN ps p ON p.q_id = c.q_id AND p.aa = c.n_id
        |   AND p.bb IN (s1.n_id, s2.n_id)
        | WHERE c.n_id NOT IN (s1.n_id, s2.n_id)
        | GROUP BY c.q_id, c.n_id, c.sim_r),
        |s3 AS (SELECT q_id, n_id, m FROM (SELECT sc3.*,
        |  row_number() OVER (PARTITION BY q_id ORDER BY m DESC, n_id) rr FROM sc3)
        | WHERE rr = 1),
        |sc4 AS (SELECT c.q_id, c.n_id, round(0.6*c.sim_r - 0.4*max(p.s), 4) m
        | FROM cand c JOIN s1 ON s1.q_id = c.q_id JOIN s2 ON s2.q_id = c.q_id
        | JOIN s3 ON s3.q_id = c.q_id
        | JOIN ps p ON p.q_id = c.q_id AND p.aa = c.n_id
        |   AND p.bb IN (s1.n_id, s2.n_id, s3.n_id)
        | WHERE c.n_id NOT IN (s1.n_id, s2.n_id, s3.n_id)
        | GROUP BY c.q_id, c.n_id, c.sim_r),
        |s4 AS (SELECT q_id, n_id, m FROM (SELECT sc4.*,
        |  row_number() OVER (PARTITION BY q_id ORDER BY m DESC, n_id) rr FROM sc4)
        | WHERE rr = 1),
        |sc5 AS (SELECT c.q_id, c.n_id, round(0.6*c.sim_r - 0.4*max(p.s), 4) m
        | FROM cand c JOIN s1 ON s1.q_id = c.q_id JOIN s2 ON s2.q_id = c.q_id
        | JOIN s3 ON s3.q_id = c.q_id JOIN s4 ON s4.q_id = c.q_id
        | JOIN ps p ON p.q_id = c.q_id AND p.aa = c.n_id
        |   AND p.bb IN (s1.n_id, s2.n_id, s3.n_id, s4.n_id)
        | WHERE c.n_id NOT IN (s1.n_id, s2.n_id, s3.n_id, s4.n_id)
        | GROUP BY c.q_id, c.n_id, c.sim_r),
        |s5 AS (SELECT q_id, n_id, m FROM (SELECT sc5.*,
        |  row_number() OVER (PARTITION BY q_id ORDER BY m DESC, n_id) rr FROM sc5)
        | WHERE rr = 1)
        |SELECT q_id, 1::BIGINT rnk, n_id, m mmr_r FROM s1
        |UNION ALL SELECT q_id, 2::BIGINT, n_id, m FROM s2
        |UNION ALL SELECT q_id, 3::BIGINT, n_id, m FROM s3
        |UNION ALL SELECT q_id, 4::BIGINT, n_id, m FROM s4
        |UNION ALL SELECT q_id, 5::BIGINT, n_id, m FROM s5
        |ORDER BY q_id, rnk""".stripMargin,
    // late interaction: stage-1 pool by 64-dim whole-doc hash embed,
    // stage-2 MaxSim (sum over query tokens of max doc-token cosine)
    // in the 48-dim trigram token space — every float op replayed in
    // the same order, every score rounded before ranking
    "vs_rerank_li" ->
      """WITH q(q_id, qtext) AS (VALUES
        |  (0::BIGINT, 'fastly queried joins'),
        |  (1::BIGINT, 'vectoring streamer hashing'),
        |  (2::BIGINT, 'tabled scanning merges')),
        |db AS (SELECT doc_id, list_transform(string_split_regex(trim(text), '\s+'),
        |  t -> ('0x' || substr(md5(t),1,2))::BIGINT % 64) b FROM documents),
        |dc AS (SELECT doc_id, list_transform(range(0, 64), j -> len(list_filter(b, x -> x = j))::DOUBLE) v FROM db),
        |dn AS (SELECT doc_id, list_transform(v, x -> round(x / sqrt(list_sum(list_transform(v, y -> y*y))), 6)) rv FROM dc),
        |de AS (SELECT doc_id, rv, sqrt(list_sum(list_transform(rv, x -> x*x))) nrm FROM dn),
        |qb AS (SELECT q_id, list_transform(string_split_regex(trim(qtext), '\s+'),
        |  t -> ('0x' || substr(md5(t),1,2))::BIGINT % 64) b FROM q),
        |qc AS (SELECT q_id, list_transform(range(0, 64), j -> len(list_filter(b, x -> x = j))::DOUBLE) v FROM qb),
        |qn AS (SELECT q_id, list_transform(v, x -> round(x / sqrt(list_sum(list_transform(v, y -> y*y))), 6)) rv FROM qc),
        |qe AS (SELECT q_id, rv, sqrt(list_sum(list_transform(rv, x -> x*x))) nrm FROM qn),
        |p0 AS (SELECT q.q_id, d.doc_id n_id,
        |  round(list_sum(list_transform(range(1, 65), i -> q.rv[i::INT] * d.rv[i::INT])) / (q.nrm * d.nrm), 4) sim_r
        | FROM qe q CROSS JOIN de d),
        |pool AS (SELECT q_id, n_id, sim_r FROM (SELECT p0.*,
        |  row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, n_id) rr FROM p0) WHERE rr <= 20),
        |dt1 AS (SELECT q_id, n_id, sim_r, '<' || tok || '>' pd FROM (
        |  SELECT p.q_id, p.n_id, p.sim_r,
        |   unnest(list_distinct(string_split_regex(trim(d.text), '\s+'))) tok
        |  FROM pool p JOIN documents d ON d.doc_id = p.n_id) WHERE tok <> ''),
        |dt2 AS (SELECT q_id, n_id, sim_r, pd,
        |  list_transform(list_transform(range(0, length(pd) - 2), i -> substr(pd, (i+1)::INT, 3)),
        |   g -> ('0x' || substr(md5(g),1,2))::BIGINT % 48) b FROM dt1),
        |dt3 AS (SELECT q_id, n_id, sim_r, pd, list_transform(range(0, 48), j -> len(list_filter(b, x -> x = j))::DOUBLE) v FROM dt2),
        |dt4 AS (SELECT q_id, n_id, sim_r, pd, list_transform(v, x -> round(x / sqrt(list_sum(list_transform(v, y -> y*y))), 6)) rv FROM dt3),
        |dte AS (SELECT q_id, n_id, sim_r, pd, rv, sqrt(list_sum(list_transform(rv, x -> x*x))) nrm FROM dt4),
        |qt1 AS (SELECT q_id, '<' || qtok || '>' pd FROM (
        |  SELECT q_id, unnest(list_distinct(string_split_regex(trim(qtext), '\s+'))) qtok FROM q) WHERE qtok <> ''),
        |qt2 AS (SELECT q_id, pd,
        |  list_transform(list_transform(range(0, length(pd) - 2), i -> substr(pd, (i+1)::INT, 3)),
        |   g -> ('0x' || substr(md5(g),1,2))::BIGINT % 48) b FROM qt1),
        |qt3 AS (SELECT q_id, pd, list_transform(range(0, 48), j -> len(list_filter(b, x -> x = j))::DOUBLE) v FROM qt2),
        |qt4 AS (SELECT q_id, pd, list_transform(v, x -> round(x / sqrt(list_sum(list_transform(v, y -> y*y))), 6)) rv FROM qt3),
        |qte AS (SELECT q_id, pd, rv, sqrt(list_sum(list_transform(rv, x -> x*x))) nrm FROM qt4),
        |cs AS (SELECT d.q_id, d.n_id, d.sim_r, t.pd qpd,
        |  round(list_sum(list_transform(range(1, 49), i -> t.rv[i::INT] * d.rv[i::INT])) / (t.nrm * d.nrm), 4) c
        | FROM dte d JOIN qte t USING (q_id)),
        |mx AS (SELECT q_id, n_id, sim_r, qpd, max(c) mc FROM cs GROUP BY 1, 2, 3, 4),
        |li AS (SELECT q_id, n_id, sim_r, round(sum(mc), 4) li_r FROM mx GROUP BY 1, 2, 3),
        |r AS (SELECT li.*, row_number() OVER (PARTITION BY q_id ORDER BY li_r DESC, n_id) rnk FROM li)
        |SELECT q_id, rnk::BIGINT AS rnk, n_id, li_r, sim_r FROM r WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin,
    // hybrid BM25 + embedding-cosine channels fused by RRF: BM25
    // inputs are exact ints, avgdl an exact int/int division, per-term
    // contributions 6dp-rounded before the per-doc sum (tx_ppl grid
    // trick); the vector channel replays the vs_xmodal text CTE
    "vs_hybrid" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') tk FROM documents),
        |co AS (SELECT doc_id, tk, len(tk)::BIGINT dl FROM d WHERE doc_id >= 10),
        |tfc AS (SELECT doc_id, term, any_value(dl) dl, count(*)::BIGINT tf
        |  FROM (SELECT doc_id, dl, unnest(tk) term FROM co) GROUP BY doc_id, term),
        |dfq AS (SELECT term, count(*)::BIGINT df FROM tfc GROUP BY term),
        |st AS (SELECT count(*)::BIGINT n, sum(dl)::BIGINT sdl
        |  FROM (SELECT doc_id, any_value(dl) dl FROM tfc GROUP BY doc_id)),
        |qt AS (SELECT doc_id q_id, unnest(list_distinct(tk)) term FROM d WHERE doc_id < 10),
        |ctr AS (SELECT q.q_id, t.doc_id n_id,
        |  round(ln(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5)) * t.tf * 2.2
        |    / (t.tf + 1.2 * (0.25 + 0.75 * t.dl / (s.sdl::DOUBLE / s.n))), 6) c
        | FROM tfc t JOIN qt q ON t.term = q.term JOIN dfq f ON t.term = f.term, st s),
        |lex AS (SELECT q_id, n_id, round(sum(c), 6) sc FROM ctr GROUP BY q_id, n_id),
        |lexr AS (SELECT q_id, n_id,
        |  row_number() OVER (PARTITION BY q_id ORDER BY sc DESC, n_id) rl FROM lex),
        |tb AS (SELECT doc_id, list_transform(tk, t -> ('0x' || substr(md5(t),1,2))::BIGINT % 64) b FROM d),
        |tc AS (SELECT doc_id, list_transform(range(0, 64), i -> len(list_filter(b, x -> x = i))::DOUBLE) v FROM tb),
        |tn AS (SELECT doc_id, list_transform(v, x -> round(x / sqrt(list_sum(list_transform(v, y -> y*y))), 6)) rv FROM tc),
        |te AS (SELECT doc_id, rv, sqrt(list_sum(list_transform(rv, x -> x*x))) nrm FROM tn),
        |pv AS (SELECT q.doc_id q_id, c.doc_id n_id,
        |  round(list_sum(list_transform(range(1, 65), i -> q.rv[i::INT] * c.rv[i::INT])) / (q.nrm * c.nrm), 4) sim_r
        | FROM te q, te c WHERE q.doc_id < 10 AND c.doc_id >= 10),
        |vecr AS (SELECT q_id, n_id,
        |  row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, n_id) rv FROM pv),
        |fu AS (SELECT coalesce(l.q_id, v.q_id) q_id, coalesce(l.n_id, v.n_id) n_id,
        |  round(coalesce(1.0::DOUBLE/(60 + l.rl), 0) + coalesce(1.0::DOUBLE/(60 + v.rv), 0), 6) rrf_r
        | FROM (SELECT * FROM lexr WHERE rl <= 20) l
        | FULL JOIN (SELECT * FROM vecr WHERE rv <= 20) v
        |   ON l.q_id = v.q_id AND l.n_id = v.n_id),
        |fr AS (SELECT q_id, n_id, rrf_r,
        |  row_number() OVER (PARTITION BY q_id ORDER BY rrf_r DESC, n_id) rnk FROM fu)
        |SELECT q_id, rnk::BIGINT AS rnk, n_id, rrf_r FROM fr WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin,
    // the response-generation contract: prompt manifest (system
    // message, query header, query text, retrieved header, hits in
    // rank order, closing instruction) + fused source manifest, one
    // row per content element; hits replay the vs_hybrid text-cosine
    // CTE; header literals carry the reference's exact strings
    // (chr(10) = the embedded newlines)
    "vs_response" ->
      """WITH d AS (SELECT doc_id, source, text, string_split_regex(trim(text), '\s+') tk FROM documents),
        |tb AS (SELECT doc_id, list_transform(tk, t -> ('0x' || substr(md5(t),1,2))::BIGINT % 64) b FROM d),
        |tc AS (SELECT doc_id, list_transform(range(0, 64), i -> len(list_filter(b, x -> x = i))::DOUBLE) v FROM tb),
        |tn AS (SELECT doc_id, list_transform(v, x -> round(x / sqrt(list_sum(list_transform(v, y -> y*y))), 6)) rv FROM tc),
        |te AS (SELECT doc_id, rv, sqrt(list_sum(list_transform(rv, x -> x*x))) nrm FROM tn),
        |pv AS (SELECT q.doc_id q_id, c.doc_id n_id,
        |  round(list_sum(list_transform(range(1, 65), i -> q.rv[i::INT] * c.rv[i::INT])) / (q.nrm * c.nrm), 4) sim_r
        | FROM te q, te c WHERE q.doc_id < 10 AND c.doc_id >= 10),
        |hr AS (SELECT q_id, n_id,
        |  row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, n_id) rnk FROM pv),
        |hx AS (SELECT h.q_id, h.rnk::BIGINT rnk, d.source, d.doc_id n_id, d.text
        |  FROM (SELECT * FROM hr WHERE rnk <= 5) h JOIN d ON h.n_id = d.doc_id),
        |q AS (SELECT doc_id q_id, text FROM d WHERE doc_id < 10),
        |m AS (
        | SELECT q_id, 0::BIGINT seq, 'system' "role", 'text' ctype,
        |  'You are a helpful assistant that is going to summarize the key points from search results, based on a user query and relevant retrieved content.' AS content FROM q
        | UNION ALL SELECT q_id, 1::BIGINT, 'user', 'text', 'Here is the search query content:' || chr(10) FROM q
        | UNION ALL SELECT q_id, 2::BIGINT, 'user', 'text', 'Text query: ' || text FROM q
        | UNION ALL SELECT q_id, 3::BIGINT, 'user', 'text', chr(10) || chr(10) || 'Here is the retreived material:' FROM q
        | UNION ALL SELECT q_id, rnk + 3, 'user', 'text', text FROM hx
        | UNION ALL SELECT q_id, 9::BIGINT, 'user', 'text', 'Please generate an appropriate response to the query based on the information available - you can choose what retrieved information is most appropriate to answer the question.' FROM q
        | UNION ALL SELECT q_id, rnk + 9, 'source', 'text', source || '#' || n_id::VARCHAR || ' rnk=' || rnk::VARCHAR FROM hx)
        |SELECT q_id, seq, "role", ctype, content FROM m ORDER BY q_id, seq""".stripMargin,
    // probing every cell makes the IMI exact: same ground truth as vs_knn
    "ann_imi_exh" ->
      s"""WITH $normCte,
        |p AS (SELECT q.vec_id q_id, c.vec_id n_id,
        |  round($dotExpr / (q.nrm * c.nrm), 4) sim_r
        | FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id >= 10),
        |r AS (SELECT q_id, n_id, sim_r,
        |  row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, n_id) rnk FROM p)
        |SELECT q_id, rnk::BIGINT AS rnk, n_id, sim_r FROM r WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin,
    // probing every cell makes IVF exact: same ground truth as vs_knn
    "ann_ivf_exh" ->
      s"""WITH $normCte,
        |p AS (SELECT q.vec_id q_id, c.vec_id n_id,
        |  round($dotExpr / (q.nrm * c.nrm), 4) sim_r
        | FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id >= 10),
        |r AS (SELECT q_id, n_id, sim_r,
        |  row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, n_id) rnk FROM p)
        |SELECT q_id, rnk::BIGINT AS rnk, n_id, sim_r FROM r WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin,
    // probing all 2^planes buckets per table makes the LSH path
    // exact: same ground truth as vs_knn/ann_ivf_exh
    "ann_lsh_exh" ->
      s"""WITH $normCte,
        |p AS (SELECT q.vec_id q_id, c.vec_id n_id,
        |  round($dotExpr / (q.nrm * c.nrm), 4) sim_r
        | FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id >= 10),
        |r AS (SELECT q_id, n_id, sim_r,
        |  row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, n_id) rnk FROM p)
        |SELECT q_id, rnk::BIGINT AS rnk, n_id, sim_r FROM r WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin,
    // probing every cell AND a corpus-sized shortlist make the
    // composed IVF+PQ path exact: same ground truth as vs_knn
    "ann_ivfpq_exh" ->
      s"""WITH $normCte,
        |p AS (SELECT q.vec_id q_id, c.vec_id n_id,
        |  round($dotExpr / (q.nrm * c.nrm), 4) sim_r
        | FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id >= 10),
        |r AS (SELECT q_id, n_id, sim_r,
        |  row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, n_id) rnk FROM p)
        |SELECT q_id, rnk::BIGINT AS rnk, n_id, sim_r FROM r WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin,
    // a corpus-sized shortlist makes PQ exact: same ground truth
    "ann_pq_exh" ->
      s"""WITH $normCte,
        |p AS (SELECT q.vec_id q_id, c.vec_id n_id,
        |  round($dotExpr / (q.nrm * c.nrm), 4) sim_r
        | FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id >= 10),
        |r AS (SELECT q_id, n_id, sim_r,
        |  row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, n_id) rnk FROM p)
        |SELECT q_id, rnk::BIGINT AS rnk, n_id, sim_r FROM r WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin,
    "vs_knn_filtered" ->
      s"""WITH $normCte,
        |p AS (SELECT q.vec_id q_id, c.vec_id n_id,
        |  round($dotExpr / (q.nrm * c.nrm), 4) sim_r
        | FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id >= 10 AND c.label = 3),
        |r AS (SELECT q_id, n_id, sim_r,
        |  row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, n_id) rnk FROM p)
        |SELECT q_id, rnk::BIGINT AS rnk, n_id, sim_r FROM r WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin,
    "vs_search_multi" ->
      s"""WITH $normCte,
        |p AS (SELECT q.vec_id q_id, c.vec_id n_id,
        |  CASE WHEN c.label < 5 THEN 'text' ELSE 'image' END channel,
        |  round($dotExpr / (q.nrm * c.nrm), 4) sim_r
        | FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id >= 10),
        |r AS (SELECT q_id, channel, n_id, sim_r,
        |  row_number() OVER (PARTITION BY q_id, channel ORDER BY sim_r DESC, n_id) rnk FROM p)
        |SELECT q_id, channel, rnk::BIGINT AS rnk, n_id, sim_r FROM r WHERE rnk <= 3
        |ORDER BY q_id, channel, rnk""".stripMargin,
    "vs_xmodal" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') tk FROM documents),
        |tb AS (SELECT doc_id, list_transform(tk, t -> ('0x' || substr(md5(t),1,2))::BIGINT % 64) b FROM toks),
        |tc AS (SELECT doc_id, list_transform(range(0, 64), i -> len(list_filter(b, x -> x = i))::DOUBLE) v FROM tb),
        |tn AS (SELECT doc_id, list_transform(v, x -> round(x / sqrt(list_sum(list_transform(v, y -> y*y))), 6)) rv FROM tc),
        |te AS (SELECT doc_id, rv, sqrt(list_sum(list_transform(rv, x -> x*x))) nrm FROM tn),
        |ib AS (SELECT doc_id, list_transform(tk, t -> ('0x' || substr(md5('img:' || t),1,2))::BIGINT % 48) b FROM toks),
        |ic AS (SELECT doc_id, list_transform(range(0, 48), i -> len(list_filter(b, x -> x = i))::DOUBLE) v FROM ib),
        |inn AS (SELECT doc_id, list_transform(v, x -> round(x / sqrt(list_sum(list_transform(v, y -> y*y))), 6)) rv FROM ic),
        |ie AS (SELECT doc_id, rv, sqrt(list_sum(list_transform(rv, x -> x*x))) nrm FROM inn),
        |pt AS (SELECT q.doc_id q_id, c.doc_id n_id,
        |  round(list_sum(list_transform(range(1, 65), i -> q.rv[i::INT] * c.rv[i::INT])) / (q.nrm * c.nrm), 4) sim_r
        | FROM te q, te c WHERE q.doc_id < 10 AND c.doc_id >= 10 AND c.doc_id % 2 = 0),
        |rt AS (SELECT q_id, n_id, sim_r, row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, n_id) rnk FROM pt),
        |pi AS (SELECT q.doc_id q_id, c.doc_id n_id,
        |  round(list_sum(list_transform(range(1, 49), i -> q.rv[i::INT] * c.rv[i::INT])) / (q.nrm * c.nrm), 4) sim_r
        | FROM ie q, ie c WHERE q.doc_id < 10 AND c.doc_id >= 10 AND c.doc_id % 2 = 1),
        |ri AS (SELECT q_id, n_id, sim_r, row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, n_id) rnk FROM pi)
        |SELECT q_id, 'text' AS channel, rnk::BIGINT AS rnk, n_id, sim_r FROM rt WHERE rnk <= 3
        |UNION ALL
        |SELECT q_id, 'image', rnk::BIGINT, n_id, sim_r FROM ri WHERE rnk <= 3
        |ORDER BY q_id, channel, rnk""".stripMargin,
    // the full multimodal flow replayed in SQL: chunk -> caption ->
    // dual-channel embed (64-dim text / 48-dim img-salted) -> per-channel
    // cosine top-5 with lexicographic tie-breaks
    "vs_mm_pipeline" ->
      """WITH c AS (SELECT doc_id, source, text,
        |  unnest(range(0, ((length(text)-1)//200)::BIGINT + 1)) AS i FROM documents),
        |ch AS (SELECT 'corpus/' || source || '/doc_' || doc_id || '.txt' doc_name,
        |  i::BIGINT page_num, 'text_chunk' content_type, i::VARCHAR content_id,
        |  substr(text, (i*200+1)::INT, 256) content_raw FROM c),
        |cap AS (SELECT 'corpus/' || source || '/doc_' || doc_id || '.txt' doc_name,
        |  0::BIGINT page_num, 'image_caption' content_type,
        |  substr(md5(text),1,8) content_id,
        |  'captioned content ' || substr(md5(text),1,8) content_raw
        | FROM documents WHERE doc_id % 3 = 0),
        |img AS (SELECT 'corpus/' || source || '/doc_' || doc_id || '.txt' doc_name,
        |  0::BIGINT page_num, 'image' content_type,
        |  substr(md5(text),1,8) content_id, text content_raw
        | FROM documents WHERE doc_id % 3 = 0),
        |txt AS (SELECT * FROM ch UNION ALL SELECT * FROM cap),
        |ten AS (SELECT doc_name, page_num, content_type, content_id, content_raw,
        |  rv, sqrt(list_sum(list_transform(rv, x -> x*x))) nrm FROM (
        |  SELECT *, list_transform(v, x -> round(x / sqrt(list_sum(list_transform(v, y -> y*y))), 6)) rv FROM (
        |   SELECT *, list_transform(range(0, 64), j -> len(list_filter(b, x -> x = j))::DOUBLE) v FROM (
        |    SELECT *, list_transform(string_split_regex(trim(content_raw), '\s+'),
        |      t -> ('0x' || substr(md5(t),1,2))::BIGINT % 64) b FROM txt)))),
        |ien AS (SELECT doc_name, page_num, content_type, content_id, content_raw,
        |  rv, sqrt(list_sum(list_transform(rv, x -> x*x))) nrm FROM (
        |  SELECT *, list_transform(v, x -> round(x / sqrt(list_sum(list_transform(v, y -> y*y))), 6)) rv FROM (
        |   SELECT *, list_transform(range(0, 48), j -> len(list_filter(b, x -> x = j))::DOUBLE) v FROM (
        |    SELECT *, list_transform(string_split_regex(trim(content_raw), '\s+'),
        |      t -> ('0x' || substr(md5('img:' || t),1,2))::BIGINT % 48) b FROM img)))),
        |qt AS (SELECT rv, sqrt(list_sum(list_transform(rv, x -> x*x))) nrm FROM (
        |  SELECT list_transform(v, x -> round(x / sqrt(list_sum(list_transform(v, y -> y*y))), 6)) rv FROM (
        |   SELECT list_transform(range(0, 64), j -> len(list_filter(b, x -> x = j))::DOUBLE) v FROM (
        |    SELECT list_transform(string_split_regex('fast query join table', '\s+'),
        |      t -> ('0x' || substr(md5(t),1,2))::BIGINT % 64) b)))),
        |qi AS (SELECT rv, sqrt(list_sum(list_transform(rv, x -> x*x))) nrm FROM (
        |  SELECT list_transform(v, x -> round(x / sqrt(list_sum(list_transform(v, y -> y*y))), 6)) rv FROM (
        |   SELECT list_transform(range(0, 48), j -> len(list_filter(b, x -> x = j))::DOUBLE) v FROM (
        |    SELECT list_transform(string_split_regex('fast query join table', '\s+'),
        |      t -> ('0x' || substr(md5('img:' || t),1,2))::BIGINT % 48) b)))),
        |rt AS (SELECT t.doc_name, t.page_num, t.content_type, t.content_id, t.content_raw,
        |  round(list_sum(list_transform(range(1, 65), i -> q.rv[i::INT] * t.rv[i::INT])) / (q.nrm * t.nrm), 4) sim_r
        | FROM ten t CROSS JOIN qt q),
        |rkt AS (SELECT *, row_number() OVER (ORDER BY sim_r DESC, doc_name, content_type, content_id) rnk FROM rt),
        |ri AS (SELECT t.doc_name, t.page_num, t.content_type, t.content_id, t.content_raw,
        |  round(list_sum(list_transform(range(1, 49), i -> q.rv[i::INT] * t.rv[i::INT])) / (q.nrm * t.nrm), 4) sim_r
        | FROM ien t CROSS JOIN qi q),
        |rki AS (SELECT *, row_number() OVER (ORDER BY sim_r DESC, doc_name, content_type, content_id) rnk FROM ri)
        |SELECT 'text' AS channel, rnk::BIGINT AS rnk, sim_r, doc_name, page_num,
        | content_type, content_id, content_raw FROM rkt WHERE rnk <= 5
        |UNION ALL
        |SELECT 'image', rnk::BIGINT, sim_r, doc_name, page_num,
        | content_type, content_id, content_raw FROM rki WHERE rnk <= 5
        |ORDER BY channel, rnk""".stripMargin,
    "vs_parse" ->
      """WITH c AS (SELECT doc_id, text,
        |  unnest(range(0, ((length(text)-1)//200)::BIGINT + 1)) AS i FROM documents),
        |ch AS (SELECT doc_id, i, substr(text, (i*200+1)::INT, 200) pg FROM c),
        |cho AS (SELECT doc_id, i, pg,
        |  COALESCE(SUM(octet_length(pg::BLOB)) OVER (PARTITION BY doc_id ORDER BY i
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off
        | FROM ch)
        |SELECT doc_id, i::BIGINT AS page_num, 'text_block' AS content_type,
        | i::VARCHAR AS content_id, pg AS content_raw,
        | 0.0 AS x0, off::DOUBLE AS y0, 0.0 AS x1, (off + octet_length(pg::BLOB))::DOUBLE AS y1
        |FROM cho
        |UNION ALL
        |SELECT doc_id, i::BIGINT, 'image', substr(md5(pg),1,8), substr(md5(pg),1,8),
        | ((i*37)%500)::DOUBLE, ((i*53)%700)::DOUBLE,
        | ((i*37)%500 + 100 + (i*7)%200)::DOUBLE, ((i*53)%700 + 80 + (i*11)%160)::DOUBLE
        |FROM ch WHERE i % 3 = 0
        |ORDER BY doc_id, page_num, content_type""".stripMargin,
    // the REAL-format twins: the payload is a valid PDF / PPTX built
    // from the text, the Spark side parses the actual grammar (Flate,
    // BT/ET text operators, CTM image placement; OPC zip + DrawingML),
    // and the oracle recomputes the expected parse output from the
    // text alone — hash-checking the full bytes round trip
    "vs_parse_pdf" ->
      """WITH c AS (SELECT doc_id, text,
        |  unnest(range(0, ((length(text)-1)//200)::BIGINT + 1)) AS i FROM documents),
        |ch AS (SELECT doc_id, text, i, substr(text, (i*200+1)::INT, 200) pg FROM c),
        |np AS (SELECT doc_id, count(*) AS p FROM ch GROUP BY 1)
        |SELECT ch.doc_id, i::BIGINT AS page_num, 'text_block' AS content_type,
        | '0' AS content_id, trim(pg) AS content_raw,
        | (50 + (i*7)%100)::DOUBLE AS x0, (720 - (i*37)%600)::DOUBLE AS y0,
        | (CASE WHEN ('0x' || substring(md5(text), 9, 2))::BIGINT % 3 = 0
        |        AND ('0x' || substring(md5(text), 5, 2))::BIGINT % 4 <> 0
        |        AND i % 5 <> 2
        |   THEN (50 + (i*7)%100)::DOUBLE
        |     + (400*length(pg) + 25*list_sum(list_transform(
        |         string_split(pg, ''), c -> ascii(c)%16)))::DOUBLE / 1000 * 12
        |   ELSE (50 + (i*7)%100 + 6*length(pg))::DOUBLE END) AS x1,
        | (720 - (i*37)%600 + 12)::DOUBLE AS y1
        |FROM ch WHERE trim(pg) <> ''
        |UNION ALL
        |SELECT ch.doc_id, i::BIGINT, 'image', (6 + 2*np.p + i//3)::VARCHAR,
        | to_base64(encode(substr(md5(pg),1,8))),
        | ((i*37)%500)::DOUBLE, ((i*53)%700)::DOUBLE,
        | ((i*37)%500 + 100 + (i*7)%200)::DOUBLE, ((i*53)%700 + 80 + (i*11)%160)::DOUBLE
        |FROM ch JOIN np USING (doc_id) WHERE i % 3 = 0
        |ORDER BY doc_id, page_num, content_type""".stripMargin,
    "vs_parse_pptx" ->
      """WITH c AS (SELECT doc_id, text,
        |  unnest(range(0, ((length(text)-1)//200)::BIGINT + 1)) AS i FROM documents),
        |ch AS (SELECT doc_id, i, substr(text, (i*200+1)::INT, 200) pg FROM c)
        |SELECT doc_id, i::BIGINT AS page_num, 'text_block' AS content_type,
        | '2' AS content_id, trim(pg) AS content_raw,
        | (914400 + 1000*i)::DOUBLE AS x0, (457200 + 2000*i)::DOUBLE AS y0,
        | (914400 + 1000*i + 6096000)::DOUBLE AS x1,
        | (457200 + 2000*i + 1143000)::DOUBLE AS y1
        |FROM ch WHERE trim(pg) <> ''
        |UNION ALL
        |SELECT doc_id, i::BIGINT, 'image', '3',
        | to_base64(encode(substr(md5(pg),1,8))),
        | ((i*37)%500*9525)::DOUBLE, ((i*53)%700*9525)::DOUBLE,
        | (((i*37)%500 + 100 + (i*7)%200)*9525)::DOUBLE,
        | (((i*53)%700 + 80 + (i*11)%160)*9525)::DOUBLE
        |FROM ch WHERE i % 3 = 0
        |ORDER BY doc_id, page_num, content_type""".stripMargin,
    // DOCX: paragraph ordinals are content ids (w:p carries no id),
    // page_num 0 throughout (no pages until render-time layout);
    // ordering is on the STRING id in both engines
    // the trim set is EXACTLY the parser's stripDocWs (space/tab/CR/LF)
    // — Scala's String.trim strips every char <= U+0020, which SQL trim
    // cannot express, and a chunk boundary can land on any of them
    "vs_parse_docx" ->
      """WITH c AS (SELECT doc_id, text,
        |  unnest(range(0, ((length(text)-1)//200)::BIGINT + 1)) AS i FROM documents),
        |ch AS (SELECT doc_id, i, substr(text, (i*200+1)::INT, 200) pg FROM c)
        |SELECT doc_id, 0::BIGINT AS page_num, 'text_block' AS content_type,
        | i::VARCHAR AS content_id, trim(pg, ' ' || chr(9) || chr(10) || chr(13)) AS content_raw,
        | 0.0::DOUBLE AS x0, 0.0::DOUBLE AS y0, 0.0::DOUBLE AS x1, 0.0::DOUBLE AS y1
        |FROM ch WHERE trim(pg, ' ' || chr(9) || chr(10) || chr(13)) <> ''
        |UNION ALL
        |SELECT doc_id, 0::BIGINT, 'image', (1000+i)::VARCHAR,
        | to_base64(encode(substr(md5(pg),1,8))),
        | 0.0::DOUBLE, 0.0::DOUBLE,
        | ((100 + (i*7)%200)*9525)::DOUBLE, ((80 + (i*11)%160)*9525)::DOUBLE
        |FROM ch WHERE i % 3 = 0
        |UNION ALL
        |SELECT doc_id, 0::BIGINT, 'text_block',
        | ((CASE WHEN length(text) = 0 THEN 0 ELSE (length(text)-1)//200 + 1 END) + t.k)::VARCHAR,
        | t.v, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE
        |FROM documents, (SELECT unnest([0,1,2,3]) k,
        |  unnest(['cell alpha','cell beta','cell gamma','cell delta']) v) t
        |ORDER BY doc_id, content_type, content_id""".stripMargin,
    // ODT: docx's shape on the ODF vocabulary — ordinal paragraph
    // ids, frame-name image ids, svg dims verbatim (pt, no EMU scale)
    "vs_parse_odt" ->
      """WITH c AS (SELECT doc_id, text,
        |  unnest(range(0, ((length(text)-1)//200)::BIGINT + 1)) AS i FROM documents),
        |ch AS (SELECT doc_id, i, substr(text, (i*200+1)::INT, 200) pg FROM c)
        |SELECT doc_id, 0::BIGINT AS page_num, 'text_block' AS content_type,
        | i::VARCHAR AS content_id, trim(pg, ' ' || chr(9) || chr(10) || chr(13)) AS content_raw,
        | 0.0::DOUBLE AS x0, 0.0::DOUBLE AS y0, 0.0::DOUBLE AS x1, 0.0::DOUBLE AS y1
        |FROM ch WHERE trim(pg, ' ' || chr(9) || chr(10) || chr(13)) <> ''
        |UNION ALL
        |SELECT doc_id, 0::BIGINT, 'image', (1000+i)::VARCHAR,
        | to_base64(encode(substr(md5(pg),1,8))),
        | 0.0::DOUBLE, 0.0::DOUBLE,
        | (100 + (i*7)%200)::DOUBLE, (80 + (i*11)%160)::DOUBLE
        |FROM ch WHERE i % 3 = 0
        |UNION ALL
        |SELECT doc_id, 0::BIGINT, 'text_block',
        | ((CASE WHEN length(text) = 0 THEN 0 ELSE (length(text)-1)//200 + 1 END) + t.k)::VARCHAR,
        | t.v, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE
        |FROM documents, (SELECT unnest([0,1,2,3]) k,
        |  unnest(['cell alpha','cell beta','cell gamma','cell delta']) v) t
        |ORDER BY doc_id, content_type, content_id""".stripMargin,
    // RTF: paragraph text is VERBATIM (no trim — RTF preserves run
    // whitespace), pict hex decodes to the md5-prefix bytes, bbox
    // from \picw/\pich; table cells land at nc + [0,1,3,4] (\row's
    // flush claims the empty ordinal between rows)
    "vs_parse_rtf" ->
      """WITH c AS (SELECT doc_id, text,
        |  unnest(range(0, ((length(text)-1)//200)::BIGINT + 1)) AS i FROM documents),
        |ch AS (SELECT doc_id, i, substr(text, (i*200+1)::INT, 200) pg FROM c)
        |SELECT doc_id, 0::BIGINT AS page_num, 'text_block' AS content_type,
        | i::VARCHAR AS content_id, pg AS content_raw,
        | 0.0::DOUBLE AS x0, 0.0::DOUBLE AS y0, 0.0::DOUBLE AS x1, 0.0::DOUBLE AS y1
        |FROM ch
        |UNION ALL
        |SELECT doc_id, 0::BIGINT, 'image', (1000 + i//3)::VARCHAR,
        | to_base64(encode(substr(md5(pg),1,8))),
        | 0.0::DOUBLE, 0.0::DOUBLE,
        | (100 + (i*7)%200)::DOUBLE, (80 + (i*11)%160)::DOUBLE
        |FROM ch WHERE i % 3 = 0
        |UNION ALL
        |SELECT doc_id, 0::BIGINT, 'text_block',
        | ((CASE WHEN length(text) = 0 THEN 0 ELSE (length(text)-1)//200 + 1 END) + t.k)::VARCHAR,
        | t.v, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE
        |FROM documents, (SELECT unnest([0,1,3,4]) k,
        |  unnest(['cell alpha','cell beta','cell gamma','cell delta']) v) t
        |ORDER BY doc_id, content_type, content_id""".stripMargin,
    // HTML: DOM paths are content ids, text runs are whitespace-
    // collapsed, head/nav/aside/footer text is content_type
    // 'boilerplate' (main-content extraction hash-checked alongside
    // the happy path — the synth page is deliberate tag soup, see
    // SynthHtml). The aside row replays the CHARSET share route: its
    // per-share non-ASCII string only survives a correct
    // BOM/meta-prescan decode (utf-8+BOM / windows-1252 / Shift_JIS)
    "vs_parse_html" ->
      raw"""WITH c AS (SELECT doc_id, text,
        |  unnest(range(0, ((length(text)-1)//200)::BIGINT + 1)) AS i FROM documents),
        |ch AS (SELECT doc_id, i, substr(text, (i*200+1)::INT, 200) pg FROM c)
        |SELECT doc_id, 0::BIGINT AS page_num, 'text_block' AS content_type,
        | '/html[1]/body[1]/main[1]/p[' || (i+1) || ']' AS content_id,
        | trim(regexp_replace(pg, '\s+', ' ', 'g')) AS content_raw,
        | 0.0::DOUBLE AS x0, 0.0::DOUBLE AS y0, 0.0::DOUBLE AS x1, 0.0::DOUBLE AS y1
        |FROM ch WHERE trim(regexp_replace(pg, '\s+', ' ', 'g')) <> ''
        |UNION ALL
        |SELECT doc_id, 0::BIGINT, 'image',
        | '/html[1]/body[1]/main[1]/p[' || (i+1) || ']/img[1]',
        | to_base64(encode(substr(md5(pg),1,8))),
        | 0.0::DOUBLE, 0.0::DOUBLE,
        | (100 + (i*7)%200)::DOUBLE, (80 + (i*11)%160)::DOUBLE
        |FROM ch WHERE i % 3 = 0
        |UNION ALL
        |SELECT doc_id, 0::BIGINT, 'boilerplate', '/html[1]/head[1]/title[1]',
        | trim(regexp_replace(substr(text,1,40), '\s+', ' ', 'g')),
        | 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE
        |FROM documents WHERE trim(regexp_replace(substr(text,1,40), '\s+', ' ', 'g')) <> ''
        |UNION ALL
        |SELECT doc_id, 0::BIGINT, 'boilerplate', '/html[1]/body[1]/header[1]/nav[1]',
        | 'Home About Contact', 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE
        |FROM documents
        |UNION ALL
        |SELECT doc_id, 0::BIGINT, 'boilerplate', '/html[1]/body[1]/aside[1]',
        | $HtmlAsideCase, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE
        |FROM documents
        |UNION ALL
        |SELECT doc_id, 0::BIGINT, 'boilerplate', '/html[1]/body[1]/footer[1]',
        | '(c) example.com - static footer', 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE
        |FROM documents
        |ORDER BY doc_id, content_type, content_id""".stripMargin,
    // XLSX: cell ids are 'Sheet!A1' names, page_num = sheet ordinal,
    // x0/y0 = 1-based column/row; number cells keep the file's v text
    // verbatim (no float re-formatting on either side)
    "vs_parse_xlsx" ->
      """WITH c AS (SELECT doc_id, text,
        |  unnest(range(0, ((length(text)-1)//200)::BIGINT + 1)) AS i FROM documents),
        |ch AS (SELECT doc_id, i, substr(text, (i*200+1)::INT, 200) pg FROM c)
        |SELECT doc_id, 0::BIGINT AS page_num, 'text_block' AS content_type,
        | 'Data!A' || (i+1) AS content_id, pg AS content_raw,
        | 1.0::DOUBLE AS x0, (i+1)::DOUBLE AS y0, 0.0::DOUBLE AS x1, 0.0::DOUBLE AS y1
        |FROM ch
        |UNION ALL
        |SELECT doc_id, 0::BIGINT, 'number', 'Data!B' || (i+1),
        | octet_length(pg::BLOB)::VARCHAR, 2.0::DOUBLE, (i+1)::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE
        |FROM ch
        |UNION ALL
        |SELECT doc_id, 0::BIGINT, 'text_block', 'Data!C' || (i+1),
        | substr(md5(pg),1,8), 3.0::DOUBLE, (i+1)::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE
        |FROM ch WHERE i % 3 = 0
        |UNION ALL
        |SELECT doc_id, 1::BIGINT, 'text_block', 'Meta!A1', 'chunks',
        | 1.0::DOUBLE, 1.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE
        |FROM documents
        |UNION ALL
        |SELECT doc_id, 1::BIGINT, 'number', 'Meta!B1',
        | (CASE WHEN length(text) = 0 THEN 0
        |   ELSE (length(text)-1)//200 + 1 END)::VARCHAR,
        | 2.0::DOUBLE, 1.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE
        |FROM documents
        |ORDER BY doc_id, page_num, content_id""".stripMargin,
    // Markdown: kind-ordinal ids; code chunks land at i%4==1 so
    // codeBefore(i) = (i+2)//4, paragraph ordinal = i - codeBefore + 1;
    // code bodies are VERBATIM (whitespace preserved), paragraphs
    // whitespace-collapse; the static quote/list footer rows exercise
    // those block paths on every document
    "vs_parse_md" ->
      """WITH c AS (SELECT doc_id, text,
        |  unnest(range(0, ((length(text)-1)//200)::BIGINT + 1)) AS i FROM documents),
        |ch AS (SELECT doc_id, i, substr(text, (i*200+1)::INT, 200) pg FROM c)
        |SELECT doc_id, 0::BIGINT AS page_num, 'heading' AS content_type,
        | '/h1[1]' AS content_id,
        | trim(regexp_replace(substr(text,1,40), '\s+', ' ', 'g')) AS content_raw,
        | 0.0::DOUBLE AS x0, 0.0::DOUBLE AS y0, 0.0::DOUBLE AS x1, 0.0::DOUBLE AS y1
        |FROM documents WHERE trim(regexp_replace(substr(text,1,40), '\s+', ' ', 'g')) <> ''
        |UNION ALL
        |SELECT doc_id, 0::BIGINT, 'text_block',
        | '/p[' || (i - (i+2)//4 + 1) || ']', trim(pg),
        | 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE
        |FROM ch WHERE i % 4 <> 1
        |UNION ALL
        |SELECT doc_id, 0::BIGINT, 'code',
        | '/code[' || ((i+2)//4 + 1) || ']', pg,
        | 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE
        |FROM ch WHERE i % 4 = 1
        |UNION ALL
        |SELECT doc_id, 0::BIGINT, 'image',
        | '/p[' || (i - (i+2)//4 + 1) || ']/img[1]',
        | to_base64(encode(substr(md5(pg),1,8))),
        | 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE
        |FROM ch WHERE i % 3 = 0 AND i % 4 <> 1
        |UNION ALL
        |SELECT doc_id, 0::BIGINT, 'quote', '/bq[1]', 'static quote',
        | 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE
        |FROM documents
        |UNION ALL
        |SELECT doc_id, 0::BIGINT, 'list_item', '/li[' || k || ']',
        | CASE WHEN k = 1 THEN 'alpha item' ELSE 'beta item' END,
        | 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE
        |FROM documents, (SELECT unnest([1, 2]) k)
        |ORDER BY doc_id, content_type, content_id""".stripMargin,
    // HTML quality: boilerplate = collapsed title + the static nav
    // (18 chars) + footer (31 chars) + the charset-share aside; main
    // = the collapsed chunks. Exact integer counts, one double
    // division before the round
    "vs_html_quality" ->
      raw"""WITH c AS (SELECT doc_id, text,
        |  unnest(range(0, ((length(text)-1)//200)::BIGINT + 1)) AS i FROM documents),
        |ch AS (SELECT doc_id, i, substr(text, (i*200+1)::INT, 200) pg FROM c),
        |m AS (SELECT doc_id, sum(length(trim(pg))) mc FROM ch GROUP BY 1),
        |t AS (SELECT doc_id,
        |  length(trim(regexp_replace(substr(text,1,40), '\s+', ' ', 'g'))) + 49
        |    + length($HtmlAsideCase) AS bc
        | FROM documents)
        |SELECT d.doc_id, coalesce(m.mc, 0)::BIGINT AS main_chars,
        | t.bc::BIGINT AS boiler_chars,
        | round(t.bc::DOUBLE / (t.bc + coalesce(m.mc, 0)), 4) AS boilerplate_ratio
        |FROM documents d JOIN t USING (doc_id) LEFT JOIN m USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // WARC: the crawl-container chain — gzip members -> WARC records
    // -> HTTP response -> the SynthHtml page rows, plus the derived
    // target URI and the HTTP status read from the message
    "vs_parse_warc" ->
      raw"""WITH c AS (SELECT doc_id, text,
        |  unnest(range(0, ((length(text)-1)//200)::BIGINT + 1)) AS i FROM documents),
        |ch AS (SELECT doc_id, i, substr(text, (i*200+1)::INT, 200) pg FROM c),
        |u AS (SELECT doc_id, 'HTTP://Example.COM:80//' || substr(md5(text),1,8)
        |  || '/?utm_source=feed&fbclid=xyz#top' uri FROM documents),
        |rows0 AS (
        |SELECT doc_id, 'text_block' AS content_type,
        | '/html[1]/body[1]/main[1]/p[' || (i+1) || ']' AS content_id,
        | trim(regexp_replace(pg, '\s+', ' ', 'g')) AS content_raw,
        | 0.0::DOUBLE AS x1, 0.0::DOUBLE AS y1
        |FROM ch WHERE trim(regexp_replace(pg, '\s+', ' ', 'g')) <> ''
        |UNION ALL
        |SELECT doc_id, 'image',
        | '/html[1]/body[1]/main[1]/p[' || (i+1) || ']/img[1]',
        | to_base64(encode(substr(md5(pg),1,8))),
        | (100 + (i*7)%200)::DOUBLE, (80 + (i*11)%160)::DOUBLE
        |FROM ch WHERE i % 3 = 0
        |UNION ALL
        |SELECT doc_id, 'boilerplate', '/html[1]/head[1]/title[1]',
        | trim(regexp_replace(substr(text,1,40), '\s+', ' ', 'g')), 0.0::DOUBLE, 0.0::DOUBLE
        |FROM documents WHERE trim(regexp_replace(substr(text,1,40), '\s+', ' ', 'g')) <> ''
        |UNION ALL
        |SELECT doc_id, 'boilerplate', '/html[1]/body[1]/header[1]/nav[1]',
        | 'Home About Contact', 0.0::DOUBLE, 0.0::DOUBLE FROM documents
        |UNION ALL
        |SELECT doc_id, 'boilerplate', '/html[1]/body[1]/aside[1]',
        | $HtmlAsideCase, 0.0::DOUBLE, 0.0::DOUBLE FROM documents
        |UNION ALL
        |SELECT doc_id, 'boilerplate', '/html[1]/body[1]/footer[1]',
        | '(c) example.com - static footer', 0.0::DOUBLE, 0.0::DOUBLE FROM documents)
        |SELECT r.doc_id, u.uri AS target_uri, 200::BIGINT AS status,
        | r.content_type, r.content_id, r.content_raw, r.x1, r.y1
        |FROM rows0 r JOIN u USING (doc_id)
        |ORDER BY r.doc_id, r.content_type, r.content_id""".stripMargin,
    // EPUB: chunk i is paragraph i%2+1 of spine chapter i//2 (the
    // synth declares chapters in REVERSE order — only the spine walk
    // reproduces these page numbers); content ids are href#dom-path,
    // chapter titles are boilerplate, image parts resolve to base64
    "vs_parse_epub" ->
      """WITH c AS (SELECT doc_id, text,
        |  unnest(range(0, ((length(text)-1)//200)::BIGINT + 1)) AS i FROM documents),
        |ch AS (SELECT doc_id, i, substr(text, (i*200+1)::INT, 200) pg FROM c)
        |SELECT doc_id, (i//2)::BIGINT AS page_num, 'text_block' AS content_type,
        | 'text/chap' || (i//2 + 1) || '.xhtml#/html[1]/body[1]/p[' || (i%2 + 1) || ']' AS content_id,
        | trim(regexp_replace(pg, '\s+', ' ', 'g')) AS content_raw,
        | 0.0::DOUBLE AS x0, 0.0::DOUBLE AS y0, 0.0::DOUBLE AS x1, 0.0::DOUBLE AS y1
        |FROM ch WHERE trim(regexp_replace(pg, '\s+', ' ', 'g')) <> ''
        |UNION ALL
        |SELECT doc_id, (i//2)::BIGINT, 'image',
        | 'text/chap' || (i//2 + 1) || '.xhtml#/html[1]/body[1]/p[' || (i%2 + 1) || ']/img[1]',
        | to_base64(encode(substr(md5(pg),1,8))),
        | 0.0::DOUBLE, 0.0::DOUBLE,
        | (100 + (i*7)%200)::DOUBLE, (80 + (i*11)%160)::DOUBLE
        |FROM ch WHERE i % 3 = 0
        |UNION ALL
        |SELECT DISTINCT doc_id, (i//2)::BIGINT, 'boilerplate',
        | 'text/chap' || (i//2 + 1) || '.xhtml#/html[1]/head[1]/title[1]',
        | 'Chapter ' || (i//2 + 1),
        | 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE
        |FROM ch
        |ORDER BY doc_id, page_num, content_type, content_id""".stripMargin,
    // JSONL: one C4-shaped record per chunk; the JSON escape/unescape
    // round-trips, so the oracle is the chunk verbatim under the
    // fragment-numbered record url
    "vs_parse_jsonl" ->
      """WITH c AS (SELECT doc_id, text,
        |  unnest(range(0, ((length(text)-1)//200)::BIGINT + 1)) AS i FROM documents),
        |ch AS (SELECT doc_id, text, i, substr(text, (i*200+1)::INT, 200) pg FROM c)
        |SELECT doc_id, 0::BIGINT AS page_num, 'text_block' AS content_type,
        | 'http://example.com/' || substr(md5(text),1,8) || '#' || i AS content_id,
        | pg AS content_raw,
        | 0.0::DOUBLE AS x0, 0.0::DOUBLE AS y0, 0.0::DOUBLE AS x1, 0.0::DOUBLE AS y1
        |FROM ch
        |ORDER BY doc_id, content_id""".stripMargin,
    // CSV: the jsonl twin through to_csv/from_csv — the quoting
    // round-trips, so the oracle is again the chunk verbatim
    "vs_parse_csv" ->
      """WITH c AS (SELECT doc_id, text,
        |  unnest(range(0, ((length(text)-1)//200)::BIGINT + 1)) AS i FROM documents),
        |ch AS (SELECT doc_id, text, i, substr(text, (i*200+1)::INT, 200) pg FROM c)
        |SELECT doc_id, 0::BIGINT AS page_num, 'text_block' AS content_type,
        | 'http://example.com/' || substr(md5(text),1,8) || '#' || i AS content_id,
        | pg AS content_raw,
        | 0.0::DOUBLE AS x0, 0.0::DOUBLE AS y0, 0.0::DOUBLE AS x1, 0.0::DOUBLE AS y1
        |FROM ch
        |ORDER BY doc_id, content_id""".stripMargin,
    "vs_sources" ->
      s"""WITH $normCte,
        |p AS (SELECT q.vec_id q_id, c.vec_id n_id,
        |  round($dotExpr / (q.nrm * c.nrm), 4) sim_r
        | FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id >= 10),
        |r AS (SELECT q_id, n_id, sim_r,
        |  row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, n_id) rnk FROM p)
        |SELECT r.q_id, r.rnk::BIGINT AS rnk, r.n_id, d.source, d.lang
        |FROM r JOIN documents d ON d.doc_id = r.n_id WHERE r.rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin,
    "ann_brute" ->
      s"""WITH $normCte,
        |p AS (SELECT q.vec_id q_id, c.vec_id n_id,
        |  round($dotExpr / (q.nrm * c.nrm), 4) sim_r
        | FROM n q, n c WHERE c.vec_id != q.vec_id),
        |r AS (SELECT q_id, n_id, sim_r,
        |  row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, n_id) rnk FROM p)
        |SELECT q_id, rnk::BIGINT AS rnk, n_id, sim_r FROM r WHERE rnk <= 3
        |ORDER BY q_id, rnk""".stripMargin,
    "dd_exact" ->
      """SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS norm_hash,
        | min(doc_id) AS keeper_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keeper_doc_id""".stripMargin,
    // dd_urls: both raw variants of a doc canonicalize to the same
    // page URL (case/port/slash/tracking/fragment/param-order rules
    // all exercised), so the oracle derives the canonical directly
    "dd_urls" ->
      """SELECT 'http://example.com/articles/item' || (doc_id % 40) || '?a=1&b=2' AS canonical,
        | (2 * count(*))::BIGINT AS n_raw,
        | count(DISTINCT doc_id)::BIGINT AS n_docs,
        | min(doc_id) AS keeper_doc_id
        |FROM documents GROUP BY doc_id % 40 ORDER BY canonical""".stripMargin,
    "dd_jaccard" ->
      s"""WITH w0 AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w
        |  FROM documents WHERE doc_id % 10 = 0),
        |bg AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)),
        |   i -> w[i::INT] || ' ' || w[(i+1)::INT])) s FROM w0)
        |SELECT a.doc_id a_id, b.doc_id b_id, $jaccardExpr AS j_r
        |FROM bg a, bg b WHERE a.doc_id < b.doc_id AND $jaccardExpr >= 0.05
        |ORDER BY a_id, b_id""".stripMargin,
    "dd_minhash" ->
      s"""WITH ${shinglePairsCte("0.5")}
        |SELECT a_id, b_id, j_r FROM pr
        |ORDER BY a_id, b_id""".stripMargin,
    // incremental new-batch-vs-corpus check: the oracle is the exact
    // shingle join between the two disjoint subsets — every (new, base)
    // pair at the threshold, which the band-join path must reproduce
    "dd_incr" ->
      """WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)),
        |   i -> w[i::INT] || ' ' || w[(i+1)::INT]))) s
        | FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents)),
        |sz AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id new_id, b.doc_id base_id, count(*) i
        | FROM sh a JOIN sh b ON a.s = b.s
        | WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0 GROUP BY 1, 2),
        |pr AS (SELECT new_id, base_id, round(i::DOUBLE / (sa.n + sb.n - i), 4) j_r
        | FROM inter JOIN sz sa ON sa.doc_id = inter.new_id
        |            JOIN sz sb ON sb.doc_id = inter.base_id
        | WHERE round(i::DOUBLE / (sa.n + sb.n - i), 4) >= 0.5)
        |SELECT new_id, base_id, j_r FROM pr
        |ORDER BY new_id, base_id""".stripMargin,
    "dd_cluster" ->
      s"""WITH RECURSIVE ${shinglePairsCte("0.5")},
        |e AS (SELECT a_id u, b_id v FROM pr UNION ALL SELECT b_id u, a_id v FROM pr),
        |reach(u, r) AS (
        | SELECT u, u FROM e
        | UNION
        | SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.u)
        |SELECT u AS doc_id, min(r) AS cluster_id FROM reach GROUP BY u
        |ORDER BY doc_id""".stripMargin,
    "dd_simhash" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') tk FROM documents),
        |hs AS (SELECT doc_id, list_transform(tk, t -> substr(md5(t), 1, 15)) h FROM toks),
        |ds AS (SELECT doc_id, list_transform(h, x -> list_transform(range(1, 16),
        |   p -> strpos('0123456789abcdef', substr(x, p::INT, 1))::BIGINT - 1)) d FROM hs),
        |votes AS (SELECT doc_id, list_transform(range(0, 60),
        |   i -> list_sum(list_transform(d, dd -> ((dd[(i//4+1)::INT] >> ((3 - (i % 4)))::INT) & 1) * 2 - 1))) v FROM ds),
        |fp AS (SELECT doc_id, list_sum(list_transform(range(0, 60),
        |   i -> CASE WHEN v[(i+1)::INT] > 0 THEN (1::BIGINT << ((59-i))::INT) ELSE 0 END))::BIGINT f FROM votes)
        |SELECT a.doc_id a_id, b.doc_id b_id, bit_count(xor(a.f, b.f))::BIGINT AS hamming
        |FROM fp a, fp b WHERE a.doc_id < b.doc_id AND bit_count(xor(a.f, b.f)) <= 3
        |ORDER BY a_id, b_id""".stripMargin,
    "dd_embed" ->
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) v,
        |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) nrm
        | FROM embeddings),
        |p AS (SELECT a.vec_id a_id, b.vec_id b_id,
        |  round(list_sum(list_transform(range(1, 65), i -> a.v[i::INT] * b.v[i::INT])) / (a.nrm * b.nrm), 4) sim_r
        | FROM n a, n b WHERE a.vec_id < b.vec_id)
        |SELECT a_id, b_id, sim_r FROM p WHERE sim_r >= 0.35 ORDER BY a_id, b_id""".stripMargin,
    // SemDeDup replay: seeded centroids (vec_id < 8), 6dp-rounded
    // argmax assignment with smallest-cluster tie-break, within-cluster
    // pairs at the same 4dp-cosine threshold as dd_embed — the
    // clustering prefilter itself is what hash-checks
    "dd_semdedup" ->
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) v,
        |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) nrm
        | FROM embeddings),
        |s AS (SELECT vec_id cl, v cv, nrm cnrm FROM n WHERE vec_id < 8),
        |a0 AS (SELECT n.vec_id, n.v, n.nrm, s.cl,
        |  round(list_sum(list_transform(range(1, 65), i -> n.v[i::INT] * s.cv[i::INT])) / (n.nrm * s.cnrm), 6) csim
        | FROM n, s),
        |asg AS (SELECT vec_id, v, nrm, cl FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cl) rn
        |  FROM a0) WHERE rn = 1),
        |p AS (SELECT a.cl, a.vec_id a_id, b.vec_id b_id,
        |  round(list_sum(list_transform(range(1, 65), i -> a.v[i::INT] * b.v[i::INT])) / (a.nrm * b.nrm), 4) sim_r
        | FROM asg a JOIN asg b ON a.cl = b.cl AND a.vec_id < b.vec_id)
        |SELECT cl, a_id, b_id, sim_r FROM p WHERE sim_r >= 0.35
        |ORDER BY a_id, b_id""".stripMargin,
    // mirrors the RP-LSH machinery exactly: md5-derived hyperplanes
    // (signed first-4-bytes / Int.MaxValue), 12 sign-bits × 8 tables,
    // candidates = pairs within hamming ≤ 1 of a table signature (the
    // semantic spec of the 1-bit multiprobe bucket join), then the
    // same rounded-cosine verify — so rows hash-match the Spark plan
    "dd_embed_lsh" -> embedLshOracle,
    // the adaptive config's oracle DERIVES the geometry in SQL from
    // count(*) exactly as adaptivePlanes/adaptiveTables do (r17 — the
    // r16 sf1 gate excluded this query because the shared pinned
    // oracle only matched at scales where the geometries coincide):
    // planes = max(12, ceil(log2(n/0.5))), tables = the smallest t
    // whose 1-bit-multiprobe GW recall bound at cos 0.9 clears 0.99.
    // At sf0.01 (n=2000) this folds to the pinned 8×12; at sf1
    // (n=20000) to 13×16 — the gate now covers BOTH regimes
    "dd_embed_lsha" -> embedLshaOracle,
    "tx_langid" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') toks FROM documents),
        |s AS (SELECT doc_id,
        | len(list_filter(toks, t -> t IN ('data','table','row')))::BIGINT s_de,
        | len(list_filter(toks, t -> t IN ('the','fast','slow')))::BIGINT s_en,
        | len(list_filter(toks, t -> t IN ('query','column','line')))::BIGINT s_es,
        | len(list_filter(toks, t -> t IN ('join','merge','sort')))::BIGINT s_fr,
        | len(list_filter(toks, t -> t IN ('hash','vector','stream')))::BIGINT s_zh
        | FROM t)
        |SELECT doc_id, s_de, s_en, s_es, s_fr, s_zh,
        | CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |      WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |      WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |      WHEN s_fr >= s_zh THEN 'fr'
        |      ELSE 'zh' END AS predicted
        |FROM s ORDER BY doc_id""".stripMargin,
    "tx_quality" ->
      """WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') toks FROM documents)
        |SELECT doc_id, length(text)::BIGINT n_chars_c, len(toks)::BIGINT n_tokens,
        | round(length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE / len(toks), 4) mean_tok_len,
        | round(len(list_filter(toks, t -> t IN ('the','a','of','and')))::DOUBLE / len(toks), 4) stop_ratio,
        | round(0.4 * round(len(list_filter(toks, t -> t IN ('the','a','of','and')))::DOUBLE / len(toks), 4)
        |     + 0.6 * least(1.0, len(toks)::DOUBLE / 100), 4) quality
        |FROM t ORDER BY doc_id""".stripMargin,
    "tx_tokens" ->
      """SELECT doc_id, n_chars,
        | len(string_split_regex(trim(text), '\s+'))::BIGINT n_ws,
        | len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))::BIGINT n_bpe,
        | round(n_chars::DOUBLE / len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')), 4) chars_per_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,
    "tx_fingerprint" ->
      """WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') w FROM documents),
        |sh AS (SELECT doc_id, text, list_transform(range(1, len(w)-1),
        |  i -> w[i::INT] || ' ' || w[(i+1)::INT] || ' ' || w[(i+2)::INT]) s FROM t)
        |SELECT doc_id,
        | md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) fp_md5,
        | coalesce(list_min(list_transform(s, x -> ('0x' || substr(md5(x),1,8))::BIGINT)),
        |   ('0x' || substr(md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')),1,8))::BIGINT) min_shingle_hash
        |FROM sh ORDER BY doc_id""".stripMargin,
    "tx_ngrams" ->
      """WITH b AS (SELECT unnest(list_transform(range(1, len(w)),
        |  i -> w[i::INT] || ' ' || w[(i+1)::INT])) bigram
        | FROM (SELECT string_split_regex(trim(text), '\s+') w FROM documents))
        |SELECT bigram, count(*) n FROM b GROUP BY bigram
        |ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    "tx_scrub" ->
      """SELECT event_id,
        | len(regexp_extract_all(props, '[0-9]+'))::BIGINT AS n_redacted,
        | md5(regexp_replace(props, '[0-9]+', '<NUM>', 'g')) AS scrubbed_md5
        |FROM events ORDER BY event_id""".stripMargin,
    // tx_pii: the payload is md5-arithmetic injection the oracle
    // replays exactly; the scrub/count/ratio regexes are the SAME
    // strings both engines run (Java-regex ∩ RE2 subset)
    "tx_pii" ->
      """WITH b AS (SELECT doc_id, text, md5(text) h, md5(reverse(text)) h2
        |  FROM documents),
        |p AS (SELECT doc_id, substr(text,1,80)
        |  || CASE WHEN ('0x'||substr(h,1,2))::BIGINT % 4 != 0
        |       THEN ' contact u' || substr(h,1,8) || '@example.com' ELSE '' END
        |  || CASE WHEN ('0x'||substr(h,3,2))::BIGINT % 4 != 1
        |       THEN ' call +1-'
        |         || lpad((('0x'||substr(h,9,3))::BIGINT % 1000)::VARCHAR, 3, '0') || '-'
        |         || lpad((('0x'||substr(h,12,3))::BIGINT % 1000)::VARCHAR, 3, '0') || '-'
        |         || lpad((('0x'||substr(h,15,4))::BIGINT % 10000)::VARCHAR, 4, '0')
        |       ELSE '' END
        |  || CASE WHEN ('0x'||substr(h,5,2))::BIGINT % 4 != 2
        |       THEN ' from ' || ('0x'||substr(h,17,2))::BIGINT::VARCHAR
        |         || '.' || ('0x'||substr(h,19,2))::BIGINT::VARCHAR
        |         || '.' || ('0x'||substr(h,21,2))::BIGINT::VARCHAR
        |         || '.' || ('0x'||substr(h,23,2))::BIGINT::VARCHAR ELSE '' END
        |  || CASE WHEN ('0x'||substr(h,7,2))::BIGINT % 4 != 3
        |       THEN ' via 2001:db8:' || substr(h2,1,4) || ':' || substr(h2,5,4)
        |         || ':' || substr(h2,9,4) ELSE '' END
        |  || ' ' || substr(text,81) AS payload FROM b)
        |SELECT doc_id,
        | len(regexp_extract_all(payload, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
        | len(regexp_extract_all(payload, '(?:[0-9a-f]{1,4}:){2,}[0-9a-f]{1,4}'))::BIGINT AS n_ip6,
        | len(regexp_extract_all(payload, '(?:[0-9]{1,3}\.){3}[0-9]{1,3}'))::BIGINT AS n_ip4,
        | len(regexp_extract_all(payload, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}'))::BIGINT AS n_phone,
        | round((length(payload) - length(
        |   regexp_replace(regexp_replace(regexp_replace(regexp_replace(payload,
        |     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '', 'g'),
        |     '(?:[0-9a-f]{1,4}:){2,}[0-9a-f]{1,4}', '', 'g'),
        |     '(?:[0-9]{1,3}\.){3}[0-9]{1,3}', '', 'g'),
        |     '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '', 'g')))
        |   / length(payload), 6) AS pii_ratio,
        | md5(
        |   regexp_replace(regexp_replace(regexp_replace(regexp_replace(payload,
        |     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |     '(?:[0-9a-f]{1,4}:){2,}[0-9a-f]{1,4}', '<IP6>', 'g'),
        |     '(?:[0-9]{1,3}\.){3}[0-9]{1,3}', '<IP4>', 'g'),
        |     '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_md5
        |FROM p ORDER BY doc_id""".stripMargin,
    // tx_gopher: every signal replays in SQL over the same token /
    // line splits; the rounded ratios compare exactly (round 4 both
    // sides, double division both sides)
    "tx_gopher" ->
      """WITH b AS (SELECT doc_id,
        |  string_split_regex(trim(text), '\s+') AS w,
        |  string_split(text, chr(10)) AS ln, text
        | FROM documents),
        |s AS (SELECT doc_id,
        |  len(w)::BIGINT AS word_count,
        |  round(list_sum(list_transform(w, t -> length(t))) / len(w)::DOUBLE, 4)
        |    AS mean_word_len,
        |  round((len(regexp_extract_all(text, '#'))
        |    + len(regexp_extract_all(text, '\.\.\.|…'))) / len(w)::DOUBLE, 4)
        |    AS symbol_ratio,
        |  round(len(list_filter(ln, l -> regexp_matches(ltrim(l), '^[-*•]')))
        |    / len(ln)::DOUBLE, 4) AS bullet_ratio,
        |  round(len(list_filter(ln, l -> regexp_matches(rtrim(l), '(\.\.\.|…)$')))
        |    / len(ln)::DOUBLE, 4) AS ellipsis_ratio,
        |  round(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]')))
        |    / len(w)::DOUBLE, 4) AS alpha_ratio,
        |  len(list_filter(w, t -> t IN ('the', 'a', 'of', 'and')))::BIGINT
        |    AS stop_hits
        | FROM b)
        |SELECT *,
        | (word_count BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3 AND 10
        |  AND symbol_ratio < 0.1 AND bullet_ratio < 0.9
        |  AND ellipsis_ratio < 0.3 AND alpha_ratio >= 0.8
        |  AND stop_hits >= 2) AS gopher_pass
        |FROM s ORDER BY doc_id""".stripMargin,
    // tx_c4: the gated payload assembly, the line-keep predicate, the
    // page flags, and the cleaned-text digest all replay in SQL
    "tx_c4" ->
      """WITH d AS (SELECT doc_id, text, md5(text) h FROM documents),
        |p AS (SELECT doc_id, concat_ws(chr(10),
        |  concat(substring(text, 1, 40), ' end of part one.'),
        |  'too short.',
        |  substring(text, 41, 30),
        |  CASE WHEN ('0x' || substring(h,1,2))::BIGINT % 2 = 0
        |    THEN concat('the second sentence arrives here ',
        |                substring(h,1,6), '.') ELSE NULL END,
        |  CASE WHEN ('0x' || substring(h,3,2))::BIGINT % 2 = 0
        |    THEN concat('a third sentence lands too ',
        |                substring(h,7,6), '.') ELSE NULL END,
        |  CASE WHEN ('0x' || substring(h,5,2))::BIGINT % 2 = 0
        |    THEN 'please enable javascript to view this content.'
        |    ELSE NULL END,
        |  CASE WHEN ('0x' || substring(h,7,2))::BIGINT % 4 = 0
        |    THEN 'lorem ipsum dolor sit amet.' ELSE NULL END,
        |  CASE WHEN ('0x' || substring(h,9,2))::BIGINT % 4 = 0
        |    THEN 'config { display }' ELSE NULL END,
        |  CASE WHEN ('0x' || substring(h,11,2))::BIGINT % 4 = 0
        |    THEN 'the forum post mentions xbadword openly.'
        |    ELSE NULL END) AS payload FROM d),
        |b AS (SELECT doc_id, payload,
        |  string_split(payload, chr(10)) AS lns,
        |  list_filter(string_split(payload, chr(10)), l ->
        |    regexp_matches(rtrim(l), '[.!?"]$')
        |    AND len(string_split_regex(trim(l), '\s+')) >= 5
        |    AND NOT contains(lower(l), 'javascript')) AS kept
        | FROM p)
        |SELECT doc_id,
        | len(lns)::BIGINT AS n_lines,
        | len(kept)::BIGINT AS kept_lines,
        | len(list_filter(lns, l -> contains(lower(l), 'javascript')))::BIGINT
        |   AS js_lines,
        | contains(lower(payload), 'lorem ipsum') AS has_lorem,
        | (contains(payload, '{') OR contains(payload, '}')) AS has_brace,
        | (contains(lower(payload), 'xbadword')
        |  OR contains(lower(payload), 'xnastyword')) AS has_badword,
        | md5(array_to_string(kept, chr(10))) AS clean_md5,
        | (len(kept) >= 3 AND NOT contains(lower(payload), 'lorem ipsum')
        |  AND NOT (contains(payload, '{') OR contains(payload, '}'))
        |  AND NOT (contains(lower(payload), 'xbadword')
        |           OR contains(lower(payload), 'xnastyword'))) AS c4_keep
        |FROM b ORDER BY doc_id""".stripMargin,
    // tx_rep: the md5-gated payload, the line/para duplicate mass, the
    // normalized-stream gram offsets (window cumsum), the top-gram
    // chars, and the duplicated-gram interval union all replay in SQL.
    // Ratios round through TIE-FREE integer arithmetic on both sides
    // ((20000n + d) // 2d = half-up of 10000n/d): round(double, 4) is
    // engine-dependent exactly at the .00005 ties, which the sf1 gate
    // hit 43 times
    "tx_rep" ->
      s"""WITH d AS (SELECT doc_id, text, md5(text) h, md5(reverse(text)) h2,
        |  ${(0 until 8).map(k => s"' rep' || substring(md5(text),${13 + 2 * k},2)")
             .mkString(" || ")} AS ph
        | FROM documents),
        |p AS (SELECT doc_id, concat(text,
        |  CASE WHEN ('0x' || substring(h,5,2))::BIGINT % 3 != 2
        |    THEN ph || ph || ph ELSE '' END,
        |  CASE WHEN ('0x' || substring(h,1,2))::BIGINT % 3 != 0
        |    THEN chr(10) || 'dupline ' || substring(h,1,6) ||
        |         chr(10) || 'mid ' || substring(h2,1,4) ||
        |         chr(10) || 'dupline ' || substring(h,1,6) ELSE '' END,
        |  CASE WHEN ('0x' || substring(h,3,2))::BIGINT % 3 != 1
        |    THEN chr(10) || chr(10) || 'duppara ' || substring(h,7,6) ||
        |         chr(10) || chr(10) || 'pmid ' || substring(h2,5,4) ||
        |         chr(10) || chr(10) || 'duppara ' || substring(h,7,6)
        |    ELSE '' END) AS payload FROM d),
        |b AS (SELECT doc_id,
        |  list_filter(string_split(payload, chr(10)), l -> trim(l) != '') lns,
        |  list_filter(string_split(payload, chr(10) || chr(10)),
        |    l -> trim(l) != '') prs,
        |  string_split_regex(trim(payload), '\\s+') w
        | FROM p),
        |base AS (SELECT doc_id,
        |  ((len(lns) - len(list_distinct(lns)))::BIGINT * 20000 + len(lns))
        |    // (len(lns)::BIGINT * 2) / 10000.0 AS dup_line_frac,
        |  ((list_sum(list_transform(lns, x -> length(x)))
        |    - list_sum(list_transform(list_distinct(lns), x -> length(x))))::BIGINT
        |    * 20000 + list_sum(list_transform(lns, x -> length(x)))::BIGINT)
        |    // (list_sum(list_transform(lns, x -> length(x)))::BIGINT * 2)
        |    / 10000.0 AS dup_line_char_frac,
        |  ((len(prs) - len(list_distinct(prs)))::BIGINT * 20000 + len(prs))
        |    // (len(prs)::BIGINT * 2) / 10000.0 AS dup_para_frac,
        |  ((list_sum(list_transform(prs, x -> length(x)))
        |    - list_sum(list_transform(list_distinct(prs), x -> length(x))))::BIGINT
        |    * 20000 + list_sum(list_transform(prs, x -> length(x)))::BIGINT)
        |    // (list_sum(list_transform(prs, x -> length(x)))::BIGINT * 2)
        |    / 10000.0 AS dup_para_char_frac,
        |  (list_sum(list_transform(w, x -> length(x))) + len(w) - 1)::BIGINT
        |    AS tot
        | FROM b),
        |t AS (SELECT doc_id, w, unnest(range(0, len(w))) AS s FROM b),
        |g AS (SELECT doc_id, s, w,
        |  coalesce(sum(length(w[(s+1)::INT]) + 1) OVER (PARTITION BY doc_id
        |    ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0)::BIGINT AS off
        | FROM t),
        |gr AS (SELECT doc_id, ns.n, off,
        |  array_to_string(w[(s+1)::INT:(s+ns.n)::INT], ' ') AS gram
        | FROM g, (SELECT unnest(range(2, 11)) AS n) ns
        | WHERE s + ns.n <= len(w)),
        |cnts AS (SELECT doc_id, n, gram, count(*) AS cnt
        | FROM gr GROUP BY 1, 2, 3),
        |tp AS (SELECT doc_id, n, max(cnt * length(gram)) AS topchars
        | FROM (SELECT *, max(cnt) OVER (PARTITION BY doc_id, n) mc
        |       FROM cnts WHERE n BETWEEN 2 AND 4)
        | WHERE cnt = mc GROUP BY 1, 2),
        |tpp AS (SELECT doc_id,
        |  sum(CASE WHEN n = 2 THEN topchars END) top2,
        |  sum(CASE WHEN n = 3 THEN topchars END) top3,
        |  sum(CASE WHEN n = 4 THEN topchars END) top4
        | FROM tp GROUP BY 1),
        |dk AS (SELECT doc_id, n, gram FROM cnts WHERE n >= 5 AND cnt >= 2),
        |oc AS (SELECT gr.doc_id, gr.n, gr.off,
        |  gr.off + length(gr.gram) AS e
        | FROM gr JOIN dk USING (doc_id, n, gram)),
        |pe AS (SELECT doc_id, n, off, e,
        |  max(e) OVER (PARTITION BY doc_id, n ORDER BY off
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
        | FROM oc),
        |cv AS (SELECT doc_id,
        |  ${(5 to 10).map(n => s"sum(CASE WHEN n = $n THEN " +
             s"greatest(0, e - greatest(off, coalesce(prev_e, 0))) END) cov$n")
             .mkString(", ")}
        | FROM pe GROUP BY 1)
        |SELECT base.doc_id, dup_line_frac, dup_line_char_frac,
        |  dup_para_frac, dup_para_char_frac,
        |  ${(2 to 4).map(n => s"(coalesce(top$n, 0)::BIGINT * 20000 + tot) " +
             s"// (tot * 2) / 10000.0 AS top_${n}gram_frac").mkString(", ")},
        |  ${(5 to 10).map(n => s"(coalesce(cov$n, 0)::BIGINT * 20000 + tot) " +
             s"// (tot * 2) / 10000.0 AS dup_${n}gram_frac").mkString(", ")},
        |  (dup_line_frac <= 0.30 AND dup_para_frac <= 0.30
        |   AND dup_line_char_frac <= 0.20 AND dup_para_char_frac <= 0.20
        |   AND ${TextAnalysis.RepTopMax.toSeq.sorted.map { case (n, m) =>
             s"top_${n}gram_frac <= $m" }.mkString(" AND ")}
        |   AND ${TextAnalysis.RepDupMax.toSeq.sorted.map { case (n, m) =>
             s"dup_${n}gram_frac <= $m" }.mkString(" AND ")}) AS rep_pass
        |FROM base LEFT JOIN tpp USING (doc_id) LEFT JOIN cv USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "tx_vocab" ->
      """SELECT token, count(DISTINCT doc_id)::BIGINT AS df, count(*) AS tf
        |FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
        |      FROM documents)
        |GROUP BY token ORDER BY df DESC, token""".stripMargin,
    "tx_curate" ->
      s"""WITH ${shinglePairsCte("0.5")},
        |losers AS (SELECT DISTINCT b_id AS doc_id FROM pr),
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') toks FROM documents),
        |s AS (SELECT doc_id,
        | len(list_filter(toks, t -> t IN ('data','table','row')))::BIGINT s_de,
        | len(list_filter(toks, t -> t IN ('the','fast','slow')))::BIGINT s_en,
        | len(list_filter(toks, t -> t IN ('query','column','line')))::BIGINT s_es,
        | len(list_filter(toks, t -> t IN ('join','merge','sort')))::BIGINT s_fr,
        | len(list_filter(toks, t -> t IN ('hash','vector','stream')))::BIGINT s_zh,
        | len(toks)::BIGINT n_tokens,
        | round(len(list_filter(toks, t -> t IN ('the','a','of','and')))::DOUBLE / len(toks), 4) stop_ratio
        | FROM t),
        |q AS (SELECT doc_id,
        | CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |      WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |      WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |      WHEN s_fr >= s_zh THEN 'fr'
        |      ELSE 'zh' END AS lang_pred,
        | n_tokens,
        | round(0.4 * stop_ratio + 0.6 * least(1.0, n_tokens::DOUBLE / 100), 4) quality_r
        | FROM s)
        |SELECT doc_id, lang_pred, n_tokens, quality_r FROM q
        |WHERE lang_pred IN ('en', 'es') AND quality_r >= 0.25
        |  AND doc_id NOT IN (SELECT doc_id FROM losers)
        |ORDER BY doc_id""".stripMargin,
    // the crawl-to-corpus COMPOSITION: replays the whole chain from
    // the text — page reassembly from the collapsed chunks, the
    // boiler split (vs_html_quality's formula incl. the charset-share
    // aside), the canonical URL recovered from SynthWarc's messy
    // Target-URI, min-doc_id keeper, tx_curate's lang/quality gates
    // on the REASSEMBLED text, tx_shard's budget math per language
    "tx_crawl" ->
      raw"""WITH c AS (SELECT doc_id, text,
        |  unnest(range(0, ((length(text)-1)//200)::BIGINT + 1)) AS i FROM documents),
        |ch AS (SELECT doc_id, i,
        |  trim(regexp_replace(substr(text, (i*200+1)::INT, 200), '\s+', ' ', 'g')) tp FROM c),
        |agg AS (SELECT doc_id,
        |  string_agg(tp, ' ' ORDER BY i) FILTER (WHERE tp <> '') AS ctext,
        |  coalesce(sum(length(tp)) FILTER (WHERE tp <> ''), 0) AS mc
        | FROM ch GROUP BY 1),
        |bt AS (SELECT doc_id,
        |  length(trim(regexp_replace(substr(text,1,40), '\s+', ' ', 'g'))) + 49
        |    + length($HtmlAsideCase) AS bc FROM documents),
        |base AS (SELECT d.doc_id,
        |  'http://example.com/' || substr(md5(d.text),1,8) AS url,
        |  coalesce(a.ctext, '') AS ctext,
        |  round(bt.bc::DOUBLE / (bt.bc + coalesce(a.mc, 0)), 4) AS boiler_ratio
        | FROM documents d JOIN bt USING (doc_id) LEFT JOIN agg a USING (doc_id)),
        |rn AS (SELECT *, row_number() OVER (PARTITION BY url ORDER BY doc_id) AS rnk
        | FROM base),
        |t AS (SELECT doc_id, url, boiler_ratio,
        |  string_split_regex(trim(ctext), '\s+') AS toks
        | FROM rn WHERE rnk = 1 AND boiler_ratio <= 0.5),
        |s AS (SELECT doc_id, url, boiler_ratio,
        | len(list_filter(toks, t -> t IN ('data','table','row')))::BIGINT s_de,
        | len(list_filter(toks, t -> t IN ('the','fast','slow')))::BIGINT s_en,
        | len(list_filter(toks, t -> t IN ('query','column','line')))::BIGINT s_es,
        | len(list_filter(toks, t -> t IN ('join','merge','sort')))::BIGINT s_fr,
        | len(list_filter(toks, t -> t IN ('hash','vector','stream')))::BIGINT s_zh,
        | len(toks)::BIGINT n_tokens,
        | round(len(list_filter(toks, t -> t IN ('the','a','of','and')))::DOUBLE
        |   / len(toks), 4) stop_ratio
        | FROM t),
        |q AS (SELECT doc_id, url, boiler_ratio,
        | CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |      WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |      WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |      WHEN s_fr >= s_zh THEN 'fr'
        |      ELSE 'zh' END AS lang_pred,
        | n_tokens,
        | round(0.4 * stop_ratio + 0.6 * least(1.0, n_tokens::DOUBLE / 100), 4) quality_r
        | FROM s),
        |f AS (SELECT * FROM q WHERE lang_pred IN ('en', 'es') AND quality_r >= 0.25),
        |cc AS (SELECT *, (SUM(n_tokens) OVER (PARTITION BY lang_pred ORDER BY doc_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum FROM f)
        |SELECT doc_id, url, boiler_ratio, lang_pred, n_tokens, quality_r,
        | (cum - n_tokens) // 2000 AS shard_id
        |FROM cc ORDER BY doc_id""".stripMargin,
    "tx_shard" ->
      """WITH t AS (SELECT source, doc_id,
        |  len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens FROM documents),
        |c AS (SELECT source, doc_id, n_tokens,
        |  (SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tokens
        | FROM t)
        |SELECT source, doc_id, n_tokens, cum_tokens,
        | (cum_tokens - n_tokens) // 2000 AS shard_id
        |FROM c ORDER BY source, doc_id""".stripMargin,
    // sequence packing: same running total, integer-exact span math
    "tx_pack" ->
      """WITH t AS (SELECT source, doc_id,
        |  len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens FROM documents),
        |c AS (SELECT source, doc_id, n_tokens,
        |  (SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum
        | FROM t)
        |SELECT source, doc_id, n_tokens,
        | (cum - n_tokens) // 512 AS seq_first,
        | (cum - n_tokens) % 512 AS pos_in_seq,
        | (cum - 1) // 512 - (cum - n_tokens) // 512 + 1 AS n_seqs
        |FROM c ORDER BY source, doc_id""".stripMargin,
    "tx_contam" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
        |        i -> w[i::INT] || ' ' || w[(i+1)::INT] || ' ' || w[(i+2)::INT]))) AS sh
        |       FROM t WHERE len(w) >= 3)
        |SELECT tr.doc_id, count(DISTINCT tr.sh) AS n_contam,
        | count(DISTINCT b.doc_id) AS n_bench_docs
        |FROM sh tr JOIN sh b ON tr.sh = b.sh AND b.doc_id % 17 = 0 AND tr.doc_id % 17 <> 0
        |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,
    "tx_mix" ->
      """WITH k AS (SELECT source,
        |  100 + ('0x' || substr(md5('rate:' || source),1,8))::BIGINT % 900 AS target_permille,
        |  len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens,
        |  ('0x' || substr(md5('mix:' || source || ':' || doc_id),1,8))::BIGINT % 1000
        |    < 100 + ('0x' || substr(md5('rate:' || source),1,8))::BIGINT % 900 AS kept
        | FROM documents)
        |SELECT source, target_permille, count(*) AS n_in,
        | SUM(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        | SUM(CASE WHEN kept THEN n_tokens ELSE 0 END)::BIGINT AS kept_tokens,
        | round(SUM(CASE WHEN kept THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS realized_rate
        |FROM k GROUP BY source, target_permille ORDER BY source""".stripMargin,
    // CCNet-style top-V + OOV vocabulary cap: 24 < the 31-term corpus
    // vocabulary, so the OOV collapse is exercised by this hash check
    "tx_ppl" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents),
        |unir AS (SELECT w1, count(*)::BIGINT c FROM (SELECT unnest(w) w1 FROM t) GROUP BY 1),
        |topv AS (SELECT w1 FROM unir ORDER BY c DESC, w1 LIMIT 24),
        |bgr AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(w)), i -> [w[i::INT], w[(i+1)::INT]])) pr
        |  FROM t WHERE len(w) >= 2),
        |bg AS (SELECT doc_id,
        |    coalesce(a.w1, '<oov>') w1,
        |    coalesce(a.w1, '<oov>') || ' ' || coalesce(b.w1, '<oov>') bg
        |  FROM bgr LEFT JOIN topv a ON pr[1] = a.w1 LEFT JOIN topv b ON pr[2] = b.w1),
        |bgc AS (SELECT bg, count(*) c_bg FROM bg GROUP BY 1),
        |unic AS (SELECT coalesce(tv.w1, '<oov>') w1, sum(c)::BIGINT c_w1
        |  FROM unir u LEFT JOIN topv tv ON u.w1 = tv.w1 GROUP BY 1),
        |v AS (SELECT count(*) v FROM unic)
        |SELECT b.doc_id, count(*)::BIGINT AS n_bigrams,
        | round(SUM(round(-ln((c_bg + 1)::DOUBLE / (c_w1 + v)), 6)), 6) AS nll
        |FROM bg b JOIN bgc USING (bg) JOIN unic USING (w1)
        |CROSS JOIN v
        |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin,
    "tx_selfrep" ->
      """WITH s AS (SELECT doc_id, CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w) - 1),
        |   i -> w[i::INT] || ' ' || w[(i+1)::INT] || ' ' || w[(i+2)::INT]) ELSE [] END sh
        | FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents))
        |SELECT doc_id, len(sh)::BIGINT AS n_ngrams,
        | (len(sh) - len(list_distinct(sh)))::BIGINT AS n_repeated,
        | CASE WHEN len(sh) = 0 THEN 0.0
        |  ELSE round((len(sh) - len(list_distinct(sh)))::DOUBLE / len(sh), 4) END AS rep_ratio
        |FROM s ORDER BY doc_id""".stripMargin,
    "tx_dsir" ->
      """WITH dt AS (SELECT doc_id, tok, count(*)::BIGINT tf
        |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) tok FROM documents)
        |  GROUP BY 1, 2),
        |tb AS (SELECT doc_id, ('0x' || substr(md5(tok),1,2))::BIGINT % 64 AS b, tf FROM dt),
        |tgt AS (SELECT b, sum(tf)::BIGINT c_t FROM tb WHERE doc_id % 17 = 0 GROUP BY 1),
        |src AS (SELECT b, sum(tf)::BIGINT c_s FROM tb WHERE doc_id % 17 <> 0 GROUP BY 1),
        |tt AS (SELECT sum(c_t)::BIGINT t_t FROM tgt),
        |ts AS (SELECT sum(c_s)::BIGINT t_s FROM src),
        |lr AS (SELECT src.b,
        |  round(ln(((coalesce(c_t, 0) + 1)::DOUBLE / (t_t + 64))
        |    / ((c_s + 1)::DOUBLE / (t_s + 64))), 6) lr
        |  FROM src LEFT JOIN tgt ON src.b = tgt.b CROSS JOIN tt CROSS JOIN ts)
        |SELECT doc_id, sum(tf)::BIGINT AS n_tokens, round(SUM(tf * lr), 6) AS dsir_w
        |FROM tb JOIN lr USING (b) WHERE doc_id % 17 <> 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the CCNet repeated-line pass replayed relationally: fixed
    // 10-token segments as lines, first occurrence (doc_id, line_no)
    // wins corpus-wide, docs reassemble from survivors
    "tx_linededup" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w,
        |   unnest(range(0, (len(string_split_regex(trim(text), '\s+'))-1)//10 + 1)) AS i
        |  FROM documents),
        |l AS (SELECT doc_id, i::INT AS line_no,
        |   array_to_string(w[(i*10+1)::INT:(i*10+10)::INT], ' ') AS line FROM t),
        |r AS (SELECT doc_id, line_no, line,
        |   row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, line_no) rn FROM l)
        |SELECT doc_id, count(*) AS n_lines,
        | sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        | md5(coalesce(string_agg(CASE WHEN rn = 1 THEN line END, ' ' ORDER BY line_no), '')) AS kept_md5,
        | round(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END)::DOUBLE / count(*), 4) AS removed_ratio
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // tx_passage: a 16-token window duplicated across documents marks
    // its span; spans merge by a running-max interval union per doc
    // (the exact-substring dedup signal, Lee et al. 2022)
    "tx_passage" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents),
        |i AS (SELECT doc_id, w, unnest(range(0, greatest(len(w)-15, 0))) AS s FROM t),
        |g AS (SELECT doc_id, s::BIGINT AS s,
        |   md5(array_to_string(w[(s+1)::INT:(s+16)::INT], ' ')) h FROM i),
        |d AS (SELECT h FROM g GROUP BY h HAVING min(doc_id) <> max(doc_id)),
        |sp AS (SELECT g.doc_id, g.s,
        |   max(g.s+16) OVER (PARTITION BY g.doc_id ORDER BY g.s
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) pe
        |  FROM g JOIN d USING (h)),
        |a AS (SELECT doc_id, count(*) dup_grams,
        |   sum(CASE WHEN pe IS NULL OR s >= pe THEN 1 ELSE 0 END) dup_spans,
        |   sum(greatest(0, s + 16 - greatest(s, coalesce(pe, 0)))) dup_tokens
        |  FROM sp GROUP BY doc_id)
        |SELECT t.doc_id, len(t.w)::BIGINT AS n_tokens,
        | coalesce(a.dup_grams, 0)::BIGINT AS dup_grams,
        | coalesce(a.dup_spans, 0)::BIGINT AS dup_spans,
        | coalesce(a.dup_tokens, 0)::BIGINT AS dup_tokens,
        | round(coalesce(a.dup_tokens, 0)::DOUBLE / len(t.w), 4) AS dup_ratio
        |FROM t LEFT JOIN a USING (doc_id) ORDER BY doc_id""".stripMargin,
    "tx_tfidf" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) tf FROM t GROUP BY 1, 2),
        |df AS (SELECT token, count(*) df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) nd FROM documents),
        |s AS (SELECT doc_id, tf.token, round(tf * ln(nd::DOUBLE / df), 6) tfidf_r
        | FROM tf, df, n WHERE tf.token = df.token),
        |r AS (SELECT doc_id, token, tfidf_r,
        | row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_r DESC, token) rnk FROM s)
        |SELECT doc_id, rnk::BIGINT AS rnk, token, tfidf_r FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id,
        | octet_length(text::BLOB)::BIGINT byte_len,
        | lower(hex(substr(text, 1, 4)::BLOB)) magic,
        | md5(text) content_md5,
        | CASE octet_length(text::BLOB) % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END kind,
        | 64 + ('0x' || substr(md5(text),1,8))::BIGINT % 1856 width,
        | 64 + ('0x' || substr(md5(reverse(text)),1,8))::BIGINT % 1056 height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // every SynthMedia field derives from md5(text), so the oracle
    // recomputes the PARSED header metadata without touching the bytes
    // — the real chunk/box walk is what's being checked
    "mm_media" ->
      """WITH p AS (SELECT doc_id,
        |  ('0x' || substr(md5(text),1,2))::BIGINT AS b1,
        |  1 + ('0x' || substr(md5(text),3,2))::BIGINT % 2 AS ch,
        |  ('0x' || substr(md5(text),5,2))::BIGINT AS b2,
        |  ('0x' || substr(md5(text),7,2))::BIGINT AS b3,
        |  ('0x' || substr(md5(text),9,8))::BIGINT AS h32,
        |  ('0x' || substr(md5(text),21,2))::BIGINT AS b10,
        |  ('0x' || substr(md5(text),23,2))::BIGINT AS b12
        | FROM documents),
        |k AS (SELECT p.*,
        |  CASE WHEN b1 % 3 = 2 THEN 'mp3'
        |       WHEN b1 % 2 = 0 THEN 'wav'
        |       WHEN b12 % 2 = 1 THEN 'webm' ELSE 'mp4' END AS cont,
        |  ([64,128,192,256,320])[(b2 % 5 + 1)::INT] AS kbps,
        |  ([44100,48000,32000])[(b3 % 3 + 1)::INT] AS mrate
        | FROM p)
        |SELECT doc_id, cont AS container,
        | CASE WHEN cont IN ('mp4', 'webm') THEN NULL ELSE ch END AS channels,
        | CASE WHEN cont = 'wav' THEN ([8000,16000,22050,44100,48000])[(b2 % 5 + 1)::INT]::BIGINT
        |      WHEN cont = 'mp3' THEN mrate::BIGINT
        |  ELSE NULL END AS sample_rate,
        | CASE WHEN cont = 'wav' THEN ([8,16,24])[(b3 % 3 + 1)::INT]::BIGINT ELSE NULL END AS bits,
        | (CASE WHEN cont = 'wav'
        |  THEN ((256 + h32 % 1024) // (ch * ([8,16,24])[(b3 % 3 + 1)::INT] // 8))
        |   * 1000 // ([8000,16000,22050,44100,48000])[(b2 % 5 + 1)::INT]
        |  WHEN cont = 'mp3' AND b10 % 3 = 0
        |  THEN ((4 + h32 % 8) * (144000 * kbps // mrate) * 8) // kbps
        |  WHEN cont = 'mp3'
        |  THEN (40 + h32 % 64) * 1152 * 1000 // mrate
        |  WHEN cont = 'webm'
        |  THEN 1000 + h32 % 1000000
        |  ELSE (1000 + h32 % 1000000) * 1000 // ([600,1000,90000])[(b2 % 3 + 1)::INT]
        |  END)::BIGINT AS duration_ms
        |FROM k ORDER BY doc_id""".stripMargin,
    // mm_crawl: per distinct text, two output rows — the content
    // image (messy + clean raw variants merge under one canonical
    // url: n_raw = 2 x the text's duplicate count, pixel group 1) and
    // the page's embedded logo data URI (one of ten shared logos:
    // pixel group = the logo bucket's distinct-text count). Formats
    // replay SynthPng's md5-nibble share; decoded dims are the synth
    // raster constants — the REAL decode is what produces them on the
    // Spark side.
    "mm_crawl" ->
      """WITH t AS (SELECT min(doc_id) AS doc_id, count(*) AS dups,
        |   substr(md5(text),1,12) AS p,
        |   ('0x'||substr(md5(text),3,1))::BIGINT % 6 AS fshare,
        |   ('0x'||substr(md5(text),5,2))::BIGINT % 10 AS bucket
        | FROM documents GROUP BY text),
        |b AS (SELECT t.*, count(*) OVER (PARTITION BY bucket) AS bgroup,
        |   ('0x'||substr(md5('logo ' || bucket::VARCHAR || ' graft synthetic'),3,1))::BIGINT % 6 AS lfshare
        | FROM t)
        |SELECT doc_id, 'http://example.com/img/' || p || '?a=1&b=2' AS url,
        | 'warc' AS src, (2*dups)::BIGINT AS n_raw,
        | CASE fshare WHEN 3 THEN 'gif' WHEN 4 THEN 'bmp' WHEN 5 THEN 'webp' ELSE 'png' END AS fmt,
        | 64::BIGINT AS width, 48::BIGINT AS height, 1::BIGINT AS px_group
        |FROM b
        |UNION ALL
        |SELECT doc_id, 'http://example.com/page/' || p || '#img0', 'data',
        | dups::BIGINT,
        | CASE lfshare WHEN 3 THEN 'gif' WHEN 4 THEN 'bmp' WHEN 5 THEN 'webp' ELSE 'png' END,
        | 64::BIGINT, 48::BIGINT, bgroup::BIGINT
        |FROM b
        |ORDER BY doc_id, url""".stripMargin,
    // mm_interleave: the synth page's DOM is (text run, logo data
    // URI), so the record is two rows per kept page — the text run's
    // digest then the image ref with its logo-bucket group size
    "mm_interleave" ->
      """WITH t AS (SELECT min(doc_id) AS doc_id,
        |   substr(md5(text),1,12) AS p,
        |   ('0x'||substr(md5(text),5,2))::BIGINT % 10 AS bucket
        | FROM documents GROUP BY text),
        |b AS (SELECT t.*, count(*) OVER (PARTITION BY bucket) AS bgroup FROM t)
        |SELECT doc_id, 'http://example.com/page/' || p AS url,
        | 0::BIGINT AS seq, 'text' AS kind,
        | md5('image gallery ' || p) AS payload_ref, NULL::BIGINT AS px_group
        |FROM b
        |UNION ALL
        |SELECT doc_id, 'http://example.com/page/' || p, 1::BIGINT, 'image',
        | 'http://example.com/page/' || p || '#img0', bgroup::BIGINT
        |FROM b
        |ORDER BY doc_id, url, seq""".stripMargin,
    // EXIF: every field is an md5-byte formula; the TIFF byte-order
    // share (II/MM) is invisible to the oracle — both walks hash-check
    "mm_exif" ->
      """WITH p AS (SELECT doc_id, md5(text) AS h FROM documents),
        |f AS (SELECT doc_id, h,
        |  ('0x' || substr(h,15,2))::BIGINT AS b7,
        |  ('0x' || substr(h,17,2))::BIGINT AS b8,
        |  ('0x' || substr(h,19,2))::BIGINT AS b9,
        |  ('0x' || substr(h,21,2))::BIGINT AS b10,
        |  ('0x' || substr(h,23,2))::BIGINT AS b11,
        |  ('0x' || substr(h,25,2))::BIGINT AS b12,
        |  ('0x' || substr(h,27,2))::BIGINT AS b13,
        |  ('0x' || substr(h,29,2))::BIGINT AS b14
        | FROM p)
        |SELECT doc_id,
        | 'Cam-' || substr(h,1,6) AS make,
        | 'M' || substr(h,7,1) AS model,
        | (1 + b7 % 8)::BIGINT AS orientation,
        | '20' || lpad((10 + b8 % 15)::VARCHAR, 2, '0') || ':' ||
        |  lpad((1 + b9 % 12)::VARCHAR, 2, '0') || ':' ||
        |  lpad((1 + b10 % 28)::VARCHAR, 2, '0') || ' ' ||
        |  lpad((b11 % 24)::VARCHAR, 2, '0') || ':' ||
        |  lpad((b12 % 60)::VARCHAR, 2, '0') || ':' ||
        |  lpad((b13 % 60)::VARCHAR, 2, '0') AS taken_at,
        | b14 % 3 = 0 AS has_gps
        |FROM f ORDER BY doc_id""".stripMargin,
    // mm_audio: the WAV data bytes are (s9 + j) % 256 by construction,
    // so the oracle re-decodes the PCM samples (8/16/24-bit LE two's
    // complement, complete frames only) and reproduces the integer
    // aggregates; the only float ops (one divide, one sqrt, one
    // normalize) run in the same order as the Scala decode, so the
    // rounded doubles match bit-for-bit
    "mm_audio" ->
      """WITH p AS (SELECT doc_id,
        |  ('0x' || substr(md5(text),1,2))::BIGINT AS b1,
        |  1 + ('0x' || substr(md5(text),3,2))::BIGINT % 2 AS ch,
        |  ([8,16,24])[(('0x' || substr(md5(text),7,2))::BIGINT % 3 + 1)::INT] AS bits,
        |  ('0x' || substr(md5(text),9,8))::BIGINT AS h32,
        |  ('0x' || substr(md5(text),19,2))::BIGINT AS s9
        | FROM documents),
        |q AS (SELECT doc_id, ch, bits, s9, bits // 8 AS bps,
        |  (256 + h32 % 1024) // (ch * (bits // 8)) AS frames
        | FROM p WHERE b1 % 3 != 2 AND b1 % 2 = 0),
        |r AS (SELECT doc_id, ch, bits, frames, frames * ch AS ns,
        |  list_transform(range(0, frames * ch), k -> CASE
        |   WHEN bps = 1 THEN (s9 + k) % 256 - 128
        |   WHEN bps = 2 THEN CASE
        |    WHEN (s9 + 2*k) % 256 + 256 * ((s9 + 2*k + 1) % 256) >= 32768
        |    THEN (s9 + 2*k) % 256 + 256 * ((s9 + 2*k + 1) % 256) - 65536
        |    ELSE (s9 + 2*k) % 256 + 256 * ((s9 + 2*k + 1) % 256) END
        |   ELSE CASE
        |    WHEN (s9 + 3*k) % 256 + 256 * ((s9 + 3*k + 1) % 256)
        |      + 65536 * ((s9 + 3*k + 2) % 256) >= 8388608
        |    THEN (s9 + 3*k) % 256 + 256 * ((s9 + 3*k + 1) % 256)
        |      + 65536 * ((s9 + 3*k + 2) % 256) - 16777216
        |    ELSE (s9 + 3*k) % 256 + 256 * ((s9 + 3*k + 1) % 256)
        |      + 65536 * ((s9 + 3*k + 2) % 256) END
        |   END) AS vs
        | FROM q)
        |SELECT doc_id, frames::BIGINT AS n_frames,
        | round(list_max(list_transform(vs, v -> abs(v)))::DOUBLE
        |   / (1::BIGINT << (bits - 1)::INT)::DOUBLE, 6) AS peak,
        | round(sqrt(list_sum(list_transform(vs, v -> v*v))::DOUBLE / ns)
        |   / (1::BIGINT << (bits - 1)::INT)::DOUBLE, 6) AS rms,
        | coalesce(list_sum(list_transform(range(1, frames), k ->
        |   CASE WHEN (vs[((k-1)*ch + 1)::INT] < 0) <> (vs[(k*ch + 1)::INT] < 0)
        |    THEN 1 ELSE 0 END)), 0)::BIGINT AS zcross
        |FROM r ORDER BY doc_id""".stripMargin,
    // mm_frames: SynthMedia's BMFF sample plan is pure md5(text) +
    // octet_length math (sizes 3 + (h32+7i) % 9, chunk split at
    // ceil(ns/2) with a 2-byte stco gap, stts delta 50 + b10 % 100),
    // so the oracle recomputes the offsets the REAL stsz/stsc/stco/
    // stts walk must address — a wrong walk hash-mismatches
    "mm_frames" ->
      """WITH base AS (SELECT doc_id, text,
        |  ('0x' || substr(md5(text),1,2))::BIGINT AS b1,
        |  ('0x' || substr(md5(text),9,8))::BIGINT AS h32,
        |  ('0x' || substr(md5(text),21,2))::BIGINT AS b10,
        |  octet_length(text::BLOB) AS avail
        | FROM documents),
        |mp4 AS (SELECT doc_id, text, h32, 50 + b10 % 100 AS delta,
        |  LEAST(4 + h32 % 5, (avail - 2) // 11) AS ns
        | FROM base WHERE b1 % 3 != 2 AND b1 % 2 = 1),
        |s AS (SELECT doc_id, text, ns, delta, h32,
        |  unnest(range(0, ns)) AS i FROM mp4 WHERE ns > 0),
        |s2 AS (SELECT doc_id, text, delta, i,
        |  3 + (h32 + 7*i) % 9 AS len,
        |  CASE WHEN i >= (ns + 1) // 2 THEN 2 ELSE 0 END AS gap FROM s),
        |o AS (SELECT doc_id, text, i AS frame_no, len, delta * i AS frame_t,
        |  gap + COALESCE(SUM(len) OVER (PARTITION BY doc_id ORDER BY i
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        | FROM s2)
        |SELECT doc_id, frame_no::BIGINT AS frame_no,
        | md5(substr(text, (off + 1)::INT, len::INT)) AS frame_md5,
        | len::BIGINT AS frame_len, frame_t::BIGINT AS frame_t
        |FROM o ORDER BY doc_id, frame_no""".stripMargin,
    "mm_resize" ->
      """WITH m AS (SELECT doc_id,
        |  64 + ('0x' || substr(md5(text),1,8))::BIGINT % 1856 width,
        |  64 + ('0x' || substr(md5(reverse(text)),1,8))::BIGINT % 1056 height
        | FROM documents)
        |SELECT doc_id, width, height,
        | CASE WHEN width <= 512 AND height <= 512 THEN width
        |  WHEN width >= height THEN 512
        |  ELSE (width * 512) // height END AS new_width,
        | CASE WHEN width <= 512 AND height <= 512 THEN height
        |  WHEN width >= height THEN (height * 512) // width
        |  ELSE 512 END AS new_height,
        | (width > 512 OR height > 512) AS downscaled
        |FROM m ORDER BY doc_id""".stripMargin,
    "mm_phash" ->
      """WITH ph AS (SELECT doc_id,
        |  list_sum(list_transform(range(0, 32),
        |    i -> (('0x' || substr(md5(substr(text, ((i*8) % length(text) + 1)::INT, 8)),1,8))::BIGINT % 2)
        |      * (1::BIGINT << i::INT)))::BIGINT AS ph
        | FROM documents)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        | bit_count(xor(a.ph, b.ph))::BIGINT AS hamming
        |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ph, b.ph)) <= 3
        |ORDER BY a_id, b_id""".stripMargin,
    "st_topk" ->
      """WITH c AS (SELECT date_trunc('hour', ts) AS hour, event_type, count(*) n
        | FROM events GROUP BY 1, 2),
        |r AS (SELECT hour, event_type, n,
        |  row_number() OVER (PARTITION BY hour ORDER BY n DESC, event_type) rnk FROM c)
        |SELECT hour, rnk::BIGINT AS rnk, event_type, n FROM r WHERE rnk <= 3
        |ORDER BY hour, rnk""".stripMargin,
    "st_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) n,
        | (SUM(CAST(value AS DECIMAL(18,2))))::DOUBLE sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "st_enrich" ->
      """SELECT c_mktsegment, date_trunc('day', ts) AS day, COUNT(*) AS n,
        | (SUM(CAST(value AS DECIMAL(18,2))))::DOUBLE AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY c_mktsegment, day""".stripMargin,
    "st_dedup" ->
      """SELECT user_id, event_type, date_trunc('minute', ts) AS minute,
        | min(event_id) first_event, count(*) n_dups
        |FROM events GROUP BY 1, 2, 3
        |ORDER BY user_id, event_type, minute""".stripMargin
  )
}
