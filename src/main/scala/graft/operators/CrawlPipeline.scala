package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The end-to-end crawl-to-corpus pipeline — the composition a 100 TB
  * CommonCrawl user actually runs, wired from pieces this library
  * already verifies one-by-one:
  *
  *   warc bytes → transparent gzip/zstd ([[graft.functions.expressions.Inflate]])
  *   → WARC record walk ([[graft.functions.expressions.ParseWarc]])
  *   → charset-aware tolerant HTML ([[graft.functions.expressions.ParseHtml]],
  *     the capture's HTTP Content-Type as the transport hint)
  *   → main-content reassembly + boilerplate gate ([[DocParse]]'s split)
  *   → URL-level dedup keeper ([[Dedup.canonicalUrl]])
  *   → curation signals (lang-id markers, token count, quality floor —
  *     [[TextAnalysis.scoreDocs]], the SAME expressions tx_curate pins)
  *   → token-budget shard assignment ([[TextAnalysis.distributedCumSum]],
  *     the 100 TB-safe prefix sum tx_pack pins).
  *
  * Every stage is individually hash-checked elsewhere; this query
  * hash-checks the SEAMS — id flow, null handling, gate ordering —
  * which nothing else exercises end-to-end.
  *
  * Scale shape, one stage per shuffle and no others: the capture scan
  * is narrow through synth/inflate/parse, and page reassembly is
  * shuffle-FREE (higher-order array functions over ParseHtml's
  * co-located runs); ONE min(struct) partial aggregation over
  * canonical URL is the url-dedup shuffle (map-side combining, so a
  * hot recrawled url merges before the exchange); scoring is narrow;
  * the shard prefix sum is the two-pass bounded-collect formulation,
  * never a single-partition window. */
object CrawlPipeline {

  /** Pages whose chrome share exceeds this never become training
    * data (navigation/link-farm captures). */
  val BoilerMax = 0.5

  /** Same language/quality gate as [[TextAnalysis.curate]]. */
  val QualityFloor = 0.25
  val KeepLangs: Seq[String] = Seq("en", "es")

  /** Curated corpus from raw WARC captures. `captures` needs
    * (doc_id: long, payload: binary) — one capture file per row,
    * `.warc` / `.warc.gz` / `.warc.zst` all transparent. Output: one
    * row per kept page — canonical url, boilerplate share, language,
    * token count, quality, and its token-budget shard.
    *
    * The gate models are swappable exactly like [[TextAnalysis.curate]]'s:
    * `trainedLangId` replaces the marker-heuristic `lang_pred` with the
    * fitted classifier's per-row prediction, and `trainedQuality`
    * ANDs a learned probability floor onto the heuristic one — both
    * one narrow expression with broadcast weights, so the plan shape
    * is unchanged. The driver oracle pins the heuristic defaults;
    * CrawlPipelineSpec exercises the trained configs. */
  def fromCaptures(captures: DataFrame,
      trainedLangId: Option[LangIdClassifier.Model] = None,
      trainedQuality: Option[(LangIdClassifier.Model, Double)] = None)
      : DataFrame = {
    val spark = captures.sparkSession
    import spark.implicits._
    val scored = scoredKept(captures, trainedLangId, trainedQuality)
    // shard assignment: exact per-language running token totals via
    // the distributed prefix sum (cum is unique-keyed on
    // (lang_pred, doc_id), so shard ids are deterministic)
    val (cum, base) = TextAnalysis.distributedCumSum(
      scored, "lang_pred", "doc_id", "n_tokens")
    val out = Tables.materialize(cum.withColumn("shard_id",
      expr(s"(cum - n_tokens) div ${TextAnalysis.ShardBudget}"))
      .drop("cum"))
    base.unpersist(blocking = false)
    out
  }

  /** Captures → deduped, scored, gated page rows — everything before
    * the shard prefix sum (which materializes, hiding the plan). The
    * production path; exposed so the spec can pin the keeper's PLAN
    * (a partial aggregation, never a window) on the exact frame
    * [[fromCaptures]] runs. */
  private[graft] def scoredKept(captures: DataFrame,
      trainedLangId: Option[LangIdClassifier.Model],
      trainedQuality: Option[(LangIdClassifier.Model, Double)]): DataFrame = {
    val spark = captures.sparkSession
    import spark.implicits._
    val pages = pageFrame(captures)
    // url-level dedup BEFORE scoring and content gates (the crawl
    // order: a page recrawled under tracking-param variants is ONE
    // page, and the keeper — lowest (doc_id, rec) — is decided before
    // any gate can disqualify it; scoring after the keeper means the
    // tokenize/classify cost is never paid on dropped duplicates).
    // The keeper is a min(struct) PARTIAL aggregation, not a
    // row_number window: a hot url (mega-recrawled page) combines its
    // captures map-side before the one url shuffle, where a window
    // would pin every capture of that url on a single task — the
    // dd_urls / tx_linededup keeper discipline. (doc_id, rec) is
    // unique per capture row, so the struct min is deterministic and
    // the output is hash-identical to the window formulation.
    val kept = pages
      .groupBy($"url")
      .agg(min(struct($"doc_id", $"rec", $"text", $"boiler_ratio")).as("k"))
      .select($"k.doc_id".as("doc_id"), $"url",
        $"k.text".as("text"), $"k.boiler_ratio".as("boiler_ratio"))
    gates(score(kept, trainedLangId, trainedQuality),
      trainedQuality.map(_._2).getOrElse(0.0))
      .select($"doc_id", $"url", $"boiler_ratio", $"lang_pred",
        $"n_tokens", $"quality_r")
  }

  /** The STATELESS half of the pipeline, shared verbatim by the batch
    * path and the streaming gate ([[crawlGate]]) — capture bytes to
    * UNSCORED page rows in ONE narrow pass, no shuffle at all: a
    * page's text runs are already co-located in [[graft.functions.expressions.ParseHtml]]'s
    * result array, so reassembly is higher-order array functions in
    * ARRAY (= document) order — never an explode + groupBy (the
    * earlier formulation paid a whole corpus shuffle to regroup rows
    * that started out together). Only text/html responses with at
    * least one text/boilerplate run count as PAGES (an empty-body
    * response must not occupy a canonical URL and knock the real page
    * out of the dedup); the record ordinal `rec` keeps two same-URL
    * responses in one capture apart. Scoring deliberately does NOT
    * happen here — both callers dedup first, so the per-row
    * tokenize/classify cost is never paid on rows the keeper drops.
    * Output: (doc_id, rec, url, text, boiler_ratio). */
  private[graft] def pageFrame(captures: DataFrame): DataFrame = {
    val spark = captures.sparkSession
    import spark.implicits._
    import graft.functions.expressions.{Inflate, ParseHtml, ParseWarc}
    captures
      .select($"doc_id",
        posexplode(ParseWarc(Inflate($"payload"))).as(Seq("rec", "w")))
      .filter($"w.rec_type" === "response" &&
        $"w.mime".startsWith("text/html") && $"w.target_uri".isNotNull)
      .select($"doc_id", $"rec",
        Dedup.canonicalUrl($"w.target_uri").as("url"),
        ParseHtml($"w.body", $"w.mime").as("rows"))
      .select($"doc_id", $"rec", $"url",
        array_join(transform(
          filter($"rows", r => r.getField("content_type") === "text_block"),
          r => r.getField("content_raw")), " ").as("text"),
        aggregate(
          filter($"rows", r => r.getField("content_type") === "text_block"),
          lit(0L), (acc, r) => acc + length(r.getField("content_raw")))
          .as("main_chars"),
        aggregate(
          filter($"rows", r => r.getField("content_type") === "boilerplate"),
          lit(0L), (acc, r) => acc + length(r.getField("content_raw")))
          .as("boiler_chars"))
      .filter($"main_chars" + $"boiler_chars" > 0) // run-less responses are not pages
      .withColumn("boiler_ratio", round($"boiler_chars".cast("double") /
        ($"boiler_chars" + $"main_chars"), 4))
      .drop("main_chars", "boiler_chars")
  }

  /** Curation signals over deduped page rows — [[TextAnalysis.scoreDocs]]
    * plus the trained configs' columns (one narrow expression each,
    * broadcast weights). Runs AFTER the url dedup in both callers. */
  private def score(pages: DataFrame,
      trainedLangId: Option[LangIdClassifier.Model],
      trainedQuality: Option[(LangIdClassifier.Model, Double)]): DataFrame = {
    import pages.sparkSession.implicits._
    val heuristic = TextAnalysis.scoreDocs(pages)
    val relabeled = trainedLangId.fold(heuristic)(m =>
      heuristic.withColumn("lang_pred", m.predict($"text")))
    trainedQuality.fold(relabeled.withColumn("q_prob", lit(1.0))) {
      case (m, _) => relabeled.withColumn("q_prob", m.probability($"text", "hi"))
    }
  }

  /** The content gates over a [[pageFrame]]: chrome ceiling, language
    * keep-list, heuristic quality floor, and — when a trained quality
    * model rode in — its probability floor (q_prob is a constant 1.0
    * otherwise, so a 0.0 floor is the no-op default). */
  private def gates(pages: DataFrame, qProbFloor: Double): DataFrame = {
    import pages.sparkSession.implicits._
    pages.filter($"boiler_ratio" <= BoilerMax &&
      $"lang_pred".isInCollection(KeepLangs) &&
      $"quality_r" >= QualityFloor && $"q_prob" >= lit(qProbFloor))
  }

  /** The crawl ingest as a STREAM transform — the lambda split stated
    * like [[graft.streaming.DocStreams]]: the stateless half
    * ([[pageFrame]], shared VERBATIM with the batch path) runs
    * in-stream, `dropDuplicates("url")` is the in-stream URL dedup,
    * and scoring + gates run on the deduped survivors — the SAME
    * dedup-before-gates order as the batch keeper, so a gated-out
    * first capture suppresses later recrawls of its url in both
    * paths (the only divergence left is first-ARRIVAL vs
    * lowest-(doc_id, rec) when duplicates differ in content). State
    * keys one row per distinct url; long-running queries bound it
    * with a watermark variant exactly like
    * DocStreams.curateGateBounded. Shard assignment stays a batch
    * compaction job — a global prefix sum has no bounded-state
    * streaming form. Works unchanged on a batch frame; the spec pins
    * stream/batch parity on the gate columns. */
  def crawlGate(captures: DataFrame,
      trainedLangId: Option[LangIdClassifier.Model] = None,
      trainedQuality: Option[(LangIdClassifier.Model, Double)] = None)
      : DataFrame = {
    import captures.sparkSession.implicits._
    gates(score(pageFrame(captures).dropDuplicates("url"),
      trainedLangId, trainedQuality),
      trainedQuality.map(_._2).getOrElse(0.0))
      .select($"doc_id", $"url", $"boiler_ratio", $"lang_pred",
        $"n_tokens", $"quality_r")
  }

  /** The tx_crawl driver query: one synthetic `.warc.gz`/`.warc.zst`
    * capture per document ([[graft.functions.expressions.SynthWarc]]
    * — codec AND charset shares ride inside, and the Target-URI is
    * the MESSY raw form so the canonicalizer's every rule fires on
    * container-carried data), through [[fromCaptures]]. The oracle
    * recomputes the whole chain from the text alone. */
  def crawl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    fromCaptures(Tables.spread(Tables.load(spark, dir, "documents"))
      .select($"doc_id",
        graft.functions.expressions.SynthWarc($"text").as("payload")))
      .orderBy($"doc_id")
  }
}
