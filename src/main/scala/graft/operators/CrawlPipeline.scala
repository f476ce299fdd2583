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
  * is narrow through synth/inflate/parse/explode; ONE groupBy(doc)
  * reassembles page text (the text runs of a page co-locate by key);
  * ONE window over canonical URL is the url-dedup shuffle (row_number
  * keeper — the exact-dedup shape); scoring is narrow; the shard
  * prefix sum is the two-pass bounded-collect formulation, never a
  * single-partition window. */
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
    import graft.functions.expressions.{Inflate, ParseHtml, ParseWarc}
    // container walk: narrow per-row work, rows = page text runs.
    // Only text/html responses parse — a real capture file carries
    // image/CSS/JS responses too, and their bodies must never enter
    // the corpus as replacement-char soup. `rec` (the record ordinal)
    // keeps two same-URL responses in ONE capture apart: without it,
    // a recrawl's two pos sequences would interleave in reassembly.
    val runs = captures
      .select($"doc_id",
        posexplode(ParseWarc(Inflate($"payload"))).as(Seq("rec", "w")))
      .filter($"w.rec_type" === "response" &&
        $"w.mime".startsWith("text/html") && $"w.target_uri".isNotNull)
      .select($"doc_id", $"rec",
        Dedup.canonicalUrl($"w.target_uri").as("url"),
        // posexplode keeps DOM order so reassembly never depends on
        // lexicographic content_id quirks (p[10] sorts before p[2])
        posexplode(ParseHtml($"w.body", $"w.mime")).as(Seq("pos", "r")))
      .filter($"r.content_type".isin("text_block", "boilerplate"))
    // page reassembly: main runs concatenated in document order +
    // the chrome/main char split — one partial-agg-free groupBy(doc)
    // (collect_list is the reassembly, bounded by the page itself)
    val pages = runs
      .groupBy($"doc_id", $"rec", $"url")
      .agg(
        array_join(transform(
          array_sort(collect_list(when($"r.content_type" === "text_block",
            struct($"pos", $"r.content_raw".as("raw"))))),
          x => x.getField("raw")), " ").as("text"),
        coalesce(sum(when($"r.content_type" === "text_block",
          length($"r.content_raw"))), lit(0L)).as("main_chars"),
        coalesce(sum(when($"r.content_type" === "boilerplate",
          length($"r.content_raw"))), lit(0L)).as("boiler_chars"))
      .withColumn("boiler_ratio", round($"boiler_chars".cast("double") /
        ($"boiler_chars" + $"main_chars"), 4))
    // url-level dedup BEFORE content gates (the crawl order: a page
    // recrawled under tracking-param variants is one page); the
    // record ordinal breaks same-capture ties deterministically
    val keeper = org.apache.spark.sql.expressions.Window
      .partitionBy($"url").orderBy($"doc_id", $"rec")
    val kept = pages
      .withColumn("rn", row_number().over(keeper))
      .filter($"rn" === 1 && $"boiler_ratio" <= BoilerMax)
      .drop("rn", "rec", "main_chars", "boiler_chars")
    // curation signals on the REASSEMBLED text — scoreDocs keeps
    // every input column, so url/boiler_ratio ride through
    val heuristic = TextAnalysis.scoreDocs(kept)
    val relabeled = trainedLangId.fold(heuristic)(m =>
      heuristic.withColumn("lang_pred", m.predict($"text")))
    val floored = trainedQuality.fold(relabeled) { case (m, floor) =>
      relabeled.filter(m.probability($"text", "hi") >= floor)
    }
    val scored = floored
      .filter($"lang_pred".isInCollection(KeepLangs) &&
        $"quality_r" >= QualityFloor)
      .select($"doc_id", $"url", $"boiler_ratio", $"lang_pred",
        $"n_tokens", $"quality_r")
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
