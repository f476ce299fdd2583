package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** OLAP query library — the relational engine underneath the vector
  * store (the reference keeps its metadata in pandas frames and filters
  * them per-search, vector_db.py:673-696; here the same predicates are
  * declarative Spark plans that Catalyst pushes into the scans).
  *
  * Determinism-for-oracle rules used throughout:
  *  - money aggregates go through DECIMAL(18,2) (exact, order-independent,
  *    bit-stable across engines) and surface as DOUBLE;
  *  - every result ends with a total ORDER BY on (mostly) integer keys;
  *  - ratio outputs are double divisions of exact quantities.
  */
object Relational {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def one: Column = lit(1).cast("decimal(18,2)")
  /** revenue term: exact decimal l_extendedprice * (1 - l_discount). */
  private def rev(price: Column, disc: Column): Column = dec(price) * (one - dec(disc))

  /** TPC-H Q1 shape: scan-heavy multi-aggregate. Filter + 6-column
    * projection push into the parquet scan; single hash-agg shuffle of
    * 4-ish groups — at 100 TB the partial (map-side) agg reduces each
    * partition to a handful of rows before the exchange. */
  def pricing(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(rev($"l_extendedprice", $"l_discount")).cast("double").as("sum_disc_price"),
        (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q3 shape: fact-fact shuffle join (orders⋈lineitem) with the
    * small filtered dim (customer) broadcast. */
  def topCustomers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val ord = Tables.load(spark, dir, "orders")
      .filter($"o_orderdate" < lit("1998-06-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val li = Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" > lit("1998-06-01").cast("timestamp"))
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderkey", $"o_orderdate")
      .agg(sum(rev($"l_extendedprice", $"l_discount")).cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  /** TPC-H Q5 shape: star join — all dims broadcast, the only shuffle
    * is the orders⋈lineitem co-shuffle on the order key. */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val region = Tables.load(spark, dir, "region")
    val nation = Tables.load(spark, dir, "nation")
    val cust = Tables.load(spark, dir, "customer").select($"c_custkey", $"c_nationkey")
    val supp = Tables.load(spark, dir, "supplier").select($"s_suppkey", $"s_nationkey")
    val ord = Tables.load(spark, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    val li = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(supp),
        $"l_suppkey" === $"s_suppkey" && $"s_nationkey" === $"c_nationkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(sum(rev($"l_extendedprice", $"l_discount")).cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** Window functions: top-3 orders per customer by price with an exact
    * running total (decimal cumsum — order-stable across engines). */
  def windowTop(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.load(spark, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        row_number().over(w).cast("long").as("rnk"),
        sum(dec($"o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("run_total"))
      .filter($"rnk" <= 3)
      .select($"o_custkey", $"o_orderkey", $"rnk", $"run_total")
      .orderBy($"o_custkey", $"rnk")
  }

  /** ol_moving — trailing-window moving aggregates (the RANGE frame,
    * the window surface [[windowTop]]'s ROWS frames don't touch): per
    * customer, each order's trailing-30-day order count and revenue.
    * The frame is value-based — all orders whose epoch-day falls in
    * [day-29, day] join the aggregate regardless of tie order, so the
    * result is deterministic without an orderkey tiebreak. One
    * shuffle on o_custkey, per-partition sort, O(1) frame maintenance
    * per row: the canonical time-series-feature shape at 100 TB
    * (trailing spend/velocity features for every transaction). Money
    * stays decimal inside the sum, one cast at the edge. */
  def movingWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val day = datediff($"o_orderdate", lit("1970-01-01"))
    val w = Window.partitionBy($"o_custkey").orderBy($"d")
      .rangeBetween(-29, 0)
    Tables.load(spark, dir, "orders")
      .withColumn("d", day.cast("long"))
      .select($"o_custkey", $"o_orderkey",
        count(lit(1)).over(w).cast("long").as("mov_cnt"),
        sum(dec($"o_totalprice")).over(w).cast("double").as("mov_rev"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Event sessionization: gap > 6h starts a new session. One shuffle on
    * user_id, then lag + cumulative flag-sum inside the partition — the
    * canonical scale-out shape (no driver loops, no per-user collect). */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.load(spark, dir, "events")
      .select($"user_id", $"event_id", $"ts",
        (unix_micros($"ts") - unix_micros(lag($"ts", 1).over(byUser))).as("gap_us"))
      .withColumn("new_sess",
        when($"gap_us".isNull || $"gap_us" > lit(6L * 3600 * 1000000), 1L).otherwise(0L))
      .withColumn("session_id",
        sum($"new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"), min($"ts").as("t_start"), max($"ts").as("t_end"))
      .orderBy($"user_id", $"session_id")
  }

  /** Semi-structured: JSON prop extraction + aggregation. */
  def jsonProps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .select($"event_type",
        pmod(get_json_object($"props", "$.k").cast("long"), lit(10L)).as("k_mod"),
        $"value")
      .groupBy($"event_type", $"k_mod")
      .agg(count(lit(1)).as("n"), sum(dec($"value")).cast("double").as("sum_value"))
      .orderBy($"event_type", $"k_mod")
  }

  /** Hierarchical ROLLUP aggregate (subtotals + grand total). */
  def rollupOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(dec($"o_totalprice")).cast("double").as("total"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n", $"total")
      .orderBy($"status", $"priority")
  }

  /** Exact interpolated percentiles per group (not approx — the oracle
    * must match bit-for-bit modulo 6dp rounding). */
  def percentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy($"event_type")
      .agg(
        round(expr("percentile(value, 0.25)"), 6).as("p25"),
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.75)"), 6).as("p75"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  /** As-of join: each event matched to the latest order of the same
    * customer at-or-before the event time (ties → max order key).
    *
    * Spark has no as-of join; rather than a fat inequality join this is
    * the scalable union-and-running-max encoding: tag both sides, sort
    * once within the key partition, and carry the best match forward
    * with a cumulative struct-max — one shuffle, linear work, no
    * per-row probing. (Reference analog: newest-content-wins lookups
    * over the store, vector_db.py:431-434.)
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.load(spark, dir, "orders")
      .select($"o_custkey".as("key"), $"o_orderdate".as("t"),
        struct($"o_orderdate", $"o_orderkey").as("ord"),
        lit(null).cast("long").as("event_id"), lit(0).as("is_event"))
    val ev = Tables.load(spark, dir, "events")
      .select($"user_id".as("key"), $"ts".as("t"),
        lit(null).cast("struct<o_orderdate:timestamp,o_orderkey:bigint>").as("ord"),
        $"event_id", lit(1).as("is_event"))
    val w = Window.partitionBy($"key").orderBy($"t", $"is_event")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord.unionByName(ev)
      .withColumn("m", max($"ord").over(w))
      .filter($"is_event" === 1 && $"m".isNotNull)
      .select($"event_id", $"key".as("user_id"),
        $"m.o_orderkey".as("o_orderkey"), $"m.o_orderdate".as("o_orderdate"))
      .orderBy($"event_id")
  }

  /** NOT EXISTS as a left-anti join: customers with no 1997 order.
    * Anti-joins broadcast the filtered build side; no correlated
    * per-row subquery execution. */
  def noOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer").select($"c_custkey", $"c_name")
    val ord97 = Tables.load(spark, dir, "orders")
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .select($"o_custkey")
    cust.join(ord97, cust("c_custkey") === ord97("o_custkey"), "left_anti")
      .orderBy($"c_custkey")
  }

  /** CUBE aggregate (all grouping-set combinations). */
  def cubeOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(dec($"o_totalprice")).cast("double").as("total"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n", $"total")
      .orderBy($"status", $"priority")
  }

  /** Explicit GROUPING SETS — grouping shapes rollup/cube can't
    * express (two independent one-column sets here). Same single
    * expand+shuffle plan as cube, restricted to the named sets. */
  def groupingSetsOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .groupingSets(
        Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority")),
        $"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(dec($"o_totalprice")).cast("double").as("total"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n", $"total")
      .orderBy($"status", $"priority")
  }

  /** Order-count distribution (TPC-H Q13's shape): customer LEFT JOIN
    * orders so zero-order customers survive, count per customer, then
    * histogram the counts. Both aggregates are partial-agg shuffles on
    * their keys; the join co-shuffles fact-to-fact on custkey. */
  def orderCountDist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer").select($"c_custkey")
    val ord = Tables.load(spark, dir, "orders").select($"o_custkey", $"o_orderkey")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
      .groupBy($"c_custkey").agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count").agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** Exact distinct counts per group (partial-agg distinct expansion). */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }

  /** Set operations: nations that have customers but no suppliers
    * (EXCEPT over distinct key sets, then a broadcast dim join). */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cn = Tables.load(spark, dir, "customer")
      .select($"c_nationkey".cast("int").as("nk")).distinct()
    val sn = Tables.load(spark, dir, "supplier")
      .select($"s_nationkey".cast("int").as("nk")).distinct()
    val nation = Tables.load(spark, dir, "nation")
    cn.except(sn)
      .join(broadcast(nation), $"nk" === $"n_nationkey")
      .select($"n_nationkey", $"n_name")
      .orderBy($"n_nationkey")
  }

  /** Top-3 parts per brand via the bounded partial top-k aggregate
    * ([[graft.functions.expressions.TopKByScore]]) — the relational
    * use of the same operator that ranks vector search. */
  def topPerBrand(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "part")
      .groupBy($"p_brand")
      .agg(graft.functions.expressions.TopKByScore(
        $"p_retailprice", $"p_partkey", 3).as("top"))
      .select($"p_brand", posexplode($"top"))
      .select($"p_brand", (col("pos") + 1).cast("long").as("rnk"),
        $"col.id".as("p_partkey"), $"col.score".as("p_retailprice"))
      .orderBy($"p_brand", $"rnk")
  }

  /** PIVOT: event counts per user decile, one column per event type.
    * Explicit pivot values keep the schema static (no extra pass to
    * discover them — required for both determinism and planning at
    * scale). */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .select(($"user_id" % 10).as("user_decile"), $"event_type")
      .groupBy($"user_decile")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
      .orderBy($"user_decile")
  }

  /** Approximate sketches: HLL distinct counts + approx percentiles
    * per group — [rows-only] in the oracle (sketch values are
    * implementation-specific); the spec bounds their error against the
    * exact forms. At 100 TB these replace exact distinct/percentile
    * whenever the 1-2% error is acceptable: no distinct expansion, a
    * fixed-size mergeable sketch per partition. */
  def approxStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id").as("approx_users"),
        percentile_approx($"value", lit(0.5), lit(1000)).as("approx_p50"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  /** ol_approx_exh — the hash-checked EXACT twin of [[approxStats]]
    * (the `_exh` convention every approximate family carries): the
    * same query shape with exact distincts and the exact interpolated
    * median, so the sketch config is the only thing the rows-only
    * entry leaves unhashed. At 100 TB the exact distinct is the
    * expensive path (a full shuffle of user ids per type) — that cost
    * asymmetry is WHY ol_approx exists. */
  def approxStatsExhaustive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact_users"),
        round(expr("percentile(value, 0.5)"), 6).as("exact_p50"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  /** Range join: for each error event, count clicks by the same user in
    * the trailing hour. Implemented as an equi-join on (user, hour
    * bucket) — each click is exploded into the two buckets it can serve
    * — then the exact range predicate. Turns an O(n·m) inequality join
    * into a co-partitioned hash join, which is the 100 TB shape. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourUs = 3600L * 1000000
    val ev = Tables.load(spark, dir, "events")
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts",
        expr(s"unix_micros(ts) div $hourUs").as("bucket"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"))
      .withColumn("bucket",
        explode(array(expr(s"unix_micros(c_ts) div $hourUs"),
          expr(s"unix_micros(c_ts) div $hourUs") + 1)))
    errors.join(clicks,
        errors("user_id") === clicks("c_user") && errors("bucket") === clicks("bucket") &&
          clicks("c_ts") > errors("ts") - expr("INTERVAL 1 HOUR") &&
          clicks("c_ts") <= errors("ts"),
        "left_outer")
      .groupBy($"event_id", $"user_id")
      .agg(count($"c_ts").as("n_clicks"))
      .orderBy($"event_id")
  }

  /** Cohort retention — the classic product-analytics rollup: each
    * user joins the cohort of their first active week, and the matrix
    * counts distinct users per (cohort week, weeks since). Shapes for
    * scale: the per-user cohort week is `min(wk) over (partition by
    * user_id)` — ONE events scan and one user_id shuffle feed both the
    * cohort and the matrix (the groupBy-then-join-back formulation
    * read the largest table twice); week-truncated dates differ by
    * exact multiples of 7 days, so weeks_since is integer-exact in
    * both engines (no timestamp arithmetic parity risk). */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    Tables.load(spark, dir, "events")
      .select($"user_id", date_trunc("week", $"ts").cast("date").as("wk"))
      .withColumn("cohort_week",
        min($"wk").over(Window.partitionBy($"user_id")))
      .select($"user_id", $"cohort_week",
        (datediff($"wk", $"cohort_week") / 7).cast("long").as("weeks_since"))
      .groupBy($"cohort_week", $"weeks_since")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_week", $"weeks_since")
  }

  /** Columns [[profile]] reports, with their type family (numeric
    * min/max land in min_num/max_num, strings in min_str/max_str —
    * no cross-type casting, so there is no string-formatting parity
    * surface between engines). */
  private val ProfileCols: Seq[(String, Boolean)] = Seq(
    "l_orderkey" -> true, "l_quantity" -> true, "l_extendedprice" -> true,
    "l_discount" -> true, "l_returnflag" -> false, "l_linestatus" -> false)

  /** ol_profile — per-column data profiling (what every warehouse
    * runs before trusting a new feed): one row per column with
    * non-null count, exact distinct count, and typed min/max, all
    * from ONE table scan. Multi-column distinct aggregates compile to
    * Spark's expand (scan once, ×(k+1) rows into one partial-agg
    * shuffle — not k scans); the long format is a driver-side stack
    * over the single agg row. At 100 TB the exact distincts swap for
    * `approx_count_distinct` (HLL, fully partial-agg) — exact here
    * because the oracle compares counts, not sketches. */
  def profile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.spread(Tables.load(spark, dir, "lineitem"))
    val aggs = ProfileCols.flatMap { case (c, num) =>
      Seq(count(col(c)).as(s"${c}__n"),
        countDistinct(col(c)).as(s"${c}__d")) ++
        (if (num) Seq(min(col(c)).cast("double").as(s"${c}__mn"),
          max(col(c)).cast("double").as(s"${c}__mx"))
        else Seq(min(col(c)).as(s"${c}__mns"),
          max(col(c)).as(s"${c}__mxs")))
    }
    val row = li.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stacked = ProfileCols.map { case (c, num) =>
      struct(lit(c).as("col_name"), $"n_rows",
        col(s"${c}__n").as("n_nonnull"), col(s"${c}__d").as("n_distinct"),
        (if (num) col(s"${c}__mn") else lit(null).cast("double")).as("min_num"),
        (if (num) col(s"${c}__mx") else lit(null).cast("double")).as("max_num"),
        (if (num) lit(null).cast("string") else col(s"${c}__mns")).as("min_str"),
        (if (num) lit(null).cast("string") else col(s"${c}__mxs")).as("max_str"))
    }
    row.select(explode(array(stacked: _*)).as("p"))
      .select($"p.col_name", $"p.n_rows", $"p.n_nonnull", $"p.n_distinct",
        $"p.min_num", $"p.max_num", $"p.min_str", $"p.max_str")
      .orderBy($"col_name")
  }
}
