package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The downstream analytical query surface (SURVEY §2.3).
  *
  * The reference publishes Iceberg tables and queries them with arbitrary
  * SQL (reference README "Query and explore data": SUM/AVG/COUNT over the
  * published table; quality_app.py row/null counts). These queries cover the
  * full relational operator set a user of the reference runs on published
  * tables, expressed with the DataFrame API so Catalyst plans pushdown,
  * pruning, broadcast and AQE without hand-scheduling.
  *
  * Determinism notes (driver hash-compares against DuckDB):
  *  - every double aggregate is rounded, killing FP-association ulps;
  *  - every LIMIT carries a full deterministic ORDER BY tiebreak;
  *  - column aliases match the oracle SQL exactly.
  */
object Relational {

  private def tsNtz(s: String) = lit(s).cast("timestamp_ntz")

  /** TPC-H Q1 shape: scan -> filter -> groupBy -> multi-aggregate.
    * Filter + the 6-column projection reach the parquet scan (pushdown
    * verified in RelationalSpec). */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= tsNtz("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Predicate pushdown + column pruning: the scan must read only 3 of 11
    * columns and push both predicates (ReadSchema/PushedFilters asserted in
    * the spec). */
  def q02FilterPushdown(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 45 && col("l_discount") < 0.03)
      .select(col("l_orderkey"), col("l_quantity"), col("l_discount"))

  /** Dimension broadcast join: customer is small relative to orders — an
    * explicit broadcast keeps the fact table un-shuffled at any scale. */
  def q03BroadcastJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))

  /** Fact-fact shuffle join (sort-merge/shuffled-hash under AQE): both sides
    * shuffle on the join key once; aggregation reuses the exchange. */
  def q04ShuffleJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q5 shape: 5-table star join, dims broadcast, facts shuffled. */
  def q05StarJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" &&
        col("o_orderdate") >= tsNtz("1996-01-01 00:00:00") &&
        col("o_orderdate") < tsNtz("1999-01-01 00:00:00"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))

  /** Window rank: top-3 orders per customer (fully tie-broken). */
  def q06WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
  }

  /** Global top-k with deterministic tiebreak — Spark plans TakeOrderedAndProject
    * (per-partition heap + single merge), not a global sort. */
  def q07TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(25)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** Distinct aggregation: countDistinct expands to a two-phase plan with
    * partial aggregation map-side. */
  def q08DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))

  /** Union of filtered branches (no shuffle — union is a narrow op). */
  def q09Union(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val hi = o.filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"), lit("high").as("bucket"))
    val lo = o.filter(col("o_totalprice") < 5000.0)
      .select(col("o_orderkey"), lit("low").as("bucket"))
    hi.union(lo)
  }

  /** Left-semi + left-anti joins: active vs inactive customers. */
  def q10SemiAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val active = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("active").as("status"))
    val inactive = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("inactive").as("status"))
    active.union(inactive)
  }

  /** Numeric statistics aggregate (stddev/variance/min/max). */
  def q11StatsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"),
        count(lit(1)).as("n"))

  /** TPC-H Q12 shape: CASE-WHEN conditional aggregation over a join. */
  def q12ConditionalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))

  /** groupBy + HAVING (post-aggregation filter). */
  def q13Having(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("spend"))
      .filter(col("n_orders") >= 15)

  /** TPC-H Q17 shape: aggregate compared against a per-group scalar
    * (self-join on the per-part average). No broadcast hint: the per-part
    * aggregate's cardinality grows with the fact table, so broadcasting it
    * would OOM at scale — AQE picks broadcast only when it measures the
    * aggregate as genuinely small. */
  def q14ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val avgQ = l.groupBy(col("l_partkey").as("pk"))
      .agg(avg(col("l_quantity")).as("aq"))
    l.join(avgQ, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(0.5) * col("aq"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  /** ROLLUP multi-level aggregate (subtotals + grand total). */
  def q15Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("revenue"))

  /** JSON field extraction from the events.props payload column. */
  def q16JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsWithTs(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("value"))
      .filter(col("k").isNotNull)
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))

  /** Event-time bucketed aggregation — the batch equivalent of the
    * streaming windowed count (graft.streaming.EventStreams). */
  def q17TimeBucket(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsWithTs(spark, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))

  /** lag/lead over per-user event sequences: inter-event gap — the
    * sessionization building block. The gap stays in exact integer
    * microseconds: integer DIV (not double division — 1e18 ns exceeds
    * double mantissa), and µs because DuckDB truncates parquet
    * nano-timestamps to µs. */
  def q18LagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us").asc, col("event_id").asc)
    Tables.eventsWithTs(spark, dir)
      .withColumn("ts_us", expr("ts_ns DIV 1000"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .select(
        col("user_id"), col("event_id"),
        (col("ts_us") - col("prev_us")).as("gap_us"))
  }

  /** IN-subquery predicate (planned as a semi join). */
  def q19ExistsIn(spark: SparkSession, dir: String): DataFrame = {
    val autoCust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey"))
    Tables.orders(spark, dir)
      .join(broadcast(autoCust), col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"), col("o_totalprice"))
  }

  /** Grouping-sets shape: independent aggregates over different keys,
    * union-tagged (each aggregate keeps map-side partial aggregation). */
  def q20MultiGrouping(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val byStatus = o.groupBy(col("o_orderstatus").as("key"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("revenue"))
      .select(lit("status").as("level"), col("key"), col("n"), col("revenue"))
    val byPriority = o.groupBy(col("o_orderpriority").as("key"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("revenue"))
      .select(lit("priority").as("level"), col("key"), col("n"), col("revenue"))
    byStatus.union(byPriority)
  }

  /** Exact discrete p50/p90/p99 of event value per type: the value at
    * rank ceil(p*n) in sorted order (SQL-standard percentile_disc,
    * expressed as rank-picking so BOTH engines compute bit-identical
    * results — interpolating percentiles differ across engines in their
    * floating-point formulation). Exact per-group percentiles sort the
    * group; 5 bounded groups here. At 100 TB use `approx_percentile`
    * (t-digest sketch, map-side mergeable, one shuffle of sketches) —
    * RelationalSpec asserts the sketch lands within tolerance of this
    * exact result. */
  def q21Percentiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byValue = Window.partitionBy(col("event_type")).orderBy(col("value").asc)
    val all = Window.partitionBy(col("event_type"))
    def pick(p: Double) =
      max(when(col("rn") === ceil(col("n") * p), col("value")))
    // Nulls are excluded BEFORE ranking: Spark windows sort NULLS FIRST
    // while DuckDB sorts NULLS LAST, so a null value would both shift
    // every rank and be pickable at p99 — percentiles are over observed
    // values only.
    Tables.events(spark, dir)
      .select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
      .withColumn("rn", row_number().over(byValue))
      .withColumn("n", count(lit(1)).over(all))
      .groupBy(col("event_type"))
      .agg(
        round(pick(0.5), 2).as("p50"),
        round(pick(0.9), 2).as("p90"),
        round(pick(0.99), 2).as("p99"),
        max(col("n")).as("n"))
  }

  /** Customer spend deciles: per-customer totals, ntile(10) over the
    * fully tie-broken global ranking, decile-level rollup. The global
    * ntile inherently serializes the ranking onto one reducer — it exists
    * as the exact ORACLE for [[q23SpendDecilesApprox]], which is the
    * scale path (sketch cutpoints + map-side bucketing, no global sort)
    * and is what you'd run at 100 TB. */
  def q23SpendDeciles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("spend"))
    val ranked = spend.withColumn("decile",
      ntile(10).over(Window.orderBy(col("spend").desc, col("o_custkey").asc)))
    ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), round(sum(col("spend")), 2).as("decile_spend"))
  }

  /** Scale-safe spend deciles: 9 decile cutpoints from one
    * Greenwald-Khanna sketch job (`approxQuantile`, map-side-mergeable,
    * 9 doubles on the driver) and decile assignment as a map-side chain
    * of 9 codegen comparisons — no global sort, no single-reducer window,
    * the plan that replaces [[q23SpendDeciles]]'s global ntile at 100 TB.
    * Deciles are numbered like the exact query: 1 = highest spend.
    * Boundary rows can land one decile off the exact ntile split (sketch
    * error + ties share a decile here but are split round-robin by
    * ntile) — RelationalSpec bounds the divergence against the exact
    * hash-green result. */
  def q23SpendDecilesApprox(spark: SparkSession, dir: String): DataFrame = {
    // the per-customer aggregate feeds TWO passes (the sketch action and
    // the decile rollup) — persist it so orders is scanned+shuffled once,
    // not twice; lifecycle owned by SessionCaches (unpersist via clear)
    val spend = SessionCaches.cached(spark, s"q23spend:$dir") {
      Tables.orders(spark, dir)
        .groupBy(col("o_custkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("spend"))
    }
    val cuts = spend.stat.approxQuantile(
      "spend", (1 to 9).map(_ / 10.0).toArray, 0.001)
    // #{cutpoints <= spend} counts buckets from the bottom; flip so
    // decile 1 is the top band, matching ntile(... ORDER BY spend DESC).
    val decile = cuts.foldLeft(lit(10)) { (acc, c) =>
      acc - when(col("spend") >= lit(c), 1).otherwise(0)
    }
    spend.withColumn("decile", decile)
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), round(sum(col("spend")), 2).as("decile_spend"))
  }

  /** Sketch percentiles — the operator form of q21's 100 TB note: ONE
    * aggregate of map-side-mergeable t-digest sketches per event_type,
    * no per-group sort, no windows keyed by a 5-value column. The exact
    * rank-picked [[q21Percentiles]] stays as its accuracy oracle
    * (TemporalSpec bounds the sketch against it). */
  def q21PercentilesApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        round(expr("approx_percentile(value, 0.5, 10000)"), 2).as("p50"),
        round(expr("approx_percentile(value, 0.9, 10000)"), 2).as("p90"),
        round(expr("approx_percentile(value, 0.99, 10000)"), 2).as("p99"),
        count(lit(1)).as("n"))

  /** Pivot: event-type columns per user cohort (user_id % 100). The
    * pivot VALUES are declared, so Spark plans a single-pass pivot
    * aggregate (no extra distinct-values job) — map-side partial
    * aggregation survives, one shuffle on the cohort key. */
  def q24Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy((col("user_id") % 100).as("cohort"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(round(sum(col("value")), 2))
      .na.fill(0.0)

  /** Running (cumulative) revenue per customer over their order history —
    * the classic unbounded-preceding frame; one shuffle on the
    * high-cardinality customer key. */
  def q25RunningTotal(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
  }

  /** Revenue per non-uniform price band via the bucket-decomposed
    * interval join ([[Ranges.intervalJoin]]) — an equi-join on bucket
    * keys plus exact bounds, never a nested-loop comparison against
    * every band. */
  def q22IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("b0", 0.0, 1000.0), ("b1", 1000.0, 2000.0), ("b2", 2000.0, 5000.0),
      ("b3", 5000.0, 10000.0), ("b4", 10000.0, 20000.0), ("b5", 20000.0, 50000.0),
      ("b6", 50000.0, 100000.0), ("b7", 100000.0, 200000.0),
      ("b8", 200000.0, 500000.0), ("b9", 500000.0, 1000000.0))
      .toDF("band", "lo", "hi")
    Ranges.intervalJoin(
        Tables.orders(spark, dir).select(col("o_totalprice")), "o_totalprice",
        bands, "lo", "hi", width = 1000.0)
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
  }
}
