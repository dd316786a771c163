package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Relational operator inventory (SURVEY.md §2.2-§2.6) expressed
  * Spark-first over the driver's TPC-H-ish tables, each entry paired with
  * an ANSI-SQL DuckDB oracle.
  *
  * Numeric-determinism rules (so the oracle hash-compare is exact and
  * independent of how the harness normalizes types):
  *   - monetary/value aggregations run in integer cents (`round(x*100)`
  *     cast to BIGINT) — exact, order-independent, and int64 on both
  *     engines (DuckDB SUM(BIGINT) is re-cast from HUGEINT);
  *   - doubles are only emitted when passed through untouched (same
  *     parquet bits on both sides), never as accumulation results;
  *   - dates/timestamps are emitted as formatted strings;
  *   - every query ends in a total ORDER BY.
  *
  * The reference operators each query mirrors are cited as
  * `reference-file:line` (see /root/reference).
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** x (2-decimal double) → exact integer cents as long. */
  private def cents(c: Column): Column = round(c * 100).cast(LongType)
  private def sumCents(c: Column): Column = sum(cents(c))

  /** q1: scan → filter → hash aggregate with exact integer-cents sums.
    * Projection/filter/aggregate shape of the search-index query
    * (dags/search_engine/sql_search_full_rebuild_dag.py:26-44).
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= to_timestamp_ntz(lit("1998-09-02 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumCents(col("l_quantity")).as("sum_qty_c100"),
        sumCents(col("l_extendedprice")).as("sum_base_price_c100"),
        // disc price in 1e-4 units: cents(price) * (100 - cents(discount))
        sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("sum_disc_price_e4"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q2: sliding date-range filter + month bucketing
    * (P4, sql_search_full_rebuild_dag.py:43). */
  def q2MonthlyShipped(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp_ntz(lit("1995-01-01 00:00:00")) &&
              col("l_shipdate") <  to_timestamp_ntz(lit("1997-01-01 00:00:00")))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(count(lit(1)).as("n_items"),
           sumCents(col("l_quantity")).as("sum_qty_c100"))
      .orderBy("ship_month")

  /** q3: IN-list predicate (P6, sql_search_full_rebuild_dag.py:48-63). */
  def q3InList(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_size").isin(1, 5, 9, 14, 23, 36, 45))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
           sumCents(col("p_retailprice")).as("sum_retail_c100"))
      .orderBy("p_brand")

  /** q4: point lookup (P5, fetch_deposit_by_id.py:26). */
  def q4PointLookup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey") === 42)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
              col("o_totalprice"),
              date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))

  /** q5: EAV-style pivot aggregate — MAX(CASE WHEN type THEN value END)
    * per entity, the heart of the search-index query
    * (A1, sql_search_full_rebuild_dag.py:45-68). */
  def q5EavPivot(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def cnt(t: String) = sum(when(col("event_type") === t, 1).otherwise(0)).as(s"n_$t")
    def mx(t: String) = max(when(col("event_type") === t, col("value"))).as(s"max_$t")
    def sm(t: String) =
      sum(when(col("event_type") === t, cents(col("value")))).as(s"sum_${t}_c100")
    ev.groupBy("user_id")
      .agg(cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error"),
           mx("purchase"), mx("click"), sm("purchase"), sm("view"))
      .orderBy("user_id")
  }

  /** q6: min/max-per-group (A2 — MIN(RoleId) GROUP BY UserId,
    * sql_search_full_rebuild_dag.py:69-75). */
  def q6MinPerGroup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(min(col("o_totalprice")).as("min_price"),
           max(col("o_totalprice")).as("max_price"),
           count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")

  /** q7: dimension left-join chain with broadcast dims
    * (J2-J4, sql_search_full_rebuild_dag.py:100-105). */
  def q7DimJoins(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
           sumCents(col("c_acctbal")).as("sum_acctbal_c100"))
      .orderBy("r_name", "n_name")
  }

  /** q8: left join against an aggregated subquery
    * (J5, sql_search_full_rebuild_dag.py:106-107). */
  def q8JoinAgg(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val liAgg = Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(sumCents(col("l_quantity")).as("sum_qty_c100"),
           count(lit(1)).as("n_lines"))
    o.join(liAgg, o("o_orderkey") === liAgg("l_orderkey"), "left")
      .select(col("o_orderkey"),
              col("o_totalprice"),
              coalesce(col("sum_qty_c100"), lit(0L)).as("sum_qty_c100"),
              coalesce(col("n_lines"), lit(0L)).as("n_lines"))
      .orderBy("o_orderkey")
  }

  /** q9: global sort + top-k with deterministic tie-break
    * (O1/O3, sql_search_full_rebuild_dag.py:109; utils_of_backup.py:155-164). */
  def q9TopK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_totalprice"))

  /** q10: union + distinct (set ops, SURVEY §2.6). */
  def q10UnionDistinct(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val b = c.filter(col("c_acctbal") > 9000).select("c_custkey")
    a.union(b).distinct().orderBy("c_custkey")
  }

  /** q11: anti join — customers with no orders
    * (J7/J8 Bloom/DB existence check, redis_utils.py:17-32). */
  def q11AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** q12: semi join — customers with at least one order (J8). */
  def q12SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** q13: distinct scan (A5, map_divar_data_to_delta.py:59). */
  def q13Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select("c_mktsegment").distinct().orderBy("c_mktsegment")

  /** q14: per-group counts + global-share ratios in 1e-6 units
    * (A3, crawler_dag_factory.py:41-53). */
  def q14EventRatios(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    ev.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("share_e6",
        round(col("cnt") * 1000000.0 / sum(col("cnt")).over(Window.partitionBy()))
          .cast(LongType))
      .orderBy("event_type")
  }

  /** q15: CASE WHEN status derivation
    * (F27, sql_search_incremental_dag.py:190). */
  def q15CaseStatus(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("status",
        when(col("o_orderstatus") === "F", "finished")
          .when(col("o_orderstatus") === "O", "open")
          .otherwise("pending"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"), sumCents(col("o_totalprice")).as("sum_price_c100"))
      .orderBy("status")

  /** q16: null-handling — nullif/coalesce/truthiness defaults
    * (F24/F26, sql_search_full_rebuild_dag.py:139-158). */
  def q16NullDefaults(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("missing"))
          .as("segment_or_default"),
        when(col("c_acctbal").isNull || col("c_acctbal") === 0, lit(13))
          .otherwise(lit(0)).as("truthy_default"),
        coalesce(nullif(col("c_acctbal"), lit(0.0)), lit(-1.0))
          .as("acctbal_or_sentinel"))
      .orderBy("c_custkey")

  /** q17: ranking window — top-3 per group with tie-break (window surface;
    * retention top-k utils_of_backup.py:155-164 generalized). */
  def q17WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("rn"), col("c_custkey"), col("c_acctbal"))
      .orderBy("c_mktsegment", "rn")
  }

  /** q18: event-time day bucketing over the nanos stream table
    * (ST6 groundwork; ts handled as epoch-nanos long — exact). */
  def q18DateBuckets(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_format(col("ts_utc"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"),
           sumCents(col("value")).as("sum_value_c100"))
      .orderBy("day")

  /** q19: hour-of-day histogram (F21-family date parts). */
  def q19HourlyHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(hour(col("ts_utc")).as("hour_of_day"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("hour_of_day")

  /** q20: sessionization via lag window — gap > 30 min starts a session.
    * Stream-shaped analytics on exact epoch-nanos arithmetic. */
  def q20Sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
             col("ts") - col("prev_ts") > 1800000000000L, 1).otherwise(0))
      .groupBy("user_id")
      .agg(sum(col("new_session")).as("n_sessions"),
           count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** q43: batch equivalent of the ST6 tumbling event-time window — 5-min
    * windows computed in exact epoch-nanos arithmetic (window_start =
    * ts − ts mod 300e9), the same bucketing StreamPipelines.windowedCounts
    * produces on a stream. */
  def q43EventWindows(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy((col("ts") - col("ts") % 300000000000L).as("window_start_ns"),
               col("event_type"))
      .agg(count(lit(1)).as("n"), sumCents(col("value")).as("sum_value_c100"))
      .filter(col("n") > 1)
      .orderBy("window_start_ns", "event_type")

  /** q66: skew-salted join result parity — events (event_type is a
    * 5-value heavily skewed key by construction) joined to a small
    * per-type dim through Scale.saltedJoin must equal the plain join
    * bit-for-bit; the salting only changes WHERE rows shuffle, never
    * what joins. Output re-aggregated per type so the gate is compact. */
  def q66SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val dim = ev.groupBy("event_type").agg(count(lit(1)).as("type_total"))
    graft.operators.Scale
      .saltedJoin(ev, dim, "event_type", identityCol = "event_id", saltFactor = 8)
      .groupBy("event_type", "type_total")
      .agg(count(lit(1)).as("n"), sumCents(col("value")).as("sum_value_c100"))
      .orderBy("event_type")
  }

  /** q78: ROLLUP grouping sets — per-(flag, status) money totals plus
    * the per-flag and grand-total super-aggregate rows in ONE pass
    * (Spark expands the sets before the aggregate; no re-scan per
    * level). `lvl` is the grouping_id bitmask, identical on both
    * engines; totals in integer cents. */
  def q78Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        cents(col("l_extendedprice")).as("cents"))
      .rollup("l_returnflag", "l_linestatus")
      .agg(grouping_id().cast("int").as("lvl"),
        count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** q80: CUBE — all four grouping sets of (flag, status) in one pass
    * (adds the per-status slice ROLLUP can't produce). Same lvl
    * bitmask / NULLS FIRST discipline as q78. */
  def q80Cube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        cents(col("l_extendedprice")).as("cents"))
      .cube("l_returnflag", "l_linestatus")
      .agg(grouping_id().cast("int").as("lvl"),
        count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"),
        col("lvl"))

  /** q86: the TPC-H Q3 shipping-priority shape — segment-filtered
    * customers × date-filtered orders × date-filtered lineitems,
    * revenue aggregate in exact 1e-4 units (q1's integer-cents
    * discipline), top-10 with a deterministic tie-break. The classic
    * selective star join: both filters reach the scans, the dim side
    * broadcasts, revenue is one partial-aggregated shuffle. */
  def q86ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") < to_timestamp_ntz(lit("1995-03-15 00:00:00")))
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > to_timestamp_ntz(lit("1995-03-15 00:00:00")))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        .as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("l_orderkey").asc)
      .limit(10)
      .select("l_orderkey", "order_date", "revenue_e4")
  }

  /** q87: correlated scalar subqueries — orders priced above their own
    * customer's average, written exactly as a SQL user would (two
    * correlated aggregates over the outer row's key) and left to
    * Catalyst's decorrelation to turn into aggregate+join. The
    * comparison is the integer cross-multiply `cents·n > Σcents`, so
    * no average is ever divided. */
  def q87CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("g_orders")
    s.sql(
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) cents
        |FROM g_orders o
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT) *
        |    (SELECT COUNT(*) FROM g_orders i WHERE i.o_custkey = o.o_custkey)
        |  > (SELECT SUM(CAST(round(o_totalprice * 100) AS BIGINT))
        |     FROM g_orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
  }

  /** q88: correlated EXISTS — the existential half of q87's
    * decorrelation surface, the TPC-H Q4 shape re-expressed on this
    * schema (no commit/receipt dates): orders in a 3-month window that
    * have at least one LATE lineitem (shipped >60 days after the order
    * date), counted by priority. Written exactly as a SQL user would;
    * Catalyst decorrelates the correlated EXISTS into a left-semi hash
    * join (PlanSpec pins no nested loop survives). */
  def q88ExistsLateLineitem(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("g_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("g_lineitem")
    s.sql(
      """SELECT o_orderpriority, COUNT(*) order_count
        |FROM g_orders o
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM g_lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** q89: correlated NOT EXISTS — the TPC-H Q22 shape: above-average-
    * balance customers with NO recent order, rolled up by nation. The
    * average comparison is the exact integer cross-multiply
    * (`cents·n > Σcents`, q87's discipline — no division), the
    * NOT EXISTS decorrelates to a left-anti hash join with the date
    * predicate pushed below it. */
  def q89NotExistsRecentOrder(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("g_customer")
    Tables.orders(s, dir).createOrReplaceTempView("g_orders")
    s.sql(
      """SELECT c_nationkey, COUNT(*) n_cust,
        |  SUM(CAST(round(c_acctbal * 100) AS BIGINT)) sum_acctbal_cents
        |FROM g_customer c
        |WHERE CAST(round(c_acctbal * 100) AS BIGINT) *
        |    (SELECT COUNT(*) FROM g_customer)
        |  > (SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT)) FROM g_customer)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM g_orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin)
  }

  /** q90: the rest of the analytic-window family past q85 —
    * percent_rank / cume_dist (reported in exact millionths: both
    * engines compute the identical IEEE double through the identical
    * rational, so ×1e6-and-round is bit-stable), nth_value with an
    * explicit ROWS frame, and a VALUE-based RANGE frame (sum of all
    * orders within 1000.00 below the current price — peers included
    * regardless of tie order, which is what RANGE means). Window order
    * is made unique by the key so every row-addressed function is
    * deterministic. */
  def q90WindowFrames(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("cents").desc, col("o_orderkey").asc)
    val wRange = Window.partitionBy("o_custkey")
      .orderBy(col("cents").asc).rangeBetween(-100000L, 0L)
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 50)
      .select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).as("cents"))
      .withColumn("pct_rank_e6",
        round(percent_rank().over(w) * 1e6).cast("long"))
      .withColumn("cume_e6",
        round(cume_dist().over(w) * 1e6).cast("long"))
      .withColumn("third_cents", nth_value(col("cents"), 3).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("near_sum_cents", sum(col("cents")).over(wRange))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q85: the analytic-window family beyond q17's row_number — rank,
    * dense_rank, ntile, lead/lag (with defaults), first_value — in one
    * pass over one window spec (ties broken by key so every function
    * is deterministic; integer cents for the offsets). The remaining
    * SQL-window surface a warehouse user expects. */
  def q85WindowFamily(s: SparkSession, dir: String): DataFrame = {
    // order by the same exact-integer expression the oracle orders by
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("cents").desc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 50)
      .select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).as("cents"))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("next_cents", lead(col("cents"), 1, 0L).over(w))
      .withColumn("prev_cents", lag(col("cents"), 1, -1L).over(w))
      .withColumn("top_cents", first(col("cents")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("o_custkey", "rnk", "o_orderkey")
  }

  /** q82: arbitrary GROUPING SETS — the general form behind q78's
    * ROLLUP and q80's CUBE: an explicit mixed set list
    * ((flag, linenumber), (flag), (linestatus), ()) that no rollup/cube
    * shorthand expresses, with `grouping_id()` disambiguating levels
    * (bit order: first grouping column = most significant, the
    * convention q78/q80 already pinned against DuckDB's GROUPING()).
    * One pass over the scan — Spark expands the sets in a single
    * Expand + aggregate, not one job per set. */
  def q82GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_linenumber"),
        cents(col("l_extendedprice")).as("cents"))
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linenumber")),
          Seq(col("l_returnflag")),
          Seq(col("l_linestatus")),
          Seq.empty),
        col("l_returnflag"), col("l_linestatus"), col("l_linenumber"))
      .agg(grouping_id().cast("int").as("lvl"),
        count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"),
        asc_nulls_first("l_linenumber"), col("lvl"))

  /** q81: INTERSECT / EXCEPT — the two §2.6 set operations not yet
    * gated in SQL-set form (q10-q12 cover union/anti/semi): event
    * types seen in BOTH user halves vs only the younger half, tagged
    * and unioned into one deterministic result. */
  def q81SetOps(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    // distinct() each side BEFORE the set ops — identical results
    // (INTERSECT/EXCEPT are DISTINCT-semantics, so deduplicating an
    // input is a no-op), but the partial aggregate collapses each side
    // to ≤ NDV(event_type) rows on the map side: the set-op joins then
    // broadcast a handful of rows instead of the raw corpus-
    // proportional column (at scale the un-deduped build side is an
    // OOM risk, not just wasted bytes), and the two uses of each
    // distinct side are identical subtrees that share one exchange
    // (ReuseExchange) — events is scanned twice, not four times.
    val a = ev.filter(col("user_id") < 25).select("event_type").distinct()
    val b = ev.filter(col("user_id") >= 25).select("event_type").distinct()
    a.intersect(b).withColumn("tag", lit("both"))
      .unionByName(a.except(b).withColumn("tag", lit("only_young")))
      .select("tag", "event_type")
      .orderBy("tag", "event_type")
  }

  /** q93: the MULTISET set operations — q81's family completed with
    * INTERSECT ALL / EXCEPT ALL, whose per-row multiplicity arithmetic
    * (min of counts / truncating subtraction) DISTINCT set ops erase.
    * Both engines state them natively; the per-key count aggregate
    * makes a multiplicity drift hash-visible. Spark plans these as
    * count-compare aggregates on the join key — one shuffle, no
    * pairwise anything. */
  def q93MultisetOps(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val a = li.filter(col("l_quantity") <= 25).select("l_suppkey")
    val b = li.filter(col("l_discount") >= 0.05).select("l_suppkey")
    a.intersectAll(b).withColumn("tag", lit("min_mult"))
      .unionByName(a.exceptAll(b).withColumn("tag", lit("a_minus_b")))
      .groupBy("tag", "l_suppkey").agg(count(lit(1)).as("n"))
      .orderBy("tag", "l_suppkey")
  }

  /** q94: the engine-native PIVOT surface (`RelationalGroupedDataset
    * .pivot` with an explicit value list — never the values-discovery
    * form, which costs an extra distinct pass at scale). Same answer
    * shape as q5's hand-written MAX-over-CASE EAV pivot, but this gate
    * pins the dedicated API: one aggregate over (user, type), zero
    * shuffles beyond it. */
  def q94Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("user_id") < 200)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  /** q95: the engine-native UNPIVOT (melt) surface — `Dataset.unpivot`
    * folds q94's wide per-type counts back to (user, type, n) rows,
    * zeros preserved (the wide frame is dense after `na.fill`).
    * Scan-side row explosion, no shuffle at all. */
  def q95Unpivot(s: SparkSession, dir: String): DataFrame =
    q94Pivot(s, dir).unpivot(
        Array(col("user_id")),
        Array(col("click"), col("error"), col("purchase"),
          col("signup"), col("view")),
        "event_type", "n")
      .orderBy("user_id", "event_type")

  /** q97: ordered string aggregation (the LISTAGG / string_agg shape —
    * report-building's last mile). `collect_list` order is
    * partition-dependent, so the sort happens INSIDE the row
    * (`array_sort` before the join) — deterministic under any
    * parallelism, which is the entire trick of distributed LISTAGG.
    * Dim join rides a broadcast. */
  def q97StringAgg(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir)
    val nat = Tables.nation(s, dir)
    sup.join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_suppliers"),
        array_join(array_sort(collect_list(col("s_name"))), "|").as("names"))
      .orderBy("n_name")
  }

  /** q98: Z-order (Morton) clustering code
    * ([[graft.operators.Layout.mortonCode]]) — the write-side layout
    * primitive for two-dimensional scan pruning. The gate certifies
    * the bit-interleave itself (pure shift/mask expression tree,
    * codegen'd) against DuckDB's independent per-bit sum; the
    * partition-locality property it buys is pinned in `LayoutSpec`
    * (Z-ordered partitions have small min/max boxes in BOTH columns,
    * the parquet-footer file-skipping contract). */
  def q98ZorderCode(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(pmod(col("event_id"), lit(20)) === 0)
      .select(col("event_id"),
        pmod(col("user_id"), lit(1024)).as("a"),
        pmod(round(col("value") * 100).cast("long"), lit(1024)).as("b"))
      .select(col("event_id"),
        graft.operators.Layout.mortonCode(col("a"), col("b"), bits = 10)
          .as("zcode"))
      .orderBy("event_id")

  /** q121: the pure-SQL surface — the engine driven entirely through
    * `spark.sql` text over registered temp views, with a NAMED
    * PARAMETER (Spark 4's parameterized SQL, the injection-safe form)
    * instead of string splicing: a CTE + window + broadcast-dim join
    * query a SQL-only user would submit verbatim. Same Catalyst plan
    * machinery as the DataFrame gates — this pins the API claim, not
    * new semantics. */
  def q121SqlSurface(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    Tables.customer(s, dir).createOrReplaceTempView("customer_v")
    s.sql(
      """WITH big AS (
        |  SELECT o_custkey, o_orderkey,
        |         cast(round(o_totalprice * 100) as bigint) price_c100,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey) rk
        |  FROM orders_v
        |  WHERE o_orderpriority = :prio)
        |SELECT b.o_custkey, c.c_name, b.o_orderkey, b.price_c100
        |FROM big b JOIN customer_v c ON b.o_custkey = c.c_custkey
        |WHERE b.rk = 1
        |ORDER BY b.o_custkey""".stripMargin,
      Map("prio" -> "1-URGENT"))
  }

  /** q123: aggregate FILTER clauses + HAVING — the selective-aggregate
    * SQL surface (one pass computing differently-filtered aggregates,
    * the idiom that replaces N self-joins): per customer, urgent vs
    * non-urgent order counts and spend, keeping only customers with at
    * least one of each. Pure `spark.sql` text like q121. */
  def q123FilteredAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_custkey,
        |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') n_urgent,
        |  count(*) FILTER (WHERE o_orderpriority <> '1-URGENT') n_other,
        |  sum(cast(round(o_totalprice * 100) as bigint))
        |    FILTER (WHERE o_orderpriority = '1-URGENT') urgent_c100
        |FROM orders_v
        |GROUP BY o_custkey
        |HAVING count(*) FILTER (WHERE o_orderpriority = '1-URGENT') > 0
        |   AND count(*) FILTER (WHERE o_orderpriority <> '1-URGENT') > 0
        |ORDER BY o_custkey""".stripMargin)
  }

  /** q124: cached (materialized) intermediate — a shared per-customer
    * aggregate is `.cache()`d and consumed by TWO downstream branches
    * (a priority rollup and a top-spender filter) unioned into one
    * report; the second consumer reads the InMemoryRelation instead of
    * re-scanning orders (`PlanSpec` pins the InMemoryTableScan). The
    * materialized-CTE pattern every dashboard pipeline uses; at scale
    * the cache is the difference between one shuffle and N. The tiny
    * frame is unpersisted by Verify's JVM exit; callers owning a
    * session should unpersist explicitly. */
  def q124CachedView(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sumCents(col("o_totalprice")).as("spend_c100"))
      .cache()
    val byCount = perCust.groupBy("n_orders")
      .agg(count(lit(1)).as("n_customers"),
        sum("spend_c100").as("tier_spend_c100"))
      .select(lit("by_count").as("section"),
        col("n_orders").cast(LongType).as("k"),
        col("n_customers"), col("tier_spend_c100"))
    val top = perCust.filter(col("spend_c100") > 100000000L)
      .groupBy(lit(1))
      .agg(count(lit(1)).as("n_customers"), sum("spend_c100").as("tier_spend_c100"))
      .select(lit("big_spenders").as("section"), lit(0L).as("k"),
        col("n_customers"), col("tier_spend_c100"))
    byCount.unionByName(top).orderBy("section", "k")
  }

  /** q128: NULL-safe equi-join (`<=>` / IS NOT DISTINCT FROM) — two
    * order projections with a deliberately null-ized grouping key
    * (priority hidden for every 11th order) joined so that NULL keys
    * MATCH EACH OTHER, the dimension-conformance shape plain `=` joins
    * silently drop rows from. Catalyst plans EqualNullSafe as a
    * regular hash-join key, so the null bucket co-locates like any
    * other value — no fallback to a nested loop. */
  def q128NullSafeJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderkey"),
      when(col("o_orderkey") % 11 === 0, lit(null).cast("string"))
        .otherwise(col("o_orderpriority")).as("prio_k"),
      cents(col("o_totalprice")).as("price_c100"))
    val dim = o.groupBy("prio_k")
      .agg(count(lit(1)).as("n_orders"), sum("price_c100").as("group_c100"))
      .withColumnRenamed("prio_k", "dim_k")
    o.join(dim, col("prio_k") <=> col("dim_k"))
      .select(col("o_orderkey"), col("prio_k"), col("n_orders"), col("group_c100"))
      .orderBy("o_orderkey")
  }

  /** q127: SQL join-strategy hints — `/*+ BROADCAST(n) */` forces the
    * dimension broadcast regardless of the planner's size estimate
    * (PlanSpec pins BroadcastHashJoin with autoBroadcast disabled).
    * The escape hatch when statistics mislead the optimizer on a
    * 100 TB fact table whose dimension the planner mis-sizes; results
    * are plan-invariant, which is exactly what the oracle certifies. */
  def q127SqlHints(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer_v")
    Tables.nation(s, dir).createOrReplaceTempView("nation_v")
    s.sql(
      """SELECT /*+ BROADCAST(n) */ n.n_name,
        |  cast(count(*) as bigint) n_customers,
        |  cast(sum(cast(round(c_acctbal * 100) as bigint)) as bigint)
        |    sum_acctbal_c100
        |FROM customer_v c JOIN nation_v n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)
  }

  /** q125: share-of-total (ratio_to_report) — each order's share of
    * its customer's spend in integer ppm via an unordered keyed window
    * (one shuffle on the customer key; whole-partition frame, no sort
    * requirement). The percent-of-parent column every BI layer
    * derives; floor division in ppm keeps both engines bit-identical. */
  def q125ShareOfTotal(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).as("price_c100"))
      .withColumn("cust_total_c100", sum("price_c100").over(w))
      .withColumn("share_ppm",
        expr("price_c100 * 1000000 div cust_total_c100"))
      .orderBy("o_orderkey")
  }

  val queries: Map[String, Q] = Map(
    "q93_multiset_ops" -> (q93MultisetOps _),
    "q97_string_agg" -> (q97StringAgg _),
    "q98_zorder_code" -> (q98ZorderCode _),
    "q121_sql_surface" -> (q121SqlSurface _),
    "q123_filtered_agg" -> (q123FilteredAgg _),
    "q124_cached_view" -> (q124CachedView _),
    "q125_share_of_total" -> (q125ShareOfTotal _),
    "q127_sql_hints" -> (q127SqlHints _),
    "q128_null_safe_join" -> (q128NullSafeJoin _),
    "q94_pivot" -> (q94Pivot _),
    "q95_unpivot" -> (q95Unpivot _),
    "q66_salted_join" -> (q66SaltedJoin _),
    "q78_rollup" -> (q78Rollup _),
    "q80_cube" -> (q80Cube _),
    "q82_grouping_sets" -> (q82GroupingSets _),
    "q85_window_family" -> (q85WindowFamily _),
    "q86_shipping_priority" -> (q86ShippingPriority _),
    "q87_correlated_subquery" -> (q87CorrelatedSubquery _),
    "q88_exists_late_lineitem" -> (q88ExistsLateLineitem _),
    "q89_not_exists_recent_order" -> (q89NotExistsRecentOrder _),
    "q90_window_frames" -> (q90WindowFrames _),
    "q81_set_ops" -> (q81SetOps _),
    "q43_event_windows" -> (q43EventWindows _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_monthly_shipped" -> (q2MonthlyShipped _),
    "q3_in_list" -> (q3InList _),
    "q4_point_lookup" -> (q4PointLookup _),
    "q5_eav_pivot" -> (q5EavPivot _),
    "q6_min_per_group" -> (q6MinPerGroup _),
    "q7_dim_joins" -> (q7DimJoins _),
    "q8_join_agg" -> (q8JoinAgg _),
    "q9_topk" -> (q9TopK _),
    "q10_union_distinct" -> (q10UnionDistinct _),
    "q11_anti_join" -> (q11AntiJoin _),
    "q12_semi_join" -> (q12SemiJoin _),
    "q13_distinct" -> (q13Distinct _),
    "q14_event_ratios" -> (q14EventRatios _),
    "q15_case_status" -> (q15CaseStatus _),
    "q16_null_defaults" -> (q16NullDefaults _),
    "q17_window_rank" -> (q17WindowRank _),
    "q18_date_buckets" -> (q18DateBuckets _),
    "q19_hourly_histogram" -> (q19HourlyHistogram _),
    "q20_sessionize" -> (q20Sessionize _),
  )

  val oracles: Map[String, String] = Map(
    "q78_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) lvl,
        |  CAST(count(*) AS BIGINT) n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) sum_cents
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q80_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) lvl,
        |  CAST(count(*) AS BIGINT) n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) sum_cents
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, lvl""".stripMargin,
    "q86_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') order_date,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) revenue_e4
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY 1, 2
        |ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10""".stripMargin,
    "q87_correlated_subquery" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) cents
        |FROM orders o
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT) *
        |    (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
        |  > (SELECT SUM(CAST(round(o_totalprice * 100) AS BIGINT))
        |     FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q88_exists_late_lineitem" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q89_not_exists_recent_order" ->
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) n_cust,
        |  CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) sum_acctbal_cents
        |FROM customer c
        |WHERE CAST(round(c_acctbal * 100) AS BIGINT) *
        |    (SELECT COUNT(*) FROM customer)
        |  > (SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT)) FROM customer)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "q90_window_frames" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) cents
        |  FROM orders WHERE o_custkey < 50)
        |SELECT o_custkey, o_orderkey, cents,
        |  CAST(round(percent_rank() OVER w * 1e6) AS BIGINT) pct_rank_e6,
        |  CAST(round(cume_dist() OVER w * 1e6) AS BIGINT) cume_e6,
        |  CAST(nth_value(cents, 3) OVER (PARTITION BY o_custkey
        |    ORDER BY cents DESC, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) third_cents,
        |  CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY cents
        |    RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW) AS BIGINT) near_sum_cents
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY cents DESC, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q85_window_family" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) cents
        |  FROM orders WHERE o_custkey < 50)
        |SELECT o_custkey, o_orderkey, cents,
        |  CAST(rank() OVER w AS INT) rnk,
        |  CAST(dense_rank() OVER w AS INT) drnk,
        |  CAST(ntile(4) OVER w AS INT) quartile,
        |  CAST(coalesce(lead(cents, 1) OVER w, 0) AS BIGINT) next_cents,
        |  CAST(coalesce(lag(cents, 1) OVER w, -1) AS BIGINT) prev_cents,
        |  CAST(first_value(cents) OVER (PARTITION BY o_custkey
        |    ORDER BY cents DESC, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) top_cents
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY cents DESC, o_orderkey)
        |ORDER BY o_custkey, rnk, o_orderkey""".stripMargin,
    "q82_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, l_linenumber,
        |  CAST(GROUPING(l_returnflag, l_linestatus, l_linenumber) AS INT) lvl,
        |  CAST(count(*) AS BIGINT) n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) sum_cents
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linenumber), (l_returnflag),
        |                        (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST,
        |  l_linenumber NULLS FIRST, lvl""".stripMargin,
    "q81_set_ops" ->
      """WITH a AS (SELECT event_type FROM events WHERE user_id < 25),
        |b AS (SELECT event_type FROM events WHERE user_id >= 25)
        |SELECT 'both' tag, event_type FROM (SELECT event_type FROM a INTERSECT SELECT event_type FROM b)
        |UNION ALL
        |SELECT 'only_young' tag, event_type FROM (SELECT event_type FROM a EXCEPT SELECT event_type FROM b)
        |ORDER BY tag, event_type""".stripMargin,
    "q128_null_safe_join" ->
      """WITH o AS (SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 11 = 0 THEN NULL
        |         ELSE o_orderpriority END prio_k,
        |    cast(round(o_totalprice * 100) as bigint) price_c100
        |  FROM orders),
        |dim AS (SELECT prio_k, cast(count(*) as bigint) n_orders,
        |    cast(sum(price_c100) as bigint) group_c100
        |  FROM o GROUP BY 1)
        |SELECT o.o_orderkey, o.prio_k, n_orders, group_c100
        |FROM o JOIN dim ON o.prio_k IS NOT DISTINCT FROM dim.prio_k
        |ORDER BY o.o_orderkey""".stripMargin,
    "q127_sql_hints" ->
      """SELECT n_name, cast(count(*) as bigint) n_customers,
        |  cast(sum(cast(round(c_acctbal * 100) as bigint)) as bigint)
        |    sum_acctbal_c100
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q125_share_of_total" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |    cast(round(o_totalprice * 100) as bigint) price_c100
        |  FROM orders),
        |w AS (SELECT *, cast(sum(price_c100) OVER (PARTITION BY o_custkey)
        |        as bigint) cust_total_c100 FROM o)
        |SELECT o_custkey, o_orderkey, price_c100, cust_total_c100,
        |  price_c100 * 1000000 // cust_total_c100 share_ppm
        |FROM w ORDER BY o_orderkey""".stripMargin,
    "q124_cached_view" ->
      """WITH pc AS (SELECT o_custkey, cast(count(*) as bigint) n_orders,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)
        |      spend_c100
        |  FROM orders GROUP BY 1)
        |SELECT 'by_count' section, n_orders k,
        |  cast(count(*) as bigint) n_customers,
        |  cast(sum(spend_c100) as bigint) tier_spend_c100
        |FROM pc GROUP BY 2
        |UNION ALL
        |SELECT 'big_spenders', 0, cast(count(*) as bigint),
        |  cast(sum(spend_c100) as bigint)
        |FROM pc WHERE spend_c100 > 100000000
        |ORDER BY section, k""".stripMargin,
    "q123_filtered_agg" ->
      """SELECT o_custkey,
        |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') n_urgent,
        |  count(*) FILTER (WHERE o_orderpriority <> '1-URGENT') n_other,
        |  cast(sum(cast(round(o_totalprice * 100) as bigint))
        |    FILTER (WHERE o_orderpriority = '1-URGENT') as bigint) urgent_c100
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) FILTER (WHERE o_orderpriority = '1-URGENT') > 0
        |   AND count(*) FILTER (WHERE o_orderpriority <> '1-URGENT') > 0
        |ORDER BY o_custkey""".stripMargin,
    "q121_sql_surface" ->
      // the same top-order-per-urgent-customer query, DuckDB-native
      """WITH big AS (
        |  SELECT o_custkey, o_orderkey,
        |         cast(round(o_totalprice * 100) as bigint) price_c100,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey) rk
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT')
        |SELECT b.o_custkey, c.c_name, b.o_orderkey, b.price_c100
        |FROM big b JOIN customer c ON b.o_custkey = c.c_custkey
        |WHERE b.rk = 1
        |ORDER BY b.o_custkey""".stripMargin,
    "q98_zorder_code" ->
      // independent per-bit statement of the interleave: bit i of a at
      // position 2i+1, bit i of b at position 2i
      """WITH e AS (SELECT event_id,
        |    user_id % 1024 AS a,
        |    (CAST(round(value * 100) AS BIGINT) % 1024 + 1024) % 1024 AS b
        |  FROM events WHERE event_id % 20 = 0),
        |bits AS (SELECT unnest(generate_series(0, 9)) i)
        |SELECT e.event_id,
        |  cast(sum((((e.a >> bits.i) & 1) << (2 * bits.i + 1))
        |         + (((e.b >> bits.i) & 1) << (2 * bits.i))) AS BIGINT) zcode
        |FROM e CROSS JOIN bits
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,
    "q97_string_agg" ->
      """SELECT n.n_name, cast(count(*) AS BIGINT) n_suppliers,
        |  string_agg(s.s_name, '|' ORDER BY s.s_name) AS names
        |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q93_multiset_ops" ->
      """WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_quantity <= 25),
        |b AS (SELECT l_suppkey FROM lineitem WHERE l_discount >= 0.05)
        |SELECT 'min_mult' tag, l_suppkey, cast(count(*) AS BIGINT) n
        |FROM (SELECT l_suppkey FROM a INTERSECT ALL SELECT l_suppkey FROM b)
        |GROUP BY 2
        |UNION ALL
        |SELECT 'a_minus_b' tag, l_suppkey, cast(count(*) AS BIGINT) n
        |FROM (SELECT l_suppkey FROM a EXCEPT ALL SELECT l_suppkey FROM b)
        |GROUP BY 2
        |ORDER BY tag, l_suppkey""".stripMargin,
    "q94_pivot" ->
      """SELECT user_id,
        |  cast(count(*) FILTER (event_type = 'click') AS BIGINT) click,
        |  cast(count(*) FILTER (event_type = 'error') AS BIGINT) error,
        |  cast(count(*) FILTER (event_type = 'purchase') AS BIGINT) purchase,
        |  cast(count(*) FILTER (event_type = 'signup') AS BIGINT) signup,
        |  cast(count(*) FILTER (event_type = 'view') AS BIGINT) "view"
        |FROM events WHERE user_id < 200
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q95_unpivot" ->
      // the melt of q94's dense wide frame: one row per (user, type),
      // zero counts preserved
      """WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id < 200),
        |t AS (SELECT unnest(['click','error','purchase','signup','view']) event_type),
        |c AS (SELECT user_id, event_type, cast(count(*) AS BIGINT) n
        |      FROM events WHERE user_id < 200 GROUP BY 1, 2)
        |SELECT u.user_id, t.event_type, coalesce(c.n, 0) n
        |FROM u CROSS JOIN t
        |LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = t.event_type
        |ORDER BY u.user_id, t.event_type""".stripMargin,
    "q66_salted_join" ->
      // the plain (unsalted) join answer the salted plan must equal
      """WITH dim AS (
        |  SELECT event_type, cast(count(*) as bigint) type_total
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, d.type_total,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(cast(round(e.value*100) as bigint)) as bigint) AS sum_value_c100
        |FROM events e JOIN dim d ON e.event_type = d.event_type
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "q43_event_windows" ->
      """SELECT epoch_ns(ts) - epoch_ns(ts) % 300000000000 AS window_start_ns,
        | event_type, cast(count(*) as bigint) AS n,
        | cast(sum(cast(round(value*100) as bigint)) as bigint) AS sum_value_c100
        |FROM events GROUP BY 1, 2 HAVING count(*) > 1
        |ORDER BY 1, 2""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | cast(sum(cast(round(l_quantity*100) as bigint)) as bigint) AS sum_qty_c100,
        | cast(sum(cast(round(l_extendedprice*100) as bigint)) as bigint) AS sum_base_price_c100,
        | cast(sum(cast(round(l_extendedprice*100) as bigint) * (100 - cast(round(l_discount*100) as bigint))) as bigint) AS sum_disc_price_e4,
        | cast(count(*) as bigint) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_monthly_shipped" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        | cast(count(*) as bigint) AS n_items,
        | cast(sum(cast(round(l_quantity*100) as bigint)) as bigint) AS sum_qty_c100
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q3_in_list" ->
      """SELECT p_brand, cast(count(*) as bigint) AS n_parts,
        | cast(sum(cast(round(p_retailprice*100) as bigint)) as bigint) AS sum_retail_c100
        |FROM part WHERE p_size IN (1,5,9,14,23,36,45)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q4_point_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        | strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders WHERE o_orderkey = 42""".stripMargin,
    "q5_eav_pivot" ->
      """SELECT user_id,
        | cast(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) as bigint) AS n_click,
        | cast(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) as bigint) AS n_view,
        | cast(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) as bigint) AS n_purchase,
        | cast(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) as bigint) AS n_signup,
        | cast(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) as bigint) AS n_error,
        | max(CASE WHEN event_type='purchase' THEN value END) AS max_purchase,
        | max(CASE WHEN event_type='click' THEN value END) AS max_click,
        | cast(sum(CASE WHEN event_type='purchase' THEN cast(round(value*100) as bigint) END) as bigint) AS sum_purchase_c100,
        | cast(sum(CASE WHEN event_type='view' THEN cast(round(value*100) as bigint) END) as bigint) AS sum_view_c100
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q6_min_per_group" ->
      """SELECT o_custkey, min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        | cast(count(*) as bigint) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q7_dim_joins" ->
      """SELECT r_name, n_name, cast(count(*) as bigint) AS n_customers,
        | cast(sum(cast(round(c_acctbal*100) as bigint)) as bigint) AS sum_acctbal_c100
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        | LEFT JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q8_join_agg" ->
      """SELECT o_orderkey, o_totalprice,
        | coalesce(agg.sum_qty_c100, 0) AS sum_qty_c100,
        | coalesce(agg.n_lines, 0) AS n_lines
        |FROM orders LEFT JOIN (
        |  SELECT l_orderkey,
        |   cast(sum(cast(round(l_quantity*100) as bigint)) as bigint) AS sum_qty_c100,
        |   cast(count(*) as bigint) AS n_lines
        |  FROM lineitem GROUP BY l_orderkey) agg
        |ON o_orderkey = agg.l_orderkey ORDER BY o_orderkey""".stripMargin,
    "q9_topk" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q10_union_distinct" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |ORDER BY c_custkey""".stripMargin,
    "q11_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q12_semi_join" ->
      """SELECT c_mktsegment, cast(count(*) as bigint) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q13_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "q14_event_ratios" ->
      """SELECT event_type, cast(count(*) as bigint) AS cnt,
        | cast(round(count(*) * 1000000.0 / (SELECT count(*) FROM events)) as bigint) AS share_e6
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q15_case_status" ->
      """SELECT CASE WHEN o_orderstatus='F' THEN 'finished'
        |            WHEN o_orderstatus='O' THEN 'open'
        |            ELSE 'pending' END AS status,
        | cast(count(*) as bigint) AS n,
        | cast(sum(cast(round(o_totalprice*100) as bigint)) as bigint) AS sum_price_c100
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q16_null_defaults" ->
      """SELECT c_custkey,
        | coalesce(nullif(c_mktsegment, 'BUILDING'), 'missing') AS segment_or_default,
        | CASE WHEN c_acctbal IS NULL OR c_acctbal = 0 THEN 13 ELSE 0 END AS truthy_default,
        | coalesce(nullif(c_acctbal, 0.0), -1.0) AS acctbal_or_sentinel
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q17_window_rank" ->
      """SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |   row_number() OVER (PARTITION BY c_mktsegment
        |                      ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |  FROM customer) t
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "q18_date_buckets" ->
      """SELECT strftime(cast(ts as date), '%Y-%m-%d') AS day,
        | cast(count(*) as bigint) AS n_events,
        | cast(sum(cast(round(value*100) as bigint)) as bigint) AS sum_value_c100
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q19_hourly_histogram" ->
      """SELECT cast(extract(hour FROM ts) as int) AS hour_of_day,
        | cast(count(*) as bigint) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q20_sessionize" ->
      """SELECT user_id,
        | cast(sum(new_session) as bigint) AS n_sessions,
        | cast(count(*) as bigint) AS n_events
        |FROM (
        |  SELECT user_id,
        |   CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
        |         OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > 1800000000000
        |        THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)) t
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
