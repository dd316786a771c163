package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Intervals

/** User-behavior analytics gates: merged activity coverage (q104),
  * ordered funnel conversion (q105), and weekly cohort retention
  * (q106) — the product-analytics query family a warehouse serves
  * daily. The reference's event handling stops at per-event transforms
  * (dags/search_engine/sql_search_incremental_dag.py:118-143); these
  * are the aggregate shapes built on top.
  *
  * Determinism: all arithmetic is on non-negative epoch-µs /
  * day / week integers (events.ts is exact epoch-nanos, µs-truncated
  * to match DuckDB's parquet read); every per-key order carries
  * `event_id` as the tiebreak; `div` == `//` on this domain.
  */
object BehaviorGate {
  type Q = (SparkSession, String) => DataFrame

  /** Events with exact integer µs timestamps and a deterministic
    * synthetic activity duration: 60 s + (event_id mod 600) s. */
  private def activity(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("user_id"), col("event_id"),
      expr("ts div 1000").as("s_us"),
      expr("ts div 1000 + (60 + event_id % 600) * 1000000").as("e_us"))

  /** q104: gaps-and-islands activity coverage — each event opens a
    * deterministic activity window; overlapping windows fuse per user
    * ([[graft.operators.Intervals.coverage]]); output is islands and
    * total covered µs per user. */
  def q104IntervalCoverage(s: SparkSession, dir: String): DataFrame =
    Intervals.coverage(activity(s, dir), Seq("user_id"), "s_us", "e_us",
        Seq("event_id"))
      .select(col("user_id"), col("n_islands"),
        col("covered").as("covered_us"))
      .orderBy("user_id")

  /** q105: strictly-ordered funnel — view, then a click after the
    * first view, then a purchase after that click. Three aggregation
    * passes joined on the user key (each a hash shuffle + map-side
    * combinable min), no window over the raw event stream. */
  def q105Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"),
      col("event_type"), expr("ts div 1000").as("ts_us"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("t1_us"))
    val t2 = ev.filter(col("event_type") === "click").join(t1, "user_id")
      .filter(col("ts_us") > col("t1_us"))
      .groupBy("user_id").agg(min("ts_us").as("t2_us"), first("t1_us").as("t1_us"))
      .select("user_id", "t1_us", "t2_us")
    val t3 = ev.filter(col("event_type") === "purchase").join(t2, "user_id")
      .filter(col("ts_us") > col("t2_us"))
      .groupBy("user_id").agg(min("ts_us").as("t3_us"))
    val users = ev.select("user_id").distinct()
    users
      .join(t1, Seq("user_id"), "left")
      .join(t2.select("user_id", "t2_us"), Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .withColumn("stage_reached",
        when(col("t3_us").isNotNull, 3)
          .when(col("t2_us").isNotNull, 2)
          .when(col("t1_us").isNotNull, 1).otherwise(0))
      .select("user_id", "t1_us", "t2_us", "t3_us", "stage_reached")
      .orderBy("user_id")
  }

  /** q106: weekly cohort retention — users bucketed by first-activity
    * epoch-week, distinct-user counts per (cohort_week, week offset).
    * Two aggregates on the user key plus one small-group count; the
    * cohort frame broadcasts at any scale (one row per user). */
  def q106CohortRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"),
      expr("(ts div 1000) div 86400000000 div 7").as("week"))
    val cohort = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
    ev.distinct()
      .join(cohort, "user_id")
      .withColumn("week_offset", col("week") - col("cohort_week"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  val queries: Map[String, Q] = Map(
    "q104_interval_coverage" -> (q104IntervalCoverage _),
    "q105_funnel" -> (q105Funnel _),
    "q106_cohort_retention" -> (q106CohortRetention _))

  val oracles: Map[String, String] = Map(
    "q104_interval_coverage" ->
      // two CTE levels: DuckDB windows cannot nest (prev-max, then the
      // running island sum)
      """WITH iv AS (SELECT user_id, event_id, epoch_us(ts) s_us,
        |    epoch_us(ts) + (60 + event_id % 600) * 1000000 e_us
        |  FROM events),
        |pm AS (SELECT *, max(e_us) OVER (PARTITION BY user_id
        |        ORDER BY s_us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) prev_max
        |      FROM iv),
        |fl AS (SELECT *, CASE WHEN prev_max IS NULL OR s_us > prev_max
        |        THEN 1 ELSE 0 END new_island FROM pm),
        |il AS (SELECT *, sum(new_island) OVER (PARTITION BY user_id
        |        ORDER BY s_us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) island
        |      FROM fl),
        |isl AS (SELECT user_id, island, min(s_us) i_s, max(e_us) i_e
        |       FROM il GROUP BY 1, 2)
        |SELECT user_id, cast(count(*) as bigint) n_islands,
        |  cast(sum(i_e - i_s) as bigint) covered_us
        |FROM isl GROUP BY 1 ORDER BY 1""".stripMargin,
    "q105_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) ts_us
        |  FROM events),
        |t1 AS (SELECT user_id, min(ts_us) t1_us FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT ev.user_id, min(ts_us) t2_us FROM ev
        |       JOIN t1 ON ev.user_id = t1.user_id
        |       WHERE event_type = 'click' AND ts_us > t1_us GROUP BY 1),
        |t3 AS (SELECT ev.user_id, min(ts_us) t3_us FROM ev
        |       JOIN t2 ON ev.user_id = t2.user_id
        |       WHERE event_type = 'purchase' AND ts_us > t2_us GROUP BY 1)
        |SELECT u.user_id, t1_us, t2_us, t3_us,
        |  CASE WHEN t3_us IS NOT NULL THEN 3
        |       WHEN t2_us IS NOT NULL THEN 2
        |       WHEN t1_us IS NOT NULL THEN 1 ELSE 0 END stage_reached
        |FROM (SELECT DISTINCT user_id FROM ev) u
        |LEFT JOIN t1 ON u.user_id = t1.user_id
        |LEFT JOIN t2 ON u.user_id = t2.user_id
        |LEFT JOIN t3 ON u.user_id = t3.user_id
        |ORDER BY u.user_id""".stripMargin,
    "q106_cohort_retention" ->
      // `week` is a DuckDB keyword (like `off`) — alias as wk
      """WITH ev AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 // 7 wk FROM events),
        |c AS (SELECT user_id, min(wk) cohort_week FROM ev GROUP BY 1)
        |SELECT cohort_week, wk - cohort_week week_offset,
        |  cast(count(DISTINCT ev.user_id) as bigint) n_users
        |FROM ev JOIN c ON ev.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
