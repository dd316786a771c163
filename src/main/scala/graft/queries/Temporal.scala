package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{RangeJoin, TemporalJoin}

/** As-of join under the oracle gate: every purchase event picks up the
  * user's latest signup state at-or-before the purchase time. The
  * DuckDB oracle uses its native ASOF JOIN; the Spark side runs the
  * union+window implementation — a pass certifies the semantics match
  * the reference operator definition exactly (inclusive >=, per-key,
  * nulls when no prior state).
  */
object Temporal {
  type Q = (SparkSession, String) => DataFrame

  def q44AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("snap_ts"),
        col("value").as("snap_value"))
    TemporalJoin.asOfJoin(purchases, signups, Seq("user_id"), "ts", "snap_ts")
      // DuckDB's TIMESTAMP is µs — emit µs so raw times are comparable
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"),
        expr("snap_ts_matched div 1000").as("snap_ts_us"),
        col("snap_value"))
      .orderBy("event_id")
  }

  /** q68: the S3/F17 watermark adjustment — UTC instant → Tehran wall
    * clock minus the 1-hour safety lag (sql_search_incremental_dag.py:
    * 130-133) — certified against DuckDB's independent zone conversion
    * (Tehran is UTC+03:30, so any offset-arithmetic shortcut would
    * hash-mismatch). Sampled to every 50th event for a compact gate. */
  def q68WatermarkLag(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(pmod(col("event_id"), lit(50)) === 0)
      .select(col("event_id"),
        date_format(
          graft.functions.RelativeDates.utcToTehranMinusLag(
            expr("timestamp_micros(ts div 1000)")),
          "yyyy-MM-dd HH:mm:ss").as("tehran_lagged"))
      .orderBy("event_id")

  /** q73: range (interval) join via [[graft.operators.RangeJoin]] —
    * event values (cents) against supplier-derived `[lo, hi]` bands,
    * aggregated per interval. The oracle states the semantics as the
    * naive `BETWEEN` theta-join; the engine runs the bucketized
    * equi-join (one shuffle, no nested loop) — a pass certifies the
    * rewrite is exact. Integer domain throughout (cents as BIGINT). */
  def q73RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(s, dir)
      .select(round(col("value") * 100).cast("long").as("pv"))
    val iv = Tables.supplier(s, dir)
      .select(col("s_suppkey"), (col("s_suppkey") * 997 % 48000).as("lo"))
      .withColumn("hi", col("lo") + 200 + col("s_suppkey") % 800 * 2)
    RangeJoin.bucketed(p, "pv", iv, "lo", "hi", width = 512)
      .groupBy("s_suppkey")
      .agg(count(lit(1)).as("n_points"), sum(col("pv")).as("sum_pv"))
      .orderBy("s_suppkey")
  }

  /** q76: attribution join — every purchase attributed to the user's
    * last CLICK within one hour ([[TemporalJoin.asOfJoin]] with
    * `toleranceNs`; matches older than the window come back null).
    * This puts the tolerance path of the as-of operator under the
    * oracle, expressed independently in DuckDB as ASOF + a window
    * predicate. */
  def q76AttributionJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("value").as("click_value"))
    TemporalJoin.asOfJoin(purchases, clicks, Seq("user_id"), "ts", "click_ts",
        toleranceNs = Some(3600000000000L))
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"),
        expr("click_ts_matched div 1000").as("click_ts_us"),
        col("click_value"))
      .orderBy("event_id")
  }

  /** q83: FORWARD as-of join — every purchase picks up the user's NEXT
    * signup at-or-after the purchase time (the "next state" lookup:
    * next price tick, next snapshot). Same union+window machinery as
    * q44's backward form, frame flipped to currentRow→following with
    * first(ignoreNulls); the oracle is DuckDB's native forward ASOF
    * (`p.ts <= s.ts`). */
  def q83AsofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("snap_ts"),
        col("value").as("snap_value"))
    TemporalJoin.asOfJoin(purchases, signups, Seq("user_id"), "ts", "snap_ts",
        direction = "forward")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"),
        expr("snap_ts_matched div 1000").as("snap_ts_us"),
        col("snap_value"))
      .orderBy("event_id")
  }

  /** q84: forward as-of with a bounded tolerance — the next click
    * within 7 DAYS of the purchase (matches further out come back
    * null, time and value atomically). The `within`-bound shape in the
    * forward direction, completing the 2×2 of (direction × bounded)
    * with q44/q76/q83. */
  def q84AsofForwardTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("value").as("click_value"))
    TemporalJoin.asOfJoin(purchases, clicks, Seq("user_id"), "ts", "click_ts",
        toleranceNs = Some(7L * 24 * 3600 * 1000000000L), direction = "forward")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"),
        expr("click_ts_matched div 1000").as("click_ts_us"),
        col("click_value"))
      .orderBy("event_id")
  }

  /** q77: moving-frame aggregate — per-user rolling sum/min over the
    * last 3 purchases (ROWS frame, deterministic event_id tie-break,
    * integer cents). The windowed-feature shape of a behavioral
    * feature pipeline; per-user windows distribute on the key. */
  def q77MovingWindow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-2, Window.currentRow)
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"), col("ts"))
      .withColumn("mov3_sum", sum(col("cents")).over(w))
      .withColumn("mov3_min", min(col("cents")).over(w))
      .select("event_id", "user_id", "cents", "mov3_sum", "mov3_min")
      .orderBy("event_id")
  }

  /** q79: the OPTIMIZER-REWRITE path of the range join — the query is
    * written as the naive BETWEEN theta-join a user would write;
    * [[graft.plans.RangeJoinRewrite]] turns it into the bucketized
    * equi-join during optimization (RangeJoinRuleSpec pins the plan
    * shape; this gate certifies the rewritten plan's ANSWER against
    * the same oracle as the hand-bucketized q73). The checkpoint
    * forces execution while the rule is attached. */
  def q79RangeRewrite(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(s, dir)
      .select(round(col("value") * 100).cast("long").as("pv"))
    val iv = Tables.supplier(s, dir)
      .select(col("s_suppkey"), (col("s_suppkey") * 997 % 48000).as("lo"))
      .withColumn("hi", col("lo") + 200 + col("s_suppkey") % 800 * 2)
    graft.plans.GraftExtensions.enableRangeJoinRewrite(s)
    val joined =
      try p.join(iv, col("pv") >= col("lo") && col("pv") <= col("hi"))
        .select("pv", "s_suppkey").localCheckpoint()
      finally graft.plans.GraftExtensions.disableRangeJoinRewrite(s)
    joined.groupBy("s_suppkey")
      .agg(count(lit(1)).as("n_points"), sum(col("pv")).as("sum_pv"))
      .orderBy("s_suppkey")
  }

  /** q92: BATCH gap sessionization via Spark's native `session_window`
    * aggregate — the batch twin of the streaming q62/q71 (custom-state)
    * sessionizers, exercising the engine-provided operator instead.
    * Sessions are half-open `[first, last + gap)`: an event exactly
    * `gap` after the previous one starts a NEW session (its window no
    * longer overlaps), which the oracle states as a `diff >= gap` break
    * in the classic lag→cumsum derivation. Session aggregation merges
    * per key — distributes on user_id, no global stage. */
  def q92SessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), expr("timestamp_micros(ts div 1000)").as("ts_utc"))
      .groupBy(col("user_id"), session_window(col("ts_utc"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))
      .orderBy("user_id", "start_us")

  /** q96: time-series gap-fill ([[graft.operators.Resample.gapFill]]) —
    * sparse per-user purchase observations regularized onto a daily
    * grid with the last observation carried forward. The daily grain
    * pick is deterministic (the day's last event by (ts, event_id));
    * the oracle rebuilds the grid with generate_series and fills via
    * DuckDB's native ASOF join — two independent statements of the
    * same semantics. */
  def q96GapFill(s: SparkSession, dir: String): DataFrame = {
    val obs = Tables.events(s, dir)
      .filter(col("event_type") === "purchase" && pmod(col("user_id"), lit(10)) === 0)
      .select(col("user_id"), expr("ts div 1000").as("us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("day", expr("us div 86400000000"))
      .groupBy("user_id", "day")
      .agg(max(struct(col("us"), col("event_id"), col("cents"))).as("__m"))
      .select(col("user_id"), col("day"), col("__m.cents").as("cents"))
    graft.operators.Resample.gapFill(obs, "user_id", "day", Seq("cents"))
      .orderBy("user_id", "day")
  }

  /** q137: q44's exact query through the NATIVE [[graft.plans.AsOfJoinExec]]
    * physical operator (custom LogicalPlan + SparkStrategy + SparkPlan —
    * the full Catalyst ladder step (c)) instead of the composed
    * union+window. Shares q44's DuckDB `ASOF LEFT JOIN` oracle, so the
    * physical merge is certified against the engine-external reference
    * semantics, not just against our own composed form. */
  def q137AsofJoinNative(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("snap_ts"),
        col("value").as("snap_value"))
    TemporalJoin.asOfJoinNative(purchases, signups, Seq("user_id"), "ts", "snap_ts")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"),
        expr("snap_ts_matched div 1000").as("snap_ts_us"),
        col("snap_value"))
      .orderBy("event_id")
  }

  /** q138/q139: the forward and forward+tolerance quadrants of the
    * native physical operator, sharing q83/q84's oracles — with q137
    * the native [[graft.plans.AsOfJoinExec]] is oracle-certified on the
    * same (direction × bounded) matrix the composed form carries. */
  def q138AsofForwardNative(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("snap_ts"),
        col("value").as("snap_value"))
    TemporalJoin.asOfJoinNative(purchases, signups, Seq("user_id"),
        "ts", "snap_ts", direction = "forward")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"),
        expr("snap_ts_matched div 1000").as("snap_ts_us"),
        col("snap_value"))
      .orderBy("event_id")
  }

  def q139AsofForwardTolNative(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("value").as("click_value"))
    TemporalJoin.asOfJoinNative(purchases, clicks, Seq("user_id"),
        "ts", "click_ts",
        toleranceNs = Some(7L * 24 * 3600 * 1000000000L), direction = "forward")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"),
        expr("click_ts_matched div 1000").as("click_ts_us"),
        col("click_value"))
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(
    "q137_asof_join_native" -> (q137AsofJoinNative _),
    "q138_asof_forward_native" -> (q138AsofForwardNative _),
    "q139_asof_forward_tol_native" -> (q139AsofForwardTolNative _),
    "q44_asof_join" -> (q44AsofJoin _),
    "q68_watermark_lag" -> (q68WatermarkLag _),
    "q73_range_join" -> (q73RangeJoin _),
    "q76_attribution_join" -> (q76AttributionJoin _),
    "q77_moving_window" -> (q77MovingWindow _),
    "q83_asof_forward" -> (q83AsofForward _),
    "q84_asof_forward_tol" -> (q84AsofForwardTolerance _),
    "q92_session_window" -> (q92SessionWindow _),
    "q96_gap_fill" -> (q96GapFill _),
    "q79_range_rewrite" -> (q79RangeRewrite _))

  private val oraclesBase: Map[String, String] = Map(
    "q44_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_ns(ts) ts, value
        |           FROM events WHERE event_type = 'purchase'),
        |snap AS (SELECT user_id, epoch_ns(ts) snap_ts, value snap_value
        |         FROM events WHERE event_type = 'signup')
        |SELECT p.event_id, p.user_id,
        |       p.ts // 1000 AS ts_us,
        |       s.snap_ts // 1000 AS snap_ts_us, s.snap_value
        |FROM p ASOF LEFT JOIN snap s
        |  ON p.user_id = s.user_id AND p.ts >= s.snap_ts
        |ORDER BY p.event_id""".stripMargin,
    "q68_watermark_lag" ->
      // independent zone conversion: naive µs-truncated ts interpreted
      // as UTC, rendered as Tehran wall clock, minus the 1 h lag
      """SELECT event_id,
        | strftime(timezone('Asia/Tehran',
        |            make_timestamp(epoch_ns(ts) // 1000) AT TIME ZONE 'UTC')
        |          - INTERVAL 1 HOUR,
        |          '%Y-%m-%d %H:%M:%S') AS tehran_lagged
        |FROM events WHERE event_id % 50 = 0
        |ORDER BY event_id""".stripMargin,
    "q73_range_join" ->
      // the semantics the bucketized engine plan must reproduce:
      // a plain inclusive-BETWEEN theta-join
      """WITH p AS (SELECT CAST(round(value * 100) AS BIGINT) pv FROM events),
        |iv AS (SELECT s_suppkey,
        |         (s_suppkey * 997) % 48000 AS lo,
        |         (s_suppkey * 997) % 48000 + 200 + (s_suppkey % 800) * 2 AS hi
        |       FROM supplier)
        |SELECT iv.s_suppkey,
        |  CAST(count(*) AS BIGINT) AS n_points,
        |  CAST(sum(p.pv) AS BIGINT) AS sum_pv
        |FROM iv JOIN p ON p.pv BETWEEN iv.lo AND iv.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q76_attribution_join" ->
      // ASOF match, then the 1-hour attribution window nulls out stale
      // matches — both the time and the carried value, atomically
      """WITH p AS (SELECT event_id, user_id, epoch_ns(ts) ts
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_ns(ts) click_ts, value click_value
        |      FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts // 1000 AS ts_us,
        |  CASE WHEN s.click_ts >= p.ts - 3600000000000
        |       THEN s.click_ts // 1000 END AS click_ts_us,
        |  CASE WHEN s.click_ts >= p.ts - 3600000000000
        |       THEN s.click_value END AS click_value
        |FROM p ASOF LEFT JOIN c s
        |  ON p.user_id = s.user_id AND p.ts >= s.click_ts
        |ORDER BY p.event_id""".stripMargin,
    "q83_asof_forward" ->
      """WITH p AS (SELECT event_id, user_id, epoch_ns(ts) ts, value
        |           FROM events WHERE event_type = 'purchase'),
        |snap AS (SELECT user_id, epoch_ns(ts) snap_ts, value snap_value
        |         FROM events WHERE event_type = 'signup')
        |SELECT p.event_id, p.user_id,
        |       p.ts // 1000 AS ts_us,
        |       s.snap_ts // 1000 AS snap_ts_us, s.snap_value
        |FROM p ASOF LEFT JOIN snap s
        |  ON p.user_id = s.user_id AND p.ts <= s.snap_ts
        |ORDER BY p.event_id""".stripMargin,
    "q84_asof_forward_tol" ->
      // forward ASOF match, then the 7-day window nulls out far
      // matches — both the time and the carried value, atomically
      """WITH p AS (SELECT event_id, user_id, epoch_ns(ts) ts
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_ns(ts) click_ts, value click_value
        |      FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts // 1000 AS ts_us,
        |  CASE WHEN s.click_ts <= p.ts + 604800000000000
        |       THEN s.click_ts // 1000 END AS click_ts_us,
        |  CASE WHEN s.click_ts <= p.ts + 604800000000000
        |       THEN s.click_value END AS click_value
        |FROM p ASOF LEFT JOIN c s
        |  ON p.user_id = s.user_id AND p.ts <= s.click_ts
        |ORDER BY p.event_id""".stripMargin,
    "q77_moving_window" ->
      """SELECT event_id, user_id,
        |  CAST(round(value * 100) AS BIGINT) cents,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) mov3_sum,
        |  CAST(min(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) mov3_min
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q92_session_window" ->
      // lag→break→cumsum sessionization (split across CTE levels —
      // DuckDB windows cannot nest); break at diff >= gap matches the
      // half-open [first, last + gap) session-window semantics
      """WITH e AS (SELECT user_id, epoch_ns(ts)//1000 us FROM events),
        |l AS (SELECT user_id, us,
        |        lag(us) OVER (PARTITION BY user_id ORDER BY us) prev
        |      FROM e),
        |b AS (SELECT user_id, us,
        |        CASE WHEN prev IS NULL OR us - prev >= 1800000000
        |             THEN 1 ELSE 0 END brk
        |      FROM l),
        |g AS (SELECT user_id, us,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |                       ROWS UNBOUNDED PRECEDING) sid
        |      FROM b)
        |SELECT user_id, cast(min(us) AS BIGINT) start_us,
        |       cast(max(us) + 1800000000 AS BIGINT) end_us,
        |       cast(count(*) AS BIGINT) n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, start_us""".stripMargin,
    "q96_gap_fill" ->
      // grid via generate_series, forward fill via native ASOF join —
      // an independent statement of Resample.gapFill's semantics
      """WITH e AS (SELECT user_id, epoch_ns(ts)//1000 us, event_id,
        |        CAST(round(value * 100) AS BIGINT) cents
        |      FROM events
        |      WHERE event_type = 'purchase' AND user_id % 10 = 0),
        |r AS (SELECT user_id, us // 86400000000 dy, cents,
        |        row_number() OVER (PARTITION BY user_id, us // 86400000000
        |                           ORDER BY us DESC, event_id DESC) rn
        |      FROM e),
        |d AS (SELECT user_id, dy, cents FROM r WHERE rn = 1),
        |bo AS (SELECT user_id, min(dy) d0, max(dy) d1 FROM d GROUP BY 1),
        |g AS (SELECT user_id, unnest(generate_series(d0, d1)) dy FROM bo)
        |SELECT g.user_id, g.dy AS "day", d.cents
        |FROM g ASOF JOIN d ON g.user_id = d.user_id AND g.dy >= d.dy
        |ORDER BY g.user_id, g.dy""".stripMargin)

  // q79 shares q73's oracle verbatim: same fixture, same BETWEEN
  // semantics — only the plan that produces the answer differs
  val oracles: Map[String, String] =
    oraclesBase +
      ("q79_range_rewrite" -> oraclesBase("q73_range_join")) +
      // the native physical operator must match the same external
      // ASOF JOIN reference answers as the composed form, on the full
      // (direction × bounded) matrix
      ("q137_asof_join_native" -> oraclesBase("q44_asof_join")) +
      ("q138_asof_forward_native" -> oraclesBase("q83_asof_forward")) +
      ("q139_asof_forward_tol_native" -> oraclesBase("q84_asof_forward_tol"))
}
