package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** q112: deadline funnel — q105's strict ordering with a conversion
    * window: the click must land within 7 days of the first view, the
    * purchase within 7 days of that click. Same three map-side-
    * combinable min-aggregates; the deadline is one more conjunct. */
  def q112FunnelWindowed(s: SparkSession, dir: String): DataFrame = {
    val week = 7L * 86400L * 1000000L
    val ev = Tables.events(s, dir).select(col("user_id"),
      col("event_type"), expr("ts div 1000").as("ts_us"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("t1_us"))
    val t2 = ev.filter(col("event_type") === "click").join(t1, "user_id")
      .filter(col("ts_us") > col("t1_us") && col("ts_us") <= col("t1_us") + week)
      .groupBy("user_id").agg(min("ts_us").as("t2_us"))
    val t3 = ev.filter(col("event_type") === "purchase").join(t2, "user_id")
      .filter(col("ts_us") > col("t2_us") && col("ts_us") <= col("t2_us") + week)
      .groupBy("user_id").agg(min("ts_us").as("t3_us"))
    ev.select("user_id").distinct()
      .join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .withColumn("stage_reached",
        when(col("t3_us").isNotNull, 3)
          .when(col("t2_us").isNotNull, 2)
          .when(col("t1_us").isNotNull, 1).otherwise(0))
      .select("user_id", "t1_us", "t2_us", "t3_us", "stage_reached")
      .orderBy("user_id")
  }

  /** q113: event-type transition matrix — per-user consecutive event
    * pairs via one keyed lead() window, counted per (from, to) with the
    * from-state total alongside (the integer-exact Markov estimate's
    * numerator and denominator). */
  def q113TransitionMatrix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"), col("event_id"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
    val counts = pairs.groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type").agg(sum("n").as("n_from"))
    counts.join(totals, "from_type")
      .select("from_type", "to_type", "n", "n_from")
      .orderBy("from_type", "to_type")
  }

  /** q114: RFM segmentation — per-user recency/frequency/monetary
    * scored into quartiles. The quartile THRESHOLDS come from
    * [[graft.operators.CorpusShape.globalQuantiles]] (range partition +
    * distributed prefix count) and broadcast back as one row — never an
    * ntile()/percent_rank() over an unpartitioned window, which is the
    * single-partition trap at a production user count. Integer
    * positional quantiles (`ceil(q·n)`), so both engines pick the same
    * boundary user. */
  def q114RfmSegmentation(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.CorpusShape
    val ev = Tables.events(s, dir).select(col("user_id"),
      expr("ts div 1000").as("ts_us"),
      round(col("value") * 100).cast("long").as("v_c100"))
    val refUs = ev.agg(max("ts_us")).head().getLong(0)
    val u = ev.groupBy("user_id").agg(
        max("ts_us").as("last_us"),
        count(lit(1)).as("f_n"), sum("v_c100").as("m_c100"))
      .select(col("user_id"),
        expr(s"($refUs - last_us) div 86400000000").as("r_days"),
        col("f_n"), col("m_c100"))
    val qs = Seq(("p25", 1, 4), ("p50", 2, 4), ("p75", 3, 4))
    def th(col0: String, pre: String) =
      CorpusShape.globalQuantiles(u, col0, qs)
        .select(col("p25").as(s"${pre}25"), col("p50").as(s"${pre}50"),
          col("p75").as(s"${pre}75"))
    val thresholds = th("r_days", "r").crossJoin(th("f_n", "f"))
      .crossJoin(th("m_c100", "m"))
    def score(v: Column, p25: Column, p50: Column, p75: Column): Column =
      lit(1) + when(v > p25, 1).otherwise(0) +
        when(v > p50, 1).otherwise(0) + when(v > p75, 1).otherwise(0)
    u.crossJoin(broadcast(thresholds))
      .withColumn("r_score", lit(5) - score(col("r_days"),
        col("r25"), col("r50"), col("r75"))) // recent = high score
      .withColumn("f_score", score(col("f_n"), col("f25"), col("f50"), col("f75")))
      .withColumn("m_score", score(col("m_c100"), col("m25"), col("m50"), col("m75")))
      .withColumn("segment",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .select("user_id", "r_days", "f_n", "m_c100",
        "r_score", "f_score", "m_score", "segment")
      .orderBy("user_id")
  }

  /** q118: multi-touch attribution — every purchase credits the clicks
    * of the same user in the trailing 24 h: first-touch and last-touch
    * click ids plus the touch count (the linear model's denominator).
    * One user-keyed join with a range conjunct (fan-out bounded by a
    * user's 24 h click volume), then one aggregate per purchase. The
    * min/max over a zero-padded (ts, id) key string makes the
    * first/last pick total-order deterministic on both engines without
    * struct-min support. */
  def q118MultiTouchAttribution(s: SparkSession, dir: String): DataFrame = {
    val day = 86400000000L
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"),
      col("event_type"), expr("ts div 1000").as("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts_us").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"), col("ts_us").as("c_ts"))
    val key = concat(lpad(col("c_ts").cast("string"), 20, "0"),
      lpad(col("c_id").cast("string"), 10, "0"))
    val touches = purchases.join(clicks,
      Seq("user_id")).filter(col("c_ts") <= col("p_ts") &&
        col("c_ts") > col("p_ts") - day)
    val agg = touches.groupBy("p_id").agg(
      count(lit(1)).as("n_touches"),
      min(key).as("__fk"), max(key).as("__lk"))
    purchases.join(agg, Seq("p_id"), "left")
      .select(col("p_id"), coalesce(col("n_touches"), lit(0L)).as("n_touches"),
        substring(col("__fk"), 21, 10).cast("long").as("first_click_id"),
        substring(col("__lk"), 21, 10).cast("long").as("last_click_id"))
      .orderBy("p_id")
  }

  /** q126: burst dedup — collapse retries/repeats: within a
    * (user, event_type) key, events closer than 1 h to their
    * predecessor belong to the same burst and only the burst's FIRST
    * event survives; after an hour of quiet the key re-admits. The
    * retry-collapse / notification-throttle shape — unlike q61's
    * forever-dedup, suppression here is time-scoped. One keyed lag()
    * window, no state beyond the partition sort. */
  def q126BurstDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hour = 3600L * 1000000L
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("ts_us", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts div 1000").as("ts_us"))
      .withColumn("prev_us", lag("ts_us", 1).over(w))
      .filter(col("prev_us").isNull || col("ts_us") - col("prev_us") > hour)
      .select("user_id", "event_type", "event_id", "ts_us")
      .orderBy("user_id", "event_type", "ts_us", "event_id")
  }

  /** q133: exact top-3 users per event type via the typed
    * [[graft.functions.TopK.TopKByCount]] Aggregator — the custom
    * typed-aggregation extension point (Aggregator[IN, BUF, OUT] with
    * partial-aggregate merge), exercised through its SQL registration:
    * the scalable first level (hash groupBy count with map-side
    * combine) feeds the k-bounded UDAF inside a spark.sql query, and
    * posexplode turns the k-array into ranked rows. The oracle derives
    * the same top-3 with a DuckDB window rank — certifying that the
    * aggregator's (cnt desc, value asc) merge order equals SQL's
    * ROW_NUMBER ordering exactly, ties included. */
  def q133TopkAggregator(s: SparkSession, dir: String): DataFrame = {
    val fn = graft.functions.TopK.register(s, 3)
    Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("cnt"))
      .createOrReplaceTempView("g_q133_counts")
    s.sql(
      s"""SELECT event_type, cast(pos + 1 as bigint) AS rank,
         |  e.value AS user_id, e.cnt AS n
         |FROM (
         |  SELECT event_type,
         |    $fn(user_id, cnt) AS tk
         |  FROM g_q133_counts GROUP BY event_type) t
         |LATERAL VIEW posexplode(t.tk.entries) pe AS pos, e
         |ORDER BY event_type, rank""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "q133_topk_aggregator" -> (q133TopkAggregator _),
    "q126_burst_dedup" -> (q126BurstDedup _),
    "q118_multi_touch_attribution" -> (q118MultiTouchAttribution _),
    "q104_interval_coverage" -> (q104IntervalCoverage _),
    "q105_funnel" -> (q105Funnel _),
    "q106_cohort_retention" -> (q106CohortRetention _),
    "q112_funnel_windowed" -> (q112FunnelWindowed _),
    "q113_transition_matrix" -> (q113TransitionMatrix _),
    "q114_rfm_segmentation" -> (q114RfmSegmentation _))

  val oracles: Map[String, String] = Map(
    "q133_topk_aggregator" ->
      // window-ranked top-3 with the identical (cnt desc, user asc)
      // tie order the Aggregator's merge enforces
      """WITH c AS (SELECT event_type, user_id,
        |    cast(count(*) as bigint) cnt
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT event_type, user_id, cnt,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY cnt DESC, user_id) rnk
        |  FROM c)
        |SELECT event_type, cast(rnk as bigint) "rank", user_id, cnt n
        |FROM r WHERE rnk <= 3 ORDER BY event_type, "rank"""".stripMargin,
    "q126_burst_dedup" ->
      """WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) ts_us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts), event_id) prev_us
        |  FROM events)
        |SELECT user_id, event_type, event_id, ts_us
        |FROM e WHERE prev_us IS NULL OR ts_us - prev_us > 3600000000
        |ORDER BY user_id, event_type, ts_us, event_id""".stripMargin,
    "q118_multi_touch_attribution" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) ts_us
        |  FROM events),
        |p AS (SELECT user_id, event_id p_id, ts_us p_ts FROM ev
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id c_id, ts_us c_ts FROM ev
        |      WHERE event_type = 'click'),
        |t AS (SELECT p.p_id,
        |        lpad(cast(c_ts as varchar), 20, '0')
        |          || lpad(cast(c_id as varchar), 10, '0') k
        |      FROM p JOIN c ON p.user_id = c.user_id
        |      WHERE c_ts <= p_ts AND c_ts > p_ts - 86400000000),
        |a AS (SELECT p_id, cast(count(*) as bigint) n_touches,
        |        min(k) fk, max(k) lk
        |      FROM t GROUP BY 1)
        |SELECT p.p_id, coalesce(n_touches, 0) n_touches,
        |  cast(substring(fk, 21, 10) as bigint) first_click_id,
        |  cast(substring(lk, 21, 10) as bigint) last_click_id
        |FROM p LEFT JOIN a ON p.p_id = a.p_id
        |ORDER BY p.p_id""".stripMargin,
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
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q112_funnel_windowed" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) ts_us
        |  FROM events),
        |t1 AS (SELECT user_id, min(ts_us) t1_us FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT ev.user_id, min(ts_us) t2_us FROM ev
        |       JOIN t1 ON ev.user_id = t1.user_id
        |       WHERE event_type = 'click' AND ts_us > t1_us
        |         AND ts_us <= t1_us + 604800000000 GROUP BY 1),
        |t3 AS (SELECT ev.user_id, min(ts_us) t3_us FROM ev
        |       JOIN t2 ON ev.user_id = t2.user_id
        |       WHERE event_type = 'purchase' AND ts_us > t2_us
        |         AND ts_us <= t2_us + 604800000000 GROUP BY 1)
        |SELECT u.user_id, t1_us, t2_us, t3_us,
        |  CASE WHEN t3_us IS NOT NULL THEN 3
        |       WHEN t2_us IS NOT NULL THEN 2
        |       WHEN t1_us IS NOT NULL THEN 1 ELSE 0 END stage_reached
        |FROM (SELECT DISTINCT user_id FROM ev) u
        |LEFT JOIN t1 ON u.user_id = t1.user_id
        |LEFT JOIN t2 ON u.user_id = t2.user_id
        |LEFT JOIN t3 ON u.user_id = t3.user_id
        |ORDER BY u.user_id""".stripMargin,
    "q113_transition_matrix" ->
      """WITH p AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) next_type
        |  FROM events),
        |c AS (SELECT event_type from_type, next_type to_type,
        |    cast(count(*) as bigint) n
        |  FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, cast(sum(n) as bigint) n_from
        |      FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n, t.n_from
        |FROM c JOIN t ON c.from_type = t.from_type
        |ORDER BY c.from_type, c.to_type""".stripMargin,
    "q114_rfm_segmentation" ->
      // quartile thresholds by the SAME integer positional rule as
      // CorpusShape.globalQuantiles: value at rank (num·n+den−1)//den
      """WITH ev AS (SELECT user_id, epoch_us(ts) ts_us,
        |    cast(round(value * 100) as bigint) v_c100 FROM events),
        |ref AS (SELECT max(ts_us) r FROM ev),
        |u AS (SELECT user_id,
        |    ((SELECT r FROM ref) - max(ts_us)) // 86400000000 r_days,
        |    cast(count(*) as bigint) f_n, cast(sum(v_c100) as bigint) m_c100
        |  FROM ev GROUP BY 1),
        |nn AS (SELECT count(*) n FROM u),
        |rt AS (SELECT max(CASE WHEN rn = (1*n+3)//4 THEN v END) rp25,
        |       max(CASE WHEN rn = (2*n+3)//4 THEN v END) rp50,
        |       max(CASE WHEN rn = (3*n+3)//4 THEN v END) rp75
        |  FROM (SELECT r_days v, row_number() OVER (ORDER BY r_days) rn
        |        FROM u), nn),
        |ft AS (SELECT max(CASE WHEN rn = (1*n+3)//4 THEN v END) fp25,
        |       max(CASE WHEN rn = (2*n+3)//4 THEN v END) fp50,
        |       max(CASE WHEN rn = (3*n+3)//4 THEN v END) fp75
        |  FROM (SELECT f_n v, row_number() OVER (ORDER BY f_n) rn FROM u), nn),
        |mt AS (SELECT max(CASE WHEN rn = (1*n+3)//4 THEN v END) mp25,
        |       max(CASE WHEN rn = (2*n+3)//4 THEN v END) mp50,
        |       max(CASE WHEN rn = (3*n+3)//4 THEN v END) mp75
        |  FROM (SELECT m_c100 v, row_number() OVER (ORDER BY m_c100) rn
        |        FROM u), nn)
        |SELECT user_id, r_days, f_n, m_c100,
        |  5 - (1 + (r_days > rp25)::int + (r_days > rp50)::int
        |         + (r_days > rp75)::int) r_score,
        |  1 + (f_n > fp25)::int + (f_n > fp50)::int + (f_n > fp75)::int f_score,
        |  1 + (m_c100 > mp25)::int + (m_c100 > mp50)::int
        |    + (m_c100 > mp75)::int m_score,
        |  (5 - (1 + (r_days > rp25)::int + (r_days > rp50)::int
        |          + (r_days > rp75)::int)) * 100
        |  + (1 + (f_n > fp25)::int + (f_n > fp50)::int + (f_n > fp75)::int) * 10
        |  + 1 + (m_c100 > mp25)::int + (m_c100 > mp50)::int
        |    + (m_c100 > mp75)::int segment
        |FROM u, rt, ft, mt ORDER BY user_id""".stripMargin)
}
