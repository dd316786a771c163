package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.operators.Cdc

/** Warehouse table-maintenance gates over [[graft.operators.Cdc]]:
  * SCD Type-2 history (q101), changelog compaction (q102), and keyed
  * snapshot diff (q103). The reference's serving tables are maintained
  * by insert-if-absent upserts and blind full-rebuild swaps
  * (dags/search_engine/utils_of_searchengine.py:147-170); this family
  * adds the history/audit forms a warehouse user reaches for next.
  *
  * Determinism: orders are sequenced by (o_orderdate, o_orderkey) and
  * events by the exact epoch-nanos `ts` with `event_id` tiebreak, so
  * both engines agree on every lead()/last-writer choice; money runs in
  * integer cents.
  */
object ChangeGate {
  type Q = (SparkSession, String) => DataFrame

  private def cents(c: Column): Column = round(c * 100).cast(LongType)

  /** q101: SCD Type-2 dimension history from orders-as-change-stream —
    * per customer, each order versions the (priority, price) payload;
    * effective_to = next change's date, open row flagged current. */
  def q101Scd2History(s: SparkSession, dir: String): DataFrame = {
    val ch = Tables.orders(s, dir).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      col("o_orderpriority"), cents(col("o_totalprice")).as("price_c100"))
    Cdc.scd2(ch, Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("effective_from"), "yyyy-MM-dd").as("eff_from"),
        date_format(col("effective_to"), "yyyy-MM-dd").as("eff_to"),
        col("is_current"), col("o_orderpriority"), col("price_c100"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q102: changelog compaction — events replayed as a keyed changelog
    * (every 10th event id a delete), last writer wins per user, keys
    * whose final change is a delete disappear. The map-side-combinable
    * max(struct) shape, not a window ([[Cdc.compactChangelog]]). */
  def q102ChangelogCompact(s: SparkSession, dir: String): DataFrame = {
    // seq at µs (ts div 1000): DuckDB reads the nanos parquet column at
    // µs precision, so the writer order must be µs on both engines;
    // event_id breaks the (rare) same-µs ties identically.
    val ch = Tables.events(s, dir).select(
      col("user_id"), expr("ts div 1000").as("ts_us"), col("event_id"),
      when(col("event_id") % 10 === 0, "D").otherwise("U").as("op"),
      col("event_type"), cents(col("value")).as("value_c100"))
    Cdc.compactChangelog(ch, Seq("user_id"), Seq("ts_us", "event_id"), "op")
      .select(col("user_id"), col("ts_us").as("last_ts_us"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("value_c100").as("last_value_c100"))
      .orderBy("user_id")
  }

  /** q103: audited snapshot diff — two deterministic projections of
    * orders (droppings and a price bump) reconciled into
    * added/removed/changed rows via one full-outer join
    * ([[Cdc.snapshotDiff]]). */
  def q103SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderkey"),
      col("o_orderstatus"), cents(col("o_totalprice")).as("price_c100"))
    val before = o.filter(col("o_orderkey") % 7 =!= 0)
    val after = o.filter(col("o_orderkey") % 5 =!= 0)
      .withColumn("price_c100", col("price_c100") +
        when(col("o_orderkey") % 3 === 0, 100L).otherwise(0L))
    Cdc.snapshotDiff(before, after, Seq("o_orderkey"),
        Seq("o_orderstatus", "price_c100"))
      .select(col("o_orderkey"), col("change_type"),
        col("old_price_c100"), col("new_price_c100"),
        col("old_o_orderstatus"), col("new_o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** q110: SCD2 point-in-time lookup — the standard consumer of a
    * q101-style history table: each fact row (an order, observing the
    * world 10 days after its own date) joins the ONE dimension version
    * effective at its observation instant via the half-open interval
    * predicate `eff_from <= t < eff_to` (open row: eff_to null). The
    * equi key (customer) drives the shuffle; the interval conjuncts
    * ride along as join residents evaluated per key partition — the
    * temporal-dimension join shape of every Kimball warehouse. All
    * comparisons in epoch seconds (integer). */
  def q110Scd2Lookup(s: SparkSession, dir: String): DataFrame = {
    val ch = Tables.orders(s, dir).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      col("o_orderpriority"), cents(col("o_totalprice")).as("price_c100"))
    val dim = Cdc.scd2(ch, Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"))
      .select(col("o_custkey").as("d_custkey"),
        col("o_orderkey").as("version_orderkey"),
        col("o_orderpriority").as("version_priority"),
        col("price_c100").as("version_price_c100"),
        col("effective_from").cast("timestamp").cast("long").as("eff_from_s"),
        col("effective_to").cast("timestamp").cast("long").as("eff_to_s"))
    val facts = Tables.orders(s, dir).select(col("o_orderkey"),
      col("o_custkey"),
      (col("o_orderdate").cast("timestamp").cast("long") + 10L * 86400L).as("at_s"))
    facts.join(dim,
        facts("o_custkey") === dim("d_custkey") &&
          dim("eff_from_s") <= facts("at_s") &&
          (dim("eff_to_s").isNull || facts("at_s") < dim("eff_to_s")))
      .select(col("o_orderkey"), col("at_s"), col("version_orderkey"),
        col("version_priority"), col("version_price_c100"))
      .orderBy("o_orderkey")
  }

  /** q115: incremental aggregate maintenance — the standing per-user
    * (count, Σcents) aggregate over 3/4 of the events is updated with a
    * signed delta (the remaining quarter as insertions, every
    * id≡1 (mod 8) base row retracted) through
    * [[graft.operators.Ivm.applyAggDelta]]; the oracle recomputes the
    * final set from scratch, so a hash match certifies
    * increment ≡ recompute — the IVM contract that lets a 100 TB
    * aggregate absorb a CDC feed without re-scanning history. */
  def q115IncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"),
      cents(col("value")).as("v_c100"))
    val base = ev.filter(col("event_id") % 4 =!= 0)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("v_c100").as("sum_c100"))
    val inserts = ev.filter(col("event_id") % 4 === 0)
      .select(col("user_id"), lit(1L).as("sign"), col("v_c100"))
    val retracts = ev.filter(col("event_id") % 8 === 1)
      .select(col("user_id"), lit(-1L).as("sign"), col("v_c100"))
    graft.operators.Ivm.applyAggDelta(base,
        inserts.unionByName(retracts), Seq("user_id"),
        "n", "sum_c100", "sign", "v_c100")
      .orderBy("user_id")
  }

  /** q122: schema-evolution union — two loads of the same logical
    * table written under DIFFERENT schema versions (v1 lacks the later
    * `priority` column; v2 added it and dropped the legacy `status`)
    * merged with `unionByName(allowMissingColumns)`: absent columns
    * null-fill per side, column ORDER is reconciled by name. The
    * schema-drift-across-loads shape every long-lived pipeline hits;
    * the reference hard-codes column lists and would break silently. */
  def q122UnionEvolve(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val v1 = o.filter(col("o_orderkey") % 2 === 0).select(
      col("o_orderkey"), col("o_custkey"),
      col("o_orderstatus").as("status"),
      cents(col("o_totalprice")).as("price_c100"))
    val v2 = o.filter(col("o_orderkey") % 2 === 1).select(
      col("o_orderkey"),
      col("o_orderpriority").as("priority"), // new column, order differs
      col("o_custkey"), cents(col("o_totalprice")).as("price_c100"))
    v1.unionByName(v2, allowMissingColumns = true)
      .withColumn("schema_v", when(col("o_orderkey") % 2 === 0, 1).otherwise(2))
      .select("o_orderkey", "o_custkey", "status", "priority",
        "price_c100", "schema_v")
      .orderBy("o_orderkey")
  }

  val queries: Map[String, Q] = Map(
    "q122_union_evolve" -> (q122UnionEvolve _),
    "q101_scd2_history" -> (q101Scd2History _),
    "q102_changelog_compact" -> (q102ChangelogCompact _),
    "q103_snapshot_diff" -> (q103SnapshotDiff _),
    "q110_scd2_lookup" -> (q110Scd2Lookup _),
    "q115_incremental_agg" -> (q115IncrementalAgg _))

  val oracles: Map[String, String] = Map(
    "q122_union_evolve" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus status,
        |  CAST(NULL AS VARCHAR) priority,
        |  cast(round(o_totalprice * 100) as bigint) price_c100, 1 schema_v
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, CAST(NULL AS VARCHAR),
        |  o_orderpriority,
        |  cast(round(o_totalprice * 100) as bigint), 2
        |FROM orders WHERE o_orderkey % 2 = 1
        |ORDER BY o_orderkey""".stripMargin,
    "q101_scd2_history" ->
      """WITH ch AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |    o_orderpriority,
        |    cast(round(o_totalprice * 100) as bigint) price_c100
        |  FROM orders),
        |h AS (SELECT *, lead(o_orderdate) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey) eff_to_ts
        |      FROM ch)
        |SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') eff_from,
        |  strftime(eff_to_ts, '%Y-%m-%d') eff_to,
        |  CASE WHEN eff_to_ts IS NULL THEN 1 ELSE 0 END is_current,
        |  o_orderpriority, price_c100
        |FROM h ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q102_changelog_compact" ->
      """WITH ch AS (SELECT user_id, epoch_us(ts) ts_us, event_id,
        |    CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END op,
        |    event_type, cast(round(value * 100) as bigint) value_c100
        |  FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts_us DESC, event_id DESC) rn
        |      FROM ch)
        |SELECT user_id, ts_us last_ts_us, event_id last_event_id,
        |  event_type last_event_type, value_c100 last_value_c100
        |FROM r WHERE rn = 1 AND op <> 'D' ORDER BY user_id""".stripMargin,
    "q103_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus,
        |    cast(round(o_totalprice * 100) as bigint) price_c100
        |  FROM orders),
        |b AS (SELECT * FROM o WHERE o_orderkey % 7 <> 0),
        |a AS (SELECT o_orderkey, o_orderstatus, price_c100 +
        |        CASE WHEN o_orderkey % 3 = 0 THEN 100 ELSE 0 END price_c100
        |      FROM o WHERE o_orderkey % 5 <> 0),
        |j AS (SELECT coalesce(b.o_orderkey, a.o_orderkey) o_orderkey,
        |        b.o_orderstatus old_o_orderstatus,
        |        a.o_orderstatus new_o_orderstatus,
        |        b.price_c100 old_price_c100, a.price_c100 new_price_c100,
        |        b.o_orderkey bk, a.o_orderkey ak
        |      FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey)
        |SELECT o_orderkey,
        |  CASE WHEN bk IS NULL THEN 'added'
        |       WHEN ak IS NULL THEN 'removed'
        |       ELSE 'changed' END change_type,
        |  old_price_c100, new_price_c100,
        |  old_o_orderstatus, new_o_orderstatus
        |FROM j
        |WHERE bk IS NULL OR ak IS NULL
        |   OR old_price_c100 IS DISTINCT FROM new_price_c100
        |   OR old_o_orderstatus IS DISTINCT FROM new_o_orderstatus
        |ORDER BY o_orderkey""".stripMargin,
    "q110_scd2_lookup" ->
      """WITH ch AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |    o_orderpriority,
        |    cast(round(o_totalprice * 100) as bigint) price_c100
        |  FROM orders),
        |dim AS (SELECT o_custkey d_custkey, o_orderkey version_orderkey,
        |    o_orderpriority version_priority, price_c100 version_price_c100,
        |    cast(epoch(o_orderdate) as bigint) eff_from_s,
        |    cast(epoch(lead(o_orderdate) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey)) as bigint) eff_to_s
        |  FROM ch),
        |f AS (SELECT o_orderkey, o_custkey,
        |    cast(epoch(o_orderdate) as bigint) + 10 * 86400 at_s
        |  FROM orders)
        |SELECT f.o_orderkey, f.at_s, version_orderkey,
        |  version_priority, version_price_c100
        |FROM f JOIN dim ON f.o_custkey = dim.d_custkey
        |  AND dim.eff_from_s <= f.at_s
        |  AND (dim.eff_to_s IS NULL OR f.at_s < dim.eff_to_s)
        |ORDER BY f.o_orderkey""".stripMargin,
    "q115_incremental_agg" ->
      // recompute-from-scratch over the post-delta set: base (id%4<>0)
      // minus retractions (id%8=1) plus insertions (id%4=0)
      """SELECT user_id, cast(count(*) as bigint) n,
        |  cast(sum(cast(round(value * 100) as bigint)) as bigint) sum_c100
        |FROM events
        |WHERE event_id % 4 = 0
        |   OR (event_id % 4 <> 0 AND event_id % 8 <> 1)
        |GROUP BY 1 HAVING count(*) > 0 ORDER BY 1""".stripMargin)
}
