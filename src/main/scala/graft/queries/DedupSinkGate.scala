package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.KeyedSink

/** Puts the two-tier dedup sink (J7/ST3 — RedisBloom crawler pre-filter
  * + exact insert-if-absent, redis_utils.py:17-32 / mongodb_utils.py:
  * 5-44) under the DuckDB oracle gate. The Bloom split is approximate
  * (false positives route extra rows through the exact check) but the
  * OUTPUT is exact — that is the property worth certifying, and it is
  * exactly what the relational anti-join oracle expresses.
  */
object DedupSinkGate {
  type Q = (SparkSession, String) => DataFrame

  /** q64: crawl-shaped keys with overlap, in-batch duplicates (paired
    * ids share a key), and nulls (the sink skips them). The REAL
    * operator runs: Bloom sketch of existing keys → split → exact
    * anti-join on the suspect side only. The sketch additionally
    * round-trips through its checkpoint file (save → load) before use —
    * the reference's cross-RUN Redis-resident Bloom lifecycle
    * (mongo_to_bf_dag.py:38-106), so the gate certifies the persisted
    * form, not just the in-memory one. */
  def q64BloomDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val existing = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(concat(lit("u"), col("doc_id")).as("k"))
    val incoming = docs.select(
      when(pmod(col("doc_id"), lit(17)) === 0, lit(null).cast(StringType))
        .otherwise(concat(lit("u"), col("doc_id") - pmod(col("doc_id"), lit(2))))
        .as("k"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bloom_q64_")
      .resolve("seen_keys.bloom")
    KeyedSink.saveBloom(KeyedSink.buildBloom(existing, "k"), ckpt)
    val bloom = KeyedSink.loadBloom(ckpt) // a "next run" starts here
    KeyedSink.dedupTwoTier(existing, incoming, "k", bloom).orderBy("k")
  }

  /** q69: P10 delete-by-predicate as a filtered overwrite
    * (del_unuse_record_in_mrestate.py:17-19) — null predicate results
    * must KEEP the row (SQL delete semantics: only predicate-true rows
    * go), which the null-producing try_cast branch exercises. */
  def q69DeleteWhere(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val unusable = col("lang") === "zh" ||
      substring(col("text"), 1, 3).try_cast(IntegerType) > 100 // null for non-numeric
    KeyedSink.deleteWhere(docs, unusable)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  /** q99: full MERGE INTO ([[KeyedSink.mergeInto]]) — update-matched /
    * insert-unmatched / delete-flagged applied in one full-outer pass.
    * The change set is CDC-shaped from orders: per-customer totals as
    * upserts, every 10th customer flagged delete, every 5th-mod-1
    * re-keyed past the customer domain to exercise the insert branch.
    * The oracle restates the merge as a FULL JOIN + CASE. */
  def q99MergeInto(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val cust = graft.Tables.customer(s, dir)
      .select(col("c_custkey").as("k"),
        round(col("c_acctbal") * 100).cast("long").as("bal"))
    val agg = graft.Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val base = agg.select(col("k"),
      when(pmod(col("k"), lit(10)) === 0, "delete").otherwise("upsert").as("op"),
      col("cents").as("bal"))
    // insert keys must be provably absent from BOTH the state and the
    // base change domain: derive the shift from the data (max customer
    // key + 1, a 1-row bounded agg) rather than a constant a scaled
    // fixture could outgrow and collide with
    val stride = cust.agg(max(col("k"))).head().getLong(0) + 1L
    val ins = agg.filter(pmod(col("k"), lit(5)) === 1)
      .select((col("k") + stride).as("k"), lit("upsert").as("op"),
        col("n").as("bal"))
    KeyedSink.mergeInto(cust, base.unionByName(ins), "k", "op", Seq("bal"))
      .orderBy("k")
  }

  val queries: Map[String, Q] = Map(
    "q64_bloom_dedup" -> (q64BloomDedup _),
    "q69_delete_where" -> (q69DeleteWhere _),
    "q99_merge_into" -> (q99MergeInto _))

  val oracles: Map[String, String] = Map(
    "q64_bloom_dedup" ->
      // the exact-dedup answer the two-tier pipeline must reproduce
      // despite the approximate pre-filter
      """WITH existing AS (
        |  SELECT 'u' || doc_id k FROM documents WHERE doc_id%3=0),
        |incoming AS (
        |  SELECT CASE WHEN doc_id%17=0 THEN NULL
        |              ELSE 'u' || (doc_id - doc_id%2) END k
        |  FROM documents)
        |SELECT DISTINCT k FROM incoming
        |WHERE k IS NOT NULL AND k NOT IN (SELECT k FROM existing)
        |ORDER BY k""".stripMargin,
    "q99_merge_into" ->
      // the same merge as a FULL JOIN + CASE: delete drops, upsert
      // replaces-or-inserts, untouched state rows pass through
      """WITH st AS (SELECT c_custkey k,
        |    CAST(round(c_acctbal * 100) AS BIGINT) bal FROM customer),
        |agg AS (SELECT o_custkey k, cast(count(*) as bigint) n,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) cents
        |  FROM orders GROUP BY 1),
        |ch AS (SELECT k,
        |    CASE WHEN k % 10 = 0 THEN 'delete' ELSE 'upsert' END op,
        |    cents bal FROM agg
        |  UNION ALL
        |  SELECT k + (SELECT max(c_custkey) + 1 FROM customer),
        |    'upsert', n FROM agg WHERE k % 5 = 1)
        |SELECT coalesce(st.k, ch.k) k,
        |  CASE WHEN ch.op = 'upsert' THEN ch.bal ELSE st.bal END bal
        |FROM st FULL JOIN ch ON st.k = ch.k
        |WHERE ch.op IS NULL OR ch.op <> 'delete'
        |ORDER BY 1""".stripMargin,
    "q69_delete_where" ->
      // delete-where keeps rows where the predicate is FALSE OR NULL
      """SELECT doc_id, lang FROM documents
        |WHERE NOT coalesce(
        |  lang = 'zh' OR try_cast(substr(text, 1, 3) AS INTEGER) > 100,
        |  false)
        |ORDER BY doc_id""".stripMargin)
}
