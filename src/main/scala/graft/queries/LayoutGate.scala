package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.operators.Layout

/** Physical-layout and data-validation gates: the shuffle-free
  * bucketed star join (q107) and the order/partition-independent table
  * fingerprint (q108). q98 (Z-order clustering) covers the
  * range-pruning half of the write-side layout story; q107 covers the
  * co-location half, and q108 is the anti-entropy check a pipeline
  * runs after any swap/restore (the audited companion to the
  * reference's blind full-rebuild swap,
  * dags/search_engine/sql_search_full_rebuild_dag.py).
  */
object LayoutGate {
  type Q = (SparkSession, String) => DataFrame

  private def cents(c: Column): Column = round(c * 100).cast(LongType)

  /** q107: orders and customer both bucketed 16 ways on the customer
    * key, then aggregated and joined — the bucketed layout satisfies
    * both the aggregation's and the join's required distribution, so
    * the executed plan has ZERO Exchange nodes (PlanSpec-pinned).
    * Result equals the plain join the oracle runs. */
  def q107BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    Layout.bucketedWrite(Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          cents(col("o_totalprice")).as("price_c100")),
      "graft_q107_orders_b", "o_custkey", nBuckets = 16)
    Layout.bucketedWrite(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey")),
      "graft_q107_customer_b", "c_custkey", nBuckets = 16)
    val o = s.table("graft_q107_orders_b")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum("price_c100").as("total_c100"))
    val c = s.table("graft_q107_customer_b")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("n_orders"), col("total_c100"))
      .orderBy("c_custkey")
  }

  /** q108: keyed table fingerprint — per hash-bucket row count, a
    * polynomial checksum, and key bounds. Commutative sums only, so
    * the result is independent of row order, partitioning, and engine;
    * two sides of a replication/swap compare 16 rows instead of the
    * table. */
  def q108TableFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("price_c100"))
      .withColumn("bucket", col("o_orderkey") % 16)
      .withColumn("h",
        (col("o_orderkey") * 1000003L + col("o_custkey") * 101L
          + col("price_c100")) % 2147483647L)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), sum("h").as("checksum"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
      .orderBy("bucket")

  val queries: Map[String, Q] = Map(
    "q107_bucketed_join" -> (q107BucketedJoin _),
    "q108_table_fingerprint" -> (q108TableFingerprint _))

  val oracles: Map[String, String] = Map(
    "q107_bucketed_join" ->
      """WITH o AS (SELECT o_custkey, cast(count(*) as bigint) n_orders,
        |    cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)
        |      total_c100
        |  FROM orders GROUP BY 1)
        |SELECT c_custkey, c_name, n_orders, total_c100
        |FROM customer JOIN o ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q108_table_fingerprint" ->
      """WITH t AS (SELECT o_orderkey, o_custkey,
        |    cast(round(o_totalprice * 100) as bigint) price_c100
        |  FROM orders)
        |SELECT o_orderkey % 16 bucket, cast(count(*) as bigint) n_rows,
        |  cast(sum((o_orderkey * 1000003 + o_custkey * 101 + price_c100)
        |    % 2147483647) as bigint) checksum,
        |  min(o_orderkey) min_key, max(o_orderkey) max_key
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin)
}
