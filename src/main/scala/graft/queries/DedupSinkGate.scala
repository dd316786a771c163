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
    * anti-join on the suspect side only. */
  def q64BloomDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val existing = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(concat(lit("u"), col("doc_id")).as("k"))
    val incoming = docs.select(
      when(pmod(col("doc_id"), lit(17)) === 0, lit(null).cast(StringType))
        .otherwise(concat(lit("u"), col("doc_id") - pmod(col("doc_id"), lit(2))))
        .as("k"))
    val bloom = KeyedSink.buildBloom(existing, "k")
    KeyedSink.dedupTwoTier(existing, incoming, "k", bloom).orderBy("k")
  }

  val queries: Map[String, Q] = Map("q64_bloom_dedup" -> (q64BloomDedup _))

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
        |ORDER BY k""".stripMargin)
}
