package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** SimHash document fingerprinting + hamming near-dup pairs — the third
  * dedup family (exact / MinHash-LSH / SimHash) of the training-data
  * pipeline. 32-bit signatures from token md5s: bit b of the signature
  * is the sign of Σ_tokens (±1 by bit b of the token hash). Everything
  * is integer arithmetic → exact oracle parity.
  *
  * Scale path: the signature is one hash-aggregate per document; pair
  * generation at 100 TB would band the signature (e.g. 4×8-bit keys)
  * into equi-join buckets exactly like t28 — the bounded all-pairs here
  * (doc_id < 100) exists to oracle-check the hamming math.
  */
object SimHash {
  type Q = (SparkSession, String) => DataFrame

  private val Bits = 32

  /** Per-document SimHash in ONE compiled pass: token → 32-bit hash
    * (first 8 hex chars of its md5), per-bit ±1 vote, sign → bit. The
    * per-bit sums need no cross-row state, so the explode + 32
    * sum-aggregates formulation spends a shuffle stage on work a
    * projection can do — this is scan-parallel (zero shuffles) and the
    * integer math is bit-identical to the DuckDB oracle. */
  private val simhashUdf = udf((words: Seq[String]) =>
    if (words == null) None
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val sums = new Array[Int](Bits)
      words.foreach { w =>
        val dig = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        md.reset()
        // first 8 hex chars = first 4 digest bytes, big-endian unsigned
        val h = ((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) |
          ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)
        var b = 0
        while (b < Bits) {
          sums(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      var sig = 0L
      var b = 0
      while (b < Bits) { if (sums(b) > 0) sig |= (1L << b); b += 1 }
      Some(sig)
    })

  def signatures(s: SparkSession, dir: String): DataFrame =
    // spread first: CPU-heavy per-row pass, one unsplittable input file
    // would serialize it onto one core (Tables.spread doc)
    Tables.spread(Tables.documents(s, dir))
      // cheap equivalent of isNotNull(udf(...)): the udf is null iff the
      // text is (a post-projection null filter would be pushed below the
      // projection and evaluate the udf twice per row)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), simhashUdf(split(col("text"), " ")).as("simhash"))

  /** t32: per-document SimHash signature. */
  def t32SimhashSigs(s: SparkSession, dir: String): DataFrame =
    signatures(s, dir).orderBy("doc_id")

  /** t33: near-dup pairs by hamming distance ≤ 10 among doc_id < 100
    * (bit_count(xor) — built-in in both engines). */
  def t33SimhashPairs(s: SparkSession, dir: String): DataFrame = {
    val sig = signatures(s, dir).filter(col("doc_id") < 100)
    sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast(IntegerType)
          .as("hamming"))
      .filter(col("hamming") <= 10)
      .orderBy("doc_a", "doc_b")
  }

  /** t39: near-dup CLUSTER formation — the t33 hamming pair graph fed
    * through iterative min-label connected components; every doc_id<100
    * vertex gets its component's min id as cluster_rep (isolated docs
    * are singleton clusters). The oracle recomputes components with a
    * recursive CTE — a completely different algorithm — so the hash
    * match certifies the label-propagation loop converges to the true
    * components. */
  def t39DupClusters(s: SparkSession, dir: String): DataFrame = {
    val verts = Tables.documents(s, dir)
      .filter(col("doc_id") < 100).select(col("doc_id"))
    val edges = t33SimhashPairs(s, dir).select(col("doc_a"), col("doc_b"))
    graft.operators.DupClusters.connectedComponents(verts, edges)
      .select(col("v").as("doc_id"), col("cluster_rep"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "t32_simhash_sigs" -> (t32SimhashSigs _),
    "t33_simhash_pairs" -> (t33SimhashPairs _),
    "t39_dup_clusters" -> (t39DupClusters _))

  private val sigSql =
    {
      val sums = (0 until Bits).map(b =>
        s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b").mkString(",\n ")
      val bits = (0 until Bits).map(b =>
        s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
      s"""ex AS (SELECT doc_id,
         |  ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 8))::BIGINT h
         | FROM documents),
         |sums AS (SELECT doc_id, $sums FROM ex GROUP BY doc_id),
         |sig AS (SELECT doc_id, cast($bits as bigint) simhash FROM sums)""".stripMargin
    }

  val oracles: Map[String, String] = Map(
    "t32_simhash_sigs" ->
      s"""WITH $sigSql
         |SELECT doc_id, simhash FROM sig ORDER BY doc_id""".stripMargin,
    "t33_simhash_pairs" ->
      s"""WITH $sigSql
         |SELECT a.doc_id doc_a, b.doc_id doc_b,
         | cast(bit_count(xor(a.simhash, b.simhash)) as int) hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE a.doc_id < 100 AND b.doc_id < 100
         |  AND bit_count(xor(a.simhash, b.simhash)) <= 10
         |ORDER BY doc_a, doc_b""".stripMargin,
    "t39_dup_clusters" ->
      // components via recursive reachability closure + min label — an
      // independent algorithm from the engine's label propagation
      s"""WITH RECURSIVE $sigSql,
         |e0 AS (
         | SELECT a.doc_id a, b.doc_id b
         | FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         | WHERE a.doc_id < 100 AND b.doc_id < 100
         |   AND bit_count(xor(a.simhash, b.simhash)) <= 10),
         |edges AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
         |r(v, l) AS (
         | SELECT doc_id, doc_id FROM documents WHERE doc_id < 100
         | UNION
         | SELECT e.b, r.l FROM r JOIN edges e ON e.a = r.v)
         |SELECT v AS doc_id, min(l) AS cluster_rep
         |FROM r GROUP BY v ORDER BY doc_id""".stripMargin)
}
