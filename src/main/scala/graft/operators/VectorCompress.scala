package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.VectorExpressions.quantize_e6

/** Scalar (int8) quantization of an embedding corpus — the storage
  * compression that makes billion-vector indexes fit: each dimension is
  * linearly mapped to 0..255 against its global [min, max]. The
  * asymmetric-search convention matches [[Pq]]: codes are compared via
  * reconstruction, so the operator also reports exact reconstruction
  * error.
  *
  * Scale shape: the per-dimension stats are ONE aggregate of 2·dims
  * primitive min/max columns (map-side combinable, no row explosion —
  * same discipline as Ann's centroid means); the stats row broadcasts;
  * encode/decode/error are scan-side array lambdas. Nothing shuffles
  * the corpus itself.
  *
  * Integer-exact end to end: inputs are the e6-quantized longs, code =
  * floor((x−mn)·255 / (mx−mn)), recon = mn + floor(code·(mx−mn) / 255)
  * — all intermediate products < 2^53, so the double floor-division is
  * exact and engine-portable.
  */
object VectorCompress {

  /** The corpus with each vector replaced by its int8-code
    * RECONSTRUCTION (id, recon: array<long> in the e6 domain) — the
    * compressed-domain frame a two-stage retrieval scores in its first
    * pass (memory-bound at 100 TB: 1 byte/dim resident instead of 4). */
  def reconVectors(embeddings: DataFrame, idCol: String, vecCol: String,
                   dims: Int): DataFrame =
    encoded(embeddings, idCol, vecCol, dims)
      .select(col("vid").as(idCol), col("recon"))

  /** Per-vector int8 encode + reconstruction audit:
    * (id, sum_code, max_err, sum_err). `dims` must match the vector
    * width. */
  /** (vid, v, codes, recon): the corpus quantized, encoded against the
    * broadcast per-dimension stats row, and decoded back. */
  private def encoded(embeddings: DataFrame, idCol: String, vecCol: String,
                      dims: Int): DataFrame = {
    val q = embeddings.select(col(idCol).as("vid"),
      quantize_e6(col(vecCol)).as("v"))
    val statAggs =
      (1 to dims).map(i => min(element_at(col("v"), i)).as(s"mn$i")) ++
      (1 to dims).map(i => max(element_at(col("v"), i)).as(s"mx$i"))
    val stats = q.agg(statAggs.head, statAggs.tail: _*)
      .select(
        array((1 to dims).map(i => col(s"mn$i")): _*).as("mns"),
        array((1 to dims).map(i => col(s"mx$i")): _*).as("mxs"))
    q.crossJoin(broadcast(stats))
      // Spark SQL bracket indexing is 0-based, matching transform's i
      .withColumn("codes", expr(
        """transform(v, (x, i) ->
          |  CASE WHEN mxs[i] > mns[i]
          |       THEN CAST(floor(CAST((x - mns[i]) * 255 AS DOUBLE)
          |                       / (mxs[i] - mns[i])) AS BIGINT)
          |       ELSE CAST(0 AS BIGINT) END)""".stripMargin))
      .withColumn("recon", expr(
        """transform(codes, (c, i) ->
          |  mns[i] + CASE WHEN mxs[i] > mns[i]
          |                THEN CAST(floor(CAST(c * (mxs[i] - mns[i]) AS DOUBLE)
          |                                / 255) AS BIGINT)
          |                ELSE CAST(0 AS BIGINT) END)""".stripMargin))
  }

  def int8Audit(embeddings: DataFrame, idCol: String, vecCol: String,
                dims: Int): DataFrame = {
    encoded(embeddings, idCol, vecCol, dims)
      .withColumn("errs", expr("zip_with(v, recon, (x, r) -> abs(x - r))"))
      .select(col("vid").as(idCol),
        expr("aggregate(codes, CAST(0 AS BIGINT), (a, c) -> a + c)").as("sum_code"),
        expr("array_max(errs)").as("max_err"),
        expr("aggregate(errs, CAST(0 AS BIGINT), (a, e) -> a + e)").as("sum_err"))
  }
}
