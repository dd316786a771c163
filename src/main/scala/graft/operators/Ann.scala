package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.VectorExpressions.{dot_long, quantize_e6}

/** IVF-style approximate nearest neighbour search — the coarse-quantizer
  * companion to the sign-bit LSH path (queries/Vectors v34/v35). The
  * corpus is assigned to the nearest of k centroids once (the "index");
  * a query probes only the `nProbe` closest cells and ranks candidates
  * exactly. All similarity math runs on the exact integer-quantized
  * vectors (graft.plans.VectorExpressions), and centroid construction is
  * fully deterministic (seeded by vec_id), so index builds reproduce.
  *
  * At 100 TB: the index build is one aggregation shuffled on the cell id;
  * the query side is an equi-join on probed cell ids — candidate
  * generation never goes O(corpus × queries).
  */
object Ann {

  /** Deterministic coarse centroids: the k seed vectors are the lowest
    * ids; one Lloyd refinement step averages their assigned vectors.
    * (A production index would run a few more iterations — the plumbing
    * is identical.) Returns (centroid_id, cvec: array<long>).
    *
    * The refinement is `dims` primitive sum-aggregates over the array
    * elements rather than posexplode + a (cell, position) shuffle — no
    * row explosion, fully map-side combinable, one k-row result. At a
    * 100 TB corpus the explode variant shuffles dims× the input; this
    * shuffles k×dims longs.
    *
    * `dims` defaults to the first row's vector length (one tiny lookup
    * job); rows whose length differs fail loudly via `assert_true`
    * rather than silently producing truncated/null centroids. */
  def buildCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
                     k: Int, dims: Int = -1): DataFrame = {
    val d =
      if (dims > 0) dims
      else embeddings.select(size(col(vecCol))).head().getInt(0)
    val q = embeddings.select(col(idCol).as("vid"),
      when(assert_true(size(col(vecCol)) === d,
          lit(s"buildCentroids: expected $d-dim vectors")).isNull,
        quantize_e6(col(vecCol))).as("v"))
    val seeds = q.orderBy("vid").limit(k)
      .withColumn("centroid_id", row_number().over(Window.orderBy("vid")) - 1)
      .select(col("centroid_id"), col("v").as("cvec"))
    val assigned = assign(q, seeds)
    // one refinement: element-wise mean (trunc toward zero, exact
    // integer sums) of assigned vectors per cell
    val sums = (1 to d).map(i => sum(element_at(col("v"), i)).as(s"s$i"))
    assigned.join(q, Seq("vid"))
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(col("centroid_id"),
        array((1 to d).map(i =>
          (col(s"s$i") / col("n")).cast(LongType)): _*).as("cvec"))
  }

  /** Assign each vector to its nearest centroid (exact integer dot on
    * normalized-ish data ≙ cosine ranking; ties → lowest cell id).
    * Centroids broadcast; the argmax is a hash aggregate
    * (min of struct(-dot, cell)) rather than a window row_number — no
    * per-partition sort, one map-side-combinable shuffle, which is the
    * shape that survives a 100 TB corpus. */
  private def assign(q: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = q.crossJoin(broadcast(centroids))
      .select(col("vid"), col("centroid_id"), dot_long(col("v"), col("cvec")).as("d"))
    scored.groupBy("vid")
      .agg(min(struct((-col("d")).as("nd"), col("centroid_id").as("cid"))).as("m"))
      .select(col("vid"), col("m.cid").as("centroid_id"))
  }

  /** The IVF index: every corpus vector tagged with its cell. */
  def buildIndex(embeddings: DataFrame, idCol: String, vecCol: String,
                 k: Int): DataFrame =
    buildIndex(embeddings, idCol, vecCol,
      buildCentroids(embeddings, idCol, vecCol, k))

  /** Index build against precomputed centroids — use this when the
    * caller also needs the centroid frame (e.g. for ivfSearch), so the
    * whole centroid pipeline isn't embedded twice in the plan. */
  def buildIndex(embeddings: DataFrame, idCol: String, vecCol: String,
                 centroids: DataFrame): DataFrame = {
    val q = embeddings.select(col(idCol).as("vid"), quantize_e6(col(vecCol)).as("v"))
    assign(q, centroids).join(q, Seq("vid"))
      .select(col("vid"), col("centroid_id"), col("v"))
  }

  /** Query: probe the `nProbe` nearest cells per query vector, rank the
    * candidates in those cells by exact dot product, keep top `topK`.
    * Returns (query_id, rank, neighbor_id, dot). */
  def ivfSearch(index: DataFrame, centroids: DataFrame,
                queries: DataFrame, idCol: String, vecCol: String,
                nProbe: Int = 2, topK: Int = 5): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), quantize_e6(col(vecCol)).as("qv"))
    // nearest cells per query
    val cellScores = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("centroid_id"),
        dot_long(col("qv"), col("cvec")).as("cd"))
    val wc = Window.partitionBy("query_id").orderBy(col("cd").desc, col("centroid_id").asc)
    val probed = cellScores.withColumn("rn", row_number().over(wc))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("centroid_id"))
    // candidates via equi-join on the probed cell ids
    val cands = probed.join(index, Seq("centroid_id"))
      .filter(col("query_id") =!= col("vid"))
      .select(col("query_id"), col("vid").as("neighbor_id"),
        dot_long(col("qv"), col("v")).as("dot"))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dot"))
  }
}
