package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.plans.VectorExpressions.dot_long

/** SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
  * the embedding space with the deterministic coarse quantizer
  * ([[Ann.buildCentroids]]), then compare pairs ONLY within a cluster
  * and drop the higher-id member of every pair whose cosine clears the
  * threshold. Keeps exactly one representative (the lowest id) per
  * near-duplicate neighborhood that a cluster contains.
  *
  * This is the embedding analogue of the MinHash-band (t34) and
  * dHash-band (t48) dedup decisions: candidate generation is an
  * equi-join on the cluster id, so total pair cost is Σ|cell|² instead
  * of |corpus|² — at 100 TB, k scales with the corpus to keep cells
  * bounded (SemDeDup's own recipe), and a monoculture cell is ordinary
  * join skew (AQE-splittable). Cosine runs on exact integer dots/norms
  * (bit-identical across engines); ties and drop choices are
  * deterministic by id.
  */
object SemDedup {

  /** Tag every vector with its cluster and a `kept` verdict:
    * (vec_id, centroid_id, kept). `cosE6` is the near-dup threshold in
    * millionths (e.g. 300000 = cosine 0.30).
    *
    * The assignment frame feeds three consumers (both self-join sides
    * and the final verdict join), so it is materialized once with
    * `localCheckpoint` — the t45 lesson: without it the whole
    * centroid+assign subtree re-executes per consumer (measured 3×
    * plan inlining). Fine for a one-shot dedup; a long-lived pipeline
    * on a real cluster would persist the index to storage instead
    * (same durability note as DupClusters' reliable mode). */
  def dedup(embeddings: DataFrame, idCol: String, vecCol: String,
            k: Int, cosE6: Long): DataFrame = {
    val centroids = Ann.buildCentroids(embeddings, idCol, vecCol, k)
    val index = Ann.buildIndex(embeddings, idCol, vecCol, centroids)
      .withColumn("n2", dot_long(col("v"), col("v")))
      .localCheckpoint()
    val pairs = index.as("a").join(index.as("b"),
        col("a.centroid_id") === col("b.centroid_id") &&
          col("a.vid") < col("b.vid"))
      .select(col("b.vid").as("vid"),
        round(dot_long(col("a.v"), col("b.v")) * 1000000.0 /
              (sqrt(col("a.n2").cast(DoubleType)) *
               sqrt(col("b.n2").cast(DoubleType))))
          .cast(LongType).as("cos_e6"))
    val dropped = pairs.filter(col("cos_e6") >= cosE6)
      .select(col("vid")).distinct().withColumn("__dropped", lit(true))
    index.join(dropped, Seq("vid"), "left")
      .select(col("vid").as(idCol), col("centroid_id"),
        col("__dropped").isNull.as("kept"))
  }
}
