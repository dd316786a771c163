package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster formation: turn a near-dup PAIR list (MinHash
  * band pairs, SimHash hamming pairs, embedding cosine pairs) into
  * cluster assignments with a canonical representative per cluster —
  * the step that lets a duplicate-heavy corpus keep ONE document per
  * cluster instead of materializing quadratic pairs.
  *
  * Algorithm: iterative min-label propagation (the shuffle-based
  * connected-components formulation): every vertex starts as its own
  * label; each round every vertex takes the min of its own and its
  * neighbors' labels; converged when a round changes nothing. Rounds ≤
  * graph diameter, which for near-dup graphs is tiny (duplicate
  * clusters are dense). Each round is one join + one min-aggregate —
  * both shuffle on the vertex key, no driver-side graph. Lineage is
  * truncated per round (`localCheckpoint`) so the plan does not grow
  * with iterations — the standard iterative-algorithm discipline on
  * Spark (GraphX's CC is the same loop).
  */
object DupClusters {

  /** `edges`: two-column frame (src, dst), undirected semantics (either
    * orientation). `vertices`: one-column frame of ALL vertex ids
    * (isolated vertices become singleton clusters). Returns
    * (v, cluster_rep) where cluster_rep = min vertex id in the
    * component. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 25): DataFrame = {
    val v = vertices.columns.head
    val Seq(s, d) = edges.columns.take(2).toSeq
    // checkpoint the symmetrized edges too: their lineage contains the
    // whole pair-generation pipeline, which must run once, not per round
    val sym = edges.select(col(s).as("a"), col(d).as("b"))
      .union(edges.select(col(d).as("a"), col(s).as("b")))
      .localCheckpoint()
    var labels = vertices.select(col(v).as("v"))
      .withColumn("label", col("v")).localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = sym.join(labels, sym("b") === labels("v"))
        .groupBy(col("a").as("nv")).agg(min("label").as("nlabel"))
      // carry the previous label through the update join so convergence
      // is a filter on the checkpointed frame, not a second join
      val updated = labels.join(nbrMin, labels("v") === nbrMin("nv"), "left")
        .select(col("v"), col("label").as("prev"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .localCheckpoint()
      converged = updated.filter(col("prev") =!= col("label")).limit(1).count() == 0
      labels = updated.select("v", "label")
      i += 1
    }
    // a silent non-converged exit would return INTERMEDIATE labels —
    // under-merged clusters with no signal. Components wider than
    // maxIter hops must fail loudly so the caller raises the bound.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "a component is wider than maxIter hops; raise maxIter")
    labels.select(col("v"), col("label").as("cluster_rep"))
  }

  /** Keep one document per near-dup cluster: the representative itself. */
  def representatives(assignments: DataFrame): DataFrame =
    assignments.filter(col("v") === col("cluster_rep")).select(col("v"))
}
