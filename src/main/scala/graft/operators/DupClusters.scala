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
  * truncated per round so the plan does not grow with iterations — the
  * standard iterative-algorithm discipline on Spark (GraphX's CC is
  * the same loop).
  *
  * Convergence is detected with a LongAccumulator folded into the
  * round's own materialization job — no separate per-round `count()`
  * pass over the labels. Accumulators can only over-count (task
  * retries), never under-count a change, so `value == 0` is a safe
  * convergence certificate.
  *
  * Durability: `reliable = false` truncates with `localCheckpoint()`
  * (executor-local blocks — fastest, fine for local mode and short
  * jobs). `reliable = true` uses reliable `checkpoint()` to the
  * session's checkpoint directory, which survives executor loss — the
  * right mode for a long CC run on a 1000-executor cluster, where a
  * single lost executor would otherwise kill the whole iteration
  * history.
  */
object DupClusters {

  /** `edges`: two-column frame (src, dst), undirected semantics (either
    * orientation). `vertices`: one-column frame of ALL vertex ids
    * (isolated vertices become singleton clusters). Returns
    * (v, cluster_rep) where cluster_rep = min vertex id in the
    * component. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 25,
                          reliable: Boolean = false): DataFrame =
    connectedComponentsWithStats(vertices, edges, maxIter, reliable)._1

  /** As [[connectedComponents]], also returning the number of
    * propagation rounds run — the observable that lets tests assert
    * the reliable mode changes durability, not the algorithm. */
  def connectedComponentsWithStats(vertices: DataFrame, edges: DataFrame,
                                   maxIter: Int = 25,
                                   reliable: Boolean = false): (DataFrame, Int) = {
    val spark = vertices.sparkSession
    val sc = spark.sparkContext
    if (reliable && sc.getCheckpointDir.isEmpty) {
      // a driver-local temp dir is only a valid reliable-checkpoint
      // target when the executors share the driver's filesystem; on a
      // real cluster the caller must point at shared storage (HDFS/S3)
      require(sc.isLocal,
        "connectedComponents(reliable=true) on a non-local master " +
          "needs sc.setCheckpointDir on shared storage; a driver-local " +
          "temp dir is not visible to executors")
      sc.setCheckpointDir(java.nio.file.Files
        .createTempDirectory("graft_cc_ckpt").toString)
    }
    def truncate(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()

    val v = vertices.columns.head
    val Seq(s, d) = edges.columns.take(2).toSeq
    // checkpoint the symmetrized edges too: their lineage contains the
    // whole pair-generation pipeline, which must run once, not per round
    val sym = truncate(edges.select(col(s).as("a"), col(d).as("b"))
      .union(edges.select(col(d).as("a"), col(s).as("b"))))
    var labels = truncate(vertices.select(col(v).as("v"))
      .withColumn("label", col("v")))

    // the change counter rides along inside the round's checkpoint
    // materialization; nondeterministic so the optimizer cannot
    // eliminate the call even though _changed is dropped afterwards
    val acc = sc.longAccumulator("dup_clusters_changed")
    val bump = udf { (changed: Boolean) =>
      if (changed) acc.add(1L); changed
    }.asNondeterministic()

    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      acc.reset()
      val updated = truncate(
        roundUpdate(sym, labels)
          .select(col("v"), col("label"),
            bump(col("prev") =!= col("label")).as("_changed")))
      converged = acc.value == 0
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
    (labels.select(col("v"), col("label").as("cluster_rep")), i)
  }

  /** One propagation round: neighbor-min aggregate joined back to the
    * labels, carrying the previous label through so convergence is a
    * column comparison, not a second join. Exposed within the package
    * so PlanSpec can pin the per-round physical plan (join + hash
    * aggregate, no window, no cartesian). */
  private[graft] def roundUpdate(sym: DataFrame, labels: DataFrame): DataFrame = {
    val nbrMin = sym.join(labels, sym("b") === labels("v"))
      .groupBy(col("a").as("nv")).agg(min("label").as("nlabel"))
    labels.join(nbrMin, labels("v") === nbrMin("nv"), "left")
      .select(col("v"), col("label").as("prev"),
        least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
  }

  /** Keep one document per near-dup cluster: the representative itself. */
  def representatives(assignments: DataFrame): DataFrame =
    assignments.filter(col("v") === col("cluster_rep")).select(col("v"))
}
