package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis over document graphs (citation/hyperlink dedup
  * weighting, crawl frontier scoring). PageRank in the exact integer
  * domain: ranks are e6-scaled longs, each round is
  * `r'(v) = 150000 + (850 · Σ_{u→v} (r(u) div outdeg(u))) div 1000`
  * (damping 0.85 as the 850/1000 rational) — floor arithmetic on
  * non-negative longs, so Spark and any other engine agree
  * bit-for-bit, unlike float PageRank whose sums are
  * accumulation-order-dependent.
  *
  * Scale shape per round: one equi-join of edges to ranks (shuffle on
  * the vertex key, the degree frame broadcasts when small), one
  * map-side-combinable sum aggregate on dst, one left join back to the
  * vertex set for dangling/in-degree-0 vertices. The plan grows
  * linearly with `iters`; the bounded unrolled form keeps the whole
  * computation declarative for the oracle gate, and
  * [[pageRankConverged]] is the lineage-truncated fixpoint form for
  * long runs.
  */
object Graph {

  /** `vertices`: one column (vertex id). `edges`: (src, dst). Returns
    * (v, rank_e6) after `iters` rounds from a uniform e6 start.
    * Vertices with no in-edges settle at the 150000 teleport floor;
    * out-degree-0 vertices simply contribute nothing (their mass
    * drains, the standard simplification when the gate's graph has
    * none). */
  def pageRank(vertices: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"pageRank needs at least one round, got $iters")
    val v = vertices.columns.head
    val Seq(s, d) = edges.columns.take(2).toSeq
    val e = edges.select(col(s).as("src"), col(d).as("dst"))
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val verts = vertices.select(col(v).as("v"))
    val init = verts.select(col("v"), lit(1000000L).as("rank_e6"))
    (1 to iters).foldLeft(init) { (ranks, _) =>
      round(e, outdeg, verts, ranks)
    }
  }

  /** One propagation round: `r'(v) = 150000 + (850·Σ contribs) div 1000`
    * over (v, rank_e6) frames — shared by the unrolled and converged
    * forms so they are the same recurrence by construction. */
  private def round(e: DataFrame, outdeg: DataFrame, verts: DataFrame,
                    ranks: DataFrame): DataFrame = {
    val contrib = e
      .join(ranks.withColumnRenamed("v", "src"), Seq("src"))
      .join(outdeg, Seq("src"))
      .select(col("dst"), expr("rank_e6 div deg").as("c"))
      .groupBy("dst").agg(sum("c").as("sum_c"))
    verts.join(contrib.withColumnRenamed("dst", "v"), Seq("v"), "left")
      .select(col("v"),
        expr("150000 + (850 * coalesce(sum_c, CAST(0 AS BIGINT))) div 1000")
          .as("rank_e6"))
  }

  /** PageRank run to the exact integer FIXPOINT — the production form
    * of [[pageRank]] for long runs, where the unrolled plan's analysis
    * time would dominate past a few dozen rounds. Same recurrence
    * (shared [[round]]), but lineage truncates per round and rounds
    * stop when NO vertex's rank changed, detected with a
    * LongAccumulator folded into the round's own materialization (no
    * extra count job) — the [[Ann.lloydConverged]] /
    * [[DupClusters.connectedComponentsWithStats]] contract, including
    * the `reliable` checkpoint mode for real clusters and the loud
    * failure on non-convergence (intermediate ranks carry no signal
    * that they are intermediate).
    *
    * The 850/1000 damping contracts rank deltas geometrically, so the
    * e6-scaled integer recurrence reaches delta = 0 in
    * ~ln(1e6)/ln(1000/850) ≈ 85 rounds worst case — hence the default
    * budget of 100. Returns ((v, rank_e6), rounds). */
  def pageRankConverged(vertices: DataFrame, edges: DataFrame,
                        maxIter: Int = 100,
                        reliable: Boolean = false): (DataFrame, Int) = {
    val spark = vertices.sparkSession
    val sc = spark.sparkContext
    if (reliable && sc.getCheckpointDir.isEmpty) {
      // a driver-local temp dir is only a valid reliable-checkpoint
      // target when the executors share the driver's filesystem
      require(sc.isLocal,
        "pageRankConverged(reliable=true) on a non-local master needs " +
          "sc.setCheckpointDir on shared storage; a driver-local temp " +
          "dir is not visible to executors")
      sc.setCheckpointDir(java.nio.file.Files
        .createTempDirectory("graft_pr_ckpt").toString)
    }
    def truncate(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()

    val v = vertices.columns.head
    val Seq(s, d) = edges.columns.take(2).toSeq
    // edges/degrees/vertices re-read every round — materialize once
    val e = truncate(edges.select(col(s).as("src"), col(d).as("dst")))
    val outdeg = truncate(e.groupBy("src").agg(count(lit(1)).as("deg")))
    val verts = truncate(vertices.select(col(v).as("v")))

    val acc = sc.longAccumulator("pagerank_moved")
    val bump = udf { (moved: Boolean) =>
      if (moved) acc.add(1L); moved
    }.asNondeterministic()

    var ranks = truncate(verts.select(col("v"), lit(1000000L).as("rank_e6")))
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIter) {
      acc.reset()
      val next = truncate(
        round(e, outdeg, verts, ranks)
          .join(ranks.withColumnRenamed("rank_e6", "prev_e6"), Seq("v"))
          .select(col("v"), col("rank_e6"),
            bump(col("rank_e6") =!= col("prev_e6")).as("_moved")))
      converged = acc.value == 0
      ranks = next.select("v", "rank_e6")
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"pageRankConverged did not converge in $maxIter rounds; raise maxIter")
    (ranks, rounds)
  }

  /** Bounded-depth BFS levels from a single source: after `rounds`
    * relaxations, (v, lvl) holds the shortest hop count for every
    * vertex within `rounds` hops (unreached vertices are absent).
    * Each round is one equi-join of the current level frame to the
    * edge list plus a min-aggregate — the iterative-relaxation shape
    * whose converged form would follow the [[pageRankConverged]]
    * contract; the bounded unroll keeps the whole computation
    * declarative for the oracle gate (which answers with a recursive
    * CTE — the SQL the engine must match). */
  def bfsLevels(edges: DataFrame, source: Long, rounds: Int): DataFrame = {
    require(rounds >= 1, s"bfsLevels needs at least one round, got $rounds")
    val Seq(s, d) = edges.columns.take(2).toSeq
    val e = edges.select(col(s).as("src"), col(d).as("dst"))
    val init = e.sparkSession.range(1)
      .select(lit(source).as("v"), lit(0L).as("lvl"))
    (1 to rounds).foldLeft(init) { (levels, _) =>
      val next = levels.join(e, levels("v") === e("src"))
        .select(col("dst").as("v"), (col("lvl") + 1).as("lvl"))
      levels.unionByName(next).groupBy("v").agg(min("lvl").as("lvl"))
    }
  }

  /** Per-vertex triangle counts via degree orientation (the
    * compact-forward / MapReduce-triangles algorithm). Edges are
    * canonicalized undirected (self-loops dropped, duplicates merged),
    * then oriented from the lower to the higher (degree, id) rank;
    * wedges form only at a vertex's oriented OUT-neighbors, whose count
    * is O(√m) per vertex under this orientation regardless of raw
    * degree — the property that keeps the wedge self-join linear-ish in
    * edge count at 100 TB graph scale instead of Σ deg² on hubs. Each
    * triangle materializes exactly once (its vertices appear in rank
    * order), then explodes to the three members for per-vertex counts.
    *
    * The orientation rank is the two-column struct `(deg, id)` compared
    * lexicographically — total and collision-free for ANY id domain
    * (no packed-long arithmetic, so no silent overflow on high-degree
    * hubs; a 10^7-degree hub at 100 TB graph scale ranks correctly).
    * Returns (v, n_triangles) for vertices on ≥ 1 triangle.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val Seq(s, d) = edges.columns.take(2).toSeq
    val und = edges
      .select(least(col(s), col(d)).as("a"), greatest(col(s), col(d)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val rk = deg.select(col("v"), struct(col("deg"), col("v")).as("rnk"))
    val oriented = und
      .join(rk.select(col("v").as("a"), col("rnk").as("rka")), Seq("a"))
      .join(rk.select(col("v").as("b"), col("rnk").as("rkb")), Seq("b"))
      .select(
        when(col("rka") < col("rkb"), col("a")).otherwise(col("b")).as("src"),
        when(col("rka") < col("rkb"), col("b")).otherwise(col("a")).as("dst"),
        when(col("rka") < col("rkb"), col("rkb")).otherwise(col("rka"))
          .as("dst_rnk"))
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst_rnk") < col("e2.dst_rnk"))
      .select(col("e1.src").as("u"), col("e1.dst").as("x"), col("e2.dst").as("y"))
    val tris = wedges.join(oriented.select(col("src").as("x"), col("dst").as("y")),
      Seq("x", "y"), "left_semi")
    tris.select(explode(array(col("u"), col("x"), col("y"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))
  }
}
