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
  * linearly with `iters` — for long runs truncate lineage per round
  * exactly as [[Ann.lloydConverged]]/[[DupClusters]] do; the bounded
  * unrolled form keeps the whole computation declarative for the
  * oracle gate.
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
  }
}
