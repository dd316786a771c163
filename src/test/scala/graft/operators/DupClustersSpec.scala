package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Connected-components label propagation: multi-hop chains (needs
  * several rounds), isolated singletons, representative selection. */
class DupClustersSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("chains, cliques, and singletons resolve to min-id components") {
    // component A: chain 1-2-3-4-5 (diameter 4); component B: clique
    // 10,11,12; C: isolated 20
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 20L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (5L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("src", "dst")
    val got = DupClusters.connectedComponents(verts, edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
    val reps = DupClusters.representatives(
      DupClusters.connectedComponents(verts, edges))
      .as[Long].collect().sorted.toSeq
    assert(reps === Seq(1L, 10L, 20L))
  }
}
