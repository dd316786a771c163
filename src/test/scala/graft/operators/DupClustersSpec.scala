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

  test("reliable checkpoint mode: same labels, same round count") {
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 30L).toDF("id")
    // chain 1..7 (diameter 6 → several rounds) + isolated 30
    val edges = (1L to 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val (localLabels, localRounds) =
      DupClusters.connectedComponentsWithStats(verts, edges, reliable = false)
    val (reliableLabels, reliableRounds) =
      DupClusters.connectedComponentsWithStats(verts, edges, reliable = true)
    assert(localLabels.as[(Long, Long)].collect().toMap ===
      reliableLabels.as[(Long, Long)].collect().toMap)
    // durability mode must not change the algorithm
    assert(reliableRounds === localRounds)
    assert(reliableLabels.as[(Long, Long)].collect().toMap ===
      ((1L to 7L).map(_ -> 1L) :+ (30L -> 30L)).toMap)
    // reliable mode really wrote RDD checkpoints to the checkpoint dir
    val dir = spark.sparkContext.getCheckpointDir
    assert(dir.isDefined)
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(
      new java.net.URI(dir.get).getPath))
    try assert(files.filter(_.getFileName.toString.startsWith("part-")).count() > 0)
    finally files.close()
  }

  test("non-convergence within maxIter fails loudly, never silently") {
    val verts = (1L to 9L).toDF("id")
    val edges = (1L to 8L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      DupClusters.connectedComponents(verts, edges, maxIter = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}
