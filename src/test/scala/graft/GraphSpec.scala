package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** PageRank invariants on hand-analyzable graphs. */
class GraphSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("ring graph: perfect symmetry gives one identical rank everywhere") {
    val n = 40L
    val v = (0L until n).toDF("v")
    val e = (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val ranks = Graph.pageRank(v, e, iters = 4)
    assert(ranks.select("rank_e6").distinct().count() == 1)
    assert(ranks.count() == n)
  }

  test("star graph: the hub outranks the leaves, leaves sit at the teleport floor") {
    // leaves 1..9 each link only to hub 0; hub links to leaf 1
    val v = (0L to 9L).toDF("v")
    val e = ((1L to 9L).map(i => (i, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(v, e, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > r(1L), "hub must outrank the linked leaf")
    assert((2L to 9L).forall(i => r(i) == 150000L),
      "unlinked leaves must sit at the teleport floor")
  }

  test("rank mass stays bounded (floor division only leaks downward)") {
    val n = 100L
    val v = (0L until n).toDF("v")
    val e = (0L until n).flatMap(i => Seq((i, (i * 2 + 1) % n), (i, (i * 3 + 7) % n)))
      .toDF("src", "dst")
    val total = Graph.pageRank(v, e, iters = 3)
      .agg(org.apache.spark.sql.functions.sum("rank_e6")).collect()(0).getLong(0)
    assert(total <= n * 1000000L, "rank mass grew")
    assert(total >= n * 150000L, "rank mass fell below the teleport floor")
  }
}
