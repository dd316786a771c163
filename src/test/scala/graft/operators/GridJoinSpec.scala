package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Grid-blocked neighbor join: boundary inclusion, cross-cell pairs,
  * exactly-once pair emission. */
class GridJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("pairs at exactly r match; r+1 does not; cross-cell pairs found once") {
    val pts = Seq(
      (1L, 0L, 0L), (2L, 10L, 0L),      // distance exactly r
      (3L, 21L, 0L),                    // 11 from id 2 -> out
      (4L, 9L, 9L),                     // near id 1 and 2, crosses cells
      (5L, 1000L, 1000L))               // isolated
      .toDF("id", "x", "y")
    val got = GridJoin.neighborPairs(pts, "id", "x", "y", r = 10L)
      .select("id_a", "id_b").orderBy("id_a", "id_b").collect()
    assert(got.toSeq === Seq(Row(1L, 2L), Row(1L, 4L), Row(2L, 4L)))
  }

  test("a dense cell emits each unordered pair exactly once") {
    val pts = (0L until 20L).map(i => (i, i % 5, i / 5)).toDF("id", "x", "y")
    val got = GridJoin.neighborPairs(pts, "id", "x", "y", r = 10L)
    // all 20 points within one 10x10 cell area: C(20,2) pairs, no dups
    assert(got.count() === 190L)
    assert(got.select("id_a", "id_b").distinct().count() === 190L)
  }

  test("empty input returns an empty frame") {
    val pts = Seq.empty[(Long, Long, Long)].toDF("id", "x", "y")
    assert(GridJoin.neighborPairs(pts, "id", "x", "y", 10L).count() === 0L)
  }
}
