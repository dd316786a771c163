package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Gaps-and-islands semantics: overlap/touch fusion, strict-gap
  * splits, per-key independence. */
class IntervalsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("overlapping and touching intervals fuse; strict gaps split") {
    val iv = Seq(
      (1L, 1L, 0L, 10L),   // island 1
      (1L, 2L, 5L, 20L),   // overlaps -> fuse
      (1L, 3L, 20L, 25L),  // touches (start == running max) -> fuse
      (1L, 4L, 30L, 40L),  // strict gap -> new island
      (2L, 5L, 0L, 5L))    // other key unaffected
      .toDF("k", "id", "s", "e")
    val isl = Intervals.islands(iv, Seq("k"), "s", "e", Seq("id"))
      .select("k", "island", "island_start", "island_end", "n_members")
      .orderBy("k", "island").collect()
    assert(isl.toSeq === Seq(
      Row(1L, 1L, 0L, 25L, 3L),
      Row(1L, 2L, 30L, 40L, 1L),
      Row(2L, 1L, 0L, 5L, 1L)))
  }

  test("a contained interval does not reopen a closed island") {
    // [0,100] swallows [10,20]; [50,60] is also inside — still 1 island
    val iv = Seq((1L, 1L, 0L, 100L), (1L, 2L, 10L, 20L), (1L, 3L, 50L, 60L))
      .toDF("k", "id", "s", "e")
    val cov = Intervals.coverage(iv, Seq("k"), "s", "e", Seq("id"))
      .select("k", "n_islands", "covered").collect()
    assert(cov.toSeq === Seq(Row(1L, 1L, 100L)))
  }

  test("coverage sums island lengths, not raw interval lengths") {
    val iv = Seq((1L, 1L, 0L, 10L), (1L, 2L, 5L, 15L), (1L, 3L, 100L, 110L))
      .toDF("k", "id", "s", "e")
    val cov = Intervals.coverage(iv, Seq("k"), "s", "e", Seq("id"))
      .select("n_islands", "covered").collect()
    assert(cov.toSeq === Seq(Row(2L, 25L))) // 15 + 10, not 30
  }
}
