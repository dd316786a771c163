package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Resample

/** Semantics of [[Resample.gapFill]] the q96 oracle hash doesn't state
  * directly: grid completeness, forward-fill provenance, multi-column
  * fill, and the step guard.
  */
class ResampleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("gap days carry the LAST prior observation; observed days keep their own") {
    val obs = Seq((1L, 10L, 100L), (1L, 13L, 130L), (1L, 14L, 140L),
                  (2L, 5L, 50L)).toDF("k", "t", "v")
    val out = Resample.gapFill(obs, "k", "t", Seq("v"))
      .orderBy("k", "t").as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 10L, 100L), (1L, 11L, 100L), (1L, 12L, 100L),
      (1L, 13L, 130L), (1L, 14L, 140L),
      (2L, 5L, 50L)))
  }

  test("per-key grid spans exactly [min, max] — keys do not leak into each other") {
    val obs = Seq((1L, 0L, 1L), (1L, 2L, 2L), (2L, 100L, 3L)).toDF("k", "t", "v")
    val out = Resample.gapFill(obs, "k", "t", Seq("v"))
    assert(out.count() == 4) // key 1: t=0,1,2; key 2: t=100
    assert(out.filter(col("k") === 2 && col("t") =!= 100).count() == 0)
  }

  test("multiple value columns fill independently; coarser steps skip points") {
    val obs = Seq((1L, 0L, 10L, 7L), (1L, 4L, 40L, 9L)).toDF("k", "t", "a", "b")
    val out = Resample.gapFill(obs, "k", "t", Seq("a", "b"), step = 2L)
      .orderBy("t").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 0L, 10L, 7L), (1L, 2L, 10L, 7L), (1L, 4L, 40L, 9L)))
  }

  test("empty input yields an empty grid; non-positive step fails loudly") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("k", "t", "v")
    assert(Resample.gapFill(empty, "k", "t", Seq("v")).count() == 0)
    intercept[IllegalArgumentException] {
      Resample.gapFill(empty, "k", "t", Seq("v"), step = 0L)
    }
  }
}
