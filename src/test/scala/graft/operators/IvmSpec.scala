package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Incremental aggregate maintenance: increment ≡ recompute, zero-count
  * key removal, loud negative-count failure. */
class IvmSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("applyAggDelta equals a recompute, drops keys emptied by retraction") {
    val base = Seq((1L, 2L, 30L), (2L, 1L, 5L), (3L, 1L, 7L))
      .toDF("k", "n", "s")
    val delta = Seq(
      (1L, 1L, 10L),   // insert: k1 -> n=3, s=40
      (2L, -1L, 5L),   // retract the only row: k2 gone
      (4L, 1L, 9L))    // brand-new key
      .toDF("k", "sign", "v")
    val out = Ivm.applyAggDelta(base, delta, Seq("k"), "n", "s", "sign", "v")
      .orderBy("k").collect()
    assert(out.toSeq === Seq(Row(1L, 3L, 40L), Row(3L, 1L, 7L), Row(4L, 1L, 9L)))
  }

  test("a delta retracting rows the base never had fails loudly") {
    val base = Seq((1L, 1L, 10L)).toDF("k", "n", "s")
    val delta = Seq((1L, -1L, 10L), (1L, -1L, 99L)).toDF("k", "sign", "v")
    val ex = intercept[Exception] {
      Ivm.applyAggDelta(base, delta, Seq("k"), "n", "s", "sign", "v").collect()
    }
    assert(ex.getMessage.contains("negative")
      || ex.getCause != null && ex.getCause.getMessage.contains("negative"))
  }

  test("empty delta is the identity; empty base passes inserts through") {
    val base = Seq((1L, 1L, 10L)).toDF("k", "n", "s")
    val noDelta = Seq.empty[(Long, Long, Long)].toDF("k", "sign", "v")
    assert(Ivm.applyAggDelta(base, noDelta, Seq("k"), "n", "s", "sign", "v")
      .collect().toSeq === Seq(Row(1L, 1L, 10L)))
    val noBase = Seq.empty[(Long, Long, Long)].toDF("k", "n", "s")
    val ins = Seq((7L, 1L, 3L)).toDF("k", "sign", "v")
    assert(Ivm.applyAggDelta(noBase, ins, Seq("k"), "n", "s", "sign", "v")
      .collect().toSeq === Seq(Row(7L, 1L, 3L)))
  }
}
