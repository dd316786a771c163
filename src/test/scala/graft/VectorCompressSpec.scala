package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorCompress

/** Exactness properties of the int8 round trip on hand-computable
  * fixtures (the oracle gate certifies the corpus-scale run).
  */
class VectorCompressSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("range extremes and constant dimensions reconstruct exactly") {
    // dim 1 spans [0, 255]: 0 → code 0, 255 → code 255, both exact;
    // dim 2 is constant: span 0 → code 0, recon = mn, error 0
    val df = Seq(
      (1L, Seq(0f, 10f)),
      (2L, Seq(255f, 10f))).toDF("vec_id", "embedding")
    val out = VectorCompress.int8Audit(df, "vec_id", "embedding", dims = 2)
      .orderBy("vec_id").collect()
    assert(out.map(_.getAs[Long]("sum_code")).toSeq == Seq(0L, 255L))
    assert(out.forall(_.getAs[Long]("max_err") == 0L))
    assert(out.forall(_.getAs[Long]("sum_err") == 0L))
  }

  test("max reconstruction error is bounded by one code step") {
    val df = (0L until 50L).map(i => (i, Seq((i * 37 % 101).toFloat, (i * 53 % 89).toFloat)))
      .toDF("vec_id", "embedding")
    val out = VectorCompress.int8Audit(df, "vec_id", "embedding", dims = 2)
    // spans are 100e6 and 88e6 → one step is span/255 < 400k
    val worst = out.agg(org.apache.spark.sql.functions.max("max_err"))
      .collect()(0).getLong(0)
    assert(worst <= 400000L, s"error $worst exceeds one code step")
  }
}
