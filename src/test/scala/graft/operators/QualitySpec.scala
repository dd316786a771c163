package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Declarative quality checks: one-scan row rules, uniqueness,
  * referential integrity, zero-violation clean path. */
class QualitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("scanChecks counts each rule independently in one pass") {
    val df = Seq((1L, "a"), (-2L, "b"), (0L, null.asInstanceOf[String]))
      .toDF("v", "s")
    val out = Quality.scanChecks(df, Seq(
      "v_positive" -> (col("v") <= 0),
      "s_nonnull" -> col("s").isNull)).collect()
    assert(out.toSeq === Seq(Row("v_positive", 2L), Row("s_nonnull", 1L)))
  }

  test("scanChecks on an empty frame reports zero, not null") {
    val out = Quality.scanChecks(Seq.empty[Long].toDF("v"),
      Seq("v_positive" -> (col("v") <= 0))).collect()
    assert(out.toSeq === Seq(Row("v_positive", 0L)))
  }

  test("uniqueCheck counts rows involved in duplicate keys, 0 when unique") {
    val dup = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    assert(Quality.uniqueCheck(dup, "u", Seq("k")).collect().toSeq
      === Seq(Row("u", 5L))) // 2+3 rows share keys
    val uniq = Seq(1L, 2L, 3L).toDF("k")
    assert(Quality.uniqueCheck(uniq, "u", Seq("k")).collect().toSeq
      === Seq(Row("u", 0L)))
  }

  test("fkCheck counts orphans including null keys") {
    val parent = Seq(1L, 2L).toDF("p")
    val child = Seq(Option(1L), Option(3L), None).toDF("k")
    assert(Quality.fkCheck(child, "fk", "k", parent, "p").collect().toSeq
      === Seq(Row("fk", 2L)))
  }
}
