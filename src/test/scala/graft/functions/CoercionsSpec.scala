package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Python-truthiness edge cases (FIXTURES.md §4:
  * int(None or 13)=13, int(0 or 13)=13 (!), int("" or 0)=0,
  * bool(None)=false; safe_int "12.7"→12, garbage→0). */
class CoercionsSpec extends AnyFunSuite with SparkSpec {
  import Coercions._

  test("intOr treats 0 and null as missing (F24)") {
    import spark.implicits._
    val df = Seq[(Option[Int], String)](
      (None, "null→13"), (Some(0), "0→13"), (Some(5), "5")).toDF("x", "lbl")
    val out = df.select(intOr(col("x"), 13L).as("r")).collect().map(_.getLong(0))
    assert(out.toSeq === Seq(13L, 13L, 5L))
  }

  test("strOr treats empty string as missing") {
    import spark.implicits._
    val out = Seq[String](null, "", "abc").toDF("x")
      .select(strOr(col("x"), "d").as("r")).collect().map(_.getString(0))
    assert(out.toSeq === Seq("d", "d", "abc"))
  }

  test("toBoolTruthy matches Python bool()") {
    import spark.implicits._
    val numOut = Seq[Option[Int]](None, Some(0), Some(2)).toDF("x")
      .select(toBoolTruthyNum(col("x")).as("r")).collect().map(_.getBoolean(0))
    assert(numOut.toSeq === Seq(false, false, true))
    val strOut = Seq[String](null, "", "0", "yes").toDF("x")
      .select(toBoolTruthy(col("x")).as("r")).collect().map(_.getBoolean(0))
    // NB Python bool("0") is True — non-empty string
    assert(strOut.toSeq === Seq(false, false, true, true))
  }

  test("safeInt = int(float(x)) with default (utils_of_searchengine.py:64-68)") {
    import spark.implicits._
    val out = Seq("12.7", "abc", "-3.9", "100", "۱۲۰").toDF("x")
      .select(safeInt(col("x")).as("r")).collect().map(_.getLong(0))
    // truncation toward zero; Persian digits parse like Python float()
    assert(out.toSeq === Seq(12L, 0L, -3L, 100L, 120L))
    val nul = Seq[String](null).toDF("x")
      .select(safeInt(col("x")).as("r")).collect()(0).getLong(0)
    assert(nul === 0L)
  }

  test("replaceValue patches sentinels (−1370 → 1369)") {
    import spark.implicits._
    val out = Seq(-1370, 1380).toDF("x")
      .select(replaceValue(col("x"), lit(-1370), lit(1369)).as("r"))
      .collect().map(_.getInt(0))
    assert(out.toSeq === Seq(1369, 1380))
  }
}
