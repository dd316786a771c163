package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Relative-date vectors from convert_text_to_date.py:44-51 and the site
  * variants, against an injected reference time (determinism rule). */
class RelativeDatesSpec extends AnyFunSuite with SparkSpec {
  import RelativeDates._

  private val ref = "2025-10-21 12:00:00"

  private def run(text: String,
                  f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): String = {
    import spark.implicits._
    Seq(text).toDF("s")
      .select(date_format(f(col("s"), to_timestamp(lit(ref))), "yyyy-MM-dd HH:mm:ss").as("r"))
      .collect()(0).getAs[String]("r")
  }

  test("divar variant (convert_text_to_date.py:13-40)") {
    assert(run("۲ روز پیش", textToDateDivar _) === "2025-10-19 12:00:00")
    assert(run("1 هفته پیش", textToDateDivar _) === "2025-10-14 12:00:00")
    assert(run("۲ ماه پیش", textToDateDivar _) === "2025-08-22 12:00:00") // 60 days
    assert(run("لحظاتی پیش", textToDateDivar _) === "2025-10-21 12:00:00")
    assert(run("دقایقی پیش", textToDateDivar _) === "2025-10-21 11:55:00")
    assert(run("۳ ساعت پیش", textToDateDivar _) === "2025-10-21 09:00:00")
    assert(run("چیز نامفهوم", textToDateDivar _) === "2025-10-21 12:00:00")
  }

  test("kilid variant adds minutes and null passthrough") {
    assert(run("۱۰ دقیقه پیش", textToDateKilid _) === "2025-10-21 11:50:00")
    assert(run("۳ ساعت پیش", textToDateKilid _) === "2025-10-21 09:00:00")
    import spark.implicits._
    val r = Seq[String](null).toDF("s")
      .select(textToDateKilid(col("s"), to_timestamp(lit(ref))).as("r"))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("sheypoor variant: numberless specials") {
    assert(run("ساعاتی پیش", textToDateSheypoor _) === "2025-10-21 10:00:00")
    assert(run("لحظاتی پیش", textToDateSheypoor _) === "2025-10-21 12:00:00")
    assert(run("دقایقی پیش", textToDateSheypoor _) === "2025-10-21 11:55:00")
    assert(run("۴ روز پیش", textToDateSheypoor _) === "2025-10-17 12:00:00")
    // numbered ساعت is NOT a sheypoor unit → falls through to now
    assert(run("۳ ساعت پیش", textToDateSheypoor _) === "2025-10-21 12:00:00")
  }

  test("ageToBuildYear buckets at refYear 2025 (jyear 1404)") {
    import spark.implicits._
    def age(a: java.lang.Integer): java.lang.Integer =
      Seq(Option(a).map(_.toInt)).toDF("a")
        .select(ageToBuildYear(col("a"), lit(2025)).as("r"))
        .collect()(0).getAs[java.lang.Integer]("r")
    assert(age(35) === 1373)
    assert(age(25) === 1383)
    assert(age(5) === 1404)
    assert(age(null) === null)
  }

  test("tehranToUtcIso shifts −03:30 (utils_of_searchengine.py:52-60)") {
    import spark.implicits._
    val r = Seq("2025-06-01 12:00:00").toDF("s")
      .select(tehranToUtcIso(to_timestamp(col("s"))).as("r"))
      .collect()(0).getAs[String]("r")
    assert(r === "2025-06-01T08:30:00+00:00")
  }

  test("repairAndClamp glues date-time and clamps future dates") {
    import spark.implicits._
    def rep(s: String): String =
      Seq(s).toDF("s")
        .select(date_format(repairAndClamp(col("s"), "2025-11-04 00:00:00",
          "2025-10-21 00:00:00"), "yyyy-MM-dd HH:mm:ss").as("r"))
        .collect()(0).getAs[String]("r")
    assert(rep("2025-03-0412:30:00") === "2025-03-04 12:30:00")
    assert(rep("2026-01-01 00:00:00") === "2025-10-21 00:00:00")
  }
}
