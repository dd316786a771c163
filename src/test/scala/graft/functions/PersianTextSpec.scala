package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Unit vectors lifted from the reference's literal cases
  * (FIXTURES.md §4). */
class PersianTextSpec extends AnyFunSuite with SparkSpec {
  import PersianText._

  private def one[T](c: org.apache.spark.sql.Column): T = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).collect()(0).getAs[T]("r")
  }
  private def onOne[T](in: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): T = {
    import spark.implicits._
    Seq(in).toDF("s").select(f(col("s")).as("r")).collect()(0).getAs[T]("r")
  }

  test("persian digits translate exactly") {
    assert(onOne[String]("۲ روز پیش", persianToEnglishDigits) === "2 روز پیش")
    assert(onOne[String]("۰۱۲۳۴۵۶۷۸۹", persianToEnglishDigits) === "0123456789")
  }

  test("toDoubleOrNull: garbage strip then null-on-fail") {
    assert(onOne[java.lang.Double]("۱۲۳ متر", toDoubleOrNull) === 123.0)
    assert(onOne[java.lang.Double]("12.7", toDoubleOrNull) === 12.7)
    assert(onOne[java.lang.Double]("متراژ", toDoubleOrNull) === null)
    assert(onOne[java.lang.Double]("", toDoubleOrNull) === null)
    // multiple signs survive the strip then fail the cast → null
    assert(onOne[java.lang.Double]("+-12", toDoubleOrNull) === null)
  }

  test("toLongOrNull: Python int() rejects non-integral strings") {
    assert(onOne[java.lang.Long]("۳ طبقه", toLongOrNull) === 3L)
    assert(onOne[java.lang.Long]("12.7", toLongOrNull) === null)
    assert(onOne[java.lang.Long]("1377", toLongOrNull) === 1377L)
  }

  test("parseTomanAmount units (kilid_transformer.py:41-64)") {
    def amt(s: String): java.lang.Long = {
      import spark.implicits._
      Seq(s).toDF("s").select(parseTomanAmount(col("s")).getField("amount").as("a"))
        .collect()(0).getAs[java.lang.Long]("a")
    }
    def label(s: String): String = {
      import spark.implicits._
      Seq(s).toDF("s").select(parseTomanAmount(col("s")).getField("label").as("l"))
        .collect()(0).getAs[String]("l")
    }
    assert(amt("۲ میلیارد") === 2000000000L)
    assert(amt("۵۰۰ میلیون") === 500000000L)
    assert(amt("۳ هزار") === 3000L)
    assert(amt("42") === 42L)
    assert(amt("توافقی") === null)
    assert(label("توافقی") === "توافقی")
    assert(label("۲ میلیارد") === null)
  }

  test("normalizePropertyType (utils_of_searchengine.py:94-114)") {
    assert(onOne[String]("مشارکت در ساخت", normalizePropertyType) === null)
    assert(onOne[String]("زمین کشاورزی", normalizePropertyType) === "باغ باغچه و زمین")
    assert(onOne[String]("شهرک صنعتی", normalizePropertyType) === "باغ باغچه و زمین")
    assert(onOne[String]("آپارتمان مسکونی", normalizePropertyType) === "آپارتمان مسکونی")
    assert(onOne[String]("", normalizePropertyType) === null)
    assert(onOne[String]("  چیز دیگر  ", normalizePropertyType) === "چیز دیگر")
  }

  test("toSlug (sheypoor_transformer.py:92-95)") {
    assert(onOne[String]("Apartment, Tehran", toSlug) === "apartment")
    assert(onOne[String]("Some  Nice Place", toSlug) === "some-nice-place")
    // the reference never re-strips the pre-comma segment, so a space
    // run before the comma becomes a trailing '-' — ported faithfully
    assert(onOne[String]("Nice Area , Tehran", toSlug) === "nice-area-")
    // Persian comma handled inside to_slug; falsy text → null
    assert(onOne[String]("تهران، ونک", toSlug) === "تهران")
    assert(onOne[String]("", toSlug) === null)
  }

  test("cleanText replaces ZWNJ with space and trims") {
    assert(onOne[String]("آب‌میوه ", cleanText) === "آب میوه")
  }

  test("floorOfTotal regex extraction (divar_transformer.py:349-357)") {
    import spark.implicits._
    val r = Seq("۳ از ۵").toDF("s")
      .select(floorOfTotal(col("s")).as("f"))
      .select(col("f.floor"), col("f.total_floors")).collect()(0)
    assert(r.getInt(0) === 3 && r.getInt(1) === 5)
  }
}
