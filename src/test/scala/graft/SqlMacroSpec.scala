package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Coercions, PersianText, RelativeDates}
import graft.plans.GraftExtensions

/** The SQL macro surface ([[GraftExtensions]] columnMacros): every
  * registered function must produce EXACTLY the Scala Column API's
  * result — same expression tree semantics, since the builder inlines
  * the same composition — plus arity fail-loud. */
class SqlMacroSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private lazy val registered: Unit = GraftExtensions.register(spark)

  private lazy val fixtures = {
    registered
    Seq(
      "۱۲۳ میلیون تومان", "۴۵ هزار تومان", "توافقی", "۷۸۹ تومان",
      "  متراژ ۶۶ متر ", "آپارتمان، تهران", "", "۵ از ۱۲", "abc12.5xyz")
      .toDF("s").createOrReplaceTempView("macro_src")
  }

  test("SQL macro ≡ Scala Column result for the text family") {
    fixtures
    val viaSql = spark.sql(
      """SELECT s, graft_digits(s) AS d, graft_slug(s) AS sl,
        |  graft_to_long(s) AS l, graft_to_double(s) AS dbl,
        |  graft_truthy(s) AS t
        |FROM macro_src""".stripMargin)
    val viaApi = spark.table("macro_src").select(col("s"),
      PersianText.persianToEnglishDigits(col("s")).as("d"),
      PersianText.toSlug(col("s")).as("sl"),
      PersianText.toLongOrNull(col("s")).as("l"),
      PersianText.toDoubleOrNull(col("s")).as("dbl"),
      Coercions.toBoolTruthy(col("s")).as("t"))
    assert(viaSql.collect().map(_.toString).sorted.toSeq ===
      viaApi.collect().map(_.toString).sorted.toSeq)
  }

  test("struct-returning macros: parse_toman and floor_of_total extract in SQL") {
    fixtures
    val got = spark.sql(
      """SELECT t.amount, t.label, f.floor, f.total_floors FROM (
        |  SELECT graft_parse_toman(s) AS t, graft_floor_of_total(s) AS f
        |  FROM macro_src WHERE s = '۵ از ۱۲' OR s = '۱۲۳ میلیون تومان') x
        |ORDER BY t.amount NULLS LAST""".stripMargin).collect()
    assert(got.length === 2)
    // '۵ از ۱۲': amount=5 (digits, no unit word), floor 5 of 12;
    // '۱۲۳ میلیون تومان': 123 × 10⁶
    assert(got(0).getLong(0) === 5L)
    assert(got(0).getInt(2) === 5 && got(0).getInt(3) === 12)
    assert(got(1).getLong(0) === 123000000L)
  }

  test("2-arg date macros take the injected reference time") {
    registered
    val r = spark.sql(
      "SELECT graft_build_year(cast(12 AS INT), cast(1404 AS INT)) AS y").collect()
    val want = spark.range(1).select(
      RelativeDates.ageToBuildYear(lit(12), lit(1404)).as("y")).collect()
    assert(r.map(_.toString).toSeq === want.map(_.toString).toSeq)
  }

  test("macros are transparent to the optimizer: truthy filter pushes to the scan") {
    registered
    val dir = java.nio.file.Files.createTempDirectory("graft_macro_push_").toString
    Seq((1L, "fa"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "lang").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("macro_push")
    val q = spark.sql("SELECT id FROM macro_push WHERE graft_truthy(lang)")
    // a UDF black box would block pushdown entirely; the inlined
    // composition decomposes into IsNotNull(lang) at the parquet scan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(lang)"),
      s"truthy macro did not decompose into a pushed filter:\n$plan")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("fail-loud: wrong arity is rejected at analysis") {
    registered
    val err = intercept[Exception] {
      spark.sql("SELECT graft_slug('a', 'b')").collect()
    }
    assert(Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .take(6).exists(t => String.valueOf(t.getMessage).contains("expects 1 argument")))
  }
}
