package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fail-loudly contract of the two driver harness mains
  * (round-8 lesson: throwing gates silently vanished from the
  * correctness JSON, and Bench counted exception-throwing time as a
  * query result). A deliberately broken query must surface as an
  * explicit error artifact in BOTH harnesses and must never pollute
  * the benchmark totals. */
class HarnessSpec extends AnyFunSuite with SparkSpec {

  private val ok: (SparkSession, String) => DataFrame =
    (s, _) => s.range(3).toDF("id")
  private val broken: (SparkSession, String) => DataFrame =
    (_, _) => throw new IllegalStateException("deliberately broken gate")

  test("Verify.run writes results, and _failed.json names every thrown gate") {
    val out = Files.createTempDirectory("verify_fail").toString
    val failed = Verify.run(spark, "/unused", out,
      Map("g_ok" -> ok, "g_broken" -> broken), Map("g_ok" -> "SELECT 1"))
    assert(failed.keySet === Set("g_broken"))
    assert(failed("g_broken").contains("deliberately broken gate"))
    val failedJson = Files.readString(Paths.get(s"$out/_failed.json"))
    assert(failedJson.contains("g_broken") &&
      failedJson.contains("deliberately broken gate"))
    assert(Files.exists(Paths.get(s"$out/g_ok")), "surviving gate still dumped")
    assert(Files.readString(Paths.get(s"$out/oracle_sql.json")).contains("SELECT 1"))
  }

  test("Verify.run writes an EMPTY _failed.json when everything passes") {
    val out = Files.createTempDirectory("verify_ok").toString
    assert(Verify.run(spark, "/unused", out, Map("g_ok" -> ok), Map.empty).isEmpty)
    assert(Files.readString(Paths.get(s"$out/_failed.json")) === "{}")
  }

  test("Bench.measure excludes throwing queries from results, reports them as errors") {
    val (results, errors) = Bench.measure(spark, "/unused",
      Seq("b_ok" -> ok, "b_broken" -> broken))
    assert(results.map(_._1) === Seq("b_ok"))
    assert(results.head._2 > 0.0)
    assert(errors.keySet === Set("b_broken"))
    assert(errors("b_broken").contains("deliberately broken gate"))
  }
}
