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

  test("Bench.measure runs a third pass when the first two disagree >2x") {
    // synthetic noise: the first timed pass sleeps 400 ms, later passes
    // are fast — without the noise guard the reported min would be the
    // fast second pass ONLY if the noise hit exactly one pass; here the
    // guard's third pass must rescue the number AND the stable query
    // must not pay for a third pass it doesn't need
    var noisyCalls = 0
    val noisy: (SparkSession, String) => DataFrame = (s, _) => {
      noisyCalls += 1
      if (noisyCalls == 1) Thread.sleep(400)
      s.range(1).toDF("id")
    }
    var stableCalls = 0
    val stable: (SparkSession, String) => DataFrame = (s, _) => {
      stableCalls += 1
      s.range(1).toDF("id")
    }
    val (results, errors) = Bench.measure(spark, "/unused",
      Seq("b_noisy" -> noisy, "b_stable" -> stable))
    assert(errors.isEmpty)
    val byName = results.toMap
    assert(noisyCalls === 3, "a >2x pass disagreement must trigger a third pass")
    assert(stableCalls === 2, "agreeing passes must not pay for a third")
    assert(byName("b_noisy") < 0.4,
      s"the rescued minimum must exclude the noisy pass, got ${byName("b_noisy")}")
  }

  test("Bench.measure adaptive warmup: a ≥1 s first pass is discarded " +
      "as warmup cold, counted when warm") {
    // cold: the slow first execution must be warmup-only (3 calls, 2
    // timed) — the old warmup+2-pass discipline for slow queries
    var coldCalls = 0
    val slowFirst: (SparkSession, String) => DataFrame = (s, _) => {
      coldCalls += 1
      if (coldCalls == 1) Thread.sleep(1100)
      s.range(1).toDF("id")
    }
    val (coldRes, coldErr) = Bench.measure(spark, "/unused",
      Seq("b_slow_first" -> slowFirst))
    assert(coldErr.isEmpty)
    assert(coldCalls === 3, "a ≥1 s cold first pass must be warmup + 2 timed")
    assert(coldRes.head._2 < 1.0,
      s"the warmup pass must not be a timed number, got ${coldRes.head._2}")
    // warm (the tail top-12 re-measure): the first pass counts, so a
    // stable query pays exactly 2 executions even when slow
    var warmCalls = 0
    val warmSlow: (SparkSession, String) => DataFrame = (s, _) => {
      warmCalls += 1
      Thread.sleep(1050)
      s.range(1).toDF("id")
    }
    val (warmRes, _) = Bench.measure(spark, "/unused",
      Seq("b_warm" -> warmSlow), warm = true)
    assert(warmCalls === 2, "warm callers count the first pass")
    assert(warmRes.head._2 >= 1.0)
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
