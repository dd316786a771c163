package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions

/** The optimizer rewrite: a naive BETWEEN theta-join, written exactly
  * as a user would write it, must plan as a hash join on the bucket
  * key (no nested loop) once [[graft.plans.RangeJoinRewrite]] is
  * attached — and produce the identical result.
  */
class RangeJoinRuleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def points =
    Seq(-1000L, -513L, -512L, -1L, 0L, 1L, 511L, 512L, 767L, 5000L).toDF("pv")
  private def intervals = Seq(
    (1L, -600L, -500L), (2L, 0L, 511L), (3L, 0L, 0L),
    (4L, -2000L, 6000L), (5L, 600L, 650L),
    (6L, 10L, -10L) // inverted bounds: must match nothing, not crash
  ).toDF("iid", "lo", "hi")

  private def naive = points.join(intervals,
    $"pv" >= $"lo" && $"pv" <= $"hi").select("pv", "iid")

  test("rewrite fires: nested loop disappears, results identical") {
    val expect = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val before = naive.queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoopJoin") || before.contains("CartesianProduct"),
      s"fixture no longer plans as a nested loop without the rule:\n$before")
    GraftExtensions.enableRangeJoinRewrite(spark)
    try {
      val rewritten = naive
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rule did not rewrite the theta-join:\n$plan")
      assert(plan.contains("__graft"), s"bucket columns missing from:\n$plan")
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == expect.toSeq, "rewrite changed the answer")
    } finally GraftExtensions.disableRangeJoinRewrite(spark)
  }

  test("rewrite handles flipped orientations and SQL BETWEEN") {
    GraftExtensions.enableRangeJoinRewrite(spark)
    try {
      val flipped = points.join(intervals, $"lo" <= $"pv" && $"hi" >= $"pv")
        .select("pv", "iid")
      assert(!flipped.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      points.createOrReplaceTempView("rr_points")
      intervals.createOrReplaceTempView("rr_intervals")
      val sqlDf = spark.sql(
        "SELECT pv, iid FROM rr_points JOIN rr_intervals ON pv BETWEEN lo AND hi")
      assert(!sqlDf.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
        "SQL BETWEEN did not rewrite")
      val expect = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(sqlDf.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        == expect.toSeq)
    } finally GraftExtensions.disableRangeJoinRewrite(spark)
  }

  test("rule leaves non-range joins untouched") {
    GraftExtensions.enableRangeJoinRewrite(spark)
    try {
      // equi-join: must stay an ordinary hash join, no graft buckets
      val eq = points.join(intervals, $"pv" === $"lo")
      assert(!eq.queryExecution.executedPlan.toString.contains("__graft"))
      // single inequality: not a range pair, stays a nested loop
      val half = points.join(intervals, $"pv" >= $"lo" && $"iid" =!= $"pv")
      assert(!half.queryExecution.executedPlan.toString.contains("__graft"))
    } finally GraftExtensions.disableRangeJoinRewrite(spark)
  }
}
