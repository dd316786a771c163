package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions

/** The optimizer rewrite: a naive BETWEEN theta-join, written exactly
  * as a user would write it, must plan as a hash join on the bucket
  * key once [[graft.plans.RangeJoinRewrite]] is attached — and produce
  * the identical result. The plan keeps one guarded nested-loop branch
  * for intervals whose bucket fan-out exceeds the configured bound
  * (empty, and AQE-collapsed, in the non-pathological case); the
  * assertion is that the BUCKETIZED join exists and carries the work.
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

  /** The fast path: a join keyed (at least partly) on the graft bucket
    * columns, planned as a hash/merge join — not a nested loop. */
  private def hasBucketHashJoin(plan: String): Boolean =
    plan.linesIterator.exists(l =>
      l.contains("__graft_pb") &&
        (l.contains("HashJoin") || l.contains("SortMergeJoin")))

  test("rewrite fires: bucketized hash join carries the work, results identical") {
    val expect = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val before = naive.queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoopJoin") || before.contains("CartesianProduct"),
      s"fixture no longer plans as a nested loop without the rule:\n$before")
    GraftExtensions.enableRangeJoinRewrite(spark)
    try {
      val rewritten = naive
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(hasBucketHashJoin(plan), s"rule did not rewrite the theta-join:\n$plan")
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == expect.toSeq, "rewrite changed the answer")
    } finally GraftExtensions.disableRangeJoinRewrite(spark)
  }

  test("rewrite handles flipped orientations and SQL BETWEEN") {
    GraftExtensions.enableRangeJoinRewrite(spark)
    try {
      val flipped = points.join(intervals, $"lo" <= $"pv" && $"hi" >= $"pv")
        .select("pv", "iid")
      assert(hasBucketHashJoin(flipped.queryExecution.executedPlan.toString))
      points.createOrReplaceTempView("rr_points")
      intervals.createOrReplaceTempView("rr_intervals")
      val sqlDf = spark.sql(
        "SELECT pv, iid FROM rr_points JOIN rr_intervals ON pv BETWEEN lo AND hi")
      assert(hasBucketHashJoin(sqlDf.queryExecution.executedPlan.toString),
        "SQL BETWEEN did not rewrite")
      val expect = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(sqlDf.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        == expect.toSeq)
    } finally GraftExtensions.disableRangeJoinRewrite(spark)
  }

  test("range conjuncts peel out of a larger conjunction (category + BETWEEN)") {
    val pts = Seq((1L, 0L, "a"), (2L, 100L, "a"), (3L, 100L, "b"),
      (4L, 700L, "b"), (5L, 5000L, "a")).toDF("pid", "pv", "cat")
    val ivs = Seq((10L, 0L, 511L, "a"), (11L, 0L, 511L, "b"),
      (12L, 600L, 800L, "b"), (13L, 4000L, 6000L, "b")).toDF("iid", "lo", "hi", "cat")
    def q = pts.join(ivs, pts("cat") === ivs("cat")
      && $"pv" >= $"lo" && $"pv" <= $"hi").select($"pid", $"iid")
    val expect = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    GraftExtensions.enableRangeJoinRewrite(spark)
    try {
      val plan = q.queryExecution.executedPlan.toString
      assert(hasBucketHashJoin(plan),
        s"mixed predicate defeated the rewrite:\n$plan")
      assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        == expect.toSeq, "mixed-predicate rewrite changed the answer")
    } finally GraftExtensions.disableRangeJoinRewrite(spark)
  }

  test("fan-out guard: a pathological interval routes to the fallback, not sequence()") {
    // fan-out (hi-lo)/512 ≈ 2e15 — sequence() would throw / OOM; the
    // guard must route this row through the nested-loop branch and the
    // query must still answer correctly
    val wide = Seq((100L, 0L, 1000000000000000000L), (101L, 0L, 511L))
      .toDF("iid", "lo", "hi")
    def q = points.join(wide, $"pv" >= $"lo" && $"pv" <= $"hi").select("pv", "iid")
    val expect = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    GraftExtensions.enableRangeJoinRewrite(spark)
    try {
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == expect.toSeq, "guard path changed the answer")
      assert(hasBucketHashJoin(q.queryExecution.executedPlan.toString),
        "narrow intervals should still take the bucketized path")
    } finally GraftExtensions.disableRangeJoinRewrite(spark)
  }

  test("structural belt: a tag-stripped guard join is not rewritten again") {
    // simulate the optimizer rebuilding the rule's output joins via
    // case-class copy() (which drops TreeNodeTags): apply the rule to
    // the analyzed plan, strip EVERY tag by copying each Join, re-run
    // the rule, and assert the plan is a fixed point — no nested Union
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
    val analyzed = naive.queryExecution.analyzed
    val once = graft.plans.RangeJoinRewrite(analyzed)
    def unions(p: LogicalPlan): Int = p.collect { case u: Union => u }.length
    assert(unions(once) == 1, s"expected the hybrid Union after one firing:\n$once")
    val stripped = once.transform { case j: Join => j.copy() }
    val again = graft.plans.RangeJoinRewrite(stripped)
    assert(unions(again) == 1,
      s"rule re-fired on its tag-stripped output (nested Unions):\n$again")
  }

  test("malformed width conf falls back to the default instead of failing plans") {
    GraftExtensions.enableRangeJoinRewrite(spark)
    spark.conf.set("spark.graft.rangejoin.width", "not-a-number")
    try {
      val expect = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val plan = naive.queryExecution.executedPlan.toString
      assert(hasBucketHashJoin(plan), s"default width did not apply:\n$plan")
      assert(naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        == expect.toSeq)
    } finally {
      spark.conf.unset("spark.graft.rangejoin.width")
      GraftExtensions.disableRangeJoinRewrite(spark)
    }
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

  test("builder-path extensions install the as-of planner strategy") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val strategies =
      org.apache.spark.sql.GraftBridge.plannerStrategies(ext, spark)
    assert(strategies.contains(graft.plans.AsOfJoinStrategy),
      "withExtensions(new GraftExtensions) does not plan AsOfJoinNode")
  }
}
