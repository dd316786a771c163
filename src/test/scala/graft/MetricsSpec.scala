package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Metrics

/** [[Metrics.observed]]: quality counters computed by the SAME job as
  * the output — verified against an independent aggregate, and shown
  * to measure the observed POINT of the plan (pre-filter rows, not
  * post-filter output).
  */
class MetricsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("observed metrics match an independent aggregate, one action only") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (observed, obs) = Metrics.observed(docs, "quality",
      count(lit(1)).as("n_rows"),
      sum(when(col("lang").isNull || col("lang") === "", 1L).otherwise(0L))
        .as("n_bad_lang"),
      sum(length(col("text")).cast("long")).as("total_chars"))
    val outCount = observed.filter(col("lang") === "fa").count() // ONE action
    val m = obs.get
    val expect = docs.agg(
      count(lit(1)), sum(when(col("lang").isNull || col("lang") === "", 1L)
        .otherwise(0L)), sum(length(col("text")).cast("long")))
      .collect()(0)
    assert(m("n_rows") == expect.getLong(0))
    assert(m("n_bad_lang") == expect.getLong(1))
    assert(m("total_chars") == expect.getLong(2))
    // the metric saw every row, not just the filtered output
    assert(m("n_rows").asInstanceOf[Long] > outCount)
  }

  test("metrics observe their plan POINT: post-filter observation counts less") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (observedAfter, obsAfter) = Metrics.observed(
      docs.filter(col("lang") === "fa"), "after_filter",
      count(lit(1)).as("n_rows"))
    val n = observedAfter.count()
    assert(obsAfter.get("n_rows") == n,
      "post-filter observation must equal the filtered count")
  }
}
