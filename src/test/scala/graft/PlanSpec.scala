package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational

/** Physical-plan assertions (the 100 TB checklist): filters reach the
  * parquet scan, scans prune columns, small dims broadcast. A plan that
  * silently regresses to full scans or shuffle joins fails here even
  * while results stay correct.
  */
class PlanSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1: shipdate filter is pushed to the parquet scan") {
    val plan = planOf(Relational.q1PricingSummary(spark, dir))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter in:\n$plan")
  }

  test("q4 point lookup pushes the key predicate") {
    val plan = planOf(Relational.q4PointLookup(spark, dir))
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]"),
      s"no pushed point filter in:\n$plan")
  }

  test("q7 dim joins broadcast the small sides") {
    val plan = planOf(Relational.q7DimJoins(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ in:\n$plan")
  }

  test("q3 scan prunes to the referenced columns only") {
    val plan = planOf(Relational.q3InList(spark, dir))
    assert(plan.contains("ReadSchema: struct<p_brand:string,p_size:int,p_retailprice:double>"),
      s"column pruning regressed in:\n$plan")
  }

  test("q6 aggregates with a partial (map-side) aggregate before the shuffle") {
    val plan = planOf(Relational.q6MinPerGroup(spark, dir))
    // two HashAggregate nodes around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg in:\n$plan")
  }

  test("q65 deposit point lookup pushes the id below the EAV pivot") {
    val plan = planOf(queries.SearchIndexGate.q65DepositById(spark, dir))
    // the EAV (lineitem-derived) scan must carry the deposit-id filter —
    // the pivot aggregates ONE deposit's rows, not the whole table
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,7)]"),
      s"id filter did not reach the EAV scan in:\n$plan")
  }

  test("q58 surrogate ids use no single-partition global window") {
    val plan = planOf(queries.SiteGates.q58DivarToDelta(spark, dir))
    assert(!plan.contains("Window"), s"global WindowExec crept back into:\n$plan")
  }
}
