package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs end-to-end on the sf0.001 driver tables and
  * the oracle map stays consistent with the query map. */
class QueriesSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every oracle key has a query implementation") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query is oracle-gated") {
    val ungated = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(ungated.isEmpty, s"queries without oracles: $ungated")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, dir)
      assert(df.schema.fields.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
