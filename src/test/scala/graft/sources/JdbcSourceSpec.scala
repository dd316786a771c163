package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** S1 JDBC path against an embedded in-memory Derby database: the scan
  * works end-to-end and — the 100 TB-relevant property — the
  * watermark/status predicates are PUSHED into the remote query
  * (PushedFilters on the JDBC scan), not evaluated after shipping the
  * table.
  */
class JdbcSourceSpec extends AnyFunSuite with SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val setup: Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.executeUpdate(
      """CREATE TABLE deposits (
        | id BIGINT, statusid INT, modifieddate TIMESTAMP, title VARCHAR(64))""".stripMargin)
    Seq(
      (1L, 1247, "2025-01-10 00:00:00", "fresh-active"),
      (2L, 1254, "2025-01-10 00:00:00", "fresh-deleted"),
      (3L, 1247, "2024-01-01 00:00:00", "stale-active"),
      (4L, 1300, "2025-02-01 00:00:00", "fresh-inactive")
    ).foreach { case (id, status, ts, title) =>
      st.executeUpdate(
        s"INSERT INTO deposits VALUES ($id, $status, TIMESTAMP('$ts'), '$title')")
    }
    st.close(); conn.close()
  }

  private def cfg = JdbcSource.JdbcConfig(url, "deposits")

  test("incremental scan returns not-deleted rows past the watermark") {
    setup
    val got = JdbcSource.incrementalScan(spark, cfg,
        "modifieddate", to_timestamp(lit("2025-01-01 00:00:00")),
        "statusid", deletedStatus = 1254)
      .select("id", "title").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "fresh-active"), (4L, "fresh-inactive")))
  }

  test("watermark/status predicates reach the pushed-down JDBC query") {
    setup
    val df = JdbcSource.incrementalScan(spark, cfg,
      "modifieddate", to_timestamp(lit("2025-01-01 00:00:00")),
      "statusid", deletedStatus = 1254)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), s"no pushdown section in:\n$plan")
    assert(plan.contains("Not(EqualTo(STATUSID,1254))"),
      s"status predicate not pushed in:\n$plan")
    // the plan's toString truncates the pushed-filter list, so match the
    // visible prefix of the watermark predicate
    assert(plan.contains("GreaterThan(MODIF"),
      s"watermark predicate not pushed in:\n$plan")
  }

  test("range-partitioned parallel read covers all rows exactly once") {
    setup
    val df = JdbcSource.readPartitioned(spark, cfg, "id",
      lowerBound = 0L, upperBound = 5L, numPartitions = 3)
    assert(df.rdd.getNumPartitions === 3)
    assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L))
  }
}
