package graft.sources

import java.util.Properties

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1: the relational-database batch scan as a real `spark.read.jdbc`
  * path (the reference reads SQL Server over pymssql and pandas,
  * dags/search_engine/utils/utils_of_searchengine.py:25-48; the engine
  * replaces the row-at-a-time cursor with Spark's JDBC source).
  *
  * Scale shape: predicates applied on the returned frame are pushed
  * into the remote query (`PushedFilters` on the JDBC scan → a WHERE
  * clause at the database), so the watermark/status filters of the
  * incremental scans run serverside instead of shipping the table.
  * For large tables, `partitioned` splits the scan into `numPartitions`
  * range-bounded queries on a numeric column — the JDBC analog of a
  * parallel parquet scan; without it a JDBC read is one connection on
  * one executor.
  */
object JdbcSource {

  final case class JdbcConfig(
      url: String,
      table: String,
      user: Option[String] = None,
      password: Option[String] = None,
      driver: Option[String] = None,
      fetchSize: Int = 10000)

  private def props(cfg: JdbcConfig): Properties = {
    val p = new Properties()
    cfg.user.foreach(p.setProperty("user", _))
    cfg.password.foreach(p.setProperty("password", _))
    cfg.driver.foreach(p.setProperty("driver", _))
    p.setProperty("fetchsize", cfg.fetchSize.toString)
    p
  }

  /** Single-connection table read; lean on Catalyst to push filters and
    * prune columns into the generated remote query. */
  def readTable(spark: SparkSession, cfg: JdbcConfig): DataFrame =
    spark.read.jdbc(cfg.url, cfg.table, props(cfg))

  /** Range-partitioned parallel read: `numPartitions` concurrent
    * queries, each bounded on `partitionColumn` — required for any
    * table that is large relative to one connection's throughput. */
  def readPartitioned(spark: SparkSession, cfg: JdbcConfig,
                      partitionColumn: String, lowerBound: Long,
                      upperBound: Long, numPartitions: Int): DataFrame =
    spark.read.jdbc(cfg.url, cfg.table, partitionColumn,
      lowerBound, upperBound, numPartitions, props(cfg))

  /** The search-engine incremental scan shape
    * (utils_of_searchengine.py:25-48 / sql_search_incremental_dag.py:
    * 44-47): status + modified-after-watermark predicates, expressed on
    * the frame so they reach the remote WHERE clause via pushdown. */
  def incrementalScan(spark: SparkSession, cfg: JdbcConfig,
                      watermarkCol: String, watermark: Column,
                      statusCol: String, deletedStatus: Int): DataFrame =
    readTable(spark, cfg)
      .filter(col(statusCol) =!= deletedStatus && col(watermarkCol) > watermark)
}
