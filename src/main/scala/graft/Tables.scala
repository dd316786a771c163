package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-provided parquet tables
  * (see TESTDATA.md). All engine queries read through here so that
  * scan-level concerns (the nanos-timestamp workaround, column pruning)
  * live in one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark cannot represent;
      // read it as epoch-nanos long (exact — matches DuckDB epoch_ns(ts)).
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    s.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, dir: String): DataFrame = table(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame = table(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = table(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame = table(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = table(s, dir, "lineitem")
  def documents(s: SparkSession, dir: String): DataFrame = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")

  /** events with `ts` as epoch-nanos long plus a derived µs timestamp
    * column `ts_utc` (truncation is exact for bucketing/ordering).
    */
  def events(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      .withColumn("ts_utc", expr("timestamp_micros(ts div 1000)"))
}

/** One SparkSession factory so every entry point (tests, Bench, Verify)
  * gets identical tuning: AQE on, shuffle partitions sized for the local
  * core count (never the 200 default), UTC session time zone.
  */
object GraftSession {
  def build(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
            shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt * 2)
      : SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
