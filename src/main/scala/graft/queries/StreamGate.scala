package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Puts Structured Streaming EXECUTION under the DuckDB oracle gate —
  * not a batch re-expression: q60 runs a real `readStream` file source
  * over the events parquet, an event-time tumbling window aggregation
  * with a watermark (the ST1/ST4 shape: micro-batch trigger + event-time
  * state), drains it with Trigger.AvailableNow into a memory sink, and
  * returns the completed result for the hash-compare. A pass certifies
  * the streaming operator pipeline (source listing → state store →
  * window emission) produces exactly the batch-equivalent answer the
  * oracle derives relationally.
  *
  * Determinism: per-row integer-cents before the sum (double sums are
  * order-dependent; integer sums are not), ns→µs truncation identical
  * to DuckDB's parquet read, complete output mode so the final memory
  * table is the full aggregation regardless of micro-batch slicing.
  */
object StreamGate {
  type Q = (SparkSession, String) => DataFrame

  private val runId = new AtomicInteger(0)

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as epoch-nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def q60StreamWindowedAgg(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // glob (not an exact file path) so the source resolves the parent
    // directory as basePath and lists the single events file
    val stream = s.readStream.schema(eventsSchema).parquet(s"$dir/events.parq*")
    val agg = stream
      .withColumn("ts_utc", expr("timestamp_micros(ts div 1000)"))
      .withColumn("v_c100", round(col("value") * 100).cast(LongType))
      .withWatermark("ts_utc", "1 hour")
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v_c100")).as("sum_value_c100"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), col("sum_value_c100"))
    val name = s"q60_stream_${runId.incrementAndGet()}"
    val query = agg.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    s.table(name).orderBy("w_start", "event_type")
  }

  /** q61: streaming stateful dedup (ST2 — the crawler/sink
    * exactly-once-ish guarantee) executed for real: readStream →
    * dropDuplicates on the key → append-mode memory sink → the set of
    * first-seen keys. Only the KEY is projected, so the result is
    * deterministic regardless of which duplicate row wins the race into
    * state (the surviving key set equals relational DISTINCT). */
  def q61StreamDedup(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = s.readStream.schema(eventsSchema).parquet(s"$dir/events.parq*")
    val deduped = stream
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    val name = s"q61_stream_${runId.incrementAndGet()}"
    val query = deduped.writeStream
      .format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    s.table(name).orderBy("user_id", "event_type")
  }

  val queries: Map[String, Q] = Map(
    "q60_stream_windowed_agg" -> (q60StreamWindowedAgg _),
    "q61_stream_dedup" -> (q61StreamDedup _))

  val oracles: Map[String, String] = Map(
    "q60_stream_windowed_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
        | event_type, cast(count(*) as bigint) AS n,
        | cast(sum(cast(round(value*100) as bigint)) as bigint) AS sum_value_c100
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q61_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type
        |FROM events ORDER BY user_id, event_type""".stripMargin)
}
