package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, Trigger}
import org.apache.spark.sql.Row

import graft.operators.KeyedSink

/** Structured-Streaming equivalents of the reference's queue-driven
  * ingestion (SURVEY.md §2.8): the RabbitMQ micro-batch sensor becomes a
  * rate-limited streaming source, Bloom+unique-index dedup becomes
  * stateful dropDuplicates + an idempotent foreachBatch merge, and the
  * −1 h watermark overlap becomes withWatermark + MERGE re-emit.
  */
object StreamPipelines {

  /** ST2: exactly-once-ish keyed dedup — stateful dropDuplicates on the
    * key(s) within the watermark horizon, so dedup state is BOUNDED by
    * event time instead of growing with every key ever seen
    * (crawler_dag_factory.py:37-49 + mongodb_utils.py:21-37). */
  def dedupStream(stream: DataFrame, key: String, tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    dedupStreamKeys(stream, Seq(key), tsCol, watermark)

  /** Composite-key variant of [[dedupStream]]. */
  def dedupStreamKeys(stream: DataFrame, keys: Seq[String], tsCol: String,
                      watermark: String = "1 hour"): DataFrame =
    stream
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** ST1/ST5: micro-batch writer with the reference's drain cadence
    * (≤ batch-size per trigger ≙ fetcher_dag_factory.py:77-79). The sink
    * function receives (batchDf, batchId) and must be idempotent — the
    * at-least-once contract of the durable queue. */
  def microBatchWriter(deduped: DataFrame,
                       sink: (DataFrame, Long) => Unit,
                       triggerMs: Long = 1000L): DataStreamWriter[Row] =
    deduped.writeStream
      .outputMode(OutputMode.Update)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (df: DataFrame, id: Long) => sink(df, id) }

  /** ST6: event-time tumbling-window aggregation with late-data handling
    * — the reference has no event-time windows (SURVEY §2.8 ST6); this is
    * the natural extension once the stream carries event timestamps. */
  def windowedCounts(stream: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(keyCol), col("n"))

  /** ST4: idempotent keyed merge for foreachBatch — late/overlapping
    * re-emits (the incremental query refetches a 1 h overlap,
    * sql_search_incremental_dag.py:118-140) collapse into no-ops.
    * `stateGet`/`statePut` abstract the target table so tests can use an
    * in-memory map and production can use a transactional table format.
    */
  def idempotentMerge(stateGet: () => DataFrame, statePut: DataFrame => Unit,
                      key: String)(batch: DataFrame, batchId: Long): Unit = {
    val merged = KeyedSink.upsertAbsent(stateGet(), batch, key)
    statePut(merged)
  }

  /** Incremental changelog compaction for a foreachBatch loop: fold a
    * micro-batch of change rows into the keyed serving state with
    * last-writer-wins over `seqCols`, RETAINING winning deletes as
    * tombstones ([[graft.operators.Cdc.compactChangelog]] with
    * keepTombstones) — batches may arrive in ANY order, so a dead key
    * must stay dead until the final read drops tombstones. The state
    * the caller holds must be lineage-truncated in `statePut`
    * (localCheckpoint) exactly like the other foreachBatch merges here,
    * or the plan grows per batch. Replays are no-ops by construction:
    * max(struct) over a superset with the same winners is unchanged. */
  def compactMerge(stateGet: () => DataFrame, statePut: DataFrame => Unit,
                   keyCols: Seq[String], seqCols: Seq[String], opCol: String)(
                   batch: DataFrame, batchId: Long): Unit = {
    val merged = graft.operators.Cdc.compactChangelog(
      stateGet().unionByName(batch), keyCols, seqCols, opCol,
      keepTombstones = true)
    statePut(merged)
  }

  // -------- custom state: gap sessionization via flatMapGroupsWithState

  final case class SessionEvent(user_id: Long, ts_ns: Long, event_id: Long)
  /** [[SessionEvent]] plus the event-time column the watermark rides on
    * (µs truncation of ts_ns — the same clock the oracle sees). */
  final case class SessionEventT(user_id: Long, ts_ns: Long, event_id: Long,
                                 ts_utc: java.sql.Timestamp)
  final case class OpenSession(startNs: Long, lastNs: Long, n: Long)
  final case class ClosedSession(user_id: Long, session_start_ns: Long,
                                 session_end_ns: Long, n_events: Long)

  /** Gap sessionization with CUSTOM state (flatMapGroupsWithState): a
    * session closes when the next event for the user is more than
    * `gapNs` after the previous one. Closed sessions are emitted
    * (append mode); the still-open session per user lives in the state
    * store and survives micro-batch boundaries — the semantics a
    * time-window aggregation cannot express (session length is
    * data-driven, not clock-driven). Events inside one batch are sorted
    * by (ts, event_id) before folding, so batch slicing never reorders
    * a user's history as long as batches arrive in time order.
    *
    * State is BOUNDED by an event-time timeout: every open session arms
    * a timeout at `lastMs + gapMs`, and when the watermark passes it the
    * session closes and emits without a follow-up event (Spark fires a
    * timeout when `timeoutTimestamp < watermark`, strictly). Without
    * this, the open session of every user ever seen would live in the
    * state store forever — a leak on a long-running stream. A late
    * event arriving after its user's session timed out simply starts a
    * new session (the standard watermark contract). */
  def sessionize(events: Dataset[SessionEvent],
                 gapNs: Long = 1800000000000L,
                 watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapNs / 1000000L
    events
      .withColumn("ts_utc", expr("timestamp_micros(ts_ns div 1000)"))
      .as[SessionEventT]
      .withWatermark("ts_utc", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessionEventT], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, s.startNs, s.lastNs, s.n))
          } else {
            val sorted = it.toVector.sortBy(e => (e.ts_ns, e.event_id))
            val out = Vector.newBuilder[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts_ns - s.lastNs <= gapNs =>
                  cur = Some(s.copy(lastNs = e.ts_ns, n = s.n + 1))
                case Some(s) =>
                  out += ClosedSession(uid, s.startNs, s.lastNs, s.n)
                  cur = Some(OpenSession(e.ts_ns, e.ts_ns, 1))
                case None =>
                  cur = Some(OpenSession(e.ts_ns, e.ts_ns, 1))
              }
            }
            cur.foreach { s =>
              val timeoutMs = s.lastNs / 1000000L + gapMs
              if (timeoutMs > state.getCurrentWatermarkMs()) {
                state.update(s)
                state.setTimeoutTimestamp(timeoutMs)
              } else {
                // the gap already elapsed in event time — close now
                if (state.exists) state.remove()
                out += ClosedSession(uid, s.startNs, s.lastNs, s.n)
              }
            }
            out.result().iterator
          }
      }
  }

  // -------- the same sessionization on Spark 4's transformWithState

  /** [[sessionize]] re-expressed on the arbitrary-state v2 API
    * (`transformWithState` + StatefulProcessor): the open session lives
    * in a ValueState, and instead of a per-group timeout the processor
    * manages an explicit event-time TIMER per user, re-armed (delete +
    * register) as the session extends. Same semantics, same emission
    * set; the processor model adds composable state variables and
    * multiple timers per key — the API a new pipeline should target. */
  private class SessionProcessor(gapNs: Long)
      extends StatefulProcessor[Long, SessionEventT, ClosedSession] {
    @transient private var open: org.apache.spark.sql.streaming.ValueState[OpenSession] = _
    @transient private var armed: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState[OpenSession]("open",
        Encoders.product[OpenSession], TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armedTimer",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(uid: Long, rows: Iterator[SessionEventT],
                                 timers: TimerValues): Iterator[ClosedSession] = {
      val gapMs = gapNs / 1000000L
      val sorted = rows.toVector.sortBy(e => (e.ts_ns, e.event_id))
      val out = Vector.newBuilder[ClosedSession]
      var cur = if (open.exists()) Some(open.get()) else None
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.ts_ns - s.lastNs <= gapNs =>
            cur = Some(s.copy(lastNs = e.ts_ns, n = s.n + 1))
          case Some(s) =>
            out += ClosedSession(uid, s.startNs, s.lastNs, s.n)
            cur = Some(OpenSession(e.ts_ns, e.ts_ns, 1))
          case None =>
            cur = Some(OpenSession(e.ts_ns, e.ts_ns, 1))
        }
      }
      cur.foreach { s =>
        val timeoutMs = s.lastNs / 1000000L + gapMs
        if (timeoutMs > timers.getCurrentWatermarkInMs()) {
          open.update(s)
          if (armed.exists()) getHandle.deleteTimer(armed.get())
          getHandle.registerTimer(timeoutMs)
          armed.update(timeoutMs)
        } else {
          open.clear()
          if (armed.exists()) getHandle.deleteTimer(armed.get())
          armed.clear()
          out += ClosedSession(uid, s.startNs, s.lastNs, s.n)
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(uid: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[ClosedSession] = {
      val s = if (open.exists()) Some(open.get()) else None
      open.clear(); armed.clear()
      s.map(v => ClosedSession(uid, v.startNs, v.lastNs, v.n)).iterator
    }
  }

  /** Gap sessionization on `transformWithState` — see [[sessionize]]
    * for the semantics; this is the v2-state-API formulation. */
  def sessionizeTws(events: Dataset[SessionEvent],
                    gapNs: Long = 1800000000000L,
                    watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts_utc", expr("timestamp_micros(ts_ns div 1000)"))
      .as[SessionEventT]
      .withWatermark("ts_utc", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapNs),
        TimeMode.EventTime(), OutputMode.Append(),
        implicitly[org.apache.spark.sql.Encoder[ClosedSession]])
  }
}
