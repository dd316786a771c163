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

  // Streaming events reads go through graft.Tables.eventsStream — the
  // source schema is derived from a batch footer read, never hard-coded,
  // so the engine tolerates any physical ts encoding the producer picks.

  def q60StreamWindowedAgg(s: SparkSession, dir: String): DataFrame = {
    // glob (not an exact file path) so the source resolves the parent
    // directory as basePath and lists the single events file
    val stream = graft.Tables.eventsStream(s, dir)
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

  /** q111: STREAM-STATIC enrichment join — the most common production
    * streaming shape: a micro-batched fact stream joined to a
    * broadcast dimension INSIDE the streaming query (not foreachBatch
    * — Catalyst plans the stream-static join per micro-batch, the
    * static side broadcast once), then a watermarked daily window
    * aggregate per enriching attribute. At 100 TB/day the static side
    * is the only table small enough to sit on every executor; the
    * stream never shuffles for the join, only for the windowed agg.
    * Oracle: the batch equivalent of the same join + bucketing. */
  def q111StreamStaticJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = graft.Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val stream = graft.Tables.eventsStream(s, dir)
    val agg = stream
      .withColumn("ts_utc", expr("timestamp_micros(ts div 1000)"))
      .withColumn("v_c100", round(col("value") * 100).cast(LongType))
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .withWatermark("ts_utc", "1 hour")
      .groupBy(window(col("ts_utc"), "1 day"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("v_c100")).as("sum_value_c100"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("c_nationkey"), col("n"), col("sum_value_c100"))
    val name = s"q111_stream_${runId.incrementAndGet()}"
    val query = agg.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    s.table(name).orderBy("day", "c_nationkey")
  }

  /** q61: streaming stateful dedup (ST2 — the crawler/sink
    * exactly-once-ish guarantee) executed for real through the
    * PRODUCTION operator: readStream → dedupStreamKeys (watermarked
    * dropDuplicatesWithinWatermark — state bounded by event time, the
    * long-running-stream contract) → append-mode memory sink → the set
    * of first-seen keys. The horizon spans the whole fixture, so the
    * surviving key set equals relational DISTINCT exactly. The dedup key
    * INCLUDES the µs event time (the canonical event-dedup shape: the
    * same logical event re-delivered carries the same timestamp), so the
    * output is deterministic regardless of which duplicate wins the race
    * into state AND the gate actually certifies event-time ingestion — a
    * reader that mis-scales `ts` (e.g. micros read as nanos) shifts
    * every ts_us value and hash-mismatches the oracle, instead of
    * passing by projecting keys only (the round-8 blind spot). */
  def q61StreamDedup(s: SparkSession, dir: String): DataFrame = {
    val stream = graft.Tables.eventsStream(s, dir)
    val deduped = graft.streaming.StreamPipelines.dedupStreamKeys(
        stream.withColumn("ts_utc", expr("timestamp_micros(ts div 1000)"))
          .withColumn("ts_us", expr("ts div 1000")),
        Seq("user_id", "event_type", "ts_us"), "ts_utc",
        watermark = "3650 days")
      .select(col("user_id"), col("event_type"), col("ts_us"))
    val name = s"q61_stream_${runId.incrementAndGet()}"
    val query = deduped.writeStream
      .format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    s.table(name).orderBy("user_id", "event_type", "ts_us")
  }

  /** q62: CUSTOM-state sessionization (flatMapGroupsWithState) executed
    * on a real stream — closed sessions emit in append mode; a user's
    * final session also emits IF its event-time timeout fired (state is
    * bounded: `lastMs + gapMs < finalWatermarkMs`, where the final
    * watermark is `max(ts)` truncated to ms minus the 10-minute delay).
    * Only sessions still inside the watermark horizon stay in the state
    * store and are absent from the output. The oracle derives the same
    * sessions relationally (lag + cumulative session ids) and applies
    * the identical timeout inequality to each user's last session. */
  def q62StreamSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stream = graft.Tables.eventsStream(s, dir)
    val evts = stream
      .select(col("user_id"), col("ts").as("ts_ns"), col("event_id"))
      .as[graft.streaming.StreamPipelines.SessionEvent]
    val sessions = graft.streaming.StreamPipelines.sessionize(evts)
    val name = s"q62_stream_${runId.incrementAndGet()}"
    val query = sessions.toDF().writeStream
      .format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    // emit µs — DuckDB reads the parquet nanos truncated to µs, so raw
    // ns in oracle outputs can never match (graft determinism rule)
    s.table(name).select(col("user_id"),
        expr("session_start_ns div 1000").as("session_start_us"),
        expr("session_end_ns div 1000").as("session_end_us"),
        col("n_events"))
      .orderBy("user_id", "session_start_us")
  }

  /** q135: chunked-backfill equivalence — q62's sessionization run over
    * a DIFFERENTLY-CHUNKED registration of the same source. The events
    * table is re-written as 4 time-range-ordered parquet chunks and the
    * stream drains with `maxFilesPerTrigger=1`, so Trigger.AvailableNow
    * replays it as 4 micro-batches with REAL intermediate watermark
    * advancement between them (q62's single-file drain is one batch +
    * the final no-data batch). This is the day-by-day historical
    * backfill shape: sessions spanning chunk boundaries must carry
    * state across batches, and intermediate watermarks may close
    * sessions EARLIER but must never change the final session set —
    * certified by sharing q62's oracle. Chunk mtimes are stamped
    * strictly increasing in event-time order (FileStreamSource orders
    * its listing by timestamp), so the advancing watermark never drops
    * a later chunk as late data — exactly the invariant a production
    * backfill must arrange (replay oldest first). */
  def q135ChunkedBackfill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // per-process scratch: a fixed name races with a concurrent run's
    // overwrite-then-stamp of the same chunk files
    val chunkRoot = java.nio.file.Files
      .createTempDirectory("graft_q135_chunks_").toString
    graft.Tables.events(s, dir).drop("ts_utc")
      .repartitionByRange(4, col("ts"))
      .write.mode("overwrite").parquet(s"$chunkRoot/events.parquet")
    // part-file name order == ts range order; stamp mtimes to match
    val pdir = java.nio.file.Paths.get(chunkRoot, "events.parquet")
    val parts = graft.operators.Versioned.dataFiles(pdir)
      .sortBy(_.getFileName.toString)
    val base = System.currentTimeMillis() - parts.length * 2000L
    parts.zipWithIndex.foreach { case (p, i) =>
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(base + i * 2000L))
    }
    val stream = graft.Tables.eventsStream(s, chunkRoot,
      Map("maxFilesPerTrigger" -> "1"))
    val evts = stream
      .select(col("user_id"), col("ts").as("ts_ns"), col("event_id"))
      .as[graft.streaming.StreamPipelines.SessionEvent]
    val sessions = graft.streaming.StreamPipelines.sessionize(evts)
    val name = s"q135_stream_${runId.incrementAndGet()}"
    val query = sessions.toDF().writeStream
      .format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    s.table(name).select(col("user_id"),
        expr("session_start_ns div 1000").as("session_start_us"),
        expr("session_end_ns div 1000").as("session_end_us"),
        col("n_events"))
      .orderBy("user_id", "session_start_us")
  }

  /** q70: STREAM-STREAM interval join executed for real — purchases
    * joined to same-user signups that happened in the 24 h before the
    * purchase. Both sides carry watermarks (they bound join state on a
    * long-running stream: a signup can be dropped once no purchase
    * within the interval can still arrive). The gate watermark spans the
    * whole fixture ("3650 days", like q61's): AvailableNow may split the
    * input across micro-batches (maxFilesPerTrigger), and a tight
    * watermark would drop late-batch rows pre-join, losing pairs vs the
    * batch oracle. State BOUNDEDNESS under a tight watermark is a
    * separate property, certified by StreamPipelinesSpec. */
  def q70StreamIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val stream = graft.Tables.eventsStream(s, dir)
      .withColumn("ts_utc", expr("timestamp_micros(ts div 1000)"))
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("ts_utc").as("p_ts"))
      .withWatermark("p_ts", "3650 days")
    val signups = stream.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("event_id").as("s_id"),
        col("ts_utc").as("s_ts"))
      .withWatermark("s_ts", "3650 days")
    val joined = purchases.join(signups,
      expr("p_user = s_user AND p_ts >= s_ts AND p_ts <= s_ts + interval 24 hours"))
    val name = s"q70_stream_${runId.incrementAndGet()}"
    val query = joined.writeStream
      .format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    s.table(name).select(col("p_id"), col("s_id"), col("p_user").as("user_id"))
      .orderBy("p_id", "s_id")
  }

  /** q91: stream-stream LEFT-OUTER interval join — q70's attribution
    * shape with the misses preserved (purchases that had NO signup in
    * the prior 24 h emit with a null signup id). Outer rows cannot emit
    * while the purchase might still match a late signup; Spark emits
    * them only when the watermark passes the purchase's last possible
    * match time and the state row is EVICTED. The gate therefore uses a
    * TIGHT watermark (3 days — unlike q70's fixture-spanning one): the
    * single-file source drains in one micro-batch (no late-drop risk;
    * all matches emit there), then the final no-data batch advances the
    * watermark to min(max p_ts, max s_ts) − 3 d and flushes the
    * unmatched purchases older than it. Purchases inside the final
    * 3-day horizon stay in state — still joinable on a live stream —
    * and are absent from the output; the oracle applies the identical
    * inequality to its batch left join. */
  def q91StreamOuterIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val stream = graft.Tables.eventsStream(s, dir)
      .withColumn("ts_utc", expr("timestamp_micros(ts div 1000)"))
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("ts_utc").as("p_ts"))
      .withWatermark("p_ts", "3 days")
    val signups = stream.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("event_id").as("s_id"),
        col("ts_utc").as("s_ts"))
      .withWatermark("s_ts", "3 days")
    val joined = purchases.join(signups,
      expr("p_user = s_user AND p_ts >= s_ts AND p_ts <= s_ts + interval 24 hours"),
      "left_outer")
    val name = s"q91_stream_${runId.incrementAndGet()}"
    val query = joined.writeStream
      .format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    s.table(name).select(col("p_id"), col("s_id"), col("p_user").as("user_id"))
      .orderBy("p_id", "s_id")
  }

  /** q100: native `session_window` aggregation ON A STREAM — the
    * third sessionizer (q62 flatMapGroupsWithState, q71
    * transformWithState, q92 batch session_window), this time the
    * engine-provided streaming operator. Append mode emits a session
    * only once the watermark passes its end (no later event can merge
    * into it); like q91 the gate runs a TIGHT 3-day watermark — the
    * single-file source drains in one micro-batch, the final no-data
    * batch advances the watermark to max(ts) − 3 d and flushes every
    * session that closed before it. Sessions still inside the horizon
    * stay in state; the oracle applies the identical inequality to
    * q92's relational session derivation. */
  def q100StreamSessionWindow(s: SparkSession, dir: String): DataFrame = {
    val stream = graft.Tables.eventsStream(s, dir)
      .withColumn("ts_utc", expr("timestamp_micros(ts div 1000)"))
    val sessions = stream
      .withWatermark("ts_utc", "3 days")
      .groupBy(col("user_id"), session_window(col("ts_utc"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))
    val name = s"q100_stream_${runId.incrementAndGet()}"
    val query = sessions.writeStream
      .format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    s.table(name).orderBy("user_id", "start_us")
  }

  /** q71: the SAME sessionization as q62 on Spark 4's
    * transformWithState (StatefulProcessor + explicit event-time
    * timers) — both state APIs must emit the identical session set,
    * certified by sharing q62's oracle derivation. */
  def q71StreamSessionsTws(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stream = graft.Tables.eventsStream(s, dir)
    val evts = stream
      .select(col("user_id"), col("ts").as("ts_ns"), col("event_id"))
      .as[graft.streaming.StreamPipelines.SessionEvent]
    val sessions = graft.streaming.StreamPipelines.sessionizeTws(evts)
    val name = s"q71_stream_${runId.incrementAndGet()}"
    // transformWithState needs multiple state column families → RocksDB
    // provider (scoped to this query; restored after the drain)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = s.conf.getOption(providerKey)
    s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val query = sessions.toDF().writeStream
        .format("memory").queryName(name)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    } finally {
      prevProvider match {
        case Some(p) => s.conf.set(providerKey, p)
        case None => s.conf.unset(providerKey)
      }
    }
    s.table(name).select(col("user_id"),
        expr("session_start_ns div 1000").as("session_start_us"),
        expr("session_end_ns div 1000").as("session_end_us"),
        col("n_events"))
      .orderBy("user_id", "session_start_us")
  }

  /** q72: the ST4 idempotent merge driven END TO END with the
    * reference's −1 h-overlap refetch cadence
    * (sql_search_incremental_dag.py:118-140): the events table is
    * sliced into 3-day micro-batches, each fetched with a 1-hour lag
    * overlap into the previous window, pre-aggregated one-row-per-key
    * (deterministic batch payloads), and the WHOLE batch sequence is
    * replayed twice — at-least-once delivery. Every overlap row and
    * every replayed batch must collapse into a no-op inside
    * [[graft.streaming.StreamPipelines.idempotentMerge]]; the oracle
    * computes the one-shot batch answer (each key's aggregate over its
    * first batch's fetch window), so a hash match certifies idempotence
    * AND first-write-wins merge semantics. State lineage is truncated
    * per merge (localCheckpoint) exactly as a long-running foreachBatch
    * loop must, or the plan grows without bound. */
  def q72IdempotentMerge(s: SparkSession, dir: String): DataFrame = {
    val step = 259200000000L // 3 days in µs
    val lag = 3600000000L    // the reference's 1-hour overlap
    val ev = graft.Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts div 1000").as("ts_us"))
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
    val bounds = ev.agg(min("ts_us"), max("ts_us")).head()
    val t0 = bounds.getLong(0); val tMax = bounds.getLong(1)
    val nBatches = ((tMax - t0) / step + 1).toInt

    def fetch(k: Int): DataFrame = {
      val lo = t0 + k.toLong * step - (if (k > 0) lag else 0L)
      val hi = t0 + (k + 1).toLong * step
      ev.filter(col("ts_us") >= lo && col("ts_us") < hi)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min("event_id").as("first_event_id"))
        .withColumn("k", concat_ws(":", col("user_id"), col("event_type")))
    }

    var state = fetch(0).filter(lit(false)).localCheckpoint()
    val stateGet = () => state
    val statePut = (df: DataFrame) => { state = df.localCheckpoint(); () }
    for (_ <- 0 until 2; k <- 0 until nBatches)
      graft.streaming.StreamPipelines.idempotentMerge(stateGet, statePut, "k")(
        fetch(k), k.toLong)
    state.select(col("user_id"), col("event_type"), col("first_event_id"))
      .orderBy("user_id", "event_type")
  }

  /** t47: STREAMING benchmark decontamination — t42's eval-shingle
    * broadcast semi-join applied to a streaming corpus through
    * `foreachBatch`, the shape a continuously-ingesting training
    * pipeline runs: the eval vocabulary is static (computed once,
    * broadcast into every micro-batch), each micro-batch of documents
    * is scored with the SAME production core as batch t42
    * ([[TextDedup.decontaminateCore]]), and batch outputs append to a
    * parquet sink. Per-doc work only — a doc's score depends on
    * nothing outside its own row — so any AvailableNow micro-batch
    * slicing must reproduce the batch answer exactly; the gate shares
    * t42's oracle. */
  def t47StreamDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val batchDocs = graft.Tables.documents(s, dir)
    // static side: computed once on the driver, broadcast per batch —
    // never recomputed inside the stream
    val bench = TextDedup.benchShingles(batchDocs).localCheckpoint()
    val out = java.nio.file.Files.createTempDirectory("graft_t47_").toString
    val stream = s.readStream.schema(batchDocs.schema)
      .parquet(s"$dir/documents.parq*")
    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        TextDedup.decontaminateCore(batch, bench)
          .write.mode("append").parquet(out)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    s.read.parquet(out).orderBy("doc_id")
  }

  /** t54: STREAMING media decode — the continuously-ingesting
    * multimodal-corpus shape: each micro-batch of documents runs the
    * SAME production pipeline as batch t44 (fixture synthesis →
    * [[graft.sources.MultiModal.withFeatures]] with the full
    * [[graft.sources.MultiModal.MediaDecoder]] chain → pixel stats),
    * appending to a parquet sink via `foreachBatch`. Decode is pure
    * per-row work, so micro-batch slicing must be semantically
    * invisible; the gate shares t44's closed-form pixel-law oracle. */
  def t54StreamMediaDecode(s: SparkSession, dir: String): DataFrame = {
    val batchDocs = graft.Tables.documents(s, dir)
    val out = java.nio.file.Files.createTempDirectory("graft_t54_").toString
    val stream = s.readStream.schema(batchDocs.schema)
      .parquet(s"$dir/documents.parq*")
    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        ImagePixels.pngPixelStatsOf(batch)
          .write.mode("append").parquet(out)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    s.read.parquet(out).orderBy("asset_id")
  }

  /** t74: STREAMING BPE tokenize — the continuously-ingesting corpus
    * tokenization shape: the merge table and the distinct-word
    * segmentation are trained ONCE on the static corpus (the vocab
    * artifact a production pipeline ships), then every micro-batch of
    * documents joins its words against that static segmentation and
    * rolls up per document exactly as batch t72. Uses
    * [[graft.operators.Bpe.segmentWithVocab]] — so the PRODUCTION
    * priority-loop apply is itself oracle-gated here, against the same
    * unrolled replay t72's fold form passes. Per-doc work +
    * stream-static equi-join only, so AvailableNow micro-batch slicing
    * must be semantically invisible. */
  def t74StreamBpeTokenize(s: SparkSession, dir: String): DataFrame = {
    val batchDocs = graft.Tables.documents(s, dir)
    val words = batchDocs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val vocab = words.filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val merges = graft.operators.Bpe.trainMerges(vocab, "w", "freq", budget = 8)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // static side: segmented once, materialized, joined into every batch
    val segged = graft.operators.Bpe.segmentWithVocab(words.distinct(), "w", merges)
      .select(col("w"), size(col("syms")).cast("long").as("n_syms"))
      .localCheckpoint()
    val out = java.nio.file.Files.createTempDirectory("graft_t74_").toString
    val stream = s.readStream.schema(batchDocs.schema)
      .parquet(s"$dir/documents.parq*")
    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .join(segged, Seq("w"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"), sum("n_syms").as("n_bpe_tokens"))
          .write.mode("append").parquet(out)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    s.read.parquet(out).orderBy("doc_id")
  }

  /** q74: STREAMING as-of join — purchases arrive as a stream and each
    * micro-batch picks up the user's latest signup state at-or-before
    * the purchase time from a STATIC snapshot (the enrichment shape of
    * a feature-hydration pipeline: static side computed once on the
    * driver, joined into every batch with the SAME production operator
    * as batch q44, [[graft.operators.TemporalJoin.asOfJoin]]). A
    * purchase row's answer depends only on itself and the static
    * snapshot, so AvailableNow micro-batch slicing must be
    * semantically invisible; the gate shares q44's native-ASOF oracle. */
  def q74StreamAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val signups = graft.Tables.events(s, dir)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("snap_ts"),
        col("value").as("snap_value"))
      .localCheckpoint()
    val out = java.nio.file.Files.createTempDirectory("graft_q74_").toString
    val stream = graft.Tables.eventsStream(s, dir)
    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val purchases = batch.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        graft.operators.TemporalJoin.asOfJoin(
            purchases, signups, Seq("user_id"), "ts", "snap_ts")
          .select(col("event_id"), col("user_id"),
            expr("ts div 1000").as("ts_us"),
            expr("snap_ts_matched div 1000").as("snap_ts_us"),
            col("snap_value"))
          .write.mode("append").parquet(out)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    s.read.parquet(out).orderBy("event_id")
  }

  /** q75: STREAMING range join — event values stream in, each
    * micro-batch joins against the static interval set with the SAME
    * bucketized operator as batch q73 ([[graft.operators.RangeJoin]]).
    * Pair rows append per batch (a point's matches depend only on its
    * own row, so slicing is invisible); the per-interval aggregate runs
    * once at drain. Shares q73's naive-BETWEEN oracle. */
  def q75StreamRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val iv = graft.Tables.supplier(s, dir)
      .select(col("s_suppkey"), (col("s_suppkey") * 997 % 48000).as("lo"))
      .withColumn("hi", col("lo") + 200 + col("s_suppkey") % 800 * 2)
      .localCheckpoint()
    val out = java.nio.file.Files.createTempDirectory("graft_q75_").toString
    val stream = graft.Tables.eventsStream(s, dir)
    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val points = batch.select(
          round(col("value") * 100).cast("long").as("pv"))
        graft.operators.RangeJoin.bucketed(points, "pv", iv, "lo", "hi", width = 512)
          .select(col("pv"), col("s_suppkey"))
          .write.mode("append").parquet(out)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    s.read.parquet(out)
      .groupBy("s_suppkey")
      .agg(count(lit(1)).as("n_points"), sum(col("pv")).as("sum_pv"))
      .orderBy("s_suppkey")
  }

  /** q109: STREAMING changelog compaction — q102's last-writer-wins
    * serving table maintained incrementally through foreachBatch-style
    * merges ([[graft.streaming.StreamPipelines.compactMerge]]). The
    * changelog is sliced by event_id mod 5, so every micro-batch spans
    * the WHOLE time range: changes for a key arrive wildly out of
    * order across batches, which is exactly why the incremental merge
    * must keep winning deletes as tombstones — a later batch may
    * deliver an EARLIER change for a dead key, and the key must stay
    * dead. The whole batch sequence then replays twice (at-least-once
    * delivery); max(struct) merging makes replays no-ops. Shares
    * q102's one-shot oracle, so a hash match certifies
    * order-independence, tombstone retention, and replay idempotence
    * at once. */
  def q109StreamChangelogCompact(s: SparkSession, dir: String): DataFrame = {
    val ch = graft.Tables.events(s, dir).select(
      col("user_id"), expr("ts div 1000").as("ts_us"), col("event_id"),
      when(col("event_id") % 10 === 0, "D").otherwise("U").as("op"),
      col("event_type"),
      round(col("value") * 100).cast("long").as("value_c100"))
    var state = ch.filter(lit(false)).localCheckpoint()
    val get = () => state
    val put = (df: DataFrame) => { state = df.localCheckpoint(); () }
    for (_ <- 0 until 2; k <- 0 until 5)
      graft.streaming.StreamPipelines.compactMerge(get, put,
        Seq("user_id"), Seq("ts_us", "event_id"), "op")(
        ch.filter(col("event_id") % 5 === k), k.toLong)
    state.filter(col("op") =!= "D")
      .select(col("user_id"), col("ts_us").as("last_ts_us"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("value_c100").as("last_value_c100"))
      .orderBy("user_id")
  }

  /** q117: CONTINUOUS data-quality monitoring — q116's one-scan rule
    * aggregate run per micro-batch over a sliced event stream, the
    * per-batch violation counts summed into the standing report (rule
    * counts are distributive, so monitor totals ≡ the one-shot audit —
    * which is exactly what the shared-oracle hash certifies). The
    * production shape: a stream carries its quality telemetry without
    * a second pass over the data. */
  def q117StreamQuality(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Quality
    val ev = graft.Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"), col("value"))
    def rules(df: DataFrame) = Quality.scanChecks(df, Seq(
      "value_nonneg" -> (col("value") < 0),
      "type_domain" -> !col("event_type").isin(
        "view", "click", "purchase", "signup", "error"),
      "user_nonnull" -> col("user_id").isNull))
    var report = rules(ev.filter(lit(false))).localCheckpoint()
    for (k <- 0 until 5) {
      val batchReport = rules(ev.filter(col("event_id") % 5 === k))
      report = report.unionByName(batchReport)
        .groupBy("rule").agg(sum("n_violations").as("n_violations"))
        .localCheckpoint()
    }
    report.orderBy("rule")
  }

  /** q142: the reference's FULL fetcher path as one streaming gate —
    * queue → envelope → canonical transform → stateful dedup → keyed
    * insert-if-absent merge (fetcher_dag_factory.py:47-110), executed
    * as a real micro-batch query and hash-matched against q54's BATCH
    * oracle. The queue delivers at-least-once (the envelope set is
    * written TWICE and drained file-by-file, so duplicates arrive in
    * LATER micro-batches and the dedup state must hold across
    * batches); `dropDuplicates(content_url)` emits each listing once;
    * the final merge lands the stream onto a pre-existing keyed subset
    * ([[graft.operators.KeyedSink.upsertAbsent]], S11). Micro-batch
    * slicing must be semantically invisible — the q47/q135 discipline
    * — which is exactly what sharing the batch oracle certifies. */
  def q142StreamFetcherPipeline(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_q142_env_").toString
    val env = SiteGates.q54Envelope(s, dir)
    // at-least-once delivery: two full copies written as SEPARATE jobs
    // (distinct files), so with the file-per-trigger drain every URL's
    // duplicate arrives in a LATER micro-batch and the dedup state must
    // hold across batches. (A single union hash-repartitioned on
    // content_url would co-locate both copies in one file and the gate
    // would only ever exercise within-batch dedup.)
    env.repartition(2).write.mode("overwrite").parquet(s"$root/env")
    env.repartition(2).write.mode("append").parquet(s"$root/env")
    val stream = s.readStream.schema(env.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/env")
    val projected = SiteGates.q54Project(
      graft.operators.KilidTransform.kilidTransform(stream, SiteGates.refTime))
    val name = s"q142_stream_${runId.incrementAndGet()}"
    projected.dropDuplicates("content_url")
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    // the keyed sink already holds a slice of previously-fetched
    // listings; insert-if-absent must leave them untouched and land
    // only the new keys — idempotent by S11
    val existing = SiteGates.q54Project(
      graft.operators.KilidTransform.kilidTransform(
        env.filter(col("content_url").cast(LongType) % 10 === 0),
        SiteGates.refTime))
    graft.operators.KeyedSink.upsertAbsent(existing, s.table(name), "content_url")
      .orderBy("content_url")
  }

  /** q199: STREAMING Gopher quality rules — t117's rule set applied to
    * a streaming corpus through `foreachBatch`, the ingest-time
    * corpus-quality gate a continuously-ingesting training pipeline
    * runs. Every Gopher metric is PER-DOCUMENT work (row-local
    * expressions plus per-doc n-gram aggregates that never cross
    * documents), so AvailableNow micro-batch slicing must be
    * semantically invisible; each micro-batch runs the SAME production
    * core ([[graft.operators.GopherRules.gopherRules]]) over the same
    * planted fixture and appends to a parquet sink. Shares t117's
    * oracle. */
  def q199StreamGopherRules(s: SparkSession, dir: String): DataFrame = {
    val batchDocs = graft.Tables.documents(s, dir)
    val out = java.nio.file.Files.createTempDirectory("graft_q199_").toString
    val stream = s.readStream.schema(batchDocs.schema)
      .parquet(s"$dir/documents.parq*")
    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val planted = batch.select(col("doc_id"),
          when(pmod(col("doc_id"), lit(13)) === 1,
            lit("- alpha beta\n- gamma delta\n- epsilon zeta"))
            .when(pmod(col("doc_id"), lit(13)) === 2,
              lit("first part...\nsecond part...\nthird part stands alone"))
            .when(pmod(col("doc_id"), lit(13)) === 3,
              lit("data row data row data row data row data row data row"))
            .when(pmod(col("doc_id"), lit(13)) === 4, lit("tiny document"))
            .otherwise(col("text")).as("text"))
        graft.operators.GopherRules.gopherRules(planted, "doc_id", "text")
          .select(col("doc_id"), col("n_words"), col("mean_word_len_ppm"),
            col("alpha_word_ppm"), col("stop_hits"), col("bullet_line_ppm"),
            col("ellipsis_line_ppm"), col("top2gram_ppm"),
            col("top3gram_ppm"), col("top4gram_ppm"), col("gopher_keep"))
          .write.mode("append").parquet(out)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    s.read.parquet(out).orderBy("doc_id")
  }

  /** q200: STREAMING lang-id scoring — t114's classifier applied to a
    * streaming corpus: the model trains ONCE on the static corpus (the
    * artifact a production pipeline ships — learned weights as literal
    * expressions), then every micro-batch featurizes its own documents
    * (per-doc explode-aggregate, batch-local by construction) and runs
    * the literal-weight scoring scan, appending verdicts to a parquet
    * sink. Per-doc work + a static model only, so micro-batch slicing
    * is semantically invisible; shares t114's oracle (the held-out
    * verdict set). */
  def q200StreamLangIdScore(s: SparkSession, dir: String): DataFrame = {
    val latin = "abcdefghijklmnopqrstuvwxyz"
    val persian = "ابتثجحخدذرزسشصضطظعغفقكلمنه"
    val buckets = 64
    def fixture(df: DataFrame): DataFrame = df
      .filter(length(col("text")) >= 50) // the t114 lang-id floor
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 1,
          translate(col("text"), latin, persian))
          .otherwise(col("text")).as("ltext"),
        (pmod(col("doc_id"), lit(2)) === 1).as("is_fa"))
    // static side: train once, outside the stream (t114's recipe)
    val batchDocs = graft.Tables.documents(s, dir)
    val trainDocs = fixture(batchDocs)
      .filter(pmod(col("doc_id"), lit(4)) < 2)
    val trainFeats = graft.operators.LangId
      .charNgramFeatures(trainDocs, "doc_id", "ltext", n = 3,
        buckets = buckets)
      .join(trainDocs.select("doc_id", "is_fa"), "doc_id")
    val model = graft.operators.QualityScorer.train(trainFeats,
      graft.operators.LangId.featureCols(buckets), "is_fa",
      iters = 8, rate = 2.0)
    val out = java.nio.file.Files.createTempDirectory("graft_q200_").toString
    val stream = s.readStream.schema(batchDocs.schema)
      .parquet(s"$dir/documents.parq*")
    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val docs = fixture(batch)
        graft.operators.LangId
          .charNgramFeatures(docs, "doc_id", "ltext", n = 3,
            buckets = buckets)
          .withColumn("decision", model.decision)
          .filter(pmod(col("doc_id"), lit(4)) >= 2)
          .select(col("doc_id"),
            when(col("decision") > 0, "fa").otherwise("en")
              .as("pred_lang"))
          .write.mode("append").parquet(out)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    s.read.parquet(out).orderBy("doc_id")
  }

  /** q202: STREAMING KN-perplexity scoring — t118's interpolated
    * Kneser-Ney trigram LM as a continuous quality gate: the model
    * (five n-gram-TYPE-bounded count tables,
    * [[graft.operators.PerplexityLm.trainKnTrigramLm]]) trains ONCE on
    * the static reference slice and `localCheckpoint`s — the shipped
    * LM artifact — then every micro-batch scores its own documents
    * against it ([[graft.operators.PerplexityLm.scoreWithKnLm]]:
    * per-doc position explode + five broadcast joins, batch-local by
    * construction), appending exact integer micro-nat scores to a
    * parquet sink. Per-doc work + a static model only, so AvailableNow
    * micro-batch slicing is semantically invisible; the oracle is
    * t118's derivation through the per-document scores (the tertile
    * split is corpus-global and stays batch — t118 owns it). */
  def q202StreamKnScore(s: SparkSession, dir: String): DataFrame = {
    val batchDocs = graft.Tables.documents(s, dir)
    val lm = graft.operators.PerplexityLm
      .trainKnTrigramLm(batchDocs.filter(pmod(col("doc_id"), lit(2)) === 0),
        "text")
      .checkpointed()
    val out = java.nio.file.Files.createTempDirectory("graft_q202_").toString
    val stream = s.readStream.schema(batchDocs.schema)
      .parquet(s"$dir/documents.parq*")
    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.PerplexityLm
          .scoreWithKnLm(batch, "doc_id", "text", lm)
          .select(col("doc_id"), col("n_scored"), col("nll_e6"), col("spt"))
          .write.mode("append").parquet(out)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    s.read.parquet(out).orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q199_stream_gopher_rules" -> (q199StreamGopherRules _),
    "q200_stream_langid_score" -> (q200StreamLangIdScore _),
    "q202_stream_kn_score" -> (q202StreamKnScore _),
    "q142_stream_fetcher_pipeline" -> (q142StreamFetcherPipeline _),
    "q109_stream_changelog_compact" -> (q109StreamChangelogCompact _),
    "q111_stream_static_join" -> (q111StreamStaticJoin _),
    "q117_stream_quality" -> (q117StreamQuality _),
    "q75_stream_range_join" -> (q75StreamRangeJoin _),
    "q74_stream_asof_join" -> (q74StreamAsofJoin _),
    "t54_stream_media_decode" -> (t54StreamMediaDecode _),
    "t47_stream_decontaminate" -> (t47StreamDecontaminate _),
    "t74_stream_bpe_tokenize" -> (t74StreamBpeTokenize _),
    "q60_stream_windowed_agg" -> (q60StreamWindowedAgg _),
    "q61_stream_dedup" -> (q61StreamDedup _),
    "q62_stream_sessions" -> (q62StreamSessions _),
    "q135_chunked_backfill" -> (q135ChunkedBackfill _),
    "q70_stream_interval_join" -> (q70StreamIntervalJoin _),
    "q91_stream_outer_interval_join" -> (q91StreamOuterIntervalJoin _),
    "q100_stream_session_window" -> (q100StreamSessionWindow _),
    "q71_stream_sessions_tws" -> (q71StreamSessionsTws _),
    "q72_idempotent_merge" -> (q72IdempotentMerge _))

  // lag + cumulative-sum session ids; each user's LAST session is
  // included only when its event-time timeout fired: Spark evicts
  // state when timeoutMs < watermarkMs (strict), with timeoutMs =
  // lastNs//1e6 + 30 min and watermarkMs = max(ts)//1e6 − 10 min.
  // Shared by q62 (flatMapGroupsWithState) and q71 (transformWithState):
  // both state APIs must emit the identical session set.
  private val sessionOracle =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) tns, event_id,
      |    lag(epoch_ns(ts)) OVER (PARTITION BY user_id
      |                            ORDER BY epoch_ns(ts), event_id) prev
      |  FROM events),
      |sids AS (
      |  SELECT user_id, tns,
      |    sum(CASE WHEN prev IS NULL OR tns - prev > 1800000000000
      |             THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY tns, event_id
      |            ROWS UNBOUNDED PRECEDING) sid
      |  FROM e),
      |agg AS (
      |  SELECT user_id, sid, min(tns) // 1000 session_start_us,
      |    max(tns) // 1000 session_end_us, max(tns) end_tns,
      |    cast(count(*) as bigint) n_events
      |  FROM sids GROUP BY 1, 2),
      |last AS (SELECT user_id, max(sid) maxsid FROM agg GROUP BY 1),
      |wm AS (SELECT max(epoch_ns(ts)) // 1000000 - 600000 wm_ms FROM events)
      |SELECT a.user_id, cast(a.session_start_us as bigint) session_start_us,
      |  cast(a.session_end_us as bigint) session_end_us, a.n_events
      |FROM agg a JOIN last l
      |  ON a.user_id = l.user_id, wm
      |WHERE a.sid < l.maxsid
      |   OR a.end_tns // 1000000 + 1800000 < wm.wm_ms
      |ORDER BY a.user_id, a.session_start_us""".stripMargin

  // lazy: the t47 entry pulls in TextDedup, whose object init builds
  // UDFs (ScalaReflection) — fine in a normal JVM, but the driver's
  // sbt-console entry smoke runs under a REPL classloader where that
  // reflection breaks. SparkEntry's init only needs `queries`;
  // deferring the oracle map keeps TextDedup out of the smoke path.
  lazy val oracles: Map[String, String] = Map(
    // the streamed fetcher pipeline must equal the batch transform —
    // same oracle as q54 (duplicates deduped, merge is insert-if-absent
    // onto an identical-valued subset)
    "q142_stream_fetcher_pipeline" -> SiteGates.oracles("q54_kilid_transform"),
    // identical answer contract as batch q102 — same one-shot oracle
    "q109_stream_changelog_compact" -> ChangeGate.oracles("q102_changelog_compact"),
    // the one-shot audit the accumulated monitor must equal
    "q117_stream_quality" ->
      """SELECT 'type_domain' "rule", cast(sum(CASE WHEN event_type NOT IN
        |    ('view', 'click', 'purchase', 'signup', 'error')
        |    THEN 1 ELSE 0 END) as bigint) n_violations FROM events
        |UNION ALL SELECT 'user_nonnull', cast(sum(CASE WHEN user_id IS NULL
        |    THEN 1 ELSE 0 END) as bigint) FROM events
        |UNION ALL SELECT 'value_nonneg', cast(sum(CASE WHEN value < 0
        |    THEN 1 ELSE 0 END) as bigint) FROM events
        |ORDER BY "rule"""".stripMargin,
    // the batch form of the stream-static join + daily window
    "q111_stream_static_join" ->
      """SELECT strftime(CAST(to_timestamp(epoch_us(ts) // 86400000000
        |    * 86400) AS TIMESTAMP), '%Y-%m-%d') "day",
        |  c_nationkey, cast(count(*) as bigint) n,
        |  cast(sum(cast(round(value * 100) as bigint)) as bigint)
        |    sum_value_c100
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // identical answer contract as batch t42 — same oracle derivation
    "t47_stream_decontaminate" -> TextDedup.oracles("t42_decontaminate"),
    // q199/q200: per-doc streaming twins — batch oracles verbatim
    "q199_stream_gopher_rules" -> CorpusGate.oracles("t117_gopher_rules"),
    "q200_stream_langid_score" -> ShapeGate.oracles("t114_lang_id"),
    // q202: t118's KN derivation through the per-document scores (the
    // corpus-global tertile split is t118's batch concern)
    "q202_stream_kn_score" -> (ShapeGate.knScoreCtes +
      "\nSELECT doc_id, n_scored, nll_e6, spt FROM ds ORDER BY doc_id"),
    // micro-batch slicing must be invisible: same oracle as batch t72
    "t74_stream_bpe_tokenize" -> ShapeGate.oracles("t72_bpe_tokenize"),
    // identical answer contract as batch t44 — same pixel-law oracle
    "t54_stream_media_decode" -> ImagePixels.oracles("t44_png_pixel_stats"),
    // identical answer contract as batch q44 — same native-ASOF oracle
    "q74_stream_asof_join" -> Temporal.oracles("q44_asof_join"),
    // identical answer contract as batch q73 — same BETWEEN oracle
    "q75_stream_range_join" -> Temporal.oracles("q73_range_join"),
    "q62_stream_sessions" -> sessionOracle,
    "q71_stream_sessions_tws" -> sessionOracle,
    // chunked replay must emit the identical session set
    "q135_chunked_backfill" -> sessionOracle,
    "q60_stream_windowed_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
        | event_type, cast(count(*) as bigint) AS n,
        | cast(sum(cast(round(value*100) as bigint)) as bigint) AS sum_value_c100
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q61_stream_dedup" ->
      // dedupStreamKeys skips null keys (the sink contract) — the
      // oracle says so explicitly rather than relying on the fixture
      // having none. ts_us is part of the dedup key AND the output, so
      // the gate is red under any mis-scaled timestamp ingestion.
      """SELECT DISTINCT user_id, event_type, epoch_ns(ts)//1000 AS ts_us
        |FROM events
        |WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |ORDER BY user_id, event_type, ts_us""".stripMargin,
    "q72_idempotent_merge" ->
      // one-shot answer: each key keeps the aggregate computed over its
      // FIRST batch's fetch window [t0 + k*step − 1 h, t0 + (k+1)*step)
      // where k = (min ts − t0) // step; no earlier fetch can contain
      // the key (the overlap only reaches back INTO k−1's main window)
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, epoch_ns(ts)//1000 AS ts_us
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |t0 AS (SELECT min(ts_us) AS t0 FROM e),
        |firstb AS (
        |  SELECT user_id, event_type,
        |    (min(ts_us) - (SELECT t0 FROM t0)) // 259200000000 AS kk
        |  FROM e GROUP BY 1, 2)
        |SELECT e.user_id, e.event_type,
        |  cast(min(e.event_id) AS bigint) AS first_event_id
        |FROM e JOIN firstb f
        |  ON e.user_id = f.user_id AND e.event_type = f.event_type
        |WHERE e.ts_us < (SELECT t0 FROM t0) + (f.kk + 1) * 259200000000
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q70_stream_interval_join" ->
      // batch interval join over µs-truncated event times
      """WITH p AS (SELECT user_id, event_id p_id, epoch_ns(ts)//1000 p_us
        |           FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT user_id, event_id s_id, epoch_ns(ts)//1000 s_us
        |      FROM events WHERE event_type = 'signup')
        |SELECT p.p_id, s.s_id, p.user_id
        |FROM p JOIN s ON p.user_id = s.user_id
        | AND p.p_us >= s.s_us AND p.p_us <= s.s_us + 86400000000
        |ORDER BY p.p_id, s.s_id""".stripMargin,
    "q91_stream_outer_interval_join" ->
      // batch left join; unmatched purchases only emit once EVICTED —
      // p_ts strictly below the final watermark min(max p, max s) − 3 d
      """WITH p AS (SELECT user_id, event_id p_id, epoch_ns(ts)//1000 p_us
        |           FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT user_id, event_id s_id, epoch_ns(ts)//1000 s_us
        |      FROM events WHERE event_type = 'signup'),
        |wm AS (SELECT least((SELECT max(p_us) FROM p),
        |                    (SELECT max(s_us) FROM s)) - 259200000000 w)
        |SELECT p.p_id, s.s_id, p.user_id
        |FROM p LEFT JOIN s ON p.user_id = s.user_id
        | AND p.p_us >= s.s_us AND p.p_us <= s.s_us + 86400000000
        |WHERE s.s_id IS NOT NULL OR p.p_us < (SELECT w FROM wm)
        |ORDER BY p.p_id, s.s_id""".stripMargin,
    "q100_stream_session_window" ->
      // q92's relational session derivation + the append-mode eviction
      // inequality: only sessions whose end cleared the final watermark
      // (max ts − 3 d) have emitted; later sessions are still in state
      """WITH e AS (SELECT user_id, epoch_ns(ts)//1000 us FROM events),
        |wm AS (SELECT max(us) - 259200000000 w FROM e),
        |l AS (SELECT user_id, us,
        |        lag(us) OVER (PARTITION BY user_id ORDER BY us) prev
        |      FROM e),
        |b AS (SELECT user_id, us,
        |        CASE WHEN prev IS NULL OR us - prev >= 1800000000
        |             THEN 1 ELSE 0 END brk
        |      FROM l),
        |g AS (SELECT user_id, us,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |                       ROWS UNBOUNDED PRECEDING) sid
        |      FROM b)
        |SELECT user_id, cast(min(us) AS BIGINT) start_us,
        |       cast(max(us) + 1800000000 AS BIGINT) end_us,
        |       cast(count(*) AS BIGINT) n_events
        |FROM g GROUP BY user_id, sid
        |HAVING max(us) + 1800000000 < (SELECT w FROM wm)
        |ORDER BY user_id, start_us""".stripMargin)
}
