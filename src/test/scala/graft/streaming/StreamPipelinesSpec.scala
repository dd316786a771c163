package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** ST2/ST4/ST5: streaming dedup state + idempotent merge, driven by
  * MemoryStream micro-batches (SURVEY.md §5 strategy #5). */
class StreamPipelinesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dedupStream drops re-sent keys across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val deduped = StreamPipelines.dedupStream(
      mem.toDF().toDF("content_url", "ts"), "content_url", "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(("u1", ts("2025-01-01 10:00:00")), ("u2", ts("2025-01-01 10:00:10")))
      q.processAllAvailable()
      // u1 re-sent in a later batch within the watermark → dropped
      mem.addData(("u1", ts("2025-01-01 10:01:00")), ("u3", ts("2025-01-01 10:01:30")))
      q.processAllAvailable()
      val urls = spark.table("dedup_out").select("content_url")
        .as[String].collect().sorted.toSeq
      assert(urls === Seq("u1", "u2", "u3"))
    } finally q.stop()
  }

  test("sessionize: custom state carries the open session across batches") {
    import StreamPipelines.{ClosedSession, SessionEvent}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val minNs = 60L * 1000000000L
    // nonzero base: an event at epoch 0 ties the INITIAL watermark (0)
    // and the stateful operator's late-data filter drops it (<=)
    val base = 1440 * minNs
    val sessions = StreamPipelines.sessionize(mem.toDS(), gapNs = 30 * minNs)
    val q = sessions.toDF().writeStream.format("memory").queryName("sess_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: two events 10 min apart — one open session, nothing emitted
      mem.addData(SessionEvent(1L, base, 1L), SessionEvent(1L, base + 10 * minNs, 2L))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() === 0)
      // batch 2: 70 min later — closes the first session (2 events),
      // opens a new one that stays in state
      mem.addData(SessionEvent(1L, base + 80 * minNs, 3L))
      q.processAllAvailable()
      val out = spark.table("sess_out")
        .as[ClosedSession].collect().toSeq
      assert(out === Seq(ClosedSession(1L, base, base + 10 * minNs, 2L)))
    } finally q.stop()
  }

  test("sessionize: idle user's session closes via event-time timeout (bounded state)") {
    import StreamPipelines.{ClosedSession, SessionEvent}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val minNs = 60L * 1000000000L
    val base = 1440 * minNs
    val sessions = StreamPipelines.sessionize(mem.toDS(), gapNs = 30 * minNs)
    val q = sessions.toDF().writeStream.format("memory").queryName("sess_to_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: a single event for user 1 — an open session, state armed
      // with timeout at base+30min
      mem.addData(SessionEvent(1L, base, 1L))
      q.processAllAvailable()
      assert(spark.table("sess_to_out").count() === 0)
      // batch 2: a DIFFERENT user far in the future advances the
      // watermark to base+90 min — user 1's session must close via
      // timeout, with no follow-up user-1 event ever arriving
      mem.addData(SessionEvent(2L, base + 100 * minNs, 2L))
      q.processAllAvailable()
      val deadline = System.nanoTime() + 15L * 1000000000L
      var out = Seq.empty[ClosedSession]
      while (out.isEmpty && System.nanoTime() < deadline) {
        q.processAllAvailable() // let the no-data batch run the eviction
        out = spark.table("sess_to_out").as[ClosedSession].collect().toSeq
        if (out.isEmpty) Thread.sleep(100)
      }
      assert(out === Seq(ClosedSession(1L, base, base, 1L)))
    } finally q.stop()
  }

  test("dedup state is BOUNDED: a beyond-watermark late duplicate re-emits") {
    // The contract dropDuplicatesWithinWatermark trades on: duplicate
    // keys are dropped only while the original's state lives (its event
    // time + delay is ahead of the watermark). Once the watermark passes
    // that horizon the state is EVICTED — so a very-late duplicate
    // re-emits. That re-emission is the positive proof the state store
    // is bounded by event time instead of keeping every key forever
    // (raw dropDuplicates would dedup here and grow without bound).
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val deduped = StreamPipelines.dedupStream(
      mem.toDF().toDF("content_url", "ts"), "content_url", "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_evict_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: k1's state will expire at 10:00 + 10 min = 10:10
      mem.addData(("k1", ts("2025-01-01 10:00:00")))
      q.processAllAvailable()
      // batch 2: advances the watermark to 11:30 − 10 min = 11:20 > 10:10
      // (evicts k1) and seeds k4, whose state expires at 11:38 > 11:20
      mem.addData(("adv", ts("2025-01-01 11:30:00")), ("k4", ts("2025-01-01 11:28:00")))
      q.processAllAvailable()
      // batch 3: k4 re-sent within its live state → dropped;
      // k1 re-sent after eviction → re-emitted (bounded-state proof)
      mem.addData(("k1", ts("2025-01-01 11:25:00")), ("k4", ts("2025-01-01 11:29:00")))
      q.processAllAvailable()
      val keys = spark.table("dedup_evict_out").select("content_url")
        .as[String].collect().sorted.toSeq
      assert(keys === Seq("adv", "k1", "k1", "k4"),
        "expected k1 twice (state evicted) and k4 once (state live)")
    } finally q.stop()
  }

  test("checkpointed dedup resumes with state intact: no reprocess, no re-emit") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val mem = MemoryStream[(String, Timestamp)]
    @volatile var batches = Vector.empty[(Long, Seq[String])]
    def start() = StreamPipelines.dedupStream(
        mem.toDF().toDF("content_url", "ts"), "content_url", "ts", "1 hour")
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches = batches :+ (id, df.select("content_url")
          .collect().map(_.getString(0)).sorted.toSeq)
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    val q1 = start()
    try {
      mem.addData(("a", ts("2025-01-01 10:00:00")), ("b", ts("2025-01-01 10:00:10")))
      q1.processAllAvailable()
    } finally q1.stop()
    val afterRun1 = batches.flatMap(_._2)
    assert(afterRun1.sorted === Seq("a", "b"))
    // restart from the SAME checkpoint: "a" re-sent within the
    // watermark must STILL dedup (state restored, not rebuilt empty),
    // committed batches must not replay, and "c" flows through
    mem.addData(("a", ts("2025-01-01 10:01:00")), ("c", ts("2025-01-01 10:01:30")))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val all = batches.flatMap(_._2)
    assert(all.sorted === Seq("a", "b", "c"), s"got $batches")
    assert(batches.map(_._1) === batches.map(_._1).distinct) // no batch replayed
  }

  test("idempotentMerge: overlapping re-emits collapse into no-ops (ST4)") {
    var state: DataFrame = Seq(("u1", "v1")).toDF("content_url", "payload")
    val merge = StreamPipelines.idempotentMerge(
      () => state, s => state = s, "content_url") _
    val batch1 = Seq(("u2", "v2"), ("u1", "v1-dup")).toDF("content_url", "payload")
    merge(batch1, 0L)
    merge(batch1, 1L) // at-least-once redelivery of the same batch
    assert(state.count() === 2)
    assert(state.orderBy("content_url").as[(String, String)].collect().toSeq ===
      Seq(("u1", "v1"), ("u2", "v2"))) // first write wins, like DuplicateKeyError→skip
  }

  test("microBatchWriter drains through the sink with batch ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    var seen = Vector.empty[(Long, Long)] // (batchId, rowCount)
    val deduped = StreamPipelines.dedupStream(
      mem.toDF().toDF("content_url", "ts"), "content_url", "ts")
    val q = StreamPipelines.microBatchWriter(deduped,
      (df, id) => seen = seen :+ (id, df.count()), triggerMs = 0L)
      .queryName("mb_out").start()
    try {
      mem.addData(("a", ts("2025-01-01 00:00:00")), ("b", ts("2025-01-01 00:00:01")))
      q.processAllAvailable()
      assert(seen.map(_._2).sum === 2)
    } finally q.stop()
  }

  test("windowedCounts: tumbling event-time windows over a stream (ST6)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val agg = StreamPipelines.windowedCounts(
      mem.toDF().toDF("event_type", "ts"), "ts", "event_type", "5 minutes", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      mem.addData(("click", ts("2025-01-01 10:01:00")), ("click", ts("2025-01-01 10:02:00")),
                  ("view", ts("2025-01-01 10:06:00")))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("window_start", "event_type", "n")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(rows === Set(
        ("2025-01-01 10:00:00.0", "click", 2L),
        ("2025-01-01 10:05:00.0", "view", 1L)))
    } finally q.stop()
  }

  test("q135: chunked AvailableNow backfill emits exactly q62's single-drain session set") {
    val dir = "/root/testdata/sf0.001"
    def sessions(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val single = sessions(graft.queries.StreamGate.q62StreamSessions(spark, dir))
    val chunked = sessions(graft.queries.StreamGate.q135ChunkedBackfill(spark, dir))
    assert(chunked === single,
      "4-chunk replay with intermediate watermarks changed the session set")
  }
}
