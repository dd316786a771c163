package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The versioned TABLE itself as a streaming source (the Delta
  * `readStream` shape): first batch = full snapshot pinned at stream
  * start, every later commit = exactly its new files. Non-append
  * commits (rewrites, truncates, DV mutations) must fail loudly or,
  * under `skipChangeCommits`, contribute nothing — never stream wrong
  * rows. Replay from a checkpoint must be deterministic even though
  * the table keeps moving. Restart tests use a parquet sink (the
  * memory sink cannot recover from a checkpoint). */
class TableStreamSpec extends AnyFunSuite with SparkSpec {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_tstream_spec_").toString

  private var n = 0
  private def freshTable(props: String = ""): (String, String) = {
    spark.conf.set("spark.sql.catalog.tst", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tst.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tst.t")
    n += 1
    val name = s"tst.t.tab$n"
    spark.sql(s"CREATE TABLE $name (id BIGINT, v BIGINT) " +
      s"USING `graft-versioned`$props")
    (name, s"$warehouse/t/tab$n")
  }

  private def insert(t: String, from: Long, until: Long): Unit =
    spark.sql(s"INSERT INTO $t SELECT id, id * 10 FROM range($from, $until)")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_tstream_${tag}_").toString

  /** AvailableNow drain into the memory sink (single-run tests). */
  private def runMem(root: String, ckpt: String, sink: String,
                     opts: Map[String, String] = Map.empty): org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = opts.foldLeft(
      spark.readStream.format("graft-versioned")) {
      case (r, (k, v)) => r.option(k, v)
    }
    val q = reader.load(root)
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }

  /** AvailableNow drain into a parquet sink — recoverable, so a second
    * call with the same checkpoint RESUMES. */
  private def runFile(root: String, ckpt: String, out: String,
                      opts: Map[String, String] = Map.empty): Unit = {
    val reader = opts.foldLeft(
      spark.readStream.format("graft-versioned")) {
      case (r, (k, v)) => r.option(k, v)
    }
    val q = reader.load(root)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("initial snapshot then appends; restart streams only the new commit") {
    val (t, root) = freshTable()
    insert(t, 0, 100)    // v=0
    insert(t, 100, 150)  // v=1
    insert(t, 150, 170)  // v=2
    val (ckpt, out) = (tmp("snap_ck"), tmp("snap_out"))
    runFile(root, ckpt, out)
    val first = spark.read.parquet(out)
    assert(first.count() === 170L, "first run must deliver the full snapshot")
    assert(first.agg(sum("v")).collect()(0).getLong(0) ===
      (0L until 170L).map(_ * 10).sum)
    // the snapshot base is pinned in the checkpoint
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(ckpt, "sources", "0", "graft_snapshot_base")))
    // append v=3 and resume from the same checkpoint: only its rows
    insert(t, 170, 200)
    runFile(root, ckpt, out)
    val resumed = spark.read.parquet(out)
    assert(resumed.count() === 200L,
      "resume must add exactly the new commit, never re-snapshot")
    assert(resumed.agg(sum("v")).collect()(0).getLong(0) ===
      (0L until 200L).map(_ * 10).sum)
  }

  test("startingVersion=0 replays every commit as its own new files") {
    val (t, root) = freshTable()
    insert(t, 0, 40)
    insert(t, 40, 90)
    insert(t, 90, 100)
    val q = runMem(root, tmp("sv0"), "ts_sv0",
      Map("startingVersion" -> "0", "maxVersionsPerTrigger" -> "1"))
    assert(spark.table("ts_sv0").count() === 100L)
    // one commit per micro-batch: per-batch row counts are the inserts
    assert(q.recentProgress.filter(_.numInputRows > 0)
      .map(_.numInputRows).sorted.toSeq === Seq(10L, 40L, 50L))
  }

  test("a copy-on-write DELETE breaks append semantics — fail loudly") {
    val (t, root) = freshTable()
    insert(t, 0, 50)
    val (ckpt, out) = (tmp("cow_ck"), tmp("cow_out"))
    runFile(root, ckpt, out)
    assert(spark.read.parquet(out).count() === 50L)
    spark.sql(s"DELETE FROM $t WHERE id < 10") // CoW: rewrites the file
    insert(t, 50, 60)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runFile(root, ckpt, out)
    }
    def messages(x: Throwable): String =
      if (x == null) "" else x.getMessage + messages(x.getCause)
    assert(messages(err).contains("not a pure append") &&
      messages(err).contains("skipChangeCommits"),
      s"error must name the contract and the option:\n${messages(err)}")
  }

  test("skipChangeCommits: the rewrite contributes nothing, appends keep flowing") {
    val (t, root) = freshTable()
    insert(t, 0, 50)
    val (ckpt, out) = (tmp("skip_ck"), tmp("skip_out"))
    val opts = Map("skipChangeCommits" -> "true")
    runFile(root, ckpt, out, opts)
    spark.sql(s"DELETE FROM $t WHERE id < 10")
    insert(t, 50, 60)
    runFile(root, ckpt, out, opts)
    val got = spark.read.parquet(out)
    // snapshot (50) + the append (10); the delete's rewrite is skipped
    // (Delta's contract: the sink does NOT see the deletion)
    assert(got.count() === 60L)
    assert(got.agg(max("id")).collect()(0).getLong(0) === 59L)
  }

  test("a deletion-vector DELETE is a change commit even with an identical file set") {
    val (t, root) = freshTable(" TBLPROPERTIES ('deletionVectors'='true')")
    insert(t, 0, 50)
    val (ckpt, out) = (tmp("dv_ck"), tmp("dv_out"))
    runFile(root, ckpt, out)
    assert(spark.read.parquet(out).count() === 50L)
    spark.sql(s"DELETE FROM $t WHERE id = 7") // DV: hard-links + sidecar
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runFile(root, ckpt, out)
    }
    def messages(x: Throwable): String =
      if (x == null) "" else x.getMessage + messages(x.getCause)
    assert(messages(err).contains("not a pure append"),
      "a DV mutation must not masquerade as an empty append")
  }

  test("the initial snapshot applies deletion vectors already in history") {
    val (t, root) = freshTable(" TBLPROPERTIES ('deletionVectors'='true')")
    insert(t, 0, 50)
    spark.sql(s"DELETE FROM $t WHERE id < 5")
    runMem(root, tmp("dvsnap"), "ts_dvsnap")
    val got = spark.table("ts_dvsnap")
    assert(got.count() === 45L, "snapshot must exclude DV'd rows")
    assert(got.agg(min("id")).collect()(0).getLong(0) === 5L)
  }

  test("admission: a 4-commit backlog drains one commit per batch") {
    val (t, root) = freshTable()
    (0 until 4).foreach(i => insert(t, i * 10, i * 10 + 10))
    val q = runMem(root, tmp("adm"), "ts_adm",
      Map("startingVersion" -> "0", "maxVersionsPerTrigger" -> "1"))
    assert(spark.table("ts_adm").count() === 40L)
    assert(q.recentProgress.count(_.numInputRows > 0) === 4,
      "cap 1 must yield one data batch per commit")
  }

  test("projection and pushed filters apply on the stream") {
    val (t, root) = freshTable(
      " TBLPROPERTIES ('clusterBy'='id', 'writePartitions'='2')")
    insert(t, 0, 1000)
    val q = spark.readStream.format("graft-versioned").load(root)
      .filter(col("id") >= 990L).select("v")
      .writeStream.format("memory").queryName("ts_proj")
      .option("checkpointLocation", tmp("proj"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ts_proj")
    assert(got.schema.fieldNames.toSeq === Seq("v"))
    assert(got.count() === 10L)
    assert(got.agg(sum("v")).collect()(0).getLong(0) ===
      (990L until 1000L).map(_ * 10).sum)
  }

  test("column mapping: a CATALOG stream over a renamed column reads mixed-name files") {
    // column mapping lives in the catalog's manifest; path-based reads
    // (batch AND stream) see physical names — stream through the
    // catalog to pick up the logical binding
    val (t, _) = freshTable()
    insert(t, 0, 30) // files store physical name 'v'
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO val")
    spark.sql(s"INSERT INTO $t SELECT id, id * 10 FROM range(30, 40)")
    val q = spark.readStream.table(t)
      .writeStream.format("memory").queryName("ts_ren")
      .option("checkpointLocation", tmp("ren"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ts_ren")
    assert(got.schema.fieldNames.toSeq === Seq("id", "val"))
    assert(got.count() === 40L)
    assert(got.agg(sum("val")).collect()(0).getLong(0) ===
      (0L until 40L).map(_ * 10).sum)
  }

  test("maxFilesPerTrigger packs commits by their new-file counts") {
    val (t, root) = freshTable(
      " TBLPROPERTIES ('clusterBy'='id', 'writePartitions'='2')")
    (0 until 3).foreach(i => insert(t, i * 100, i * 100 + 100)) // 2 files each
    // budget 4 files: v0+v1 fit one batch, v2 takes the next
    val q = runMem(root, tmp("mft"), "ts_mft",
      Map("startingVersion" -> "0", "maxFilesPerTrigger" -> "4"))
    assert(spark.table("ts_mft").count() === 300L)
    assert(q.recentProgress.filter(_.numInputRows > 0)
      .map(_.numInputRows).sorted.toSeq === Seq(100L, 200L),
      "4-file budget must pack two 2-file commits then the third")
    // a single over-budget commit still goes through alone (no stall)
    val (t2, root2) = freshTable(
      " TBLPROPERTIES ('clusterBy'='id', 'writePartitions'='3')")
    insert(t2, 0, 90)
    val q2 = runMem(root2, tmp("mft1"), "ts_mft1",
      Map("startingVersion" -> "0", "maxFilesPerTrigger" -> "1"))
    assert(spark.table("ts_mft1").count() === 90L)
    assert(q2.recentProgress.count(_.numInputRows > 0) === 1)
  }

  test("startingTimestamp replays from the first commit stamped at-or-after it") {
    val (t, root) = freshTable()
    insert(t, 0, 20)   // v=0
    insert(t, 20, 50)  // v=1
    insert(t, 50, 60)  // v=2
    val ts1 = graft.operators.Versioned.commitStamp(root, 1L)
      .getOrElse(fail("v=1 must be stamped"))
    runMem(root, tmp("sts"), "ts_sts",
      Map("startingTimestamp" -> ts1.toString))
    val got = spark.table("ts_sts")
    assert(got.count() === 40L, "v=1 and v=2 only — no snapshot, no v=0")
    assert(got.agg(min("id")).collect()(0).getLong(0) === 20L)
    // a timestamp after every stamp: nothing now, future appends stream
    val tsLate = graft.operators.Versioned.commitStamp(root, 2L).get + 1
    val (ckpt, out) = (tmp("sts2_ck"), tmp("sts2_out"))
    runFile(root, ckpt, out, Map("startingTimestamp" -> tsLate.toString))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out)) ||
      spark.read.parquet(out).isEmpty)
    insert(t, 60, 70) // v=3
    runFile(root, ckpt, out, Map("startingTimestamp" -> tsLate.toString))
    val resumed = spark.read.parquet(out)
    assert(resumed.count() === 10L)
    assert(resumed.agg(min("id")).collect()(0).getLong(0) === 60L)
  }

  test("startingVersion and startingTimestamp are mutually exclusive") {
    val (t, root) = freshTable()
    insert(t, 0, 10)
    val e = intercept[Exception] {
      runMem(root, tmp("excl"), "ts_excl",
        Map("startingVersion" -> "0", "startingTimestamp" -> "1"))
    }
    def messages(x: Throwable): String =
      if (x == null) "" else x.getMessage + messages(x.getCause)
    assert(messages(e).contains("mutually exclusive"))
  }

  test("malformed options fail loudly with the option's name") {
    val (t, root) = freshTable()
    insert(t, 0, 10)
    def fails(opts: Map[String, String], needle: String): Unit = {
      val e = intercept[Exception] {
        runMem(root, tmp("bad"), s"ts_bad$needle$n", opts)
      }
      def messages(x: Throwable): String =
        if (x == null) "" else x.getMessage + messages(x.getCause)
      assert(messages(e).contains(needle), s"got: ${messages(e)}")
    }
    fails(Map("startingVersion" -> "abc"), "startingVersion")
    fails(Map("maxVersionsPerTrigger" -> "0"), "maxVersionsPerTrigger")
    fails(Map("maxFilesPerTrigger" -> "-3"), "maxFilesPerTrigger")
    fails(Map("startingTimestamp" -> "noon"), "startingTimestamp")
  }
}
