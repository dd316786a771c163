package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Versioned

/** Admission control on the change-feed source: a resumed stream must
  * drain an N-commit backlog in bounded, individually-checkpointed
  * micro-batches (`maxVersionsPerTrigger`), never one giant
  * all-or-nothing batch — the reference's own fetcher caps a drain at a
  * fixed batch size (fetcher_dag_factory.py:77-79). */
class ChangeFeedAdmissionSpec extends AnyFunSuite with SparkSpec {

  private def newRoot(commits: Int, from: Int = 0): String = {
    val r = java.nio.file.Files.createTempDirectory("graft_admission_").toString
    appendCommits(r, from, commits)
    r
  }

  private def appendCommits(root: String, from: Int, n: Int): Unit = {
    import spark.implicits._
    (from until from + n).foreach { i =>
      // each commit adds one fresh row -> one 'added' feed row
      val rows = (0 to i).map(k => (k.toLong, k * 10L + i))
      Versioned.writeNextWithFeed(rows.toDF("id", "price"), root,
        Seq("id"), Seq("price"), Some(1000L + i))
    }
  }

  private def drain(root: String, ckpt: String, name: String,
                    maxPerTrigger: Option[Int]): org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.format("graft-versioned")
      .option("changeFeed", "true")
    val q = maxPerTrigger.fold(reader)(n =>
        reader.option("maxVersionsPerTrigger", n.toString))
      .load(root)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }

  private def committedBatches(ckpt: String): Int = {
    val d = java.nio.file.Paths.get(ckpt, "commits")
    val s = java.nio.file.Files.list(d)
    try s.iterator().asScala.count(_.getFileName.toString.forall(_.isDigit))
    finally s.close()
  }

  test("an N-commit backlog drains in N checkpointed batches at cap 1") {
    val root = newRoot(4)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_adm_ckpt1_").toString
    val q = drain(root, ckpt, "adm_cap1", Some(1))
    val got = spark.table("adm_cap1")
    // content identical to an uncapped drain: every feed row, once
    assert(got.count() ===
      Versioned.feedVersions(root).map(v =>
        spark.read.parquet(Versioned.feedDir(root, v)).count()).sum)
    assert(got.select("commit_version").distinct().count() === 4L)
    // one commit per micro-batch: 4 data batches, each checkpointed
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches === 4,
      s"expected 4 bounded batches, got $dataBatches")
    assert(committedBatches(ckpt) >= 4)
    // every non-empty batch carried exactly ONE commit's feed: commit i
    // feeds 1 added + i changed rows, so per-batch row counts must be
    // exactly {1,2,3,4} — a merged batch would show a sum instead
    assert(q.recentProgress.filter(_.numInputRows > 0)
      .map(_.numInputRows).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("cap 2 over 5 commits drains in ceil(5/2)=3 batches to the pinned target") {
    val root = newRoot(5)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_adm_ckpt2_").toString
    val q = drain(root, ckpt, "adm_cap2", Some(2))
    assert(spark.table("adm_cap2")
      .select("commit_version").distinct().count() === 5L)
    assert(q.recentProgress.count(_.numInputRows > 0) === 3)
  }

  test("resume from a mid-backlog checkpoint continues, no replay, still capped") {
    val root = newRoot(2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_adm_ckpt3_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_adm_out_").toString
    // file sink (memory sink cannot recover a checkpoint): two runs
    // share ckpt + out, so replayed rows would show up as duplicates
    def run(cap: Int): org.apache.spark.sql.streaming.StreamingQuery = {
      val q = spark.readStream.format("graft-versioned")
        .option("changeFeed", "true")
        .option("maxVersionsPerTrigger", cap.toString)
        .load(root)
        .select("id", "change_type", "commit_version")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q
    }
    run(1)
    assert(spark.read.parquet(out)
      .select("commit_version").distinct().count() === 2L)
    // two MORE commits land while the stream is down
    appendCommits(root, from = 2, n = 2)
    val q2 = run(1)
    val got = spark.read.parquet(out)
    // the resumed run read ONLY the backlog (offsets came from the
    // checkpoint, not startingVersion), one commit per batch, no replay
    assert(got.select("commit_version").distinct().count() === 4L)
    assert(got.groupBy("commit_version", "id", "change_type").count()
      .filter(col("count") > 1).count() === 0L, "replayed feed rows")
    assert(q2.recentProgress.count(_.numInputRows > 0) === 2)
  }

  test("maxBytesPerTrigger caps the drain by stored-feed byte sums") {
    val root = newRoot(4)
    val perCommit = Versioned.feedVersions(root).map(v =>
      Versioned.dataFiles(java.nio.file.Paths.get(Versioned.feedDir(root, v)))
        .map(java.nio.file.Files.size(_)).sum)
    // budget covers any single commit but never two adjacent ones —
    // the byte cap must degrade to one commit per batch
    val budget = perCommit.max
    assert(perCommit.sliding(2).forall(_.sum > budget),
      "fixture regression: two adjacent feeds fit the budget")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_adm_ckptb_").toString
    val q = spark.readStream.format("graft-versioned")
      .option("changeFeed", "true")
      .option("maxBytesPerTrigger", budget.toString)
      .load(root)
      .writeStream.format("memory").queryName("adm_bytes")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("adm_bytes")
      .select("commit_version").distinct().count() === 4L)
    assert(q.recentProgress.count(_.numInputRows > 0) === 4,
      "a budget below any two adjacent commits must admit one per batch")
  }

  test("an over-budget single commit still goes through alone (no stall)") {
    val root = newRoot(2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_adm_ckpts_").toString
    val q = spark.readStream.format("graft-versioned")
      .option("changeFeed", "true")
      .option("maxBytesPerTrigger", "1") // every commit is over budget
      .load(root)
      .writeStream.format("memory").queryName("adm_stall")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("adm_stall")
      .select("commit_version").distinct().count() === 2L)
    assert(q.recentProgress.count(_.numInputRows > 0) === 2)
  }

  test("no cap keeps the single-batch drain; bad caps fail loudly") {
    val root = newRoot(3)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_adm_ckpt4_").toString
    val q = drain(root, ckpt, "adm_uncapped", None)
    assert(spark.table("adm_uncapped")
      .select("commit_version").distinct().count() === 3L)
    assert(q.recentProgress.count(_.numInputRows > 0) === 1)
    val err = intercept[Exception] {
      drain(root, java.nio.file.Files.createTempDirectory("graft_adm_bad_").toString,
        "adm_bad", Some(0))
    }
    assert(err.getMessage.contains("maxVersionsPerTrigger"))
    // a malformed value fails with the same option-named message as a
    // non-positive one, not a bare NumberFormatException
    val malformed = intercept[Exception] {
      spark.readStream.format("graft-versioned")
        .option("changeFeed", "true")
        .option("maxVersionsPerTrigger", "abc")
        .load(root)
        .writeStream.format("memory").queryName("adm_malformed")
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory("graft_adm_badopt_").toString)
        .trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
    }
    assert(malformed.getMessage.contains("maxVersionsPerTrigger") ||
      String.valueOf(malformed.getCause).contains("maxVersionsPerTrigger"))
  }
}
