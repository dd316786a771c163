package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Incremental aggregate maintenance: increment ≡ recompute, zero-count
  * key removal, loud negative-count failure. */
class IvmSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("applyAggDelta equals a recompute, drops keys emptied by retraction") {
    val base = Seq((1L, 2L, 30L), (2L, 1L, 5L), (3L, 1L, 7L))
      .toDF("k", "n", "s")
    val delta = Seq(
      (1L, 1L, 10L),   // insert: k1 -> n=3, s=40
      (2L, -1L, 5L),   // retract the only row: k2 gone
      (4L, 1L, 9L))    // brand-new key
      .toDF("k", "sign", "v")
    val out = Ivm.applyAggDelta(base, delta, Seq("k"), "n", "s", "sign", "v")
      .orderBy("k").collect()
    assert(out.toSeq === Seq(Row(1L, 3L, 40L), Row(3L, 1L, 7L), Row(4L, 1L, 9L)))
  }

  test("a delta retracting rows the base never had fails loudly") {
    val base = Seq((1L, 1L, 10L)).toDF("k", "n", "s")
    val delta = Seq((1L, -1L, 10L), (1L, -1L, 99L)).toDF("k", "sign", "v")
    val ex = intercept[Exception] {
      Ivm.applyAggDelta(base, delta, Seq("k"), "n", "s", "sign", "v").collect()
    }
    assert(ex.getMessage.contains("negative")
      || ex.getCause != null && ex.getCause.getMessage.contains("negative"))
  }

  test("continuousAggMaintenance: drain, checkpoint resume, replayed batch is a no-op") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ivm_stream_").toString
    val feedRoot = s"$dir/feed"
    val stateRoot = s"$dir/state"
    val ckpt = s"$dir/ckpt"
    val v0 = (1L to 4L).map(k => (k, k * 10L)).toDF("k", "v")
    Versioned.writeNextWithFeed(v0, feedRoot, Seq("k"), Seq("v"))
    v0.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .write.format("graft-versioned").option("create", "true")
      .mode("append").save(stateRoot)
    // v1: k=1 updated, k=2 removed, k=5 added
    Versioned.writeNextWithFeed(
      Seq((1L, 100L), (3L, 30L), (4L, 40L), (5L, 50L)).toDF("k", "v"),
      feedRoot, Seq("k"), Seq("v"))
    def toDelta(feed: DataFrame): DataFrame =
      feed.where(col("change_type").isin("changed", "removed"))
        .select(col("k"), lit(-1L).as("sign"), col("old_v").as("v"))
        .unionByName(feed.where(col("change_type").isin("changed", "added"))
          .select(col("k"), lit(1L).as("sign"), col("new_v").as("v")))
    def drain(): Long = {
      val q = Ivm.continuousAggMaintenance(spark, feedRoot, stateRoot,
        ckpt, Seq("k"), "n", "s", toDelta _, appId = "ivm_spec")
      q.awaitTermination()
      q.recentProgress.map(_.numInputRows).sum
    }
    assert(drain() > 0L)
    def state(): Seq[Row] = spark.read.format("graft-versioned")
      .load(stateRoot).orderBy("k").collect().toSeq
    assert(state() === Seq(Row(1L, 1L, 100L), Row(3L, 1L, 30L),
      Row(4L, 1L, 40L), Row(5L, 1L, 50L)))
    // crash-replay: a state commit re-arriving with an already-
    // committed txnVersion must change nothing (exactly-once)
    val versionsBefore = Versioned.versions(stateRoot)
    Seq((99L, 99L, 99L)).toDF("k", "n", "s")
      .write.format("graft-versioned")
      .option("txnAppId", "ivm_spec").option("txnVersion", "0")
      .mode("overwrite").save(stateRoot)
    assert(Versioned.versions(stateRoot) === versionsBefore,
      "replayed txnVersion must not commit")
    assert(state() === Seq(Row(1L, 1L, 100L), Row(3L, 1L, 30L),
      Row(4L, 1L, 40L), Row(5L, 1L, 50L)))
    // checkpoint resume: a second commit drains alone, fold continues
    Versioned.writeNextWithFeed(
      Seq((1L, 100L), (3L, 33L), (4L, 40L)).toDF("k", "v"),
      feedRoot, Seq("k"), Seq("v"))
    assert(drain() > 0L)
    assert(state() === Seq(Row(1L, 1L, 100L), Row(3L, 1L, 33L),
      Row(4L, 1L, 40L)))
  }

  test("continuousAggMaintenanceMerge: O(changed groups), resume, replayed MERGE is a no-op") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ivm_merge_").toString
    val feedRoot = s"$dir/feed"
    val ckpt = s"$dir/ckpt"
    spark.conf.set("spark.sql.catalog.ivm", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ivm.warehouse", s"$dir/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ivm.t")
    spark.sql("DROP TABLE IF EXISTS ivm.t.state")
    spark.sql("CREATE TABLE ivm.t.state (k BIGINT, n BIGINT, s BIGINT) " +
      "USING `graft-versioned` TBLPROPERTIES ('deletionVectors'='true', " +
      "'clusterBy'='k')")
    val v0 = (1L to 4L).map(k => (k, k * 10L)).toDF("k", "v")
    Versioned.writeNextWithFeed(v0, feedRoot, Seq("k"), Seq("v"))
    v0.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .createOrReplaceTempView("ivm_seed")
    spark.sql("INSERT INTO ivm.t.state SELECT k, n, s FROM ivm_seed")
    // v1: k=1 updated, k=2 removed, k=5 added
    Versioned.writeNextWithFeed(
      Seq((1L, 100L), (3L, 30L), (4L, 40L), (5L, 50L)).toDF("k", "v"),
      feedRoot, Seq("k"), Seq("v"))
    def toDelta(feed: DataFrame): DataFrame =
      feed.where(col("change_type").isin("changed", "removed"))
        .select(col("k"), lit(-1L).as("sign"), col("old_v").as("v"))
        .unionByName(feed.where(col("change_type").isin("changed", "added"))
          .select(col("k"), lit(1L).as("sign"), col("new_v").as("v")))
    def drain(): Long = {
      val q = Ivm.continuousAggMaintenanceMerge(spark, feedRoot,
        "ivm.t.state", ckpt, Seq("k"), "n", "s", toDelta _,
        appId = "ivm_merge_spec")
      q.awaitTermination()
      q.recentProgress.map(_.numInputRows).sum
    }
    assert(drain() > 0L)
    def state(): Seq[Row] = spark.table("ivm.t.state")
      .orderBy("k").collect().toSeq
    assert(state() === Seq(Row(1L, 1L, 100L), Row(3L, 1L, 30L),
      Row(4L, 1L, 40L), Row(5L, 1L, 50L)))
    val stateRoot = s"$dir/wh/t/state"
    // O(changed groups): the fold commit carried every seed data file
    // as a HARD LINK (same inode) — merge-on-read, not a rewrite
    def ino(p: java.nio.file.Path): Long = java.nio.file.Files
      .getAttribute(p, "unix:ino").asInstanceOf[Long]
    val vCur = Versioned.latestVersion(stateRoot).get
    val seed = Versioned.dataFiles(
      java.nio.file.Paths.get(stateRoot, "v=0"))
      .map(f => f.getFileName.toString -> ino(f)).toMap
    val cur = Versioned.dataFiles(
      java.nio.file.Paths.get(stateRoot, s"v=$vCur"))
      .map(f => f.getFileName.toString -> ino(f)).toMap
    assert(seed.keySet.subsetOf(cur.keySet), "seed files must carry")
    seed.foreach { case (nm, i) => assert(cur(nm) === i,
      s"state file $nm must hard-link through the fold, not rewrite") }
    // crash-replay: a MERGE re-arriving with an already-committed
    // txnVersion must change nothing (merge-on-read exactly-once)
    val versionsBefore = Versioned.versions(stateRoot)
    Seq((1L, 1L, 999L)).toDF("k", "dn", "ds")
      .createOrReplaceTempView("ivm_replay_delta")
    spark.conf.set("graft.versioned.txnAppId", "ivm_merge_spec")
    spark.conf.set("graft.versioned.txnVersion", "0")
    try spark.sql("""MERGE INTO ivm.t.state t USING ivm_replay_delta d
      ON t.k = d.k
      WHEN MATCHED THEN UPDATE SET n = t.n + d.dn, s = t.s + d.ds""")
    finally {
      spark.conf.unset("graft.versioned.txnAppId")
      spark.conf.unset("graft.versioned.txnVersion")
    }
    assert(Versioned.versions(stateRoot) === versionsBefore,
      "replayed txnVersion must not commit a merge-on-read delta")
    assert(state() === Seq(Row(1L, 1L, 100L), Row(3L, 1L, 30L),
      Row(4L, 1L, 40L), Row(5L, 1L, 50L)))
    // checkpoint resume: a second commit drains alone, fold continues;
    // a zero-count group (k=5 removed) leaves the state
    Versioned.writeNextWithFeed(
      Seq((1L, 100L), (3L, 33L), (4L, 40L)).toDF("k", "v"),
      feedRoot, Seq("k"), Seq("v"))
    assert(drain() > 0L)
    assert(state() === Seq(Row(1L, 1L, 100L), Row(3L, 1L, 33L),
      Row(4L, 1L, 40L)))
  }

  test("merge-fold bounds render temporal literals (the date-keyed MV shape)") {
    import java.sql.{Date, Timestamp}
    assert(Ivm.boundsLiteral(Date.valueOf("2024-03-07"))
      === Some("DATE'2024-03-07'"))
    assert(Ivm.boundsLiteral(java.time.LocalDate.parse("2024-03-07"))
      === Some("DATE'2024-03-07'"))
    assert(Ivm.boundsLiteral(
        Timestamp.from(java.time.Instant.parse("2024-03-07T01:02:03.500Z")))
      === Some("TIMESTAMP'2024-03-07T01:02:03.500Z'"))
    assert(Ivm.boundsLiteral(java.time.Instant.parse("2024-03-07T01:02:03Z"))
      === Some("TIMESTAMP'2024-03-07T01:02:03Z'"))
    assert(Ivm.boundsLiteral(
        java.time.LocalDateTime.parse("2024-03-07T01:02:03"))
      === Some("TIMESTAMP_NTZ'2024-03-07 01:02:03'"))
    assert(Ivm.boundsLiteral(null) === None)
    assert(Ivm.boundsLiteral(BigDecimal(1)) === None)
  }

  test("boundsLiteral renders java.sql.Timestamp as a UTC instant " +
      "regardless of the JVM default zone") {
    val tzPrev = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("Asia/Tehran"))
      // Timestamp.toString would render '2024-03-07 04:32:03.5' here
      // (Tehran wall time, +03:30, NO zone marker) — a zoneless literal
      // the UTC session would re-anchor 3.5 h off. The instant form
      // carries its own Z.
      val t = java.sql.Timestamp.from(
        java.time.Instant.parse("2024-03-07T01:02:03.500Z"))
      assert(Ivm.boundsLiteral(t) === Some("TIMESTAMP'2024-03-07T01:02:03.500Z'"))
    } finally java.util.TimeZone.setDefault(tzPrev)
  }

  test("continuousAggMaintenanceMerge on a DATE key: fold + file prune") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ivm_date_").toString
    val feedRoot = s"$dir/feed"
    val ckpt = s"$dir/ckpt"
    spark.conf.set("spark.sql.catalog.ivmd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ivmd.warehouse", s"$dir/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ivmd.t")
    spark.sql("DROP TABLE IF EXISTS ivmd.t.state")
    spark.sql("CREATE TABLE ivmd.t.state (d DATE, n BIGINT, s BIGINT) " +
      "USING `graft-versioned` TBLPROPERTIES ('deletionVectors'='true', " +
      "'clusterBy'='d', 'writePartitions'='8')")
    // 64 daily groups clustered across 8 files
    val v0 = (0 until 64).map(i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        (i % 5) * 10L)).toDF("d", "v")
    Versioned.writeNextWithFeed(v0, feedRoot, Seq("d"), Seq("v"))
    v0.groupBy("d").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .createOrReplaceTempView("ivmd_seed")
    spark.sql("INSERT INTO ivmd.t.state SELECT d, n, s FROM ivmd_seed")
    val stateRoot = s"$dir/wh/t/state"
    assert(Versioned.dataFiles(java.nio.file.Paths.get(stateRoot, "v=0"))
      .size >= 4, "need a multi-file clustered layout to measure pruning")
    // v1: only 2024-01-10 changes
    val v1 = v0.withColumn("v",
      when(col("d") === lit(java.sql.Date.valueOf("2024-01-10")),
        col("v") + 7L).otherwise(col("v")))
    Versioned.writeNextWithFeed(v1, feedRoot, Seq("d"), Seq("v"))
    def toDelta(feed: DataFrame): DataFrame =
      feed.where(col("change_type").isin("changed", "removed"))
        .select(col("d"), lit(-1L).as("sign"), col("old_v").as("v"))
        .unionByName(feed.where(col("change_type").isin("changed", "added"))
          .select(col("d"), lit(1L).as("sign"), col("new_v").as("v")))
    val q = Ivm.continuousAggMaintenanceMerge(spark, feedRoot,
      "ivmd.t.state", ckpt, Seq("d"), "n", "s", toDelta _,
      appId = "ivm_date_spec")
    q.awaitTermination()
    // fold correctness ≡ recompute
    val expect = v1.groupBy("d").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("d").collect().toSeq
    assert(spark.table("ivmd.t.state").orderBy("d").collect().toSeq === expect)
    // the read side pruned: the bounds conjunct the fold rendered for
    // the single changed date must keep ~1 clustered file. The probe
    // replays the EXACT predicate shape the fold pushes (IS NULL OR
    // range) — if DATE literals failed to render, the fold would have
    // scanned everything and this shape is what proves the prune.
    val lit10 = Ivm.boundsLiteral(java.sql.Date.valueOf("2024-01-10")).get
    val probe = spark.sql("SELECT d, n, s FROM ivmd.t.state " +
      s"WHERE d IS NULL OR (d >= $lit10 AND d <= $lit10)")
    probe.collect()
    val desc = probe.queryExecution.executedPlan.toString
    val m = "DataFiles: (\\d+)/(\\d+)".r.findFirstMatchIn(desc)
    assert(m.isDefined, s"no DataFiles marker in scan:\n$desc")
    val (kept, total) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(total >= 4 && kept <= math.max(2, total / 4),
      s"date-bounds predicate kept $kept/$total state files — no prune")
    // and the fold itself was merge-on-read: every untouched seed
    // state file hard-links through (write side O(changes))
    def ino(p: java.nio.file.Path): Long = java.nio.file.Files
      .getAttribute(p, "unix:ino").asInstanceOf[Long]
    val vCur = Versioned.latestVersion(stateRoot).get
    val seed = Versioned.dataFiles(java.nio.file.Paths.get(stateRoot, "v=0"))
      .map(f => f.getFileName.toString -> ino(f)).toMap
    val cur = Versioned.dataFiles(
      java.nio.file.Paths.get(stateRoot, s"v=$vCur"))
      .map(f => f.getFileName.toString -> ino(f)).toMap
    assert(seed.keySet.subsetOf(cur.keySet), "seed files must carry")
    seed.foreach { case (nm, i) => assert(cur(nm) === i,
      s"state file $nm must hard-link through the date-keyed fold") }
  }

  test("continuousMinMaxMaintenance: dirty-group recompute, resume, " +
      "replayed MERGE is a no-op") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ivm_mm_").toString
    val srcRoot = s"$dir/src"
    val ckpt = s"$dir/ckpt"
    spark.conf.set("spark.sql.catalog.ivmm", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ivmm.warehouse", s"$dir/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ivmm.t")
    spark.sql("DROP TABLE IF EXISTS ivmm.t.state")
    spark.sql("CREATE TABLE ivmm.t.state " +
      "(k BIGINT, mn BIGINT, mx BIGINT, n BIGINT) " +
      "USING `graft-versioned` TBLPROPERTIES ('deletionVectors'='true', " +
      "'clusterBy'='k')")
    val v0 = Seq((1L, 1L, 10L), (2L, 1L, 20L), (3L, 1L, 30L),
      (4L, 2L, 40L), (5L, 2L, 50L)).toDF("id", "k", "v")
    Versioned.writeNextWithFeed(v0, srcRoot, Seq("id"), Seq("k", "v"))
    v0.groupBy("k").agg(min("v").as("mn"), max("v").as("mx"),
      count(lit(1)).as("n")).createOrReplaceTempView("mm_seed")
    spark.sql("INSERT INTO ivmm.t.state SELECT k, mn, mx, n FROM mm_seed")
    // v1: k=1 loses its MAX row (id 3) — the fold-impossible case —
    // and its min LOWERS (id 1: 10 → 5); k=2 vanishes; k=6 appears
    val v1 = Seq((1L, 1L, 5L), (2L, 1L, 20L), (6L, 6L, 60L))
      .toDF("id", "k", "v")
    Versioned.writeNextWithFeed(v1, srcRoot, Seq("id"), Seq("k", "v"))
    def toDirty(feed: DataFrame): DataFrame =
      feed.select(col("new_k").as("k"))
        .unionByName(feed.select(col("old_k").as("k")))
        .filter(col("k").isNotNull)
    def drain(): Unit = Ivm.continuousMinMaxMaintenance(spark, srcRoot,
      "ivmm.t.state", ckpt, Seq("k"), "v", "mn", "mx", "n",
      toDirty _, appId = "ivm_mm_spec").awaitTermination()
    drain()
    def state(): Seq[Row] = spark.table("ivmm.t.state")
      .orderBy("k").collect().toSeq
    assert(state() === Seq(Row(1L, 5L, 20L, 2L), Row(6L, 60L, 60L, 1L)))
    // replayed txnVersion: nothing commits
    val stateRoot = s"$dir/wh/t/state"
    val before = Versioned.versions(stateRoot)
    Seq((1L, 0L, 0L, 0L)).toDF("k", "mn", "mx", "n")
      .createOrReplaceTempView("mm_replay")
    spark.conf.set("graft.versioned.txnAppId", "ivm_mm_spec")
    spark.conf.set("graft.versioned.txnVersion", "0")
    try spark.sql("""MERGE INTO ivmm.t.state t USING mm_replay d
      ON t.k = d.k WHEN MATCHED THEN UPDATE SET mn = d.mn""")
    finally {
      spark.conf.unset("graft.versioned.txnAppId")
      spark.conf.unset("graft.versioned.txnVersion")
    }
    assert(Versioned.versions(stateRoot) === before,
      "replayed txnVersion must not commit")
    assert(state() === Seq(Row(1L, 5L, 20L, 2L), Row(6L, 60L, 60L, 1L)))
    // resume: a further commit RAISES k=1's max (insert-only case)
    Versioned.writeNextWithFeed(
      Seq((1L, 1L, 5L), (2L, 1L, 99L), (6L, 6L, 60L)).toDF("id", "k", "v"),
      srcRoot, Seq("id"), Seq("k", "v"))
    drain()
    assert(state() === Seq(Row(1L, 5L, 99L, 2L), Row(6L, 60L, 60L, 1L)))
  }

  test("continuousMinMaxMaintenance on a TIMESTAMP key is exact under a " +
      "non-UTC JVM default zone (state ≡ recompute)") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val tzPrev = java.util.TimeZone.getDefault
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("Asia/Tehran"))
    try {
      val dir = java.nio.file.Files.createTempDirectory("ivm_tz_").toString
      val srcRoot = s"$dir/src"
      val ckpt = s"$dir/ckpt"
      spark.conf.set("spark.sql.catalog.ivmz", "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.ivmz.warehouse", s"$dir/wh")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS ivmz.t")
      spark.sql("DROP TABLE IF EXISTS ivmz.t.state")
      spark.sql("CREATE TABLE ivmz.t.state " +
        "(ts TIMESTAMP, mn BIGINT, mx BIGINT, n BIGINT) " +
        "USING `graft-versioned` TBLPROPERTIES ('deletionVectors'='true', " +
        "'clusterBy'='ts')")
      def at(s: String): java.sql.Timestamp =
        java.sql.Timestamp.from(java.time.Instant.parse(s))
      val h0 = at("2024-03-07T00:00:00Z")
      val h1 = at("2024-03-07T01:00:00Z")
      val v0 = Seq((1L, h0, 10L), (2L, h0, 30L), (3L, h1, 50L))
        .toDF("id", "ts", "v")
      Versioned.writeNextWithFeed(v0, srcRoot, Seq("id"), Seq("ts", "v"))
      v0.groupBy("ts").agg(min("v").as("mn"), max("v").as("mx"),
        count(lit(1)).as("n")).createOrReplaceTempView("tz_seed")
      spark.sql("INSERT INTO ivmz.t.state SELECT ts, mn, mx, n FROM tz_seed")
      // the h0 group loses its max row and gains a lower min — with the
      // JVM-zone toString literal the recompute filter lands 3.5 h off
      // the dirty hour and this group would be wrongly DELETEd/skipped
      val v1 = Seq((1L, h0, 5L), (3L, h1, 50L), (4L, h0, 12L))
        .toDF("id", "ts", "v")
      Versioned.writeNextWithFeed(v1, srcRoot, Seq("id"), Seq("ts", "v"))
      def toDirty(feed: DataFrame): DataFrame =
        feed.select(col("new_ts").as("ts"))
          .unionByName(feed.select(col("old_ts").as("ts")))
          .filter(col("ts").isNotNull)
      Ivm.continuousMinMaxMaintenance(spark, srcRoot, "ivmz.t.state", ckpt,
        Seq("ts"), "v", "mn", "mx", "n", toDirty _,
        appId = "ivm_tz_spec").awaitTermination()
      val expect = v1.groupBy("ts").agg(min("v").as("mn"), max("v").as("mx"),
        count(lit(1)).as("n")).orderBy("ts").collect().toSeq
      assert(spark.table("ivmz.t.state").orderBy("ts").collect().toSeq
        === expect)
    } finally java.util.TimeZone.setDefault(tzPrev)
  }

  test("continuousMinMaxMaintenance recomputes NULL-keyed dirty groups " +
      "(null-safe semi/left joins)") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ivm_nullk_").toString
    val srcRoot = s"$dir/src"
    val ckpt = s"$dir/ckpt"
    spark.conf.set("spark.sql.catalog.ivmn", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ivmn.warehouse", s"$dir/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ivmn.t")
    spark.sql("DROP TABLE IF EXISTS ivmn.t.state")
    spark.sql("CREATE TABLE ivmn.t.state " +
      "(k BIGINT, mn BIGINT, mx BIGINT, n BIGINT) " +
      "USING `graft-versioned` TBLPROPERTIES ('deletionVectors'='true', " +
      "'clusterBy'='k')")
    val v0 = Seq((1L, Option(1L), 10L), (2L, None, 20L), (3L, None, 30L))
      .toDF("id", "k", "v")
    Versioned.writeNextWithFeed(v0, srcRoot, Seq("id"), Seq("k", "v"))
    v0.groupBy("k").agg(min("v").as("mn"), max("v").as("mx"),
      count(lit(1)).as("n")).createOrReplaceTempView("nullk_seed")
    spark.sql("INSERT INTO ivmn.t.state SELECT k, mn, mx, n FROM nullk_seed")
    // the NULL group changes (id 2: 20 → 25) and grows (id 4, v=7);
    // null-unsafe dirty joins would leave its recompute NULL and the
    // MERGE would DELETE the NULL-key state group while rows remain
    val v1 = Seq((1L, Option(1L), 10L), (2L, None, 25L), (3L, None, 30L),
      (4L, None, 7L)).toDF("id", "k", "v")
    Versioned.writeNextWithFeed(v1, srcRoot, Seq("id"), Seq("k", "v"))
    def toDirty(feed: DataFrame): DataFrame =
      feed.select(col("new_k").as("k"))
        .unionByName(feed.select(col("old_k").as("k")))
    Ivm.continuousMinMaxMaintenance(spark, srcRoot, "ivmn.t.state", ckpt,
      Seq("k"), "v", "mn", "mx", "n", toDirty _,
      appId = "ivm_nullk_spec").awaitTermination()
    assert(spark.table("ivmn.t.state").orderBy(col("k").asc_nulls_first)
      .collect().toSeq
      === Seq(Row(null, 7L, 30L, 3L), Row(1L, 10L, 10L, 1L)))
  }

  test("empty delta is the identity; empty base passes inserts through") {
    val base = Seq((1L, 1L, 10L)).toDF("k", "n", "s")
    val noDelta = Seq.empty[(Long, Long, Long)].toDF("k", "sign", "v")
    assert(Ivm.applyAggDelta(base, noDelta, Seq("k"), "n", "s", "sign", "v")
      .collect().toSeq === Seq(Row(1L, 1L, 10L)))
    val noBase = Seq.empty[(Long, Long, Long)].toDF("k", "n", "s")
    val ins = Seq((7L, 1L, 3L)).toDF("k", "sign", "v")
    assert(Ivm.applyAggDelta(noBase, ins, Seq("k"), "n", "s", "sign", "v")
      .collect().toSeq === Seq(Row(7L, 1L, 3L)))
  }
}
