package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** `PARTITIONED BY (days(ts))` / months / years / hours — Iceberg's
  * temporal transforms via the generated-column mapping: a
  * `<col>_days` truncation column materializes writer-side, inserts
  * range-cluster on the SOURCE timestamp (truncation is monotone in
  * it, so ordering by the source IS ordering by the transform), the
  * writer rolls files at day boundaries, and a time-range predicate
  * prunes files through the raw timestamp's stats — directory
  * pruning semantics without a frozen dir layout. */
class TemporalPartitionSpec extends AnyFunSuite with SparkSpec {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_temporal_spec_").toString

  private def cat(): Unit = {
    spark.conf.set("spark.sql.catalog.tmp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tmp.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tmp.t")
  }

  // 6 days of hourly events in ONE insert — shared by several tests
  private def ensureEv(): Unit = {
    cat()
    if (spark.catalog.tableExists("tmp.t.ev")) return
    spark.sql("CREATE TABLE tmp.t.ev (id BIGINT, ts TIMESTAMP, v BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO tmp.t.ev (id, ts, v) SELECT id, " +
      "timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0,id*3600), " +
      "id FROM range(0, 144)")
  }

  test("days(ts) maps to a generated date column; files pin one day each") {
    ensureEv()
    val props = spark.sql("SHOW TBLPROPERTIES tmp.t.ev").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("partitionedBy") === "days(ts)")
    assert(props("clusterBy") === "ts_days")
    val root = java.nio.file.Paths.get(warehouse, "t", "ev")
    val v = graft.operators.Versioned.latestVersion(root.toString).get
    val vdir = root.resolve(s"v=$v")
    val stats = graft.operators.FileStats.read(vdir)
    val files = graft.operators.Versioned.dataFiles(vdir)
    assert(files.nonEmpty)
    files.foreach { f =>
      val cs = stats(f.getFileName.toString).cols("ts_days")
      assert(cs.lo.isDefined && cs.lo == cs.hi,
        s"${f.getFileName}: must pin one day, got ${cs.lo} .. ${cs.hi}")
    }
    // the generated column equals its truncation for every row
    assert(spark.sql("SELECT count(*) FROM tmp.t.ev " +
      "WHERE ts_days != CAST(ts AS DATE)").collect()(0).getLong(0) === 0L)
    assert(spark.table("tmp.t.ev").count() === 144L)
  }

  test("a time-range predicate prunes files like directory pruning would") {
    ensureEv()
    val q = spark.sql("SELECT sum(v) AS s FROM tmp.t.ev " +
      "WHERE ts >= timestamp'2024-03-03 00:00:00' " +
      "AND ts < timestamp'2024-03-04 00:00:00'")
    val plan = q.queryExecution.executedPlan.toString
    val m = """DataFiles: (\d+)/(\d+)""".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"no prune report in:\n$plan")
    val (kept, total) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(total >= 6, s"expected >= 6 files (one per day), got $total")
    assert(kept < total, s"time-range scan must prune: $kept/$total")
    // day 3 = ids 48..71 (24 hourly events)
    assert(q.collect()(0).getLong(0) === (48L until 72L).sum)
  }

  test("months over DATE and hours over TIMESTAMP_NTZ derive typed columns") {
    cat()
    spark.sql("DROP TABLE IF EXISTS tmp.t.m")
    spark.sql("CREATE TABLE tmp.t.m (id BIGINT, d DATE) " +
      "USING `graft-versioned` PARTITIONED BY (months(d))")
    spark.sql("INSERT INTO tmp.t.m (id, d) SELECT id, " +
      "date'2024-01-15' + CAST(id * 20 AS INT) FROM range(0, 10)")
    assert(spark.sql("SELECT count(*) FROM tmp.t.m " +
      "WHERE d_months != make_date(year(d), month(d), 1)")
      .collect()(0).getLong(0) === 0L)
    val f = spark.table("tmp.t.m").schema("d_months")
    assert(f.dataType === org.apache.spark.sql.types.DateType)

    spark.sql("DROP TABLE IF EXISTS tmp.t.h")
    spark.sql("CREATE TABLE tmp.t.h (id BIGINT, ts TIMESTAMP_NTZ) " +
      "USING `graft-versioned` PARTITIONED BY (hours(ts))")
    spark.sql("INSERT INTO tmp.t.h (id, ts) SELECT id, " +
      "timestamp_ntz'2024-03-01 00:10:00' + " +
      "make_interval(0,0,0,0,0,0,id*1800) FROM range(0, 8)")
    assert(spark.table("tmp.t.h").schema("ts_hours").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    assert(spark.sql("SELECT count(DISTINCT ts_hours) FROM tmp.t.h")
      .collect()(0).getLong(0) === 4L)
    // hours over DATE is meaningless: loud
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE tmp.t.bad (id BIGINT, d DATE) USING `graft-versioned` " +
        "PARTITIONED BY (hours(d))"))
    assert(e.getMessage.contains("hours"))
  }

  test("sys.partitions lists the day values; DESCRIBE shows the transform") {
    ensureEv()
    val parts = spark.sql(
      "CALL tmp.sys.partitions(table => 't.ev')").collect()
    assert(parts.length >= 6, parts.mkString("\n"))
    assert(parts.forall(!_.getBoolean(4)), "no spanning files expected")
    val desc = spark.sql("DESCRIBE TABLE tmp.t.ev").collect()
      .map(_.toString).mkString("\n")
    assert(desc.contains("days(ts)"), desc)
  }

  test("STREAMING append computes the generated day column and pins files") {
    ensureEv()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sql("DROP TABLE IF EXISTS tmp.t.sev")
    spark.sql("CREATE TABLE tmp.t.sev (id BIGINT, ts TIMESTAMP, v BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (days(ts))")
    val mem = MemoryStream[(Long, Long)]
    mem.addData((0L until 96L).map(i => (i, i)): _*)
    val q = mem.toDF().toDF("id", "h")
      .selectExpr("id",
        "timestamp'2024-06-01 00:00:00' + make_interval(0,0,0,0,0,0,h*3600) AS ts",
        "id AS v")
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_tstream_gen_").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("tmp.t.sev")
    q.awaitTermination()
    // the derived column materialized per row, files pin one day each
    val days = spark.sql("SELECT DISTINCT ts_days FROM tmp.t.sev ORDER BY 1")
      .collect().map(_.getDate(0).toString)
    assert(days.toSeq === Seq("2024-06-01", "2024-06-02", "2024-06-03",
      "2024-06-04"))
    val root = java.nio.file.Paths.get(warehouse, "t", "sev")
    val v = graft.operators.Versioned.latestVersion(root.toString).get
    val stats = graft.operators.FileStats.read(root.resolve(s"v=$v"))
    assert(stats.nonEmpty, "streamed commit must carry a stats sidecar")
    stats.foreach { case (f, st) =>
      val c = st.cols("ts_days")
      assert(c.lo.isDefined && c.lo === c.hi,
        s"streamed file $f spans day values [${c.lo}, ${c.hi}]")
    }
    // a day-range predicate prunes the streamed snapshot
    val probe = spark.sql("SELECT id FROM tmp.t.sev WHERE " +
      "ts >= timestamp'2024-06-02 00:00:00' AND " +
      "ts < timestamp'2024-06-03 00:00:00'")
    assert(probe.count() === 24L)
    val desc = probe.queryExecution.executedPlan.toString
    val m = "DataFiles: (\\d+)/(\\d+)".r.findFirstMatchIn(desc)
    assert(m.isDefined && m.get.group(1).toInt < m.get.group(2).toInt,
      s"streamed files must prune by day: $desc")
    // IDENTITY columns still refuse the streaming path, loudly
    spark.sql("DROP TABLE IF EXISTS tmp.t.sid")
    spark.sql("CREATE TABLE tmp.t.sid " +
      "(id BIGINT GENERATED ALWAYS AS IDENTITY, v BIGINT) " +
      "USING `graft-versioned`")
    val mem2 = MemoryStream[Long]
    mem2.addData(1L)
    val e = intercept[Exception] {
      val q2 = mem2.toDF().toDF("v").selectExpr("CAST(NULL AS BIGINT) AS id", "v")
        .writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_tstream_id_").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("tmp.t.sid")
      q2.awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("IDENTITY")), msgs(e).toString)
  }

  test("temporal CTAS appends the derived column writer-side") {
    cat()
    spark.sql("DROP TABLE IF EXISTS tmp.t.cd")
    spark.sql("CREATE TABLE tmp.t.cd USING `graft-versioned` " +
      "PARTITIONED BY (days(ts)) AS SELECT id, " +
      "timestamp'2024-05-01 12:00:00' + make_interval(0,0,0,0,0,0,id*43200)" +
      " AS ts FROM range(0, 20)")
    assert(spark.sql("SELECT count(*) FROM tmp.t.cd " +
      "WHERE ts_days != CAST(ts AS DATE)").collect()(0).getLong(0) === 0L)
    assert(spark.table("tmp.t.cd").count() === 20L)
  }
}
