package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** `PARTITIONED BY (bucket(n, col))` — Iceberg's hash transform via
  * the Delta recipe: a GENERATED `<col>_bucket = pmod(hash(col), n)`
  * column materializes the bucket id, every insert clusters on the
  * bucket transform (resolved through the catalog's FunctionCatalog),
  * the writer rolls files at bucket boundaries so each file pins one
  * bucket, and the scan reports `bucket(n, col)`
  * KeyGroupedPartitioning — two co-bucketed tables joining on the RAW
  * key skip both shuffle exchanges. */
class BucketPartitionSpec extends AnyFunSuite with SparkSpec {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_bucket_spec_").toString

  private def cat(): Unit = {
    spark.conf.set("spark.sql.catalog.bkt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.bkt.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bkt.t")
  }

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val olds = kvs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("DDL accepts bucket(n, col); the mapping is documented and the " +
      "generated column materializes the bucket id") {
    cat()
    spark.sql("DROP TABLE IF EXISTS bkt.t.a")
    spark.sql("CREATE TABLE bkt.t.a (id BIGINT, v BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (bucket(8, id))")
    val props = spark.sql("SHOW TBLPROPERTIES bkt.t.a").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("partitionedBy") === "bucket(8,id)")
    assert(props("clusterBy") === "id_bucket")
    spark.sql("INSERT INTO bkt.t.a (id, v) SELECT id, id * 3 FROM range(0, 500)")
    // the generated column equals its SQL definition for every row
    val bad = spark.sql(
      "SELECT count(*) FROM bkt.t.a WHERE id_bucket != pmod(hash(id), 8)")
      .collect()(0).getLong(0)
    assert(bad === 0L)
    assert(spark.table("bkt.t.a").count() === 500L)
  }

  test("the V2 bucket function agrees with pmod(hash(col), n) on longs, " +
      "ints and strings (null included)") {
    import org.apache.spark.sql.types._
    def sqlBucket(expr: String, n: Int): Int =
      spark.sql(s"SELECT pmod(hash($expr), $n)").collect()(0).getInt(0)
    def fnBucket(dt: DataType, v: Any, n: Int): Int =
      PartitionTransforms.bucketId(dt, v, n)
    for (x <- Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 7919L))
      assert(fnBucket(LongType, x, 16) === sqlBucket(s"${x}L", 16), s"long $x")
    for (x <- Seq(0, 5, -17, Int.MaxValue, Int.MinValue))
      assert(fnBucket(IntegerType, x, 16) === sqlBucket(s"$x", 16), s"int $x")
    for (s <- Seq("", "a", "hello", "سلام", "a longer string value"))
      assert(fnBucket(StringType,
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 16) ===
        sqlBucket(s"'${s}'", 16), s"string '$s'")
    assert(fnBucket(LongType, null, 16) ===
      sqlBucket("CAST(NULL AS BIGINT)", 16), "null key")
  }

  test("every committed file pins exactly one bucket id (boundary roll)") {
    cat()
    spark.sql("DROP TABLE IF EXISTS bkt.t.roll")
    spark.sql("CREATE TABLE bkt.t.roll (id BIGINT, v BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (bucket(4, id)) " +
      "TBLPROPERTIES ('writePartitions'='2')")
    // ONE insert spanning all 4 buckets across 2 write partitions: the
    // roll (not per-bucket inserts) must keep files single-bucket
    spark.sql("INSERT INTO bkt.t.roll (id, v) " +
      "SELECT id, id FROM range(0, 1000)")
    val root = java.nio.file.Paths.get(warehouse, "t", "roll")
    val v = graft.operators.Versioned.latestVersion(root.toString).get
    val vdir = root.resolve(s"v=$v")
    val stats = graft.operators.FileStats.read(vdir)
    val files = graft.operators.Versioned.dataFiles(vdir)
    assert(files.nonEmpty)
    files.foreach { f =>
      val st = stats(f.getFileName.toString)
      val cs = st.cols("id_bucket")
      assert(cs.lo.isDefined && cs.lo == cs.hi,
        s"${f.getFileName}: bucket stats must pin one value, got " +
          s"${cs.lo} .. ${cs.hi}")
    }
    // all 4 buckets present, rows intact
    assert(spark.sql("SELECT count(DISTINCT id_bucket) FROM bkt.t.roll")
      .collect()(0).getLong(0) === 4L)
    assert(spark.table("bkt.t.roll").count() === 1000L)
  }

  test("co-bucketed join on the raw key runs with zero exchanges") {
    cat()
    Seq("j1", "j2").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS bkt.t.$t")
      spark.sql(s"CREATE TABLE bkt.t.$t (id BIGINT, v BIGINT) " +
        "USING `graft-versioned` PARTITIONED BY (bucket(8, id))")
      spark.sql(s"INSERT INTO bkt.t.$t (id, v) " +
        s"SELECT id, id * ${if (t == "j1") 3 else 5} FROM range(0, 400)")
    }
    val q = "SELECT a.id, a.v, b.v AS bv FROM bkt.t.j1 a JOIN bkt.t.j2 b " +
      "ON a.id = b.id"
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(q)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must skip both exchanges:\n$plan")
      assert(j.count() === 400L)
      assert(j.filter("bv != id * 5 OR v != id * 3").count() === 0L)
    }
    // conf explicitly OFF (Spark 4 defaults v2 bucketing ON): planning
    // shuffles as before, rows identical
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(q)
      val plan = j.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 1,
        s"without the conf the join shuffles as before:\n$plan")
      assert(j.count() === 400L)
    }
  }

  test("mismatched bucket counts never co-partition") {
    cat()
    spark.sql("DROP TABLE IF EXISTS bkt.t.n16")
    spark.sql("CREATE TABLE bkt.t.n16 (id BIGINT, v BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (bucket(16, id))")
    spark.sql("INSERT INTO bkt.t.n16 (id, v) SELECT id, id FROM range(0, 400)")
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql("SELECT a.id FROM bkt.t.j1 a JOIN bkt.t.n16 b " +
        "ON a.id = b.id")
      val plan = j.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 1,
        s"bucket(8) vs bucket(16) must shuffle:\n$plan")
      assert(j.count() === 400L)
    }
  }

  test("compatible-transform SPJ: bucket(16) joins bucket(8) with zero " +
      "exchanges when the reducer conf is on") {
    cat()
    // j1 is bucket(8) from the co-bucketed test; n16 is bucket(16)
    spark.sql("DROP TABLE IF EXISTS bkt.t.r16")
    spark.sql("CREATE TABLE bkt.t.r16 (id BIGINT, v BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (bucket(16, id))")
    spark.sql("INSERT INTO bkt.t.r16 (id, v) SELECT id, id * 7 FROM range(0, 400)")
    spark.sql("DROP TABLE IF EXISTS bkt.t.r8")
    spark.sql("CREATE TABLE bkt.t.r8 (id BIGINT, v BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (bucket(8, id))")
    spark.sql("INSERT INTO bkt.t.r8 (id, v) SELECT id, id * 3 FROM range(0, 400)")
    val q = "SELECT a.id, a.v, b.v AS bv FROM bkt.t.r16 a JOIN bkt.t.r8 b " +
      "ON a.id = b.id"
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(q)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucket(16) x bucket(8) must co-partition via the reducer:\n$plan")
      assert(j.count() === 400L)
      assert(j.filter("v != id * 7 OR bv != id * 3").count() === 0L,
        "reduced partitions must still join the RIGHT rows")
    }
    // conf off: exactly the old behavior (the mismatched-counts test)
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = spark.sql(q).queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 1, plan)
    }
  }

  test("refusal matrix: derived-name collision refused, " +
      "float key refused, source drop/rename refused") {
    cat()
    spark.sql("DROP TABLE IF EXISTS bkt.t.bad")
    val e2 = intercept[Exception](spark.sql(
      "CREATE TABLE bkt.t.bad (id BIGINT, id_bucket INT) " +
        "USING `graft-versioned` PARTITIONED BY (bucket(8, id))"))
    assert(e2.getMessage.contains("id_bucket"))
    val e3 = intercept[Exception](spark.sql(
      "CREATE TABLE bkt.t.bad (id BIGINT, f DOUBLE) USING `graft-versioned` " +
        "PARTITIONED BY (bucket(8, f))"))
    assert(e3.getMessage.toLowerCase.contains("bucket"))
    // the bucket source column is GENERATED-referenced: drop and rename
    // refuse through the auto-column guard
    val e4 = intercept[Exception](spark.sql(
      "ALTER TABLE bkt.t.a DROP COLUMN id"))
    assert(e4.getMessage.contains("id_bucket") ||
      e4.getMessage.contains("generation"))
    val e5 = intercept[Exception](spark.sql(
      "ALTER TABLE bkt.t.a RENAME COLUMN id TO id2"))
    assert(e5.getMessage.contains("id_bucket") ||
      e5.getMessage.contains("generation"))
  }

  test("STREAMING append computes bucket ids and pins one bucket per file") {
    cat()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sql("DROP TABLE IF EXISTS bkt.t.sb")
    spark.sql("CREATE TABLE bkt.t.sb (id BIGINT, v BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (bucket(4, id))")
    val mem = MemoryStream[(Long, Long)]
    mem.addData((0L until 200L).map(i => (i, i * 3)): _*)
    val q = mem.toDF().toDF("id", "v")
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_bstream_").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("bkt.t.sb")
    q.awaitTermination()
    // derived bucket ids computed per row, equal to the SQL expression
    assert(spark.sql("SELECT count(*) FROM bkt.t.sb " +
      "WHERE id_bucket != pmod(hash(id), 4)").collect()(0).getLong(0) === 0L)
    assert(spark.sql("SELECT count(*) FROM bkt.t.sb").collect()(0)
      .getLong(0) === 200L)
    val root = s"$warehouse/t/sb"
    val v = graft.operators.Versioned.latestVersion(root).get
    val stats = graft.operators.FileStats.read(
      java.nio.file.Paths.get(root, s"v=$v"))
    assert(stats.nonEmpty)
    stats.foreach { case (f, st) =>
      val c = st.cols("id_bucket")
      assert(c.lo.isDefined && c.lo === c.hi,
        s"streamed file $f spans buckets [${c.lo}, ${c.hi}]")
    }
  }

  test("an equality probe on the bucket key prunes to the key's bucket") {
    cat()
    spark.sql("DROP TABLE IF EXISTS bkt.t.pr")
    spark.sql("CREATE TABLE bkt.t.pr (id BIGINT, v BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (bucket(8, id))")
    spark.sql("INSERT INTO bkt.t.pr (id, v) SELECT id, id FROM range(0, 2000)")
    val q = spark.sql("SELECT v FROM bkt.t.pr WHERE id = 1234")
    val plan = q.queryExecution.executedPlan.toString
    val m = """DataFiles: (\d+)/(\d+)""".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"no prune report in:\n$plan")
    val (kept, total) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(total >= 8, s"expected >= 8 bucket files, got $total")
    assert(kept <= math.max(1, total / 4),
      s"bucket pruning must keep ~1/8 of files: $kept/$total\n$plan")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(1234L))
    // IN probes prune to the union of the keys' buckets; rows exact
    val qin = spark.sql("SELECT v FROM bkt.t.pr WHERE id IN (3, 700, 1999)")
    val m2 = """DataFiles: (\d+)/(\d+)""".r
      .findFirstMatchIn(qin.queryExecution.executedPlan.toString)
    assert(m2.get.group(1).toInt < m2.get.group(2).toInt, "IN must prune")
    assert(qin.collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(3L, 700L, 1999L))
    // a string-keyed table prunes the same way
    spark.sql("DROP TABLE IF EXISTS bkt.t.prs")
    spark.sql("CREATE TABLE bkt.t.prs (k STRING, v BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (bucket(8, k))")
    spark.sql("INSERT INTO bkt.t.prs (k, v) " +
      "SELECT concat('key_', id), id FROM range(0, 2000)")
    val qs = spark.sql("SELECT v FROM bkt.t.prs WHERE k = 'key_77'")
    val m3 = """DataFiles: (\d+)/(\d+)""".r
      .findFirstMatchIn(qs.queryExecution.executedPlan.toString)
    assert(m3.get.group(1).toInt <= math.max(1, m3.get.group(2).toInt / 4),
      s"string-key bucket pruning: ${m3.get.group(1)}/${m3.get.group(2)}")
    assert(qs.collect().map(_.getLong(0)).toSeq === Seq(77L))
  }

  test("CTAS with bucket partitioning clusters and pins like CREATE+INSERT") {
    cat()
    spark.sql("DROP TABLE IF EXISTS bkt.t.ctas")
    spark.sql("CREATE TABLE bkt.t.ctas USING `graft-versioned` " +
      "PARTITIONED BY (bucket(4, id)) AS " +
      "SELECT id, id * 2 AS v FROM range(0, 300)")
    val root = java.nio.file.Paths.get(warehouse, "t", "ctas")
    val v = graft.operators.Versioned.latestVersion(root.toString).get
    val stats = graft.operators.FileStats.read(root.resolve(s"v=$v"))
    graft.operators.Versioned.dataFiles(root.resolve(s"v=$v")).foreach { f =>
      val cs = stats(f.getFileName.toString).cols("id_bucket")
      assert(cs.lo.isDefined && cs.lo == cs.hi, s"${f.getFileName} spans")
    }
    assert(spark.table("bkt.t.ctas").count() === 300L)
    assert(spark.sql("SELECT count(*) FROM bkt.t.ctas " +
      "WHERE id_bucket != pmod(hash(id), 4)").collect()(0).getLong(0) === 0L)
  }
}
