package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** STORAGE-PARTITIONED JOINS (Iceberg SPJ): two `PARTITIONED BY`
  * graft tables joining on their partition columns skip BOTH shuffle
  * exchanges — the scans report `KeyGroupedPartitioning` with a
  * partition key per split (proved exact from the per-file stats) and
  * Spark groups + aligns the sides. Gated three ways: the
  * `spark.sql.sources.v2.bucketing.enabled` conf, the partitionedBy
  * contract, and an exactness proof over every kept file — any
  * uncertainty reports UnknownPartitioning and the join planning is
  * exactly what it was before. */
class SpjSpec extends AnyFunSuite with SparkSpec {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_spj_spec_").toString

  private def cat(): Unit = {
    spark.conf.set("spark.sql.catalog.spj", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spj.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spj.t")
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

  private def mkTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS spj.t.$name")
    spark.sql(s"CREATE TABLE spj.t.$name (id BIGINT, g BIGINT, v BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (g)")
    // one insert per partition value: each commit's file pins exactly
    // one g (min == max), the invariant the key report requires
    (0L to 3L).foreach { gv =>
      spark.sql(s"INSERT INTO spj.t.$name " +
        s"SELECT ${gv * 1000} + id, ${gv}L, id * 7 FROM range(0, 100)")
    }
  }

  test("co-partitioned join on the partition column runs with zero exchanges") {
    cat()
    mkTable("a")
    mkTable("b")
    val q = "SELECT a.id, a.v, b.v AS bv FROM spj.t.a a JOIN spj.t.b b " +
      "ON a.g = b.g AND a.id = b.id"
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      // the join clusters on (g, id) while storage partitions on g —
      // a subset, which Spark accepts only with this off (default on)
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(q)
      val plan = j.queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(shuffles === 0,
        s"co-partitioned join must skip both exchanges:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(j.count() === 400L)
      assert(j.filter("v != bv").count() === 0L)
    }
    // conf off: planning is exactly what it was — shuffled, same rows
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(q)
      val plan = j.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 1,
        s"without the conf the join shuffles as before:\n$plan")
      assert(j.count() === 400L)
    }
  }

  test("GROUP BY the partition column aggregates without an exchange") {
    cat()
    mkTable("e")
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val agg = spark.sql(
        "SELECT g, sum(v) AS s, count(*) AS n FROM spj.t.e GROUP BY g")
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"partition-aligned aggregation must not shuffle:\n$plan")
      val rows = agg.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      val expect = (0L to 3L).map(g => (g, (0L until 100L).map(_ * 7).sum, 100L))
      assert(rows === expect)
    }
  }

  test("mismatched partition sets: missing values pad, join stays exchange-free") {
    cat()
    mkTable("f")
    // the other side carries only HALF the partition values
    spark.sql("DROP TABLE IF EXISTS spj.t.half")
    spark.sql("CREATE TABLE spj.t.half (id BIGINT, g BIGINT, v BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (g)")
    (0L to 1L).foreach { gv =>
      spark.sql(s"INSERT INTO spj.t.half " +
        s"SELECT ${gv * 1000} + id, ${gv}L, id * 7 FROM range(0, 100)")
    }
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql("SELECT a.id FROM spj.t.f a JOIN spj.t.half b " +
        "ON a.g = b.g AND a.id = b.id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"partition-value padding must keep the join exchange-free:\n$plan")
      assert(j.count() === 200L, "only the shared values' rows join")
    }
  }

  test("a STREAMED append keeps the one-value-per-file invariant and SPJ") {
    cat()
    mkTable("sa")
    mkTable("sb")
    // stream four more partition values' rows into `sa` in ONE epoch —
    // the streaming writer must roll files at partition boundaries
    // exactly like the batch factory, or the spanning file degrades
    // SPJ to UnknownPartitioning until the next OPTIMIZE
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    mem.addData((0L to 3L).flatMap(gv =>
      (0L until 50L).map(i => (gv * 1000 + 500 + i, gv, (500 + i) * 7))): _*)
    val q = mem.toDF().toDF("id", "g", "v")
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_spj_stream_").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("spj.t.sa")
    q.awaitTermination()
    // invariant: every data file of the streamed commit pins exactly
    // one g value (stats min == max)
    val root = s"$warehouse/t/sa"
    val v = graft.operators.Versioned.latestVersion(root).get
    val vdir = java.nio.file.Paths.get(root, s"v=$v")
    val stats = graft.operators.FileStats.read(vdir)
    assert(stats.nonEmpty, "streamed commit must carry a stats sidecar")
    stats.foreach { case (f, st) =>
      val c = st.cols.get("g")
      assert(c.isDefined, s"file $f has no g stats")
      assert(c.get.lo.isDefined && c.get.lo === c.get.hi,
        s"streamed file $f spans g values [${c.get.lo}, ${c.get.hi}]")
    }
    // and the storage-partitioned join still plans with zero exchanges
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      spark.sql("REFRESH TABLE spj.t.sa")
      val j = spark.sql("SELECT a.id, a.v, b.v AS bv FROM spj.t.sa a " +
        "JOIN spj.t.sb b ON a.g = b.g AND a.id = b.id")
      val plan = j.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plan).size === 0,
        s"SPJ must survive a streamed append:\n$plan")
      assert(j.count() === 400L, "joined rows (streamed ids miss b)")
    }
  }

  test("a spanning file degrades to UnknownPartitioning, never a wrong key") {
    cat()
    mkTable("c")
    // one FILE covering TWO partition values — a path-level append
    // (the catalog write would range-cluster the values apart): the
    // exactness proof must fail and the report must withdraw
    spark.range(0, 10)
      .selectExpr("9000 + id AS id", "CAST(id % 2 AS BIGINT) AS g",
        "id AS v")
      .coalesce(1).write.format("graft-versioned")
      .mode("append").save(s"$warehouse/t/c")
    spark.sql("REFRESH TABLE spj.t.c")
    mkTable("d")
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql("SELECT c.id FROM spj.t.c c JOIN spj.t.d d " +
        "ON c.g = d.g AND c.id = d.id")
      val plan = j.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 1,
        s"a spanning file must fall back to the shuffled join:\n$plan")
      assert(j.count() === 400L, "fallback never changes rows")
    }
  }
}
