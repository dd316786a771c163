package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Versioned

/** Planning-time intelligence of the graft-versioned scan: footer
  * statistics reported to Catalyst (`SupportsReportStatistics`) and
  * driver-side row-group pruning from pushed predicates.
  *
  * Why it matters at scale: a DSv2 relation with no stats reports
  * `defaultSizeInBytes` (effectively infinite), so a 2 MB dimension
  * snapshot would never auto-broadcast and every join against the
  * version store would shuffle; and without driver-side pruning a
  * selective filter on a clustered table still schedules one task per
  * row group, paying scheduler latency for groups whose min/max
  * already exclude them. */
class VersionedStatsSpec extends AnyFunSuite with SparkSpec {

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_stats_${tag}_").toString

  /** One physical file, MANY row groups, ids ascending so group
    * min/max spans are disjoint — the clustered-table shape. */
  private def clusteredRoot(n: Long): String = {
    val root = freshRoot("rg")
    spark.range(0, n).selectExpr("id", "id * 7 AS v",
      "repeat('x', 32) AS pad")
      .coalesce(1).write
      .option("parquet.block.size", "65536")
      .parquet(s"$root/v=0")
    root
  }

  private def scanStats(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.stats

  test("numRows and sizeInBytes come from footers, not defaultSizeInBytes") {
    val root = freshRoot("stats")
    import spark.implicits._
    Versioned.writeNext(
      (0L until 1000L).map(i => (i, s"tag_$i")).toDF("id", "tag"), root, Some(10L))
    val df = spark.read.format("graft-versioned").load(root)
    val st = scanStats(df)
    assert(st.rowCount.contains(BigInt(1000)),
      s"expected footer rowCount 1000, got ${st.rowCount}")
    val default = spark.sessionState.conf.defaultSizeInBytes
    assert(st.sizeInBytes > 0 && st.sizeInBytes < BigInt(default),
      s"sizeInBytes ${st.sizeInBytes} should be a real footer estimate")
  }

  test("sizeInBytes counts only the projected columns") {
    val root = freshRoot("proj")
    import spark.implicits._
    // wide payload column dominates the footprint — DISTINCT values, so
    // dictionary encoding cannot collapse the column chunk
    Versioned.writeNext(
      (0L until 2000L).map(i => (i, s"payload_$i" * 20)).toDF("id", "payload"),
      root, Some(10L))
    val full = scanStats(
      spark.read.format("graft-versioned").load(root))
    val narrow = scanStats(
      spark.read.format("graft-versioned").load(root).select("id"))
    assert(narrow.sizeInBytes * 5 < full.sizeInBytes,
      s"narrow ${narrow.sizeInBytes} should be far below full ${full.sizeInBytes}")
  }

  test("a small versioned dimension auto-broadcasts with no hint") {
    val root = freshRoot("bcast")
    import spark.implicits._
    Versioned.writeNext(
      (0L until 500L).map(i => (i, s"n_$i")).toDF("k", "name"), root, Some(10L))
    val dim = spark.read.format("graft-versioned").load(root)
    val fact = spark.range(0, 100000).selectExpr("id % 500 AS k", "id AS x")
    val joined = fact.join(dim, "k")
    val plan = joined.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"footer stats should make the dimension broadcastable:\n$plan")
    assert(joined.count() === 100000L)
  }

  test("driver-side row-group pruning: selective filter schedules fewer tasks") {
    val root = clusteredRoot(200000L)
    val all = spark.read.format("graft-versioned").load(root)
    val totalParts = all.rdd.getNumPartitions
    assert(totalParts > 3, s"fixture should span many row groups, got $totalParts")

    val tail = all.filter(col("id") >= 199990L)
    val keptParts = tail.rdd.getNumPartitions
    assert(keptParts < totalParts,
      s"stats pruning should drop groups: kept $keptParts of $totalParts")
    assert(tail.count() === 10L)
    // the explain line reports the prune ratio
    val desc = tail.queryExecution.executedPlan.toString
    val rg = "RowGroups: (\\d+)/(\\d+)".r
    rg.findFirstMatchIn(desc) match {
      case Some(m) =>
        assert(m.group(1).toInt < m.group(2).toInt,
          s"expected kept < total in '${m.matched}'")
      case None => fail(s"RowGroups marker missing in:\n$desc")
    }
  }

  test("pruned scan stays exact across the group boundary span") {
    val root = clusteredRoot(120000L)
    val all = spark.read.format("graft-versioned").load(root)
    // a mid-range band: neither the first nor the last group
    val band = all.filter(col("id") >= 50000L && col("id") < 50100L)
    assert(band.count() === 100L)
    assert(band.agg(sum("v")).collect()(0).getLong(0) ===
      (50000L until 50100L).map(_ * 7).sum)
    assert(band.rdd.getNumPartitions < all.rdd.getNumPartitions)
  }

  test("statistics shrink under pushed filters (group-level, pre-execution)") {
    val root = clusteredRoot(200000L)
    val all = spark.read.format("graft-versioned").load(root)
    val tail = all.filter(col("id") >= 199990L)
    assert(scanStats(tail).sizeInBytes < scanStats(all).sizeInBytes,
      "pruned groups must leave the size estimate")
  }

  test("pushed LIMIT schedules one covering row group and stays exact") {
    val root = clusteredRoot(120000L)
    val q = spark.read.format("graft-versioned").load(root).limit(7)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 7"), s"limit not pushed:\n$plan")
    assert(q.collect().length === 7)
    val scan = q.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.inputPartitions.length === 1,
      s"LIMIT 7 should plan one row-group task, got ${scan.inputPartitions.length}")
    // limit + filter: partial pushdown keeps the engine-side LIMIT exact
    val f = spark.read.format("graft-versioned").load(root)
      .filter(col("id") >= 60000L).limit(5)
    assert(f.collect().map(_.getLong(0)).forall(_ >= 60000L))
    assert(f.count() === 5)
  }

  test("runtime IN filter re-prunes row groups at execution time") {
    val root = clusteredRoot(120000L)
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.connector.expressions.{Expression => VExpr, Expressions}
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    val sb = new GraftVersionedScanBuilder(
      spark.read.format("graft-versioned").load(root).schema,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        Map("path" -> root).asJava))
    val scan = sb.build().asInstanceOf[GraftVersionedScan]
    val before = scan.toBatch.planInputPartitions().length
    assert(before > 3, s"fixture should span many groups, got $before")
    val children: Array[VExpr] =
      Expressions.column("id") +:
        Array(3L, 17L).map(v => Expressions.literal(v): VExpr)
    scan.filter(Array(new Predicate("IN", children)))
    val after = scan.toBatch.planInputPartitions().length
    assert(after === 1,
      s"IN(3, 17) covers the first row group only, planned $after of $before")
  }

  test("broadcast join against a tiny key set stays exact (runtime-filter path)") {
    val root = clusteredRoot(120000L)
    val fact = spark.read.format("graft-versioned").load(root)
    val dim = spark.range(0, 120000).selectExpr("id AS k")
      .filter(col("k") < 20L)
    val joined = fact.join(broadcast(dim), fact("id") === dim("k"))
    assert(joined.count() === 20L)
    assert(joined.agg(sum("v")).collect()(0).getLong(0) ===
      (0L until 20L).map(_ * 7).sum)
  }

  test("static IN predicate pushes into the scan and prunes groups") {
    val root = clusteredRoot(120000L)
    val all = spark.read.format("graft-versioned").load(root)
    val q = all.filter(col("id").isin(2L, 9L, 11L))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("In(id"), s"IN not pushed:\n$plan")
    assert(q.rdd.getNumPartitions < all.rdd.getNumPartitions)
    assert(q.collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 9L, 11L))
  }

  test("an untranslatable predicate prunes nothing and stays correct") {
    val root = clusteredRoot(60000L)
    val all = spark.read.format("graft-versioned").load(root)
    // modulo is not in the pushdown vocabulary — full scan, exact result
    val odd = all.filter(expr("id % 2 = 1"))
    assert(odd.rdd.getNumPartitions === all.rdd.getNumPartitions)
    assert(odd.count() === 30000L)
  }

  test("ndvColumns: sketches land at commit, carry by name, union ≈ exact") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ndv_spec_")
    spark.conf.set("spark.sql.catalog.ndv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ndv.warehouse", wh.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ndv.t")
    spark.sql("DROP TABLE IF EXISTS ndv.t.d1")
    spark.sql("CREATE TABLE ndv.t.d1 (k BIGINT, grp BIGINT, pad STRING) " +
      "USING `graft-versioned` TBLPROPERTIES ('ndvColumns'='k,grp', " +
      "'clusterBy'='k', 'writePartitions'='4')")
    spark.sql("INSERT INTO ndv.t.d1 " +
      "SELECT id, id % 37, repeat('x', 16) FROM range(0, 20000)")
    val root = wh.resolve("t").resolve("d1")
    def sidecarLines(v: Long): Map[(String, String), String] =
      new String(java.nio.file.Files.readAllBytes(
        root.resolve(s"v=$v").resolve("_graft_ndv")),
        java.nio.charset.StandardCharsets.UTF_8).linesIterator.map { l =>
        val o = new com.fasterxml.jackson.databind.ObjectMapper().readTree(l)
        (o.get("f").textValue(), o.get("c").textValue()) -> l
      }.toMap
    val v0 = sidecarLines(0L)
    assert(v0.nonEmpty && v0.keys.map(_._2).toSet === Set("k", "grp"))
    // union over all files ≈ exact distinct counts (HLL at lgK=12)
    val kept = graft.operators.Versioned.dataFiles(root.resolve("v=0"))
      .map(_.getFileName.toString).toSet
    val est = graft.operators.NdvSidecar.mergedNdv(root.resolve("v=0"), kept)
    assert(math.abs(est("k") - 20000L) <= 1000L, s"ndv(k) = ${est("k")}")
    assert(math.abs(est("grp") - 37L) <= 3L, s"ndv(grp) = ${est("grp")}")
    // append: the carried files' lines are byte-identical (O(new files)
    // commit cost — no re-sketch of old data), new files get fresh lines
    spark.sql("INSERT INTO ndv.t.d1 " +
      "SELECT id, id % 37, repeat('x', 16) FROM range(20000, 22000)")
    val v1 = sidecarLines(1L)
    v0.foreach { case (key, line) =>
      assert(v1(key) === line, s"carried line for $key must be verbatim")
    }
    assert(v1.size > v0.size, "new files must gain fresh sketch lines")
  }

  test("ndvColumns follows RENAME, refuses DROP, sketches stay physical-keyed") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ndvddl_spec_")
    spark.conf.set("spark.sql.catalog.ndvd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ndvd.warehouse", wh.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ndvd.t")
    spark.sql("DROP TABLE IF EXISTS ndvd.t.r")
    spark.sql("CREATE TABLE ndvd.t.r (k BIGINT, pad STRING) " +
      "USING `graft-versioned` TBLPROPERTIES ('ndvColumns'='k')")
    spark.sql("INSERT INTO ndvd.t.r SELECT id % 500, 'x' FROM range(0, 5000)")
    val root = wh.resolve("t").resolve("r")
    spark.sql("ALTER TABLE ndvd.t.r RENAME COLUMN k TO key")
    val props = spark.sql("SHOW TBLPROPERTIES ndvd.t.r").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("ndvColumns").contains("key"), props)
    // the sketches are keyed by PHYSICAL birth name — the rename is
    // metadata-only and the NEXT insert still carries + extends them
    spark.sql("INSERT INTO ndvd.t.r SELECT 500 + id % 100, 'y' " +
      "FROM range(0, 1000)")
    val kept = graft.operators.Versioned.dataFiles(root.resolve("v=1"))
      .map(_.getFileName.toString).toSet
    val est = graft.operators.NdvSidecar.mergedNdv(root.resolve("v=1"), kept)
    assert(est.contains("k"), s"physical key space: $est")
    assert(math.abs(est("k") - 600L) <= 30L, s"ndv after rename: $est")
    // a sketched column is load-bearing: DROP refuses naming the prop
    val e = intercept[Exception](
      spark.sql("ALTER TABLE ndvd.t.r DROP COLUMN key"))
    def chain(x: Throwable): String =
      if (x == null) "" else x.getMessage + "||" + chain(x.getCause)
    assert(chain(e).contains("ndvColumns"), chain(e))
    // SET validates columns exist
    val bad = intercept[Exception](spark.sql(
      "ALTER TABLE ndvd.t.r SET TBLPROPERTIES ('ndvColumns'='nope')"))
    assert(chain(bad).contains("ndvColumns column 'nope'"), chain(bad))
  }

  test("CBO + NDV sketches pick the filtered build side without hints") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ndvcbo_spec_")
    spark.conf.set("spark.sql.catalog.ndvb", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ndvb.warehouse", wh.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ndvb.t")
    spark.sql("DROP TABLE IF EXISTS ndvb.t.dim")
    spark.sql("DROP TABLE IF EXISTS ndvb.t.dimplain")
    spark.sql("DROP TABLE IF EXISTS ndvb.t.fact")
    // the dim is BIGGER than the broadcast threshold raw, and the
    // filter column `h` is SCATTERED across every file (min/max and
    // file pruning refute nothing) — only the NDV-implied selectivity
    // of `h = const` (1/ndv) can shrink the estimate under the
    // threshold
    spark.sql("CREATE TABLE ndvb.t.dim (k BIGINT, h BIGINT, pad STRING) " +
      "USING `graft-versioned` TBLPROPERTIES ('ndvColumns'='h')")
    spark.sql("INSERT INTO ndvb.t.dim " +
      "SELECT id, id % 1000, repeat('d', 64) FROM range(0, 30000)")
    spark.sql("CREATE TABLE ndvb.t.dimplain (k BIGINT, h BIGINT, pad STRING) " +
      "USING `graft-versioned`")
    spark.sql("INSERT INTO ndvb.t.dimplain " +
      "SELECT id, id % 1000, repeat('d', 64) FROM range(0, 30000)")
    spark.sql("CREATE TABLE ndvb.t.fact (k BIGINT, v BIGINT) " +
      "USING `graft-versioned`")
    spark.sql("INSERT INTO ndvb.t.fact " +
      "SELECT id % 30000, id FROM range(0, 120000)")
    val joinSql = (dim: String) =>
      s"SELECT f.v, d.pad FROM ndvb.t.fact f JOIN $dim d ON f.k = d.k " +
        "WHERE d.h = 123"
    withConfs("spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "262144") {
      val withNdv = spark.sql(joinSql("ndvb.t.dim"))
      val plan = withNdv.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"NDV-backed dim must broadcast under CBO (1/ndv selectivity):\n$plan")
      assert(withNdv.count() === 120L)
      // the DIFFERENTIAL: same data without sketches keeps the raw
      // size estimate (> threshold) — no broadcast, the join shuffles
      val plain = spark.sql(joinSql("ndvb.t.dimplain"))
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(!plainPlan.contains("BroadcastHashJoin"),
        s"without NDV stats the oversized dim must not broadcast:\n$plainPlan")
      assert(plain.count() === 120L, "strategy choice never changes rows")
    }
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
}
