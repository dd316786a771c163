package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Versioned

/** Global COUNT/MIN/MAX over the version store answered from parquet
  * footers alone (`SupportsPushDownAggregates`, complete pushdown):
  * `SELECT count(*) FROM fact` over a 100 TB snapshot should cost one
  * footer read per file, never a cluster-wide scan. The pushdown must
  * refuse itself whenever footer statistics cannot give the EXACT
  * answer (filters, grouping, distinct, all-null subtleties). */
class AggPushdownSpec extends AnyFunSuite with SparkSpec {

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_aggpd_").toString
    import spark.implicits._
    // two snapshot commits (writeNext REPLACES); latest holds all 1000
    def rows(n: Long) = (0L until n).map(i =>
      (i, if (i % 5 == 0) null else s"t$i", if (i % 7 == 0) None else Some(i * 3)))
    val v0 = rows(400).toDF("id", "tag", "v")
    val v1 = rows(1000).toDF("id", "tag", "v")
    Versioned.writeNext(v0, r, Some(10L))
    Versioned.writeNext(v1, r, Some(20L))
    r
  }

  private def load() = spark.read.format("graft-versioned").load(root)

  private def isFooterOnly(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("GraftAggregateScan")

  test("count(*), count(col), min, max come from footers — no data scan") {
    val q = load().agg(
      count(lit(1)).as("n"), count(col("tag")).as("n_tag"),
      count(col("v")).as("n_v"), min(col("v")).as("min_v"),
      max(col("v")).as("max_v"), min(col("id")).as("min_id"),
      max(col("id")).as("max_id"))
    assert(isFooterOnly(q), s"expected footer-only plan:\n${q.queryExecution.executedPlan}")
    val r = q.collect()(0)
    assert(r.getLong(0) === 1000L)
    assert(r.getLong(1) === 800L) // every 5th tag null
    assert(r.getLong(2) === (0L until 1000L).count(_ % 7 != 0))
    assert(r.getLong(3) === 3L)   // min v: id=1 → 3 (id=0 is null)
    assert(r.getLong(4) === 999L * 3)
    assert(r.getLong(5) === 0L && r.getLong(6) === 999L)
  }

  test("time travel pins the answer to the snapshot") {
    val q = spark.read.format("graft-versioned")
      .option("versionAsOf", "0").load(root).agg(count(lit(1)).as("n"))
    assert(isFooterOnly(q))
    assert(q.collect()(0).getLong(0) === 400L)
  }

  test("refused under filters, grouping, and distinct — exact fallback") {
    val filtered = load().filter(col("id") >= 500L).agg(count(lit(1)))
    assert(!isFooterOnly(filtered), "filtered aggregate must scan")
    assert(filtered.collect()(0).getLong(0) === 500L)

    val grouped = load().groupBy(col("tag").isNull).count()
    assert(!isFooterOnly(grouped))
    assert(grouped.collect().map(_.getLong(1)).sorted.toSeq === Seq(200L, 800L))

    val distinct = load().agg(countDistinct(col("tag")))
    assert(!isFooterOnly(distinct))
    assert(distinct.collect()(0).getLong(0) === 800L)

    // string min/max: footer stats may be truncated by writers — refuse
    val strMinMax = load().agg(min(col("tag")), max(col("tag")))
    assert(!isFooterOnly(strMinMax))
    assert(strMinMax.collect()(0).getString(0) === "t1")
  }

  test("all-null column yields SQL MIN/MAX semantics (null), count 0") {
    val r2 = java.nio.file.Files.createTempDirectory("graft_aggpd_null_").toString
    import spark.implicits._
    Versioned.writeNext(
      Seq((1L, None: Option[Long]), (2L, None)).toDF("id", "v"), r2, Some(10L))
    val q = spark.read.format("graft-versioned").load(r2)
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"), count(col("v")).as("n"))
    assert(isFooterOnly(q))
    val r = q.collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getLong(2) === 0L)
  }

  test("empty (created, never written) table answers zero rows") {
    val r3 = java.nio.file.Files.createTempDirectory("graft_aggpd_empty_")
      .resolve("none").toString
    spark.conf.set("spark.sql.catalog.aggpd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.aggpd.warehouse", r3)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS aggpd.t")
    spark.sql("CREATE TABLE aggpd.t.fresh (id BIGINT, v BIGINT) USING `graft-versioned`")
    val q = spark.sql("SELECT count(*) AS n, max(v) AS mx FROM aggpd.t.fresh")
    val r = q.collect()(0)
    assert(r.getLong(0) === 0L && r.isNullAt(1))
  }

  test("SQL count over the catalog surface is footer-only too") {
    spark.conf.set("spark.sql.catalog.aggpd2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.aggpd2.warehouse",
      java.nio.file.Files.createTempDirectory("graft_aggpd_cat_").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS aggpd2.t")
    spark.sql("CREATE TABLE aggpd2.t.d (id BIGINT) USING `graft-versioned`")
    spark.sql("INSERT INTO aggpd2.t.d SELECT id FROM range(0, 12345)")
    val q = spark.sql("SELECT count(*) AS n, min(id) AS mn, max(id) AS mx FROM aggpd2.t.d")
    assert(isFooterOnly(q), s"catalog agg should be footer-only:\n${q.queryExecution.executedPlan}")
    val r = q.collect()(0)
    assert(r.getLong(0) === 12345L && r.getLong(1) === 0L && r.getLong(2) === 12344L)
  }

  test("deletion vectors: count(*) stays footer-only (rows minus sidecars); min/max scan") {
    spark.conf.set("spark.sql.catalog.aggpd3", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.aggpd3.warehouse",
      java.nio.file.Files.createTempDirectory("graft_aggpd_dv_").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS aggpd3.t")
    spark.sql("CREATE TABLE aggpd3.t.d (id BIGINT) USING `graft-versioned` " +
      "TBLPROPERTIES ('deletionVectors'='true')")
    spark.sql("INSERT INTO aggpd3.t.d SELECT id FROM range(0, 1000)")
    spark.sql("DELETE FROM aggpd3.t.d WHERE id < 100")
    val cnt = spark.sql("SELECT count(*) AS n FROM aggpd3.t.d")
    assert(isFooterOnly(cnt),
      s"count(*) under DVs should stay footer-only:\n${cnt.queryExecution.executedPlan}")
    assert(cnt.collect()(0).getLong(0) === 900L,
      "footer count must subtract the sidecar cardinalities")
    // a deleted row may have held the extreme — min/max must scan
    val mn = spark.sql("SELECT min(id) AS mn, max(id) AS mx FROM aggpd3.t.d")
    assert(!isFooterOnly(mn),
      s"min/max under DVs must refuse footer pushdown:\n${mn.queryExecution.executedPlan}")
    assert(mn.collect()(0).toSeq === Seq(100L, 999L))
  }

  test("aggregates answer from the stats sidecar — one read, zero footers") {
    val q = load().agg(count(lit(1)).as("n"), min(col("v")).as("mn"),
      max(col("id")).as("mx"))
    val desc = q.queryExecution.executedPlan.toString
    assert(desc.contains("stats-manifest-only"),
      s"expected the sidecar to answer before any footer read:\n$desc")
    val r = q.collect()(0)
    assert(r.getLong(0) === 1000L && r.getLong(1) === 3L && r.getLong(2) === 999L)
  }

  test("a missing stats sidecar falls back to footers with identical answers") {
    val r4 = java.nio.file.Files.createTempDirectory("graft_aggpd_nosc_").toString
    import spark.implicits._
    Versioned.writeNext(
      (0L until 100L).map(i => (i, i * 2)).toDF("id", "v"), r4, Some(10L))
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(r4, "v=0", "_graft_stats"))
    val q = spark.read.format("graft-versioned").load(r4)
      .agg(count(lit(1)).as("n"), max(col("v")).as("mx"))
    val desc = q.queryExecution.executedPlan.toString
    assert(desc.contains("footers-only"),
      s"pre-stats commit must take the footer path:\n$desc")
    val r = q.collect()(0)
    assert(r.getLong(0) === 100L && r.getLong(1) === 198L)
  }

  test("evolved tables: the sidecar answers where footers must refuse") {
    // a pre-evolution file has NO footer entry for the added column —
    // the footer path cannot tell "column absent" (rows read null, an
    // exact answer exists) from "stats missing" (refuse); the sidecar
    // records column PRESENCE per file, so it can
    spark.conf.set("spark.sql.catalog.aggpd4", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.aggpd4.warehouse",
      java.nio.file.Files.createTempDirectory("graft_aggpd_evo_").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS aggpd4.t")
    spark.sql("CREATE TABLE aggpd4.t.e (id BIGINT) USING `graft-versioned`")
    spark.sql("INSERT INTO aggpd4.t.e SELECT id FROM range(0, 50)")
    spark.sql("ALTER TABLE aggpd4.t.e ADD COLUMN w BIGINT")
    spark.sql("INSERT INTO aggpd4.t.e SELECT id, id * 2 FROM range(100, 110)")
    val q = spark.sql(
      "SELECT count(w) AS n, min(w) AS mn, max(w) AS mx, count(*) AS c FROM aggpd4.t.e")
    val desc = q.queryExecution.executedPlan.toString
    assert(desc.contains("stats-manifest-only"),
      s"evolved-column aggregate should answer from the sidecar:\n$desc")
    val r = q.collect()(0)
    assert(r.getLong(0) === 10L && r.getLong(1) === 200L &&
      r.getLong(2) === 218L && r.getLong(3) === 60L)
  }

  test("sidecar min/max survives RENAME COLUMN (physical-name lookup)") {
    spark.conf.set("spark.sql.catalog.aggpd5", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.aggpd5.warehouse",
      java.nio.file.Files.createTempDirectory("graft_aggpd_ren_").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS aggpd5.t")
    spark.sql("CREATE TABLE aggpd5.t.r (id BIGINT, v BIGINT) USING `graft-versioned`")
    spark.sql("INSERT INTO aggpd5.t.r SELECT id, id * 3 FROM range(0, 40)")
    spark.sql("ALTER TABLE aggpd5.t.r RENAME COLUMN v TO val")
    val q = spark.sql("SELECT min(val) AS mn, max(val) AS mx FROM aggpd5.t.r")
    val desc = q.queryExecution.executedPlan.toString
    assert(desc.contains("stats-manifest-only"),
      s"renamed-column aggregate should answer from the sidecar:\n$desc")
    assert(q.collect()(0).toSeq === Seq(0L, 117L))
  }
}
