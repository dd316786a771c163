package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Versioned

/** Change-data-feed for SQL commits: a table created with
  * `changeFeedKeys` derives and stores a keyed diff feed on EVERY
  * commit — INSERT, UPDATE, MERGE, and both DELETE paths — so the
  * streaming change-feed source drains mutations made through plain
  * SQL (the Delta CDF contract). */
class CatalogChangeFeedSpec extends AnyFunSuite with SparkSpec {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_cdf_spec_").toString

  test("INSERT/UPDATE/DELETE commits store keyed diff feeds") {
    spark.conf.set("spark.sql.catalog.cdf", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdf.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cdf.t")
    spark.sql("CREATE TABLE cdf.t.d (id BIGINT, v BIGINT) USING `graft-versioned` " +
      "TBLPROPERTIES ('changeFeedKeys'='id')")
    spark.sql("INSERT INTO cdf.t.d SELECT id, id * 10 FROM range(0, 10)")
    spark.sql("UPDATE cdf.t.d SET v = v + 5 WHERE id < 3")
    spark.sql("DELETE FROM cdf.t.d WHERE id >= 8")        // metadata path
    spark.sql("DELETE FROM cdf.t.d WHERE id % 3 = 0")     // rewrite path

    val root = s"$warehouse/t/d"
    assert(Versioned.feedVersions(root) === Seq(0L, 1L, 2L, 3L))
    def feed(v: Long): Seq[(Long, String, Any, Any)] =
      spark.read.parquet(Versioned.feedDir(root, v)).collect().map(r =>
        (r.getAs[Long]("id"), r.getAs[String]("change_type"),
         r.getAs[Any]("old_v"), r.getAs[Any]("new_v")))
        .sortBy(_._1).toSeq

    assert(feed(0) === (0L until 10L).map(i => (i, "added", null, i * 10)))
    assert(feed(1) === Seq(
      (0L, "changed", 0L, 5L), (1L, "changed", 10L, 15L),
      (2L, "changed", 20L, 25L)))
    assert(feed(2) === Seq((8L, "removed", 80L, null), (9L, "removed", 90L, null)))
    assert(feed(3) === Seq(
      (0L, "removed", 5L, null), (3L, "removed", 30L, null),
      (6L, "removed", 60L, null)))

    // the streaming change-feed source drains the SQL-made history
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdf_ckpt_").toString
    val drained = spark.readStream.format("graft-versioned")
      .option("changeFeed", "true").load(root)
    val q = drained.writeStream.format("memory").queryName("cdf_drain")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table("cdf_drain").count() === 10L + 3L + 2L + 3L)
  }

  test("a table evolving mid-stream exposes the merged feed schema; old feeds null-fill") {
    spark.conf.set("spark.sql.catalog.cdf", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdf.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cdf.t")
    spark.sql("CREATE TABLE cdf.t.e (id BIGINT, v BIGINT) USING `graft-versioned` " +
      "TBLPROPERTIES ('changeFeedKeys'='id')")
    spark.sql("INSERT INTO cdf.t.e SELECT id, id FROM range(0, 5)")
    spark.sql("ALTER TABLE cdf.t.e ADD COLUMN tag STRING")
    spark.sql("INSERT INTO cdf.t.e SELECT id, id, 't' FROM range(5, 8)")
    val root = s"$warehouse/t/e"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdf_evo_").toString
    val q = spark.readStream.format("graft-versioned")
      .option("changeFeed", "true").load(root)
      .writeStream.format("memory").queryName("cdf_evo")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val drained = spark.table("cdf_evo")
    assert(drained.schema.fieldNames.contains("new_tag"),
      s"merged feed schema should expose the evolved payload: ${drained.schema}")
    // v0 feed = 5 added; v1 feed = the 3 inserts only (old rows' tag
    // stayed null→null, so the null-safe diff reports no change)
    assert(drained.count() === 5L + 3L)
    assert(drained.where("commit_version = 0 AND new_tag IS NULL").count() === 5L)
    assert(drained.where("commit_version = 1 AND new_tag = 't'").count() === 3L)
  }

  test("restore and clone feed too on changeFeedKeys tables") {
    spark.conf.set("spark.sql.catalog.cdf", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdf.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cdf.t")
    spark.sql("CREATE TABLE cdf.t.r (id BIGINT, v BIGINT) USING `graft-versioned` " +
      "TBLPROPERTIES ('changeFeedKeys'='id')")
    spark.sql("INSERT INTO cdf.t.r SELECT id, id FROM range(0, 5)")          // v0
    spark.sql("INSERT OVERWRITE cdf.t.r SELECT id, -id FROM range(0, 3)")    // v1
    spark.sql("CALL cdf.sys.restore(table => 't.r', version => 0)")          // v2
    val root = s"$warehouse/t/r"
    assert(Versioned.feedVersions(root) === Seq(0L, 1L, 2L))
    val f2 = spark.read.parquet(Versioned.feedDir(root, 2L))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("change_type")))
      .sortBy(_._1).toSeq
    // restore: ids 1..2 change back (their v flips sign; id 0 is 0 both
    // ways, no diff row), ids 3..4 reappear as added
    assert(f2 === Seq((1L, "changed"), (2L, "changed"),
      (3L, "added"), (4L, "added")))
    spark.sql("CALL cdf.sys.clone(source => 't.r', target => 't.rc')")
    val croot = s"$warehouse/t/rc"
    assert(Versioned.feedVersions(croot) === Seq(0L))
    assert(spark.read.parquet(Versioned.feedDir(croot, 0L))
      .where("change_type = 'added'").count() === 5L)
  }

  test("MERGE commits a feed and changeFeedKeys validates at DDL") {
    spark.conf.set("spark.sql.catalog.cdf", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdf.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cdf.t")
    spark.sql("CREATE TABLE cdf.t.m (id BIGINT, v BIGINT) USING `graft-versioned` " +
      "TBLPROPERTIES ('changeFeedKeys'='id')")
    spark.sql("INSERT INTO cdf.t.m SELECT id, id FROM range(0, 6)")
    spark.sql("""MERGE INTO cdf.t.m t
      USING (SELECT id, id * 100 AS v FROM range(4, 8)) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
    val root = s"$warehouse/t/m"
    val f1 = spark.read.parquet(Versioned.feedDir(root, 1L))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("change_type")))
      .sortBy(_._1).toSeq
    assert(f1 === Seq((4L, "changed"), (5L, "changed"),
      (6L, "added"), (7L, "added")))

    val bad = intercept[Exception] {
      spark.sql("CREATE TABLE cdf.t.bad (id BIGINT) USING `graft-versioned` " +
        "TBLPROPERTIES ('changeFeedKeys'='nope')")
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ chain(x.getCause))
    assert(chain(bad).exists(_.contains("not in table schema")))
  }

  test("STREAMING epoch commits feed a changeFeedKeys table too") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    spark.conf.set("spark.sql.catalog.cdf", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdf.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cdf.t")
    spark.sql("CREATE TABLE cdf.t.s (id BIGINT, v BIGINT) USING `graft-versioned` " +
      "TBLPROPERTIES ('changeFeedKeys'='id')")
    val root = s"$warehouse/t/s"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(Long, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdf_stream_").toString
    def drain(): Unit = {
      // BY NAME: the catalog resolves the table, so the persisted
      // changeFeedKeys property reaches the streaming write builder
      // (a bare path write has no table contract to honor)
      val q = src.toDF().toDF("id", "v")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("cdf.t.s")
      q.awaitTermination()
    }
    src.addData((1L, 10L), (2L, 20L))
    drain() // epoch 0 → v=0
    src.addData((3L, 30L))
    drain() // epoch 1 → v=1 (append: {1,2} ∪ {3})
    assert(Versioned.feedVersions(root) === Seq(0L, 1L),
      "every streaming epoch must store its feed")
    val f0 = spark.read.parquet(Versioned.feedDir(root, 0L))
    assert(f0.filter("change_type = 'added'").count() === 2L)
    val f1 = spark.read.parquet(Versioned.feedDir(root, 1L))
    assert(f1.collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[String]("change_type"))).toSeq ===
      Seq((3L, "added")), "epoch 1's feed is the appended key only")
  }
}
