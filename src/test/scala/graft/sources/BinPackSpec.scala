package graft.sources

import java.nio.file.{Files => JF, Paths => JP}

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.{DeletionVectors, Versioned}

/** Incremental OPTIMIZE ([[Versioned.compactSmall]] via
  * `sys.compact(only_smaller_than => …)`): only the small-file tail is
  * rewritten, the clustered bulk hard-links over byte-identical, DV'd
  * small files materialize to live rows, and the no-op edge commits
  * nothing. */
class BinPackSpec extends AnyFunSuite with SparkSpec {

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("graft_binpack_").toString
    spark.conf.set("spark.sql.catalog.gbin", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbin.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbin.ns")
    w
  }

  private def sql(s: String): DataFrame = { warehouse; spark.sql(s) }

  private def names(root: String, v: Long): Set[String] =
    Versioned.dataFiles(JP.get(root, s"v=$v")).map(_.getFileName.toString).toSet

  test("only_smaller_than rewrites the small tail; the bulk hard-links over") {
    sql("DROP TABLE IF EXISTS gbin.ns.t1")
    sql("CREATE TABLE gbin.ns.t1 (id BIGINT, grp BIGINT) USING `graft-versioned` " +
      "TBLPROPERTIES ('clusterBy'='id', 'writePartitions'='1')")
    spark.range(20000).selectExpr("id", "id % 7 AS grp")
      .createOrReplaceTempView("bulk1")
    sql("INSERT INTO gbin.ns.t1 SELECT id, grp FROM bulk1") // one big file
    sql("INSERT INTO gbin.ns.t1 VALUES (20000, 1)")         // three epoch-ish
    sql("INSERT INTO gbin.ns.t1 VALUES (20001, 2)")         // small-file
    sql("INSERT INTO gbin.ns.t1 VALUES (20002, 3)")         // appends
    val root = s"$warehouse/ns/t1"
    val pre = names(root, 3L)
    assert(pre.size === 4)
    val big = Versioned.dataFiles(JP.get(root, "v=3")).maxBy(JF.size)
      .getFileName.toString
    assert(JF.size(JP.get(root, "v=3", big)) > (64 << 10))
    val v = sql("CALL gbin.sys.compact(table => 'ns.t1', " +
      "target_file_bytes => 1048576, only_smaller_than => 16384)")
      .collect()(0).getLong(0)
    assert(v === 4L)
    val post = names(root, 4L)
    // the bulk file survives under its own name; the three small files
    // merged into one fresh file
    assert(post.contains(big), "the big file must carry, not rewrite")
    assert(!post.exists(pre - big), "every small file must be replaced")
    assert(post.size === 2, post.toString)
    assert(sql("SELECT count(*) FROM gbin.ns.t1").collect()(0).getLong(0)
      === 20003L)
    assert(sql("SELECT grp FROM gbin.ns.t1 WHERE id = 20001")
      .collect().map(_.getLong(0)).toSeq === Seq(2L))
    // history intact: the fragmented snapshot is still addressable
    assert(sql("SELECT count(*) FROM gbin.ns.t1 VERSION AS OF 3")
      .collect()(0).getLong(0) === 20003L)
    // idempotent edge: one surviving small file < 2 → no new commit
    val v2 = sql("CALL gbin.sys.compact(table => 'ns.t1', " +
      "target_file_bytes => 1048576, only_smaller_than => 16384)")
      .collect()(0).getLong(0)
    assert(v2 === 4L)
    assert(Versioned.versions(root) === (0L to 4L))
  }

  test("DV'd small files compact to live rows and shed their sidecars") {
    sql("DROP TABLE IF EXISTS gbin.ns.t2")
    sql("CREATE TABLE gbin.ns.t2 (id BIGINT, grp BIGINT) USING `graft-versioned` " +
      "TBLPROPERTIES ('clusterBy'='id', 'writePartitions'='1', " +
      "'deletionVectors'='true')")
    spark.range(20000).selectExpr("id", "id % 7 AS grp")
      .createOrReplaceTempView("bulk2")
    sql("INSERT INTO gbin.ns.t2 SELECT id, grp FROM bulk2")
    sql("INSERT INTO gbin.ns.t2 VALUES (20000, 1), (20001, 2), (20002, 3)")
    sql("INSERT INTO gbin.ns.t2 VALUES (20003, 4), (20004, 5)")
    // DV-delete rows living ONLY in the small tail
    sql("DELETE FROM gbin.ns.t2 WHERE id IN (20001, 20004)")
    val root = s"$warehouse/ns/t2"
    assert(DeletionVectors.dvMap(JP.get(root, "v=3")).nonEmpty,
      "the DELETE must have taken the DV path")
    val v = sql("CALL gbin.sys.compact(table => 'ns.t2', " +
      "target_file_bytes => 1048576, only_smaller_than => 16384)")
      .collect()(0).getLong(0)
    assert(v === 4L)
    // the rewrite holds only live rows and carries no DV sidecars
    assert(DeletionVectors.dvMap(JP.get(root, "v=4")).isEmpty,
      "bin-packing must materialize the tail's DVs away")
    assert(sql("SELECT count(*) FROM gbin.ns.t2").collect()(0).getLong(0)
      === 20003L)
    assert(sql("SELECT id FROM gbin.ns.t2 WHERE id >= 20000 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(20000L, 20002L, 20003L))
  }

  test("zorder_by cannot combine with only_smaller_than") {
    sql("DROP TABLE IF EXISTS gbin.ns.t3")
    sql("CREATE TABLE gbin.ns.t3 (id BIGINT, v BIGINT) USING `graft-versioned`")
    sql("INSERT INTO gbin.ns.t3 VALUES (1, 1)")
    val e = intercept[Exception] {
      sql("CALL gbin.sys.compact(table => 'ns.t3', zorder_by => 'id,v', " +
        "only_smaller_than => 1024)").collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("cannot combine")), chain(e).toString)
  }
}
