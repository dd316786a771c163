package graft.sources

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Versioned

/** The graft TableCatalog: SQL DDL/DML against version-store tables —
  * CREATE/DROP/RENAME/SHOW, INSERT INTO (append → new version), INSERT
  * OVERWRITE (snapshot replace), SQL time travel (VERSION AS OF /
  * TIMESTAMP AS OF), path interop with the Versioned helpers, and the
  * fail-loud matrix (partitioned DDL, ALTER, unsupported types, missing
  * versions). */
class GraftCatalogSpec extends AnyFunSuite with SparkSpec {

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("graft_cat_spec_").toString
    spark.conf.set("spark.sql.catalog.gtest", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtest.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.ns")
    w
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def sql(s: String): DataFrame = { warehouse; spark.sql(s) }

  test("CREATE TABLE + INSERT INTO appends versions; SELECT sees latest") {
    sql("DROP TABLE IF EXISTS gtest.ns.t1")
    sql("CREATE TABLE gtest.ns.t1 (id BIGINT, price BIGINT, tag STRING) USING `graft-versioned`")
    assert(sql("SELECT * FROM gtest.ns.t1").count() === 0L) // empty before first insert
    sql("INSERT INTO gtest.ns.t1 VALUES (1, 100, 'a'), (2, 200, 'b')")
    sql("INSERT INTO gtest.ns.t1 VALUES (3, 300, 'c')")
    assert(rows(sql("SELECT * FROM gtest.ns.t1")) ===
      Seq("[1,100,a]", "[2,200,b]", "[3,300,c]"))
    // on disk: two versions under <warehouse>/ns/t1, v1 = v0 ∪ insert
    val root = s"$warehouse/ns/t1"
    assert(Versioned.versions(root) === Seq(0L, 1L))
    assert(Versioned.read(spark, root, Some(0L)).count() === 2L)
  }

  test("SQL time travel: VERSION AS OF pins, TIMESTAMP AS OF resolves stamps") {
    sql("DROP TABLE IF EXISTS gtest.ns.t2")
    sql("CREATE TABLE gtest.ns.t2 (id BIGINT, v BIGINT) USING `graft-versioned`")
    // stamp deterministically via the path API into the same table dir
    val root = s"$warehouse/ns/t2"
    import spark.implicits._
    Seq((1L, 10L)).toDF("id", "v").write.format("graft-versioned")
      .option("create", "true").option("commitTs", "2000").mode("append").save(root)
    Seq((2L, 20L)).toDF("id", "v").write.format("graft-versioned")
      .option("commitTs", "4000").mode("append").save(root)
    assert(rows(sql("SELECT * FROM gtest.ns.t2 VERSION AS OF 0")) === Seq("[1,10]"))
    assert(rows(sql("SELECT * FROM gtest.ns.t2")) === Seq("[1,10]", "[2,20]"))
    // stamps are micros: 3000 µs after epoch picks v=0
    assert(rows(sql(
      "SELECT * FROM gtest.ns.t2 TIMESTAMP AS OF '1970-01-01 00:00:00.003'")) ===
      Seq("[1,10]"))
  }

  test("INSERT OVERWRITE replaces the snapshot; history keeps the old rows") {
    sql("DROP TABLE IF EXISTS gtest.ns.t3")
    sql("CREATE TABLE gtest.ns.t3 (id BIGINT, tag STRING) USING `graft-versioned`")
    sql("INSERT INTO gtest.ns.t3 VALUES (1, 'a'), (2, 'b')")
    sql("INSERT OVERWRITE gtest.ns.t3 VALUES (9, 'z')")
    assert(rows(sql("SELECT * FROM gtest.ns.t3")) === Seq("[9,z]"))
    assert(rows(sql("SELECT * FROM gtest.ns.t3 VERSION AS OF 0")) ===
      Seq("[1,a]", "[2,b]"))
  }

  test("SHOW TABLES / DROP / rename; namespaces are real") {
    sql("DROP TABLE IF EXISTS gtest.ns.t4a")
    sql("DROP TABLE IF EXISTS gtest.ns.t4b")
    sql("CREATE TABLE gtest.ns.t4a (id BIGINT) USING `graft-versioned`")
    val listed = sql("SHOW TABLES IN gtest.ns").collect().map(_.getString(1)).toSet
    assert(listed.contains("t4a"))
    sql("ALTER TABLE gtest.ns.t4a RENAME TO ns.t4b")
    sql("INSERT INTO gtest.ns.t4b VALUES (5)")
    assert(rows(sql("SELECT * FROM gtest.ns.t4b")) === Seq("[5]"))
    sql("DROP TABLE gtest.ns.t4b")
    assert(!sql("SHOW TABLES IN gtest.ns").collect()
      .map(_.getString(1)).contains("t4b"))
  }

  test("fail-loud: partitioned DDL, ALTER, unsupported type, missing version") {
    sql("DROP TABLE IF EXISTS gtest.ns.t5")
    val part = intercept[Exception] {
      sql("CREATE TABLE gtest.ns.t5 (id BIGINT, d STRING) USING `graft-versioned` PARTITIONED BY (d)")
    }
    assert(chain(part).exists(_.contains("unpartitioned")))
    val badType = intercept[Exception] {
      sql("CREATE TABLE gtest.ns.t5 (id BIGINT, xs ARRAY<INT>) USING `graft-versioned`")
    }
    assert(chain(badType).exists(_.contains("unsupported column type")))
    sql("CREATE TABLE gtest.ns.t5 (id BIGINT) USING `graft-versioned`")
    val alter = intercept[Exception] {
      sql("ALTER TABLE gtest.ns.t5 ADD COLUMN extra BIGINT")
    }
    assert(chain(alter).exists(_.contains("ALTER TABLE is not supported")))
    sql("INSERT INTO gtest.ns.t5 VALUES (1)")
    val missing = intercept[Exception] {
      sql("SELECT * FROM gtest.ns.t5 VERSION AS OF 7").collect()
    }
    assert(chain(missing).exists(_.contains("does not exist")))
  }

  private def chain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
}
