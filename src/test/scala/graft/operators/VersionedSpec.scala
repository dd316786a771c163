package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** S13/S14/O3 ops parity: versioned write/read/rollback/retention,
  * validation guards, and the price-prediction feed. */
class VersionedSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("graft_versioned").toString

  test("writeNext/read/rollback: version swap semantics (S13)") {
    val root = tmpRoot()
    val v0 = Versioned.writeNext(Seq((1, "a")).toDF("id", "v"), root)
    val v1 = Versioned.writeNext(Seq((2, "b")).toDF("id", "v"), root)
    assert((v0, v1) === (0L, 1L))
    assert(Versioned.read(spark, root).select("v").as[String].collect().toSeq === Seq("b"))
    // rollback restores the previous version as current
    assert(Versioned.rollback(root) === Some(0L))
    assert(Versioned.read(spark, root).select("v").as[String].collect().toSeq === Seq("a"))
  }

  test("retention keeps newest 3 (utils_of_backup.py:155-164)") {
    val root = tmpRoot()
    (0 until 5).foreach(i => Versioned.writeNext(Seq(i).toDF("x"), root))
    assert(Versioned.applyRetention(root, keep = 3) === Seq(2L, 3L, 4L))
  }

  test("validateAgainst flags drift and emptiness (S14)") {
    val src = Seq((1, "a")).toDF("id", "v")
    assert(Versioned.validateAgainst(src, src).isEmpty)
    val missingCol = src.drop("v")
    assert(Versioned.validateAgainst(missingCol, src).exists(_.contains("column sets")))
    val empty = src.filter(lit(false))
    assert(Versioned.validateAgainst(empty, src).exists(_.contains("empty")))
  }

  test("nullAudit reports only columns with nulls (pre-write guard)") {
    val df = Seq((Some(1), "a"), (None, "b")).toDF("x", "y")
    assert(Versioned.nullAudit(df, Seq("x", "y")) === Map("x" -> 1L))
  }

  test("price-prediction feed: drop, filter, patch, guarded load (§3.3)") {
    val listings = Seq(
      ("u1", "apartment-sell", -1370, "img"),
      ("u2", "apartment-sell", 1390, "img"),
      ("u3", "villa-rent", 1380, "img"))
      .toDF("content_url", "cat3_slug", "construction_year", "images")
    val prep = PricePredictionFeed.prepare(listings)
    assert(prep.columns.toSet === Set("cat3_slug", "construction_year"))
    assert(prep.count() === 2)
    assert(prep.select("construction_year").as[Int].collect().sorted.toSeq === Seq(1369, 1390))
    val root = tmpRoot()
    assert(PricePredictionFeed.loadVersioned(prep, root) === 0L)
    // empty transform → guarded abort, nothing written
    val err = intercept[IllegalStateException] {
      PricePredictionFeed.loadVersioned(
        PricePredictionFeed.prepare(listings, cat3 = "nope"), tmpRoot())
    }
    assert(err.getMessage.contains("no rows"))
  }

  test("CSV roundtrip replaces the chunked pandas path (S6/S15)") {
    val root = tmpRoot() + "/csv"
    val df = Seq((1, "a,b"), (2, "c\nd")).toDF("id", "txt")
    df.write.mode("overwrite").option("header", true).csv(root)
    val back = spark.read.option("header", true).option("multiLine", true)
      .schema("id INT, txt STRING").csv(root)
    assert(back.orderBy("id").as[(Int, String)].collect().toSeq ===
      Seq((1, "a,b"), (2, "c\nd")))
  }
}
