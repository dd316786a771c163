package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Versioned

/** Commit file manifests (`_graft_files`) + the latest-version hint
  * (`_graft_latest`): snapshot reads resolve their file lists from the
  * commit manifest (stray files invisible, no directory listing on the
  * read path), and "latest" resolves through a verified hint instead of
  * walking the whole history. */
class ManifestSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def newRoot(commits: Int): String = {
    val r = java.nio.file.Files.createTempDirectory("graft_manifest_").toString
    (0 until commits).foreach { i =>
      Versioned.writeNext(
        (0L until 20L).map(k => (k, k * 10 + i)).toDF("id", "v"),
        r, Some(1000L + i))
    }
    r
  }

  test("a stray alien parquet planted in v=N is invisible to every read") {
    val root = newRoot(1)
    // plant an alien: a valid parquet file that is NOT in the manifest
    val alien = java.nio.file.Paths.get(root, "v=0", "alien-file.parquet")
    Seq((999L, 999L)).toDF("id", "v").write.mode("overwrite")
      .parquet(s"$root/_alien_tmp")
    val part = Versioned.listParquet(
      java.nio.file.Paths.get(root, "_alien_tmp")).head
    java.nio.file.Files.copy(part, alien)
    Versioned.deleteRecursively(java.nio.file.Paths.get(root, "_alien_tmp"))
    // helper API, DSv2, and the footer-stats scan all resolve through
    // the manifest -> 20 rows, never 21
    assert(Versioned.read(spark, root).count() === 20L)
    val dsv2 = spark.read.format("graft-versioned").load(root)
    assert(dsv2.count() === 20L)
    assert(dsv2.agg(org.apache.spark.sql.functions.max("id"))
      .collect()(0).getLong(0) === 19L)
    // the alien also never reaches a compaction rewrite
    val cv = Versioned.compact(spark, root)
    assert(Versioned.read(spark, root, Some(cv)).count() === 20L)
  }

  test("a manifest naming a missing data file fails loudly, not partially") {
    val root = newRoot(1)
    val victim = Versioned.dataFiles(
      java.nio.file.Paths.get(root, "v=0")).head
    java.nio.file.Files.delete(victim)
    val err = intercept[Exception] { Versioned.read(spark, root).count() }
    assert(err.getMessage.contains("missing data file") ||
      String.valueOf(err.getCause).contains("missing data file"))
  }

  test("latest resolves through the hint and survives a stale or corrupt one") {
    val root = newRoot(3)
    assert(Versioned.latestVersion(root) === Some(2L))
    val hint = java.nio.file.Paths.get(root, "_graft_latest")
    assert(java.nio.file.Files.exists(hint), "commits must write the hint")
    // stale-low hint: probe forward finds the true latest
    java.nio.file.Files.write(hint, "0".getBytes)
    assert(Versioned.latestVersion(root) === Some(2L))
    // corrupt hint: full-listing fallback
    java.nio.file.Files.write(hint, "not-a-number".getBytes)
    assert(Versioned.latestVersion(root) === Some(2L))
    // stale-high hint (a rolled-back version): fallback, still right
    java.nio.file.Files.write(hint, "99".getBytes)
    assert(Versioned.latestVersion(root) === Some(2L))
    // absent hint
    java.nio.file.Files.delete(hint)
    assert(Versioned.latestVersion(root) === Some(2L))
    // and the next commit restores it
    Versioned.writeNext((0L until 5L).map(k => (k, k)).toDF("id", "v"),
      root, Some(2000L))
    assert(new String(java.nio.file.Files.readAllBytes(hint)).trim === "3")
  }

  test("rollback re-points the hint; retention leaves it valid") {
    val root = newRoot(4)
    Versioned.rollback(root)
    val hint = java.nio.file.Paths.get(root, "_graft_latest")
    assert(new String(java.nio.file.Files.readAllBytes(hint)).trim === "2")
    assert(Versioned.latestVersion(root) === Some(2L))
    Versioned.applyRetention(root, keep = 2)
    assert(Versioned.latestVersion(root) === Some(2L))
    assert(Versioned.versions(root) === Seq(1L, 2L))
  }

  test("DSv2 commits write manifests; stray files invisible through SQL too") {
    val wh = java.nio.file.Files.createTempDirectory("graft_manifest_wh_").toString
    spark.conf.set("spark.sql.catalog.mft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mft.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mft.t")
    spark.sql("CREATE TABLE mft.t.a (id BIGINT, v BIGINT) USING `graft-versioned`")
    spark.sql("INSERT INTO mft.t.a SELECT id, id * 2 FROM range(0, 30)")
    val vdir = java.nio.file.Paths.get(wh, "t", "a", "v=0")
    assert(java.nio.file.Files.exists(vdir.resolve("_graft_files")))
    // plant an alien copy of a real file under a different name
    val real = Versioned.dataFiles(vdir).head
    java.nio.file.Files.copy(real, vdir.resolve("alien-copy.parquet"))
    assert(spark.sql("SELECT count(*) FROM mft.t.a")
      .collect()(0).getLong(0) === 30L)
    // append commit: carried files + new files all manifest-listed
    spark.sql("INSERT INTO mft.t.a SELECT id, id FROM range(100, 110)")
    assert(spark.sql("SELECT count(*) FROM mft.t.a")
      .collect()(0).getLong(0) === 40L,
      "the alien must not ride along through an append commit")
  }
}
