package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Versioned

/** Commit-log checkpoint (`_graft_checkpoint`): `TIMESTAMP AS OF`
  * resolution and `sys.history` read per-version stamp/marker files —
  * O(history) GETs on an object store. The checkpoint aggregates the
  * immutable per-commit facts every [[Versioned.CheckpointInterval]]
  * stamped commits; it is an ACCELERATOR whose presence, staleness,
  * corruption, or absence must never change an answer. */
class CheckpointSpec extends AnyFunSuite with SparkSpec {

  private def freshRoot(commits: Int): String = {
    val root = Files.createTempDirectory("graft_cp_spec_").toString
    import spark.implicits._
    (0 until commits).foreach { i =>
      Versioned.writeNext(
        Seq((i.toLong, i.toLong * 10)).toDF("id", "v"),
        root, commitTs = Some(1000L + i))
    }
    root
  }

  test("checkpoint appears at the interval and covers the pre-commit history") {
    val root = freshRoot(9)
    assert(Versioned.readCheckpoint(root).isEmpty,
      "no checkpoint before the interval-th commit")
    import spark.implicits._
    Versioned.writeNext(Seq((9L, 90L)).toDF("id", "v"), root,
      commitTs = Some(1009L)) // v=9
    Versioned.writeNext(Seq((10L, 100L)).toDF("id", "v"), root,
      commitTs = Some(1010L)) // v=10 -> checkpoint covering 0..9
    val cp = Versioned.readCheckpoint(root)
    assert(cp.exists(_._1 == 9L), s"cover: ${cp.map(_._1)}")
    val rows = cp.get._2
    assert(rows.keySet === (0L to 9L).toSet)
    assert(rows(3L).ts === Some(1003L))
    assert(rows(3L).op === "write")
    assert(rows(3L).nFiles >= 1 && rows(3L).bytes > 0)
  }

  test("backwards-clock commit stamps clamp: resolution order follows versions") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cp_skew_").toString
    Versioned.writeNext(Seq((0L, "v0")).toDF("id", "tag"), root,
      commitTs = Some(5000L))
    // a skewed writer whose clock runs BEHIND injects an earlier stamp:
    // without in-commit monotonicity, TIMESTAMP AS OF 4000 would
    // resolve to the NEWER v=1 while AS OF 5000 resolves v=0 —
    // time travel ordering inverted against version order
    Versioned.writeNext(Seq((1L, "v1")).toDF("id", "tag"), root,
      commitTs = Some(4000L))
    val s0 = Versioned.commitStamp(root, 0L).get
    val s1 = Versioned.commitStamp(root, 1L).get
    assert(s1 >= s0, s"stamps must be monotone in version ($s0 then $s1)")
    def tagAt(ts: Long): String =
      Versioned.readAsOf(spark, root, ts).select("tag").as[String].head()
    // the injected 4000 was LIFTED to the parent's 5000 — nothing
    // resolves before the table's first stamp, exactly as if the
    // skewed commit had arrived with an honest clock
    val early = intercept[IllegalStateException](tagAt(4500L))
    assert(early.getMessage.contains("earliest commit"), early.getMessage)
    assert(tagAt(5000L) === "v1",
      "at the shared clamped stamp the newest version wins")
    assert(tagAt(9999L) === "v1")
    // a FORWARD clock is untouched: stamps keep their given values
    Versioned.writeNext(Seq((2L, "v2")).toDF("id", "tag"), root,
      commitTs = Some(8000L))
    assert(Versioned.commitStamp(root, 2L) === Some(8000L))
    assert(tagAt(7999L) === "v1")
    assert(tagAt(8000L) === "v2")
  }

  test("resolveAsOf answers identically with, without, and with a corrupt checkpoint") {
    val root = freshRoot(21) // checkpoints at v=10 (cover 9) and v=20 (cover 19)
    val cpFile = Paths.get(root, "_graft_checkpoint")
    assert(Files.exists(cpFile))
    val probes = Seq(1000L, 1005L, 1012L, 1019L, 1020L, 99999L)
    val withCp = probes.map(Versioned.resolveAsOf(root, _))
    assert(withCp === Seq(0L, 5L, 12L, 19L, 20L, 20L))
    val bytes = Files.readAllBytes(cpFile)
    // absent checkpoint: pure walk
    Files.delete(cpFile)
    assert(probes.map(Versioned.resolveAsOf(root, _)) === withCp)
    // corrupt checkpoint: unreadable falls back to the walk, loudly-free
    Files.write(cpFile, "cp not-a-number\n{garbage".getBytes)
    assert(probes.map(Versioned.resolveAsOf(root, _)) === withCp)
    Files.write(cpFile, bytes) // restore
    assert(probes.map(Versioned.resolveAsOf(root, _)) === withCp)
  }

  test("rollback truncates the checkpoint so a reused version number can't go stale") {
    val root = freshRoot(11) // checkpoint at v=10, cover 9
    assert(Versioned.readCheckpoint(root).exists(_._1 == 9L))
    // roll back to v=7: covers above the drop point must shrink
    Versioned.rollback(root) // drops v=10
    Versioned.rollback(root) // drops v=9
    Versioned.rollback(root) // drops v=8 -> cover must be <= 7
    val cp = Versioned.readCheckpoint(root)
    assert(cp.forall(_._1 <= 7L), s"cover after rollbacks: ${cp.map(_._1)}")
    // recommit v=8 with a DIFFERENT stamp — resolution must see the new one
    import spark.implicits._
    Versioned.writeNext(Seq((88L, 880L)).toDF("id", "v"), root,
      commitTs = Some(5000L))
    assert(Versioned.resolveAsOf(root, 5000L) === 8L)
    assert(Versioned.resolveAsOf(root, 4999L) === 7L)
    // the old v=8 stamp (1008) must NOT resolve to the dead commit:
    // 1008 now maps to v=7 (stamp 1007 is the latest <= 1008)
    assert(Versioned.resolveAsOf(root, 1008L) === 7L)
  }

  test("retention-deleted versions are dead weight in the checkpoint, not wrong answers") {
    val root = freshRoot(13) // checkpoint at v=10
    Versioned.applyRetention(root, keep = 4) // v=0..8 die, 9..12 survive
    assert(Versioned.versions(root) === Seq(9L, 10L, 11L, 12L))
    // rows for dead versions remain in the file; the surviving set
    // comes from the listing, so resolution ignores them
    assert(Versioned.resolveAsOf(root, 1011L) === 11L)
    assert(Versioned.resolveAsOf(root, 99999L) === 12L)
    val e = intercept[IllegalStateException](Versioned.resolveAsOf(root, 500L))
    assert(e.getMessage.contains("no version committed at or before"))
  }

  test("age-gated retention: expired die, tagged and keep-floor survive, holes are fine") {
    val root = freshRoot(6) // stamps 1000..1005
    Versioned.tagVersion(root, "pin", Some(1L))
    val survivors = Versioned.applyRetention(root, keep = 2,
      beforeStamp = Some(1004L))
    // v=0,2,3 expired (stamps < 1004, untagged); v=1 tagged; v=4,5 keep=2
    assert(survivors === Seq(1L, 4L, 5L))
    // latest resolution and time travel still exact over the holes
    assert(Versioned.latestVersion(root) === Some(5L))
    assert(Versioned.resolveAsOf(root, 1001L) === 1L)
    assert(Versioned.resolveAsOf(root, 1003L) === 1L) // 2,3 are gone
    assert(Versioned.resolveAsOf(root, 1004L) === 4L)
    // age alone never deletes inside the keep floor even when expired
    val after = Versioned.applyRetention(root, keep = 2,
      beforeStamp = Some(99999L))
    assert(after === Seq(1L, 4L, 5L))
  }

  test("sys.history serves checkpoint-covered rows byte-identically to the walk") {
    val warehouse = Files.createTempDirectory("graft_cp_hist_").toString
    spark.conf.set("spark.sql.catalog.cphist", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cphist.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cphist.ns")
    spark.sql("CREATE TABLE cphist.ns.t (id BIGINT, v BIGINT) USING `graft-versioned`")
    (0 until 12).foreach { i =>
      spark.sql(s"INSERT INTO cphist.ns.t VALUES ($i, ${i * 10})")
    }
    val root = s"$warehouse/ns/t"
    assert(Versioned.readCheckpoint(root).exists(_._1 == 9L))
    def history(): Seq[String] =
      spark.sql("CALL cphist.sys.history(table => 'ns.t')")
        .collect().map(_.toString).toSeq
    val withCp = history()
    assert(withCp.size === 12)
    val cpFile = Paths.get(root, "_graft_checkpoint")
    val bytes = Files.readAllBytes(cpFile)
    Files.delete(cpFile)
    assert(history() === withCp, "history must not depend on the checkpoint")
    Files.write(cpFile, bytes)
  }
}
