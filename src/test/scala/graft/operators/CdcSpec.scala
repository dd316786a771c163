package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** CDC building blocks: SCD2 interval chaining, last-writer-wins
  * compaction with deletes, and snapshot diff classification. */
class CdcSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("scd2 chains effective intervals and flags the open row") {
    val ch = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 15L, "x"))
      .toDF("k", "seq", "payload")
    val h = Cdc.scd2(ch, Seq("k"), Seq("seq"))
      .select("k", "seq", "effective_from", "effective_to", "is_current")
      .orderBy("k", "seq").collect()
    assert(h.toSeq === Seq(
      Row(1L, 10L, 10L, 20L, 0),
      Row(1L, 20L, 20L, 30L, 0),
      Row(1L, 30L, 30L, null, 1),
      Row(2L, 15L, 15L, null, 1)))
  }

  test("scd2 ties broken by the secondary seq column, deterministically") {
    val ch = Seq((1L, 10L, 2L, "late"), (1L, 10L, 1L, "early"))
      .toDF("k", "t", "id", "payload")
    val h = Cdc.scd2(ch, Seq("k"), Seq("t", "id"))
      .orderBy("t", "id").collect()
    // the id=1 row closes at the id=2 row's time; id=2 stays open
    assert(h.map(r => (r.getAs[Long]("id"), r.getAs[Int]("is_current"))).toSeq
      === Seq((1L, 0), (2L, 1)))
  }

  test("compactChangelog keeps the last writer and honors trailing deletes") {
    val ch = Seq(
      (1L, 1L, "U", "v1"), (1L, 2L, "U", "v2"),          // upsert twice -> v2
      (2L, 1L, "U", "w1"), (2L, 2L, "D", ""),            // delete last -> gone
      (3L, 2L, "D", ""), (3L, 3L, "U", "z1"))            // delete then upsert -> z1
      .toDF("k", "seq", "op", "payload")
    val out = Cdc.compactChangelog(ch, Seq("k"), Seq("seq"), "op")
      .select("k", "payload").orderBy("k").collect()
    assert(out.toSeq === Seq(Row(1L, "v2"), Row(3L, "z1")))
  }

  test("keepTombstones retains winning deletes so out-of-order merges stay dead") {
    val ch = Seq((1L, 5L, "D", ""), (2L, 1L, "U", "ok"))
      .toDF("k", "seq", "op", "payload")
    val state = Cdc.compactChangelog(ch, Seq("k"), Seq("seq"), "op",
      keepTombstones = true)
    assert(state.count() === 2) // the delete survives as a tombstone
    // a LATER batch delivers an EARLIER change for the dead key: the
    // tombstone must win the re-compaction
    val late = Seq((1L, 3L, "U", "stale")).toDF("k", "seq", "op", "payload")
    val merged = Cdc.compactChangelog(state.unionByName(late),
      Seq("k"), Seq("seq"), "op", keepTombstones = true)
    assert(merged.filter($"k" === 1L).select("op").head().getString(0) === "D")
    // the final read drops tombstones
    assert(merged.filter($"op" =!= "D").count() === 1)
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val before = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "s", "p")
    val after = Seq((2L, "b", 20L), (3L, "c", 99L), (4L, "d", 40L))
      .toDF("k", "s", "p")
    val d = Cdc.snapshotDiff(before, after, Seq("k"), Seq("s", "p"))
      .select("k", "change_type").orderBy("k").collect()
    assert(d.toSeq === Seq(
      Row(1L, "removed"), Row(3L, "changed"), Row(4L, "added")))
  }

  test("snapshotDiff treats null payloads with null-safe equality") {
    val before = Seq((1L, Option.empty[String]), (2L, Option("x")))
      .toDF("k", "s")
    val after = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "s")
    val d = Cdc.snapshotDiff(before, after, Seq("k"), Seq("s"))
      .select("k", "change_type").orderBy("k").collect()
    // null == null payload is unchanged; x -> null is a change
    assert(d.toSeq === Seq(Row(2L, "changed")))
  }
}
