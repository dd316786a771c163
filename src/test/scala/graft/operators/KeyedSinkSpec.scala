package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Idempotent keyed sink semantics (S11/J7/J8): null keys skipped,
  * within-batch dups collapsed, applying twice = applying once, and the
  * Bloom two-tier path equals the exact path. */
class KeyedSinkSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val existing = Seq(("a", 1), ("b", 2)).toDF("k", "v")
  private lazy val incoming =
    Seq(("b", 20), ("c", 30), (null.asInstanceOf[String], 40), ("c", 31))
      .toDF("k", "v")

  test("newRowsOnly: skips nulls, drops seen keys, collapses batch dups") {
    val fresh = KeyedSink.newRowsOnly(existing, incoming, "k")
    assert(fresh.select("k").as[String].collect().toSeq === Seq("c"))
  }

  test("upsertAbsent is idempotent (sink applied twice = once)") {
    val once = KeyedSink.upsertAbsent(existing, incoming, "k")
    val twice = KeyedSink.upsertAbsent(once, incoming, "k")
    assert(once.count() === 3)
    assert(twice.count() === 3)
    assert(twice.select("k").as[String].collect().sorted.toSeq === Seq("a", "b", "c"))
  }

  test("two-tier Bloom pre-filter + exact check equals exact dedup") {
    val bloom = KeyedSink.buildBloom(existing, "k", expectedItems = 100, fpp = 0.01)
    val viaBloom = KeyedSink.dedupTwoTier(existing, incoming, "k", bloom)
      .select("k").as[String].collect().sorted.toSeq
    assert(viaBloom === Seq("c"))
    // definitely-new side never consults the exact set
    val (fresh, suspect) = KeyedSink.bloomSplit(
      incoming.filter(col("k").isNotNull).dropDuplicates("k"), "k", bloom)
    assert(suspect.select("k").as[String].collect().toSet.contains("b"))
    assert((fresh.count() + suspect.count()) === 2)
  }

  test("bloom sketch survives its checkpoint file byte-for-byte") {
    val bloom = KeyedSink.buildBloom(existing, "k", expectedItems = 100, fpp = 0.01)
    val path = java.nio.file.Files.createTempDirectory("bloom_spec_")
      .resolve("nested").resolve("seen.bloom")
    KeyedSink.saveBloom(bloom, path)
    val reloaded = KeyedSink.loadBloom(path)
    // identical membership judgments — the reloaded sketch IS the sketch
    val keys = ('a' to 'z').map(_.toString) ++ Seq("u0", "u1", "u999")
    keys.foreach { k =>
      assert(reloaded.mightContainString(k) === bloom.mightContainString(k), k)
    }
    // overwrite is atomic-rename: saving again over the same path works
    KeyedSink.saveBloom(bloom, path)
    assert(KeyedSink.loadBloom(path).mightContainString("a") ===
      bloom.mightContainString("a"))
    // and the two-tier sink run off the reloaded sketch is still exact
    val out = KeyedSink.dedupTwoTier(existing, incoming, "k", reloaded)
      .select("k").as[String].collect().sorted.toSeq
    assert(out === Seq("c"))
  }

  test("deleteWhere: predicate delete incl. null-safe semantics (P10)") {
    val tbl = Seq(("x", Some(1)), ("y", None), ("z", Some(3))).toDF("k", "v")
    val kept = KeyedSink.deleteWhere(tbl, col("v") > 2)
    // null predicate rows are kept (delete only where predicate is TRUE)
    assert(kept.select("k").as[String].collect().sorted.toSeq === Seq("x", "y"))
  }

  test("mergeInto: update, insert, delete, and passthrough in one pass") {
    val state = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "bal")
    val changes = Seq(
      (2L, "upsert", 99L),  // update matched
      (4L, "upsert", 40L),  // insert unmatched
      (3L, "delete", 0L),   // delete matched
      (5L, "delete", 0L))   // delete of an ABSENT key is a no-op
      .toDF("k", "op", "bal")
    val out = KeyedSink.mergeInto(state, changes, "k", "op", Seq("bal"))
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 10L), (2L, 99L), (4L, 40L)))
  }

  test("mergeInto: an ambiguous change set (two rows, one key) fails loudly") {
    val state = Seq((1L, 10L)).toDF("k", "bal")
    val dup = Seq((1L, "upsert", 5L), (1L, "upsert", 6L)).toDF("k", "op", "bal")
    // the guard is a raise_error expression riding the merge join's own
    // exchange (no separate validation job), so it fires at action time
    val ex = intercept[Exception] {
      KeyedSink.mergeInto(state, dup, "k", "op", Seq("bal")).collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("one source row per key") && msg.contains("k=1"),
      s"guard failure does not explain itself: $msg")
  }
}
