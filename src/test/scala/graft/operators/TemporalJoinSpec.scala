package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** As-of join semantics: inclusive match, per-key isolation, no-prior
  * nulls, tolerance window, and ties at equal timestamps. */
class TemporalJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    ("k1", 10L, "L10"), ("k1", 20L, "L20"), ("k2", 5L, "L5"), ("k3", 7L, "L7"))
    .toDF("k", "t", "payload")
  private lazy val right = Seq(
    ("k1", 8L, "R8"), ("k1", 15L, "R15"), ("k1", 20L, "R20"), ("k4", 1L, "R1"))
    .toDF("k", "rt", "state")

  private lazy val out = TemporalJoin.asOfJoin(left, right, Seq("k"), "t", "rt")
    .orderBy("k", "t").collect()

  test("latest at-or-before match per key, inclusive at equal time") {
    assert(out.map(r => (r.getAs[String]("k"), r.getAs[Long]("t"),
      r.getAs[String]("state"))).toSeq === Seq(
      ("k1", 10L, "R8"),
      ("k1", 20L, "R20"),   // equal timestamp matches (inclusive >=)
      ("k2", 5L, null),     // key with no right rows
      ("k3", 7L, null)))
  }

  test("matched right time surfaces; left payload preserved") {
    val r0 = out(0)
    assert(r0.getAs[Long]("rt_matched") === 8L)
    assert(r0.getAs[String]("payload") === "L10")
  }

  test("tolerance nulls out stale matches") {
    val tight = TemporalJoin.asOfJoin(left, right, Seq("k"), "t", "rt",
      toleranceNs = Some(1L)).orderBy("k", "t").collect()
    // k1@10 matched R8 at distance 2 > 1 → nulled; k1@20 matched R20 at 0 → kept
    assert(tight(0).isNullAt(tight(0).fieldIndex("state")))
    assert(tight(1).getAs[String]("state") === "R20")
  }

  test("right-only keys never appear (left join shape)") {
    assert(!out.exists(_.getAs[String]("k") == "k4"))
    assert(out.length === 4)
  }

  test("forward direction: earliest at-or-after match, inclusive at equal time") {
    val fwd = TemporalJoin.asOfJoin(left, right, Seq("k"), "t", "rt",
      direction = "forward").orderBy("k", "t").collect()
    assert(fwd.map(r => (r.getAs[String]("k"), r.getAs[Long]("t"),
      r.getAs[String]("state"))).toSeq === Seq(
      ("k1", 10L, "R15"),   // next right row after t=10
      ("k1", 20L, "R20"),   // equal timestamp matches (inclusive <=)
      ("k2", 5L, null),
      ("k3", 7L, null)))
    assert(fwd(0).getAs[Long]("rt_matched") === 15L)
  }

  test("forward tolerance nulls out far-future matches") {
    val tight = TemporalJoin.asOfJoin(left, right, Seq("k"), "t", "rt",
      toleranceNs = Some(2L), direction = "forward").orderBy("k", "t").collect()
    // k1@10 matched R15 at distance 5 > 2 → nulled; k1@20 matched R20 at 0 → kept
    assert(tight(0).isNullAt(tight(0).fieldIndex("state")))
    assert(tight(1).getAs[String]("state") === "R20")
  }

  test("unknown direction fails loudly") {
    val ex = intercept[IllegalArgumentException] {
      TemporalJoin.asOfJoin(left, right, Seq("k"), "t", "rt",
        direction = "sideways")
    }
    assert(ex.getMessage.contains("backward"))
  }

  test("null value in the matched right row stays null (no stale leak)") {
    // the matched (latest at-or-before) row has state=null but score=200;
    // the OLDER row has state="R8". True as-of semantics (DuckDB ASOF
    // JOIN) take the matched row wholesale — state must be null, not a
    // resurrected "R8" from the older row.
    val l = Seq(("k1", 20L)).toDF("k", "t")
    val r = Seq(
      ("k1", 8L, Option("R8"), Option(100L)),
      ("k1", 15L, Option.empty[String], Option(200L)))
      .toDF("k", "rt", "state", "score")
    val row = TemporalJoin.asOfJoin(l, r, Seq("k"), "t", "rt").collect().head
    assert(row.getAs[Long]("rt_matched") === 15L)
    assert(row.isNullAt(row.fieldIndex("state")))
    assert(row.getAs[Long]("score") === 200L)
  }

  test("native operator matches the composed form on the fixture, both directions") {
    for (dir <- Seq("backward", "forward")) {
      val composed = TemporalJoin.asOfJoin(left, right, Seq("k"), "t", "rt",
        direction = dir).collect().map(_.toString).sorted.toSeq
      val native = TemporalJoin.asOfJoinNative(left, right, Seq("k"), "t", "rt",
        direction = dir).collect().map(_.toString).sorted.toSeq
      assert(native === composed, s"direction=$dir")
    }
  }

  test("native operator: empty sides and long-key requirement") {
    val emptyR = right.filter(lit(false))
    val n1 = TemporalJoin.asOfJoinNative(left, emptyR, Seq("k"), "t", "rt")
      .collect()
    assert(n1.length === left.count())
    assert(n1.forall(_.isNullAt(n1.head.fieldIndex("rt_matched"))))
    val emptyL = left.filter(lit(false))
    assert(TemporalJoin.asOfJoinNative(emptyL, right, Seq("k"), "t", "rt")
      .collect().isEmpty)
    // non-long time column fails loudly at construction
    val badTime = left.withColumn("t", col("t").cast("string"))
    val err = intercept[IllegalArgumentException] {
      TemporalJoin.asOfJoinNative(badTime, right, Seq("k"), "t", "rt")
    }
    assert(err.getMessage.contains("epoch-long"))
  }

  test("native operator: mismatched key types fail loudly at construction") {
    // the merge compares key UnsafeRows under the LEFT key types — an
    // int-vs-bigint mismatch would compare silently wrong, so the
    // builder must refuse it
    val intKeyedRight = right.withColumn("k0", lit(1))
      .drop("k").withColumnRenamed("k0", "k")
    val err = intercept[IllegalArgumentException] {
      TemporalJoin.asOfJoinNative(left, intKeyedRight, Seq("k"), "t", "rt")
    }
    assert(err.getMessage.contains("mismatched types"))
  }
}
