package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Semantics of the bucketized range join vs the naive theta-join it
  * replaces: inclusive bounds, intervals spanning many buckets,
  * negative values (floor vs truncate division), and no duplicate
  * pairs when a point's bucket is covered by several interval buckets.
  */
class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val points =
    Seq(-1000L, -513L, -512L, -1L, 0L, 1L, 511L, 512L, 767L, 5000L).toDF("pv")
  private val intervals = Seq(
    (1L, -600L, -500L),   // straddles a negative bucket edge
    (2L, 0L, 511L),       // exactly one bucket
    (3L, 0L, 0L),         // degenerate single point
    (4L, -2000L, 6000L),  // spans every bucket in play
    (5L, 600L, 650L)      // covers no point
  ).toDF("iid", "lo", "hi")

  private def naive = points.join(intervals,
    $"pv" >= $"lo" && $"pv" <= $"hi").select("pv", "iid")

  test("bucketized join equals the naive theta-join, for several widths") {
    val expect = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    for (w <- Seq(1L, 7L, 512L, 100000L)) {
      val got = RangeJoin.bucketed(points, "pv", intervals, "lo", "hi", w)
        .select("pv", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == expect.toSeq, s"width=$w diverged")
    }
  }

  test("pairs are unique: a spanning interval emits each point once") {
    val got = RangeJoin.bucketed(points, "pv", intervals.filter($"iid" === 4),
      "lo", "hi", 512L)
    assert(got.count() == got.distinct().count())
    assert(got.count() == points.count()) // interval 4 covers all points
  }

  test("property: random interval sets equal the naive join at random widths") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val pGen = Gen.chooseNum(-5000L, 5000L)
    val ivGen = for {
      lo <- Gen.chooseNum(-5000L, 5000L)
      len <- Gen.chooseNum(0L, 800L)
    } yield (lo, lo + len)
    for (round <- 1 to 3) {
      val ps = (0 until 120).map(i => sample(pGen, round * 1000L + i)).toDF("pv")
      val ivs = (0 until 40).map { i =>
        val (lo, hi) = sample(ivGen, round * 7000L + i); (i.toLong, lo, hi)
      }.toDF("iid", "lo", "hi")
      val expect = ps.join(ivs, $"pv" >= $"lo" && $"pv" <= $"hi")
        .select("pv", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val width = sample(Gen.chooseNum(1L, 2000L), round * 31L)
      val got = RangeJoin.bucketed(ps, "pv", ivs, "lo", "hi", width)
        .select("pv", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == expect.toSeq, s"round=$round width=$width diverged")
    }
  }

  test("two-tier join equals single-tier on a mixed-length interval set") {
    val mixed = Seq(
      (10L, 0L, 10L), (11L, 100L, 120L), (12L, -50L, -40L),  // short
      (13L, -2000L, 6000L), (14L, 0L, 4000L)                 // long tail
    ).toDF("iid", "lo", "hi")
    val single = RangeJoin.bucketed(points, "pv", mixed, "lo", "hi", 64L)
      .select("pv", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val two = RangeJoin.bucketedTwoTier(points, "pv", mixed, "lo", "hi",
        width = 64L, splitLen = 500L, coarseWidth = 2048L)
      .select("pv", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(two.toSeq == single.toSeq)
  }

  test("inclusive bounds on both ends") {
    val got = RangeJoin.bucketed(points, "pv",
        intervals.filter($"iid" === 2), "lo", "hi", 512L)
      .select("pv").as[Long].collect().sorted
    assert(got.toSeq == Seq(0L, 1L, 511L)) // 512 excluded, 0 included
  }
}
