package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** PageRank invariants on hand-analyzable graphs. */
class GraphSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("ring graph: perfect symmetry gives one identical rank everywhere") {
    val n = 40L
    val v = (0L until n).toDF("v")
    val e = (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val ranks = Graph.pageRank(v, e, iters = 4)
    assert(ranks.select("rank_e6").distinct().count() == 1)
    assert(ranks.count() == n)
  }

  test("star graph: the hub outranks the leaves, leaves sit at the teleport floor") {
    // leaves 1..9 each link only to hub 0; hub links to leaf 1
    val v = (0L to 9L).toDF("v")
    val e = ((1L to 9L).map(i => (i, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(v, e, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > r(1L), "hub must outrank the linked leaf")
    assert((2L to 9L).forall(i => r(i) == 150000L),
      "unlinked leaves must sit at the teleport floor")
  }

  test("property: pageRank equals an in-memory reference on random graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    for (round <- 1 to 3) {
      val n = 30
      val edges = (0 until 80).map { i =>
        (sample(Gen.chooseNum(0L, n - 1L), round * 100L + i),
          sample(Gen.chooseNum(0L, n - 1L), round * 900L + i))
      }.distinct
      val iters = 3
      // in-memory reference: identical integer recurrence
      var ref = Array.fill(n)(1000000L)
      val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      for (_ <- 1 to iters) {
        val sums = Array.fill(n)(0L)
        edges.foreach { case (s, d) => sums(d.toInt) += ref(s.toInt) / out(s) }
        ref = sums.map(s => 150000L + 850L * s / 1000L)
      }
      val got = operators.Graph.pageRank(
          (0L until n.toLong).toDF("v"), edges.toDF("src", "dst"), iters)
        .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      (0 until n).foreach { v =>
        assert(got(v) == ref(v), s"round=$round vertex=$v diverged")
      }
    }
  }

  test("pageRankConverged equals the unrolled form at its fixpoint (both modes)") {
    // a 3-level DAG reaches the EXACT integer fixpoint in ~depth+1
    // rounds (no cycles for mass to keep circulating through), so the
    // unrolled cross-check stays cheap to plan; cyclic graphs converge
    // too, just in ~ln(1e6)/ln(1000/850) rounds (see the scaladoc)
    val v = (0L until 30L).toDF("v")
    val e = ((0L until 10L).map(i => (i, 10L + i)) ++
      (10L until 20L).map(i => (i, 10L + i)))
      .toDF("src", "dst")
    for (reliable <- Seq(false, true)) {
      val (ranks, rounds) = Graph.pageRankConverged(v, e, maxIter = 100,
        reliable = reliable)
      assert(rounds >= 1 && rounds <= 100)
      val converged = ranks.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the unrolled recurrence, run the same number of rounds, must
      // land on the identical integer ranks — and one MORE unrolled
      // round must not move them (it really is a fixpoint)
      val unrolled = Graph.pageRank(v, e, iters = rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(converged == unrolled, s"reliable=$reliable: converged != unrolled")
      val onceMore = Graph.pageRank(v, e, iters = rounds + 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(onceMore == converged, s"reliable=$reliable: not a fixpoint")
      // reproducible round count
      assert(Graph.pageRankConverged(v, e, maxIter = 100, reliable = reliable)._2
        == rounds, s"reliable=$reliable: round count is not reproducible")
    }
  }

  test("pageRankConverged fails loudly when the budget is too small") {
    // star graph: ranks move for several rounds (a ring would converge
    // in one — the uniform start is already its fixpoint)
    val v = (0L to 9L).toDF("v")
    val e = ((1L to 9L).map(i => (i, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      Graph.pageRankConverged(v, e, maxIter = 1)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("rank mass stays bounded (floor division only leaks downward)") {
    val n = 100L
    val v = (0L until n).toDF("v")
    val e = (0L until n).flatMap(i => Seq((i, (i * 2 + 1) % n), (i, (i * 3 + 7) % n)))
      .toDF("src", "dst")
    val total = Graph.pageRank(v, e, iters = 3)
      .agg(org.apache.spark.sql.functions.sum("rank_e6")).collect()(0).getLong(0)
    assert(total <= n * 1000000L, "rank mass grew")
    assert(total >= n * 150000L, "rank mass fell below the teleport floor")
  }

  test("triangleCounts: K4 has 4 triangles, 3 per vertex") {
    val e = Seq((0L,1L),(0L,2L),(0L,3L),(1L,2L),(1L,3L),(2L,3L)).toDF("src","dst")
    val t = Graph.triangleCounts(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangleCounts: duplicate/reversed/self-loop edges do not inflate counts") {
    val e = Seq((0L,1L),(1L,0L),(1L,2L),(2L,0L),(0L,0L),(2L,1L),(3L,4L))
      .toDF("src","dst")
    val t = Graph.triangleCounts(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t === Map(0L -> 1L, 1L -> 1L, 2L -> 1L)) // one triangle, path edge ignored
  }

  test("triangleCounts: triangle-free graph returns an empty frame") {
    val e = Seq((0L,1L),(1L,2L),(2L,3L)).toDF("src","dst")
    assert(Graph.triangleCounts(e).count() === 0L)
  }

  test("bfsLevels: shortest hop counts, bounded depth, cycles safe") {
    // 0→1→2→3→0 cycle plus shortcut 0→2; depth 2 reaches {0,1,2,3}
    val e = Seq((0L,1L),(1L,2L),(2L,3L),(3L,0L),(0L,2L)).toDF("src","dst")
    val lv = Graph.bfsLevels(e, source = 0L, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lv === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
    // one round: only direct successors
    val lv1 = Graph.bfsLevels(e, 0L, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lv1 === Map(0L -> 0L, 1L -> 1L, 2L -> 1L))
  }
}
