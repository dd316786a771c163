package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the k-means loop and the SemDeDup decision that the
  * oracle's hash match doesn't state directly.
  */
class SemDedupSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, dir)

  test("lloyd: every vector is assigned — cluster sizes sum to the corpus") {
    val cent = operators.Ann.lloyd(emb, "vec_id", "embedding", k = 8, iters = 2)
    val rows = cent.collect()
    assert(rows.length <= 8)
    assert(rows.map(_.getAs[Long]("n")).sum == emb.count())
    assert(rows.forall(_.getAs[Seq[Long]]("cvec").length == 64))
  }

  test("lloyd iters=1 equals buildCentroids (the v37 index contract)") {
    val one = operators.Ann.lloyd(emb, "vec_id", "embedding", k = 8, iters = 1)
      .select("centroid_id", "cvec").collect().map(_.toString).sorted
    val legacy = operators.Ann.buildCentroids(emb, "vec_id", "embedding", k = 8)
      .collect().map(_.toString).sorted
    assert(one.toSeq == legacy.toSeq)
  }

  test("semdedup: one verdict per vector; a drop implies a kept lower id in-cluster") {
    val verdicts = operators.SemDedup.dedup(emb, "vec_id", "embedding",
      k = 8, cosE6 = 300000L)
    assert(verdicts.count() == emb.count())
    assert(verdicts.select("vec_id").distinct().count() == emb.count())
    // every dropped vector coexists with at least one kept lower id in
    // its cluster (the representative it duplicates, transitively)
    val bad = verdicts.as("d").filter(!col("d.kept"))
      .join(verdicts.as("k"),
        col("k.centroid_id") === col("d.centroid_id") &&
          col("k.kept") && col("k.vec_id") < col("d.vec_id"),
        "left_anti")
    assert(bad.count() == 0, "a dropped vector has no kept lower-id cluster-mate")
  }

  test("semdedup: oversized monoculture cell auto-splits with identical keep/drop") {
    // monoculture: 40 near-identical vectors -> k=1 puts them all in
    // one cell — the shape that defeats any vector-space secondary
    // quantizer (it never separates) and used to stop loudly. maxCell
    // = 10 forces the id-block pair decomposition (block size 5, 8
    // blocks); maxCell = 40 runs the in-memory fast path. The pairwise
    // verdict predicate makes the decomposition exact, so keep/drop
    // must be IDENTICAL at both settings.
    import spark.implicits._
    val mono = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d => 1.0f + (if (d == (i % 8).toInt) 1e-4f * i else 0f)))
    }.toDF("vec_id", "embedding")
    def verdicts(maxCell: Int): Seq[(Long, Boolean)] =
      operators.SemDedup.dedup(mono, "vec_id", "embedding",
          k = 1, cosE6 = 300000L, maxCell = maxCell)
        .select("vec_id", "kept").as[(Long, Boolean)]
        .collect().sortBy(_._1).toSeq
    val split = verdicts(10)
    val whole = verdicts(40)
    assert(split === whole, "split path changed keep/drop verdicts")
    assert(split.count(_._2) == 1 && split.find(_._2).map(_._1) === Some(0L),
      "monoculture must keep exactly vec_id 0")
    assert(split.size == 40)
  }

  test("semdedup: split path is exact on a mixed (non-monoculture) oversized cell") {
    // one cell with two distinct near-dup families + an outlier, forced
    // through the block path: verdicts must equal the fast path's
    import spark.implicits._
    val rows = (0L until 30L).map { i =>
      val fam = (i % 3).toInt // families 0,1 near-dup; 2 = spread-out
      val base = Array.tabulate(8)(d =>
        if (d == fam) 1.0f else if (fam == 2 && d == (i % 8).toInt) 3.0f + i else 0.05f)
      (i, base)
    }.toDF("vec_id", "embedding")
    def run(maxCell: Int) =
      operators.SemDedup.dedup(rows, "vec_id", "embedding",
          k = 1, cosE6 = 900000L, maxCell = maxCell)
        .select("vec_id", "kept").as[(Long, Boolean)]
        .collect().sortBy(_._1).toSeq
    assert(run(8) === run(64), "block decomposition diverged from fast path")
  }

  test("semdedup: integer ids cast cleanly; non-integral ids fail with a clear error") {
    import spark.implicits._
    val intIds = (0 until 20).map(i =>
      (i, Array.tabulate(8)(d => if (d == i % 8) 1.0f else 0.1f)))
      .toDF("vec_id", "embedding")
    val verdicts = operators.SemDedup.dedup(intIds, "vec_id", "embedding",
      k = 2, cosE6 = 990000L)
    assert(verdicts.count() == 20)
    val strIds = (0 until 4).map(i =>
      (s"id$i", Array.fill(8)(1.0f))).toDF("vec_id", "embedding")
    val err = intercept[IllegalArgumentException] {
      operators.SemDedup.dedup(strIds, "vec_id", "embedding", k = 1, cosE6 = 1L)
    }
    assert(err.getMessage.contains("integral id column"))
  }

  test("lloydConverged reaches an assignment fixed point (both durability modes)") {
    for (reliable <- Seq(false, true)) {
      val (cent, rounds) = operators.Ann.lloydConverged(
        emb, "vec_id", "embedding", k = 8, maxIter = 30, reliable = reliable)
      assert(rounds >= 1 && rounds <= 30)
      val rows = cent.collect()
      assert(rows.map(_.getAs[Long]("n")).sum == emb.count())
      // fixed point: one more mean step from the converged assignment
      // reproduces the same centroids (n and cvec)
      val again = operators.Ann.lloydConverged(
        emb, "vec_id", "embedding", k = 8, maxIter = 30, reliable = reliable)
      assert(again._2 == rounds, "round count is not reproducible")
      assert(rows.map(_.toString).sorted.toSeq ==
        again._1.collect().map(_.toString).sorted.toSeq)
    }
  }

  test("semdedup monoculture: identical vectors keep exactly the lowest id") {
    // the shape the per-cell early-exit pass exists for: every member's
    // first lower-id probe clears the threshold, verdicts stay exact
    import spark.implicits._
    val mono = (0L until 200L).map(i => (i, Array.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    val verdicts = operators.SemDedup.dedup(mono, "vec_id", "embedding",
      k = 4, cosE6 = 999000L)
    assert(verdicts.filter(col("kept")).select("vec_id")
      .collect().map(_.getLong(0)).toSeq == Seq(0L),
      "monoculture must keep exactly vec_id 0")
    assert(verdicts.count() == 200)
  }

  test("semdedup threshold 1e6+1 keeps everything") {
    val verdicts = operators.SemDedup.dedup(emb, "vec_id", "embedding",
      k = 8, cosE6 = 1000001L)
    assert(verdicts.filter(!col("kept")).count() == 0)
  }

  test("evalDecontaminate: self-hits at cos 1.0, orthogonal stays clean") {
    import spark.implicits._
    // e0/e1 orthogonal; c2 = e0 scaled (cos 1.0); c3 halfway (cos ~0.707)
    val corpus = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(2f, 0f, 0f, 0f)),
      (3L, Array(1f, 1f, 0f, 0f)),
      (4L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val eval = Seq(Tuple1(Array(1f, 0f, 0f, 0f))).toDF("embedding")
    val out = operators.SemDedup.evalDecontaminate(
      corpus, "vec_id", "embedding", eval, "embedding", tauE6 = 900000L)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("max_cos_e6"), r.getAs[Boolean]("contaminated")))
      .toMap
    assert(out(0L) === ((1000000L, true)))
    assert(out(2L) === ((1000000L, true)), "scaling must not change cosine")
    assert(out(1L)._1 === 0L && !out(1L)._2)
    assert(out(4L)._1 === 0L && !out(4L)._2)
    assert(out(3L)._1 === 707107L && !out(3L)._2, "sqrt(2)/2 quantized")
    // the eval side broadcasts: no shuffle on the corpus lineage
    val plan = operators.SemDedup.evalDecontaminate(
      corpus, "vec_id", "embedding", eval, "embedding", 900000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }
}
