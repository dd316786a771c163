package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Every round-5 operator must survive an EMPTY input frame — the
  * state a real pipeline hits on the first watermark window, an
  * all-filtered partition, or a new source with no documents yet.
  * "Survive" = return an empty (or seed-only) result, never throw.
  */
class EmptyInputSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def noDocs = Seq.empty[(Long, String, String)]
    .toDF("doc_id", "text", "source")
  private def noVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")

  test("corpus-shaping operators on an empty corpus") {
    assert(CorpusShape.tfidfTopTerms(noDocs, "doc_id", "text", 3).count() == 0)
    assert(CorpusShape.shuffleShards(noDocs.select("doc_id"), "doc_id", 1L, 8L)
      .count() == 0)
    val tokens = size(split(col("text"), " ")).cast("long")
    assert(CorpusShape.mixtureSample(noDocs, "source", "doc_id",
      tokens, lit(100L)).count() == 0)
    assert(CorpusShape.groupQuantiles(noDocs, "source", "doc_id",
      Seq(("p50", 1, 2))).count() == 0)
    assert(CorpusText.slidingDupSpans(noDocs, 12, 2).count() == 0)
    assert(CorpusText.hashQualityScore(noDocs).count() == 0)
  }

  test("graph and range operators on empty inputs") {
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val verts = (0L to 3L).toDF("v")
    // empty edge set: everyone sits at the teleport floor
    val r = Graph.pageRank(verts, noEdges, iters = 2)
    assert(r.count() == 4 &&
      r.agg(max("rank_e6")).collect()(0).getLong(0) == 150000L)
    assert(Graph.pageRank(noEdges.select(col("src").as("v")).limit(0),
      noEdges, iters = 1).count() == 0)
    val noPoints = Seq.empty[Long].toDF("pv")
    val iv = Seq((1L, 0L, 10L)).toDF("iid", "lo", "hi")
    assert(RangeJoin.bucketed(noPoints, "pv", iv, "lo", "hi", 8L).count() == 0)
    assert(RangeJoin.bucketed(Seq(5L).toDF("pv"), "pv",
      iv.limit(0), "lo", "hi", 8L).count() == 0)
  }

  test("vector operators on an empty corpus") {
    assert(SemDedup.dedup(noVecs, "vec_id", "embedding", 4, 300000L).count() == 0)
    val (cent, rounds) = Ann.lloydConverged(noVecs, "vec_id", "embedding", 4)
    assert(cent.count() == 0 && rounds == 0)
    assert(VectorCompress.int8Audit(noVecs, "vec_id", "embedding", 4).count() == 0)
  }

  test("round-6 operators on empty inputs") {
    // BPE: no words -> empty merge table; segmenting nothing is nothing
    val noWords = Seq.empty[(String, Long)].toDF("w", "freq")
    assert(Bpe.trainMerges(noWords, "w", "freq", budget = 3).count() == 0)
    assert(Bpe.segment(noWords.select("w"), "w",
      Seq(("a", "b"))).count() == 0)
    assert(Bpe.segmentWithVocab(noWords.select("w"), "w",
      Seq(("a", "b"))).count() == 0)
    // converged PageRank: empty vertex set -> empty ranks, 1 fixpoint round
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val (pr, _) = Graph.pageRankConverged(
      noEdges.select(col("src").as("v")).limit(0), noEdges, maxIter = 3)
    assert(pr.count() == 0)
    // globalQuantiles: handled one-row empty contract (CorpusShapeSpec
    // pins n = 0 + null quantiles); forward as-of on empty left
    val noLeft = Seq.empty[(String, Long)].toDF("k", "t")
    val right = Seq(("k1", 5L, "R")).toDF("k", "rt", "state")
    assert(TemporalJoin.asOfJoin(noLeft, right, Seq("k"), "t", "rt",
      direction = "forward").count() == 0)
  }

  test("round-7 operators on empty inputs") {
    // gap fill: no observations -> no grid at all
    val noObs = Seq.empty[(Long, Long, Long)].toDF("k", "t", "v")
    assert(Resample.gapFill(noObs, "k", "t", Seq("v")).count() == 0)
    // approx profile: empty corpus -> one row, n = 0, zero distinct,
    // null percentiles (the same one-row contract as globalQuantiles)
    val noTerms = Seq.empty[(Seq[String], Long)].toDF("terms", "n_tokens")
    val row = CorpusShape.approxProfile(noTerms, "terms", "n_tokens",
      Seq(("p50_a", 0.5))).collect()(0)
    assert(row.getAs[Long]("n") == 0L)
    assert(row.getAs[Long]("d_approx") == 0L)
    assert(row.isNullAt(row.fieldIndex("p50_a")))
  }

  test("late round-7 operators (CDC, intervals, fuzzy match, triangles) on empty inputs") {
    val noCh = Seq.empty[(Long, Long, String, String)].toDF("k", "seq", "op", "p")
    assert(Cdc.scd2(noCh, Seq("k"), Seq("seq")).count() == 0)
    assert(Cdc.compactChangelog(noCh, Seq("k"), Seq("seq"), "op").count() == 0)
    val some = Seq((1L, 1L, "U", "x")).toDF("k", "seq", "op", "p")
    // empty before -> everything added; empty after -> everything removed
    val added = Cdc.snapshotDiff(noCh.drop("op"), some.drop("op"), Seq("k"), Seq("p"))
    assert(added.collect().map(_.getAs[String]("change_type")).toSeq === Seq("added"))
    val removed = Cdc.snapshotDiff(some.drop("op"), noCh.drop("op"), Seq("k"), Seq("p"))
    assert(removed.collect().map(_.getAs[String]("change_type")).toSeq === Seq("removed"))

    val noIv = Seq.empty[(Long, Long, Long, Long)].toDF("k", "id", "s", "e")
    assert(Intervals.islands(noIv, Seq("k"), "s", "e", Seq("id")).count() == 0)
    assert(Intervals.coverage(noIv, Seq("k"), "s", "e", Seq("id")).count() == 0)

    assert(FuzzyMatch.editDistancePairs(
      Seq.empty[String].toDF("w"), "w", 2).count() == 0)
    assert(Graph.triangleCounts(
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)
    // BFS with no edges: the source alone at level 0
    val bfs = Graph.bfsLevels(Seq.empty[(Long, Long)].toDF("src", "dst"),
      source = 7L, rounds = 2).collect()
    assert(bfs.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((7L, 0L)))
  }

  test("round-9 operators (dedup decisions, TopK, native as-of) on empty inputs") {
    assert(FuzzyMatch.editDistanceDedup(
      Seq.empty[String].toDF("w"), "w", 2).count() == 0)
    assert(GridJoin.neighborDedup(
      Seq.empty[(Long, Long, Long)].toDF("id", "x", "y"),
      "id", "x", "y", r = 10L).count() == 0)
    // TopK over an empty frame: no groups, no rows
    val fn = graft.functions.TopK.register(spark, 3)
    Seq.empty[(Long, Long, Long)].toDF("g", "v", "cnt")
      .createOrReplaceTempView("empty_topk_in")
    assert(spark.sql(s"SELECT g, $fn(v, cnt) FROM empty_topk_in GROUP BY g")
      .count() == 0)
    // native as-of with both sides empty
    val noL = Seq.empty[(Long, Long, Long)].toDF("k", "t", "lv")
    val noR = Seq.empty[(Long, Long, Long)].toDF("k", "rt", "rv")
    assert(TemporalJoin.asOfJoinNative(noL, noR, Seq("k"), "t", "rt")
      .count() == 0)
  }

  test("round-12 text/sampling operators on empty inputs") {
    assert(CorpusText.repetitionProfile(noDocs).count() == 0)
    assert(Sampling.temperatureMixture(noDocs, epochDocs = 10L)
      .count() == 0) // no sources → empty epoch, never a 0-division
  }

  test("round-15 operators on empty inputs") {
    import graft.queries.TextDedup
    assert(TextDedup.exactSubstrSpans(noDocs, 5).count() == 0)
    assert(TextDedup.exactSubstrDedupApply(noDocs, 5).count() == 0)
    assert(CorpusText.removeBoilerplateLines(noDocs, 300000L).count() == 0)
    // degenerate-but-nonempty: every doc shorter than k, single doc
    val tiny = Seq((1L, "a b", "s"), (2L, "", "s"))
      .toDF("doc_id", "text", "source")
    assert(TextDedup.exactSubstrSpans(tiny, 5).count() == 0)
    val applied = TextDedup.exactSubstrDedupApply(tiny, 5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(applied === Seq((1L, 2L, 0L, "a b"), (2L, 1L, 0L, "")),
      "sub-k docs pass through untouched")
  }

  test("perplexity LM and hybrid retrieval on empty/degenerate inputs") {
    // empty corpus → empty scores, never a throw
    assert(PerplexityLm.scoreBigramLm(noDocs, "doc_id", "text",
      lit(true)).count() == 0)
    assert(PerplexityLm.ccnetSplit(
      PerplexityLm.scoreBigramLm(noDocs, "doc_id", "text", lit(true)))
      .count() == 0)
    // non-empty corpus with an EMPTY reference slice: loud, named
    val docs = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      PerplexityLm.scoreBigramLm(docs, "doc_id", "text", lit(false))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("reference slice is empty")),
      s"expected the empty-reference refusal, got: ${msgs(e).take(3)}")
    // retrieval: empty corpus and empty query sets stay empty
    val noQ = Seq.empty[(Long, String)].toDF("query_id", "term")
    assert(HybridRetrieval.bm25Scores(noDocs, "doc_id", "text",
      noQ).count() == 0)
    assert(HybridRetrieval.bm25Scores(docs, "doc_id", "text",
      noQ).count() == 0)
    val q = Seq((0L, "a")).toDF("query_id", "term")
    assert(HybridRetrieval.bm25Scores(noDocs, "doc_id", "text",
      q).count() == 0)
    val noList = Seq.empty[(Long, Long, Int)].toDF("query_id", "doc_id", "rank")
    assert(HybridRetrieval.rrfFuse(Seq(noList, noList), 60, 10).count() == 0)
  }
}
