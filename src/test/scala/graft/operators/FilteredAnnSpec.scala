package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** Predicate-constrained (filtered) ANN: the strategy chooser's
  * decision boundary, both physical branches against the exact filtered
  * truth, and the degenerate predicates. */
class FilteredAnnSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, dir)
  private lazy val queries = emb.filter(col("vec_id") < 20)

  test("chooser: selective predicates go exact, broad ones widen the probe") {
    assert(Ann.chooseFilteredStrategy(1000, 100) === Ann.ExactSubset(100))
    assert(Ann.chooseFilteredStrategy(1000, 200) === Ann.ExactSubset(200)) // boundary inclusive
    assert(Ann.chooseFilteredStrategy(1000, 201) === Ann.WidenedIvf(8)) // ceil(9.95) capped
    // widening: ceil(nProbe0 / sel), capped at kCells
    assert(Ann.chooseFilteredStrategy(1000, 900) === Ann.WidenedIvf(3))
    assert(Ann.chooseFilteredStrategy(1000, 1000) === Ann.WidenedIvf(2))
    assert(Ann.chooseFilteredStrategy(1000, 250) === Ann.WidenedIvf(8)) // exactly 8, uncapped
    intercept[IllegalArgumentException](Ann.chooseFilteredStrategy(0, 0))
  }

  test("selective branch equals the definitionally-exact filtered top-k") {
    val allowed = emb.filter(col("label") === 3).select("vec_id")
    val got = Ann.filteredSearch(emb, queries, "vec_id", "embedding", allowed)
      .orderBy("query_id", "rank").collect().toSeq
    val want = Ann.filteredBruteForce(emb, queries, "vec_id", "embedding", allowed)
      .orderBy("query_id", "rank").collect().toSeq
    assert(got === want)
    // every returned neighbor satisfies the predicate
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.forall(r => labels(r.getAs[Long]("neighbor_id")) == 3))
    assert(got.map(_.getAs[Long]("query_id")).distinct.length === 20)
  }

  test("broad branch: post-filtered candidates all satisfy the predicate; recall holds") {
    val allowed = emb.filter(col("label") =!= 3).select("vec_id")
    val ivf = Ann.filteredSearch(emb, queries, "vec_id", "embedding", allowed)
      .collect()
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ivf.forall(r => labels(r.getAs[Long]("neighbor_id")) != 3))
    // recall vs the exact filtered truth — widened probes (2 -> 3 of 8
    // cells) must keep filtered recall at least at the unfiltered
    // 3-probe level asserted in AnnSpec
    val truth = Ann.filteredBruteForce(emb, queries, "vec_id", "embedding", allowed)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = ivf.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (got intersect truth).size.toDouble / truth.size
    assert(recall >= 0.3, s"filtered IVF recall too low: $recall")
  }

  test("all-pass predicate reduces to the unfiltered search") {
    val everything = emb.select("vec_id")
    val centroids = Ann.buildCentroids(emb, "vec_id", "embedding", k = 8)
    val index = Ann.buildIndex(emb, "vec_id", "embedding", centroids)
    // sel = 1.0 -> WidenedIvf(2): identical to the plain 2-probe search
    val got = Ann.filteredSearch(emb, queries, "vec_id", "embedding", everything)
      .orderBy("query_id", "rank").collect().toSeq
    val plain = Ann.ivfSearch(index, centroids, queries, "vec_id", "embedding",
        nProbe = 2, topK = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(got === plain)
  }

  test("hard negatives: every mined neighbor's label differs from its anchor's") {
    val got = Ann.hardNegatives(emb, queries, "vec_id", "embedding", "label")
      .collect()
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.nonEmpty)
    assert(got.forall(r =>
      labels(r.getAs[Long]("neighbor_id")) != labels(r.getAs[Long]("query_id"))))
    assert(got.map(_.getAs[Long]("query_id")).distinct.length === 20)
  }

  test("hard negatives for single-label anchors equal the filtered-IVF path") {
    // when every anchor shares one label, the per-anchor predicate
    // degenerates to a global allowed set — the two independent code
    // paths (label-on-postings filter vs pre-filtered index) must agree
    val anchors = emb.filter(col("vec_id") < 50 && col("label") === 3)
    assert(anchors.count() > 0)
    val got = Ann.hardNegatives(emb, anchors, "vec_id", "embedding", "label",
        kCells = 8, nProbe = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val centroids = Ann.buildCentroids(emb, "vec_id", "embedding", k = 8)
    val index = Ann.buildIndex(emb, "vec_id", "embedding", centroids)
    val want = Ann.filteredIvfSearch(index, centroids, anchors,
        "vec_id", "embedding",
        allowed = emb.filter(col("label") =!= 3).select("vec_id"), nProbe = 3)
      .orderBy("query_id", "rank").collect().toSeq
    assert(got === want)
  }

  test("empty predicate yields an empty result, not a crash") {
    val none = emb.filter(col("label") === 999).select("vec_id")
    assert(Ann.filteredSearch(emb, queries, "vec_id", "embedding", none).count() === 0)
  }
}
