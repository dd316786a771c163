package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Hybrid retrieval: BM25 micro-unit scores against hand-mirrored
  * float arithmetic, posting-list semantics, RRF fusion algebra. */
class HybridRetrievalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // the pinned quantization, mirrored exactly (shape matters: same
  // IEEE ops in the same order as the operator and the oracle)
  private def bm25Term(nn: Long, df: Long, tf: Long, dl: Long,
                       tl: Long): Long =
    math.floor(1e6 * math.log((nn + 1).toDouble / (df + 1).toDouble) *
      (tf * 2.2) /
      (tf + 1.2 * (0.25 + 0.75 * ((dl * nn).toDouble / tl))) + 0.5).toLong

  test("bm25Scores: exact micro-unit sums on a hand-checked corpus") {
    val docs = Seq((1L, "a b"), (2L, "a a b"), (3L, "c"))
      .toDF("doc_id", "text")
    val q = Seq((0L, "a"), (0L, "b"), (9L, "c"), (9L, "c"))
      .toDF("query_id", "term")
    val out = HybridRetrieval.bm25Scores(docs, "doc_id", "text", q)
      .orderBy("query_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // N=3, tl=6; df: a=2, b=2, c=1
    val q0d1 = bm25Term(3, 2, 1, 2, 6) + bm25Term(3, 2, 1, 2, 6)
    val q0d2 = bm25Term(3, 2, 2, 3, 6) + bm25Term(3, 2, 1, 3, 6)
    val q9d3 = 2 * bm25Term(3, 1, 1, 1, 6) // repeated slot counts twice
    assert(out.toSeq === Seq((0L, 1L, q0d1), (0L, 2L, q0d2),
      (9L, 3L, q9d3)))
  }

  test("bm25Scores: zero-match documents are absent, not zero-scored") {
    val docs = Seq((1L, "x y"), (2L, "z")).toDF("doc_id", "text")
    val q = Seq((0L, "x")).toDF("query_id", "term")
    val got = HybridRetrieval.bm25Scores(docs, "doc_id", "text", q)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L))
  }

  test("rrfFuse: doc in both lists outranks docs in one; ties by doc_id") {
    val l1 = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val l2 = Seq((0L, 11L, 1), (0L, 13L, 2), (0L, 14L, 3))
      .toDF("query_id", "doc_id", "rank")
    val out = HybridRetrieval.rrfFuse(Seq(l1, l2), k = 60, topK = 10)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    // 11 appears at ranks 2 and 1 → 1e6/62 + 1e6/61 (integer div)
    assert(out.head === ((1, 11L, 1000000L / 62 + 1000000L / 61)))
    // 10 and 13: same contribution pattern (rank 1 vs rank 2)?
    // 10 → 1e6/61, 13 → 1e6/62, 12 and 14 → 1e6/63: tie → doc_id asc
    val tied = out.filter(_._3 == 1000000L / 63).map(_._2)
    assert(tied.toSeq === Seq(12L, 14L))
  }

  test("rrfFuse caps each query at topK") {
    val l = (1 to 30).map(i => (0L, 100L + i, i))
      .toDF("query_id", "doc_id", "rank")
    assert(HybridRetrieval.rrfFuse(Seq(l), 60, 10).count() === 10L)
  }
}
