package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** CCNet-style bigram-LM perplexity scoring: hand-checkable counts on
  * a tiny corpus, backoff arms, in-sample vs out-of-vocabulary
  * ordering, tertile-split structure, and partitioning independence
  * (exact integer scores cannot depend on layout). */
class PerplexityLmSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def nll(num: Long, den: Long): Long =
    math.floor(1e6 * math.log(num.toDouble / den.toDouble) + 0.5).toLong

  test("scoreBigramLm: exact micro-nat sums on a hand-computed corpus") {
    // reference = docs 0, 2: tokens "a b a b" and "a b" →
    // uni: a=3, b=3; T=6, V=2; bigrams: (a,b)=3, (b,a)=1
    val docs = Seq(
      (0L, "a b a b"), (1L, "a b c"), (2L, "a b"), (3L, "z z")
    ).toDF("doc_id", "text")
    val out = PerplexityLm.scoreBigramLm(docs, "doc_id", "text",
        pmod(col("doc_id"), lit(2)) === 0)
      .orderBy("doc_id").collect()
    // doc 0: first 'a' uni (cu=3): ln(8/4); a→b bi: ln((3+2)/(3+1));
    //        b→a bi: ln(5/2); a→b: ln(5/4)
    val d0 = nll(8, 4) + nll(5, 4) + nll(5, 2) + nll(5, 4)
    // doc 1: 'a' uni ln(8/4); a→b ln(5/4); b→c unseen pair ln(5/1)
    val d1 = nll(8, 4) + nll(5, 4) + nll(5, 1)
    // doc 3: 'z' uni OOV ln(8/1); z→z unseen CONTEXT → backoff uni ln(8/1)
    val d3 = nll(8, 1) + nll(8, 1)
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 4L, d0), (1L, 3L, d1), (2L, 2L, nll(8, 4) + nll(5, 4)),
        (3L, 2L, d3)))
  }

  test("in-reference text scores below out-of-vocabulary text") {
    val docs = Seq(
      (0L, "x y x y x y"), (2L, "x y x y"),
      (1L, "x y x y"), (3L, "q r s t u v")
    ).toDF("doc_id", "text")
    val byDoc = PerplexityLm.scoreBigramLm(docs, "doc_id", "text",
        pmod(col("doc_id"), lit(2)) === 0)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byDoc(1L) < byDoc(3L),
      s"in-domain doc must score below OOV soup, got $byDoc")
  }

  test("empty and whitespace-only documents are excluded") {
    val docs = Seq((0L, "a b"), (1L, ""), (2L, "  "), (3L, "a"))
      .toDF("doc_id", "text")
    val ids = PerplexityLm.scoreBigramLm(docs, "doc_id", "text",
        pmod(col("doc_id"), lit(2)) === 0)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(0L, 3L))
  }

  test("ccnetSplit: buckets partition the score space, ties to lower") {
    // 9 docs with forced distinct score ladder via token repetition
    val docs = (0L until 9L).map { i =>
      val rare = (0 to i.toInt).map(j => s"w${i}_$j").mkString(" ")
      (i, s"base line $rare")
    }.toDF("doc_id", "text")
    val out = PerplexityLm.ccnetSplit(
        PerplexityLm.scoreBigramLm(docs, "doc_id", "text",
          pmod(col("doc_id"), lit(2)) === 0))
      .select("spt", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val byBucket = out.groupBy(_._2).map { case (b, xs) =>
      b -> (xs.map(_._1).min, xs.map(_._1).max) }
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    assert(byBucket("head")._2 <= byBucket("middle")._1)
    assert(byBucket("middle")._2 <= byBucket("tail")._1)
    // every spt ≤ head's max is IN head (ties to the lower bucket)
    val t1 = byBucket("head")._2
    assert(out.filter(_._1 <= t1).forall(_._2 == "head"))
  }

  test("scores are partitioning-independent") {
    val docs = (0L until 40L)
      .map(i => (i, s"tok${i % 7} tok${(i * 3) % 5} tok${i % 11} end"))
      .toDF("doc_id", "text")
    val ref = pmod(col("doc_id"), lit(2)) === 0
    val a = PerplexityLm.scoreBigramLm(docs.repartition(1), "doc_id",
      "text", ref).orderBy("doc_id").collect().toSeq
    val b = PerplexityLm.scoreBigramLm(docs.repartition(13), "doc_id",
      "text", ref).orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
