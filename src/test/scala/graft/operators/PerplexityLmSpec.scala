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

  test("scoreKnTrigramLm: exact micro-nats on hand-computed KN counts") {
    // reference = docs 0, 2: "a b a b c" and "a b a" →
    // trigram types: (a,b,a)×2, (b,a,b)×1, (a,b,c)×1
    // ctx2: (a,b) c2=3 n1puv=2; (b,a) c2=1 n1puv=1
    // continuation cc2: (b,a)=1, (a,b)=1, (b,c)=1
    // ctx1: b cc1=2 n1pv=2; a cc1=1 n1pv=1
    // pc: a=1, b=1, c=1; V=3, TB=3
    val docs = Seq(
      (0L, "a b a b c"), (1L, "a b c"), (2L, "a b a"), (3L, "z")
    ).toDF("doc_id", "text")
    val out = PerplexityLm.scoreKnTrigramLm(docs, "doc_id", "text",
        pmod(col("doc_id"), lit(2)) === 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the operator's pinned float shape, replayed on the hand counts
    def knQ(p: Double): Long = math.floor(-1e6 * math.log(p) + 0.5).toLong
    def pcD(pc: Long): Double = (pc + 1L).toDouble / (3L + 3L + 1L).toDouble
    def pbD(cc2: Long, n1pv: Long, cc1: Long, pc: Long): Double =
      (math.max(cc2.toDouble - 0.75, 0.0) +
        0.75 * n1pv.toDouble * pcD(pc)) / cc1.toDouble
    def ptD(c3: Long, n1puv: Long, c2: Long, pb: Double): Double =
      (math.max(c3.toDouble - 0.75, 0.0) +
        0.75 * n1puv.toDouble * pb) / c2.toDouble
    // doc 1 "a b c": 'a' → continuation unigram; 'b' after 'a' →
    // KN bigram (cc2(a,b)=1, v=a: n1pv=1, cc1=1); 'c' with ctx (a,b)
    // → full trigram arm (c3(a,b,c)=1, n1puv(a,b)=2, c2=3, nesting
    // pb(c|b): cc2(b,c)=1, n1pv(b)=2, cc1(b)=2, pc(c)=1)
    val d1 = knQ(pcD(1)) + knQ(pbD(1, 1, 1, 1)) +
      knQ(ptD(1, 2, 3, pbD(1, 2, 2, 1)))
    assert(out(1L) === ((3L, d1)))
    // doc 3 "z": OOV single token → floored continuation unigram
    assert(out(3L) === ((1L, knQ(pcD(0)))))
    // doc 2 "a b a": arms C, B, T with seen counts
    val d2 = knQ(pcD(1)) + knQ(pbD(1, 1, 1, 1)) +
      knQ(ptD(2, 2, 3, pbD(1, 2, 2, 1)))
    assert(out(2L) === ((3L, d2)))
    // KN orders the evidence: the twice-seen trigram (a,b,a) must be
    // cheaper than the once-seen (a,b,c) in the same context
    assert(knQ(ptD(2, 2, 3, pbD(1, 2, 2, 1)))
      < knQ(ptD(1, 2, 3, pbD(1, 2, 2, 1))))
  }

  test("scoreKnTrigramLm: an empty reference slice fails loudly") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      PerplexityLm.scoreKnTrigramLm(docs, "doc_id", "text", lit(false))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("reference slice is empty")))
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
