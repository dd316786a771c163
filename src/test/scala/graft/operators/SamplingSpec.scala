package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Training-data corpus shaping: hash-decided sampling (reproducible,
  * partitioning-independent) and bounded vocabulary stats. */
class SamplingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 1000L).map(i =>
    (i, if (i % 2 == 0) "en" else "fa", s"w${i % 7} w${i % 3} common"))
    .toDF("id", "lang", "text")

  test("stratified sample is deterministic and respects 0/1 rates exactly") {
    val pct = Sampling.uniformPct(col("id"))
    def run() = Sampling.stratifiedSample(docs, "lang",
      Map("en" -> 1.0, "fa" -> 0.0), defaultRate = 0.5, pct)
      .select("id").as[Long].collect().sorted.toSeq
    val a = run(); val b = run()
    assert(a === b) // hash-decided: identical across runs
    assert(a === (0L until 1000L by 2)) // en kept fully, fa dropped fully
    // repartitioning must not change the sample (no rand() dependence)
    val c = Sampling.stratifiedSample(docs.repartition(7), "lang",
      Map("en" -> 1.0, "fa" -> 0.0), defaultRate = 0.5, pct)
      .select("id").as[Long].collect().sorted.toSeq
    assert(c === a)
  }

  test("fractional rate lands near the target and subsets are stable") {
    val pct = Sampling.uniformPct(col("id"))
    val kept = Sampling.stratifiedSample(docs, "lang",
      Map("en" -> 0.3), defaultRate = 1.0, pct)
    val en = kept.filter(col("lang") === "en").count().toDouble
    assert(en > 500 * 0.2 && en < 500 * 0.4, s"en kept $en of 500 at rate 0.3")
    assert(kept.filter(col("lang") === "fa").count() === 500) // default 1.0
  }

  test("packByBudget equals the sequential cumulative definition, any partitioning") {
    val docs2 = (0L until 100L).map(i => (i, 10L + i % 7)).toDF("id", "w")
    def seqBins(rows: Seq[(Long, Long)], budget: Long): Map[Long, Long] = {
      var cum = 0L
      rows.sortBy(_._1).map { case (id, w) =>
        val b = cum / budget; cum += w; id -> b
      }.toMap
    }
    val expected = seqBins((0L until 100L).map(i => (i, 10L + i % 7)), 64L)
    for (parts <- Seq(1, 3, 13)) {
      val got = Sampling.packByBudget(docs2.repartition(parts), "id", "w", 64L)
        .select("id", "bin_id").as[(Long, Long)].collect().toMap
      assert(got === expected, s"parts=$parts")
    }
    // every non-final bin's total is within one max-weight document of
    // the budget on both sides (the greedy-packing contract)
    val sizes = Sampling.packByBudget(docs2, "id", "w", 64L)
      .groupBy("bin_id").agg(sum("w").as("tot"))
      .orderBy("bin_id").select("tot").as[Long].collect()
    assert(sizes.dropRight(1).forall(t => t > 64L - 17L && t < 64L + 17L))
  }

  test("topTermsByDocFreq bounds output per stratum with stable tie-break") {
    val top = Sampling.topTermsByDocFreq(docs, "lang", "text", k = 3)
    val rows = top.collect()
    assert(rows.length === 6) // 2 strata × k
    // 'common' appears in every doc → rank 1 in both strata
    assert(top.filter(col("rank") === 1).select("term")
      .as[String].collect().toSet === Set("common"))
  }

  test("dsirScores: target-word docs score higher, integers exact, partitioning-independent") {
    // two sub-languages over a shared vocab: target docs speak extra
    // 'alpha beta', background docs speak extra 'gamma delta'
    val corpus = (0L until 400L).map { i =>
      val t = i % 4 == 0
      val extra = if (t) "alpha beta alpha" else "gamma delta gamma"
      (i, s"common w${i % 5} $extra common")
    }.toDF("id", "text")
    val isTarget = col("text").contains("alpha")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.dsirScores(df, "id", "text", isTarget, buckets = 32)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2))).toMap
    val scores = run(corpus)
    assert(scores.size === 400)
    // every target doc must outscore every background doc (disjoint
    // marker words dominate the shared vocab's neutral buckets)
    val tMin = (0L until 400L by 4).map(scores(_)._2).min
    val bMax = (0L until 400L).filterNot(_ % 4 == 0).map(scores(_)._2).max
    assert(tMin > bMax, s"target min $tMin must exceed background max $bMax")
    // target docs land positive, background negative (proper subset)
    assert((0L until 400L by 4).forall(scores(_)._2 > 0))
    assert((1L until 400L by 4).forall(scores(_)._2 < 0))
    // integer scores are exactly reproducible under any partitioning
    assert(run(corpus.repartition(13)) === scores)
  }

  test("dsirScores: buckets > 256 actually populate the high buckets") {
    // pre-fix, the 2-hex-char hash (256 values) left every bucket
    // ≥ 256 permanently empty for buckets > 256 — the wide-bucket
    // request must use a wider hash, not silently degrade
    val corpus = (0L until 500L)
      .map(i => (i, s"word$i tok${i * 7} common"))
      .toDF("id", "text")
    val scored = Sampling.dsirScores(corpus, "id", "text",
      col("id") % 3 === 0, buckets = 1024)
    assert(scored.count() === 500L)
    // re-derive the bucket ids the operator hashes into: with ~1000
    // distinct words over 1024 buckets, a healthy hash must land well
    // beyond the first 256
    import org.apache.spark.sql.functions.{explode, split, md5, conv, substring, pmod, lit}
    val high = corpus
      .select(explode(split(col("text"), " ")).as("w"))
      .select(pmod(conv(substring(md5(col("w")), 1, 4), 16, 10)
        .cast("long"), lit(1024)).as("b"))
      .filter(col("b") >= 256).distinct().count()
    assert(high > 100L, s"high buckets populated: $high")
    // scoring stays exact under repartitioning at the wide setting
    val a = scored.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = Sampling.dsirScores(corpus.repartition(7), "id", "text",
      col("id") % 3 === 0, buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a === b)
  }

  test("temperatureMixture: sqrt quotas, caps at source size, deterministic") {
    // sizes 100/9/1 → ⌊√n⌋ weights 10/3/1 (sum 14); epochDocs=14 gives
    // quotas exactly 10/3/1 — 'c' is fully taken (cap), 'a' downweighted
    // vs proportional
    val df = ((0L until 100L).map(i => (i, "a")) ++
      (100L until 109L).map(i => (i, "b")) ++ Seq((200L, "c")))
      .toDF("doc_id", "source")
    val out = Sampling.temperatureMixture(df, epochDocs = 14L)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc === Map("a" -> 10L, "b" -> 3L, "c" -> 1L))
    // deterministic under any partitioning
    val again = Sampling.temperatureMixture(df.repartition(7), epochDocs = 14L)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("temperatureMixture resolves hash-collision ties by key") {
    // keys k and k + 1000003 share the same portable hash rank; with a
    // quota that splits the tie bucket, the LOWEST keys must win
    val p = 1000003L
    val df = Seq(5L, 5L + p, 5L + 2 * p, 5L + 3 * p).map((_, "s"))
      .toDF("doc_id", "source")
    // n=4 → w=2, epochDocs=2 → take = 2*2/2 = 2 of the 4 tied rows
    val kept = Sampling.temperatureMixture(df, epochDocs = 2L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(5L, 5L + p))
  }
}
