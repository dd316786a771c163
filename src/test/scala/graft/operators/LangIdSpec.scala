package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Hashed char-n-gram language identification: feature shape, the
  * one-pass aggregation contract, and end-to-end separation of two
  * disjoint scripts with the GD trainer. */
class LangIdSpec extends AnyFunSuite with SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("charNgramFeatures: fractions per bucket, one row per doc") {
    val docs = Seq((1L, "abcab"), (2L, "zzzz")).toDF("id", "t")
    val f = LangId.charNgramFeatures(docs, "id", "t", n = 3, buckets = 8)
    val rows = f.collect()
    assert(rows.length === 2)
    assert(f.columns.toSeq === "id" +: LangId.featureCols(8))
    // doc 1 has 3 trigrams (abc, bca, cab), doc 2 has 2 (zzz, zzz) —
    // fractions sum to 1 and sit on multiples of 1/n_grams
    rows.foreach { r =>
      val fracs = (1 to 8).map(i => r.getDouble(i))
      assert(math.abs(fracs.sum - 1.0) < 1e-12, s"fractions must sum to 1: $fracs")
      assert(fracs.forall(v => v >= 0.0 && v <= 1.0))
    }
    // zzzz: both trigrams identical → exactly one bucket carries 1.0
    val z = rows.find(_.getLong(0) == 2L).get
    assert((1 to 8).map(z.getDouble).count(_ == 1.0) === 1)
  }

  test("docs shorter than n produce no gram rows (dropped, not crashed)") {
    val docs = Seq((1L, "ab"), (2L, "abcd")).toDF("id", "t")
    val f = LangId.charNgramFeatures(docs, "id", "t", n = 3, buckets = 4)
    assert(f.select("id").collect().map(_.getLong(0)).toSet === Set(2L))
  }

  test("trainAndScore separates two disjoint scripts completely") {
    val latin = "abcdefghijklmnopqrstuvwxyz"
    val persian = "ابتثجحخدذرزسشصضطظعغفقكلمنه"
    val words = Seq("table", "scan", "filter", "window", "group", "merge")
    val docs = (0L until 160L).map { i =>
      val txt = (0 until 12).map(j => words(((i + j) % 6).toInt)).mkString(" ")
      (i, if (i % 2 == 1) txt.map(c =>
        if (c == ' ') ' ' else persian(latin.indexOf(c))) else txt,
        i % 2 == 1)
    }.toDF("id", "t", "y")
    val feats = LangId.charNgramFeatures(docs, "id", "t", 3, 64)
      .join(docs.select("id", "y"), "id")
    val scored = LangId.trainAndScore(
      feats.filter(col("id") % 4 < 2), feats, 64, "y",
      iters = 40, rate = 2.0)
    val held = scored.filter(col("id") % 4 >= 2)
      .select(col("id"), col("y"), col("decision")).collect()
    assert(held.nonEmpty)
    assert(held.forall(r =>
        (r.getAs[Double]("decision") > 0) == r.getAs[Boolean]("y")),
      "disjoint scripts must separate completely")
    // scoring is literal-weight arithmetic, never a UDF
    val m = QualityScorer.train(feats.filter(col("id") % 4 < 2),
      LangId.featureCols(64), "y", 5, 2.0)
    val plan = feats.select(m.decision).queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
  }

  test("bucket bounds are enforced") {
    val docs = Seq((1L, "abc")).toDF("id", "t")
    intercept[IllegalArgumentException] {
      LangId.charNgramFeatures(docs, "id", "t", n = 3, buckets = 1)
    }
    intercept[IllegalArgumentException] {
      LangId.charNgramFeatures(docs, "id", "t", n = 0, buckets = 8)
    }
  }
}
