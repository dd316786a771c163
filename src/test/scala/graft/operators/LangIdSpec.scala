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

  test("docs shorter than n are KEPT with all-zero features (the " +
      "sentinel row — scoring pipelines must not lose documents)") {
    val docs = Seq((1L, "ab"), (2L, "abcd")).toDF("id", "t")
    val f = LangId.charNgramFeatures(docs, "id", "t", n = 3, buckets = 4)
    val rows = f.collect().map(r => r.getLong(0) ->
      (1 to 4).map(r.getDouble)).toMap
    assert(rows.keySet === Set(1L, 2L), "sub-n docs must stay in the output")
    assert(rows(1L).forall(_ == 0.0), s"sub-n features must be zero: ${rows(1L)}")
    assert(math.abs(rows(2L).sum - 1.0) < 1e-12,
      "≥ n docs keep the exact fraction contract")
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

  test("trainAndScoreMulticlass: one-vs-rest argmax over 3 scripts, " +
      "deterministic tie-break, no UDF") {
    val latin = "abcdefghijklmnopqrstuvwxyz"
    val persian = "ابتثجحخدذرزسشصضطظعغفقكلمنه"
    val words = Seq("table", "scan", "filter", "window", "group", "merge")
    // third script: digit transliteration — trigram-disjoint from both
    val digits = "0123456789876543210123456"
    val docs = (0L until 180L).map { i =>
      val txt = (0 until 12).map(j => words(((i + j) % 6).toInt)).mkString(" ")
      val lang = (i % 3) match {
        case 0 => "en"
        case 1 => "fa"
        case _ => "dg"
      }
      val t = lang match {
        case "en" => txt
        case "fa" => txt.map(c => if (c == ' ') ' ' else persian(latin.indexOf(c)))
        case _    => txt.map(c => if (c == ' ') ' ' else digits(latin.indexOf(c)))
      }
      (i, t, lang)
    }.toDF("id", "t", "lang")
    val feats = LangId.charNgramFeatures(docs, "id", "t", 3, 64)
      .join(docs.select("id", "lang"), "id")
    val scored = LangId.trainAndScoreMulticlass(
      feats.filter(col("id") % 4 < 2), feats, 64, "lang",
      iters = 40, rate = 2.0)
    val held = scored.filter(col("id") % 4 >= 2)
      .select(col("id"), col("lang"), col("language")).collect()
    assert(held.nonEmpty)
    val wrong = held.filter(r => r.getString(1) != r.getString(2))
    assert(wrong.isEmpty,
      s"${wrong.length}/${held.length} held-out docs misclassified: " +
        wrong.take(3).mkString(", "))
    // argmax + decisions stay expression-only (no UDF in the plan)
    val plan = scored.select("language", "decision")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
    // deterministic tie-break: identical decisions pick the
    // lexicographically-first label (−labelRank inside the struct)
    val tied = Seq((1L, 0.5)).toDF("id", "f0")
    val m = QualityScorer.Model(Seq("f0"), Seq(0.0), Seq(1.0), Seq(0.0, 0.0))
    val pick = tied.withColumn("__best", array_max(array(
        struct(m.decision.as("d"), lit(0).as("nr"), lit("aa").as("lang")),
        struct(m.decision.as("d"), lit(-1).as("nr"), lit("zz").as("lang")))))
      .select(col("__best.lang")).collect()(0).getString(0)
    assert(pick === "aa", "equal decisions must break to the first label")
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
