package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Declarative quality checks: one-scan row rules, uniqueness,
  * referential integrity, zero-violation clean path. */
class QualitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("scanChecks counts each rule independently in one pass") {
    val df = Seq((1L, "a"), (-2L, "b"), (0L, null.asInstanceOf[String]))
      .toDF("v", "s")
    val out = Quality.scanChecks(df, Seq(
      "v_positive" -> (col("v") <= 0),
      "s_nonnull" -> col("s").isNull)).collect()
    assert(out.toSeq === Seq(Row("v_positive", 2L), Row("s_nonnull", 1L)))
  }

  test("scanChecks on an empty frame reports zero, not null") {
    val out = Quality.scanChecks(Seq.empty[Long].toDF("v"),
      Seq("v_positive" -> (col("v") <= 0))).collect()
    assert(out.toSeq === Seq(Row("v_positive", 0L)))
  }

  test("uniqueCheck counts rows involved in duplicate keys, 0 when unique") {
    val dup = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    assert(Quality.uniqueCheck(dup, "u", Seq("k")).collect().toSeq
      === Seq(Row("u", 5L))) // 2+3 rows share keys
    val uniq = Seq(1L, 2L, 3L).toDF("k")
    assert(Quality.uniqueCheck(uniq, "u", Seq("k")).collect().toSeq
      === Seq(Row("u", 0L)))
  }

  test("QualityScorer: separable data classifies exactly; scoring is plan arithmetic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // y ⟺ f1 ≥ 3; f2 is noise correlated with nothing
    val rows = (0 until 300).map { i =>
      val f1 = (i % 6).toDouble
      (i.toLong, f1, ((i * 37) % 11).toDouble, f1 >= 3.0)
    }.toDF("id", "f1", "f2", "y")
    val m = QualityScorer.train(rows, Seq("f1", "f2"), "y",
      iters = 60, rate = 1.0)
    // every row classified correctly by the decision sign
    val scored = rows.select(col("id"), col("y"), m.decision.as("s")).collect()
    assert(scored.forall(r => (r.getAs[Double]("s") > 0) == r.getAs[Boolean]("y")))
    // the learned weight loads on the informative feature
    assert(math.abs(m.weights(0)) > 5 * math.abs(m.weights(1)),
      s"weights ${m.weights} should load on f1")
    // decision is literal arithmetic — no UDF in the plan
    val plan = rows.select(m.decision).queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
    // retraining on a repartitioned frame flips no verdict
    val m2 = QualityScorer.train(rows.repartition(7), Seq("f1", "f2"), "y",
      iters = 60, rate = 1.0)
    val scored2 = rows.select(col("id"), col("y"), m2.decision.as("s")).collect()
    assert(scored2.forall(r => (r.getAs[Double]("s") > 0) == r.getAs[Boolean]("y")))
    // constant features are inert (std-0 guard), not NaN factories
    val m3 = QualityScorer.train(rows.withColumn("c", lit(4.0)),
      Seq("f1", "c"), "y", iters = 30, rate = 1.0)
    assert(!m3.weights.exists(_.isNaN))
  }

  test("QualityScorer: an over-budget frame TRAINS via the distributed path, never throws") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // same separable fixture; a tiny driverLocalBudget forces every
    // row count over the driver-local contract, exercising the
    // distributed GD fallback end to end (round-17 verdict №1: a
    // corpus-proportional caller must RUN at scale, not fail loudly)
    val rows = (0 until 300).map { i =>
      val f1 = (i % 6).toDouble
      (i.toLong, f1, ((i * 37) % 11).toDouble, f1 >= 3.0)
    }.toDF("id", "f1", "f2", "y")
    val dist = QualityScorer.trainMulti(rows, Seq("f1", "f2"), Seq("y"),
      iters = 60, rate = 1.0, driverLocalBudget = 4L).head
    val scored = rows.select(col("id"), col("y"), dist.decision.as("s"))
      .collect()
    assert(scored.forall(r =>
      (r.getAs[Double]("s") > 0) == r.getAs[Boolean]("y")),
      "distributed fallback must separate the separable fixture")
    // both paths compute the same iteration up to fp summation order:
    // weights agree far beyond any decision boundary
    val local = QualityScorer.train(rows, Seq("f1", "f2"), "y",
      iters = 60, rate = 1.0)
    local.weights.zip(dist.weights).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"weights diverged: $a vs $b")
    }
    // nothing lingers cached after the fallback trains
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("PriceRegression: exact fit on an exact linear surface") {
    // price = 250·a + 1500·r + 3000 with NO residual: least squares
    // must recover the coefficients exactly (integer sums, Cramer)
    val rows = (0L until 200L).map { i =>
      val a = 50L + i % 150; val r = (i / 150L) % 5
      (i, a, r, 250L * a + 1500L * r + 3000L)
    }.toDF("id", "area", "rooms", "price_m")
    val fit = PriceRegression.fit(rows, "area", "rooms", "price_m")
      .fold(m => fail(s"fit failed: $m"), identity)
    assert(fit.waE6 === 250000000L)
    assert(fit.wrE6 === 1500000000L)
    assert(fit.bE6 === 3000000000L)
    assert(PriceRegression.predictToman(fit, 100L, 0L) === 28000000000L)
  }

  test("PriceRegression: degenerate feeds fail loudly, not numerically") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("area", "rooms", "price_m")
    assert(PriceRegression.fit(empty, "area", "rooms", "price_m")
      .left.exists(_.contains("empty")))
    val constArea = Seq((77L, 1L, 100L), (77L, 2L, 200L), (77L, 3L, 300L))
      .toDF("area", "rooms", "price_m")
    assert(PriceRegression.fit(constArea, "area", "rooms", "price_m")
      .left.exists(_.contains("area")))
    val constRooms = Seq((10L, 2L, 100L), (20L, 2L, 200L), (30L, 2L, 300L))
      .toDF("area", "rooms", "price_m")
    assert(PriceRegression.fit(constRooms, "area", "rooms", "price_m")
      .left.exists(_.contains("rooms")))
  }

  test("fkCheck counts orphans including null keys") {
    val parent = Seq(1L, 2L).toDF("p")
    val child = Seq(Option(1L), Option(3L), None).toDF("k")
    assert(Quality.fkCheck(child, "fk", "k", parent, "p").collect().toSeq
      === Seq(Row("fk", 2L)))
  }
}
