package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TextAnalysisSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import TextAnalysis._

  test("langId picks the profile with most marker hits") {
    val df = Seq(
      "the cat and the dog is here",
      "el perro y la casa de que",
      "der hund und die katze ist das",
      "le chat et les maisons des amis",
      "و این متن در مورد به از که",
      "zzz qqq xxx").toDF("t")
    val out = df.select(langId(col("t")).as("l")).as[String].collect().toSeq
    assert(out === Seq("en", "es", "de", "fr", "fa", null))
  }

  test("quality score rewards clean prose, punishes noise") {
    val clean = "the quick brown fox jumps over the lazy dog and runs away"
    val noisy = "@@@!!! ### $$$ %%% ^^^ &&& *** ((()))"
    val scores = Seq(clean, noisy).toDF("t")
      .select(qualityScore(col("t")).as("q")).as[Double].collect()
    assert(scores(0) > 0.8)
    assert(scores(1) < 0.4)
  }

  test("token counts and fingerprint normalization") {
    val out = Seq(("a  b   c", "A    B   C ")).toDF("x", "y")
      .select(tokenCount(col("x")).as("n"),
        (fingerprint(col("x")) === fingerprint(col("y"))).as("same"))
      .collect()(0)
    assert(out.getAs[Int]("n") === 3)
    assert(out.getAs[Boolean]("same") === true) // whitespace+case normalized
  }

  test("bpe-ish count exceeds word count for long words") {
    val out = Seq("internationalization is extraordinarily complicated").toDF("t")
      .select(tokenCount(col("t")).as("w"), tokenCountBpeIsh(col("t")).as("b"))
      .collect()(0)
    assert(out.getAs[Int]("w") === 4)
    assert(out.getAs[Int]("b") > 4)
  }
}
