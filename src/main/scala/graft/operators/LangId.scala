package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-shape LANGUAGE IDENTIFICATION (Joulin et al. 2017, "Bag of
  * Tricks for Efficient Text Classification"): hashed character-n-gram
  * features into a linear classifier. CCNet (Wenzek et al. 2020) runs
  * exactly this model BEFORE its perplexity filter — lang-id →
  * boilerplate removal → LM scoring — so this completes the engine's
  * CCNet stack (t108 + t112 are the other two stages).
  *
  * Scale shape: featurization is ONE explode-and-aggregate pass —
  * char n-grams are O(corpus chars) rows that map-side-combine down to
  * one row per document (no joins, no state); training runs on a
  * SAMPLE via [[QualityScorer]]'s declarative GD (each step one
  * codegen'd aggregate); scoring the 100 TB corpus is a single
  * literal-weight scan — the learned weights inline as literal
  * expressions over the same one-pass features, never a UDF. The
  * md5-hex bucket arithmetic is [[Sampling.dsirScores]]'s (portable
  * across engines, so an oracle can re-derive features exactly).
  */
object LangId {

  /** Per-document hashed char-n-gram fractions: `buckets` feature
    * columns `f0..f{buckets-1}`, each the fraction of the document's
    * n-grams whose md5 lands in that bucket (fractions, not counts, so
    * long documents don't dominate the GD gradient). Documents shorter
    * than `n` chars produce zero n-grams and all-zero features. */
  def charNgramFeatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, buckets: Int = 32): DataFrame = {
    require(n >= 1 && buckets >= 2 && buckets <= 256,
      s"charNgramFeatures: need n >= 1 and buckets in [2, 256], got n=$n buckets=$buckets")
    def hexVal(c: Column) =
      when(c.between("0", "9"), ascii(c) - 48).otherwise(ascii(c) - 87)
    // the CASE guard matters: sequence(1, 0) DESCENDS ([1, 0]) rather
    // than yielding empty, so an unguarded short document would emit
    // junk partial grams instead of none
    val grams = df.select(col(idCol), explode(expr(
      s"CASE WHEN length($textCol) >= $n THEN " +
        s"transform(sequence(1, length($textCol) - ${n - 1})," +
        s" i -> substring($textCol, i, $n)) " +
        "ELSE array() END")).as("__g"))
      .withColumn("__h", md5(col("__g")))
      .select(col(idCol), pmod(
        hexVal(substring(col("__h"), 1, 1)) * 16 +
          hexVal(substring(col("__h"), 2, 1)), lit(buckets)).as("__b"))
    val aggs = (0 until buckets).map(b =>
      (sum(when(col("__b") === b, 1L).otherwise(0L)) /
        count(lit(1))).as(s"f$b"))
    grams.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Feature column names for `buckets`. */
  def featureCols(buckets: Int): Seq[String] = (0 until buckets).map(i => s"f$i")

  /** Train a binary lang-id model on the labeled slice and score every
    * document: returns (idCol, decision) where decision > 0 predicts
    * the positive language. `labeled` and `all` must both carry the
    * feature columns from [[charNgramFeatures]]. */
  def trainAndScore(labeled: DataFrame, all: DataFrame, buckets: Int,
                    labelCol: String, iters: Int = 30,
                    rate: Double = 2.0): DataFrame = {
    val model = QualityScorer.train(labeled, featureCols(buckets),
      labelCol, iters, rate)
    all.withColumn("decision", model.decision)
  }
}
