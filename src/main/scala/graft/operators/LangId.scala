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
    * than `n` chars produce zero n-grams and ALL-ZERO features — they
    * stay in the output (a NULL-gram sentinel row keeps the doc_id
    * through the aggregate, so no join back to the input is needed;
    * the `when(__b === b)` arms are null for the sentinel and count 0,
    * while its `count(lit(1))` = 1 makes every fraction exactly 0). */
  def charNgramFeatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, buckets: Int = 32): DataFrame = {
    require(n >= 1 && buckets >= 2 && buckets <= 256,
      s"charNgramFeatures: need n >= 1 and buckets in [2, 256], got n=$n buckets=$buckets")
    def hexVal(c: Column) =
      when(c.between("0", "9"), ascii(c) - 48).otherwise(ascii(c) - 87)
    // the CASE guard matters: sequence(1, 0) DESCENDS ([1, 0]) rather
    // than yielding empty, so an unguarded short document would emit
    // junk partial grams instead of none — it emits the NULL sentinel
    val grams = df.select(col(idCol), explode(expr(
      s"CASE WHEN length($textCol) >= $n THEN " +
        s"transform(sequence(1, length($textCol) - ${n - 1})," +
        s" i -> substring($textCol, i, $n)) " +
        "ELSE array(CAST(NULL AS STRING)) END")).as("__g"))
      .withColumn("__h", md5(col("__g")))
      .select(col(idCol), pmod(
        hexVal(substring(col("__h"), 1, 1)) * 16 +
          hexVal(substring(col("__h"), 2, 1)), lit(buckets)).as("__b"))
    // TWO-LEVEL aggregate: first collapse the gram stream to per-(doc,
    // bucket) counts — one map-side-combinable hash-agg update per gram
    // row — then compute the `buckets` fraction columns over the ≤
    // buckets+1 rows per document. The previous single-level shape
    // evaluated all `buckets` when-arms on EVERY gram row (64 × grams
    // comparisons); this evaluates them on bucket-count rows only.
    // Fractions are bit-identical: numerator = the bucket's row count
    // either way, denominator = total gram rows = sum of the counts.
    // The sentinel's `__b` is NULL → its own group; every
    // `when(__b === b)` arm is null-false → 0, over total 1 → 0.0.
    val counts = grams.groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val aggs = (0 until buckets).map(b =>
      (sum(when(col("__b") === b, col("__c")).otherwise(0L)) /
        sum(col("__c"))).as(s"f$b"))
    counts.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
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

  /** MULTICLASS lang-id — fastText/CCNet's real shape (one label per
    * language, ~100 of them), as ONE-VS-REST over the single shared
    * featurization: the distinct labels collect to the driver (the
    * language inventory — bounded, never corpus-sized), each gets a
    * binary GD fit via [[QualityScorer.trainMulti]] (stats +
    * standardized cache computed ONCE, k sample-scale loops share it),
    * and scoring is a single literal-weight scan per document that
    * takes the ARGMAX of the k decision values.
    *
    * Tie-break is deterministic: highest decision wins; equal
    * decisions go to the label EARLIEST in lexicographic label order
    * (the argmax is an `array_max` over (decision, −labelRank, label)
    * structs — struct ordering compares fields left to right, so
    * −labelRank turns "max" into "first label" on ties; an oracle
    * re-derives it with ORDER BY decision DESC, label ASC LIMIT 1).
    * Returns `all` plus `language` (the argmax label) and `decision`
    * (its decision value). */
  def trainAndScoreMulticlass(labeled: DataFrame, all: DataFrame,
                              buckets: Int, labelCol: String,
                              iters: Int = 30, rate: Double = 2.0)
      : DataFrame = {
    val langs = labeled.select(col(labelCol).cast("string"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    require(langs.size >= 2,
      s"trainAndScoreMulticlass: need >= 2 labels, got $langs")
    val oneVsRest = langs.zipWithIndex.foldLeft(labeled) {
      case (d, (lang, j)) => d.withColumn(s"__y$j",
        when(col(labelCol) === lang, 1.0).otherwise(0.0))
    }
    val models = QualityScorer.trainMulti(oneVsRest, featureCols(buckets),
      langs.indices.map(j => s"__y$j"), iters, rate)
    val candidates = langs.zipWithIndex.map { case (lang, j) =>
      struct(models(j).decision.as("d"), lit(-j).as("nr"),
        lit(lang).as("lang"))
    }
    all.withColumn("__best", array_max(array(candidates: _*)))
      .withColumn("language", col("__best.lang"))
      .withColumn("decision", col("__best.d"))
      .drop("__best")
  }
}
