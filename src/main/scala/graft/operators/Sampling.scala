package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data corpus shaping (beyond the reference, SURVEY.md §2
  * training-data family): deterministic stratified sampling and
  * corpus-level vocabulary statistics.
  *
  * Sampling is HASH-decided, never `rand()`: the decision for a row
  * depends only on its key, so it is reproducible across runs, resumes,
  * cluster sizes, and partitionings — the property a multi-epoch
  * training-data pipeline needs. The per-stratum rate is a broadcast-free
  * scan-side expression, so the whole op is one filtered scan: no
  * shuffle, trivially linear at 100 TB.
  */
object Sampling {

  /** Uniform-in-[0,100) percent from a key column via xxhash64 — the
    * production default decision variable. */
  def uniformPct(key: Column): Column =
    pmod(abs(xxhash64(key)), lit(100L))

  /** Keep each row with its stratum's rate (0.0–1.0). `pct` is the
    * uniform decision column — inject a portable expression when an
    * external system must reproduce the sample (the t36 gate does). */
  def stratifiedSample(df: DataFrame, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       pct: Column): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultRate * 100.0)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v * 100.0)).otherwise(acc)
    }
    df.filter(pct < rateCol)
  }

  /** Per-stratum top-k terms by DOCUMENT frequency (each term counted
    * once per document) — the vocabulary/stopword-list builder. Shape:
    * one distinct-shingle explode, one count aggregate, one bounded
    * per-stratum window (k rows out per stratum). Integer-exact, so the
    * result is engine-portable; ties break lexicographically. */
  def topTermsByDocFreq(df: DataFrame, strataCol: String, textCol: String,
                        k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = df.select(col(strataCol).as("stratum"),
        explode(array_distinct(split(col(textCol), " "))).as("term"))
      .filter(col("term") =!= "")
    val counts = terms.groupBy("stratum", "term").agg(count(lit(1)).as("doc_freq"))
    counts
      .withColumn("rank", row_number().over(
        Window.partitionBy("stratum")
          .orderBy(col("doc_freq").desc, col("term"))))
      .filter(col("rank") <= k)
  }
}
