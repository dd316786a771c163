package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** DSIR-style IMPORTANCE scoring (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score
    * every document by how much more likely its HASHED-UNIGRAM bag is
    * under the TARGET domain's distribution than under the raw
    * corpus's — the cheap, principled "select pretraining data that
    * looks like the domain you care about" recipe. Words hash into
    * `buckets` bins (md5 hex-char arithmetic — portable across
    * engines), both distributions are Laplace-smoothed bucket
    * frequencies, and a document's score is Σ_w [ln p_target(b_w) −
    * ln p_raw(b_w)]. Positive score = more target-like than raw;
    * resample by score (the gate keeps score > 0; a production
    * pipeline adds Gumbel noise for a soft sample — the scoring is
    * the operator, the noise is a column).
    *
    * EXACTNESS: per-bucket log-ratios quantize to integer micro-nats
    * ONCE (B rows), so document scores are exact integer sums —
    * engine-comparable, tie-free. Scale shape: one exploded-token
    * pass feeds a B-row aggregate (map-side partial, broadcast back)
    * and one per-doc sum — two scans, zero wide shuffles beyond the
    * doc-key aggregation, linear at 100 TB; the bucket table is
    * O(buckets) everywhere it travels. */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, buckets: Int = 64): DataFrame = {
    require(buckets >= 2 && buckets <= 65536,
      s"dsirScores: buckets must be in [2, 65536], got $buckets")
    def hexVal(c: Column) =
      when(c.between("0", "9"), ascii(c) - 48).otherwise(ascii(c) - 87)
    // hash width scales with the requested bucket count: 2 hex chars
    // (256 values) cover buckets ≤ 256, 4 chars (65536) the rest —
    // a 2-char hash with buckets > 256 would leave every higher
    // bucket PERMANENTLY empty and silently degrade the estimate.
    // Power-of-two bucket counts divide the hash range evenly;
    // non-divisors carry a ≤1/(range/buckets) per-bucket mass skew.
    val hashChars = if (buckets <= 256) 2 else 4
    val hv = (1 to hashChars)
      .map(i => hexVal(substring(col("__h"), i, 1)))
      .reduceLeft((a, b) => a * 16 + b)
    val toks = docs
      .select(col(idCol), isTarget.as("__t"),
        explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .withColumn("__h", md5(col("w")))
      .select(col(idCol), col("__t"), pmod(hv, lit(buckets)).as("b"))
    // collapse the token stream ONCE to per-(doc, bucket) counts and
    // materialize: both the bucket distributions and the per-document
    // score sums derive from this O(docs × buckets) frame, so the
    // md5-tokenize explode runs a single time instead of once per
    // consumer (`__t` is constant per document — keeping it in the key
    // adds no groups). Derived sums are bit-identical: per-token
    // score sums become count-weighted bucket sums of the same
    // integers.
    val docBucket = toks.groupBy(col(idCol), col("__t"), col("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // ONE pass counts both distributions (target ⊆ raw)
    val counts = docBucket.groupBy("b").agg(
      sum(when(col("__t"), col("c")).otherwise(0L)).as("ct"),
      sum(col("c")).as("cr"))
    val totals = counts.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("rt"))
    // integer micro-nat score per bucket: floor(1e6·ln(p/q) + 0.5) —
    // quantized once, so everything downstream is exact integers
    val scores = counts.crossJoin(broadcast(totals))
      .select(col("b"),
        floor(lit(1e6) *
            (log((col("ct") + 1).cast("double") /
                 (col("tt") + buckets).cast("double")) -
             log((col("cr") + 1).cast("double") /
                 (col("rt") + buckets).cast("double"))) + 0.5)
          .cast(LongType).as("s"))
    docBucket.join(broadcast(scores), "b")
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("s") * col("c")).as("dsir_score_e6"))
  }

  /** TEMPERATURE-SMOOTHED mixture sampling (α = 0.5, the standard
    * multilingual/multi-source smoothing): draw one epoch of
    * `epochDocs` documents with per-source quotas ∝ √n_s — small
    * sources are upweighted relative to proportional sampling, the
    * T5/CC-mixing recipe. Selection is EXACT and deterministic:
    * quota arithmetic is all-integer (⌊√n⌋ weights, floor division),
    * each source contributes its quota's lowest rows by the portable
    * hash rank ((key·2654435761) mod 1000003, ties by key) — no
    * rand(), reproducible on any engine.
    *
    * Scale shape: NO per-source global window over the data (few
    * heavy groups = straggler tasks). Instead the per-source rank
    * threshold is found on the (source, hk) HISTOGRAM — bounded by
    * 1000003 rows per source regardless of corpus size — and the data
    * is then filtered by broadcast threshold; only the single tie
    * bucket at the threshold (expected n_s/1000003 rows) is ranked
    * exactly. One balanced shuffle + one broadcast filter at 100 TB.
    * Per-source counts collect to the driver — rows = #sources,
    * bounded like every profile here. */
  def temperatureMixture(docs: DataFrame, epochDocs: Long,
                         srcCol: String = "source",
                         keyCol: String = "doc_id"): DataFrame = {
    require(epochDocs > 0, s"temperatureMixture: epochDocs must be positive, got $epochDocs")
    import org.apache.spark.sql.expressions.Window
    val keyed = docs.withColumn("__hk",
      pmod(col(keyCol) * lit(2654435761L), lit(1000003L)))
    val counts = keyed.groupBy(col(srcCol)).agg(count(lit(1)).as("n"))
      .withColumn("w", floor(sqrt(col("n"))).cast(LongType))
      .collect() // #sources rows
    val wSum = counts.map(_.getAs[Long]("w")).sum
    val takes = counts.map { r =>
      val n = r.getAs[Long]("n")
      r.get(0) -> math.min(epochDocs * r.getAs[Long]("w") / wSum, n)
    }.toMap
    val takeCol = takes.foldLeft(lit(0L)) { case (acc, (s, t)) =>
      when(col(srcCol) === s, lit(t)).otherwise(acc)
    }
    // threshold per source from the hk histogram: the unique histogram
    // row where the cumulative count first covers the quota
    val hist = keyed.groupBy(col(srcCol), col("__hk")).agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
        sum(col("c")).over(Window.partitionBy(srcCol).orderBy("__hk")))
      .withColumn("__take", takeCol)
    val thr = cum
      .where(col("__take") > 0 &&
        col("cum") - col("c") < col("__take") && col("__take") <= col("cum"))
      .select(col(srcCol), col("__hk").as("__thk"),
        (col("__take") - (col("cum") - col("c"))).as("__need_at_t"))
    val joined = keyed.join(broadcast(thr), Seq(srcCol))
    val below = joined.where(col("__hk") < col("__thk"))
    // the tie bucket: rank ONLY the rows AT the threshold hk by key
    val atT = joined.where(col("__hk") === col("__thk"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col(srcCol)).orderBy(col(keyCol))))
      .where(col("__r") <= col("__need_at_t"))
      .drop("__r")
    below.unionByName(atT)
      .drop("__hk", "__thk", "__need_at_t")
  }

  /** Sequence packing: assign documents (in a stable order) to
    * fixed-token-budget bins — the batch-construction step of an LLM
    * training pipeline. Greedy sequential packing is exactly cumulative
    * arithmetic, so it parallelizes EXACTLY via a distributed prefix
    * sum: range-partition + sort on the order column, aggregate one
    * total per partition (a numPartitions-row driver collect), then a
    * single mapPartitions pass adds each partition's offset to its
    * local running sum. No global window, no single-partition stage —
    * the same shape as the surrogate-id assignment, and bins that span
    * partition boundaries are still exact because the offsets are.
    *
    * A row's bin is `floor(exclusive_prefix / budget)`: bins fill past
    * the budget by at most one document, the standard greedy-packing
    * contract (an over-budget document still lands in one bin).
    */
  def packByBudget(df: DataFrame, orderCol: String, weightCol: String,
                   budget: Long, binCol: String = "bin_id"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(col(orderCol)).sortWithinPartitions(orderCol)
    val wIdx = sorted.schema.fieldIndex(weightCol)
    def weightOf(r: Row): Long =
      if (r.isNullAt(wIdx)) 0L else r.get(wIdx) match {
        case n: Number => n.longValue()
        case other => other.toString.toLong
      }
    val totals = sorted.rdd
      .mapPartitionsWithIndex { (i, it) =>
        var t = 0L; it.foreach(t += weightOf(_)); Iterator.single((i, t))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // exclusive per-partition offsets
    val schema = StructType(sorted.schema.fields :+
      StructField(binCol, LongType, nullable = false))
    val rows = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var cum = offsets(i)
      it.map { r =>
        val bin = cum / budget // exclusive prefix of this row
        cum += weightOf(r)
        Row.fromSeq(r.toSeq :+ bin)
      }
    }
    spark.createDataFrame(rows, schema)
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
