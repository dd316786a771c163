package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus shaping for training-data pipelines: per-document term
  * salience (the relevance-scoring surface), deterministic global
  * shuffling into fixed-size shards (epoch construction), and
  * token-budget mixture sampling (source weighting).
  *
  * Everything is integer-exact and hash-ordered — no `rand()`, no
  * floating accumulation — so results reproduce across runs, cluster
  * sizes, and engines.
  */
object CorpusShape {

  /** Per-document top-k salient terms, TF-IDF-shaped but integer-exact:
    * `score_q = tf * 1e6 div df` (document-frequency-normalized term
    * frequency — a linear-idf salience; a log idf would rank identically
    * per document for equal tf). Ties break lexicographically.
    *
    * Scale shape: tokenize is scan-side; `tf` is one (doc, term)
    * aggregate; `df` is one term aggregate over the already-distinct
    * (doc, term) pairs (never re-reads the corpus); the re-join on term
    * is an equi-join; the top-k window is per-document. No global
    * stage, no collect.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_q").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .withColumn("score_q", expr("tf * 1000000 div df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"),
        col("tf"), col("df"), col("score_q"))
  }

  /** Deterministic global shuffle + sharding: order rows by
    * `md5(id:seed)` (id tie-break), number them 0..n-1, and cut into
    * `shardSize`-row shards — the epoch-shuffle + output-sizing step
    * before training. Returns the input columns plus (pos, shard).
    *
    * The row numbering is a distributed prefix count (range-partition +
    * per-partition counts + one bounded numPartitions-row collect), the
    * same exact-prefix-sum shape as [[Sampling.packByBudget]] — never a
    * single-partition global window.
    */
  def shuffleShards(df: DataFrame, idCol: String, seed: Long,
                    shardSize: Long): DataFrame = {
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    val spark = df.sparkSession
    val keyed = df.withColumn("__k",
      md5(concat(col(idCol).cast(StringType), lit(":" + seed))))
    val sorted = keyed.repartitionByRange(col("__k"), col(idCol))
      .sortWithinPartitions("__k", idCol)
    // the counts job and the position job must see IDENTICAL partition
    // contents; persist pins them so a nondeterministic upstream source
    // cannot disagree between the two passes. LIFETIME: the returned
    // DataFrame reads the pinned blocks, so they cannot be released
    // here — they live until the caller drops the frame, at which point
    // the ContextCleaner unpersists the GC'd RDD. Callers looping over
    // many shard builds should write each result out and drop the
    // reference (or checkpoint) rather than hold all frames live.
    val sortedRdd = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sortedRdd
      .mapPartitionsWithIndex { (i, it) => Iterator.single((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val schema = StructType(sorted.schema.fields :+
      StructField("pos", LongType, nullable = false))
    val rows = sortedRdd.mapPartitionsWithIndex { (i, it) =>
      var p = offsets(i)
      it.map { r => val out = Row.fromSeq(r.toSeq :+ p); p += 1; out }
    }
    spark.createDataFrame(rows, schema)
      .withColumn("shard", expr(s"pos div $shardSize"))
      .drop("__k")
  }

  /** Exact positional quantiles of a value per group — the corpus
    * length-distribution report (p50/p90/p99 token counts per source).
    * `approx_percentile` sketches are not engine-portable; the exact
    * definition — the value at 1-based position `ceil(q·n)` of the
    * group's sorted values — is, and for grouped data it distributes as
    * one per-group window + one conditional aggregate (windows shuffle
    * on the group key; no global stage). For an UNGROUPED quantile at
    * 100 TB the same definition runs via repartitionByRange + the
    * prefix-count trick (see shuffleShards); the grouped form is the
    * pipeline-common case.
    */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     qs: Seq[(String, Int, Int)]): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col("__v").asc)
    val ranked = df.select(col(groupCol), col(valueCol).cast(LongType).as("__v"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
    val picks = qs.map { case (name, num, den) =>
      // 1-based position ceil(num·n / den), in exact integer arithmetic
      max(when(col("__rn") === expr(s"($num * __n + $den - 1) div $den"), col("__v")))
        .as(name)
    }
    ranked.groupBy(groupCol)
      .agg(count(lit(1)).cast(LongType).as("n"), picks: _*)
  }

  /** Exact UNGROUPED positional quantiles at corpus scale — the path
    * [[groupQuantiles]]' doc promises for global distributions: sort
    * by value via range partitioning, locate the 1-based positions
    * `ceil(num·n / den)` with the distributed prefix count (the
    * [[shuffleShards]] trick — per-partition counts, one bounded
    * numPartitions-row collect, NEVER a single-partition global
    * window), then pull exactly the |qs| rows at those positions.
    * Returns ONE row: (n, <one column per quantile>); all-null
    * quantiles when the input is empty. */
  def globalQuantiles(df: DataFrame, valueCol: String,
                      qs: Seq[(String, Int, Int)]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.select(col(valueCol).cast(LongType).as("__v"))
      .repartitionByRange(col("__v")).sortWithinPartitions("__v")
    // pin partition contents across the two passes (same rationale as
    // shuffleShards)
    val rdd = sorted.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = rdd
      .mapPartitionsWithIndex { (i, it) => Iterator.single((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val n = offsets.last
    val positions = qs.map { case (_, num, den) => (num * n + den - 1) / den }
    val posSet = positions.toSet
    val picked: Map[Long, Long] =
      if (n == 0) Map.empty
      else rdd.mapPartitionsWithIndex { (i, it) =>
        var p = offsets(i)
        it.flatMap { r =>
          p += 1
          if (posSet.contains(p)) Iterator((p, r.getLong(0))) else Iterator.empty
        }
      }.collect().toMap // bounded: at most |qs| rows
    // both passes are complete — release the pinned blocks eagerly
    // (repeated profiling calls must not stack cached sorts until LRU
    // eviction, whose recompute-from-nondeterministic-source would
    // reopen the two-pass disagreement the persist pins down)
    rdd.unpersist(blocking = false)
    val schema = StructType(StructField("n", LongType, nullable = false) +:
      qs.map { case (name, _, _) => StructField(name, LongType, nullable = true) })
    val row = Row.fromSeq(n +: positions.map(p =>
      picked.get(p).map(java.lang.Long.valueOf).orNull))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), numSlices = 1), schema)
  }

  /** Token-budget mixture sampling: within each source, take documents
    * in deterministic hash order until the source's token budget is
    * reached (inclusive running sum ≤ budget). `budget` and `tokens`
    * are expressions over the input row, so weights can come from a
    * config map, a column, or a law. Per-source windows distribute on
    * the source key — no global stage.
    */
  def mixtureSample(df: DataFrame, sourceCol: String, idCol: String,
                    tokens: Column, budget: Column): DataFrame = {
    val w = Window.partitionBy(sourceCol)
      .orderBy(md5(concat(col(idCol).cast(StringType), lit(":mix"))), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokens)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Sketch-tier corpus profile — the 100 TB companion to
    * [[globalQuantiles]] and an exact vocabulary count. The exact
    * paths are correct but SORT-the-corpus ([[globalQuantiles]]'s
    * range partition) or SHUFFLE-the-vocabulary (count(distinct term))
    * shapes; a profiling pass over 100 TB wants one map-side-combinable
    * aggregate and bytes-sized state. This emits, in TWO single-stage
    * aggregate jobs and zero sorts:
    *
    *   - `n`           exact row count
    *   - `d_approx`    HyperLogLog++ distinct count of the exploded
    *                   `termsCol` (state = one 2^p-register sketch per
    *                   partial; `rsd` picks p)
    *   - one approx percentile per entry of `qs` (Greenwald-Khanna
    *                   summaries, `accuracy` bounds the rank error at
    *                   n/accuracy)
    *
    * Both sketches are deterministic for a given dataset (hash-based
    * registers / rank summaries with commutative merges), but their
    * VALUES are engine-specific — correctness gates must compare exact
    * values and assert the sketch lands within its error bound (see
    * ShapeGate.t79), never hash-compare sketch output across engines.
    */
  def approxProfile(df: DataFrame, termsCol: String, valueCol: String,
                    qs: Seq[(String, Double)], rsd: Double = 0.01,
                    accuracy: Int = 10000): DataFrame = {
    val quants = df.agg(
      count(lit(1)).cast(LongType).as("n"),
      qs.map { case (name, q) =>
        percentile_approx(col(valueCol).cast(LongType), lit(q), lit(accuracy))
          .cast(LongType).as(name)
      }: _*)
    val distinctTerms = df
      .select(explode(col(termsCol)).as("__t")).filter(col("__t") =!= "")
      .agg(approx_count_distinct(col("__t"), rsd).as("d_approx"))
    quants.crossJoin(distinctTerms) // both sides are single-row aggregates
  }
}
