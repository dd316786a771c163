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
    * [[groupQuantiles]]' doc promises for global distributions, as an
    * ITERATIVE HISTOGRAM SELECTION (the classic distributed k-th
    * element pick): a LAZY narrow localCheckpoint of the cast values
    * (compact UnsafeRows, pinned by the first pass — the only
    * materialization), then ≤ 1 + ceil(log₆₅₅₃₆(range)) histogram
    * passes — each ONE map-side-combinable hash aggregate of
    * per-bucket (count, min, max) whose ≤ 65538 rows per live range
    * collect to the driver — narrowing each target position's
    * candidate VALUE range ~2¹⁶× per pass until it pins a single
    * value. The first pass needs no prior range knowledge (fixed 2⁴⁸
    * bucket width bounds the group count over the full long domain)
    * and yields n in the same job; per-bucket min/max make every
    * refinement exact, so near-constant value distributions resolve in
    * 2 passes. The answer is identical to the sorted-order definition
    * (the value at 1-based position `ceil(num·n / den)`) because
    * truncating `div` bucketing is monotonic in the value, so bucket
    * walks preserve rank order.
    *
    * Why not the previous sort-based pick (r17 shape): that path paid
    * a repartitionByRange + sortWithinPartitions over EVERY value, an
    * external-Row conversion per element (`df.rdd`, guide §1.4), and a
    * MEMORY_AND_DISK pin of the sorted Rows as deserialized Java
    * objects — at 100 TB a full-corpus shuffle + corpus-sized cache
    * for a |qs|-row answer. The histogram passes shuffle NOTHING (the
    * per-pass aggregate is bucket-count-bounded) and re-read only the
    * checkpointed 8-byte column. Returns ONE row: (n, <one column per
    * quantile>); all-null quantiles when the input is empty. */
  def globalQuantiles(df: DataFrame, valueCol: String,
                      qs: Seq[(String, Int, Int)]): DataFrame = {
    val spark = df.sparkSession
    // LAZY checkpoint: the first histogram pass both computes and pins
    // the narrow column — no separate materialization job
    val vals = df.select(col(valueCol).cast(LongType).as("__v"))
      .localCheckpoint(eager = false)
    val bCount = 65536L
    // one histogram job: per-bucket (count, min, max) for every live
    // range in ONE aggregate. Per-bucket min/max make each bucket's
    // REFINED range exact (never the arithmetic bucket bounds), so a
    // bucket holding one distinct value resolves immediately and the
    // global n/min/max never need their own job.
    case class Bucket(b: Long, c: Long, lo: Long, hi: Long)
    def histogram(arm: Column): Map[Int, Seq[Bucket]] =
      vals.select(arm.as("a")).filter(col("a").isNotNull)
        .groupBy(col("a.ri").as("ri"), col("a.b").as("b"))
        .agg(count(lit(1)).as("c"), min(col("a.v")).as("lo"),
          max(col("a.v")).as("hi"))
        .collect() // bounded: ≤ 65538 buckets per live range
        .groupBy(_.getInt(0))
        .map { case (ri, rows) =>
          ri -> rows.map(r =>
            Bucket(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
            .sortBy(_.b).toSeq }
    // walk one range's bucket list to the target rank; returns the
    // refined (lo, hi, rank-within)
    def walk(buckets: Seq[Bucket], rank: Long): (Long, Long, Long) = {
      var cum = 0L
      var j = 0
      // the invariant (rank ≤ rows in the range) guarantees the walk
      // lands before the histogram ends
      while (cum + buckets(j).c < rank) { cum += buckets(j).c; j += 1 }
      (buckets(j).lo, buckets(j).hi, rank - cum)
    }
    // PASS 1 — no prior range knowledge: fixed 2⁴⁸ bucket width covers
    // the full long domain in ≤ 2¹⁶ + 1 groups and yields n (Σ counts)
    // plus each position's first refined range in the same job
    val coarse = histogram(struct(lit(0).as("ri"),
      expr("__v div CAST(281474976710656 AS BIGINT)").as("b"),
      col("__v").as("v"))).getOrElse(0, Seq.empty)
    val n = coarse.map(_.c).sum
    val resolved = scala.collection.mutable.Map.empty[Long, Long]
    if (n > 0) {
      // live picks: (target 1-based global position, candidate value
      // range [lo, hi], 1-based rank within rows whose __v ∈ [lo, hi])
      var live = qs.map { case (_, num, den) =>
        (num.toLong * n + den - 1) / den }.distinct.map { p =>
        val (lo, hi, r) = walk(coarse, p)
        (p, lo, hi, r)
      }
      while (live.nonEmpty) {
        val (done, todo) = live.partition { case (_, lo, hi, _) => lo == hi }
        done.foreach { case (p, lo, _, _) => resolved(p) = lo }
        live = Nil
        if (todo.nonEmpty) {
          // distinct ranges (positions narrowed into the same bucket
          // share one histogram); ranges are pairwise disjoint-or-equal
          // by construction, so each row matches at most one arm
          val ranges = todo.map { case (_, lo, hi, _) => (lo, hi) }.distinct
          val widths = ranges.map { case (lo, hi) =>
            (((BigInt(hi) - BigInt(lo) + 1) + (bCount - 1)) / bCount)
              .max(1).toLong }
          val arms = ranges.zip(widths).zipWithIndex.map {
            case (((lo, hi), w), i) =>
              when(col("__v") >= lo && col("__v") <= hi,
                struct(lit(i).as("ri"),
                  expr(s"__v div CAST($w AS BIGINT)").as("b"),
                  col("__v").as("v")))
          }
          val hist = histogram(coalesce(arms: _*))
          live = todo.map { case (p, lo, hi, r) =>
            val ri = ranges.indexOf((lo, hi))
            val (nlo, nhi, nr) = walk(hist(ri), r)
            (p, nlo, nhi, nr)
          }
        }
      }
    }
    val schema = StructType(StructField("n", LongType, nullable = false) +:
      qs.map { case (name, _, _) => StructField(name, LongType, nullable = true) })
    val row = Row.fromSeq(n +: qs.map { case (_, num, den) =>
      if (n == 0) null
      else java.lang.Long.valueOf(resolved((num.toLong * n + den - 1) / den)) })
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
