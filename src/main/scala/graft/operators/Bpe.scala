package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE (byte-pair-encoding) merge training — the tokenizer-building
  * loop over a corpus word-frequency table: count adjacent symbol
  * pairs (weighted by word frequency), merge the most frequent pair
  * everywhere (leftmost-greedy within a word), repeat until the merge
  * budget is spent. Extends the single pair-statistics step of the
  * t67 gate into the full iterative loop.
  *
  * Scale shape per round: pair extraction is scan-side
  * (one `transform` over each word's symbol array), the count is one
  * map-side-combinable aggregate whose result is alphabet²-bounded,
  * the argmax is a global top-1 (TakeOrderedAndProject — a 1-row
  * driver collect, the bounded-collect pattern), and re-segmentation
  * is a pure column expression (`aggregate` fold, no UDF). The
  * segmentation frame operates on DISTINCT words, not the corpus —
  * at 100 TB the word-frequency table is the classic heavy-hitters
  * reduction (vocabulary ≪ corpus). Lineage truncates per round
  * exactly as [[Ann.lloydConverged]] / [[Graph.pageRankConverged]],
  * including the `reliable` checkpoint mode; words fully merged to
  * one symbol drop out of later rounds.
  *
  * Determinism: the merge choice orders by (count desc, lhs asc,
  * rhs asc) — exact integer counts and binary string order, so any
  * engine replaying the same greedy recurrence lands on the identical
  * merge table.
  */
object Bpe {

  /** Leftmost-greedy single-pair merge over a symbol array: scan left
    * to right, replace every non-overlapping `[l, r]` occurrence by
    * `l+r` (in a run of equal symbols, occurrences at even offsets —
    * the classic BPE rule). A fold over positions carrying
    * (out, skip): `skip` marks that the current position was consumed
    * by a merge starting one to the left. */
  private def mergeOnce(syms: Column, l: String, r: String): Column =
    aggregate(
      sequence(lit(0), size(syms) - 1),
      struct(typedlit(Seq.empty[String]).as("out"), lit(false).as("skip")),
      (acc, i) => {
        val cur = get(syms, i)
        val isMerge = coalesce(
          !acc.getField("skip") && cur === lit(l) &&
            get(syms, i + 1) === lit(r),
          lit(false))
        struct(
          when(acc.getField("skip"), acc.getField("out"))
            .when(isMerge, concat(acc.getField("out"), array(lit(l + r))))
            .otherwise(concat(acc.getField("out"), array(cur))).as("out"),
          isMerge.as("skip"))
      },
      acc => acc.getField("out"))

  /** Segment `wCol` into BPE symbols by replaying a trained merge list
    * IN ORDER (each step leftmost-greedy, exactly as training was) —
    * the apply side of the tokenizer: train once with [[trainMerges]],
    * segment any corpus with the resulting table. Returns the input
    * plus `syms` (array<string>). Pure column expressions end to end;
    * callers tokenizing a corpus should segment the DISTINCT word
    * frame and join back (the same heavy-hitters reduction training
    * uses). */
  def segment(words: DataFrame, wCol: String,
              merges: Seq[(String, String)]): DataFrame = {
    val init = words.withColumn("syms",
      expr(s"transform(sequence(1, length($wCol)), i -> substring($wCol, i, 1))"))
    merges.foldLeft(init) { case (df, (l, r)) =>
      df.withColumn("syms", mergeOnce(col("syms"), l, r))
    }
  }

  /** [[segment]] for PRODUCTION-SIZED merge tables: the fold form adds
    * one plan node per merge — fine for a gate's 8 merges, unusable at
    * a real tokenizer's ~30k. This form broadcasts the merge RANKING
    * into one UDF that repeatedly applies the lowest-ranked applicable
    * pair per word — O(len²·lookup) per word, independent of vocab
    * size. Output is identical to the fold (BpeSpec pins it): applying
    * a merge can never make a LOWER-ranked pair newly applicable,
    * because the merged symbol was created at its own rank and only
    * feeds higher-ranked merges — so rank-priority order and training
    * order coincide. A UDF is warranted here (the per-word loop count
    * is data-dependent; no Catalyst expression can express it). */
  def segmentWithVocab(words: DataFrame, wCol: String,
                       merges: Seq[(String, String)]): DataFrame = {
    val mergeArr = merges.toArray
    val rank: Map[(String, String), Int] = mergeArr.zipWithIndex.toMap
    val seg = udf { (w: String) =>
      var syms = w.map(_.toString).toArray
      var done = syms.length < 2
      while (!done) {
        var best = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val (l, r) = mergeArr(best)
          val out = Array.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
              out += (l + r); j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
          done = syms.length < 2
        }
      }
      syms.toSeq
    }
    words.withColumn("syms", seg(col(wCol)))
  }

  /** Train `budget` merges over `words` (a (word, frequency) table;
    * rows must be distinct words). Returns the merge table
    * (step, lhs, rhs, n) in merge order — step 1-based, `n` the
    * corpus-weighted count of the pair when it was chosen. Stops early
    * (fewer than `budget` rows) if the corpus runs out of pairs. */
  def trainMerges(words: DataFrame, wCol: String, freqCol: String,
                  budget: Int, reliable: Boolean = false): DataFrame = {
    require(budget >= 1, s"merge budget must be positive, got $budget")
    val spark = words.sparkSession
    val sc = spark.sparkContext
    if (reliable && sc.getCheckpointDir.isEmpty) {
      // a driver-local temp dir is only a valid reliable-checkpoint
      // target when the executors share the driver's filesystem
      require(sc.isLocal,
        "trainMerges(reliable=true) on a non-local master needs " +
          "sc.setCheckpointDir on shared storage; a driver-local temp " +
          "dir is not visible to executors")
      sc.setCheckpointDir(java.nio.file.Files
        .createTempDirectory("graft_bpe_ckpt").toString)
    }
    def truncate(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()

    var seg = truncate(
      words.select(col(freqCol).cast("long").as("freq"),
          expr("transform(sequence(1, length(" + wCol + ")), " +
            "i -> substring(" + wCol + ", i, 1))").as("syms"))
        .filter(size(col("syms")) >= 2))

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    while (merges.length < budget && !exhausted) {
      val top = seg
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] as lhs, syms[i+1] as rhs))")).as("p"))
        .groupBy("p.lhs", "p.rhs").agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((merges.length + 1, l, r, n))
        seg = truncate(
          seg.withColumn("syms", mergeOnce(col("syms"), l, r))
            .filter(size(col("syms")) >= 2))
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("step", "lhs", "rhs", "n")
  }
}
