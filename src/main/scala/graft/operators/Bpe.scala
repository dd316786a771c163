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
    * (fewer than `budget` rows) if the corpus runs out of pairs.
    *
    * `batch` > 1 enables BATCHED merge rounds — the production form: a
    * real tokenizer budget is ~30k merges, and one Spark job per merge
    * dies on the merge-count axis long before data size matters. Per
    * round we collect the top-K pair list ONCE, accept a prefix of it
    * driver-side under rules that make the batch provably identical to
    * replaying the sequential greedy recurrence (see
    * [[selectBatch]]), and apply all accepted merges in ONE pass
    * (chained [[mergeOnce]] — the exact per-word semantics of the
    * sequential path, just fused into one job). Job count drops from
    * 2·budget to 2·rounds. `batch = 1` IS the sequential recurrence;
    * BpeSpec proves batch=16 reproduces it exactly at budget 64. */
  def trainMerges(words: DataFrame, wCol: String, freqCol: String,
                  budget: Int, reliable: Boolean = false,
                  batch: Int = 16): DataFrame = {
    require(budget >= 1, s"merge budget must be positive, got $budget")
    require(batch >= 1, s"merge batch must be positive, got $batch")
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
      val cap = math.min(batch, budget - merges.length)
      val k = math.max(4 * cap, 16)
      val top = seg
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] as lhs, syms[i+1] as rhs))")).as("p"))
        .groupBy("p.lhs", "p.rhs").agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("lhs").asc, col("rhs").asc)
        .limit(k).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        val accepted = selectBatch(top, complete = top.length < k, cap,
          priorOutputs = merges.iterator.map(m => m._2 + m._3).toSet)
        accepted.foreach { case (l, r, n) =>
          merges += ((merges.length + 1, l, r, n))
        }
        seg = truncate(
          accepted.foldLeft(seg) { case (df, (l, r, _)) =>
            df.withColumn("syms", mergeOnce(col("syms"), l, r))
          }.filter(size(col("syms")) >= 2))
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("step", "lhs", "rhs", "n")
  }

  /** Train `budget` merges with DELTA-MAINTAINED pair counts — the
    * production merge loop. The only corpus-scale pass is the word
    * COUNT that produced `words` (the classic heavy-hitters reduction:
    * even at 100 TB the distinct-word frame is vocabulary-bounded);
    * this trainer collects that bounded frame ONCE (guarded by
    * `maxVocab` — loud failure, never a silent truncation, because a
    * truncated vocabulary changes merge counts) and then runs the
    * exact greedy recurrence in memory: a lazy priority queue over
    * (count desc, lhs asc, rhs asc) and, per merge, a re-count of only
    * the words CONTAINING the merged pair (tracked by an inverted
    * pair→words index). 30k merges cost milliseconds of driver time
    * after ONE Spark job, where the per-merge-job loop pays ~60k
    * driver round trips.
    *
    * Why not distribute the loop itself? [[trainMerges]]' batched
    * rounds are provably sequential-exact but on a Zipfian corpus the
    * top pairs share symbols (th/he/er...), so exact batches stay
    * small and the job count stays ∝ budget. Every published
    * large-corpus tokenizer recipe ends exactly here: distribute the
    * counting, train the merge table on the weighted vocabulary.
    * Identical output to [[trainMerges]] (BpeSpec pins it at
    * budget 64); same early stop when the corpus runs out of pairs. */
  def trainMergesDelta(words: DataFrame, wCol: String, freqCol: String,
                       budget: Int, maxVocab: Int = 50000000): DataFrame = {
    require(budget >= 1, s"merge budget must be positive, got $budget")
    val spark = words.sparkSession
    val rows = words.select(col(wCol).cast("string"), col(freqCol).cast("long"))
      .filter(length(col(wCol)) >= 2)
      .limit(maxVocab + 1)
      .collect()
    require(rows.length <= maxVocab,
      s"vocabulary exceeds maxVocab=$maxVocab; raise the cap (driver " +
        "memory permitting) or use trainMerges' distributed loop — a " +
        "truncated vocabulary would silently change merge counts")
    val segs = rows.map(r => r.getString(0).map(_.toString).toArray)
    val freqs = rows.map(_.getLong(1))

    def pairsOf(syms: Array[String]): Iterator[(String, String)] =
      if (syms.length < 2) Iterator.empty
      else (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1)))

    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    val index = scala.collection.mutable.Map
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    segs.indices.foreach { wi =>
      pairsOf(segs(wi)).foreach { p =>
        counts(p) = counts.getOrElse(p, 0L) + freqs(wi)
        index.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += wi
      }
    }
    // lazy PQ: stale entries are skipped when their count disagrees
    implicit val ord: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering.Long, Ordering.String.reverse, Ordering.String.reverse)
    val pq = scala.collection.mutable.PriorityQueue
      .empty[(Long, String, String)]
    counts.foreach { case ((l, r), n) => pq.enqueue((n, l, r)) }

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var done = false
    while (merges.length < budget && !done) {
      var head: Option[(String, String, Long)] = None
      while (head.isEmpty && pq.nonEmpty) {
        val (n, l, r) = pq.dequeue()
        if (counts.get((l, r)).contains(n) && n > 0) head = Some((l, r, n))
      }
      head match {
        case None => done = true
        case Some((l, r, n)) =>
          merges += ((merges.length + 1, l, r, n))
          val affected = index.getOrElse((l, r), scala.collection.mutable.Set.empty[Int])
          val changed = scala.collection.mutable.Set.empty[(String, String)]
          affected.toArray.foreach { wi =>
            val before = segs(wi)
            // exact per-word delta: remove old pair multiset, re-merge
            // (leftmost-greedy, run parity included), add the new one
            pairsOf(before).foreach { p =>
              val c = counts(p) - freqs(wi)
              if (c == 0L) counts.remove(p) else counts(p) = c
              index.get(p).foreach(_ -= wi)
              changed += p
            }
            val out = Array.newBuilder[String]
            var i = 0
            while (i < before.length) {
              if (i + 1 < before.length && before(i) == l && before(i + 1) == r) {
                out += (l + r); i += 2
              } else { out += before(i); i += 1 }
            }
            val after = out.result()
            segs(wi) = after
            pairsOf(after).foreach { p =>
              counts(p) = counts.getOrElse(p, 0L) + freqs(wi)
              index.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += wi
              changed += p
            }
          }
          // one fresh PQ entry per changed pair — entries at any other
          // count are stale and skipped on dequeue (lazy deletion);
          // this covers decrease-only pairs surviving in unaffected
          // words, whose old entries are all stale-high
          changed.foreach { p =>
            counts.get(p).foreach(c => pq.enqueue((c, p._1, p._2)))
          }
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("step", "lhs", "rhs", "n")
  }

  /** Driver-side batch selection over one round's sorted pair list
    * (count desc, lhs asc, rhs asc — the greedy tie-break order).
    * Accepts a PREFIX of the list such that replaying the accepted
    * merges one at a time lands on exactly these pairs with exactly
    * these counts — i.e. batched == sequential greedy, provably:
    *
    *  - Stop at the first pair sharing any symbol — lhs, rhs, or the
    *    concatenated output — with an accepted pair. Accepted pairs are
    *    then mutually disjoint even w.r.t. created symbols, so each
    *    accepted pair's count is UNCHANGED by the others' merges, and
    *    no two accepted merges feed the same new symbol.
    *  - Stop (without accepting) at any pair whose concat equals an
    *    EARLIER round's output: merging it would alias an existing
    *    symbol, whose surrounding pair counts could then increase —
    *    such a pair opens its own round instead (a single merge is
    *    always sequential-exact).
    *  - Trim trailing acceptances whose count does not STRICTLY exceed
    *    the stopping pair's count. Every excluded old pair sits at or
    *    after the stop in sorted order (count ≤ stop), old pairs never
    *    gain count from disjoint merges, and a new pair (x, lr) has
    *    count ≤ the pre-count of (x, l), which conflicts and therefore
    *    also sits at or after the stop — so with the strict bound no
    *    excluded or created pair can tie or beat a later batch member
    *    at its sequential turn. The head pair needs no bound (it is the
    *    global argmax under the exact tie-break).
    *
    * `complete` marks that the list holds ALL pairs (no trim bound
    * needed when the scan exhausts it); otherwise the last collected
    * count bounds everything uncollected. */
  private[operators] def selectBatch(
      top: Array[(String, String, Long)], complete: Boolean, cap: Int,
      priorOutputs: Set[String]): Seq[(String, String, Long)] = {
    val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    val taken = scala.collection.mutable.Set.empty[String]
    var bound: Option[Long] = None
    var i = 0
    var open = true
    while (open && i < top.length && accepted.length < cap) {
      val (l, r, n) = top(i)
      val aliases = priorOutputs.contains(l + r)
      if (accepted.isEmpty) {
        accepted += top(i); taken ++= Seq(l, r, l + r)
        // an alias-creating head can perturb counts of pairs around the
        // aliased symbol by MORE than the stop bound — close at size 1
        if (aliases) open = false
      } else if (taken(l) || taken(r) || taken(l + r) || aliases) {
        bound = Some(n); open = false
      } else {
        accepted += top(i); taken ++= Seq(l, r, l + r)
      }
      i += 1
    }
    if (open && accepted.length == cap && i < top.length)
      bound = Some(top(i)._3)
    else if (open && !complete && i == top.length && top.nonEmpty)
      bound = Some(top(top.length - 1)._3)
    bound.foreach { b =>
      while (accepted.length > 1 && accepted.last._3 <= b)
        accepted.remove(accepted.length - 1)
    }
    accepted.toSeq
  }
}
