package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.VectorExpressions.dot_long

/** SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
  * the embedding space with the deterministic coarse quantizer
  * ([[Ann.buildCentroids]]), compare ONLY within a cluster, and drop
  * every member that has a lower-id cell-mate with cosine over the
  * threshold. Keeps exactly one representative (the lowest id) per
  * near-duplicate neighborhood that a cluster contains.
  *
  * This is the embedding analogue of the MinHash-band (t34) and
  * dHash-band (t48) dedup decisions: candidate generation is scoped by
  * the cluster id, so pair work is bounded by Σ|cell|² instead of
  * |corpus|² — and, unlike a pair self-join, NO pair rows are ever
  * materialized or exchanged. The verdict runs per cell inside one
  * `flatMapGroups` pass: members sorted by id, each member scans its
  * lower-id cell-mates and stops at the FIRST one over the threshold.
  * The early exit is what survives a monoculture corpus: in a cell of
  * near-identical vectors every member's first probe clears the
  * threshold, so the cell costs O(|cell|) comparisons, not |cell|²/2 —
  * the shape a pair join cannot have. At 100 TB, k scales with the
  * corpus to keep cells bounded (SemDeDup's own recipe); a cell is one
  * group in a single hash-partition shuffle on centroid_id.
  *
  * Cosine runs on exact integer dots/norms (bit-identical across
  * engines); ties and drop choices are deterministic by id.
  */
object SemDedup {

  /** Tag every vector with its cluster and a `kept` verdict:
    * (vec_id, centroid_id, kept). `cosE6` is the near-dup threshold in
    * millionths (e.g. 300000 = cosine 0.30); must be positive.
    *
    * `maxCell` bounds PER-TASK MEMORY, not correctness: cells within
    * the bound run the early-exit in-memory pass above; a cell PAST the
    * bound is auto-decomposed into id-ordered blocks of `maxCell`/2 and
    * evaluated block-pair-wise (every (lower, upper) block pair is one
    * group holding ≤ maxCell members), then per-id verdicts OR-fold.
    * The verdict predicate — "∃ lower id in-cell with cos ≥ τ" — is
    * pairwise, so the decomposition is EXACT: keep/drop is identical at
    * every maxCell setting (SemDedupSpec pins this on a monoculture).
    * A vector-space secondary split could not guarantee that — a true
    * monoculture never separates under a finer quantizer, and any
    * separation it did achieve would change verdicts. The trade is
    * memory for compute: an s×-oversized cell costs O(s²) block pairs
    * — SemDeDup's own k-scaling recipe remains the first-line answer;
    * the split is the graceful-degradation path that replaces round 8's
    * loud stop. `idCol` must be an integral column (the verdict orders
    * and tie-breaks by exact id); anything else fails analysis here
    * with a clear error rather than deep inside the encoder. */
  def dedup(embeddings: DataFrame, idCol: String, vecCol: String,
            k: Int, cosE6: Long, maxCell: Int = 1 << 20): DataFrame = {
    require(cosE6 > 0, s"cosE6 threshold must be positive, got $cosE6")
    require(maxCell > 1, s"maxCell must be at least 2, got $maxCell")
    val idType = embeddings.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(idType.typeName),
      s"SemDedup.dedup needs an integral id column; '$idCol' is " +
        s"${idType.typeName} — cast it to bigint first (verdicts order " +
        "and tie-break by exact id)")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val withLongId = embeddings.withColumn(idCol, col(idCol).cast("long"))
    val index = indexOf(withLongId, idCol, vecCol, k)

    // The tiny (id, cell, kept, overflow) pass-1 output is
    // localCheckpoint'd so the common case costs exactly ONE assignment
    // scan — no separate cell-size job — and the ≤k overflowing cells
    // are re-read only on the rare degraded run.
    val first = verdictPass(index, idCol, cosE6, maxCell).localCheckpoint()

    // ≤ k cell ids — bounded collect off the checkpoint, no rescan
    val bigCells = first.filter(col("overflow"))
      .select("centroid_id").distinct().collect().map(_.getLong(0))
    if (bigCells.isEmpty) return first.drop("overflow")

    val small = first.filter(!col("overflow")).drop("overflow")

    // split path: id-ordered blocks of maxCell/2; a member's verdict is
    // the OR over its (lower-block, own-block) pair groups
    val blockSize = maxCell / 2
    val w = Window.partitionBy("centroid_id").orderBy("vid")
    // localCheckpoint: `index` is an uncached lineage ending in the full
    // centroid build + assignment scan; without it the degraded path
    // would re-run that most-expensive job for EACH of the two
    // consumers below (lowers and uppers both scan `blocked`)
    val blocked = index
      .filter(col("centroid_id").isin(bigCells.map(Long.box): _*))
      .localCheckpoint()
      .withColumn("rn", row_number().over(w))
      .withColumn("cell_n",
        max("rn").over(Window.partitionBy("centroid_id")))
      .withColumn("blk", expr(s"CAST((rn - 1) div $blockSize AS BIGINT)"))
      .withColumn("nblk",
        expr(s"CAST((cell_n + $blockSize - 1) div $blockSize AS BIGINT)"))
    // each block serves as the LOWER side for pairs (blk, blk..nblk-1)
    // and as the UPPER side for pairs (0..blk, blk)
    val lowers = blocked
      .withColumn("j", explode(expr("sequence(blk, nblk - 1)")))
      .select(col("centroid_id"), col("blk").as("i"), col("j"),
        lit(true).as("isLower"), col("vid"), col("v"), col("n2"))
    val uppers = blocked
      .withColumn("i", explode(expr("sequence(CAST(0 AS BIGINT), blk)")))
      .select(col("centroid_id"), col("i"), col("blk").as("j"),
        lit(false).as("isLower"), col("vid"), col("v"), col("n2"))
    val big = lowers.unionByName(uppers)
      .as[(Long, Long, Long, Boolean, Long, Array[Long], Long)]
      .groupByKey(t => (t._1, t._2, t._3))
      .flatMapGroups { (key: (Long, Long, Long),
                        it: Iterator[(Long, Long, Long, Boolean, Long, Array[Long], Long)]) =>
        val cell = key._1
        val lows = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long], Long)]
        val ups = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long], Long)]
        it.foreach { case (_, _, _, isLower, vid, v, n2) =>
          (if (isLower) lows else ups) += ((vid, v, n2))
        }
        val lowArr = lows.toArray.sortBy(_._1)
        val lowNorms = lowArr.map(m => math.sqrt(m._3.toDouble))
        ups.iterator.map { case (vid, vb, n2) =>
          val nb = math.sqrt(n2.toDouble)
          var dropped = false
          var ai = 0
          // lowArr ascending by vid: stop once ids reach ours
          while (!dropped && ai < lowArr.length && lowArr(ai)._1 < vid) {
            if (cosHit(lowArr(ai)._2, vb, lowNorms(ai), nb, cosE6))
              dropped = true
            ai += 1
          }
          (vid, cell, dropped)
        }
      }
      .toDF(idCol, "centroid_id", "pair_dropped")
      .groupBy(idCol, "centroid_id")
      .agg(max("pair_dropped").as("dropped"))
      .select(col(idCol), col("centroid_id"), (!col("dropped")).as("kept"))

    small.unionByName(big)
  }

  /** INCREMENTAL SemDeDup — the ingestion form: the existing corpus's
    * per-cell index (ALL members, kept or dropped — the pairwise rule
    * compares against any lower-id cell-mate) and its centroids are
    * STATE; a new batch whose ids sit strictly above the corpus ids is
    * assigned to the stored centroids (O(batch·k), no re-cluster) and
    * verdicts are scored for the NEW members only — old members serve
    * as mates, never re-scored. Identical decisions to running the
    * full dedup over old ∪ new with the same centroids and keeping the
    * new rows. Oversized cells fail loudly (re-shard with a larger k
    * via the full path — an incremental insert must not silently
    * degrade into the block decomposition's cost).
    *
    * Returns (idCol, centroid_id, kept) for the new batch. */
  def dedupIncremental(storedIndex: DataFrame, storedCentroids: DataFrame,
                       newBatch: DataFrame, idCol: String, vecCol: String,
                       cosE6: Long, maxCell: Int = 1 << 20): DataFrame = {
    require(cosE6 > 0, s"cosE6 threshold must be positive, got $cosE6")
    val withLongId = newBatch.withColumn(idCol, col(idCol).cast("long"))
    val newIdx = Ann.buildIndex(withLongId, idCol, vecCol, storedCentroids)
      .withColumn("n2", dot_long(col("v"), col("v")))
      .select(col("centroid_id"), col("vid"), col("v"), col("n2"))
    val minNew = withLongId.agg(min(col(idCol))).collect()(0)
    if (minNew.isNullAt(0)) return newBatch.sparkSession.emptyDataFrame
    val from = minNew.getLong(0)
    // localCheckpoint: the overflow probe below would otherwise re-run
    // the whole assignment + verdict lineage when the caller consumes
    // the result (the same once-only discipline as dedup's first pass)
    val verdicts = verdictPass(storedIndex.unionByName(newIdx), idCol,
      cosE6, maxCell, scoreFrom = from).localCheckpoint()
    val overflowing = verdicts.filter(col("overflow")).limit(1).count()
    require(overflowing == 0,
      "SemDedup.dedupIncremental: a cell exceeded maxCell — re-cluster " +
        "with a larger k (full dedup path) instead of degrading the " +
        "incremental insert")
    verdicts.drop("overflow")
  }

  /** The quantized per-cell index (centroid_id, vid, v, n2) the verdict
    * passes run over. */
  private[graft] def indexOf(withLongId: DataFrame, idCol: String,
                             vecCol: String, k: Int): DataFrame =
    Ann.buildIndex(withLongId, idCol, vecCol,
        Ann.buildCentroids(withLongId, idCol, vecCol, k))
      .withColumn("n2", dot_long(col("v"), col("v")))
      .select(col("centroid_id"), col("vid"), col("v"), col("n2"))

  /** OPTIMISTIC single pass — the plan-choice probe IS the verdict
    * pass: cells within maxCell emit final verdicts; an oversized cell
    * stops buffering at the bound and flags every member `overflow`
    * instead (per-task memory stays ≤ maxCell+1 members). Lazy — the
    * caller checkpoints; PlanSpec pins this plan's shape (one
    * MapGroups, no pair self-join, bounded shuffles). */
  private[graft] def verdictPass(index: DataFrame, idCol: String,
                                 cosE6: Long, maxCell: Int,
                                 scoreFrom: Long = Long.MinValue): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    index
      .as[(Long, Long, Array[Long], Long)]
      .groupByKey(_._1)
      .flatMapGroups { (cell, it) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long], Long)]
        var overflowed = false
        while (it.hasNext && !overflowed) {
          buf += { val (_, vid, v, n2) = it.next(); (vid, v, n2) }
          if (buf.length > maxCell) overflowed = true
        }
        if (overflowed) {
          // drain: every member of this cell defers to the block path
          (buf.iterator.map(_._1) ++ it.map(_._2))
            .map(vid => (vid, cell, false, true))
        } else {
          val members = buf.toArray.sortBy(_._1)
          val norms = members.map(m => math.sqrt(m._3.toDouble))
          // members below scoreFrom are MATES only (the incremental
          // path's already-committed corpus) — never re-scored
          Iterator.tabulate(members.length) { bi =>
            val (vid, vb, _) = members(bi)
            if (vid < scoreFrom) null
            else {
              var dropped = false
              var ai = 0
              while (!dropped && ai < bi) {
                if (cosHit(members(ai)._2, vb, norms(ai), norms(bi), cosE6))
                  dropped = true
                ai += 1
              }
              (vid, cell, !dropped, false)
            }
          }.filter(_ != null)
        }
      }
      .toDF(idCol, "centroid_id", "kept", "overflow")
  }

  /** Same arithmetic as the column form: exact integer dot, then one
    * double divide and a half-up round to millionths. */
  private def cosHit(va: Array[Long], vb: Array[Long],
                     na: Double, nb: Double, cosE6: Long): Boolean = {
    var dot = 0L
    var i = 0
    while (i < vb.length) { dot += va(i) * vb(i); i += 1 }
    math.round(dot * 1000000.0 / (na * nb)) >= cosE6
  }

  /** SEMANTIC EVAL-SET DECONTAMINATION — the embedding-space twin of
    * the exact-substring decontaminator (TextDedup.substrDecontaminate):
    * before training, every corpus document whose embedding sits
    * within cosine `tauE6` of ANY benchmark/eval vector is flagged
    * (paraphrased eval leakage that no string match catches). Scale
    * shape: the EVAL side is a benchmark set — thousands of rows — so
    * it BROADCASTS and the corpus side stays one distributed scan
    * (corpus × eval, never corpus × corpus); per-doc output is the max
    * eval cosine, exact to the quantization (integer dots + one
    * double divide + half-up round, v36's pinned shape). Returns
    * (idCol, max_cos_e6, contaminated). */
  def evalDecontaminate(corpus: DataFrame, idCol: String, vecCol: String,
                        eval: DataFrame, evalVecCol: String,
                        tauE6: Long): DataFrame = {
    import graft.plans.VectorExpressions.quantize_e6
    val c = corpus.select(col(idCol), quantize_e6(col(vecCol)).as("__v"))
      .withColumn("__n2", dot_long(col("__v"), col("__v")))
    val e = eval.select(quantize_e6(col(evalVecCol)).as("__ev"))
      .withColumn("__en2", dot_long(col("__ev"), col("__ev")))
    c.join(broadcast(e))
      .select(col(idCol),
        round(dot_long(col("__v"), col("__ev")) * lit(1000000.0) /
            (sqrt(col("__n2").cast("double")) *
              sqrt(col("__en2").cast("double"))))
          .cast("long").as("__cos"))
      .groupBy(col(idCol))
      .agg(max(col("__cos")).as("max_cos_e6"))
      .withColumn("contaminated", col("max_cos_e6") >= tauE6)
  }
}
