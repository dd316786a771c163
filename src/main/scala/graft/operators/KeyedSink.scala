package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Idempotent keyed ingestion — the Spark-native replacement for the
  * reference's two-tier dedup: RedisBloom approximate pre-filter at the
  * crawler (redis_utils.py:17-32, divar_crawler.py:143-150) + exact
  * unique-index insert-if-absent at the Mongo sink
  * (mongodb_utils.py:5-44).
  *
  * At 100 TB the pattern is: (1) broadcast a Bloom sketch of seen keys to
  * cheaply drop the bulk of duplicates without a shuffle, (2) finish with
  * an exact left-anti join (shuffle only the surviving minority), (3)
  * append. Applying the sink twice is a no-op (S11 idempotence).
  */
object KeyedSink {

  /** Rows of `incoming` whose key is absent from `existing` — exact
    * dedup, skipping null keys exactly like the reference sink
    * (mongodb_utils.py:24-26). Within-batch duplicates keep one row. */
  def newRowsOnly(existing: DataFrame, incoming: DataFrame, key: String): DataFrame =
    incoming
      .filter(col(key).isNotNull)
      .dropDuplicates(key)
      .join(existing.select(key), Seq(key), "left_anti")

  /** Insert-if-absent: existing ∪ (new rows only). Idempotent. */
  def upsertAbsent(existing: DataFrame, incoming: DataFrame, key: String): DataFrame =
    existing.unionByName(newRowsOnly(existing, incoming, key))

  /** ST3: build the Bloom sketch of seen keys (the reference's daily
    * Mongo→RedisBloom rebuild, mongo_to_bf_dag.py:38-106; same defaults:
    * 1e6 capacity, 5% FPR). */
  def buildBloom(existing: DataFrame, key: String,
                 expectedItems: Long = 1000000L, fpp: Double = 0.05): BloomFilter =
    existing.filter(col(key).isNotNull)
      .stat.bloomFilter(key, expectedItems, fpp)

  /** Persist the Bloom sketch across runs — the reference keeps its
    * sketch resident in Redis between crawler runs
    * (divar_crawler.py:20-22, mongo_to_bf_dag.py:38-106); here the
    * sketch serializes to a checkpoint file (write-then-atomic-rename so
    * a crashed writer never leaves a torn sketch for the next run). */
  def saveBloom(bloom: BloomFilter, path: java.nio.file.Path): Unit = {
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    java.nio.file.Files.createDirectories(path.toAbsolutePath.getParent)
    val out = java.nio.file.Files.newOutputStream(tmp)
    try bloom.writeTo(out) finally out.close()
    java.nio.file.Files.move(tmp, path,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Load a sketch persisted by [[saveBloom]] — the cross-run half of
    * the reference's Redis-resident Bloom lifecycle. */
  def loadBloom(path: java.nio.file.Path): BloomFilter = {
    val in = java.nio.file.Files.newInputStream(path)
    try BloomFilter.readFrom(in) finally in.close()
  }

  /** Approximate pre-filter: drop rows whose key the sketch has
    * definitely not seen ... keep "mightContain" rows for the exact
    * check. Returns (definitelyNew, needExactCheck) — the reference's
    * new/duplicate partition split (redis_utils.py:27-28) in one pass.
    */
  def bloomSplit(incoming: DataFrame, key: String, bloom: BloomFilter)
      : (DataFrame, DataFrame) = {
    val spark = incoming.sparkSession
    val bc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((k: String) => k != null && bc.value.mightContainString(k))
    val flagged = incoming.withColumn("__seen", mightContain(col(key).cast("string")))
    (flagged.filter(!col("__seen")).drop("__seen"),
     flagged.filter(col("__seen")).drop("__seen"))
  }

  /** Full two-tier pipeline: Bloom pre-filter + exact anti-join on the
    * survivors only (the minority), then union — the scale-correct
    * version of crawler-check + sink-check. */
  def dedupTwoTier(existing: DataFrame, incoming: DataFrame, key: String,
                   bloom: BloomFilter): DataFrame = {
    val pruned = incoming.filter(col(key).isNotNull).dropDuplicates(key)
    val (fresh, suspect) = bloomSplit(pruned, key, bloom)
    // Bloom false positives make `suspect` over-approximate; the exact
    // anti-join keeps correctness. `fresh` needs no shuffle at all.
    fresh.unionByName(suspect.join(existing.select(key), Seq(key), "left_anti"))
  }

  /** P10: delete-by-predicate as a filtered overwrite
    * (del_unuse_record_in_mrestate.py:17-19). */
  def deleteWhere(table: DataFrame, predicate: org.apache.spark.sql.Column): DataFrame =
    table.filter(!coalesce(predicate, lit(false)))

  /** The full MERGE INTO shape — update-matched / insert-unmatched /
    * delete-flagged in ONE pass, the lakehouse CDC-apply contract that
    * generalizes [[upsertAbsent]] (insert-only) and [[deleteWhere]]
    * (delete-only). `changes` carries the key, an `op` column
    * (`"upsert"` or `"delete"`) and the replacement payload columns
    * (same names as in `state`). Exactly one change row per key —
    * enforced loudly, because MERGE on an ambiguous source is
    * nondeterministic by definition (the same rule Delta/Iceberg
    * enforce at runtime).
    *
    * Scale shape: one full-outer equi-join on the key (both sides
    * shuffle-partitioned on it; AQE broadcasts a small change set),
    * then a row-local CASE. The duplicate guard is a per-key window
    * count on the change side feeding a `raise_error` guard expression:
    * the window's required hash-partitioning on the key is exactly the
    * join's, so the guard rides the SAME exchange — no separate
    * pre-scan job, and the error (raised at action time, as all
    * distributed validation must be) names the offending key.
    */
  def mergeInto(state: DataFrame, changes: DataFrame, key: String,
                opCol: String, payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nk = count(lit(1)).over(Window.partitionBy(key))
    val guardedOp = when(nk > lit(1L), raise_error(concat(
        lit(s"mergeInto: multiple change rows share a $key — MERGE " +
          s"semantics require one source row per key ($key="),
        col(key).cast("string"), lit(")"))).cast("string"))
      .otherwise(col(opCol))
    val s = state.select((key +: payloadCols).map(col): _*)
    val c = changes.select((Seq(key, opCol) ++ payloadCols.map(n => s"__c_$n"))
      .zip(Seq(col(key), guardedOp) ++ payloadCols.map(col))
      .map { case (n, e) => e.as(n) }: _*)
    s.join(c, Seq(key), "full_outer")
      .filter(coalesce(col(opCol) =!= "delete", lit(true))) // keep non-change rows
      .select(col(key) +: payloadCols.map { n =>
        when(col(opCol) === "upsert", col(s"__c_$n")).otherwise(col(n)).as(n)
      }: _*)
  }
}
