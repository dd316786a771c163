package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for distributive aggregates: fold a
  * signed changelog (insertions +1, retractions −1) into an existing
  * (count, sum) aggregate without recomputing from the base table —
  * at 100 TB the base aggregate is petabytes of history you never
  * re-scan; only the delta (today's partition, a CDC feed) is touched.
  *
  * Scale shape: the delta pre-aggregates per key (map-side combinable
  * signed sums), then one union + re-aggregate with the base — both
  * hash-shuffled on the same key, so co-partitioned/bucketed storage
  * makes the merge exchange-free (the q107 layout). Keys whose row
  * count reaches zero are dropped — the retraction-complete contract
  * (count < 0 means the delta retracted rows the base never had, which
  * is a data bug; fail loudly rather than emit nonsense).
  */
object Ivm {

  /** `base`: (key..., nCol, sumCol) — the standing aggregate.
    * `delta`: (key..., signCol ±1, valCol) — the changelog.
    * Returns the updated (key..., nCol, sumCol). */
  def applyAggDelta(base: DataFrame, delta: DataFrame, keyCols: Seq[String],
                    nCol: String, sumCol: String,
                    signCol: String, valCol: String): DataFrame = {
    val d = delta.groupBy(keyCols.map(col): _*)
      .agg(sum(col(signCol)).as(nCol),
           sum(col(signCol) * col(valCol)).as(sumCol))
    val merged = base.select((keyCols :+ nCol :+ sumCol).map(col): _*)
      .unionByName(d)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(nCol)).as(nCol), sum(col(sumCol)).as(sumCol))
    val guard = udf { (n: Long) =>
      require(n >= 0L,
        s"applyAggDelta: key count went negative ($n) — the delta " +
          "retracted rows the base aggregate never contained")
      n
    }
    merged.withColumn(nCol, guard(col(nCol))).filter(col(nCol) > 0)
  }

  /** CONTINUOUS IVM: drain a table's stored change feed as a stream and
    * fold every micro-batch's signed delta into a materialized
    * aggregate at `stateRoot` — the reference's watermark-poll refresh
    * loop (sql_search_incremental_dag.py:118-140) as one standing
    * query, and the streaming twin of the one-shot q170 fold.
    *
    * Restart-safe exactly-once: the state commit carries
    * (txnAppId=`appId`, txnVersion=batchId), so a batch REPLAYED after
    * a crash (the checkpoint's unresolved tail) recomputes against the
    * already-updated state but its commit is a no-op — micro-batch
    * slicing and failure points never change the rows (the q47/q135
    * discipline). `toDelta` maps a feed batch to the signed changelog
    * (key..., `signCol` ±1, `valCol`); state holds (key..., nCol,
    * sumCol).
    *
    * Scale shape: each batch touches O(delta) feed rows plus one
    * O(state) snapshot rewrite. The rewrite is the simple, always-
    * correct merge; at a 100 TB state the same loop swaps the
    * overwrite for a key-bucketed MERGE so a batch rewrites only the
    * buckets its keys land in — `toDelta` and the fold are unchanged. */
  def continuousAggMaintenance(
      spark: org.apache.spark.sql.SparkSession,
      feedRoot: String, stateRoot: String, checkpoint: String,
      keyCols: Seq[String], nCol: String, sumCol: String,
      toDelta: DataFrame => DataFrame, appId: String,
      startingVersion: Long = 1L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("graft-versioned")
      .option("changeFeed", "true")
      .option("startingVersion", startingVersion.toString)
      .load(feedRoot)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val base = s.read.format("graft-versioned").load(stateRoot)
        applyAggDelta(base, toDelta(batch), keyCols, nCol, sumCol,
            "sign", "v")
          .write.format("graft-versioned")
          .option("txnAppId", appId).option("txnVersion", batchId.toString)
          .mode("overwrite").save(stateRoot)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** CONTINUOUS IVM, O(changed groups) per micro-batch: the fold above
    * re-expressed as a MERGE INTO a merge-on-read state TABLE
    * (`deletionVectors=true`), so a batch touches only the groups its
    * delta names — matched groups update via deletion-vector sidecars
    * plus one small insert file, and every untouched state file
    * HARD-LINKS through to the new version (the overwrite variant's
    * read side AND write side are O(state); at a 10⁸-group
    * materialized view that is full-table rewrite amplification on a
    * standing query).
    *
    * Per batch: (1) the delta pre-aggregates per key — map-side
    * combinable, O(batch); (2) one MERGE joins it against state on the
    * keys, with the delta's key MIN/MAX pushed into the ON clause as a
    * null-safe range conjunct (Delta's dynamic file pruning for
    * MERGE): the clustered state scan file-prunes to the changed key
    * range, so the READ side shrinks with the batch too, not just the
    * write side; (3) groups whose count reaches zero DELETE (DV
    * positions), groups going negative raise (the
    * retraction-complete contract), new groups INSERT.
    *
    * Restart-safe exactly-once: the MERGE's state commit carries
    * (txnAppId=`appId`, txnVersion=batchId) through the session-conf
    * channel (SQL verbs take no write options), so a batch replayed
    * after a crash recomputes against the already-updated state but
    * its commit is a no-op — the same discipline as the overwrite
    * fold. `stateTable` is a catalog name (e.g. `graft.ns.mv_state`)
    * created with `deletionVectors=true` and clustered on the keys. */
  /** SQL literal for a delta-bounds value, or None for types without
    * an exact literal form (those keys just skip their conjunct —
    * correct, only less pruned). Temporal keys are the MOST common
    * real MV key (daily/hourly aggregates), so DATE/TIMESTAMP render
    * here; java.sql vs java.time shapes depend on the session's
    * datetime.java8API flag — cover both. `java.sql.Timestamp`
    * toString is JVM-local-zone = Spark's default session zone;
    * `Instant` renders with an explicit Z offset, which Spark's
    * literal parser honors — both round-trip exactly at micros. */
  private[graft] def boundsLiteral(v: Any): Option[String] = v match {
    case null => None
    case n: Byte => Some(n.toString)
    case n: Short => Some(n.toString)
    case n: Int => Some(n.toString)
    case n: Long => Some(n.toString + "L")
    case s: String => Some("'" + s.replace("'", "''") + "'")
    case d: java.sql.Date => Some(s"DATE'${d.toString}'")
    case d: java.time.LocalDate => Some(s"DATE'${d.toString}'")
    case t: java.sql.Timestamp => Some(s"TIMESTAMP'${t.toString}'")
    case t: java.time.Instant => Some(s"TIMESTAMP'${t.toString}'")
    case t: java.time.LocalDateTime =>
      Some(s"TIMESTAMP_NTZ'${t.toString.replace('T', ' ')}'")
    case _ => None // non-orderable-literal types: no conjunct
  }

  def continuousAggMaintenanceMerge(
      spark: org.apache.spark.sql.SparkSession,
      feedRoot: String, stateTable: String, checkpoint: String,
      keyCols: Seq[String], nCol: String, sumCol: String,
      toDelta: DataFrame => DataFrame, appId: String,
      startingVersion: Long = 1L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("graft-versioned")
      .option("changeFeed", "true")
      .option("startingVersion", startingVersion.toString)
      .load(feedRoot)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val view = s"__ivm_delta_${appId.replaceAll("[^A-Za-z0-9_]", "_")}"
        val delta = toDelta(batch)
          .groupBy(keyCols.map(col): _*)
          .agg(sum(col("sign")).as("__dn"),
               sum(col("sign") * col("v")).as("__dsum"))
          .cache()
        delta.createOrReplaceTempView(view)
        // DYNAMIC FILE PRUNING for the target scan (Delta's MERGE does
        // the same with source-key min/max): the join alone gives the
        // state scan no literal predicate, so without this the READ
        // side is O(state files) even though the write side is
        // O(changes). The delta's key bounds are a tiny driver read off
        // the cached aggregate; `t.k IS NULL OR t.k BETWEEN lo AND hi`
        // is semantics-preserving under the null-safe join (a non-null
        // target key outside the bounds can never <=>-match any delta
        // key, and null target keys stay joinable), and the pushed OR
        // prunes every clustered state file outside the changed range.
        val boundsConjuncts = keyCols.flatMap { k =>
          scala.util.Try {
            val r = delta.agg(min(col(k)), max(col(k))).collect()(0)
            for {
              lo <- boundsLiteral(r.get(0))
              hi <- boundsLiteral(r.get(1))
            } yield s"(t.$k IS NULL OR (t.$k >= $lo AND t.$k <= $hi))"
          }.toOption.flatten
        }
        val on = (keyCols.map(k => s"t.$k <=> d.$k") ++ boundsConjuncts)
          .mkString(" AND ")
        val insertCols = (keyCols :+ nCol :+ sumCol).mkString(", ")
        val insertVals = (keyCols.map("d." + _) :+
          // a not-matched key with a net-negative count retracted rows
          // the state never had — corruption, not data; fail loudly
          (s"CASE WHEN d.__dn < 0 THEN CAST(raise_error(" +
            "'continuousAggMaintenanceMerge: delta retracted rows of a " +
            "group the state never contained') AS BIGINT) " +
            "ELSE d.__dn END") :+ "d.__dsum").mkString(", ")
        s.conf.set("graft.versioned.txnAppId", appId)
        s.conf.set("graft.versioned.txnVersion", batchId.toString)
        try s.sql(
          s"""MERGE INTO $stateTable t USING $view d ON $on
             |WHEN MATCHED AND t.$nCol + d.__dn = 0 THEN DELETE
             |WHEN MATCHED AND t.$nCol + d.__dn < 0 THEN UPDATE SET
             |  $nCol = CAST(raise_error(
             |    'continuousAggMaintenanceMerge: group count went negative — the delta retracted rows the state aggregate never contained') AS BIGINT)
             |WHEN MATCHED THEN UPDATE SET
             |  $nCol = t.$nCol + d.__dn, $sumCol = t.$sumCol + d.__dsum
             |WHEN NOT MATCHED AND d.__dn != 0 THEN
             |  INSERT ($insertCols) VALUES ($insertVals)""".stripMargin)
        finally {
          s.conf.unset("graft.versioned.txnAppId")
          s.conf.unset("graft.versioned.txnVersion")
          delta.unpersist()
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
