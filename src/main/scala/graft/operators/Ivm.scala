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

  /** CONTINUOUS MIN/MAX MAINTENANCE by DIRTY-GROUP PARTIAL RECOMPUTE —
    * the IVM strategy for NON-retractable aggregates. A signed fold
    * (the sum/count machinery above) cannot maintain MIN/MAX under
    * deletes: retracting the current minimum says nothing about the
    * runner-up. The textbook answer (and Materialize/DBSP's
    * reduction): per batch, recompute ONLY the groups the batch
    * touched, from the source snapshot the batch corresponds to.
    *
    * Per batch: (1) the dirty key set = the batch's distinct keys —
    * O(changes), collected bounds drive file pruning; (2) the source
    * snapshot AS OF the batch's last commit is scanned WITH the
    * dirty-key bounds pushed (`k IS NULL OR k BETWEEN lo AND hi` —
    * the clustered source file-prunes to the touched range) and
    * semi-joined to the dirty set (broadcast — dirty keys are
    * change-sized); (3) one MERGE writes the recomputed groups:
    * vanished groups DELETE, changed groups UPDATE, new groups
    * INSERT — merge-on-read, so the state write is O(changed groups)
    * too. Batch cost: O(dirty groups' source rows), never O(source)
    * or O(state).
    *
    * Exactly-once like the fold: (txnAppId=`appId`,
    * txnVersion=batchId) makes replayed MERGEs no-ops. `stateTable`
    * holds (key..., minCol, maxCol, nCol), created with
    * `deletionVectors=true` and clustered on the keys; `srcRoot` is
    * the versioned SOURCE whose stored change feed drives the
    * stream. */
  def continuousMinMaxMaintenance(
      spark: org.apache.spark.sql.SparkSession,
      srcRoot: String, stateTable: String, checkpoint: String,
      keyCols: Seq[String], valCol: String,
      minCol: String, maxCol: String, nCol: String,
      toDirty: DataFrame => DataFrame, appId: String,
      startingVersion: Long = 1L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("graft-versioned")
      .option("changeFeed", "true")
      .option("startingVersion", startingVersion.toString)
      .load(srcRoot)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val view = s"__mv_dirty_${appId.replaceAll("[^A-Za-z0-9_]", "_")}"
        // `toDirty` maps a feed batch to its touched KEY rows (the
        // toDelta convention) — a changed row dirties both its old and
        // new group, so the caller unions new_/old_ key columns
        val dirty = toDirty(batch).select(keyCols.map(col): _*)
          .distinct().cache()
        try {
          if (dirty.limit(1).count() > 0L) {
            // the snapshot this batch's changes land the source AT —
            // deterministic under replay (commit_version rides the feed)
            val asOf = batch.agg(max(col("commit_version"))).collect()(0)
              .getLong(0)
            val src = s.read.format("graft-versioned")
              .option("versionAsOf", asOf.toString).load(srcRoot)
            // dirty-key bounds push into the source scan (file pruning
            // over the clustered layout); the exact dirty set applies
            // via the broadcast semi-join
            val bounded = keyCols.foldLeft(src) { (d, k) =>
              val r = dirty.agg(min(col(k)), max(col(k))).collect()(0)
              (boundsLiteral(r.get(0)), boundsLiteral(r.get(1))) match {
                case (Some(lo), Some(hi)) =>
                  d.filter(expr(s"$k IS NULL OR ($k >= $lo AND $k <= $hi)"))
                case _ => d
              }
            }
            // both joins are NULL-SAFE (`<=>`), matching the MERGE ON
            // below: NULL is a legal group key (the source bounds
            // filter deliberately keeps `k IS NULL` rows), and a
            // null-unsafe semi/left join would never recompute a
            // NULL-keyed dirty group — __n would stay NULL and the
            // MERGE would DELETE the NULL-key state group while source
            // rows for it remain. Key columns are prefix-renamed per
            // side so the conditions stay unambiguous.
            val dirtyK = dirty.select(
              keyCols.map(k => col(k).as(s"__dk_$k")): _*)
            val recomputed = bounded
              .join(broadcast(dirtyK),
                keyCols.map(k => col(k) <=> col(s"__dk_$k")).reduce(_ && _),
                "left_semi")
              .groupBy(keyCols.map(col): _*)
              .agg(min(col(valCol)).as("__mn"), max(col(valCol)).as("__mx"),
                count(col(valCol)).as("__n"))
            val recomputedK = keyCols.foldLeft(recomputed) { (d, k) =>
              d.withColumnRenamed(k, s"__rk_$k") }
            dirty.join(recomputedK,
                keyCols.map(k => col(k) <=> col(s"__rk_$k")).reduce(_ && _),
                "left")
              .select((keyCols.map(col) ++
                Seq(col("__mn"), col("__mx"), col("__n"))): _*)
              .createOrReplaceTempView(view)
            val on = keyCols.map(k => s"t.$k <=> d.$k").mkString(" AND ")
            val insertCols = (keyCols :+ minCol :+ maxCol :+ nCol)
              .mkString(", ")
            val insertVals = (keyCols.map("d." + _) ++
              Seq("d.__mn", "d.__mx", "d.__n")).mkString(", ")
            s.conf.set("graft.versioned.txnAppId", appId)
            s.conf.set("graft.versioned.txnVersion", batchId.toString)
            try s.sql(
              s"""MERGE INTO $stateTable t USING $view d ON $on
                 |WHEN MATCHED AND d.__n IS NULL THEN DELETE
                 |WHEN MATCHED THEN UPDATE SET
                 |  $minCol = d.__mn, $maxCol = d.__mx, $nCol = d.__n
                 |WHEN NOT MATCHED AND d.__n IS NOT NULL THEN
                 |  INSERT ($insertCols) VALUES ($insertVals)""".stripMargin)
            finally {
              s.conf.unset("graft.versioned.txnAppId")
              s.conf.unset("graft.versioned.txnVersion")
            }
          }
        } finally { dirty.unpersist(); () }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** SQL literal for a delta-bounds value, or None for types without
    * an exact literal form (those keys just skip their conjunct —
    * correct, only less pruned). Temporal keys are the MOST common
    * real MV key (daily/hourly aggregates), so DATE/TIMESTAMP render
    * here; java.sql vs java.time shapes depend on the session's
    * datetime.java8API flag — cover both. Instant-typed values render
    * with an explicit Z offset, which Spark's literal parser honors
    * REGARDLESS of `spark.sql.session.timeZone` — and `java.sql
    * .Timestamp` goes through `.toInstant` for the same reason:
    * `Timestamp.toString` renders JVM-default-zone wall time, while
    * the session parses zoneless literals in the (pinned-UTC) session
    * zone, so on any JVM whose default zone ≠ UTC the bounds would
    * shift by the zone offset and the MERGE/recompute filters would
    * silently exclude matching rows. Both forms round-trip exactly at
    * micros (Spark timestamp precision). */
  private[graft] def boundsLiteral(v: Any): Option[String] = v match {
    case null => None
    case n: Byte => Some(n.toString)
    case n: Short => Some(n.toString)
    case n: Int => Some(n.toString)
    case n: Long => Some(n.toString + "L")
    case s: String => Some("'" + s.replace("'", "''") + "'")
    case d: java.sql.Date => Some(s"DATE'${d.toString}'")
    case d: java.time.LocalDate => Some(s"DATE'${d.toString}'")
    case t: java.sql.Timestamp => Some(s"TIMESTAMP'${t.toInstant.toString}'")
    case t: java.time.Instant => Some(s"TIMESTAMP'${t.toString}'")
    case t: java.time.LocalDateTime =>
      Some(s"TIMESTAMP_NTZ'${t.toString.replace('T', ' ')}'")
    case _ => None // non-orderable-literal types: no conjunct
  }

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
