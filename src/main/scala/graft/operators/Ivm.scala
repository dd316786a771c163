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
}
