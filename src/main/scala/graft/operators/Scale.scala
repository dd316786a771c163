package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale mechanics for the 100 TB deployment (SURVEY §7.2 M7): skew
  * salting for hot keys, storage layout helpers (date partitioning for
  * pruning, bucketing for shuffle-free joins). AQE's skew-join handles
  * moderate skew automatically; explicit salting is for the pathological
  * keys (e.g. a `city_slug` holding half the corpus) where even one
  * AQE-split partition is too big.
  */
object Scale {

  /** Skew-salted equi-join: the large (skewed) side gets a deterministic
    * salt derived from a stable identity column; the small side is
    * replicated `saltFactor` times. Result equals `large.join(small,
    * key)` exactly, but the shuffle spreads each hot key over
    * `saltFactor` reducers.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 identityCol: String, saltFactor: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(hash(col(identityCol)), lit(saltFactor)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Partitioned-by-date layout: writes `df` under `path` partitioned on
    * the given columns so date/category predicates prune at the file
    * listing level (the incremental watermark becomes a partition skip).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed layout for co-located joins: both sides bucketed on the
    * join key with the same bucket count join without a shuffle.
    * (Table-based because bucketing metadata lives in the catalog.) */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** The shuffle-partition count that keeps post-shuffle partitions near
    * `targetMb` for a given input size — the sizing rule from the
    * builder notes (spill-aware partitioning). */
  def shufflePartitionsFor(inputBytes: Long, targetMb: Int = 128): Int =
    math.max(1, (inputBytes / (targetMb.toLong * 1024 * 1024)).toInt)
}
