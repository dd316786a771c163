package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed event frames: merge overlapping
  * intervals into islands (the gaps-and-islands pattern) and measure
  * coverage. The classic warehouse use is uptime/session coverage —
  * total time a user/machine was active once overlapping activity
  * windows are fused.
  *
  * Scale shape: one hash shuffle on the key, then two window passes
  * over each key partition (running max of interval ends, running sum
  * of island starts) and one aggregate — never a self-join of
  * intervals, which is the quadratic trap. Keys are independent, so
  * 1000 executors each fuse their own key ranges; no global sort.
  */
object Intervals {

  /** Fuse overlapping-or-touching `[startCol, endCol]` intervals per
    * key into islands. `tieCols` must make the per-key order total
    * (e.g. the event id) — equal starts are otherwise
    * nondeterministic. Returns one row per island:
    * (key..., island, island_start, island_end, n_members).
    *
    * An interval starts a new island iff its start is strictly greater
    * than the running max of all previous ends (touching intervals
    * merge).
    */
  def islands(df: DataFrame, keyCols: Seq[String], startCol: String,
              endCol: String, tieCols: Seq[String]): DataFrame = {
    val order = (col(startCol) +: tieCols.map(col)).toSeq
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val prevMax = max(col(endCol)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("__new_island",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("__new_island")).over(w))
      .groupBy((keyCols :+ "island").map(col): _*)
      .agg(min(col(startCol)).as("island_start"),
           max(col(endCol)).as("island_end"),
           count(lit(1)).as("n_members"))
  }

  /** Per-key coverage once overlaps are fused: number of islands and
    * the summed island lengths (end − start units). */
  def coverage(df: DataFrame, keyCols: Seq[String], startCol: String,
               endCol: String, tieCols: Seq[String]): DataFrame =
    islands(df, keyCols, startCol, endCol, tieCols)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_islands"),
           sum(col("island_end") - col("island_start")).as("covered"))
}
