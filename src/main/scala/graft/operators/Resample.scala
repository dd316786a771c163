package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: project an irregular per-key series onto
  * a fixed-step grid and forward-fill the last observation — the
  * resample/gap-fill shape every metrics warehouse and feature pipeline
  * needs (daily balances from sparse transactions, hourly sensor state
  * from event reports). The reference has no time-series surface; this
  * extends its incremental-watermark family (SURVEY §2.1 S2/S3) the way
  * a pipeline user would first ask for.
  *
  * Scale shape: the per-key bounds are one aggregate; the grid is
  * `sequence`+`explode` (scan-side, no shuffle beyond the bounds agg);
  * the observation join is a (key, t) equi-join; the forward fill is a
  * per-key ordered window — everything distributes on the key, no
  * global stage. Grid size is data-dependent (span/step per key);
  * callers pick the step so per-key grids stay sane (a 10-year span at
  * 1-second step is a 300M-row key — that is a modeling error, not an
  * engine limit).
  */
object Resample {

  /** One output row per key per grid step from the key's first to last
    * observation (inclusive); `valCols` are forward-filled from the
    * latest at-or-before observation. `obs` must hold ONE row per
    * (key, t) — pre-aggregate to the grid grain first (the grain is the
    * caller's business rule; see the q96 gate's last-of-day pick).
    * `tCol` is integral (day index, epoch-µs bucket, ...); rows at
    * unobserved grid points carry the filled values only.
    */
  def gapFill(obs: DataFrame, keyCol: String, tCol: String,
              valCols: Seq[String], step: Long = 1L): DataFrame = {
    require(step > 0, s"gapFill step must be positive, got $step")
    val bounds = obs.groupBy(keyCol)
      .agg(min(col(tCol)).as("__t0"), max(col(tCol)).as("__t1"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("__t0"), col("__t1"), lit(step))).as(tCol))
    val w = Window.partitionBy(keyCol).orderBy(col(tCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valCols.foldLeft(grid.join(obs, Seq(keyCol, tCol), "left")) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
  }
}
