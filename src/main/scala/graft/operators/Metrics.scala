package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** In-flight data-quality counters — the operational surface every
  * production pipeline bolts on last and wishes it had first. Spark's
  * `Dataset.observe` attaches aggregate metrics to a plan node; they
  * are computed BY THE SAME JOB that produces the output (accumulator
  * semantics — zero extra scans, zero extra shuffles), which at 100 TB
  * is the difference between free counters and doubling the pipeline.
  *
  * Contrast with the naive `df.agg(...)` quality report: that is a
  * second action re-reading the source; on object storage that is a
  * second 100 TB scan.
  */
object Metrics {

  /** Attach named metrics to the frame; read them from the returned
    * [[Observation]] AFTER an action completes (`observation.get`
    * blocks until the observed plan node has executed). Metrics must
    * be aggregate expressions over the rows flowing through this point
    * of the plan — row counts, null counts, min/max, sums.
    */
  def observed(df: DataFrame, name: String,
               first: Column, rest: Column*): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, first, rest: _*), obs)
  }
}
