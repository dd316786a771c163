package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` door the engine needs: wrap a custom logical
  * plan node into a DataFrame (`Dataset.ofRows` — the same entry every
  * Spark-native extension library uses to surface custom operators).
  * Kept to this single call so the internal surface area stays minimal
  * and auditable. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** The planner strategies a SparkSessionExtensions instance would
    * install — lets the spec pin the builder-path injection without
    * constructing a second SparkSession in the shared test JVM. */
  def plannerStrategies(ext: SparkSessionExtensions,
                        spark: SparkSession): Seq[execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark.asInstanceOf[classic.SparkSession])
}
