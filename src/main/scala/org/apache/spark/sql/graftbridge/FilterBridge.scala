package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.sources.Filter

/** Bridge into Spark's protected Catalyst-Expression → V1-Filter
  * translation — the exact rule set Spark's own file sources push
  * predicates through — so `OPTIMIZE … WHERE` predicates select files
  * with the same semantics as scan-time skipping. Standard
  * extension-library pattern; no Spark internals are modified. */
object FilterBridge {
  def toV1(condition: Expression): Option[Filter] =
    DataSourceStrategy.translateFilter(condition,
      supportNestedPredicatePushdown = false)
}
