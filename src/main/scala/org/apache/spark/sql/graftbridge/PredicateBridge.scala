package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.internal.connector.PredicateUtils
import org.apache.spark.sql.sources.Filter

/** Bridge into Spark's private[sql] V2-Predicate → V1-Filter
  * translation, so the graft-versioned scan can interpret RUNTIME
  * filters (broadcast-join key sets arriving through
  * SupportsRuntimeV2Filtering) with the exact semantics Spark's own
  * file sources use. Standard extension-library pattern; no Spark
  * internals are modified. */
object PredicateBridge {
  def toV1(predicates: Array[Predicate]): Array[Filter] =
    PredicateUtils.toV1(predicates)
}
