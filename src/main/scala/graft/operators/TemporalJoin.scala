package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) left join — the temporal operator a
  * training-data pipeline needs for leak-free feature joins (each fact
  * row sees only the latest dimension state at or before its own
  * timestamp). Not present in the reference (SURVEY §2.3 notes "no
  * as-of joins"), added as a beyond-reference operator.
  *
  * Implementation is the scale-correct union+window pattern (SURVEY
  * custom-operator ladder step (a): composed from built-ins): tag both
  * sides, union, ONE shuffle on the key, per-partition sort by (time,
  * side), carry the latest right-side values forward with
  * last(ignoreNulls). O(n log n) per key group, no range join, no
  * per-row probes — this survives 100 TB where a theta-join would not.
  */
object TemporalJoin {

  /** Left as-of join: for every left row, the right row with the largest
    * `rightTime` ≤ `leftTime` within the same `keys`. Right value
    * columns come back null when no such row exists (or when it is
    * older than `toleranceNs`, if set). `rightTime` is emitted as
    * `<rightTimeCol>_matched`.
    *
    * Time columns must be mutually comparable and totally ordered
    * (epoch numbers or timestamps).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               toleranceNs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.filterNot(c => keys.contains(c) || c == leftTime)
    val rightCols = right.columns.filterNot(c => keys.contains(c) || c == rightTime)

    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn(s"__rt", lit(null).cast(right.schema(rightTime).dataType))
      .select(keys.map(col) ++ Seq(col("__t"), col("__side"), col("__rt")) ++
        leftCols.map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)

    val taggedRight = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__rt", col(rightTime))
      .select(keys.map(col) ++ Seq(col("__t"), col("__side"), col("__rt")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)

    // at equal times the right row sorts first (side 0) so the left row
    // sees it — inclusive `>=` as-of semantics, matching ASOF JOIN
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedLeft.unionByName(taggedRight)
      .withColumn("__m_rt", last(col("__rt"), ignoreNulls = true).over(w))
    val withVals = rightCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"__m_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }

    val inTolerance = toleranceNs match {
      case Some(tol) =>
        col("__m_rt").isNotNull &&
          (col("__t").cast("long") - col("__m_rt").cast("long")) <= tol
      case None => col("__m_rt").isNotNull
    }

    withVals.filter(col("__side") === 1)
      .select(keys.map(col) ++
        Seq(col("__t").as(leftTime)) ++
        leftCols.map(col) ++
        Seq(when(inTolerance, col("__m_rt")).as(s"${rightTime}_matched")) ++
        rightCols.map(c => when(inTolerance, col(s"__m_$c")).as(c)): _*)
  }
}
