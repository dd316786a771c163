package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed range (interval) join — points to `[lo, hi]` intervals.
  *
  * Spark has no native range-join operator: `p.join(iv, $"pv" >= $"lo" &&
  * $"pv" <= $"hi")` plans as a BroadcastNestedLoopJoin (O(|p|·|iv|) work
  * even when the small side broadcasts) or, worse, a cartesian product.
  * Neither survives 100 TB.
  *
  * The scale shape is bucketization: pick a width `w`, map every point to
  * bucket `floor(pv / w)`, explode every interval to the buckets it
  * covers (`floor(lo/w) .. floor(hi/w)`), and equi-join on the bucket
  * with a residual `BETWEEN` filter. A qualifying (point, interval) pair
  * meets in exactly one bucket — the point's own — so the output needs no
  * dedup. Cost: one hash-partition shuffle on the bucket key plus
  * `ceil(len/w)+1` replicated interval rows per interval; the classic
  * trade is smaller `w` → more interval replication but fewer false
  * bucket co-residents to filter.
  *
  * At cluster scale: the bucket key is high-cardinality (value-space /
  * w), so the shuffle spreads evenly; a hot value range (many points in
  * one bucket) is ordinary aggregation skew, handled by AQE skew-join
  * splitting. Long intervals replicate proportionally to their length —
  * callers with mixed interval lengths should split the interval side by
  * length and use a coarser width for the long tail (two-tier join).
  */
object RangeJoin {

  /** Inner range join: rows of `points` paired with every row of
    * `intervals` whose `[lo, hi]` (inclusive both ends) contains the
    * point column `pv`. Values must be integral (LongType-compatible);
    * `width` > 0 picks the bucket granularity.
    */
  def bucketed(points: DataFrame, pv: String,
               intervals: DataFrame, lo: String, hi: String,
               width: Long): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    // floor-division in the long domain (works for negative values too,
    // unlike SQL integer division which truncates toward zero)
    def fdiv(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / width).cast("long")
    val pb = points.withColumn("__bucket", fdiv(col(pv)))
    val ib = intervals.withColumn(
      "__bucket", explode(sequence(fdiv(col(lo)), fdiv(col(hi)))))
    pb.join(ib, Seq("__bucket"))
      .where(col(pv) >= col(lo) && col(pv) <= col(hi))
      .drop("__bucket")
  }

  /** Two-tier range join for mixed interval lengths (the recipe from
    * the class doc): intervals shorter than `splitLen` join at the
    * fine `width`, the long tail at `coarseWidth` — bounding per-
    * interval replication at `ceil(splitLen/width)+1` for the bulk and
    * keeping the long tail's bucket fan-out proportional to
    * `len/coarseWidth` instead of `len/width`. The two joins share the
    * point scan and union; the tiers partition the interval set, so
    * the union is disjoint and needs no dedup.
    */
  def bucketedTwoTier(points: DataFrame, pv: String,
                      intervals: DataFrame, lo: String, hi: String,
                      width: Long, splitLen: Long,
                      coarseWidth: Long): DataFrame = {
    require(coarseWidth >= width,
      s"coarse width $coarseWidth must be >= fine width $width")
    val len = col(hi) - col(lo)
    val fine = bucketed(points, pv, intervals.where(len < splitLen),
      lo, hi, width)
    val coarse = bucketed(points, pv, intervals.where(len >= splitLen),
      lo, hi, coarseWidth)
    fine.unionByName(coarse)
  }
}
