package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k-by-count as a typed Catalyst [[Aggregator]] — the last
  * engine extension point the repo had not exercised (custom typed
  * aggregation state with partial aggregation + merge, registered for
  * both the Dataset API and SQL via `functions.udaf`).
  *
  * Scale shape: the aggregator is the SECOND level of the scalable
  * two-level top-k — inputs must be full per-value counts (one
  * [[TopK.Entry]] per value, produced by an ordinary groupBy count, so
  * the heavy lifting is a hash aggregate with map-side combine), and the
  * buffer then holds AT MOST k entries. Partial buffers merge
  * associatively and commutatively (proved under random partition splits
  * by PropertySpec), so map-side partial aggregation works and the
  * driver never sees more than k rows per group. At 100 TB this is one
  * shuffle on the count keys plus one k-bounded shuffle on the group —
  * never a global sort or window.
  *
  * Determinism: ties break (count desc, value asc) — total order, so any
  * merge tree yields the identical top-k.
  */
object TopK {

  /** One candidate: a value and its full count. */
  case class Entry(value: Long, cnt: Long)

  /** Case-class envelope so buffer AND output use plain product
    * encoders (no kryo fallback — keeps the aggregate codegen-friendly
    * and the state columnar). */
  case class Buf(entries: Seq[Entry])

  /** (cnt desc, value asc) — the deterministic total order. */
  private def better(a: Entry, b: Entry): Boolean =
    a.cnt > b.cnt || (a.cnt == b.cnt && a.value < b.value)

  class TopKByCount(k: Int) extends Aggregator[Entry, Buf, Buf] {
    require(k > 0, s"k must be positive, got $k")
    private def trim(s: Seq[Entry]): Seq[Entry] = s.sortWith(better).take(k)
    override def zero: Buf = Buf(Seq.empty)
    // the buffer is kept sorted (zero is empty, reduce inserts in
    // place, merge re-sorts) — so the per-input-row cost is one O(k)
    // bounded insertion, not a fresh O(k log k) sort per row
    override def reduce(b: Buf, in: Entry): Buf = {
      val e = b.entries
      if (e.length >= k && better(e.last, in)) b
      else {
        val at = e.indexWhere(better(in, _))
        val pos = if (at < 0) e.length else at
        Buf(((e.take(pos) :+ in) ++ e.drop(pos)).take(k))
      }
    }
    override def merge(a: Buf, b: Buf): Buf = Buf(trim(a.entries ++ b.entries))
    override def finish(r: Buf): Buf = Buf(trim(r.entries))
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Register `topk_by_count_<k>` for SQL use; returns the function
    * name. Idempotent (re-registration replaces). */
  def register(spark: org.apache.spark.sql.SparkSession, k: Int): String = {
    val name = s"topk_by_count_$k"
    spark.udf.register(name,
      org.apache.spark.sql.functions.udaf(new TopKByCount(k), Encoders.product[Entry]))
    name
  }
}
