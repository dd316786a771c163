package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** S12: the batched HTTP-style load sink
  * (utils_of_searchengine.py:163-219: slice into batches of 200, POST
  * `{properties, batch_number, total_batches}`, raise on failure) as a
  * partition-parallel foreachPartition sink with an injectable
  * transport — tests record batches, production POSTs them.
  *
  * At scale each partition streams its rows and flushes every
  * `batchSize`; nothing is collected on the driver. Batch numbering is
  * per-partition (a global total requires a count barrier the reference
  * only has because it materializes everything in memory first).
  */
object BatchedSink {

  /** One delivery attempt: (partitionId, batchIndexInPartition, rows).
    * Must raise to signal failure (the reference's raise_for_status). */
  type Transport = (Int, Long, Seq[Row]) => Unit

  def send(df: DataFrame, transport: Transport, batchSize: Int = 200): Unit = {
    val bs = batchSize
    df.foreachPartition { (rows: Iterator[Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var batchIdx = 0L
      val buf = new scala.collection.mutable.ArrayBuffer[Row](bs)
      rows.foreach { r =>
        buf += r
        if (buf.size >= bs) {
          transport(pid, batchIdx, buf.toSeq)
          buf.clear()
          batchIdx += 1
        }
      }
      if (buf.nonEmpty) transport(pid, batchIdx, buf.toSeq)
    }
  }
}
