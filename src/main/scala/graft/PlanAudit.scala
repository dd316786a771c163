package graft

/** Dev tool: print physical-plan shape stats (data shuffles, windows,
  * cartesians, broadcast count) for the named queries — the quick
  * audit loop behind PlanSpec's pins. Usage:
  * `sbt "runMain graft.PlanAudit q50_search_index t48_image_dedup_drops"`
  * (no args → every batch query). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.build()
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keySet
        .diff(SparkEntry.streamingQueries).diff(SparkEntry.sinkBoundQueries)
        .toSeq.sorted
    names.foreach { n =>
      val p = SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString
      val shuffles = "Exchange".r.findAllIn(p).size -
        "BroadcastExchange".r.findAllIn(p).size
      val bcasts = "BroadcastExchange".r.findAllIn(p).size
      println(s"PLAN $n shuffles=$shuffles broadcasts=$bcasts " +
        s"window=${p.contains("Window")} cartesian=${p.contains("CartesianProduct")} " +
        s"smj=${p.contains("SortMergeJoin")}")
    }
    spark.stop()
  }
}
