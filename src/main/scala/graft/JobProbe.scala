package graft

import org.apache.spark.scheduler._

/** Dev tool: per-JOB wall-clock profile of one query — the stage-level
  * evidence the optimization rounds commit for multi-action gates
  * (chained in-gate requires, index builds, checkpoint jobs), since
  * the Spark UI is disabled in this environment. Runs the query once
  * untimed (warmup), drops its cached state, re-runs it with a
  * listener, and prints one line per job: wall seconds + the first
  * stage's callsite name. Usage:
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.JobProbe t116_ccnet_pipeline"` */
object JobProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProbe <query> [query ...]")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build()
    val starts = scala.collection.concurrent.TrieMap[Int, (Long, String)]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = j.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
          .mkString(" ; ").take(120)
        starts(j.jobId) = (System.nanoTime(), desc)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, d) =>
          jobs.add((j.jobId, (System.nanoTime() - t0) / 1e9, d)) }
    })
    def dropState(): Unit = {
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, dir).queryExecution.toRdd.count() // warmup
      dropState()
      jobs.clear()
      val t0 = System.nanoTime()
      val timed = fn(spark, dir)
      timed.queryExecution.toRdd.count()
      val total = (System.nanoTime() - t0) / 1e9
      // the FINAL adaptive plan (post-execution): runtime exchange /
      // query-stage reuse is invisible in the static explain
      val fin = timed.queryExecution.executedPlan.toString
      def n(p: String) = p.r.findAllIn(fin).size
      println(s"PROBE $name finalplan: scans=${n("Scan parquet")} " +
        s"exchanges=${n("Exchange")} reused=${n("ReusedExchange|ReusedQueryStage")} " +
        s"generates=${n("Generate")}")
      // listener events are async — give the bus a beat to drain
      Thread.sleep(300)
      println(f"PROBE $name TOTAL $total%.2f s, ${jobs.size} jobs")
      jobs.toArray(Array.empty[(Int, Double, String)]).sortBy(_._1)
        .foreach { case (id, dt, d) => println(f"PROBE   job $id%3d $dt%6.2f  $d") }
      dropState()
    }
    spark.stop()
  }
}
