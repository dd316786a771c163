package graft.queries

/** Dev profiling main (Test/runMain graft.queries.ProfileQ54 [sfDir]) —
  * splits q54's wall time into envelope construction, parse+extract,
  * projection, and the presentation sort, each as min-of-two timed
  * passes after a warmup. Not part of the shipped surface. */
object ProfileQ54 {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.build()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def run(f: => org.apache.spark.sql.DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = f.queryExecution.toRdd.count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      run(f) // warm
      val (n1, a) = run(f)
      val (_, b) = run(f)
      println(f"PROF $tag%-16s rows=$n1%6d sec=${math.min(a, b)}%.3f")
    }

    time("envelope")(SiteGates.q54Envelope(s, dir))
    // isolate the envelope's expression-tree cost from the extraction:
    // materialize the envelope to parquet, run the transform off the file
    val envPath = java.nio.file.Files.createTempDirectory("q54_env_").toString
    SiteGates.q54Envelope(s, dir).write.mode("overwrite").parquet(envPath)
    time("extract_mat")(graft.operators.KilidTransform.kilidTransform(
      s.read.parquet(envPath), SiteGates.refTime))
    time("project_mat")(SiteGates.q54Project(
      graft.operators.KilidTransform.kilidTransform(
        s.read.parquet(envPath), SiteGates.refTime)))
    time("extract")(graft.operators.KilidTransform.kilidTransform(
      SiteGates.q54Envelope(s, dir), SiteGates.refTime))
    time("project")(SiteGates.q54Project(
      graft.operators.KilidTransform.kilidTransform(
        SiteGates.q54Envelope(s, dir), SiteGates.refTime)))
    time("full_sorted")(SparkEntryRef.q54(s, dir))
    // same-DF re-execution: separates per-build plan/analysis cost from
    // actual row work (the physical plan + codegen are reused)
    val bound = SiteGates.q54Project(
      graft.operators.KilidTransform.kilidTransform(
        s.read.parquet(envPath), SiteGates.refTime))
    bound.queryExecution.toRdd.count()
    val tb = System.nanoTime()
    bound.queryExecution.toRdd.count()
    println(f"PROF same_df_rerun           sec=${(System.nanoTime() - tb) / 1e9}%.3f")
    val plan = SiteGates.q54Project(
      graft.operators.KilidTransform.kilidTransform(
        s.read.parquet(envPath), SiteGates.refTime))
      .queryExecution.executedPlan.toString
    val nUdf = "extractUdf|UDF".r.findAllIn(plan).length
    println(s"PLAN_UDF_OCCURRENCES=$nUdf")
    println(plan.linesIterator.take(25).mkString("\n"))
    s.stop()
  }

  private object SparkEntryRef {
    def q54(s: org.apache.spark.sql.SparkSession, dir: String) =
      SiteGates.queries("q54_kilid_transform")(s, dir)
  }
}
