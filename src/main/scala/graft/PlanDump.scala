package graft

/** Dev tool: write each named query's `.explain("formatted")` output to
  * `<outDir>/<query>_<tag>.txt` — the before/after plan evidence the
  * optimization rounds commit under plans/rNN/. Usage:
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.PlanDump plans/r17 before q50_search_index t112_perplexity_filter"`
  * (no query args → every batch query). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <tag> [query ...]")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.build()
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keySet
        .diff(SparkEntry.streamingQueries).diff(SparkEntry.sinkBoundQueries)
        .toSeq.sorted
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        outDir.resolve(s"${n}_$tag.txt"), plan)
      println(s"PLANDUMP wrote ${n}_$tag.txt")
    }
    spark.stop()
  }
}
