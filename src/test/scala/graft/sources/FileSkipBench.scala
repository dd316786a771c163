package graft.sources

import org.apache.spark.sql.SparkSession

import graft.operators.{Layout, Versioned}

/** One-off planning-cost micro-benchmark for manifest-carried file
  * statistics: on a MANY-FILE snapshot with a selective pushed
  * predicate, time the scan's `planInputPartitions` with the stats
  * sidecar present (one sidecar read + footers of survivors only)
  * vs removed (one footer read per file — the pre-skipping planner).
  * Run: sbt "Test/runMain graft.sources.FileSkipBench"; numbers are
  * recorded in SCALING.md. */
object FileSkipBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("file-skip-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nFiles = 400
    val rows = 400000L
    val root = java.nio.file.Files.createTempDirectory("graft_fskip_bench_").toString
    Versioned.writeNext(
      (0L until rows).map(i => (i, i * 3)).toDF("id", "v"), root, Some(1L),
      Layout.WriteSpec(sortCols = Seq("id"), numPartitions = Some(nFiles)))
    val vdir = java.nio.file.Paths.get(root, "v=0")
    require(Versioned.dataFiles(vdir).size == nFiles)

    import scala.jdk.CollectionConverters._
    def planOnce(): (Long, Int) = {
      val sb = new GraftVersionedScanBuilder(
        spark.read.format("graft-versioned").load(root).schema,
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          Map("path" -> root).asJava))
      sb.pushFilters(Array(
        org.apache.spark.sql.sources.GreaterThanOrEqual("id", rows - 10)))
      val scan = sb.build()
      val t0 = System.nanoTime()
      val parts = scan.toBatch.planInputPartitions().length
      ((System.nanoTime() - t0) / 1000, parts) // µs
    }

    def bench(label: String): Unit = {
      val runs = (1 to 7).map(_ => planOnce())
      val times = runs.map(_._1).sorted
      println(f"$label: median ${times(3)}%d µs  (min ${times.head}%d, " +
        f"max ${times.last}%d; partitions ${runs.head._2}%d)")
    }

    bench(s"WITH stats sidecar   ($nFiles files)")
    val stats = vdir.resolve("_graft_stats")
    val saved = java.nio.file.Files.readAllBytes(stats)
    java.nio.file.Files.delete(stats)
    bench(s"WITHOUT stats sidecar ($nFiles files)")
    java.nio.file.Files.write(stats, saved)

    // exactness under the skip path
    val n = spark.read.format("graft-versioned").load(root)
      .filter(org.apache.spark.sql.functions.col("id") >= rows - 10).count()
    require(n == 10L, s"expected 10 rows, got $n")
    spark.stop()
  }
}
