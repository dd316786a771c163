package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev measurement main: cost of a ONE-ROW SQL UPDATE against a
  * clustered versioned table as the table grows 10× — the
  * file-granularity copy-on-write claim ("a one-row UPDATE rewrites
  * one file, not the table") as a number for SCALING.md.
  *
  * Usage: sbt "Test / runMain graft.queries.ProfileRowLevel"
  */
object ProfileRowLevel {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build()
    val wh = java.nio.file.Files.createTempDirectory("graft_prof_rlo_").toString
    spark.conf.set("spark.sql.catalog.prof", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.prof.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS prof.t")

    Seq(("small", 1000000L, 16), ("big", 10000000L, 32)).foreach {
      case (tag, rows, files) =>
        val t = s"prof.t.$tag"
        spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT, w BIGINT) " +
          "USING `graft-versioned` " +
          s"TBLPROPERTIES ('clusterBy'='id', 'writePartitions'='$files')")
        val (_, loadS) = timed {
          spark.sql(s"INSERT INTO $t SELECT id, id * 7, id % 97 FROM range(0, $rows)")
        }
        // warm-up pass compiles the rewrite plan shape
        spark.sql(s"UPDATE $t SET v = v + 1 WHERE id = 1")
        val (_, oneRowS) = timed {
          spark.sql(s"UPDATE $t SET v = v + 1 WHERE id = ${rows / 2}")
        }
        val (_, fullS) = timed {
          spark.sql(s"UPDATE $t SET w = w + 1 WHERE id % 2 = 0")
        }
        val vdir = java.nio.file.Paths.get(s"$wh/t/$tag/v=2")
        val carried = {
          val v1 = graft.operators.Versioned.dataFiles(
            java.nio.file.Paths.get(s"$wh/t/$tag/v=1"))
          val inodes = v1.map(p =>
            java.nio.file.Files.getAttribute(p, "unix:ino")).toSet
          graft.operators.Versioned.dataFiles(vdir).count(p =>
            inodes.contains(java.nio.file.Files.getAttribute(p, "unix:ino")))
        }
        println(f"PROFILE_RLO tag=$tag rows=$rows files=$files " +
          f"load=$loadS%.2f oneRowUpdate=$oneRowS%.2f fullUpdate=$fullS%.2f " +
          f"carriedAfterOneRow=$carried")
    }
    spark.stop()
  }
}
