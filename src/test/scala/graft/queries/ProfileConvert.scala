package graft.queries

/** Dev measurement main: CONVERT-in-place vs rewrite-through-the-engine
  * as the source grows 10× — the "onboarding is O(files) metadata, not
  * O(data)" claim as numbers for SCALING.md.
  *
  * Usage: sbt "Test / runMain graft.queries.ProfileConvert"
  */
object ProfileConvert {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build()
    val wh = java.nio.file.Files.createTempDirectory("graft_prof_cvt_").toString
    spark.conf.set("spark.sql.catalog.pcvt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pcvt.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pcvt.t")

    Seq(("small", 1000000L, 16), ("big", 10000000L, 16),
        ("manyfiles", 1000000L, 160)).foreach { case (tag, rows, files) =>
      val src = java.nio.file.Paths.get(wh, s"src_$tag")
      spark.range(0, rows).selectExpr("id", "id * 7 AS v", "id % 97 AS w")
        .repartition(files).write.parquet(src.toString)
      val bytes = graft.operators.Versioned.listParquet(src)
        .map(java.nio.file.Files.size(_)).sum
      val (_, convS) = timed {
        spark.sql(s"CALL pcvt.sys.convert(source_dir => '$src', " +
          s"target => 't.conv_$tag')")
      }
      // the alternative: rewriting the bytes through the engine
      spark.sql(s"CREATE TABLE pcvt.t.rw_$tag (id BIGINT, v BIGINT, w BIGINT) " +
        "USING `graft-versioned` TBLPROPERTIES " +
        s"('clusterBy'='id', 'writePartitions'='$files')")
      val (_, rewriteS) = timed {
        spark.sql(s"INSERT INTO pcvt.t.rw_$tag " +
          s"SELECT * FROM parquet.`$src`")
      }
      println(f"PROFILE_CONVERT $tag rows=$rows files=$files " +
        f"bytes=${bytes / 1048576.0}%.1fMB convert=$convS%.3fs " +
        f"rewrite=$rewriteS%.3fs")
    }
    spark.stop()
  }
}
