package graft.operators

import org.apache.spark.sql.functions._

/** Scaling-evidence probe for SCALING.md: filtered HNSW (traverse-
  * through beam walk) vs naive post-filtering of an unfiltered top-N
  * at matched budgets — recall against the restricted exact reference
  * and wall time. Run: `sbt "Test/runMain graft.operators.ProfileFilteredHnsw"`. */
object ProfileFilteredHnsw {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.build()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = graft.Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 30)
    val exact = Ann.filteredSearch(emb, queries, "vec_id", "embedding",
        allowed = emb.filter(col("label") === 3).select("vec_id"), topK = 5)
      .select(col("query_id"), col("neighbor_id")).withColumn("hit", lit(1L))
    exact.cache(); exact.count()
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      df.join(exact, Seq("query_id", "neighbor_id"), "left")
        .agg(sum(coalesce(col("hit"), lit(0L)))).collect()(0)
        .getLong(0).toDouble / (30 * 5)
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm
    Hnsw.filteredAnnTopK(emb, "vec_id", "embedding", queries, k = 5,
      allowed = col("label") === 3, maxVisits = 2048).count()
    val (fr, ft) = time {
      val d = Hnsw.filteredAnnTopK(emb, "vec_id", "embedding", queries,
        k = 5, allowed = col("label") === 3, maxVisits = 2048)
      d.cache(); d.count(); d
    }
    println(f"FILTERED_RECALL=${recallOf(fr)}%.3f TIME=$ft%.2f")
    Seq(10, 50).foreach { n =>
      val (nr, nt) = time {
        val top = Hnsw.annTopK(emb, "vec_id", "embedding", queries,
          k = n, maxVisits = 2048)
        val lab = emb.select(col("vec_id").as("neighbor_id"), col("label"))
        val d = top.join(lab, "neighbor_id").filter(col("label") === 3)
          .withColumn("r2", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("query_id")
              .orderBy(col("rank"))))
          .filter(col("r2") <= 5).select("query_id", "neighbor_id")
        d.cache(); d.count(); d
      }
      println(f"POSTFILTER_N${n}_RECALL=${recallOf(nr)}%.3f TIME=$nt%.2f")
    }
    s.stop()
  }
}
