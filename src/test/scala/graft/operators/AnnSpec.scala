package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** IVF ANN over the real embeddings table: deterministic index build,
  * probe-limited candidate generation, sane recall against brute force. */
class AnnSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, dir)

  test("index build is deterministic and covers the corpus") {
    val i1 = Ann.buildIndex(emb, "vec_id", "embedding", k = 8)
      .orderBy("vid").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val i2 = Ann.buildIndex(emb, "vec_id", "embedding", k = 8)
      .orderBy("vid").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(i1 === i2)
    assert(i1.length === 500)
    assert(i1.map(_._2).distinct.size > 1) // more than one populated cell
  }

  test("ivfSearch returns ranked neighbors with decent recall vs brute force") {
    val centroids = Ann.buildCentroids(emb, "vec_id", "embedding", k = 8)
    val index = Ann.buildIndex(emb, "vec_id", "embedding", k = 8)
    val queries = emb.filter(col("vec_id") < 20)
    val ivf = Ann.ivfSearch(index, centroids, queries, "vec_id", "embedding",
      nProbe = 3, topK = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

    // brute-force truth via the existing gate query shape
    val brute = graft.queries.Vectors.v31KnnBruteforce(spark, dir)
      .filter(col("query_id") < 20)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

    val recall = (ivf intersect brute).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall too low: $recall") // 3/8 cells probed
    // every query produced results and ranks are 1..5 without gaps
    val byQuery = Ann.ivfSearch(index, centroids, queries, "vec_id", "embedding",
      nProbe = 3, topK = 5).groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx")).collect()
    assert(byQuery.length === 20)
    assert(byQuery.forall(r => r.getAs[Long]("n") == r.getAs[Int]("mx").toLong))
  }
}
