package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** Scale mechanics: salted joins preserve semantics, partitioned layout
  * prunes, bucketed layout joins without an exchange on the key. */
class ScaleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("saltedJoin result equals the plain join (skew-safe semantics)") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, dir)
    val customers = Tables.customer(spark, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = orders.join(customers, Seq("o_custkey"), "inner")
      .groupBy("c_mktsegment").count().orderBy("c_mktsegment")
      .as[(String, Long)].collect().toSeq
    val salted = Scale.saltedJoin(orders, customers, "o_custkey",
        identityCol = "o_orderkey", saltFactor = 4)
      .groupBy("c_mktsegment").count().orderBy("c_mktsegment")
      .as[(String, Long)].collect().toSeq
    assert(salted === plain)
  }

  test("partitioned layout: filter prunes to partition filters") {
    val root = Files.createTempDirectory("graft_part").toString + "/events"
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", date_format(col("ts_utc"), "yyyy-MM-dd"))
    Scale.writePartitioned(ev, root, Seq("day"))
    val q = spark.read.parquet(root).filter(col("day") === "2024-01-03")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), s"no partition pruning:\n$plan")
    assert(q.count() > 0)
  }

  test("bucketed layout joins without an exchange on the bucket key") {
    // default warehouse dir (./spark-warehouse, gitignored) — the
    // warehouse location is a static conf and cannot move at runtime.
    // Clear leftovers from previous JVMs (the in-memory catalog forgets
    // them but their directories survive).
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val dir = "/root/testdata/sf0.001"
    Scale.writeBucketed(Tables.orders(spark, dir), "b_orders", "o_orderkey", 4)
    Scale.writeBucketed(
      Tables.lineitem(spark, dir).withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 4)
    val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
      Seq("o_orderkey"))
    // disable broadcast so the co-located bucket join is observable
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === 6000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("shufflePartitionsFor sizes partitions near the target") {
    assert(Scale.shufflePartitionsFor(100L * 1024 * 1024 * 1024, 128) === 800)
    assert(Scale.shufflePartitionsFor(1024, 128) === 1)
  }
}
