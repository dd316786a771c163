package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** PARTITION-SPEC EVOLUTION (Iceberg's replace-partition-field):
  * `ALTER TABLE … SET TBLPROPERTIES ('partitionedBy' = '…')`
  * re-partitions METADATA-ONLY. New derived cluster columns are added
  * like any schema evolution (pre-evolution files read null, the
  * bucket-prune IsNull arm keeps them — sound), future writes cluster
  * and pin under the new spec, and an INSERT OVERWRITE rewrite
  * re-pins everything so storage-partitioned joins re-qualify. */
class PartitionEvolutionSpec extends AnyFunSuite with SparkSpec {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_pevo_spec_").toString

  private def cat(): Unit = {
    spark.conf.set("spark.sql.catalog.pev", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pev.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pev.t")
  }

  private def filesOf(name: String): (Int, Seq[java.nio.file.Path]) = {
    val root = java.nio.file.Paths.get(warehouse, "t", name)
    val v = graft.operators.Versioned.latestVersion(root.toString).get
    val fs = graft.operators.Versioned.dataFiles(root.resolve(s"v=$v"))
    (v.toInt, fs)
  }

  test("identity -> bucket evolution: old files stay readable and kept " +
      "by pruning; new files pin and prune; overwrite re-pins") {
    cat()
    spark.sql("DROP TABLE IF EXISTS pev.t.e1")
    spark.sql("CREATE TABLE pev.t.e1 (id BIGINT, g BIGINT, v BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (g)")
    spark.sql("INSERT INTO pev.t.e1 SELECT id, id % 3, id FROM range(0, 600)")
    val (_, oldFiles) = filesOf("e1")

    spark.sql("ALTER TABLE pev.t.e1 SET TBLPROPERTIES " +
      "('partitionedBy' = 'bucket(8,id)')")
    val props = spark.sql("SHOW TBLPROPERTIES pev.t.e1").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("partitionedBy") === "bucket(8,id)")
    assert(props("clusterBy") === "id_bucket")
    // the derived column exists, old rows read it as null
    assert(spark.sql("SELECT count(*) FROM pev.t.e1 WHERE id_bucket IS NULL")
      .collect()(0).getLong(0) === 600L)

    // new insert clusters + pins under the new spec
    spark.sql("INSERT INTO pev.t.e1 (id, g, v) " +
      "SELECT 1000 + id, id % 3, id FROM range(0, 600)")
    assert(spark.sql("SELECT count(*) FROM pev.t.e1 " +
      "WHERE id >= 1000 AND id_bucket != pmod(hash(id), 8)")
      .collect()(0).getLong(0) === 0L)

    // a point query into the NEW id range prunes to one bucket file
    // (the old files refute on the id range itself)
    val q = spark.sql("SELECT v FROM pev.t.e1 WHERE id = 1234")
    val plan = q.queryExecution.executedPlan.toString
    val m = """DataFiles: (\d+)/(\d+)""".r.findFirstMatchIn(plan).get
    val (kept, total) = (m.group(1).toInt, m.group(2).toInt)
    assert(kept <= math.max(1, total / 4),
      s"bucket pruning must hold on the new files: $kept/$total\n$plan")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(234L))
    // a point query into the OLD id range: pre-evolution files carry no
    // bucket column — the synthetic filter's IsNull arm must KEEP them
    // (a refute here would silently lose the row)
    val qOld = spark.sql("SELECT v FROM pev.t.e1 WHERE id = 234")
    assert(qOld.collect().map(_.getLong(0)).toSeq === Seq(234L),
      "pre-evolution rows must survive bucket pruning")

    // INSERT OVERWRITE rewrites everything through the new layout:
    // every file now pins one bucket
    spark.sql("INSERT OVERWRITE pev.t.e1 (id, g, v) " +
      "SELECT id, g, v FROM pev.t.e1")
    val (_, newFiles) = filesOf("e1")
    val root = java.nio.file.Paths.get(warehouse, "t", "e1")
    val vNow = graft.operators.Versioned.latestVersion(root.toString).get
    val stats = graft.operators.FileStats.read(root.resolve(s"v=$vNow"))
    newFiles.foreach { f =>
      val cs = stats(f.getFileName.toString).cols("id_bucket")
      assert(cs.lo.isDefined && cs.lo == cs.hi,
        s"${f.getFileName} must pin one bucket after the rewrite")
    }
    assert(spark.table("pev.t.e1").count() === 1200L)
  }

  test("after the overwrite the evolved table co-partitions with a " +
      "born-bucketed twin (SPJ re-qualifies)") {
    cat()
    spark.sql("DROP TABLE IF EXISTS pev.t.twin")
    spark.sql("CREATE TABLE pev.t.twin (id BIGINT, w BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (bucket(8, id))")
    spark.sql("INSERT INTO pev.t.twin (id, w) " +
      "SELECT id, id * 2 FROM range(0, 600)")
    val olds = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql("SELECT a.id, a.v, b.w FROM pev.t.e1 a " +
        "JOIN pev.t.twin b ON a.id = b.id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"the evolved+rewritten table must co-partition:\n$plan")
      assert(j.count() === 600L)
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("evolution refusals: colliding plain column, bad key type, " +
      "empty spec; re-evolving back reuses the bound column") {
    cat()
    spark.sql("DROP TABLE IF EXISTS pev.t.r")
    spark.sql("CREATE TABLE pev.t.r (id BIGINT, id_bucket STRING, " +
      "f DOUBLE) USING `graft-versioned`")
    val e1 = intercept[Exception](spark.sql("ALTER TABLE pev.t.r " +
      "SET TBLPROPERTIES ('partitionedBy' = 'bucket(8,id)')"))
    assert(e1.getMessage.contains("id_bucket"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql("ALTER TABLE pev.t.r " +
      "SET TBLPROPERTIES ('partitionedBy' = 'bucket(8,f)')"))
    assert(e2.getMessage.toLowerCase.contains("bucket"), e2.getMessage)
    val e3 = intercept[Exception](spark.sql("ALTER TABLE pev.t.r " +
      "SET TBLPROPERTIES ('partitionedBy' = '')"))
    assert(e3.getMessage.contains("UNSET"), e3.getMessage)

    // evolve, un-partition, re-evolve: the generated column binds once
    spark.sql("DROP TABLE IF EXISTS pev.t.rr")
    spark.sql("CREATE TABLE pev.t.rr (id BIGINT, v BIGINT) " +
      "USING `graft-versioned`")
    spark.sql("ALTER TABLE pev.t.rr SET TBLPROPERTIES " +
      "('partitionedBy' = 'bucket(4,id)')")
    spark.sql("ALTER TABLE pev.t.rr UNSET TBLPROPERTIES ('partitionedBy')")
    val p0 = spark.sql("SHOW TBLPROPERTIES pev.t.rr").collect()
      .map(r => r.getString(0)).toSet
    assert(!p0.contains("partitionedBy") && !p0.contains("clusterBy"))
    spark.sql("ALTER TABLE pev.t.rr SET TBLPROPERTIES " +
      "('partitionedBy' = 'bucket(4,id)')")
    assert(spark.table("pev.t.rr").schema.fieldNames
      .count(_ == "id_bucket") === 1)
    // a DIFFERENT bucket count over the same source needs a new column
    // name it cannot have: loud
    val e4 = intercept[Exception](spark.sql("ALTER TABLE pev.t.rr " +
      "SET TBLPROPERTIES ('partitionedBy' = 'bucket(16,id)')"))
    assert(e4.getMessage.contains("different generation expression"),
      e4.getMessage)
    spark.sql("INSERT INTO pev.t.rr (id, v) SELECT id, id FROM range(0, 40)")
    assert(spark.sql("SELECT count(*) FROM pev.t.rr " +
      "WHERE id_bucket != pmod(hash(id), 4)").collect()(0).getLong(0) === 0L)
  }
}
