package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** `ALTER TABLE … ADD COLUMN` as a metadata-only commit: the manifest
  * evolves, no file is rewritten, and every pre-evolution file
  * null-fills the added column on read. Filters, aggregates, row-level
  * ops, and maintenance must all stay exact over the resulting
  * MIXED-schema snapshots. */
class SchemaEvolutionSpec extends AnyFunSuite with SparkSpec {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_evolve_spec_").toString

  private var n = 0
  private def freshTable(): (String, String) = {
    spark.conf.set("spark.sql.catalog.evo", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.evo.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evo.t")
    n += 1
    val name = s"evo.t.tab$n"
    spark.sql(s"CREATE TABLE $name (id BIGINT, v BIGINT) USING `graft-versioned`")
    spark.sql(s"INSERT INTO $name SELECT id, id * 10 FROM range(0, 50)")
    (name, s"$warehouse/t/tab$n")
  }

  test("ADD COLUMN is metadata-only; old rows read null, new inserts fill it") {
    val (t, root) = freshTable()
    val v0Files = graft.operators.Versioned.dataFiles(
      java.nio.file.Paths.get(s"$root/v=0"))
    spark.sql(s"ALTER TABLE $t ADD COLUMN tag STRING")
    // no data version was written, no file touched
    assert(graft.operators.Versioned.versions(s"$root") === Seq(0L))
    assert(graft.operators.Versioned.dataFiles(
      java.nio.file.Paths.get(s"$root/v=0")) === v0Files)
    assert(spark.table(t).schema.fieldNames.toSeq === Seq("id", "v", "tag"))
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE tag IS NULL")
      .collect()(0).getLong(0) === 50L)
    spark.sql(s"INSERT INTO $t SELECT id, id, 'new' FROM range(100, 110)")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 60L)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE tag = 'new'")
      .collect()(0).getLong(0) === 10L)
    // the filter on the evolved column refutes pre-evolution files at
    // planning, yet IS NULL keeps them
    assert(spark.sql(s"SELECT sum(id) FROM $t WHERE tag IS NULL")
      .collect()(0).getLong(0) === (0L until 50L).sum)
  }

  test("aggregates refuse footer pushdown on the evolved column but stay exact") {
    val (t, _) = freshTable()
    spark.sql(s"ALTER TABLE $t ADD COLUMN w BIGINT")
    spark.sql(s"INSERT INTO $t SELECT id, id, id * 2 FROM range(1000, 1010)")
    val q = spark.sql(s"SELECT count(w) AS n, min(w) AS mn, max(w) AS mx, count(*) AS all FROM $t")
    val r = q.collect()(0)
    assert(r.getLong(0) === 10L)
    assert(r.getLong(1) === 2000L && r.getLong(2) === 2018L)
    assert(r.getLong(3) === 60L)
  }

  test("UPDATE and DELETE stay exact across mixed-schema files") {
    val (t, _) = freshTable()
    spark.sql(s"ALTER TABLE $t ADD COLUMN tag STRING")
    spark.sql(s"INSERT INTO $t SELECT id, id, 'x' FROM range(50, 60)")
    spark.sql(s"UPDATE $t SET tag = 'old' WHERE tag IS NULL AND id % 2 = 0")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE tag = 'old'")
      .collect()(0).getLong(0) === 25L)
    spark.sql(s"DELETE FROM $t WHERE tag = 'x' AND id % 2 = 1")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 55L)
    // metadata-path delete over mixed files keeps the evolved column
    spark.sql(s"DELETE FROM $t WHERE id >= 55 AND id < 100")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE tag IS NOT NULL")
      .collect()(0).getLong(0) ===
      25L /* 'old' evens < 50 */ + 3L /* 'x' evens 50, 52, 54 */)
  }

  test("compaction preserves the evolved column over mixed files") {
    val (t, root) = freshTable()
    spark.sql(s"ALTER TABLE $t ADD COLUMN tag STRING")
    spark.sql(s"INSERT INTO $t SELECT id, id, 'y' FROM range(50, 60)")
    spark.sql(s"CALL evo.sys.compact(table => 't.tab$n')")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE tag = 'y'")
      .collect()(0).getLong(0) === 10L)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE tag IS NULL")
      .collect()(0).getLong(0) === 50L)
  }

  test("layout TBLPROPERTIES can be set after creation; fail-loud matrix") {
    val (t, root) = freshTable()
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('clusterBy'='id', 'writePartitions'='3')")
    spark.sql(s"INSERT OVERWRITE $t SELECT id, id FROM range(0, 3000)")
    val files = graft.operators.Versioned.dataFiles(
      java.nio.file.Paths.get(s"$root/v=1"))
    assert(files.size === 3, s"writePartitions should control file count: $files")
    // disjoint id spans prove the cluster sort applied
    val spans = files.map { f =>
      val r = spark.read.parquet(f.toString)
        .agg(org.apache.spark.sql.functions.min("id"),
             org.apache.spark.sql.functions.max("id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) => assert(aMax < bMin, s"overlap: $spans")
      case _ => ()
    }

    def fails(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      def chain(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
      assert(chain(e).exists(m => m != null && m.contains(frag)),
        s"expected '$frag' in ${chain(e)}")
    }
    fails(s"ALTER TABLE $t ADD COLUMN id STRING", "already exists")
    fails(s"ALTER TABLE $t ADD COLUMN b BIGINT NOT NULL", "must be nullable")
    fails(s"ALTER TABLE $t ADD COLUMN m MAP<STRING,STRING>", "unsupported column type")
    fails(s"ALTER TABLE $t DROP COLUMN v", "immutable history")
    fails(s"ALTER TABLE $t RENAME COLUMN v TO w", "immutable history")
    fails(s"ALTER TABLE $t SET TBLPROPERTIES ('clusterBy'='nope')",
      "not in table schema")
  }

  test("time travel applies the evolved schema to old snapshots (null-filled)") {
    val (t, _) = freshTable()
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(50, 60)") // v=1
    spark.sql(s"ALTER TABLE $t ADD COLUMN tag STRING")
    spark.sql(s"INSERT INTO $t SELECT id, id, 'z' FROM range(60, 70)") // v=2
    val v1 = spark.sql(s"SELECT * FROM $t VERSION AS OF 1")
    assert(v1.schema.fieldNames.toSeq === Seq("id", "v", "tag"))
    assert(v1.count() === 60L)
    assert(v1.where("tag IS NOT NULL").count() === 0L)
  }
}
