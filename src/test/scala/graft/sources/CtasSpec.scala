package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the DDL surface that works "for free" through the DSv2
  * protocol so it can never silently regress: CTAS, CREATE OR REPLACE
  * TABLE AS SELECT, and NOT NULL column enforcement (Spark's
  * NOT_NULL_ASSERT on the write path — the table's declared
  * nullability is part of the contract the engine enforces). */
class CtasSpec extends AnyFunSuite with SparkSpec {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_ctas_spec_").toString

  private def cat(): Unit = {
    spark.conf.set("spark.sql.catalog.ct", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ct.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ct.t")
  }

  test("CTAS creates and loads in one statement; RTAS replaces the contract") {
    cat()
    spark.sql("DROP TABLE IF EXISTS ct.t.c1")
    spark.sql("CREATE TABLE ct.t.c1 USING `graft-versioned` AS " +
      "SELECT id, id * 2 AS v FROM range(0, 10)")
    assert(spark.table("ct.t.c1").count() === 10L)
    assert(spark.sql("SELECT sum(v) FROM ct.t.c1").collect()(0).getLong(0)
      === (0L until 10L).map(_ * 2).sum)
    // CREATE OR REPLACE swaps schema AND content
    spark.sql("CREATE OR REPLACE TABLE ct.t.c1 USING `graft-versioned` AS " +
      "SELECT id, concat('r', id) AS tag FROM range(0, 3)")
    assert(spark.table("ct.t.c1").schema.fieldNames.toSeq === Seq("id", "tag"))
    assert(spark.table("ct.t.c1").count() === 3L)
    // and the replaced table keeps working as a normal versioned table
    spark.sql("INSERT INTO ct.t.c1 VALUES (100, 'x')")
    assert(spark.table("ct.t.c1").count() === 4L)
  }

  test("atomic RTAS preserves history; aborted staged DDL leaves no trace") {
    cat()
    spark.sql("DROP TABLE IF EXISTS ct.t.c4")
    spark.sql("DROP TABLE IF EXISTS ct.t.c5")
    spark.sql("CREATE TABLE ct.t.c4 USING `graft-versioned` AS " +
      "SELECT id, id * 2 AS v FROM range(0, 10)")
    val root = s"$warehouse/t/c4"
    assert(graft.operators.Versioned.versions(root) === Seq(0L))
    // REPLACE lands as ONE truncate commit on the SAME root — history
    // survives (Delta's REPLACE semantics), unlike drop+recreate
    spark.sql("CREATE OR REPLACE TABLE ct.t.c4 USING `graft-versioned` AS " +
      "SELECT id, concat('x', id) AS tag FROM range(0, 4)")
    assert(graft.operators.Versioned.versions(root) === Seq(0L, 1L))
    assert(spark.table("ct.t.c4").count() === 4L)
    // time travel to the pre-replace snapshot still works; its files
    // read through the NEW contract (the global-manifest discipline):
    // id survives, tag null-fills
    val v0 = spark.sql("SELECT id, tag FROM ct.t.c4 VERSION AS OF 0")
    assert(v0.count() === 10L)
    assert(v0.filter("tag IS NULL").count() === 10L)
    // REPLACE without AS SELECT commits an EMPTY truncate version
    spark.sql("CREATE OR REPLACE TABLE ct.t.c4 (id BIGINT, note STRING) " +
      "USING `graft-versioned`")
    assert(spark.table("ct.t.c4").count() === 0L)
    assert(graft.operators.Versioned.versions(root) === Seq(0L, 1L, 2L))
    // aborted staged CREATE: the failing query leaves NO table behind
    intercept[Exception](spark.sql(
      "CREATE TABLE ct.t.c5 USING `graft-versioned` AS " +
        "SELECT raise_error('boom') AS x FROM range(1)"))
    assert(!spark.catalog.tableExists("ct.t.c5"))
    intercept[Exception](spark.table("ct.t.c5").count())
    // aborted staged REPLACE: the old table and history stay intact
    intercept[Exception](spark.sql(
      "CREATE OR REPLACE TABLE ct.t.c4 USING `graft-versioned` AS " +
        "SELECT raise_error('boom') AS x FROM range(1)"))
    assert(spark.table("ct.t.c4").count() === 0L)
    assert(graft.operators.Versioned.versions(root) === Seq(0L, 1L, 2L))
    assert(spark.table("ct.t.c4").schema.fieldNames.toSeq === Seq("id", "note"))
  }

  test("RTAS carries renamed columns' bindings into pre-replace time travel") {
    cat()
    spark.sql("DROP TABLE IF EXISTS ct.t.c7")
    spark.sql("CREATE TABLE ct.t.c7 (id BIGINT, price BIGINT) " +
      "USING `graft-versioned`")
    spark.sql("INSERT INTO ct.t.c7 VALUES (1, 100), (2, 200)")
    // metadata-only rename: files keep physical birth name 'price'
    spark.sql("ALTER TABLE ct.t.c7 RENAME COLUMN price TO cost")
    spark.sql("CREATE OR REPLACE TABLE ct.t.c7 USING `graft-versioned` AS " +
      "SELECT CAST(5 AS BIGINT) AS id, CAST(500 AS BIGINT) AS cost, " +
      "'n' AS note")
    // current content is the replacement
    val cur = spark.sql("SELECT id, cost, note FROM ct.t.c7").collect()
    assert(cur.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      === Seq((5L, 500L, "n")))
    // pre-replace snapshot through the NEW contract: `cost` SURFACES
    // its data (the old files DO carry it, under physical 'price' —
    // the REPLACE must not sever the binding); `note` null-fills
    // (those files never had it)
    val v0 = spark.sql(
      "SELECT id, cost, note FROM ct.t.c7 VERSION AS OF 0 ORDER BY id")
      .collect()
    assert(v0.map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((1L, 100L), (2L, 200L)),
      "renamed column's pre-replace data must survive the REPLACE")
    assert(v0.forall(_.isNullAt(2)), "never-present column null-fills")
  }

  test("aborted RTAS leaves the GENERATED/IDENTITY contract binding") {
    cat()
    spark.sql("DROP TABLE IF EXISTS ct.t.c8")
    spark.sql("CREATE TABLE ct.t.c8 (x BIGINT, " +
      "y BIGINT GENERATED ALWAYS AS (x * 2)) USING `graft-versioned`")
    spark.sql("INSERT INTO ct.t.c8 (x) VALUES (1)")
    // the failing staged REPLACE must not strip the generation
    // manifest — it stays in place during staging (a crash between
    // stage and commit, where abort never runs, must also keep it)
    intercept[Exception](spark.sql(
      "CREATE OR REPLACE TABLE ct.t.c8 USING `graft-versioned` AS " +
        "SELECT raise_error('boom') AS x FROM range(1)"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$warehouse/t/c8/_graft_generated")),
      "generation manifest survives an aborted staged REPLACE")
    spark.sql("INSERT INTO ct.t.c8 (x) VALUES (5)")
    assert(spark.sql("SELECT y FROM ct.t.c8 WHERE x = 5")
      .collect()(0).getLong(0) === 10L, "generation still computes")
    def chain(x: Throwable): String =
      if (x == null) "" else x.getMessage + "||" + chain(x.getCause)
    val e = intercept[Exception](
      spark.sql("INSERT INTO ct.t.c8 VALUES (7, 0)"))
    assert(chain(e).contains("GENERATED ALWAYS"), chain(e))
    // a COMMITTED replace without auto columns clears the contract
    spark.sql("CREATE OR REPLACE TABLE ct.t.c8 USING `graft-versioned` AS " +
      "SELECT CAST(1 AS BIGINT) AS x, CAST(0 AS BIGINT) AS y")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$warehouse/t/c8/_graft_generated")))
    spark.sql("INSERT INTO ct.t.c8 VALUES (7, 0)") // no enforcement left
    assert(spark.table("ct.t.c8").count() === 2L)
  }

  test("staged REPLACE refuses an appendOnly table (the audit contract)") {
    cat()
    spark.sql("DROP TABLE IF EXISTS ct.t.c6")
    spark.sql("CREATE TABLE ct.t.c6 (id BIGINT) USING `graft-versioned` " +
      "TBLPROPERTIES ('appendOnly'='true')")
    spark.sql("INSERT INTO ct.t.c6 VALUES (1), (2)")
    def chain(x: Throwable): String =
      if (x == null) "" else x.getMessage + "||" + chain(x.getCause)
    val e1 = intercept[Exception](spark.sql(
      "CREATE OR REPLACE TABLE ct.t.c6 (id BIGINT) USING `graft-versioned`"))
    assert(chain(e1).contains("appendOnly"), chain(e1))
    val e2 = intercept[Exception](spark.sql(
      "CREATE OR REPLACE TABLE ct.t.c6 USING `graft-versioned` AS " +
        "SELECT id FROM range(1)"))
    assert(chain(e2).contains("appendOnly"), chain(e2))
    assert(spark.table("ct.t.c6").count() === 2L, "content untouched")
  }

  test("CTAS with PARTITIONED BY clusters the staged write itself") {
    cat()
    spark.sql("DROP TABLE IF EXISTS ct.t.c10")
    spark.sql("CREATE TABLE ct.t.c10 USING `graft-versioned` " +
      "PARTITIONED BY (g) TBLPROPERTIES ('writePartitions'='4') AS " +
      "SELECT id, CAST(id % 4 AS BIGINT) AS g FROM range(0, 400)")
    val props = spark.sql("SHOW TBLPROPERTIES ct.t.c10").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("partitionedBy").contains("g"), props)
    assert(props.get("clusterBy").contains("g"), props)
    // the STAGED write already range-clustered: a partition predicate
    // prunes v=0's files without any post-hoc OPTIMIZE
    val probe = spark.sql("SELECT id FROM ct.t.c10 WHERE g = 2")
    probe.collect()
    val m = "DataFiles: (\\d+)/(\\d+)".r
      .findFirstMatchIn(probe.queryExecution.executedPlan.toString)
    assert(m.isDefined)
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"CTAS partition layout must prune (${m.get})")
    assert(probe.queryExecution.executedPlan.toString.nonEmpty)
    assert(spark.sql("SELECT count(*) FROM ct.t.c10 WHERE g = 2")
      .collect()(0).getLong(0) === 100L)
  }

  test("DEFAULT values fill omitted columns and the DEFAULT keyword") {
    cat()
    spark.sql("DROP TABLE IF EXISTS ct.t.c3")
    spark.sql("CREATE TABLE ct.t.c3 (id BIGINT, status STRING DEFAULT 'new', " +
      "score BIGINT DEFAULT 7) USING `graft-versioned`")
    spark.sql("INSERT INTO ct.t.c3 (id) VALUES (1)")
    spark.sql("INSERT INTO ct.t.c3 VALUES (2, DEFAULT, DEFAULT)")
    spark.sql("INSERT INTO ct.t.c3 VALUES (3, 'done', 0)")
    val rows = spark.sql("SELECT id, status, score FROM ct.t.c3 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, "new", 7L), (2L, "new", 7L), (3L, "done", 0L)))
    // the default survives a fresh table resolution (it lives in the
    // schema manifest, not the session)
    spark.sql("REFRESH TABLE ct.t.c3")
    spark.sql("INSERT INTO ct.t.c3 (id) VALUES (4)")
    assert(spark.sql("SELECT status FROM ct.t.c3 WHERE id = 4")
      .collect()(0).getString(0) === "new")
    // ADD COLUMN with a DEFAULT keeps refusing: pre-existing rows would
    // need an exists-default read the null-fill contract doesn't have
    val e = intercept[Exception](
      spark.sql("ALTER TABLE ct.t.c3 ADD COLUMN extra STRING DEFAULT 'x'"))
    def chain(x: Throwable): String =
      if (x == null) "" else x.getMessage + "||" + chain(x.getCause)
    assert(chain(e).toLowerCase.contains("default"), chain(e))
  }

  test("NOT NULL columns refuse null writes; nullable columns accept them") {
    cat()
    spark.sql("DROP TABLE IF EXISTS ct.t.c2")
    spark.sql("CREATE TABLE ct.t.c2 (id BIGINT NOT NULL, v BIGINT) " +
      "USING `graft-versioned`")
    spark.sql("INSERT INTO ct.t.c2 VALUES (1, CAST(null AS BIGINT))")
    val e = intercept[Exception](
      spark.sql("INSERT INTO ct.t.c2 VALUES (CAST(null AS BIGINT), 1)"))
    def chain(x: Throwable): String =
      if (x == null) "" else x.getMessage + "||" + chain(x.getCause)
    assert(chain(e).contains("NOT_NULL") || chain(e).toLowerCase.contains("null"),
      chain(e))
    assert(spark.table("ct.t.c2").count() === 1L,
      "the refused insert must not have committed")
  }
}
