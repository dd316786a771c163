package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** SQL CHECK constraints on versioned tables: persisted in the table
  * manifest, exposed through `Table.constraints()`, so Spark enforces
  * them on every write (CHECK_CONSTRAINT_VIOLATION) and validates
  * existing rows when one is added (NEW_CHECK_CONSTRAINT_VIOLATION —
  * the AddCheckConstraintExec scan). */
class ConstraintSpec extends AnyFunSuite with SparkSpec {

  private lazy val warehouse = {
    val w = java.nio.file.Files.createTempDirectory("graft_constraint_").toString
    spark.conf.set("spark.sql.catalog.ck", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ck.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ck.t")
    w
  }

  private def chain(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ chain(x.getCause))

  test("CHECK constraints persist and gate every write") {
    warehouse
    spark.sql("CREATE TABLE ck.t.a (id BIGINT, v BIGINT) USING `graft-versioned`")
    spark.sql("INSERT INTO ck.t.a VALUES (1, 5)")
    spark.sql("ALTER TABLE ck.t.a ADD CONSTRAINT pos CHECK (v >= 0)")
    // violating insert rejected; nothing committed
    val bad = intercept[Exception] {
      spark.sql("INSERT INTO ck.t.a VALUES (2, -1)")
    }
    assert(chain(bad).exists(_.contains("CHECK constraint pos")), chain(bad))
    assert(spark.sql("SELECT count(*) FROM ck.t.a").collect()(0).getLong(0) === 1L)
    // conforming insert passes; NULL passes (SQL CHECK semantics)
    spark.sql("INSERT INTO ck.t.a VALUES (2, 7), (3, NULL)")
    assert(spark.sql("SELECT count(*) FROM ck.t.a").collect()(0).getLong(0) === 3L)
    // the constraint is persisted — a fresh table load still carries it
    val reloaded = intercept[Exception] {
      spark.sql("INSERT INTO ck.t.a VALUES (9, -9)")
    }
    assert(chain(reloaded).exists(_.contains("CHECK constraint pos")))
    // UPDATE through the row-level path is gated too
    val badUpd = intercept[Exception] {
      spark.sql("UPDATE ck.t.a SET v = -5 WHERE id = 1")
    }
    assert(chain(badUpd).exists(_.contains("CHECK constraint pos")), chain(badUpd))
    // DROP lifts the gate
    spark.sql("ALTER TABLE ck.t.a DROP CONSTRAINT pos")
    spark.sql("INSERT INTO ck.t.a VALUES (4, -4)")
    assert(spark.sql("SELECT count(*) FROM ck.t.a WHERE v < 0")
      .collect()(0).getLong(0) === 1L)
  }

  test("CHECK constraints gate the merge-on-read delta path too") {
    warehouse
    spark.sql("CREATE TABLE ck.t.dv (id BIGINT, v BIGINT) USING `graft-versioned` " +
      "TBLPROPERTIES ('deletionVectors'='true')")
    spark.sql("INSERT INTO ck.t.dv SELECT id, id FROM range(0, 10)")
    spark.sql("ALTER TABLE ck.t.dv ADD CONSTRAINT pos CHECK (v >= 0)")
    // a violating MoR UPDATE (delta write, not ReplaceData) must be
    // rejected atomically — no version, no sidecar, no insert file
    val bad = intercept[Exception] {
      spark.sql("UPDATE ck.t.dv SET v = -5 WHERE id = 1")
    }
    assert(chain(bad).exists(_.contains("CHECK constraint pos")), chain(bad))
    assert(spark.sql("SELECT count(*) FROM ck.t.dv WHERE v < 0")
      .collect()(0).getLong(0) === 0L)
    assert(graft.operators.Versioned.versions(
      s"$warehouse/t/dv") === Seq(0L), "the violating delta must not commit")
    // a conforming MoR UPDATE passes
    spark.sql("UPDATE ck.t.dv SET v = v + 1 WHERE id = 1")
    assert(spark.sql("SELECT v FROM ck.t.dv WHERE id = 1")
      .collect()(0).getLong(0) === 2L)
  }

  test("a clone carries the source's constraints") {
    warehouse
    spark.sql("CREATE TABLE ck.t.src (id BIGINT, v BIGINT) USING `graft-versioned`")
    spark.sql("ALTER TABLE ck.t.src ADD CONSTRAINT pos CHECK (v >= 0)")
    spark.sql("INSERT INTO ck.t.src VALUES (1, 1)")
    spark.sql("CALL ck.sys.clone(source => 't.src', target => 't.srcclone')")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO ck.t.srcclone VALUES (2, -2)")
    }
    assert(chain(e).exists(_.contains("CHECK constraint pos")), chain(e))
  }

  test("adding a constraint the existing data violates fails the ALTER") {
    warehouse
    spark.sql("CREATE TABLE ck.t.b (id BIGINT, v BIGINT) USING `graft-versioned`")
    spark.sql("INSERT INTO ck.t.b VALUES (1, -1)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE ck.t.b ADD CONSTRAINT pos CHECK (v >= 0)")
    }
    assert(chain(e).exists(m => m.contains("violated by existing data") ||
      m.contains("NEW_CHECK_CONSTRAINT_VIOLATION")), chain(e))
    // the failed ALTER left nothing behind — a conforming-by-luck
    // insert is NOT gated
    spark.sql("INSERT INTO ck.t.b VALUES (2, -2)")
    assert(spark.sql("SELECT count(*) FROM ck.t.b").collect()(0).getLong(0) === 2L)
  }

  test("duplicate names and unenforceable constraint kinds are rejected") {
    warehouse
    spark.sql("CREATE TABLE ck.t.c (id BIGINT, v BIGINT) USING `graft-versioned`")
    spark.sql("ALTER TABLE ck.t.c ADD CONSTRAINT one CHECK (v >= 0)")
    val dup = intercept[Exception] {
      spark.sql("ALTER TABLE ck.t.c ADD CONSTRAINT one CHECK (v <= 10)")
    }
    assert(chain(dup).exists(m => m.contains("already exists") ||
      m.contains("one")), chain(dup))
    val missing = intercept[Exception] {
      spark.sql("ALTER TABLE ck.t.c DROP CONSTRAINT nope")
    }
    assert(chain(missing).exists(m => m.contains("nope")), chain(missing))
  }
}
