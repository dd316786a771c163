package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Versioned

/** Protocol reader-feature flags (`_graft_protocol`): commits that
  * change what a correct read IS (deletion vectors, column mapping)
  * flag the table, and a build lacking a flagged feature refuses the
  * table loudly instead of silently returning wrong rows. */
class ProtocolSpec extends AnyFunSuite with SparkSpec {

  private lazy val warehouse =
    Files.createTempDirectory("graft_protocol_spec_").toString

  private var n = 0
  private def freshTable(props: String = ""): (String, String) = {
    spark.conf.set("spark.sql.catalog.proto", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.proto.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS proto.t")
    n += 1
    val name = s"proto.t.tab$n"
    spark.sql(s"CREATE TABLE $name (id BIGINT, v BIGINT) USING `graft-versioned` $props")
    spark.sql(s"INSERT INTO $name SELECT id, id * 10 FROM range(0, 50)")
    (name, s"$warehouse/t/tab$n")
  }

  private def plant(root: String, lines: String): Unit =
    Files.write(Paths.get(root, "_graft_protocol"),
      lines.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  test("a plain table has no protocol file and no requirements") {
    val (t, root) = freshTable()
    assert(!Files.exists(Paths.get(root, "_graft_protocol")))
    assert(Versioned.readerFeatures(root) === Set.empty[String])
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 50L)
  }

  test("a DV-mode DELETE flags deletion-vectors; reads keep working") {
    val (t, root) = freshTable("TBLPROPERTIES ('deletionVectors'='true')")
    spark.sql(s"DELETE FROM $t WHERE id % 5 = 0")
    assert(Versioned.readerFeatures(root) === Set("deletion-vectors"))
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 40L)
    // time travel to the pre-DV snapshot still passes the gate — the
    // requirement is table-level, and this build supports the feature
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 0")
      .collect()(0).getLong(0) === 50L)
  }

  test("RENAME COLUMN flags column-mapping") {
    val (t, root) = freshTable()
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO w")
    assert(Versioned.readerFeatures(root) === Set("column-mapping"))
    assert(spark.sql(s"SELECT sum(w) FROM $t").collect()(0).getLong(0)
      === (0L until 50L).map(_ * 10).sum)
  }

  test("features accumulate in one sorted file") {
    val (t, root) = freshTable("TBLPROPERTIES ('deletionVectors'='true')")
    spark.sql(s"DELETE FROM $t WHERE id = 7")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO w")
    assert(Versioned.readerFeatures(root)
      === Set("deletion-vectors", "column-mapping"))
    // each feature flags BOTH halves: readers must understand the
    // representation, writers must maintain it
    assert(new String(Files.readAllBytes(Paths.get(root, "_graft_protocol")))
      === "reader column-mapping\nreader deletion-vectors\n" +
        "writer column-mapping\nwriter deletion-vectors")
  }

  test("an unknown required feature fails every reader loudly, naming it") {
    val (t, root) = freshTable()
    plant(root, "reader rle-pages-v9")
    // catalog SQL read
    val e1 = intercept[Exception](spark.sql(s"SELECT * FROM $t").collect())
    assert(e1.getMessage.contains("rle-pages-v9"), e1.getMessage)
    assert(e1.getMessage.contains("deletion-vectors")) // supported set named
    // path-API read
    val e2 = intercept[IllegalStateException](
      Versioned.read(spark, root).collect())
    assert(e2.getMessage.contains("rle-pages-v9"))
    // DSv2 path load
    val e3 = intercept[Exception](
      spark.read.format("graft-versioned").load(root).collect())
    assert(e3.getMessage.contains("rle-pages-v9"), e3.getMessage)
    // writes are refused too — a build that can't read the table can't
    // safely extend its history
    val e4 = intercept[Exception](
      spark.sql(s"INSERT INTO $t VALUES (999, 999)"))
    assert(e4.getMessage.contains("rle-pages-v9"), e4.getMessage)
    // un-flagging restores the table untouched
    Files.delete(Paths.get(root, "_graft_protocol"))
    assert(spark.sql(s"SELECT count(*) FROM proto.t.tab$n")
      .collect()(0).getLong(0) === 50L)
  }

  test("known required features pass; unknown non-reader lines are ignored") {
    val (t, root) = freshTable()
    plant(root, "reader deletion-vectors\nwriter somefuture x\n# note")
    assert(Versioned.readerFeatures(root) === Set("deletion-vectors"))
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 50L)
  }

  test("cloneTo carries the source's requirements; an unreadable source refuses") {
    val (t, root) = freshTable("TBLPROPERTIES ('deletionVectors'='true')")
    spark.sql(s"DELETE FROM $t WHERE id % 2 = 0")
    val dst = Files.createTempDirectory("graft_protocol_clone_").toString
    Versioned.cloneTo(root, dst)
    assert(Versioned.readerFeatures(dst) === Set("deletion-vectors"))
    assert(Versioned.read(spark, dst).count() === 25L)
    // a source requiring an unknown feature cannot be cloned — the
    // carry logic would not know its sidecar kinds
    plant(root, "reader rle-pages-v9")
    val dst2 = Files.createTempDirectory("graft_protocol_clone2_").toString
    val e = intercept[IllegalStateException](Versioned.cloneTo(root, dst2))
    assert(e.getMessage.contains("rle-pages-v9"))
  }

  test("sys.drop_feature lifts deletion-vectors only when no version carries DVs") {
    val (t, root) = freshTable("TBLPROPERTIES ('deletionVectors'='true')")
    spark.sql(s"DELETE FROM $t WHERE id % 5 = 0") // v=1, DV sidecars
    assert(Versioned.readerFeatures(root) === Set("deletion-vectors"))
    // refused while v=1 still carries sidecars — names the version
    val e = intercept[Exception](spark.sql(
      s"CALL proto.sys.drop_feature(table => 't.tab$n', " +
        "feature => 'deletion-vectors')"))
    assert(e.getMessage.contains("v=1"), e.getMessage)
    // materialize (compact) then age out the flagged history
    spark.sql(s"CALL proto.sys.compact(table => 't.tab$n')") // v=2, no DVs
    spark.sql(s"CALL proto.sys.retain(table => 't.tab$n', keep => 1)")
    spark.sql(s"CALL proto.sys.drop_feature(table => 't.tab$n', " +
      "feature => 'deletion-vectors')")
    assert(Versioned.readerFeatures(root) === Set.empty[String])
    assert(!Files.exists(Paths.get(root, "_graft_protocol")))
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 40L)
    // a later DV DELETE re-earns the flag
    spark.sql(s"DELETE FROM $t WHERE id = 1")
    assert(Versioned.readerFeatures(root) === Set("deletion-vectors"))
  }

  test("sys.drop_feature lifts column-mapping only once the mapping is identity") {
    val (t, root) = freshTable()
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO w")
    assert(Versioned.readerFeatures(root) === Set("column-mapping"))
    val e = intercept[Exception](spark.sql(
      s"CALL proto.sys.drop_feature(table => 't.tab$n', " +
        "feature => 'column-mapping')"))
    assert(e.getMessage.contains("carries information"), e.getMessage)
    // rename back: the mapping becomes identity (w never wrote files)
    spark.sql(s"ALTER TABLE $t RENAME COLUMN w TO v")
    spark.sql(s"CALL proto.sys.drop_feature(table => 't.tab$n', " +
      "feature => 'column-mapping')")
    assert(Versioned.readerFeatures(root) === Set.empty[String])
    assert(spark.sql(s"SELECT sum(v) FROM $t").collect()(0).getLong(0)
      === (0L until 50L).map(_ * 10).sum)
    // dropping an un-flagged feature is loud
    val e2 = intercept[Exception](spark.sql(
      s"CALL proto.sys.drop_feature(table => 't.tab$n', " +
        "feature => 'deletion-vectors')"))
    assert(e2.getMessage.contains("not a required reader feature"), e2.getMessage)
  }

  // ------------------------------------------- writer-feature matrix

  test("an unknown required WRITER feature refuses commits but not reads") {
    val (t, root) = freshTable()
    plant(root, "writer row-tracking-v9")
    // reads stay open: writer features gate commits, not scans
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 50L)
    assert(Versioned.writerFeatures(root) === Set("row-tracking-v9"))
    // every commit path refuses, naming the feature and the supported set
    val e1 = intercept[Exception](
      spark.sql(s"INSERT INTO $t VALUES (999, 999)"))
    def chain(x: Throwable): String =
      if (x == null) "" else x.getMessage + "||" + chain(x.getCause)
    assert(chain(e1).contains("row-tracking-v9"), chain(e1))
    assert(chain(e1).contains("append-only")) // supported set named
    val e2 = intercept[Exception](spark.sql(s"DELETE FROM $t WHERE id = 1"))
    assert(chain(e2).contains("row-tracking-v9"), chain(e2))
    val e3 = intercept[Exception](
      Versioned.writeNext(spark.range(3).toDF("id"), root))
    assert(chain(e3).contains("row-tracking-v9"))
    // un-flagging restores writability
    Files.delete(Paths.get(root, "_graft_protocol"))
    spark.sql(s"INSERT INTO $t VALUES (999, 999)")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 51L)
  }

  test("appendOnly: inserts pass, every mutation verb is refused loudly") {
    val (t, root) = freshTable("TBLPROPERTIES ('appendOnly'='true')")
    // creation flagged the writer feature
    assert(Versioned.writerFeatures(root) === Set("append-only"))
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(100, 110)") // fine
    def refused(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      def chain(x: Throwable): String =
        if (x == null) "" else x.getMessage + "||" + chain(x.getCause)
      assert(chain(e).contains("appendOnly"), s"$sql -> ${chain(e)}")
    }
    refused(s"DELETE FROM $t WHERE id = 1")
    refused(s"UPDATE $t SET v = 0 WHERE id = 1")
    refused(s"MERGE INTO $t USING (SELECT 1L AS id, 2L AS v) s ON $t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET v = s.v")
    refused(s"INSERT OVERWRITE $t SELECT id, id FROM range(5)")
    refused(s"TRUNCATE TABLE $t")
    // the table still hash-matches its pure insert history
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 60L)
    assert(spark.sql(s"SELECT sum(v) FROM $t").collect()(0).getLong(0)
      === (0L until 50L).map(_ * 10).sum + (100L until 110L).sum)
  }

  test("appendOnly: the ROOT's protocol flag binds path-based writers too") {
    // a writer arriving through the raw path route (no catalog, no
    // appendOnly option) must still honor the protocol-flagged
    // append-only invariant — otherwise the writer feature protects
    // nothing (the access route is not part of the promise)
    val (t, root) = freshTable("TBLPROPERTIES ('appendOnly'='true')")
    def chain(x: Throwable): String =
      if (x == null) "" else x.getMessage + "||" + chain(x.getCause)
    // path-based overwrite: refused by the root flag alone
    val e1 = intercept[Exception](
      spark.range(5).selectExpr("id", "id AS v")
        .write.format("graft-versioned").mode("overwrite").save(root))
    assert(chain(e1).contains("appendOnly"), chain(e1))
    // even an explicit appendOnly=false option cannot out-vote the root
    val e2 = intercept[Exception](
      spark.range(5).selectExpr("id", "id AS v")
        .write.format("graft-versioned").option("appendOnly", "false")
        .mode("overwrite").save(root))
    assert(chain(e2).contains("appendOnly"), chain(e2))
    // path-based APPEND stays legal — append-only forbids mutation,
    // not inserts
    spark.range(200, 205).selectExpr("id", "id AS v")
      .write.format("graft-versioned").mode("append").save(root)
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 55L)
  }

  test("drop_feature('append-only') needs the property unset first") {
    val (t, root) = freshTable("TBLPROPERTIES ('appendOnly'='true')")
    val e = intercept[Exception](spark.sql(
      s"CALL proto.sys.drop_feature(table => 't.tab$n', " +
        "feature => 'append-only')"))
    assert(e.getMessage.contains("UNSET TBLPROPERTIES"), e.getMessage)
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES ('appendOnly')")
    spark.sql(s"CALL proto.sys.drop_feature(table => 't.tab$n', " +
      "feature => 'append-only')")
    assert(Versioned.writerFeatures(root) === Set.empty[String])
    // mutations work again
    spark.sql(s"DELETE FROM $t WHERE id = 1")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 49L)
  }

  test("CHECK constraints flag (and drop with) the check-constraints writer feature") {
    val (t, root) = freshTable()
    spark.sql(s"ALTER TABLE $t ADD CONSTRAINT v_pos CHECK (v >= 0)")
    assert(Versioned.writerFeatures(root) === Set("check-constraints"))
    // refused while a constraint still exists — names it
    val e = intercept[Exception](spark.sql(
      s"CALL proto.sys.drop_feature(table => 't.tab$n', " +
        "feature => 'check-constraints')"))
    assert(e.getMessage.contains("v_pos"), e.getMessage)
    spark.sql(s"ALTER TABLE $t DROP CONSTRAINT v_pos")
    spark.sql(s"CALL proto.sys.drop_feature(table => 't.tab$n', " +
      "feature => 'check-constraints')")
    assert(Versioned.writerFeatures(root) === Set.empty[String])
  }

  test("concurrent feature flaggers never lose a flag; the file is never torn") {
    val root = Files.createTempDirectory("graft_protocol_conc_").toString
    val features = Seq("deletion-vectors", "column-mapping")
    val threads = (0 until 8).map { i =>
      new Thread(() => (0 until 20).foreach { _ =>
        Versioned.requireReaderFeature(Paths.get(root), features(i % 2))
        Versioned.requireWriterFeature(Paths.get(root), features((i + 1) % 2))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(Versioned.readerFeatures(root)
      === Set("deletion-vectors", "column-mapping"))
    assert(Versioned.writerFeatures(root)
      === Set("deletion-vectors", "column-mapping"))
  }

  test("requireReaderFeature is idempotent and refuses unsupported flags") {
    val root = Files.createTempDirectory("graft_protocol_req_").toString
    Versioned.requireReaderFeature(Paths.get(root), "deletion-vectors")
    Versioned.requireReaderFeature(Paths.get(root), "deletion-vectors")
    assert(Versioned.readerFeatures(root) === Set("deletion-vectors"))
    intercept[IllegalArgumentException](
      Versioned.requireReaderFeature(Paths.get(root), "made-up"))
  }
}
