package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Versioned

/** Version tags — Iceberg's named snapshot refs: immutable name →
  * version bindings, readable via `VERSION AS OF 'name'` and
  * `versionAsOf`, protected from retention and rollback. */
class TagSpec extends AnyFunSuite with SparkSpec {

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft_tag_spec_").toString
    spark.conf.set("spark.sql.catalog.tg", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tg.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tg.ns")
    w
  }

  private var n = 0
  private def fresh(): (String, String) = {
    warehouse // force catalog registration before any SQL
    n += 1
    val t = s"tg.ns.t$n"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT) USING `graft-versioned`")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 10)")      // v=0
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(10, 30)")     // v=1
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(30, 60)")     // v=2
    (t, s"$warehouse/ns/t$n")
  }

  test("tag resolves by name on both the SQL and path read APIs") {
    val (t, root) = fresh()
    spark.sql(s"CALL tg.sys.tag(table => 'ns.t$n', name => 'train-v1', version => 1)")
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 'train-v1'")
      .collect()(0).getLong(0) === 30L)
    assert(spark.read.format("graft-versioned")
      .option("versionAsOf", "train-v1").load(root).count() === 30L)
    // numeric refs keep working
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 0")
      .collect()(0).getLong(0) === 10L)
    // sys.tags lists the binding
    assert(spark.sql("CALL tg.sys.tags(table => 'ns.t" + n + "')")
      .collect().map(_.toString).toSeq === Seq("[train-v1,1]"))
    // sys.history carries the tag on its version's row
    spark.sql(s"CALL tg.sys.tag(table => 'ns.t$n', name => 'also-v1', version => 1)")
    val hist = spark.sql(s"CALL tg.sys.history(table => 'ns.t$n')")
      .collect().map(r => r.getLong(0) -> r.getString(8)).toMap
    assert(hist === Map(2L -> "", 1L -> "also-v1,train-v1", 0L -> ""))
  }

  test("tag defaults to latest; bindings are immutable; untag frees the name") {
    val (_, root) = fresh()
    val v = spark.sql(s"CALL tg.sys.tag(table => 'ns.t$n', name => 'cur')")
      .collect()(0).getLong(0)
    assert(v === 2L)
    val e = intercept[Exception](spark.sql(
      s"CALL tg.sys.tag(table => 'ns.t$n', name => 'cur', version => 0)"))
    assert(e.getMessage.contains("already points at v=2"), e.getMessage)
    val was = spark.sql(s"CALL tg.sys.untag(table => 'ns.t$n', name => 'cur')")
      .collect()(0).getLong(0)
    assert(was === 2L)
    assert(Versioned.tags(root).isEmpty)
    spark.sql(s"CALL tg.sys.tag(table => 'ns.t$n', name => 'cur', version => 0)")
    assert(Versioned.tags(root) === Map("cur" -> 0L))
  }

  test("retention keeps tagged versions alive; rollback refuses a tagged tip") {
    val (t, root) = fresh()
    spark.sql(s"CALL tg.sys.tag(table => 'ns.t$n', name => 'keep-me', version => 0)")
    spark.sql(s"CALL tg.sys.retain(table => 'ns.t$n', keep => 1)")
    assert(Versioned.versions(root) === Seq(0L, 2L)) // v=1 died, tagged v=0 lives
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 'keep-me'")
      .collect()(0).getLong(0) === 10L)
    spark.sql(s"CALL tg.sys.tag(table => 'ns.t$n', name => 'tip', version => 2)")
    val e = intercept[Exception](spark.sql(
      s"CALL tg.sys.rollback(table => 'ns.t$n')"))
    assert(e.getMessage.contains("tagged 'tip'"), e.getMessage)
    spark.sql(s"CALL tg.sys.untag(table => 'ns.t$n', name => 'tip')")
    assert(spark.sql(s"CALL tg.sys.rollback(table => 'ns.t$n')")
      .collect()(0).getLong(0) === 0L)
  }

  test("clone and restore resolve tag refs (branch from / roll back to a name)") {
    val (t, root) = fresh()
    spark.sql(s"CALL tg.sys.tag(table => 'ns.t$n', name => 'snap', version => 1)")
    // branch from the tagged snapshot: the clone's v=0 IS v=1's content
    spark.sql(s"CALL tg.sys.clone(source => 'ns.t$n', " +
      s"target => 'ns.branch$n', ref => 'snap')")
    assert(spark.sql(s"SELECT count(*) FROM tg.ns.branch$n")
      .collect()(0).getLong(0) === 30L)
    // numeric refs work too
    spark.sql(s"CALL tg.sys.clone(source => 'ns.t$n', " +
      s"target => 'ns.branch0_$n', ref => '0')")
    assert(spark.sql(s"SELECT count(*) FROM tg.ns.branch0_$n")
      .collect()(0).getLong(0) === 10L)
    // restore the source back to the tag: a NEW commit with v=1's rows
    val cur = spark.sql(s"CALL tg.sys.restore(table => 'ns.t$n', ref => 'snap')")
      .collect()(0).getLong(0)
    assert(cur === 3L)
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 30L)
    // exactly one of version/ref
    val e = intercept[Exception](spark.sql(
      s"CALL tg.sys.restore(table => 'ns.t$n', version => 1, ref => 'snap')"))
    assert(e.getMessage.contains("exactly ONE of version => n"), e.getMessage)
    intercept[Exception](spark.sql(s"CALL tg.sys.restore(table => 'ns.t$n')"))
  }

  test("streams and batch CDF accept tag refs for version bounds") {
    warehouse
    n += 1
    val t = s"tg.ns.t$n"
    val root = s"$warehouse/ns/t$n"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT) USING `graft-versioned` " +
      "TBLPROPERTIES ('changeFeedKeys'='id')")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 10)")   // v=0
    spark.sql(s"CALL tg.sys.tag(table => 'ns.t$n', name => 'rel', version => 0)")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(10, 25)")  // v=1
    // batch CDF: "changes SINCE the rel release" — (rel, latest] by name
    val since = spark.read.format("graft-versioned")
      .option("changeFeed", "true").option("startingVersion", "rel")
      .load(root)
    assert(since.where("commit_version = 0").count() === 10L)
    assert(since.count() === 25L)
    val after = spark.read.format("graft-versioned")
      .option("changeFeed", "true").option("startingVersion", "1")
      .option("endingVersion", "rel").load(root)
    // inverted by resolution (1 > 0) — still loud
    val e = intercept[Exception](after.collect())
    assert(e.getMessage.contains("startingVersion 1 > endingVersion 0"))
    // the table stream replays from the tag (no snapshot): v=0's files
    val ckpt = java.nio.file.Files.createTempDirectory("tag_stream_").toString
    val q = spark.readStream.format("graft-versioned")
      .option("startingVersion", "rel").load(root)
      .writeStream.format("memory").queryName(s"tag_stream_$n")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table(s"tag_stream_$n").count() === 25L)
  }

  test("fail-loud: unknown refs, malformed names, missing versions") {
    val (t, root) = fresh()
    val e1 = intercept[Exception](spark.sql(
      s"SELECT * FROM $t VERSION AS OF 'no-such-tag'").collect())
    assert(e1.getMessage.contains("neither a version number nor a tag"),
      e1.getMessage)
    val e2 = intercept[Exception](
      Versioned.tagVersion(root, "9starts-with-digit", Some(0L)))
    assert(e2.getMessage.contains("identifier-shaped"))
    intercept[Exception](Versioned.tagVersion(root, "ghost", Some(99L)))
    intercept[Exception](Versioned.dropTag(root, "never-existed"))
  }

  test("sys.files resolves tag refs; both version and ref is loud") {
    val (_, root) = fresh()
    spark.sql(s"CALL tg.sys.tag(table => 'ns.t$n', name => 'first', version => 0)")
    val byRef = spark.sql(s"CALL tg.sys.files(table => 'ns.t$n', ref => 'first')")
      .collect().map(_.getString(0)).sorted.toSeq
    val byNum = spark.sql(s"CALL tg.sys.files(table => 'ns.t$n', version => 0)")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(byRef === byNum && byRef.nonEmpty)
    val e = intercept[Exception](spark.sql(
      s"CALL tg.sys.files(table => 'ns.t$n', version => 0, ref => 'first')"))
    assert(e.getMessage.contains("not both"), e.getMessage)
  }

  test("concurrent taggers never lose a binding; the file is never torn") {
    val (_, root) = fresh()
    val names = (0 until 16).map(i => s"tag-$i")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = names.map(nm => new Thread(() =>
      try Versioned.tagVersion(root, nm, Some(0L))
      catch { case t: Throwable => errs.add(t) }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, errs.toString)
    assert(Versioned.tags(root).keySet === names.toSet)
  }

  test("tag names survive round-trips with spaces-free punctuation and sort stably") {
    val (_, root) = fresh()
    Versioned.tagVersion(root, "a.b-c_d", Some(0L))
    Versioned.tagVersion(root, "z", Some(2L))
    Versioned.tagVersion(root, "m-1", Some(1L))
    assert(Versioned.tags(root) ===
      Map("a.b-c_d" -> 0L, "z" -> 2L, "m-1" -> 1L))
    assert(Versioned.resolveRef(root, "m-1") === 1L)
    assert(Versioned.resolveRef(root, "7") === 7L) // numbers stay numbers
  }
}
