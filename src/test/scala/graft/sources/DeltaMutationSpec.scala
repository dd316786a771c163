package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.{DeletionVectors, Versioned}

/** Delta-based MERGE-ON-READ mutations (`SupportsDelta`) on
  * `deletionVectors=true` tables: UPDATE, MERGE and non-translatable
  * DELETE commit DV sidecars + insert files — every pre-existing data
  * file hard-links over untouched, nothing is rewritten. */
class DeltaMutationSpec extends AnyFunSuite with SparkSpec {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_delta_spec_").toString

  private var n = 0
  private def freshTable(props: String = "'deletionVectors'='true'"): (String, String) = {
    spark.conf.set("spark.sql.catalog.dlt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dlt.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dlt.t")
    n += 1
    val name = s"dlt.t.tab$n"
    spark.sql(s"CREATE TABLE $name (id BIGINT, grp STRING, v BIGINT) " +
      s"USING `graft-versioned` TBLPROPERTIES ($props)")
    spark.sql(s"INSERT INTO $name SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, id * 10 " +
      "FROM range(0, 100)")
    (name, s"$warehouse/t/tab$n")
  }

  private def inode(p: java.nio.file.Path): Any =
    java.nio.file.Files.getAttribute(p, "unix:ino")

  private def files(root: String, v: Long): Seq[java.nio.file.Path] =
    Versioned.dataFiles(java.nio.file.Paths.get(root, s"v=$v"))

  private def assertCarried(root: String, from: Long, to: Long): Unit = {
    val before = files(root, from).map(f => f.getFileName.toString -> inode(f)).toMap
    val after = files(root, to).map(f => f.getFileName.toString -> inode(f)).toMap
    before.foreach { case (name, ino) =>
      assert(after.get(name).contains(ino),
        s"$name was rewritten or dropped between v=$from and v=$to")
    }
  }

  test("UPDATE is merge-on-read: DV + insert file, zero rewrites") {
    val (t, root) = freshTable()
    spark.sql(s"UPDATE $t SET v = v + 1 WHERE id = 42")
    // every v=0 file carried with the SAME inode; one insert file added
    assertCarried(root, 0L, 1L)
    assert(files(root, 1L).size === files(root, 0L).size + 1,
      "the updated row must land in a fresh insert file")
    val dvs = DeletionVectors.dvMap(java.nio.file.Paths.get(root, "v=1"))
    assert(dvs.values.map(p => DeletionVectors.read(p).length).sum === 1,
      "exactly the old position must be DV'd")
    // semantics identical to copy-on-write
    assert(spark.sql(s"SELECT v FROM $t WHERE id = 42")
      .collect()(0).getLong(0) === 421L)
    assert(spark.sql(s"SELECT count(*), sum(v) FROM $t").collect()(0).toSeq ===
      Seq(100L, (0L until 100L).map(_ * 10).sum + 1))
    assert(spark.sql(s"SELECT sum(v) FROM $t VERSION AS OF 0")
      .collect()(0).getLong(0) === (0L until 100L).map(_ * 10).sum)
  }

  test("non-translatable DELETE is merge-on-read: DV only, no insert, no rewrite") {
    val (t, root) = freshTable()
    spark.sql(s"DELETE FROM $t WHERE id % 7 = 0")
    assertCarried(root, 0L, 1L)
    assert(files(root, 1L).size === files(root, 0L).size,
      "a pure delete must add no files")
    val expected = (0L until 100L).count(_ % 7 == 0)
    val dvs = DeletionVectors.dvMap(java.nio.file.Paths.get(root, "v=1"))
    assert(dvs.values.map(p => DeletionVectors.read(p).length).sum === expected)
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) ===
      100L - expected)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE id % 7 = 0")
      .collect()(0).getLong(0) === 0L)
  }

  test("MERGE INTO is merge-on-read: all three clause families") {
    val (t, root) = freshTable()
    spark.sql(s"""MERGE INTO $t t
      USING (SELECT id, 'src' AS grp, id * 100 AS v
             FROM range(90, 120)) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v, grp = s.grp
      WHEN NOT MATCHED THEN INSERT (id, grp, v) VALUES (s.id, s.grp, s.v)
      WHEN NOT MATCHED BY SOURCE AND t.id < 5 THEN DELETE""")
    assertCarried(root, 0L, 1L)
    // matched 90..99 updated; 100..119 inserted; 0..4 deleted
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) ===
      100L - 5L + 20L)
    assert(spark.sql(s"SELECT sum(v) FROM $t WHERE id >= 90")
      .collect()(0).getLong(0) === (90L until 120L).map(_ * 100).sum)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE id < 5")
      .collect()(0).getLong(0) === 0L)
    // deletes recorded positionally: matched updates + explicit deletes
    val dvs = DeletionVectors.dvMap(java.nio.file.Paths.get(root, "v=1"))
    assert(dvs.values.map(p => DeletionVectors.read(p).length).sum === 10 + 5)
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 0")
      .collect()(0).getLong(0) === 100L)
  }

  test("chained merge-on-read mutations accumulate sidecars correctly") {
    val (t, root) = freshTable()
    spark.sql(s"UPDATE $t SET v = -1 WHERE id % 10 = 3")  // v=1
    spark.sql(s"DELETE FROM $t WHERE v = -1 AND id < 50 AND id % 1 = 0") // v=2
    spark.sql(s"UPDATE $t SET v = -2 WHERE id % 10 = 7")  // v=3
    val got = spark.sql(s"SELECT id, v FROM $t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 95, s"5 rows deleted, got ${got.size}")
    (0L until 100L).foreach { id =>
      if (id % 10 == 3 && id < 50) assert(!got.contains(id), s"id=$id")
      else if (id % 10 == 3) assert(got(id) === -1L, s"id=$id")
      else if (id % 10 == 7) assert(got(id) === -2L, s"id=$id")
      else assert(got(id) === id * 10, s"id=$id")
    }
    // v=0's files still never rewritten three commits later
    assertCarried(root, 0L, 3L)
  }

  test("merge-on-read UPDATE feeds the change feed identically to CoW") {
    val (t, root) = freshTable(
      "'deletionVectors'='true', 'changeFeedKeys'='id'")
    spark.sql(s"UPDATE $t SET v = v + 5 WHERE id < 3")
    val feed = spark.read.parquet(Versioned.feedDir(root, 1L))
    val changed = feed.filter("change_type = 'changed'")
      .select("id", "old_v", "new_v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(changed.toSeq === Seq((0L, 0L, 5L), (1L, 10L, 15L), (2L, 20L, 25L)))
    assert(feed.count() === 3L)
  }

  test("compaction after merge-on-read mutations materializes everything") {
    val (t, root) = freshTable()
    spark.sql(s"UPDATE $t SET v = 0 WHERE id = 1")
    spark.sql(s"DELETE FROM $t WHERE id % 9 = 0")
    spark.sql(s"CALL dlt.sys.compact(table => 't.tab$n')")
    val latest = Versioned.latestVersion(root).get
    assert(!DeletionVectors.hasDvs(java.nio.file.Paths.get(root, s"v=$latest")))
    val expected = (0L until 100L).filter(_ % 9 != 0)
      .map(id => if (id == 1) 0L else id * 10).sum
    assert(spark.sql(s"SELECT count(*), sum(v) FROM $t").collect()(0).toSeq ===
      Seq((0L until 100L).count(_ % 9 != 0).toLong, expected))
  }

  test("concurrent MoR mutations on disjoint clustered ranges both commit") {
    spark.conf.set("spark.sql.catalog.dlt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dlt.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dlt.t")
    n += 1
    val t = s"dlt.t.tab$n"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT) USING `graft-versioned` " +
      "TBLPROPERTIES ('deletionVectors'='true', 'clusterBy'='id', " +
      "'writePartitions'='4')")
    spark.sql(s"INSERT INTO $t SELECT id, id * 10 FROM range(0, 100)")
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def submit(sqlText: String) = pool.submit(new Runnable {
      override def run(): Unit = {
        start.await()
        try spark.sql(sqlText)
        catch { case e: Throwable => errs.add(e) }
      }
    })
    val f1 = submit(s"UPDATE $t SET v = -10 WHERE id < 20")
    val f2 = submit(s"DELETE FROM $t WHERE id >= 80 AND id % 1 = 0")
    start.countDown()
    f1.get(120, TimeUnit.SECONDS); f2.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    assert(errs.isEmpty, s"disjoint MoR mutations must both commit: " +
      s"${Option(errs.peek()).map(_.getMessage)}")
    val got = spark.sql(s"SELECT id, v FROM $t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 80)
    (0L until 20L).foreach(id => assert(got(id) === -10L, s"id=$id"))
    (20L until 80L).foreach(id => assert(got(id) === id * 10, s"id=$id"))
    (80L until 100L).foreach(id => assert(!got.contains(id), s"id=$id"))
  }

  test("_pos metadata column is queryable and filter-safe") {
    val (t, _) = freshTable()
    // positions with a pushed filter must stay PHYSICAL ordinals (the
    // reader evaluates the filter itself instead of letting parquet
    // hide skipped rows)
    val withFilter = spark.sql(
      s"SELECT id, _file, _pos FROM $t WHERE id >= 10 AND id <= 12 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val all = spark.sql(s"SELECT id, _file, _pos FROM $t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(t3 => t3._1 >= 10 && t3._1 <= 12)
    assert(withFilter.toSeq === all.toSeq,
      "filtered and unfiltered reads must agree on positions")
  }
}
