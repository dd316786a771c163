package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** SQL UPDATE / MERGE INTO / arbitrary-predicate DELETE against the
  * version store — the group-based copy-on-write row-level operation
  * (`SupportsRowLevelOperations`, group = the whole snapshot). Every
  * mutation must commit exactly one new version and leave all prior
  * versions readable via `VERSION AS OF`. */
class RowLevelOpsSpec extends AnyFunSuite with SparkSpec {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_rowlevel_spec_").toString

  private def sqls(q: String): Seq[String] =
    spark.sql(q).collect().map(_.toString).sorted.toSeq

  private var n = 0
  private def freshTable(): String = {
    spark.conf.set("spark.sql.catalog.rlo", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rlo.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rlo.t")
    n += 1
    val name = s"rlo.t.tab$n"
    spark.sql(s"CREATE TABLE $name (id BIGINT, grp STRING, v BIGINT) " +
      "USING `graft-versioned`")
    spark.sql(s"INSERT INTO $name SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, id * 10 " +
      "FROM range(0, 100)")
    name
  }

  test("UPDATE with a non-pushable predicate rewrites through ReplaceData") {
    val t = freshTable()
    spark.sql(s"UPDATE $t SET v = v + 1 WHERE id % 7 = 0 AND id < 50")
    val updated = spark.sql(s"SELECT id FROM $t WHERE v % 10 = 1")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(updated === (0L until 50L by 7L).toSeq)
    // untouched rows intact, total preserved
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 100L)
    assert(spark.sql(s"SELECT sum(v) FROM $t").collect()(0).getLong(0) ===
      (0L until 100L).map(_ * 10).sum + updated.size)
  }

  test("UPDATE commits one new version; VERSION AS OF shows the pre-image") {
    val t = freshTable()
    spark.sql(s"UPDATE $t SET v = 0 WHERE grp = 'even'")
    assert(sqls(s"SELECT id, v FROM $t VERSION AS OF 0") ===
      sqls(s"SELECT id, id * 10 FROM range(0, 100)"))
    assert(spark.sql(s"SELECT sum(v) FROM $t").collect()(0).getLong(0) ===
      (1L until 100L by 2L).map(_ * 10).sum)
  }

  test("UPDATE SET with expressions over multiple columns") {
    val t = freshTable()
    spark.sql(s"UPDATE $t SET v = id + length(grp), grp = upper(grp) " +
      s"WHERE id >= 98")
    assert(sqls(s"SELECT id, grp, v FROM $t WHERE id >= 98") ===
      Seq("[98,EVEN,102]", "[99,ODD,102]").sorted)
  }

  test("DELETE with a non-translatable predicate falls back to the rewrite") {
    val t = freshTable()
    // modulo is outside the Filter vocabulary — canDeleteWhere never
    // sees it; without row-level ops this statement would fail
    spark.sql(s"DELETE FROM $t WHERE id % 3 = 0")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) ===
      (0L until 100L).count(_ % 3 != 0))
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 0")
      .collect()(0).getLong(0) === 100L)
  }

  test("MERGE INTO: matched update, not-matched insert, not-matched-by-source delete") {
    val t = freshTable()
    spark.sql(s"""MERGE INTO $t t
      USING (SELECT id, 'src' AS grp, id * 100 AS v
             FROM range(50, 150) WHERE id % 2 = 0) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (id, grp, v) VALUES (s.id, s.grp, s.v)
      WHEN NOT MATCHED BY SOURCE AND t.id < 10 THEN DELETE""")
    // matched: even ids in [50,100) → v = id*100
    assert(spark.sql(s"SELECT sum(v) FROM $t WHERE id >= 50 AND id < 100 AND id % 2 = 0")
      .collect()(0).getLong(0) === (50L until 100L by 2L).map(_ * 100).sum)
    // inserted: even ids in [100,150)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE grp = 'src'")
      .collect()(0).getLong(0) === 25L)
    // deleted: ids < 10 not in source (source starts at 50) → all 10 gone
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE id < 10")
      .collect()(0).getLong(0) === 0L)
    // survivors: ids 10..49 all, odd ids 50..99, evens 50..98, inserts
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) ===
      40L + 50L + 25L)
    // history: the merge is ONE commit on top of the insert
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 0")
      .collect()(0).getLong(0) === 100L)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $t VERSION AS OF 2").collect()
    }
  }

  test("translatable DELETE still takes the metadata path (one version, null-keep)") {
    val t = freshTable()
    spark.sql(s"DELETE FROM $t WHERE id >= 90")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 90L)
    // exactly one commit beyond v0 either way
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $t VERSION AS OF 2").collect()
    }
  }

  // ---- file-granularity copy-on-write: the scan prunes files whose
  // stats refute the condition; the commit hard-links them over

  private def inode(p: java.nio.file.Path): Any =
    java.nio.file.Files.getAttribute(p, "unix:ino")

  private def clusteredTable(): (String, String) = {
    spark.conf.set("spark.sql.catalog.rlo", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rlo.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rlo.t")
    n += 1
    val name = s"rlo.t.clus$n"
    spark.sql(s"CREATE TABLE $name (id BIGINT, v BIGINT) " +
      "USING `graft-versioned` " +
      "TBLPROPERTIES ('clusterBy'='id', 'writePartitions'='4')")
    spark.sql(s"INSERT INTO $name SELECT id, id * 10 FROM range(0, 100)")
    (name, s"$warehouse/t/clus$n")
  }

  test("selective UPDATE rewrites only the covering file; the rest hard-link over") {
    val (t, root) = clusteredTable()
    val v0Files = graft.operators.Versioned.dataFiles(
      java.nio.file.Paths.get(s"$root/v=0"))
    assert(v0Files.size === 4, s"fixture should have 4 clustered files: $v0Files")
    spark.sql(s"UPDATE $t SET v = -1 WHERE id = 97")
    val v1Files = graft.operators.Versioned.dataFiles(
      java.nio.file.Paths.get(s"$root/v=1"))
    // 3 of the 4 files carried over as hard-links (same inode)
    val v0Inodes = v0Files.map(inode).toSet
    val carried = v1Files.filter(f => v0Inodes.contains(inode(f)))
    assert(carried.size === 3,
      s"expected 3 hard-linked carry-overs, got ${carried.size} of ${v1Files.size}")
    // content exact: one row changed, everything else intact
    assert(spark.sql(s"SELECT v FROM $t WHERE id = 97").collect()(0).getLong(0) === -1L)
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 100L)
    assert(spark.sql(s"SELECT sum(v) FROM $t").collect()(0).getLong(0) ===
      (0L until 100L).map(_ * 10).sum - 970L - 1L)
    assert(spark.sql(s"SELECT sum(v) FROM $t VERSION AS OF 0")
      .collect()(0).getLong(0) === (0L until 100L).map(_ * 10).sum)
  }

  test("DELETE wiping entire files does not resurrect their rows") {
    val (t, root) = clusteredTable()
    // modulo keeps it off the metadata path; id < 60 fully covers at
    // least two clustered files — if file pruning used the survivor
    // predicate instead of the command condition, those files would
    // carry over and the deleted rows would come back
    spark.sql(s"DELETE FROM $t WHERE id < 60 AND id % 1 = 0")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 40L)
    assert(spark.sql(s"SELECT min(id) FROM $t").collect()(0).getLong(0) === 60L)
    val v1Files = graft.operators.Versioned.dataFiles(
      java.nio.file.Paths.get(s"$root/v=1"))
    val v0Inodes = graft.operators.Versioned.dataFiles(
      java.nio.file.Paths.get(s"$root/v=0")).map(inode).toSet
    // the untouched tail file(s) still hard-link over
    assert(v1Files.exists(f => v0Inodes.contains(inode(f))),
      "files outside the delete range should carry over by hard-link")
  }

  test("MERGE touching a narrow key range carries the untouched files") {
    val (t, root) = clusteredTable()
    spark.sql(s"""MERGE INTO $t t
      USING (SELECT id, id * 1000 AS v FROM range(10, 13)) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v""")
    assert(spark.sql(s"SELECT sum(v) FROM $t WHERE id IN (10, 11, 12)")
      .collect()(0).getLong(0) === (10L + 11L + 12L) * 1000)
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 100L)
    val v1Files = graft.operators.Versioned.dataFiles(
      java.nio.file.Paths.get(s"$root/v=1"))
    val v0Inodes = graft.operators.Versioned.dataFiles(
      java.nio.file.Paths.get(s"$root/v=0")).map(inode).toSet
    assert(v1Files.count(f => v0Inodes.contains(inode(f))) >= 2,
      "files outside the merge key range should hard-link over")
  }

  // ---- file-level conflict resolution: a row-level commit racing
  // another ROW-LEVEL commit rebases when their replaced file sets are
  // disjoint; overlap — or any intervening append/overwrite, whose
  // rows the operation never saw — still fails loudly.

  /** Stage a replacement parquet file (one (id, v) row) for a direct
    * commitRowLevel call. */
  private def stageReplacement(root: String, rows: Seq[(Long, Long)]): java.nio.file.Path = {
    import spark.implicits._
    val staged = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(root), "_staging_test_")
    val tmp = java.nio.file.Files.createTempDirectory("graft_rlo_stage_src_")
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite")
      .parquet(tmp.toString)
    val part = graft.operators.Versioned.listParquet(tmp).head
    java.nio.file.Files.copy(part, staged.resolve(
      s"part-rebase-${java.util.UUID.randomUUID.toString.take(8)}.parquet"))
    graft.operators.Versioned.deleteRecursively(tmp)
    staged
  }

  test("two row-level commits on DISJOINT files: the later one rebases, both land") {
    val (t, root) = clusteredTable()
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "bigint").add("v", "bigint")
    val v0 = graft.operators.Versioned.dataFiles(
      java.nio.file.Paths.get(s"$root/v=0")).map(_.getFileName.toString).sorted
    assert(v0.size === 4)
    // op1 and op2 both scanned v=0; op1 replaces file 0, op2 file 3.
    // op1 commits first (v=1); op2's commit sees latest != scanned and
    // must REBASE: its replacement lands as v=2 carrying op1's work.
    val op1Rows = spark.read.parquet(s"$root/v=0/${v0(0)}")
      .collect().map(r => (r.getLong(0), -1L)).toSeq
    val op2Rows = spark.read.parquet(s"$root/v=0/${v0(3)}")
      .collect().map(r => (r.getLong(0), -2L)).toSeq
    val s1 = stageReplacement(root, op1Rows)
    val s2 = stageReplacement(root, op2Rows)
    assert(VersionedWriteIo.commitRowLevel(root, s1, schema, 0L,
      Set(v0(0)), 100L) === 1L)
    assert(VersionedWriteIo.commitRowLevel(root, s2, schema, 0L,
      Set(v0(3)), 200L) === 2L, "disjoint row-level commit must rebase")
    // merged result == sequential result: file 0 rows at -1, file 3 at -2
    val got = spark.sql(s"SELECT id, v FROM $t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 100)
    op1Rows.foreach { case (id, _) => assert(got(id) === -1L, s"id=$id") }
    op2Rows.foreach { case (id, _) => assert(got(id) === -2L, s"id=$id") }
    assert(got.count(_._2 >= 0) === 100 - op1Rows.size - op2Rows.size)
  }

  test("two row-level commits REPLACING the same file: the later one aborts") {
    val (t, root) = clusteredTable()
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "bigint").add("v", "bigint")
    val v0 = graft.operators.Versioned.dataFiles(
      java.nio.file.Paths.get(s"$root/v=0")).map(_.getFileName.toString).sorted
    val rows = spark.read.parquet(s"$root/v=0/${v0(1)}")
      .collect().map(r => (r.getLong(0), -1L)).toSeq
    val s1 = stageReplacement(root, rows)
    val s2 = stageReplacement(root, rows.map { case (id, _) => (id, -2L) })
    VersionedWriteIo.commitRowLevel(root, s1, schema, 0L, Set(v0(1)), 100L)
    val err = intercept[IllegalStateException] {
      VersionedWriteIo.commitRowLevel(root, s2, schema, 0L, Set(v0(1)), 200L)
    }
    assert(err.getMessage.contains("also replaced"))
    // the first commit's result is intact, nothing from the aborted one
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE v = -2")
      .collect()(0).getLong(0) === 0L)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE v = -1")
      .collect()(0).getLong(0).toInt === rows.size)
  }

  test("concurrent SQL UPDATEs on disjoint clustered ranges both commit") {
    val (t, _) = clusteredTable()
    // two threads race real UPDATE statements over disjoint key ranges
    // (disjoint clustered files). Whatever the interleaving — fully
    // sequential or scan-overlapped-with-commit — both must succeed
    // and the merged table must equal the sequential outcome.
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
    val f1 = submit(s"UPDATE $t SET v = -10 WHERE id < 20 AND id % 1 = 0")
    val f2 = submit(s"UPDATE $t SET v = -20 WHERE id >= 80 AND id % 1 = 0")
    start.countDown()
    f1.get(120, TimeUnit.SECONDS); f2.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    assert(errs.isEmpty, s"concurrent disjoint UPDATEs must both commit: " +
      s"${Option(errs.peek()).map(_.getMessage)}")
    val got = spark.sql(s"SELECT id, v FROM $t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 20L).foreach(id => assert(got(id) === -10L))
    (80L until 100L).foreach(id => assert(got(id) === -20L))
    (20L until 80L).foreach(id => assert(got(id) === id * 10))
  }

  test("N concurrent row-level writers on disjoint ranges: all land, merged ≡ sequential") {
    // the file-level conflict resolution (commitRowLevel / commitDelta
    // rebase loops) under real N-way concurrency — both mutation
    // representations: copy-on-write rewrites and merge-on-read deltas
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val writers = 6
    def stress(dv: Boolean): Unit = {
      n += 1
      val name = s"rlo.t.nway$n"
      spark.sql(s"CREATE TABLE $name (id BIGINT, v BIGINT) " +
        "USING `graft-versioned` TBLPROPERTIES ('clusterBy'='id', " +
        s"'writePartitions'='$writers'" +
        (if (dv) ", 'deletionVectors'='true'" else "") + ")")
      spark.sql(s"INSERT INTO $name SELECT id, id * 10 FROM range(0, 600)")
      val pool = Executors.newFixedThreadPool(writers)
      val start = new CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val futs = (0 until writers).map { i =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            start.await()
            try spark.sql(s"UPDATE $name SET v = ${-(i + 1)} " +
              s"WHERE id >= ${i * 100} AND id < ${i * 100 + 50}")
            catch { case e: Throwable => errs.add(e) }
          }
        })
      }
      start.countDown()
      futs.foreach(_.get(240, TimeUnit.SECONDS))
      pool.shutdown()
      assert(errs.isEmpty,
        s"all $writers disjoint writers must commit (dv=$dv): " +
          s"${Option(errs.peek()).map(_.toString)}")
      val root = s"$warehouse/t/nway$n"
      assert(graft.operators.Versioned.versions(root).size === writers + 1,
        s"every writer lands its own version (dv=$dv)")
      // merged ≡ sequential, whatever the interleaving and rebasing
      val got = spark.sql(s"SELECT id, v FROM $name").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size === 600)
      (0L until 600L).foreach { id =>
        val w = (id / 100).toInt
        val expected = if (id % 100 < 50) -(w + 1).toLong else id * 10
        assert(got(id) === expected, s"id=$id dv=$dv")
      }
    }
    stress(dv = false) // copy-on-write: commitRowLevel rebase chain
    stress(dv = true)  // merge-on-read: commitDelta DV-fragment rebase
  }

  test("row-level commit fails loudly on a concurrent APPEND (no rebase over unseen rows)") {
    val root = java.nio.file.Files.createTempDirectory("graft_rlo_conflict_").toString
    import spark.implicits._
    graft.operators.Versioned.writeNext(
      (0L until 10L).map(i => (i, i)).toDF("id", "v"), root, Some(10L))
    val staged = java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(root, "_staging_conflict"))
    // a concurrent writer publishes v=1 between scan (of v=0) and commit
    graft.operators.Versioned.writeNext(
      (0L until 3L).map(i => (i, -i)).toDF("id", "v"), root, Some(20L))
    val err = intercept[IllegalStateException] {
      VersionedWriteIo.commitRowLevel(root, staged,
        new org.apache.spark.sql.types.StructType()
          .add("id", "bigint").add("v", "bigint"),
        scannedVersion = 0L, scannedNames = Set("whatever.parquet"),
        stamp = 30L)
    }
    assert(err.getMessage.contains("concurrent commit"))
    assert(graft.operators.Versioned.versions(root) === Seq(0L, 1L))
  }

  test("UPDATE on the change feed is rejected") {
    val t = freshTable()
    // direct path-based feed reads are read-only by construction; the
    // catalog table itself must still accept updates — this guards the
    // table-level require, not the catalog routing
    spark.sql(s"UPDATE $t SET v = 1 WHERE id = 0")
    assert(spark.sql(s"SELECT v FROM $t WHERE id = 0").collect()(0).getLong(0) === 1L)
  }
}
