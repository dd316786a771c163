package graft.sources

import java.nio.file.Paths

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.sources.{EqualTo, In, Or, StringStartsWith}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.{BloomSidecar, Versioned}

/** Per-file Bloom filter sidecars ([[BloomSidecar]]): point-lookup file
  * skipping where min/max statistics cannot refute — build at commit,
  * carry for hard-linked files, probe semantics, lifecycle across
  * append / DELETE / rename, and the fail-loud property matrix. */
class BloomSidecarSpec extends AnyFunSuite with SparkSpec {

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("graft_bloom_spec_").toString
    spark.conf.set("spark.sql.catalog.gbloom", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbloom.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbloom.ns")
    w
  }

  private def sql(s: String): DataFrame = { warehouse; spark.sql(s) }

  /** 4000 rows over 8 files clustered by `grp` — every file's
    * [min, max] on `id` spans nearly the whole domain, the bloom's
    * home turf. */
  private def mkTable(name: String, extraProps: String = ""): String = {
    sql(s"DROP TABLE IF EXISTS gbloom.ns.$name")
    sql(s"CREATE TABLE gbloom.ns.$name (id BIGINT, grp BIGINT, tag STRING) " +
      "USING `graft-versioned` TBLPROPERTIES ('clusterBy'='grp', " +
      s"'writePartitions'='8', 'bloomFilterColumns'='id,tag'$extraProps)")
    spark.range(4000).selectExpr("id", "id % 8 AS grp",
      "concat('tag-', id) AS tag").createOrReplaceTempView(s"src_$name")
    sql(s"INSERT INTO gbloom.ns.$name SELECT id, grp, tag FROM src_$name")
    s"$warehouse/ns/$name"
  }

  test("point probe skips files min/max keeps (long and string columns)") {
    val root = mkTable("t1")
    val vdir = Paths.get(root, "v=0")
    // min/max layer cannot refute: every file spans ~[0, 4000) on id
    val st = graft.operators.FileStats.read(vdir)
    assert(st.size >= 6)
    assert(st.values.count(graft.operators.FileStats.mayMatch(_,
      EqualTo("id", 1234L))) === st.size, "stats should keep everything")
    // bloom layer: only the true file (+ ~1% FPs) survives
    val (keptL, nL) = BloomSidecar.survivors(vdir, EqualTo("id", 1234L))
    assert(nL >= 6)
    assert(keptL <= 2, s"long probe kept $keptL of $nL")
    val (keptS, _) = BloomSidecar.survivors(vdir, EqualTo("tag", "tag-77"))
    assert(keptS <= 2, s"string probe kept $keptS of $nL")
    // a value NOT in the table refutes everything (no false negatives
    // exist; false positives are bounded by fpp)
    val (keptMiss, _) = BloomSidecar.survivors(vdir, EqualTo("id", 999999L))
    assert(keptMiss <= 1, s"absent-value probe kept $keptMiss of $nL")
    // and the SCAN result stays exact on the pruned layout
    assert(sql("SELECT grp FROM gbloom.ns.t1 WHERE id = 1234")
      .collect().map(_.getLong(0)).toSeq === Seq(1234L % 8))
  }

  test("IN and OR probe semantics; non-equality atoms keep everything") {
    val root = mkTable("t2")
    val vdir = Paths.get(root, "v=0")
    val (keptIn, n) = BloomSidecar.survivors(vdir,
      In("id", Array[Any](10L, 2000L, 3999L)))
    assert(keptIn <= 5 && keptIn >= 1, s"IN probe kept $keptIn of $n")
    // OR of two point probes: union of their survivor sets
    val (keptOr, _) = BloomSidecar.survivors(vdir,
      Or(EqualTo("id", 10L), EqualTo("id", 999999L)))
    assert(keptOr <= 3, s"OR probe kept $keptOr of $n")
    // prefix/range atoms are not bloom's business — keep all
    val (keptPre, _) = BloomSidecar.survivors(vdir,
      StringStartsWith("tag", "tag-1"))
    assert(keptPre === n)
    // null-safe-null and null-valued probes keep all (nulls are the
    // null-count statistic's job)
    val (keptNull, _) = BloomSidecar.survivors(vdir,
      org.apache.spark.sql.sources.EqualNullSafe("id", null))
    assert(keptNull === n)
  }

  test("append commit carries previous files' lines verbatim, builds only new") {
    val root = mkTable("t3")
    val v0Lines = new String(java.nio.file.Files.readAllBytes(
      Paths.get(root, "v=0", "_graft_bloom")), "UTF-8").linesIterator.toSet
    sql("INSERT INTO gbloom.ns.t3 VALUES (90001, 1, 'fresh')")
    val v1Lines = new String(java.nio.file.Files.readAllBytes(
      Paths.get(root, "v=1", "_graft_bloom")), "UTF-8").linesIterator.toSet
    // every v0 line rides along byte-identically (no rebuild of carried
    // files), plus lines for the new file
    assert(v0Lines.subsetOf(v1Lines),
      "carried files must keep their v0 bloom lines verbatim")
    assert(v1Lines.size > v0Lines.size, "the new file needs fresh lines")
    val (kept, n) = BloomSidecar.survivors(Paths.get(root, "v=1"),
      EqualTo("id", 90001L))
    assert(n >= 7 && kept <= 2, s"new row's probe kept $kept of $n")
  }

  test("the snapshot scan itself prunes: explain shows the file-count drop") {
    mkTable("t4")
    val df = sql("SELECT grp FROM gbloom.ns.t4 WHERE id = 42")
    df.collect() // plan + execute so the scan's counts materialize
    val desc = df.queryExecution.executedPlan.toString
    // the scan description carries "Files: kept/total" — bloom must
    // have dropped most of the 8 files before any footer was read
    val m = "DataFiles: (\\d+)/(\\d+)".r.findFirstMatchIn(desc)
    assert(m.isDefined, s"no file-count marker in scan description:\n$desc")
    assert(m.get.group(2).toInt >= 6)
    assert(m.get.group(1).toInt <= 2,
      s"scan read ${m.get.group(1)} files:\n$desc")
  }

  test("DV DELETE: filters stay sound over-approximations; carried lines survive") {
    sql("DROP TABLE IF EXISTS gbloom.ns.t5")
    sql("CREATE TABLE gbloom.ns.t5 (id BIGINT, grp BIGINT) " +
      "USING `graft-versioned` TBLPROPERTIES ('clusterBy'='grp', " +
      "'writePartitions'='8', 'bloomFilterColumns'='id', " +
      "'deletionVectors'='true')")
    spark.range(4000).selectExpr("id", "id % 8 AS grp")
      .createOrReplaceTempView("src_t5")
    sql("INSERT INTO gbloom.ns.t5 SELECT id, grp FROM src_t5")
    sql("DELETE FROM gbloom.ns.t5 WHERE id = 1234")
    val root = s"$warehouse/ns/t5"
    // the DV commit hard-links every data file: bloom lines carry
    assert(java.nio.file.Files.exists(Paths.get(root, "v=1", "_graft_bloom")))
    // the deleted key still "may contain" (over-approximation) but the
    // scan returns nothing — DVs only ever shrink the true row set
    val (kept, n) = BloomSidecar.survivors(Paths.get(root, "v=1"),
      EqualTo("id", 1234L))
    assert(kept >= 1 && n >= 6)
    assert(sql("SELECT * FROM gbloom.ns.t5 WHERE id = 1234").count() === 0L)
    assert(sql("SELECT count(*) FROM gbloom.ns.t5").collect()(0).getLong(0)
      === 3999L)
  }

  test("RENAME COLUMN follows: property rewritten, pruning intact on the new name") {
    val root = mkTable("t6")
    sql("ALTER TABLE gbloom.ns.t6 RENAME COLUMN id TO doc_key")
    // the persisted property tracks the logical rename
    val props = new String(java.nio.file.Files.readAllBytes(
      Paths.get(root, "_graft_props.json")), "UTF-8")
    assert(props.contains("bloomFilterColumns=doc_key,tag"), props)
    // physical resolution lands on the birth name the files store
    assert(BloomSidecar.bloomColsOf(root) === Seq("id", "tag"))
    // and the scan still prunes on the renamed logical column
    val df = sql("SELECT grp FROM gbloom.ns.t6 WHERE doc_key = 42")
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(42L % 8))
    val desc = df.queryExecution.executedPlan.toString
    val m = "DataFiles: (\\d+)/(\\d+)".r.findFirstMatchIn(desc)
    assert(m.isDefined && m.get.group(1).toInt <= 2,
      s"rename broke bloom pruning:\n$desc")
  }

  test("property validation fails loudly: missing column, unhashable type, guarded drop") {
    sql("DROP TABLE IF EXISTS gbloom.ns.t7")
    val e1 = intercept[Exception] {
      sql("CREATE TABLE gbloom.ns.t7 (id BIGINT) USING `graft-versioned` " +
        "TBLPROPERTIES ('bloomFilterColumns'='nope')")
    }
    assert(e1.getMessage.contains("nope"))
    sql("DROP TABLE IF EXISTS gbloom.ns.t7")
    val e2 = intercept[Exception] {
      sql("CREATE TABLE gbloom.ns.t7 (id BIGINT, score DOUBLE) " +
        "USING `graft-versioned` TBLPROPERTIES ('bloomFilterColumns'='score')")
    }
    assert(e2.getMessage.contains("integral or"))
    sql("DROP TABLE IF EXISTS gbloom.ns.t7")
    sql("CREATE TABLE gbloom.ns.t7 (id BIGINT, v BIGINT) USING `graft-versioned` " +
      "TBLPROPERTIES ('bloomFilterColumns'='id')")
    val e3 = intercept[Exception] {
      sql("ALTER TABLE gbloom.ns.t7 DROP COLUMN id")
    }
    assert(e3.getMessage.contains("bloomFilterColumns"))
    // UNSET then drop works
    sql("ALTER TABLE gbloom.ns.t7 UNSET TBLPROPERTIES ('bloomFilterColumns')")
    sql("ALTER TABLE gbloom.ns.t7 DROP COLUMN id")
  }

  test("compaction rebuilds filters for the rewritten files") {
    val root = mkTable("t9")
    sql("CALL gbloom.sys.compact(table => 'ns.t9', target_file_bytes => 8192)")
    val v1 = Versioned.latestVersion(root).get
    assert(v1 === 1L)
    // all-new file names -> no carry possible; the writeNext hook must
    // have rebuilt filters for the compacted layout
    val (kept, n) = BloomSidecar.survivors(Paths.get(root, s"v=$v1"),
      EqualTo("id", 1234L))
    assert(n >= 2, s"compaction should leave a multi-file layout ($n)")
    assert(kept <= math.max(1, n / 3), s"compacted layout kept $kept of $n")
    assert(sql("SELECT grp FROM gbloom.ns.t9 WHERE id = 1234")
      .collect().map(_.getLong(0)).toSeq === Seq(1234L % 8))
  }

  test("a point UPDATE rewrites only the file the bloom keeps (copy-on-write)") {
    val root = mkTable("t10")
    def names(v: String) = Versioned.dataFiles(Paths.get(root, v))
      .map(_.getFileName.toString).toSet
    val pre = names("v=0")
    spark.sql("UPDATE gbloom.ns.t10 SET grp = -1 WHERE id = 1234")
    val post = names("v=1")
    // the row-level scan's kept set IS the replaced set — with the
    // bloom layer in front of planning, only the file(s) that can hold
    // id=1234 get rewritten; everything else hard-links over
    val replaced = pre -- post
    assert(replaced.size <= 2,
      s"point UPDATE replaced ${replaced.size} of ${pre.size} files")
    assert((pre -- replaced).subsetOf(post), "unmatched files must carry")
    assert(sql("SELECT grp FROM gbloom.ns.t10 WHERE id = 1234")
      .collect().map(_.getLong(0)).toSeq === Seq(-1L))
    assert(sql("SELECT count(*) FROM gbloom.ns.t10").collect()(0).getLong(0)
      === 4000L)
  }

  test("restore and clone carry bloom lines without a build pass") {
    val root = mkTable("t8")
    sql("INSERT INTO gbloom.ns.t8 VALUES (90002, 2, 'x')")
    sql("CALL gbloom.sys.restore(table => 'ns.t8', version => 0)")
    val (kept, n) = BloomSidecar.survivors(Paths.get(root, "v=2"),
      EqualTo("id", 1234L))
    assert(n >= 6 && kept <= 2, s"restored version kept $kept of $n")
    sql("CALL gbloom.sys.clone(source => 'ns.t8', target => 'ns.t8c')")
    val (keptC, nC) = BloomSidecar.survivors(
      Paths.get(s"$warehouse/ns/t8c", "v=0"), EqualTo("id", 1234L))
    assert(nC >= 6 && keptC <= 2, s"clone kept $keptC of $nC")
  }
}
