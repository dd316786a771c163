package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.{FileStats, Layout, Versioned}
import graft.operators.FileStats.{ColStat, FileStat, L, S}

/** Manifest-carried FILE statistics (`_graft_stats`) and the file-level
  * data skipping they buy: the scan drops whole files whose commit-time
  * min/max/null-count refute the pushed predicate BEFORE any footer is
  * opened. At object-store scale this is the difference between one
  * sidecar read and one GET per file at planning time. Every
  * uncertainty must KEEP the file — row-group pruning and the reader's
  * record filter stay the correctness backstop. */
class FileSkippingSpec extends AnyFunSuite with SparkSpec {

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_fskip_${tag}_").toString

  /** Range-clustered multi-file snapshot: ids ascending, disjoint per
    * file — the shape a selective predicate should prune. */
  private def clusteredRoot(n: Long, files: Int): String = {
    val root = freshRoot("clu")
    import spark.implicits._
    Versioned.writeNext(
      (0L until n).map(i => (i, i * 7, s"pad_$i")).toDF("id", "v", "pad"),
      root, Some(10L),
      Layout.WriteSpec(sortCols = Seq("id"), numPartitions = Some(files)))
    root
  }

  private def dataFileCounts(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
    val desc = df.queryExecution.executedPlan.toString
    val re = "DataFiles: (\\d+)/(\\d+)".r
    re.findFirstMatchIn(desc) match {
      case Some(m) => (m.group(1).toInt, m.group(2).toInt)
      case None => fail(s"DataFiles marker missing in:\n$desc")
    }
  }

  // ------------------------------------------------ sidecar lifecycle

  test("every commit writes a stats sidecar covering all data files") {
    val root = clusteredRoot(10000L, 4)
    val vdir = java.nio.file.Paths.get(root, "v=0")
    val stats = FileStats.read(vdir)
    val files = Versioned.dataFiles(vdir).map(_.getFileName.toString)
    assert(files.size === 4)
    assert(stats.keySet === files.toSet)
    assert(stats.values.map(_.rows).sum === 10000L)
    // per-file id bounds are disjoint and cover the range
    val spans = stats.values.toSeq.map { st =>
      val c = st.cols("id")
      (c.lo, c.hi) match {
        case (Some(L(lo)), Some(L(hi))) => (lo, hi)
        case other => fail(s"id bounds missing: $other")
      }
    }.sortBy(_._1)
    assert(spans.head._1 === 0L && spans.last._2 === 9999L)
    spans.sliding(2).foreach {
      case Seq((_, h), (l, _)) => assert(h < l, "file spans must be disjoint")
      case _ =>
    }
  }

  test("selective filter prunes files at planning and stays exact") {
    val root = clusteredRoot(20000L, 5)
    val all = spark.read.format("graft-versioned").load(root)
    val (aKept, aTotal) = dataFileCounts(all)
    assert((aKept, aTotal) === (5, 5))

    val tail = all.filter(col("id") >= 19990L)
    val (kept, total) = dataFileCounts(tail)
    assert(total === 5 && kept === 1,
      s"id >= 19990 lives in one clustered file, planned $kept/$total")
    assert(tail.count() === 10L)
    assert(tail.agg(sum("v")).collect()(0).getLong(0) ===
      (19990L until 20000L).map(_ * 7).sum)
  }

  test("a band crossing a file boundary keeps both files and stays exact") {
    val root = clusteredRoot(20000L, 4)
    // derive the FIRST actual file boundary from the sidecar (range
    // partitioning samples, so boundaries are not exact multiples)
    val spans = FileStats.read(java.nio.file.Paths.get(root, "v=0"))
      .values.toSeq.map(_.cols("id")).collect {
        case ColStat(Some(L(lo)), Some(L(hi)), _) => (lo, hi)
      }.sortBy(_._1)
    val edge = spans.head._2 // last id of the first file
    val all = spark.read.format("graft-versioned").load(root)
    val band = all.filter(col("id") >= edge - 5L && col("id") <= edge + 5L)
    val (kept, total) = dataFileCounts(band)
    assert(total === 4 && kept === 2,
      s"band straddling id=$edge should keep exactly 2 files, got $kept/$total")
    assert(band.count() === 11L)
  }

  test("a pre-stats commit (no sidecar) skips nothing and stays exact") {
    val root = clusteredRoot(8000L, 4)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(root, "v=0", "_graft_stats"))
    val q = spark.read.format("graft-versioned").load(root)
      .filter(col("id") >= 7990L)
    val (kept, total) = dataFileCounts(q)
    assert((kept, total) === (4, 4), "absent sidecar must mean no pruning")
    assert(q.count() === 10L)
  }

  // --------------------------------------------- commit carry-forward

  test("a DV DELETE carries stats lines verbatim — no footer re-reads") {
    val warehouse = freshRoot("dvcarry")
    spark.conf.set("spark.sql.catalog.fsk", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.fsk.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fsk.t")
    val t = "fsk.t.carry"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT) USING `graft-versioned` " +
      "TBLPROPERTIES ('deletionVectors'='true', 'clusterBy'='id', " +
      "'writePartitions'='3')")
    spark.sql(s"INSERT INTO $t SELECT id, id * 10 FROM range(0, 3000)")
    val root = s"$warehouse/t/carry"
    spark.sql(s"DELETE FROM $t WHERE id = 1500")
    def lines(v: Long): Map[String, String] =
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(root, s"v=$v", "_graft_stats")),
        java.nio.charset.StandardCharsets.UTF_8).linesIterator
        .map(l => l.split("\"f\":\"")(1).takeWhile(_ != '"') -> l).toMap
    val before = lines(0L)
    val after = lines(1L)
    // DV mode: identical file set, identical sidecar lines (carried, not
    // recollected) — stats stay valid because DVs only SHRINK row sets
    assert(after === before)
    // and the carried stats still prune post-delete reads
    val q = spark.sql(s"SELECT count(*) AS n FROM $t WHERE id >= 2900")
    assert(q.collect()(0).getLong(0) === 100L)
    val (kept, total) = dataFileCounts(spark.table(t).filter(col("id") >= 2900L))
    assert(total === 3 && kept === 1, s"carried stats must prune: $kept/$total")
  }

  test("INSERT appends collect stats for new files, carry for old ones") {
    val warehouse = freshRoot("append")
    spark.conf.set("spark.sql.catalog.fsk2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.fsk2.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fsk2.t")
    val t = "fsk2.t.app"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT) USING `graft-versioned` " +
      "TBLPROPERTIES ('clusterBy'='id', 'writePartitions'='2')")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 1000)")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(1000, 2000)")
    val root = s"$warehouse/t/app"
    val vdir = java.nio.file.Paths.get(root, "v=1")
    val stats = FileStats.read(vdir)
    val files = Versioned.dataFiles(vdir).map(_.getFileName.toString)
    assert(stats.keySet === files.toSet,
      "append commit must carry old stats AND collect new-file stats")
    assert(stats.values.map(_.rows).sum === 2000L)
    // the second batch's files are refuted by a first-batch predicate
    val q = spark.table(t).filter(col("id") < 10L)
    val (kept, total) = dataFileCounts(q)
    assert(kept < total, s"expected file skip across batches: $kept/$total")
    assert(q.count() === 10L)
  }

  // ------------------------------------- column mapping + evolution

  test("pruning survives RENAME COLUMN (stats keyed by physical name)") {
    val warehouse = freshRoot("ren")
    spark.conf.set("spark.sql.catalog.fsk3", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.fsk3.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fsk3.t")
    val t = "fsk3.t.ren"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT) USING `graft-versioned` " +
      "TBLPROPERTIES ('clusterBy'='id', 'writePartitions'='4')")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 4000)")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN id TO key")
    val q = spark.table(t).filter(col("key") >= 3990L)
    val (kept, total) = dataFileCounts(q)
    assert(total === 4 && kept === 1,
      s"renamed column must keep pruning: $kept/$total")
    assert(q.count() === 10L)
  }

  test("filters on an added column refute pre-evolution files, IS NULL keeps them") {
    val warehouse = freshRoot("evo")
    spark.conf.set("spark.sql.catalog.fsk4", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.fsk4.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fsk4.t")
    val t = "fsk4.t.evo"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT) USING `graft-versioned`")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(0, 100)")
    spark.sql(s"ALTER TABLE $t ADD COLUMN tag STRING")
    spark.sql(s"INSERT INTO $t SELECT id, id, 'new' FROM range(100, 200)")
    val eq = spark.table(t).filter(col("tag") === "new")
    val (kept, total) = dataFileCounts(eq)
    assert(kept < total,
      s"tag='new' must refute pre-evolution files: $kept/$total")
    assert(eq.count() === 100L)
    // IS NULL reads pre-evolution files as null — they must survive
    val nul = spark.table(t).filter(col("tag").isNull)
    assert(nul.count() === 100L)
  }

  // ---------------------------------------------- mayMatch unit matrix

  private val st = FileStat(100L, Map(
    "id" -> ColStat(Some(L(10L)), Some(L(20L)), Some(0L)),
    "name" -> ColStat(Some(S("bbb")), Some(S("ddd")), Some(5L)),
    "blob" -> ColStat(), // presence without bounds
    "dead" -> ColStat(None, None, Some(100L)))) // all null

  test("mayMatch: interval logic refutes only what the bounds exclude") {
    def m(f: Filter) = FileStats.mayMatch(st, f)
    assert(m(EqualTo("id", 15L)) && m(EqualTo("id", 10L)) && m(EqualTo("id", 20L)))
    assert(!m(EqualTo("id", 9L)) && !m(EqualTo("id", 21L)))
    assert(m(GreaterThan("id", 19L)) && !m(GreaterThan("id", 20L)))
    assert(m(GreaterThanOrEqual("id", 20L)) && !m(GreaterThanOrEqual("id", 21L)))
    assert(m(LessThan("id", 11L)) && !m(LessThan("id", 10L)))
    assert(m(LessThanOrEqual("id", 10L)) && !m(LessThanOrEqual("id", 9L)))
    assert(m(In("id", Array(1L, 15L))) && !m(In("id", Array(1L, 2L))))
    // exact long-vs-double compare: 10.5 is inside [10, 20], 9.99 is not
    assert(m(EqualTo("id", 10.5)) && !m(EqualTo("id", 9.99)))
    assert(m(And(GreaterThan("id", 12L), LessThan("id", 14L))))
    // conjunct-wise evaluation is sound but not complete: each leaf is
    // individually satisfiable against [10, 20], so the contradictory
    // pair keeps the file (the record filter discards its rows)
    assert(m(And(GreaterThan("id", 12L), LessThan("id", 11L))))
    assert(!m(And(GreaterThan("id", 25L), LessThan("id", 30L))))
    assert(m(Or(EqualTo("id", 5L), EqualTo("id", 15L))))
    assert(!m(Or(EqualTo("id", 5L), EqualTo("id", 25L))))
  }

  test("mayMatch: null semantics, strings, and the keep-on-unknown rule") {
    def m(f: Filter) = FileStats.mayMatch(st, f)
    assert(!m(IsNull("id")), "0 nulls refutes IS NULL")
    assert(m(IsNull("name")) && m(IsNotNull("name")))
    assert(!m(IsNotNull("dead")), "all-null column refutes IS NOT NULL")
    assert(!m(EqualTo("dead", 1L)), "all-null column refutes equality")
    assert(m(EqualTo("name", "ccc")) && !m(EqualTo("name", "aaa")))
    assert(m(StringStartsWith("name", "c")) && !m(StringStartsWith("name", "e")))
    // a prefix of the lower bound itself must be kept
    assert(m(StringStartsWith("name", "bb")))
    // unknown bounds (presence-only column) keep everything
    assert(m(EqualTo("blob", 1L)) && m(IsNull("blob")) && m(IsNotNull("blob")))
    // absent column: null-read semantics (schema evolution)
    assert(m(IsNull("ghost")) && !m(EqualTo("ghost", 1L)) && !m(IsNotNull("ghost")))
    // incomparable probe types never refute
    assert(m(EqualTo("id", "not_a_number")))
    assert(m(EqualTo("id", BigDecimal(5))), "decimal probes keep-on-unknown")
    assert(m(EqualTo("name", 7L)))
    // temporal probes compare on the stats' scale (micros / epoch days):
    // a date probe only ever arrives for a DATE column, whose stats ARE
    // epoch days — here `id` covers 10..20, so day 18262 refutes and
    // day 15 keeps (the sound typed-probe contract)
    assert(!m(EqualTo("id", java.sql.Date.valueOf("2020-01-01"))))
    assert(m(EqualTo("id", java.time.LocalDate.ofEpochDay(15L))))
    // vocabulary outside the sound set keeps the file
    assert(m(StringEndsWith("name", "zzz")) && m(Not(EqualTo("id", 15L))))
  }

  test("mayMatch: NaN/Infinity probes and empty stats never refute") {
    val empty = FileStat(0L, Map("id" -> ColStat(None, None, Some(0L))))
    assert(FileStats.mayMatch(st, EqualTo("id", Double.NaN)))
    assert(FileStats.mayMatch(st, GreaterThan("id", Double.PositiveInfinity)))
    assert(FileStats.mayMatch(empty, EqualTo("id", 5L)))
  }
}
