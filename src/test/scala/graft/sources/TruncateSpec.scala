package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** `PARTITIONED BY (truncate(n, col))` — Iceberg's remaining standard
  * transform by the temporal recipe: a GENERATED floor-to-multiple /
  * string-prefix column, range-clustering on the RAW key (truncation
  * is monotone in it), boundary rolls pinning one bin per file, and
  * `truncate(n, col)` KeyGroupedPartitioning for storage-partitioned
  * joins on the raw key. */
class TruncateSpec extends AnyFunSuite with SparkSpec {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_trunc_spec_").toString

  private def cat(): Unit = {
    spark.conf.set("spark.sql.catalog.trc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.trc.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS trc.t")
  }

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val olds = kvs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("DDL accepts truncate(n, col); the generated column floors") {
    cat()
    spark.sql("DROP TABLE IF EXISTS trc.t.a")
    spark.sql("CREATE TABLE trc.t.a (id BIGINT, v BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (truncate(10, id))")
    val props = spark.sql("SHOW TBLPROPERTIES trc.t.a").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("partitionedBy").contains("truncate(10,id)"), props)
    assert(props.get("clusterBy").contains("id_trunc"), props)
    // negatives FLOOR (Iceberg semantics), they don't round toward zero
    spark.sql("INSERT INTO trc.t.a (id, v) VALUES (-7, 1), (-10, 2), " +
      "(0, 3), (7, 4), (23, 5)")
    val got = spark.sql("SELECT id, id_trunc FROM trc.t.a ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got === Seq(-10L -> -10L, -7L -> -10L, 0L -> 0L, 7L -> 0L,
      23L -> 20L))
  }

  test("the V2 truncate function agrees with the generated SQL on " +
      "longs, ints, strings, negatives and NULL") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val longF = GraftTruncateFunction.bind(StructType(Seq(
      StructField("n", IntegerType), StructField("k", LongType))))
      .asInstanceOf[GraftTruncateBound]
    val rows = spark.range(-2000, 2000, 13).toDF("k")
    val sqlSide = rows.selectExpr("k", "k - pmod(k, 7L) AS t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sqlSide.foreach { case (k, t) =>
      assert(longF.produceResult(InternalRow(7, k)) === t,
        s"function/SQL drift at $k")
    }
    val strF = GraftTruncateFunction.bind(StructType(Seq(
      StructField("n", IntegerType), StructField("k", StringType))))
      .asInstanceOf[GraftTruncateBound]
    Seq("" -> "", "ab" -> "ab", "abcd" -> "abc",
        "αβγδε" -> "αβγ" /* characters, not bytes */).foreach {
      case (in, want) =>
        assert(strF.produceResult(
          InternalRow(3, UTF8String.fromString(in))).toString === want)
    }
    assert(strF.produceResult(InternalRow(3, null)) === null)
    // key-type scoping keeps INT and BIGINT tables from co-partitioning
    val intF = GraftTruncateFunction.bind(StructType(Seq(
      StructField("n", IntegerType), StructField("k", IntegerType))))
      .asInstanceOf[GraftTruncateBound]
    assert(intF.canonicalName() !== longF.canonicalName())
  }

  test("every committed file pins exactly one bin (boundary roll)") {
    cat()
    spark.sql("DROP TABLE IF EXISTS trc.t.pin")
    spark.sql("CREATE TABLE trc.t.pin (id BIGINT, v BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (truncate(100, id))")
    spark.sql("INSERT INTO trc.t.pin (id, v) SELECT id, id * 3 FROM range(0, 500)")
    val root = s"$warehouse/t/pin"
    val v = graft.operators.Versioned.latestVersion(root).get
    val stats = graft.operators.FileStats.read(
      java.nio.file.Paths.get(root, s"v=$v"))
    assert(stats.nonEmpty)
    stats.foreach { case (f, st) =>
      val c = st.cols("id_trunc")
      assert(c.lo.isDefined && c.lo === c.hi,
        s"file $f spans bins [${c.lo}, ${c.hi}]")
    }
  }

  test("co-truncated join on the raw key runs with zero exchanges; " +
      "mismatched widths never co-partition") {
    cat()
    Seq("j1" -> 100, "j2" -> 100, "j3" -> 50).foreach { case (t, w) =>
      spark.sql(s"DROP TABLE IF EXISTS trc.t.$t")
      spark.sql(s"CREATE TABLE trc.t.$t (id BIGINT, v BIGINT) " +
        s"USING `graft-versioned` PARTITIONED BY (truncate($w, id))")
      spark.sql(s"INSERT INTO trc.t.$t (id, v) SELECT id, id * 3 FROM range(0, 400)")
    }
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql("SELECT a.id FROM trc.t.j1 a JOIN trc.t.j2 b " +
        "ON a.id = b.id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-truncated join must skip both exchanges:\n$plan")
      assert(j.count() === 400L)
      val m = spark.sql("SELECT a.id FROM trc.t.j1 a JOIN trc.t.j3 b " +
        "ON a.id = b.id")
      val mPlan = m.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(mPlan).size >= 1,
        s"mismatched widths must shuffle as before:\n$mPlan")
      assert(m.count() === 400L)
    }
  }

  test("compatible-width SPJ: truncate(50) joins truncate(100) with " +
      "zero exchanges when the reducer conf is on") {
    cat()
    // j3 is truncate(50) from the mismatch test; j1 is truncate(100)
    val q = "SELECT a.id, a.v, b.v AS bv FROM trc.t.j3 a JOIN trc.t.j1 b " +
      "ON a.id = b.id"
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.sql(q)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"truncate(50) x truncate(100) must co-partition via the reducer:\n$plan")
      assert(j.count() === 400L)
      assert(j.filter("v != bv").count() === 0L)
    }
  }

  test("string-prefix truncation: per-file pin and range prune") {
    cat()
    spark.sql("DROP TABLE IF EXISTS trc.t.s")
    spark.sql("CREATE TABLE trc.t.s (k STRING, v BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (truncate(1, k))")
    spark.sql("INSERT INTO trc.t.s (k, v) " +
      "SELECT concat(substring('abcdef', cast(id % 6 AS INT) + 1, 1), " +
      "cast(id AS STRING)), id FROM range(0, 300)")
    val root = s"$warehouse/t/s"
    val v = graft.operators.Versioned.latestVersion(root).get
    val stats = graft.operators.FileStats.read(
      java.nio.file.Paths.get(root, s"v=$v"))
    stats.foreach { case (f, st) =>
      val c = st.cols("k_trunc")
      assert(c.lo.isDefined && c.lo === c.hi, s"file $f spans prefixes")
    }
    // a raw-prefix range predicate prunes through the raw key stats
    val probe = spark.sql(
      "SELECT k, v FROM trc.t.s WHERE k >= 'c' AND k < 'd'")
    probe.collect()
    val desc = probe.queryExecution.executedPlan.toString
    val m = "DataFiles: (\\d+)/(\\d+)".r.findFirstMatchIn(desc)
    assert(m.isDefined, desc)
    assert(m.get.group(2).toInt >= 3 &&
      m.get.group(1).toInt <= m.get.group(2).toInt / 2,
      s"prefix range kept ${m.get.group(1)}/${m.get.group(2)} files:\n$desc")
  }

  test("refusal matrix: non-positive width, unsupported key types, " +
      "derived-name collision") {
    cat()
    def refuse(ddl: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(ddl))
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(e).exists(_.contains(needle)), msgs(e).toString)
    }
    refuse("CREATE TABLE trc.t.bad (id BIGINT, f DOUBLE) " +
      "USING `graft-versioned` PARTITIONED BY (truncate(4, f))", "truncate")
    refuse("CREATE TABLE trc.t.bad (id BIGINT, b SMALLINT) " +
      "USING `graft-versioned` PARTITIONED BY (truncate(4, b))", "truncate")
    refuse("CREATE TABLE trc.t.bad (id BIGINT, id_trunc BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (truncate(4, id))", "id_trunc")
  }

  test("partition-spec evolution to and from truncate is metadata-only") {
    cat()
    spark.sql("DROP TABLE IF EXISTS trc.t.ev")
    spark.sql("CREATE TABLE trc.t.ev (id BIGINT, v BIGINT) " +
      "USING `graft-versioned` PARTITIONED BY (id)")
    spark.sql("INSERT INTO trc.t.ev (id, v) SELECT id, id FROM range(0, 100)")
    spark.sql("ALTER TABLE trc.t.ev SET TBLPROPERTIES " +
      "('partitionedBy'='truncate(25,id)')")
    spark.sql("INSERT INTO trc.t.ev (id, v) SELECT id, id FROM range(100, 200)")
    val props = spark.sql("SHOW TBLPROPERTIES trc.t.ev").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("partitionedBy").contains("truncate(25,id)"), props)
    // pre-evolution files read the derived column as null; post ones bin
    val bins = spark.sql("SELECT id, id_trunc FROM trc.t.ev ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(bins.filter(_._1 < 100).forall(_._2.isEmpty))
    assert(bins.filter(_._1 >= 100).forall(b => b._2.contains(b._1 / 25 * 25)))
    assert(spark.sql("SELECT count(*) FROM trc.t.ev").collect()(0)
      .getLong(0) === 200L)
  }
}
