package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** [[Layout]] semantics the q98 oracle hash doesn't state directly:
  * closed-form interleave values, input-domain guard, and the property
  * the operator exists for — Z-ordered partitions have small min/max
  * bounding boxes in BOTH dimensions (the parquet-footer file-skipping
  * contract), where a single-column sort leaves the second dimension
  * unpruned.
  */
class LayoutSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("mortonCode matches hand-computed interleaves") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 1023L))
      .toDF("a", "b")
      .select(Layout.mortonCode(col("a"), col("b"), 10).as("z"))
      .as[Long].collect().toSeq
    // bit i of a -> 2i+1, bit i of b -> 2i
    assert(rows === Seq(0L, 2L, 1L, 27L, (1L << 20) - 1))
  }

  test("bits out of range fails loudly") {
    intercept[IllegalArgumentException] {
      Layout.mortonCode(lit(1L), lit(1L), 0)
    }
    intercept[IllegalArgumentException] {
      Layout.mortonCode(lit(1L), lit(1L), 32)
    }
  }

  test("z-order layout bounds BOTH dimensions; single-column sort only one") {
    // deterministic pseudo-uniform grid points (no rand(): md5-derived)
    val pts = spark.range(16384).select(
      (conv(substring(md5(concat(col("id"), lit(":a"))), 1, 8), 16, 10)
        .cast("long") % 1024).as("a"),
      (conv(substring(md5(concat(col("id"), lit(":b"))), 1, 8), 16, 10)
        .cast("long") % 1024).as("b"))
    // the file-skipping metric: a point query on one column scans every
    // partition whose [min, max] on that column contains the point, so
    // the EXPECTED partitions touched by a uniform point is
    // sum(range_i)/domain. A reader filters sometimes on a, sometimes
    // on b — the layout is judged on the sum of both expectations.
    def expectedTouched(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("a") - min("a")).as("ra"), (max("b") - min("b")).as("rb"))
        .agg(sum("ra").as("sa"), sum("rb").as("sb")).collect()(0)
      (r.getAs[Long]("sa") / 1024.0, r.getAs[Long]("sb") / 1024.0)
    }
    val (za, zb) = expectedTouched(Layout.zorderBy(pts, "a", "b", bits = 10,
      numPartitions = 64))
    val (sa, sb) = expectedTouched(
      pts.repartitionByRange(64, col("a")).sortWithinPartitions("a"))
    // single-column: perfect on a (~1 partition) but EVERY partition
    // spans all of b (sb ~ 64). Z-order: ~sqrt(P) partitions per axis.
    // Require the combined expectation to halve — the measured gap is
    // larger; the margin absorbs hash noise.
    assert((za + zb) * 2 < sa + sb,
      s"z-order touched a=$za b=$zb; single-column a=$sa b=$sb — no locality win")
    assert(zb * 2 < sb, s"z-order did not bound the second dimension: $zb vs $sb")
  }

  test("zorderByRank bounds both dimensions on REAL (skewed, null-bearing) domains") {
    // column a: 80% of rows share one hot value (the skew that defeats
    // value-space quantization); column b: uniform with 2% nulls
    val pts = spark.range(8000).select(
      when(col("id") % 5 < 4, lit(7L))
        .otherwise(conv(substring(md5(concat(col("id"), lit(":a"))), 1, 8), 16, 10)
          .cast("long") % 1000000L).as("a"),
      when(col("id") % 50 === 0, lit(null).cast("long"))
        .otherwise(conv(substring(md5(concat(col("id"), lit(":b"))), 1, 8), 16, 10)
          .cast("long") % 1024).as("b"))
    val z = Layout.zorderByRank(pts, "a", "b", bits = 8, numPartitions = 16)
    // rows survive byte-identically (layout is physical, not data)
    assert(z.count() === 8000)
    assert(z.agg(sum(coalesce(col("b"), lit(0L)))).as[Long].head() ===
      pts.agg(sum(coalesce(col("b"), lit(0L)))).as[Long].head())
    // the uniform dimension must still be bounded per partition even
    // though the OTHER dimension is 80% one value: expected partitions
    // touched by a uniform point probe on b well under all-partitions
    val spans = z.withColumn("p", spark_partition_id())
      .groupBy("p").agg((max("b") - min("b")).as("rb"))
      .agg(sum("rb")).as[Long].head() / 1024.0
    assert(spans * 2 < 16,
      s"rank quantization failed to bound the uniform dimension under skew: " +
        s"expected touched $spans of 16")
    // null ordering contract: nulls land in the FIRST z-bucket
    val firstPart = z.withColumn("p", spark_partition_id())
      .filter(col("b").isNull).agg(max("p")).as[Int].head()
    assert(firstPart <= 1, s"nulls must sort first, found one in partition $firstPart")
  }

  test("mortonCodeN: two-column case is bit-identical to mortonCode; 3-D bounds all dims") {
    val rows = Seq((3L, 5L), (1023L, 1023L), (7L, 0L))
      .toDF("a", "b")
      .select(
        Layout.mortonCode(col("a"), col("b"), 10).as("z2"),
        Layout.mortonCodeN(Seq(col("a"), col("b")), 10).as("zn"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // a 3-D rank z-order bounds every dimension per partition
    val pts = spark.range(8192).select(
      (conv(substring(md5(concat(col("id"), lit(":a"))), 1, 8), 16, 10)
        .cast("long") % 512).as("a"),
      (conv(substring(md5(concat(col("id"), lit(":b"))), 1, 8), 16, 10)
        .cast("long") % 512).as("b"),
      (conv(substring(md5(concat(col("id"), lit(":c"))), 1, 8), 16, 10)
        .cast("long") % 512).as("c"))
    val z = Layout.zorderByRankN(pts, Seq("a", "b", "c"), bits = 6,
      numPartitions = 27)
    Seq("a", "b", "c").foreach { d =>
      val expTouched = z.withColumn("p", spark_partition_id())
        .groupBy("p").agg((max(d) - min(d)).as("r"))
        .agg(sum("r")).as[Long].head() / 512.0
      // 3-D pruning power per dimension is weaker by design (the curve
      // divides its locality across three axes): segments straddle
      // octant boundaries, so ~half the domain per dim is the theory
      // line at 27 segments — assert well under "no pruning", not the
      // 2-D bound
      assert(expTouched < 27 * 0.7,
        s"3-D z-order failed to bound '$d': expected touched $expTouched of 27")
    }
  }

  test("zorderByRank rejects non-numeric and unknown columns loudly") {
    val df = Seq((1L, "x")).toDF("n", "s")
    val e1 = intercept[IllegalArgumentException] {
      Layout.zorderByRank(df, "n", "s", 8, 4)
    }
    assert(e1.getMessage.contains("numeric"))
    val e2 = intercept[IllegalArgumentException] {
      Layout.zorderByRank(df, "n", "missing", 8, 4)
    }
    assert(e2.getMessage.contains("missing"))
  }

  test("compact(zorderBy) rewrites into a layout the stats sidecar prunes on both dims") {
    import graft.operators.{FileStats, Versioned}
    val root = java.nio.file.Files
      .createTempDirectory("graft_zorder_compact_").toString
    val df = spark.range(20000).select(
      col("id").as("k"),
      (conv(substring(md5(concat(col("id"), lit(":v"))), 1, 8), 16, 10)
        .cast("long") % 10000L).as("v"))
    // adversarial start: clustered on k only — v prunes nothing
    Versioned.writeNext(df, root, commitTs = Some(1000L),
      layout = Layout.WriteSpec(sortCols = Seq("k"), numPartitions = Some(16)))
    val v1 = Versioned.compact(spark, root, targetFileBytes = 4 << 10,
      zorderBy = Seq("k", "v"))
    // the pruning metric a band-survivor count can't state robustly
    // (any fixed band aligns with SOME file boundary): expected files
    // touched by a uniform point probe on one column = Σ span_i/domain,
    // straight from the stats sidecar the scan planner actually uses
    def expTouched(v: Long, c: String): (Double, Int) = {
      val st = FileStats.read(java.nio.file.Paths.get(root, s"v=$v")).values.toSeq
      def lh(s: FileStats.FileStat) = s.cols(c) match {
        case FileStats.ColStat(Some(FileStats.L(lo)), Some(FileStats.L(hi)), _) =>
          (lo, hi)
        case other => fail(s"no long bounds for $c: $other")
      }
      val (dLo, dHi) = (st.map(lh(_)._1).min, st.map(lh(_)._2).max)
      (st.map(s => (lh(s)._2 - lh(s)._1).toDouble / (dHi - dLo)).sum, st.size)
    }
    val (preV, preN) = expTouched(0, "v")
    val (postV, postN) = expTouched(v1, "v")
    val (postK, _) = expTouched(v1, "k")
    assert(preV >= preN * 0.85, s"v should not prune before z-ordering ($preV/$preN)")
    assert(postN >= 8, s"need a multi-file rewrite to measure ($postN)")
    assert(postV <= postN * 0.5, s"v expected-touched $postV/$postN after z-ordering")
    assert(postK <= postN * 0.5, s"k expected-touched $postK/$postN after z-ordering")
    // the rewrite carries the source's stamp: time travel still lands
    // on the NEWER (compacted) layout for the same timestamp
    assert(Versioned.resolveAsOf(root, 1000L) === v1)
    // rows identical across the rewrite
    assert(Versioned.read(spark, root, Some(v1)).count() === 20000)
    assert(Versioned.read(spark, root, Some(v1))
      .agg(sum(col("k") + col("v"))).as[Long].head() ===
      df.agg(sum(col("k") + col("v"))).as[Long].head())
  }

  test("q119 partitioned layout prunes directories at planning time") {
    val df = graft.queries.LayoutGate.q119PartitionPruning(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition filter did not reach the scan in:\n$plan")
    // the value predicate must be a PARTITION filter (directory prune),
    // not a data filter evaluated per row after reading
    assert(plan.contains("(event_type#") && plan.contains("= purchase)"),
      s"event_type=purchase not in PartitionFilters in:\n$plan")
    assert(df.count() > 0)
  }

  test("q107 bucketed agg+join plan has ZERO exchanges (the co-location contract)") {
    // force the sort-merge path so the pin proves bucket co-location,
    // not a broadcast that would hide a missing one
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.queries.LayoutGate.q107BucketedJoin(
        spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      // the ONLY exchange allowed is the final presentation orderBy
      // (rangepartitioning); the aggregation and the join must both be
      // satisfied by the bucketed layout — no hash shuffle anywhere
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed layout failed to satisfy a required distribution:\n$plan")
      assert("Exchange".r.findAllIn(plan).size == 1,
        s"expected only the presentation-sort exchange in:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ over buckets in:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed in:\n$plan")
      assert(df.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("sorted versioned write prunes row groups a shuffled write cannot") {
    import graft.operators.Versioned
    val root = java.nio.file.Files
      .createTempDirectory("graft_layout_write_").toString
    val df = spark.range(0, 100000)
      .select(col("id").as("k"), (col("id") * 7 % 1001).as("v"))
    // v=0: shuffled layout (hash-repartitioned on an unrelated column)
    Versioned.writeNext(df.repartition(8, col("v")), root)
    // v=1: write-time clustering on k + a file-size cap
    Versioned.writeNext(df, root,
      layout = Layout.WriteSpec(sortCols = Seq("k"),
        maxRecordsPerFile = 20000, numPartitions = Some(4)))

    val lo = 40000L; val hi = 45000L // a 5% slice of the key domain
    val (skipShuffled, totalShuffled) = Layout.prunableRowGroups(
      java.nio.file.Paths.get(root, "v=0"), "k", lo, hi)
    val (skipSorted, totalSorted) = Layout.prunableRowGroups(
      java.nio.file.Paths.get(root, "v=1"), "k", lo, hi)
    // hash-shuffled: every row group spans nearly the whole key range
    assert(skipShuffled === 0,
      s"shuffled write unexpectedly prunable ($skipShuffled/$totalShuffled)")
    // clustered: >=8 files (maxRecordsPerFile splits each range task),
    // and all but the one or two slices covering [lo, hi] are skippable
    assert(totalSorted >= 5, s"file-size cap did not split ($totalSorted files)")
    assert(skipSorted >= totalSorted - 2,
      s"sorted write should skip all but the covering slices " +
        s"($skipSorted/$totalSorted)")
    // layout is physical only: both versions hold identical rows
    val a = Versioned.read(spark, root, Some(0L)).filter(col("k").between(lo, hi))
    val b = Versioned.read(spark, root, Some(1L)).filter(col("k").between(lo, hi))
    assert(a.collect().map(_.toString).sorted.toSeq ===
      b.collect().map(_.toString).sorted.toSeq)
  }
}
