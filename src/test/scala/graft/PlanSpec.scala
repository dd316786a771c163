package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational

/** Physical-plan assertions (the 100 TB checklist): filters reach the
  * parquet scan, scans prune columns, small dims broadcast. A plan that
  * silently regresses to full scans or shuffle joins fails here even
  * while results stay correct.
  */
class PlanSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1: shipdate filter is pushed to the parquet scan") {
    val plan = planOf(Relational.q1PricingSummary(spark, dir))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter in:\n$plan")
  }

  test("q4 point lookup pushes the key predicate") {
    val plan = planOf(Relational.q4PointLookup(spark, dir))
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]"),
      s"no pushed point filter in:\n$plan")
  }

  test("q7 dim joins broadcast the small sides") {
    val plan = planOf(Relational.q7DimJoins(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ in:\n$plan")
  }

  test("q3 scan prunes to the referenced columns only") {
    val plan = planOf(Relational.q3InList(spark, dir))
    assert(plan.contains("ReadSchema: struct<p_brand:string,p_size:int,p_retailprice:double>"),
      s"column pruning regressed in:\n$plan")
  }

  test("q6 aggregates with a partial (map-side) aggregate before the shuffle") {
    val plan = planOf(Relational.q6MinPerGroup(spark, dir))
    // two HashAggregate nodes around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg in:\n$plan")
  }

  test("q65 deposit point lookup pushes the id below the EAV pivot") {
    val plan = planOf(queries.SearchIndexGate.q65DepositById(spark, dir))
    // the EAV (lineitem-derived) scan must carry the deposit-id filter —
    // the pivot aggregates ONE deposit's rows, not the whole table
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,7)]"),
      s"id filter did not reach the EAV scan in:\n$plan")
  }

  test("q58 surrogate ids use no single-partition global window") {
    val plan = planOf(queries.SiteGates.q58DivarToDelta(spark, dir))
    assert(!plan.contains("Window"), s"global WindowExec crept back into:\n$plan")
  }

  // shuffle-shape pins for the three most structurally complex plans:
  // a silent regression (a dim falling out of broadcast, a new global
  // sort, an extra aggregation round) shows up here before it shows up
  // as a 100× slowdown at scale. Counts are ceilings, not equalities.
  private def shuffles(plan: String): Int =
    "Exchange".r.findAllIn(plan).size - "BroadcastExchange".r.findAllIn(plan).size

  test("q56 incremental: dims broadcast, at most 3 data shuffles") {
    val plan = planOf(queries.SearchIndexGate.q56SearchIncremental(spark, dir))
    assert(!plan.contains("SortMergeJoin"), s"a dim fell out of broadcast:\n$plan")
    assert(shuffles(plan) <= 3, // pivot agg + minrole agg + final sort
      s"shuffle count grew past 3 in:\n$plan")
  }

  test("q58 star load: at most 2 data shuffles, none single-partition") {
    val plan = planOf(queries.SiteGates.q58DivarToDelta(spark, dir))
    assert(shuffles(plan) <= 2, // range-partition for ids + final sort
      s"shuffle count grew past 2 in:\n$plan")
    assert(!plan.contains("SinglePartition"), s"single-partition exchange in:\n$plan")
  }

  test("t42 decontamination: benchmark vocabulary broadcast, one shingle pass") {
    // since r17 the eval vocabulary attaches as a broadcast LEFT join
    // hit-flag (not LEFT SEMI): total and contaminated counts come out
    // of ONE exploded shingle stream instead of two corpus-wide
    // shingle-UDF passes. The pinned property is unchanged — the
    // benchmark side must reach the stream as a BROADCAST, and the
    // corpus side must never shuffle for it.
    val plan = planOf(queries.TextDedup.t42Decontaminate(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side not a broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"benchmark attach degenerated to a shuffle join in:\n$plan")
  }

  test("v39 PQ-ADC: codebooks and LUT broadcast, no cartesian product") {
    val plan = planOf(queries.Vectors.v39PqAdc(spark, dir))
    assert("BroadcastExchange".r.findAllIn(plan).size >= 2,
      s"codebook/LUT broadcasts missing in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"candidate scoring degenerated to a cartesian product in:\n$plan")
  }

  test("q51 divar transform: only the spread + presentation-sort exchanges") {
    val plan = planOf(queries.ListingGate.q51DivarTransform(spark, dir))
    // narrow per-row JSON projection → exactly two exchanges: the
    // ROUND-ROBIN spread of the unsplittable input file ahead of the
    // CPU-heavy per-row pass (Tables.spread) and the range partitioning
    // for the final orderBy; a HASH shuffle creeping in means a
    // join/agg was introduced into a map-only pipeline
    assert(shuffles(plan) <= 2, s"unexpected extra shuffle in:\n$plan")
    assert(plan.contains("RoundRobinPartitioning"),
      s"the input spread (round-robin) is missing from:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"hash shuffle crept into the map-only transform:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
      s"join/window crept into the map-only transform:\n$plan")
  }

  test("t39 CC round: join + hash aggregate, no window, no cartesian") {
    import spark.implicits._
    val labels = (1L to 50L).toDF("v").withColumn("label", org.apache.spark.sql.functions.col("v"))
    val sym = (1L to 49L).map(i => (i, i + 1)).toDF("a", "b")
    val plan = planOf(graft.operators.DupClusters.roundUpdate(sym, labels))
    assert("HashAggregate".r.findAllIn(plan).size >= 2, // partial + final neighbor-min
      s"neighbor-min lost its partial aggregate in:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"),
      s"window/cartesian crept into the CC round:\n$plan")
  }

  test("media decode gates stay scan-side: one shuffle (the final sort) only") {
    for (q <- Seq(queries.ImagePixels.t44PngPixelStats _,
                  queries.ImagePixels.t46GifPixelStats _,
                  queries.ImagePixels.t49WavAudioStats _)) {
      val plan = planOf(q(spark, dir))
      // the round-robin input spread (Tables.spread, ahead of the
      // CPU-heavy decode) + the final sort — no hash shuffle allowed
      assert(shuffles(plan) <= 2, s"decode gate grew a data shuffle:\n$plan")
      assert(!plan.contains("hashpartitioning"),
        s"hash shuffle crept into a scan-side decode gate:\n$plan")
    }
  }

  test("t48/t50 dedup decisions: bounded shuffles, no pair join") {
    for (q <- Seq(queries.ImagePixels.t48ImageDedupDrops _,
                  queries.ImagePixels.t50AudioDedupDrops _)) {
      val plan = planOf(q(spark, dir))
      assert(shuffles(plan) <= 4, // spread + band window + distinct + sort
        s"drop-decision shuffle count grew past 4 in:\n$plan")
      assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
        s"a pairwise join crept into the linear drop decision:\n$plan")
    }
  }

  test("q73 range join: bucketized equi-join, no nested loop or cartesian") {
    val plan = planOf(queries.Temporal.q73RangeJoin(spark, dir))
    // the whole point of RangeJoin.bucketed: the BETWEEN predicate must
    // ride an equi-join on the bucket key, never a nested-loop scan
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop in:\n$plan")
    assert(plan.contains("Join"), s"no join in:\n$plan")
  }

  test("t60 shuffle shards: distributed prefix count, no single-partition window") {
    val plan = planOf(queries.ShapeGate.t60ShuffleShards(spark, dir))
    assert(!plan.contains("Window"), s"global WindowExec crept into:\n$plan")
  }

  test("q86 shipping priority: filters pushed, dim broadcast, partial agg") {
    val plan = planOf(queries.Relational.q86ShippingPriority(spark, dir))
    assert(plan.contains("PushedFilters"), s"scan filters not pushed in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"dim join not broadcast in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
  }

  test("q87 correlated subqueries decorrelate to aggregate+join") {
    val plan = planOf(queries.Relational.q87CorrelatedSubquery(spark, dir))
    assert(!plan.contains("scalar-subquery"),
      s"correlated scalar subquery survived to execution in:\n$plan")
    assert(plan.contains("Join") && plan.contains("HashAggregate"),
      s"decorrelated aggregate+join missing from:\n$plan")
  }

  test("q88 correlated EXISTS decorrelates to a semi hash join, no nested loop") {
    val plan = planOf(queries.Relational.q88ExistsLateLineitem(spark, dir))
    assert(plan.contains("LeftSemi"), s"EXISTS did not become a semi join in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"EXISTS decorrelation left a nested loop in:\n$plan")
    assert(plan.contains("PushedFilters"), s"date filter not pushed in:\n$plan")
  }

  test("q89 correlated NOT EXISTS decorrelates to an anti hash join, no nested loop") {
    val plan = planOf(queries.Relational.q89NotExistsRecentOrder(spark, dir))
    assert(plan.contains("LeftAnti"), s"NOT EXISTS did not become an anti join in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"NOT EXISTS decorrelation left a nested loop in:\n$plan")
  }

  test("t73 global quantiles: distributed prefix count, no single-partition window") {
    val plan = planOf(queries.ShapeGate.t73GlobalQuantiles(spark, dir))
    assert(!plan.contains("Window"), s"global WindowExec crept into:\n$plan")
  }

  test("t58 tfidf: bounded shuffles, no cartesian") {
    val plan = planOf(queries.ShapeGate.t58TfidfTopTerms(spark, dir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"tf-df join degenerated in:\n$plan")
    assert(shuffles(plan) <= 5, // tf agg + df agg + join + window + sort
      s"shuffle count grew past 5 in:\n$plan")
  }

  test("v41 semdedup: per-cell verdict pass, no pair-output exchange") {
    // the verdict comes from ONE flatMapGroups pass over cells — pin
    // the LAZY pass-1 plan (dedup() localCheckpoints it, which would
    // hide the shape behind a Scan ExistingRDD)
    val emb = Tables.embeddings(spark, dir)
      .withColumn("vec_id", org.apache.spark.sql.functions.col("vec_id").cast("long"))
    val plan = planOf(operators.SemDedup.verdictPass(
      operators.SemDedup.indexOf(emb, "vec_id", "embedding", 8),
      "vec_id", 300000L, 1 << 20))
    assert(plan.contains("MapGroups"),
      s"per-cell verdict operator missing from:\n$plan")
    // the pair self-join (its `a.vid < b.vid` condition) must be gone —
    // no plan operator ever materializes or exchanges pair rows
    assert("vid#\\d+L? < vid#\\d+".r.findFirstIn(plan).isEmpty,
      s"pair self-join (vid < vid) reappeared in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    // remaining joins are the index build's: k-row centroid broadcasts
    // and the vid equi-join — bounded shuffles end to end
    assert(shuffles(plan) <= 10, s"shuffle count grew past 10 in:\n$plan")
    // and the operator's returned frame is the materialized pass —
    // consumers never recompute the assignment scan
    val returned = planOf(queries.Vectors.v41Semdedup(spark, dir))
    assert(returned.contains("ExistingRDD"),
      s"dedup() result is not checkpoint-backed:\n$returned")
    assert(shuffles(returned) <= 1, s"post-checkpoint shuffles grew:\n$returned")
  }

  test("t66 pagerank: per-round join+agg with partial aggregation, no cartesian") {
    val plan = planOf(queries.ShapeGate.t66Pagerank(spark, dir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"rank propagation degenerated in:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, // partial + final dst sums
      s"dst sum lost its partial aggregate in:\n$plan")
  }

  test("v37 IVF: centroids broadcast, bounded shuffle rounds") {
    val plan = planOf(queries.Vectors.v37IvfAnn(spark, dir))
    assert("BroadcastExchange".r.findAllIn(plan).size >= 2,
      s"centroid broadcasts missing in:\n$plan")
    assert(shuffles(plan) <= 10, // seed + assign/refine aggs + probe join + rank
      s"shuffle count grew past 10 in:\n$plan")
  }

  test("v45 fused retrieval: small frames broadcast, no cartesian over the corpus") {
    val plan = planOf(queries.Vectors.v45IvfAdcRerank(spark, dir))
    // centroids (x2: probe + index build), codebooks (x2: encode + LUT)
    // and the per-query LUT must all ride broadcasts; the only
    // corpus-width joins are equi-joins on probed cells / vid
    assert("BroadcastExchange".r.findAllIn(plan).size >= 4,
      s"centroid/codebook/LUT broadcasts missing in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in the fused pipeline:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, // partial+final ADC sums
      s"ADC sum lost its partial aggregate in:\n$plan")
  }

  test("q92 session window: one keyed shuffle into the session merge, partial aggs") {
    val plan = planOf(queries.Temporal.q92SessionWindow(spark, dir))
    assert(plan.contains("MergingSessions"),
      s"native session-merge operator missing from:\n$plan")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      s"session agg should shuffle exactly once on the key in:\n$plan")
    assert(plan.contains("partial_count"),
      s"session counts lost map-side combine in:\n$plan")
  }

  test("q96 gap fill: keyed window (no global stage), equi-join grid, pushed filters") {
    val plan = planOf(queries.Temporal.q96GapFill(spark, dir))
    assert(plan.contains("windowspecdefinition(user_id"),
      s"forward-fill window lost its partition key in:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"grid join degenerated in:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), IsNotNull(user_id), EqualTo(event_type,purchase)]"),
      s"purchase filter not pushed in:\n$plan")
  }

  test("q93 multiset ops: count-compare aggregates + replicate, never pairwise") {
    val plan = planOf(queries.Relational.q93MultisetOps(spark, dir))
    assert(plan.contains("replicaterows"),
      s"INTERSECT/EXCEPT ALL lost the count-replicate plan in:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      s"multiset ops degenerated to a join in:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity)"),
      s"branch filters not pushed in:\n$plan")
  }

  test("q94 pivot: explicit-values pivotfirst with map-side partials, no discovery pass") {
    val plan = planOf(queries.Relational.q94Pivot(spark, dir))
    assert(plan.contains("partial_pivotfirst"),
      s"pivot lost its partial aggregate in:\n$plan")
    assert(shuffles(plan) <= 3, // (user,type) agg + pivot agg + sort
      s"pivot shuffle count grew past 3 in:\n$plan")
  }

  test("t80 moment profile: one aggregate pass with partials, pruned scan") {
    val plan = planOf(queries.ShapeGate.t80MomentProfile(spark, dir))
    assert(plan.contains("partial_count") && plan.contains("partial_sum"),
      s"moment sums lost map-side combine in:\n$plan")
    assert(shuffles(plan) <= 2, // keyed agg + final sort
      s"moment profile shuffle count grew past 2 in:\n$plan")
    assert(plan.contains("ReadSchema: struct<text:string,source:string>"),
      s"scan did not prune to (text, source) in:\n$plan")
  }

  test("q104 islands: one keyed shuffle feeds both window passes, no interval self-join") {
    val plan = planOf(queries.BehaviorGate.q104IntervalCoverage(spark, dir))
    // the gaps-and-islands rewrite must never express overlap via a
    // self-join of intervals (the quadratic trap) — only windows over
    // the user partition plus hash aggregates
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct")
        && !plan.contains("BroadcastNestedLoopJoin"),
      s"islands degenerated to an interval join in:\n$plan")
    assert("Window".r.findAllIn(plan).size >= 1, s"expected window passes in:\n$plan")
    assert(plan.contains("[user_id"),
      s"window lost its user_id partition spec (single-partition trap) in:\n$plan")
  }

  test("q118 attribution: user-keyed join with the day-window as a residual, no nested loop") {
    val plan = planOf(queries.BehaviorGate.q118MultiTouchAttribution(spark, dir))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"attribution window predicate demoted the join in:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_min"),
      s"attribution aggregate lost map-side combine in:\n$plan")
  }

  test("q127 SQL hint forces the broadcast even with auto-broadcast disabled") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = planOf(queries.Relational.q127SqlHints(spark, dir))
      assert(plan.contains("BroadcastHashJoin"),
        s"BROADCAST hint ignored (no broadcast join) in:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"hint lost to SMJ in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q124 cached view: the second consumer reads the InMemoryRelation, not the table") {
    val df = queries.Relational.q124CachedView(spark, dir)
    df.count() // materialize (fills the cache on first use)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"cached intermediate not read from memory in:\n$plan")
  }

  test("q110 SCD2 lookup: equi key drives the join, interval conjuncts ride as residents") {
    val plan = planOf(queries.ChangeGate.q110Scd2Lookup(spark, dir))
    // the customer key must be the join key (hash or sort-merge); the
    // eff_from/eff_to interval predicate must NOT demote the join to a
    // nested loop / cartesian — the per-key version scan is the shape
    // that survives 10^9 facts
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
        || plan.contains("BroadcastHashJoin"),
      s"temporal lookup lost its equi join in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin")
        && !plan.contains("CartesianProduct"),
      s"interval predicate demoted the join to a nested loop in:\n$plan")
  }

  test("q103 snapshot diff: single full-outer equi join, filters pushed to both scans") {
    val plan = planOf(queries.ChangeGate.q103SnapshotDiff(spark, dir))
    assert(plan.contains("FullOuter"), s"diff lost its full-outer join in:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"diff degenerated to a non-equi join in:\n$plan")
  }

  test("q102 changelog compaction: map-side-combinable max(struct), no window") {
    val plan = planOf(queries.ChangeGate.q102ChangelogCompact(spark, dir))
    assert(plan.contains("partial_max"),
      s"compaction lost its map-side partial max in:\n$plan")
    assert(!plan.contains("Window"),
      s"compaction regressed to a window (shuffles the whole changelog) in:\n$plan")
  }

  test("q129 DPP: dim keys become a dynamicpruning PartitionFilter; 2 of 5 partitions read") {
    val df = queries.LayoutGate.q129DynamicPruning(spark, dir)
    df.collect() // DPP resolves at runtime; metrics exist only after execution
    val plan = planOf(df)
    assert(plan.contains("dynamicpruningexpression"),
      s"fact scan carries no runtime partition-pruning filter in:\n$plan")
    // the scan's driver-side metric counts the directories actually
    // read; AQE hides it inside query stages, so descend explicitly
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val here = p match {
        case s: FileSourceScanExec    => Seq(s)
        case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
        case q: QueryStageExec        => allScans(q.plan)
        case _                        => Seq.empty
      }
      here ++ p.children.flatMap(allScans) ++ p.subqueries.flatMap(allScans)
    }
    val scans = allScans(df.queryExecution.executedPlan)
      .filter(_.partitionFilters.nonEmpty)
    assert(scans.nonEmpty, s"no partitioned fact scan found in:\n$plan")
    val read = scans.head.metrics("numPartitions").value
    assert(read === 2, s"expected the conversion stages' 2 partitions, read $read")
  }

  test("q136 runtime bloom filter: might_contain injected below the fact shuffle") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      val df = queries.LayoutGate.bloomJoinProgram(spark, dir)
      val plan = planOf(df)
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter on the fact side in:\n$plan")
      assert(!plan.contains("BroadcastHashJoin"),
        s"join did not shuffle — bloom pruning untested in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q137 native as-of join: AsOfJoin physical node, one exchange per side, no window") {
    val plan = planOf(queries.Temporal.q137AsofJoinNative(spark, dir))
    assert(plan.contains("AsOfJoin"),
      s"native as-of operator missing — strategy not applied in:\n$plan")
    assert(!plan.contains("Window"),
      s"union+window form leaked into the native path:\n$plan")
    assert(!plan.contains("Union"),
      s"union+window form leaked into the native path:\n$plan")
    // the SMJ cost structure: each side exchanges on the key once
    // (fact and dim shuffled separately — never unioned first), plus
    // the gate's presentation sort
    assert(shuffles(plan) <= 3, s"expected ≤3 exchanges in:\n$plan")
  }

  test("native as-of join: downstream aggregate on the keys reuses the exec's exchange") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("snap_ts"),
        col("value").as("snap_value"))
    val agg = graft.operators.TemporalJoin
      .asOfJoinNative(purchases, signups, Seq("user_id"), "ts", "snap_ts")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("snap_value").as("sum_snap"))
    val plan = planOf(agg)
    assert(plan.contains("AsOfJoin"), s"native operator missing in:\n$plan")
    // outputPartitioning = left side's hash partitioning on the key, so
    // the aggregate must ride the join's exchanges: exactly one per
    // side, none between AsOfJoin and the HashAggregate — the exchange
    // reuse a native operator exists for at 100 TB
    assert(shuffles(plan) <= 2,
      s"aggregate re-shuffled above AsOfJoinExec in:\n$plan")
  }

  test("q140 DSv2 snapshot: custom GraftVersionedScan node with resolved time travel") {
    val plan = planOf(queries.VersionedGate.q140Dsv2TimeTravel(spark, dir))
    // timestampAsOf=2500 must resolve to the stamp-2000 commit (v=1)
    // inside the custom TableProvider/Scan, visible in the scan node
    assert(plan.contains("GraftVersionedScan version=1"),
      s"custom DSv2 scan missing or resolved wrong version in:\n$plan")
  }

  test("SQL UPDATE plans as ReplaceData over the filter-free row-level scan") {
    val wh = java.nio.file.Files.createTempDirectory("graft_planspec_rlo_").toString
    spark.conf.set("spark.sql.catalog.prlo", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.prlo.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS prlo.t")
    spark.sql("CREATE TABLE prlo.t.u (id BIGINT, v BIGINT) USING `graft-versioned`")
    spark.sql("INSERT INTO prlo.t.u SELECT id, id FROM range(0, 100)")
    val plan = spark.sql(
      "EXPLAIN UPDATE prlo.t.u SET v = v + 1 WHERE id % 7 = 0 AND id < 50")
      .collect()(0).getString(0)
    assert(plan.contains("ReplaceData"), s"no ReplaceData in:\n$plan")
    assert(plan.contains("GraftRowLevelScan"), s"row-level scan missing in:\n$plan")
    // the translatable half of the condition arrives as a group hint;
    // the scan never applies it to rows (file pruning only)
    assert(plan.contains("GroupHints: [") && plan.contains("LessThan(id,50"),
      s"group hint missing in:\n$plan")
    // UPDATE = conditional projection, never a Filter above the scan
    // (a filter would drop the carry-over rows from the replacement)
    assert(!plan.matches("(?s).*Filter.*GraftRowLevelScan.*"),
      s"unexpected Filter above the row-level scan in:\n$plan")
  }

  test("UPDATE on a deletionVectors table plans as WriteDelta, with filters applied") {
    val wh = java.nio.file.Files.createTempDirectory("graft_planspec_dlt_").toString
    spark.conf.set("spark.sql.catalog.pdlt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pdlt.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pdlt.t")
    spark.sql("CREATE TABLE pdlt.t.u (id BIGINT, v BIGINT) USING `graft-versioned` " +
      "TBLPROPERTIES ('deletionVectors'='true')")
    spark.sql("INSERT INTO pdlt.t.u SELECT id, id FROM range(0, 100)")
    val plan = spark.sql(
      "EXPLAIN UPDATE pdlt.t.u SET v = v + 1 WHERE id % 7 = 0 AND id < 50")
      .collect()(0).getString(0)
    // merge-on-read: the delta protocol, not the group-based rewrite
    assert(plan.contains("WriteDelta"), s"no WriteDelta in:\n$plan")
    assert(!plan.contains("ReplaceData"),
      s"a deletionVectors table must not fall back to ReplaceData:\n$plan")
    // unlike the group-based path, non-matching rows produce no delta —
    // the condition filters rows for real (pushed + residual), and the
    // scan is the standard one (no carry-over discipline needed)
    assert(plan.contains("GraftVersionedScan"), s"standard scan missing in:\n$plan")
    assert(plan.contains("PushedFilters: [") && plan.contains("LessThan(id,50"),
      s"pushed filter missing in:\n$plan")
  }

  test("q134 AQE skew join: a runtime skew split occurred and equals the salted variant") {
    queries.LayoutGate.withSkewJoinConfs(spark) {
      val df = queries.LayoutGate.skewJoinProgram(spark, dir)
      df.collect() // AQE decides from materialized shuffle stats
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join partitions in:\n$plan")
      assert(!plan.contains("BroadcastHashJoin"),
        s"join broadcast instead of shuffling — skew path untested in:\n$plan")
    }
    // engine-native skew handling and manual salting (q66's technique)
    // must produce the identical rollup
    val aqe = queries.LayoutGate.q134AqeSkewJoin(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val salted = queries.LayoutGate.skewJoinSalted(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(aqe === salted, "AQE skew join diverged from the salted join")
  }

  test("t112 perplexity: LM lookups broadcast, no SMJ, no global window") {
    // the pinned property lives on the SCORING plan: since r17,
    // ccnetSplit materializes the per-doc scores (the threshold pick
    // and the bucketed output would otherwise run the scoring joins
    // twice), so the gate's RETURNED plan only reads the checkpoint —
    // assert on the scoring operator itself, where the joins execute
    import org.apache.spark.sql.functions._
    val docs = Tables.spread(Tables.documents(spark, dir))
    val plan = planOf(operators.PerplexityLm.scoreBigramLm(
      docs, "doc_id", "text", pmod(col("doc_id"), lit(2)) === 0))
    // vocab-sized LM count tables must reach the token stream as
    // broadcasts at this scale (Catalyst's stats decision — a silent
    // fallback to SortMergeJoin would shuffle the stream three times)
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast LM join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
  }

  test("v57/t113 retrieval: ranking windows partition on the query key") {
    for (df <- Seq(queries.Vectors.v57HybridRrf(spark, dir),
        queries.CorpusGate.t113RagRetrieval(spark, dir))) {
      val plan = planOf(df)
      assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
      // every WindowExec must carry a partition spec (per-query top-k);
      // an empty partitionBy would drag the corpus to one task
      val winSpecs = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(winSpecs.nonEmpty && winSpecs.forall(_.contains("query_id")),
        s"a ranking window lost its query partition in:\n$plan")
    }
  }
}
