package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * A full untimed warmup pass runs first so the measurements reflect
  * steady-state execution (JIT, codegen cache, file-footer caches)
  * rather than JVM startup — the 100 TB-relevant number is per-query
  * execution, not session bring-up.
  *
  * Fail-loudly contract (round-8 lesson: 32 queries threw a fast
  * AnalysisException and their ~0.06 s exception-throwing time was
  * counted into the total as if they ran): a query that throws in
  * EITHER timed pass is excluded from `queries`/`total`/`n_queries`
  * and reported in an explicit `errors` map instead — a benchmark
  * number must never measure exception throwing.
  */
object Bench {
  type Q = (SparkSession, String) => DataFrame

  /** ADAPTIVE passes, min per query (single-run numbers swing ±25%
    * with background load on shared hardware; the min is the stable
    * steady-state estimate). The first execution doubles as the
    * warmup: when it comes back sub-second (the planning-bound
    * majority — JIT/codegen cost barely moves a number whose floor is
    * scheduling overhead) it COUNTS as a timed pass and only one more
    * runs; when it is ≥ 1 s the first pass is discarded as warmup and
    * two timed passes follow, exactly the old warmup+2 discipline.
    * This replaced the separate full untimed warmup sweep: BENCH_r16
    * died rc=124 because total bench wall (warmup pass + 2-3 timed
    * passes + load-gate sleeps) outgrew the driver's window — the
    * adaptive form cuts ~one full execution per fast query without
    * changing what the slow queries measure.
    *
    * NOISE GUARD: when the two counted passes disagree by more than 2×
    * (and by >0.2 s absolute — tiny queries flip ratios on scheduler
    * jitter alone) a third pass runs and the min of all three is
    * reported. Min-of-two does not protect against background
    * load spanning both passes of adjacent queries — round 11's
    * official bench showed t29 at 4.05 s (unchanged code; 0.37 s on an
    * idle box) because one noisy window covered both passes. A third
    * pass is cheap and rescues the outlier; the `loadavg` field the
    * main() emits records the box's state for post-hoc triage.
    * Returns (name → seconds) for queries that completed every pass
    * and (name → error) for the rest.
    *
    * Execution is `queryExecution.toRdd.count()` — NOT `df.count()`:
    * wrapping a query in count() lets Catalyst prune every operator
    * whose output the count doesn't need (a window whose carried
    * column feeds only pruned projections disappears entirely — q44's
    * as-of window was being optimized OUT of its own benchmark,
    * flat-lining at 0.3 s from 100 k to 10 M input rows). toRdd
    * executes the query's own optimized plan and counts its rows, so
    * the number measures the operator the gate exists to measure. */
  private[graft] def measure(spark: SparkSession, sfDir: String,
                             queries: Seq[(String, Q)],
                             warm: Boolean = false,
                             onEach: (Seq[(String, Double)], Map[String, String]) => Unit =
                               (_, _) => ())
      : (Seq[(String, Double)], Map[String, String]) = {
    // drop per-query leftovers (localCheckpoint RDDs, cached frames)
    // after each measurement: 180+ queries otherwise accumulate storage
    // memory and the GC pressure bleeds into UNRELATED queries' numbers
    // (q53 measured 2.2 s inside the full run vs 0.46 s isolated before
    // this cleanup)
    def dropQueryState(): Unit = {
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def timeOnce(fn: Q): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        dropQueryState()
        Right(dt)
      }
      catch { case e: Throwable =>
        dropQueryState()
        Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
      }
    }
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(String, Either[String, Double])]
    queries.foreach { case (name, fn) =>
      val r = for {
        first <- timeOnce(fn)
        // sub-second first pass: it IS the first timed pass (warmup
        // would only re-measure scheduling overhead); ≥ 1 s: discard
        // as warmup and take two fresh timed passes. `warm` callers
        // (the tail top-12 re-measure — those queries just ran in the
        // main sweep) always count the first pass.
        a <- if (warm || first < 1.0) Right(first) else timeOnce(fn)
        b <- timeOnce(fn)
        // ratio alone would re-run every sub-50 ms query (tiny times
        // flip 2x on scheduler jitter) — demand a real absolute gap too
        best <-
          if (math.max(a, b) > 2.0 * math.min(a, b) &&
              math.max(a, b) - math.min(a, b) > 0.2)
            timeOnce(fn).map(c => math.min(math.min(a, b), c))
          else Right(math.min(a, b))
      } yield best
      acc += (name -> r)
      // progress hook: the caller can publish a running partial
      // artifact so a kill ANYWHERE inside the sweep still leaves
      // parseable evidence (BENCH_r16 died with none)
      onEach(acc.collect { case (n, Right(v)) => (n, v) }.toSeq,
        acc.collect { case (n, Left(e)) => (n, e) }.toMap)
    }
    (acc.collect { case (n, Right(v)) => (n, v) }.toSeq,
     acc.collect { case (n, Left(e)) => (n, e) }.toMap)
  }

  /** (busy jiffies of the whole box, busy jiffies of THIS process) —
    * the difference's growth over the sweep is co-tenant CPU, measured
    * directly instead of inferred from loadavg (which our own local[N]
    * sweep saturates, so mid-sweep loadavg can't tell background load
    * from our own). USER_HZ is 100 on linux. */
  private def cpuJiffies(): (Long, Long) =
    try {
      val total = {
        val f = scala.io.Source.fromFile("/proc/stat")
        try {
          val parts = f.getLines().next().trim.split("\\s+").drop(1)
            .map(_.toLong)
          // user nice system idle iowait irq softirq steal …
          parts.sum - parts(3) - (if (parts.length > 4) parts(4) else 0L)
        } finally f.close()
      }
      val self = {
        val f = scala.io.Source.fromFile("/proc/self/stat")
        try {
          // fields 14,15 (1-based) = utime, stime; comm may contain
          // spaces but is parenthesized — split after the ')'
          val s = f.mkString
          val rest = s.substring(s.lastIndexOf(')') + 2).split(" ")
          rest(11).toLong + rest(12).toLong
        } finally f.close()
      }
      (total, self)
    } catch { case _: Throwable => (0L, 0L) }

  /** Per-query ratio evidence vs the previous round's artifact: reads
    * the newest BENCH_r*.json in cwd, extracts its `queries` map, and
    * returns (artifact name, this/prev ratio per shared query). Ends
    * the recurring load-noise adjudication: the published line carries
    * its own comparability evidence. */
  private def priorQueries(): Option[(String, Map[String, Double])] =
    try {
      val stream = java.nio.file.Files.list(java.nio.file.Paths.get("."))
      // sort by the NUMERIC round — lexicographic order breaks once
      // rounds outgrow the zero-padding (BENCH_r99 > BENCH_r100)
      val roundRe = "BENCH_r0*([0-9]+)\\.json".r
      val priors =
        try stream.iterator().asScala.map(_.getFileName.toString)
          .collect { case n @ roundRe(r) => (r.toInt, n) }
          .toSeq.sortBy(-_._1).map(_._2)
        finally stream.close()
      // NEWEST artifact that actually carries per-query numbers: a
      // timed-out round leaves `parsed:null` with no queries map
      // (BENCH_r16), and comparing against it would silence the ratio
      // evidence for the round that FIXED the timeout
      priors.iterator.map { name =>
        // driver artifacts WRAP the bench stdout as a JSON string
        // (escaped quotes, tail-truncated) — unescape before
        // extracting; whichever `queries` map survives the truncation
        // (the full map or the compact top-12) provides the ratios
        val body = java.nio.file.Files.readString(
          java.nio.file.Paths.get(name)).replace("\\\"", "\"")
        val qStart = body.indexOf("\"queries\":{")
        val qs =
          if (qStart < 0) Map.empty[String, Double]
          else {
            val sub = body.substring(qStart + 11,
              body.indexOf('}', qStart))
            "\"([A-Za-z0-9_]+)\":([0-9.]+)".r.findAllMatchIn(sub)
              .map(m => m.group(1) -> m.group(2).toDouble).toMap
          }
        name -> qs
      }.find(_._2.nonEmpty)
    } catch { case _: Throwable => None }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // LOADAVG GATE, part 1: min-of-passes cannot defend against
    // sustained background load spanning every pass (BENCH_r12 recorded
    // t99 at 7.6× its idle time under loadavg 6.3). Before doing ANY
    // work of our own — at this point the 1-min loadavg is purely the
    // box's background state — wait (bounded) for it to settle under a
    // threshold instead of measuring into the noise.
    def load1: Double = math.max(0.0,
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage)
    val loadAtLaunch = load1
    var waitedSec = 0
    while (load1 > 2.0 && waitedSec < 300) {
      Thread.sleep(10000); waitedSec += 10
    }
    val loadAtStart = load1
    val spark = GraftSession.build()
    // SPARK_GRAFT_ONLY=a,b,c → time just those queries (scaling-slope
    // runs isolate families; mirrors graft.Verify's subset contract)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = SparkEntry.queries
      .filterNot { case (name, _) =>
        SparkEntry.streamingQueries(name) || SparkEntry.sinkBoundQueries(name) }
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)

    // no separate warmup sweep: measure() treats each query's first
    // execution as its warmup when slow and as a timed pass when fast
    // (see the scaladoc) — one full pass of bench wall saved, which is
    // what kept BENCH_r16 from printing before the driver's timeout
    val (jifTotal0, jifSelf0) = cpuJiffies()
    val sweepT0 = System.nanoTime()
    // co-tenant CPU since the sweep started, in average cores: total
    // busy jiffies minus OUR jiffies, over elapsed time (USER_HZ =
    // 100). This is the direct measurement loadavg can't give once our
    // own local[N] sweep saturates the box — computable at ANY point
    // of the sweep, so progressive partial artifacts carry it too.
    def bgCoresNow(): Double = {
      val (t1, s1) = cpuJiffies()
      val el = (System.nanoTime() - sweepT0) / 1e9
      if (t1 <= jifTotal0 || el <= 0) 0.0
      else math.max(0.0,
        ((t1 - jifTotal0) - (s1 - jifSelf0)) / 100.0 / el)
    }

    def fmt(v: Double): String = f"$v%.3f"
    // the prior artifact pre-dates this run by construction (this run's
    // own file isn't written yet) — read it once, use it for all emits
    val prior = priorQueries()
    /** Writes bench_full.json and prints a compact summary guaranteed
      * to fit the harness's ~2000-char stdout tail window (the full
      * per-query line outgrew that window — BENCH_r03 `parsed: null`);
      * `printFull` additionally prints the full line. Called
      * PROGRESSIVELY during the sweep (every ~25 queries, compact
      * only), once with `partial=true` right after the sweep, and once
      * with the final tail-merged numbers — so a driver kill ANYWHERE
      * (mid-sweep, tail-gate sleep, top-12 re-measure: BENCH_r16 died
      * in the tail with NOTHING parseable) still leaves an artifact
      * whose last stdout line parses. */
    def emit(results: Seq[(String, Double)], errors: Map[String, String],
             partial: Boolean, printFull: Boolean,
             loadAtTail: Double, tailWaitedSec: Int): Unit = {
      val bgCores = bgCoresNow()
      // SHADOWED: the artifact declares its own non-comparability
      // instead of leaving it to post-hoc adjudication — either the box
      // never settled under the launch gate, or co-tenants burned >1.5
      // cores on average while we measured
      val shadowed = loadAtStart > 2.0 || bgCores > 1.5
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val errJson = Verify.toJson(errors)
      val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
      // loadavg evidence: background state before we started (settled,
      // part-1 gate), and at end of run (includes our own load)
      // effective-parallelism evidence (round-17 verdict №2: at sf0.1
      // every ratio sits ≈1 because queries are scheduling-bound, so
      // the driver's 8-vs-32-core probe cannot distinguish "cores
      // honored but overhead-bound" from "cores ignored" — publish the
      // session's ACTUAL master/parallelism/shuffle-partition values so
      // the artifact itself proves $SPARK_GRAFT_CPUS reached the
      // session; see SCALING.md for the heavy-subset slope evidence)
      val parallelismEvidence =
        s""""master":${Verify.q(spark.sparkContext.master)},"default_parallelism":${spark.sparkContext.defaultParallelism},"shuffle_partitions":${Verify.q(spark.conf.get("spark.sql.shuffle.partitions"))}"""
      val loadEvidence = s""""partial":$partial,"n_planned":${queries.size},$parallelismEvidence,"loadavg":${fmt(load1)},"loadavg_start":${fmt(loadAtStart)},"loadavg_launch":${fmt(loadAtLaunch)},"load_waited_sec":$waitedSec,"loadavg_tail":${fmt(loadAtTail)},"tail_waited_sec":$tailWaitedSec,"bg_cpu_cores":${fmt(bgCores)},"shadowed":$shadowed"""
      // per-query ratios vs the previous artifact (this/prev, shared
      // queries): the median is the headline comparability figure — an
      // honest run trends ~1.0 even when a few queries catch noise
      val (ratioEvidence, ratioTable) = prior match {
        case Some((priorName, prev)) if prev.nonEmpty =>
          val shared = results.collect {
            case (n, v) if prev.get(n).exists(_ > 0) => n -> v / prev(n) }
          if (shared.isEmpty) ("\"ratio_vs_prior\":null", "{}")
          else {
            val sortedR = shared.map(_._2).sorted
            val median = sortedR(sortedR.size / 2)
            val table = shared.sortBy(_._1)
              .map { case (n, r) => "\"" + n + "\":" + fmt(r) }
              .mkString("{", ",", "}")
            (s""""ratio_vs_prior":{"artifact":"$priorName","n_shared":${shared.size},"median":${fmt(median)}}""",
              table)
          }
        case _ => ("\"ratio_vs_prior\":null", "{}")
      }
      val fullJson =
        s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$loadEvidence,$ratioEvidence,"query_ratios":$ratioTable,"queries":$qs,"n_queries":${results.size},"n_errors":${errors.size},"errors":$errJson,"sf":"$sfDir"}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_full.json"), fullJson + "\n")
      if (printFull) println(fullJson)
      // the final compact line must be the LAST stdout of the process —
      // spark.stop() runs before it so shutdown noise can't trail it
      if (!partial) spark.stop()
      val top = results.sortBy(-_._2).take(12)
        .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val errNames = errors.keys.toSeq.sorted.take(12)
        .map(Verify.q).mkString("[", ",", "]")
      println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$loadEvidence,$ratioEvidence,"sf":"$sfDir","n_queries":${results.size},"n_errors":${errors.size},"error_names":$errNames,"queries":$top,"queries_truncated":true,"queries_full":"bench_full.json"}""")
      System.out.flush()
    }

    // SWEEP with progressive partial artifacts every ~25 queries: the
    // compact line printed last before a kill is what the driver parses
    var lastEmitted = 0
    val (swept, errors) = measure(spark, sfDir, queries,
      onEach = (done, errs) => {
        if (done.size + errs.size >= lastEmitted + 25) {
          lastEmitted = done.size + errs.size
          emit(done, errs, partial = true, printFull = false,
            loadAtTail = load1, tailWaitedSec = 0)
        }
      })

    // PARTIAL ARTIFACT: everything after this point is refinement of
    // numbers that already exist — publish them first (full line too)
    emit(swept, errors, partial = true, printFull = true,
      loadAtTail = load1, tailWaitedSec = 0)
    val bgCores = bgCoresNow()

    // LOADAVG GATE, part 2: the headline numbers are the SLOWEST ones —
    // a noise window inflating any of them distorts the round-over-round
    // read the most. Re-measure the top-12 once more at the very end
    // (two fresh passes each, min merged in): a sustained noisy window
    // during the sweep now has to ALSO cover this tail re-run to leave
    // an inflated entry in the published top-12.
    //
    // The tail re-run is LOAD-GATED like the launch (round 13 published
    // v41 at 3.2× its idle time because co-tenant load ramped mid-sweep
    // and covered the unguarded tail re-run too): sleep — bounded — until
    // the 1-min loadavg decays below threshold before re-measuring. Our
    // own just-finished sweep inflates loadavg at first; idling here
    // lets it decay toward the true background level. SKIPPED when the
    // sweep's own jiffies measurement already proved the box idle
    // (bg < 0.5 cores): loadavg right after our sweep is OUR load
    // decaying, and sleeping on it burned up to 240 s of the driver
    // window for nothing.
    var tailWaitedSec = 0
    while (bgCores >= 0.5 && load1 > 2.0 && tailWaitedSec < 240) {
      Thread.sleep(10000); tailWaitedSec += 10
    }
    val loadAtTail = load1
    val top12 = swept.sortBy(-_._2).take(12).map(_._1).toSet
    val (retried, _) =
      measure(spark, sfDir, queries.filter(q => top12(q._1)), warm = true)
    val retriedMap = retried.toMap
    val results = swept.map { case (n, v) =>
      n -> math.min(v, retriedMap.getOrElse(n, v)) }
    emit(results, errors, partial = false, printFull = true,
      loadAtTail = loadAtTail, tailWaitedSec = tailWaitedSec)
  }
}
