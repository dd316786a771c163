package graft.queries

/** Generic per-gate profiler (Test/runMain graft.queries.ProfileQuery
  * <name> [sfDir] [nocodegen]) — reports DataFrame construction cost,
  * tracked phase times (analysis/optimization/planning), fresh
  * end-to-end runs, and a same-RDD recount. CAVEATS learned the hard
  * way: the recount REUSES completed shuffle stages (it is a lower
  * bound on the final stage only, NOT "execution minus planning"), and
  * whole-stage codegen compilation is invisible to the phase tracker —
  * cross-check with `nocodegen` before attributing time to Janino. */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery <queryName> [sfDir]")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val s = graft.GraftSession.build()
    if (args.contains("nocodegen"))
      s.conf.set("spark.sql.codegen.wholeStage", "false")
    val q = graft.SparkEntry.queries(name)

    q(s, dir).queryExecution.toRdd.count() // warm
    def freshOnce(): Double = {
      val t0 = System.nanoTime()
      q(s, dir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val fresh = math.min(freshOnce(), freshOnce())
    def buildOnce(): Double = {
      val t0 = System.nanoTime()
      q(s, dir) // DataFrame construction only — no execution
      (System.nanoTime() - t0) / 1e9
    }
    val build = math.min(buildOnce(), buildOnce())
    println(f"PROF $name build_only=${build}%.3f")
    val bound = q(s, dir)
    bound.queryExecution.toRdd.count() // materialize the plan
    def rerunOnce(): Double = {
      val t0 = System.nanoTime()
      bound.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val rerun = math.min(rerunOnce(), rerunOnce())
    println(f"PROF $name fresh=${fresh}%.3f rerun=${rerun}%.3f " +
      f"plan_share=${math.max(0.0, fresh - rerun) / fresh * 100}%.0f%%")
    val qe = q(s, dir).queryExecution
    qe.executedPlan // force all phases
    qe.tracker.phases.toSeq.sortBy(-_._2.durationMs).foreach { case (ph, t) =>
      println(s"PHASE $ph ${t.durationMs}ms")
    }
    s.stop()
  }
}
