package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** O22 early-stop pagination policy (driver-side by design). */
class PaginatedIngestSpec extends AnyFunSuite {
  import PaginatedIngest._

  private def pages(p: Map[Int, Seq[String]]): Int => Seq[String] =
    i => p.getOrElse(i, Seq.empty)

  test("stops when duplicate ratio crosses the threshold (divar ≥ 0.5)") {
    val fetch = pages(Map(
      1 -> Seq("a", "b", "c", "d"),        // all fresh
      2 -> Seq("a", "b", "e", "f"),        // 0.5 dup → stop AFTER collecting
      3 -> Seq("x", "y")))                 // never fetched
    // nothing externally seen → all 3 pages crawled; page-2 repeats of
    // a/b are within-run dups (dropped from output, not counted in ratio)
    val (urls, stats) = crawl(fetch, Set("z"), Config(maxPages = 50, dupRatioStop = 0.5))
    assert(urls === Seq("a", "b", "c", "d", "e", "f", "x", "y"))
    // seen {a,b}: page 1 is 50% dup → stop after it, keeping its fresh URLs
    val (urls2, stats2) = crawl(fetch, Set("a", "b"), Config(maxPages = 50, dupRatioStop = 0.5))
    assert(urls2 === Seq("c", "d"))
    assert(stats2.stoppedEarly)
    assert(stats2.pagesFetched === 1)
  }

  test("respects the page cap (max_pages)") {
    val fetch = (i: Int) => Seq(s"u$i")
    val (urls, stats) = crawl(fetch, _ => false, Config(maxPages = 10, dupRatioStop = 0.9))
    assert(urls.size === 10)
    assert(!stats.stoppedEarly)
  }

  test("empty page terminates the scan") {
    val fetch = pages(Map(1 -> Seq("a"), 2 -> Seq.empty))
    val (urls, stats) = crawl(fetch, _ => false)
    assert(urls === Seq("a"))
    assert(stats.pagesFetched === 2 && !stats.stoppedEarly)
  }

  test("Bloom-backed seen probe composes (J7 plumbing)") {
    val spark = graft.SparkTestSession.get
    import spark.implicits._
    val existing = Seq("a", "b").toDF("k")
    val bloom = graft.operators.KeyedSink.buildBloom(existing, "k", 100, 0.01)
    val fetch = pages(Map(1 -> Seq("a", "b", "c")))
    val (urls, stats) = crawl(fetch, u => bloom.mightContainString(u),
      Config(maxPages = 5, dupRatioStop = 0.5))
    assert(urls === Seq("c"))
    assert(stats.stoppedEarly) // 2/3 dup ≥ 0.5
  }

  test("multi-seed fan-out: per-seed early stop, merged dedup'd output (kilid)") {
    import PaginatedIngest.{Seed, crawlSeeds}
    val seeds = Seq(Seed("BUY", "tehran"), Seed("BUY", "karaj"), Seed("RENT", "tehran"))
    // tehran/BUY: page 2 is 100% already-seen → early stop after it.
    // karaj/BUY: two clean pages then empty → normal termination.
    // tehran/RENT: re-surfaces a BUY url (u1) — kilid's shared Bloom
    // does NOT contain in-run urls, so it must survive per-seed output
    // and collapse only in the merged sink pass.
    val fetch: (Seed, Int) => Seq[String] = {
      case (Seed("BUY", "tehran"), 1) => Seq("u1", "u2")
      case (Seed("BUY", "tehran"), 2) => Seq("old1", "old2")
      case (Seed("BUY", "tehran"), _) => Seq("never")
      case (Seed("BUY", "karaj"), 1) => Seq("u3")
      case (Seed("BUY", "karaj"), 2) => Seq("u4")
      case (Seed("BUY", "karaj"), _) => Seq.empty
      case (Seed("RENT", "tehran"), 1) => Seq("u1", "u5")
      case (Seed("RENT", "tehran"), _) => Seq.empty
      case _ => Seq.empty
    }
    val seen = Set("old1", "old2")
    val (results, merged) = crawlSeeds(seeds, fetch, seen,
      PaginatedIngest.Config(maxPages = 10, dupRatioStop = 0.3))
    val byseed = results.map(r => (r.seed, r.urls, r.stats.stoppedEarly)).toList
    assert(byseed(0) === ((Seed("BUY", "tehran"), Seq("u1", "u2"), true)))
    assert(byseed(1) === ((Seed("BUY", "karaj"), Seq("u3", "u4"), false)))
    assert(byseed(2) === ((Seed("RENT", "tehran"), Seq("u1", "u5"), false)))
    assert(merged === Seq("u1", "u2", "u3", "u4", "u5")) // first occurrence wins
    assert(PaginatedIngest.kilidSeeds.size === 18) // 2 modes × 9 cities
    assert(PaginatedIngest.kilidSeeds.take(9).forall(_.listingType == "BUY"))
  }

  test("kill-and-resume: durable crawl emits the same URL set exactly once") {
    val fixture = Map(
      1 -> Seq("u1", "u2", "seenA"),
      2 -> Seq("u3", "u2", "u4"),
      3 -> Seq("u5", "seenB", "u6"),
      4 -> Seq("u7"))
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_crawl_state_").resolve("crawl.state")
    // persisted Bloom as the cross-run external probe (the RedisBloom
    // half of the reference's durability contract)
    val spark = graft.SparkTestSession.get
    import spark.implicits._
    val bloomPath = statePath.resolveSibling("seen.bloom")
    graft.operators.KeyedSink.saveBloom(
      graft.operators.KeyedSink.buildBloom(
        Seq("seenA", "seenB").toDF("k"), "k", 100, 0.01), bloomPath)
    val bloom = graft.operators.KeyedSink.loadBloom(bloomPath)
    val seen: String => Boolean = bloom.mightContainString

    val fetchLog = scala.collection.mutable.ArrayBuffer.empty[Int]
    def fetch(dieAt: Option[Int]): Int => Seq[String] = { page =>
      if (dieAt.contains(page)) throw new RuntimeException("worker killed")
      fetchLog += page
      fixture.getOrElse(page, Seq.empty)
    }
    val cfg = Config(maxPages = 10, dupRatioStop = 0.9)

    // run 1 dies fetching page 3
    intercept[RuntimeException] {
      crawlDurable(fetch(dieAt = Some(3)), seen, statePath, cfg)
    }
    assert(fetchLog.toSeq === Seq(1, 2))
    // run 2 resumes at page 3 (no re-fetch, hence no re-emit of 1-2)
    val (urls, stats) = crawlDurable(fetch(dieAt = None), seen, statePath, cfg)
    assert(fetchLog.toSeq === Seq(1, 2, 3, 4, 5), "completed pages were re-fetched")

    // reference run: one uninterrupted crawl, fresh state
    val (want, wantStats) = crawlDurable(fetch(dieAt = None),
      seen, statePath.resolveSibling("fresh.state"), cfg)
    assert(urls === want)
    assert(urls === Seq("u1", "u2", "u3", "u4", "u5", "u6", "u7"))
    assert(urls.distinct === urls, "a URL was emitted twice across the restart")
    assert(stats.pagesFetched === wantStats.pagesFetched)
    assert(stats.urlsDiscovered === wantStats.urlsDiscovered)
  }

  test("durable crawl persists the early stop so a restart stays stopped") {
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_crawl_state2_").resolve("crawl.state")
    val fixture = Map(1 -> Seq("d1", "d2"), 2 -> Seq("x1", "x2"))
    val seen = Set("d1", "d2")
    val calls = scala.collection.mutable.ArrayBuffer.empty[Int]
    val fetch: Int => Seq[String] = { p => calls += p; fixture.getOrElse(p, Seq.empty) }
    val (urls, stats) = crawlDurable(fetch, seen, statePath,
      Config(maxPages = 10, dupRatioStop = 0.5))
    assert(stats.stoppedEarly && urls.isEmpty && calls.toSeq === Seq(1))
    // restart must NOT resume past the recorded stop
    val (urls2, stats2) = crawlDurable(fetch, seen, statePath,
      Config(maxPages = 10, dupRatioStop = 0.5))
    assert(stats2.stoppedEarly && urls2.isEmpty && calls.toSeq === Seq(1))
  }

  test("durable crawl persists the empty-page finish so a restart never re-fetches") {
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_crawl_state3_").resolve("crawl.state")
    val fixture = scala.collection.mutable.Map(
      1 -> Seq("a1", "a2"), 2 -> Seq("b1")) // page 3 empty → finish
    val calls = scala.collection.mutable.ArrayBuffer.empty[Int]
    val fetch: Int => Seq[String] = { p => calls += p; fixture.getOrElse(p, Seq.empty) }
    val (urls, _) = crawlDurable(fetch, _ => false, statePath,
      Config(maxPages = 10, dupRatioStop = 0.9))
    assert(urls.toSet === Set("a1", "a2", "b1") && calls.toSeq === Seq(1, 2, 3))
    // the site GROWS after the crawl finished: a restart must NOT
    // silently resume past the recorded end (finished is terminal)
    fixture(3) = Seq("late1")
    val (urls2, _) = crawlDurable(fetch, _ => false, statePath,
      Config(maxPages = 10, dupRatioStop = 0.9))
    assert(urls2.toSet === Set("a1", "a2", "b1"),
      "restart resumed a finished crawl")
    assert(calls.toSeq === Seq(1, 2, 3), "restart re-fetched the terminal page")
  }
}
