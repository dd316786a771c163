package graft.sources

import scala.annotation.tailrec

/** The crawler's sequential early-stop pagination policy (SURVEY.md §2.5
  * O22, §2.1 S7) — inherently a driver-side ingestion loop, NOT a
  * parallel Spark operator (each page's duplicate ratio decides whether
  * to fetch the next). Kept cleanly outside the engine: `fetchPage` is
  * injectable (site API, test stub), `seen` is the approximate
  * membership probe (Bloom via KeyedSink.buildBloom, or exact set).
  *
  * Reference: divar_crawler.py:64-181 (max_pages 50, stop at dup ratio
  * ≥ 0.5), sheypoor/kilid/mrestate crawlers (≥ 0.3, pages 20/10/10).
  */
object PaginatedIngest {

  final case class Config(
      maxPages: Int = 50,
      dupRatioStop: Double = 0.5)

  final case class Stats(
      pagesFetched: Int,
      urlsDiscovered: Int,
      newUrls: Int,
      stoppedEarly: Boolean)

  /** Crawl pages until: page empty, `maxPages` reached, or the page's
    * duplicate ratio crosses the stop threshold. Returns the new
    * (unseen) URLs in discovery order plus stats — the crawler's
    * extract_transform_task output headed for the work queue
    * (crawler_dag_factory.py:30-55).
    */
  def crawl(fetchPage: Int => Seq[String],
            seen: String => Boolean,
            config: Config = Config()): (Seq[String], Stats) = {
    @tailrec
    def loop(page: Int, acc: Vector[String], inRun: Set[String],
             discovered: Int, stopped: Boolean): (Seq[String], Stats) = {
      if (page > config.maxPages || stopped)
        (acc, Stats(page - 1, discovered, acc.size, stopped))
      else {
        val urls = fetchPage(page)
        if (urls.isEmpty)
          (acc, Stats(page, discovered, acc.size, stoppedEarly = false))
        else {
          // dup ratio counts only external membership (the Bloom probe,
          // divar_crawler.py:143-150); within-run repeats are dropped the
          // way the downstream exact sink would (mongodb_utils.py:21-37).
          val dupCount = urls.count(seen)
          val fresh = urls.filterNot(u => seen(u) || inRun(u))
          val dupRatio = dupCount.toDouble / urls.size
          loop(page + 1, acc ++ fresh, inRun ++ fresh, discovered + urls.size,
            dupRatio >= config.dupRatioStop)
        }
      }
    }
    loop(1, Vector.empty, Set.empty, 0, stopped = false)
  }

  // ------------------------------------------- durable (resumable) crawl

  /** Crawl progress persisted after every page — the page cursor plus
    * the emitted-URL log (the engine's stand-in for the reference's
    * durable work queue, rabbitmq_utils.py:42-90: what was already
    * enqueued must not be enqueued again after a worker restart). */
  final case class CrawlState(nextPage: Int, emitted: Vector[String],
                              discovered: Int, stoppedEarly: Boolean,
                              finished: Boolean = false)

  object CrawlState {
    /** Atomic save (write tmp + rename): a crash mid-write leaves the
      * previous state intact, never a torn file — the saveBloom
      * discipline (KeyedSink.scala). URLs are line-delimited (URLs
      * cannot contain newlines). */
    def save(path: java.nio.file.Path, st: CrawlState): Unit = {
      val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
      java.nio.file.Files.createDirectories(path.toAbsolutePath.getParent)
      val body = (Seq(
        s"${st.nextPage}|${st.discovered}|${st.stoppedEarly}|${st.finished}") ++
        st.emitted).mkString("\n")
      java.nio.file.Files.write(tmp,
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, path,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    def load(path: java.nio.file.Path): Option[CrawlState] =
      if (!java.nio.file.Files.exists(path)) None
      else {
        val lines = new String(java.nio.file.Files.readAllBytes(path),
          java.nio.charset.StandardCharsets.UTF_8).split("\n", -1).toSeq
        val head = lines.head.split("\\|")
        Some(CrawlState(head(0).toInt, lines.tail.filter(_.nonEmpty).toVector,
          head(1).toInt, head(2).toBoolean,
          // pre-finished-flag state files have a 3-field header
          finished = head.length > 3 && head(3).toBoolean))
      }
  }

  /** [[crawl]] with restart durability: state is checkpointed to
    * `statePath` after every page, and a re-invocation resumes from the
    * cursor with the emitted log as its in-run seen set — so across any
    * number of kill/restart cycles each URL is emitted EXACTLY once and
    * completed pages are never re-fetched (a crash between fetch and
    * checkpoint re-fetches that one page, but its URLs still emit once
    * because the pre-crash emitted log never contained them). Pair the
    * external `seen` probe with a persisted Bloom
    * (KeyedSink.saveBloom/loadBloom) for the cross-run two-tier dedup
    * the reference runs against RedisBloom (divar_crawler.py:20-22,
    * crawler_dag_factory.py:37-49). */
  def crawlDurable(fetchPage: Int => Seq[String],
                   seen: String => Boolean,
                   statePath: java.nio.file.Path,
                   config: Config = Config()): (Seq[String], Stats) = {
    var st = CrawlState.load(statePath)
      .getOrElse(CrawlState(1, Vector.empty, 0, stoppedEarly = false))
    var pagesFetched = st.nextPage - 1
    var done = st.stoppedEarly || st.finished || st.nextPage > config.maxPages
    while (!done) {
      val urls = fetchPage(st.nextPage)
      pagesFetched = st.nextPage // an empty page still counts as fetched
      if (urls.isEmpty) {
        // persist the terminal state too: without it a restart would
        // re-fetch the empty page — and if the site has since grown,
        // silently resume a crawl that already reported completion
        st = st.copy(finished = true)
        CrawlState.save(statePath, st)
        done = true
      }
      else {
        val inRun = st.emitted.toSet
        val dupCount = urls.count(seen)
        val fresh = urls.filterNot(u => seen(u) || inRun(u)).distinct
        val dupRatio = dupCount.toDouble / urls.size
        st = CrawlState(st.nextPage + 1, st.emitted ++ fresh,
          st.discovered + urls.size, dupRatio >= config.dupRatioStop)
        CrawlState.save(statePath, st)
        done = st.stoppedEarly || st.nextPage > config.maxPages
      }
    }
    (st.emitted,
      Stats(pagesFetched, st.discovered, st.emitted.size, st.stoppedEarly))
  }

  // ---------------------------------------- multi-seed fan-out (kilid)

  final case class Seed(listingType: String, city: String)

  final case class SeedResult(seed: Seed, urls: Seq[String], stats: Stats)

  /** The kilid seed list: 2 listing modes × 9 cities, crawled in
    * (mode, city) order (kilid_crawler.py:67-79,109-112). */
  val kilidSeeds: Seq[Seed] = for {
    mode <- Seq("BUY", "RENT")
    city <- Seq("tehran", "karaj", "isfahan", "shiraz", "mashhad",
      "rasht", "sari", "tabriz", "qom")
  } yield Seed(mode, city)

  /** S7 composition: crawl every seed SEQUENTIALLY, each as its own
    * paginated sequence with independent early-stop state, sharing one
    * `seen` probe (the single Bloom across the whole run). As in the
    * reference, in-run urls do NOT enter the shared probe, so a url
    * discovered under BUY can reappear under RENT in another seed's
    * output — the merged list applies the downstream exact-sink pass
    * (first occurrence wins), which is where the reference actually
    * dedups (mongodb_utils.py:21-37). Returns per-seed results (urls +
    * early-stop stats) and the merged deduplicated url list. */
  def crawlSeeds(seeds: Seq[Seed],
                 fetchPage: (Seed, Int) => Seq[String],
                 seen: String => Boolean,
                 config: Config = Config()): (Seq[SeedResult], Seq[String]) = {
    val results = seeds.map { s =>
      val (urls, stats) = crawl(p => fetchPage(s, p), seen, config)
      SeedResult(s, urls, stats)
    }
    val merged = results.flatMap(_.urls).distinct
    (results, merged)
  }
}
