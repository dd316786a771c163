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
}
