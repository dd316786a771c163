package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{KeyedSink, ListingTransforms}
import graft.sources.PaginatedIngest

/** The §3.2 crawler→queue→fetch→transform→sink path assembled end to end
  * with stub transports: discovery via the early-stop crawl policy, a
  * work-queue frame, a lookup-table "fetcher", the real divar transform,
  * and the idempotent keyed sink. Applying the whole pipeline twice
  * changes nothing — the reference's Bloom+unique-index contract.
  */
class PipelineIntegrationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val ref = to_timestamp(lit("2025-10-21 12:00:00"))

  private def divarDoc(title: String): String =
    s"""{"share": {"title": "$title"},
       | "analytics": {"cat2": "residential-sell", "cat3": "apartment-sell", "city": "tehran"},
       | "sections": [{"section_name": "LIST_DATA", "widgets": [
       |   {"widget_type": "UNEXPANDABLE_ROW", "data": {"title": "قیمت کل", "value": "۵۰۰ تومان"}}]}]
       |}""".stripMargin

  // site content: url → raw JSON (the stub "fetcher")
  private val site = (1 to 30).map(i => s"https://divar.ir/v/$i" -> divarDoc(s"آگهی $i")).toMap

  test("crawl → queue → fetch → transform → sink, idempotent end to end") {
    // 1. crawler: 3 pages of 10, nothing seen yet
    val (urls, stats) = PaginatedIngest.crawl(
      page => if (page <= 3) (1 to 10).map(i => s"https://divar.ir/v/${(page - 1) * 10 + i}") else Seq.empty,
      seen = _ => false,
      PaginatedIngest.Config(maxPages = 50, dupRatioStop = 0.5))
    assert(urls.size === 30 && !stats.stoppedEarly)

    // 2. canonicalize crawl urls (tracking params + fragments from the
    //    listing pages collapse onto the same identity key), then the
    //    work queue → fetch (lookup join against the stub site)
    val messy = urls.zipWithIndex.map { case (u, i) =>
      if (i % 3 == 0) s"$u?utm_source=crawl#card" else u
    }
    val queue = messy.toDF("raw_url")
      .select(graft.functions.Urls.canonicalize(col("raw_url")).as("content_url"))
    val fetched = queue.join(site.toSeq.toDF("content_url", "raw"), Seq("content_url"))

    // 3. the real transform
    val listings = ListingTransforms.divarTransform(fetched, "raw", "content_url", ref)
    assert(listings.count() === 30)
    assert(listings.filter(col("price_value") === 500L).count() === 30)

    // 4. idempotent keyed sink: first load inserts all, replay inserts none
    val empty = listings.limit(0)
    val afterFirst = KeyedSink.upsertAbsent(empty, listings, "content_url")
    assert(afterFirst.count() === 30)
    val afterReplay = KeyedSink.upsertAbsent(afterFirst, listings, "content_url")
    assert(afterReplay.count() === 30)

    // 5. second crawl round: everything now behind the Bloom → early stop,
    //    zero new URLs
    val bloom = KeyedSink.buildBloom(afterFirst, "content_url", 1000, 0.01)
    val (round2, stats2) = PaginatedIngest.crawl(
      page => if (page <= 3) (1 to 10).map(i => s"https://divar.ir/v/${(page - 1) * 10 + i}") else Seq.empty,
      seen = u => bloom.mightContainString(u),
      PaginatedIngest.Config(maxPages = 50, dupRatioStop = 0.5))
    assert(round2.isEmpty)
    assert(stats2.stoppedEarly && stats2.pagesFetched === 1)
  }
}
