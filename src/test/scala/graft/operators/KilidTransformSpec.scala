package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Kilid HTML extraction over a representative listing page. */
class KilidTransformSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val html =
    """<html><body>
      |<nav aria-label="breadcrumb">
      |  <a href="/">کیلید</a><a>اجاره</a><a>تهران</a><a>منطقه ۳</a><a>ونک</a>
      |</nav>
      |<div class="relative"><img src="https://cdn.kilid.com/a.jpg"/>
      |  <img src="https://other.com/x.jpg"/><img src="https://cdn.kilid.com/b.jpg"/></div>
      |<div class="flex items-center justify-center gap-1">کد آگهی <span class="font-semiBold">K-99</span></div>
      |<div class="flex items-center justify-center gap-1">انتشار <span class="font-semiBold">۲ روز پیش</span></div>
      |<h1 class="text-lg font-semibold">آپارتمان ۸۵ متری ونک</h1>
      |<div class="flex flex-col items-end justify-center"><span class="text-lg font-bold">۵۰۰ میلیون</span></div>
      |<div class="flex flex-col items-end justify-center"><span class="text-lg font-bold">۱۵ میلیون</span></div>
      |<div class="inline-flex items-center bg-gray-50">نوع سند: تک برگ شش دانگ</div>
      |<div class="group flex items-center justify-center"><span class="text-nowrap">۸۵ متر</span></div>
      |<div class="group flex items-center justify-center"><span class="text-nowrap">ساخت ۱۳۹۸</span></div>
      |<div class="group flex items-center justify-center"><span class="text-nowrap">آسانسور</span> دارد</div>
      |<div class="group flex items-center justify-center"><span class="text-nowrap">انباری</span> ندارد</div>
      |<div class="group flex items-center justify-center"><span class="text-nowrap">پارکینگ</span> ۲ عدد</div>
      |<div class="grid w-full grid-cols-2 gap-x-6">
      |  <div class="flex justify-start gap-2"><span class="text-gray-600">طبقه:</span><span class="font-semiBold">۳</span></div>
      |  <div class="flex justify-start gap-2"><span class="text-gray-600">تعداد اتاق:</span><span class="font-semiBold">۲</span></div>
      |</div>
      |<div class="transition-all duration-300">توضیحات کامل ملک اینجاست</div>
      |<span>آژانس املاک مرکزی</span>
      |<div class="flex w-full flex-row items-center justify-between">
      |  <span class="text-sm font-semibold">رهن و اجاره</span>
      |  <span class="text-lg font-bold">توافقی</span>
      |</div>
      |<div class="flex w-full flex-row items-center justify-between">
      |  <span class="text-sm font-semibold">رهن (تومان)</span>
      |  <span class="text-lg font-bold">۵۰۰ میلیون</span>
      |</div>
      |</body></html>""".stripMargin

  private lazy val out = {
    val env = Seq(("https://kilid.com/1", "RENT", "RESIDENTIAL", "APARTMENT", html))
      .toDF("content_url", "cat1_slug", "cat2_slug", "cat3_slug", "html_content")
    KilidTransform.kilidTransform(env, to_timestamp(lit("2025-10-21 12:00:00")))
      .collect()(0)
  }

  test("breadcrumbs, slugs, images, publish time") {
    assert(out.getAs[String]("breadcrumbs") === "کیلید/اجاره/تهران/منطقه ۳/ونک")
    assert(out.getAs[String]("city_slug") === "تهران")
    assert(out.getAs[String]("neighborhood_slug") === "ونک")
    assert(out.getSeq[String](out.fieldIndex("images")).toSeq ===
      Seq("https://cdn.kilid.com/a.jpg", "https://cdn.kilid.com/b.jpg"))
    // "۲ روز پیش" with injected ref time
    assert(out.getAs[java.sql.Timestamp]("created_at_month").toString
      .startsWith("2025-10-19 12:00:00"))
  }

  test("prices: RENT branch — negotiable rent, labelled credit block") {
    assert(out.getAs[String]("rent_mode") === "توافقی")
    assert(out.getAs[Long]("credit_value") === 500000000L)
    // price fields nulled for RENT listings
    assert(out.isNullAt(out.fieldIndex("price_value")))
    assert(out.isNullAt(out.fieldIndex("price_mode")))
  }

  test("features: tri-state bools, counts, additional grid") {
    // reference quirk (kilid_transformer.py:155-165): the elevator value
    // text is "دارد", which contains neither "ندارد" nor "آسانسور" →
    // tri-state stays None; only chips whose value repeats the feature
    // word flip it true. Ported faithfully.
    assert(out.isNullAt(out.fieldIndex("has_elevator")))
    assert(out.getAs[Boolean]("has_warehouse") === false)
    assert(out.getAs[Boolean]("has_parking") === true) // ۲ عدد > 0
    assert(out.getAs[Int]("floor") === 3)
    assert(out.getAs[Int]("rooms_count") === 2)
    assert(out.getAs[Int]("building_size") === 85)
    assert(out.getAs[Int]("construction_year") === 1398)
    assert(out.getAs[String]("deed_type") === "تک برگ")
    assert(out.getAs[String]("user_type") === "مشاور املاک")
    assert(out.getAs[String]("title") === "آپارتمان ۸۵ متری ونک")
    assert(out.getAs[String]("description") === "توضیحات کامل ملک اینجاست")
  }

  test("cat field swap matches the reference (cat2=landuse, cat3=property)") {
    assert(out.getAs[String]("cat2_slug") === "APARTMENT")
    assert(out.getAs[String]("cat3_slug") === "RESIDENTIAL")
  }

  test("deed chip stays RAW (map_feature overwrites the normalized doc_div)") {
    // kilid_transformer.py:176-177: map_feature stores the cleaned chip
    // value UN-normalized over the doc_div default — chip 'قولنامه' must
    // stay 'قولنامه', not normalize to 'قولنامه ای'.
    val chipped = html.replace(
      "<div class=\"transition-all duration-300\">",
      "<div class=\"group flex items-center justify-center\">" +
        "<span class=\"text-nowrap\">سند</span> قولنامه</div>\n" +
        "<div class=\"transition-all duration-300\">")
    val env = Seq(("u4", "RENT", "RES", "APT", chipped))
      .toDF("content_url", "cat1_slug", "cat2_slug", "cat3_slug", "html_content")
    val row = KilidTransform.kilidTransform(env,
      to_timestamp(lit("2025-10-21 12:00:00"))).collect()(0)
    assert(row.getAs[String]("deed_type") === "قولنامه")
  }

  test("additional-details deed overrides the chip (raw_additional wins)") {
    val chipped = html
      .replace(
        "<div class=\"transition-all duration-300\">",
        "<div class=\"group flex items-center justify-center\">" +
          "<span class=\"text-nowrap\">سند</span> قولنامه</div>\n" +
          "<div class=\"transition-all duration-300\">")
      .replace(
        "<div class=\"flex justify-start gap-2\"><span class=\"text-gray-600\">طبقه:</span>",
        "<div class=\"flex justify-start gap-2\"><span class=\"text-gray-600\">نوع سند:</span>" +
          "<span class=\"font-semiBold\">شش دانگ</span></div>\n" +
          "<div class=\"flex justify-start gap-2\"><span class=\"text-gray-600\">طبقه:</span>")
    val env = Seq(("u5", "RENT", "RES", "APT", chipped))
      .toDF("content_url", "cat1_slug", "cat2_slug", "cat3_slug", "html_content")
    val row = KilidTransform.kilidTransform(env,
      to_timestamp(lit("2025-10-21 12:00:00"))).collect()(0)
    assert(row.getAs[String]("deed_type") === "شش دانگ")
  }

  test("null html survives; BUY branch nulls the rent block") {
    val env = Seq(
      ("u2", "BUY", "RES", "APT", null.asInstanceOf[String]),
      ("u3", "BUY", "RES", "APT", html))
      .toDF("content_url", "cat1_slug", "cat2_slug", "cat3_slug", "html_content")
    val rows = KilidTransform.kilidTransform(env,
      to_timestamp(lit("2025-10-21 12:00:00"))).orderBy("content_url").collect()
    assert(rows(0).getAs[String]("content_url") === "u2")
    assert(rows(0).isNullAt(rows(0).fieldIndex("title")))
    val buy = rows(1)
    assert(buy.isNullAt(buy.fieldIndex("rent_value")))
    assert(buy.isNullAt(buy.fieldIndex("credit_value")))
    assert(buy.isNullAt(buy.fieldIndex("rent_mode")))
  }

  test("truncated / malformed pages yield null fields, not a task failure") {
    // a fetch cut off mid-tag and a page of tag soup — the real-world
    // inputs the reference's BeautifulSoup path shrugs off
    val truncated = html.substring(0, html.length / 3)
    val soup = """<div class="><span<<>> garbage = " 'unclosed"""
    val env = Seq(
      ("u1", "RENT", "RES", "APT", truncated),
      ("u2", "RENT", "RES", "APT", soup))
      .toDF("content_url", "cat1_slug", "cat2_slug", "cat3_slug", "html_content")
    val rows = KilidTransform.kilidTransform(env,
      to_timestamp(lit("2025-10-21 12:00:00"))).orderBy("content_url").collect()
    assert(rows.length === 2)
    val garbage = rows(1)
    for (c <- Seq("title", "description", "user_type", "rent_value",
        "building_size", "construction_year", "deed_type"))
      assert(garbage.isNullAt(garbage.fieldIndex(c)), s"expected null $c")
  }
}
