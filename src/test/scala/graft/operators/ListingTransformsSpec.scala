package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Canonical listing transforms against representative raw documents
  * (FIXTURES.md §3 shapes, unit vectors §4). */
class ListingTransformsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val ref = to_timestamp(lit("2025-10-21 12:00:00"))

  private val divarJson =
    """{
      | "analytics": {"cat2": "residential-sell", "cat3": "apartment-sell", "city": "tehran"},
      | "webengage": {"district": "vanak", "business_type": "personal", "credit": 0, "rent": 0},
      | "seo": {"post_seo_schema": {"description": "توضیح سئو",
      |   "geo": {"latitude": "35.75", "longitude": "51.41"},
      |   "image": ["http://img/1.jpg", "http://img/2.jpg"]}},
      | "share": {"title": "آپارتمان ۱۲۰ متری"},
      | "city": {"second_slug": "tehran2"},
      | "sections": [
      |  {"section_name": "TITLE", "widgets": [
      |    {"widget_type": "LEGEND_TITLE_ROW", "data": {"subtitle": "۲ روز پیش در تهران"}}]},
      |  {"section_name": "BREADCRUMB", "widgets": [
      |    {"widget_type": "BREADCRUMB", "data": {"current_page_title": "فروش مقطوع آپارتمان"}}]},
      |  {"section_name": "DESCRIPTION", "widgets": [
      |    {"widget_type": "DESCRIPTION_ROW", "data": {"text": "واحد ۳ از ۷ با امکانات"}}]},
      |  {"section_name": "LIST_DATA", "widgets": [
      |    {"widget_type": "UNEXPANDABLE_ROW", "data": {"title": "قیمت کل", "value": "۱۲۳۰۰۰ تومان"}},
      |    {"widget_type": "UNEXPANDABLE_ROW", "data": {"title": "سند", "value": "تک‌برگ"}},
      |    {"widget_type": "UNEXPANDABLE_ROW", "data": {"title": "طبقه", "value": "۳ از ۵"}},
      |    {"widget_type": "UNEXPANDABLE_ROW", "data": {"title": "نوع ملک", "value": "ویلای ساحلی"}},
      |    {"widget_type": "GROUP_INFO_ROW", "data": {"items": [
      |      {"title": "متراژ", "value": "۱۲۰"},
      |      {"title": "اتاق", "value": "بدون اتاق"},
      |      {"title": "ساخت", "value": "قبل از ۱۳۷۰"}]}},
      |    {"widget_type": "GROUP_FEATURE_ROW", "data": {
      |      "items": [
      |        {"title": "آسانسور", "available": true},
      |        {"title": "پارکینگ ندارد"}],
      |      "action": {"payload": {"modal_page": {"widget_list": [
      |        {"widget_type": "UNEXPANDABLE_ROW", "data": {"title": "تعداد واحد در طبقه", "value": "بیشتر از ۴"}},
      |        {"widget_type": "UNEXPANDABLE_ROW", "data": {"title": "جهت ساختمان", "value": "شمالی"}},
      |        {"widget_type": "FEATURE_ROW", "data": {"title": "گرمایش شوفاژ"}},
      |        {"widget_type": "FEATURE_ROW", "data": {"title": "سرمایش کولر آبی"}},
      |        {"widget_type": "FEATURE_ROW", "data": {"title": "جنس کف سرامیک"}}]}}}}}]},
      |  {"section_name": "IMAGE", "widgets": [
      |    {"widget_type": "IMAGE_CAROUSEL", "data": {"items": [
      |      {"image": {"url": "http://img/2.jpg"}},
      |      {"image": {"url": "http://img/3.jpg"}}]}}]}
      | ]}""".stripMargin

  private lazy val divarOut: Row = ListingTransforms.divarTransform(
    Seq(("https://divar.ir/v/x", divarJson)).toDF("url", "raw"),
    "raw", "url", ref).collect()(0)

  test("divar: slugs, user type, title, created_at_month from subtitle") {
    assert(divarOut.getAs[String]("cat3_slug") === "apartment-sell")
    assert(divarOut.getAs[String]("city_slug") === "tehran")
    assert(divarOut.getAs[String]("neighborhood_slug") === "vanak")
    assert(divarOut.getAs[String]("user_type") === "شخصی")
    assert(divarOut.getAs[String]("title") === "آپارتمان ۱۲۰ متری")
    // "۲ روز پیش" before " در " → ref − 2 days
    assert(divarOut.getAs[java.sql.Timestamp]("created_at_month").toString
      .startsWith("2025-10-19 12:00:00"))
  }

  test("divar: fallback money rows parse Persian digits (no slider)") {
    // the common real divar payload: "ودیعه"/"اجارهٔ ماهانه" amounts in
    // Persian digits. Python's isdigit()/float() parse them
    // (divar_transformer.py:232-239), so they must NOT fall through to
    // the webengage fallback (credit=999 here would betray that).
    val rentJson =
      """{
        | "analytics": {"cat2": "residential-rent", "cat3": "apartment-rent", "city": "tehran"},
        | "webengage": {"district": "vanak", "business_type": "personal",
        |   "credit": 999, "rent": 888},
        | "share": {"title": "اجاره"},
        | "sections": [
        |  {"section_name": "LIST_DATA", "widgets": [
        |    {"widget_type": "UNEXPANDABLE_ROW", "data": {"title": "ودیعه", "value": "‏۵۰۰۰۰۰ تومان"}},
        |    {"widget_type": "UNEXPANDABLE_ROW", "data": {"title": "اجارهٔ ماهانه", "value": "۲۵۰۰۰ تومان"}}]}
        | ]}""".stripMargin
    val row = ListingTransforms.divarTransform(
      Seq(("https://divar.ir/v/rent", rentJson)).toDF("url", "raw"),
      "raw", "url", ref).collect()(0)
    assert(row.getAs[Double]("credit_value") === 500000.0)
    assert(row.getAs[Double]("rent_value") === 25000.0)
    assert(row.getAs[String]("rent_type") === "rent_credit")
    assert(row.getAs[String]("credit_mode") === "مقطوع")
  }

  test("divar: non-numeric fallback money row falls through to webengage") {
    val rentJson =
      """{
        | "analytics": {"cat2": "residential-rent", "cat3": "apartment-rent", "city": "tehran"},
        | "webengage": {"district": "vanak", "business_type": "personal",
        |   "credit": 7000, "rent": 0},
        | "share": {"title": "اجاره"},
        | "sections": [
        |  {"section_name": "LIST_DATA", "widgets": [
        |    {"widget_type": "UNEXPANDABLE_ROW", "data": {"title": "ودیعه", "value": "توافقی"}}]}
        | ]}""".stripMargin
    val row = ListingTransforms.divarTransform(
      Seq(("https://divar.ir/v/rent2", rentJson)).toDF("url", "raw"),
      "raw", "url", ref).collect()(0)
    assert(row.getAs[Double]("credit_value") === 7000.0)
    assert(row.isNullAt(row.fieldIndex("rent_value")))
  }

  test("divar: slider branch — money fields, مجانی mode, transformable quirk") {
    def sliderJson(tc: Long, tr: Long) =
      s"""{
         | "analytics": {"cat2": "residential-rent", "cat3": "apartment-rent", "city": "tehran"},
         | "webengage": {"district": "vanak", "business_type": "personal", "credit": 0, "rent": 0},
         | "share": {"title": "اجاره"},
         | "sections": [
         |  {"section_name": "LIST_DATA", "widgets": [
         |    {"widget_type": "RENT_SLIDER", "data": {
         |      "credit": {"value": 500000, "transformed_value": $tc},
         |      "rent": {"value": 25000, "transformed_value": $tr}}}]}
         | ]}""".stripMargin
    val rows = ListingTransforms.divarTransform(
      Seq(("u-t", sliderJson(600000L, 26000L)), ("u-f", sliderJson(0L, 0L)))
        .toDF("url", "raw"), "raw", "url", ref).orderBy("content_url").collect()
    val t = rows(1); val f = rows(0) // u-t sorts after u-f
    assert(t.getAs[Double]("credit_value") === 500000.0)
    assert(t.getAs[Double]("rent_value") === 25000.0)
    assert(t.getAs[Double]("transformed_credit") === 600000.0)
    assert(t.getAs[String]("rent_mode") === "مجانی") // has_* hard-coded False
    assert(t.getAs[String]("rent_type") === "rent_credit")
    assert(t.getAs[Boolean]("rent_credit_transform") === true)
    // reference quirk: bool(True) → float('') → None in the numeric
    // pass, bool(False) survives — truthy transformed → NULL
    assert(t.isNullAt(t.fieldIndex("transformable_credit")))
    assert(f.getAs[Boolean]("transformable_credit") === false)
    assert(f.isNullAt(f.fieldIndex("rent_type"))) // no transform → None
    assert(f.getAs[Boolean]("rent_credit_transform") === false)
  }

  test("divar: MAP geo (incl. radius) only consulted when seo geo is incomplete") {
    def geoJson(seoGeo: String) =
      s"""{
         | "analytics": {"cat2": "c", "cat3": "c", "city": "tehran"},
         | "webengage": {"district": "d", "business_type": "personal", "credit": 0, "rent": 0},
         | "share": {"title": "t"},
         | "seo": {"post_seo_schema": {"description": "x", "geo": $seoGeo}},
         | "sections": [
         |  {"section_name": "MAP", "widgets": [
         |    {"widget_type": "MAP_ROW", "data": {"location": {
         |      "fuzzy_data": {"point": {"latitude": "35.10", "longitude": "51.10"},
         |                     "radius": "500"}}}}]}
         | ]}""".stripMargin
    val rows = ListingTransforms.divarTransform(
      Seq(("u-full", geoJson("""{"latitude": "35.75", "longitude": "51.41"}""")),
          ("u-miss", geoJson("""{"latitude": "35.75", "longitude": ""}""")))
        .toDF("url", "raw"), "raw", "url", ref).orderBy("content_url").collect()
    val full = rows(0); val miss = rows(1)
    // complete seo geo → map branch never entered → radius stays null
    assert(full.getAs[Double]("location_latitude") === 35.75)
    assert(full.isNullAt(full.fieldIndex("location_radius")))
    // empty-string lon is FALSY (Python `not lon`) → map consulted: the
    // fuzzy point overwrites BOTH coordinates (seo survives only when
    // the map value is itself falsy), and radius is set
    assert(miss.getAs[Double]("location_latitude") === 35.10)
    assert(miss.getAs[Double]("location_longitude") === 51.10)
    assert(miss.getAs[Double]("location_radius") === 500.0)
  }

  test("divar: price block (no slider → fallback branch)") {
    assert(divarOut.getAs[String]("price_mode") === "مقطوع")
    assert(divarOut.getAs[Long]("price_value") === 123000L)
    // webengage credit/rent are 0 (falsy) → no credit/rent values
    assert(divarOut.isNullAt(divarOut.fieldIndex("credit_value")))
    // has_credit=false, has_rent=false → else-branch "rent_credit"
    assert(divarOut.getAs[String]("rent_type") === "rent_credit")
    assert(divarOut.isNullAt(divarOut.fieldIndex("credit_mode")))
  }

  test("divar: physical fields incl. regex floor + description fallback") {
    assert(divarOut.getAs[Double]("building_size") === 120.0)
    assert(divarOut.getAs[String]("deed_type") === "single_page")
    assert(divarOut.getAs[Int]("floor") === 3)
    assert(divarOut.getAs[Int]("total_floors_count") === 5)
    assert(divarOut.getAs[Int]("rooms_count") === 0)       // "بدون اتاق" → 0
    assert(divarOut.getAs[Int]("unit_per_floor") === 5)    // "بیشتر از ۴" → 5
    assert(divarOut.getAs[Int]("construction_year") === -1370)
    assert(divarOut.getAs[String]("property_type") === "beach")
  }

  test("divar: tri-state features + enum maps") {
    assert(divarOut.getAs[Boolean]("has_elevator") === true)
    assert(divarOut.getAs[Boolean]("has_parking") === false) // "ندارد"
    assert(divarOut.isNullAt(divarOut.fieldIndex("has_pool"))) // absent → null
    assert(divarOut.getAs[String]("building_direction") === "north")
    assert(divarOut.getAs[String]("has_heating_system") === "shoofaj")
    assert(divarOut.getAs[String]("has_cooling_system") === "water_cooler")
    assert(divarOut.getAs[String]("floor_material") === "ceramic")
  }

  test("divar: images order-preserving distinct, geo from seo") {
    val imgs = divarOut.getSeq[String](divarOut.fieldIndex("images"))
    assert(imgs.toSeq === Seq("http://img/1.jpg", "http://img/2.jpg", "http://img/3.jpg"))
    assert(divarOut.getAs[Double]("location_latitude") === 35.75)
    assert(divarOut.getAs[Double]("location_longitude") === 51.41)
  }

  private val sheypoorJson =
    """{
      | "attributes": {
      |   "title": "رهن آپارتمان",
      |   "url": "https://sheypoor.com/v/abc",
      |   "location": "تهران، ونک",
      |   "timePassedLabel": "ساعاتی پیش",
      |   "categories": [{"name": "املاک"}, {"name": "رهن و اجاره"}],
      |   "price": [{"label": "رهن", "amount": "۲۵۰٬۰۰۰٬۰۰۰"}],
      |   "images": {"thumbnails": {"round": "http://img/t.jpg"}}},
      | "fullAttributes": [
      |   {"key": "متراژ", "value": "۸۵ متر"},
      |   {"key": "طبقه ملک", "value": "3"},
      |   {"key": "تعداد اتاق", "value": "2"},
      |   {"key": "آسانسور", "value": "دارد"},
      |   {"key": "سال ساخت بنا", "value": "1395"},
      |   {"key": "قابلیت تبدیل مبلغ رهن و اجاره", "value": "true"}],
      | "geo": {"lat": 35.7, "lon": 51.4},
      | "description": "توضیحات"}""".stripMargin

  private lazy val sheypoorOut: Row = ListingTransforms.sheypoorTransform(
    Seq(("https://sheypoor.com/v/abc", sheypoorJson)).toDF("url", "raw"),
    "raw", "url", ref).collect()(0)

  test("sheypoor: slugs, breadcrumb, relative date, credit price path") {
    assert(sheypoorOut.getAs[String]("cat2_slug") === "املاک")
    assert(sheypoorOut.getAs[String]("city_slug") === "تهران")
    assert(sheypoorOut.getAs[String]("neighborhood_slug") === "ونک")
    assert(sheypoorOut.getAs[String]("bread_crumb") === "املاک/رهن و اجاره")
    // "ساعاتی پیش" → ref − 2h
    assert(sheypoorOut.getAs[java.sql.Timestamp]("created_at_month").toString
      .startsWith("2025-10-21 10:00:00"))
    assert(sheypoorOut.getAs[Double]("credit_value") === 250000000.0)
    assert(sheypoorOut.getAs[String]("credit_mode") === "مقطوع")
    assert(sheypoorOut.getAs[String]("rent_type") === "full_credit")
    assert(sheypoorOut.isNullAt(sheypoorOut.fieldIndex("price_value")))
  }

  test("sheypoor: attributes, facilities, transform flag") {
    assert(sheypoorOut.getAs[Double]("building_size") === 85.0)
    assert(sheypoorOut.getAs[Int]("floor") === 3)
    assert(sheypoorOut.getAs[Int]("rooms_count") === 2)
    assert(sheypoorOut.getAs[Boolean]("has_elevator") === true)
    assert(sheypoorOut.isNullAt(sheypoorOut.fieldIndex("has_parking"))) // absent attr → null
    assert(sheypoorOut.getAs[Int]("construction_year") === 1395)
    assert(sheypoorOut.getAs[Boolean]("rent_credit_transform") === true)
    assert(sheypoorOut.getSeq[String](sheypoorOut.fieldIndex("images")).toSeq ===
      Seq("http://img/t.jpg"))
  }

  test("sheypoor: Persian-digit attrs parse like Python isdigit()/int()") {
    // sheypoor_transformer.py:193-210 gates with isdigit() then int() —
    // both accept Persian digits, so "۳" must become 3, not null.
    val json = sheypoorJson
      .replace("\"value\": \"3\"", "\"value\": \"۳\"")
      .replace("\"value\": \"2\"", "\"value\": \"۲\"")
      .replace("\"value\": \"1395\"", "\"value\": \"۱۳۹۵\"")
    val row = ListingTransforms.sheypoorTransform(
      Seq(("https://sheypoor.com/v/fa", json)).toDF("url", "raw"),
      "raw", "url", ref).collect()(0)
    assert(row.getAs[Int]("floor") === 3)
    assert(row.getAs[Int]("rooms_count") === 2)
    assert(row.getAs[Int]("construction_year") === 1395)
  }

  private val mrestateJson =
    """{"pageProps": {"data": {
      | "breadcrumb": [{"name": "خانه"}, {"name": "خرید آپارتمان در تهران"}, {"name": "ونک"}],
      | "data": {
      |   "city": "تهران", "neighbourhood": "ونک",
      |   "date_publish": "2025-09-15T10:30:00Z",
      |   "creator_properties": {"real_estate": "املاک X", "consultant": null},
      |   "is_owner": false,
      |   "more_description": "توضیح", "title": "آپارتمان ۱۰۰ متری",
      |   "price_rent": null, "price_sell": 9500000000, "price_mortgage": null,
      |   "area": 100.0, "num_bedrooms": 2,
      |   "year_constructed": "۱۴۰۰",
      |   "latitude": 35.76, "longitude": 51.42,
      |   "list_image": [{"url": "/media/a.jpg"}, {"url": "http://x/b.jpg"}],
      |   "more_details": {"floor": "4", "balcony": true, "elevator": true,
      |     "storeHouse": false, "parking": 2, "security": true,
      |     "pool": false, "jacuzzi": null, "sauna": null}}}}}""".stripMargin

  private lazy val mrestateOut: Row = ListingTransforms.mrestateTransform(
    Seq(("https://mrestate.ir/p/1", mrestateJson)).toDF("url", "raw"),
    "raw", "url", ref).collect()(0)

  test("mrestate: breadcrumb cats, user type, ISO date, prices") {
    assert(mrestateOut.getAs[String]("cat2_slug") === "خرید")
    assert(mrestateOut.getAs[String]("cat3_slug") === "آپارتمان")
    assert(mrestateOut.getAs[String]("user_type") === "مشاور املاک")
    assert(mrestateOut.getAs[java.sql.Timestamp]("created_at_month").toString
      .startsWith("2025-09-15 10:30:00"))
    assert(mrestateOut.getAs[Long]("price_value") === 9500000000L)
    assert(mrestateOut.isNullAt(mrestateOut.fieldIndex("rent_type")))
    assert(mrestateOut.isNullAt(mrestateOut.fieldIndex("price_mode"))) // prices present → no توافقی
  }

  test("mrestate: more_details features, media URL prefixing, breadcrumb join") {
    assert(mrestateOut.getAs[Int]("floor") === 4)
    assert(mrestateOut.getAs[Int]("rooms_count") === 2)
    assert(mrestateOut.getAs[Int]("construction_year") === 1400) // Persian digits
    assert(mrestateOut.getAs[Boolean]("has_parking") === true)   // 2 > 0
    assert(mrestateOut.getAs[Boolean]("has_warehouse") === false)
    assert(mrestateOut.isNullAt(mrestateOut.fieldIndex("has_jacuzzi")))
    assert(mrestateOut.getSeq[String](mrestateOut.fieldIndex("images")).toSeq ===
      Seq("https://mrestate.ir/media/a.jpg", "http://x/b.jpg"))
    assert(mrestateOut.getAs[String]("bread_crumb") ===
      "خانه\n/\nخرید آپارتمان در تهران\n/\nونک\n/")
  }

  test("mrestate: empty-string names/urls are skipped like Python truthiness") {
    // `if b.get("name")` / `if url:` skip "" as well as null
    // (mrestate_transformer.py:216-227)
    val json = mrestateJson
      .replace("""[{"name": "خانه"}""", """[{"name": ""}, {"name": "خانه"}""")
      .replace("""{"url": "/media/a.jpg"}""", """{"url": ""}, {"url": "/media/a.jpg"}""")
    val row = ListingTransforms.mrestateTransform(
      Seq(("https://mrestate.ir/p/2", json)).toDF("url", "raw"),
      "raw", "url", ref).collect()(0)
    // the empty-name crumb is dropped from the join but NOT from the
    // positional [1] lookup — cat2 comes from breadcrumb[1] = "خانه" now
    assert(row.isNullAt(row.fieldIndex("cat2_slug")))
    assert(row.getAs[String]("bread_crumb") ===
      "خانه\n/\nخرید آپارتمان در تهران\n/\nونک\n/")
    assert(row.getSeq[String](row.fieldIndex("images")).toSeq ===
      Seq("https://mrestate.ir/media/a.jpg", "http://x/b.jpg"))
  }

  test("kilid envelope: typed fields + HTML passthrough") {
    val json =
      """{"content_url": "https://kilid.com/1", "html_content": "<html>x</html>",
        | "status_code": 200, "fetched_at": "2025-10-01T00:00:00",
        | "listingType": "BUY", "propertyType": "RESIDENTIAL", "landuseType": "APARTMENT"}""".stripMargin
    val out = ListingTransforms.kilidEnvelope(
      Seq(json).toDF("raw"), "raw").collect()(0)
    assert(out.getAs[String]("cat1_slug") === "BUY")
    assert(out.getAs[Int]("status_code") === 200)
    assert(out.getAs[String]("html_content") === "<html>x</html>")
  }

  test("malformed JSON survives as null row, not an exception") {
    val out = ListingTransforms.divarTransform(
      Seq(("u1", "{not json")).toDF("url", "raw"), "raw", "url", ref).collect()(0)
    assert(out.getAs[String]("content_url") === "u1")
    assert(out.isNullAt(out.fieldIndex("title")))
  }
}
