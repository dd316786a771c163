package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.{KilidTransform, ListingTransforms}

/** Oracle gates for the remaining production site transformers — the
  * same certification pattern as ListingGate's q51 (divar): a raw site
  * payload is synthesized deterministically from each `documents` row,
  * the Spark side runs the PRODUCTION transform (sheypoor / mrestate
  * JSON navigation, kilid HTML mini-DOM extraction), and the DuckDB
  * oracle derives the expected canonical fields directly from the source
  * columns — an independent derivation, so a hash match certifies slug
  * rules, relative-date parsing, price/rent/credit branch logic, digit
  * translation, tri-state features, and breadcrumb assembly.
  *
  * Payloads are built with to_json(struct(...)) so quoting/escaping is
  * structurally correct and null fields vanish (reference: absent JSON
  * keys), exercising the transforms' null-safe deep navigation.
  *
  * Scale note: each gate is one narrow parquet scan + per-row expression
  * work (from_json / one compiled-UDF DOM parse) with no shuffle until
  * the final presentation sort — the same shape the production
  * transforms run at (SURVEY §3.2), so it scales linearly with input
  * splits.
  */
object SiteGates {
  type Q = (SparkSession, String) => DataFrame

  private val RefTs = "2025-10-21 12:00:00"
  private[graft] def refTime: Column = to_timestamp(lit(RefTs))
  private def fmt(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  private def kv(k: String, v: Column): Column =
    struct(lit(k).as("key"), v.as("value"))

  /** ASCII digits → Persian digits (fixture side: real payloads carry
    * Persian digits; the transforms must translate them back). */
  private def fa(c: Column): Column =
    translate(c, "0123456789", "۰۱۲۳۴۵۶۷۸۹")

  // ------------------------------------------------------------ sheypoor

  /** q52: the production sheypoor transform (F3 slugs, F15-sheypoor
    * relative dates, price-row label branching, attribute lookups —
    * sheypoor_transformer.py:103-231) under the DuckDB gate. */
  def q52SheypoorTransform(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
    val even = pmod(col("doc_id"), lit(2)) === 0
    val m3 = pmod(col("doc_id"), lit(3))

    val label = when(m3 === 0, "رهن").when(m3 === 1, "اجاره")
      .otherwise(lit("قیمت فروش"))
    val amount = when(m3 === 0, fa(format_string("%d,000 تومان", col("n_chars"))))
      .when(m3 === 1, format_string("%d00", col("n_chars")))
      .otherwise(format_string("%d000 تومان", col("n_chars")))
    val tp = when(even, lit("دقایقی پیش"))
      .otherwise(format_string("%d روز پیش", pmod(col("doc_id"), lit(5)) + 1))
    val c1 = when(even, "خرید").otherwise(lit("اجاره"))

    val payload = to_json(struct(
      struct(
        substring(col("text"), 1, 15).as("title"),
        format_string("%s، %s شهر", col("source"), col("lang")).as("location"),
        tp.as("timePassedLabel"),
        array(struct(c1.as("name")),
              struct(lit("دفتر کار").as("name"))).as("categories"),
        array(struct(label.as("label"), amount.as("amount"))).as("price"),
        struct(struct(
          format_string("https://img.sheypoor.com/%d.jpg", col("doc_id"))
            .as("round")).as("thumbnails")).as("images")).as("attributes"),
      array(
        // Persian-digit attribute values: the reference's isdigit()/int()
        // /float() parse them (sheypoor_transformer.py:101,193-210) — the
        // common real payload, pinned here at the oracle level
        kv("متراژ", fa(format_string("%d", col("n_chars")))),
        kv("تعداد اتاق", fa(format_string("%d", pmod(col("doc_id"), lit(5))))),
        kv("طبقه ملک", fa(format_string("%d", pmod(col("doc_id"), lit(15))))),
        kv("سال ساخت بنا",
           fa(format_string("%d", pmod(col("doc_id"), lit(30)) + 1370))),
        kv("آسانسور", when(even, "دارد").otherwise(lit("ندارد"))),
        kv("نوع سند", when(even, "تجاری").otherwise(lit("شش دانگ"))),
        kv("قابلیت تبدیل مبلغ رهن و اجاره",
           when(even, "true").otherwise(lit("false")))).as("fullAttributes"),
      struct((col("doc_id") + lit(0.5)).as("lat"), lit(51.5).as("lon")).as("geo"),
      substring(col("text"), 16, 20).as("description")))

    val raw = docs.select(col("doc_id").cast(StringType).as("url"),
      payload.as("raw"))
    ListingTransforms.sheypoorTransform(raw, "raw", "url", refTime)
      .select(col("content_url"), col("cat2_slug"), col("cat3_slug"),
        col("city_slug"), col("neighborhood_slug"),
        fmt(col("created_at_month")).as("created_at_month"),
        col("title"), col("rent_type"),
        col("price_mode"), col("price_value"),
        col("credit_mode"), col("credit_value"),
        col("rent_mode"), col("rent_value"),
        col("building_size"), col("rooms_count"),
        col("floor"), col("construction_year"),
        col("has_elevator"), col("deed_type"), col("has_business_deed"),
        col("rent_credit_transform"),
        col("location_latitude"),
        array_join(col("images"), "|").as("images_str"),
        col("bread_crumb"))
      .orderBy("content_url")
  }

  // ------------------------------------------------------------ mrestate

  /** q53: the production mrestate transform (F35 deep next.js paths,
    * first-startswith cat3 — incl. the 'آپارتمان اداری' prefix-parity
    * quirk — user-type precedence, image URL prefixing, breadcrumb
    * join — mrestate_transformer.py:28-213) under the DuckDB gate. */
  def q53MrestateTransform(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
    val m3 = pmod(col("doc_id"), lit(3))
    val m4 = pmod(col("doc_id"), lit(4))
    val m8 = pmod(col("doc_id"), lit(8))

    val bcName = when(m4 === 0, "خرید آپارتمان در تهران")
      .when(m4 === 1, "اجاره ویلا در کرج")
      .when(m4 === 2, "خرید آپارتمان اداری در تهران")
      .otherwise(lit("اجاره سوله در قم"))

    val nullD = lit(null).cast(DoubleType)
    val priceSell = when(m4 === 0, (col("n_chars") * 1000000L).cast(DoubleType))
      .otherwise(nullD)
    val priceMortgage = when(m4 === 1, (col("n_chars") * 1000L).cast(DoubleType))
      .otherwise(nullD)
    val priceRent = when(m4 === 1,
      when(m8 === 1, lit(0.0)).otherwise((col("n_chars") * 10L).cast(DoubleType)))
      .otherwise(nullD)

    val faDigits: Column => Column =
      c => translate(c, "0123456789", "۰۱۲۳۴۵۶۷۸۹")

    val payload = to_json(struct(struct(struct(
      array(struct(lit("صفحه اصلی").as("name")),
            struct(bcName.as("name"))).as("breadcrumb"),
      struct(
        col("source").as("city"),
        col("lang").as("neighbourhood"),
        format_string("2025-09-%02d 08:30:00", pmod(col("doc_id"), lit(28)) + 1)
          .as("date_publish"),
        struct(
          when(m3 === 1, "آژانس ایکس").otherwise(lit(null).cast(StringType))
            .as("real_estate"),
          when(m3 === 2, "مشاور یک").otherwise(lit(null).cast(StringType))
            .as("consultant")).as("creator_properties"),
        (m3 === 0).as("is_owner"),
        substring(col("text"), 16, 25).as("more_description"),
        substring(col("text"), 1, 15).as("title"),
        priceRent.as("price_rent"),
        priceSell.as("price_sell"),
        priceMortgage.as("price_mortgage"),
        col("n_chars").cast(DoubleType).as("area"),
        pmod(col("doc_id"), lit(5)).cast(DoubleType).as("num_bedrooms"),
        faDigits(format_string("13%d5", pmod(col("doc_id"), lit(10))))
          .as("year_constructed"),
        (col("doc_id") + lit(0.5)).as("latitude"),
        lit(51.5).as("longitude"),
        array(
          struct(format_string("/media/%d.jpg", col("doc_id")).as("url")),
          struct(lit("https://cdn.mrestate.ir/x.jpg").as("url"))).as("list_image"),
        struct(
          faDigits(format_string("%d", pmod(col("doc_id"), lit(20)))).as("floor"),
          (pmod(col("doc_id"), lit(2)) === 0).as("balcony"),
          (pmod(col("n_chars"), lit(2)) === 0).as("elevator"),
          (pmod(col("doc_id"), lit(5)) < 3).as("storeHouse"),
          pmod(col("doc_id"), lit(3)).cast(DoubleType).as("parking"),
          (pmod(col("n_chars"), lit(3)) === 0).as("security"),
          (pmod(col("doc_id"), lit(7)) === 0).as("pool"),
          (pmod(col("n_chars"), lit(5)) === 0).as("jacuzzi"),
          (pmod(col("doc_id"), lit(2)) === 1).as("sauna")).as("more_details"))
        .as("data")).as("data")).as("pageProps")))

    val raw = docs.select(col("doc_id").cast(StringType).as("url"),
      payload.as("raw"))
    ListingTransforms.mrestateTransform(raw, "raw", "url", refTime)
      .select(col("content_url"), col("cat2_slug"), col("cat3_slug"),
        col("city_slug"), col("neighborhood_slug"),
        fmt(col("created_at_month")).as("created_at_month"),
        col("user_type"), col("title"), col("description"),
        col("rent_mode"), col("rent_value"), col("rent_type"),
        col("price_mode"), col("price_value"),
        col("credit_mode"), col("credit_value"),
        col("building_size"), col("rooms_count"), col("floor"),
        col("construction_year"),
        col("has_balcony"), col("has_elevator"), col("has_warehouse"),
        col("has_parking"), col("has_security_guard"), col("has_pool"),
        col("has_jacuzzi"), col("has_sauna"),
        col("location_latitude"), col("location_longitude"),
        array_join(col("images"), "|").as("images_str"),
        col("bread_crumb"))
      .orderBy("content_url")
  }

  // --------------------------------------------------------------- kilid

  /** q54: the kilid fetch-envelope + HTML mini-DOM extraction end-to-end
    * (kilid_fetcher.py:25-33 envelope; kilid_transformer.py:66-534 CSS
    * selectors, parse_toman units, tri-state chips, deed precedence,
    * labelled rent/credit rows) under the DuckDB gate. The HTML page is
    * synthesized per documents row with the same markup shapes the
    * reference's BeautifulSoup selectors target. */
  def q54KilidTransform(s: SparkSession, dir: String): DataFrame =
    q54Project(KilidTransform.kilidTransform(q54Envelope(s, dir), refTime))
      .orderBy("content_url")

  /** q54's canonical output projection over a kilidTransform frame —
    * shared with the q142 streaming pipeline gate, which must emit the
    * exact batch shape to share the oracle. */
  private[graft] def q54Project(transformed: DataFrame): DataFrame =
    transformed
      .select(col("content_url"), col("breadcrumbs"), col("cat1_slug"),
        col("cat2_slug"), col("cat3_slug"),
        col("city_slug"), col("neighborhood_slug"),
        fmt(col("created_at_month")).as("created_at_month"),
        col("user_type"), col("title"), col("description"),
        col("rent_mode"), col("rent_value"), col("rent_type"),
        col("price_mode"), col("price_value"), col("credit_value"),
        col("deed_type"), col("floor"), col("rooms_count"),
        col("has_elevator"), col("has_warehouse"), col("has_parking"),
        col("building_size"), col("construction_year"), col("is_rebuilt"),
        array_join(col("images"), "|").as("images_str"))

  /** q54's synthesized fetch-envelope frame (shared with profiling and
    * the q142 streaming pipeline gate). */
  private[graft] def q54Envelope(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
    val even = pmod(col("doc_id"), lit(2)) === 0 // RENT rows; odd = BUY
    val m3 = pmod(col("doc_id"), lit(3))
    val m4 = pmod(col("doc_id"), lit(4))
    val m8 = pmod(col("doc_id"), lit(8))

    val mMillions = pmod(col("n_chars"), lit(9)) + 1 // credit, میلیون units
    val sz = pmod(col("n_chars"), lit(200)) + 20
    val yr = pmod(col("doc_id"), lit(30)) + 1370
    val days = pmod(col("doc_id"), lit(5)) + 1

    def div(cls: String, inner: Column): Column =
      concat(lit(s"""<div class="$cls">"""), inner, lit("</div>"))
    def chip(key: String, value: Column): Column =
      div("group flex items-center justify-center",
        concat(lit(s"""<span class="text-nowrap">$key</span> """), value))
    def rowBlock(label: Column, value: Column): Column =
      div("flex w-full flex-row items-center justify-between",
        concat(lit("""<span class="text-sm font-semibold">"""), label,
          lit("""</span><span class="text-lg font-bold">"""), value,
          lit("</span>")))
    def rcBlock(value: Column): Column =
      div("flex flex-col items-end justify-center",
        concat(lit("""<span class="text-lg font-bold">"""), value,
          lit("</span>")))

    val cat1fa = when(even, "اجاره").otherwise(lit("خرید"))
    val nav = concat(
      lit("""<nav aria-label="breadcrumb"><a href="/">کیلید</a><a>"""),
      cat1fa, lit("</a><a>"), col("source"),
      lit("</a><a>منطقه</a><a>"), col("lang"), lit("</a></nav>"))

    val images = format_string(
      """<div class="relative"><img src="https://cdn.kilid.com/%d.jpg"/>""" +
        """<img src="https://other.com/z.jpg"/></div>""", col("doc_id"))

    val publish = div("flex items-center justify-center gap-1",
      format_string(
        """انتشار <span class="font-semiBold">%d روز پیش</span>""", days))

    val title = concat(lit("""<h1 class="text-lg font-semibold">"""),
      substring(col("text"), 1, 15), lit("</h1>"))

    // RENT: two flex-col blocks (credit, rent); rent shows "رهن کامل" on
    // the full-credit variant. BUY: none.
    val rcBlocks = when(even, concat(
      rcBlock(format_string("%d میلیون", mMillions)),
      when(m4 === 0, rcBlock(lit("رهن کامل")))
        .otherwise(rcBlock(format_string("%d هزار", col("n_chars"))))))
      .otherwise(lit(""))

    val deedDiv = div("inline-flex items-center bg-gray-50",
      lit("نوع سند: تک برگ شش دانگ"))
    val deedChip = when(m3 === 1, chip("سند", lit("قولنامه"))).otherwise(lit(""))

    val chips = concat(
      deedChip,
      chip("تعداد اتاق", format_string("%d", pmod(col("doc_id"), lit(5)))),
      when(m3 === 0, chip("آسانسور", lit("ندارد")))
        .when(m3 === 2, chip("آسانسور", lit("آسانسور شیک")))
        .otherwise(lit("")),
      chip("انباری", when(pmod(col("n_chars"), lit(2)) === 0, "ندارد")
        .otherwise(lit("انباری بزرگ"))),
      chip("پارکینگ", format_string("%d عدد", pmod(col("doc_id"), lit(3)))))

    // size & construction year chips: the value lives in the key span
    // (matches the real page, kilid spec fixture) — re-emit them raw
    val sizeChip = div("group flex items-center justify-center",
      format_string("""<span class="text-nowrap">%d متر</span>""", sz))
    val yearChip = div("group flex items-center justify-center",
      format_string("""<span class="text-nowrap">ساخت %d</span>""", yr))

    val grid = div("grid w-full grid-cols-2 gap-x-6", concat(
      div("flex justify-start gap-2", format_string(
        """<span class="text-gray-600">طبقه:</span>""" +
          """<span class="font-semiBold">%d</span>""",
        pmod(col("doc_id"), lit(20)))),
      when(m3 === 2, div("flex justify-start gap-2", lit(
        """<span class="text-gray-600">نوع سند:</span>""" +
          """<span class="font-semiBold">شش دانگ</span>"""))).otherwise(lit(""))))

    val desc = div("transition-all duration-300", substring(col("text"), 17, 12))
    val owner = when(even, """<span>آژانس املاک</span>""")
      .otherwise(lit("<span>مالک</span>"))

    // labelled rows: negotiable / full-credit markers + the money rows
    val rows = concat(
      when(even && m8 === 2, rowBlock(lit("رهن و اجاره"), lit("توافقی")))
        .otherwise(lit("")),
      when(even && m4 === 0, rowBlock(lit("نوع پرداخت"), lit("رهن کامل")))
        .otherwise(lit("")),
      when(even, rowBlock(lit("رهن (تومان)"),
          format_string("%d میلیون", mMillions)))
        .otherwise(rowBlock(lit("قیمت (تومان)"),
          when(m4 === 3, lit("توافقی"))
            .otherwise(format_string("%d هزار", col("n_chars"))))))

    val html = concat(lit("<html><body>"), nav, images, publish, title,
      rcBlocks, deedDiv, sizeChip, yearChip, chips, grid, desc, owner,
      rows, lit("</body></html>"))

    // envelope columns built directly — the fetch-envelope from_json
    // path is certified by the slim q143 gate; round-tripping the
    // synthesized page through to_json→from_json here was a wasted
    // serialization cycle (it was the single biggest bench line)
    docs.select(
      col("doc_id").cast(StringType).as("content_url"),
      when(even, "RENT").otherwise(lit("BUY")).as("cat1_slug"),
      lit("RESIDENTIAL").as("cat2_slug"),
      lit("APARTMENT").as("cat3_slug"),
      lit(200).as("status_code"),
      to_timestamp(lit("2025-10-21T10:00:00")).as("fetched_at"),
      html.as("html_content"))
  }

  /** q143: the kilid fetch-envelope JSON path in isolation
    * (kilid_fetcher.py:25-33) — to_json → [[ListingTransforms
    * .kilidEnvelope]] (from_json) over a payload that exercises JSON
    * string escaping (quotes, backslash, newline/tab, Persian text).
    * This is the slim companion q54 delegated the serialization
    * fidelity to when it started building envelope columns directly;
    * the DuckDB oracle round-trips the same struct through ITS OWN
    * JSON writer + `->>` extraction, so a hash match certifies the
    * escape/parse cycle against an independent implementation. */
  def q143KilidEnvelope(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val even = pmod(col("doc_id"), lit(2)) === 0
    val payload = concat(lit("<html dir=\"rtl\">\n\t"),
      substring(col("text"), 1, 40), lit(" \\ \"نقل قول\"</html>"))
    val envelopeJson = to_json(struct(
      col("doc_id").cast(StringType).as("content_url"),
      payload.as("html_content"),
      lit(200).as("status_code"),
      lit("2025-10-21T10:00:00").as("fetched_at"),
      when(even, "RENT").otherwise(lit("BUY")).as("listingType"),
      lit("RESIDENTIAL").as("propertyType"),
      lit("APARTMENT").as("landuseType")))
    ListingTransforms.kilidEnvelope(docs.select(envelopeJson.as("raw")), "raw")
      .select(col("content_url"), col("cat1_slug"), col("cat2_slug"),
        col("cat3_slug"), col("status_code"),
        date_format(col("fetched_at"), "yyyy-MM-dd HH:mm:ss").as("fetched_at_str"),
        length(col("html_content")).cast(LongType).as("html_len"),
        col("html_content"))
      .orderBy("content_url")
  }

  // --------------------------------------------------------- kilid XML

  /** q55: the kilid XML fallback parse (S8, kilid_crawler.py:13-33) under
    * the DuckDB gate — native from_xml over a synthesized listing-page
    * payload; entries without an id are dropped like the reference. */
  def q55XmlFallback(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
    val lt1 = when(pmod(col("doc_id"), lit(2)) === 0, "RENT").otherwise(lit("BUY"))
    val lt2 = when(pmod(col("n_chars"), lit(2)) === 0, "BUY").otherwise(lit("RENT"))
    val noId = when(pmod(col("doc_id"), lit(3)) === 0,
      "<result><listingType>SKIP</listingType></result>").otherwise(lit(""))
    val xml = format_string(
      "<response><data>" +
        "<result><id>K-%d</id><listingType>%s</listingType>" +
        "<propertyType>RESIDENTIAL</propertyType>" +
        "<landuseType>APARTMENT</landuseType></result>" +
        "%s" +
        "<result><id>K-%d-b</id><listingType>%s</listingType>" +
        "<propertyType>OFFICE</propertyType>" +
        "<landuseType>COMMERCIAL</landuseType></result>" +
        "</data></response>",
      col("doc_id"), lt1, noId, col("doc_id"), lt2)
    graft.sources.XmlFallback.parseListingXml(docs.select(xml.as("payload")), "payload")
      .orderBy("id")
  }

  // ------------------------------------------------- collection cleanup

  /** q57: the F40 per-document collection cleanup
    * (format_divar_collection.py:19-103) under the DuckDB gate —
    * "null" literals, "بدون/بیشتر از" normalizations, قبل…۱۳۷۰ → −1370,
    * Persian thousands-separator numeric parse, glued-datetime repair,
    * and the future-date clamp. */
  def q57CollectionCleanup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val m2 = pmod(col("doc_id"), lit(2))
    val m3 = pmod(col("doc_id"), lit(3))
    val m4 = pmod(col("doc_id"), lit(4))
    val m5 = pmod(col("doc_id"), lit(5))
    val raw = docs.select(
      col("doc_id").cast(StringType).as("content_url"),
      when(m5 === 0, "null").otherwise(substring(col("text"), 1, 10)).as("title"),
      when(m3 === 0, lit("بدون اتاق"))
        .when(m3 === 1, fa(format_string("بیشتر از %d", m5)))
        .otherwise(fa(format_string("%d", pmod(col("doc_id"), lit(7)))))
        .as("rooms_count"),
      when(m2 === 0, fa(format_string("بیشتر از %d", pmod(col("n_chars"), lit(4)))))
        .otherwise(fa(format_string(" %d ", pmod(col("n_chars"), lit(4)))))
        .as("unit_per_floor"),
      when(m4 === 0, lit("قبل از ۱۳۷۰"))
        .otherwise(fa(format_string("13%d5", pmod(col("doc_id"), lit(10)))))
        .as("construction_year"),
      fa(format_string("%d٬000 ", col("n_chars"))).as("price_value"),
      format_string("2025-09-%02d10:30:00", pmod(col("doc_id"), lit(28)) + 1)
        .as("record_timestamp"),
      lit(null).cast(StringType).as("created_at"),
      when(m2 === 0, "2025-12-0110:00:00")
        .otherwise(format_string("2025-09-%02d 08:00:00",
          pmod(col("doc_id"), lit(28)) + 1))
        .as("created_at_month"))
    graft.operators.CollectionCleanup.cleanDivarCollection(raw)
      .select(col("content_url"), col("title"), col("rooms_count"),
        col("unit_per_floor"), col("construction_year"), col("price_value"),
        fmt(col("created_at")).as("created_at"),
        fmt(col("created_at_month")).as("created_at_month"))
      .orderBy("content_url")
  }

  // ------------------------------------------------- divar→delta load

  /** q58: the F31/F32 star-load code maps + F38 melt
    * (map_divar_data_to_delta.py:69-277) under the DuckDB gate —
    * surrogate ids, the floor/rooms chip option ids, the irregular
    * Jalali-age option table (2214/2224/2234/4883/4884, 1372→1126),
    * binary feature ids, category 6/7, and the Meter-as-Value vs
    * chip-as-OptionId melt split. */
  def q58DivarToDelta(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val m23 = pmod(col("doc_id"), lit(23))
    val m33 = pmod(col("doc_id"), lit(33))
    val m6 = pmod(col("doc_id"), lit(6))
    val wide = docs.select(
      col("doc_id"),
      col("n_chars").cast(StringType).as("meter"),
      when(m23 === 0, "زیرهمکف").when(m23 === 1, "همکف")
        .when(m23 === 22, "بالا تر از 20")
        .otherwise((m23 - 1).cast(StringType)).as("floorRaw"),
      when(m6 === 0, "بدون اتاق").otherwise(m6.cast(StringType)).as("roomsRaw"),
      m33.cast(IntegerType).as("ageYears"),
      pmod(col("doc_id"), lit(2)).cast(IntegerType).as("elevator"),
      pmod(col("n_chars"), lit(2)).cast(IntegerType).as("loan"),
      when(pmod(col("doc_id"), lit(3)) > 0, 1).otherwise(0).as("parking"),
      when(pmod(col("n_chars"), lit(3)) > 0, 1).otherwise(0).as("warehouse"),
      when(pmod(col("doc_id"), lit(2)) === 0, "فروش مسکونی")
        .otherwise(lit("اجارهٔ مسکونی")).as("category"))
    val mapped = graft.operators.DivarToDelta.mapDeposits(wide, "doc_id")
    // DepositCategoryId rides through the melt — re-joining `mapped`
    // would run the surrogate-id assignment twice
    graft.operators.DivarToDelta
      .toCustomFieldValues(mapped, carry = Seq("DepositCategoryId"))
      .select(col("DepositId"), col("CustomFieldId"),
        col("CustomFieldOptionId"), col("Value"), col("DepositCategoryId"))
      .orderBy("DepositId", "CustomFieldId")
  }

  /** q59: the star-load row fixers (F22 date+street extraction,
    * fix_floor, fix_url — map_divar_data_to_delta.py:7-46) under the
    * DuckDB gate, including the quirky defaults (single-space street,
    * untrimmed pre-از floor part). */
  def q59DivarFeedFields(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val m3 = pmod(col("doc_id"), lit(3))
    val m4 = pmod(col("doc_id"), lit(4))
    val created = when(m4 === 0,
        fa(format_string("%d روز پیش در تهران، خیابان %d",
          pmod(col("doc_id"), lit(9)) + 1, pmod(col("doc_id"), lit(100)))))
      .when(m4 === 1, fa(format_string("%d هفته پیش", pmod(col("doc_id"), lit(4)) + 1)))
      .when(m4 === 2, fa(format_string("%d ماه پیش در شیراز، کوچه %d",
          pmod(col("doc_id"), lit(3)) + 1, col("doc_id"))))
      .otherwise(lit("لحظاتی پیش"))
    val floorRaw = when(m3 === 0,
        fa(format_string("%d از %d", pmod(col("doc_id"), lit(9)),
          pmod(col("doc_id"), lit(9)) + 5)))
      .when(m3 === 1, lit("همکف زیبا"))
      .otherwise(format_string("%d", pmod(col("doc_id"), lit(9))))
    val url = format_string("https://divar.ir/v/%08d", col("doc_id"))
    import graft.operators.DivarToDelta
    docs.select(
      col("doc_id"),
      fmt(DivarToDelta.createdTimeFrom(created, refTime)).as("created_time"),
      DivarToDelta.mainStreet(created).as("main_street"),
      DivarToDelta.fixFloor(floorRaw).as("floor_fixed"),
      graft.functions.PersianText.suffixToken(url).as("url_token"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q52_sheypoor_transform" -> (q52SheypoorTransform _),
    "q53_mrestate_transform" -> (q53MrestateTransform _),
    "q54_kilid_transform" -> (q54KilidTransform _),
    "q143_kilid_envelope" -> (q143KilidEnvelope _),
    "q55_xml_fallback" -> (q55XmlFallback _),
    "q57_collection_cleanup" -> (q57CollectionCleanup _),
    "q58_divar_to_delta" -> (q58DivarToDelta _),
    "q59_divar_feed_fields" -> (q59DivarFeedFields _))

  private val ts = s"timestamp '$RefTs'"

  val oracles: Map[String, String] = Map(
    "q143_kilid_envelope" ->
      """WITH j AS (
        |  SELECT to_json(struct_pack(
        |    content_url := cast(doc_id as varchar),
        |    html_content := '<html dir="rtl">' || chr(10) || chr(9) ||
        |      substr(text, 1, 40) || ' \ "نقل قول"</html>',
        |    status_code := 200,
        |    fetched_at := '2025-10-21T10:00:00',
        |    listingType := CASE WHEN doc_id % 2 = 0 THEN 'RENT' ELSE 'BUY' END,
        |    propertyType := 'RESIDENTIAL',
        |    landuseType := 'APARTMENT')) AS raw
        |  FROM documents)
        |SELECT raw->>'content_url' AS content_url,
        |  raw->>'listingType' AS cat1_slug,
        |  raw->>'propertyType' AS cat2_slug,
        |  raw->>'landuseType' AS cat3_slug,
        |  cast(raw->>'status_code' AS int) AS status_code,
        |  strftime(cast(raw->>'fetched_at' AS timestamp),
        |           '%Y-%m-%d %H:%M:%S') AS fetched_at_str,
        |  cast(length(raw->>'html_content') AS bigint) AS html_len,
        |  raw->>'html_content' AS html_content
        |FROM j ORDER BY content_url""".stripMargin,
    "q52_sheypoor_transform" ->
      s"""SELECT cast(doc_id as varchar) AS content_url,
        | CASE WHEN doc_id%2=0 THEN 'خرید' ELSE 'اجاره' END AS cat2_slug,
        | 'دفتر-کار' AS cat3_slug,
        | source AS city_slug,
        | lang || '-شهر' AS neighborhood_slug,
        | strftime($ts - to_seconds(CASE WHEN doc_id%2=0 THEN 300
        |                                ELSE (doc_id%5+1)*86400 END),
        |          '%Y-%m-%d %H:%M:%S') AS created_at_month,
        | substr(text, 1, 15) AS title,
        | CASE WHEN doc_id%3=0 THEN 'full_credit' END AS rent_type,
        | CASE WHEN doc_id%3=2 THEN 'مقطوع' END AS price_mode,
        | CASE WHEN doc_id%3=2 THEN cast(n_chars*1000 as bigint) END AS price_value,
        | CASE WHEN doc_id%3=0 THEN 'مقطوع' END AS credit_mode,
        | CASE WHEN doc_id%3=0 THEN cast(n_chars*1000 as double) END AS credit_value,
        | CASE WHEN doc_id%3=1 THEN 'مقطوع' END AS rent_mode,
        | CASE WHEN doc_id%3=1 THEN cast(n_chars*100 as double) END AS rent_value,
        | cast(n_chars as double) AS building_size,
        | cast(doc_id%5 as int) AS rooms_count,
        | cast(doc_id%15 as int) AS floor,
        | cast(doc_id%30 + 1370 as int) AS construction_year,
        | CASE WHEN doc_id%2=0 THEN true END AS has_elevator,
        | CASE WHEN doc_id%2=0 THEN 'تجاری' ELSE 'شش دانگ' END AS deed_type,
        | CASE WHEN doc_id%2=0 THEN true END AS has_business_deed,
        | CASE WHEN doc_id%2=0 THEN true END AS rent_credit_transform,
        | cast(doc_id + 0.5 as double) AS location_latitude,
        | 'https://img.sheypoor.com/' || doc_id || '.jpg' AS images_str,
        | (CASE WHEN doc_id%2=0 THEN 'خرید' ELSE 'اجاره' END) || '/دفتر کار'
        |   AS bread_crumb
        |FROM documents ORDER BY content_url""".stripMargin,
    "q53_mrestate_transform" ->
      s"""SELECT cast(doc_id as varchar) AS content_url,
        | CASE WHEN doc_id%4 IN (0,2) THEN 'خرید' ELSE 'اجاره' END AS cat2_slug,
        | CASE doc_id%4 WHEN 0 THEN 'آپارتمان' WHEN 1 THEN 'ویلا'
        |               WHEN 2 THEN 'آپارتمان' ELSE 'سوله' END AS cat3_slug,
        | source AS city_slug,
        | lang AS neighborhood_slug,
        | printf('2025-09-%02d 08:30:00', doc_id%28+1) AS created_at_month,
        | CASE doc_id%3 WHEN 0 THEN 'شخصی' WHEN 1 THEN 'مشاور املاک'
        |               ELSE 'مشاور مستقل' END AS user_type,
        | substr(text, 1, 15) AS title,
        | substr(text, 16, 25) AS description,
        | CASE WHEN doc_id%4=3 THEN 'توافقی' END AS rent_mode,
        | CASE WHEN doc_id%4=1 THEN
        |   CASE WHEN doc_id%8=1 THEN 0.0 ELSE cast(n_chars*10 as double) END
        | END AS rent_value,
        | CASE WHEN doc_id%4=1 THEN
        |   CASE WHEN doc_id%8=1 THEN 'full_credit' ELSE 'rent_credit' END
        | END AS rent_type,
        | CASE WHEN doc_id%4=2 THEN 'توافقی' END AS price_mode,
        | CASE WHEN doc_id%4=0 THEN cast(n_chars*1000000 as bigint) END AS price_value,
        | CASE WHEN doc_id%4=3 THEN 'توافقی' END AS credit_mode,
        | CASE WHEN doc_id%4=1 THEN cast(n_chars*1000 as double) END AS credit_value,
        | cast(n_chars as double) AS building_size,
        | cast(doc_id%5 as int) AS rooms_count,
        | cast(doc_id%20 as int) AS floor,
        | cast(1305 + (doc_id%10)*10 as int) AS construction_year,
        | doc_id%2=0 AS has_balcony,
        | n_chars%2=0 AS has_elevator,
        | doc_id%5<3 AS has_warehouse,
        | doc_id%3>0 AS has_parking,
        | n_chars%3=0 AS has_security_guard,
        | doc_id%7=0 AS has_pool,
        | n_chars%5=0 AS has_jacuzzi,
        | doc_id%2=1 AS has_sauna,
        | cast(doc_id + 0.5 as double) AS location_latitude,
        | cast(51.5 as double) AS location_longitude,
        | 'https://mrestate.ir/media/' || doc_id ||
        |   '.jpg|https://cdn.mrestate.ir/x.jpg' AS images_str,
        | 'صفحه اصلی' || chr(10) || '/' || chr(10) ||
        |   (CASE doc_id%4 WHEN 0 THEN 'خرید آپارتمان در تهران'
        |                  WHEN 1 THEN 'اجاره ویلا در کرج'
        |                  WHEN 2 THEN 'خرید آپارتمان اداری در تهران'
        |                  ELSE 'اجاره سوله در قم' END) || chr(10) || '/'
        |   AS bread_crumb
        |FROM documents ORDER BY content_url""".stripMargin,
    "q54_kilid_transform" ->
      s"""SELECT cast(doc_id as varchar) AS content_url,
        | 'کیلید/' || (CASE WHEN doc_id%2=0 THEN 'اجاره' ELSE 'خرید' END)
        |   || '/' || source || '/منطقه/' || lang AS breadcrumbs,
        | CASE WHEN doc_id%2=0 THEN 'RENT' ELSE 'BUY' END AS cat1_slug,
        | 'APARTMENT' AS cat2_slug,
        | 'RESIDENTIAL' AS cat3_slug,
        | source AS city_slug,
        | lang AS neighborhood_slug,
        | strftime($ts - to_seconds((doc_id%5+1)*86400),
        |          '%Y-%m-%d %H:%M:%S') AS created_at_month,
        | CASE WHEN doc_id%2=0 THEN 'مشاور املاک' ELSE 'شخصی' END AS user_type,
        | trim(substr(text, 1, 15)) AS title,
        | trim(substr(text, 17, 12)) AS description,
        | CASE WHEN doc_id%8=2 THEN 'توافقی' END AS rent_mode,
        | CASE WHEN doc_id%2=0 THEN
        |   CASE WHEN doc_id%4=0 THEN 0 ELSE cast(n_chars*1000 as bigint) END
        | END AS rent_value,
        | CASE WHEN doc_id%4=0 THEN 'full_credit'
        |      WHEN doc_id%4=2 THEN 'rent_credit' END AS rent_type,
        | CASE WHEN doc_id%4=3 THEN 'توافقی' END AS price_mode,
        | CASE WHEN doc_id%4=1 THEN cast(n_chars*1000 as bigint) END AS price_value,
        | CASE WHEN doc_id%2=0 THEN cast((n_chars%9+1)*1000000 as bigint) END
        |   AS credit_value,
        | CASE doc_id%3 WHEN 0 THEN 'تک برگ' WHEN 1 THEN 'قولنامه'
        |               ELSE 'شش دانگ' END AS deed_type,
        | cast(doc_id%20 as int) AS floor,
        | cast(doc_id%5 as int) AS rooms_count,
        | CASE doc_id%3 WHEN 0 THEN false WHEN 2 THEN true END AS has_elevator,
        | CASE WHEN n_chars%2=0 THEN false ELSE true END AS has_warehouse,
        | CASE WHEN doc_id%3=0 THEN false ELSE true END AS has_parking,
        | cast(n_chars%200+20 as int) AS building_size,
        | cast(doc_id%30+1370 as int) AS construction_year,
        | false AS is_rebuilt,
        | 'https://cdn.kilid.com/' || doc_id || '.jpg' AS images_str
        |FROM documents ORDER BY content_url""".stripMargin,
    "q55_xml_fallback" ->
      // two id-carrying results per document (the no-id entry on every
      // third document must be dropped)
      """SELECT id, listingType, propertyType, landuseType FROM (
        | SELECT 'K-' || doc_id AS id,
        |  CASE WHEN doc_id%2=0 THEN 'RENT' ELSE 'BUY' END AS listingType,
        |  'RESIDENTIAL' AS propertyType, 'APARTMENT' AS landuseType
        | FROM documents
        | UNION ALL
        | SELECT 'K-' || doc_id || '-b',
        |  CASE WHEN n_chars%2=0 THEN 'BUY' ELSE 'RENT' END,
        |  'OFFICE', 'COMMERCIAL'
        | FROM documents)
        |ORDER BY id""".stripMargin,
    "q57_collection_cleanup" ->
      s"""SELECT cast(doc_id as varchar) AS content_url,
        | CASE WHEN doc_id%5=0 THEN NULL ELSE substr(text, 1, 10) END AS title,
        | CASE doc_id%3 WHEN 0 THEN '0'
        |               WHEN 1 THEN (doc_id%5) || '+'
        |               ELSE cast(doc_id%7 as varchar) END AS rooms_count,
        | CASE WHEN doc_id%2=0 THEN (n_chars%4) || '+'
        |      ELSE cast(n_chars%4 as varchar) END AS unit_per_floor,
        | CASE WHEN doc_id%4=0 THEN -1370
        |      ELSE 1305 + (doc_id%10)*10 END AS construction_year,
        | cast(n_chars*1000 as bigint) AS price_value,
        | printf('2025-09-%02d 10:30:00', doc_id%28+1) AS created_at,
        | CASE WHEN doc_id%2=0 THEN '2025-10-21 00:00:00'
        |      ELSE printf('2025-09-%02d 08:00:00', doc_id%28+1) END
        |   AS created_at_month
        |FROM documents ORDER BY content_url""".stripMargin,
    "q58_divar_to_delta" ->
      // independent re-derivation of the option-id tables, including the
      // irregular age ids, straight from the reference's mapping dicts
      """WITH base AS (
        | SELECT doc_id, n_chars,
        |  cast(row_number() OVER (ORDER BY doc_id) + 90000 as int) id,
        |  CASE WHEN doc_id%23 = 0 THEN 1129 WHEN doc_id%23 = 1 THEN 1130
        |       WHEN doc_id%23 = 22 THEN 1151
        |       ELSE 1129 + cast(doc_id%23 as int) END floor_opt,
        |  CASE WHEN doc_id%6 = 0 THEN 1152
        |       ELSE 1152 + cast(doc_id%6 as int) END rooms_opt,
        |  CASE WHEN 1404-(doc_id%33) = 1404 THEN 2214
        |       WHEN 1404-(doc_id%33) = 1393 THEN 2224
        |       WHEN 1404-(doc_id%33) = 1378 THEN 2234
        |       WHEN 1404-(doc_id%33) = 1377 THEN 4883
        |       WHEN 1404-(doc_id%33) = 1373 THEN 4884
        |       WHEN 1404-(doc_id%33) = 1372 THEN 1126
        |       WHEN 1404-(doc_id%33) >= 1394 THEN cast(1098 + (1403 - (1404-(doc_id%33))) as int)
        |       WHEN 1404-(doc_id%33) >= 1379 THEN cast(1108 + (1392 - (1404-(doc_id%33))) as int)
        |       ELSE cast(1122 + (1376 - (1404-(doc_id%33))) as int) END age_opt,
        |  CASE WHEN doc_id%2 = 1 THEN 1090 ELSE 1091 END elev_opt,
        |  CASE WHEN n_chars%2 = 1 THEN 1096 ELSE 1097 END loan_opt,
        |  CASE WHEN doc_id%3 > 0 THEN 1094 ELSE 1095 END parking_opt,
        |  CASE WHEN n_chars%3 > 0 THEN 1092 ELSE 1093 END wh_opt,
        |  CASE WHEN doc_id%2 = 0 THEN 6 ELSE 7 END cat
        | FROM documents)
        |SELECT id AS DepositId, cfid AS CustomFieldId,
        |  cast(opt as int) AS CustomFieldOptionId, val AS Value,
        |  cast(cat as int) AS DepositCategoryId
        |FROM (
        | SELECT id, 1117 cfid, NULL opt, cast(n_chars as varchar) val, cat FROM base
        | UNION ALL SELECT id, 1118, floor_opt, NULL, cat FROM base
        | UNION ALL SELECT id, 1119, rooms_opt, NULL, cat FROM base
        | UNION ALL SELECT id, 1120, age_opt, NULL, cat FROM base
        | UNION ALL SELECT id, 1121, parking_opt, NULL, cat FROM base
        | UNION ALL SELECT id, 1122, wh_opt, NULL, cat FROM base
        | UNION ALL SELECT id, 1123, elev_opt, NULL, cat FROM base
        | UNION ALL SELECT id, 1124, loan_opt, NULL, cat FROM base)
        |ORDER BY DepositId, CustomFieldId""".stripMargin,
    "q59_divar_feed_fields" ->
      s"""SELECT doc_id,
        | strftime($ts - to_seconds(86400 *
        |   CASE doc_id%4 WHEN 0 THEN doc_id%9 + 1
        |                 WHEN 1 THEN (doc_id%4 + 1) * 7
        |                 WHEN 2 THEN (doc_id%3 + 1) * 30
        |                 ELSE 0 END),
        |   '%Y-%m-%d %H:%M:%S') AS created_time,
        | CASE doc_id%4
        |   WHEN 0 THEN 'خیابان ' ||
        |     translate(cast(doc_id%100 as varchar), '0123456789', '۰۱۲۳۴۵۶۷۸۹')
        |   WHEN 2 THEN 'کوچه ' ||
        |     translate(cast(doc_id as varchar), '0123456789', '۰۱۲۳۴۵۶۷۸۹')
        |   ELSE ' ' END AS main_street,
        | CASE doc_id%3
        |   WHEN 0 THEN translate(cast(doc_id%9 as varchar),
        |                         '0123456789', '۰۱۲۳۴۵۶۷۸۹') || ' '
        |   WHEN 1 THEN 'همکف'
        |   ELSE cast(doc_id%9 as varchar) END AS floor_fixed,
        | printf('%08d', doc_id) AS url_token
        |FROM documents ORDER BY doc_id""".stripMargin)
}
