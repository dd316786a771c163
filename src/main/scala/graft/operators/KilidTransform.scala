package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.RelativeDates
import graft.sources.HtmlLite

/** Kilid's HTML→canonical extraction (kilid_transformer.py:66-534) — the
  * one reference transformer whose input is rendered HTML rather than
  * JSON. Extraction runs in a compiled UDF over `HtmlLite` (one DOM per
  * row, partition-parallel); date parsing and numeric coercion stay in
  * column-land so the injected `refTime` rule holds.
  *
  * CSS-selector targets mirror the reference's BeautifulSoup calls:
  * breadcrumb nav, cdn gallery images, ad-code/publish spans, price and
  * rent/credit blocks, the feature chips and the additional-details
  * grid, description container, owner/agency spans.
  */
object KilidTransform {

  // ---- plain-Scala ports of the shared text helpers (UDF side)

  // precompiled per-object: `"...".r` inside extract() would compile a
  // fresh Pattern per call per row — the dominant cost of the parse UDF
  // before hoisting
  private val digitsRe = "(\\d+)".r
  private val fullCreditRe = "رهن\\s*کامل".r
  private val meterRe = "(\\d+)\\s*متر".r
  private val sakhtRe = "ساخت\\s*(\\d+)".r

  private def cleanText(s: String): String =
    if (s == null) "" else s.replace("‌", " ").trim

  private def toEnDigits(s: String): String = {
    if (s == null) return ""
    val sb = new StringBuilder(s.length)
    s.foreach { ch =>
      val i = "۰۱۲۳۴۵۶۷۸۹".indexOf(ch)
      sb.append(if (i >= 0) ('0' + i).toChar else ch)
    }
    sb.toString
  }

  /** parse_toman_amount (kilid_transformer.py:41-64) → numeric side only
    * (the negotiable/no-number text carries no amount). */
  private def parseToman(raw: String): Option[Long] = {
    if (raw == null) return None
    val s = toEnDigits(cleanText(raw))
    if (s.contains("توافقی")) return None
    val m = digitsRe.findFirstIn(s)
    m.map(_.toLong).map { n =>
      if (s.contains("میلیارد")) n * 1000000000L
      else if (s.contains("میلیون")) n * 1000000L
      else if (s.contains("هزار")) n * 1000L
      else n
    }
  }

  private def normalizeDeed(raw: String): Option[String] = {
    if (raw == null) return None
    val v = cleanText(raw).replace("نوع سند", "").replace(":", "").trim
    if (v.isEmpty) None
    else if (v.contains("تک برگ")) Some("تک برگ")
    else if (v.contains("قولنامه")) Some("قولنامه ای")
    else Some(v)
  }

  /** feature chip label → canonical field (kilid_transformer.py:69-116). */
  private val featureMap: Map[String, String] = Map(
    "طبقه" -> "floor", "تعداد طبقات" -> "total_floors_count",
    "تعداد اتاق" -> "rooms_count", "تعداد واحد در طبقه" -> "unit_per_floor",
    "سند" -> "deed_type", "نوع سند" -> "deed_type",
    "آب" -> "has_water", "برق" -> "has_electricity", "گاز" -> "has_gas",
    "آب گرم" -> "has_warm_water_provider",
    "سیستم گرمایش" -> "has_heating_system",
    "سیستم سرمایش" -> "has_cooling_system",
    "سرویس بهداشتی" -> "has_restroom", "نگهبان" -> "has_security_guard",
    "باربیکیو" -> "has_barbecue",
    "جهت ساختمان" -> "building_direction", "جهت بنا" -> "building_direction",
    "استخر" -> "has_pool", "جکوزی" -> "has_jacuzzi", "سونا" -> "has_sauna",
    "جنس کف" -> "floor_material",
    "نوع اجاره" -> "rent_mode", "اجاره به مجرد" -> "rent_to_single",
    "نحوه اجاره" -> "rent_type", "نوع قیمت" -> "price_mode",
    "نوع رهن" -> "credit_mode", "نوع ملک" -> "property_type",
    "ظرفیت پایه" -> "regular_person_capacity",
    "ظرفیت اضافه" -> "extra_person_capacity",
    "هزینه هر نفر اضافه" -> "cost_per_extra_person",
    "قیمت ایام عادی" -> "rent_price_on_regular_days",
    "قیمت ایام خاص" -> "rent_price_on_special_days",
    "قیمت آخر هفته" -> "rent_price_at_weekends")

  /** Everything the UDF lifts out of one page. Strings stay raw; typed
    * coercion happens in column expressions downstream. */
  final case class Extracted(
      breadcrumbs: Seq[String],
      images: Seq[String],
      published_raw: String,
      title: String,
      price_total: Option[Long],
      credit_value: Option[Long],
      rent_value: Option[Long],
      deed_type: String,
      description: String,
      user_type: String,
      building_size: Option[Int],
      construction_year: Option[Int],
      is_rebuilt: Boolean,
      price_mode_negotiable: Boolean,
      rent_mode_negotiable: Boolean,
      rent_type_full_credit: Boolean,
      has_elevator: Option[Boolean],
      has_warehouse: Option[Boolean],
      has_parking: Option[Boolean],
      features: Map[String, String])

  private[operators] def extract(html: String, cat1: String): Extracted = {
    val doc = HtmlLite.parse(html)

    val breadcrumbs = doc.selectByAttr("nav", "aria-label", "breadcrumb")
      .headOption.map(_.select("a").map(_.text)).getOrElse(Seq.empty)

    // the reference keeps duplicates — no dict.fromkeys here, unlike
    // divar (kilid_transformer.py:194-200)
    val images = doc.select("div", "relative").flatMap(_.select("img"))
      .flatMap(_.attrs.get("src"))
      .filter(_.startsWith("https://cdn.kilid.com"))

    var publishedRaw: String = null
    doc.select("div", "flex", "items-center", "justify-center", "gap-1").foreach { d =>
      val t = d.text
      if (t.contains("انتشار"))
        d.selectOne("span", "font-semiBold").foreach(s => publishedRaw = s.text)
    }

    val title = doc.selectOne("h1", "text-lg", "font-semibold").map(n => cleanText(n.text)).orNull

    val priceTotal = doc.select("div", "flex-row", "items-center", "justify-between")
      .flatMap(_.select("span", "text-lg", "font-bold")).headOption
      .flatMap(n => parseToman(n.text))

    val rcBlocks = doc.select("div", "flex", "flex-col", "items-end", "justify-center")
      .flatMap(_.select("span", "text-lg", "font-bold"))
    var creditValue: Option[Long] = None
    var rentValue: Option[Long] = None
    if (rcBlocks.length >= 2) {
      creditValue = parseToman(rcBlocks(0).text)
      val rentText = cleanText(rcBlocks(1).text)
      rentValue =
        if (fullCreditRe.findFirstIn(rentText).isDefined) Some(0L)
        else parseToman(rentText)
    }

    val deed = doc.selectOne("div", "inline-flex", "items-center", "bg-gray-50")
      .flatMap(n => normalizeDeed(n.text)).orNull

    // feature chips (reference: raw_features dict; insertion-ordered)
    val chipFeatures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var parking: Option[Boolean] = None
    var parkingSeen = false
    doc.select("div", "group", "flex", "items-center", "justify-center").foreach { d =>
      d.selectOne("span", "text-nowrap").foreach { keySpan =>
        val full = toEnDigits(cleanText(d.text))
        if (full.contains("پارکینگ")) {
          parkingSeen = true
          parking =
            if (full.contains("اشاره")) None
            else if (full.contains("ندارد")) Some(false)
            else digitsRe.findFirstMatchIn(full)
              .map(m => m.group(1).toInt > 0)
        } else {
          val key = cleanText(keySpan.text)
          val value = toEnDigits(cleanText(d.text.replaceFirst(
            java.util.regex.Pattern.quote(key), "").trim))
          chipFeatures(key) = value
        }
      }
    }
    // additional-details grid (reference: raw_additional dict — a SEPARATE
    // dict iterated after raw_features, so its writes win). The reference
    // uses select_one on the grid container — FIRST container only
    // (kilid_transformer.py:280-290).
    val addlFeatures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    doc.select("div", "grid", "grid-cols-2").headOption.foreach { container =>
      container.select("div", "flex", "justify-start", "gap-2").foreach { d =>
        for {
          k <- d.selectOne("span", "text-gray-600")
          v <- d.selectOne("span", "font-semiBold")
        } addlFeatures(cleanText(k.text.replace(":", ""))) = toEnDigits(cleanText(v.text))
      }
    }
    val features = chipFeatures ++ addlFeatures

    val description = doc.select("div", "transition-all", "duration-300")
      .headOption.map(n => cleanText(n.text)).orNull

    val userType =
      if (doc.select("span").exists(_.text.contains("آژانس"))) "مشاور املاک"
      else if (doc.select("span").exists(_.text.contains("مالک"))) "شخصی"
      else null

    val nowraps = doc.select("span", "text-nowrap").map(n => toEnDigits(cleanText(n.text)))
    val buildingSize = nowraps.collectFirst {
      case t if meterRe.findFirstIn(t).isDefined =>
        digitsRe.findFirstIn(t).get.toInt
    }
    val constructionYear = nowraps.collectFirst {
      case t if sakhtRe.findFirstMatchIn(t).isDefined =>
        sakhtRe.findFirstMatchIn(t).get.group(1).toInt
    }

    val isRebuilt = doc.select("button").flatMap(_.select("span"))
      .exists(s => cleanText(s.text).contains("بازسازی شده"))

    // label/value pairs for negotiable + full-credit detection
    val rowBlocks = doc.select("div", "flex", "w-full", "flex-row", "items-center",
      "justify-between")
    val labelTexts = rowBlocks.flatMap(_.select("span", "text-sm", "font-semibold"))
      .map(n => cleanText(n.text))
    val valueTexts = rowBlocks.flatMap(_.select("span", "text-lg", "font-bold"))
      .map(n => cleanText(n.text))
    val pairs = labelTexts.zip(valueTexts)
    val priceNeg = cat1 == "BUY" &&
      pairs.exists { case (l, v) => l.contains("قیمت") && v.contains("توافقی") }
    val rentNeg = cat1 == "RENT" &&
      pairs.exists { case (l, v) => l.contains("رهن و اجاره") && v.contains("توافقی") }
    val fullCredit = cat1 == "RENT" &&
      valueTexts.exists(v => fullCreditRe.findFirstIn(v).isDefined)

    // RENT refines credit from the "رهن ... تومان" labelled block
    if (cat1 == "RENT") {
      creditValue = rowBlocks.flatMap { b =>
        for {
          l <- b.selectOne("span", "text-sm", "font-semibold")
          v <- b.selectOne("span", "text-lg", "font-bold")
          lt = cleanText(l.text)
          if lt.contains("رهن") && lt.contains("تومان")
        } yield parseToman(v.text)
      }.headOption.flatten
    }

    // map_feature booleans (kilid_transformer.py:155-176)
    def triState(key: String, word: String): Option[Boolean] =
      features.get(key).map(toEnDigits).flatMap { v =>
        if (v.contains("ندارد")) Some(false)
        else if (v.contains(word)) Some(true)
        else None
      }

    Extracted(
      breadcrumbs = breadcrumbs,
      images = images,
      published_raw = publishedRaw,
      title = title,
      price_total = priceTotal,
      credit_value = creditValue,
      rent_value = rentValue,
      // map_feature stores the RAW cleaned digit-translated chip value
      // un-normalized (kilid_transformer.py:176-177 overwrites the
      // normalized doc_div default), last-writer-wins in dict-iteration
      // order: last deed key of raw_additional, else last of raw_features,
      // else the normalized doc_div fallback. E.g. chip 'قولنامه' stays
      // 'قولنامه' — only the doc_div path yields 'قولنامه ای'.
      deed_type = Seq(chipFeatures, addlFeatures)
        .flatMap(_.iterator.collect {
          case (k, v) if k == "سند" || k == "نوع سند" => v
        })
        .lastOption.getOrElse(deed),
      description = description,
      user_type = userType,
      building_size = buildingSize,
      construction_year = constructionYear,
      is_rebuilt = isRebuilt,
      price_mode_negotiable = priceNeg,
      rent_mode_negotiable = rentNeg,
      rent_type_full_credit = fullCredit,
      has_elevator = triState("آسانسور", "آسانسور"),
      has_warehouse = triState("انباری", "انباری"),
      has_parking = if (parkingSeen) parking else None,
      features = features.toMap)
  }

  private val extractUdf = udf((html: String, cat1: String) =>
    if (html == null) null else extract(html, Option(cat1).getOrElse("")))

  /** Envelope frame (ListingTransforms.kilidEnvelope output) → canonical
    * listing columns.
    *
    * DELIBERATE canonicalization: the reference's rewritten map_feature
    * stringifies everything it stores (has_parking becomes the strings
    * "True"/"False"/"None", floor/rooms stay digit strings —
    * kilid_transformer.py:154-177); the engine's unified listing schema
    * types them boolean/int like the other three sites, preserving the
    * same tri-state semantics. */
  def kilidTransform(envelope: DataFrame, refTime: Column): DataFrame = {
    import graft.functions.PersianText.toLongOrNull
    val e = envelope.withColumn("__x",
      extractUdf(col("html_content"), col("cat1_slug")))
    val x = col("__x")
    def feat(key: String): Column = element_at(x("features"), key)
    val isBuy = col("cat1_slug") === "BUY"
    val isRent = col("cat1_slug") === "RENT"
    val rentVal = when(isBuy, lit(null).cast(LongType)).otherwise(x("rent_value"))
    val creditVal = when(isBuy, lit(null).cast(LongType)).otherwise(x("credit_value"))
    e.select(
      col("content_url"),
      refTime.as("created_at"),
      array_join(x("breadcrumbs"), "/").as("breadcrumbs"),
      col("cat1_slug"),
      col("cat3_slug").as("cat2_slug"),   // landuseType (reference field swap)
      col("cat2_slug").as("cat3_slug"),   // propertyType
      try_element_at(x("breadcrumbs"), lit(3)).as("city_slug"),
      try_element_at(x("breadcrumbs"), lit(5)).as("neighborhood_slug"),
      RelativeDates.textToDateKilid(x("published_raw"), refTime).as("created_at_month"),
      x("user_type").as("user_type"),
      x("description").as("description"),
      x("title").as("title"),
      when(isRent && x("rent_mode_negotiable"), "توافقی")
        .otherwise(when(isBuy, lit(null).cast(StringType)).otherwise(feat("نوع اجاره")))
        .as("rent_mode"),
      rentVal.as("rent_value"),
      when(isBuy, lit(null).cast(StringType)).otherwise(feat("اجاره به مجرد"))
        .as("rent_to_single"),
      when(isRent && x("rent_type_full_credit"), "full_credit")
        .when(isRent && coalesce(rentVal, lit(0L)) =!= 0 &&
              coalesce(creditVal, lit(0L)) =!= 0, "rent_credit")
        .otherwise(when(isBuy, lit(null).cast(StringType)).otherwise(feat("نحوه اجاره")))
        .as("rent_type"),
      when(isRent, lit(null).cast(StringType))
        .otherwise(when(x("price_mode_negotiable"), "توافقی").otherwise(feat("نوع قیمت")))
        .as("price_mode"),
      when(isRent, lit(null).cast(LongType)).otherwise(x("price_total"))
        .as("price_value"),
      when(isBuy, lit(null).cast(StringType)).otherwise(feat("نوع رهن"))
        .as("credit_mode"),
      creditVal.as("credit_value"),
      x("deed_type").as("deed_type"),
      toLongOrNull(feat("طبقه")).cast(IntegerType).as("floor"),
      toLongOrNull(feat("تعداد اتاق")).cast(IntegerType).as("rooms_count"),
      toLongOrNull(feat("تعداد طبقات")).cast(IntegerType).as("total_floors_count"),
      toLongOrNull(feat("تعداد واحد در طبقه")).cast(IntegerType).as("unit_per_floor"),
      x("has_elevator").as("has_elevator"),
      x("has_warehouse").as("has_warehouse"),
      x("has_parking").as("has_parking"),
      x("building_size").as("building_size"),
      x("construction_year").as("construction_year"),
      x("is_rebuilt").as("is_rebuilt"),
      feat("سیستم گرمایش").as("has_heating_system"),
      feat("سیستم سرمایش").as("has_cooling_system"),
      feat("جهت ساختمان").as("building_direction"),
      feat("جنس کف").as("floor_material"),
      feat("نوع ملک").as("property_type"),
      x("images").as("images"))
  }
}
