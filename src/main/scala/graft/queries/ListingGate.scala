package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.ListingTransforms

/** Puts the real divar listing transform (F33-F40 nested-JSON
  * navigation) under the oracle gate: a raw divar document is
  * constructed deterministically from each `documents` row, the Spark
  * side runs the production `ListingTransforms.divarTransform`, and the
  * DuckDB oracle computes the expected canonical fields directly from
  * the source columns — an independent derivation, so a hash match
  * certifies the navigation + price-fallback + coercion logic.
  */
object ListingGate {
  type Q = (SparkSession, String) => DataFrame

  def q51DivarTransform(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
    val even = pmod(col("doc_id"), lit(2)) === 0
    val m4 = pmod(col("doc_id"), lit(4))
    // even rows: RENT_SLIDER branch — %4==0 with truthy transformed
    // values (exercising the bool→float→None reference quirk on
    // transformable_*), %4==2 with transformed_value=0 (falsy). odd
    // rows: the no-slider fallback with a قیمت کل price row.
    val sliderWidget = format_string(
      """{"widget_type":"RENT_SLIDER","data":{""" +
        """"credit":{"value":%d,"transformed_value":%s},""" +
        """"rent":{"value":%d,"transformed_value":%s}}}""",
      col("n_chars") * 1000L,
      when(m4 === 0, format_string("%d", col("n_chars") * 100L)).otherwise(lit("0")),
      col("n_chars") * 10L,
      when(m4 === 0, format_string("%d", col("n_chars") * 2L)).otherwise(lit("0")))
    val priceWidget = format_string(
      """{"widget_type":"UNEXPANDABLE_ROW","data":{"title":"قیمت کل","value":"%d تومان"}}""",
      col("n_chars"))
    // modal feature list exercising the reference's single interleaved
    // pass (divar_transformer.py:509-536): the SAME system (heating)
    // appears in TWO modal items, once as an enum FEATURE_ROW and once
    // as a features_map bool title — whichever comes LAST must win.
    val m3 = pmod(col("doc_id"), lit(3))
    val coolingItem =
      """{"widget_type":"UNEXPANDABLE_ROW","data":{"title":"سرمایش کولر آبی"}}"""
    val heatNo =
      """{"widget_type":"UNEXPANDABLE_ROW","data":{"title":"گرمایش داکت اسپلیت ندارد"}}"""
    val heatShofaj = """{"widget_type":"FEATURE_ROW","data":{"title":"گرمایش شوفاژ"}}"""
    val heatBokhari = """{"widget_type":"FEATURE_ROW","data":{"title":"گرمایش بخاری"}}"""
    val modalList = when(m3 === 0, lit(s"$heatShofaj,$heatNo,$coolingItem"))
      .when(m3 === 1, lit(s"$heatNo,$heatBokhari,$coolingItem"))
      .otherwise(lit(coolingItem))
    val groupItems = when(m3 === 2,
        lit("""{"title":"آسانسور","available":true},""" +
          """{"title":"گرمایش داکت اسپلیت","available":false}"""))
      .otherwise(lit("""{"title":"آسانسور","available":true}"""))
    val groupFeatureWidget = concat(
      lit("""{"widget_type":"GROUP_FEATURE_ROW","data":{"items":["""),
      groupItems,
      lit("""],"action":{"payload":{"modal_page":{"widget_list":[""")
      , modalList, lit("]}}}}}"))
    val raw = docs.select(
      col("doc_id").cast(StringType).as("url"),
      concat(
        format_string(
          """{"share":{"title":"%s"},""" +
            """"analytics":{"cat2":"%s","cat3":"%s-sell","city":"%s"},""" +
            """"sections":[{"section_name":"LIST_DATA","widgets":[""",
          substring(col("text"), 1, 15), col("lang"), col("lang"), col("source")),
        when(even, sliderWidget).otherwise(priceWidget),
        lit(","), groupFeatureWidget,
        lit("]}]}")).as("raw"))
    ListingTransforms.divarTransform(raw, "raw", "url",
        to_timestamp(lit("2025-10-21 12:00:00")))
      .select(col("content_url"), col("cat2_slug"), col("cat3_slug"),
        col("city_slug"), col("title"), col("price_value"),
        col("rent_type"), col("price_mode"), col("building_size"),
        col("rent_mode"), col("credit_value"), col("rent_value"),
        col("transformed_credit"), col("transformed_rent"),
        col("transformable_credit"), col("transformable_rent"),
        col("rent_credit_transform"), col("transformable_price"),
        col("has_heating_system"), col("has_cooling_system"),
        col("has_water"), col("has_elevator"))
      .orderBy("content_url")
  }

  val queries: Map[String, Q] = Map("q51_divar_transform" -> (q51DivarTransform _))

  val oracles: Map[String, String] = Map(
    "q51_divar_transform" ->
      // independently derived expectations. Odd rows (no slider): price
      // from the UNEXPANDABLE_ROW (stripping " تومان"), else-branch
      // rent_type='rent_credit'. Even rows (RENT_SLIDER): slider money
      // fields, rent_mode always 'مجانی' (the reference hard-codes
      // has_credit/has_rent False there), and the transformable_* quirk:
      // bool(True) dies in the reference's numeric pass (float('') →
      // None) while False survives — so truthy → NULL, falsy → false.
      """SELECT cast(doc_id as varchar) AS content_url,
        | lang AS cat2_slug,
        | lang || '-sell' AS cat3_slug,
        | source AS city_slug,
        | substr(text, 1, 15) AS title,
        | CASE WHEN doc_id%2=1 THEN cast(n_chars as bigint) END AS price_value,
        | CASE WHEN doc_id%2=1 THEN 'rent_credit'
        |      WHEN doc_id%4=0 THEN 'rent_credit' END AS rent_type,
        | cast(NULL as varchar) AS price_mode,
        | cast(NULL as double) AS building_size,
        | CASE WHEN doc_id%2=0 THEN 'مجانی' END AS rent_mode,
        | CASE WHEN doc_id%2=0 THEN cast(n_chars*1000 as double) END AS credit_value,
        | CASE WHEN doc_id%2=0 THEN cast(n_chars*10 as double) END AS rent_value,
        | CASE WHEN doc_id%4=0 THEN cast(n_chars*100 as double) END AS transformed_credit,
        | CASE WHEN doc_id%4=0 THEN cast(n_chars*2 as double) END AS transformed_rent,
        | CASE WHEN doc_id%4=2 THEN false END AS transformable_credit,
        | CASE WHEN doc_id%4=2 THEN false END AS transformable_rent,
        | CASE WHEN doc_id%4=0 THEN true WHEN doc_id%4=2 THEN false END
        |   AS rent_credit_transform,
        | CASE WHEN doc_id%4=0 THEN true WHEN doc_id%4=2 THEN false END
        |   AS transformable_price,
        | CASE WHEN doc_id%3=1 THEN 'heater' ELSE 'false' END
        |   AS has_heating_system,
        | 'water_cooler' AS has_cooling_system,
        | true AS has_water,
        | true AS has_elevator
        |FROM documents ORDER BY content_url""".stripMargin)
}
