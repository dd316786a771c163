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
    val docs = Tables.documents(s, dir)
    val raw = docs.select(
      col("doc_id").cast(StringType).as("url"),
      format_string(
        """{"share":{"title":"%s"},""" +
          """"analytics":{"cat2":"%s","cat3":"%s-sell","city":"%s"},""" +
          """"sections":[{"section_name":"LIST_DATA","widgets":[""" +
          """{"widget_type":"UNEXPANDABLE_ROW","data":{"title":"قیمت کل","value":"%d تومان"}}]}]}""",
        substring(col("text"), 1, 15), col("lang"), col("lang"),
        col("source"), col("n_chars")).as("raw"))
    ListingTransforms.divarTransform(raw, "raw", "url",
        to_timestamp(lit("2025-10-21 12:00:00")))
      .select(col("content_url"), col("cat2_slug"), col("cat3_slug"),
        col("city_slug"), col("title"), col("price_value"),
        col("rent_type"), col("price_mode"), col("building_size"))
      .orderBy("content_url")
  }

  val queries: Map[String, Q] = Map("q51_divar_transform" -> (q51DivarTransform _))

  val oracles: Map[String, String] = Map(
    "q51_divar_transform" ->
      // independently derived expectations: the transform must read the
      // title out of share.title, slugs out of analytics, the price out
      // of the UNEXPANDABLE_ROW (stripping " تومان"), fall through the
      // no-slider rent branch to rent_type='rent_credit' (no credit, no
      // rent), and leave absent fields null.
      """SELECT cast(doc_id as varchar) AS content_url,
        | lang AS cat2_slug,
        | lang || '-sell' AS cat3_slug,
        | source AS city_slug,
        | substr(text, 1, 15) AS title,
        | cast(n_chars as bigint) AS price_value,
        | 'rent_credit' AS rent_type,
        | cast(NULL as varchar) AS price_mode,
        | cast(NULL as double) AS building_size
        |FROM documents ORDER BY content_url""".stripMargin)
}
