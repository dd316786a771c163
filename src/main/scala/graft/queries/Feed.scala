package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The price-prediction feed shape (SURVEY.md §3.3: S5 column exclusion,
  * P8 category filter, F28 sentinel patch) over the driver's documents
  * table, oracle-checked.
  */
object Feed {
  type Q = (SparkSession, String) => DataFrame

  /** q41: drop excluded columns → filter category → patch sentinel
    * (price_prediction_data_pipeline.py:57-64,118-121). */
  def q41FeedPrepare(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .drop("source")
      .filter(col("lang") === "en")
      .withColumn("n_chars",
        when(col("n_chars") === 128, 127L).otherwise(col("n_chars")))
      .orderBy("doc_id")

  /** q42: the F1/F3/F11-F13 string-normalization family in the gate —
    * Persian digit translation round-trip, slugging, token extraction,
    * concat, suffix slice (PersianText semantics over driver data). */
  def q42StringNormalize(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PersianText
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        // build a Persian-digit id then translate back (F1 both ways)
        translate(col("doc_id").cast("string"),
          PersianText.EnglishDigits, PersianText.PersianDigits).as("fa_id"),
        PersianText.persianToEnglishDigits(
          translate(col("doc_id").cast("string"),
            PersianText.EnglishDigits, PersianText.PersianDigits)).as("roundtrip_id"),
        lower(regexp_replace(trim(substring(col("text"), 1, 20)), "\\s+", "-"))
          .as("slug20"),
        element_at(split(col("text"), " "), 1).as("first_token"),
        concat_ws("/", col("lang"), col("source")).as("lang_source"),
        substring(col("text"), -3, 3).as("tail3"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q41_feed_prepare" -> (q41FeedPrepare _),
    "q42_string_normalize" -> (q42StringNormalize _))

  val oracles: Map[String, String] = Map(
    "q41_feed_prepare" ->
      """SELECT doc_id, text, lang,
        | CASE WHEN n_chars = 128 THEN 127 ELSE n_chars END AS n_chars
        |FROM documents WHERE lang = 'en' ORDER BY doc_id""".stripMargin,
    "q42_string_normalize" ->
      """SELECT doc_id,
        | translate(cast(doc_id as varchar), '0123456789', '۰۱۲۳۴۵۶۷۸۹') AS fa_id,
        | translate(translate(cast(doc_id as varchar), '0123456789', '۰۱۲۳۴۵۶۷۸۹'),
        |           '۰۱۲۳۴۵۶۷۸۹', '0123456789') AS roundtrip_id,
        | lower(regexp_replace(trim(substr(text, 1, 20)), '\s+', '-', 'g')) AS slug20,
        | split_part(text, ' ', 1) AS first_token,
        | concat_ws('/', lang, source) AS lang_source,
        | substr(text, -3, 3) AS tail3
        |FROM documents ORDER BY doc_id""".stripMargin)
}
