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

  /** q148: the engine function library exercised through PURE SQL —
    * [[graft.plans.GraftExtensions]] registers the Column functions as
    * FunctionRegistry macros (inlined expression trees, not UDF black
    * boxes), and the whole query is one `spark.sql` string: Persian
    * digit translation, toman amount parsing (unit words ×10³/×10⁶,
    * negotiable → label), the sheypoor slug rule, garbage-stripped
    * integer parsing, and truthiness. The oracle re-derives every
    * column in DuckDB from the same synthesized inputs, so a hash
    * match certifies the SQL surface delivers the exact Scala-API
    * semantics. */
  def q148SqlFunctions(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    Tables.documents(s, dir).createOrReplaceTempView("q148_docs")
    s.sql("""
      WITH src AS (
        SELECT doc_id,
          concat(translate(cast(doc_id % 997 AS string), '0123456789', '۰۱۲۳۴۵۶۷۸۹'),
                 CASE CAST(doc_id % 4 AS INT)
                   WHEN 0 THEN ' تومان'
                   WHEN 1 THEN ' هزار تومان'
                   WHEN 2 THEN ' میلیون تومان'
                   ELSE ' توافقی' END) AS price_text,
          substring(text, 1, 24) AS head,
          lang
        FROM q148_docs)
      , parsed AS (
        SELECT doc_id,
          graft_digits(price_text) AS en_text,
          graft_parse_toman(price_text) AS toman,
          graft_slug(head) AS slug,
          graft_to_long(concat('id_', cast(doc_id AS string))) AS id_back,
          graft_to_long(concat(cast(doc_id AS string), '.5')) AS bad_long,
          graft_truthy(lang) AS truthy
        FROM src)
      SELECT doc_id, en_text, toman.amount AS amount, toman.label AS label,
        slug, id_back, bad_long, truthy
      FROM parsed ORDER BY doc_id""")
  }

  val queries: Map[String, Q] = Map(
    "q41_feed_prepare" -> (q41FeedPrepare _),
    "q42_string_normalize" -> (q42StringNormalize _),
    "q148_sql_functions" -> (q148SqlFunctions _))

  val oracles: Map[String, String] = Map(
    // q148: every SQL-macro column re-derived relationally. amount:
    // first digit run = doc_id % 997, scaled by the unit word; the
    // negotiable branch (توافقی) nulls the amount and carries the
    // digit-translated text as label. slug mirrors the sheypoor rule
    // (falsy→null, lower+trim, Persian comma → ',', pre-comma segment,
    // whitespace runs → '-'). id_back strips non-[0-9.+-] then casts;
    // '123.5' is non-integral → NULL in both engines.
    "q148_sql_functions" ->
      """WITH src AS (
        |  SELECT doc_id,
        |    concat(translate(cast(doc_id % 997 AS varchar), '0123456789', '۰۱۲۳۴۵۶۷۸۹'),
        |           CASE CAST(doc_id % 4 AS INT)
        |             WHEN 0 THEN ' تومان'
        |             WHEN 1 THEN ' هزار تومان'
        |             WHEN 2 THEN ' میلیون تومان'
        |             ELSE ' توافقی' END) AS price_text,
        |    substr(text, 1, 24) AS head,
        |    lang
        |  FROM documents)
        |SELECT doc_id,
        |  translate(price_text, '۰۱۲۳۴۵۶۷۸۹', '0123456789') AS en_text,
        |  CASE WHEN doc_id % 4 = 3 THEN NULL
        |       WHEN doc_id % 4 = 1 THEN (doc_id % 997) * 1000
        |       WHEN doc_id % 4 = 2 THEN (doc_id % 997) * 1000000
        |       ELSE doc_id % 997 END AS amount,
        |  CASE WHEN doc_id % 4 = 3
        |       THEN translate(price_text, '۰۱۲۳۴۵۶۷۸۹', '0123456789')
        |       ELSE NULL END AS label,
        |  CASE WHEN head IS NULL OR head = '' THEN NULL
        |       ELSE regexp_replace(
        |         split_part(regexp_replace(lower(trim(head)), '،', ',', 'g'), ',', 1),
        |         '\s+', '-', 'g') END AS slug,
        |  cast(doc_id AS bigint) AS id_back,
        |  cast(NULL AS bigint) AS bad_long, -- '<id>.5' is non-integral: the
        |  -- engine's int() semantics null it (DuckDB's varchar cast would
        |  -- ROUND, so the expectation is stated directly)
        |  (lang IS NOT NULL AND lang <> '') AS truthy
        |FROM src ORDER BY doc_id""".stripMargin,
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
