package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{PersianText, RelativeDates}

/** F40 — the per-document collection cleanup migration
  * (format_divar_collection.py:19-103) as a schema-driven column
  * program: drop `crawl_timestamp`, literal "null" → null, per-key
  * normalizers (rooms / unit-per-floor "more than N" → "N+",
  * construction-year قبل…۱۳۷۰ → −1370, numeric junk-strip parse), the
  * glued-datetime repair, and the future-date clamp on
  * `created_at_month`.
  *
  * Typing: the reference's try_parse_float returns int/float when
  * parseable and the ORIGINAL string otherwise (Mongo documents are
  * schemaless). The engine keeps each column's declared type:
  * numeric columns parse-or-null, the "N+" forms stay in the string
  * column they belong to — same normalization decisions, typed columns.
  */
object CollectionCleanup {

  /** try_parse_float's junk strip: digits translated, then LRM/RLM,
    * ASCII+Arabic thousands separators and whitespace removed
    * (format_divar_collection.py:27-36). */
  def stripNumericJunk(c: Column): Column =
    regexp_replace(PersianText.persianToEnglishDigits(c),
      "[‎‏,\\s٬،]", "")

  /** Numeric parse after the junk strip; null when not numeric or out
    * of long range (a plain cast would THROW on 1e308-style input under
    * ANSI — caught by the totality property test). */
  def tryParseLong(c: Column): Column =
    stripNumericJunk(c).try_cast(DoubleType).try_cast(LongType)

  /** normalize_more_than_value (py:50-59): translate digits, strip
    * marks/whitespace, "بیشتراز"/"بیشتر" + digits → "N+", else the
    * stripped value. */
  def normalizeMoreThan(c: Column): Column = {
    val stripped = regexp_replace(PersianText.persianToEnglishDigits(c),
      "[‎‏\\s]", "")
    when(c.isNull, lit(null).cast(StringType))
      .when(stripped.contains("بیشتر") &&
            regexp_extract(stripped, "(\\d+)", 1) =!= "",
        concat(regexp_extract(stripped, "(\\d+)", 1), lit("+")))
      .otherwise(stripped)
  }

  /** rooms_count (py:79-84): "بدون…" → "0" (the reference's int 0),
    * else the more-than normalization. */
  def roomsCount(c: Column): Column =
    when(c.isNull, lit(null).cast(StringType))
      .when(c.contains("بدون"), "0")
      .otherwise(normalizeMoreThan(c))

  /** normalize_construction_year (py:61-67): قبل + 1370 → −1370, else
    * numeric parse of the space-stripped translated value. */
  def constructionYear(c: Column): Column = {
    val cleaned = regexp_replace(PersianText.persianToEnglishDigits(c), " ", "")
    when(cleaned.contains("قبل") && cleaned.contains("1370"), lit(-1370L))
      .otherwise(tryParseLong(cleaned))
  }

  /** Literal "null" strings become real nulls (py:77-78). */
  def nullLiteral(c: Column): Column = when(c === "null", lit(null)).otherwise(c)

  /** Cleanup over the known divar collection columns: drops
    * crawl_timestamp, renames record_timestamp → created_at, repairs
    * glued datetimes, clamps future created_at_month (LIMIT 2025-11-04
    * → RESET 2025-10-21, py:16-17,94-101). */
  def cleanDivarCollection(df: DataFrame): DataFrame = {
    val glueRepaired: Column => Column = c => to_timestamp(
      regexp_replace(PersianText.persianToEnglishDigits(trim(c)),
        "^(\\d{4}-\\d{2}-\\d{2})(\\d{2}:\\d{2}:\\d{2})$", "$1 $2"))
    df.select(
      col("content_url"),
      nullLiteral(col("title")).as("title"),
      roomsCount(col("rooms_count")).as("rooms_count"),
      normalizeMoreThan(col("unit_per_floor")).as("unit_per_floor"),
      constructionYear(col("construction_year")).as("construction_year"),
      tryParseLong(col("price_value")).as("price_value"),
      glueRepaired(coalesce(col("record_timestamp"), col("created_at")))
        .as("created_at"),
      RelativeDates.repairAndClamp(col("created_at_month"),
        limit = "2025-11-04 00:00:00", reset = "2025-10-21 00:00:00")
        .as("created_at_month"))
  }
}
