package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import PersianText.persianToEnglishDigits

/** Relative-Persian-date parsing ("۲ روز پیش" → timestamp) as pure column
  * expressions. Every function takes an explicit `refTime` column instead
  * of the wall clock (`datetime.now()` in the reference) — the
  * determinism rule of SURVEY.md §7.1/§7.4#1.
  *
  * Site variants differ in branch ordering and special cases:
  *  - divar  (divar_transformer.py:32-56, convert_text_to_date.py:13-40):
  *    لحظاتی پیش → now; دقایقی پیش → −5 min; then روز/هفته/ماه(30d)/ساعت.
  *  - kilid  (kilid_transformer.py:14-36): null → null; branch order
  *    دقیقه/ساعت/روز/هفته/ماه.
  *  - sheypoor (sheypoor_transformer.py:10-36): numberless specials add
  *    ساعاتی پیش → −2 h; numbered units are روز/هفته/ماه only.
  */
object RelativeDates {

  private def amountOf(s: Column): Column =
    coalesce(regexp_extract(s, "(\\d+)", 1).try_cast(LongType), lit(0L))

  private def minusSeconds(refTime: Column, secs: Column): Column =
    (refTime.cast(LongType) - secs).cast(TimestampType)

  /** Divar/generic variant (convert_text_to_date.py:13-40). */
  def textToDateDivar(text: Column, refTime: Column): Column = {
    val s = persianToEnglishDigits(trim(text))
    val n = amountOf(s)
    when(s.contains("لحظاتی پیش"), refTime)
      .when(s.contains("دقایقی پیش"), minusSeconds(refTime, lit(300L)))
      .when(s.contains("روز"), minusSeconds(refTime, n * 86400L))
      .when(s.contains("هفته"), minusSeconds(refTime, n * 7L * 86400L))
      .when(s.contains("ماه"), minusSeconds(refTime, n * 30L * 86400L))
      .when(s.contains("ساعت"), minusSeconds(refTime, n * 3600L))
      .otherwise(refTime)
  }

  /** Kilid variant (kilid_transformer.py:14-36) — note دقیقه branch and
    * null-in → null-out. */
  def textToDateKilid(text: Column, refTime: Column): Column = {
    val s = persianToEnglishDigits(trim(text))
    val n = amountOf(s)
    when(text.isNull || text === "", lit(null).cast(TimestampType))
      .when(s.contains("دقیقه"), minusSeconds(refTime, n * 60L))
      .when(s.contains("ساعت"), minusSeconds(refTime, n * 3600L))
      .when(s.contains("روز"), minusSeconds(refTime, n * 86400L))
      .when(s.contains("هفته"), minusSeconds(refTime, n * 7L * 86400L))
      .when(s.contains("ماه"), minusSeconds(refTime, n * 30L * 86400L))
      .otherwise(refTime)
  }

  /** Sheypoor variant (sheypoor_transformer.py:10-36). */
  def textToDateSheypoor(text: Column, refTime: Column): Column = {
    val s = persianToEnglishDigits(trim(text))
    val hasNum = regexp_extract(s, "(\\d+)", 1) =!= ""
    val n = amountOf(s)
    when(!hasNum && s.contains("لحظاتی پیش"), refTime)
      .when(!hasNum && s.contains("ساعاتی پیش"), minusSeconds(refTime, lit(7200L)))
      .when(!hasNum && s.contains("دقایقی پیش"), minusSeconds(refTime, lit(300L)))
      .when(!hasNum, refTime)
      .when(s.contains("روز"), minusSeconds(refTime, n * 86400L))
      .when(s.contains("هفته"), minusSeconds(refTime, n * 7L * 86400L))
      .when(s.contains("ماه"), minusSeconds(refTime, n * 30L * 86400L))
      .otherwise(refTime)
  }

  /** F16: naive Asia/Tehran wall time → UTC ISO-8601 string with +00:00
    * offset (utils_of_searchengine.py:52-60). Tehran is UTC+03:30 —
    * zone-aware conversion only, never offset arithmetic. */
  def tehranToUtcIso(c: Column): Column =
    when(c.isNull, lit(null).cast(StringType))
      .otherwise(concat(
        date_format(to_utc_timestamp(c, "Asia/Tehran"), "yyyy-MM-dd'T'HH:mm:ss"),
        lit("+00:00")))

  /** F17: watermark adjustment — UTC instant → Tehran wall clock minus a
    * 1-hour safety lag (sql_search_incremental_dag.py:130-133). */
  def utcToTehranMinusLag(c: Column, lagHours: Int = 1): Column =
    from_utc_timestamp(c, "Asia/Tehran") - expr(s"INTERVAL $lagHours HOURS")

  /** F18: property age → approximate Jalali build year
    * (utils_of_searchengine.py:71-91): jyear = gyear − 621;
    * age>30 → jyear−31, age>20 → jyear−21, else the 1404 business
    * constant. `refYear` injects the reference's `datetime.now().year`. */
  def ageToBuildYear(age: Column, refYear: Column): Column = {
    val a = age.cast(StringType).try_cast(IntegerType)
    val jyear = refYear - 621
    when(a.isNull, lit(null).cast(IntegerType))
      .when(a > 30, jyear - 31)
      .when(a > 20, jyear - 21)
      .otherwise(lit(1404))
  }

  /** F20: datetime repair — glue "YYYY-MM-DDHH:MM:SS" and clamp
    * future dates (format_divar_collection.py:38-48,94-101). */
  def repairAndClamp(c: Column, limit: String, reset: String): Column = {
    val repaired = to_timestamp(
      regexp_replace(c.cast(StringType),
        "^(\\d{4}-\\d{2}-\\d{2})(\\d{2}:)", "$1 $2"))
    when(repaired > to_timestamp(lit(limit)), to_timestamp(lit(reset)))
      .otherwise(repaired)
  }
}
