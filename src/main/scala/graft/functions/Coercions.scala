package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Python-truthiness-compatible coercions (SURVEY.md §7.4#2 — the
  * reference's `int(x or 0)` family treats 0, "" and None all as
  * missing, which a naive `coalesce` port gets wrong).
  *
  * Reference: sql_search_full_rebuild_dag.py:139-158,
  * utils_of_searchengine.py:64-68.
  */
object Coercions {

  /** Python falsiness for a numeric column: null or 0. (Spark 4's public
    * Column API no longer exposes the expression's DataType, so falsiness
    * is type-explicit: `isFalsyNum` for numerics, `isFalsyStr` for
    * strings — matching how the reference applies `or`-defaults
    * per-field.) */
  def isFalsyNum(c: Column): Column = c.isNull || c === 0

  /** Python falsiness for a string column: null or "". */
  def isFalsyStr(c: Column): Column = c.isNull || c === ""

  /** F24: `int(x or d)` over a numeric field — 0 and null → d. */
  def intOr(c: Column, default: Long): Column =
    when(isFalsyNum(c), lit(default)).otherwise(c).cast(LongType)

  /** F24: `str(x or "")`. */
  def strOr(c: Column, default: String = ""): Column = {
    val s = c.cast(StringType)
    when(isFalsyStr(s), lit(default)).otherwise(s)
  }

  /** F25: `bool(x)` over string-typed fields (the pivot emits strings):
    * null/"" → false, any other string (including "0") → true. */
  def toBoolTruthy(c: Column): Column = !isFalsyStr(c.cast(StringType))

  /** F25: `bool(x)` over numeric fields: null/0 → false. */
  def toBoolTruthyNum(c: Column): Column = !isFalsyNum(c)

  /** F23: safe_int — `int(float(x))` with default on any failure
    * (truncation toward zero, like Python int()). Python's float() parses
    * Unicode decimal digits, so Persian digits are translated first. */
  def safeInt(c: Column, default: Long = 0L): Column =
    coalesce(
      PersianText.persianToEnglishDigits(c.cast(StringType))
        .try_cast(DoubleType).try_cast(LongType),
      lit(default))

  /** F28: sentinel patch — value-level replace
    * (price_prediction_data_pipeline.py:120-121: −1370 → 1369). */
  def replaceValue(c: Column, from: Column, to: Column): Column =
    when(c === from, to).otherwise(c)

  /** F29: count → presence bool (mrestate_transformer.py:144-145). */
  def hasAny(c: Column): Column = coalesce(c > 0, lit(false))
}
