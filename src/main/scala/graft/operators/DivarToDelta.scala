package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** F31/F32 — the divar→SQL-star load maps
  * (map_divar_data_to_delta.py:69-198): canonical listing values to the
  * star schema's CustomFieldOption ids (floor / age / rooms chips,
  * binary elevator-loan-parking-warehouse ids, category 6/7), plus the
  * surrogate-id and constant-column generation. The age table carries
  * the reference's irregular ids (2214/2224/2234/4883/4884, and 1372 →
  * 1126 with 1125 skipped) verbatim.
  *
  * All lookups are literal maps in codegen'd `element_at` expressions —
  * a broadcast dim join would also work, but these tables are tiny and
  * frozen in the reference source.
  */
object DivarToDelta {

  private def intMap(m: Seq[(String, Int)]): Column =
    map(m.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** floor chip value → option id (py:69-95). */
  val floorMap: Column = intMap(
    Seq("زیرهمکف" -> 1129, "همکف" -> 1130, "بالا تر از 20" -> 1151) ++
      (1 to 20).map(n => n.toString -> (1130 + n)))

  /** Jalali build year → option id (py:102-139); irregular ids ported
    * verbatim. Input is the YEAR (the reference computes 1404 − age
    * first — see [[buildYear]]). */
  val ageYearMap: Column = intMap(Seq(
    "1404" -> 2214, "1403" -> 1098, "1402" -> 1099, "1401" -> 1100,
    "1400" -> 1101, "1399" -> 1102, "1398" -> 1103, "1397" -> 1104,
    "1396" -> 1105, "1395" -> 1106, "1394" -> 1107, "1393" -> 2224,
    "1392" -> 1108, "1391" -> 1109, "1390" -> 1110, "1389" -> 1111,
    "1388" -> 1112, "1387" -> 1113, "1386" -> 1114, "1385" -> 1115,
    "1384" -> 1116, "1383" -> 1117, "1382" -> 1118, "1381" -> 1119,
    "1380" -> 1120, "1379" -> 1121, "1378" -> 2234, "1377" -> 4883,
    "1376" -> 1122, "1375" -> 1123, "1374" -> 1124, "1373" -> 4884,
    "1372" -> 1126, "بیش از 30 سال" -> 1128))

  val roomsMap: Column = intMap(
    Seq("بدون اتاق" -> 1152) ++ (1 to 5).map(n => n.toString -> (1152 + n)))

  /** age in years → Jalali year key for [[ageYearMap]] (py:101). */
  def buildYear(age: Column): Column = (lit(1404) - age).cast(StringType)

  def floorOption(c: Column): Column = element_at(floorMap, c.cast(StringType))
  def ageOption(year: Column): Column = element_at(ageYearMap, year.cast(StringType))
  def roomsOption(c: Column): Column = element_at(roomsMap, c.cast(StringType))
  /** binary feature → option id pairs (py:97-98,141-152). */
  def elevatorOption(c: Column): Column = when(c === 1, 1090).otherwise(1091)
  def loanOption(c: Column): Column = when(c === 1, 1096).otherwise(1097)
  def parkingOption(c: Column): Column = when(c === 1, 1094).otherwise(1095)
  def warehouseOption(c: Column): Column = when(c === 1, 1092).otherwise(1093)
  val categoryMap: Column = intMap(Seq("فروش مسکونی" -> 6, "اجارهٔ مسکونی" -> 7))

  /** Surrogate ids: input-order index + 90001 (py:185, F32; the pandas
    * row index made explicit via a unique order column).
    *
    * NOT a `row_number().over(Window.orderBy(..))` — that plan funnels
    * the whole feed through one partition (WindowExec with no partition
    * spec). Instead: range-partition + sort on the order column, then
    * assign ids from per-partition offsets (`zipWithIndex` = one light
    * count job for partition sizes + one zip pass). Every partition
    * works independently, so the plan survives a 100× scale-up while
    * producing ids identical to the global-window formulation whenever
    * the order column is unique.
    */
  def withSurrogateId(df: DataFrame, orderCol: String, idCol: String = "id",
                      base: Int = 90001): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(col(orderCol)).sortWithinPartitions(orderCol)
    val schema = StructType(
      StructField(idCol, IntegerType, nullable = false) +: sorted.schema.fields)
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      // toIntExact: past ~2.1e9 rows the int surrogate domain is
      // exhausted — fail loudly instead of wrapping negative
      Row.fromSeq(Math.toIntExact(base + i) +: r.toSeq)
    }
    spark.createDataFrame(rows, schema)
  }

  /** Canonical listing frame → the mapped wide star row ready for the
    * F38 melt (SearchIndex.eavMelt): id + constants + option-coded
    * chips. Input columns: orderCol, meter (string), floorRaw, roomsRaw,
    * ageYears (int), elevator/loan/parking/warehouse (0/1), category. */
  def mapDeposits(df: DataFrame, orderCol: String): DataFrame =
    withSurrogateId(df, orderCol).select(
      col("id"),
      lit(1247).as("StatusId"),
      lit(1257).as("PropertyTypeId"),
      element_at(categoryMap, col("category")).as("DepositCategoryId"),
      col("meter").as("Meter"),
      floorOption(col("floorRaw")).as("Floor"),
      roomsOption(col("roomsRaw")).as("Rooms"),
      ageOption(buildYear(col("ageYears"))).as("Age"),
      parkingOption(col("parking")).as("Parking"),
      warehouseOption(col("warehouse")).as("WareHouse"),
      elevatorOption(col("elevator")).as("Elevator"),
      loanOption(col("loan")).as("Loan"))

  // ---- the script's row-fixing helpers (py:7-46)

  /** F22 days-ago extraction (date_and_street_extractor, py:26-41):
    * second whitespace token selects the unit (روز/ماه/هفته, else 0
    * days), first token is the translated count. */
  def daysAgo(c: Column): Column = {
    // try_element_at: a one-token input has no unit (the reference would
    // raise IndexError and abort the job; the engine degrades to 0 days).
    // The outer coalesce makes the 0-day default TOTAL: a recognized
    // unit with an unparseable count (n = null) also yields 0, not null.
    val n = graft.functions.PersianText
      .persianToEnglishDigits(try_element_at(split(c, "\\s+"), lit(1)))
      .try_cast(LongType)
    val unit = try_element_at(split(c, "\\s+"), lit(2))
    coalesce(
      when(unit === "روز", n)
        .when(unit === "ماه", n * 30)
        .when(unit === "هفته", n * 7)
        .otherwise(lit(0L)),
      lit(0L))
  }

  /** F22: CreatedTime = now − days-ago (refTime injected). */
  def createdTimeFrom(c: Column, refTime: Column): Column =
    (refTime.cast(LongType) - daysAgo(c) * 86400L).cast(TimestampType)

  /** F22 street extraction: the text after "، " when present, else a
    * single SPACE (the reference's literal default, py:37-40). */
  def mainStreet(c: Column): Column =
    when(c.contains("،"), try_element_at(split(c, "، "), lit(2)))
      .otherwise(lit(" "))

  /** fix_floor (py:17-23): non-numeric floors — همکف anywhere wins,
    * then "N از M" keeps the pre-از part UN-trimmed. */
  def fixFloor(c: Column): Column = {
    val hamkaf = when(c.contains("همکف"), "همکف").otherwise(c)
    when(hamkaf.contains("از"), element_at(split(hamkaf, "از"), 1))
      .otherwise(hamkaf)
  }

  /** The full load: map + melt into CustomFieldValues rows
    * (py:226-277) — Meter carries Value, everything else the option id.
    * `carry` columns (e.g. DepositCategoryId) ride through the melt so
    * consumers don't re-join `mapped` — which would re-run the
    * id-assignment pass. */
  def toCustomFieldValues(mapped: DataFrame,
                          carry: Seq[String] = Seq.empty): DataFrame =
    SearchIndex.eavMelt(mapped, "id",
      Seq("Meter" -> 1117, "Floor" -> 1118, "Rooms" -> 1119, "Age" -> 1120,
        "Parking" -> 1121, "WareHouse" -> 1122, "Elevator" -> 1123,
        "Loan" -> 1124),
      optionCoded = Set("Floor", "Rooms", "Age", "Parking", "WareHouse",
        "Elevator", "Loan"),
      carry = carry)
}
