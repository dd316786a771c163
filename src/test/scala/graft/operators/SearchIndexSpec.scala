package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the search-index pipeline's semantics on the FIXTURES.md §1 star:
  * pivot COALESCE + MAX-over-string, left-join null propagation, the P7
  * row drop, truthiness defaults, Tehran→UTC conversion, ORDER BY desc.
  */
class SearchIndexSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val t = SearchIndex.Tables(
    deposits = Seq(
      // id, title, desc, catId, ptypeId, statusId, userId, cityId, regionId, created, modified, street, price, rental
      (1L, "Apt A", "desc A", 6, 100, 1247, "u1", 5, Some(50), ts("2025-06-01 12:00:00"), ts("2025-10-15 08:00:00"), "st", 1000L, 0L),
      (2L, "Joint", "drop me", 6, 101, 1247, "u1", 5, Some(50), ts("2025-06-01 12:00:00"), ts("2025-10-15 08:00:00"), "st", 0L, 0L),
      (3L, "Deleted", "filtered", 6, 100, 1254, "u1", 5, Some(50), ts("2025-06-01 12:00:00"), ts("2025-10-15 08:00:00"), "st", 0L, 0L),
      (4L, "Stale", "filtered", 6, 100, 1247, "u1", 5, Some(50), ts("2025-06-01 12:00:00"), ts("2025-01-01 08:00:00"), "st", 0L, 0L),
      (5L, "Bare", null, 99, 100, 1247, "u9", 0, None, null, ts("2025-10-16 09:00:00"), null, 0L, 7L),
      // neither active (1247) nor deleted (1254): excluded from the full
      // rebuild, KEPT by the incremental as status 'inactive'
      (6L, "Paused", "kept by incremental", 6, 100, 1300, "u1", 5, Some(50), ts("2025-06-01 12:00:00"), ts("2025-10-15 08:00:00"), "st", 0L, 0L),
    ).toDF("Id", "Title", "Description", "DepositCategoryId", "PropertyTypeId",
      "StatusId", "UserId", "CityId", "RegionId", "CreatedTime", "ModifiedDate",
      "MainStreet", "Price", "RentalPrice"),
    customFieldValues = Seq(
      // DepositId, CustomFieldId, CustomFieldOptionId, Value
      (1L, 1224, None: Option[Int], "100"),   // meter via Value
      (1L, 1225, None: Option[Int], "85"),    // second meter row → MAX over strings
      (1L, 1189, Some(7): Option[Int], null),                    // floor via option
      (1L, 1121, None: Option[Int], "1"),     // parking truthy
      (2L, 1224, None: Option[Int], "55"),
    ).toDF("DepositId", "CustomFieldId", "CustomFieldOptionId", "Value"),
    customFieldOptions = Seq((7, "3")).toDF("Id", "Value"),
    depositCategories = Seq((6, "sale-link")).toDF("Id", "Link"),
    baseInfos = Seq((100, "آپارتمان مسکونی"), (101, "مشارکت در ساخت"))
      .toDF("Id", "Title"),
    regions = Seq((50, "Region50")).toDF("Id", "Name"),
    userRoles = Seq(("u1", 5), ("u1", 2), ("u2", 9)).toDF("UserId", "RoleId"))

  private lazy val out: Array[org.apache.spark.sql.Row] =
    SearchIndex.fullRebuild(t,
      watermark = to_timestamp(lit("2025-09-21 00:00:00")),
      refYear = lit(2025)).collect()

  test("row drop + filters + ORDER BY Id DESC") {
    // 2 dropped (مشارکت), 3 dropped (status), 4 dropped (watermark)
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(5L, 1L))
  }

  test("pivot: MAX over strings picks binary-order winner") {
    val r1 = out.find(_.getAs[Long]("id") == 1L).get
    // "85" > "100" lexicographically — documents the collation semantics
    assert(r1.getAs[Long]("meter") === 85L)
    assert(r1.getAs[String]("floor") === "3") // COALESCE fell through to option value
    assert(r1.getAs[Boolean]("parking") === true)
    assert(r1.getAs[Boolean]("elevator") === false) // absent group → null → bool false
  }

  test("defaults: role 13, city 0, empty strings, age bucket constant") {
    val r5 = out.find(_.getAs[Long]("id") == 5L).get
    assert(r5.getAs[Long]("user_role_id") === 13L) // u9 has no role rows
    assert(r5.getAs[Long]("city_id") === 0L)
    assert(r5.getAs[String]("region") === "")
    assert(r5.getAs[String]("description") === "")
    assert(r5.getAs[Long]("rental_price") === 7L)
    assert(r5.getAs[Integer]("age") === 1404) // no EAV rows → safe_int 0 → else-branch
    assert(r5.getAs[String]("created_time") === null)
  }

  test("min role per user + Tehran→UTC created_time") {
    val r1 = out.find(_.getAs[Long]("id") == 1L).get
    assert(r1.getAs[Long]("user_role_id") === 2L)
    // 2025-06-01 12:00 Tehran (+03:30 DST-free) → 08:30 UTC
    assert(r1.getAs[String]("created_time") === "2025-06-01T08:30:00+00:00")
    assert(r1.getAs[String]("status") === "active")
  }

  test("incremental keeps non-deleted inactive rows and derives status") {
    // the incremental WHERE is StatusId <> 1254 (NOT active-only,
    // sql_search_incremental_dag.py:46): row 6 (status 1300) must
    // appear, flagged inactive; the deleted row 3 must not
    val inc = SearchIndex.incremental(t,
      watermark = to_timestamp(lit("2025-09-21 00:00:00")),
      refYear = lit(2025)).collect()
    assert(inc.map(_.getAs[Long]("id")).toSeq === Seq(6L, 5L, 1L))
    val byId = inc.map(r => r.getAs[Long]("id") -> r.getAs[String]("status")).toMap
    assert(byId(6L) === "inactive")
    assert(byId(1L) === "active")
  }

  test("eavMelt inverts the pivot on the 8 wide fields") {
    val wide = Seq((10L, "120", "3")).toDF("DepositId", "meter", "rooms")
    val melted = SearchIndex.eavMelt(wide, "DepositId",
      Seq("meter" -> 1117, "rooms" -> 1119))
    val rows = melted.orderBy("CustomFieldId").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Int]("CustomFieldId") === 1117)
    assert(rows(0).getAs[String]("Value") === "120")
    // melt → pivot round-trip recovers the wide values
    val repivoted = SearchIndex.pivotCustomFields(
      melted, Seq((0, "")).toDF("Id", "Value"))
    val r = repivoted.collect()(0)
    assert(r.getAs[String]("meter") === "120")
    assert(r.getAs[String]("rooms") === "3")
  }

  test("numeric-aware pivot flag picks numeric winner") {
    val p = SearchIndex.pivotCustomFields(t.customFieldValues,
      t.customFieldOptions, numericAwareMax = true)
    val r1 = p.filter(col("DepositId") === 1L).collect()(0)
    assert(r1.getAs[String]("meter") === "100") // 100 > 85 numerically
  }
}
