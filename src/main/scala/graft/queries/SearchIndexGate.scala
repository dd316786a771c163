package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.SearchIndex

/** Puts the flagship search-index pipeline (SURVEY §3.1 — EAV pivot +
  * min-role aggregate + broadcast dims + payload transform + row drop)
  * under the DuckDB oracle gate by deriving the star schema
  * deterministically from the driver's TPC-H tables in BOTH engines:
  *
  *   deposits            ← orders   (status from o_orderstatus, P→deleted)
  *   custom_field_values ← lineitem (line number routes each row into one
  *                                   of the 8 pivot field groups)
  *   deposit_categories  ← region, regions ← nation,
  *   user_roles          ← customer (every 7th user missing → default 13)
  *   base_infos          ← 3 literal property types incl. the مشارکت drop
  *                         case and the زمین canonicalization case
  *
  * The Spark side runs the REAL operator (SearchIndex.fullRebuild), so a
  * pass here certifies the production pipeline end-to-end: Tehran→UTC
  * ISO conversion, truthiness defaults, safe_int, Jalali age buckets,
  * MAX-over-string pivot, watermark filter, ORDER BY Id DESC.
  */
object SearchIndexGate {
  type Q = (SparkSession, String) => DataFrame

  private val Watermark = "1995-06-01 00:00:00"

  /** The deterministic star derivation shared by q50/q56; `statusId`
    * lets each gate pick its status domain. */
  private def starTables(s: SparkSession, dir: String,
                         statusId: org.apache.spark.sql.Column): SearchIndex.Tables = {
    import s.implicits._
    val deposits = Tables.orders(s, dir).select(
      col("o_orderkey").as("Id"),
      col("o_orderpriority").as("Title"),
      col("o_orderstatus").as("Description"),
      (col("o_custkey") % 3).cast(IntegerType).as("DepositCategoryId"),
      (lit(100) + col("o_orderkey") % 3).cast(IntegerType).as("PropertyTypeId"),
      statusId.as("StatusId"),
      col("o_custkey").as("UserId"),
      (col("o_custkey") % 50).cast(IntegerType).as("CityId"),
      (col("o_custkey") % 5).cast(IntegerType).as("RegionId"),
      col("o_orderdate").as("CreatedTime"),
      col("o_orderdate").as("ModifiedDate"),
      lit(null).cast(StringType).as("MainStreet"),
      round(col("o_totalprice")).cast(LongType).as("Price"),
      lit(0L).as("RentalPrice"))
    val groupIds = Seq(1224, 1189, 1143, 1136, 1185, 1193, 1123, 1148)
    val cfv = Tables.lineitem(s, dir).select(
      col("l_orderkey").as("DepositId"),
      element_at(array(groupIds.map(lit(_)): _*),
        (col("l_linenumber") % 8).cast(IntegerType) + 1).as("CustomFieldId"),
      lit(null).cast(IntegerType).as("CustomFieldOptionId"),
      round(col("l_quantity")).cast(LongType).cast(StringType).as("Value"))
    SearchIndex.Tables(
      deposits = deposits,
      customFieldValues = cfv,
      customFieldOptions = Tables.part(s, dir)
        .select(col("p_partkey").cast(IntegerType).as("Id"),
                col("p_brand").as("Value")),
      depositCategories = Tables.region(s, dir)
        .select(col("r_regionkey").as("Id"), col("r_name").as("Link")),
      baseInfos = Seq((100, "آپارتمان مسکونی"), (101, "مشارکت در ساخت"),
        (102, "زمین کشاورزی")).toDF("Id", "Title"),
      regions = Tables.nation(s, dir)
        .select(col("n_nationkey").as("Id"), col("n_name").as("Name")),
      userRoles = Tables.customer(s, dir)
        .filter(col("c_custkey") % 7 =!= 0)
        .select(col("c_custkey").as("UserId"), col("c_nationkey").as("RoleId")))
  }

  def q50SearchIndex(s: SparkSession, dir: String): DataFrame = {
    val t = starTables(s, dir,
      when(col("o_orderstatus") === "P", 1254).otherwise(1247))
    SearchIndex.fullRebuild(t,
        watermark = to_timestamp(lit(Watermark)), refYear = lit(2025))
      .orderBy(col("id").desc)
  }

  /** q56: the hourly INCREMENTAL path (SURVEY §3.1) — three statuses so
    * the not-deleted filter and the active/inactive derivation are both
    * observable: deleted rows ('P'→1254) vanish, non-active rows
    * ('O'→1300) survive flagged inactive. */
  def q56SearchIncremental(s: SparkSession, dir: String): DataFrame = {
    val t = starTables(s, dir,
      when(col("o_orderstatus") === "P", 1254)
        .when(col("o_orderstatus") === "F", 1247).otherwise(1300))
    SearchIndex.incremental(t,
        watermark = to_timestamp(lit(Watermark)), refYear = lit(2025))
      .orderBy(col("id").desc)
  }

  /** q65: the deposit point-lookup variant (fetch_deposit_by_id.py:9-73)
    * on the same star fixtures — the pivot runs over ONE deposit's EAV
    * rows (id predicate pushed below the aggregate; PlanSpec asserts the
    * pushed filter reaches the lineitem scan). */
  def q65DepositById(s: SparkSession, dir: String): DataFrame = {
    val t = starTables(s, dir,
      when(col("o_orderstatus") === "P", 1254).otherwise(1247))
    SearchIndex.depositById(t, 7)
  }

  val queries: Map[String, Q] = Map(
    "q50_search_index" -> (q50SearchIndex _),
    "q56_search_incremental" -> (q56SearchIncremental _),
    "q65_deposit_by_id" -> (q65DepositById _))

  private def starSql(statusCase: String, coreWhere: String,
                      statusExpr: String): String =
    s"""WITH deposits AS (
       |  SELECT o_orderkey Id, o_orderpriority Title, o_orderstatus Description,
       |   cast(o_custkey % 3 as int) DepositCategoryId,
       |   cast(100 + o_orderkey % 3 as int) PropertyTypeId,
       |   $statusCase StatusId,
       |   o_custkey UserId, cast(o_custkey % 50 as int) CityId,
       |   cast(o_custkey % 5 as int) RegionId,
       |   o_orderdate CreatedTime, o_orderdate ModifiedDate,
       |   cast(round(o_totalprice) as bigint) Price
       |  FROM orders),
       |cfv AS (
       |  SELECT l_orderkey DepositId,
       |   CASE cast(l_linenumber % 8 as int)
       |     WHEN 0 THEN 1224 WHEN 1 THEN 1189 WHEN 2 THEN 1143 WHEN 3 THEN 1136
       |     WHEN 4 THEN 1185 WHEN 5 THEN 1193 WHEN 6 THEN 1123 ELSE 1148 END cfid,
       |   cast(cast(round(l_quantity) as bigint) as varchar) v
       |  FROM lineitem),
       |pvt AS (
       |  SELECT DepositId,
       |   max(CASE WHEN cfid = 1224 THEN v END) meter,
       |   max(CASE WHEN cfid = 1189 THEN v END) floor,
       |   max(CASE WHEN cfid = 1143 THEN v END) rooms,
       |   max(CASE WHEN cfid = 1136 THEN v END) age,
       |   max(CASE WHEN cfid = 1185 THEN v END) parking,
       |   max(CASE WHEN cfid = 1193 THEN v END) warehouse,
       |   max(CASE WHEN cfid = 1123 THEN v END) elevator,
       |   max(CASE WHEN cfid = 1148 THEN v END) loan
       |  FROM cfv GROUP BY DepositId),
       |minrole AS (
       |  SELECT c_custkey UserId, min(c_nationkey) RoleId
       |  FROM customer WHERE c_custkey % 7 <> 0 GROUP BY 1),
       |core AS (
       |  SELECT d.*, r.r_name dc_link, n.n_name region_name, ur.RoleId,
       |   CASE d.PropertyTypeId WHEN 100 THEN 'آپارتمان مسکونی'
       |     WHEN 101 THEN 'مشارکت در ساخت' ELSE 'زمین کشاورزی' END bi_title,
       |   p.meter, p.floor, p.rooms, p.age, p.parking, p.warehouse, p.elevator, p.loan
       |  FROM deposits d
       |  LEFT JOIN region r ON d.DepositCategoryId = r.r_regionkey
       |  LEFT JOIN nation n ON d.RegionId = n.n_nationkey
       |  LEFT JOIN pvt p ON d.Id = p.DepositId
       |  LEFT JOIN minrole ur ON d.UserId = ur.UserId
       |  WHERE $coreWhere AND d.ModifiedDate > TIMESTAMP '$Watermark'),
       |payload AS (
       |  SELECT Id id,
       |   CASE WHEN bi_title LIKE '%مشارکت%' THEN NULL
       |        WHEN bi_title LIKE '%زمین%' OR bi_title LIKE '%صنعتی%'
       |          THEN 'باغ باغچه و زمین'
       |        ELSE trim(bi_title) END property_type,
       |   coalesce(dc_link, '') deposit_category,
       |   cast(CASE WHEN RoleId IS NULL OR RoleId = 0 THEN 13 ELSE RoleId END as bigint) user_role_id,
       |   cast(CASE WHEN CityId IS NULL OR CityId = 0 THEN 0 ELSE CityId END as bigint) city_id,
       |   coalesce(Title, '') title,
       |   strftime(timezone('Asia/Tehran', CreatedTime) AT TIME ZONE 'UTC',
       |            '%Y-%m-%dT%H:%M:%S') || '+00:00' created_time,
       |   strftime(timezone('Asia/Tehran', ModifiedDate) AT TIME ZONE 'UTC',
       |            '%Y-%m-%dT%H:%M:%S') || '+00:00' modified_time,
       |   coalesce(region_name, '') region,
       |   cast(CASE WHEN Price IS NULL OR Price = 0 THEN 0 ELSE Price END as bigint) price,
       |   cast(0 as bigint) rental_price,
       |   cast(coalesce(floor(try_cast(meter as double)), 0) as bigint) meter,
       |   coalesce(floor, '') floor,
       |   coalesce(rooms, '') rooms,
       |   cast(CASE WHEN coalesce(floor(try_cast(age as double)), 0) > 30 THEN 1373
       |             WHEN coalesce(floor(try_cast(age as double)), 0) > 20 THEN 1383
       |             ELSE 1404 END as int) age,
       |   (parking IS NOT NULL AND parking <> '') parking,
       |   (warehouse IS NOT NULL AND warehouse <> '') warehouse,
       |   (elevator IS NOT NULL AND elevator <> '') elevator,
       |   (loan IS NOT NULL AND loan <> '') loan,
       |   coalesce(Description, '') description,
       |   $statusExpr status
       |  FROM core)
       |SELECT * FROM payload WHERE property_type IS NOT NULL
       |ORDER BY id DESC""".stripMargin

  val oracles: Map[String, String] = Map(
    "q65_deposit_by_id" ->
      """WITH deposits AS (
        |  SELECT o_orderkey Id, o_orderpriority Title,
        |   cast(o_custkey % 3 as int) DepositCategoryId,
        |   cast(100 + o_orderkey % 3 as int) PropertyTypeId,
        |   CASE WHEN o_orderstatus='P' THEN 1254 ELSE 1247 END StatusId,
        |   cast(o_custkey % 50 as int) CityId,
        |   cast(o_custkey % 5 as int) RegionId,
        |   cast(round(o_totalprice) as bigint) Price,
        |   cast(0 as bigint) RentalPrice
        |  FROM orders),
        |cfv AS (
        |  SELECT l_orderkey DepositId,
        |   CASE cast(l_linenumber % 8 as int)
        |     WHEN 0 THEN 1224 WHEN 1 THEN 1189 WHEN 2 THEN 1143 WHEN 3 THEN 1136
        |     WHEN 4 THEN 1185 WHEN 5 THEN 1193 WHEN 6 THEN 1123 ELSE 1148 END cfid,
        |   cast(cast(round(l_quantity) as bigint) as varchar) v
        |  FROM lineitem WHERE l_orderkey = 7),
        |pvt AS (
        |  SELECT DepositId,
        |   max(CASE WHEN cfid = 1224 THEN v END) meter,
        |   max(CASE WHEN cfid = 1189 THEN v END) floor,
        |   max(CASE WHEN cfid = 1143 THEN v END) rooms,
        |   max(CASE WHEN cfid = 1136 THEN v END) age,
        |   max(CASE WHEN cfid = 1185 THEN v END) parking,
        |   max(CASE WHEN cfid = 1193 THEN v END) warehouse,
        |   max(CASE WHEN cfid = 1123 THEN v END) elevator,
        |   max(CASE WHEN cfid = 1148 THEN v END) loan
        |  FROM cfv GROUP BY DepositId)
        |SELECT d.Id, d.Title, r.r_name DepositCategoryId,
        |  CASE d.PropertyTypeId WHEN 100 THEN 'آپارتمان مسکونی'
        |    WHEN 101 THEN 'مشارکت در ساخت' ELSE 'زمین کشاورزی' END PropertyTypeId,
        |  d.CityId, n.n_name RegionId, d.Price, d.RentalPrice,
        |  p.meter, p.floor, p.rooms, p.age,
        |  p.parking, p.warehouse, p.elevator, p.loan
        |FROM deposits d
        |LEFT JOIN region r ON d.DepositCategoryId = r.r_regionkey
        |LEFT JOIN nation n ON d.RegionId = n.n_nationkey
        |LEFT JOIN pvt p ON d.Id = p.DepositId
        |WHERE d.Id = 7 AND d.StatusId = 1247""".stripMargin,
    "q56_search_incremental" -> starSql(
      statusCase =
        "CASE WHEN o_orderstatus='P' THEN 1254 WHEN o_orderstatus='F' THEN 1247 ELSE 1300 END",
      coreWhere = "d.StatusId <> 1254",
      statusExpr = "CASE WHEN StatusId = 1247 THEN 'active' ELSE 'inactive' END"),
    "q50_search_index" ->
      s"""WITH deposits AS (
         |  SELECT o_orderkey Id, o_orderpriority Title, o_orderstatus Description,
         |   cast(o_custkey % 3 as int) DepositCategoryId,
         |   cast(100 + o_orderkey % 3 as int) PropertyTypeId,
         |   CASE WHEN o_orderstatus='P' THEN 1254 ELSE 1247 END StatusId,
         |   o_custkey UserId, cast(o_custkey % 50 as int) CityId,
         |   cast(o_custkey % 5 as int) RegionId,
         |   o_orderdate CreatedTime, o_orderdate ModifiedDate,
         |   cast(round(o_totalprice) as bigint) Price
         |  FROM orders),
         |cfv AS (
         |  SELECT l_orderkey DepositId,
         |   CASE cast(l_linenumber % 8 as int)
         |     WHEN 0 THEN 1224 WHEN 1 THEN 1189 WHEN 2 THEN 1143 WHEN 3 THEN 1136
         |     WHEN 4 THEN 1185 WHEN 5 THEN 1193 WHEN 6 THEN 1123 ELSE 1148 END cfid,
         |   cast(cast(round(l_quantity) as bigint) as varchar) v
         |  FROM lineitem),
         |pvt AS (
         |  SELECT DepositId,
         |   max(CASE WHEN cfid = 1224 THEN v END) meter,
         |   max(CASE WHEN cfid = 1189 THEN v END) floor,
         |   max(CASE WHEN cfid = 1143 THEN v END) rooms,
         |   max(CASE WHEN cfid = 1136 THEN v END) age,
         |   max(CASE WHEN cfid = 1185 THEN v END) parking,
         |   max(CASE WHEN cfid = 1193 THEN v END) warehouse,
         |   max(CASE WHEN cfid = 1123 THEN v END) elevator,
         |   max(CASE WHEN cfid = 1148 THEN v END) loan
         |  FROM cfv GROUP BY DepositId),
         |minrole AS (
         |  SELECT c_custkey UserId, min(c_nationkey) RoleId
         |  FROM customer WHERE c_custkey % 7 <> 0 GROUP BY 1),
         |core AS (
         |  SELECT d.*, r.r_name dc_link, n.n_name region_name, ur.RoleId,
         |   CASE d.PropertyTypeId WHEN 100 THEN 'آپارتمان مسکونی'
         |     WHEN 101 THEN 'مشارکت در ساخت' ELSE 'زمین کشاورزی' END bi_title,
         |   p.meter, p.floor, p.rooms, p.age, p.parking, p.warehouse, p.elevator, p.loan
         |  FROM deposits d
         |  LEFT JOIN region r ON d.DepositCategoryId = r.r_regionkey
         |  LEFT JOIN nation n ON d.RegionId = n.n_nationkey
         |  LEFT JOIN pvt p ON d.Id = p.DepositId
         |  LEFT JOIN minrole ur ON d.UserId = ur.UserId
         |  WHERE d.StatusId = 1247 AND d.ModifiedDate > TIMESTAMP '$Watermark'),
         |payload AS (
         |  SELECT Id id,
         |   CASE WHEN bi_title LIKE '%مشارکت%' THEN NULL
         |        WHEN bi_title LIKE '%زمین%' OR bi_title LIKE '%صنعتی%'
         |          THEN 'باغ باغچه و زمین'
         |        ELSE trim(bi_title) END property_type,
         |   coalesce(dc_link, '') deposit_category,
         |   cast(CASE WHEN RoleId IS NULL OR RoleId = 0 THEN 13 ELSE RoleId END as bigint) user_role_id,
         |   cast(CASE WHEN CityId IS NULL OR CityId = 0 THEN 0 ELSE CityId END as bigint) city_id,
         |   coalesce(Title, '') title,
         |   strftime(timezone('Asia/Tehran', CreatedTime) AT TIME ZONE 'UTC',
         |            '%Y-%m-%dT%H:%M:%S') || '+00:00' created_time,
         |   strftime(timezone('Asia/Tehran', ModifiedDate) AT TIME ZONE 'UTC',
         |            '%Y-%m-%dT%H:%M:%S') || '+00:00' modified_time,
         |   coalesce(region_name, '') region,
         |   cast(CASE WHEN Price IS NULL OR Price = 0 THEN 0 ELSE Price END as bigint) price,
         |   cast(0 as bigint) rental_price,
         |   cast(coalesce(floor(try_cast(meter as double)), 0) as bigint) meter,
         |   coalesce(floor, '') floor,
         |   coalesce(rooms, '') rooms,
         |   cast(CASE WHEN coalesce(floor(try_cast(age as double)), 0) > 30 THEN 1373
         |             WHEN coalesce(floor(try_cast(age as double)), 0) > 20 THEN 1383
         |             ELSE 1404 END as int) age,
         |   (parking IS NOT NULL AND parking <> '') parking,
         |   (warehouse IS NOT NULL AND warehouse <> '') warehouse,
         |   (elevator IS NOT NULL AND elevator <> '') elevator,
         |   (loan IS NOT NULL AND loan <> '') loan,
         |   coalesce(Description, '') description,
         |   'active' status
         |  FROM core)
         |SELECT * FROM payload WHERE property_type IS NOT NULL
         |ORDER BY id DESC""".stripMargin)
}
