package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Coercions, PersianText, RelativeDates}

/** The reference's flagship workload — the search-engine index query —
  * re-expressed as one lazily-planned DataFrame program
  * (SURVEY.md §3.1; reference SQL at
  * dags/search_engine/sql_search_full_rebuild_dag.py:24-110 and payload
  * transform at :131-160 / utils_of_searchengine.py:118-151).
  *
  * What was 4 Airflow tasks + XCom materialization + SQL Server becomes:
  * filter → EAV pivot aggregate → broadcast dimension joins → payload
  * column expressions → sort, all inside Catalyst. At scale the pivot is
  * a single hash aggregate shuffled on DepositId and every dimension join
  * broadcasts; nothing materializes between stages.
  */
object SearchIndex {

  /** Input tables (FIXTURES.md §1 star schema). */
  final case class Tables(
      deposits: DataFrame,
      customFieldValues: DataFrame,
      customFieldOptions: DataFrame,
      depositCategories: DataFrame,
      baseInfos: DataFrame,
      regions: DataFrame,
      userRoles: DataFrame)

  /** CustomFieldId groups from the reference pivot
    * (sql_search_full_rebuild_dag.py:48-63). */
  val fieldGroups: Seq[(String, Seq[Int])] = Seq(
    "meter" -> Seq(1224, 1225, 1226, 1227, 1228, 1229, 1230, 1231, 1232, 1233,
      1234, 1235, 1236, 1237, 1238, 1239, 1240, 1241, 1242, 1243, 1200, 1167,
      1159, 1117, 1125, 1133, 1174, 1181, 1162, 1150, 1141, 1203, 1261, 1196,
      1188, 1199, 1195, 1260, 1202, 1244, 1245, 1149, 1155, 1158, 1163, 1161),
    "floor" -> Seq(1189, 1142, 1126, 1118, 1134, 1175, 1182, 1168),
    "rooms" -> Seq(1143, 1135, 1127, 1119, 1176, 1169, 1166, 1151, 1197, 1183,
      1190, 1262),
    "age" -> Seq(1136, 1152, 1184, 1191, 1198, 1263, 1170, 1177, 1144, 1120, 1128),
    "parking" -> Seq(1185, 1192, 1171, 1178, 1121, 1129, 1137, 1145),
    "warehouse" -> Seq(1193, 1186, 1179, 1172, 1146, 1138, 1130, 1122),
    "elevator" -> Seq(1123, 1131, 1139, 1147, 1173, 1180, 1187, 1194),
    "loan" -> Seq(1148, 1140, 1132, 1124))

  /** A1: EAV pivot — one hash aggregate producing the 8 wide columns.
    *
    * `numericAwareMax=false` reproduces the reference's
    * MAX-over-string-in-binary-collation behavior; `true` picks the
    * numerically-largest value via max_by (SURVEY §7.4#4: SQL Server
    * collation vs binary order can disagree when a deposit carries
    * multiple values in one group — the flag documents the choice).
    */
  def pivotCustomFields(cfv: DataFrame, cfo: DataFrame,
                        numericAwareMax: Boolean = false): DataFrame = {
    val joined = cfv.join(broadcast(cfo),
        cfv("CustomFieldOptionId") === cfo("Id"), "left")
      .select(cfv("DepositId"), cfv("CustomFieldId"),
        coalesce(cfv("Value"), cfo("Value")).as("v"))
    val aggs = fieldGroups.map { case (name, ids) =>
      val arm = when(col("CustomFieldId").isin(ids: _*), col("v"))
      if (numericAwareMax)
        max_by(arm, arm.try_cast(DoubleType)).as(name)
      else
        max(arm).as(name)
    }
    joined.groupBy("DepositId").agg(aggs.head, aggs.tail: _*)
  }

  /** A2: best (minimum) role per user
    * (sql_search_full_rebuild_dag.py:69-75). */
  def minUserRole(userRoles: DataFrame): DataFrame =
    userRoles.groupBy("UserId").agg(min(col("RoleId")).as("RoleId"))

  /** The relational core: FilteredDeposits → 5 left joins → ORDER BY Id
    * DESC (sql_search_full_rebuild_dag.py:77-110). `watermark` injects
    * `DATEADD(MONTH,-1,GETDATE())` / the incremental bind parameter;
    * dimension joins are broadcast (small dims), the pivot/user
    * aggregates shuffle on their keys.
    */
  /** `statusFilter` mirrors the two DAGs' WHERE clauses: the nightly
    * full rebuild keeps only active rows (StatusId = 1247,
    * sql_search_full_rebuild_dag.py:42) while the hourly incremental
    * keeps everything not deleted (StatusId <> 1254,
    * sql_search_incremental_dag.py:46) and derives active/inactive
    * downstream. */
  def relationalCore(t: Tables, watermark: Column,
                     statusFilter: Column = col("StatusId") === 1247): DataFrame = {
    val d = t.deposits
      .filter(statusFilter && col("ModifiedDate") > watermark)
    val p = pivotCustomFields(t.customFieldValues, t.customFieldOptions)
    val ur = minUserRole(t.userRoles)
    d.join(broadcast(t.depositCategories.select(col("Id").as("dc_Id"), col("Link"))),
        col("DepositCategoryId") === col("dc_Id"), "left")
      .join(broadcast(t.baseInfos.select(col("Id").as("bi_Id"), col("Title").as("bi_Title"))),
        col("PropertyTypeId") === col("bi_Id"), "left")
      .join(broadcast(t.regions.select(col("Id").as("r_Id"), col("Name").as("r_Name"))),
        col("RegionId") === col("r_Id"), "left")
      .join(p, d("Id") === p("DepositId"), "left")
      .join(ur, d("UserId") === ur("UserId"), "left")
      .select(
        d("Id"), d("Title"), d("Description"),
        col("Link").as("DepositCategory"),
        col("bi_Title").as("PropertyType"),
        d("StatusId"),
        ur("RoleId"),
        d("CityId"),
        col("r_Name").as("RegionName"),
        d("CreatedTime"), d("ModifiedDate"), d("MainStreet"),
        d("Price"), d("RentalPrice"),
        col("meter"), col("floor"), col("rooms"), col("age"),
        col("parking"), col("warehouse"), col("elevator"), col("loan"))
      .orderBy(col("Id").desc)
  }

  /** The payload transform (sql_search_full_rebuild_dag.py:131-160):
    * row-wise Python → pure column expressions. Rows whose normalized
    * property type is null are dropped (P7). `refTime`/`refYear` inject
    * the wall clock; `statusOverride` = Some("active") reproduces the
    * full-rebuild literal, None derives from StatusId (incremental,
    * sql_search_incremental_dag.py:190).
    */
  def buildPayload(core: DataFrame, refYear: Column,
                   statusOverride: Option[String] = Some("active")): DataFrame = {
    import Coercions._
    val pt = PersianText.normalizePropertyType(col("PropertyType"))
    core
      .withColumn("property_type", pt)
      .filter(col("property_type").isNotNull)
      .select(
        col("Id").cast(LongType).as("id"),
        col("property_type"),
        strOr(col("DepositCategory")).as("deposit_category"),
        intOr(col("RoleId"), 13L).as("user_role_id"),
        intOr(col("CityId"), 0L).as("city_id"),
        strOr(col("Title")).as("title"),
        RelativeDates.tehranToUtcIso(col("CreatedTime")).as("created_time"),
        RelativeDates.tehranToUtcIso(col("ModifiedDate")).as("modified_time"),
        strOr(col("RegionName")).as("region"),
        intOr(col("Price"), 0L).as("price"),
        intOr(col("RentalPrice"), 0L).as("rental_price"),
        safeInt(col("meter")).as("meter"),
        strOr(col("floor")).as("floor"),
        strOr(col("rooms")).as("rooms"),
        RelativeDates.ageToBuildYear(safeInt(col("age")), refYear).as("age"),
        toBoolTruthy(col("parking")).as("parking"),
        toBoolTruthy(col("warehouse")).as("warehouse"),
        toBoolTruthy(col("elevator")).as("elevator"),
        toBoolTruthy(col("loan")).as("loan"),
        strOr(col("Description")).as("description"),
        statusOverride.map(lit(_)).getOrElse(
          when(col("StatusId") === 1247, "active").otherwise("inactive"))
          .as("status"))
  }

  /** End-to-end: relational core + payload (the nightly full rebuild,
    * one Catalyst plan). */
  def fullRebuild(t: Tables, watermark: Column, refYear: Column): DataFrame =
    buildPayload(relationalCore(t, watermark), refYear, Some("active"))

  /** Hourly incremental: tighter watermark, not-deleted filter (NOT
    * active-only — non-deleted inactive rows are kept and emitted with
    * status 'inactive'), status derived from StatusId
    * (sql_search_incremental_dag.py:46-47,190). */
  def incremental(t: Tables, watermark: Column, refYear: Column): DataFrame =
    buildPayload(
      relationalCore(t, watermark, statusFilter = col("StatusId") =!= 1254),
      refYear, None)

  /** Point lookup: the fetch-deposit-by-id variant of the search query
    * (fetch_deposit_by_id.py:9-73) — the same EAV pivot + dimension
    * joins, filtered to ONE deposit (`d.Id = %s AND d.StatusId = 1247`,
    * no watermark, no user-role join; the reference aliases the
    * dimension LABELS back onto the *Id column names, reproduced here).
    *
    * Spark-first difference from the reference SQL, which pivots the
    * ENTIRE CustomFieldValues table and then left-joins one row: the id
    * predicate is applied to the EAV side BEFORE the pivot, so the scan
    * reads one deposit's rows (PushedFilters on DepositId) — the
    * difference between a point lookup and a full-table aggregate at
    * 100 TB. */
  def depositById(t: Tables, depositId: Int): DataFrame = {
    val d = t.deposits.filter(col("Id") === depositId && col("StatusId") === 1247)
    val p = pivotCustomFields(
      t.customFieldValues.filter(col("DepositId") === depositId),
      t.customFieldOptions)
    d.join(broadcast(t.depositCategories.select(col("Id").as("dc_Id"), col("Link"))),
        col("DepositCategoryId") === col("dc_Id"), "left")
      .join(broadcast(t.baseInfos.select(col("Id").as("bi_Id"), col("Title").as("bi_Title"))),
        col("PropertyTypeId") === col("bi_Id"), "left")
      .join(broadcast(t.regions.select(col("Id").as("r_Id"), col("Name").as("r_Name"))),
        col("RegionId") === col("r_Id"), "left")
      .join(p, d("Id") === p("DepositId"), "left")
      .select(
        d("Id"), d("Title"),
        col("Link").as("DepositCategoryId"),
        col("bi_Title").as("PropertyTypeId"),
        d("CityId"), col("r_Name").as("RegionId"),
        d("Price"), d("RentalPrice"),
        col("meter"), col("floor"), col("rooms"), col("age"),
        col("parking"), col("warehouse"), col("elevator"), col("loan"))
  }

  /** F38: EAV melt — the exact inverse of the pivot
    * (map_divar_data_to_delta.py:242-277): one output row per non-null
    * wide field, Value carried on the value side, CustomFieldOptionId on
    * the option side for option-coded fields.
    */
  /** `carry` columns ride along unchanged (e.g. DepositCategoryId on the
    * star load) so callers don't have to re-join the wide frame — at
    * scale that re-join would recompute the id-assignment pass. */
  def eavMelt(wide: DataFrame, idCol: String,
              fieldToCustomFieldId: Seq[(String, Int)],
              optionCoded: Set[String] = Set.empty,
              carry: Seq[String] = Seq.empty): DataFrame = {
    val entries = fieldToCustomFieldId.map { case (f, cfid) =>
      struct(
        lit(cfid).as("CustomFieldId"),
        (if (optionCoded(f)) col(f).try_cast(IntegerType)
         else lit(null).cast(IntegerType)).as("CustomFieldOptionId"),
        (if (optionCoded(f)) lit(null).cast(StringType)
         else col(f).cast(StringType)).as("Value"))
    }
    val carried = carry.map(col)
    wide.select(col(idCol).as("DepositId") +: explode(array(entries: _*)).as("e")
        +: carried: _*)
      .select(Seq(col("DepositId"), col("e.CustomFieldId"),
        col("e.CustomFieldOptionId"), col("e.Value")) ++ carried: _*)
      .filter(col("Value").isNotNull || col("CustomFieldOptionId").isNotNull)
  }
}
