package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S8: the kilid listing API sometimes answers XML instead of JSON
  * (kilid_crawler.py:13-33,196-207 — `.//result` elements with
  * id/listingType/propertyType/landuseType children). Parsed here with
  * Spark's native from_xml into the same shape the JSON path produces,
  * so downstream listing logic is format-agnostic.
  */
object XmlFallback {

  private val entrySchema = StructType(Seq(
    StructField("id", StringType),
    StructField("listingType", StringType),
    StructField("propertyType", StringType),
    StructField("landuseType", StringType)))

  // from_xml maps the ROOT element's children to schema fields, so the
  // <response><data><result>* nesting appears explicitly.
  private val responseSchema = StructType(Seq(
    StructField("data", StructType(Seq(
      StructField("result", ArrayType(entrySchema)))))))

  /** Parse a raw listing-page XML payload column into exploded rows
    * (id, listingType, propertyType, landuseType); entries without an id
    * are dropped exactly like the reference. */
  def parseListingXml(raw: DataFrame, xmlCol: String): DataFrame = {
    val parsed = raw.withColumn("__x", from_xml(col(xmlCol), responseSchema))
    parsed
      .select(explode(coalesce(col("__x.data.result"),
        array().cast(ArrayType(entrySchema)))).as("r"))
      .select(col("r.id").as("id"), col("r.listingType").as("listingType"),
        col("r.propertyType").as("propertyType"),
        col("r.landuseType").as("landuseType"))
      .filter(col("id").isNotNull && col("id") =!= "")
  }
}
