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

  val queries: Map[String, Q] = Map(
    "q41_feed_prepare" -> (q41FeedPrepare _))

  val oracles: Map[String, String] = Map(
    "q41_feed_prepare" ->
      """SELECT doc_id, text, lang,
        | CASE WHEN n_chars = 128 THEN 127 ELSE n_chars END AS n_chars
        |FROM documents WHERE lang = 'en' ORDER BY doc_id""".stripMargin)
}
