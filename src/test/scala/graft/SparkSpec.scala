package graft

import org.apache.spark.sql.SparkSession

/** One shared SparkSession for the whole forked test JVM. */
object SparkTestSession {
  lazy val get: SparkSession = GraftSession.build("local[4]", 8)
}

trait SparkSpec {
  lazy val spark: SparkSession = SparkTestSession.get
}
