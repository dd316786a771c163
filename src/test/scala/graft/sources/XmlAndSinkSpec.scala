package graft.sources

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.BatchedSink

/** S8 XML fallback + S12 batched sink + SQL extension registration. */
class XmlAndSinkSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("kilid XML listing payload parses to the JSON-path shape (S8)") {
    val xml =
      """<response><data>
        |  <result><id>101</id><listingType>BUY</listingType>
        |    <propertyType>RESIDENTIAL</propertyType><landuseType>APARTMENT</landuseType></result>
        |  <result><id>102</id><listingType>RENT</listingType></result>
        |  <result><listingType>BUY</listingType></result>
        |</data></response>""".stripMargin
    val out = XmlFallback.parseListingXml(Seq(xml).toDF("raw"), "raw")
      .orderBy("id").collect()
    assert(out.length === 2) // id-less entry dropped like the reference
    assert(out(0).getAs[String]("id") === "101")
    assert(out(0).getAs[String]("landuseType") === "APARTMENT")
    assert(out(1).getAs[String]("id") === "102")
    assert(out(1).getAs[String]("propertyType") === null)
  }

  test("malformed XML yields zero rows, not an exception") {
    val out = XmlFallback.parseListingXml(Seq("<not-xml").toDF("raw"), "raw")
    assert(out.count() === 0)
  }

  test("BatchedSink slices partitions into transport batches of N (S12)") {
    XmlAndSinkSpec.recorded.clear()
    val df = spark.range(0, 25).toDF("id").repartition(2)
    BatchedSink.send(df, (pid, batch, rows) => {
      XmlAndSinkSpec.recorded.add((pid, batch, rows.size)); ()
    }, batchSize = 10)
    import scala.jdk.CollectionConverters._
    val batches = XmlAndSinkSpec.recorded.asScala.toSeq
    assert(batches.map(_._3).sum === 25)
    assert(batches.forall(_._3 <= 10))
    // every partition numbered its batches from 0 upward
    batches.groupBy(_._1).foreach { case (_, bs) =>
      assert(bs.map(_._2).sorted === (0L until bs.size).toSeq)
    }
  }

  test("failing transport propagates (raise_for_status semantics)") {
    val df = spark.range(0, 5).toDF("id")
    val e = intercept[Exception] {
      BatchedSink.send(df, (_, _, _) => throw new RuntimeException("http 500"), 2)
    }
    assert(e.getMessage != null)
  }

  test("GraftExtensions registers SQL functions (dot_e6, quantize_e6)") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT dot_e6(quantize_e6(array(cast(1.0 as float), cast(2.0 as float))), " +
      "quantize_e6(array(cast(0.5 as float), cast(0.5 as float)))) AS d")
      .collect()(0)
    assert(r.getLong(0) === 1500000000000L)
  }
}

/** JVM-static recorder — foreachPartition closures are serialized even in
  * local mode, so instance state would be a copy. */
object XmlAndSinkSpec {
  val recorded = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int)]()
}
