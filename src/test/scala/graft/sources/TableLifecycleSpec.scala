package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Versioned

/** Cross-feature lifecycle torture: ONE table driven through every
  * table-format feature in sequence — the interaction paths no
  * single-feature spec walks. Every step asserts full row content, so
  * a feature silently corrupting another's state fails here even if
  * both features' own suites stay green. */
class TableLifecycleSpec extends AnyFunSuite with SparkSpec {

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft_lifecycle_spec_").toString
    spark.conf.set("spark.sql.catalog.lc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.lc.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lc.ns")
    w
  }

  private def rows(sql: String): Seq[String] =
    spark.sql(sql).collect().map(_.toString).sorted.toSeq

  test("full-option table: tag, rename, DV delete, zorder, CDF, clone, retain") {
    warehouse
    val t = "lc.ns.life"
    val root = s"$warehouse/ns/life"
    spark.sql(s"CREATE TABLE $t (id BIGINT, grp BIGINT, val BIGINT) " +
      "USING `graft-versioned` TBLPROPERTIES (" +
      "'changeFeedKeys'='id', 'deletionVectors'='true', " +
      "'clusterBy'='id', 'writePartitions'='4', " +
      "'bloomFilterColumns'='id')")
    spark.sql(s"INSERT INTO $t SELECT id, id % 10, id * 2 FROM range(0, 1000)")   // v=0
    spark.sql(s"INSERT INTO $t SELECT id, id % 10, id * 2 FROM range(1000, 2000)") // v=1
    spark.sql(s"CALL lc.sys.tag(table => 'ns.life', name => 'train-v1')")

    // RENAME under a tag: the mapping is table-level, so the tagged
    // snapshot must read back under the NEW logical name
    spark.sql(s"ALTER TABLE $t RENAME COLUMN val TO score")
    assert(rows(s"SELECT id, score FROM $t VERSION AS OF 'train-v1' WHERE id < 3")
      === Seq("[0,0]", "[1,2]", "[2,4]"))

    // DV DELETE over the renamed column: predicate on the NEW name,
    // positions recorded, no rewrite of clustered files
    val preFiles = Versioned.dataFiles(Paths.get(root, "v=1"))
      .map(_.getFileName.toString).toSet
    spark.sql(s"DELETE FROM $t WHERE score % 4 = 0")                               // v=2
    val postFiles = Versioned.dataFiles(Paths.get(root, "v=2"))
      .map(_.getFileName.toString).toSet
    assert(postFiles === preFiles, "a DV DELETE must not rewrite data files")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 1000L)
    // protocol earned both flags along the way
    assert(Versioned.readerFeatures(root)
      === Set("deletion-vectors", "column-mapping"))

    // the tagged snapshot still shows the PRE-delete rows
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 'train-v1'")
      .collect()(0).getLong(0) === 2000L)

    // Z-order compact materializes the DVs away; rows unchanged
    spark.sql("CALL lc.sys.compact(table => 'ns.life', " +
      "zorder_by => 'grp,score')")                                                 // v=3
    assert(graft.operators.DeletionVectors
      .dvMap(Paths.get(root, "v=3")).isEmpty, "compact must materialize DVs")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 1000L)
    assert(rows(s"SELECT id, grp, score FROM $t WHERE id IN (1, 2, 5)")
      === Seq("[1,1,2]", "[5,5,10]")) // id=2 (score 4) died in the DELETE

    // the stored change feed carries the whole story; the batch CDF
    // range read of the DELETE commit shows ONLY removals
    val cdf = spark.read.format("graft-versioned")
      .option("changeFeed", "true")
      .option("startingVersion", "2").option("endingVersion", "2")
      .load(root)
    assert(cdf.where("change_type <> 'removed'").isEmpty)
    assert(cdf.count() === 1000L)

    // clone: carries constraints/colmap/protocol; fresh history
    spark.sql("CALL lc.sys.clone(source => 'ns.life', target => 'ns.life2')")
    assert(rows("SELECT id, score FROM lc.ns.life2 WHERE id < 3")
      === rows(s"SELECT id, score FROM $t WHERE id < 3"))
    assert(Versioned.readerFeatures(s"$warehouse/ns/life2")
      === Set("deletion-vectors", "column-mapping"))

    // retention: everything old dies EXCEPT the tagged training snapshot
    spark.sql("CALL lc.sys.retain(table => 'ns.life', keep => 1)")
    assert(Versioned.versions(root) === Seq(1L, 3L))
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 'train-v1'")
      .collect()(0).getLong(0) === 2000L)
    // and the current snapshot is still exactly the post-delete content
    assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0).getLong(0) === 1000L)
  }

  test("converted table joins the lifecycle: evolve, mutate, stream, tag") {
    warehouse
    import spark.implicits._
    val src = Paths.get(warehouse, "convert_src_life")
    (0L until 500L).map(i => (i, i % 7)).toDF("id", "grp")
      .repartition(2).write.parquet(src.toString)
    spark.sql(s"CALL lc.sys.convert(source_dir => '$src', target => 'ns.conv')")
    val t = "lc.ns.conv"
    // evolution on converted files
    spark.sql(s"ALTER TABLE $t ADD COLUMN note STRING")
    spark.sql(s"INSERT INTO $t VALUES (9999, 0, 'fresh')")                        // v=1
    assert(rows(s"SELECT id, note FROM $t WHERE id IN (1, 9999)")
      === Seq("[1,null]", "[9999,fresh]"))
    spark.sql(s"ALTER TABLE $t RENAME COLUMN grp TO bucket")
    // mutation across converted + fresh files
    spark.sql(s"UPDATE $t SET note = 'touched' WHERE id = 1")                     // v=2
    assert(rows(s"SELECT id, bucket, note FROM $t WHERE id IN (1, 9999)")
      === Seq("[1,1,touched]", "[9999,0,fresh]"))
    // tag + the table itself as a stream from the tagged snapshot's version
    spark.sql("CALL lc.sys.tag(table => 'ns.conv', name => 'onboarded', version => 0)")
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 'onboarded'")
      .collect()(0).getLong(0) === 500L)
    val ckpt = Files.createTempDirectory("lc_stream_").toString
    val q = spark.readStream.format("graft-versioned")
      .load(s"$warehouse/ns/conv")
      .writeStream.format("memory").queryName("lc_conv_stream")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table("lc_conv_stream").count() === 501L)
  }
}
