package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** HNSW graph ANN: per-shard graph build + capped beam search +
  * merged exact re-rank. The index is DETERMINISTIC by construction
  * (hash-derived levels, id-ordered insertion, id-tie-broken heaps),
  * so recall and budgets pin exactly. */
class HnswSpec extends AnyFunSuite with SparkSpec {

  // 4 well-separated clusters in 8 dims: cluster c's members sit at
  // 10·e_c plus a small deterministic jitter — nearest neighbors of
  // any member are exactly its cluster-mates
  private def clustered(n: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      val c = i % 4
      val v = Array.fill(8)(0f)
      v(c) = 10f
      v((c + 4) % 8) = (i / 4 % 7).toFloat * 0.1f
      (i.toLong, v)
    }

  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y }.sum

  private def exactTopK(data: Seq[(Long, Array[Float])],
                        q: Array[Float], qid: Long, k: Int): Seq[Long] =
    data.filter(_._1 != qid)
      .map { case (id, v) => (dot(q, v), id) }
      .sortBy { case (d, id) => (-d, id) }
      .take(k).map(_._2)

  test("single index: generous beam returns the exact top-k") {
    val data = clustered(120)
    val idx = new Hnsw.Index(m = 6, efConstruction = 32)
    data.foreach { case (id, v) => idx.insert(id, v) }
    data.take(12).foreach { case (qid, qv) =>
      val (got, visited) = idx.search(qv, 6, efSearch = 120, maxVisits = 0)
      val gotIds = got.map(_._1).filter(_ != qid).take(5)
      assert(gotIds.toSet === exactTopK(data, qv, qid, 5).toSet,
        s"query $qid")
      assert(visited <= 120)
    }
  }

  test("the visited-node cap binds: search cost is bounded, not corpus-sized") {
    val data = clustered(400)
    val idx = new Hnsw.Index(m = 6, efConstruction = 24)
    data.foreach { case (id, v) => idx.insert(id, v) }
    val (_, visited) = idx.search(data(7)._2, 5, efSearch = 16, maxVisits = 32)
    assert(visited <= 32, s"cap violated: $visited")
    // and the capped search still lands in the right cluster
    val (got, _) = idx.search(data(7)._2, 5, efSearch = 16, maxVisits = 32)
    assert(got.map(_._1).forall(id => id % 4 == 7 % 4),
      s"capped search left the cluster: ${got.map(_._1)}")
  }

  test("deterministic: two independent builds answer identically") {
    val data = clustered(200)
    def run(): Seq[(Long, Double)] = {
      val idx = new Hnsw.Index(m = 8, efConstruction = 48)
      data.foreach { case (id, v) => idx.insert(id, v) }
      idx.search(data(33)._2, 10, efSearch = 24, maxVisits = 64)._1
    }
    assert(run() === run())
  }

  test("distributed annTopK: shard + merge finds the cluster-exact top-k") {
    import spark.implicits._
    val data = clustered(240)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.filter("vec_id < 8")
    val got = Hnsw.annTopK(df, "vec_id", "embedding", queries, k = 5,
      partitions = 4, m = 6, efConstruction = 32, efSearch = 48,
      maxVisits = 128)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    (0 until 8).foreach { q =>
      val expected = exactTopK(data, data(q)._2, q.toLong, 5)
      assert(got(q.toLong) === expected, s"query $q")
    }
  }

  test("dump/restore round-trips the graph exactly") {
    val data = clustered(150)
    val idx = new Hnsw.Index(m = 6, efConstruction = 32)
    data.foreach { case (id, v) => idx.insert(id, v) }
    // restore from a SHUFFLED dump: neighbor lists carry ids, so row
    // order must not matter
    val dumped = scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle(idx.dump())
    val back = Hnsw.restore(dumped, m = 6, efConstruction = 32)
    data.take(10).foreach { case (qid, qv) =>
      assert(back.search(qv, 5, 40, 64) === idx.search(qv, 5, 40, 64),
        s"query $qid")
    }
  }

  test("inserting into a restored graph continues it") {
    val data = clustered(160)
    val (seed, rest) = data.splitAt(100)
    val idx = new Hnsw.Index(m = 6, efConstruction = 32)
    seed.foreach { case (id, v) => idx.insert(id, v) }
    val back = Hnsw.restore(idx.dump(), m = 6, efConstruction = 32)
    rest.foreach { case (id, v) => back.insert(id, v) }
    data.take(8).foreach { case (qid, qv) =>
      val got = back.search(qv, 6, efSearch = 160, maxVisits = 0)
        ._1.map(_._1).filter(_ != qid).take(5)
      assert(got.toSet === exactTopK(data, qv, qid, 5).toSet, s"query $qid")
    }
  }

  test("persisted segments: append never touches the base, search merges all") {
    import spark.implicits._
    val data = clustered(240)
    val (base, batch) = data.splitAt(200)
    val path = java.nio.file.Files.createTempDirectory("hnsw_seg_").toString + "/idx"
    Hnsw.buildIndex(base.toDF("vec_id", "embedding"), "vec_id", "embedding",
      path, segments = 3, m = 6, efConstruction = 32)
    val baseBytes = spark.read.parquet(path).filter("seg < 3").count()
    Hnsw.appendBatch(path, batch.toDF("vec_id", "embedding"),
      "vec_id", "embedding", m = 6, efConstruction = 32)
    assert(spark.read.parquet(path).select("seg").distinct().count() === 4L)
    assert(spark.read.parquet(path).filter("seg < 3").count() === baseBytes)
    // a batch-only neighbor must be findable through the merged search
    val got = Hnsw.searchIndex(spark, path,
      data.take(8).toDF("vec_id", "embedding"), "vec_id", "embedding",
      k = 5, m = 6, efConstruction = 32, efSearch = 48, maxVisits = 128)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    (0 until 8).foreach { q =>
      assert(got(q.toLong) === exactTopK(data, data(q)._2, q.toLong, 5),
        s"query $q")
    }
  }

  test("filtered search: only allowed ids surface; low selectivity doesn't collapse") {
    // distinct dots (jitter injective-ish in i): an all-ties corpus
    // degenerates the hill-climb and tests nothing but tie-breaks
    val data = (0 until 400).map { i =>
      val c = i % 4
      val v = Array.fill(8)(0f)
      v(c) = 10f
      v((c + 4) % 8) = ((i * 37) % 101 + 1).toFloat * 0.01f
      (i.toLong, v)
    }
    val idx = new Hnsw.Index(m = 6, efConstruction = 32)
    data.foreach { case (id, v) => idx.insert(id, v) }
    // allow ~5% of nodes (id % 20 == 0) — a post-filtered top-ef would
    // keep ~0.05·ef ≈ 1 allowed row; the traverse-through walk must
    // still assemble a full top-5 of allowed ids
    val allow: Int => Boolean = n => n % 20 == 0 // ordinal == id here
    data.take(8).foreach { case (qid, qv) =>
      val (got, visited) = idx.searchFiltered(qv, 5, efSearch = 48,
        maxVisits = 400, allow)
      assert(got.nonEmpty && got.forall(_._1 % 20 == 0),
        s"query $qid surfaced a disallowed id: $got")
      assert(got.size === 5, s"query $qid: filtered top-5 collapsed to ${got.size}")
      // v50's floor against the restricted exact reference: the beam is
      // approximate, so demand ≥ 3/5 overlap per query (deterministic —
      // this either always holds or never does)
      val exact = exactTopK(data.filter(_._1 % 20 == 0), qv, qid, 5)
      val overlap = got.map(_._1).filter(_ != qid)
        .count(exact.toSet.contains)
      assert(overlap >= 3, s"query $qid: filtered overlap $overlap/5, " +
        s"got=${got.map(_._1)}, exact=$exact")
      assert(visited <= 400)
    }
    // the cap still binds under filtering
    val (_, v2) = idx.searchFiltered(data.head._2, 5, efSearch = 48,
      maxVisits = 64, allow)
    assert(v2 <= 64)
  }

  test("filteredAnnTopK: distributed filtered walk matches the restricted exact top-k") {
    import spark.implicits._
    val data = clustered(240)
    val df = data.toDF("id", "vec")
    val queries = df.filter(org.apache.spark.sql.functions.col("id") < 8)
    val got = Hnsw.filteredAnnTopK(df, "id", "vec", queries, k = 3,
      allowed = org.apache.spark.sql.functions.expr("id % 2 = 0"),
      partitions = 2, m = 6, efConstruction = 32, efSearch = 24,
      maxVisits = 240)
      .collect().groupBy(_.getLong(0))
    val allowedData = data.filter(_._1 % 2 == 0)
    (0L until 8L).foreach { qid =>
      val rows = got(qid).sortBy(_.getAs[Int]("rank"))
      assert(rows.forall(_.getAs[Long]("neighbor_id") % 2 == 0),
        s"query $qid surfaced a disallowed neighbor")
      val exact = exactTopK(allowedData, data(qid.toInt)._2, qid, 3)
      assert(rows.map(_.getAs[Long]("neighbor_id")).toSeq === exact,
        s"query $qid")
    }
  }

  test("tombstone deletes: excluded from search, purged by compaction, appends unaffected") {
    import spark.implicits._
    val data = clustered(160)
    val path = java.nio.file.Files
      .createTempDirectory("graft_hnsw_del_").resolve("idx").toString
    val df = data.toDF("id", "vec")
    Hnsw.buildIndex(df, "id", "vec", path, segments = 2)
    val queries = df.filter(org.apache.spark.sql.functions.col("id") < 4)
    def ids(): Set[Long] = Hnsw.searchIndex(spark, path, queries,
        "id", "vec", k = 5, efSearch = 64, maxVisits = 160)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    val before = ids()
    // delete every 4th id — cluster-mates of every query
    val dead = (0L until 160L).filter(_ % 4 == 0)
    Hnsw.deleteFromIndex(spark, path, dead)
    assert(Hnsw.tombstonesOf(spark, path) === dead.toSet)
    val after = ids()
    assert(after.nonEmpty && !after.exists(_ % 4 == 0),
      s"tombstoned ids surfaced: ${after.filter(_ % 4 == 0)}")
    // deleting twice is a no-op; appends still land
    Hnsw.deleteFromIndex(spark, path, Seq(0L))
    Hnsw.appendBatch(path, Seq((500L, data(1)._2)).toDF("id", "vec"),
      "id", "vec")
    assert(ids().contains(500L) || !ids().exists(_ % 4 == 0))
    // compaction purges: sidecar gone, rows shrunk, exclusions stand
    val rowsBefore = spark.read.parquet(path).count()
    Hnsw.compactIndex(spark, path, segments = 2)
    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$path/_tombstones")))
    assert(spark.read.parquet(path).count() < rowsBefore)
    assert(!ids().exists(_ % 4 == 0))
    assert(before.exists(_ % 4 == 0),
      "fixture sanity: pre-delete results did include later-dead ids")
  }

  test("tiered compaction: small segments merge, settled files carry " +
      "by inode, tombstones purge per segment") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, input_file_name}
    val data = clustered(240)
    val path = java.nio.file.Files
      .createTempDirectory("graft_hnsw_tier_").resolve("idx").toString
    // 2 big base segments (120 rows each) + 2 small appended (12 each)
    Hnsw.buildIndex(data.toDF("id", "vec"), "id", "vec", path, segments = 2)
    Hnsw.appendBatch(path,
      (1000L until 1012L).map(i => (i, data((i % 240).toInt)._2))
        .toDF("id", "vec"), "id", "vec")
    Hnsw.appendBatch(path,
      (2000L until 2012L).map(i => (i, data((i % 240).toInt)._2))
        .toDF("id", "vec"), "id", "vec")
    // deletes in BOTH worlds: base-segment ids stay tombstoned, the
    // merged tier's purge physically
    Hnsw.deleteFromIndex(spark, path, Seq(8L, 1000L, 2000L))
    def ino(p: java.nio.file.Path): Long = java.nio.file.Files
      .getAttribute(p, "unix:ino").asInstanceOf[Long]
    def baseFiles(): Map[String, Long] =
      spark.read.parquet(path).filter(col("seg") < 2)
        .select(input_file_name()).distinct().collect()
        .map(r => java.nio.file.Paths.get(
          new java.net.URI(r.getString(0)).getPath))
        .map(p => p.getFileName.toString -> ino(p)).toMap
    val before = baseFiles()
    val (merged, kept) = Hnsw.compactIndexTiered(spark, path)
    assert(merged === Set(2, 3) && kept === Set(0, 1))
    val after = baseFiles()
    assert(before.keySet.subsetOf(after.keySet) &&
      before.forall { case (n, i) => after(n) == i },
      "settled segments must hard-link through")
    val segs = spark.read.parquet(path).select("seg").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(segs === Set(0, 1, 4))
    // merged dead ids physically gone; base tombstone survives
    val idsNow = spark.read.parquet(path).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(!idsNow.contains(1000L) && !idsNow.contains(2000L))
    assert(idsNow.contains(8L), "base rows stay in their graph")
    assert(Hnsw.tombstonesOf(spark, path) === Set(8L))
    // search: appended survivors reachable, dead never surface
    val res = Hnsw.searchIndex(spark, path,
      Seq((0L, data(8)._2)).toDF("id", "vec"), "id", "vec",
      k = 8, efSearch = 64, maxVisits = 240)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(!res.contains(8L) && !res.contains(1000L) && !res.contains(2000L))
    // a second pass finds nothing mergeable (one clean merged segment)
    assert(Hnsw.compactIndexTiered(spark, path)._1 === Set.empty[Int])
    // a lone small segment WITH tombstones still compacts (purge)
    Hnsw.deleteFromIndex(spark, path, Seq(1001L))
    val (m3, _) = Hnsw.compactIndexTiered(spark, path)
    assert(m3 === Set(4), s"tombstoned small segment must purge, got $m3")
    assert(!spark.read.parquet(path).select("id").collect()
      .map(_.getLong(0)).toSet.contains(1001L))
    assert(Hnsw.tombstonesOf(spark, path) === Set(8L))
  }

  test("annTopK budget: emitted visited counts never exceed the cap") {
    import spark.implicits._
    val data = clustered(240)
    val df = data.toDF("vec_id", "embedding")
    val rows = Hnsw.annTopK(df, "vec_id", "embedding",
      df.filter("vec_id < 4"), k = 3,
      partitions = 3, m = 4, efConstruction = 16, efSearch = 8,
      maxVisits = 20).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("visited") <= 20),
      rows.map(_.getAs[Int]("visited")).max.toString)
  }
}
