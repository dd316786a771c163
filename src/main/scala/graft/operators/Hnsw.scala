package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HNSW graph ANN (Malkov & Yashunin, "Efficient and robust approximate
  * nearest neighbor search using Hierarchical Navigable Small World
  * graphs", IEEE TPAMI 2018) — the modern recall/latency frontier
  * beyond the IVF/PQ family ([[Ann]], [[Pq]]).
  *
  * DISTRIBUTED SHAPE (the part Spark owns): vectors hash-partition into
  * P independent sub-graphs; each executor builds its partition's HNSW
  * in memory (`mapPartitions` — build is O(n·log n·ef) per partition
  * and embarrassingly parallel across partitions); a search fans the
  * broadcast query set out to every sub-graph and merges the per-shard
  * top-k with one window — the shard-and-merge layout every production
  * vector store uses. Nothing is ever all-pairs: per query the visited
  * set is HARD-CAPPED by `maxVisits`, so search cost is
  * O(P · maxVisits · d) regardless of corpus size.
  *
  * DETERMINISM: level assignment derives from a hash of the vector id
  * (not a RNG), insertion order is ascending id within a partition, and
  * every heap tie-breaks on id — two runs build identical graphs and
  * return identical results, which is what lets the spec pin recall
  * exactly.
  *
  * Similarity is DOT PRODUCT (higher = closer), matching the engine's
  * brute-force reference ([[graft.queries.Vectors.bruteForceTopK]]);
  * candidate re-ranking uses the same quantized e6 integer dots as the
  * reference so merged ranking agrees with it wherever the candidate
  * sets agree. */
object Hnsw {

  /** One partition's in-memory index. `m` = max links per node per
    * layer (2m on layer 0), `efConstruction` = build-time beam. */
  final class Index(m: Int, efConstruction: Int) extends Serializable {
    require(m >= 2 && efConstruction >= m,
      s"hnsw: need m >= 2 and efConstruction >= m, got m=$m ef=$efConstruction")

    private val mL = 1.0 / math.log(m.toDouble)
    private val ids = mutable.ArrayBuffer.empty[Long]
    private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
    // links(node)(level) = neighbor node indices
    private val links = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
    private var entry = -1
    private var topLevel = -1

    def size: Int = ids.length

    private def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
      s
    }

    /** Deterministic "random" level: hash(id) → uniform (0,1] →
      * floor(-ln(u)·mL) — the paper's geometric distribution without a
      * run-order-dependent RNG. */
    private def levelOf(id: Long): Int = {
      val h = scala.util.hashing.byteswap64(id) >>> 11 // 53 usable bits
      val u = (h + 1).toDouble / (1L << 53).toDouble // (0, 1]
      math.floor(-math.log(u) * mL).toInt
    }

    /** Greedy descent on one layer from `start`: hill-climb to the
      * local dot-product maximum. Returns the best node. */
    private def greedy(q: Array[Float], start: Int, level: Int): Int = {
      var cur = start
      var curDot = dot(q, vecs(cur))
      var improved = true
      while (improved) {
        improved = false
        val ns = links(cur)(level)
        var i = 0
        while (i < ns.length) {
          val n = ns(i)
          val d = dot(q, vecs(n))
          if (d > curDot || (d == curDot && ids(n) < ids(cur))) {
            cur = n; curDot = d; improved = true
          }
          i += 1
        }
      }
      cur
    }

    /** Beam search on one layer: best-first expansion from `start`,
      * beam width `ef`, visited set capped at `maxVisits` (0 = no
      * cap). Returns (candidates best-first, nodes visited). */
    private def searchLayer(q: Array[Float], start: Int, level: Int,
                            ef: Int, maxVisits: Int): (mutable.ArrayBuffer[(Double, Int)], Int) = {
      // max-heap of frontier by dot; min-heap of results (keep best ef)
      implicit val byDotDesc: Ordering[(Double, Int)] =
        Ordering.by[(Double, Int), (Double, Long)] { case (d, n) => (d, -ids(n)) }
      val frontier = mutable.PriorityQueue.empty[(Double, Int)]
      val results = mutable.PriorityQueue.empty[(Double, Int)](byDotDesc.reverse)
      val visited = mutable.HashSet.empty[Int]
      val d0 = dot(q, vecs(start))
      frontier.enqueue((d0, start)); results.enqueue((d0, start))
      visited += start
      while (frontier.nonEmpty &&
        (maxVisits <= 0 || visited.size < maxVisits)) {
        val (d, node) = frontier.dequeue()
        // frontier best is worse than the ef-th result → done
        if (results.size >= ef && d < results.head._1) frontier.clear()
        else {
          val ns = links(node)(level)
          var i = 0
          while (i < ns.length) {
            val n = ns(i)
            if (!visited.contains(n) &&
                (maxVisits <= 0 || visited.size < maxVisits)) {
              visited += n
              val dn = dot(q, vecs(n))
              if (results.size < ef || dn > results.head._1) {
                frontier.enqueue((dn, n))
                results.enqueue((dn, n))
                if (results.size > ef) results.dequeue()
              }
            }
            i += 1
          }
        }
      }
      (results.dequeueAll.reverse.to(mutable.ArrayBuffer), visited.size)
    }

    /** FILTERED beam search — the standard filtered-HNSW recipe
      * (Lucene/Weaviate): the walk TRAVERSES every node (disallowed
      * nodes keep the graph connected and keep guiding the beam toward
      * the query's neighborhood) but only `allow`ed nodes may enter
      * the RESULT set. The naive alternative — post-filtering an
      * unfiltered top-ef — collapses at low selectivity: a 1% filter
      * leaves ~0.01·ef allowed answers. Traverse-through keeps
      * expanding until ef ALLOWED results exist (or the visited cap
      * trips), so recall holds and cost stays hard-bounded; callers
      * scale `maxVisits` by ~1/selectivity for the same reason IVF
      * probes widen. Kept separate from [[searchLayer]] so the
      * unfiltered path's pinned numbers (v50/v51) stay byte-identical. */
    private def searchLayerFiltered(q: Array[Float], start: Int, level: Int,
                                    ef: Int, maxVisits: Int,
                                    allow: Int => Boolean)
        : (mutable.ArrayBuffer[(Double, Int)], Int) = {
      implicit val byDotDesc: Ordering[(Double, Int)] =
        Ordering.by[(Double, Int), (Double, Long)] { case (d, n) => (d, -ids(n)) }
      val frontier = mutable.PriorityQueue.empty[(Double, Int)]
      val results = mutable.PriorityQueue.empty[(Double, Int)](byDotDesc.reverse)
      val visited = mutable.HashSet.empty[Int]
      val d0 = dot(q, vecs(start))
      frontier.enqueue((d0, start))
      if (allow(start)) results.enqueue((d0, start))
      visited += start
      while (frontier.nonEmpty &&
        (maxVisits <= 0 || visited.size < maxVisits)) {
        val (d, node) = frontier.dequeue()
        // frontier best is worse than the ef-th ALLOWED result → done
        if (results.size >= ef && d < results.head._1) frontier.clear()
        else {
          val ns = links(node)(level)
          var i = 0
          while (i < ns.length) {
            val n = ns(i)
            if (!visited.contains(n) &&
                (maxVisits <= 0 || visited.size < maxVisits)) {
              visited += n
              val dn = dot(q, vecs(n))
              // disallowed nodes ride the frontier (connectivity);
              // only allowed ones compete for the result set
              frontier.enqueue((dn, n))
              if (allow(n) && (results.size < ef || dn > results.head._1)) {
                results.enqueue((dn, n))
                if (results.size > ef) results.dequeue()
              }
            }
            i += 1
          }
        }
      }
      (results.dequeueAll.reverse.to(mutable.ArrayBuffer), visited.size)
    }

    /** Top-k among `allow`ed nodes only — the greedy upper-layer
      * descent stays unfiltered (it only picks the layer-0 entry). */
    def searchFiltered(q: Array[Float], k: Int, efSearch: Int,
                       maxVisits: Int, allow: Int => Boolean)
        : (Seq[(Long, Double)], Int) = {
      if (entry < 0) return (Seq.empty, 0)
      var cur = entry
      var level = topLevel
      while (level > 0) { cur = greedy(q, cur, level); level -= 1 }
      val (cands, visited) =
        searchLayerFiltered(q, cur, 0, math.max(efSearch, k), maxVisits, allow)
      (cands.take(k).map { case (d, n) => (ids(n), d) }.toSeq, visited)
    }

    /** The insertion ordinal of an id — lets a caller key per-node
      * metadata (e.g. a filter bitset) by the index's own node order. */
    private[Hnsw] def ordinalOf: collection.Map[Long, Int] =
      ids.zipWithIndex.toMap

    /** The id at a node ordinal — the inverse lookup tombstone filters
      * need inside the beam walk. */
    private[Hnsw] def idOf(n: Int): Long = ids(n)

    /** Neighbor selection, the paper's DIVERSITY heuristic (alg. 4):
      * walking candidates best-first, keep one only when no
      * already-kept neighbor explains it better (its dot to the base —
      * carried in `cands` — at least matches its dot to every kept
      * neighbor), then top up with the nearest skipped
      * (keepPrunedConnections). Plain top-`count` selection
      * DISCONNECTS well-separated clusters — every cross-cluster edge
      * loses the pruning fight to cluster-mates and search can never
      * leave the entry point's cluster; the heuristic keeps exactly
      * those long edges, which is what makes the graph navigable. */
    private def selectNeighbors(cands: mutable.ArrayBuffer[(Double, Int)],
                                count: Int): mutable.ArrayBuffer[Int] = {
      val sorted = cands.sortBy { case (d, n) => (-d, ids(n)) }
      val selected = mutable.ArrayBuffer.empty[Int]
      val skipped = mutable.ArrayBuffer.empty[Int]
      sorted.foreach { case (d, n) =>
        if (selected.length < count) {
          if (selected.forall(s => d >= dot(vecs(n), vecs(s))))
            selected += n
          else skipped += n
        }
      }
      skipped.foreach { n => if (selected.length < count) selected += n }
      selected
    }

    def insert(id: Long, v: Array[Float]): Unit = {
      val node = ids.length
      val lvl = levelOf(id)
      ids += id; vecs += v
      links += Array.fill(lvl + 1)(mutable.ArrayBuffer.empty[Int])
      if (entry < 0) { entry = node; topLevel = lvl; return }
      var cur = entry
      // descend the layers above the node's level greedily
      var level = topLevel
      while (level > lvl) {
        cur = greedy(v, cur, level)
        level -= 1
      }
      // connect on every layer the node participates in
      level = math.min(lvl, topLevel)
      while (level >= 0) {
        val (cands, _) = searchLayer(v, cur, level, efConstruction, 0)
        val maxLinks = if (level == 0) 2 * m else m
        val chosen = selectNeighbors(cands, m)
        links(node)(level) ++= chosen
        chosen.foreach { n =>
          val back = links(n)(level)
          back += node
          if (back.length > maxLinks) {
            // prune the weakest back-link to keep degree bounded
            val scored = back.map(b => (dot(vecs(n), vecs(b)), b))
            val kept = selectNeighbors(scored, maxLinks)
            back.clear(); back ++= kept
          }
        }
        cur = cands.headOption.map(_._2).getOrElse(cur)
        level -= 1
      }
      if (lvl > topLevel) { entry = node; topLevel = lvl }
    }

    /** Top-k by dot with beam `efSearch`, visited capped at
      * `maxVisits`. Returns ((id, dot) best-first, visited count). */
    def search(q: Array[Float], k: Int, efSearch: Int,
               maxVisits: Int): (Seq[(Long, Double)], Int) = {
      if (entry < 0) return (Seq.empty, 0)
      var cur = entry
      var level = topLevel
      while (level > 0) { cur = greedy(q, cur, level); level -= 1 }
      val (cands, visited) =
        searchLayer(q, cur, 0, math.max(efSearch, k), maxVisits)
      (cands.take(k).map { case (d, n) => (ids(n), d) }.toSeq, visited)
    }

    /** Serializable graph snapshot, one row per node: (id, vector,
      * per-level neighbor IDS, isEntry). Neighbor IDS — not ordinals —
      * so a restore is insensitive to row order. */
    def dump(): Seq[(Long, Array[Float], Seq[Seq[Long]], Boolean)] =
      ids.indices.map { n =>
        (ids(n), vecs(n),
          links(n).toSeq.map(_.toSeq.map(ids(_))), n == entry)
      }.toSeq

    private[Hnsw] def restoreFrom(
        rows: Seq[(Long, Array[Float], Seq[Seq[Long]], Boolean)]): Unit = {
      require(ids.isEmpty, "hnsw: restore into a non-empty index")
      // deterministic ordinals: ascending id (row order irrelevant)
      val sorted = rows.sortBy(_._1)
      val ordOf = sorted.iterator.map(_._1).zipWithIndex.toMap
      sorted.foreach { case (id, v, ls, isEntry) =>
        val node = ids.length
        ids += id; vecs += v
        links += ls.map(level =>
          level.map(ordOf).to(mutable.ArrayBuffer)).toArray
        if (isEntry) { entry = node; topLevel = ls.length - 1 }
      }
      require(entry >= 0, "hnsw: restored snapshot has no entry node")
    }
  }

  /** Rebuild an [[Index]] from a [[Index.dump]] snapshot — identical
    * adjacency, identical search results; further [[Index.insert]]s
    * continue the graph. */
  def restore(rows: Seq[(Long, Array[Float], Seq[Seq[Long]], Boolean)],
              m: Int, efConstruction: Int): Index = {
    val idx = new Index(m, efConstruction)
    idx.restoreFrom(rows)
    idx
  }

  /** Distributed ANN: P hash-partitioned sub-graphs, each searched for
    * every query, per-shard top-k merged globally. Emits one row per
    * (query, kept neighbor): `query_id, neighbor_id, dot_e12, visited`
    * where `dot_e12` is the EXACT quantized integer dot (the merge
    * key, comparable with the brute-force reference) and `visited` is
    * the shard's visited-node count for that query (≤ maxVisits by
    * construction). */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, k: Int,
              partitions: Int = 4, m: Int = 8, efConstruction: Int = 64,
              efSearch: Int = 48, maxVisits: Int = 256): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val qRows = queries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    require(qRows.nonEmpty, "hnsw: empty query set")
    val qB = spark.sparkContext.broadcast(qRows)
    val perShard = emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .repartition(partitions, col(idCol))
      .mapPartitions { rows =>
        // deterministic build: ascending id within the shard
        val sorted = rows.toArray.sortBy(_._1)
        if (sorted.isEmpty) Iterator.empty
        else {
          val index = new Index(m, efConstruction)
          sorted.foreach { case (id, v) => index.insert(id, v) }
          qB.value.iterator.flatMap { case (qid, qv) =>
            val (top, visited) = index.search(qv, k + 1, efSearch, maxVisits)
            // the query itself may live in this shard — drop it
            top.filter(_._1 != qid).take(k).map { case (nid, _) =>
              (qid, nid, visited)
            }
          }
        }
      }.toDF("query_id", "neighbor_id", "visited")
    val nv = emb.select(col(idCol).cast("long").as("neighbor_id"),
      graft.plans.VectorExpressions.quantize_e6(col(vecCol)).as("vn"))
    rerankMerge(perShard, nv, queries, idCol, vecCol, k)
  }

  /** FILTERED distributed ANN: [[annTopK]] with a row predicate —
    * the graph is built over the WHOLE shard (the filter must not
    * change the graph: it varies per query workload, the index does
    * not), and the beam walk traverses disallowed nodes while only
    * allowed ones enter the result set (searchLayerFiltered). Pass a
    * `maxVisits` scaled by ~1/selectivity — the filtered twin of the
    * IVF probe widening (v53). `allowed` is any boolean Column over
    * `emb`'s rows, evaluated Spark-side before the shard build, so
    * predicate pushdown and column pruning still apply to the scan. */
  def filteredAnnTopK(emb: DataFrame, idCol: String, vecCol: String,
                      queries: DataFrame, k: Int, allowed: Column,
                      partitions: Int = 4, m: Int = 8,
                      efConstruction: Int = 64, efSearch: Int = 48,
                      maxVisits: Int = 1024): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val qRows = queries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    require(qRows.nonEmpty, "hnsw: empty query set")
    val qB = spark.sparkContext.broadcast(qRows)
    val perShard = emb.select(col(idCol).cast("long"), col(vecCol),
        allowed.cast("boolean").as("__ok"))
      .as[(Long, Array[Float], Boolean)]
      .repartition(partitions, col(idCol))
      .mapPartitions { rows =>
        val sorted = rows.toArray.sortBy(_._1)
        if (sorted.isEmpty) Iterator.empty
        else {
          val index = new Index(m, efConstruction)
          sorted.foreach { case (id, v, _) => index.insert(id, v) }
          // per-node allow bitset keyed by the index's own ordinals
          val ord = index.ordinalOf
          val ok = new Array[Boolean](sorted.length)
          sorted.foreach { case (id, _, a) => ok(ord(id)) = a }
          qB.value.iterator.flatMap { case (qid, qv) =>
            val (top, visited) =
              index.searchFiltered(qv, k + 1, efSearch, maxVisits, ok(_))
            top.filter(_._1 != qid).take(k).map { case (nid, _) =>
              (qid, nid, visited)
            }
          }
        }
      }.toDF("query_id", "neighbor_id", "visited")
    val nv = emb.select(col(idCol).cast("long").as("neighbor_id"),
      graft.plans.VectorExpressions.quantize_e6(col(vecCol)).as("vn"))
    rerankMerge(perShard, nv, queries, idCol, vecCol, k)
  }

  /** Exact quantized re-rank + global top-k of per-shard candidates:
    * integer dots, bit-identical to the brute-force reference's
    * ranking. The candidate set (≤ queries·k·shards rows) is the
    * broadcast side of BOTH joins — the corpus side is never broadcast
    * and never all-paired. */
  private def rerankMerge(cands: DataFrame, neighborVecs: DataFrame,
                          queries: DataFrame, idCol: String,
                          vecCol: String, k: Int): DataFrame = {
    val qv = queries.select(col(idCol).cast("long").as("query_id"),
      graft.plans.VectorExpressions.quantize_e6(col(vecCol)).as("vq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("dot_e12").desc, col("neighbor_id").asc)
    broadcast(cands.join(broadcast(qv), "query_id"))
      .join(neighborVecs, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("visited"),
        graft.plans.VectorExpressions.dot_long(col("vq"), col("vn"))
          .as("dot_e12"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("dot_e12"), col("visited"))
  }

  // --------------------------- persisted, incrementally-growing index

  /** PERSISTED index as SEGMENTS (the Lucene-HNSW shape): the base
    * build writes `segments` independent graphs; every later batch
    * becomes ONE NEW segment — the base graphs are never touched, so
    * per-batch maintenance cost is O(batch·log batch) build +
    * O(batch) write, independent of corpus size (the same
    * index-as-state discipline as the incremental IVF/LSH/SemDeDup
    * legs). A search fans out over every segment under the same
    * visited cap and merges; segment proliferation degrades search
    * additively (one capped walk per segment), so a compaction —
    * [[buildIndex]] over the full corpus — amortizes like any segment
    * merge. On disk: one parquet row per node (seg, id, vec, links,
    * is_entry); neighbor lists carry IDS, so restore is insensitive to
    * row order. */
  def buildIndex(emb: DataFrame, idCol: String, vecCol: String,
                 path: String, segments: Int = 4, m: Int = 8,
                 efConstruction: Int = 64): Unit =
    writeSegments(emb, idCol, vecCol, path, segments, firstSeg = 0,
      m, efConstruction, overwrite = true)

  /** Append one batch as a fresh segment; the stored base is read only
    * to learn the next segment id (a listing-scale read, no graph
    * loads). */
  def appendBatch(path: String, batch: DataFrame, idCol: String,
                  vecCol: String, m: Int = 8,
                  efConstruction: Int = 64): Unit = {
    val spark = batch.sparkSession
    val next = spark.read.parquet(path)
      .agg(max(col("seg"))).collect()(0).getInt(0) + 1
    writeSegments(batch, idCol, vecCol, path, segments = 1,
      firstSeg = next, m, efConstruction, overwrite = false)
  }

  private def writeSegments(emb: DataFrame, idCol: String, vecCol: String,
                            path: String, segments: Int, firstSeg: Int,
                            m: Int, efConstruction: Int,
                            overwrite: Boolean): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .repartition(segments, col(idCol))
      .mapPartitions { rows =>
        val seg = firstSeg + org.apache.spark.TaskContext.getPartitionId()
        val sorted = rows.toArray.sortBy(_._1)
        if (sorted.isEmpty) Iterator.empty
        else {
          val index = new Index(m, efConstruction)
          sorted.foreach { case (id, v) => index.insert(id, v) }
          index.dump().iterator.map { case (id, v, links, isEntry) =>
            (seg, id, v, links, isEntry)
          }
        }
      }.toDF("seg", "id", "vec", "links", "is_entry")
      .write.mode(if (overwrite) "overwrite" else "append").parquet(path)
  }

  // ------------------------------------- soft deletes (tombstones)

  /** TOMBSTONE sidecar dir of a persisted index: one parquet row per
    * deleted id under `<path>/_tombstones` (underscore-prefixed, so
    * the graph-row reads never see it). The Lucene-liveDocs shape:
    * deleting from a graph in place would have to re-link every
    * neighbor (and re-run the diversity heuristic) across segments —
    * instead the id is marked dead, every search excludes it via the
    * FILTERED beam walk (dead nodes still conduct: they keep the graph
    * navigable exactly like any disallowed node), and a
    * [[compactIndex]] rebuild purges them. Per-delete cost is O(ids)
    * appended; search carries the dead set (O(deleted), driver-side
    * like the query set) until compaction. Ids are never reused —
    * re-inserting a tombstoned id does NOT revive it. */
  private def tombstoneDir(path: String): String = s"$path/_tombstones"

  /** Mark `ids` deleted in the stored index (appends — repeated
    * deletes accumulate, deleting an already-dead id is a no-op). */
  def deleteFromIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    require(ids.nonEmpty, "hnsw: deleteFromIndex with no ids")
    ids.toDF("id").write.mode("append").parquet(tombstoneDir(path))
  }

  /** Distributed form: the delete set stays a DataFrame end to end —
    * a predicate-derived deletion over a large corpus never routes
    * through the driver. */
  def deleteFromIndex(path: String, ids: DataFrame, idCol: String): Unit =
    ids.select(col(idCol).cast("long").as("id"))
      .write.mode("append").parquet(tombstoneDir(path))

  /** The stored index's dead set (empty when never deleted from). */
  def tombstonesOf(spark: org.apache.spark.sql.SparkSession,
                   path: String): Set[Long] = {
    val p = java.nio.file.Paths.get(tombstoneDir(path))
    if (!java.nio.file.Files.isDirectory(p)) Set.empty
    else {
      import spark.implicits._
      spark.read.parquet(p.toString).select(col("id").cast("long"))
        .as[Long].collect().toSet
    }
  }

  /** Rebuild the index over the LIVE rows only — the segment-merge
    * compaction that purges tombstones (and heals segment
    * proliferation from many [[appendBatch]]es). O(live corpus), run
    * on the amortization schedule any LSM-ish store uses. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                   segments: Int = 4, m: Int = 8,
                   efConstruction: Int = 64): Unit = {
    // dead set rides a broadcast anti-join (O(deleted) rows), never an
    // IN-list expression — the corpus side stays a distributed scan
    val p = java.nio.file.Paths.get(tombstoneDir(path))
    val stored = spark.read.parquet(path).select(col("id"), col("vec"))
    val live =
      if (!java.nio.file.Files.isDirectory(p)) stored
      else stored.join(
        broadcast(spark.read.parquet(p.toString).select(col("id"))),
        Seq("id"), "left_anti")
    // swap, never delete-then-move: the old index stays intact (under
    // `path + "_old"`) until the staged rebuild is IN PLACE, so a crash
    // at any point leaves either the old or the new index live at a
    // predictable name — the temp+atomic-rename discipline the rest of
    // the store uses. Absolute paths: a single-segment relative `path`
    // has a null getParent.
    val target = java.nio.file.Paths.get(path).toAbsolutePath
    val staged = java.nio.file.Files.createTempDirectory(
      target.getParent, "_hnsw_compact_").toString
    buildIndex(live, "id", "vec", staged, segments, m, efConstruction)
    swapInPlace(target, staged)
  }

  /** The staged-swap discipline shared by the compactions: the old
    * index stays whole under `<path>_old` until the staged dir is in
    * place — a crash at any point leaves old or new live at a
    * predictable name. */
  private def swapInPlace(target: java.nio.file.Path, staged: String): Unit = {
    val aside = target.resolveSibling(target.getFileName.toString + "_old")
    if (java.nio.file.Files.exists(aside)) // leftover from a prior crash
      Versioned.deleteRecursively(aside)
    java.nio.file.Files.move(target, aside)
    java.nio.file.Files.move(java.nio.file.Paths.get(staged), target)
    Versioned.deleteRecursively(aside)
  }

  /** TIERED segment compaction — the LSM schedule Lucene uses instead
    * of [[compactIndex]]'s full rebuild: merge ONLY the segments below
    * a size tier (the small fresh segments [[appendBatch]] piles up)
    * plus any tombstone-heavy segment (dead fraction ≥
    * `tombstoneRatio`); big settled segments' parquet files HARD-LINK
    * through untouched, so maintenance cost tracks CHURN (the merged
    * tier's row count), never corpus size — at 100 TB a nightly
    * compaction rebuilds megabytes of fresh segments, not the
    * terabyte graph. The merged tier rebuilds as ONE new segment (one
    * task, O(tier·log tier) — the bounded-by-tier cost model);
    * tombstones referencing merged rows are purged, those of kept
    * segments stay (their graphs still carry the rows). Returns
    * (merged segment ids, kept segment ids); no-op (Nil merged) when
    * nothing qualifies.
    *
    * `tierRows`: segments strictly smaller qualify as mergeable;
    * defaults to half the mean segment size. A lone qualifying
    * segment still compacts when it carries tombstones (purge),
    * otherwise merging needs ≥ 2 (nothing to gain rebuilding one
    * clean segment). */
  def compactIndexTiered(spark: org.apache.spark.sql.SparkSession,
                         path: String, tierRows: Long = 0L,
                         tombstoneRatio: Double = 0.2, m: Int = 8,
                         efConstruction: Int = 64): (Set[Int], Set[Int]) = {
    import spark.implicits._
    val stored = spark.read.parquet(path)
    val segRows = stored.groupBy("seg").count().as[(Int, Long)]
      .collect().toMap
    val tombDir = java.nio.file.Paths.get(tombstoneDir(path))
    val tomb: Option[DataFrame] =
      if (!java.nio.file.Files.isDirectory(tombDir)) None
      else Some(spark.read.parquet(tombDir.toString)
        .select(col("id").cast("long").as("id")).dropDuplicates("id"))
    // JOIN-AS-FLAG, the search path's discipline (see searchIndex): the
    // tombstone set joins onto the stored rows as a boolean — never a
    // forced broadcast — so no code path assumes the GLOBAL dead set
    // fits one process; at 100 TB with heavy churn the optimizer still
    // broadcasts a small set, but a terabyte one shuffles like any join
    val flagged = tomb.fold(stored.withColumn("__dead", lit(false))) { t =>
      stored.join(t.withColumn("__dead", lit(true)), Seq("id"), "left")
        .withColumn("__dead", coalesce(col("__dead"), lit(false)))
    }
    val deadPerSeg: Map[Int, Long] =
      if (tomb.isEmpty) Map.empty
      else flagged.filter(col("__dead")).groupBy("seg").count()
        .as[(Int, Long)].collect().toMap
    val tier =
      if (tierRows > 0L) tierRows
      else math.max(1L, segRows.values.sum / math.max(1, segRows.size) / 2)
    val candidates = segRows.keySet.filter { s =>
      segRows(s) < tier ||
        deadPerSeg.getOrElse(s, 0L).toDouble / segRows(s) >= tombstoneRatio
    }
    val anyDead = candidates.exists(deadPerSeg.getOrElse(_, 0L) > 0L)
    if (candidates.isEmpty || (candidates.size < 2 && !anyDead))
      return (Set.empty, segRows.keySet)
    val kept = segRows.keySet -- candidates
    // file → segment map (O(files) driver rows): the writer cuts one
    // file per segment-task, so a spanning file means foreign layout —
    // refuse toward the full rebuild rather than guess
    val fileSegs = stored
      .select(org.apache.spark.sql.functions.input_file_name().as("f"),
        col("seg")).distinct().as[(String, Int)].collect()
      .groupBy(_._1).map { case (f, ss) => f -> ss.map(_._2).toSet }
    fileSegs.find(_._2.size > 1).foreach { case (f, ss) =>
      throw new IllegalStateException(
        s"hnsw: data file $f spans segments ${ss.mkString(",")} — not " +
          "this writer's one-segment-per-file layout; run compactIndex " +
          "(full rebuild) instead")
    }
    val target = java.nio.file.Paths.get(path).toAbsolutePath
    val staged = java.nio.file.Files.createTempDirectory(
      target.getParent, "_hnsw_tiered_")
    // kept segments: hard-link their files — the inode-carry proof of
    // "maintenance cost tracks churn"
    fileSegs.foreach { case (f, ss) =>
      if (ss.subsetOf(kept)) {
        val src = java.nio.file.Paths.get(new java.net.URI(f).getPath)
        java.nio.file.Files.createLink(
          staged.resolve(src.getFileName.toString), src)
      }
    }
    // the merged tier: LIVE rows only (the same dead flag, no forced
    // broadcast), one fresh segment
    val live = flagged.filter(col("seg").isin(candidates.toSeq: _*))
      .filter(!col("__dead"))
      .select(col("id"), col("vec"))
    writeSegments(live, "id", "vec", staged.toString, segments = 1,
      firstSeg = segRows.keySet.max + 1, m, efConstruction,
      overwrite = false)
    // tombstones of KEPT segments survive; merged ones are purged
    if (kept.nonEmpty) tomb.foreach { t =>
      val keptIds = spark.read.parquet(staged.toString)
        .filter(col("seg").isin(kept.toSeq: _*)).select(col("id"))
      val remaining = t.join(keptIds, Seq("id"), "left_semi")
      if (remaining.limit(1).count() > 0L)
        remaining.write.parquet(staged.resolve("_tombstones").toString)
    }
    swapInPlace(target, staged.toString)
    (candidates, kept)
  }

  /** Search the stored index: one capped beam walk per segment, merged
    * by exact integer re-rank — same output shape as [[annTopK]].
    * Tombstoned ids never surface: the walk treats them as disallowed
    * (traverse-through — they keep conducting) and the re-rank side
    * drops them too. */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                  queries: DataFrame, idCol: String, vecCol: String,
                  k: Int, m: Int = 8, efConstruction: Int = 64,
                  efSearch: Int = 48, maxVisits: Int = 256): DataFrame = {
    import spark.implicits._
    val qRows = queries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    require(qRows.nonEmpty, "hnsw: empty query set")
    val qB = spark.sparkContext.broadcast(qRows)
    // Per-segment liveDocs (Lucene's shape): the dead set NEVER routes
    // through the driver — it is joined onto the stored rows as a
    // boolean flag, so each segment's beam walk sees only its OWN
    // segment's dead slice (O(segment deleted) executor memory), and
    // at 100 TB with heavy churn no single process ever holds the
    // global tombstone set.
    val tombDir = java.nio.file.Paths.get(tombstoneDir(path))
    val tomb: Option[DataFrame] =
      if (!java.nio.file.Files.isDirectory(tombDir)) None
      else Some(spark.read.parquet(tombDir.toString)
        .select(col("id").cast("long").as("id")).dropDuplicates("id"))
    val stored0 = spark.read.parquet(path)
      .select(col("seg"), col("id"), col("vec"), col("links"),
        col("is_entry"))
    val stored = tomb.fold(stored0.withColumn("dead", lit(false))) { t =>
      stored0.join(t.withColumn("dead", lit(true)), Seq("id"), "left")
        .withColumn("dead", coalesce(col("dead"), lit(false)))
        .select(col("seg"), col("id"), col("vec"), col("links"),
          col("is_entry"), col("dead"))
    }.as[(Int, Long, Array[Float], Seq[Seq[Long]], Boolean, Boolean)]
    val cands = stored.groupByKey(_._1)
      .flatMapGroups { (_, rows) =>
        val rs = rows.toSeq
        val deadSet =
          rs.iterator.collect { case (_, id, _, _, _, true) => id }.toSet
        val index = restore(
          rs.map { case (_, id, v, ls, e, _) => (id, v, ls, e) },
          m, efConstruction)
        qB.value.iterator.flatMap { case (qid, qv) =>
          val (top, visited) =
            if (deadSet.isEmpty) index.search(qv, k + 1, efSearch, maxVisits)
            else index.searchFiltered(qv, k + 1, efSearch, maxVisits,
              n => !deadSet.contains(index.idOf(n)))
          top.filter(_._1 != qid).take(k).map { case (nid, _) =>
            (qid, nid, visited)
          }
        }
      }.toDF("query_id", "neighbor_id", "visited")
    val nvAll = spark.read.parquet(path).select(
      col("id").cast("long").as("neighbor_id"),
      graft.plans.VectorExpressions.quantize_e6(col("vec")).as("vn"))
    // rerank side stays a distributive anti-join (AQE picks broadcast
    // when the dead set is small)
    val nv = tomb.fold(nvAll)(t =>
      nvAll.join(t.select(col("id").as("neighbor_id")),
        Seq("neighbor_id"), "left_anti"))
    rerankMerge(cands, nv, queries, idCol, vecCol, k)
  }
}
