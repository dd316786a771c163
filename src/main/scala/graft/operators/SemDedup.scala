package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.VectorExpressions.dot_long

/** SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
  * the embedding space with the deterministic coarse quantizer
  * ([[Ann.buildCentroids]]), compare ONLY within a cluster, and drop
  * every member that has a lower-id cell-mate with cosine over the
  * threshold. Keeps exactly one representative (the lowest id) per
  * near-duplicate neighborhood that a cluster contains.
  *
  * This is the embedding analogue of the MinHash-band (t34) and
  * dHash-band (t48) dedup decisions: candidate generation is scoped by
  * the cluster id, so pair work is bounded by Σ|cell|² instead of
  * |corpus|² — and, unlike a pair self-join, NO pair rows are ever
  * materialized or exchanged. The verdict runs per cell inside one
  * `flatMapGroups` pass: members sorted by id, each member scans its
  * lower-id cell-mates and stops at the FIRST one over the threshold.
  * The early exit is what survives a monoculture corpus: in a cell of
  * near-identical vectors every member's first probe clears the
  * threshold, so the cell costs O(|cell|) comparisons, not |cell|²/2 —
  * the shape a pair join cannot have. At 100 TB, k scales with the
  * corpus to keep cells bounded (SemDeDup's own recipe); a cell is one
  * group in a single hash-partition shuffle on centroid_id.
  *
  * Cosine runs on exact integer dots/norms (bit-identical across
  * engines); ties and drop choices are deterministic by id.
  */
object SemDedup {

  /** Tag every vector with its cluster and a `kept` verdict:
    * (vec_id, centroid_id, kept). `cosE6` is the near-dup threshold in
    * millionths (e.g. 300000 = cosine 0.30); must be positive.
    *
    * `maxCell` enforces the bounded-cell assumption the per-cell pass
    * rests on: one cell's members must fit one executor (the array a
    * monoculture corpus concentrates into a single cell). Exceeding it
    * fails LOUDLY inside the task — never a silent spill or truncation
    * — with the SemDeDup recipe in the message: k must scale with the
    * corpus so that corpus/k stays cell-sized. The check costs no
    * extra job; it rides the iterator that builds the member array.
    * `idCol` must be an integral column (the verdict orders and
    * tie-breaks by exact id); anything else fails analysis here with a
    * clear error rather than deep inside the encoder. */
  def dedup(embeddings: DataFrame, idCol: String, vecCol: String,
            k: Int, cosE6: Long, maxCell: Int = 1 << 20): DataFrame = {
    require(cosE6 > 0, s"cosE6 threshold must be positive, got $cosE6")
    require(maxCell > 0, s"maxCell must be positive, got $maxCell")
    val idType = embeddings.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(idType.typeName),
      s"SemDedup.dedup needs an integral id column; '$idCol' is " +
        s"${idType.typeName} — cast it to bigint first (verdicts order " +
        "and tie-break by exact id)")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val withLongId = embeddings.withColumn(idCol, col(idCol).cast("long"))
    val index = Ann.buildIndex(withLongId, idCol, vecCol,
        Ann.buildCentroids(withLongId, idCol, vecCol, k))
      .withColumn("n2", dot_long(col("v"), col("v")))
    index.select(col("centroid_id"), col("vid"), col("v"), col("n2"))
      .as[(Long, Long, Array[Long], Long)]
      .groupByKey(_._1)
      .flatMapGroups { (cell, it) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long], Long)]
        it.foreach { case (_, vid, v, n2) =>
          if (buf.length >= maxCell)
            throw new IllegalStateException(
              s"SemDedup cell $cell exceeds maxCell=$maxCell members: " +
                "raise k so corpus/k stays cell-sized (SemDeDup's own " +
                "recipe) or raise maxCell if executor memory allows")
          buf += ((vid, v, n2))
        }
        val members = buf.toArray.sortBy(_._1)
        val norms = members.map(m => math.sqrt(m._3.toDouble))
        Iterator.tabulate(members.length) { bi =>
          val (vid, vb, _) = members(bi)
          var dropped = false
          var ai = 0
          while (!dropped && ai < bi) {
            val va = members(ai)._2
            var dot = 0L
            var i = 0
            while (i < vb.length) { dot += va(i) * vb(i); i += 1 }
            // same arithmetic as the column form: exact integer dot,
            // then one double divide and a half-up round to millionths
            if (math.round(dot * 1000000.0 / (norms(ai) * norms(bi))) >= cosE6)
              dropped = true
            ai += 1
          }
          (vid, cell, !dropped)
        }
      }
      .toDF(idCol, "centroid_id", "kept")
  }
}
