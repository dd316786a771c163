package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.VectorExpressions.{dot_long, quantize_e6}

/** IVF-style approximate nearest neighbour search — the coarse-quantizer
  * companion to the sign-bit LSH path (queries/Vectors v34/v35). The
  * corpus is assigned to the nearest of k centroids once (the "index");
  * a query probes only the `nProbe` closest cells and ranks candidates
  * exactly. All similarity math runs on the exact integer-quantized
  * vectors (graft.plans.VectorExpressions), and centroid construction is
  * fully deterministic (seeded by vec_id), so index builds reproduce.
  *
  * At 100 TB: the index build is one aggregation shuffled on the cell id;
  * the query side is an equi-join on probed cell ids — candidate
  * generation never goes O(corpus × queries).
  */
object Ann {

  /** Deterministic coarse centroids: the k seed vectors are the lowest
    * ids; one Lloyd refinement step averages their assigned vectors.
    * (A production index would run a few more iterations — the plumbing
    * is identical.) Returns (centroid_id, cvec: array<long>).
    *
    * The refinement is `dims` primitive sum-aggregates over the array
    * elements rather than posexplode + a (cell, position) shuffle — no
    * row explosion, fully map-side combinable, one k-row result. At a
    * 100 TB corpus the explode variant shuffles dims× the input; this
    * shuffles k×dims longs.
    *
    * `dims` defaults to the first row's vector length (one tiny lookup
    * job); rows whose length differs fail loudly via `assert_true`
    * rather than silently producing truncated/null centroids. */
  def buildCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
                     k: Int, dims: Int = -1): DataFrame = {
    val d =
      if (dims > 0) dims
      else embeddings.select(size(col(vecCol))).take(1) match {
        case Array(r) => r.getInt(0)
        case _ => // empty corpus → empty centroid frame, not a crash
          return embeddings.sparkSession.createDataFrame(
            embeddings.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq(StructField("centroid_id", IntegerType),
              StructField("cvec", ArrayType(LongType)))))
      }
    val q = embeddings.select(col(idCol).as("vid"),
      when(assert_true(size(col(vecCol)) === d,
          lit(s"buildCentroids: expected $d-dim vectors")).isNull,
        quantize_e6(col(vecCol))).as("v"))
    lloydFrom(q, k, iters = 1, d).select(col("centroid_id"), col("cvec"))
  }

  /** Full Lloyd's k-means over the integer-quantized vectors: lowest-id
    * seeds, `iters` assign→trunc-mean rounds. Returns the final
    * centroids with the size of the assignment that produced them:
    * (centroid_id, n, cvec). A cell that loses all members drops out of
    * the frame (and stays out) — deterministic on both engines.
    *
    * Scale shape per round: one broadcast of k centroids, one hash
    * aggregate for the argmax assignment, one `dims`-column sum
    * aggregate for the means — two map-side-combinable shuffles per
    * round, never a row explosion. The unrolled plan grows linearly
    * with `iters`; for long runs callers should checkpoint between
    * rounds (see DupClusters for the convergence-loop pattern). */
  def lloyd(embeddings: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int): DataFrame = {
    val d = embeddings.select(size(col(vecCol))).take(1) match {
      case Array(r) => r.getInt(0)
      case _ => return embeddings.sparkSession.emptyDataFrame
    }
    val q = embeddings.select(col(idCol).as("vid"), quantize_e6(col(vecCol)).as("v"))
    lloydFrom(q, k, iters, d)
  }

  /** Lloyd's k-means run to CONVERGENCE (assignment fixed point) — the
    * production form of [[lloyd]]: rounds stop when no vector changes
    * cell, detected with a LongAccumulator folded into the round's own
    * materialization (no extra count job), lineage truncated per round
    * so the plan stays flat — the same iterative discipline as
    * [[DupClusters.connectedComponentsWithStats]], including the
    * `reliable` checkpoint mode for long runs on real clusters.
    * Returns ((centroid_id, n, cvec), rounds). Non-convergence within
    * `maxIter` fails loudly: intermediate centroids carry no signal
    * that they are intermediate. */
  def lloydConverged(embeddings: DataFrame, idCol: String, vecCol: String,
                     k: Int, maxIter: Int = 20,
                     reliable: Boolean = false): (DataFrame, Int) = {
    val spark = embeddings.sparkSession
    val sc = spark.sparkContext
    if (reliable && sc.getCheckpointDir.isEmpty) {
      // a driver-local temp dir is only a valid reliable-checkpoint
      // target when the executors share the driver's filesystem; on a
      // real cluster the caller must point at shared storage (HDFS/S3)
      require(sc.isLocal,
        "lloydConverged(reliable=true) on a non-local master needs " +
          "sc.setCheckpointDir on shared storage; a driver-local temp " +
          "dir is not visible to executors")
      sc.setCheckpointDir(java.nio.file.Files
        .createTempDirectory("graft_kmeans_ckpt").toString)
    }
    def truncate(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()

    val d = embeddings.select(size(col(vecCol))).take(1) match {
      case Array(r) => r.getInt(0)
      case _ => return (embeddings.sparkSession.emptyDataFrame, 0)
    }
    // the quantized corpus re-reads every round — materialize it once
    val q = truncate(embeddings.select(col(idCol).as("vid"),
      quantize_e6(col(vecCol)).as("v")))
    // bounded global window: the frame under it is the k-row limit
    // (k = cell count, single digits), never corpus-sized
    val seeds = q.orderBy("vid").limit(k)
      .withColumn("centroid_id", row_number().over(Window.orderBy("vid")) - 1)
      .select(col("centroid_id"), col("v").as("cvec"))

    val acc = sc.longAccumulator("kmeans_moved")
    val bump = udf { (moved: Boolean) =>
      if (moved) acc.add(1L); moved
    }.asNondeterministic()

    var assigned = truncate(assign(q, seeds))
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIter) {
      acc.reset()
      val cent = truncMeans(assigned, q, d)
      val next = truncate(
        assign(q, cent.select(col("centroid_id"), col("cvec")))
          .withColumnRenamed("centroid_id", "cid")
          .join(assigned.withColumnRenamed("centroid_id", "prev"), Seq("vid"))
          .select(col("vid"), col("cid").as("centroid_id"),
            bump(col("cid") =!= col("prev")).as("_moved")))
      converged = acc.value == 0
      assigned = next.select("vid", "centroid_id")
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"lloydConverged did not converge in $maxIter rounds; raise maxIter")
    (truncMeans(assigned, q, d), rounds)
  }

  /** `iters` Lloyd rounds from lowest-id seeds over pre-quantized
    * (vid, v) rows → (centroid_id, n, cvec). */
  private def lloydFrom(q: DataFrame, k: Int, iters: Int, d: Int): DataFrame = {
    require(iters >= 1, s"lloyd needs at least one round, got $iters")
    // bounded global window: the frame under it is the k-row limit
    // (k = cell count, single digits), never corpus-sized
    val seeds = q.orderBy("vid").limit(k)
      .withColumn("centroid_id", row_number().over(Window.orderBy("vid")) - 1)
      .select(col("centroid_id"), lit(0L).as("n"), col("v").as("cvec"))
    (1 to iters).foldLeft(seeds) { (cent, _) =>
      truncMeans(assign(q, cent), q, d)
    }
  }

  /** Element-wise mean (trunc toward zero, exact integer sums) of each
    * cell's assigned vectors — `d` primitive sum-aggregates, no row
    * explosion (see buildCentroids doc). */
  private def truncMeans(assigned: DataFrame, q: DataFrame, d: Int): DataFrame = {
    val sums = (1 to d).map(i => sum(element_at(col("v"), i)).as(s"s$i"))
    assigned.join(q, Seq("vid"))
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(col("centroid_id"), col("n"),
        array((1 to d).map(i =>
          (col(s"s$i") / col("n")).cast(LongType)): _*).as("cvec"))
  }

  /** Assign each vector to its nearest centroid (exact integer dot on
    * normalized-ish data ≙ cosine ranking; ties → lowest cell id).
    * Centroids broadcast; the argmax is a hash aggregate
    * (min of struct(-dot, cell)) rather than a window row_number — no
    * per-partition sort, one map-side-combinable shuffle, which is the
    * shape that survives a 100 TB corpus. */
  private def assign(q: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = q.crossJoin(broadcast(centroids))
      .select(col("vid"), col("centroid_id"), dot_long(col("v"), col("cvec")).as("d"))
    scored.groupBy("vid")
      .agg(min(struct((-col("d")).as("nd"), col("centroid_id").as("cid"))).as("m"))
      .select(col("vid"), col("m.cid").as("centroid_id"))
  }

  /** The IVF index: every corpus vector tagged with its cell. */
  def buildIndex(embeddings: DataFrame, idCol: String, vecCol: String,
                 k: Int): DataFrame =
    buildIndex(embeddings, idCol, vecCol,
      buildCentroids(embeddings, idCol, vecCol, k))

  /** Index build against precomputed centroids — use this when the
    * caller also needs the centroid frame (e.g. for ivfSearch), so the
    * whole centroid pipeline isn't embedded twice in the plan. */
  def buildIndex(embeddings: DataFrame, idCol: String, vecCol: String,
                 centroids: DataFrame): DataFrame = {
    val q = embeddings.select(col(idCol).as("vid"), quantize_e6(col(vecCol)).as("v"))
    assign(q, centroids).join(q, Seq("vid"))
      .select(col("vid"), col("centroid_id"), col("v"))
  }

  /** Query: probe the `nProbe` nearest cells per query vector, rank the
    * candidates in those cells by exact dot product, keep top `topK`.
    * Returns (query_id, rank, neighbor_id, dot). */
  def ivfSearch(index: DataFrame, centroids: DataFrame,
                queries: DataFrame, idCol: String, vecCol: String,
                nProbe: Int = 2, topK: Int = 5): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), quantize_e6(col(vecCol)).as("qv"))
    // nearest cells per query
    val cellScores = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("centroid_id"),
        dot_long(col("qv"), col("cvec")).as("cd"))
    val wc = Window.partitionBy("query_id").orderBy(col("cd").desc, col("centroid_id").asc)
    val probed = cellScores.withColumn("rn", row_number().over(wc))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("centroid_id"))
    // candidates via equi-join on the probed cell ids
    val cands = probed.join(index, Seq("centroid_id"))
      .filter(col("query_id") =!= col("vid"))
      .select(col("query_id"), col("vid").as("neighbor_id"),
        dot_long(col("qv"), col("v")).as("dot"))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dot"))
  }

  /** Strategy a predicate-constrained (filtered) ANN search resolves
    * to. Pure function of the corpus/allowed counts so specs can pin
    * the decision boundary without running a search. Filtered search
    * has two regimes with opposite failure modes: a SELECTIVE
    * predicate starves IVF cells (probing nProbe cells may yield
    * fewer than k allowed candidates — recall collapses), while a
    * BROAD predicate makes the exact path scan nearly the whole
    * corpus per query. The classic answer (filtered-DiskANN, Milvus,
    * Vespa all do a version of this): below a selectivity threshold
    * run EXACT brute force over just the allowed subset — it is small
    * by definition of the branch — and above it run IVF with the
    * probe count widened by 1/selectivity, post-filtering candidates,
    * so the EXPECTED number of allowed candidates per query matches
    * the unfiltered search's. */
  sealed trait FilteredStrategy
  final case class ExactSubset(nAllowed: Long) extends FilteredStrategy
  final case class WidenedIvf(nProbe: Int) extends FilteredStrategy

  def chooseFilteredStrategy(total: Long, allowed: Long,
                             exactThreshold: Double = 0.2,
                             nProbe0: Int = 2, kCells: Int = 8): FilteredStrategy = {
    require(total > 0, "filtered search over an empty corpus")
    val sel = allowed.toDouble / total
    if (sel <= exactThreshold) ExactSubset(allowed)
    else WidenedIvf(math.min(kCells, math.ceil(nProbe0 / sel).toInt))
  }

  /** Exact top-k restricted to `allowed` neighbor ids — the selective
    * branch of [[filteredSearch]]. The allowed subset joins BEFORE the
    * query cross-join, so the per-query work is O(|allowed|), not
    * O(corpus); the subset is broadcast (this branch is only chosen
    * when the predicate keeps ≤ `exactThreshold` of the corpus, and
    * production thresholds are set so that fits an executor). */
  def filteredBruteForce(corpus: DataFrame, queries: DataFrame,
                         idCol: String, vecCol: String,
                         allowed: DataFrame, topK: Int = 5): DataFrame = {
    val a = allowed.select(col(allowed.columns.head).as("vid")).distinct()
    val e = corpus.select(col(idCol).as("vid"), quantize_e6(col(vecCol)).as("v"))
      .join(a, Seq("vid"))
    val q = queries.select(col(idCol).as("query_id"),
      quantize_e6(col(vecCol)).as("qv"))
    val dots = q.join(broadcast(e.select(col("vid").as("neighbor_id"), col("v"))),
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        dot_long(col("qv"), col("v")).as("dot"))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("neighbor_id").asc)
    dots.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dot"))
  }

  /** IVF search post-filtered to `allowed` neighbor ids. Filtering the
    * postings before the probe join is plan-equivalent to filtering
    * candidates after it (filter commutes with the equi-join) but
    * cheaper: disallowed vectors never reach the dot products. Cell
    * probing still ranks ALL centroids — the index is shared with
    * unfiltered queries, never rebuilt per predicate. */
  def filteredIvfSearch(index: DataFrame, centroids: DataFrame,
                        queries: DataFrame, idCol: String, vecCol: String,
                        allowed: DataFrame, nProbe: Int, topK: Int = 5): DataFrame = {
    val a = allowed.select(col(allowed.columns.head).as("vid")).distinct()
    ivfSearch(index.join(a, Seq("vid")), centroids, queries,
      idCol, vecCol, nProbe, topK)
  }

  /** Predicate-constrained ANN: top-`topK` neighbors drawn only from
    * `allowed` (a one-column frame of permitted corpus ids — the
    * materialized predicate). Resolves the physical strategy from the
    * measured selectivity via [[chooseFilteredStrategy]]; the two
    * count jobs at plan time are aggregate-only scans (at scale,
    * manifest-carried row counts make them metadata lookups). */
  def filteredSearch(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, allowed: DataFrame,
                     topK: Int = 5, exactThreshold: Double = 0.2,
                     kCells: Int = 8, nProbe0: Int = 2): DataFrame =
    chooseFilteredStrategy(corpus.count(), allowed.count(),
        exactThreshold, nProbe0, kCells) match {
      case ExactSubset(_) =>
        filteredBruteForce(corpus, queries, idCol, vecCol, allowed, topK)
      case WidenedIvf(nProbe) =>
        val centroids = buildCentroids(corpus, idCol, vecCol, kCells)
        val index = buildIndex(corpus, idCol, vecCol, centroids)
        filteredIvfSearch(index, centroids, queries, idCol, vecCol,
          allowed, nProbe, topK)
    }

  /** Hard-negative mining for contrastive training: per anchor, the
    * `topK` most-similar corpus vectors with a DIFFERENT label — close
    * in embedding space yet labeled differently, the pairs a
    * contrastive / reranker objective learns most from (the ANN-mined
    * hard-negatives recipe of DPR/ANCE-style training pipelines).
    * Unlike [[filteredSearch]] the predicate is PER-ANCHOR (`label <>
    * anchor.label`), so no global allowed set exists: the label
    * travels with the index postings and the mismatch test is a
    * join-side filter, applied BEFORE ranking so discarded same-label
    * crowding never consumes top-k slots. Probes default WIDER than
    * plain search (3 of 8 cells) because an anchor's own cell is, by
    * construction of a good embedding, crowded with same-label vectors
    * the filter throws away.
    *
    * Scale shape — identical to [[ivfSearch]]: k-row centroid frame
    * broadcast, candidates via one equi-join on probed cell ids
    * (never anchors × corpus), the label an O(1)-width column carried
    * through the postings join rather than a second corpus join.
    * Returns (query_id, rank, neighbor_id, dot). */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, kCells: Int = 8,
                    nProbe: Int = 3, topK: Int = 5): DataFrame = {
    val centroids = buildCentroids(corpus, idCol, vecCol, kCells)
    val index = buildIndex(corpus, idCol, vecCol, centroids)
      .join(corpus.select(col(idCol).as("vid"), col(labelCol).as("nlbl")),
        Seq("vid"))
    val q = anchors.select(col(idCol).as("query_id"),
      col(labelCol).as("qlbl"), quantize_e6(col(vecCol)).as("qv"))
    val cellScores = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("qlbl"), col("centroid_id"),
        dot_long(col("qv"), col("cvec")).as("cd"))
    val wc = Window.partitionBy("query_id")
      .orderBy(col("cd").desc, col("centroid_id").asc)
    val probed = cellScores.withColumn("rn", row_number().over(wc))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("qlbl"), col("centroid_id"))
    val cands = probed.join(index, Seq("centroid_id"))
      .filter(col("nlbl") =!= col("qlbl"))
      .select(col("query_id"), col("vid").as("neighbor_id"),
        dot_long(col("qv"), col("v")).as("dot"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dot").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dot"))
  }
}

/** Product quantization (the MIPS flavor, matching this engine's
  * inner-product ranking convention): each vector splits into `m`
  * subspaces; every subspace learns `ksub` codewords with the SAME
  * deterministic recipe as the IVF coarse quantizer (lowest-id seeds,
  * max-dot assignment with ties to the lowest cell, one Lloyd step with
  * trunc-toward-zero integer means); a vector's code is its m codeword
  * ids (m small ints instead of dims floats — the memory path that
  * makes billion-vector indexes fit). Queries run ADC (asymmetric
  * distance computation): the query's EXACT per-subspace dots against
  * every codeword form a tiny lookup table, and a document's
  * approximate dot is the sum of its codes' entries.
  *
  * Scale shape: codebook learning and encoding run for ALL subspaces in
  * ONE plan (subspace id is an exploded column, not a driver loop) —
  * one scan, aggregations shuffled on (subspace, cell). The LUT is
  * queries × m × ksub rows (broadcast); candidate scoring is an
  * equi-join on (subspace, codeword) plus one sum-aggregate — never a
  * vectors × queries × dims blow-up.
  */
object Pq {

  /** `dims` must split evenly into `m` subspaces — silently truncating
    * trailing dimensions would degrade recall with no error. */
  private def subDim(dims: Int, m: Int): Int = {
    require(m > 0 && dims > 0 && dims % m == 0,
      s"dims=$dims must be a positive multiple of m=$m")
    dims / m
  }

  /** (vid, sub, sv): every vector exploded into its quantized
    * subvectors. */
  private def subvectors(df: DataFrame, idCol: String, vecCol: String,
                         m: Int, dsub: Int): DataFrame =
    df.select(col(idCol).as("vid"), quantize_e6(col(vecCol)).as("v"))
      .select(col("vid"), explode(array((0 until m).map { s =>
        struct(lit(s).as("sub"), slice(col("v"), s * dsub + 1, dsub).as("sv"))
      }: _*)).as("e"))
      .select(col("vid"), col("e.sub").as("sub"), col("e.sv").as("sv"))

  private def argmaxCell(scored: DataFrame): DataFrame =
    scored.groupBy("vid", "sub")
      .agg(min(struct((-col("d")).as("nd"), col("centroid_id").as("cid"))).as("mm"))
      .select(col("vid"), col("sub"), col("mm.cid").as("centroid_id"))

  /** Per-subspace codebooks: (sub, centroid_id, cvec). */
  def codebooks(embeddings: DataFrame, idCol: String, vecCol: String,
                m: Int, ksub: Int, dims: Int): DataFrame = {
    val dsub = subDim(dims, m)
    val qsub = subvectors(embeddings, idCol, vecCol, m, dsub)
    val ws = Window.partitionBy("sub").orderBy("vid")
    val seeds = qsub.withColumn("rn", row_number().over(ws))
      .filter(col("rn") <= ksub)
      .select(col("sub"), (col("rn") - 1).cast(IntegerType).as("centroid_id"),
        col("sv").as("cvec"))
    val assigned = argmaxCell(
      qsub.join(broadcast(seeds), Seq("sub"))
        .select(col("vid"), col("sub"), col("centroid_id"),
          dot_long(col("sv"), col("cvec")).as("d")))
    val sums = (1 to dsub).map(i => sum(element_at(col("sv"), i)).as(s"s$i"))
    assigned.join(qsub, Seq("vid", "sub"))
      .groupBy("sub", "centroid_id")
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(col("sub"), col("centroid_id"),
        array((1 to dsub).map(i =>
          (col(s"s$i") / col("n")).cast(LongType)): _*).as("cvec"))
  }

  /** Encode every vector: (vid, sub, code). */
  def encode(embeddings: DataFrame, idCol: String, vecCol: String,
             books: DataFrame, m: Int, dims: Int): DataFrame = {
    val dsub = subDim(dims, m)
    val qsub = subvectors(embeddings, idCol, vecCol, m, dsub)
    argmaxCell(
      qsub.join(broadcast(books), Seq("sub"))
        .select(col("vid"), col("sub"), col("centroid_id"),
          dot_long(col("sv"), col("cvec")).as("d")))
      .withColumnRenamed("centroid_id", "code")
  }

  /** The fused production retrieval pipeline over a compressed index —
    * IVF cell probing ([[Ann.ivfSearch]]'s stage 1) to bound the
    * candidate set, ADC scoring ([[adcSearch]]'s LUT sum) over only the
    * residents of the probed cells, then an exact re-rank of the ADC
    * shortlist: probe `nProbe` cells → ADC-score residents → top
    * `shortlist` by approximate dot → exact top `topK`. This is the
    * billion-vector memory shape: full vectors are touched only for
    * `shortlist` candidates per query; everything resident is m codes +
    * a cell id per vector.
    *
    * Scale shape: centroids, codebooks, and the per-query LUT
    * broadcast; candidates arrive via the equi-join on probed cell ids;
    * ADC is one map-side-combinable sum per (query, neighbor); both
    * top-k stages are per-query windows over bounded frames. */
  def ivfAdcRerank(index: DataFrame, centroids: DataFrame,
                   codes: DataFrame, books: DataFrame,
                   embeddings: DataFrame, queries: DataFrame,
                   idCol: String, vecCol: String, m: Int, dims: Int,
                   nProbe: Int, shortlist: Int, topK: Int): DataFrame = {
    val dsub = subDim(dims, m)
    val q = queries.select(col(idCol).as("query_id"), quantize_e6(col(vecCol)).as("qv"))
    // stage 0: probe the nProbe nearest cells (broadcast centroids)
    val cellScores = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("centroid_id"),
        dot_long(col("qv"), col("cvec")).as("cd"))
    val wc = Window.partitionBy("query_id")
      .orderBy(col("cd").desc, col("centroid_id").asc)
    val probed = cellScores.withColumn("rn", row_number().over(wc))
      .filter(col("rn") <= nProbe).select("query_id", "centroid_id")
    // stage 1: candidate residents of the probed cells
    val resid = probed.join(index.select("vid", "centroid_id"), Seq("centroid_id"))
      .filter(col("query_id") =!= col("vid"))
      .select(col("query_id"), col("vid").as("neighbor_id"))
    // stage 2: ADC scores — LUT of exact per-subspace query·codeword
    // dots (broadcast), summed over each candidate's codes
    val qsub = subvectors(queries, idCol, vecCol, m, dsub)
      .withColumnRenamed("vid", "query_id")
    val lut = qsub.join(broadcast(books), Seq("sub"))
      .select(col("query_id"), col("sub"), col("centroid_id").as("code"),
        dot_long(col("sv"), col("cvec")).as("pd"))
    val adc = resid
      .join(codes, resid("neighbor_id") === codes("vid"))
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum("pd").as("adot"))
    val w1 = Window.partitionBy("query_id")
      .orderBy(col("adot").desc, col("neighbor_id").asc)
    val short = adc.withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= shortlist).select("query_id", "neighbor_id")
    // stage 3: exact re-rank of the shortlist only
    val full = embeddings.select(col(idCol).as("neighbor_id"),
      quantize_e6(col(vecCol)).as("v"))
    val exact = short.join(q, Seq("query_id")).join(full, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        dot_long(col("qv"), col("v")).as("dot"))
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("dot").desc, col("neighbor_id").asc)
    exact.withColumn("rank", row_number().over(w2).cast(IntegerType))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dot"))
  }

  /** ADC top-k: approximate dot = Σ_sub LUT[query, sub, code]. */
  def adcSearch(codes: DataFrame, books: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String, m: Int, dims: Int,
                topK: Int): DataFrame = {
    val dsub = subDim(dims, m)
    val qsub = subvectors(queries, idCol, vecCol, m, dsub)
      .withColumnRenamed("vid", "query_id")
    val lut = qsub.join(broadcast(books), Seq("sub"))
      .select(col("query_id"), col("sub"), col("centroid_id"),
        dot_long(col("sv"), col("cvec")).as("pd"))
    val approx = codes.join(broadcast(lut),
        codes("sub") === lut("sub") && codes("code") === lut("centroid_id"))
      .groupBy(col("query_id"), codes("vid").as("neighbor_id"))
      .agg(sum("pd").as("adot"))
      .filter(col("query_id") =!= col("neighbor_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adot").desc, col("neighbor_id").asc)
    approx.withColumn("rank", row_number().over(w).cast(IntegerType))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adot"))
  }
}
