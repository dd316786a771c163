package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Similarity search over the `embeddings` table (vec_id,
  * embedding: array<float> x64, label) — the ANN surface of the
  * training-data pipeline (BASELINE.json north star).
  *
  * All arithmetic runs in the integer domain: each float is quantized to
  * round(x * 1e6) as BIGINT, so dot products and norms are exact 64-bit
  * sums — bit-identical in Spark and DuckDB regardless of accumulation
  * order (a float dot product would not be). Cosine then divides exact
  * integers in double precision (deterministic IEEE ops).
  *
  * Scale path: brute-force top-k is the correctness baseline (bounded
  * query set × broadcastable corpus); the LSH variant (v34/v35) buckets
  * by sign bits so candidate generation is an equi-join shuffle, never
  * O(n²) — that is the shape that survives 100 TB.
  */
object Vectors {
  type Q = (SparkSession, String) => DataFrame

  /** Quantize array<float> → array<bigint> of round(x*1e6) (exact) —
    * native codegen'd expression (graft.plans.VectorExpressions); the
    * transform/zip_with/aggregate HOF formulation is semantically
    * identical but runs interpreted and dominated ANN query time. */
  private def quant(c: Column): Column = graft.plans.VectorExpressions.quantize_e6(c)

  private def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dot_long(a, b)

  private def qEmb(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(col("vec_id"), col("label"),
      quant(col("embedding")).as("v"))

  /** Exact top-k by dot for query ids < `nQueries` — the correctness
    * baseline (v31) and the recall reference for the ANN specs. */
  def bruteForceTopK(s: SparkSession, dir: String, nQueries: Int, k: Int): DataFrame = {
    val e = qEmb(s, dir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("vq"))
    val dots = q.join(broadcast(e.select(col("vec_id").as("neighbor_id"), col("v"))),
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), dot(col("vq"), col("v")).as("dot"))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("neighbor_id").asc)
    dots.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dot"))
  }

  /** v31: brute-force top-5 nearest neighbors by dot product for query
    * vectors vec_id < 100 (baseline ANN; corpus side broadcast). */
  def v31KnnBruteforce(s: SparkSession, dir: String): DataFrame =
    bruteForceTopK(s, dir, nQueries = 100, k = 5).orderBy("query_id", "rank")

  /** v32: per-vector exact squared norm (quality/scale diagnostics). */
  def v32VectorNorms(s: SparkSession, dir: String): DataFrame =
    qEmb(s, dir)
      .select(col("vec_id"), col("label"), dot(col("v"), col("v")).as("norm2_e12"))
      .orderBy("vec_id")

  /** v33: per-label centroid component sums (first 4 dims, exact). */
  def v33LabelCentroids(s: SparkSession, dir: String): DataFrame =
    qEmb(s, dir)
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
           sum(element_at(col("v"), 1)).as("s0"),
           sum(element_at(col("v"), 2)).as("s1"),
           sum(element_at(col("v"), 3)).as("s2"),
           sum(element_at(col("v"), 4)).as("s3"))
      .orderBy("label")

  /** Sign-bit LSH bucket over the first 8 dimensions — deterministic
    * axis-aligned hyperplanes (bucket = Σ 2^i · [x_i ≥ 0]). */
  private def signBucket(emb: Column): Column =
    (0 until 8).map(i =>
      when(element_at(emb, i + 1) >= 0f, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)

  /** v34: LSH bucket histogram (state of the ANN index). */
  def v34LshBuckets(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(signBucket(col("embedding")).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy("bucket")

  /** v35: LSH-bucketed ANN — candidates only within the same sign bucket
    * (equi-join on bucket key = the 100 TB plan), top-3 by exact dot. */
  def v35LshAnn(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), signBucket(col("embedding")).as("bucket"),
              quant(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"), col("bucket"), col("v").as("vq"))
    val cands = q.join(e.select(col("vec_id").as("neighbor_id"), col("bucket"), col("v")),
        Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), dot(col("vq"), col("v")).as("dot"))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dot"))
      .orderBy("query_id", "rank")
  }

  /** v36: cosine near-duplicate pairs above 0.8 among vec_id < 100
    * (embedding-cosine near-dup; cosine from exact integer dot/norms). */
  def v36CosinePairs(s: SparkSession, dir: String): DataFrame = {
    val e = qEmb(s, dir).filter(col("vec_id") < 100)
      .select(col("vec_id"), col("v"), dot(col("v"), col("v")).as("n2"))
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        dot(col("a.v"), col("b.v")).as("d"),
        col("a.n2").as("na"), col("b.n2").as("nb"))
    pairs
      .withColumn("cos_e6",
        round(col("d") * 1000000.0 /
              (sqrt(col("na").cast(DoubleType)) * sqrt(col("nb").cast(DoubleType))))
          .cast(LongType))
      .filter(col("cos_e6") >= 300000)
      .select(col("vec_a"), col("vec_b"), col("cos_e6"))
      .orderBy("vec_a", "vec_b")
  }

  /** v38: embedding-cosine near-dup at SCALE — candidates only within
    * the same sign bucket (equi-join, never O(n²) over the corpus, the
    * production shape of v36's bounded all-pairs oracle baseline),
    * exact integer dots, cosine above the near-dup threshold (0.3 —
    * the synthetic embeddings are random, so realistic 0.9-style
    * thresholds would gate on an empty result). Runs over the WHOLE
    * corpus. */
  def v38LshCosineDups(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), signBucket(col("embedding")).as("bucket"),
        quant(col("embedding")).as("v"))
      .withColumn("n2", dot(col("v"), col("v")))
    val pairs = e.as("a").join(e.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        dot(col("a.v"), col("b.v")).as("d"),
        col("a.n2").as("na"), col("b.n2").as("nb"))
    pairs
      .withColumn("cos_e6",
        round(col("d") * 1000000.0 /
              (sqrt(col("na").cast(DoubleType)) * sqrt(col("nb").cast(DoubleType))))
          .cast(LongType))
      .filter(col("cos_e6") >= 300000)
      .select(col("vec_a"), col("vec_b"), col("cos_e6"))
      .orderBy("vec_a", "vec_b")
  }

  /** v37: the full IVF ANN pipeline (graft.operators.Ann) under the
    * oracle — deterministic seeded centroids, one Lloyd refinement,
    * cell assignment, 2-probe search, exact top-5 rank. Certifies the
    * index build AND query path end-to-end (the coarse-quantizer scale
    * path named alongside LSH in the training-data-pipeline surface). */
  def v37IvfAnn(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val centroids = graft.operators.Ann.buildCentroids(emb, "vec_id", "embedding", k = 8)
    val index = graft.operators.Ann.buildIndex(emb, "vec_id", "embedding", centroids)
    val queries = emb.filter(col("vec_id") < 50)
    graft.operators.Ann.ivfSearch(index, centroids, queries, "vec_id", "embedding",
        nProbe = 2, topK = 5)
      .orderBy("query_id", "rank")
  }

  /** v52: filtered (predicate-constrained) ANN, selective branch —
    * top-5 among corpus vectors with `label = 3` only (~10% of the
    * corpus). The adaptive chooser (Ann.chooseFilteredStrategy)
    * resolves this below the 0.2 selectivity threshold to EXACT brute
    * force over just the allowed subset: probing IVF cells under a
    * predicate this selective would starve most probes of allowed
    * candidates, while the allowed subset is small enough that exact
    * search over it is cheaper than the index walk. The oracle is the
    * definitionally-correct filtered top-5. */
  def v52FilteredAnn(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    graft.operators.Ann.filteredSearch(
        emb, emb.filter(col("vec_id") < 50), "vec_id", "embedding",
        allowed = emb.filter(col("label") === 3).select("vec_id"), topK = 5)
      .orderBy("query_id", "rank")
  }

  /** v53: filtered ANN, broad branch — the same search with the
    * predicate inverted (`label <> 3`, ~90% of the corpus). The
    * chooser lands on the IVF path with the probe count widened by
    * 1/selectivity (ceil(2 / 0.9) = 3 of 8 cells — any label <> x
    * predicate over the ~uniform 10-label corpus widens 2 → 3), and
    * candidates post-filter against the predicate. Widening keeps the
    * EXPECTED allowed-candidate count per query at the unfiltered
    * search's level — the standard filtered-vector-search recipe. The
    * oracle replays the deterministic IVF derivation with the same
    * widened probe and predicate. */
  def v53FilteredIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    graft.operators.Ann.filteredSearch(
        emb, emb.filter(col("vec_id") < 50), "vec_id", "embedding",
        allowed = emb.filter(col("label") =!= 3).select("vec_id"), topK = 5)
      .orderBy("query_id", "rank")
  }

  /** v54: hard-negative mining — per anchor (vec_id < 50), the top-5
    * most-similar corpus vectors whose label DIFFERS from the
    * anchor's: the contrastive-training pairs an embedding model
    * learns most from. The predicate is per-anchor, so the label rides
    * the IVF postings and filters candidates before ranking; probes
    * widen to 3 of 8 cells because an anchor's own cell is crowded
    * with the same-label vectors the filter discards. The oracle
    * replays the deterministic IVF derivation with the same widened
    * probe and the label-mismatch join condition. */
  def v54HardNegatives(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    graft.operators.Ann.hardNegatives(
        emb, emb.filter(col("vec_id") < 50), "vec_id", "embedding", "label")
      .orderBy("query_id", "rank")
  }

  /** v48: incremental IVF insertion — the index-maintenance shape for
    * a growing corpus: centroids and postings built from the EXISTING
    * corpus live on disk; a NEW batch is quantized and assigned
    * against the stored (k-row, broadcast) centroid frame only —
    * O(batch·k) work, no Lloyd re-run, no old-vector recompute — and
    * its postings append to the stored index. A 2-probe top-5 search
    * over the merged index must equal assigning the FULL corpus to the
    * same centroids, which is exactly what the oracle derives
    * (centroids from the old half, one joint assignment). */
  def v48IncrementalIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val old = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val fresh = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_v48_state_").toString
    val centroids = graft.operators.Ann.buildCentroids(
      old, "vec_id", "embedding", k = 8)
    centroids.write.mode("overwrite").parquet(s"$stateDir/centroids")
    graft.operators.Ann.buildIndex(old, "vec_id", "embedding", centroids)
      .write.mode("overwrite").parquet(s"$stateDir/postings")
    // incremental insert: only the new batch touches compute; the
    // stored index is read, never rebuilt
    val storedCent = s.read.parquet(s"$stateDir/centroids")
    val storedIdx = s.read.parquet(s"$stateDir/postings")
    val inserted = graft.operators.Ann.buildIndex(
      fresh, "vec_id", "embedding", storedCent)
    graft.operators.Ann.ivfSearch(storedIdx.unionByName(inserted), storedCent,
        emb.filter(col("vec_id") < 50), "vec_id", "embedding",
        nProbe = 2, topK = 5)
      .orderBy("query_id", "rank")
  }

  /** v49: incremental SemDeDup — the third leg of the incremental
    * corpus-maintenance trio (t99 text, v48 ANN index, this one
    * semantic dedup): the existing corpus's per-cell index (ALL
    * members — the pairwise verdict compares against any lower-id
    * cell-mate) and centroids are state on disk; a new batch of
    * strictly-higher ids is assigned to the stored centroids and
    * verdicts are scored for the NEW members only. The oracle derives
    * centroids from the old half, one joint assignment, the full
    * pairwise drop rule, and keeps the new rows — provably what the
    * incremental pass computes. */
  def v49IncrementalSemdedup(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val maxId = emb.agg(max(col("vec_id").cast(LongType)))
      .collect()(0).getLong(0)
    val t = (maxId + 1) / 2
    val old = emb.filter(col("vec_id") < t)
      .withColumn("vec_id", col("vec_id").cast(LongType))
    val fresh = emb.filter(col("vec_id") >= t)
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_v49_state_").toString
    val centroids = graft.operators.Ann.buildCentroids(
      old, "vec_id", "embedding", k = 8)
    centroids.write.mode("overwrite").parquet(s"$stateDir/centroids")
    graft.operators.Ann.buildIndex(old, "vec_id", "embedding", centroids)
      .withColumn("n2",
        graft.plans.VectorExpressions.dot_long(col("v"), col("v")))
      .select(col("centroid_id"), col("vid"), col("v"), col("n2"))
      .write.mode("overwrite").parquet(s"$stateDir/index")
    graft.operators.SemDedup.dedupIncremental(
        s.read.parquet(s"$stateDir/index"),
        s.read.parquet(s"$stateDir/centroids"),
        fresh, "vec_id", "embedding", cosE6 = 300000L)
      .orderBy("vec_id")
  }

  /** v39: product quantization + ADC search (operators/Ann.Pq) under
    * the oracle — per-subspace codebooks with the IVF conventions
    * (lowest-id seeds, max-dot ties-lowest, trunc-mean Lloyd step),
    * m-code encoding, LUT-summed approximate dots, exact top-5. The
    * oracle re-derives every stage relationally (list slices + zipped
    * unnest dots + window argmins), so the hash match certifies the
    * whole compressed-index path. */
  def v39PqAdc(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val books = graft.operators.Pq.codebooks(emb, "vec_id", "embedding",
      m = 4, ksub = 4, dims = 64)
    val codes = graft.operators.Pq.encode(emb, "vec_id", "embedding",
      books, m = 4, dims = 64)
    graft.operators.Pq.adcSearch(codes, books,
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        m = 4, dims = 64, topK = 5)
      .orderBy("query_id", "rank")
  }

  /** v40: full Lloyd's k-means (graft.operators.Ann.lloyd) — two
    * assign→trunc-mean rounds from deterministic lowest-id seeds.
    * Output: per-cluster size of the final assignment plus the first
    * four centroid components (exact integer domain). The oracle
    * re-derives both rounds relationally, so a pass certifies the
    * iterative clustering loop itself, not just one refinement. */
  def v40KmeansClusters(s: SparkSession, dir: String): DataFrame =
    graft.operators.Ann.lloyd(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 8, iters = 2)
      .select(col("centroid_id"), col("n"),
        element_at(col("cvec"), 1).as("c1"), element_at(col("cvec"), 2).as("c2"),
        element_at(col("cvec"), 3).as("c3"), element_at(col("cvec"), 4).as("c4"))
      .orderBy("centroid_id")

  /** v41: SemDeDup (graft.operators.SemDedup) — cluster-scoped semantic
    * near-dup removal: IVF cells bound the pairwise comparisons, the
    * higher id of every ≥0.30-cosine pair is dropped. Output: every
    * vector with its cell and keep/drop verdict. */
  def v41Semdedup(s: SparkSession, dir: String): DataFrame =
    graft.operators.SemDedup.dedup(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 8, cosE6 = 300000L)
      .orderBy("vec_id")

  /** v42: int8 scalar quantization (graft.operators.VectorCompress) —
    * per-dimension global-range codes with an exact reconstruction
    * audit. The oracle re-derives stats, encode, decode, and error
    * per dimension via unnest; a pass certifies the whole compression
    * round trip bit-for-bit. */
  def v42Int8Quant(s: SparkSession, dir: String): DataFrame =
    graft.operators.VectorCompress.int8Audit(
        Tables.embeddings(s, dir), "vec_id", "embedding", dims = 64)
      .orderBy("vec_id")

  /** v43: Matryoshka truncation recall — how much of the exact top-5
    * neighbor set survives when ranking uses only the first 16 of 64
    * dimensions (the evaluation that decides whether truncated
    * embeddings are safe for coarse retrieval). Output: overlap count
    * per query, exact integer end to end. */
  def v43MatryoshkaRecall(s: SparkSession, dir: String): DataFrame = {
    val e = qEmb(s, dir)
    def topk(proj: Column => Column): DataFrame = {
      val base = e.select(col("vec_id"), proj(col("v")).as("vv"))
      val q = base.filter(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("vv").as("vq"))
      val dots = q.join(
          broadcast(base.select(col("vec_id").as("neighbor_id"), col("vv"))),
          col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          dot(col("vq"), col("vv")).as("dot"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("dot").desc, col("neighbor_id").asc)
      dots.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("query_id", "neighbor_id")
    }
    val full = topk(identity)
    val trunc = topk(v => slice(v, 1, 16)).withColumn("hit", lit(1L))
    full.join(trunc, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
      .orderBy("query_id")
  }

  /** v44: two-stage retrieval over the compressed corpus — stage 1
    * scores the full-precision query against int8-RECONSTRUCTED
    * vectors (the memory-bound first pass of a production stack:
    * 1 byte/dim resident), keeps top-20; stage 2 re-ranks those
    * candidates with exact dots, keeps top-5. Exact integer end to
    * end; the oracle re-derives stats → codes → reconstruction →
    * both ranking stages. */
  def v44Int8Rerank(s: SparkSession, dir: String): DataFrame = {
    val e = qEmb(s, dir)
    val recon = graft.operators.VectorCompress
      .reconVectors(Tables.embeddings(s, dir), "vec_id", "embedding", dims = 64)
      .select(col("vec_id").as("neighbor_id"), col("recon"))
    val q = e.filter(col("vec_id") < 30)
      .select(col("vec_id").as("query_id"), col("v").as("vq"))
    val coarse = q.join(broadcast(recon), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        dot(col("vq"), col("recon")).as("adot"))
    val w1 = Window.partitionBy("query_id")
      .orderBy(col("adot").desc, col("neighbor_id").asc)
    val cands = coarse.withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= 20).select("query_id", "neighbor_id")
    val full = e.select(col("vec_id").as("neighbor_id"), col("v"))
    val exact = cands.join(q, Seq("query_id")).join(full, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), dot(col("vq"), col("v")).as("dot"))
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("dot").desc, col("neighbor_id").asc)
    exact.withColumn("rank", row_number().over(w2)).filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dot"))
      .orderBy("query_id", "rank")
  }

  /** v45: the FUSED compressed-retrieval pipeline
    * ([[graft.operators.Pq.ivfAdcRerank]]) — v37's cell probing bounds
    * the candidates, v39's ADC LUT scores only those residents, v44's
    * exact re-rank finishes the shortlist: probe 2 cells → ADC top-20
    * → exact top-5. The production billion-vector path; the oracle
    * re-derives every stage (IVF index, PQ codebooks/codes, probing,
    * LUT sums, both rankings) relationally. */
  def v45IvfAdcRerank(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val centroids = graft.operators.Ann.buildCentroids(emb, "vec_id", "embedding", k = 8)
    val index = graft.operators.Ann.buildIndex(emb, "vec_id", "embedding", centroids)
    val books = graft.operators.Pq.codebooks(emb, "vec_id", "embedding",
      m = 4, ksub = 4, dims = 64)
    val codes = graft.operators.Pq.encode(emb, "vec_id", "embedding",
      books, m = 4, dims = 64)
    graft.operators.Pq.ivfAdcRerank(index, centroids, codes, books, emb,
        emb.filter(col("vec_id") < 30), "vec_id", "embedding",
        m = 4, dims = 64, nProbe = 2, shortlist = 20, topK = 5)
      .orderBy("query_id", "rank")
  }

  /** v46: recall evaluation of the fused compressed path — per query,
    * how many of v45's final top-5 are in the EXACT brute-force top-5
    * (the v43 shape applied to the production pipeline: the number
    * that decides whether nProbe=2/shortlist=20 are safe). */
  def v46FusedRecall(s: SparkSession, dir: String): DataFrame = {
    val fused = v45IvfAdcRerank(s, dir).select("query_id", "neighbor_id")
    val exact = bruteForceTopK(s, dir, nQueries = 30, k = 5)
      .select(col("query_id"), col("neighbor_id")).withColumn("hit", lit(1L))
    fused.join(exact, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
      .orderBy("query_id")
  }

  /** v47: embedding-space OUTLIER detection — the cleaning pass that
    * drops mis-embedded/corrupted vectors before dedup or retrieval:
    * squared distance to the assigned IVF centroid, flagged when it
    * exceeds 1.5× the cell's mean (the comparison is an integer
    * cross-multiply `d2·n·10 > Σd2·15`, so no division ever happens —
    * exact on both engines). One broadcast join for the distance, one
    * per-cell aggregate, one join back: nothing pairwise. */
  def v47EmbeddingOutliers(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val centroids = graft.operators.Ann.buildCentroids(emb, "vec_id", "embedding", k = 8)
    val index = graft.operators.Ann.buildIndex(emb, "vec_id", "embedding", centroids)
    val d2 = index.join(broadcast(centroids), Seq("centroid_id"))
      .select(col("vid"), col("centroid_id"),
        expr("aggregate(zip_with(v, cvec, (x, y) -> (x - y) * (x - y)), " +
          "CAST(0 AS BIGINT), (a, x) -> a + x)").as("d2"))
    val stats = d2.groupBy("centroid_id")
      .agg(sum("d2").as("sum_d2"), count(lit(1)).as("n"))
    d2.join(stats, Seq("centroid_id"))
      .select(col("vid").as("vec_id"), col("centroid_id"), col("d2"),
        (col("d2") * col("n") * 10 > col("sum_d2") * 15).as("is_outlier"))
      .orderBy("vec_id")
  }

  /** v50: HNSW graph ANN ([[graft.operators.Hnsw]]) — the
    * recall/latency frontier beyond IVF/PQ: 4 hash-partitioned
    * sub-graphs built independently (`mapPartitions`), searched with a
    * visited-node HARD CAP, merged by exact integer re-rank. The gate
    * require()s the real acceptance criteria against the
    * oracle-certified brute-force reference: per-shard visited counts
    * within budget (never all-pairs — at sf0.1 the cap visits ~20% of
    * each shard), mean recall@5 ≥ 0.8, every query ≥ 3/5. The OUTPUT
    * is the per-query threshold verdict, which the DuckDB oracle can
    * state independently (the graph's greedy construction itself is
    * not SQL-expressible; its numbers are require()d, spec'd in
    * HnswSpec, and deterministic by construction — hash-derived
    * levels, id-ordered insertion, id-tie-broken heaps). */
  def v50HnswRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 30)
    val maxVisits = 256
    val hnsw = graft.operators.Hnsw.annTopK(emb, "vec_id", "embedding",
      queries, k = 5, partitions = 4, m = 8, efConstruction = 64,
      efSearch = 48, maxVisits = maxVisits)
    val exact = bruteForceTopK(s, dir, nQueries = 30, k = 5)
      .select(col("query_id"), col("neighbor_id")).withColumn("hit", lit(1L))
    val scored = hnsw
      .join(exact, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"),
        max(col("visited")).as("max_visited"))
      .collect() // 30 query rows, bounded
    require(scored.length == 30, s"v50: expected 30 queries, got ${scored.length}")
    require(scored.forall(_.getAs[Int]("max_visited") <= maxVisits),
      "v50: a shard search exceeded its visited-node budget")
    val mean = scored.map(_.getAs[Long]("n_overlap")).sum.toDouble / (30 * 5)
    require(mean >= 0.8, f"v50: HNSW mean recall@5 = $mean%.3f below the 0.8 floor")
    require(scored.forall(_.getAs[Long]("n_overlap") >= 3),
      "v50: a query fell below 3/5 recall")
    s.createDataFrame(s.sparkContext.parallelize(
      scored.map(r => org.apache.spark.sql.Row(
        r.getAs[Long]("query_id"),
        r.getAs[Long]("n_overlap") >= 3)).toIndexedSeq),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("recall_ok",
          org.apache.spark.sql.types.BooleanType))))
      .orderBy("query_id")
  }

  private lazy val HnswIndexBase: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_hnsw_index_")

  /** v51: INCREMENTAL HNSW — the index-as-state leg of the graph-ANN
    * family (the v48/v49/t99 discipline applied to HNSW): the base
    * corpus (vec_id % 4 != 3) persists as 4 graph segments; two later
    * batches (% 8 == 3, % 8 == 7) append as fresh segments WITHOUT
    * touching the base (require()d: 6 segments on disk, base rows
    * byte-identical) — per-batch cost is the batch's own graph build,
    * never a corpus rebuild. A search over the stored segments must
    * then clear the same recall/budget floors as v50 against the
    * whole-corpus brute force: growing by segments loses no rows. */
  def v51HnswIncremental(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val path = HnswIndexBase.resolve("v51").toString
    graft.operators.Versioned.deleteRecursively(java.nio.file.Paths.get(path))
    val base = emb.filter(pmod(col("vec_id"), lit(4)) =!= 3)
    val batch1 = emb.filter(pmod(col("vec_id"), lit(8)) === 3)
    val batch2 = emb.filter(pmod(col("vec_id"), lit(8)) === 7)
    graft.operators.Hnsw.buildIndex(base, "vec_id", "embedding", path,
      segments = 4)
    val baseRows = s.read.parquet(path).filter(col("seg") < 4).count()
    graft.operators.Hnsw.appendBatch(path, batch1, "vec_id", "embedding")
    graft.operators.Hnsw.appendBatch(path, batch2, "vec_id", "embedding")
    val segs = s.read.parquet(path).select("seg").distinct().count()
    require(segs == 6, s"v51: expected 4 base + 2 batch segments, got $segs")
    require(s.read.parquet(path).filter(col("seg") < 4).count() == baseRows,
      "v51: appending a batch must not touch the base segments")
    val maxVisits = 256
    val queries = emb.filter(col("vec_id") < 30)
    val got = graft.operators.Hnsw.searchIndex(s, path, queries,
      "vec_id", "embedding", k = 5, efSearch = 48, maxVisits = maxVisits)
    val exact = bruteForceTopK(s, dir, nQueries = 30, k = 5)
      .select(col("query_id"), col("neighbor_id")).withColumn("hit", lit(1L))
    val scored = got.join(exact, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"),
        max(col("visited")).as("max_visited"))
      .collect()
    require(scored.length == 30, s"v51: expected 30 queries, got ${scored.length}")
    require(scored.forall(_.getAs[Int]("max_visited") <= maxVisits),
      "v51: a segment search exceeded its visited-node budget")
    val mean = scored.map(_.getAs[Long]("n_overlap")).sum.toDouble / (30 * 5)
    require(mean >= 0.8, f"v51: incremental recall@5 = $mean%.3f below 0.8")
    require(scored.forall(_.getAs[Long]("n_overlap") >= 3),
      "v51: a query fell below 3/5 recall")
    s.createDataFrame(s.sparkContext.parallelize(
      scored.map(r => org.apache.spark.sql.Row(
        r.getAs[Long]("query_id"),
        r.getAs[Long]("n_overlap") >= 3)).toIndexedSeq),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("recall_ok",
          org.apache.spark.sql.types.BooleanType))))
      .orderBy("query_id")
  }

  /** v55: FILTERED HNSW — the graph twin of v52/v53's filtered IVF:
    * top-5 among `label = 3` vectors only (~10% selectivity) through
    * the beam walk itself, which TRAVERSES disallowed nodes (graph
    * connectivity, beam guidance) while only allowed ones enter the
    * result set — the standard filtered-HNSW recipe. Post-filtering an
    * unfiltered top-ef would collapse here (ef·selectivity ≈ 5 allowed
    * survivors before rank 5 even exists); the visited cap scales by
    * ~1/selectivity exactly like v53 widens IVF probes. Floors are
    * v50's (mean recall@5 ≥ 0.8, every query ≥ 3/5, visited within
    * budget) against v52's oracle-certified restricted brute force;
    * the oracle states the per-query verdict independently. */
  def v55FilteredHnsw(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 30)
    val maxVisits = 2048 // 256 · ~(1/0.1), the selectivity-scaled budget
    val got = graft.operators.Hnsw.filteredAnnTopK(emb, "vec_id",
      "embedding", queries, k = 5, allowed = col("label") === 3,
      partitions = 4, m = 8, efConstruction = 64, efSearch = 48,
      maxVisits = maxVisits)
    // the definitionally-correct filtered top-5 (v52's oracle path:
    // exact brute force over the allowed subset)
    val exact = graft.operators.Ann.filteredSearch(
        emb, queries, "vec_id", "embedding",
        allowed = emb.filter(col("label") === 3).select("vec_id"), topK = 5)
      .select(col("query_id"), col("neighbor_id")).withColumn("hit", lit(1L))
    val scored = got
      .join(exact, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"),
        max(col("visited")).as("max_visited"))
      .collect() // 30 query rows, bounded
    require(scored.length == 30, s"v55: expected 30 queries, got ${scored.length}")
    require(scored.forall(_.getAs[Int]("max_visited") <= maxVisits),
      "v55: a shard search exceeded its visited-node budget")
    val mean = scored.map(_.getAs[Long]("n_overlap")).sum.toDouble / (30 * 5)
    require(mean >= 0.8, f"v55: filtered recall@5 = $mean%.3f below the 0.8 floor")
    require(scored.forall(_.getAs[Long]("n_overlap") >= 3),
      "v55: a query fell below 3/5 filtered recall")
    s.createDataFrame(s.sparkContext.parallelize(
      scored.map(r => org.apache.spark.sql.Row(
        r.getAs[Long]("query_id"),
        r.getAs[Long]("n_overlap") >= 3)).toIndexedSeq),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("recall_ok",
          org.apache.spark.sql.types.BooleanType))))
      .orderBy("query_id")
  }

  /** v56: HNSW soft DELETES — the index-maintenance verb the persisted
    * graph was missing (Lucene's liveDocs shape): deleting in place
    * would re-link neighbors across segments, so ids are TOMBSTONED
    * instead; every search excludes them through the filtered beam
    * walk (dead nodes still conduct — the graph stays navigable), and
    * a compaction rebuild purges them. The gate deletes ~10% of the
    * corpus from a stored index, require()s no dead id ever surfaces,
    * clears v50's recall floors against the brute force over
    * SURVIVORS, then compacts and require()s the purge (tombstone dir
    * gone, stored rows shrunk, search verdicts unchanged). */
  def v56HnswDeletes(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val path = HnswIndexBase.resolve("v56").toString
    graft.operators.Versioned.deleteRecursively(java.nio.file.Paths.get(path))
    graft.operators.Hnsw.buildIndex(emb, "vec_id", "embedding", path,
      segments = 4)
    // the delete set stays a DataFrame — predicate-derived deletions
    // never route through the driver (the collect-free scale shape)
    val deadDf = emb.filter(pmod(col("vec_id"), lit(10)) === 7)
      .select(col("vec_id"))
    graft.operators.Hnsw.deleteFromIndex(path, deadDf, "vec_id")
    val maxVisits = 512 // 256 scaled for the ~10% dead the walk skips
    val queries = emb.filter(col("vec_id") < 30)
    def runSearch() = graft.operators.Hnsw.searchIndex(s, path, queries,
      "vec_id", "embedding", k = 5, efSearch = 48, maxVisits = maxVisits)
    // exact reference over the SURVIVORS only
    val e = qEmb(s, dir).filter(pmod(col("vec_id"), lit(10)) =!= 7)
    val q = qEmb(s, dir).filter(col("vec_id") < 30)
      .select(col("vec_id").as("query_id"), col("v").as("vq"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dot").desc, col("neighbor_id").asc)
    val exact = q.join(
        broadcast(e.select(col("vec_id").as("neighbor_id"), col("v"))),
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        dot(col("vq"), col("v")).as("dot"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id")).withColumn("hit", lit(1L))
    // dead-id exclusion is checked by JOIN, never by collecting the
    // dead set (it is O(deleted) — corpus-fraction-sized at scale).
    // ONE search per phase: the same cached result feeds both the
    // dead-hit join and the recall verdicts (the gate measures the
    // engine, not 4× re-search scaffolding).
    def searchPhase(): (Long, Array[org.apache.spark.sql.Row]) = {
      val res = runSearch().cache()
      try {
        val dead = res.join(
          deadDf.withColumnRenamed("vec_id", "neighbor_id"),
          Seq("neighbor_id"), "left_semi").count()
        val scored = res
          .join(exact, Seq("query_id", "neighbor_id"), "left")
          .groupBy("query_id")
          .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"),
            max(col("visited")).as("max_visited"))
          .collect()
        (dead, scored)
      } finally res.unpersist()
    }
    val (deadHitsPre, scored) = searchPhase()
    require(deadHitsPre == 0L,
      "v56: a tombstoned id surfaced in search results")
    require(scored.length == 30, s"v56: expected 30 queries, got ${scored.length}")
    require(scored.forall(_.getAs[Int]("max_visited") <= maxVisits),
      "v56: a segment search exceeded its visited-node budget")
    val mean = scored.map(_.getAs[Long]("n_overlap")).sum.toDouble / (30 * 5)
    require(mean >= 0.8, f"v56: post-delete recall@5 = $mean%.3f below 0.8")
    require(scored.forall(_.getAs[Long]("n_overlap") >= 3),
      "v56: a query fell below 3/5 post-delete recall")
    // compaction purges the tombstones; verdicts must not move
    val rowsBefore = s.read.parquet(path).count()
    graft.operators.Hnsw.compactIndex(s, path)
    require(!java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(s"$path/_tombstones")),
      "v56: compaction must purge the tombstone sidecar")
    require(s.read.parquet(path).count() < rowsBefore,
      "v56: compaction must drop the dead rows from storage")
    val (deadHitsPost, after) = searchPhase()
    require(deadHitsPost == 0L,
      "v56: a purged id surfaced after compaction")
    require(after.map(_.getAs[Long]("n_overlap")).sum.toDouble / (30 * 5) >= 0.8,
      "v56: compacted-index recall fell below 0.8")
    s.createDataFrame(s.sparkContext.parallelize(
      scored.map(r => org.apache.spark.sql.Row(
        r.getAs[Long]("query_id"),
        r.getAs[Long]("n_overlap") >= 3)).toIndexedSeq),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("recall_ok",
          org.apache.spark.sql.types.BooleanType))))
      .orderBy("query_id")
  }

  /** v57: HYBRID lexical + vector retrieval with reciprocal-rank
    * fusion ([[graft.operators.HybridRetrieval]]) — the two-tower RAG
    * search shape: BM25 over the documents table (query = the query
    * document's first 3 tokens, self excluded) and exact-dot k-NN over
    * the aligned embeddings table (vec_id ≡ doc_id), each ranked
    * top-20 per query, fused by integer RRF (k = 60) into a top-10.
    * Queries are doc_id % 97 == 0 below 2000 — a FIXED-SIZE set (a
    * query workload does not grow with the corpus; bounding it keeps
    * the brute tower linear in corpus size — measured 10.9× at 10×
    * when the set scaled with the data, 2–3× bounded). The vector
    * tower at 100 TB swaps in the HNSW/IVF index; the fusion consumes
    * only (query, doc, rank) lists either way. The oracle re-derives
    * both towers and the fusion from the parquet alone. */
  /** v58: TIERED HNSW COMPACTION — the LSM maintenance schedule
    * ([[graft.operators.Hnsw.compactIndexTiered]]): only the small
    * fresh segments (and tombstone-heavy ones) merge; big settled
    * segments HARD-LINK through by inode, so maintenance cost tracks
    * churn, never corpus size (Lucene's tiered-merge answer — a full
    * rebuild at 100 TB would redo the terabyte graph nightly). The
    * gate appends two small segments onto a 4-segment base, deletes a
    * spread slice, tier-compacts, and require()s: exactly the small
    * segments merged, every kept segment's file carried BY INODE, the
    * merged segments' dead ids physically purged while kept segments'
    * tombstones survive, a second tiered call is a no-op, and
    * post-compaction search still clears v56's recall floors against
    * the brute force over survivors (the shared oracle contract). */
  def v58TieredCompaction(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val path = HnswIndexBase.resolve("v58").toString
    graft.operators.Versioned.deleteRecursively(java.nio.file.Paths.get(path))
    graft.operators.Hnsw.buildIndex(emb.filter(col("vec_id") >= 60),
      "vec_id", "embedding", path, segments = 4)
    graft.operators.Hnsw.appendBatch(path,
      emb.filter(col("vec_id") < 30), "vec_id", "embedding")
    graft.operators.Hnsw.appendBatch(path,
      emb.filter(col("vec_id") >= 30 && col("vec_id") < 60),
      "vec_id", "embedding")
    val deadDf = emb.filter(pmod(col("vec_id"), lit(10)) === 7)
      .select(col("vec_id"))
    graft.operators.Hnsw.deleteFromIndex(path, deadDf, "vec_id")
    def ino(p: java.nio.file.Path): Long = java.nio.file.Files
      .getAttribute(p, "unix:ino").asInstanceOf[Long]
    import org.apache.spark.sql.functions.input_file_name
    def filesOfKeptSegs(): Map[String, Long] =
      s.read.parquet(path).filter(col("seg") < 4)
        .select(input_file_name()).distinct().collect()
        .map(r => java.nio.file.Paths.get(
          new java.net.URI(r.getString(0)).getPath))
        .map(p => p.getFileName.toString -> ino(p)).toMap
    val beforeInodes = filesOfKeptSegs()
    val (merged, kept) = graft.operators.Hnsw.compactIndexTiered(s, path)
    require(merged == Set(4, 5) && kept == Set(0, 1, 2, 3),
      s"v58: tier policy must merge exactly the small segments, got " +
        s"merged=$merged kept=$kept")
    val afterInodes = filesOfKeptSegs()
    require(beforeInodes.keySet.subsetOf(afterInodes.keySet) &&
        beforeInodes.forall { case (n, i) => afterInodes(n) == i },
      "v58: kept segments' files must hard-link through the compaction")
    val segsNow = s.read.parquet(path).select("seg").distinct()
      .collect().map(_.getInt(0)).toSet
    require(segsNow == Set(0, 1, 2, 3, 6),
      s"v58: expected the merged tier as one fresh segment, got $segsNow")
    // merged segments' dead ids are PHYSICALLY gone; kept tombstones stay
    val deadSmall = s.read.parquet(path)
      .join(deadDf.filter(col("vec_id") < 60)
        .withColumnRenamed("vec_id", "id"), Seq("id"), "left_semi").count()
    require(deadSmall == 0L,
      "v58: merged segments' tombstoned rows must be purged")
    val tombPath = java.nio.file.Paths.get(s"$path/_tombstones")
    require(java.nio.file.Files.isDirectory(tombPath),
      "v58: kept segments' tombstones must survive the tiered pass")
    require(s.read.parquet(tombPath.toString)
        .filter(col("id") < 60).count() == 0L,
      "v58: purged ids must leave the tombstone sidecar")
    // a second tiered call finds nothing mergeable
    val (merged2, _) = graft.operators.Hnsw.compactIndexTiered(s, path)
    require(merged2.isEmpty, s"v58: second pass must be a no-op, got $merged2")
    // search still clears the v56 floors against survivors
    val maxVisits = 512
    val queries = emb.filter(col("vec_id") < 30)
    val res = graft.operators.Hnsw.searchIndex(s, path, queries,
      "vec_id", "embedding", k = 5, efSearch = 48, maxVisits = maxVisits)
      .cache()
    try {
      require(res.join(deadDf.withColumnRenamed("vec_id", "neighbor_id"),
          Seq("neighbor_id"), "left_semi").count() == 0L,
        "v58: a tombstoned id surfaced after tiered compaction")
      val e = qEmb(s, dir).filter(pmod(col("vec_id"), lit(10)) =!= 7)
      val q = qEmb(s, dir).filter(col("vec_id") < 30)
        .select(col("vec_id").as("query_id"), col("v").as("vq"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("dot").desc, col("neighbor_id").asc)
      val exact = q.join(
          broadcast(e.select(col("vec_id").as("neighbor_id"), col("v"))),
          col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          dot(col("vq"), col("v")).as("dot"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"))
        .withColumn("hit", lit(1L))
      val scored = res.join(exact, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"),
          max(col("visited")).as("max_visited"))
        .collect()
      require(scored.length == 30, s"v58: expected 30 queries, got ${scored.length}")
      require(scored.forall(_.getAs[Int]("max_visited") <= maxVisits),
        "v58: a segment search exceeded its visited-node budget")
      val mean = scored.map(_.getAs[Long]("n_overlap")).sum.toDouble / (30 * 5)
      require(mean >= 0.8, f"v58: post-compaction recall@5 = $mean%.3f below 0.8")
      require(scored.forall(_.getAs[Long]("n_overlap") >= 3),
        "v58: a query fell below 3/5 recall after tiered compaction")
      s.createDataFrame(s.sparkContext.parallelize(
        scored.map(r => org.apache.spark.sql.Row(
          r.getAs[Long]("query_id"),
          r.getAs[Long]("n_overlap") >= 3)).toIndexedSeq),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("query_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("recall_ok",
            org.apache.spark.sql.types.BooleanType))))
        .orderBy("query_id")
    } finally { res.unpersist(); () }
  }

  /** v59: SEMANTIC EVAL-SET DECONTAMINATION
    * ([[graft.operators.SemDedup.evalDecontaminate]]) — the
    * embedding-space leg of eval decontamination (t110 is the
    * exact-substring leg): every corpus document within cosine 0.3 of
    * ANY benchmark vector flags. The benchmark set is the bounded
    * vec_id % 97 == 0 slice — it BROADCASTS, the corpus stays one
    * scan, and the benchmark docs themselves (present in the corpus)
    * must flag at cosine 1.0 exactly (require()d). Max-cosine and the
    * verdict re-derived by DuckDB with the pinned v36 arithmetic. */
  def v59EvalDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val out = graft.operators.SemDedup.evalDecontaminate(
      emb, "vec_id", "embedding",
      emb.filter(pmod(col("vec_id"), lit(97)) === 0), "embedding",
      tauE6 = 300000L).cache()
    try {
      val selfBad = out.filter(pmod(col("vec_id"), lit(97)) === 0)
        .filter(!col("contaminated") || col("max_cos_e6") =!= 1000000L)
        .count()
      require(selfBad == 0L,
        "v59: benchmark rows present in the corpus must flag at cos 1.0")
      val n = out.count()
      val flagged = out.filter(col("contaminated")).count()
      require(flagged > 0L && flagged < n,
        s"v59: expected a proper contaminated subset, got $flagged of $n")
      out.select(col("vec_id"), col("max_cos_e6"), col("contaminated"))
        .orderBy("vec_id")
    } finally { out.unpersist(); () }
  }

  def v57HybridRrf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val qTerms = docs.filter(pmod(col("doc_id"), lit(97)) === 0 &&
        col("doc_id") < 2000)
      .select(col("doc_id").as("query_id"),
        explode(expr("slice(filter(split(text, ' '), x -> x <> ''), 1, 3)"))
          .as("term"))
    val lex = graft.operators.HybridRetrieval
      .bm25Scores(docs, "doc_id", "text", qTerms)
      .filter(col("doc_id") =!= col("query_id"))
    val wl = Window.partitionBy("query_id")
      .orderBy(col("bm25_e6").desc, col("doc_id").asc)
    val lexRanked = lex.withColumn("rank", row_number().over(wl))
      .filter(col("rank") <= 20)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val e = qEmb(s, dir)
    val qv = e.filter(pmod(col("vec_id"), lit(97)) === 0 &&
        col("vec_id") < 2000)
      .select(col("vec_id").as("query_id"), col("v").as("vq"))
    val dots = qv.join(
        broadcast(e.select(col("vec_id").as("doc_id"), col("v"))),
        col("query_id") =!= col("doc_id"))
      .select(col("query_id"), col("doc_id"),
        dot(col("vq"), col("v")).as("d"))
    val wv = Window.partitionBy("query_id")
      .orderBy(col("d").desc, col("doc_id").asc)
    val vecRanked = dots.withColumn("rank", row_number().over(wv))
      .filter(col("rank") <= 20)
      .select(col("query_id"), col("doc_id"), col("rank"))
    graft.operators.HybridRetrieval
      .rrfFuse(Seq(lexRanked, vecRanked), k = 60, topK = 10)
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, Q] = Map(
    "v57_hybrid_rrf" -> (v57HybridRrf _),
    "v58_tiered_compaction" -> (v58TieredCompaction _),
    "v59_eval_decontaminate" -> (v59EvalDecontaminate _),
    "v50_hnsw_recall" -> (v50HnswRecall _),
    "v51_hnsw_incremental" -> (v51HnswIncremental _),
    "v55_filtered_hnsw" -> (v55FilteredHnsw _),
    "v56_hnsw_deletes" -> (v56HnswDeletes _),
    "v45_ivf_adc_rerank" -> (v45IvfAdcRerank _),
    "v46_fused_recall" -> (v46FusedRecall _),
    "v47_embedding_outliers" -> (v47EmbeddingOutliers _),
    "v39_pq_adc" -> (v39PqAdc _),
    "v40_kmeans_clusters" -> (v40KmeansClusters _),
    "v43_matryoshka_recall" -> (v43MatryoshkaRecall _),
    "v44_int8_rerank" -> (v44Int8Rerank _),
    "v41_semdedup" -> (v41Semdedup _),
    "v42_int8_quant" -> (v42Int8Quant _),
    "v31_knn_bruteforce" -> (v31KnnBruteforce _),
    "v32_vector_norms" -> (v32VectorNorms _),
    "v33_label_centroids" -> (v33LabelCentroids _),
    "v34_lsh_buckets" -> (v34LshBuckets _),
    "v35_lsh_ann" -> (v35LshAnn _),
    "v36_cosine_pairs" -> (v36CosinePairs _),
    "v37_ivf_ann" -> (v37IvfAnn _),
    "v48_incremental_ivf" -> (v48IncrementalIvf _),
    "v49_incremental_semdedup" -> (v49IncrementalSemdedup _),
    "v52_filtered_ann" -> (v52FilteredAnn _),
    "v53_filtered_ivf" -> (v53FilteredIvf _),
    "v54_hard_negatives" -> (v54HardNegatives _),
    "v38_lsh_cosine_dups" -> (v38LshCosineDups _),
  )

  private val quantCte =
    """WITH q AS (SELECT vec_id, label,
      |  list_transform(embedding, x -> cast(round(cast(x as double) * 1000000.0) as bigint)) v
      | FROM embeddings)""".stripMargin

  /** Shared IVF-index derivation (v37/v40/v41): lowest-8-id seeds, one
    * assign→trunc-mean Lloyd round (`cent`), final cell assignment
    * (`idx`) — the oracle mirror of Ann.buildCentroids + buildIndex. */
  /** Index derivation for the incremental gates (v48/v49): seeds +
    * Lloyd step from the OLD half only (`oldPred`) — the stored index —
    * then ONE joint assignment of the full corpus against those
    * centroids (old assignment at build time ∪ new-batch assignment at
    * insert time coincide with it). */
  private def ivfIncrementalCteBy(oldPred: String): String = quantCte +
    s""",
      |old AS (SELECT vec_id vid, v FROM q WHERE $oldPred),""".stripMargin +
    """
      |seeds AS (SELECT cast(row_number() OVER (ORDER BY vid) as int) - 1 centroid_id, v cvec
      |          FROM (SELECT vid, v FROM old ORDER BY vid LIMIT 8)),
      |qq AS (SELECT vec_id vid, v FROM q),
      |a0d AS (SELECT vid, centroid_id, cast(sum(x*y) as bigint) d
      |        FROM (SELECT old.vid, s.centroid_id, unnest(old.v) x, unnest(s.cvec) y
      |              FROM old, seeds s)
      |        GROUP BY vid, centroid_id),
      |a0 AS (SELECT vid, centroid_id FROM (
      |         SELECT vid, centroid_id,
      |           row_number() OVER (PARTITION BY vid ORDER BY d DESC, centroid_id ASC) rn
      |         FROM a0d) WHERE rn = 1),
      |cmeans AS (SELECT centroid_id, pos, cast(trunc(sum(x) * 1.0 / count(x)) as bigint) cx
      |           FROM (SELECT a0.centroid_id, unnest(old.v) x, unnest(range(len(old.v))) pos
      |                 FROM a0 JOIN old USING (vid))
      |           GROUP BY centroid_id, pos),
      |cent AS (SELECT centroid_id, list(cx ORDER BY pos) cvec FROM cmeans GROUP BY centroid_id),
      |idxd AS (SELECT vid, centroid_id, cast(sum(x*y) as bigint) d
      |         FROM (SELECT qq.vid, c.centroid_id, unnest(qq.v) x, unnest(c.cvec) y
      |               FROM qq, cent c)
      |         GROUP BY vid, centroid_id),
      |idx AS (SELECT vid, centroid_id FROM (
      |          SELECT vid, centroid_id,
      |            row_number() OVER (PARTITION BY vid ORDER BY d DESC, centroid_id ASC) rn
      |          FROM idxd) WHERE rn = 1)""".stripMargin

  /** The v37 probe/rank search block — shared verbatim by the full and
    * incremental index oracles (both expose `qq`, `cent`, `idx`). */
  private val ivfSearchSql =
    """,
      |qv AS (SELECT vid query_id, v FROM qq WHERE vid < 50),
      |celld AS (SELECT query_id, centroid_id, cast(sum(x*y) as bigint) cd
      |          FROM (SELECT qv.query_id, c.centroid_id, unnest(qv.v) x, unnest(c.cvec) y
      |                FROM qv, cent c)
      |          GROUP BY query_id, centroid_id),
      |probed AS (SELECT query_id, centroid_id FROM (
      |             SELECT query_id, centroid_id,
      |               row_number() OVER (PARTITION BY query_id ORDER BY cd DESC, centroid_id ASC) rn
      |             FROM celld) WHERE rn <= 2),
      |cands AS (SELECT query_id, neighbor_id, cast(sum(x*y) as bigint) dot
      |          FROM (SELECT p.query_id, i.vid neighbor_id, unnest(qs.v) x, unnest(q2.v) y
      |                FROM probed p JOIN idx i USING (centroid_id)
      |                JOIN qv qs ON qs.query_id = p.query_id
      |                JOIN qq q2 ON q2.vid = i.vid
      |                WHERE i.vid <> p.query_id)
      |          GROUP BY query_id, neighbor_id),
      |rk AS (SELECT query_id, neighbor_id, dot,
      |         cast(row_number() OVER (PARTITION BY query_id
      |                                 ORDER BY dot DESC, neighbor_id ASC) as int) rank
      |       FROM cands)
      |SELECT query_id, rank, neighbor_id, dot FROM rk
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private val ivfIndexCte = quantCte +
    """,
      |seeds AS (SELECT cast(row_number() OVER (ORDER BY vid) as int) - 1 centroid_id, v cvec
      |          FROM (SELECT vec_id vid, v FROM q ORDER BY vec_id LIMIT 8)),
      |qq AS (SELECT vec_id vid, v FROM q),
      |a0d AS (SELECT vid, centroid_id, cast(sum(x*y) as bigint) d
      |        FROM (SELECT qq.vid, s.centroid_id, unnest(qq.v) x, unnest(s.cvec) y
      |              FROM qq, seeds s)
      |        GROUP BY vid, centroid_id),
      |a0 AS (SELECT vid, centroid_id FROM (
      |         SELECT vid, centroid_id,
      |           row_number() OVER (PARTITION BY vid ORDER BY d DESC, centroid_id ASC) rn
      |         FROM a0d) WHERE rn = 1),
      |cmeans AS (SELECT centroid_id, pos, cast(trunc(sum(x) * 1.0 / count(x)) as bigint) cx
      |           FROM (SELECT a0.centroid_id, unnest(qq.v) x, unnest(range(len(qq.v))) pos
      |                 FROM a0 JOIN qq USING (vid))
      |           GROUP BY centroid_id, pos),
      |cent AS (SELECT centroid_id, list(cx ORDER BY pos) cvec FROM cmeans GROUP BY centroid_id),
      |idxd AS (SELECT vid, centroid_id, cast(sum(x*y) as bigint) d
      |         FROM (SELECT qq.vid, c.centroid_id, unnest(qq.v) x, unnest(c.cvec) y
      |               FROM qq, cent c)
      |         GROUP BY vid, centroid_id),
      |idx AS (SELECT vid, centroid_id FROM (
      |          SELECT vid, centroid_id,
      |            row_number() OVER (PARTITION BY vid ORDER BY d DESC, centroid_id ASC) rn
      |          FROM idxd) WHERE rn = 1)""".stripMargin

  /** PQ codebook/encode derivation with p-prefixed names so it can
    * compose with [[ivfIndexCte]] (whose seeds/cent names it would
    * otherwise collide with) — the v39 recipe verbatim: 4 subspaces ×
    * 16 dims, lowest-id seeds, max-dot ties-lowest, one trunc-mean
    * Lloyd step, codes by the same argmax. */
  private val pqCtes =
    """,
      |qs AS (SELECT vec_id vid, r.sub,
      |         v[r.sub*16+1 : r.sub*16+16] sv
      |       FROM q, (SELECT unnest(range(4)) sub) r),
      |ps AS (SELECT sub, cast(rn-1 as int) centroid_id, sv cvec FROM (
      |         SELECT sub, sv,
      |           row_number() OVER (PARTITION BY sub ORDER BY vid) rn
      |         FROM qs) WHERE rn <= 4),
      |pa0d AS (SELECT vid, sub, centroid_id, cast(sum(x*y) as bigint) d
      |         FROM (SELECT qs.vid, qs.sub, s.centroid_id,
      |                 unnest(qs.sv) x, unnest(s.cvec) y
      |               FROM qs JOIN ps s ON qs.sub = s.sub)
      |         GROUP BY vid, sub, centroid_id),
      |pa0 AS (SELECT vid, sub, centroid_id FROM (
      |          SELECT vid, sub, centroid_id,
      |            row_number() OVER (PARTITION BY vid, sub
      |                               ORDER BY d DESC, centroid_id ASC) rn
      |          FROM pa0d) WHERE rn = 1),
      |pcm AS (SELECT sub, centroid_id, pos,
      |          cast(trunc(sum(x) * 1.0 / count(x)) as bigint) cx
      |        FROM (SELECT pa0.sub, pa0.centroid_id,
      |                unnest(qs.sv) x, unnest(range(len(qs.sv))) pos
      |              FROM pa0 JOIN qs ON pa0.vid = qs.vid AND pa0.sub = qs.sub)
      |        GROUP BY sub, centroid_id, pos),
      |pcent AS (SELECT sub, centroid_id, list(cx ORDER BY pos) cvec
      |          FROM pcm GROUP BY sub, centroid_id),
      |encd AS (SELECT vid, sub, centroid_id, cast(sum(x*y) as bigint) d
      |         FROM (SELECT qs.vid, qs.sub, c.centroid_id,
      |                 unnest(qs.sv) x, unnest(c.cvec) y
      |               FROM qs JOIN pcent c ON qs.sub = c.sub)
      |         GROUP BY vid, sub, centroid_id),
      |enc AS (SELECT vid, sub, centroid_id code FROM (
      |          SELECT vid, sub, centroid_id,
      |            row_number() OVER (PARTITION BY vid, sub
      |                               ORDER BY d DESC, centroid_id ASC) rn
      |          FROM encd) WHERE rn = 1)""".stripMargin

  /** The fused pipeline's full CTE chain (shared by v45 and the v46
    * recall evaluation): shared IVF index (cent/idx) + PQ codebooks
    * and codes (p-prefixed CTEs) + 2-probe cell selection + LUT-sum
    * ADC over probed residents + top-20 shortlist + exact top-5 in
    * `rk`. */
  private val fusedCtes =
    (ivfIndexCte + pqCtes +
      """,
        |qv AS (SELECT vid query_id, v FROM qq WHERE vid < 30),
        |celld AS (SELECT query_id, centroid_id, cast(sum(x*y) as bigint) cd
        |          FROM (SELECT qv.query_id, c.centroid_id,
        |                  unnest(qv.v) x, unnest(c.cvec) y
        |                FROM qv, cent c)
        |          GROUP BY query_id, centroid_id),
        |probed AS (SELECT query_id, centroid_id FROM (
        |             SELECT query_id, centroid_id,
        |               row_number() OVER (PARTITION BY query_id
        |                                  ORDER BY cd DESC, centroid_id ASC) rn
        |             FROM celld) WHERE rn <= 2),
        |resid AS (SELECT p.query_id, i.vid neighbor_id
        |          FROM probed p JOIN idx i USING (centroid_id)
        |          WHERE i.vid <> p.query_id),
        |lut AS (SELECT query_id, sub, centroid_id, cast(sum(x*y) as bigint) pd
        |        FROM (SELECT qs.vid query_id, qs.sub, c.centroid_id,
        |                unnest(qs.sv) x, unnest(c.cvec) y
        |              FROM qs JOIN pcent c ON qs.sub = c.sub
        |              WHERE qs.vid < 30)
        |        GROUP BY query_id, sub, centroid_id),
        |adc AS (SELECT r.query_id, r.neighbor_id, cast(sum(l.pd) as bigint) adot
        |        FROM resid r JOIN enc e ON e.vid = r.neighbor_id
        |        JOIN lut l ON l.query_id = r.query_id AND l.sub = e.sub
        |                  AND l.centroid_id = e.code
        |        GROUP BY r.query_id, r.neighbor_id),
        |shl AS (SELECT query_id, neighbor_id FROM (
        |          SELECT query_id, neighbor_id,
        |            row_number() OVER (PARTITION BY query_id
        |                               ORDER BY adot DESC, neighbor_id ASC) rn
        |          FROM adc) WHERE rn <= 20),
        |exact AS (SELECT query_id, neighbor_id, cast(sum(x*y) as bigint) dot
        |          FROM (SELECT sh.query_id, sh.neighbor_id,
        |                  unnest(qv.v) x, unnest(f.v) y
        |                FROM shl sh JOIN qv ON qv.query_id = sh.query_id
        |                JOIN qq f ON f.vid = sh.neighbor_id)
        |          GROUP BY query_id, neighbor_id),
        |rk AS (SELECT query_id, neighbor_id, dot,
        |         cast(row_number() OVER (PARTITION BY query_id
        |                ORDER BY dot DESC, neighbor_id ASC) as int) rank
        |       FROM exact)""".stripMargin)

  val oracles: Map[String, String] = Map(
    // v57: both towers and the fusion re-derived from the parquet —
    // BM25 quantized once per (query, term-slot, doc) with the pinned
    // float expression shape, exact-dot vector ranks, integer RRF
    // v59: max eval cosine + verdict re-derived — same quantization,
    // same integer dots, same one-double-divide + half-up round
    "v59_eval_decontaminate" ->
      (quantCte + """,
        |n AS (SELECT vec_id, cast(sum(x*x) as bigint) n2
        |      FROM (SELECT vec_id, unnest(v) x FROM q) GROUP BY vec_id),
        |pairs AS (SELECT c.vec_id, e.vec_id eid, c.v va, e.v vb
        |          FROM q c CROSS JOIN
        |            (SELECT vec_id, v FROM q WHERE vec_id % 97 = 0) e),
        |dots AS (SELECT vec_id, eid, cast(sum(x*y) as bigint) d
        |         FROM (SELECT vec_id, eid, unnest(va) x, unnest(vb) y
        |               FROM pairs)
        |         GROUP BY 1, 2),
        |cos AS (SELECT dots.vec_id,
        |    cast(round(d * 1000000.0 /
        |      (sqrt(cast(nc.n2 as double)) * sqrt(cast(ne.n2 as double))))
        |      as bigint) cs
        |  FROM dots
        |  JOIN n nc ON nc.vec_id = dots.vec_id
        |  JOIN n ne ON ne.vec_id = dots.eid)
        |SELECT vec_id, cast(max(cs) as bigint) max_cos_e6,
        |  max(cs) >= 300000 AS contaminated
        |FROM cos GROUP BY vec_id ORDER BY vec_id""".stripMargin),
    // v58: v56's verdict contract shared — the tier-compacted index
    // must clear the same floors against the brute force over
    // survivors; the inode/purge/no-op proofs live in-gate
    "v58_tiered_compaction" ->
      """SELECT vec_id AS query_id, true AS recall_ok
        |FROM embeddings WHERE vec_id < 30
        |ORDER BY query_id""".stripMargin,
    "v57_hybrid_rrf" ->
      """WITH tk AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') w
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(w) t FROM tk),
        |dl AS (SELECT doc_id, cast(count(*) as bigint) dl
        |       FROM tok GROUP BY 1),
        |st AS (SELECT cast(count(*) as bigint) nn,
        |              cast(sum(dl) as bigint) tl FROM dl),
        |tf AS (SELECT doc_id, t, cast(count(*) as bigint) tf
        |       FROM tok GROUP BY 1, 2),
        |dfq AS (SELECT t, cast(count(*) as bigint) df FROM tf GROUP BY 1),
        |qt AS (SELECT doc_id AS query_id, unnest(w[1:3]) term
        |       FROM tk WHERE doc_id % 97 = 0 AND doc_id < 2000),
        |ls AS (SELECT qt.query_id, tf.doc_id,
        |    cast(floor(1000000.0 * ln((nn + 1)::DOUBLE / (df + 1)) *
        |      (tf * 2.2) /
        |      (tf + 1.2 * (0.25 + 0.75 * ((dl.dl * nn)::DOUBLE / tl))) +
        |      0.5) as bigint) s
        |  FROM qt JOIN tf ON tf.t = qt.term
        |  JOIN dfq ON dfq.t = qt.term
        |  JOIN dl ON dl.doc_id = tf.doc_id
        |  CROSS JOIN st
        |  WHERE tf.doc_id <> qt.query_id),
        |lex AS (SELECT query_id, doc_id, cast(sum(s) as bigint) sc
        |        FROM ls GROUP BY 1, 2),
        |lexr AS (SELECT query_id, doc_id, row_number() OVER (
        |    PARTITION BY query_id ORDER BY sc DESC, doc_id) rnk FROM lex),
        |qv AS (SELECT vec_id, list_transform(embedding,
        |    x -> cast(round(cast(x as double) * 1000000.0) as bigint)) v
        |  FROM embeddings),
        |pairs AS (SELECT a.vec_id query_id, b.vec_id doc_id, a.v va, b.v vb
        |          FROM qv a, qv b
        |          WHERE a.vec_id % 97 = 0 AND a.vec_id < 2000
        |            AND a.vec_id <> b.vec_id),
        |dots AS (SELECT query_id, doc_id, cast(sum(x * y) as bigint) d
        |         FROM (SELECT query_id, doc_id, unnest(va) x, unnest(vb) y
        |               FROM pairs)
        |         GROUP BY 1, 2),
        |vecr AS (SELECT query_id, doc_id, row_number() OVER (
        |    PARTITION BY query_id ORDER BY d DESC, doc_id) rnk FROM dots),
        |c AS (
        |  SELECT query_id, doc_id, 1000000 // (60 + rnk) c
        |  FROM lexr WHERE rnk <= 20
        |  UNION ALL
        |  SELECT query_id, doc_id, 1000000 // (60 + rnk) c
        |  FROM vecr WHERE rnk <= 20),
        |f AS (SELECT query_id, doc_id, cast(sum(c) as bigint) rrf_e6
        |      FROM c GROUP BY 1, 2),
        |fr AS (SELECT query_id, doc_id, rrf_e6,
        |    cast(row_number() OVER (PARTITION BY query_id
        |      ORDER BY rrf_e6 DESC, doc_id) as int) rank FROM f)
        |SELECT query_id, rank, doc_id, rrf_e6 FROM fr
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // v50: the graph build is not SQL-expressible; the recall and
    // budget numbers are require()d in-gate against the v31-oracled
    // exact reference, and the oracle independently states the
    // per-query verdict the gate must reach — a query slipping below
    // the 3/5 floor breaks the hash
    "v50_hnsw_recall" ->
      """SELECT vec_id AS query_id, true AS recall_ok
        |FROM embeddings WHERE vec_id < 30
        |ORDER BY query_id""".stripMargin,
    // v51: same verdict contract as v50 — the segmented incremental
    // index must clear the same floors as the one-shot build
    "v51_hnsw_incremental" ->
      """SELECT vec_id AS query_id, true AS recall_ok
        |FROM embeddings WHERE vec_id < 30
        |ORDER BY query_id""".stripMargin,
    // v55: same verdict contract — the filtered beam walk must clear
    // v50's floors against the RESTRICTED (label = 3) brute force
    "v55_filtered_hnsw" ->
      """SELECT vec_id AS query_id, true AS recall_ok
        |FROM embeddings WHERE vec_id < 30
        |ORDER BY query_id""".stripMargin,
    // v56: same verdict contract — the tombstoned index must clear the
    // floors against the brute force over SURVIVORS, pre- and
    // post-compaction, with dead-id exclusion require()d in-gate
    "v56_hnsw_deletes" ->
      """SELECT vec_id AS query_id, true AS recall_ok
        |FROM embeddings WHERE vec_id < 30
        |ORDER BY query_id""".stripMargin,
    "v45_ivf_adc_rerank" ->
      (fusedCtes +
      """
        |SELECT query_id, rank, neighbor_id, dot FROM rk
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
    "v46_fused_recall" ->
      // recall of the compressed path against the exact brute-force
      // top-5 — the evaluation that tunes nProbe/shortlist
      (fusedCtes +
      """,
        |fused AS (SELECT query_id, neighbor_id FROM rk WHERE rank <= 5),
        |bfd AS (SELECT query_id, neighbor_id, cast(sum(x*y) as bigint) dot
        |        FROM (SELECT qv.query_id, f.vid neighbor_id,
        |                unnest(qv.v) x, unnest(f.v) y
        |              FROM qv, qq f WHERE f.vid <> qv.query_id)
        |        GROUP BY 1, 2),
        |bfr AS (SELECT query_id, neighbor_id FROM (
        |          SELECT query_id, neighbor_id,
        |            row_number() OVER (PARTITION BY query_id
        |                               ORDER BY dot DESC, neighbor_id) rn
        |          FROM bfd) WHERE rn <= 5)
        |SELECT f.query_id, cast(count(b.neighbor_id) as bigint) n_overlap
        |FROM fused f LEFT JOIN bfr b
        |  ON f.query_id = b.query_id AND f.neighbor_id = b.neighbor_id
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    "v47_embedding_outliers" ->
      // distance to the assigned centroid on the shared IVF CTE; the
      // 1.5x-mean flag as an integer cross-multiply
      (ivfIndexCte +
      """,
        |dd AS (SELECT vid, centroid_id, cast(sum((x - y) * (x - y)) as bigint) d2
        |       FROM (SELECT i.vid, i.centroid_id, unnest(q2.v) x, unnest(c.cvec) y
        |             FROM idx i JOIN qq q2 USING (vid)
        |             JOIN cent c USING (centroid_id))
        |       GROUP BY vid, centroid_id),
        |st AS (SELECT centroid_id, cast(sum(d2) as bigint) sum_d2,
        |         cast(count(*) as bigint) n
        |       FROM dd GROUP BY 1)
        |SELECT dd.vid vec_id, dd.centroid_id, dd.d2,
        |  (dd.d2 * st.n * 10 > st.sum_d2 * 15) is_outlier
        |FROM dd JOIN st USING (centroid_id) ORDER BY vec_id""".stripMargin),
    "v44_int8_rerank" ->
      // stats → codes → reconstruction (v42's law) → coarse top-20 on
      // reconstructed dots → exact top-5 re-rank
      (quantCte +
      """,
        |e2 AS (SELECT vec_id, unnest(v) x, unnest(range(len(v))) pos FROM q),
        |st AS (SELECT pos, min(x) mn, max(x) mx FROM e2 GROUP BY pos),
        |rc AS (SELECT vec_id, pos, mn +
        |         CASE WHEN mx > mn
        |              THEN ((CASE WHEN mx > mn
        |                          THEN ((x - mn) * 255) // (mx - mn)
        |                          ELSE 0 END) * (mx - mn)) // 255
        |              ELSE 0 END r
        |       FROM (SELECT vec_id, pos, x, mn, mx FROM e2 JOIN st USING (pos))),
        |recon AS (SELECT vec_id, list(r ORDER BY pos) rv FROM rc GROUP BY vec_id),
        |qv AS (SELECT vec_id query_id, v FROM q WHERE vec_id < 30),
        |coarsed AS (SELECT query_id, neighbor_id, cast(sum(x*y) as bigint) adot
        |            FROM (SELECT qv.query_id, r.vec_id neighbor_id,
        |                    unnest(qv.v) x, unnest(r.rv) y
        |                  FROM qv, recon r WHERE r.vec_id <> qv.query_id)
        |            GROUP BY 1, 2),
        |cand AS (SELECT query_id, neighbor_id FROM (
        |           SELECT query_id, neighbor_id,
        |             row_number() OVER (PARTITION BY query_id
        |                                ORDER BY adot DESC, neighbor_id) rn
        |           FROM coarsed) WHERE rn <= 20),
        |exact AS (SELECT query_id, neighbor_id, cast(sum(x*y) as bigint) dot
        |          FROM (SELECT cd.query_id, cd.neighbor_id,
        |                  unnest(qv.v) x, unnest(f.v) y
        |                FROM cand cd JOIN qv ON qv.query_id = cd.query_id
        |                             JOIN q f ON f.vec_id = cd.neighbor_id)
        |          GROUP BY 1, 2),
        |rk AS (SELECT query_id, neighbor_id, dot,
        |         cast(row_number() OVER (PARTITION BY query_id
        |                ORDER BY dot DESC, neighbor_id) as int) rank
        |       FROM exact)
        |SELECT query_id, rank, neighbor_id, dot FROM rk
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
    "v43_matryoshka_recall" ->
      (quantCte +
      """,
        |qv AS (SELECT vec_id query_id, v FROM q WHERE vec_id < 50),
        |fdots AS (SELECT query_id, neighbor_id, cast(sum(x*y) as bigint) dot
        |          FROM (SELECT qv.query_id, f.vec_id neighbor_id,
        |                  unnest(qv.v) x, unnest(f.v) y
        |                FROM qv, q f WHERE f.vec_id <> qv.query_id)
        |          GROUP BY 1, 2),
        |frk AS (SELECT query_id, neighbor_id FROM (
        |          SELECT query_id, neighbor_id,
        |            row_number() OVER (PARTITION BY query_id
        |                               ORDER BY dot DESC, neighbor_id) rn
        |          FROM fdots) WHERE rn <= 5),
        |tdots AS (SELECT query_id, neighbor_id, cast(sum(x*y) as bigint) dot
        |          FROM (SELECT qv.query_id, f.vec_id neighbor_id,
        |                  unnest(qv.v[1:16]) x, unnest(f.v[1:16]) y
        |                FROM qv, q f WHERE f.vec_id <> qv.query_id)
        |          GROUP BY 1, 2),
        |trk AS (SELECT query_id, neighbor_id FROM (
        |          SELECT query_id, neighbor_id,
        |            row_number() OVER (PARTITION BY query_id
        |                               ORDER BY dot DESC, neighbor_id) rn
        |          FROM tdots) WHERE rn <= 5)
        |SELECT f.query_id, cast(count(t.neighbor_id) as bigint) n_overlap
        |FROM frk f LEFT JOIN trk t
        |  ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    "v42_int8_quant" ->
      // independent per-dimension derivation: global [mn, mx] per pos,
      // floor-division encode/decode (inputs non-negative after x-mn,
      // so DuckDB's floor-// equals Spark's floor(double))
      (quantCte +
      """,
        |e AS (SELECT vec_id, unnest(v) x, unnest(range(len(v))) pos FROM q),
        |st AS (SELECT pos, min(x) mn, max(x) mx FROM e GROUP BY pos),
        |c AS (SELECT vec_id, x, mn, mx,
        |        CASE WHEN mx > mn THEN ((x - mn) * 255) // (mx - mn) ELSE 0 END code
        |      FROM e JOIN st USING (pos)),
        |r AS (SELECT vec_id, x, code,
        |        mn + CASE WHEN mx > mn THEN (code * (mx - mn)) // 255 ELSE 0 END recon
        |      FROM c)
        |SELECT vec_id, cast(sum(code) as bigint) sum_code,
        |  cast(max(abs(x - recon)) as bigint) max_err,
        |  cast(sum(abs(x - recon)) as bigint) sum_err
        |FROM r GROUP BY vec_id ORDER BY vec_id""".stripMargin),
    "v40_kmeans_clusters" ->
      // second Lloyd round on top of the shared IVF CTE: idx IS the
      // round-2 assignment; m2/cent2 are its trunc-toward-zero means
      (ivfIndexCte +
      """,
        |m2 AS (SELECT centroid_id, pos, cast(trunc(sum(x) * 1.0 / count(x)) as bigint) cx
        |       FROM (SELECT idx.centroid_id, unnest(qq.v) x, unnest(range(len(qq.v))) pos
        |             FROM idx JOIN qq USING (vid))
        |       GROUP BY centroid_id, pos),
        |cent2 AS (SELECT centroid_id, list(cx ORDER BY pos) cvec FROM m2 GROUP BY centroid_id),
        |sizes AS (SELECT centroid_id, cast(count(*) as bigint) n FROM idx GROUP BY centroid_id)
        |SELECT c.centroid_id, s.n,
        |  c.cvec[1] AS c1, c.cvec[2] AS c2, c.cvec[3] AS c3, c.cvec[4] AS c4
        |FROM cent2 c JOIN sizes s USING (centroid_id)
        |ORDER BY c.centroid_id""".stripMargin),
    "v41_semdedup" ->
      // within-cluster pairwise cosine on the shared assignment; the
      // higher vid of every pair over the threshold is dropped
      (ivfIndexCte +
      """,
        |nn AS (SELECT vid, cast(sum(x*x) as bigint) n2
        |       FROM (SELECT vid, unnest(v) x FROM qq) GROUP BY vid),
        |iv AS (SELECT idx.vid, idx.centroid_id, qq.v FROM idx JOIN qq USING (vid)),
        |pairs AS (SELECT a.vid va, b.vid vb, a.v pa, b.v pb
        |          FROM iv a JOIN iv b
        |            ON a.centroid_id = b.centroid_id AND a.vid < b.vid),
        |dots AS (SELECT va, vb, cast(sum(x*y) as bigint) d
        |         FROM (SELECT va, vb, unnest(pa) x, unnest(pb) y FROM pairs)
        |         GROUP BY va, vb),
        |dropped AS (SELECT DISTINCT vb AS vid
        |            FROM dots JOIN nn na ON na.vid = dots.va
        |                      JOIN nn nb ON nb.vid = dots.vb
        |            WHERE round(d * 1000000.0 /
        |                    (sqrt(cast(na.n2 as double)) * sqrt(cast(nb.n2 as double)))) >= 300000)
        |SELECT idx.vid AS vec_id, idx.centroid_id,
        |  (dropped.vid IS NULL) AS kept
        |FROM idx LEFT JOIN dropped ON idx.vid = dropped.vid
        |ORDER BY vec_id""".stripMargin),
    "v39_pq_adc" ->
      // independent PQ derivation: 4 subspaces × 16 dims, 4 codewords
      // each; same seed/assignment/mean conventions as the v37 oracle
      (quantCte +
      """,
        |qs AS (SELECT vec_id vid, r.sub,
        |         v[r.sub*16+1 : r.sub*16+16] sv
        |       FROM q, (SELECT unnest(range(4)) sub) r),
        |seeds AS (SELECT sub, cast(rn-1 as int) centroid_id, sv cvec FROM (
        |           SELECT sub, sv,
        |             row_number() OVER (PARTITION BY sub ORDER BY vid) rn
        |           FROM qs) WHERE rn <= 4),
        |a0d AS (SELECT vid, sub, centroid_id, cast(sum(x*y) as bigint) d
        |        FROM (SELECT qs.vid, qs.sub, s.centroid_id,
        |                unnest(qs.sv) x, unnest(s.cvec) y
        |              FROM qs JOIN seeds s ON qs.sub = s.sub)
        |        GROUP BY vid, sub, centroid_id),
        |a0 AS (SELECT vid, sub, centroid_id FROM (
        |         SELECT vid, sub, centroid_id,
        |           row_number() OVER (PARTITION BY vid, sub
        |                              ORDER BY d DESC, centroid_id ASC) rn
        |         FROM a0d) WHERE rn = 1),
        |cmeans AS (SELECT sub, centroid_id, pos,
        |             cast(trunc(sum(x) * 1.0 / count(x)) as bigint) cx
        |           FROM (SELECT a0.sub, a0.centroid_id,
        |                   unnest(qs.sv) x, unnest(range(len(qs.sv))) pos
        |                 FROM a0 JOIN qs ON a0.vid = qs.vid AND a0.sub = qs.sub)
        |           GROUP BY sub, centroid_id, pos),
        |cent AS (SELECT sub, centroid_id, list(cx ORDER BY pos) cvec
        |         FROM cmeans GROUP BY sub, centroid_id),
        |encd AS (SELECT vid, sub, centroid_id, cast(sum(x*y) as bigint) d
        |         FROM (SELECT qs.vid, qs.sub, c.centroid_id,
        |                 unnest(qs.sv) x, unnest(c.cvec) y
        |               FROM qs JOIN cent c ON qs.sub = c.sub)
        |         GROUP BY vid, sub, centroid_id),
        |enc AS (SELECT vid, sub, centroid_id code FROM (
        |          SELECT vid, sub, centroid_id,
        |            row_number() OVER (PARTITION BY vid, sub
        |                               ORDER BY d DESC, centroid_id ASC) rn
        |          FROM encd) WHERE rn = 1),
        |lut AS (SELECT query_id, sub, centroid_id, cast(sum(x*y) as bigint) pd
        |        FROM (SELECT qs.vid query_id, qs.sub, c.centroid_id,
        |                unnest(qs.sv) x, unnest(c.cvec) y
        |              FROM qs JOIN cent c ON qs.sub = c.sub
        |              WHERE qs.vid < 20)
        |        GROUP BY query_id, sub, centroid_id),
        |approx AS (SELECT l.query_id, e.vid neighbor_id,
        |             cast(sum(l.pd) as bigint) adot
        |           FROM enc e JOIN lut l
        |             ON e.sub = l.sub AND e.code = l.centroid_id
        |           WHERE e.vid <> l.query_id
        |           GROUP BY l.query_id, e.vid),
        |rk AS (SELECT query_id, neighbor_id, adot,
        |         cast(row_number() OVER (PARTITION BY query_id
        |                ORDER BY adot DESC, neighbor_id ASC) as int) rank
        |       FROM approx)
        |SELECT query_id, rank, neighbor_id, adot FROM rk
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
    "v31_knn_bruteforce" ->
      (quantCte +
      """,
        |pairs AS (SELECT a.vec_id query_id, b.vec_id neighbor_id, a.v va, b.v vb
        |          FROM q a, q b WHERE a.vec_id < 100 AND a.vec_id <> b.vec_id),
        |dots AS (SELECT query_id, neighbor_id, cast(sum(x*y) as bigint) dot
        |         FROM (SELECT query_id, neighbor_id, unnest(va) x, unnest(vb) y FROM pairs)
        |         GROUP BY query_id, neighbor_id),
        |rk AS (SELECT query_id, neighbor_id, dot,
        |        cast(row_number() OVER (PARTITION BY query_id
        |                                ORDER BY dot DESC, neighbor_id ASC) as int) rank
        |       FROM dots)
        |SELECT query_id, rank, neighbor_id, dot FROM rk
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
    "v32_vector_norms" ->
      (quantCte +
      """
        |SELECT vec_id, label, cast(sum(x*x) as bigint) AS norm2_e12
        |FROM (SELECT vec_id, label, unnest(v) x FROM q)
        |GROUP BY vec_id, label ORDER BY vec_id""".stripMargin),
    "v33_label_centroids" ->
      (quantCte +
      """
        |SELECT label, cast(count(*) as bigint) AS n,
        | cast(sum(v[1]) as bigint) AS s0, cast(sum(v[2]) as bigint) AS s1,
        | cast(sum(v[3]) as bigint) AS s2, cast(sum(v[4]) as bigint) AS s3
        |FROM q GROUP BY label ORDER BY label""".stripMargin),
    "v34_lsh_buckets" ->
      """SELECT (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
        |      + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
        |      + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
        |      + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END
        |      + CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END
        |      + CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END
        |      + CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END
        |      + CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END) AS bucket,
        | cast(count(*) as bigint) AS n_vecs
        |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin,
    "v35_lsh_ann" ->
      """WITH e AS (SELECT vec_id,
        |  (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
        | + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
        | + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
        | + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END
        | + CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END
        | + CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END
        | + CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END
        | + CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END) bucket,
        |  list_transform(embedding, x -> cast(round(cast(x as double) * 1000000.0) as bigint)) v
        | FROM embeddings),
        |pairs AS (SELECT a.vec_id query_id, b.vec_id neighbor_id, a.v va, b.v vb
        |          FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        |          WHERE a.vec_id < 100),
        |dots AS (SELECT query_id, neighbor_id, cast(sum(x*y) as bigint) dot
        |         FROM (SELECT query_id, neighbor_id, unnest(va) x, unnest(vb) y FROM pairs)
        |         GROUP BY query_id, neighbor_id),
        |rk AS (SELECT query_id, neighbor_id, dot,
        |        cast(row_number() OVER (PARTITION BY query_id
        |                                ORDER BY dot DESC, neighbor_id ASC) as int) rank
        |       FROM dots)
        |SELECT query_id, rank, neighbor_id, dot FROM rk
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "v36_cosine_pairs" ->
      (quantCte +
      """,
        |f AS (SELECT vec_id, v FROM q WHERE vec_id < 100),
        |n AS (SELECT vec_id, cast(sum(x*x) as bigint) n2
        |      FROM (SELECT vec_id, unnest(v) x FROM f) GROUP BY vec_id),
        |pairs AS (SELECT a.vec_id vec_a, b.vec_id vec_b, a.v va, b.v vb
        |          FROM f a JOIN f b ON a.vec_id < b.vec_id),
        |dots AS (SELECT vec_a, vec_b, cast(sum(x*y) as bigint) d
        |         FROM (SELECT vec_a, vec_b, unnest(va) x, unnest(vb) y FROM pairs)
        |         GROUP BY vec_a, vec_b)
        |SELECT vec_a, vec_b,
        | cast(round(d * 1000000.0 / (sqrt(cast(na.n2 as double)) * sqrt(cast(nb.n2 as double)))) as bigint) AS cos_e6
        |FROM dots JOIN n na ON na.vec_id = vec_a JOIN n nb ON nb.vec_id = vec_b
        |WHERE round(d * 1000000.0 / (sqrt(cast(na.n2 as double)) * sqrt(cast(nb.n2 as double)))) >= 300000
        |ORDER BY vec_a, vec_b""".stripMargin),
    "v38_lsh_cosine_dups" ->
      """WITH e AS (SELECT vec_id,
        |  (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
        | + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
        | + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
        | + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END
        | + CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END
        | + CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END
        | + CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END
        | + CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END) bucket,
        |  list_transform(embedding, x -> cast(round(cast(x as double) * 1000000.0) as bigint)) v
        | FROM embeddings),
        |n AS (SELECT vec_id, cast(sum(x*x) as bigint) n2
        |      FROM (SELECT vec_id, unnest(v) x FROM e) GROUP BY vec_id),
        |pairs AS (SELECT a.vec_id vec_a, b.vec_id vec_b, a.v va, b.v vb
        |          FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |dots AS (SELECT vec_a, vec_b, cast(sum(x*y) as bigint) d
        |         FROM (SELECT vec_a, vec_b, unnest(va) x, unnest(vb) y FROM pairs)
        |         GROUP BY vec_a, vec_b)
        |SELECT vec_a, vec_b,
        | cast(round(d * 1000000.0 / (sqrt(cast(na.n2 as double)) * sqrt(cast(nb.n2 as double)))) as bigint) AS cos_e6
        |FROM dots JOIN n na ON na.vec_id = vec_a JOIN n nb ON nb.vec_id = vec_b
        |WHERE round(d * 1000000.0 / (sqrt(cast(na.n2 as double)) * sqrt(cast(nb.n2 as double)))) >= 300000
        |ORDER BY vec_a, vec_b""".stripMargin,
    "v37_ivf_ann" ->
      // independent IVF derivation: seeds = lowest-8 ids; assignment by
      // max exact dot (ties → lowest cell); one Lloyd step with
      // trunc-toward-zero means (Spark's cast(double as long)); 2-probe
      // search; exact top-5. Dots via DuckDB's zipping parallel unnest.
      (ivfIndexCte +
      """,
        |qv AS (SELECT vid query_id, v FROM qq WHERE vid < 50),
        |celld AS (SELECT query_id, centroid_id, cast(sum(x*y) as bigint) cd
        |          FROM (SELECT qv.query_id, c.centroid_id, unnest(qv.v) x, unnest(c.cvec) y
        |                FROM qv, cent c)
        |          GROUP BY query_id, centroid_id),
        |probed AS (SELECT query_id, centroid_id FROM (
        |             SELECT query_id, centroid_id,
        |               row_number() OVER (PARTITION BY query_id ORDER BY cd DESC, centroid_id ASC) rn
        |             FROM celld) WHERE rn <= 2),
        |cands AS (SELECT query_id, neighbor_id, cast(sum(x*y) as bigint) dot
        |          FROM (SELECT p.query_id, i.vid neighbor_id, unnest(qs.v) x, unnest(q2.v) y
        |                FROM probed p JOIN idx i USING (centroid_id)
        |                JOIN qv qs ON qs.query_id = p.query_id
        |                JOIN qq q2 ON q2.vid = i.vid
        |                WHERE i.vid <> p.query_id)
        |          GROUP BY query_id, neighbor_id),
        |rk AS (SELECT query_id, neighbor_id, dot,
        |         cast(row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY dot DESC, neighbor_id ASC) as int) rank
        |       FROM cands)
        |SELECT query_id, rank, neighbor_id, dot FROM rk
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
    "v48_incremental_ivf" ->
      // centroids from the old half, one joint assignment, the v37
      // search verbatim — incremental insert ≡ full assignment against
      // the stored centroids
      (ivfIncrementalCteBy("vec_id % 2 = 0") + ivfSearchSql),
    "v49_incremental_semdedup" ->
      // centroids from the lower-id half, one joint assignment, the
      // full pairwise drop rule (v41's), restricted to the new batch
      (ivfIncrementalCteBy("vec_id < (SELECT (max(vec_id)+1)//2 FROM q)") +
      """,
        |nn AS (SELECT vid, cast(sum(x*x) as bigint) n2
        |       FROM (SELECT vid, unnest(v) x FROM qq) GROUP BY vid),
        |iv AS (SELECT idx.vid, idx.centroid_id, qq.v FROM idx JOIN qq USING (vid)),
        |pairs AS (SELECT a.vid va, b.vid vb, a.v pa, b.v pb
        |          FROM iv a JOIN iv b
        |            ON a.centroid_id = b.centroid_id AND a.vid < b.vid),
        |dots AS (SELECT va, vb, cast(sum(x*y) as bigint) d
        |         FROM (SELECT va, vb, unnest(pa) x, unnest(pb) y FROM pairs)
        |         GROUP BY va, vb),
        |dropped AS (SELECT DISTINCT vb AS vid
        |            FROM dots JOIN nn na ON na.vid = dots.va
        |                      JOIN nn nb ON nb.vid = dots.vb
        |            WHERE round(d * 1000000.0 /
        |                    (sqrt(cast(na.n2 as double)) * sqrt(cast(nb.n2 as double)))) >= 300000)
        |SELECT idx.vid AS vec_id, idx.centroid_id,
        |  (dropped.vid IS NULL) AS kept
        |FROM idx LEFT JOIN dropped ON idx.vid = dropped.vid
        |WHERE idx.vid >= (SELECT (max(vec_id)+1)//2 FROM q)
        |ORDER BY vec_id""".stripMargin),
    "v52_filtered_ann" ->
      // selective predicate → the exact pre-filter branch: the oracle
      // is simply the definition — exact top-5 among label=3 vectors
      (quantCte +
      """,
        |qv AS (SELECT vec_id query_id, v FROM q WHERE vec_id < 50),
        |al AS (SELECT vec_id vid, v FROM q WHERE label = 3),
        |dots AS (SELECT query_id, vid AS neighbor_id, cast(sum(x*y) as bigint) dot
        |         FROM (SELECT qv.query_id, al.vid, unnest(qv.v) x, unnest(al.v) y
        |               FROM qv, al WHERE al.vid <> qv.query_id)
        |         GROUP BY query_id, vid),
        |rk AS (SELECT query_id, neighbor_id, dot,
        |         cast(row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY dot DESC, neighbor_id ASC) as int) rank
        |       FROM dots)
        |SELECT query_id, rank, neighbor_id, dot FROM rk
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
    "v53_filtered_ivf" ->
      // broad predicate → IVF with the probe widened 2 → 3
      // (ceil(nProbe0 / selectivity)) and candidates post-filtered:
      // the v37 derivation with rn <= 3 and a label guard on the
      // candidate join
      (ivfIndexCte +
      """,
        |qv AS (SELECT vid query_id, v FROM qq WHERE vid < 50),
        |celld AS (SELECT query_id, centroid_id, cast(sum(x*y) as bigint) cd
        |          FROM (SELECT qv.query_id, c.centroid_id, unnest(qv.v) x, unnest(c.cvec) y
        |                FROM qv, cent c)
        |          GROUP BY query_id, centroid_id),
        |probed AS (SELECT query_id, centroid_id FROM (
        |             SELECT query_id, centroid_id,
        |               row_number() OVER (PARTITION BY query_id ORDER BY cd DESC, centroid_id ASC) rn
        |             FROM celld) WHERE rn <= 3),
        |cands AS (SELECT query_id, neighbor_id, cast(sum(x*y) as bigint) dot
        |          FROM (SELECT p.query_id, i.vid neighbor_id, unnest(qs.v) x, unnest(q2.v) y
        |                FROM probed p JOIN idx i USING (centroid_id)
        |                JOIN q ql ON ql.vec_id = i.vid AND ql.label <> 3
        |                JOIN qv qs ON qs.query_id = p.query_id
        |                JOIN qq q2 ON q2.vid = i.vid
        |                WHERE i.vid <> p.query_id)
        |          GROUP BY query_id, neighbor_id),
        |rk AS (SELECT query_id, neighbor_id, dot,
        |         cast(row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY dot DESC, neighbor_id ASC) as int) rank
        |       FROM cands)
        |SELECT query_id, rank, neighbor_id, dot FROM rk
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
    "v54_hard_negatives" ->
      // per-anchor label-mismatch mining: the v37 IVF derivation with
      // the probe widened to 3 and `label <> anchor.label` as a
      // candidate-join condition (applied before ranking)
      (ivfIndexCte +
      """,
        |qv AS (SELECT vec_id query_id, label qlbl, v FROM q WHERE vec_id < 50),
        |celld AS (SELECT query_id, centroid_id, cast(sum(x*y) as bigint) cd
        |          FROM (SELECT qv.query_id, c.centroid_id, unnest(qv.v) x, unnest(c.cvec) y
        |                FROM qv, cent c)
        |          GROUP BY query_id, centroid_id),
        |probed AS (SELECT query_id, centroid_id FROM (
        |             SELECT query_id, centroid_id,
        |               row_number() OVER (PARTITION BY query_id ORDER BY cd DESC, centroid_id ASC) rn
        |             FROM celld) WHERE rn <= 3),
        |cands AS (SELECT query_id, neighbor_id, cast(sum(x*y) as bigint) dot
        |          FROM (SELECT p.query_id, i.vid neighbor_id, unnest(qs.v) x, unnest(q2.v) y
        |                FROM probed p JOIN idx i USING (centroid_id)
        |                JOIN qv qs ON qs.query_id = p.query_id
        |                JOIN q ql ON ql.vec_id = i.vid AND ql.label <> qs.qlbl
        |                JOIN qq q2 ON q2.vid = i.vid)
        |          GROUP BY query_id, neighbor_id),
        |rk AS (SELECT query_id, neighbor_id, dot,
        |         cast(row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY dot DESC, neighbor_id ASC) as int) rank
        |       FROM cands)
        |SELECT query_id, rank, neighbor_id, dot FROM rk
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
  )
}
