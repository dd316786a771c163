package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Urls
import graft.operators.CorpusShape

/** Oracle gates for the corpus-shaping operators
  * ([[graft.operators.CorpusShape]]): per-document term salience,
  * per-domain corpus statistics, deterministic epoch shuffle +
  * sharding, and token-budget mixture sampling.
  *
  * Determinism: all scores are integer (tf·1e6 div df), all ordering
  * keys are md5 hex with id tie-breaks, token counts are exact
  * space-split counts — no floats anywhere.
  */
object ShapeGate {
  type Q = (SparkSession, String) => DataFrame

  private def tokenCount(c: org.apache.spark.sql.Column) =
    size(filter(split(c, " "), t => t =!= "")).cast("long")

  /** t58: per-document top-3 salient terms (TF-IDF-shaped, integer
    * score). The oracle recomputes tf, df, and the windowed top-k
    * independently. */
  def t58TfidfTopTerms(s: SparkSession, dir: String): DataFrame =
    CorpusShape.tfidfTopTerms(Tables.documents(s, dir), "doc_id", "text", k = 3)
      .orderBy("doc_id", "rank")

  /** URL fixture for the domain rollup: seven hosts across three
    * registered domains, mixed case and schemes, synthesized from
    * doc_id so the oracle can state the canonical host in closed form. */
  private def rawUrl(doc: org.apache.spark.sql.Column) = {
    val m7 = pmod(doc, lit(7))
    val scheme = when(m7.isin(2, 4, 5), lit("https://")).otherwise(lit("http://"))
    val host = when(m7 === 0, lit("www.Example.COM"))
      .when(m7 === 1, lit("blog.example.com"))
      .when(m7 === 2, lit("cdn.example.COM"))
      .when(m7 === 3, lit("News.Site.ORG"))
      .when(m7 === 4, lit("site.org"))
      .when(m7 === 5, lit("Api.Service.NET"))
      .otherwise(lit("service.net"))
    concat(scheme, host, format_string("/d%d", doc))
  }

  /** t59: per-domain corpus statistics — canonicalize the url, extract
    * the host, roll up to the registered domain: doc count, distinct
    * hosts, total tokens, distinct languages. The oracle derives the
    * canonical hosts independently (lowercased closed-form literals),
    * so a pass certifies canonicalize → host → registeredDomain. */
  def t59DomainStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        Urls.host(Urls.canonicalize(rawUrl(col("doc_id")))).as("host"),
        tokenCount(col("text")).as("n_tokens"))
      .withColumn("domain", Urls.registeredDomain(col("host")))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        sum(col("n_tokens")).as("total_tokens"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy("domain")

  /** t60: deterministic epoch shuffle — md5-ordered global positions
    * cut into 64-row shards. The oracle states the same semantics as
    * one global window; the engine runs the distributed prefix count. */
  def t60ShuffleShards(s: SparkSession, dir: String): DataFrame =
    CorpusShape.shuffleShards(
        Tables.documents(s, dir).select("doc_id"), "doc_id",
        seed = 42L, shardSize = 64L)
      .select(col("doc_id"), col("pos"), col("shard"))
      .orderBy("pos")

  /** t61: token-budget mixture sampling — each source keeps documents
    * in hash order until its budget (a law over the source name) is
    * filled. */
  def t61MixtureSample(s: SparkSession, dir: String): DataFrame =
    CorpusShape.mixtureSample(Tables.documents(s, dir),
        "source", "doc_id", tokenCount(col("text")),
        lit(500) + substring(col("source"), 4, 10).cast("int") % 3 * 1500)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
      .orderBy("source", "cum_tokens")

  /** t62: exact per-source token-length quantiles (p50/p90/p99) — the
    * corpus length-distribution report, positional (never a sketch) so
    * both engines agree bit-for-bit. */
  def t62TokenQuantiles(s: SparkSession, dir: String): DataFrame =
    CorpusShape.groupQuantiles(
        Tables.documents(s, dir)
          .select(col("source"), tokenCount(col("text")).as("n_tokens")),
        "source", "n_tokens",
        Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
      .orderBy("source")

  /** t73: exact GLOBAL token-length quantiles — the ungrouped
    * counterpart of t62 ([[CorpusShape.globalQuantiles]]): one
    * (n, p50, p90, p99) row over the whole corpus via range partition
    * + distributed prefix count, never a single-partition window. The
    * oracle states the same positional definition with one global
    * window (DuckDB's planner can afford it; the engine must not). */
  def t73GlobalQuantiles(s: SparkSession, dir: String): DataFrame =
    CorpusShape.globalQuantiles(
      Tables.documents(s, dir).select(tokenCount(col("text")).as("n_tokens")),
      "n_tokens",
      Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))

  /** t79: the APPROXIMATE statistics tier ([[CorpusShape.approxProfile]]
    * — HLL++ distinct count + Greenwald-Khanna percentiles, one
    * map-side-combinable aggregate, zero sorts) certified against the
    * exact tier (t73's positional quantiles, an exact distinct count).
    * Sketch values are engine-specific, so the gate emits the EXACT
    * values (which DuckDB reproduces) plus integer within-ε flags the
    * sketches must satisfy: HLL within 5% relative (rsd = 1% → 5σ),
    * each percentile within max(2, 5%) of the exact value. The oracle
    * states the flags as literal 1 — a sketch drifting out of bound
    * fails the hash compare loudly. */
  def t79ApproxProfile(s: SparkSession, dir: String): DataFrame = {
    // measured: spreading the input made this SLOWER (1.07 -> 1.29 s) —
    // the sketch aggregate is map-side-combinable and cheap enough that
    // the extra exchange dominates; left unspread deliberately
    val docs = Tables.documents(s, dir)
      .select(split(col("text"), " ").as("terms"),
        tokenCount(col("text")).as("n_tokens"))
    val approx = CorpusShape.approxProfile(docs, "terms", "n_tokens",
      Seq(("p50_a", 0.5), ("p90_a", 0.9), ("p99_a", 0.99)))
    val exactQ = CorpusShape.globalQuantiles(docs.select(col("n_tokens")),
      "n_tokens", Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
      .select("p50", "p90", "p99")
    val exactD = docs.select(explode(col("terms")).as("t"))
      .filter(col("t") =!= "")
      .agg(countDistinct(col("t")).cast("long").as("d_exact"))
    def within(a: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
      when(abs(a - e) <= greatest(lit(2L), e.divide(20).cast("long")), 1).otherwise(0)
    approx.crossJoin(exactQ).crossJoin(exactD) // three single-row frames
      .select(col("n"), col("d_exact"), col("p50"), col("p90"), col("p99"),
        when(abs(col("d_approx") - col("d_exact")) * 20 <= col("d_exact"), 1)
          .otherwise(0).as("hll_ok"),
        within(col("p50_a"), col("p50")).as("p50_ok"),
        within(col("p90_a"), col("p90")).as("p90_ok"),
        within(col("p99_a"), col("p99")).as("p99_ok"))
  }

  /** t87: MERGEABLE sketch profiling — the property that makes
    * approximate statistics work at 100 TB: each source builds its own
    * HLL sketch (DataSketches, map-side combinable), the per-source
    * sketches are then hll_union_agg'd into a corpus estimate WITHOUT
    * revisiting any row — the two-level aggregation a 1000-executor
    * profiling job runs (partition sketches → executor merges → driver
    * union). Output: one row per source plus the merged __ALL__ row,
    * each carrying the exact distinct count (oracle-computable) and a
    * within-5% flag on the sketch estimate (t79's certification
    * pattern; HLL lgK=14 gives ~0.8% standard error, so 5% is a
    * deterministic-by-construction bound at these cardinalities). */
  def t87SketchMerge(s: SparkSession, dir: String): DataFrame = {
    val terms = Tables.documents(s, dir)
      .select(col("source"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      .filter(col("term") =!= "")
    val perSrc = terms.groupBy("source")
      .agg(expr("hll_sketch_agg(term, 14)").as("sk"),
        countDistinct("term").cast("long").as("d_exact"))
    val srcRows = perSrc.select(col("source"),
      col("d_exact"), expr("hll_sketch_estimate(sk)").as("est"))
    val allExact = terms.agg(countDistinct("term").cast("long").as("d_exact"))
    val allRow = perSrc.agg(expr("hll_union_agg(sk, true)").as("sk"))
      .crossJoin(allExact)
      .select(lit("__ALL__").as("source"), col("d_exact"),
        expr("hll_sketch_estimate(sk)").as("est"))
    srcRows.unionByName(allRow)
      .select(col("source"), col("d_exact"),
        when(abs(col("est") - col("d_exact")) * 20 <= col("d_exact"), 1)
          .otherwise(0).as("hll_ok"))
      .orderBy("source")
  }

  /** t92: source×language independence-deviation profile — the
    * contingency-table drift check behind a χ² test, kept in exact
    * integers: per cell, observed count and the RELATIVE deviation
    * from independence `obs·N / (n_source·n_lang) − 1` in e6 units
    * (the cross-multiplied form — no expected-count division, no
    * squares of large products, so the arithmetic stays inside BIGINT
    * far past this corpus size). A cell far from 0 means that source's
    * language mix diverges from the corpus — the mixture-drift signal
    * a training-data pipeline alerts on. One scan, three aggregates,
    * broadcast margins. */
  def t92IndependenceProfile(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("source", "lang")
    val cells = d.groupBy("source", "lang").agg(count(lit(1)).as("obs"))
    val bySrc = d.groupBy("source").agg(count(lit(1)).as("n_source"))
    val byLang = d.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val n = d.count()
    cells.join(broadcast(bySrc), "source").join(broadcast(byLang), "lang")
      .select(col("source"), col("lang"), col("obs"),
        expr(s"obs * ${n}L * 1000000 div (n_source * n_lang) - 1000000")
          .as("dev_e6"))
      .orderBy("source", "lang")
  }

  /** t80: per-source distribution moments in EXACT integer arithmetic —
    * the drift-profile aggregate (is this source's length distribution
    * shifting between snapshots?). One map-side-combinable pass
    * collects (n, Σv, Σv²); the variance NUMERATOR `n·Σv² − (Σv)²`
    * (= n²·σ²) is derived exactly, never the shift-sensitive float
    * `avg(v²) − avg(v)²` whose catastrophic cancellation poisons
    * single-pass variance at scale. Magnitudes: token counts ≤ ~10³,
    * so Σv² ≤ 10⁶·n and n·Σv² stays far inside BIGINT at any SF. */
  def t80MomentProfile(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), tokenCount(col("text")).as("v"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"))
      .select(col("source"), col("n"), col("s1"), col("s2"),
        (col("n") * col("s2") - col("s1") * col("s1")).as("var_num"))
      .orderBy("source")

  /** t81: support-threshold heavy hitters — the frequent-terms scan
    * every corpus audit starts with (stopword discovery, boilerplate
    * tokens, contamination markers). A THRESHOLD (df·50 ≥ n_docs, i.e.
    * support ≥ 2%) rather than a top-k: thresholds are deterministic
    * under ties and distribute as one map-side-combinable aggregate +
    * a broadcast of the single count row; top-k under ties needs a
    * global tie-break pass. Exact integer arithmetic — no float
    * support ratio. */
  def t81HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val n = docs.select(count(lit(1)).as("n_docs"))
    docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n)) // one row
      .filter(col("df") * 50 >= col("n_docs"))
      .select(col("term"), col("df"))
      .orderBy(col("df").desc, col("term"))
  }

  /** t82: in-flight quality counters ([[graft.operators.Metrics
    * .observed]]) — the metrics ride the SAME job as the pipeline
    * output (observe = accumulator semantics, zero extra scans), and
    * the gate certifies their VALUES against DuckDB computing the
    * identical aggregates from the table. The driving action is a
    * filtered count the metrics must NOT be scoped to — they observe
    * the pre-filter plan point. */
  def t82ObserveMetrics(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val (observed, obs) = graft.operators.Metrics.observed(docs, "quality",
      count(lit(1)).as("n_rows"),
      sum(when(col("lang").isNull || col("lang") === "", 1L).otherwise(0L))
        .as("n_bad_lang"),
      sum(length(col("text")).cast("long")).as("total_chars"),
      max(col("doc_id")).as("max_doc_id"))
    observed.filter(col("lang") === "fa").count() // the ONE driving action
    val m = obs.get
    import s.implicits._
    Seq((m("n_rows").asInstanceOf[Long], m("n_bad_lang").asInstanceOf[Long],
      m("total_chars").asInstanceOf[Long], m("max_doc_id").asInstanceOf[Long]))
      .toDF("n_rows", "n_bad_lang", "total_chars", "max_doc_id")
  }

  /** t63: Zipf shape of the vocabulary — document-frequency histogram
    * in power-of-two buckets. The log2 bucket is exact integer
    * arithmetic on BOTH engines (`length(bin(df)) - 1`), never a float
    * log that could straddle a rounding boundary at exact powers. */
  def t63ZipfHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(array_distinct(split(col("text"), " "))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("df"))
      .select((length(bin(col("df"))) - 1).cast("int").as("bucket"), col("df"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_terms"), sum("df").as("total_df"))
      .orderBy("bucket")

  /** t66: PageRank over a synthetic doc-id link graph (every doc links
    * to (2·id+1) mod N and (3·id+7) mod N), 3 rounds, exact integer
    * ranks ([[graft.operators.Graph.pageRank]]). The oracle unrolls
    * the identical three rounds relationally. */
  def t66Pagerank(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val v = docs.select(col("doc_id").as("v"))
    val edges = v.select(col("v").as("src"), ((col("v") * 2 + 1) % n).as("dst"))
      .union(v.select(col("v").as("src"), ((col("v") * 3 + 7) % n).as("dst")))
    graft.operators.Graph.pageRank(v, edges, iters = 3)
      .select(col("v").as("doc_id"), col("rank_e6"))
      .orderBy("doc_id")
  }

  /** t67: one BPE statistics step — adjacent character-pair counts over
    * all corpus words, global top-20 (the argmax candidates of a BPE
    * merge round; the aggregated pair table is alphabet²-bounded, so
    * the final top-k window is on a tiny frame). */
  def t67BpePairs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
    pairs.groupBy("pair").agg(count(lit(1)).as("n"))
      // bounded global window: the frame is the aggregated PAIR table,
      // alphabet²-bounded (distinct 2-char pairs), never corpus-sized
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("n").desc, col("pair").asc)))
      .filter(col("rank") <= 20)
      .select(col("rank"), col("pair"), col("n"))
      .orderBy("rank")
  }

  /** t71: the full BPE merge LOOP ([[graft.operators.Bpe.trainMerges]])
    * — t67's pair statistics iterated to a merge budget: top pair by
    * corpus-weighted count (lexicographic tie-break), leftmost-greedy
    * re-segmentation, repeat. The oracle unrolls the identical greedy
    * recurrence step by step in SQL (generated from one step template,
    * the t66 discipline), so a hash match certifies every merge choice
    * AND every re-segmentation — including the equal-symbol run-parity
    * rule — across all 8 rounds. */
  def t71BpeMerges(s: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    graft.operators.Bpe.trainMerges(words, "w", "freq", budget = 8)
      .orderBy("step")
  }

  /** t78: t71's merge table trained by the PRODUCTION trainer
    * ([[graft.operators.Bpe.trainMergesDelta]]): one Spark job for the
    * word-frequency reduction, then the exact greedy loop with
    * delta-maintained pair counts driver-side over the
    * vocabulary-bounded frame. Shares t71's oracle verbatim — both
    * trainers implement the same recurrence, so the unrolled DuckDB
    * replay certifies the delta bookkeeping (including run-parity
    * re-merges and count decrements) step by step. */
  def t78BpeMergesDelta(s: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    graft.operators.Bpe.trainMergesDelta(words, "w", "freq", budget = 8)
      .orderBy("step")
  }

  /** t72: BPE APPLY — train 8 merges (t71's loop), then tokenize the
    * whole corpus with the learned table ([[graft.operators.Bpe
    * .segment]] over the distinct-word frame, joined back to the
    * corpus): per-document word count and post-merge BPE token count —
    * the number a sequence-packing/budgeting pipeline actually needs.
    * The oracle replays the same 8 unrolled steps and counts seg9
    * rows per word (words too short to train fall back to their own
    * length-1 segmentation). */
  def t72BpeTokenize(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val vocab = words.filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val merges = graft.operators.Bpe.trainMerges(vocab, "w", "freq", budget = 8)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val segged = graft.operators.Bpe.segment(words.distinct(), "w", merges)
      .select(col("w"), size(col("syms")).cast("long").as("n_syms"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(segged, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_syms").as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** One unrolled BPE step for the t71 oracle: pair counts over the
    * current segmentation, top-1 with the (n desc, lhs, rhs) tie-break,
    * then leftmost-greedy re-segmentation — merge starts where the pair
    * matches and, for equal-symbol pairs, the offset within the run of
    * equal symbols is even; positions consumed by the merge to their
    * left drop out. */
  private def bpeStepCtes(k: Int): Seq[String] = Seq(
    s"""pc$k AS (
       |  SELECT sym lhs, nxt rhs, cast(sum(freq) as bigint) n FROM (
       |    SELECT sym, lead(sym) OVER (PARTITION BY w ORDER BY pos) nxt, freq
       |    FROM seg$k)
       |  WHERE nxt IS NOT NULL GROUP BY 1, 2)""".stripMargin,
    s"""top$k AS (SELECT lhs, rhs, n FROM pc$k ORDER BY n DESC, lhs, rhs LIMIT 1)""",
    s"""ms$k AS (
       |  SELECT *, coalesce(sym = tl AND nxt = tr AND (tl <> tr OR po % 2 = 0),
       |                     false) mstart
       |  FROM (
       |    SELECT s.w, s.freq, s.pos, s.sym,
       |      lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.pos) nxt,
       |      row_number() OVER (PARTITION BY s.w, s.isl ORDER BY s.pos) - 1 po,
       |      t.lhs tl, t.rhs tr
       |    FROM (
       |      SELECT *, sum(nb) OVER (PARTITION BY w ORDER BY pos
       |                              ROWS UNBOUNDED PRECEDING) isl
       |      FROM (
       |        SELECT *, CASE WHEN sym = lag(sym) OVER (PARTITION BY w ORDER BY pos)
       |                       THEN 0 ELSE 1 END nb
       |        FROM seg$k)) s, top$k t))""".stripMargin,
    s"""seg${k + 1} AS (
       |  SELECT w, freq, CAST(row_number() OVER (PARTITION BY w ORDER BY pos) AS INT) pos,
       |    CASE WHEN mstart THEN sym || nxt ELSE sym END sym
       |  FROM (SELECT *, lag(mstart) OVER (PARTITION BY w ORDER BY pos) pms FROM ms$k)
       |  WHERE NOT coalesce(pms, false))""".stripMargin)

  private def bpeOracleSql(budget: Int): String = {
    val base = Seq(
      """wf AS (
        |  SELECT w, cast(count(*) as bigint) freq
        |  FROM (SELECT unnest(string_split(text, ' ')) w FROM documents)
        |  WHERE length(w) >= 2 GROUP BY w)""".stripMargin,
      """seg1 AS (
        |  SELECT w, freq, CAST(t.i AS INT) pos, substr(w, CAST(t.i AS INT), 1) sym
        |  FROM wf, UNNEST(range(1, length(w) + 1)) t(i))""".stripMargin)
    val ctes = base ++ (1 to budget).flatMap(bpeStepCtes)
    val finals = (1 to budget)
      .map(k => s"SELECT CAST($k AS INT) step, lhs, rhs, n FROM top$k")
      .mkString("\n  UNION ALL ")
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT * FROM (
       |  $finals
       |) ORDER BY step""".stripMargin
  }

  /** t72 oracle: the t71 step chain, then seg(budget+1) rows per word
    * = post-merge symbol counts, rolled up per document (length-1
    * words never trained: 1 symbol each). */
  private def bpeTokenizeOracleSql(budget: Int): String = {
    val base = Seq(
      """wf AS (
        |  SELECT w, cast(count(*) as bigint) freq
        |  FROM (SELECT unnest(string_split(text, ' ')) w FROM documents)
        |  WHERE length(w) >= 2 GROUP BY w)""".stripMargin,
      """seg1 AS (
        |  SELECT w, freq, CAST(t.i AS INT) pos, substr(w, CAST(t.i AS INT), 1) sym
        |  FROM wf, UNNEST(range(1, length(w) + 1)) t(i))""".stripMargin)
    val ctes = base ++ (1 to budget).flatMap(bpeStepCtes) ++ Seq(
      s"""wsym AS (SELECT w, cast(count(*) as bigint) n_syms
         |         FROM seg${budget + 1} GROUP BY w)""".stripMargin,
      """allw AS (SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) w
        |  FROM documents)""".stripMargin,
      """j AS (SELECT doc_id, coalesce(s.n_syms, 1) n_syms
        |      FROM allw LEFT JOIN wsym s USING (w))""".stripMargin)
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT doc_id, cast(count(*) as bigint) n_words,
       |  cast(sum(n_syms) as bigint) n_bpe_tokens
       |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** t70: unigram-surprisal quality signal — the statistical LM
    * filter: each token's surprisal ≈ log2(corpusTokens / termFreq),
    * computed as a bit-length difference so it stays in exact integer
    * arithmetic; a document's score is its mean surprisal ×100
    * (low = boilerplate-ish, high = rare-token soup — both tails get
    * filtered in a real pipeline). Complements t64's hash-weight
    * scorer with a corpus-statistics-driven one. */
  def t70UnigramSurprisal(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy("term").agg(count(lit(1)).as("tf"))
    val total = tf.agg(sum(col("tf")).as("nn"))
    toks.join(tf, Seq("term"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        (length(bin(col("nn"))) - length(bin(col("tf")))).cast("long").as("surprisal"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        expr("sum(surprisal) * 100 div count(1)").as("avg_surprisal_c"))
      .orderBy("doc_id")
  }

  /** t76: bigram-surprisal quality signal — the conditional next-token
    * statistic t70's unigram filter can't see: surprisal(w1→w2) ≈
    * log2(count(w1·)/count(w1,w2)) as an exact bit-length difference
    * (c1 ≥ c2, so the gap is non-negative integer arithmetic on both
    * engines); a document's score is its mean bigram surprisal ×100.
    * Low = formulaic/boilerplate transitions, high = incoherent token
    * soup — the second axis of the statistical-LM filter family. */
  def t76BigramSurprisal(s: SparkSession, dir: String): DataFrame = {
    val docToks = Tables.documents(s, dir)
      .select(col("doc_id"), expr("filter(split(text, ' '), x -> x <> '')").as("w"))
      .filter(size(col("w")) >= 2)
    val bigrams = docToks
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] as w1, w[i+1] as w2))")).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val uni = bigrams.groupBy("w1").agg(count(lit(1)).as("c1"))
    val bi = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    bigrams.join(bi, Seq("w1", "w2")).join(uni, Seq("w1"))
      .select(col("doc_id"),
        (length(bin(col("c1"))) - length(bin(col("c2")))).cast("long").as("sur"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(sur) * 100 div count(1)").as("avg_bigram_surprisal_c"))
      .orderBy("doc_id")
  }

  /** t77: deterministic hash split — train/val/test membership from the
    * document id's md5, the assignment that must never move a document
    * between splits across runs, engines, or cluster sizes. The first
    * two hex chars give a uniform 0..255 bucket (hex-char arithmetic —
    * `conv` exists only on one engine); thresholds 204/230 ≈ 80/10/10. */
  def t77SplitAssign(s: SparkSession, dir: String): DataFrame = {
    def hexVal(c: org.apache.spark.sql.Column) =
      when(c.between("0", "9"), ascii(c) - 48).otherwise(ascii(c) - 87)
    val k = md5(concat(col("doc_id").cast("string"), lit(":split")))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        (hexVal(substring(k, 1, 1)) * 16 + hexVal(substring(k, 2, 1)))
          .cast("int").as("bucket"))
      .withColumn("split",
        when(col("bucket") < 204, "train")
          .when(col("bucket") < 230, "val")
          .otherwise("test"))
      .orderBy("doc_id")
  }

  /** t97: EXACT balanced per-group sampling — k documents per language
    * chosen by a portable hash rank ((doc_id·2654435761) mod 1000003,
    * reproducible on any engine), via the k-bounded typed Aggregator
    * from q133 instead of a per-group window. The shape matters at
    * 100 TB: "k docs per language" has FEW heavy groups, so a
    * row_number window puts an entire language on one task, while the
    * aggregator's partial buffers cap at k entries per task and merge
    * — no skew, no per-group sort. Deterministic ties by doc_id. The
    * oracle IS the window form — certifying the aggregator equals the
    * window semantics exactly is the point. */
  def t97BalancedSample(s: SparkSession, dir: String): DataFrame = {
    val fn = graft.functions.TopK.register(s, 20)
    Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"),
        (col("doc_id") * 2654435761L % 1000003L).as("hk"))
      .createOrReplaceTempView("g_t97_docs")
    s.sql(
      s"""SELECT lang, cast(pos + 1 as bigint) AS rank, e.value AS doc_id
         |FROM (
         |  SELECT lang, $fn(doc_id, -hk) AS tk
         |  FROM g_t97_docs GROUP BY lang) t
         |LATERAL VIEW posexplode(t.tk.entries) pe AS pos, e
         |ORDER BY lang, rank""".stripMargin)
  }

  /** t101: TEMPERATURE-SMOOTHED mixture epoch (α = 0.5, the
    * T5/multilingual smoothing) — skewed strata are synthesized from
    * doc_id (one huge, one mid, two small) so the √n quotas actually
    * discriminate from proportional sampling; the engine's
    * histogram-threshold selection (no per-source window over data)
    * must equal the oracle's explicit rank-window form row-for-row:
    * quota arithmetic integer-exact, selection by portable hash rank,
    * ties by doc_id. */
  def t101TemperatureMixture(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"),
      when(pmod(col("doc_id"), lit(16)) < 10, "huge")
        .when(pmod(col("doc_id"), lit(16)) < 14, "mid")
        .when(pmod(col("doc_id"), lit(16)) < 15, "rare_a")
        .otherwise("rare_b").as("grp"))
    graft.operators.Sampling.temperatureMixture(docs, epochDocs = 120L,
        srcCol = "grp", keyCol = "doc_id")
      .select(col("grp"), col("doc_id"))
      .orderBy("grp", "doc_id")
  }

  /** t102: DSIR importance resampling (Xie et al. 2023) — "select raw
    * documents that look like the target domain" via hashed-unigram
    * likelihood ratios: the target here is documents mentioning
    * 'customer', scores are exact integer micro-nat sums over 64
    * md5-hashed buckets ([[graft.operators.Sampling.dsirScores]]), and
    * the resampled set keeps score > 0 (more target-like than raw).
    * Soundness require()d in-gate: the selection must be ENRICHED in
    * the target trait versus the corpus base rate — an importance
    * sampler that doesn't shift the distribution toward its target is
    * broken no matter what it returns. The DuckDB oracle re-derives
    * the full pipeline (tokens → buckets → smoothed log-ratios →
    * integer scores → selection) from the parquet alone. */
  def t102DsirResample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
    val isTarget = col("text").contains("customer")
    val scored = graft.operators.Sampling.dsirScores(
      docs, "doc_id", "text", isTarget, buckets = 64)
    val withTrait = scored.join(
      docs.select(col("doc_id"), isTarget.as("is_t")), "doc_id")
    val (selT, selN, allT, allN) = {
      val r = withTrait.agg(
        sum(when(col("is_t") && col("dsir_score_e6") > 0, 1L)
          .otherwise(0L)),
        sum(when(col("dsir_score_e6") > 0, 1L).otherwise(0L)),
        sum(when(col("is_t"), 1L).otherwise(0L)),
        count(lit(1))).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    require(selN > 0 && selN < allN,
      s"t102: selection must be a proper subset, got $selN of $allN")
    require(selT.toDouble / selN > allT.toDouble / allN,
      f"t102: importance resampling must ENRICH the target trait — " +
        f"selected ${selT.toDouble / selN}%.3f vs base " +
        f"${allT.toDouble / allN}%.3f")
    scored.filter(col("dsir_score_e6") > 0)
      .select(col("doc_id"), col("n_tokens"), col("dsir_score_e6"))
      .orderBy("doc_id")
  }

  /** t103: TRAINABLE quality classifier (the CCNet/LLaMA recipe) — fit
    * a logistic scorer on cheap per-document features against a
    * target-domain label on the TRAINING half (even doc_ids), score
    * the HELD-OUT half (odd), and require generalization: exact AUC ≥
    * 0.95 and every held-out prediction correct (the trait is
    * feature-expressible, so a working trainer must separate it; a
    * trainer that memorizes noise or diverges fails loudly). Training
    * is [[graft.operators.QualityScorer]]'s declarative GD — each step
    * one codegen'd aggregate; scoring is literal-weight arithmetic in
    * one scan, the 100 TB-shaped half. The oracle states the per-doc
    * verdict independently. */
  def t103QualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir)).select(
      col("doc_id"), col("n_chars"),
      (size(split(col("text"), " "))).cast("double").as("f_tokens"),
      (size(split(col("text"), "customer")) - 1).cast("double")
        .as("f_customer"),
      (size(split(col("text"), " the ")) - 1).cast("double").as("f_the"),
      col("n_chars").cast("double").as("f_chars"),
      col("text").contains("customer").as("label"))
    val features = Seq("f_tokens", "f_customer", "f_the", "f_chars")
    // 20 steps at rate 2 converge on this separable trait (the AUC +
    // all-correct requires below are the convergence proof); each step
    // is one job, so the step count is the gate's wall time
    val model = graft.operators.QualityScorer.train(
      docs.filter(pmod(col("doc_id"), lit(2)) === 0), features, "label",
      iters = 20, rate = 2.0)
    // the held-out half is CORPUS-PROPORTIONAL — everything below runs
    // distributed (round-17 verdict: the old collect() pulled half the
    // corpus to the driver); the frame is three narrow columns, cached
    // for its three consumers (verdict aggregate, rank-sum, output)
    val held = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("doc_id"), col("label"), model.decision.as("score"))
      .cache()
    val vr = held.agg(count(lit(1)).as("n"),
      coalesce(sum(when(col("label"), 1L).otherwise(0L)), lit(0L)).as("np"),
      coalesce(sum(when((col("score") > 0) === col("label"), 1L)
        .otherwise(0L)), lit(0L)).as("nc")).collect()(0)
    val nAll = vr.getLong(0)
    require(nAll > 0, "t103: empty held-out set")
    val nPos = vr.getLong(1)
    val nNeg = nAll - nPos
    require(nPos > 0 && nNeg > 0, "t103: degenerate held-out labels")
    // exact AUC by rank-sum (Mann-Whitney): ties broken by doc_id —
    // float scores collide with probability ~0. The 1-based ranks come
    // from a DISTRIBUTED sort + zipWithIndex (range shuffle of 17-byte
    // tuples; zipWithIndex's offsets are one bounded per-partition
    // count), never a global window or a driver sort.
    val rankSum = held.select(col("score"), col("doc_id"), col("label"))
      .rdd.map(r => ((r.getDouble(0), r.getLong(1)), r.getBoolean(2)))
      .sortByKey().zipWithIndex()
      .map { case ((_, pos), i) => if (pos) i + 1L else 0L }
      .fold(0L)(_ + _)
    val auc = (rankSum - nPos * (nPos + 1) / 2).toDouble / (nPos * nNeg)
    require(auc >= 0.95,
      f"t103: held-out AUC $auc%.4f below the 0.95 floor")
    require(vr.getLong(2) == nAll,
      "t103: a held-out document was misclassified")
    held.select(col("doc_id"),
        ((col("score") > 0) === col("label")).as("correct"))
      .orderBy("doc_id")
  }

  /** t114: LANGUAGE IDENTIFICATION as a trained classifier — the
    * fastText shape (hashed char-trigram features into a linear
    * model, [[graft.operators.LangId]]) that CCNet runs BEFORE its
    * perplexity filter; with t108 (boilerplate) and t112 (perplexity)
    * this completes the CCNet stack. The driver corpus's `lang` label
    * is independent of its synthetic text, so the gate builds the
    * two-script fixture deterministically (the q148 precedent): odd
    * doc_ids transliterate to a 26-letter Persian alphabet, even stay
    * Latin. Train on doc_id%4 < 2, hold out doc_id%4 >= 2; the two
    * scripts are disjoint in trigram space, so a working trainer must
    * classify EVERY held-out document — required in-gate (t103's
    * pattern), and the oracle states the per-doc verdict
    * independently from the parity that defined the fixture. */
  def t114LangId(s: SparkSession, dir: String): DataFrame = {
    val latin = "abcdefghijklmnopqrstuvwxyz"
    val persian = "ابتثجحخدذرزسشصضطظعغفقكلمنه"
    // the production minimum: n-gram lang-id refuses tiny inputs
    // (fastText/CLD answer "unknown" below a few dozen chars - a
    // 40-char doc's hashed-trigram profile is collision noise, and one
    // sf0.1 fixture doc proved it by landing hard on the wrong side)
    val docs = Tables.spread(Tables.documents(s, dir))
      .filter(length(col("text")) >= 50)
      .select(
        col("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 1,
          translate(col("text"), latin, persian))
          .otherwise(col("text")).as("ltext"),
        (pmod(col("doc_id"), lit(2)) === 1).as("is_fa"))
    val buckets = 64
    // cached: the feature frame feeds the trainer's stats pass, every
    // GD step's source, and the held-out scoring scan (8 iterations
    // suffice on the fully separable fixture — measured: 5 already
    // classify everything; each step is one codegen'd 65-sum
    // aggregate, so the step count is the gate's wall time)
    val feats = graft.operators.LangId
      .charNgramFeatures(docs, "doc_id", "ltext", n = 3, buckets = buckets)
      .join(docs.select("doc_id", "is_fa"), "doc_id")
      .cache()
    val scored = graft.operators.LangId.trainAndScore(
      feats.filter(pmod(col("doc_id"), lit(4)) < 2),
      feats.filter(pmod(col("doc_id"), lit(4)) >= 2), buckets,
      "is_fa", iters = 8, rate = 2.0)
    // the held-out half is CORPUS-PROPORTIONAL — the verdict counts
    // run as ONE distributed aggregate (the t103 pattern; the old
    // collect() pulled a quarter of the corpus to the driver)
    val vr = scored.agg(count(lit(1)).as("n"),
      coalesce(sum(when((col("decision") > 0) =!= col("is_fa"), 1L)
        .otherwise(0L)), lit(0L)).as("w")).collect()(0)
    require(vr.getLong(0) > 0, "t114: empty held-out set")
    require(vr.getLong(1) == 0L,
      s"t114: ${vr.getLong(1)}/${vr.getLong(0)} held-out docs misclassified " +
        "— the scripts are disjoint in trigram space, a working lang-id " +
        "separates them completely")
    scored
      .select(col("doc_id"),
        when(col("decision") > 0, "fa").otherwise("en").as("pred_lang"))
      .orderBy("doc_id")
  }

  /** t119: MULTICLASS LANGUAGE IDENTIFICATION — fastText's real shape
    * (Joulin et al. 2017: one label per language, ~100 of them; CCNet
    * routes documents by the argmax), as ONE-VS-REST over t114's
    * hashed char-trigram featurization
    * ([[graft.operators.LangId.trainAndScoreMulticlass]]): the k
    * binary GD fits share ONE standardized cached sample (stats
    * computed once), and scoring is a single literal-weight scan
    * taking the argmax of k decisions with a deterministic tie-break.
    * Three-script fixture from the deterministic corpus (the q148/t114
    * precedent): doc_id%3 = 0 stays Latin, 1 transliterates to the
    * 26-letter Persian alphabet, 2 to a digit alphabet — pairwise
    * disjoint ALPHABETS, so the features are hashed char UNIGRAMS
    * (n=1): script routing is character-distribution classification,
    * and unigram profiles stay dense for near-floor 51-char docs where
    * bigram/trigram hash profiles collapse into collision noise (one
    * measured sf0.1 Latin doc argmaxed 'dg' at +3.98 under bigrams).
    * Train on doc_id%4 < 2, hold out the rest; EVERY held-out verdict
    * is require()d correct (t103's pattern), so the oracle states the
    * class mapping independently. */
  def t119MulticlassLangId(s: SparkSession, dir: String): DataFrame = {
    val latin = "abcdefghijklmnopqrstuvwxyz"
    val persian = "ابتثجحخدذرزسشصضطظعغفقكلمنه"
    val digits = "0123456789876543210123456"
    val docs = Tables.spread(Tables.documents(s, dir))
      .filter(length(col("text")) >= 50) // the t114 lang-id floor
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 1,
          translate(col("text"), latin, persian))
          .when(pmod(col("doc_id"), lit(3)) === 2,
            translate(col("text"), latin, digits))
          .otherwise(col("text")).as("ltext"),
        when(pmod(col("doc_id"), lit(3)) === 1, "fa")
          .when(pmod(col("doc_id"), lit(3)) === 2, "dg")
          .otherwise("en").as("lang"))
    val buckets = 64
    val feats = graft.operators.LangId
      .charNgramFeatures(docs, "doc_id", "ltext", n = 1, buckets = buckets)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .cache()
    // 8 iterations like t114 — the disjoint-alphabet unigram profiles
    // separate with margin well before that (measured 0 wrong at 8 on
    // sf0.1 AND on the 10× scaled corpus); each extra step is 3
    // interpreted gradient aggregates over the half-corpus train frame
    val scored = graft.operators.LangId.trainAndScoreMulticlass(
      feats.filter(pmod(col("doc_id"), lit(4)) < 2), feats, buckets,
      "lang", iters = 8, rate = 2.0)
    val held = scored.filter(pmod(col("doc_id"), lit(4)) >= 2)
      .select(col("doc_id"), col("lang"), col("language"))
    val wrong = held.filter(col("lang") =!= col("language")).count()
    require(wrong == 0L,
      s"t119: $wrong held-out docs misclassified — the three scripts " +
        "are pairwise disjoint in trigram space, a working one-vs-rest " +
        "argmax separates them completely")
    held.select(col("doc_id"), col("language")).orderBy("doc_id")
  }

  /** t116: THE CCNET PIPELINE END TO END (Wenzek et al. 2020) —
    * the four stages composed in order as ONE derivation, each the
    * engine's certified implementation: EXACT DEDUP (planted
    * fixed-text mirror docs collapse to the smallest id) →
    * LANGUAGE-ID (t114's hashed-trigram GD classifier, trained on a
    * fixed-size portable-hash-rank sample — never a corpus fraction —
    * over the two-script fixture; survivors = predicted-Latin docs,
    * with all-correct required on EVERY doc so the oracle can state
    * the survivor set independent of the train slice) →
    * BOILERPLATE LINE REMOVAL (a cookie-banner line planted on every
    * third doc crosses the 25% document-frequency threshold and
    * drops; unique body lines stay) → PERPLEXITY TERTILES (bigram LM
    * trained on the doc_id%4==0 reference slice of the CLEANED
    * survivors; head+middle kept, tail dropped — the CCNet quality
    * gate). Every stage re-derived by DuckDB in one query; every
    * stage's invariant require()d in-gate. */
  def t116CcnetPipeline(s: SparkSession, dir: String): DataFrame = {
    val latin = "abcdefghijklmnopqrstuvwxyz"
    val persian = "ابتثجحخدذرزسشصضطظعغفقكلمنه"
    val fixedText =
      "the shared landing page boilerplate body repeated across mirrors"
    val banner = "accept all cookies"
    val base = Tables.spread(Tables.documents(s, dir))
      .filter(length(col("text")) >= 50)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(11)) === 5, lit(fixedText))
          .otherwise(col("text")).as("tf"))
    val docs = base.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(2)) === 1,
        translate(
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat_ws("\n", lit(banner), col("tf"))).otherwise(col("tf")),
          latin, persian))
        .otherwise(
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat_ws("\n", lit(banner), col("tf"))).otherwise(col("tf")))
        .as("ltext"))
    // STAGE 1 — exact dedup: identical docs keep the smallest id. The
    // group sizes ride along so the mirror-collapse sanity check reads
    // the input count off the cached dedup frame (sum of group sizes)
    // instead of re-scanning + re-translating the corpus.
    val dd = docs.groupBy("ltext").agg(min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("__grp"))
      .select(col("doc_id"), col("ltext"), col("__grp"),
        (pmod(col("doc_id"), lit(2)) === 1).as("is_fa"))
      .cache()
    val ddStats = dd.agg(count(lit(1)), sum(col("__grp"))).collect()(0)
    val nDd = ddStats.getLong(0)
    require(nDd < ddStats.getLong(1),
      "t116: the planted mirror docs must collapse in the dedup stage")
    // STAGE 2 — language id (t114's machinery); survivors = Latin.
    // CHAR BIGRAMS, not t114's trigrams: with a fixed-size train
    // sample the model must generalize to docs it never saw, and
    // short docs' trigram profiles are too spiky for that (one sf0.1
    // 66-char doc sat misclassified at +2.0 under trigrams at every
    // sample size tried); the far denser bigram vocabulary separates
    // the two disjoint scripts with margin from a 1024-doc sample
    val buckets = 64
    val feats = graft.operators.LangId
      .charNgramFeatures(dd, "doc_id", "ltext", n = 2, buckets = buckets)
      .join(dd.select("doc_id", "is_fa"), "doc_id")
      .cache()
    // TRAIN SLICE: a FIXED-SIZE deterministic sample by the portable
    // hash rank (Sampling's (key·2654435761) mod 1000003 — class-
    // agnostic, so the parity split keeps both scripts represented),
    // never a corpus fraction: 12 GD steps over `pmod(doc_id,4) < 2`
    // was 12 half-corpus scans — at 100 TB that violates the engine's
    // own contract (classifiers train on ~10⁵ docs, SCORE petabytes),
    // and it made this gate the single most expensive bench entry.
    // Small corpora (sf0.001) fall back to training on everything.
    val trainTarget = 1024L
    val hkThr = if (nDd <= trainTarget) 1000003L
                else 1000003L * trainTarget / nDd + 1L
    val hk = pmod(col("doc_id") * lit(2654435761L), lit(1000003L))
    // 24 iterations (t114 uses 8): this gate requires correctness on
    // EVERY doc — train and unseen alike — for the oracle's parity
    // survivor set, and docs outside the sample can sit near the
    // boundary; extra GD steps over the 1024-row cached sample cost
    // milliseconds each, nothing like the old 12 half-corpus scans
    val scored = graft.operators.LangId.trainAndScore(
      feats.filter(hk < hkThr), feats, buckets,
      "is_fa", iters = 24, rate = 2.0)
    val en = scored.filter(col("decision") <= 0).select("doc_id")
      .join(dd, "doc_id").select(col("doc_id"), col("ltext").as("text"))
    // STAGE 3 — boilerplate line removal at τ = 25%
    val cleaned = graft.operators.CorpusText
      .removeBoilerplateLines(en, tauPpm = 250000L).cache()
    // the stage-2 misclassification count and the stage-3 bad-drop
    // count ride ONE union-aggregate action (they were two separately
    // scheduled jobs over already-cached frames — pure driver/plan
    // overhead); this action is also what materializes the `cleaned`
    // cache. Require ORDER below preserves the stage-2-first failure
    // precedence.
    val checkRow = scored
      .agg(coalesce(sum(when((col("decision") > 0) =!= col("is_fa"), 1L)
        .otherwise(0L)), lit(0L)).as("n"))
      .unionAll(cleaned.agg(coalesce(sum(when(
        (pmod(col("doc_id"), lit(3)) === 0 && col("n_dropped") =!= 1L) ||
          (pmod(col("doc_id"), lit(3)) =!= 0 && col("n_dropped") =!= 0L),
        1L).otherwise(0L)), lit(0L)).as("n")))
      .collect()
    val wrong = checkRow(0).getLong(0)
    require(wrong == 0L,
      s"t116: lang-id misclassified $wrong docs — the two scripts are " +
        "disjoint, the survivor set must be exactly the Latin parity")
    require(checkRow(1).getLong(0) == 0L,
      "t116: exactly the planted banner line must drop, nothing else")
    // STAGE 4 — perplexity tertiles over the CLEANED survivors
    val split = graft.operators.PerplexityLm.ccnetSplit(
      graft.operators.PerplexityLm.scoreBigramLm(
        cleaned.select(col("doc_id"), col("clean_text")),
        "doc_id", "clean_text", pmod(col("doc_id"), lit(4)) === 0))
      .cache() // feeds the invariant stats AND the returned frame
    val stats = split.groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("spt").as("lo"), max("spt").as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for (b <- Seq("head", "middle", "tail"))
      require(stats.contains(b), s"t116: bucket '$b' is empty")
    require(stats("head")._3 <= stats("middle")._2 &&
        stats("middle")._3 <= stats("tail")._2,
      s"t116: buckets must partition the score space, got $stats")
    split.filter(col("bucket") =!= "tail")
      .select(col("doc_id"), col("n_scored"), col("nll_e6"),
        col("spt"), col("bucket"))
      .orderBy("doc_id")
  }

  /** t112: CCNet perplexity filter (Wenzek et al. 2020) — the
    * statistical-LM quality gate production web corpora run before
    * training: a Laplace-smoothed bigram LM trained on the REFERENCE
    * slice (even doc_ids, the Wikipedia stand-in), every document
    * scored by its exact integer micro-nat negative log-likelihood
    * ([[graft.operators.PerplexityLm]]), and the corpus split into
    * head / middle / tail perplexity tertiles by positional
    * thresholds (distributed prefix-count pick — no global window;
    * the oracle re-derives them with the window DuckDB can afford).
    * Soundness require()d in-gate: every bucket nonempty and the
    * buckets ordered in score space (head max ≤ middle min, middle
    * max ≤ tail min) — a tertile split that isn't a partition by
    * score is broken no matter what it returns. */
  def t112PerplexityFilter(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
    val split = graft.operators.PerplexityLm.ccnetSplit(
      graft.operators.PerplexityLm.scoreBigramLm(
        docs, "doc_id", "text", pmod(col("doc_id"), lit(2)) === 0))
      .select(col("doc_id"), col("n_scored"), col("nll_e6"),
        col("spt"), col("bucket"))
    val stats = split.groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("spt").as("lo"), max("spt").as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for (b <- Seq("head", "middle", "tail"))
      require(stats.contains(b), s"t112: bucket '$b' is empty")
    require(stats("head")._3 <= stats("middle")._2 &&
        stats("middle")._3 <= stats("tail")._2,
      s"t112: buckets must partition the score space, got $stats")
    split.orderBy("doc_id")
  }

  /** t118: KNESER-NEY TRIGRAM perplexity filter — the t112 gate with
    * the LM CCNet actually ships (KenLM is modified KN; the Laplace
    * bigram over-keeps repetitive junk that discounted continuation
    * probabilities catch): an interpolated KN trigram with fixed
    * D = 0.75 trained on the even-doc_id reference slice
    * ([[graft.operators.PerplexityLm.scoreKnTrigramLm]] — exact
    * integer counts, one pinned float expression per position,
    * micro-nat quantization ONCE), then the same positional tertile
    * split with the same in-gate partition invariants. The oracle
    * re-derives the discounted probabilities from the parquet:
    * trigram type table → continuation counts → the three backoff
    * arms, textually mirroring the float shape. */
  def t118KnPerplexityFilter(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
    val split = graft.operators.PerplexityLm.ccnetSplit(
      graft.operators.PerplexityLm.scoreKnTrigramLm(
        docs, "doc_id", "text", pmod(col("doc_id"), lit(2)) === 0))
      .select(col("doc_id"), col("n_scored"), col("nll_e6"),
        col("spt"), col("bucket"))
    val stats = split.groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("spt").as("lo"), max("spt").as("hi"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for (b <- Seq("head", "middle", "tail"))
      require(stats.contains(b), s"t118: bucket '$b' is empty")
    require(stats("head")._3 <= stats("middle")._2 &&
        stats("middle")._3 <= stats("tail")._2,
      s"t118: buckets must partition the score space, got $stats")
    split.orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "t114_lang_id" -> (t114LangId _),
    "t118_kn_perplexity_filter" -> (t118KnPerplexityFilter _),
    "t119_multiclass_lang_id" -> (t119MulticlassLangId _),
    "t116_ccnet_pipeline" -> (t116CcnetPipeline _),
    "t112_perplexity_filter" -> (t112PerplexityFilter _),
    "t103_quality_classifier" -> (t103QualityClassifier _),
    "t102_dsir_resample" -> (t102DsirResample _),
    "t101_temperature_mixture" -> (t101TemperatureMixture _),
    "t97_balanced_sample" -> (t97BalancedSample _),
    "t62_token_quantiles" -> (t62TokenQuantiles _),
    "t63_zipf_histogram" -> (t63ZipfHistogram _),
    "t66_pagerank" -> (t66Pagerank _),
    "t67_bpe_pairs" -> (t67BpePairs _),
    "t71_bpe_merges" -> (t71BpeMerges _),
    "t72_bpe_tokenize" -> (t72BpeTokenize _),
    "t78_bpe_merges_delta" -> (t78BpeMergesDelta _),
    "t73_global_quantiles" -> (t73GlobalQuantiles _),
    "t79_approx_profile" -> (t79ApproxProfile _),
    "t87_sketch_merge" -> (t87SketchMerge _),
    "t92_independence_profile" -> (t92IndependenceProfile _),
    "t80_moment_profile" -> (t80MomentProfile _),
    "t81_heavy_hitters" -> (t81HeavyHitters _),
    "t82_observe_metrics" -> (t82ObserveMetrics _),
    "t76_bigram_surprisal" -> (t76BigramSurprisal _),
    "t77_split_assign" -> (t77SplitAssign _),
    "t70_unigram_surprisal" -> (t70UnigramSurprisal _),
    "t58_tfidf_top_terms" -> (t58TfidfTopTerms _),
    "t59_domain_stats" -> (t59DomainStats _),
    "t60_shuffle_shards" -> (t60ShuffleShards _),
    "t61_mixture_sample" -> (t61MixtureSample _),
  )

  // t118's three pinned KN probability shapes — built once so the
  // trigram arm nests the bigram arm TEXTUALLY identically to how the
  // engine nests the Column expressions (same association, same casts;
  // any drift breaks the micro-nat hash)
  private val knPcE =
    "cast(coalesce(pcx.pc, 0) + 1 as double) / " +
      "cast(tot.tb + tot.vv + 1 as double)"
  private val knPbE =
    "(greatest(cast(coalesce(cc2.cc2, 0) as double) - 0.75, 0.0) + " +
      s"0.75 * cast(ctx1.n1pv as double) * ($knPcE)) / " +
      "cast(ctx1.cc1 as double)"
  private val knPtE =
    "(greatest(cast(coalesce(tri.c3, 0) as double) - 0.75, 0.0) + " +
      s"0.75 * cast(ctx2.n1puv as double) * ($knPbE)) / " +
      "cast(ctx2.c2 as double)"

  /** The KN derivation through per-document scores (`ds`) — shared by
    * t118 (which adds the tertile split on top) and the q202 streaming
    * scoring twin (which hash-matches `ds` directly). */
  private[queries] val knScoreCtes: String =
    s"""WITH d AS (SELECT doc_id, (doc_id % 2 = 0) AS ref,
      |    list_filter(string_split(text, ' '), x -> x <> '') w
      |  FROM documents),
      |p AS (SELECT doc_id, ref,
      |    CASE WHEN t.i >= 3 THEN w[CAST(t.i AS INT) - 2] END u,
      |    CASE WHEN t.i >= 2 THEN w[CAST(t.i AS INT) - 1] END v,
      |    w[CAST(t.i AS INT)] wt
      |  FROM d, UNNEST(range(1, len(w) + 1)) t(i) WHERE len(w) >= 1),
      |tri AS (SELECT u t1, v t2, wt t3, cast(count(*) as bigint) c3
      |        FROM p WHERE ref AND u IS NOT NULL GROUP BY 1, 2, 3),
      |ctx2 AS (SELECT t1 x1, t2 x2, cast(sum(c3) as bigint) c2,
      |          cast(count(*) as bigint) n1puv FROM tri GROUP BY 1, 2),
      |cc2 AS (SELECT t2 m1, t3 m2, cast(count(*) as bigint) cc2
      |        FROM tri GROUP BY 1, 2),
      |ctx1 AS (SELECT m1 k1, cast(sum(cc2) as bigint) cc1,
      |          cast(count(*) as bigint) n1pv FROM cc2 GROUP BY 1),
      |pcx AS (SELECT m2 p1, cast(count(*) as bigint) pc
      |        FROM cc2 GROUP BY 1),
      |tot AS (SELECT
      |    (SELECT cast(count(DISTINCT wt) as bigint) FROM p WHERE ref) vv,
      |    (SELECT cast(count(*) as bigint) FROM cc2) tb),
      |sc AS (SELECT p.doc_id,
      |    CASE WHEN p.u IS NOT NULL AND ctx2.c2 IS NOT NULL THEN
      |           cast(floor(-1000000.0 * ln($knPtE) + 0.5) as bigint)
      |         WHEN p.v IS NOT NULL AND ctx1.cc1 IS NOT NULL THEN
      |           cast(floor(-1000000.0 * ln($knPbE) + 0.5) as bigint)
      |         ELSE cast(floor(-1000000.0 * ln($knPcE) + 0.5) as bigint)
      |    END nll
      |  FROM p
      |  LEFT JOIN tri ON tri.t1 = p.u AND tri.t2 = p.v AND tri.t3 = p.wt
      |  LEFT JOIN ctx2 ON ctx2.x1 = p.u AND ctx2.x2 = p.v
      |  LEFT JOIN cc2 ON cc2.m1 = p.v AND cc2.m2 = p.wt
      |  LEFT JOIN ctx1 ON ctx1.k1 = p.v
      |  LEFT JOIN pcx ON pcx.p1 = p.wt
      |  CROSS JOIN tot),
      |ds AS (SELECT doc_id, cast(count(*) as bigint) n_scored,
      |        cast(sum(nll) as bigint) nll_e6,
      |        cast(sum(nll) // count(*) as bigint) spt
      |  FROM sc GROUP BY 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    // t118: the full interpolated-KN derivation re-run from the
    // parquet — trigram TYPE table, continuation counts (cc2/cc1/
    // N1+), the add-one-floored continuation unigram, the three
    // backoff arms chosen by context availability, micro-nat
    // quantization once per position, then t112's positional tertiles
    "t118_kn_perplexity_filter" ->
      (knScoreCtes + """,
        |nn AS (SELECT cast(count(*) as bigint) n FROM ds),
        |rk AS (SELECT spt, row_number() OVER (ORDER BY spt) rn FROM ds),
        |th AS (SELECT
        |    max(CASE WHEN rn = (SELECT (n + 2) // 3 FROM nn)
        |        THEN spt END) t1,
        |    max(CASE WHEN rn = (SELECT (2 * n + 2) // 3 FROM nn)
        |        THEN spt END) t2
        |  FROM rk)
        |SELECT doc_id, n_scored, nll_e6, spt,
        |  CASE WHEN spt <= t1 THEN 'head'
        |       WHEN spt <= t2 THEN 'middle'
        |       ELSE 'tail' END bucket
        |FROM ds, th ORDER BY doc_id""".stripMargin),
    // t112: the full CCNet derivation re-run from the parquet — the
    // reference bigram LM's integer counts, micro-nat quantization
    // (floor(1e6·ln + 0.5), applied ONCE so document scores are exact
    // integer sums in both engines), positional tertile thresholds at
    // ranks ceil(n/3) / ceil(2n/3), ties to the lower bucket
    "t112_perplexity_filter" ->
      """WITH d AS (SELECT doc_id, (doc_id % 2 = 0) AS ref,
        |    list_filter(string_split(text, ' '), x -> x <> '') w
        |  FROM documents),
        |p AS (SELECT doc_id, ref,
        |    CASE WHEN t.i = 1 THEN NULL
        |         ELSE w[CAST(t.i AS INT) - 1] END wp,
        |    w[CAST(t.i AS INT)] wt
        |  FROM d, UNNEST(range(1, len(w) + 1)) t(i) WHERE len(w) >= 1),
        |uni AS (SELECT wt u, cast(count(*) as bigint) cu
        |        FROM p WHERE ref GROUP BY 1),
        |bi AS (SELECT wp b1, wt b2, cast(count(*) as bigint) cb
        |       FROM p WHERE ref AND wp IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT cast(sum(cu) as bigint) tt,
        |               cast(count(*) as bigint) vv FROM uni),
        |sc AS (SELECT p.doc_id,
        |    CASE WHEN u1.cu IS NOT NULL THEN
        |      cast(floor(1000000.0 * ln((u1.cu + tot.vv)::DOUBLE /
        |        (coalesce(bi.cb, 0) + 1)) + 0.5) as bigint)
        |    ELSE
        |      cast(floor(1000000.0 * ln((tot.tt + tot.vv)::DOUBLE /
        |        (coalesce(u2.cu, 0) + 1)) + 0.5) as bigint)
        |    END nll
        |  FROM p
        |  LEFT JOIN uni u1 ON u1.u = p.wp
        |  LEFT JOIN bi ON bi.b1 = p.wp AND bi.b2 = p.wt
        |  LEFT JOIN uni u2 ON u2.u = p.wt
        |  CROSS JOIN tot),
        |ds AS (SELECT doc_id, cast(count(*) as bigint) n_scored,
        |        cast(sum(nll) as bigint) nll_e6,
        |        cast(sum(nll) // count(*) as bigint) spt
        |  FROM sc GROUP BY 1),
        |nn AS (SELECT cast(count(*) as bigint) n FROM ds),
        |rk AS (SELECT spt, row_number() OVER (ORDER BY spt) rn FROM ds),
        |th AS (SELECT
        |    max(CASE WHEN rn = (SELECT (n + 2) // 3 FROM nn)
        |        THEN spt END) t1,
        |    max(CASE WHEN rn = (SELECT (2 * n + 2) // 3 FROM nn)
        |        THEN spt END) t2
        |  FROM rk)
        |SELECT doc_id, n_scored, nll_e6, spt,
        |  CASE WHEN spt <= t1 THEN 'head'
        |       WHEN spt <= t2 THEN 'middle'
        |       ELSE 'tail' END bucket
        |FROM ds, th ORDER BY doc_id""".stripMargin,
    // t116: all four CCNet stages re-derived in one query — fixture
    // construction (floor, planted mirrors, banner, transliteration),
    // exact dedup (min id per identical text), the lang-id survivor
    // set (the all-correct require in-gate makes it the Latin
    // parity), line-df boilerplate removal at 25%, and t112's integer
    // micro-nat bigram LM + positional tertiles over the CLEANED text
    "t116_ccnet_pipeline" ->
      ("""WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 5
        |         THEN 'the shared landing page boilerplate body repeated across mirrors'
        |         ELSE text END AS tf
        |  FROM documents WHERE length(text) >= 50),
        |lt AS (SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 1 THEN translate(
        |      CASE WHEN doc_id % 3 = 0
        |           THEN 'accept all cookies' || chr(10) || tf ELSE tf END,
        |      'abcdefghijklmnopqrstuvwxyz', '""" + "\u0627\u0628\u062a\u062b\u062c\u062d\u062e\u062f\u0630\u0631\u0632\u0633\u0634\u0635\u0636\u0637\u0638\u0639\u063a\u0641\u0642\u0643\u0644\u0645\u0646\u0647" + """')
        |    ELSE CASE WHEN doc_id % 3 = 0
        |              THEN 'accept all cookies' || chr(10) || tf ELSE tf END
        |    END AS ltext
        |  FROM base),
        |dd AS (SELECT cast(min(doc_id) as bigint) doc_id, ltext
        |       FROM lt GROUP BY ltext),
        |en AS (SELECT doc_id, ltext AS t FROM dd WHERE doc_id % 2 = 0),
        |lx AS (SELECT doc_id, string_split(t, chr(10)) ls FROM en),
        |ln AS (SELECT doc_id, t.i AS idx, ls[CAST(t.i AS INT)] AS line
        |       FROM lx, UNNEST(range(1, len(ls) + 1)) t(i)),
        |ndoc AS (SELECT cast(count(*) as bigint) n FROM en),
        |ldf AS (SELECT line, cast(count(DISTINCT doc_id) as bigint) df
        |        FROM ln GROUP BY 1),
        |keepln AS (SELECT ln.doc_id, ln.idx, ln.line
        |           FROM ln JOIN ldf USING (line) CROSS JOIN ndoc
        |           WHERE ldf.df * 1000000 < ndoc.n * 250000),
        |cl AS (SELECT doc_id,
        |         array_to_string(list(line ORDER BY idx), chr(10)) AS ct
        |       FROM keepln GROUP BY doc_id),
        |d AS (SELECT doc_id, (doc_id % 4 = 0) AS ref,
        |    list_filter(string_split(ct, ' '), x -> x <> '') w
        |  FROM cl),
        |p AS (SELECT doc_id, ref,
        |    CASE WHEN t.i = 1 THEN NULL
        |         ELSE w[CAST(t.i AS INT) - 1] END wp,
        |    w[CAST(t.i AS INT)] wt
        |  FROM d, UNNEST(range(1, len(w) + 1)) t(i) WHERE len(w) >= 1),
        |uni AS (SELECT wt u, cast(count(*) as bigint) cu
        |        FROM p WHERE ref GROUP BY 1),
        |bi AS (SELECT wp b1, wt b2, cast(count(*) as bigint) cb
        |       FROM p WHERE ref AND wp IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT cast(sum(cu) as bigint) tt,
        |               cast(count(*) as bigint) vv FROM uni),
        |sc AS (SELECT p.doc_id,
        |    CASE WHEN u1.cu IS NOT NULL THEN
        |      cast(floor(1000000.0 * ln((u1.cu + tot.vv)::DOUBLE /
        |        (coalesce(bi.cb, 0) + 1)) + 0.5) as bigint)
        |    ELSE
        |      cast(floor(1000000.0 * ln((tot.tt + tot.vv)::DOUBLE /
        |        (coalesce(u2.cu, 0) + 1)) + 0.5) as bigint)
        |    END nll
        |  FROM p
        |  LEFT JOIN uni u1 ON u1.u = p.wp
        |  LEFT JOIN bi ON bi.b1 = p.wp AND bi.b2 = p.wt
        |  LEFT JOIN uni u2 ON u2.u = p.wt
        |  CROSS JOIN tot),
        |ds AS (SELECT doc_id, cast(count(*) as bigint) n_scored,
        |        cast(sum(nll) as bigint) nll_e6,
        |        cast(sum(nll) // count(*) as bigint) spt
        |  FROM sc GROUP BY 1),
        |nn AS (SELECT cast(count(*) as bigint) n FROM ds),
        |rk AS (SELECT spt, row_number() OVER (ORDER BY spt) rn FROM ds),
        |th AS (SELECT
        |    max(CASE WHEN rn = (SELECT (n + 2) // 3 FROM nn)
        |        THEN spt END) t1,
        |    max(CASE WHEN rn = (SELECT (2 * n + 2) // 3 FROM nn)
        |        THEN spt END) t2
        |  FROM rk)
        |SELECT doc_id, n_scored, nll_e6, spt,
        |  CASE WHEN spt <= t1 THEN 'head'
        |       WHEN spt <= t2 THEN 'middle'
        |       ELSE 'tail' END bucket
        |FROM ds, th
        |WHERE CASE WHEN spt <= t1 THEN 'head'
        |           WHEN spt <= t2 THEN 'middle'
        |           ELSE 'tail' END <> 'tail'
        |ORDER BY doc_id""").stripMargin,
    // t114: the learned lang-id's held-out verdict — the two scripts
    // are disjoint in trigram space, so a working trainer labels every
    // held-out doc with the language its transliteration parity
    // defined; any miss breaks the hash (t103's verdict pattern)
    "t114_lang_id" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 1 THEN 'fa' ELSE 'en' END AS pred_lang
        |FROM documents WHERE doc_id % 4 >= 2 AND length(text) >= 50
        |ORDER BY doc_id""".stripMargin,
    // t119: all held-out argmax verdicts are require()d correct
    // in-gate, so the oracle states the fixture's class mapping — the
    // argmax the gate must reproduce — independently of the trainer
    "t119_multiclass_lang_id" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 1 THEN 'fa'
        |       WHEN doc_id % 3 = 2 THEN 'dg'
        |       ELSE 'en' END AS language
        |FROM documents WHERE doc_id % 4 >= 2 AND length(text) >= 50
        |ORDER BY doc_id""".stripMargin,
    // t103: the learned scorer's held-out verdict — the trait is
    // feature-expressible, so a working trainer classifies every
    // held-out doc correctly; any miss breaks the hash
    "t103_quality_classifier" ->
      """SELECT doc_id, true AS correct FROM documents
        |WHERE doc_id % 2 = 1 ORDER BY doc_id""".stripMargin,
    // t102: the full DSIR derivation re-run from the parquet — md5
    // hex-char buckets, Laplace-smoothed log-ratios quantized to
    // integer micro-nats ONCE (so document scores are exact integer
    // sums in both engines), selection = score > 0
    "t102_dsir_resample" ->
      """WITH toks AS (
        |  SELECT doc_id, (text LIKE '%customer%') AS t,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) w
        |  FROM documents),
        |bk AS (SELECT doc_id, t,
        |  ((CASE WHEN substr(md5(w),1,1) BETWEEN '0' AND '9'
        |         THEN ascii(substr(md5(w),1,1)) - 48
        |         ELSE ascii(substr(md5(w),1,1)) - 87 END) * 16 +
        |   (CASE WHEN substr(md5(w),2,1) BETWEEN '0' AND '9'
        |         THEN ascii(substr(md5(w),2,1)) - 48
        |         ELSE ascii(substr(md5(w),2,1)) - 87 END)) % 64 AS b
        |  FROM toks),
        |cnt AS (SELECT b,
        |    cast(sum(CASE WHEN t THEN 1 ELSE 0 END) as bigint) ct,
        |    cast(count(*) as bigint) cr
        |  FROM bk GROUP BY 1),
        |tot AS (SELECT cast(sum(ct) as bigint) tt,
        |               cast(sum(cr) as bigint) rt FROM cnt),
        |sc AS (SELECT b,
        |    cast(floor(1000000.0 *
        |      (ln((ct + 1)::DOUBLE / (tt + 64)) -
        |       ln((cr + 1)::DOUBLE / (rt + 64))) + 0.5) as bigint) s
        |  FROM cnt, tot),
        |ds AS (SELECT doc_id, cast(count(*) as bigint) n_tokens,
        |    cast(sum(s) as bigint) dsir_score_e6
        |  FROM bk JOIN sc USING (b) GROUP BY 1)
        |SELECT doc_id, n_tokens, dsir_score_e6 FROM ds
        |WHERE dsir_score_e6 > 0 ORDER BY doc_id""".stripMargin,
    // the window form the k-bounded aggregator must equal exactly:
    // (cnt desc, value asc) over cnt = −hk ⇔ ORDER BY hk, doc_id
    // t101: the oracle IS the window form — the engine's
    // histogram-threshold path must equal explicit per-group ranking
    "t101_temperature_mixture" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 16 < 10 THEN 'huge'
        |         WHEN doc_id % 16 < 14 THEN 'mid'
        |         WHEN doc_id % 16 < 15 THEN 'rare_a'
        |         ELSE 'rare_b' END grp
        |  FROM documents),
        |n AS (SELECT grp, count(*) n,
        |        CAST(FLOOR(SQRT(count(*))) AS BIGINT) w
        |      FROM d GROUP BY grp),
        |tk AS (SELECT grp, least(120 * w // (SELECT sum(w) FROM n), n) tke
        |       FROM n),
        |r AS (SELECT grp, doc_id,
        |        row_number() OVER (PARTITION BY grp
        |          ORDER BY (doc_id * 2654435761) % 1000003, doc_id) rnk
        |      FROM d)
        |SELECT r.grp, r.doc_id
        |FROM r JOIN tk USING (grp)
        |WHERE rnk <= tke
        |ORDER BY grp, doc_id""".stripMargin,
    "t97_balanced_sample" ->
      """WITH h AS (SELECT lang, doc_id,
        |    (doc_id * 2654435761) % 1000003 hk FROM documents),
        |r AS (SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) rnk
        |  FROM h)
        |SELECT lang, cast(rnk as bigint) "rank", doc_id
        |FROM r WHERE rnk <= 20 ORDER BY lang, "rank"""".stripMargin,
    "t71_bpe_merges" -> bpeOracleSql(8),
    "t72_bpe_tokenize" -> bpeTokenizeOracleSql(8),
    "t78_bpe_merges_delta" -> bpeOracleSql(8),
    "t76_bigram_surprisal" ->
      """WITH d AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') w
        |  FROM documents),
        |bg AS (SELECT doc_id, w[CAST(t.i AS INT)] w1, w[CAST(t.i AS INT) + 1] w2
        |       FROM d, UNNEST(range(1, len(w))) t(i) WHERE len(w) >= 2),
        |uni AS (SELECT w1, cast(count(*) as bigint) c1 FROM bg GROUP BY 1),
        |bi AS (SELECT w1, w2, cast(count(*) as bigint) c2 FROM bg GROUP BY 1, 2),
        |sc AS (SELECT doc_id, length(bin(c1)) - length(bin(c2)) sur
        |       FROM bg JOIN bi USING (w1, w2) JOIN uni USING (w1))
        |SELECT doc_id, cast(count(*) as bigint) n_bigrams,
        |  cast((sum(sur) * 100) // count(*) as bigint) avg_bigram_surprisal_c
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    "t77_split_assign" ->
      """WITH k AS (SELECT doc_id, md5(doc_id || ':split') h FROM documents),
        |b AS (SELECT doc_id,
        |  CAST((CASE WHEN substr(h,1,1) BETWEEN '0' AND '9'
        |             THEN ascii(substr(h,1,1)) - 48 ELSE ascii(substr(h,1,1)) - 87 END) * 16
        |     + (CASE WHEN substr(h,2,1) BETWEEN '0' AND '9'
        |             THEN ascii(substr(h,2,1)) - 48 ELSE ascii(substr(h,2,1)) - 87 END)
        |    AS INT) bucket
        |  FROM k)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 204 THEN 'train'
        |       WHEN bucket < 230 THEN 'val' ELSE 'test' END split
        |FROM b ORDER BY doc_id""".stripMargin,
    "t73_global_quantiles" ->
      // the same 1-based positional definition as t62, one global row
      """WITH d AS (SELECT
        |    cast(len(list_filter(string_split(text, ' '), x -> x <> '')) as bigint) v
        |  FROM documents),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) rn, count(*) OVER () n FROM d)
        |SELECT cast(max(n) as bigint) n,
        |  cast(max(CASE WHEN rn = (1 * n + 1) // 2 THEN v END) as bigint) p50,
        |  cast(max(CASE WHEN rn = (9 * n + 9) // 10 THEN v END) as bigint) p90,
        |  cast(max(CASE WHEN rn = (99 * n + 99) // 100 THEN v END) as bigint) p99
        |FROM r""".stripMargin,
    "t79_approx_profile" ->
      // exact tier only — the sketch side is engine-specific, so the
      // oracle pins the exact values and asserts the within-ε flags
      // are all 1 (the Spark side computes them from its sketches)
      """WITH d AS (SELECT
        |    cast(len(list_filter(string_split(text, ' '), x -> x <> '')) as bigint) v
        |  FROM documents),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) rn, count(*) OVER () n FROM d),
        |q AS (SELECT cast(max(n) as bigint) n,
        |  cast(max(CASE WHEN rn = (1 * n + 1) // 2 THEN v END) as bigint) p50,
        |  cast(max(CASE WHEN rn = (9 * n + 9) // 10 THEN v END) as bigint) p90,
        |  cast(max(CASE WHEN rn = (99 * n + 99) // 100 THEN v END) as bigint) p99
        | FROM r),
        |t AS (SELECT cast(count(DISTINCT term) as bigint) d_exact FROM
        |  (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        |   FROM documents))
        |SELECT n, d_exact, p50, p90, p99,
        |  1 hll_ok, 1 p50_ok, 1 p90_ok, 1 p99_ok
        |FROM q, t""".stripMargin,
    "t92_independence_profile" ->
      """WITH d AS (SELECT source, lang FROM documents),
        |c AS (SELECT source, lang, cast(count(*) as bigint) obs
        |      FROM d GROUP BY 1, 2),
        |sm AS (SELECT source, cast(count(*) as bigint) n_source
        |       FROM d GROUP BY 1),
        |lm AS (SELECT lang, cast(count(*) as bigint) n_lang
        |       FROM d GROUP BY 1),
        |nn AS (SELECT cast(count(*) as bigint) n FROM d)
        |SELECT c.source, c.lang, c.obs,
        |  obs * nn.n * 1000000 // (n_source * n_lang) - 1000000 dev_e6
        |FROM c JOIN sm ON c.source = sm.source
        |       JOIN lm ON c.lang = lm.lang, nn
        |ORDER BY c.source, c.lang""".stripMargin,
    "t87_sketch_merge" ->
      // exact tier + pinned flags (t79's pattern): the sketch side is
      // engine-specific, the oracle asserts the within-ε flags are 1
      """WITH t AS (SELECT source, unnest(list_distinct(
        |      list_filter(string_split(text, ' '), x -> x <> ''))) term
        |    FROM documents),
        |s AS (SELECT source, cast(count(DISTINCT term) as bigint) d_exact
        |      FROM t GROUP BY 1),
        |a AS (SELECT '__ALL__' source,
        |        cast(count(DISTINCT term) as bigint) d_exact FROM t)
        |SELECT source, d_exact, 1 hll_ok FROM s
        |UNION ALL SELECT source, d_exact, 1 FROM a
        |ORDER BY source""".stripMargin,
    "t81_heavy_hitters" ->
      """WITH t AS (SELECT doc_id, unnest(list_distinct(
        |      list_filter(string_split(text, ' '), x -> x <> ''))) term
        |    FROM documents),
        |df AS (SELECT term, cast(count(*) as bigint) df FROM t GROUP BY 1),
        |n AS (SELECT cast(count(*) as bigint) n_docs FROM documents)
        |SELECT term, df FROM df, n WHERE df * 50 >= n_docs
        |ORDER BY df DESC, term""".stripMargin,
    "t82_observe_metrics" ->
      // the identical aggregates, computed from the table directly —
      // the in-flight counters must equal a dedicated scan's answer
      """SELECT cast(count(*) as bigint) n_rows,
        |  cast(sum(CASE WHEN lang IS NULL OR lang = '' THEN 1 ELSE 0 END) as bigint) n_bad_lang,
        |  cast(sum(length(text)) as bigint) total_chars,
        |  cast(max(doc_id) as bigint) max_doc_id
        |FROM documents""".stripMargin,
    "t80_moment_profile" ->
      """WITH d AS (SELECT source,
        |    cast(len(list_filter(string_split(text, ' '), x -> x <> '')) as bigint) v
        |  FROM documents),
        |m AS (SELECT source, cast(count(*) as bigint) n,
        |        cast(sum(v) as bigint) s1, cast(sum(v * v) as bigint) s2
        |      FROM d GROUP BY 1)
        |SELECT source, n, s1, s2, n * s2 - s1 * s1 AS var_num
        |FROM m ORDER BY source""".stripMargin,
    "t70_unigram_surprisal" ->
      // surprisal as bit-length difference (exact integer log2 gap)
      """WITH toks AS (SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        |  FROM documents),
        |tf AS (SELECT term, cast(count(*) as bigint) tf FROM toks GROUP BY 1),
        |nn AS (SELECT cast(sum(tf) as bigint) nn FROM tf),
        |sc AS (SELECT doc_id,
        |         length(bin(nn.nn)) - length(bin(tf.tf)) surprisal
        |       FROM toks JOIN tf USING (term), nn)
        |SELECT doc_id, cast(count(*) as bigint) n_tokens,
        |  cast((sum(surprisal) * 100) // count(*) as bigint) avg_surprisal_c
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    "t66_pagerank" ->
      // the same three integer rounds, unrolled; // floors match div
      // on the non-negative rank domain
      """WITH v AS (SELECT doc_id AS vid FROM documents),
        |nn AS (SELECT count(*) c FROM documents),
        |e AS (SELECT vid src, (vid * 2 + 1) % (SELECT c FROM nn) dst FROM v
        |      UNION ALL
        |      SELECT vid, (vid * 3 + 7) % (SELECT c FROM nn) FROM v),
        |deg AS (SELECT src, cast(count(*) as bigint) deg FROM e GROUP BY 1),
        |r0 AS (SELECT vid, cast(1000000 as bigint) r FROM v),
        |s1 AS (SELECT e.dst, sum(r0.r // d.deg) s FROM e
        |       JOIN r0 ON e.src = r0.vid JOIN deg d ON e.src = d.src GROUP BY 1),
        |r1 AS (SELECT v.vid, 150000 + (850 * coalesce(s1.s, 0)) // 1000 r
        |       FROM v LEFT JOIN s1 ON v.vid = s1.dst),
        |s2 AS (SELECT e.dst, sum(r1.r // d.deg) s FROM e
        |       JOIN r1 ON e.src = r1.vid JOIN deg d ON e.src = d.src GROUP BY 1),
        |r2 AS (SELECT v.vid, 150000 + (850 * coalesce(s2.s, 0)) // 1000 r
        |       FROM v LEFT JOIN s2 ON v.vid = s2.dst),
        |s3 AS (SELECT e.dst, sum(r2.r // d.deg) s FROM e
        |       JOIN r2 ON e.src = r2.vid JOIN deg d ON e.src = d.src GROUP BY 1),
        |r3 AS (SELECT v.vid, 150000 + (850 * coalesce(s3.s, 0)) // 1000 r
        |       FROM v LEFT JOIN s3 ON v.vid = s3.dst)
        |SELECT vid AS doc_id, cast(r as bigint) rank_e6
        |FROM r3 ORDER BY doc_id""".stripMargin,
    "t67_bpe_pairs" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) w FROM documents),
        |w2 AS (SELECT w FROM w WHERE length(w) >= 2),
        |p AS (SELECT substr(w, CAST(t.i AS INT), 2) pair
        |      FROM w2, UNNEST(range(1, length(w))) t(i)),
        |c AS (SELECT pair, cast(count(*) as bigint) n FROM p GROUP BY 1)
        |SELECT cast(row_number() OVER (ORDER BY n DESC, pair) as int) rank, pair, n
        |FROM c ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    "t63_zipf_histogram" ->
      """WITH terms AS (SELECT
        |    unnest(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) term
        |  FROM documents),
        |tf AS (SELECT term, cast(count(*) as bigint) df FROM terms GROUP BY 1)
        |SELECT cast(length(bin(df)) - 1 as int) bucket,
        |  cast(count(*) as bigint) n_terms,
        |  cast(sum(df) as bigint) total_df
        |FROM tf GROUP BY 1 ORDER BY 1""".stripMargin,
    "t62_token_quantiles" ->
      // positional quantile: the value at 1-based row ceil(num·n/den)
      // of each source's sorted token counts, in integer arithmetic
      """WITH d AS (SELECT source,
        |    cast(len(list_filter(string_split(text, ' '), x -> x <> '')) as bigint) v
        |  FROM documents),
        |r AS (SELECT source, v,
        |        row_number() OVER (PARTITION BY source ORDER BY v) rn,
        |        count(*) OVER (PARTITION BY source) n
        |      FROM d)
        |SELECT source, cast(max(n) as bigint) n,
        |  cast(max(CASE WHEN rn = (1 * n + 1) // 2 THEN v END) as bigint) p50,
        |  cast(max(CASE WHEN rn = (9 * n + 9) // 10 THEN v END) as bigint) p90,
        |  cast(max(CASE WHEN rn = (99 * n + 99) // 100 THEN v END) as bigint) p99
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "t58_tfidf_top_terms" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, cast(count(*) as bigint) tf
        |       FROM toks GROUP BY 1, 2),
        |dfq AS (SELECT term, cast(count(*) as bigint) df FROM tf GROUP BY 1),
        |sc AS (SELECT doc_id, tf.term, tf, df,
        |         cast((tf * 1000000) // df as bigint) score_q
        |       FROM tf JOIN dfq USING (term)),
        |rk AS (SELECT *, cast(row_number() OVER (PARTITION BY doc_id
        |         ORDER BY score_q DESC, term) as int) rank FROM sc)
        |SELECT doc_id, rank, term, tf, df, score_q
        |FROM rk WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "t59_domain_stats" ->
      // the canonical hosts, stated independently in closed form
      """WITH u AS (SELECT doc_id, lang,
        |  CASE doc_id % 7
        |    WHEN 0 THEN 'www.example.com' WHEN 1 THEN 'blog.example.com'
        |    WHEN 2 THEN 'cdn.example.com' WHEN 3 THEN 'news.site.org'
        |    WHEN 4 THEN 'site.org'        WHEN 5 THEN 'api.service.net'
        |    ELSE 'service.net' END host,
        |  cast(len(list_filter(string_split(text, ' '), x -> x <> '')) as bigint) n_tokens
        | FROM documents),
        |d AS (SELECT *, regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain FROM u)
        |SELECT domain, cast(count(*) as bigint) n_docs,
        |  cast(count(DISTINCT host) as bigint) n_hosts,
        |  cast(sum(n_tokens) as bigint) total_tokens,
        |  cast(count(DISTINCT lang) as bigint) n_langs
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "t60_shuffle_shards" ->
      // same semantics as ONE global window — the engine must reproduce
      // it with its distributed prefix count
      """WITH r AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY md5(doc_id || ':42'), doc_id) - 1 AS pos
        |  FROM documents)
        |SELECT doc_id, cast(pos as bigint) pos, cast(pos // 64 as bigint) shard
        |FROM r ORDER BY pos""".stripMargin,
    "t61_mixture_sample" ->
      """WITH d AS (SELECT doc_id, source,
        |    cast(len(list_filter(string_split(text, ' '), x -> x <> '')) as bigint) n_tokens,
        |    md5(doc_id || ':mix') kk,
        |    500 + (CAST(substr(source, 4) AS INT) % 3) * 1500 budget
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tokens, budget,
        |        cast(sum(n_tokens) OVER (PARTITION BY source ORDER BY kk, doc_id
        |          ROWS UNBOUNDED PRECEDING) as bigint) cum_tokens
        |      FROM d)
        |SELECT doc_id, source, n_tokens, cum_tokens
        |FROM c WHERE cum_tokens <= budget
        |ORDER BY source, cum_tokens""".stripMargin,
  )
}
