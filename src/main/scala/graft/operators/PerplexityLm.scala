package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style statistical-LM perplexity filtering (Wenzek et al.
  * 2020): train a smoothed bigram language model on a REFERENCE slice
  * of the corpus (CCNet trains KenLM on Wikipedia), score every
  * document by its per-token negative log-likelihood under that model,
  * and split the corpus into head / middle / tail perplexity tertiles
  * — the quality gate production web corpora apply before training.
  * Reference shape: the per-collection quality thresholds the pipeline
  * applies before indexing (dags/search_engine/
  * sql_search_full_rebuild_dag.py:24-110 filters on per-entity
  * aggregates the same way: score each unit against corpus statistics,
  * keep the band).
  *
  * Determinism discipline (the t102 micro-nat pattern): every
  * probability is a ratio of exact integer counts, quantized ONCE to
  * integer micro-nats — `floor(1e6 · ln(num/den) + 0.5)` — so document
  * scores are exact integer sums that any engine reproduces
  * bit-for-bit. No sketch, no float accumulation.
  *
  * Model: Laplace-smoothed bigram with unigram backoff.
  *   - bigram, context `wp` seen in the reference:
  *       nll(wp→w) = ln((c1(wp) + V) / (cb(wp,w) + 1))
  *   - first token of a document, or unseen context:
  *       nll(w) = ln((T + V) / (cu(w) + 1))
  *   where c1/cu are reference unigram counts, cb reference bigram
  *   counts, T the reference token total, V the reference vocabulary.
  *
  * 100 TB shape: tokenization is one projection; the LM tables are
  * vocab-sized count aggregates (map-side combinable); scoring is
  * three hash joins on token keys — all linear, no windows, no
  * driver-side state. The tertile thresholds come from
  * [[CorpusShape.globalQuantiles]]'s distributed prefix-count pick
  * (one bounded numPartitions-row collect), never a global sort
  * window, and broadcast back as a 1-row frame.
  */
object PerplexityLm {

  /** Per-document LM score under a bigram model trained on the
    * `isReference` slice: (doc_id, n_scored, nll_e6, spt) where
    * `nll_e6` is the exact integer micro-nat sum over the document's
    * tokens and `spt = nll_e6 div n_scored` the integer per-token
    * score (the perplexity proxy the tertile split ranks by).
    * Documents with no tokens are excluded (they carry no evidence).
    */
  def scoreBigramLm(docs: DataFrame, idCol: String, textCol: String,
                    isReference: Column): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc_id"), isReference.as("__ref"),
        expr(s"filter(split($textCol, ' '), x -> x <> '')").as("__w"))
      .filter(size(col("__w")) >= 1)
    // token stream with its left context (null for the first token)
    val pairs = base.select(col("doc_id"), col("__ref"),
        explode(expr("transform(sequence(0, size(__w) - 1), i -> " +
          "struct(CASE WHEN i = 0 THEN NULL ELSE __w[i - 1] END AS wp, " +
          "__w[i] AS wt))")).as("t"))
      .select(col("doc_id"), col("__ref"), col("t.wp"), col("t.wt"))
    val refToks = pairs.filter(col("__ref"))
    val uni = refToks.groupBy(col("wt"))
      .agg(count(lit(1)).cast("long").as("cu"))
    val bi = refToks.filter(col("wp").isNotNull)
      .groupBy(col("wp").as("b1"), col("wt").as("b2"))
      .agg(count(lit(1)).cast("long").as("cb"))
    val tot = uni.agg(sum(col("cu")).cast("long").as("tt"),
      count(lit(1)).cast("long").as("vv"))
    // Three declarative lookup joins on the token stream (context
    // unigram c1, bigram cb, backoff unigram cu2) — Catalyst picks the
    // physical strategy from the LM tables' stats: vocab-sized tables
    // broadcast (the stream never shuffles), genuinely huge LMs fall
    // back to hash joins on the token keys. Measured: a pre-scored
    // distinct-pair formulation (collapse the stream to per-doc pair
    // multiplicities, score pair kinds once) was ~2× SLOWER — web text
    // has near-zero within-document bigram repetition, so the collapse
    // pays stream-sized shuffles the broadcast plan never does. A null
    // wp never matches, so first tokens fall through to the backoff arm.
    val c1t = uni.select(col("wt").as("u1w"), col("cu").as("c1"))
    val c2t = uni.select(col("wt").as("u2w"), col("cu").as("cu2"))
    val scored = pairs
      .join(c1t, pairs("wp") === c1t("u1w"), "left")
      .join(bi, pairs("wp") === bi("b1") && pairs("wt") === bi("b2"), "left")
      .join(c2t, pairs("wt") === c2t("u2w"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        // an LM trained on ZERO reference tokens scores nothing —
        // fail loudly per scored row (an empty CORPUS still returns
        // empty: no row ever evaluates this branch)
        when(coalesce(col("vv"), lit(0L)) === 0,
          raise_error(lit("PerplexityLm: the reference slice is empty " +
            "— an LM trained on zero tokens cannot score; widen " +
            "isReference")).cast("long"))
        .when(col("c1").isNotNull,
          floor(lit(1e6) * log((col("c1") + col("vv")).cast("double") /
            (coalesce(col("cb"), lit(0L)) + lit(1L)).cast("double")) +
            lit(0.5)))
        .otherwise(
          floor(lit(1e6) * log((col("tt") + col("vv")).cast("double") /
            (coalesce(col("cu2"), lit(0L)) + lit(1L)).cast("double")) +
            lit(0.5)))
        .cast("long").as("nll"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_scored"),
        sum(col("nll")).cast("long").as("nll_e6"))
      .withColumn("spt", expr("nll_e6 div n_scored"))
  }

  /** CCNet's corpus split: head / middle / tail by per-token LM score
    * tertiles. Thresholds are the exact positional values at 1-based
    * ranks ceil(n/3) and ceil(2n/3) of the sorted `spt` column
    * (distributed prefix-count pick, no global window); `head` is the
    * lowest-perplexity third — the band CCNet keeps. Ties at a
    * threshold land in the lower bucket, so the rule — not an ntile's
    * arbitrary tie split — decides membership, and any engine
    * re-derives it. */
  def ccnetSplit(scored: DataFrame): DataFrame = {
    val th = CorpusShape.globalQuantiles(
      scored.select(col("spt")), "spt", Seq(("t1", 1, 3), ("t2", 2, 3)))
      .select(col("t1"), col("t2"))
    scored.crossJoin(broadcast(th))
      .withColumn("bucket",
        when(col("spt") <= col("t1"), "head")
          .when(col("spt") <= col("t2"), "middle")
          .otherwise("tail"))
      .drop("t1", "t2")
  }
}
