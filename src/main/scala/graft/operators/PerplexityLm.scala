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
    // ONE pass over the reference token stream: (wp, wt) PAIR-TYPE
    // counts including the null-context first tokens — every LM table
    // (unigram, bigram, totals) derives from this type-sized frame, so
    // the tokenize-explode runs once for training instead of once per
    // derived table (the r17 before-plan re-scanned the stream 10×:
    // uni fed c1t, c2t AND tot, bi a fourth scan, scoring a fifth, and
    // the gate's double consumption of `scored` doubled all of it).
    // localCheckpoint materializes it eagerly: vocab-type-sized, the
    // shippable LM artifact — bounded at any corpus scale. Counts are
    // bit-identical to the per-table aggregates they replace
    // (uni(w) = Σ_wp pair(wp,w) over a partition of the positions).
    val pairCounts = pairs.filter(col("__ref"))
      .groupBy(col("wp"), col("wt"))
      .agg(count(lit(1)).cast("long").as("cp"))
      .localCheckpoint()
    val uni = pairCounts.groupBy(col("wt"))
      .agg(sum(col("cp")).cast("long").as("cu"))
    val bi = pairCounts.filter(col("wp").isNotNull)
      .select(col("wp").as("b1"), col("wt").as("b2"), col("cp").as("cb"))
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

  /** Per-document LM score under an INTERPOLATED KNESER-NEY TRIGRAM
    * model (Kneser & Ney 1995; Chen & Goodman 1999's interpolated
    * form) trained on the `isReference` slice — the model class CCNet
    * actually ships (KenLM is modified Kneser-Ney): where the Laplace
    * bigram over-keeps repetitive junk, KN discounts observed n-gram
    * mass by a fixed D and backs off through CONTINUATION counts
    * ("how many distinct contexts precede this word"), so stuck
    * repeaters stop looking probable. Fixed discount D = 0.75 at both
    * levels (the textbook value; a literal, so the float shape stays
    * pinned).
    *
    *   P(w|u,v) = (max(c3(uvw)−D, 0) + D·N1+(uv·)·P(w|v)) / c2(uv)
    *   P(w|v)   = (max(cc2(vw)−D, 0) + D·N1+(v·)·Pc(w)) / cc1(v)
    *   Pc(w)    = (N1+(·w) + 1) / (N1+(··) + V + 1)
    *
    * where c3/c2 are reference trigram/context counts, cc2/cc1/N1+
    * continuation type counts derived from the trigram TYPE table, V
    * the reference vocabulary, and the +1s an add-one floor so
    * out-of-vocabulary tokens score finitely (pure KN assigns them
    * zero). A position scores with the HIGHEST order whose context the
    * reference saw: full trigram context → first form; known `v` only
    * (or i = 1) → second; otherwise the continuation unigram.
    *
    * Determinism: every count is an exact integer; each position's
    * probability is ONE pinned float expression over those integers
    * (left-associated exactly as the oracle mirrors it textually) and
    * quantizes ONCE to integer micro-nats — documents then sum
    * integers, the [[scoreBigramLm]] discipline. 100 TB shape
    * unchanged: one tokenize-explode projection, count tables are
    * n-gram-type-sized aggregates (map-side combinable), scoring is
    * five token-keyed hash/broadcast joins — linear, no windows.
    * Output shape = [[scoreBigramLm]] (doc_id, n_scored, nll_e6, spt),
    * so [[ccnetSplit]] composes unchanged. */
  def scoreKnTrigramLm(docs: DataFrame, idCol: String, textCol: String,
                       isReference: Column): DataFrame =
    scoreWithKnLm(docs, idCol, textCol,
      trainKnTrigramLm(docs.filter(isReference), textCol))

  /** The trained KN model: five n-gram-TYPE-bounded count tables plus
    * the one-row totals — the shippable LM artifact (vocab-sized
    * DataFrames; `localCheckpoint` them when scoring many batches, the
    * q202 streaming shape). */
  final case class KnLm(tri: DataFrame, ctx2: DataFrame, cc2: DataFrame,
                        ctx1: DataFrame, pcT: DataFrame, tot: DataFrame) {
    /** Pin every table so per-batch scoring joins reuse materialized
      * results instead of re-deriving the counts. */
    def checkpointed(): KnLm = KnLm(tri.localCheckpoint(),
      ctx2.localCheckpoint(), cc2.localCheckpoint(),
      ctx1.localCheckpoint(), pcT.localCheckpoint(), tot.localCheckpoint())
  }

  /** Train the interpolated-KN count tables on `refDocs` (see
    * [[scoreKnTrigramLm]] for the model). */
  def trainKnTrigramLm(refDocs: DataFrame, textCol: String): KnLm = {
    val refPos = knPositions(refDocs, textCol, idCol = None)
    // ONE pass over the reference position stream: (u, v, wt) POSITION-
    // TYPE counts, null contexts retained — the trigram table, the
    // vocabulary, and (through tri) every continuation table derive
    // from this type-sized frame. localCheckpoint materializes it
    // eagerly so the tokenize-explode runs once for training (the r17
    // before-plan re-scanned the stream 16×: tri fed ctx2/cc2/ctx1/pcT
    // each as a fresh derivation, tot a separate distinct scan, and
    // the gate's double consumption of `scored` doubled all of it).
    val posCounts = refPos.groupBy(col("u"), col("v"), col("wt"))
      .agg(count(lit(1)).cast("long").as("cn"))
      .localCheckpoint()
    // trigram TOKEN counts; everything below derives from this one
    // TYPE table (classic KN trains lower orders on type counts)
    val tri = posCounts.filter(col("u").isNotNull)
      .select(col("u").as("t1"), col("v").as("t2"), col("wt").as("t3"),
        col("cn").as("c3"))
    val ctx2 = tri.groupBy(col("t1").as("x1"), col("t2").as("x2"))
      .agg(sum(col("c3")).cast("long").as("c2"),
        count(lit(1)).cast("long").as("n1puv"))
    // continuation bigram: distinct u preceding (v, w) = tri row count.
    // Checkpointed too — ctx1, pcT, tot AND the scoring join all read
    // it (4 consumers), and it is n-gram-type-bounded like tri.
    val cc2 = tri.groupBy(col("t2").as("m1"), col("t3").as("m2"))
      .agg(count(lit(1)).cast("long").as("cc2"))
      .localCheckpoint()
    val ctx1 = cc2.groupBy(col("m1").as("k1"))
      .agg(sum(col("cc2")).cast("long").as("cc1"),
        count(lit(1)).cast("long").as("n1pv"))
    val pcT = cc2.groupBy(col("m2").as("p1"))
      .agg(count(lit(1)).cast("long").as("pc"))
    // vocabulary from the position-type table: every position's wt
    // appears in some (u, v, wt) group, so the distinct set is the same
    // as over the raw stream — without the second stream scan
    val tot = posCounts.agg(countDistinct(col("wt")).cast("long").as("vv"))
      .crossJoin(cc2.agg(count(lit(1)).cast("long").as("tb")))
    KnLm(tri, ctx2, cc2, ctx1, pcT, tot)
  }

  /** The (u, v, wt) position stream: each token with its two left
    * context tokens (null when the position has none — the arm chooser
    * reads the nulls). */
  private def knPositions(docs: DataFrame, textCol: String,
                          idCol: Option[String]): DataFrame = {
    val keep = idCol.map(c => col(c).as("doc_id")).toSeq
    val base = docs
      .select(keep :+
        expr(s"filter(split($textCol, ' '), x -> x <> '')").as("__w"): _*)
      .filter(size(col("__w")) >= 1)
    base.select((keep.map(_ => col("doc_id")) :+
        explode(expr("transform(sequence(0, size(__w) - 1), i -> struct(" +
          "CASE WHEN i >= 2 THEN __w[i - 2] ELSE NULL END AS u, " +
          "CASE WHEN i >= 1 THEN __w[i - 1] ELSE NULL END AS v, " +
          "__w[i] AS wt))")).as("t")): _*)
      .select((keep.map(_ => col("doc_id")) ++
        Seq(col("t.u"), col("t.v"), col("t.wt"))): _*)
  }

  /** Score `docs` against an already-trained [[KnLm]] — the scoring
    * half of [[scoreKnTrigramLm]], usable per micro-batch against a
    * static model (q202's streaming shape). */
  def scoreWithKnLm(docs: DataFrame, idCol: String, textCol: String,
                    lm: KnLm): DataFrame = {
    import lm.{tri, ctx2, cc2, ctx1, pcT, tot}
    val pos = knPositions(docs, textCol, Some(idCol))
    val j = pos
      .join(tri, pos("u") === tri("t1") && pos("v") === tri("t2") &&
        pos("wt") === tri("t3"), "left")
      .join(ctx2, pos("u") === ctx2("x1") && pos("v") === ctx2("x2"), "left")
      .join(cc2, pos("v") === cc2("m1") && pos("wt") === cc2("m2"), "left")
      .join(ctx1, pos("v") === ctx1("k1"), "left")
      .join(pcT, pos("wt") === pcT("p1"), "left")
      .crossJoin(broadcast(tot))
    // the three pinned probability shapes — mirrored TEXTUALLY by the
    // oracle (same association, same casts) so the doubles and their
    // micro-nat quantizations match bit-for-bit
    val pcD = (coalesce(col("pc"), lit(0L)) + lit(1L)).cast("double") /
      (col("tb") + col("vv") + lit(1L)).cast("double")
    val pbD = (greatest(coalesce(col("cc2"), lit(0L)).cast("double") -
        lit(0.75), lit(0.0)) +
      lit(0.75) * col("n1pv").cast("double") * pcD) /
      col("cc1").cast("double")
    val ptD = (greatest(coalesce(col("c3"), lit(0L)).cast("double") -
        lit(0.75), lit(0.0)) +
      lit(0.75) * col("n1puv").cast("double") * pbD) /
      col("c2").cast("double")
    // inside the trigram arm, c2 > 0 implies some (u,v,·) trigram
    // exists, hence cc1(v) > 0 — pbD never divides by null there
    val scored = j.select(col("doc_id"),
      when(coalesce(col("vv"), lit(0L)) === 0,
        raise_error(lit("PerplexityLm: the reference slice is empty " +
          "— a KN LM trained on zero tokens cannot score; widen " +
          "isReference")).cast("long"))
      .when(col("u").isNotNull && col("c2").isNotNull,
        floor(lit(-1e6) * log(ptD) + lit(0.5)))
      .when(col("v").isNotNull && col("cc1").isNotNull,
        floor(lit(-1e6) * log(pbD) + lit(0.5)))
      .otherwise(floor(lit(-1e6) * log(pcD) + lit(0.5)))
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
    // the per-doc score frame is consumed twice (threshold pick + the
    // bucketed output) and is the expensive part of every caller's
    // pipeline (token-stream joins + aggregate) — materialize it once.
    // O(docs) rows of four integers: the artifact CCNet persists
    // between its scoring and filtering stages anyway, at any scale.
    val sc = scored.localCheckpoint()
    val th = CorpusShape.globalQuantiles(
      sc.select(col("spt")), "spt", Seq(("t1", 1, 3), ("t2", 2, 3)))
      .select(col("t1"), col("t2"))
    sc.crossJoin(broadcast(th))
      .withColumn("bucket",
        when(col("spt") <= col("t1"), "head")
          .when(col("spt") <= col("t2"), "middle")
          .otherwise("tail"))
      .drop("t1", "t2")
  }
}
