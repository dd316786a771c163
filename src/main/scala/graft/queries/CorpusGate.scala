package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.CorpusText

/** Oracle gates for the corpus-preparation operators
  * ([[graft.operators.CorpusText]]): cross-document boilerplate
  * removal, PII redaction, and sliding-window chunking — the
  * training-data-pipeline surface beyond per-document scoring.
  *
  * Determinism: counts as BIGINT, chunk payloads as md5 hex, rebuilt
  * text as plain strings (token joins are exact); the PII fixture is
  * synthesized from doc_id with printf-identical laws on both sides.
  */
object CorpusGate {
  type Q = (SparkSession, String) => DataFrame

  /** t55: MassiveText/CCNet-style boilerplate removal — drop every
    * 8-token segment that appears in ≥ 2 distinct documents, rebuild
    * each document from the survivors. At sf0.01 this marks 153 of
    * 3,434 segments across 93 documents — the oracle recomputes the
    * whole mark-and-rebuild independently. */
  def t55BoilerplateSegments(s: SparkSession, dir: String): DataFrame =
    CorpusText.removeBoilerplate(Tables.documents(s, dir), segTokens = 8, minDocs = 2)
      .orderBy("doc_id")

  /** PII-bearing fixture: append a deterministic doc_id-law suffix
    * (email / phone / IPv4 / clean, round-robin by doc_id % 4) to the
    * corpus text, so redaction has real spans to hit and the oracle
    * can synthesize the identical input. */
  private def withPii(docs: DataFrame): DataFrame = {
    val m = pmod(col("doc_id"), lit(4))
    docs.select(col("doc_id"),
      concat(col("text"),
        when(m === 0, format_string(" reach me at user%d@example.com today", col("doc_id")))
          .when(m === 1, format_string(" call +1-555-%04d now", pmod(col("doc_id"), lit(10000))))
          .when(m === 2, format_string(" server at 10.%d.%d.%d up",
            pmod(col("doc_id"), lit(200)), pmod(col("doc_id"), lit(250)),
            pmod(col("doc_id"), lit(100))))
          .otherwise(format_string(" nothing sensitive in row %d", col("doc_id"))))
        .as("text"))
  }

  /** t56: PII redaction — count and replace emails, phone numbers and
    * IPv4 addresses with typed placeholders (scan-side regexp chain,
    * global replace on both engines). */
  def t56PiiRedact(s: SparkSession, dir: String): DataFrame =
    withPii(Tables.spread(Tables.documents(s, dir)))
      .select(col("doc_id"),
        CorpusText.countMatches(col("text"), CorpusText.EmailRe).as("n_emails"),
        CorpusText.countMatches(col("text"), CorpusText.PhoneRe).as("n_phones"),
        CorpusText.countMatches(col("text"), CorpusText.Ipv4Re).as("n_ips"),
        CorpusText.redactPii(col("text")).as("redacted"))
      .orderBy("doc_id")

  /** Line-structured fixture for t108: the corpus text carries no
    * newlines, so the gate plants the web shape — a nav-bar line on a
    * third of the documents, a copyright footer on two thirds — and
    * the oracle synthesizes the identical input from doc_id. */
  private def withLines(docs: DataFrame): DataFrame = {
    val m = pmod(col("doc_id"), lit(3))
    docs.select(col("doc_id"),
      when(m === 0, concat(lit("home about contact login\n"), col("text"),
        lit("\ncopyright 2024 all rights reserved")))
        .when(m === 1, concat(col("text"),
          lit("\ncopyright 2024 all rights reserved")))
        .otherwise(col("text")).as("text"))
  }

  /** t108: LINE-LEVEL boilerplate removal (CCNet's paragraph-df
    * filter) — lines carried by ≥ 30% of the corpus (the planted nav
    * at ~33% and footer at ~67%, never the organic bodies) drop from
    * every document; the oracle re-derives line hashes, document
    * frequencies and the surviving text independently. */
  def t108BoilerplateLines(s: SparkSession, dir: String): DataFrame =
    CorpusText.removeBoilerplateLines(
      withLines(Tables.documents(s, dir)), tauPpm = 300000L)
      .orderBy("doc_id")

  /** t111: INTRA-document repeated-line removal — looped/stuttered
    * documents planted as line structure (the whole body repeated for
    * % 4 = 0 documents, a doubled header for % 9 = 0), first
    * occurrence kept in order; zero-shuffle per-row cleanup, oracle
    * re-derives keep-first independently. */
  def t111DedupLinesWithin(s: SparkSession, dir: String): DataFrame = {
    val m4 = pmod(col("doc_id"), lit(4))
    val m9 = pmod(col("doc_id"), lit(9))
    val planted = Tables.documents(s, dir).select(col("doc_id"),
      when(m4 === 0, concat_ws("\n", col("text"), col("text"),
        concat(lit("tail "), col("doc_id"))))
        .when(m9 === 0, concat_ws("\n", lit("header line"),
          lit("header line"), col("text")))
        .otherwise(col("text")).as("text"))
    CorpusText.dedupLinesWithin(planted).orderBy("doc_id")
  }

  /** Extended PII fixture for t104/t105: doc_id % 7 round-robin over
    * email(×2) / intl phone / IPv4 / PERSIAN-DIGIT Iranian mobile /
    * 10-digit national id / card+email (two kinds — the "drop" row) /
    * clean. Synthesized with printf-identical laws on both engines;
    * the Persian arm exercises the F1 digit-normalization reuse. */
  private def withPiiFull(docs: DataFrame): DataFrame = {
    val m = pmod(col("doc_id"), lit(7))
    val persianMobile = translate(
      format_string("09%09d", pmod(col("doc_id"), lit(1000000000L))),
      graft.functions.PersianText.EnglishDigits,
      graft.functions.PersianText.PersianDigits)
    docs.select(col("doc_id"), col("source"),
      concat(col("text"),
        when(m === 0, format_string(
          " reach user%d@example.com or admin%d@mail.ir",
          col("doc_id"), col("doc_id")))
        .when(m === 1, format_string(" call +1-555-%04d now",
          pmod(col("doc_id"), lit(10000))))
        .when(m === 2, format_string(" server at 10.%d.%d.%d up",
          pmod(col("doc_id"), lit(200)), pmod(col("doc_id"), lit(250)),
          pmod(col("doc_id"), lit(100))))
        .when(m === 3, concat(lit(" تماس "), persianMobile, lit(" بگیرید")))
        .when(m === 4, format_string(" id %010d here",
          pmod(col("doc_id"), lit(10000000000L))))
        .when(m === 5, format_string(
          " card 4111-1111-1111-%04d and user%d@ex.ir",
          pmod(col("doc_id"), lit(10000)), col("doc_id")))
        .otherwise(format_string(" nothing sensitive in row %d",
          col("doc_id"))))
        .as("text"))
  }

  /** t104: FULL sensitive-text redaction — the t56 family widened to
    * national-id and card patterns plus Persian-digit phone numbers
    * (digit-normalize first, F1 reuse), with exact per-kind instance
    * counts. One projection, codegen'd regexp chain, no UDF. */
  def t104PiiRedactFull(s: SparkSession, dir: String): DataFrame = {
    val df = withPiiFull(Tables.spread(Tables.documents(s, dir)))
    val (em, ph, ip, nid, card) = CorpusText.piiCounts(col("text"))
    df.select(col("doc_id"), em.as("n_emails"), ph.as("n_phones"),
        ip.as("n_ips"), nid.as("n_ids"), card.as("n_cards"),
        CorpusText.redactAllPii(col("text")).as("redacted"))
      .orderBy("doc_id")
  }

  /** t105: PII FILTER-RATE profile — the per-source go/no-go report a
    * redaction stage publishes before corpus release: docs scanned,
    * docs carrying any PII, total instances, ppm rate, and the count
    * a "≥ 2 kinds ⇒ drop the document" policy would remove. Exact
    * integers, one scan + one per-source aggregate (map-side partial;
    * sources are few, the aggregate is O(sources) everywhere). */
  def t105PiiFilterRate(s: SparkSession, dir: String): DataFrame = {
    val df = withPiiFull(Tables.spread(Tables.documents(s, dir)))
    val (em, ph, ip, nid, card) = CorpusText.piiCounts(col("text"))
    df.select(col("source"), (em + ph + ip + nid + card).as("n_pii"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_pii") > 0, 1L).otherwise(0L)).as("n_pii_docs"),
        sum(col("n_pii")).as("n_pii_total"),
        sum(when(col("n_pii") >= 2, 1L).otherwise(0L)).as("n_dropped"))
      .select(col("source"), col("n_docs"), col("n_pii_docs"),
        col("n_pii_total"), col("n_dropped"),
        expr("n_pii_docs * 1000000 div n_docs").as("pii_doc_ppm"))
      .orderBy("source")
  }

  /** t106: multi-keyword/phrase tagging at blocklist scale (the
    * FlashText problem — regex alternation dies past a few thousand
    * keywords): longest-token anchor join + higher-order slice verify,
    * O(tokens + anchor-hits·phrase-len) per document, keyword set a
    * broadcast. Mixed unigrams and multi-word phrases, one absent. */
  def t106KeywordTag(s: SparkSession, dir: String): DataFrame =
    CorpusText.keywordTag(Tables.documents(s, dir), "doc_id", "text",
      Seq("customer", "fast scan", "group sort merge", "absent zz"))
      .orderBy("doc_id", "keyword")

  /** t57: sliding context windows — 32-token chunks at stride 24 (the
    * training-sample chunker; short docs yield one short chunk). */
  def t57ChunkWindows(s: SparkSession, dir: String): DataFrame =
    CorpusText.chunkWindows(Tables.documents(s, dir), window = 32, stride = 24)
      .select(col("doc_id"), col("chunk_idx"), col("n_chunk_tokens"),
        md5(col("chunk_text")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  /** t64: hash-feature linear quality scoring — the fastText-shaped
    * keep/drop classifier (deterministic md5-prefix weights; a trained
    * model swaps the weight source, not the pipeline shape). */
  def t64QualityScore(s: SparkSession, dir: String): DataFrame =
    CorpusText.hashQualityScore(Tables.documents(s, dir))
      .orderBy("doc_id")

  /** t65: sliding duplicated-span detection — stride-1 12-token spans
    * appearing in ≥ 2 distinct documents (exact-substring dedup at any
    * alignment, vs t55's grid segments). */
  def t65DupSpans(s: SparkSession, dir: String): DataFrame =
    CorpusText.slidingDupSpans(Tables.spread(Tables.documents(s, dir)),
      window = 12, minDocs = 2)
      .orderBy("doc_id")

  /** t68: quality-aware dedup — one representative per canonical key
    * (here: the first-2-token prefix fingerprint, the title/URL-style
    * identity under which the corpus has real multi-member groups —
    * 357 keys over 500 docs at sf0.01), chosen by HIGHEST quality
    * score (t64's scorer) with the id tie-break, via a hash aggregate
    * (min of struct(−score, id)), never a per-group window sort. The
    * "keep best", not "keep first", dedup policy of a production
    * corpus. */
  def t68DedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val scores = CorpusText.hashQualityScore(docs).select("doc_id", "score")
    docs.select(col("doc_id"),
        md5(concat_ws(" ", slice(split(col("text"), " "), 1, 2))).as("fp"))
      .join(scores, Seq("doc_id"))
      .groupBy("fp")
      .agg(min(struct((-col("score")).as("ns"), col("doc_id").as("id"))).as("m"),
        count(lit(1)).as("n_dups"))
      .select(col("m.id").as("doc_id"), col("fp"),
        (-col("m.ns")).as("score"), col("n_dups"))
      .orderBy("doc_id")
  }

  /** t69: cross-source overlap matrix — how many canonical keys each
    * source pair shares (the provenance/contamination report run
    * before mixing corpora). One distinct projection + one equi-join
    * on the fingerprint + one pair aggregate; the join key is the
    * fingerprint, so co-occurrence never scans source×source. */
  def t69SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val f = Tables.documents(s, dir)
      .select(col("source"),
        md5(concat_ws(" ", slice(split(col("text"), " "), 1, 2))).as("fp"))
      .distinct()
    f.as("a").join(f.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("source_a", "source_b")
  }

  /** t98: tokenizer vocabulary COVERAGE — per-document OOV rate against
    * the corpus's own top-16 token vocabulary (count desc, term asc
    * tie-break — deterministic at the boundary). The go/no-go metric
    * before committing a tokenizer: k is set BELOW the corpus vocabulary here so both branches are exercised; high OOV → the vocab budget or the
    * normalization is wrong for this corpus. Shape: one token-count
    * aggregate, a k-row top-k (driver-bounded, broadcast back), one
    * per-doc aggregate — at 100 TB the vocab stays k rows regardless
    * of corpus size, so the join side is always a broadcast. */
  def t98OovRate(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term").asc).limit(16)
      .select(col("term"), lit(true).as("__in_vocab"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        expr("n_oov * 1000000 div n_tokens").as("oov_ppm"))
      .orderBy("doc_id")
  }

  /** t100: per-document REPETITION PROFILE (Gopher/MassiveText
    * intra-document quality signals) — duplicate-word and top-bigram
    * repetition as exact integer pairs, computed per row with a
    * sorted-array longest-run fold: zero shuffle, one corpus scan. */
  def t100RepetitionProfile(s: SparkSession, dir: String): DataFrame =
    CorpusText.repetitionProfile(Tables.documents(s, dir))
      .orderBy("doc_id")

  val queries: Map[String, Q] = Map(
    "t100_repetition_profile" -> (t100RepetitionProfile _),
    "t98_oov_rate" -> (t98OovRate _),
    "t69_source_overlap" -> (t69SourceOverlap _),
    "t68_dedup_keep_best" -> (t68DedupKeepBest _),
    "t55_boilerplate_segments" -> (t55BoilerplateSegments _),
    "t56_pii_redact" -> (t56PiiRedact _),
    "t104_pii_redact_full" -> (t104PiiRedactFull _),
    "t105_pii_filter_rate" -> (t105PiiFilterRate _),
    "t106_keyword_tag" -> (t106KeywordTag _),
    "t108_boilerplate_lines" -> (t108BoilerplateLines _),
    "t111_dedup_lines_within" -> (t111DedupLinesWithin _),
    "t57_chunk_windows" -> (t57ChunkWindows _),
    "t64_quality_score" -> (t64QualityScore _),
    "t65_dup_spans" -> (t65DupSpans _),
    "t113_rag_retrieval" -> (t113RagRetrieval _),
    "t115_rag_hybrid" -> (t115RagHybrid _),
    "t117_gopher_rules" -> (t117GopherRules _),
  )

  /** t113: RAG CORPUS CAPSTONE — the retrieval-ingestion pipeline end
    * to end, composed from this round's and earlier rounds' pieces:
    * sliding-window CHUNKING ([[CorpusText.chunkWindows]], 32/24),
    * a minimum-length quality gate (≥ 8 tokens), EXACT chunK-level
    * dedup (keep the smallest (doc, idx) per identical text — the
    * boilerplate chunks web corpora repeat collapse here), then BM25
    * retrieval over the surviving chunk corpus
    * ([[graft.operators.HybridRetrieval.bm25Scores]]) for the bounded
    * v57-style query set, top-5 per query. Chunk key = doc_id·1000 +
    * chunk_idx, with a raise_error arm enforcing chunk_idx < 1000 (a
    * silent collision would merge distinct chunks); a query never
    * retrieves chunks of its own document. Every stage re-derived by
    * the DuckDB oracle from the parquet alone. */
  /** t117: GOPHER QUALITY RULES (Rae et al. 2021 appendix A1) — the
    * pre-model heuristic gate production corpora run between
    * boilerplate removal and the perplexity/classifier stages:
    * word-count bounds, mean word length, alphabetic-word fraction,
    * stop-word presence, bullet/ellipsis line fractions, and the
    * repetition signals (fraction of characters in the most frequent
    * word {2,3,4}-gram). One scan ([[graft.operators.GopherRules]]):
    * every ratio an exact integer ppm, the verdict the published
    * thresholds. The fixture plants one violation per rule family
    * (bullet lists, ellipsis endings, a stuck-repeater, a tiny doc);
    * the oracle re-derives every metric AND the verdict in DuckDB. */
  def t117GopherRules(s: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(s, dir).select(col("doc_id"),
      when(pmod(col("doc_id"), lit(13)) === 1,
        lit("- alpha beta\n- gamma delta\n- epsilon zeta"))
        .when(pmod(col("doc_id"), lit(13)) === 2,
          lit("first part...\nsecond part...\nthird part stands alone"))
        .when(pmod(col("doc_id"), lit(13)) === 3,
          lit("data row data row data row data row data row data row"))
        .when(pmod(col("doc_id"), lit(13)) === 4, lit("tiny document"))
        .otherwise(col("text")).as("text"))
    val out = graft.operators.GopherRules
      .gopherRules(planted, "doc_id", "text")
    // the planted violations must fail their OWN rule (fixture sanity:
    // a rule set that passes a bullet list or a stuck repeater is
    // miswired no matter what it returns)
    val bad = out.filter(
      (pmod(col("doc_id"), lit(13)).isin(1, 2, 3, 4)) && col("gopher_keep"))
      .count()
    require(bad == 0L,
      s"t117: $bad planted rule violations passed the gopher gate")
    out.select(col("doc_id"), col("n_words"), col("mean_word_len_ppm"),
      col("alpha_word_ppm"), col("stop_hits"), col("bullet_line_ppm"),
      col("ellipsis_line_ppm"), col("top2gram_ppm"), col("top3gram_ppm"),
      col("top4gram_ppm"), col("gopher_keep"))
      .orderBy("doc_id")
  }

  /** The RAG ingest front end t113/t115 share: chunk → length gate →
    * guarded packed key → exact dedup (keep the smallest cid per
    * identical text). */
  private def ragChunks(s: SparkSession, dir: String): DataFrame = {
    val chunks = CorpusText
      .chunkWindows(Tables.documents(s, dir), window = 32, stride = 24)
      .filter(col("n_chunk_tokens") >= 8)
      // the packed key assumes < 1000 chunks/doc — at corpus scale a
      // million-token document would silently COLLIDE cids and merge
      // distinct chunks, so the assumption is enforced, not commented
      .select((col("doc_id") * 1000 + expr(
        "CASE WHEN chunk_idx < 1000 THEN chunk_idx ELSE CAST(" +
          "raise_error('rag chunks: chunk_idx >= 1000 would collide the " +
          "packed cid = doc_id*1000 + chunk_idx — widen the factor or " +
          "key by struct(doc_id, chunk_idx)') AS BIGINT) END"))
        .as("cid"), col("chunk_text"))
    chunks.groupBy(col("chunk_text"))
      .agg(min(col("cid")).as("cid"))
      .select(col("cid"), col("chunk_text"))
  }

  /** The bounded v57-style query-term set (first 3 tokens per query
    * document). */
  private def ragQueryTerms(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(pmod(col("doc_id"), lit(97)) === 0 && col("doc_id") < 2000)
      .select(col("doc_id").as("query_id"),
        explode(expr("slice(filter(split(text, ' '), x -> x <> ''), 1, 3)"))
          .as("term"))

  def t113RagRetrieval(s: SparkSession, dir: String): DataFrame = {
    val deduped = ragChunks(s, dir)
    val scored = graft.operators.HybridRetrieval
      .bm25Scores(deduped, "cid", "chunk_text", ragQueryTerms(s, dir))
      .withColumnRenamed("doc_id", "cid")
      .filter(expr("cid div 1000") =!= col("query_id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("bm25_e6").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("cid"), col("bm25_e6"))
      .orderBy("query_id", "rank")
  }

  /** t115: TWO-TOWER RAG retrieval over the chunked corpus — t113's
    * ingest front end (chunk → gate → dedup) feeding BOTH retrieval
    * towers, fused by reciprocal rank (v57's machinery, RRF k=60):
    * the lexical tower is BM25 over the surviving chunks; the vector
    * tower ranks chunks by exact integer dot between the query
    * document's embedding and each chunk's PARENT document embedding
    * (the deterministic chunk-embedding stand-in — chunks inherit
    * their parent's vector, ties broken by cid; at 100 TB the tower
    * swaps in the ANN index, fusion consumes only (query, chunk,
    * rank) lists either way). A query never retrieves its own
    * document's chunks in either tower. Both towers AND the fusion
    * re-derived by DuckDB from the parquet alone. */
  def t115RagHybrid(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deduped = ragChunks(s, dir)
    val lex = graft.operators.HybridRetrieval
      .bm25Scores(deduped, "cid", "chunk_text", ragQueryTerms(s, dir))
      .withColumnRenamed("doc_id", "cid")
      .filter(expr("cid div 1000") =!= col("query_id"))
    val wl = Window.partitionBy("query_id")
      .orderBy(col("bm25_e6").desc, col("cid").asc)
    val lexRanked = lex.withColumn("rank", row_number().over(wl))
      .filter(col("rank") <= 20)
      .select(col("query_id"), col("cid").as("doc_id"), col("rank"))
    val e = Tables.embeddings(s, dir).select(col("vec_id"),
      graft.plans.VectorExpressions.quantize_e6(col("embedding")).as("v"))
    val qv = e.filter(pmod(col("vec_id"), lit(97)) === 0 &&
        col("vec_id") < 2000)
      .select(col("vec_id").as("query_id"), col("v").as("vq"))
    val cand = deduped.select(col("cid"),
        expr("cid div 1000").as("parent"))
      .join(e.select(col("vec_id").as("parent"), col("v")), Seq("parent"))
    val dots = cand.join(broadcast(qv), col("parent") =!= col("query_id"))
      .select(col("query_id"), col("cid"),
        graft.plans.VectorExpressions.dot_long(col("vq"), col("v")).as("d"))
    val wv = Window.partitionBy("query_id")
      .orderBy(col("d").desc, col("cid").asc)
    val vecRanked = dots.withColumn("rank", row_number().over(wv))
      .filter(col("rank") <= 20)
      .select(col("query_id"), col("cid").as("doc_id"), col("rank"))
    graft.operators.HybridRetrieval
      .rrfFuse(Seq(lexRanked, vecRanked), k = 60, topK = 10)
      .select(col("query_id"), col("rank"), col("doc_id").as("cid"),
        col("rrf_e6"))
      .orderBy("query_id", "rank")
  }

  val oracles: Map[String, String] = Map(
    // t113: every stage re-derived — t57's chunk slices, the ≥8-token
    // gate, exact dedup keeping min cid, then the v57 BM25 formula
    // (same pinned float shape) over the surviving chunk corpus
    // t117: every Gopher metric re-derived — same fixture CASE, same
    // integer-ppm quantization, same argmax tie-break (count desc,
    // gram desc), same published thresholds for the verdict
    "t117_gopher_rules" ->
      ("""WITH src AS (SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 1
        |         THEN '- alpha beta' || chr(10) || '- gamma delta' || chr(10) || '- epsilon zeta'
        |         WHEN doc_id % 13 = 2
        |         THEN 'first part...' || chr(10) || 'second part...' || chr(10) || 'third part stands alone'
        |         WHEN doc_id % 13 = 3
        |         THEN 'data row data row data row data row data row data row'
        |         WHEN doc_id % 13 = 4 THEN 'tiny document'
        |         ELSE text END AS text
        |  FROM documents),
        |b AS (SELECT doc_id, text t,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') w,
        |    list_transform(
        |      list_filter(string_split_regex(text, '\s+'), x -> x <> ''),
        |      x -> regexp_replace(lower(x), '^[^a-z0-9]+|[^a-z0-9]+$', '', 'g')) wn,
        |    string_split(text, chr(10)) l
        |  FROM src),
        |rowl AS (SELECT doc_id, cast(length(t) as bigint) n_chars,
        |    cast(len(w) as bigint) n_words,
        |    CASE WHEN len(w) > 0 THEN
        |      cast(list_sum(list_transform(w, x -> length(x))) as bigint)
        |        * 1000000 // len(w) ELSE 0 END mean_word_len_ppm,
        |    CASE WHEN len(w) > 0 THEN
        |      cast(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) as bigint)
        |        * 1000000 // len(w) ELSE 0 END alpha_word_ppm,
        |    cast((CASE WHEN list_contains(wn, 'the') THEN 1 ELSE 0 END +
        |     CASE WHEN list_contains(wn, 'be') THEN 1 ELSE 0 END +
        |     CASE WHEN list_contains(wn, 'to') THEN 1 ELSE 0 END +
        |     CASE WHEN list_contains(wn, 'of') THEN 1 ELSE 0 END +
        |     CASE WHEN list_contains(wn, 'and') THEN 1 ELSE 0 END +
        |     CASE WHEN list_contains(wn, 'that') THEN 1 ELSE 0 END +
        |     CASE WHEN list_contains(wn, 'have') THEN 1 ELSE 0 END +
        |     CASE WHEN list_contains(wn, 'with') THEN 1 ELSE 0 END) as bigint)
        |      stop_hits,
        |    cast(len(list_filter(l, x -> regexp_matches(x, '^\s*[-*\u2022]'))) as bigint)
        |      * 1000000 // len(l) bullet_line_ppm,
        |    cast(len(list_filter(l, x -> regexp_matches(x, '(\.\.\.|\u2026)\s*$'))) as bigint)
        |      * 1000000 // len(l) ellipsis_line_ppm
        |  FROM b),
        |""".stripMargin +
      (2 to 4).map(n =>
        s"""g$n AS (SELECT doc_id, length(t) __len,
           |    array_to_string(w[CAST(t.i AS INT):CAST(t.i AS INT) + ${n - 1}], ' ') g
           |  FROM b, UNNEST(range(1, len(w) - ${n - 2})) t(i)
           |  WHERE len(w) >= $n),
           |c$n AS (SELECT doc_id, __len, g, cast(count(*) as bigint) c
           |       FROM g$n GROUP BY 1, 2, 3),
           |r$n AS (SELECT doc_id,
           |    cast(c * length(g) * 1000000 // __len as bigint) top${n}gram_ppm,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY c DESC, g DESC) rn
           |  FROM c$n),
           |t$n AS (SELECT doc_id, top${n}gram_ppm FROM r$n WHERE rn = 1),
           |""".stripMargin).mkString + """m AS (SELECT rowl.*,
        |    coalesce(t2.top2gram_ppm, 0) top2gram_ppm,
        |    coalesce(t3.top3gram_ppm, 0) top3gram_ppm,
        |    coalesce(t4.top4gram_ppm, 0) top4gram_ppm
        |  FROM rowl
        |  LEFT JOIN t2 USING (doc_id)
        |  LEFT JOIN t3 USING (doc_id)
        |  LEFT JOIN t4 USING (doc_id))
        |SELECT doc_id, n_words, mean_word_len_ppm, alpha_word_ppm,
        |  stop_hits, bullet_line_ppm, ellipsis_line_ppm,
        |  top2gram_ppm, top3gram_ppm, top4gram_ppm,
        |  (n_words >= 50 AND n_words <= 100000 AND
        |   mean_word_len_ppm >= 3000000 AND mean_word_len_ppm <= 10000000 AND
        |   alpha_word_ppm >= 800000 AND stop_hits >= 2 AND
        |   bullet_line_ppm <= 900000 AND ellipsis_line_ppm <= 300000 AND
        |   top2gram_ppm <= 200000 AND top3gram_ppm <= 180000 AND
        |   top4gram_ppm <= 160000) AS gopher_keep
        |FROM m ORDER BY doc_id""".stripMargin),
    // t115: BOTH towers and the fusion re-derived — t113's chunk CTEs
    // (BM25 over the deduped chunk corpus, top-20), the vector tower
    // as exact integer dots between the query embedding and each
    // chunk's PARENT document embedding (chunks inherit the parent
    // vector, ties by cid), then v57's integer RRF (1e6 // (60+rank))
    "t115_rag_hybrid" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        |chunks AS (SELECT doc_id, CAST(t.i AS INT) chunk_idx,
        |             w[(t.i*24+1):(t.i*24+32)] cw
        |           FROM toks, UNNEST(range(
        |             CASE WHEN len(w) <= 32 THEN 1
        |                  ELSE CAST(ceil((len(w)-32)/24.0) AS BIGINT) + 1 END)) AS t(i)),
        |ck AS (SELECT doc_id*1000 + chunk_idx AS cid,
        |         array_to_string(cw, ' ') AS ct
        |       FROM chunks WHERE len(cw) >= 8),
        |dd AS (SELECT ct, cast(min(cid) as bigint) cid FROM ck GROUP BY ct),
        |ctok AS (SELECT cid, unnest(list_filter(string_split(ct, ' '),
        |           x -> x <> '')) tk FROM dd),
        |dl AS (SELECT cid, cast(count(*) as bigint) dl FROM ctok GROUP BY 1),
        |st AS (SELECT cast(count(*) as bigint) nn,
        |              cast(sum(dl) as bigint) tl FROM dl),
        |tf AS (SELECT cid, tk, cast(count(*) as bigint) tf
        |       FROM ctok GROUP BY 1, 2),
        |dfq AS (SELECT tk, cast(count(*) as bigint) df FROM tf GROUP BY 1),
        |qt AS (SELECT doc_id AS query_id, unnest(w2[1:3]) term
        |       FROM (SELECT doc_id,
        |               list_filter(string_split(text, ' '), x -> x <> '') w2
        |             FROM documents
        |             WHERE doc_id % 97 = 0 AND doc_id < 2000)),
        |ls AS (SELECT qt.query_id, tf.cid,
        |    cast(floor(1000000.0 * ln((nn + 1)::DOUBLE / (df + 1)) *
        |      (tf * 2.2) /
        |      (tf + 1.2 * (0.25 + 0.75 * ((dl.dl * nn)::DOUBLE / tl))) +
        |      0.5) as bigint) s
        |  FROM qt JOIN tf ON tf.tk = qt.term
        |  JOIN dfq ON dfq.tk = qt.term
        |  JOIN dl ON dl.cid = tf.cid
        |  CROSS JOIN st
        |  WHERE tf.cid // 1000 <> qt.query_id),
        |lex AS (SELECT query_id, cid, cast(sum(s) as bigint) sc
        |        FROM ls GROUP BY 1, 2),
        |lexr AS (SELECT query_id, cid, row_number() OVER (
        |    PARTITION BY query_id ORDER BY sc DESC, cid) rnk FROM lex),
        |qv AS (SELECT vec_id, list_transform(embedding,
        |    x -> cast(round(cast(x as double) * 1000000.0) as bigint)) v
        |  FROM embeddings),
        |ce AS (SELECT c.cid, c.parent, e.v vb
        |       FROM (SELECT cid, cid // 1000 AS parent FROM dd) c
        |       JOIN qv e ON e.vec_id = c.parent),
        |pairs AS (SELECT q.vec_id query_id, ce.cid, q.v va, ce.vb
        |          FROM qv q CROSS JOIN ce
        |          WHERE q.vec_id % 97 = 0 AND q.vec_id < 2000
        |            AND ce.parent <> q.vec_id),
        |dots AS (SELECT query_id, cid, cast(sum(x * y) as bigint) d
        |         FROM (SELECT query_id, cid, unnest(va) x, unnest(vb) y
        |               FROM pairs)
        |         GROUP BY 1, 2),
        |vecr AS (SELECT query_id, cid, row_number() OVER (
        |    PARTITION BY query_id ORDER BY d DESC, cid) rnk FROM dots),
        |c AS (
        |  SELECT query_id, cid, 1000000 // (60 + rnk) c
        |  FROM lexr WHERE rnk <= 20
        |  UNION ALL
        |  SELECT query_id, cid, 1000000 // (60 + rnk) c
        |  FROM vecr WHERE rnk <= 20),
        |f AS (SELECT query_id, cid, cast(sum(c) as bigint) rrf_e6
        |      FROM c GROUP BY 1, 2),
        |fr AS (SELECT query_id, cid, rrf_e6,
        |    cast(row_number() OVER (PARTITION BY query_id
        |      ORDER BY rrf_e6 DESC, cid) as int) rank FROM f)
        |SELECT query_id, rank, cid, rrf_e6 FROM fr
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "t113_rag_retrieval" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        |chunks AS (SELECT doc_id, CAST(t.i AS INT) chunk_idx,
        |             w[(t.i*24+1):(t.i*24+32)] cw
        |           FROM toks, UNNEST(range(
        |             CASE WHEN len(w) <= 32 THEN 1
        |                  ELSE CAST(ceil((len(w)-32)/24.0) AS BIGINT) + 1 END)) AS t(i)),
        |ck AS (SELECT doc_id*1000 + chunk_idx AS cid,
        |         array_to_string(cw, ' ') AS ct
        |       FROM chunks WHERE len(cw) >= 8),
        |dd AS (SELECT ct, cast(min(cid) as bigint) cid FROM ck GROUP BY ct),
        |ctok AS (SELECT cid, unnest(list_filter(string_split(ct, ' '),
        |           x -> x <> '')) tk FROM dd),
        |dl AS (SELECT cid, cast(count(*) as bigint) dl FROM ctok GROUP BY 1),
        |st AS (SELECT cast(count(*) as bigint) nn,
        |              cast(sum(dl) as bigint) tl FROM dl),
        |tf AS (SELECT cid, tk, cast(count(*) as bigint) tf
        |       FROM ctok GROUP BY 1, 2),
        |dfq AS (SELECT tk, cast(count(*) as bigint) df FROM tf GROUP BY 1),
        |qt AS (SELECT doc_id AS query_id, unnest(w2[1:3]) term
        |       FROM (SELECT doc_id,
        |               list_filter(string_split(text, ' '), x -> x <> '') w2
        |             FROM documents
        |             WHERE doc_id % 97 = 0 AND doc_id < 2000)),
        |ls AS (SELECT qt.query_id, tf.cid,
        |    cast(floor(1000000.0 * ln((nn + 1)::DOUBLE / (df + 1)) *
        |      (tf * 2.2) /
        |      (tf + 1.2 * (0.25 + 0.75 * ((dl.dl * nn)::DOUBLE / tl))) +
        |      0.5) as bigint) s
        |  FROM qt JOIN tf ON tf.tk = qt.term
        |  JOIN dfq ON dfq.tk = qt.term
        |  JOIN dl ON dl.cid = tf.cid
        |  CROSS JOIN st
        |  WHERE tf.cid // 1000 <> qt.query_id),
        |lex AS (SELECT query_id, cid, cast(sum(s) as bigint) bm25_e6
        |        FROM ls GROUP BY 1, 2),
        |rk AS (SELECT query_id, cid, bm25_e6,
        |    cast(row_number() OVER (PARTITION BY query_id
        |      ORDER BY bm25_e6 DESC, cid) as int) rank FROM lex)
        |SELECT query_id, rank, cid, bm25_e6 FROM rk
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // t100: the most frequent bigram's count re-derived by explicit
    // group-by — the engine's per-row sorted-run fold must agree
    // t111: keep-first within each doc, order preserved; the planted
    // %4 arm repeats the whole body (drops once), %9 doubles a header
    "t111_dedup_lines_within" ->
      """WITH src AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0 THEN
        |           text || chr(10) || text || chr(10) || 'tail ' || doc_id
        |         WHEN doc_id % 9 = 0 THEN
        |           'header line' || chr(10) || 'header line' || chr(10) || text
        |         ELSE text END AS text
        |  FROM documents),
        |d AS (SELECT doc_id, string_split(text, chr(10)) ls FROM src),
        |ix AS (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) i FROM d),
        |ln AS (SELECT doc_id, i - 1 AS idx, ls[i] AS line FROM ix),
        |firsts AS (SELECT doc_id, idx, line,
        |             min(idx) OVER (PARTITION BY doc_id, line) fst
        |           FROM ln)
        |SELECT doc_id,
        |  cast(count(*) as bigint) AS n_lines,
        |  cast(sum(CASE WHEN idx <> fst THEN 1 ELSE 0 END) as bigint)
        |    AS n_dropped,
        |  coalesce(string_agg(CASE WHEN idx = fst THEN line END,
        |    chr(10) ORDER BY idx), '') AS clean_text
        |FROM firsts GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // t108: line df + threshold + rebuild re-derived independently;
    // docs whose every line dropped rebuild to '' on both sides
    "t108_boilerplate_lines" ->
      """WITH src AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |           'home about contact login' || chr(10) || text ||
        |             chr(10) || 'copyright 2024 all rights reserved'
        |         WHEN doc_id % 3 = 1 THEN
        |           text || chr(10) || 'copyright 2024 all rights reserved'
        |         ELSE text END AS text
        |  FROM documents),
        |d AS (SELECT doc_id, string_split(text, chr(10)) ls FROM src),
        |ix AS (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) i FROM d),
        |ln AS (SELECT doc_id, i - 1 AS line_idx, ls[i] AS line FROM ix),
        |dfreq AS (SELECT line, count(DISTINCT doc_id) df FROM ln GROUP BY line),
        |tot AS (SELECT count(*) n FROM src),
        |bp AS (SELECT line FROM dfreq, tot WHERE df * 1000000 >= n * 300000)
        |SELECT doc_id,
        |  cast(count(*) as bigint) AS n_lines,
        |  cast(sum(CASE WHEN line IN (SELECT line FROM bp)
        |               THEN 1 ELSE 0 END) as bigint) AS n_dropped,
        |  coalesce(string_agg(
        |    CASE WHEN line IN (SELECT line FROM bp) THEN NULL ELSE line END,
        |    chr(10) ORDER BY line_idx), '') AS clean_text
        |FROM ln GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t100_repetition_profile" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') t FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |    unnest([t[i] || ' ' || t[i + 1]
        |            for i in generate_series(1, len(t) - 1)]) g
        |  FROM base),
        |cnt AS (SELECT doc_id, g, count(*) c FROM bg GROUP BY 1, 2),
        |top AS (SELECT doc_id, max(c) top_bigram_n, sum(c) n_bigrams
        |        FROM cnt GROUP BY 1)
        |SELECT base.doc_id,
        |  cast(len(t) AS BIGINT) n_tokens,
        |  cast(len(list_distinct(t)) AS BIGINT) n_distinct_tokens,
        |  cast(coalesce(top_bigram_n, 0) AS BIGINT) top_bigram_n,
        |  cast(coalesce(n_bigrams, 0) AS BIGINT) n_bigrams
        |FROM base LEFT JOIN top USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "t98_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id, t.term FROM documents,
        |    UNNEST(string_split(text, ' ')) AS t(term)
        |  WHERE t.term <> ''),
        |vocab AS (
        |  SELECT term FROM (
        |    SELECT term, count(*) c FROM toks GROUP BY term
        |    ORDER BY c DESC, term ASC LIMIT 16))
        |SELECT doc_id,
        |  cast(count(*) as bigint) AS n_tokens,
        |  cast(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) as bigint) AS n_oov,
        |  cast(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) * 1000000
        |    // count(*) as bigint) AS oov_ppm
        |FROM toks LEFT JOIN vocab v USING (term)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t69_source_overlap" ->
      """WITH f AS (SELECT DISTINCT source,
        |    md5(array_to_string(string_split(text, ' ')[1:2], ' ')) fp
        |  FROM documents)
        |SELECT a.source source_a, b.source source_b,
        |  cast(count(*) as bigint) n_shared
        |FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t68_dedup_keep_best" ->
      // t64's weight law feeding a per-fingerprint argmax
      """WITH toks AS (SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        |  FROM documents),
        |sc AS (SELECT doc_id,
        |         sum(('0x' || substr(md5(term), 1, 6))::BIGINT % 2001 - 1000) score
        |       FROM toks GROUP BY doc_id),
        |f AS (SELECT d.doc_id,
        |        md5(array_to_string(string_split(d.text, ' ')[1:2], ' ')) fp,
        |        sc.score
        |      FROM documents d JOIN sc USING (doc_id)),
        |r AS (SELECT *,
        |        row_number() OVER (PARTITION BY fp ORDER BY score DESC, doc_id) rn,
        |        count(*) OVER (PARTITION BY fp) n
        |      FROM f)
        |SELECT doc_id, fp, cast(score as bigint) score, cast(n as bigint) n_dups
        |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "t64_quality_score" ->
      // identical weight law: first 6 md5 hex chars as an integer,
      // mod 2001, recentred to [-1000, 1000]
      """WITH toks AS (SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) term
        |  FROM documents),
        |wt AS (SELECT doc_id,
        |         ('0x' || substr(md5(term), 1, 6))::BIGINT % 2001 - 1000 wgt
        |       FROM toks)
        |SELECT doc_id, cast(count(*) as bigint) n_tokens,
        |  cast(sum(wgt) as bigint) score, (sum(wgt) >= 0) AS keep
        |FROM wt GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t65_dup_spans" ->
      // stride-1 spans: positions 0..max(n-12, 0); w[(i+1):(i+12)]
      // clamps at the end exactly like Spark's slice
      """WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        |sp AS (SELECT doc_id,
        |         md5(array_to_string(w[(t.i+1):(t.i+12)], ' ')) k
        |       FROM d, UNNEST(range(GREATEST(len(w) - 12, 0) + 1)) t(i)),
        |dup AS (SELECT k FROM (
        |          SELECT k, count(DISTINCT doc_id) c FROM sp GROUP BY k)
        |        WHERE c >= 2)
        |SELECT sp.doc_id, cast(count(*) as bigint) n_windows,
        |  cast(count(dup.k) as bigint) n_dup_windows
        |FROM sp LEFT JOIN dup ON sp.k = dup.k
        |GROUP BY sp.doc_id ORDER BY sp.doc_id""".stripMargin,
    "t55_boilerplate_segments" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        |segs AS (SELECT doc_id, CAST(t.i AS INT) seg_idx,
        |           array_to_string(w[(t.i*8+1):(t.i*8+8)], ' ') seg
        |         FROM toks, UNNEST(range(CAST(ceil(len(w)/8.0) AS BIGINT))) AS t(i)),
        |boiler AS (SELECT seg FROM (
        |             SELECT seg, count(DISTINCT doc_id) c FROM segs GROUP BY seg)
        |           WHERE c >= 2)
        |SELECT s.doc_id,
        |  count(*) AS n_segs,
        |  count(*) FILTER (WHERE b.seg IS NOT NULL) AS n_dropped,
        |  coalesce(string_agg(s.seg, ' ' ORDER BY s.seg_idx)
        |             FILTER (WHERE b.seg IS NULL), '') AS clean_text
        |FROM segs s LEFT JOIN boiler b ON s.seg = b.seg
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "t56_pii_redact" ->
      // identical fixture law (doc_id % 4 round-robin), RE2/Java-common
      // regex subset, 'g' flag so DuckDB replaces globally like Spark
      """WITH pii AS (SELECT doc_id, text ||
        |  CASE doc_id % 4
        |    WHEN 0 THEN printf(' reach me at user%d@example.com today', doc_id)
        |    WHEN 1 THEN printf(' call +1-555-%04d now', doc_id % 10000)
        |    WHEN 2 THEN printf(' server at 10.%d.%d.%d up',
        |                       doc_id % 200, doc_id % 250, doc_id % 100)
        |    ELSE printf(' nothing sensitive in row %d', doc_id) END AS text
        | FROM documents)
        |SELECT doc_id,
        |  cast(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) as bigint) AS n_emails,
        |  cast(len(regexp_extract_all(text, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) as bigint) AS n_phones,
        |  cast(len(regexp_extract_all(text, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) as bigint) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |      '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS redacted
        |FROM pii ORDER BY doc_id""".stripMargin,
    // t104/t105: identical doc_id % 7 fixture law; the Persian arm is
    // built English→Persian then normalized Persian→English, exactly
    // the engine's F1 path; counts via regexp_extract_all, redaction
    // via the same fixed-order chain with the 'g' flag
    "t104_pii_redact_full" ->
      """WITH pii AS (SELECT doc_id, text ||
        |  CASE doc_id % 7
        |    WHEN 0 THEN printf(' reach user%d@example.com or admin%d@mail.ir', doc_id, doc_id)
        |    WHEN 1 THEN printf(' call +1-555-%04d now', doc_id % 10000)
        |    WHEN 2 THEN printf(' server at 10.%d.%d.%d up',
        |                       doc_id % 200, doc_id % 250, doc_id % 100)
        |    WHEN 3 THEN ' تماس ' || translate(printf('09%09d', doc_id % 1000000000),
        |                  '0123456789', '۰۱۲۳۴۵۶۷۸۹') || ' بگیرید'
        |    WHEN 4 THEN printf(' id %010d here', doc_id % 10000000000)
        |    WHEN 5 THEN printf(' card 4111-1111-1111-%04d and user%d@ex.ir',
        |                       doc_id % 10000, doc_id)
        |    ELSE printf(' nothing sensitive in row %d', doc_id) END AS text
        | FROM documents),
        |norm AS (SELECT doc_id,
        |  translate(text, '۰۱۲۳۴۵۶۷۸۹', '0123456789') AS t FROM pii)
        |SELECT doc_id,
        |  cast(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) as bigint) AS n_emails,
        |  cast(len(regexp_extract_all(t, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}'))
        |    + len(regexp_extract_all(t, '(?:\+989[0-9]{9}\b|\b09[0-9]{9}\b)')) as bigint) AS n_phones,
        |  cast(len(regexp_extract_all(t, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) as bigint) AS n_ips,
        |  cast(len(regexp_extract_all(t, '\b[0-9]{10}\b')) as bigint) AS n_ids,
        |  cast(len(regexp_extract_all(t, '\b[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}\b')) as bigint) AS n_cards,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |      '\b[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}\b', '<CARD>', 'g'),
        |      '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |      '(?:\+989[0-9]{9}\b|\b09[0-9]{9}\b)', '<PHONE>', 'g'),
        |      '\b[0-9]{10}\b', '<ID>', 'g') AS redacted
        |FROM norm ORDER BY doc_id""".stripMargin,
    "t105_pii_filter_rate" ->
      """WITH pii AS (SELECT doc_id, source, text ||
        |  CASE doc_id % 7
        |    WHEN 0 THEN printf(' reach user%d@example.com or admin%d@mail.ir', doc_id, doc_id)
        |    WHEN 1 THEN printf(' call +1-555-%04d now', doc_id % 10000)
        |    WHEN 2 THEN printf(' server at 10.%d.%d.%d up',
        |                       doc_id % 200, doc_id % 250, doc_id % 100)
        |    WHEN 3 THEN ' تماس ' || translate(printf('09%09d', doc_id % 1000000000),
        |                  '0123456789', '۰۱۲۳۴۵۶۷۸۹') || ' بگیرید'
        |    WHEN 4 THEN printf(' id %010d here', doc_id % 10000000000)
        |    WHEN 5 THEN printf(' card 4111-1111-1111-%04d and user%d@ex.ir',
        |                       doc_id % 10000, doc_id)
        |    ELSE printf(' nothing sensitive in row %d', doc_id) END AS text
        | FROM documents),
        |per AS (SELECT doc_id, source,
        |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |  + len(regexp_extract_all(t, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}'))
        |  + len(regexp_extract_all(t, '(?:\+989[0-9]{9}\b|\b09[0-9]{9}\b)'))
        |  + len(regexp_extract_all(t, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b'))
        |  + len(regexp_extract_all(t, '\b[0-9]{10}\b'))
        |  + len(regexp_extract_all(t, '\b[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}\b')) AS n_pii
        |  FROM (SELECT doc_id, source,
        |          translate(text, '۰۱۲۳۴۵۶۷۸۹', '0123456789') AS t FROM pii))
        |SELECT source,
        |  cast(count(*) as bigint) AS n_docs,
        |  cast(sum(CASE WHEN n_pii > 0 THEN 1 ELSE 0 END) as bigint) AS n_pii_docs,
        |  cast(sum(n_pii) as bigint) AS n_pii_total,
        |  cast(sum(CASE WHEN n_pii >= 2 THEN 1 ELSE 0 END) as bigint) AS n_dropped,
        |  cast(sum(CASE WHEN n_pii > 0 THEN 1 ELSE 0 END) * 1000000
        |    // count(*) as bigint) AS pii_doc_ppm
        |FROM per GROUP BY source ORDER BY source""".stripMargin,
    // t106: position-exhaustive phrase search re-derived with list
    // slicing — the engine's anchor-join path must agree exactly
    "t106_keyword_tag" ->
      """WITH kw(keyword) AS (VALUES ('customer'), ('fast scan'),
        |    ('group sort merge'), ('absent zz')),
        |k AS (SELECT keyword,
        |      string_split_regex(lower(trim(keyword)), '\s+') kts FROM kw),
        |d AS (SELECT doc_id,
        |      string_split_regex(lower(text), '\s+') toks FROM documents),
        |m AS (
        |  SELECT d.doc_id, k.keyword,
        |    len(list_filter(range(1, len(toks) - len(kts) + 2),
        |        i -> toks[i:i+len(kts)-1] = kts)) AS n_hits
        |  FROM d CROSS JOIN k)
        |SELECT doc_id, keyword, cast(n_hits as bigint) AS n_hits
        |FROM m WHERE n_hits > 0
        |ORDER BY doc_id, keyword""".stripMargin,
    "t57_chunk_windows" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        |chunks AS (SELECT doc_id, CAST(t.i AS INT) chunk_idx,
        |             w[(t.i*24+1):(t.i*24+32)] cw
        |           FROM toks, UNNEST(range(
        |             CASE WHEN len(w) <= 32 THEN 1
        |                  ELSE CAST(ceil((len(w)-32)/24.0) AS BIGINT) + 1 END)) AS t(i))
        |SELECT doc_id, chunk_idx, cast(len(cw) as int) AS n_chunk_tokens,
        |  md5(array_to_string(cw, ' ')) AS chunk_md5
        |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin,
  )
}
