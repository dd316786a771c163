package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-preparation operators a large-scale training-data pipeline
  * needs beyond per-document scoring: cross-document boilerplate
  * removal (the MassiveText / CCNet "drop lines repeated across many
  * documents" pass, adapted to fixed token segments because the
  * synthetic corpus has no newlines), sliding-window chunking (context
  * windows with stride for sequence-model training), and PII
  * redaction. Reference analog: the row-wise text normalizers in
  * dags/web_scraping/transformers (SURVEY.md §2.7) — these are the
  * corpus-level complements.
  *
  * Scale notes (100 TB):
  *  - `segments` is a linear explode (no shuffle).
  *  - `removeBoilerplate` shuffles once to count distinct docs per
  *    segment; the boilerplate set (count ≥ minDocs) is tiny BY
  *    CONSTRUCTION — only segments repeated across documents survive
  *    the filter — so the mark-and-drop join broadcasts it and the
  *    rebuild is the only other shuffle (hash by doc_id).
  *  - `chunkWindows` is per-row (explode + slice), no shuffle at all.
  *  - PII redaction is a scan-side regexp chain (codegen'd).
  */
object CorpusText {

  /** Fixed-width token segmentation: one row per `(doc_id, seg_idx)`
    * covering tokens [seg_idx*segTokens, ...) — the unit of
    * cross-document boilerplate detection. Whitespace tokens, last
    * segment may be short. Linear, shuffle-free. */
  def segments(docs: DataFrame, segTokens: Int): DataFrame = {
    val w = split(col("text"), " ")
    docs
      .select(col("doc_id"), w.as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0),
          ceil(size(col("w")) / lit(segTokens.toDouble)).cast(IntegerType) - 1))
          .as("seg_idx"))
      .select(col("doc_id"), col("seg_idx"),
        concat_ws(" ",
          slice(col("w"), col("seg_idx") * segTokens + 1, lit(segTokens)))
          .as("seg"))
  }

  /** Sliding duplicated-span detection (the exact-substring dedup
    * shape of Lee et al. 2022, token-granular): every `window`-token
    * span at every offset, hashed, counted across documents; spans in
    * ≥ `minDocs` DISTINCT documents are duplicated. Returns per-doc
    * (doc_id, n_windows, n_dup_windows). Unlike [[removeBoilerplate]]'s
    * grid, the stride-1 windows catch duplicated passages at ANY
    * alignment.
    *
    * Shape: the span stream is a scan-side explode (≈ tokens-per-doc
    * rows each, hashed to fixed-width md5 — never the span text
    * shuffled); dup detection is one count-distinct aggregate; the
    * verdict is an equi-join back on the span hash. Linear in corpus
    * tokens, the theoretical floor for substring dedup. */
  /** All stride-1 `window`-token span keys of a document in ONE O(n)
    * pass: FNV-1a per token, Rabin-Karp rolling polynomial (mod 2⁶⁴)
    * across the window. The previous formulation — interpreted
    * `transform(sequence)` lambda building `concat_ws(slice(...))` +
    * md5 PER WINDOW — was O(n·window) array copies and string builds
    * per document and dominated t65 (2.1 s → 0.6 s at sf0.1). Tokens
    * never contain the split character, so token-sequence equality ⇔
    * joined-string equality: any injective key preserves exactly the
    * md5 formulation's duplicate sets (the gate's oracle groups by the
    * window CONTENT, so the key representation is free). Collisions:
    * 64-bit keys over ~10⁶ windows ⇒ ~10⁻⁷ pair risk — and a collision
    * can only overcount one dup window, never crash. */
  private def winHashUdf(window: Int) = udf { (words: Seq[String]) =>
    val n = if (words == null) 0 else words.length
    if (n == 0) Array.empty[Long]
    else {
      def fnv(s: String): Long = {
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
        h
      }
      val B = 0x9e3779b97f4a7c15L // odd → invertible mod 2^64
      val w = math.min(window, n)
      val nWin = math.max(n - window, 0) + 1
      val th = new Array[Long](n)
      var i = 0
      while (i < n) { th(i) = fnv(words(i)); i += 1 }
      var bw = 1L // B^(w-1)
      i = 1
      while (i < w) { bw *= B; i += 1 }
      val out = new Array[Long](nWin)
      var h = 0L
      i = 0
      while (i < w) { h = h * B + th(i); i += 1 }
      out(0) = h
      i = 1
      while (i < nWin) {
        h = (h - th(i - 1) * bw) * B + th(i + w - 1)
        out(i) = h
        i += 1
      }
      out
    }
  }

  def slidingDupSpans(docs: DataFrame, window: Int, minDocs: Int): DataFrame = {
    val spans = docs
      .select(col("doc_id"),
        explode(winHashUdf(window)(split(col("text"), " "))).as("k"))
    // ONE (doc_id, k) aggregate feeds both the duplicate-key derivation
    // and the per-doc rollup: the two consumers share the same exchange
    // subtree, so ReuseExchange runs the span pass once (the old
    // distinct-then-join shape exchanged on different keys and paid the
    // span UDF twice)
    val perDocKey = spans.groupBy("doc_id", "k").agg(count(lit(1)).as("c"))
    val dup = perDocKey.groupBy("k").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("k"), lit(true).as("__dup"))
    perDocKey.join(dup, Seq("k"), "left")
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_windows"),
        sum(when(col("__dup"), col("c")).otherwise(0L)).as("n_dup_windows"))
  }

  /** Hash-feature linear quality scorer (the fastText-classifier
    * SHAPE with deterministic weights): each token hashes to a weight
    * in [−1000, 1000] via its md5 prefix, a document's score is the
    * sum over all tokens (with multiplicity), and the keep verdict is
    * `score ≥ 0`. The weights are pseudo-random but engine-portable —
    * a real deployment swaps in trained weights via a broadcast map;
    * the pipeline shape (scan-side hash → one per-doc sum aggregate)
    * is identical. */
  def hashQualityScore(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .select(col("doc_id"),
        (conv(substring(md5(col("term")), 1, 6), 16, 10).cast(LongType)
          % 2001 - 1000).as("wgt"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("wgt")).as("score"))
      .withColumn("keep", col("score") >= 0)

  /** Cross-document boilerplate removal: a segment that appears in at
    * least `minDocs` DISTINCT documents is boilerplate; rebuild each
    * document from its surviving segments (original order). Returns
    * (doc_id, n_segs, n_dropped, clean_text).
    *
    * Shape: count-distinct per segment (one shuffle with map-side
    * combine), broadcast the (small) boilerplate set back over the
    * segment stream, re-assemble per doc (second shuffle). Never
    * materializes doc×doc pairs. */
  def removeBoilerplate(docs: DataFrame, segTokens: Int, minDocs: Int): DataFrame = {
    val segs = segments(docs, segTokens)
    val boiler = segs.select("doc_id", "seg").distinct()
      .groupBy("seg").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("seg"), lit(true).as("is_boiler"))
    segs
      .join(broadcast(boiler), Seq("seg"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_segs"),
        count(col("is_boiler")).as("n_dropped"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(
              when(col("is_boiler").isNull,
                struct(col("seg_idx"), col("seg"))))),
            x => x.getField("seg"))).as("clean_text"))
  }

  /** LINE-LEVEL boilerplate removal — CCNet's paragraph
    * document-frequency filter (Wenzek et al. 2020), the
    * nav-bar/footer remover every production web corpus runs before
    * quality filtering: a line whose document frequency exceeds
    * `tauPpm` of the corpus (df/N ≥ tau) is boilerplate by definition
    * — no organic content repeats verbatim across a third of the
    * corpus — and is dropped from every document; survivors rebuild
    * in original line order.
    *
    * Scale shape, all linear: ONE explode to (doc, line) — O(lines) —
    * collapsed immediately to per-(doc, line) groups carrying their
    * position lists (one map-side-combinable aggregate; within-doc
    * duplicate lines are rare web-text, so the idx arrays are ~1
    * element and the grouped frame is ~the distinct pair set the old
    * shape built anyway). The per-line df aggregate AND the per-doc
    * rebuild both derive from that one grouped exchange (ReuseExchange
    * collapses the shared subtree — the [[slidingDupSpans]] pattern),
    * so the corpus scans/splits/explodes ONCE where the r17 shape ran
    * the explode twice (df side and rebuild side). The corpus size
    * joins in as a 1-row broadcast; the boilerplate set broadcasts
    * back onto the grouped frame — by construction it holds AT MOST
    * 1/tau lines (each is carried by ≥ tau·N documents), so the
    * broadcast is bounded by the threshold, not the corpus.
    * Returns (doc_id, n_lines, n_dropped, clean_text). */
  def removeBoilerplateLines(docs: DataFrame, tauPpm: Long): DataFrame = {
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("line_idx", "line")))
    // the one pass over line instances: distinct (doc, line) pairs with
    // their in-doc positions — everything below derives from this
    val grouped = lines.groupBy(col("doc_id"), col("line"))
      .agg(collect_list(col("line_idx")).as("idxs"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    // the size(idxs) >= 1 predicate is vacuously true (a group's
    // collect_list is never empty) but NOT provably so to Catalyst —
    // it pins `idxs` into this branch's column set, which keeps the
    // two consumers' aggregate-exchange subtrees IDENTICAL so
    // ReuseExchange collapses them; without it, column pruning narrows
    // this branch and the corpus explodes twice again
    val boiler = grouped.filter(size(col("idxs")) >= 1)
      .groupBy("line").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(total))
      .filter(col("df") * lit(1000000L) >= col("n_docs") * lit(tauPpm))
      .select(col("line"), lit(true).as("is_boiler"))
    grouped
      .join(broadcast(boiler), Seq("line"), "left")
      .groupBy("doc_id")
      .agg(
        // instance counts, bit-identical to the per-row counts of the
        // exploded stream (Σ |positions| over the doc's distinct lines)
        sum(size(col("idxs"))).cast("long").as("n_lines"),
        coalesce(sum(when(col("is_boiler"), size(col("idxs")))), lit(0L))
          .cast("long").as("n_dropped"),
        concat_ws("\n",
          transform(
            array_sort(flatten(collect_list(
              when(col("is_boiler").isNull,
                expr("transform(idxs, i -> struct(i AS line_idx, line))"))))),
            x => x.getField("line"))).as("clean_text"))
  }

  /** INTRA-DOCUMENT repeated-line removal — the loop cleanup
    * (Gopher's within-document repetition signals, applied): a line
    * repeated inside ONE document keeps its first occurrence and drops
    * the rest — looped generations, duplicated boilerplate blocks,
    * copy-paste stutter. Pure per-row projection: ZERO shuffles, a
    * 100 TB corpus cleans in one scan (the cross-document twin is
    * [[removeBoilerplateLines]], which needs the corpus-wide df
    * aggregate). Compiled pass for the usual interpreted-lambda
    * reason. Returns (doc_id, n_lines, n_dropped, clean_text). */
  def dedupLinesWithin(docs: DataFrame): DataFrame = {
    val dedup = udf { text: String =>
      if (text == null) (0L, 0L, "")
      else {
        val lines = text.split("\n", -1)
        val seen = new java.util.HashSet[String]()
        val kept = lines.filter(seen.add)
        (lines.length.toLong, (lines.length - kept.length).toLong,
          kept.mkString("\n"))
      }
    }
    docs.select(col("doc_id"), dedup(col("text")).as("__r"))
      .select(col("doc_id"),
        col("__r._1").as("n_lines"),
        col("__r._2").as("n_dropped"),
        col("__r._3").as("clean_text"))
  }

  /** Per-document REPETITION PROFILE — the Gopher/MassiveText
    * intra-document repetition signals as EXACT INTEGERS (consumers
    * divide; the engine never ships a float a different platform would
    * round differently): token count, distinct-token count (their
    * ratio is the duplicate-word fraction), total bigram count, and
    * the occurrence count of the MOST FREQUENT bigram (its fraction is
    * the top-2-gram repetition signal — high means the doc loops).
    *
    * Entirely PER-ROW, zero shuffle — a corpus-wide profile costs one
    * scan, and 100 TB of documents never exchanges a byte. The four
    * counters come from ONE compiled pass over the token array
    * (hash-set for distincts, hash-map for bigram counts): the same
    * semantics are expressible as Catalyst higher-order lambdas
    * (array_sort + a longest-equal-run fold), but those run
    * interpreted — the compiled pass measured ~4× faster at sf0.1,
    * the repo's standing shingle-UDF precedent. */
  def repetitionProfile(docs: DataFrame): DataFrame = {
    val profile = udf { text: String =>
      val toks = if (text == null) Array.empty[String] else text.split(" ", -1)
      val distinct = new java.util.HashSet[String]()
      val bigrams = new java.util.HashMap[String, Long]()
      var top = 0L
      var i = 0
      while (i < toks.length) {
        distinct.add(toks(i))
        if (i > 0) {
          val g = toks(i - 1) + " " + toks(i)
          val c = bigrams.merge(g, 1L, (a, b) => a + b)
          if (c > top) top = c
        }
        i += 1
      }
      (toks.length.toLong, distinct.size.toLong, top,
        math.max(toks.length - 1, 0).toLong)
    }
    docs.select(col("doc_id"), profile(col("text")).as("p"))
      .select(col("doc_id"),
        col("p._1").as("n_tokens"),
        col("p._2").as("n_distinct_tokens"),
        col("p._3").as("top_bigram_n"),
        col("p._4").as("n_bigrams"))
  }

  /** Sliding token windows with stride — the context-window chunker
    * for sequence-model training samples. Chunk i covers tokens
    * [i*stride, i*stride + window); a document shorter than `window`
    * yields exactly one (short) chunk, and the last chunk may be
    * short. Returns (doc_id, chunk_idx, n_chunk_tokens, chunk_text).
    * Pure per-row explode + slice: shuffle-free, linear in corpus
    * size × (window/stride) overlap factor. */
  def chunkWindows(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(stride > 0 && window >= stride,
      s"chunkWindows: need 0 < stride <= window, got window=$window stride=$stride")
    val w = split(col("text"), " ")
    docs
      .select(col("doc_id"), w.as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0),
          when(size(col("w")) <= window, lit(0))
            .otherwise(ceil((size(col("w")) - window) / lit(stride.toDouble))
              .cast(IntegerType))))
          .as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("w"), col("chunk_idx") * stride + 1, lit(window)).as("cw"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("cw")).as("n_chunk_tokens"),
        concat_ws(" ", col("cw")).as("chunk_text"))
  }

  // PII patterns — kept to the RE2 ∩ java.util.regex common subset so
  // the engine (Java regex) and the DuckDB oracle (RE2) match the same
  // spans. Replacement is global on both sides (Spark regexp_replace
  // is global; DuckDB needs the 'g' flag — see the oracle SQL).
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Redact emails, then phone numbers, then IPv4 addresses (fixed
    * order, so a pattern can never match inside an earlier
    * placeholder). Scan-side, codegen'd. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Count matches of `re` in `text` (exact, not capped). */
  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast(LongType)

  // ---- extended sensitive-text detectors (t104/t105) — still the
  // RE2 ∩ java.util.regex common subset, no lookaround. Phone numbers
  // written in Persian digits are caught by normalizing with
  // [[graft.functions.PersianText.persianToEnglishDigits]] (F1) BEFORE
  // matching — see [[redactAllPii]].

  /** Iranian mobile, both forms: +98 9xx xxx xxxx and 0 9xx xxx xxxx.
    * No leading `\b` on the `+98` arm (+ after a space has no word
    * boundary); each arm ends on `\b` so an 11/12-digit match never
    * fires INSIDE a longer digit run. */
  val IranMobileRe = "(?:\\+989[0-9]{9}\\b|\\b09[0-9]{9}\\b)"

  /** Standalone 10-digit national-ID-shaped number. The `\b` pair means
    * it never matches inside an 11-digit mobile or a 16-digit card. */
  val NationalIdRe = "\\b[0-9]{10}\\b"

  /** 16-digit card number in 4-4-4-4 dashed groups. */
  val Card16Re = "\\b[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}\\b"

  /** Full redaction chain over DIGIT-NORMALIZED text (F1 first, so
    * Persian-digit phone numbers redact too): email → IPv4 → card →
    * international phone → Iranian mobile → national id. Fixed order —
    * placeholders from earlier passes contain no digits or `@`, so a
    * later pattern can never match inside one; the card pass runs
    * before the bare-digit passes so its 4-digit groups are gone
    * before any digit-run pattern looks. Scan-side, codegen'd — one
    * projection, no UDF. */
  def redactAllPii(text: Column): Column = {
    val norm = graft.functions.PersianText.persianToEnglishDigits(text)
    Seq(EmailRe -> "<EMAIL>", Ipv4Re -> "<IP>", Card16Re -> "<CARD>",
      PhoneRe -> "<PHONE>", IranMobileRe -> "<PHONE>",
      NationalIdRe -> "<ID>")
      .foldLeft(norm) { case (c, (re, tag)) => regexp_replace(c, re, tag) }
  }

  /** MULTI-KEYWORD / PHRASE TAGGING at blocklist scale (the FlashText
    * problem): find every occurrence of a large keyword/phrase set in
    * every document. A regex alternation dies past a few thousand
    * keywords (pattern compilation and per-char alternation cost both
    * grow with the set); this stays declarative instead — keywords
    * tokenize once, documents explode to (pos, token), candidates come
    * from ONE broadcast equi-join on each phrase's FIRST token, and a
    * higher-order `slice == phrase` comparison against the document's
    * token array verifies the full phrase. Token-boundary matching,
    * case-insensitive, overlapping and repeated occurrences all
    * counted.
    *
    * Scale shape: the keyword set travels as a broadcast (100k phrases
    * is megabytes); per-document cost is O(tokens) for the explode
    * plus O(anchor hits · phrase length) for verification — never
    * O(tokens · keywords). Output: (id, keyword, n_hits), one row per
    * document×keyword that actually matches. */
  def keywordTag(docs: DataFrame, idCol: String, textCol: String,
                 keywords: Seq[String]): DataFrame = {
    require(keywords.nonEmpty, "keywordTag: empty keyword set")
    require(keywords.forall(_.trim.nonEmpty),
      "keywordTag: blank keyword in the set")
    val spark = docs.sparkSession
    import spark.implicits._
    // anchor = each phrase's LONGEST token (rarer than the first word
    // of a phrase almost always — "the quick fox" anchors on "quick"),
    // chosen driver-side; a_idx re-anchors the candidate position back
    // to the phrase start
    val kwList = keywords.distinct.map { k =>
      val kts = k.trim.toLowerCase.split("\\s+").toSeq
      val aIdx = kts.zipWithIndex.maxBy { case (t, i) => (t.length, -i) }._2
      (k, kts, kts.length, aIdx, kts(aIdx))
    }
    val maxLen = kwList.map(_._3).max
    val kw = kwList.toDF("keyword", "kts", "k_len", "a_idx", "anchor")
    val toksArr = docs.select(col(idCol),
      split(lower(col(textCol)), "\\s+").as("__toks"))
    // a phrase containing the anchor at position __pos lies entirely
    // inside tokens [__pos-(maxLen-1), __pos+(maxLen-1)] — carry that
    // WINDOW through the anchor projection and verify against it, so
    // the full token arrays are never shuffled a second time (the old
    // anchors⋈toksArr re-join moved every matched document's array
    // again; the window is O(maxLen) per ANCHOR HIT, computed lazily
    // after the broadcast probe filters the token stream). The only
    // exchange left in the whole operator is the final tiny groupBy.
    val anchors = toksArr
      .select(col(idCol), col("__toks"),
        posexplode(col("__toks")).as(Seq("__pos", "__tok")))
      .join(broadcast(kw), col("__tok") === col("anchor"))
      .select(col(idCol), col("keyword"), col("kts"), col("k_len"),
        (col("__pos") - col("a_idx")).as("__start"),
        greatest(col("__pos") - lit(maxLen - 1), lit(0)).as("__wstart"),
        slice(col("__toks"),
          greatest(col("__pos") - lit(maxLen - 1), lit(0)) + 1,
          lit(2 * maxLen - 1)).as("__win"))
      .filter(col("__start") >= 0)
    // verify the full phrase against the carried window — slice is
    // 1-based; a phrase running past the end yields a short slice and
    // fails the equality
    anchors
      .filter(slice(col("__win"),
        col("__start") - col("__wstart") + 1, col("k_len")) === col("kts"))
      .groupBy(col(idCol), col("keyword"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Per-document PII instance counts over digit-normalized text —
    * exact integers, one scan, the redaction chain's audit twin. */
  def piiCounts(text: Column): (Column, Column, Column, Column, Column) = {
    val norm = graft.functions.PersianText.persianToEnglishDigits(text)
    (countMatches(norm, EmailRe),
      countMatches(norm, PhoneRe) + countMatches(norm, IranMobileRe),
      countMatches(norm, Ipv4Re),
      countMatches(norm, NationalIdRe),
      countMatches(norm, Card16Re))
  }
}

/** GOPHER QUALITY RULES (Rae et al. 2021, "Scaling Language Models:
  * Methods, Analysis & Insights from Training Gopher", appendix A1) —
  * the rule set production corpora apply between boilerplate removal
  * and model-based filtering. Every signal here is either row-local
  * arithmetic or ONE map-side-combinable aggregate keyed by document,
  * so the whole rule set costs one scan at 100 TB; ratios quantize to
  * integer parts-per-million ONCE (the oracle-determinism contract).
  *
  * Implemented signals and their published thresholds:
  *  - word count in [50, 100000]
  *  - mean word length in [3, 10] characters
  *  - fraction of words with an alphabetic character ≥ 0.80
  *  - ≥ 2 distinct stop words present (the/be/to/of/and/that/have/with;
  *    case-insensitive with edge punctuation stripped — 'The' and
  *    'the,' count. Words split on whitespace RUNS, not ' ' alone)
  *  - fraction of lines starting with a bullet ≤ 0.90
  *  - fraction of lines ending in an ellipsis ≤ 0.30
  *  - fraction of characters in the most frequent word {2,3,4}-gram
  *    ≤ {0.20, 0.18, 0.16} (count × n-gram length over text length;
  *    the argmax n-gram ties break lexicographically)
  */
object GopherRules {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._

  private val StopWords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document metrics + the boolean `gopher_keep` verdict. One
    * n-gram explode-and-aggregate per n ∈ {2,3,4} plus row-local
    * expressions; every ratio an exact integer ppm. */
  def gopherRules(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    // words split on RUNS OF WHITESPACE (space/tab/newline — splitting
    // on ' ' alone fused words across line breaks into junk tokens);
    // `__wn` is the stop-word view of each word: lowercased with
    // edge punctuation stripped, so 'The' and 'the,' count as Gopher's
    // published rule intends
    val base = docs.select(col(idCol).as("doc_id"),
      col(textCol).as("__t"),
      expr(s"filter(split($textCol, '\\\\s+'), x -> x <> '')").as("__w"),
      split(col(textCol), "\n").as("__l"))
      .withColumn("__wn", expr("transform(__w, x -> " +
        "regexp_replace(lower(x), '^[^a-z0-9]+|[^a-z0-9]+$', ''))"))
    val rowLocal = base.select(col("doc_id"),
      length(col("__t")).as("n_chars"),
      size(col("__w")).cast("long").as("n_words"),
      // mean word length in ppm: sum(len) * 1e6 div n_words
      when(size(col("__w")) > 0, expr(
          "aggregate(__w, 0L, (a, x) -> a + length(x)) * 1000000L " +
            "div size(__w)"))
        .otherwise(lit(0L)).as("mean_word_len_ppm"),
      when(size(col("__w")) > 0, expr(
          "size(filter(__w, x -> x rlike '[a-zA-Z]')) * 1000000L " +
            "div size(__w)"))
        .otherwise(lit(0L)).as("alpha_word_ppm"),
      StopWords.map(w =>
        when(array_contains(col("__wn"), w), 1L).otherwise(0L))
        .reduce(_ + _).as("stop_hits"),
      expr("size(filter(__l, x -> x rlike '^\\\\s*[-*\u2022]')) " +
        "* 1000000L div size(__l)").as("bullet_line_ppm"),
      expr("size(filter(__l, x -> x rlike " +
        "'(\\\\.\\\\.\\\\.|\u2026)\\\\s*$')) " +
        "* 1000000L div size(__l)").as("ellipsis_line_ppm"))
    // fraction of characters in the most frequent word n-gram: one
    // (doc, gram) count aggregate per n; the per-document argmax is a
    // max(struct(count, gram)) hash aggregate — map-side combinable,
    // replacing the row_number window's shuffle + per-partition sort.
    // struct ordering compares count first, gram second, so the max is
    // exactly the old ORDER BY __c DESC, __g DESC row 1. (A fused
    // single-explode variant tagging grams with n measured 2× SLOWER
    // — r17: 4.5 s vs 2.2 s — the concat-of-CASE projection
    // re-evaluated the word split per arm and the wider key shuffled
    // more; three independent passes also overlap under the
    // scheduler.)
    def topGramPpm(n: Int): DataFrame = {
      val grams = base.select(col("doc_id"), length(col("__t")).as("__len"),
        explode(expr(
          s"CASE WHEN size(__w) >= $n THEN " +
            s"transform(sequence(1, size(__w) - ${n - 1}), " +
            s"i -> array_join(slice(__w, i, $n), ' ')) " +
            "ELSE array() END")).as("__g"))
      grams.groupBy(col("doc_id"), col("__len"), col("__g"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("doc_id"), col("__len"))
        .agg(max(struct(col("__c"), col("__g"))).as("__m"))
        .select(col("doc_id"),
          expr(s"__m.__c * length(__m.__g) * 1000000L div __len")
            .as(s"top${n}gram_ppm"))
    }
    val out = Seq(2, 3, 4).map(topGramPpm)
      .foldLeft(rowLocal)((acc, d) => acc.join(d, Seq("doc_id"), "left"))
      .na.fill(0L, Seq("top2gram_ppm", "top3gram_ppm", "top4gram_ppm"))
    out.withColumn("gopher_keep",
      col("n_words") >= 50L && col("n_words") <= 100000L &&
        col("mean_word_len_ppm") >= 3000000L &&
        col("mean_word_len_ppm") <= 10000000L &&
        col("alpha_word_ppm") >= 800000L &&
        col("stop_hits") >= 2L &&
        col("bullet_line_ppm") <= 900000L &&
        col("ellipsis_line_ppm") <= 300000L &&
        col("top2gram_ppm") <= 200000L &&
        col("top3gram_ppm") <= 180000L &&
        col("top4gram_ppm") <= 160000L)
  }
}
