package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis column library for the training-data pipeline: token
  * counting, quality scoring, marker-word language ID, fingerprinting.
  * All pure column expressions (codegen-friendly); the oracle-checked
  * queries t21-t24 are thin wrappers over the same shapes.
  */
object TextAnalysis {

  /** Whitespace token count (0 for null/empty). */
  def tokenCount(text: Column): Column =
    when(text.isNull || text === "", 0).otherwise(size(split(text, "\\s+")))

  /** BPE-ish subword estimate: words plus an extra token per 6 chars of
    * long words — a cheap stand-in for a real tokenizer's token count. */
  def tokenCountBpeIsh(text: Column): Column = {
    val words = split(text, "\\s+")
    coalesce(aggregate(words, lit(0),
      (acc, w) => acc + greatest(lit(1), ceil(length(w) / 6.0).cast(IntegerType))),
      lit(0))
  }

  /** Punctuation character ratio in [0,1]. */
  def punctRatio(text: Column): Column =
    when(text.isNull || length(text) === 0, 0.0)
      .otherwise(
        (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))) /
          length(text).cast(DoubleType))

  /** Stopword hit ratio against a marker list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = split(lower(text), "\\s+")
    when(text.isNull || size(toks) === 0, 0.0)
      .otherwise(size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*))) /
        size(toks).cast(DoubleType))
  }

  /** Composite quality score in [0,1]: length sanity × low punctuation ×
    * stopword presence (the reference's field-validity spirit applied to
    * free text). */
  def qualityScore(text: Column,
                   stopwords: Seq[String] = Seq("the", "a", "and", "of")): Column = {
    val lenOk = when(length(text).between(20, 20000), 1.0).otherwise(0.3)
    val punctOk = lit(1.0) - least(punctRatio(text) * 4, lit(1.0))
    val stopOk = least(stopwordRatio(text, stopwords) * 10, lit(1.0))
    when(text.isNull || length(text) === 0, 0.0)
      .otherwise(round(lenOk * (lit(0.2) + punctOk * 0.5 + stopOk * 0.3), 4))
  }

  /** Marker-word language profiles (tiny n-gram-ish heuristic). */
  val defaultProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "fa" -> Seq("و", "در", "به", "از", "که"))

  /** Heuristic language ID: argmax of marker-word hits, null when no
    * profile scores at all. Deterministic tie-break by profile order. */
  def langId(text: Column,
             profiles: Map[String, Seq[String]] = defaultProfiles): Column = {
    val toks = split(lower(text), "\\s+")
    val scored = profiles.toSeq.map { case (lang, markers) =>
      (lang, size(filter(toks, t => t.isin(markers.map(lit(_)): _*))))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldLeft(lit(null).cast(StringType)) { case (acc, (lang, score)) =>
      coalesce(acc, when(score === best && score > 0, lit(lang)))
    }
  }

  /** Content fingerprint (md5 of normalized text) — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Unicode NFC via the JVM normalizer (no Catalyst builtin exists) —
    * scan-side, null-safe. Composes combining sequences so visually
    * identical strings hash identically downstream. */
  private val nfcUdf = udf((s: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))

  /** Corpus-prep text normalization: NFC-compose, turn C0/DEL control
    * characters into spaces, collapse whitespace runs, trim — the
    * canonical form a training corpus is deduped and tokenized in. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(nfcUdf(c), "[\\x00-\\x1f\\x7f]", " "),
      "\\s+", " "))
}
