package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Corpus preparation: cross-document boilerplate removal, sliding
  * context windows, PII redaction. */
class CorpusTextSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("removeBoilerplate drops repeated segments, keeps order, handles all-dropped docs") {
    // 2-token segments; "x y" appears in docs 1, 2, 3 → boilerplate at
    // minDocs=2; doc 3 is ONLY boilerplate → empty clean_text (not null)
    val docs = Seq(
      (1L, "x y a b"),
      (2L, "c d x y"),
      (3L, "x y"),
      (4L, "p q r")).toDF("doc_id", "text")
    val out = CorpusText.removeBoilerplate(docs, segTokens = 2, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.toSeq === Seq(
      Row(1L, 2L, 1L, "a b"),
      Row(2L, 2L, 1L, "c d"),
      Row(3L, 1L, 1L, ""),
      Row(4L, 2L, 0L, "p q r")))
  }

  test("removeBoilerplateLines: df threshold, order kept, all-dropped doc is ''") {
    // footer in 3/4 docs (75% ≥ 50%) drops; nav in 1/4 (25% < 50%) stays
    val docs = Seq(
      (0L, "nav bar\nbody zero\nfooter line"),
      (1L, "body one\nfooter line"),
      (2L, "footer line"), // all lines boilerplate -> rebuilds to ''
      (3L, "body three a\nbody three b")).toDF("doc_id", "text")
    val out = CorpusText.removeBoilerplateLines(docs, tauPpm = 500000L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (0L, 3L, 1L, "nav bar\nbody zero"),
      (1L, 2L, 1L, "body one"),
      (2L, 1L, 1L, ""),
      (3L, 2L, 0L, "body three a\nbody three b")))
    // a line repeated TWICE in one doc counts that doc once in df
    val rep = Seq(
      (0L, "dup\ndup\nkeep"),
      (1L, "solo"), (2L, "solo2"), (3L, "solo3")).toDF("doc_id", "text")
    val kept = CorpusText.removeBoilerplateLines(rep, tauPpm = 400000L)
      .filter(col("doc_id") === 0L)
      .select("clean_text").as[String].head()
    assert(kept === "dup\ndup\nkeep",
      "within-doc repeats must not inflate document frequency")
  }

  test("removeBoilerplate counts DISTINCT documents, not occurrences") {
    // "x y" twice in ONE doc is not boilerplate at minDocs=2
    val docs = Seq((1L, "x y x y"), (2L, "a b")).toDF("doc_id", "text")
    val out = CorpusText.removeBoilerplate(docs, segTokens = 2, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.toSeq === Seq(Row(1L, 2L, 0L, "x y x y"), Row(2L, 1L, 0L, "a b")))
  }

  test("chunkWindows: stride overlap, short-doc single chunk, short tail") {
    val docs = Seq(
      (1L, (1 to 10).map("t" + _).mkString(" ")), // 10 tokens, w=4 s=3
      (2L, "a b")) // shorter than window → one short chunk
      .toDF("doc_id", "text")
    val out = CorpusText.chunkWindows(docs, window = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text").collect()
    assert(out.toSeq === Seq(
      Row(1L, 0, 4, "t1 t2 t3 t4"),
      Row(1L, 1, 4, "t4 t5 t6 t7"),
      Row(1L, 2, 4, "t7 t8 t9 t10"),
      Row(2L, 0, 2, "a b")))
    // every token is covered by at least one chunk
    val covered = CorpusText.chunkWindows(docs, window = 4, stride = 3)
      .select(explode(split(col("chunk_text"), " ")).as("t"))
      .distinct().count()
    assert(covered === 12)
  }

  test("chunkWindows rejects invalid stride") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      CorpusText.chunkWindows(docs, window = 4, stride = 5)
    }
  }

  test("redactPii replaces every occurrence and counts match") {
    val df = Seq((1L,
      "mail a@b.com and c.d@e.org then call +1-555-1234 from 10.0.0.1 or 192.168.1.255"))
      .toDF("doc_id", "text")
      .select(
        CorpusText.countMatches(col("text"), CorpusText.EmailRe).as("ne"),
        CorpusText.countMatches(col("text"), CorpusText.PhoneRe).as("np"),
        CorpusText.countMatches(col("text"), CorpusText.Ipv4Re).as("ni"),
        CorpusText.redactPii(col("text")).as("r"))
    val Row(ne: Long, np: Long, ni: Long, r: String) = df.collect()(0)
    assert((ne, np, ni) === (2L, 1L, 2L))
    assert(r === "mail <EMAIL> and <EMAIL> then call <PHONE> from <IP> or <IP>")
  }

  test("redactAllPii: Persian-digit phones, id/card boundaries, fixed-order overlaps") {
    def run(text: String): (String, Long, Long, Long, Long, Long) = {
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val (em, ph, ip, id, card) = CorpusText.piiCounts(col("text"))
      val Row(r: String, ne: Long, np: Long, ni: Long, nd: Long, nc: Long) =
        df.select(CorpusText.redactAllPii(col("text")).as("r"),
          em.as("ne"), ph.as("np"), ip.as("ni"), id.as("nd"), card.as("nc"))
          .collect()(0)
      (r, ne, np, ni, nd, nc)
    }
    // a Persian-digit mobile normalizes (F1) then redacts
    val (r1, _, p1, _, _, _) = run("تماس ۰۹۱۲۳۴۵۶۷۸۹ بگیرید")
    assert(r1 === "تماس <PHONE> بگیرید" && p1 === 1L)
    // an 11-digit mobile must NOT also count as a 10-digit national id,
    // and a bare 10-digit id must not count as a phone
    val (r2, _, p2, _, d2, _) = run("call 09123456789 id 0071234567 end")
    assert(r2 === "call <PHONE> id <ID> end" && p2 === 1L && d2 === 1L)
    // a dashed card's 4-digit groups never feed the digit-run patterns
    val (r3, _, p3, _, d3, c3) = run("card 4111-1111-1111-1111 paid")
    assert(r3 === "card <CARD> paid" && c3 === 1L && p3 === 0L && d3 === 0L)
    // a 16-digit UNdashed run matches neither id nor card (boundaries)
    val (r4, _, _, _, d4, c4) = run("raw 4111111111111111 run")
    assert(r4 === "raw 4111111111111111 run" && d4 === 0L && c4 === 0L)
    // +98 intl form (no word boundary exists before '+')
    val (r5, _, p5, _, d5, _) = run("reach +989123456789 ok")
    assert(r5 === "reach <PHONE> ok" && p5 === 1L && d5 === 0L)
    // everything at once, every kind counted exactly once
    val (r6, e6, p6, i6, d6, c6) = run(
      "a@b.com ۰۹۱۲۳۴۵۶۷۸۹ 10.0.0.1 0071234567 4111-1111-1111-1111 +1-555-1234")
    assert(r6 === "<EMAIL> <PHONE> <IP> <ID> <CARD> <PHONE>")
    assert((e6, p6, i6, d6, c6) === (1L, 2L, 1L, 1L, 1L))
  }

  test("keywordTag: phrases, overlapping repeats, case, end-of-doc, absent") {
    val docs = Seq(
      (1L, "The quick brown fox and the QUICK brown dog"),
      (2L, "aa aa aa"),
      (3L, "quick"),
      (4L, "edge case at end quick brown"))
      .toDF("id", "text")
    val out = CorpusText.keywordTag(docs, "id", "text",
      Seq("quick brown", "aa aa", "fox", "missing"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out((1L, "quick brown")) === 2L, "case-insensitive phrase")
    assert(out((1L, "fox")) === 1L)
    assert(out((2L, "aa aa")) === 2L, "overlapping occurrences both count")
    assert(!out.contains((3L, "quick brown")), "partial phrase is no match")
    assert(out((4L, "quick brown")) === 1L, "phrase ending at the last token")
    assert(!out.keys.exists(_._2 == "missing"))
    // scale shape: the keyword side is a broadcast join, never a shuffle
    val plan = CorpusText.keywordTag(docs, "id", "text",
      Seq("quick brown", "fox")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
  }

  test("keywordTag plan: one exchange, no re-join of the token arrays") {
    val docs = Seq(
      (0L, "the quick brown fox jumps"),
      (1L, "quick maneuvers win races quick brown wins more"))
      .toDF("doc_id", "text")
    val out = CorpusText.keywordTag(docs, "doc_id", "text",
      Seq("quick brown", "races"))
    // the window-slice verification needs no anchors⋈tokens join: the
    // only exchange in the plan is the final (doc, keyword) groupBy
    val plan = out.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 1, s"expected one shuffle exchange, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no re-join:\n$plan")
    val rows = out.orderBy("doc_id", "keyword")
      .as[(Long, String, Long)].collect().toSeq
    assert(rows === Seq((0L, "quick brown", 1L), (1L, "quick brown", 1L),
      (1L, "races", 1L)))
  }

  test("repetitionProfile: exact counts incl. looped, uniform, and tiny docs") {
    val docs = Seq(
      (1L, "a b a b a b"),   // bigram 'a b' x3, 'b a' x2
      (2L, "x x x x"),       // all-same: 'x x' x3
      (3L, "p q r"),         // all distinct bigrams
      (4L, "solo"),          // one token: no bigrams
      (5L, "")).toDF("doc_id", "text")
    val out = CorpusText.repetitionProfile(docs).orderBy("doc_id").collect()
    assert(out.toSeq === Seq(
      Row(1L, 6L, 2L, 3L, 5L),
      Row(2L, 4L, 1L, 3L, 3L),
      Row(3L, 3L, 3L, 1L, 2L),
      Row(4L, 1L, 1L, 0L, 0L),
      // split("", " ") yields [""] — one empty token, zero bigrams
      Row(5L, 1L, 1L, 0L, 0L)))
  }

  test("repetitionProfile plans shuffle-free (per-row fold, no exchange)") {
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val plan = CorpusText.repetitionProfile(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
