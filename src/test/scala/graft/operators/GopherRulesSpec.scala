package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Gopher quality rules (Rae et al. 2021 A1): per-metric arithmetic on
  * hand-checkable fixtures, the verdict thresholds, and the
  * one-scan/no-UDF plan shape. */
class GopherRulesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, org.apache.spark.sql.Row] =
    GopherRules.gopherRules(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("row-local metrics: words, mean length, alpha fraction, stops") {
    val m = run(
      (1L, "the cat and the dog have fun with all of that"),
      (2L, "12 34 56 ab"),
      (3L, ""))
    val r1 = m(1L)
    assert(r1.getAs[Long]("n_words") === 11L)
    // 35 letter chars over 11 words = 3181818 ppm
    assert(r1.getAs[Long]("mean_word_len_ppm") === 35L * 1000000L / 11L)
    assert(r1.getAs[Long]("alpha_word_ppm") === 1000000L)
    assert(r1.getAs[Long]("stop_hits") === 6L) // the,and,have,with,of,that
    val r2 = m(2L)
    assert(r2.getAs[Long]("alpha_word_ppm") === 250000L) // 1 of 4
    assert(r2.getAs[Long]("stop_hits") === 0L)
    assert(m(3L).getAs[Long]("n_words") === 0L)
  }

  test("line metrics: bullet and ellipsis fractions") {
    val m = run(
      (1L, "- one\n- two\nplain line\n* three"),
      (2L, "ends here...\nnormal\nalso dots…"))
    assert(m(1L).getAs[Long]("bullet_line_ppm") === 750000L) // 3 of 4
    assert(m(2L).getAs[Long]("ellipsis_line_ppm") === 2000000L / 3L)
  }

  test("top n-gram char fractions: counts, lengths, argmax tie-break") {
    // "data row" x3 -> 2-grams: [data row, row data, data row, row data,
    // data row] -> top 'data row' count 3, len 8, text len 26
    val m = run((1L, "data row data row data row"))
    val r = m(1L)
    assert(r.getAs[Long]("top2gram_ppm") === 3L * 8L * 1000000L / 26L)
    // 3-grams tie at count 2 ('data row data' vs 'row data row'); the
    // argmax breaks ties by gram text DESC -> 'row data row', len 12
    assert(r.getAs[Long]("top3gram_ppm") === 2L * 12L * 1000000L / 26L)
    assert(!r.getAs[Boolean]("gopher_keep"), "a stuck repeater must fail")
  }

  test("the verdict applies every published threshold") {
    // a passing doc: >= 50 words, sane lengths, stops, no repetition
    val words = (0 until 60).map(i => s"w${i}ord").mkString(" ")
    val good = s"the cat and that dog have fun with all of it $words"
    val m = run((1L, good), (2L, "tiny document"))
    assert(m(1L).getAs[Boolean]("gopher_keep"),
      m(1L).toString) // every rule clears
    assert(!m(2L).getAs[Boolean]("gopher_keep"), "word-count floor binds")
  }

  test("one scan, no UDFs in the plan") {
    val df = GopherRules.gopherRules(
      Seq((1L, "the cat and that")).toDF("doc_id", "text"), "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("UDF"), plan)
  }
}
