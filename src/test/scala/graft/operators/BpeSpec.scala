package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** BPE merge-loop invariants against an in-memory sequential
  * reference — the same greedy recurrence written as plain Scala. */
class BpeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Reference: leftmost-greedy single-pair merge. */
  private def mergeWord(s: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { out += (l + r); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** Reference: the full greedy loop over (word, freq) rows. */
  private def refBpe(words: Seq[(String, Long)],
                     budget: Int): Seq[(Int, String, String, Long)] = {
    var seg = words.map { case (w, f) => (w.map(_.toString).toVector, f) }
      .filter(_._1.length >= 2)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 0
    var done = false
    while (step < budget && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seg.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        step += 1
        merges += ((step, l, r, n))
        seg = seg.map { case (s, f) => (mergeWord(s, l, r), f) }
          .filter(_._1.length >= 2)
      }
    }
    merges.result()
  }

  private def run(words: Seq[(String, Long)], budget: Int,
                  reliable: Boolean = false,
                  batch: Int = 16): Seq[(Int, String, String, Long)] =
    Bpe.trainMerges(words.toDF("w", "freq"), "w", "freq", budget, reliable, batch)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("equal-symbol runs merge at even offsets (leftmost-greedy)") {
    // 'aaaa' -> [aa, aa]; 'aaa' -> [aa, a]; the merge table sees 'aa'
    // chosen with count 2+2+1 pairs -> counts are PAIR occurrences
    // under greedy non-overlap: aaaa has 2, aaa has 1... the CHOSEN
    // count is the raw adjacent-pair count (3 + 2), matching standard
    // BPE statistics; re-segmentation is where greedy applies
    val words = Seq(("aaaa", 1L), ("aaa", 1L))
    val got = run(words, 3)
    assert(got == refBpe(words, 3), s"diverged from reference: $got")
    assert(got.head._2 == "a" && got.head._3 == "a")
  }

  test("property: merge table equals the sequential reference on random words") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    for (round <- 1 to 3) {
      val words = (0 until 60).map { i =>
        val len = sample(Gen.chooseNum(1, 10), round * 1000L + i)
        val w = (0 until len)
          .map(j => sample(Gen.oneOf('a', 'b', 'c'), round * 7000L + i * 31L + j))
          .mkString
        (w, sample(Gen.chooseNum(1L, 5L), round * 77L + i))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      val got = run(words, 6)
      assert(got == refBpe(words, 6), s"round=$round diverged")
    }
  }

  test("segment replays the trained merges (apply == training's re-segmentation)") {
    val words = Seq(("abab", 4L), ("aabb", 2L), ("ba", 1L), ("c", 1L))
    val merges = run(words, 3).map(m => (m._2, m._3))
    val got = Bpe.segment(words.map(_._1).toDF("w"), "w", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val ref = words.map { case (w, _) =>
      w -> merges.foldLeft(w.map(_.toString).toVector) {
        case (s, (l, r)) => mergeWord(s, l, r)
      }.toList
    }.toMap
    assert(got == ref, s"segment diverged from the reference fold: $got vs $ref")
    // length-1 words segment to themselves untouched
    assert(got("c") == List("c"))
  }

  test("segmentWithVocab (priority UDF) equals segment (fold) on random words") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val words = (0 until 80).map { i =>
      val len = sample(Gen.chooseNum(1, 12), 5000L + i)
      ((0 until len).map(j => sample(Gen.oneOf('a', 'b', 'c'), 9000L + i * 37L + j))
        .mkString, 1L + i % 4)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val merges = run(words, 10).map(m => (m._2, m._3))
    val wdf = words.map(_._1).toDF("w")
    def seq(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(seq(Bpe.segmentWithVocab(wdf, "w", merges)) ==
      seq(Bpe.segment(wdf, "w", merges)),
      "the production priority-loop apply diverged from the fold")
  }

  test("batched selection stops at the first conflicting pair (prefix rule)") {
    // pair counts: (a,b)=100, (b,c)=90, (d,e)=80 — disjoint-only
    // batching would take {(a,b),(d,e)} and record (d,e) before (b,c);
    // sequential greedy merges (a,b) first, after which (b,c) still
    // counts 90 (no shared context) and must come second. The prefix
    // rule closes the batch at (b,c)'s conflict, reproducing exactly
    // the sequential order.
    val words = Seq(("ab", 100L), ("bc", 90L), ("de", 80L))
    val got = run(words, 3)
    assert(got == refBpe(words, 3), s"prefix rule diverged: $got")
    assert(got.map(m => (m._2, m._3)) == Seq("a" -> "b", "b" -> "c", "d" -> "e"))
  }

  test("batched path reproduces the sequential greedy merge table at budget 64") {
    // conflict- and tie-heavy corpus: 4-letter alphabet, 300 words of
    // length 4-8 from a deterministic multiplicative-hash expansion
    val letters = "abcd"
    val words = (0 until 300).map { i =>
      val h = (i * 2654435761L) & 0x3fffffffL
      val len = 4 + (h % 5).toInt
      val w = (0 until len).map(j => letters(((h >> (2 * j)) & 3).toInt)).mkString
      (w, 1L + i % 7)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val ref = refBpe(words, 64)
    assert(ref.length == 64, s"fixture too small: only ${ref.length} merges")
    val got = run(words, 64, batch = 16)
    assert(got == ref,
      got.zip(ref).collectFirst { case (g, r) if g != r =>
        s"first divergence at step ${r._1}: got $g, ref $r" }.getOrElse("length mismatch"))
  }

  test("delta-maintained trainer equals the sequential reference at budget 64") {
    val letters = "abcd"
    val words = (0 until 300).map { i =>
      val h = (i * 2654435761L) & 0x3fffffffL
      val len = 4 + (h % 5).toInt
      val w = (0 until len).map(j => letters(((h >> (2 * j)) & 3).toInt)).mkString
      (w, 1L + i % 7)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val got = Bpe.trainMergesDelta(words.toDF("w", "freq"), "w", "freq", 64)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val ref = refBpe(words, 64)
    assert(got == ref,
      got.zip(ref).collectFirst { case (g, r) if g != r =>
        s"first divergence at step ${r._1}: got $g, ref $r" }.getOrElse("length mismatch"))
  }

  test("delta trainer: exhaustion, tiny maxVocab fails loudly, empty input") {
    val words = Seq(("ab", 3L), ("ba", 1L))
    val got = Bpe.trainMergesDelta(words.toDF("w", "freq"), "w", "freq", 10)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == refBpe(words, 10))
    assertThrows[IllegalArgumentException] {
      Bpe.trainMergesDelta(words.toDF("w", "freq"), "w", "freq", 2, maxVocab = 1)
    }
    assert(Bpe.trainMergesDelta(
      Seq.empty[(String, Long)].toDF("w", "freq"), "w", "freq", 3).count() == 0)
  }

  test("batch=1 equals the default batched path (sequential special case)") {
    val words = Seq(("abab", 9L), ("aabb", 5L), ("bba", 4L), ("cabc", 2L))
    assert(run(words, 8, batch = 1) == run(words, 8, batch = 16))
  }

  test("budget past exhaustion stops early; reliable mode agrees") {
    val words = Seq(("ab", 3L), ("ba", 1L))
    // pairs: ab(3), ba(1) -> merge 1 ab, then word 'ab' is one symbol;
    // 'ba' remains -> merge 2 ba; then nothing
    val got = run(words, 10)
    assert(got == refBpe(words, 10))
    assert(got.length == 2, s"expected exhaustion after 2 merges, got $got")
    assert(run(words, 10, reliable = true) == got,
      "reliable checkpoint mode changed the merge table")
  }
}
