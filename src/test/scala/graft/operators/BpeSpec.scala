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
                  reliable: Boolean = false): Seq[(Int, String, String, Long)] =
    Bpe.trainMerges(words.toDF("w", "freq"), "w", "freq", budget, reliable)
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
