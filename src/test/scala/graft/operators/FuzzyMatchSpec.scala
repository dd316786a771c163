package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Symmetric-delete blocking: candidates must be a lossless superset of
  * the true ≤k-distance pairs, and the exact filter must prune the
  * over-generation. */
class FuzzyMatchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val vocab = Seq("cat", "cut", "cats", "dog", "dg", "door",
    "doors", "xylophone", "a", "")

  private def brute(maxDist: Int): Set[(String, String, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for (a <- vocab; b <- vocab if a < b; d = lev(a, b) if d <= maxDist)
      yield (a, b, d)).toSet
  }

  test("maxDist=2 pairs equal the brute-force truth (blocking lossless)") {
    val got = FuzzyMatch.editDistancePairs(vocab.toDF("w"), "w", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === brute(2))
  }

  test("maxDist=1 excludes the distance-2 pairs") {
    val got = FuzzyMatch.editDistancePairs(vocab.toDF("w"), "w", maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === brute(1))
    assert(got.forall(_._3 == 1))
  }

  test("empty and single-char strings survive the deletion expansion") {
    // "" and "a" are distance 1; "" appears only via explicit vocab
    val got = FuzzyMatch.editDistancePairs(Seq("", "a", "ab").toDF("w"), "w", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === Set(("", "a", 1), ("", "ab", 2), ("a", "ab", 1)))
  }
}
