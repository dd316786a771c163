package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** URL canonicalization edge cases beyond the oracle-gated shapes. */
class UrlsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def canon(ss: String*): Seq[String] =
    ss.toDF("u").select(Urls.canonicalize(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("edge cases: bare ?, tracking-only, ports on the wrong scheme, non-urls") {
    assert(canon("http://A.com/x?") === Seq("http://a.com/x"))
    assert(canon("http://a.com/x?utm_a=1&utm_b=2") === Seq("http://a.com/x"))
    // :443 is NOT the default for http — must survive
    assert(canon("http://a.com:443/x") === Seq("http://a.com:443/x"))
    assert(canon("https://a.com:443/x") === Seq("https://a.com/x"))
    // ref is tracking; pref is not (name match, not prefix match)
    assert(canon("http://a.com/x?ref=r&pref=2") === Seq("http://a.com/x?pref=2"))
    // no scheme → left untouched (trimmed only)
    assert(canon("  not a url  ") === Seq("not a url"))
    assert(canon("mailto:x@y.z") === Seq("mailto:x@y.z"))
  }
}
