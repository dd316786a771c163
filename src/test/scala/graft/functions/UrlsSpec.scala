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

  test("registeredDomain: two-part public suffixes keep three labels") {
    def dom(hs: String*): Seq[String] =
      hs.toDF("h").select(Urls.registeredDomain(col("h")).as("d"))
        .collect().map(_.getString(0)).toSeq
    assert(dom("www.example.com", "blog.example.com") ===
      Seq("example.com", "example.com"))
    // multi-part public suffixes must NOT collapse to the suffix itself
    assert(dom("www.bbc.co.uk", "news.bbc.co.uk", "site.com.au") ===
      Seq("bbc.co.uk", "bbc.co.uk", "site.com.au"))
    // host exactly a suffix, and single-label hosts, pass through
    assert(dom("co.uk", "localhost") === Seq("co.uk", "localhost"))
  }
}
