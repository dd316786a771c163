package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Leniency contract for the dependency-free DOM: real-world pages are
  * truncated mid-tag, carry unquoted/bare attributes, and leave tags
  * unclosed — BeautifulSoup (the reference's parser,
  * kilid_transformer.py:187-367) survives all of it, so parse() must
  * never throw and must still yield whatever structure is recoverable. */
class HtmlLiteSpec extends AnyFunSuite {

  private val page =
    """<html><body>
      |<nav aria-label="breadcrumb"><a href="/">کیلید</a><a>اجاره</a></nav>
      |<div class="relative"><img src="https://cdn.kilid.com/a.jpg"/></div>
      |<h1 class="text-lg font-semibold">آپارتمان ۸۵ متری</h1>
      |<script>var x = "<div>not real</div>";</script>
      |<div class="group flex items-center justify-center">
      |  <span class="text-nowrap">۸۵ متر</span></div>
      |<div class="transition-all duration-300">توضیحات</div>
      |</body></html>""".stripMargin

  test("unquoted and bare attributes parse") {
    val doc = HtmlLite.parse(
      """<div class=box id=main data-x='q' hidden><span class="a b">t</span></div>""")
    val d = doc.selectOne("div", "box").getOrElse(fail("div not found"))
    assert(d.attrs("id") === "main")
    assert(d.attrs("data-x") === "q")
    assert(d.attrs("hidden") === "")
    assert(d.selectOne("span", "a", "b").map(_.text) === Some("t"))
  }

  test("unclosed tags keep their subtree; stray closers are ignored") {
    val doc = HtmlLite.parse("<div class=a><p>one<p>two</span></div><b>tail")
    assert(doc.selectOne("div", "a").isDefined)
    assert(doc.select("p").map(_.text).contains("one two") ||
      doc.select("p").map(_.text) === Seq("one", "two"))
    assert(doc.selectOne("b").map(_.text) === Some("tail"))
  }

  test("case-insensitive script/style skip, including unterminated") {
    val doc = HtmlLite.parse(
      "<div>a</div><SCRIPT>var y = '<i>x</i>';</Script><div>b</div>")
    assert(doc.select("i").isEmpty)
    assert(doc.select("div").map(_.text) === Seq("a", "b"))
    val trunc = HtmlLite.parse("<div>a</div><script>never closed")
    assert(trunc.select("div").map(_.text) === Seq("a"))
  }

  test("fuzz: every prefix truncation of a real page parses without throwing") {
    (0 to page.length).foreach { cut =>
      val doc = HtmlLite.parse(page.substring(0, cut))
      doc.select("div", "group").foreach(_.text) // force selectors too
      doc.text
    }
  }

  test("fuzz: random mangling (deletions, stray quotes/brackets) never throws") {
    val rnd = new scala.util.Random(42)
    val noise = Array('<', '>', '"', '\'', '=', '/', '&', 'x', ' ')
    (1 to 300).foreach { _ =>
      val sb = new StringBuilder(page)
      (1 to 1 + rnd.nextInt(8)).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 => // delete a span
            val at = rnd.nextInt(sb.length)
            sb.delete(at, math.min(sb.length, at + 1 + rnd.nextInt(20)))
          case 1 => // insert noise
            sb.insert(rnd.nextInt(sb.length), noise(rnd.nextInt(noise.length)))
          case 2 => // replace a char
            sb.setCharAt(rnd.nextInt(sb.length), noise(rnd.nextInt(noise.length)))
        }
      }
      val doc = HtmlLite.parse(sb.toString)
      doc.select("*").foreach(_.classTokens)
      doc.text
    }
  }

  test("null and empty input yield an empty root") {
    assert(HtmlLite.parse(null).children.isEmpty)
    assert(HtmlLite.parse("").children.isEmpty)
    assert(HtmlLite.parse("just text").text === "just text")
  }
}
