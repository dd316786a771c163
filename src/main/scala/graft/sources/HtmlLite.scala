package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Minimal dependency-free HTML DOM for the kilid edge adapter
  * (SURVEY F10 — the container ships no jsoup): a tolerant tokenizer +
  * stack tree with void-element handling, plus the two selector shapes
  * the reference's BeautifulSoup calls use (descendant-by-tag+class and
  * attribute match). Not a general HTML5 parser — it targets the
  * machine-generated markup of listing pages.
  */
object HtmlLite {

  final class Node(val tag: String, val attrs: Map[String, String]) {
    val children: ArrayBuffer[Node] = ArrayBuffer.empty
    val texts: ArrayBuffer[String] = ArrayBuffer.empty
    var parent: Node = _

    // memoized: attrs are fixed at construction, and every selector
    // pass re-tests the class set of every visited node — a fresh
    // regex split per (node × selector) dominated extraction cost
    lazy val classTokens: Set[String] =
      attrs.getOrElse("class", "").split("\\s+").filter(_.nonEmpty).toSet

    /** All text beneath this node, in document order, single-spaced.
      * Memoized — safe because parse() never reads text mid-build and
      * the tree is immutable afterwards; selectors hit the same node's
      * text repeatedly. */
    lazy val text: String = {
      val sb = new StringBuilder
      def walk(n: Node): Unit = {
        // texts and children were appended in order; interleave by index
        n.ordered.foreach {
          case Left(t) => sb.append(t).append(' ')
          case Right(c) => walk(c)
        }
      }
      walk(this)
      // precompiled: String.replaceAll recompiles its pattern per call
      wsRun.matcher(sb).replaceAll(" ").trim
    }

    private[HtmlLite] val orderedBuf = ArrayBuffer.empty[Either[String, Node]]
    def ordered: Seq[Either[String, Node]] = orderedBuf.toSeq

    def descendants: Iterator[Node] = descendantSeq.iterator

    // one flat walk, memoized — the chained-iterator form allocated an
    // Iterator per node per selector pass
    private lazy val descendantSeq: Seq[Node] = {
      val out = ArrayBuffer.empty[Node]
      def walk(n: Node): Unit = n.children.foreach { c => out += c; walk(c) }
      walk(this)
      out.toSeq
    }

    /** CSS-ish: descendants with this tag carrying ALL class tokens. */
    def select(tag: String, classTokens: String*): Seq[Node] = {
      val want = classTokens.toSet
      descendantSeq.filter(n =>
        (tag == "*" || n.tag == tag) && want.subsetOf(n.classTokens))
    }

    def selectOne(tag: String, classTokens: String*): Option[Node] =
      select(tag, classTokens: _*).headOption

    /** Descendants with an attribute equal to a value. */
    def selectByAttr(tag: String, attr: String, value: String): Seq[Node] =
      descendantSeq.filter(n =>
        (tag == "*" || n.tag == tag) && n.attrs.get(attr).contains(value))
  }

  private val wsRun = java.util.regex.Pattern.compile("\\s+")

  private val voidTags = Set("img", "br", "hr", "meta", "input", "link",
    "area", "base", "col", "embed", "source", "track", "wbr")

  private val tagRe =
    """(?s)<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9-]*)((?:[^>"']|"[^"]*"|'[^']*')*?)\s*(/?)\s*>""".r
  // quoted, unquoted, or bare (valueless) attributes — real-world pages
  // mix all three; BeautifulSoup accepts them all (kilid_transformer.py
  // parses live markup, not a fixture grammar)
  private val attrRe =
    """([a-zA-Z_:][-a-zA-Z0-9_:.]*)(?:\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"'`=]+)))?""".r

  private def indexOfIgnoreCase(s: String, target: String, from: Int): Int = {
    var i = math.max(from, 0)
    val n = s.length - target.length
    while (i <= n) {
      if (s.regionMatches(true, i, target, 0, target.length)) return i
      i += 1
    }
    -1
  }

  def parse(html: String): Node = {
    val root = new Node("#root", Map.empty)
    if (html == null) return root
    var cur = root
    var last = 0
    for (m <- tagRe.findAllMatchIn(html)) {
      // matches inside a skipped script/style region: the cursor has
      // already advanced past them
      if (m.start < last) { /* skip */ }
      else {
      val between = html.substring(last, m.start)
      if (between.trim.nonEmpty) {
        cur.texts += between
        cur.orderedBuf += Left(decode(between))
      }
      last = m.end
      val closing = m.group(1) == "/"
      val tag = m.group(2).toLowerCase
      val selfClose = m.group(4) == "/" || voidTags(tag)
      if (tag == "script" || tag == "style") {
        // skip to the closing tag, ignore contents (case-insensitive
        // search without copying the page — a toLowerCase per script
        // tag would be quadratic on script-heavy pages)
        if (!closing) {
          val end = indexOfIgnoreCase(html, s"</$tag", m.end)
          if (end >= 0) {
            val close = html.indexOf('>', end)
            last = if (close >= 0) close + 1 else html.length
          } else last = html.length
        }
      } else if (closing) {
        // pop to the matching open tag if present
        var p = cur
        while (p != root && p.tag != tag) p = p.parent
        if (p != root) cur = p.parent
      } else {
        val attrs = attrRe.findAllMatchIn(m.group(3)).map { am =>
          val v = Seq(am.group(2), am.group(3), am.group(4))
            .find(_ != null).getOrElse("") // bare attribute → empty value
          am.group(1).toLowerCase -> decode(v)
        }.toMap
        val node = new Node(tag, attrs)
        node.parent = cur
        cur.children += node
        cur.orderedBuf += Right(node)
        if (!selfClose) cur = node
      }
      }
    }
    val tail = html.substring(last)
    if (tail.trim.nonEmpty) {
      cur.texts += tail
      cur.orderedBuf += Left(decode(tail))
    }
    root
  }

  private def decode(s: String): String =
    s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
}
