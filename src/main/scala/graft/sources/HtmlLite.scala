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

    def classTokens: Set[String] =
      attrs.getOrElse("class", "").split("\\s+").filter(_.nonEmpty).toSet

    /** All text beneath this node, in document order, single-spaced. */
    def text: String = {
      val sb = new StringBuilder
      def walk(n: Node): Unit = {
        var ti = 0
        var ci = 0
        // texts and children were appended in order; interleave by index
        n.ordered.foreach {
          case Left(t) => sb.append(t).append(' ')
          case Right(c) => walk(c)
        }
      }
      walk(this)
      sb.toString.replaceAll("\\s+", " ").trim
    }

    private[HtmlLite] val orderedBuf = ArrayBuffer.empty[Either[String, Node]]
    def ordered: Seq[Either[String, Node]] = orderedBuf.toSeq

    def descendants: Iterator[Node] =
      children.iterator.flatMap(c => Iterator(c) ++ c.descendants)

    /** CSS-ish: descendants with this tag carrying ALL class tokens. */
    def select(tag: String, classTokens: String*): Seq[Node] = {
      val want = classTokens.toSet
      descendants.filter(n =>
        (tag == "*" || n.tag == tag) && want.subsetOf(n.classTokens)).toSeq
    }

    def selectOne(tag: String, classTokens: String*): Option[Node] =
      select(tag, classTokens: _*).headOption

    /** Descendants with an attribute equal to a value. */
    def selectByAttr(tag: String, attr: String, value: String): Seq[Node] =
      descendants.filter(n =>
        (tag == "*" || n.tag == tag) && n.attrs.get(attr).contains(value)).toSeq
  }

  private val voidTags = Set("img", "br", "hr", "meta", "input", "link",
    "area", "base", "col", "embed", "source", "track", "wbr")

  private val tagRe =
    """(?s)<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9-]*)((?:[^>"']|"[^"]*"|'[^']*')*?)\s*(/?)\s*>""".r
  private val attrRe =
    """([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*(?:"([^"]*)"|'([^']*)')""".r

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
        // skip to the closing tag, ignore contents
        if (!closing) {
          val end = html.toLowerCase.indexOf(s"</$tag", m.end)
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
          am.group(1).toLowerCase -> decode(Option(am.group(2)).getOrElse(am.group(3)))
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
