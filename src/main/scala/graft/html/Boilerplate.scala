package graft.html

import graft.html.HtmlDom.{ElementNode, Node, TextNode}
import graft.text.GoStrings

/** Main-content extraction from raw HTML (the north rule's "HTML
  * boilerplate strip ... DOM heuristics (tag/text-density scoring,
  * link-density pruning)").
  *
  * The algorithm is deterministic and self-contained (in the spirit of
  * Boilerpipe/jusText, from the published descriptions, not their code):
  *
  *  1. Parse the DOM; DROP subtrees rooted at non-content tags:
  *     script, style, noscript, template, iframe, svg, canvas, form,
  *     button, select, option, nav, footer, aside.
  *  2. Segment the remaining tree into BLOCKS: a block ends at each
  *     block-level element boundary (p, div, section, article, main,
  *     h1-h6, li, ul, ol, table, tr, td, th, blockquote, pre, br, ...).
  *     Inline elements (a, span, b, i, em, strong, ...) do not split.
  *  3. Per block compute: textLen (codepoints after whitespace collapse),
  *     linkLen (codepoints contributed inside <a>), tagCount (inline
  *     elements spanned), and the densities
  *       textDensity = textLen / (1 + tagCount)
  *       linkDensity = linkLen / textLen.
  *  4. KEEP a block iff
  *       - heading (h1-h6 ancestor): textLen >= 3 and linkDensity == 0
  *       - list item (li ancestor):  textLen >= 30 and linkDensity <= 0.2
  *       - otherwise:                textLen >= 25 and linkDensity <= 1/3
  *                                   and textDensity >= 8.
  *  5. Output = kept blocks joined with "\n".
  *
  * Thresholds are part of this engine's pinned semantics (golden tests).
  */
object Boilerplate {

  // NOTE: <header> is intentionally NOT dropped — it typically holds the
  // article h1; its boilerplate content (nav, logo links) is removed by
  // the nav drop and the link-density rule instead.
  private val dropTags = Set(
    "script", "style", "noscript", "template", "iframe", "svg", "canvas",
    "form", "button", "select", "option", "nav", "footer", "aside")

  private val blockTags = Set(
    "p", "div", "section", "article", "main", "body", "html",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "ul", "ol", "li", "dl", "dt", "dd",
    "table", "thead", "tbody", "tr", "td", "th",
    "blockquote", "pre", "figure", "figcaption", "hr", "br",
    "address", "fieldset", "legend")

  private val headingTags = Set("h1", "h2", "h3", "h4", "h5", "h6")

  private final class Block {
    val text = new StringBuilder
    var linkLen = 0
    var tagCount = 0
    var heading = false
    var listItem = false
    def textLen: Int = collapsed.codePointCount(0, collapsed.length)
    private var collapsedCache: String = null
    def collapsed: String = {
      if (collapsedCache == null) collapsedCache = collapseWs(text.toString)
      collapsedCache
    }
  }

  /** Collapse whitespace runs to single spaces and trim (Go-space class). */
  private def collapseWs(s: String): String = {
    val sb = new StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (GoStrings.isSpace(c)) pendingSpace = true
      else {
        if (pendingSpace && sb.nonEmpty) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Extract main content text from raw HTML. */
  def extractMainText(html: String): String = {
    val dom = HtmlDom.parse(html)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
    var cur = new Block

    def flush(): Unit = {
      if (cur.collapsed.nonEmpty) blocks += cur
      cur = new Block
    }

    def walk(n: Node, inLink: Boolean, inHeading: Boolean, inLi: Boolean): Unit = {
      n.nodeType match {
        case TextNode =>
          val t = n.data
          cur.text.append(t)
          if (inLink) {
            val cw = collapseWs(t)
            cur.linkLen += cw.codePointCount(0, cw.length)
          }
          if (inHeading) cur.heading = true
          if (inLi) cur.listItem = true
        case ElementNode =>
          val tag = n.data
          if (dropTags.contains(tag)) return
          val isBlock = blockTags.contains(tag)
          if (isBlock) flush()
          else cur.tagCount += 1
          val link = inLink || tag == "a"
          val heading = inHeading || headingTags.contains(tag)
          val li = inLi || tag == "li"
          n.children.foreach(c => walk(c, link, heading, li))
          if (isBlock) flush()
        case _ =>
          n.children.foreach(c => walk(c, inLink, inHeading, inLi))
      }
    }
    walk(dom, inLink = false, inHeading = false, inLi = false)
    flush()

    val kept = blocks.filter { b =>
      val len = b.textLen
      if (len == 0) false
      else {
        val linkDensity = b.linkLen.toDouble / len
        val textDensity = len.toDouble / (1 + b.tagCount)
        if (b.heading) len >= 3 && b.linkLen == 0
        else if (b.listItem) len >= 30 && linkDensity <= 0.2
        else len >= 25 && linkDensity <= (1.0 / 3.0) && textDensity >= 8.0
      }
    }
    kept.map(_.collapsed).mkString("\n")
  }
}
