package htmlspark.extract

import htmlspark.tree.{Dom, DomNode}

/** The frozen extraction rule (FIXTURES.md §3) — the per-row invariant the
  * north rule grades byte-identically:
  *
  *   In-order DOM walk; emit text-node contents; skip `script`, `style`,
  *   `template` subtrees (incl. template content fragments); emit "\n" at
  *   the close of each block-level element (set below); collapse runs of
  *   >2 "\n" to exactly 2; strip leading/trailing "\n"; UTF-8 encode.
  *
  * The behaviors this is sensitive to live in the parser (text placement
  * under foster parenting / AFE reconstruction / adoption agency, CRLF and
  * NUL normalization, entity expansion, needToDropLF, RCDATA capture) —
  * SURVEY.md §2.6 maps each to the reference.
  */
object TextExtractor {

  /** Block-level close → newline. Frozen; do not extend without regenerating
    * every golden. */
  val BlockClose: Set[String] = Set(
    "address", "article", "aside", "blockquote", "body", "caption",
    "center", "dd", "details", "dialog", "dir", "div", "dl", "dt",
    "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2",
    "h3", "h4", "h5", "h6", "header", "hgroup", "hr", "li", "listing",
    "main", "menu", "nav", "ol", "p", "pre", "search", "section",
    "summary", "table", "tbody", "td", "tfoot", "th", "thead", "tr", "ul")

  private val Skip: Set[String] = Set("script", "style", "template")
  private val BlockCloseJ = {
    val h = new java.util.HashSet[String](128); BlockClose.foreach(h.add); h
  }
  private val SkipJ = {
    val h = new java.util.HashSet[String](8); Skip.foreach(h.add); h
  }

  def extract(doc: DomNode): String = {
    val out = new Writer(512)
    walkW(doc, out)
    out.result()
  }

  /** Stack-entry arrays grow geometrically; 64 covers non-adversarial docs
    * without growth. */
  private val InitialStack = 64

  /** Streaming writer that applies the normalization rule inline — no
    * intermediate buffer, no second pass. */
  private final class Writer(initial: Int) {
    private var a = new Array[Char](initial)
    private var w = 0
    private var nlRun = 0
    private def ensure(k: Int): Unit =
      if (w + k > a.length) {
        var cap = a.length * 2
        while (cap < w + k) cap *= 2
        a = java.util.Arrays.copyOf(a, cap)
      }
    def newline(): Unit = {
      nlRun += 1
      if (nlRun <= 2 && w > 0) { ensure(1); a(w) = '\n'; w += 1 }
    }
    def text(sb: java.lang.StringBuilder): Unit = {
      val n = sb.length
      if (n == 0) return
      ensure(n)
      var i = 0
      while (i < n) {
        val c = sb.charAt(i)
        if (c == '\n') {
          nlRun += 1
          if (nlRun <= 2 && w > 0) { a(w) = '\n'; w += 1 }
        } else {
          nlRun = 0
          a(w) = c; w += 1
        }
        i += 1
      }
    }
    def result(): String = {
      while (w > 0 && a(w - 1) == '\n') w -= 1
      new String(a, 0, w)
    }
  }

  /** In-order walk via an explicit resume-index stack, NOT recursion: a
    * crawled page can nest elements arbitrarily deep (adversarially or by
    * accident), and a recursive walk overflows the executor task thread's
    * ~1 MB stack around ~2k nesting. Text/comment leaves are handled inline
    * at child-visit time; only container nodes are pushed. */
  private def walkW(root: DomNode, out: Writer): Unit = {
    root.kind match {
      case Dom.TEXT => out.text(root.text); return
      case Dom.ELEMENT if root.ns == Dom.NS_HTML && SkipJ.contains(root.name) =>
        return
      case Dom.ELEMENT | Dom.DOCUMENT => // fall through to the loop
      case _ => return
    }
    var cap = InitialStack
    var nodes = new Array[DomNode](cap)
    var idx = new Array[Int](cap)
    var top = 0
    nodes(0) = root; idx(0) = 0
    while (top >= 0) {
      val n = nodes(top)
      val i = idx(top)
      val ch = n.children
      if (ch != null && i < ch.length) {
        idx(top) = i + 1
        val c = ch(i)
        c.kind match {
          case Dom.TEXT => out.text(c.text)
          case Dom.ELEMENT =>
            if (!(c.ns == Dom.NS_HTML && SkipJ.contains(c.name))) {
              top += 1
              if (top == cap) {
                cap *= 2
                nodes = java.util.Arrays.copyOf(nodes, cap)
                idx = java.util.Arrays.copyOf(idx, cap)
              }
              nodes(top) = c; idx(top) = 0
            }
          case _ => // comment / doctype: no text contribution
        }
      } else {
        if (n.kind == Dom.ELEMENT && n.ns == Dom.NS_HTML &&
            BlockCloseJ.contains(n.name)) out.newline()
        top -= 1
      }
    }
  }

}
