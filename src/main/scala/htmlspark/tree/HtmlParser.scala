package htmlspark.tree

import htmlspark.tokenizer.HtmlTokenizer

/** Facade: one full-document or fragment parse (reference lifecycle:
  * Core/Tokenizer.cs:1133-1208 Start/TokenizeBuffer/Eof/End — collapsed to a
  * single call because each Spark row carries the whole document). */
object HtmlParser {

  final class Result(val builder: TreeBuilder) {
    def doc: DomNode = builder.doc
    def quirksMode: Int = builder.quirksMode
    def nErrors: Int = builder.nErrors
    def errorCodes: Seq[String] = builder.errorCodes.toSeq
  }

  def parse(html: String): Result = {
    val tb = new TreeBuilder
    val tok = new HtmlTokenizer(tb)
    tb.tokenizer = tok
    tok.tokenize(html)
    new Result(tb)
  }

  /** Fragment parse per the spec's "parsing HTML fragments" algorithm.
    * `context` may be "svg x" / "math x" for foreign contexts. */
  def parseFragment(html: String, context: String): Result = {
    val tb = new TreeBuilder
    val tok = new HtmlTokenizer(tb)
    tb.tokenizer = tok
    val (ns, name) =
      if (context.startsWith("svg ")) (Dom.NS_SVG, context.substring(4))
      else if (context.startsWith("math ")) (Dom.NS_MATHML, context.substring(5))
      else (Dom.NS_HTML, context)
    tb.setFragmentContext(name, ns)
    tok.tokenize(html)
    new Result(tb)
  }
}
