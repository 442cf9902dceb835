package htmlspark.extract

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import htmlspark.tree.{Dom, DomNode, HtmlParser}

/** Differential check of the frozen extraction rule (FIXTURES.md §3
  * mitigation): an INDEPENDENT two-pass implementation (naive tree walk +
  * separate normalization pass) must agree byte-for-byte with the live
  * single-pass streaming Writer on arbitrary parsed documents. The second
  * implementation exists only here — the production path stays single.
  */
class ExtractorDifferentialSpec extends AnyFunSuite {

  private def forAllN[T](gen: Gen[T], n: Int)(f: T => Unit): Unit = {
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default.withSize(40), Seed(i.toLong)).foreach { v =>
        try f(v)
        catch { case e: Throwable =>
          fail(s"failing input (seed=$i): ${v.toString.take(300)}", e) }
      }
      i += 1
    }
  }

  // --- independent re-implementation of the frozen rule (two passes) ---
  private def walk(n: DomNode, sb: java.lang.StringBuilder): Unit = {
    n.kind match {
      case Dom.TEXT => sb.append(n.text)
      case Dom.ELEMENT =>
        if (n.ns == Dom.NS_HTML &&
            (n.name == "script" || n.name == "style" || n.name == "template"))
          return
        if (n.children != null) {
          var i = 0
          while (i < n.children.length) { walk(n.children(i), sb); i += 1 }
        }
        if (n.ns == Dom.NS_HTML && TextExtractor.BlockClose.contains(n.name))
          sb.append('\n')
      case Dom.DOCUMENT =>
        if (n.children != null) {
          var i = 0
          while (i < n.children.length) { walk(n.children(i), sb); i += 1 }
        }
      case _ =>
    }
  }

  private def normalize(sb: java.lang.StringBuilder): String = {
    val out = new java.lang.StringBuilder(sb.length)
    var nlRun = 0
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (c == '\n') {
        nlRun += 1
        if (nlRun <= 2 && out.length > 0) out.append('\n')
      } else { nlRun = 0; out.append(c) }
      i += 1
    }
    var end = out.length
    while (end > 0 && out.charAt(end - 1) == '\n') end -= 1
    out.substring(0, end)
  }

  private def oracle(doc: DomNode): String = {
    val sb = new java.lang.StringBuilder
    walk(doc, sb)
    normalize(sb)
  }

  // --- generators: html-ish soup biased toward extraction-sensitive shapes ---
  private val tagGen = Gen.oneOf(Seq("div", "p", "span", "b", "i", "table",
    "tr", "td", "li", "ul", "pre", "script", "style", "template", "h1",
    "svg", "math", "select", "option", "textarea", "br", "form", "caption"))
  private val wordGen = Gen.oneOf(Seq("alpha", "beta \n", "x<y", "&amp;",
    "&notit;", " ", "\n\n", "café", "a&b", "line\r\n"))

  private val fragmentGen: Gen[String] = Gen.listOfN(24,
    Gen.frequency(
      5 -> wordGen,
      3 -> tagGen.map(t => s"<$t>"),
      2 -> tagGen.map(t => s"</$t>"),
      1 -> Gen.const("<!--c-->"),
      1 -> Gen.const("<!DOCTYPE html>")
    )).map(_.mkString)

  test("streaming Writer == independent two-pass extractor on random soup") {
    forAllN(fragmentGen, 500) { html =>
      val doc = HtmlParser.parse(html).doc
      assert(TextExtractor.extract(doc) == oracle(doc), html.take(200))
    }
  }

  test("agreement on the generator corpus (all document classes)") {
    (0L until 600L).foreach { i =>
      val html = new String(htmlspark.pipeline.PagesGen.renderHtml(i),
        java.nio.charset.StandardCharsets.UTF_8)
      val doc = HtmlParser.parse(html).doc
      assert(TextExtractor.extract(doc) == oracle(doc), s"doc $i diverged")
    }
  }
}
