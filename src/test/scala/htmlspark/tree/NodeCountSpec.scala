package htmlspark.tree

import org.scalatest.funsuite.AnyFunSuite
import htmlspark.pipeline.{PagesGen, ParseJob}

/** Pins the n_nodes structural metric: the engine's element count must
  * match the template-derived model for every generator class — including
  * the synthesized (implied tbody) and cloned (AFE reconstruction)
  * elements the model accounts for explicitly. */
class NodeCountSpec extends AnyFunSuite {

  test("element counts match the template model across all classes") {
    val engine = new HtmlParser.Engine
    (0L until 600L).foreach { i =>
      val d = ParseJob.parsePage(PagesGen.page(i), engine)
      assert(d.n_nodes.toLong == PagesGen.expectedNodeCountFor(i),
        s"doc $i: engine ${d.n_nodes} vs model ${PagesGen.expectedNodeCountFor(i)}")
    }
  }

  test("counter includes template content fragments") {
    val r = HtmlParser.parse("<template><p>x</p></template>")
    // html, head, template, p, body
    assert(DomNode.countElements(r.doc) == 5)
  }

  test("counter agrees with the dump's element lines on random soup") {
    // independent derivation: an element is exactly a dump line whose
    // payload starts with '<' but is not a comment/doctype line
    val rng = new scala.util.Random(20260817L)
    val bits = Array("<div>", "</div>", "<template>", "</template>", "<p>",
      "<table>", "<tr>", "<td>", "</table>", "<svg>", "<circle/>", "</svg>",
      "text ", "<b>", "</b>", "<!--c-->", "&amp;", "<li>", "<select>",
      "<option>", "</select>", "<math>", "<mi>", "</math>")
    (0 until 200).foreach { _ =>
      val html = (0 until rng.nextInt(40)).map(_ => bits(rng.nextInt(bits.length))).mkString
      val doc = HtmlParser.parse(html).doc
      val fromDump = DomNode.dump(doc).linesIterator.count { l =>
        val t = l.dropWhile(c => c == '|' || c == ' ')
        t.startsWith("<") && !t.startsWith("<!--") && !t.startsWith("<!DOCTYPE")
      }
      assert(DomNode.countElements(doc) == fromDump, s"soup: $html")
    }
  }
}
