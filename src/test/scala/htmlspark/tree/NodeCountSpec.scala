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
}
