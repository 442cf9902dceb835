package htmlspark.extract

import org.scalatest.funsuite.AnyFunSuite
import htmlspark.tree.{DomNode, HtmlParser}

/** Adversarial nesting depth: a crawled page can nest elements far deeper
  * than any sane document (the generator's pathological class stops at 2k;
  * real abuse does not). Parse, extraction, and the conformance dump must
  * all be recursion-free — this pins the explicit-stack walks at 100k
  * depth, which would overflow any per-node recursion. */
class DeepNestingSpec extends AnyFunSuite {

  private def deepDoc(depth: Int, tag: String): String = {
    val sb = new java.lang.StringBuilder(depth * (tag.length + 2) + 64)
    sb.append("<!DOCTYPE html>")
    var i = 0
    while (i < depth) { sb.append('<').append(tag).append('>'); i += 1 }
    sb.append("payload text")
    sb.toString // no closers — EOF pops the whole stack
  }

  test("100k nested divs: parse + extract survive") {
    val result = HtmlParser.parse(deepDoc(100000, "div"))
    val text = TextExtractor.extract(result.doc)
    assert(text == "payload text")
  }

  test("5k-deep dump survives (output is O(depth²) from indentation)") {
    val result = HtmlParser.parse(deepDoc(5000, "div"))
    val dump = DomNode.dump(result.doc)
    assert(dump.contains("payload text"))
    assert("<div>".r.findAllIn(dump).size == 5000)
  }

  test("deep span nesting (non-block, AFE-exempt) extracts flat text") {
    val result = HtmlParser.parse(deepDoc(50000, "span"))
    assert(TextExtractor.extract(result.doc) == "payload text")
  }
}
