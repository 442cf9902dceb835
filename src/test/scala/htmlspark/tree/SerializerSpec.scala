package htmlspark.tree

import org.scalatest.funsuite.AnyFunSuite

/** The WHATWG fragment-serialization algorithm + the §5.2 reparse-stability
  * property: for any tree free of the spec-acknowledged hazards,
  * dump(parse(serialize(doc))) == dump(doc). */
class SerializerSpec extends AnyFunSuite {

  private def ser(html: String): String =
    HtmlSerializer.serialize(HtmlParser.parse(html).doc)

  test("escaping: text escapes & < > nbsp; attributes escape & \" nbsp") {
    assert(ser("<p a='x\"y'>1 &lt; 2 &amp; 3</p>") ==
      "<html><head></head><body><p a=\"x&quot;y\">1 &lt; 2 &amp; 3</p></body></html>")
    assert(ser("<p>a b</p>").contains("a&nbsp;b"))
  }

  test("void elements get no end tag; rawtext content stays raw") {
    assert(ser("<br><img src=x><hr>") ==
      "<html><head></head><body><br><img src=\"x\"><hr></body></html>")
    assert(ser("<style>p > q { }</style>").contains("<style>p > q { }</style>"))
    assert(ser("<script>1 < 2 && x</script>")
      .contains("<script>1 < 2 && x</script>"))
  }

  test("pre/textarea re-add a LF only when the stored text starts with one") {
    // parser already dropped the markup's first LF — "keep" has no LF, so
    // serializing without one is the STABLE form
    assert(ser("<pre>\nkeep</pre>").contains("<pre>keep</pre>"))
    // two LFs: parser keeps the second ("\nx"); the serializer must
    // re-add a guard LF or reparse would eat the real one
    assert(ser("<pre>\n\nx</pre>").contains("<pre>\n\nx</pre>"))
    assert(ser("<textarea>\n\ny</textarea>").contains("<textarea>\n\ny</textarea>"))
  }

  test("template serializes its contents; foreign attrs requalify") {
    assert(ser("<template><p>x</p></template>")
      .contains("<template><p>x</p></template>"))
    val svg = ser("<svg xlink:href=a xml:lang=b xmlns=c><foreignObject/></svg>")
    assert(svg.contains("xlink:href=\"a\""), svg)
    assert(svg.contains("xml:lang=\"b\""))
    assert(svg.contains("xmlns=\"c\""))
    assert(svg.contains("<foreignObject></foreignObject>"))
  }

  test("element-root fragments: escaped text, template contents, pre guard") {
    def find(root: DomNode, name: String): DomNode = {
      var found: DomNode = null
      var stack: List[DomNode] = root :: Nil
      while (found == null && stack.nonEmpty) {
        val n = stack.head; stack = stack.tail
        if (n.kind == Dom.ELEMENT && n.name == name) found = n
        else {
          if (n.kind == Dom.ELEMENT && n.contentFragment != null)
            stack = n.contentFragment :: stack
          if (n.children != null) stack = n.children.toList ::: stack
        }
      }
      found
    }
    val doc1 = HtmlParser.parse("<div>1 < 2 & x</div>").doc
    assert(HtmlSerializer.serialize(find(doc1, "div")) == "1 &lt; 2 &amp; x")
    val doc2 = HtmlParser.parse("<template><p>t</p></template>").doc
    assert(HtmlSerializer.serialize(find(doc2, "template")) == "<p>t</p>")
    val doc3 = HtmlParser.parse("<pre>\n\nx</pre>").doc
    assert(HtmlSerializer.serialize(find(doc3, "pre")) == "\n\nx")
    val doc4 = HtmlParser.parse("<script>a<b</script>").doc
    assert(HtmlSerializer.serialize(find(doc4, "script")) == "a<b")
  }

  test("roundTrips flags doctype ids containing a double quote") {
    val d = HtmlParser.parse("<!DOCTYPE html PUBLIC '-//x\"y//'><p>a").doc
    assert(!HtmlSerializer.roundTrips(d))
  }

  test("doctype keeps public/system ids (quirks survive the round trip)") {
    val html = "<!DOCTYPE HTML PUBLIC \"-//W3C//DTD HTML 3.2 Final//EN\"><p>x"
    val s = ser(html)
    assert(s.startsWith("<!DOCTYPE html PUBLIC \"-//W3C//DTD HTML 3.2 Final//EN\">"), s)
    val r1 = HtmlParser.parse(html)
    val r2 = HtmlParser.parse(s)
    assert(r1.quirksMode == r2.quirksMode)
  }

  test("reparse stability on random soup (hazard-free trees)") {
    val rng = new scala.util.Random(424242L)
    val bits = Array("<div>", "</div>", "<template>", "</template>", "<p>",
      "<table>", "<tr>", "<td>", "</table>", "<svg>", "<circle/>", "</svg>",
      "text ", "<b>", "</b>", "<!--c-->", "&amp;", "<li>", "<select>",
      "<option>", "</select>", "<math>", "<mi>", "</math>", "<a href=x>",
      "</a>", "<pre>", "\n", "</pre>", "<ruby>", "<rt>", "&lt;", " x=1>",
      "<caption>", "<input>", "<span a='q\"r'>", "</span>")
    var checked = 0
    (0 until 400).foreach { k =>
      val html = (0 until rng.nextInt(40)).map(_ => bits(rng.nextInt(bits.length))).mkString
      val d1 = HtmlParser.parse(html).doc
      if (HtmlSerializer.roundTrips(d1)) {
        checked += 1
        val d2 = HtmlParser.parse(HtmlSerializer.serialize(d1)).doc
        assert(DomNode.dump(d2) == DomNode.dump(d1),
          s"soup: $html\nserialized: ${HtmlSerializer.serialize(d1)}")
      }
    }
    assert(checked > 250, s"only $checked/400 soups were hazard-free")
  }

  test("reparse stability across every authored tree-construction vector") {
    // blanket sweep: the 477-vector corpus is exactly the adversarial
    // input set — every hazard-free tree it produces must round-trip
    val dir = new java.io.File("src/test/resources/tree-construction")
    var checked = 0
    for (f <- dir.listFiles().filter(_.getName.endsWith(".dat"))) {
      val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toVector
      var i = 0
      while (i < lines.length) {
        if (lines(i) == "#data") {
          val data = new StringBuilder
          i += 1
          var first = true
          while (i < lines.length && !lines(i).startsWith("#")) {
            if (!first) data.append('\n')
            data.append(lines(i)); first = false; i += 1
          }
          // skip fragment cases (serialization context differs)
          var isFragment = false
          var j = i
          while (j < lines.length && lines(j) != "#data" && !isFragment) {
            if (lines(j) == "#document-fragment") isFragment = true
            j += 1
          }
          if (!isFragment) {
            val d1 = HtmlParser.parse(data.toString).doc
            if (HtmlSerializer.roundTrips(d1)) {
              checked += 1
              val d2 = HtmlParser.parse(HtmlSerializer.serialize(d1)).doc
              assert(DomNode.dump(d2) == DomNode.dump(d1),
                s"${f.getName}: ${data.toString.take(60)}")
            }
          }
        } else i += 1
      }
    }
    assert(checked > 200, s"only $checked vector trees were hazard-free")
  }

  test("reparse stability across the generator corpus") {
    val engine = new HtmlParser.Engine
    var checked = 0
    (0L until 400L).foreach { i =>
      val p = htmlspark.pipeline.PagesGen.page(i)
      val sniff = htmlspark.encoding.EncodingSniffer.sniff(p.html)
      val d1 = engine.parse(htmlspark.encoding.EncodingSniffer.decode(p.html, sniff)).doc
      if (HtmlSerializer.roundTrips(d1)) {
        checked += 1
        val d2 = HtmlParser.parse(HtmlSerializer.serialize(d1)).doc
        assert(DomNode.dump(d2) == DomNode.dump(d1), s"doc $i")
      }
    }
    // script-class docs (rawtext containing </script>) are the only
    // expected hazards — everything else must round-trip
    assert(checked > 300, s"only $checked/400 generator docs hazard-free")
  }
}
