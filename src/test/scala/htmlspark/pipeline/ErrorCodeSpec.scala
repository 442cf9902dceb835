package htmlspark.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Pins the per-doc parse-error-code channel (ExtractedDoc.error_codes):
  * the code VOCABULARY is engine-defined, but its per-class occurrence is
  * a frozen contract — the p14/p15 driver oracles and any downstream
  * triage query depend on these strings staying stable. */
class ErrorCodeSpec extends AnyFunSuite {

  test("per-class error codes match the template model for every doc class") {
    val engine = new htmlspark.tree.HtmlParser.Engine
    // 600 indices cover every document class (and every charset subclass)
    // multiple times; codes are sorted at parse time, the model is sorted
    // by construction.
    (0L until 600L).foreach { i =>
      val d = ParseJob.parsePage(PagesGen.page(i), engine)
      assert(d.error_codes.mkString(",") == PagesGen.expectedErrorCodesFor(i),
        s"doc $i: got ${d.error_codes.mkString(",")}")
    }
  }

  test("obsolete doctype is a parse error; html5 forms are not") {
    import htmlspark.tree.HtmlParser
    def codes(html: String): Seq[String] =
      HtmlParser.parse(html).errorCodes.sorted
    assert(codes("<!DOCTYPE html><p>x</p>") == Nil)
    assert(codes("<!DOCTYPE html SYSTEM \"about:legacy-compat\"><p>x</p>") == Nil)
    // case-SENSITIVE per the spec's default string-comparison rule
    assert(codes("<!DOCTYPE html SYSTEM \"ABOUT:LEGACY-COMPAT\"><p>x</p>")
      .contains("obsolete-doctype"))
    assert(codes("<!DOCTYPE HTML PUBLIC \"-//W3C//DTD HTML 4.01//EN\" " +
      "\"http://www.w3.org/TR/html4/strict.dtd\"><p>x</p>")
      .contains("obsolete-doctype"))
    assert(codes("<!DOCTYPE html SYSTEM \"foo\"><p>x</p>")
      .contains("obsolete-doctype"))
  }

  test("targeted call sites emit their frozen codes") {
    import htmlspark.tree.HtmlParser
    def codes(html: String): Seq[String] =
      HtmlParser.parse(html).errorCodes.sorted
    // beyond the generator classes: one pin per err() family a triage
    // query would group by (vocabulary freeze — see FIXTURES.md)
    assert(codes("<table><colgroup>x</table>") == Seq("non-ws-chars-in-table"))
    assert(codes("<head></head><head>") == Seq("nested-head"))
    assert(codes("<body></body><div>x") == Seq("start-after-body"))
    assert(codes("<template><div>") == Seq("eof-in-template"))
    assert(codes("<table><tbody><td>x") == Seq("cell-without-tr"))
    assert(codes("<form><form><input>") == Seq("nested-form"))
    assert(codes("<p>x<!DOCTYPE html>") == Seq("unexpected-doctype"))
    assert(codes("<body></body>x") == Seq("chars-after-body"))
    assert(codes("<frameset></frameset>x<frame>") ==
      Seq("chars-in-frameset", "unexpected-start-after-frameset"))
    assert(codes("<select><table>x") == Seq("unexpected-start-in-select"))
    assert(codes("<noscript>") == Seq("eof-in-head-noscript"))
  }

  test("null html parses as a clean empty doc with no codes") {
    val d = ParseJob.parsePage(Page("u", new java.sql.Timestamp(0L),
      null, "", ""))
    assert(d.parse_ok && d.error_codes.isEmpty)
  }
}
