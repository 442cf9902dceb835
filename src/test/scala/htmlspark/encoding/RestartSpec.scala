package htmlspark.encoding

import org.scalatest.funsuite.AnyFunSuite
import htmlspark.pipeline.{Page, ParseJob}

/** The bounded meta-charset restart (SURVEY.md §2.4): a charset declared
  * AFTER the 1024-byte prescan window must trigger exactly one re-decode +
  * re-parse (the reference suspends mid-parse instead:
  * Core/Tokenizer.cs:2056-2059). */
class RestartSpec extends AnyFunSuite {

  private def page(bytes: Array[Byte]) =
    Page("u", new java.sql.Timestamp(0), bytes, "", "")

  test("late meta agreeing with the windows-1252 default: no restart, " +
       "boundary metric fires, bytes decode clean") {
    val pad = "<!-- " + ("x" * 1500) + " -->"
    val html = s"<!DOCTYPE html><html><head>$pad" +
      "<meta charset=windows-1252><title>T</title></head>" +
      "<body><p>café €</p></body></html>"
    val bytes = html.getBytes(java.nio.charset.Charset.forName("windows-1252"))
    val d = ParseJob.parsePage(page(bytes))
    assert(!d.restarted, "default sniff already landed on windows-1252")
    assert(d.late_meta, "the meta passed the prescan boundary")
    assert(d.charset == "windows-1252")
    assert(d.charset_source == "default")
    assert(d.text_extracted.contains("café €"))
  }

  test("late CONTRADICTING meta (ascii bytes → utf-8 default, declared " +
       "windows-1252) triggers exactly one restart") {
    val pad = "<!-- " + ("x" * 1500) + " -->"
    val html = s"<!DOCTYPE html><html><head>$pad" +
      "<meta charset=windows-1252><title>T</title></head>" +
      "<body><p>plain ascii body</p></body></html>"
    val d = ParseJob.parsePage(page(html.getBytes("US-ASCII")))
    assert(d.restarted, "expected a restart")
    assert(d.late_meta, "restart implies the meta passed the boundary")
    assert(d.charset == "windows-1252")
    assert(d.charset_source == "meta-in-parse")
    assert(d.text_extracted.contains("plain ascii body"))
  }

  test("early meta charset is caught by prescan, no restart") {
    val html = "<!DOCTYPE html><html><head><meta charset=windows-1252>" +
      "</head><body><p>café</p></body></html>"
    val bytes = html.getBytes(java.nio.charset.Charset.forName("windows-1252"))
    val d = ParseJob.parsePage(page(bytes))
    assert(!d.restarted)
    assert(!d.late_meta, "prescan saw the meta → not late")
    assert(d.charset_source == "meta-prescan")
    assert(d.text_extracted.contains("café"))
  }

  test("utf-8 default needs no restart when meta agrees — but the meta " +
       "boundary metric still fires (reference NotifyAboutMetaBoundary)") {
    val pad = "<!-- " + ("x" * 1500) + " -->"
    val html = s"<!DOCTYPE html><html><head>$pad<meta charset=utf-8>" +
      "</head><body><p>ok</p></body></html>"
    val d = ParseJob.parsePage(page(html.getBytes("UTF-8")))
    assert(!d.restarted)
    assert(d.late_meta, "meta beyond the prescan window → boundary metric")
    assert(d.charset_source == "default")
  }

  test("no meta at all → no boundary flag") {
    val html = "<!DOCTYPE html><html><head><title>T</title></head>" +
      "<body><p>plain</p></body></html>"
    val d = ParseJob.parsePage(page(html.getBytes("UTF-8")))
    assert(!d.late_meta && !d.restarted)
  }

  test("contradicting meta beyond the walk budget does not force a re-parse") {
    val sb = new StringBuilder("<!DOCTYPE html><html><head><title>T</title></head><body>")
    var i = 0
    while (i < 2000) { sb.append("<div><span>x</span></div>"); i += 1 }
    sb.append("<meta charset=windows-1252></body></html>")
    val d = ParseJob.parsePage(page(sb.toString.getBytes("UTF-8")))
    assert(!d.restarted, "deep stray meta must not trigger a full re-decode")
    assert(d.charset == "UTF-8")
  }

  test("bom wins over any meta") {
    val html = "<html><head><meta charset=windows-1252></head><body>café</body></html>"
    val raw = html.getBytes("UTF-8")
    val bytes = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ raw
    val d = ParseJob.parsePage(page(bytes))
    assert(d.charset == "UTF-8" && d.charset_source == "bom" && !d.restarted)
    assert(d.text_extracted.contains("café"))
  }
}
