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

  test("late meta charset triggers one restart and correct decoding") {
    val pad = "<!-- " + ("x" * 1500) + " -->"
    val html = s"<!DOCTYPE html><html><head>$pad" +
      "<meta charset=windows-1252><title>T</title></head>" +
      "<body><p>café €</p></body></html>"
    val bytes = html.getBytes(java.nio.charset.Charset.forName("windows-1252"))
    val d = ParseJob.parsePage(page(bytes))
    assert(d.restarted, "expected a restart")
    assert(d.charset == "windows-1252")
    assert(d.charset_source == "meta-in-parse")
    assert(d.text_extracted.contains("café €"))
  }

  test("early meta charset is caught by prescan, no restart") {
    val html = "<!DOCTYPE html><html><head><meta charset=windows-1252>" +
      "</head><body><p>café</p></body></html>"
    val bytes = html.getBytes(java.nio.charset.Charset.forName("windows-1252"))
    val d = ParseJob.parsePage(page(bytes))
    assert(!d.restarted)
    assert(d.charset_source == "meta-prescan")
    assert(d.text_extracted.contains("café"))
  }

  test("utf-8 default needs no restart when meta agrees") {
    val pad = "<!-- " + ("x" * 1500) + " -->"
    val html = s"<!DOCTYPE html><html><head>$pad<meta charset=utf-8>" +
      "</head><body><p>ok</p></body></html>"
    val d = ParseJob.parsePage(page(html.getBytes("UTF-8")))
    assert(!d.restarted)
    assert(d.charset_source == "default")
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
