package htmlspark.encoding

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the sniffer edges the pipeline classes don't reach:
  * UTF-16BE BOM routing, label normalization aliases, and the in-document
  * utf-16 lie rule. */
class EncodingSnifferSpec extends AnyFunSuite {

  test("UTF-16BE BOM wins over any meta") {
    val html = "<meta charset=windows-1252><p>é</p>"
    val raw = html.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
    val out = new Array[Byte](raw.length + 2)
    out(0) = 0xFE.toByte; out(1) = 0xFF.toByte
    System.arraycopy(raw, 0, out, 2, raw.length)
    val s = EncodingSniffer.sniff(out)
    assert(s.charset == "UTF-16BE" && s.source == EncodingSniffer.SourceBom)
    assert(EncodingSniffer.decode(out, s).contains("é"))
  }

  test("label aliases normalize per the WHATWG registry subset") {
    val cases = Seq(
      "  LATIN1 " -> "windows-1252",
      "Iso-8859-1" -> "windows-1252",
      "ascii" -> "windows-1252",
      "UTF8" -> "UTF-8",
      "ShIfT_JiS" -> "Shift_JIS",
      "gb2312" -> "GBK",
      "big5-hkscs" -> "Big5",
      "no-such-charset" -> null)
    cases.foreach { case (in, want) =>
      assert(EncodingSniffer.normalizeLabel(in) == want, s"label $in")
    }
  }

  test("in-document utf-16 declarations are treated as utf-8 (spec lie rule)") {
    Seq("utf-16", "UTF-16LE", "utf-16be").foreach { l =>
      assert(EncodingSniffer.normalizeLabel(l) == "UTF-8")
    }
  }

  test("prescan finds charset only inside the 1024-byte window") {
    val pad = "<!-- " + ("x" * 1100) + " -->"
    val late = (pad + "<meta charset=windows-1252>")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val s = EncodingSniffer.sniff(late)
    assert(s.charset != "windows-1252", "meta beyond window must not apply")
    val early = "<meta charset=windows-1252><p>x</p>"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    assert(EncodingSniffer.sniff(early).charset == "windows-1252")
  }
}
