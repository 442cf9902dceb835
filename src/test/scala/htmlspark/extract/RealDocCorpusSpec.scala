package htmlspark.extract

import org.scalatest.funsuite.AnyFunSuite
import htmlspark.pipeline.{PagesGen, ParseJob, ExtractedDoc}

/** Three more REAL pages under golden pin (VERDICT r4 "What's missing #3"),
  * chosen for distinct charset/quirks-era profiles no synthetic class
  * reproduces, all redistributable public docs shipped by Debian:
  *
  *  - debian_users_groups.html — 1990s DocBook HTML: uppercase tags,
  *    attributes split across lines, an HTML 4.01 Transitional doctype
  *    whose public and system ids ABUT (no whitespace — the exact arm
  *    vector 16[20] pins), no charset declaration. → limited-quirks,
  *    utf-8 default.
  *  - zlib_how.html (2004/2005, Mark Adler) — declared ISO-8859-1 (a
  *    windows-1252 registry alias), HTML 4.0 Transitional → full QUIRKS,
  *    two literal `< ` in prose that must survive as text via the
  *    invalid-first-character-of-tag-name path.
  *  - underscore_index.html (underscorejs.org, MIT) — 174 KB modern page:
  *    `<!DOCTYPE HTML>` no-quirks, charset via http-equiv, multi-byte
  *    utf-8 content, `<%` template delimiters, and 41 `</p>`-after-`<pre>`
  *    closes exercising the p-end-not-in-scope recovery at scale.
  *
  * Golden md5/char/node/error values frozen from adjudicated engine output
  * (the RealDocSpec mold); the structural assertions are derived from the
  * SOURCE bytes independently of the parser.
  */
class RealDocCorpusSpec extends AnyFunSuite {

  private def load(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/realdoc/$name")
    try in.readAllBytes() finally in.close()
  }

  private def parse(name: String): ExtractedDoc =
    ParseJob.parsePage(PagesGen.page(0).copy(html = load(name)))

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("debian_users_groups: limited-quirks, utf-8 default, frozen golden") {
    val d = parse("debian_users_groups.html")
    assert(d.parse_ok && d.n_bytes == 19984)
    assert(d.quirks_mode == "limited-quirks",
      "4.01 Transitional WITH system id → limited-quirks")
    assert(d.charset == "UTF-8" && d.charset_source == "default")
    assert(!d.restarted && !d.late_meta)
    // the abutting public/system ids trip exactly the tokenizer arm that
    // vector 16_doctype_eof_truncations[19] pins, plus the obsolete-
    // doctype tree error — nothing else in 20 KB of DocBook output
    assert(d.error_codes ==
      Seq("missing-whitespace-between-doctype-public-and-system-identifiers",
        "obsolete-doctype"))
    assert(d.text_extracted.count(_ == '�') == 0)
    assert(d.n_chars == 14987 && d.n_nodes == 312)
    assert(md5(d.text_extracted) == "880de11070050d9996c242629b6b2bd8")
  }

  test("zlib_how: declared ISO-8859-1 legacy page in full quirks, frozen golden") {
    val d = parse("zlib_how.html")
    assert(d.parse_ok && d.n_bytes == 29824)
    assert(d.quirks_mode == "quirks", "HTML 4.0 Transitional → quirks")
    assert(d.charset == "windows-1252",
      "ISO-8859-1 is a windows-1252 registry alias")
    assert(d.charset_source == "meta-prescan")
    // two literal `< ` in the prose (counted from source bytes) must
    // survive as text through invalid-first-character recovery
    assert(d.error_codes.count(_ == "invalid-first-character-of-tag-name") == 2)
    assert(d.n_parse_errors == 3) // + obsolete-doctype
    assert(d.text_extracted.count(_ == '�') == 0)
    assert(d.text_extracted.contains(
      "buffer size for feeding data to and pulling data"),
      "prose must extract intact")
    assert(d.n_chars == 26060 && d.n_nodes == 365)
    assert(md5(d.text_extracted) == "a07a6b9f34ee24c54b67da9a0d350e88")
  }

  test("underscore_index: 174 KB modern utf-8 page, frozen golden") {
    val d = parse("underscore_index.html")
    assert(d.parse_ok && d.n_bytes == 174057)
    assert(d.quirks_mode == "no-quirks")
    assert(d.charset == "UTF-8" && d.charset_source == "meta-prescan")
    // 41 `</p>`-after-`<pre>` closes + the two `<%` template delimiters
    assert(d.error_codes.count(_ == "p-end-not-in-scope") == 41)
    assert(d.error_codes.count(_ == "invalid-first-character-of-tag-name") == 2)
    assert(d.n_parse_errors == 43)
    assert(d.text_extracted.count(_ == '�') == 0)
    // multi-byte utf-8 content must decode (em dash / right quote present)
    assert(d.text_extracted.exists(_ > '\u007f'))
    assert(d.n_chars == 111389 && d.n_nodes == 3021)
    assert(md5(d.text_extracted) == "7e6d7eb2acdb622c4c617c1a38d3af06")
  }

  test("serializer round-trip on the real corpus: certified pages are " +
       "dump-stable; uncertified pages still reparse stably") {
    import htmlspark.tree.{DomNode, HtmlParser, HtmlSerializer}
    import htmlspark.encoding.EncodingSniffer
    def domOf(name: String) = {
      val bytes = load(name)
      val sniff = EncodingSniffer.sniff(bytes)
      (new HtmlParser.Engine)
        .parse(EncodingSniffer.decode(bytes, sniff)).doc
    }
    // probe-verified: all four real pages happen to be dump-stable under
    // serialize∘parse; the conservative predicate certifies the two with
    // no rawtext/comment hazards and declines the two that ship scripts
    // (correct failure direction — decline, never falsely certify)
    for ((name, certified) <- Seq(
        ("debian_users_groups.html", true), ("zlib_how.html", true),
        ("underscore_index.html", false), ("test.html", false))) {
      val doc = domOf(name)
      assert(HtmlSerializer.roundTrips(doc) == certified,
        s"$name: roundTrips certification drifted")
      val re = (new HtmlParser.Engine).parse(HtmlSerializer.serialize(doc)).doc
      assert(DomNode.dump(re) == DomNode.dump(doc),
        s"$name: serialize∘parse dump drifted")
    }
  }
}
