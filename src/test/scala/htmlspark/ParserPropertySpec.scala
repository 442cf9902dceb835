package htmlspark

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import htmlspark.tree.HtmlParser
import htmlspark.extract.TextExtractor
import htmlspark.encoding.EncodingSniffer

/** Property tests (FIXTURES.md / SURVEY.md §5.2 item 4) — raw ScalaCheck
  * generators driven from fixed seeds (no scalatestplus bridge offline). */
class ParserPropertySpec extends AnyFunSuite {

  private def forAllN[T](gen: Gen[T], n: Int = 200)(f: T => Unit): Unit = {
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default.withSize(40), Seed(i.toLong)) match {
        case Some(v) =>
          try f(v)
          catch {
            case e: Throwable =>
              fail(s"failing input (seed=$i): ${v.toString.take(300)}", e)
          }
        case None =>
      }
      i += 1
    }
  }

  private val htmlSoup: Gen[String] = {
    val frag = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.oneOf("<", ">", "</", "<!--", "-->", "&", "&#", "&amp", ";",
        "<div", "<p>", "</p>", "<script>", "</script>", "<table>", "<td>",
        "='", "=\"", "<![CDATA[", "]]>", "<!DOCTYPE", "\u0000", "\r\n", "\r"),
      Gen.listOfN(4, Gen.chooseNum(0, 0x2FFF)).map(_.map(_.toChar).mkString))
    Gen.listOf(frag).map(_.mkString)
  }

  test("totality: any char soup parses to a document without throwing") {
    forAllN(htmlSoup) { s =>
      val r = HtmlParser.parse(s)
      assert(r.doc != null)
      TextExtractor.extract(r.doc)
    }
  }

  /** The error channel is a FROZEN vocabulary (FIXTURES.md §3): every
    * code a parse can emit must be one of the literal err("...") strings
    * in the engine source. A typo'd or ad-hoc code introduced by a future
    * edit would silently break the p14/p15 class-constant contract and
    * the .dat #errors pins — this meta-property catches it on any input
    * the fuzzer can construct. */
  private lazy val errVocabulary: Set[String] = {
    val srcs = Seq("src/main/scala/htmlspark/tree/TreeBuilder.scala",
      "src/main/scala/htmlspark/tokenizer/HtmlTokenizer.scala")
    srcs.flatMap { p =>
      val s = scala.io.Source.fromFile(p, "UTF-8").mkString
      """err\("([a-z0-9-]+)"\)""".r.findAllMatchIn(s).map(_.group(1))
    }.toSet
  }

  test("error-channel vocabulary: fuzzed parses emit only frozen codes") {
    assert(errVocabulary.size > 100, "vocabulary extraction broke")
    forAllN(htmlSoup) { s =>
      val bad = HtmlParser.parse(s).errorCodes.filterNot(errVocabulary)
      assert(bad.isEmpty, s"unknown codes ${bad.mkString(",")} for [$s]")
    }
  }

  test("CR / CRLF / LF input equivalence") {
    forAllN(htmlSoup.map(_.replace("\r", ""))) { s =>
      val lf = s
      val crlf = s.replace("\n", "\r\n")
      val cr = s.replace("\n", "\r")
      val a = TextExtractor.extract(HtmlParser.parse(lf).doc)
      val b = TextExtractor.extract(HtmlParser.parse(crlf).doc)
      val c = TextExtractor.extract(HtmlParser.parse(cr).doc)
      assert(a == b && b == c)
    }
  }

  test("charset extractor matches a regex oracle on wellformed content") {
    val contentGen = for {
      pre <- Gen.oneOf("text/html", "text/html; ", "")
      q <- Gen.oneOf("\"", "'", "")
      cs <- Gen.oneOf("utf-8", "UTF-8", "windows-1252", "shift_jis")
      ws <- Gen.oneOf("", " ", "  ")
    } yield s"${pre}charset$ws=$ws$q$cs$q"
    forAllN(contentGen) { content =>
      val got = EncodingSniffer.extractCharsetFromContent(content)
      val m = java.util.regex.Pattern
        .compile("charset\\s*=\\s*([\"']?)([^\"';\\s]+)\\1")
        .matcher(content)
      val want = if (m.find()) m.group(2) else null
      assert(got == want, s"content=[$content]")
    }
  }

  test("totality on random bytes through the full page path") {
    val byteGen = Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
    forAllN(byteGen) { bytes =>
      val p = htmlspark.pipeline.Page("u", new java.sql.Timestamp(0), bytes, "", "")
      val d = htmlspark.pipeline.ParseJob.parsePage(p)
      assert(d.parse_ok, String.valueOf(d.error))
    }
  }

  test("undeclared pages never lose bytes to U+FFFD (r3 encoding default)") {
    // The round-3 invariant: with no BOM and no meta, the sniff picks
    // strict-valid utf-8 or the TOTAL windows-1252 table — either way no
    // replacement character can appear. (Declared charsets and utf-16
    // BOMs may still legitimately produce U+FFFD on malformed payloads.)
    import htmlspark.encoding.EncodingSniffer
    val byteGen = Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
    // a literal EF BF BD run IS U+FFFD validly encoded — only flag the
    // replacement char when the input didn't actually contain it
    def encodesFffd(b: Array[Byte]): Boolean =
      b.sliding(3).exists(w => w.length == 3 && w(0) == 0xEF.toByte &&
        w(1) == 0xBF.toByte && w(2) == 0xBD.toByte)
    forAllN(byteGen, 400) { bytes =>
      val s = EncodingSniffer.sniff(bytes)
      if (s.source == EncodingSniffer.SourceDefault) {
        val text = EncodingSniffer.decode(bytes, s)
        if (text.contains('�'))
          assert(s.charset == "UTF-8" && encodesFffd(bytes),
            s"charset=${s.charset} lost bytes: ${bytes.take(20).mkString(",")}")
        // and the decode is length-preserving for the windows-1252 arm
        if (s.charset == "windows-1252") assert(text.length == bytes.length)
      }
    }
  }

  test("ascii content decodes identically under both default arms") {
    val asciiGen = Gen.listOf(Gen.chooseNum(0x09, 0x7E).map(_.toChar)).map(_.mkString)
    forAllN(asciiGen, 200) { content =>
      import htmlspark.encoding.EncodingSniffer
      val bytes = content.getBytes("US-ASCII")
      val s = EncodingSniffer.sniff(bytes)
      if (s.source == EncodingSniffer.SourceDefault)
        assert(EncodingSniffer.decode(bytes, s) ==
          EncodingSniffer.decodeWindows1252(bytes, 0))
    }
  }

  test("fragment totality: any soup in any context parses without hanging") {
    val ctxGen = Gen.oneOf("div", "td", "tr", "tbody", "table", "select",
      "title", "textarea", "script", "style", "plaintext", "template",
      "svg path", "math ms", "svg desc", "math annotation-xml", "html",
      "head", "frameset", "colgroup", "caption", "option", "p", "ruby",
      "noscript", "body")
    forAllN(Gen.zip(ctxGen, htmlSoup), 400) { case (ctx, s) =>
      val r = HtmlParser.parseFragment(s, ctx)
      assert(r.builder.fragmentRoot != null)
    }
  }

  test("parse determinism: same input → same extracted bytes") {
    forAllN(htmlSoup) { s =>
      val a = TextExtractor.extract(HtmlParser.parse(s).doc)
      val b = TextExtractor.extract(HtmlParser.parse(s).doc)
      assert(a == b)
    }
  }
}
