package htmlspark.tokenizer

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Records tokens in the html5lib tokenizer-test output shape. */
final class RecordingSink extends TokenSink {
  val out = new ArrayBuffer[List[Any]]
  var sawEof = false
  override def doctype(name: String, publicId: String, systemId: String,
                       forceQuirks: Boolean): Unit =
    out += List("DOCTYPE", name, publicId, systemId, !forceQuirks)
  override def startTag(name: String, attrs: AttrList, selfClosing: Boolean): Unit = {
    val m = (0 until attrs.size).map(i => attrs.nameAt(i) -> attrs.valueAt(i)).toMap
    out += (if (selfClosing) List("StartTag", name, m, true)
            else List("StartTag", name, m))
  }
  override def endTag(name: String): Unit = out += List("EndTag", name)
  override def comment(text: String): Unit = out += List("Comment", text)
  override def characters(buf: Array[Char], start: Int, end: Int): Unit =
    out += List("Character", new String(buf, start, end - start))
  override def eof(): Unit = sawEof = true

  /** html5lib compare form: adjacent Character tokens coalesced. */
  def tokens: List[List[Any]] = {
    val res = new ArrayBuffer[List[Any]]
    out.foreach {
      case List("Character", s: String)
        if res.nonEmpty && res.last.headOption.contains("Character") =>
        res(res.length - 1) =
          List("Character", res.last(1).asInstanceOf[String] + s)
      case t => res += t
    }
    res.toList
  }
}

/** Runs every .test file under src/test/resources/tokenizer (html5lib tokenizer
  * test JSON format — the public conformance format this parser lineage is
  * verified with; the reference fork ships none, so these are authored
  * in-repo per FIXTURES.md §2).
  */
class TokenizerConformanceSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper

  private def jsonToToken(n: JsonNode): List[Any] = {
    val kind = n.get(0).asText
    kind match {
      case "Character" | "Comment" => List(kind, n.get(1).asText)
      case "EndTag" => List(kind, n.get(1).asText)
      case "StartTag" =>
        val attrs = n.get(2).properties().asScala
          .map(e => e.getKey -> e.getValue.asText).toMap
        if (n.size > 3 && n.get(3).asBoolean) List(kind, n.get(1).asText, attrs, true)
        else List(kind, n.get(1).asText, attrs)
      case "DOCTYPE" =>
        def s(i: Int): String = if (n.get(i).isNull) null else n.get(i).asText
        List(kind, s(1), s(2), s(3), n.get(4).asBoolean)
      case other => sys.error(s"unknown token kind $other")
    }
  }

  private def coalesce(ts: List[List[Any]]): List[List[Any]] =
    ts.foldLeft(List.empty[List[Any]]) {
      case (acc :+ List("Character", a: String), List("Character", b: String)) =>
        acc :+ List("Character", a + b)
      case (acc, t) => acc :+ t
    }

  private def unescape(s: String): String = {
    // html5lib doubleEscaped form: literal \uXXXX sequences
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 5 < s.length && s.charAt(i + 1) == 'u') {
        sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
        i += 6
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private def stateId(tok: HtmlTokenizer, name: String): Int = name match {
    case "Data state" => tok.DATA
    case "RCDATA state" => tok.RCDATA
    case "RAWTEXT state" => tok.RAWTEXT
    case "Script data state" => tok.SCRIPT_DATA
    case "PLAINTEXT state" => tok.PLAINTEXT
    case "CDATA section state" => tok.CDATA_SECTION
    case other => sys.error(s"unknown state $other")
  }

  private val dir = new java.io.File("src/test/resources/tokenizer")
  private val files = Option(dir.listFiles()).getOrElse(Array.empty)
    .filter(_.getName.endsWith(".test")).sortBy(_.getName)

  for (f <- files) {
    val root = mapper.readTree(f)
    val tests = root.get("tests")
    for (i <- 0 until tests.size) {
      val t = tests.get(i)
      val desc = s"${f.getName}[$i] ${t.get("description").asText}"
      val dbl = t.has("doubleEscaped") && t.get("doubleEscaped").asBoolean
      val input0 = t.get("input").asText
      val input = if (dbl) unescape(input0) else input0
      val states =
        if (t.has("initialStates"))
          t.get("initialStates").elements().asScala.map(_.asText).toList
        else List("Data state")
      val lastStartTag =
        if (t.has("lastStartTag")) t.get("lastStartTag").asText else null
      val expected0 = t.get("output").elements().asScala.map(jsonToToken).toList
      val expected = coalesce(expected0.map {
        case List("Character", s: String) if dbl => List("Character", unescape(s))
        case List("Comment", s: String) if dbl => List("Comment", unescape(s))
        case other => other
      })
      for (st <- states) {
        test(s"$desc ($st)") {
          val sink = new RecordingSink
          val tok = new HtmlTokenizer(sink)
          if (lastStartTag != null) tok.setLastStartTag(lastStartTag)
          tok.tokenize(input, stateId(tok, st))
          assert(sink.sawEof, "tokenizer must emit EOF")
          assert(sink.tokens == expected)
        }
      }
    }
  }

  test("at least one vector file present") { assert(files.nonEmpty) }
}
