package htmlspark.extract

import org.scalatest.funsuite.AnyFunSuite
import htmlspark.encoding.EncodingSniffer
import htmlspark.tree.{DomNode, HtmlParser, HtmlSerializer}

/** Property sweep over every HTML document shipped on this box
  * (/usr/share/doc — ~200 real pages, ~21 MB: Docutils/DocBook/gtk-doc/
  * hand-written eras, several charset declarations). Unlike the pinned
  * fixtures (RealDocSpec / RealDocCorpusSpec) nothing here is golden —
  * the sweep asserts PROPERTIES that must hold for any input, on a
  * corpus nobody in this repo authored:
  *
  *   1. totality — every page parses without an exception;
  *   2. decode sanity — pages that declare a charset the registry
  *      resolves decode with zero U+FFFD (real docs are well-encoded);
  *   3. serializer soundness — whenever roundTrips certifies a tree,
  *      serialize∘parse must be dump-identical AND extraction-identical;
  *   4. the certified fraction is substantial (the predicate is
  *      conservative, not vacuous).
  *
  * Skips cleanly when the directory is absent (non-sandbox runs). */
class RealCorpusSweepSpec extends AnyFunSuite {

  private val root = new java.io.File("/usr/share/doc")

  private def htmlFiles(dir: java.io.File): Seq[java.io.File] = {
    val out = scala.collection.mutable.ArrayBuffer[java.io.File]()
    def walk(d: java.io.File): Unit = {
      val fs = d.listFiles()
      if (fs != null) fs.foreach { f =>
        if (f.isDirectory) walk(f)
        else if (f.getName.toLowerCase(java.util.Locale.ROOT).endsWith(".html")) out += f
      }
    }
    walk(dir)
    out.sortBy(_.getPath).toSeq
  }

  test("on-box real corpus: totality, decode sanity, serializer soundness") {
    assume(root.isDirectory, "/usr/share/doc not present")
    val files = htmlFiles(root)
    assume(files.size >= 50, s"corpus too small (${files.size})")
    val engine = new HtmlParser.Engine
    var certified = 0
    var declaredClean = 0
    var declared = 0
    files.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val sniff = EncodingSniffer.sniff(bytes)
      val html = EncodingSniffer.decode(bytes, sniff)
      val result = engine.parse(html)               // 1. must not throw
      val doc = result.doc
      assert(doc != null, f.getPath)
      if (sniff.source != EncodingSniffer.SourceDefault) {
        // 2. a declared, registry-resolved charset must decode cleanly
        declared += 1
        if (!html.contains('�')) declaredClean += 1
      }
      if (HtmlSerializer.roundTrips(doc)) {
        certified += 1
        // 3. certification is a guarantee, not a guess
        val re = engine.parse(HtmlSerializer.serialize(doc)).doc
        assert(DomNode.dump(re) == DomNode.dump(doc),
          s"${f.getPath}: certified tree not dump-stable")
        assert(TextExtractor.extract(re) == TextExtractor.extract(doc),
          s"${f.getPath}: certified tree not extraction-stable")
      }
    }
    info(s"${files.size} pages: $certified certified round-trippable, " +
      s"$declaredClean/$declared declared-charset pages decoded U+FFFD-free")
    assert(certified >= files.size / 4,
      s"roundTrips certified only $certified/${files.size} — predicate " +
        "has gone vacuous")
    assert(declared == 0 || declaredClean * 10 >= declared * 9,
      s"declared-charset pages decoding dirty: $declaredClean/$declared")
  }
}
