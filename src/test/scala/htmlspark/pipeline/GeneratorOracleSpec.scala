package htmlspark.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end invariant check with a parser-independent oracle: for the
  * plain-article class the expected extracted text is derived from the
  * generator template itself. Every byte must match through
  * sniff → decode → tokenize → tree-build → extract. */
class GeneratorOracleSpec extends AnyFunSuite {
  test("plain-article extraction is byte-identical to the template oracle") {
    var checked = 0
    (0L until 3000L).foreach { i =>
      PagesGen.plainExpectedText(i).foreach { expected =>
        val got = ParseJob.parsePage(PagesGen.page(i)).text_extracted
        assert(got == expected,
          s"doc $i:\n--- got ---\n${got.take(300)}\n--- want ---\n${expected.take(300)}")
        checked += 1
      }
    }
    assert(checked > 1500, s"only $checked plain docs checked")
  }

  test("table-heavy extraction (foster parenting) matches the template oracle") {
    var checked = 0
    (0L until 3000L).foreach { i =>
      PagesGen.tableExpectedText(i).foreach { expected =>
        val got = ParseJob.parsePage(PagesGen.page(i)).text_extracted
        assert(got == expected,
          s"doc $i:\n--- got ---\n${got.take(300)}\n--- want ---\n${expected.take(300)}")
        checked += 1
      }
    }
    assert(checked > 200, s"only $checked table docs checked")
  }

  test("doc meta (charset/source/restart/late/quirks) matches the template " +
       "oracle and all 8 charset classes occur") {
    val seenClasses = scala.collection.mutable.Set.empty[(String, String, Boolean, Boolean)]
    (0L until 3000L).foreach { i =>
      val (quirks, charset, source, restarted, late) = PagesGen.expectedMetaFor(i)
      val d = ParseJob.parsePage(PagesGen.page(i))
      assert((d.quirks_mode, d.charset, d.charset_source, d.restarted, d.late_meta) ==
        ((quirks, charset, source, restarted, late)), s"doc $i")
      seenClasses += ((charset, source, restarted, late))
    }
    // bom×2, prescan×2 (win-1252 + the default utf-8 meta), late-agreeing
    // default, undeclared legacy default, restart, undeclared utf-8
    assert(seenClasses.size >= 8, s"only ${seenClasses.size} distinct " +
      s"charset outcomes exercised: $seenClasses")
  }

  test("EVERY document class matches the full-corpus template oracle") {
    var checked = 0
    (0L until 2000L).foreach { i =>
      val expected = PagesGen.fullExpectedText(i)
      assert(expected.isDefined, s"doc $i: no expected text modeled")
      val got = ParseJob.parsePage(PagesGen.page(i)).text_extracted
      assert(got == expected.get,
        s"doc $i (cls exercised differs):\n--- got ---\n${got.take(400)}\n--- want ---\n${expected.get.take(400)}")
      checked += 1
    }
    assert(checked == 2000)
  }
}
