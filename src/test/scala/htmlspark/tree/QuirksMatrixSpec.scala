package htmlspark.tree

import org.scalatest.funsuite.AnyFunSuite

/** The doctype → quirks-mode decision table (WHATWG "the initial insertion
  * mode"; reference TreeBuilderConstants.cs:40-90 encodes the same public-id
  * lists). The synthetic corpus exercises only two doctype classes, so this
  * spec pins the conditional arms directly: prefix-listed public ids,
  * the system-id-presence flip for HTML 4.01 Frameset/Transitional,
  * XHTML 1.0 limited-quirks prefixes, exact-match legacy ids, the IBM
  * system id, and the force-quirks fallout of a bogus doctype. */
class QuirksMatrixSpec extends AnyFunSuite {

  private val NoQuirks = 0
  private val Limited = 1
  private val Quirks = 2

  private def mode(doctype: String): Int =
    HtmlParser.parse(s"$doctype<html><body>x").quirksMode

  private val cases: Seq[(String, Int, String)] = Seq(
    ("<!DOCTYPE html>", NoQuirks, "modern doctype"),
    ("", Quirks, "no doctype at all"),
    ("<!DOCTYPE foo>", Quirks, "non-html name"),
    ("<!DOCTYPE html BOGUS>", Quirks, "force-quirks from bogus doctype"),
    ("<!DOCTYPE html SYSTEM \"about:legacy-compat\">", NoQuirks,
      "legacy-compat system id"),
    ("<!DOCTYPE HTML PUBLIC \"-//W3C//DTD HTML 4.01//EN\" " +
      "\"http://www.w3.org/TR/html4/strict.dtd\">", NoQuirks,
      "HTML 4.01 Strict is in no list"),
    ("<!DOCTYPE HTML PUBLIC \"-//W3C//DTD HTML 4.01 Transitional//EN\">",
      Quirks, "4.01 Transitional WITHOUT system id"),
    ("<!DOCTYPE HTML PUBLIC \"-//W3C//DTD HTML 4.01 Transitional//EN\" " +
      "\"http://www.w3.org/TR/html4/loose.dtd\">", Limited,
      "4.01 Transitional WITH system id"),
    ("<!DOCTYPE HTML PUBLIC \"-//W3C//DTD HTML 4.01 Frameset//EN\">",
      Quirks, "4.01 Frameset WITHOUT system id"),
    ("<!DOCTYPE HTML PUBLIC \"-//W3C//DTD HTML 4.01 Frameset//EN\" " +
      "\"http://www.w3.org/TR/html4/frameset.dtd\">", Limited,
      "4.01 Frameset WITH system id"),
    ("<!DOCTYPE html PUBLIC \"-//W3C//DTD XHTML 1.0 Transitional//EN\">",
      Limited, "XHTML 1.0 Transitional regardless of system id"),
    ("<!DOCTYPE html PUBLIC \"-//W3C//DTD XHTML 1.0 Frameset//EN\" " +
      "\"http://www.w3.org/TR/xhtml1/DTD/xhtml1-frameset.dtd\">", Limited,
      "XHTML 1.0 Frameset with system id"),
    ("<!DOCTYPE html PUBLIC \"-//W3C//DTD XHTML 1.0 Strict//EN\" " +
      "\"http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd\">", NoQuirks,
      "XHTML 1.0 Strict is in no list"),
    ("<!DOCTYPE HTML PUBLIC \"-//IETF//DTD HTML//EN\">", Quirks,
      "IETF prefix list"),
    ("<!DOCTYPE HTML PUBLIC \"-//W3O//DTD W3 HTML 3.0//EN//\">", Quirks,
      "W3O prefix list"),
    ("<!DOCTYPE html PUBLIC \"HTML\">", Quirks, "exact legacy id HTML"),
    ("<!DOCTYPE html PUBLIC \"html\">", Quirks,
      "public id compare is case-insensitive"),
    ("<!DOCTYPE html SYSTEM " +
      "\"http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd\">",
      Quirks, "the one quirky system id"),
    ("<!DOCTYPE HTML PUBLIC \"-//W3C//DTD HTML 3.2 Final//EN\">", Quirks,
      "HTML 3.2 prefix (the synthetic corpus class)"))

  cases.foreach { case (doctype, want, label) =>
    test(s"$label → mode $want") {
      assert(mode(doctype) == want, s"doctype=[$doctype]")
    }
  }

  /** Doctype keyword/id truncations at EOF (round-5 family): every arm
    * sets force-quirks at EOF, which must win the quirks decision even
    * when the partial public id would otherwise be limited-quirks. Raw
    * input — nothing follows the truncation point. */
  private val eofCases: Seq[(String, String)] = Seq(
    ("<!DOCTYPE", "eof right after keyword"),
    ("<!DOCTYPE ", "eof before name"),
    ("<!DOCTYPE html", "eof after name"),
    ("<!DOCTYPE html ", "eof after name and space"),
    ("<!DOCTYPE html P", "eof mid PUBLIC keyword"),
    ("<!DOCTYPE html PUBLIC", "eof after PUBLIC keyword"),
    ("<!DOCTYPE html PUBLIC ", "eof before public id"),
    ("<!DOCTYPE html PUBLIC \"foo", "eof inside public id"),
    ("<!DOCTYPE html PUBLIC \"-//W3C//DTD XHTML 1.0 Transitional//EN",
      "force-quirks beats the limited-quirks prefix of a truncated id"),
    ("<!DOCTYPE html SYSTEM", "eof after SYSTEM keyword"),
    ("<!DOCTYPE html SYSTEM \"about:legacy-compat",
      "force-quirks beats a truncated legacy-compat system id"))

  eofCases.foreach { case (input, label) =>
    test(s"doctype truncation: $label → quirks") {
      assert(HtmlParser.parse(input).quirksMode == Quirks, s"input=[$input]")
    }
  }

  test("EOF-truncated <!DOCTYPE html does NOT double-count obsolete-doctype") {
    // the tree-stage error condition is name/public-id/system-id only
    // (the force-quirks flag is not part of the spec trigger); the
    // tokenizer's eof-in-doctype is the only error this input carries
    assert(!HtmlParser.parse("<!DOCTYPE html").errorCodes
      .contains("obsolete-doctype"))
  }
}
