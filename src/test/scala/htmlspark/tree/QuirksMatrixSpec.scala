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
}
