package htmlspark.extract

import org.scalatest.funsuite.AnyFunSuite
import htmlspark.tree.HtmlParser

/** Byte-exact extraction goldens (FIXTURES.md §3): <name>.html → <name>.txt,
  * compared as UTF-8 bytes — the per-url invariant the north rule grades. */
class ExtractionGoldenSpec extends AnyFunSuite {
  private val dir = new java.io.File("src/test/resources/extract")
  private val pairs = Option(dir.listFiles()).getOrElse(Array.empty)
    .filter(_.getName.endsWith(".html")).sortBy(_.getName)

  for (f <- pairs) {
    test(f.getName) {
      val html = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val expected = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(f.getPath.stripSuffix(".html") + ".txt"))
      val got = TextExtractor.extract(HtmlParser.parse(html).doc)
        .getBytes("UTF-8")
      assert(java.util.Arrays.equals(got, expected),
        s"byte mismatch:\n--- got ---\n${new String(got, "UTF-8")}\n--- want ---\n${new String(expected, "UTF-8")}")
    }
  }

  test("goldens present") { assert(pairs.nonEmpty) }
}
