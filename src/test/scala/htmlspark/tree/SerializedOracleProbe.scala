package htmlspark.tree

import htmlspark.pipeline.{PagesGen, ParseJob}

/** Adjudication probe for the p17 template derivation: runs the REAL
  * engine (sniff → decode → parse → roundTrips → serialize) against
  * PagesGen.serializedExpectedFor over a range of content indexes and
  * prints the first few divergences with enough context to adjudicate by
  * hand. Run with `sbt -batch "Test/runMain htmlspark.tree.SerializedOracleProbe [n]"`.
  */
object SerializedOracleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 5000L
    val engine = new HtmlParser.Engine
    var setMism = 0; var hashMism = 0; var shown = 0
    var i = 0L
    while (i < n) {
      val doc = ParseJob.parseDomOnly(PagesGen.renderHtml(i), engine)
      val rt = HtmlSerializer.roundTrips(doc)
      val expected = PagesGen.serializedExpectedFor(i)
      if (rt != expected.isDefined) {
        setMism += 1
        if (shown < 5) {
          shown += 1
          println(s"SET MISMATCH ci=$i engineRoundTrips=$rt templateHasFace=${expected.isDefined} cls=${Math.floorMod(mixPub(i), 100L)}")
        }
      } else if (rt) {
        val got = HtmlSerializer.serialize(doc)
        if (got != expected.get) {
          hashMism += 1
          if (shown < 8) {
            shown += 1
            val g = got; val e = expected.get
            val d = (0 until math.min(g.length, e.length)).find(k => g.charAt(k) != e.charAt(k)).getOrElse(math.min(g.length, e.length))
            println(s"SER MISMATCH ci=$i at char $d")
            println(s"  engine  : ...${g.substring(math.max(0, d - 60), math.min(g.length, d + 80))}...")
            println(s"  template: ...${e.substring(math.max(0, d - 60), math.min(e.length, d + 80))}...")
          }
        }
      }
      i += 1
    }
    println(s"probe done n=$n setMismatches=$setMism serMismatches=$hashMism")
  }

  private def mixPub(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
