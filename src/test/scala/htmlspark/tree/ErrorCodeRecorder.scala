package htmlspark.tree

/** One-shot recorder: fills the EMPTY #errors sections of the
  * tree-construction vectors with the engine's current error codes
  * (sorted), turning the whole corpus into an error-channel regression
  * net (TreeConstructionSpec asserts non-empty sections). Dump semantics
  * were hand-adjudicated when each vector was frozen; the codes recorded
  * here are the engine-defined vocabulary freeze (FIXTURES.md §3), not a
  * spec claim. Non-empty sections are left untouched.
  * `sbt -batch "Test/runMain htmlspark.tree.ErrorCodeRecorder"`.
  */
object ErrorCodeRecorder {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("src/test/resources/tree-construction")
    dir.listFiles().filter(_.getName.endsWith(".dat")).sortBy(_.getName).foreach { f =>
      val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toVector
      val out = new scala.collection.mutable.ArrayBuffer[String]
      var i = 0
      var rewrote = 0
      while (i < lines.length) {
        if (lines(i) == "#data") {
          val caseStart = out.length
          out += lines(i); i += 1
          val data = new scala.collection.mutable.ArrayBuffer[String]
          while (i < lines.length && !lines(i).startsWith("#")) {
            data += lines(i); out += lines(i); i += 1
          }
          // collect the rest of the case verbatim, noting sections
          var errorsAt = -1
          var errorsEmpty = true
          var fragment: Option[String] = None
          while (i < lines.length && lines(i) != "#document") {
            if (lines(i) == "#errors") {
              errorsAt = out.length
              out += lines(i); i += 1
              while (i < lines.length && !lines(i).startsWith("#")) {
                if (lines(i).trim.nonEmpty) errorsEmpty = false
                out += lines(i); i += 1
              }
            } else if (lines(i) == "#document-fragment") {
              out += lines(i); i += 1
              fragment = Some(lines(i))
              out += lines(i); i += 1
            } else { out += lines(i); i += 1 }
          }
          // copy #document section
          while (i < lines.length && lines(i).nonEmpty) { out += lines(i); i += 1 }
          while (i < lines.length && lines(i).isEmpty) { out += lines(i); i += 1 }
          if (errorsAt >= 0 && errorsEmpty) {
            val input = data.mkString("\n")
            val res = fragment match {
              case Some(ctx) => HtmlParser.parseFragment(input, ctx)
              case None => HtmlParser.parse(input)
            }
            val codes = res.errorCodes.sorted
            if (codes.nonEmpty) {
              out.insertAll(errorsAt + 1, codes)
              rewrote += 1
            }
          }
          val _ = caseStart
        } else { out += lines(i); i += 1 }
      }
      if (rewrote > 0) {
        val w = new java.io.PrintWriter(f, "UTF-8")
        try out.foreach(w.println) finally w.close()
        println(s"${f.getName}: recorded codes for $rewrote cases")
      }
    }
  }
}
