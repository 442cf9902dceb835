package htmlspark.tokenizer

/** Tokenizer vector-authoring probe (mirror of tree.DumpProbe): tokenizes
  * each line of the input file (`\n` escapes honored; optional second arg =
  * initial state name per the html5lib convention, third = last start tag)
  * and prints the html5lib-shape token list for hand adjudication before
  * freezing into .test JSON.
  * `sbt -batch "Test/runMain htmlspark.tokenizer.TokenProbe file [state [lastStartTag]]"`.
  */
object TokenProbe {
  def main(args: Array[String]): Unit = {
    val inputs = scala.io.Source.fromFile(args(0), "UTF-8").getLines().toSeq
      .filter(_.nonEmpty).map(_.replace("\\n", "\n"))
    inputs.foreach { in =>
      val sink = new RecordingSink
      val tok = new HtmlTokenizer(sink)
      if (args.length > 2) tok.setLastStartTag(args(2))
      val state = if (args.length > 1) args(1) match {
        case "RCDATA" => tok.RCDATA
        case "RAWTEXT" => tok.RAWTEXT
        case "SCRIPT" => tok.SCRIPT_DATA
        case "PLAINTEXT" => tok.PLAINTEXT
        case "CDATA" => tok.CDATA_SECTION
        case _ => tok.DATA
      } else tok.DATA
      tok.tokenize(in, state)
      println(s"IN  ${in.replace("\n", "\\n")}")
      sink.tokens.foreach(t => println(s"  $t"))
    }
  }
}
