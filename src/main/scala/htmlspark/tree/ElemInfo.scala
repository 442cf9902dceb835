package htmlspark.tree

import htmlspark.tokenizer.AttrList

/** Element category sets and foreign-content adjustment tables from the
  * WHATWG tree-construction spec (all public lists). Executor-local JVM
  * singletons — the role of the reference's interned ElementName/
  * AttributeName flag tables (reference: Core/ElementName.cs:40-84,
  * Core/AttributeName.Generated.cs) without per-row serialization cost.
  */
object ElemInfo {

  /** The spec's "special" category (HTML namespace part). */
  val Special: Set[String] = Set(
    "address", "applet", "area", "article", "aside", "base", "basefont",
    "bgsound", "blockquote", "body", "br", "button", "caption", "center",
    "col", "colgroup", "dd", "details", "dir", "div", "dl", "dt", "embed",
    "fieldset", "figcaption", "figure", "footer", "form", "frame",
    "frameset", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header",
    "hgroup", "hr", "html", "iframe", "img", "input", "keygen", "li",
    "link", "listing", "main", "marquee", "menu", "meta", "nav", "noembed",
    "noframes", "noscript", "object", "ol", "p", "param", "plaintext",
    "pre", "script", "search", "section", "select", "source", "style",
    "summary", "table", "tbody", "td", "template", "textarea", "tfoot",
    "th", "thead", "title", "tr", "track", "ul", "wbr", "xmp")

  val SpecialMathML: Set[String] = Set("mi", "mo", "mn", "ms", "mtext",
    "annotation-xml")
  val SpecialSvg: Set[String] = Set("foreignObject", "desc", "title")

  private val SpecialJ = { val h = new java.util.HashSet[String](256); Special.foreach(h.add); h }
  private val SpecialMathMLJ = { val h = new java.util.HashSet[String](16); SpecialMathML.foreach(h.add); h }
  private val SpecialSvgJ = { val h = new java.util.HashSet[String](8); SpecialSvg.foreach(h.add); h }

  def isSpecial(ns: Int, name: String): Boolean = ns match {
    case Dom.NS_HTML => SpecialJ.contains(name)
    case Dom.NS_MATHML => SpecialMathMLJ.contains(name)
    case Dom.NS_SVG => SpecialSvgJ.contains(name)
    case _ => false
  }

  /** Active-formatting-element tag names. */
  val Formatting: Set[String] = Set("a", "b", "big", "code", "em", "font",
    "i", "nobr", "s", "small", "strike", "strong", "tt", "u")

  /** Default scope barrier (html ns) + foreign integration points. */
  private val ScopeHtml = Set("applet", "caption", "html", "table", "td",
    "th", "marquee", "object", "template")
  private val ScopeMathML = Set("mi", "mo", "mn", "ms", "mtext", "annotation-xml")
  private val ScopeSvg = Set("foreignObject", "desc", "title")

  private val ScopeHtmlJ = { val h = new java.util.HashSet[String](16); ScopeHtml.foreach(h.add); h }
  private val ScopeMathMLJ = { val h = new java.util.HashSet[String](16); ScopeMathML.foreach(h.add); h }
  private val ScopeSvgJ = { val h = new java.util.HashSet[String](8); ScopeSvg.foreach(h.add); h }

  def inDefaultScopeBarrier(ns: Int, name: String): Boolean = ns match {
    case Dom.NS_HTML => ScopeHtmlJ.contains(name)
    case Dom.NS_MATHML => ScopeMathMLJ.contains(name)
    case Dom.NS_SVG => ScopeSvgJ.contains(name)
    case _ => false
  }

  def inListScopeBarrier(ns: Int, name: String): Boolean =
    inDefaultScopeBarrier(ns, name) ||
      (ns == Dom.NS_HTML && (name == "ol" || name == "ul"))

  def inButtonScopeBarrier(ns: Int, name: String): Boolean =
    inDefaultScopeBarrier(ns, name) || (ns == Dom.NS_HTML && name == "button")

  def inTableScopeBarrier(ns: Int, name: String): Boolean =
    ns == Dom.NS_HTML && (name == "html" || name == "table" || name == "template")

  /** generate implied end tags. */
  val ImpliedEnd: Set[String] = Set("dd", "dt", "li", "optgroup", "option",
    "p", "rb", "rp", "rt", "rtc")
  /** generate implied end tags *thoroughly*. */
  val ImpliedEndThorough: Set[String] = ImpliedEnd ++ Set(
    "caption", "colgroup", "tbody", "td", "tfoot", "th", "thead", "tr")

  /** Foreign-content breakout start tags (pop foreign elements). */
  val ForeignBreakout: Set[String] = Set(
    "b", "big", "blockquote", "body", "br", "center", "code", "dd", "div",
    "dl", "dt", "em", "embed", "h1", "h2", "h3", "h4", "h5", "h6", "head",
    "hr", "i", "img", "li", "listing", "menu", "meta", "nobr", "ol", "p",
    "pre", "ruby", "s", "small", "span", "strong", "strike", "sub", "sup",
    "table", "tt", "u", "ul", "var")

  /** SVG tag-name case adjustments (spec table). */
  val SvgTagAdjust: Map[String, String] = Seq(
    "altglyph" -> "altGlyph", "altglyphdef" -> "altGlyphDef",
    "altglyphitem" -> "altGlyphItem", "animatecolor" -> "animateColor",
    "animatemotion" -> "animateMotion", "animatetransform" -> "animateTransform",
    "clippath" -> "clipPath", "feblend" -> "feBlend",
    "fecolormatrix" -> "feColorMatrix", "fecomponenttransfer" -> "feComponentTransfer",
    "fecomposite" -> "feComposite", "feconvolvematrix" -> "feConvolveMatrix",
    "fediffuselighting" -> "feDiffuseLighting", "fedisplacementmap" -> "feDisplacementMap",
    "fedistantlight" -> "feDistantLight", "fedropshadow" -> "feDropShadow",
    "feflood" -> "feFlood", "fefunca" -> "feFuncA", "fefuncb" -> "feFuncB",
    "fefuncg" -> "feFuncG", "fefuncr" -> "feFuncR",
    "fegaussianblur" -> "feGaussianBlur", "feimage" -> "feImage",
    "femerge" -> "feMerge", "femergenode" -> "feMergeNode",
    "femorphology" -> "feMorphology", "feoffset" -> "feOffset",
    "fepointlight" -> "fePointLight", "fespecularlighting" -> "feSpecularLighting",
    "fespotlight" -> "feSpotLight", "fetile" -> "feTile",
    "feturbulence" -> "feTurbulence", "foreignobject" -> "foreignObject",
    "glyphref" -> "glyphRef", "lineargradient" -> "linearGradient",
    "radialgradient" -> "radialGradient", "textpath" -> "textPath").toMap

  /** SVG attribute case adjustments (spec table). */
  val SvgAttrAdjust: Map[String, String] = Seq(
    "attributename" -> "attributeName", "attributetype" -> "attributeType",
    "basefrequency" -> "baseFrequency", "baseprofile" -> "baseProfile",
    "calcmode" -> "calcMode", "clippathunits" -> "clipPathUnits",
    "diffuseconstant" -> "diffuseConstant", "edgemode" -> "edgeMode",
    "filterunits" -> "filterUnits", "glyphref" -> "glyphRef",
    "gradienttransform" -> "gradientTransform", "gradientunits" -> "gradientUnits",
    "kernelmatrix" -> "kernelMatrix", "kernelunitlength" -> "kernelUnitLength",
    "keypoints" -> "keyPoints", "keysplines" -> "keySplines",
    "keytimes" -> "keyTimes", "lengthadjust" -> "lengthAdjust",
    "limitingconeangle" -> "limitingConeAngle", "markerheight" -> "markerHeight",
    "markerunits" -> "markerUnits", "markerwidth" -> "markerWidth",
    "maskcontentunits" -> "maskContentUnits", "maskunits" -> "maskUnits",
    "numoctaves" -> "numOctaves", "pathlength" -> "pathLength",
    "patterncontentunits" -> "patternContentUnits",
    "patterntransform" -> "patternTransform", "patternunits" -> "patternUnits",
    "pointsatx" -> "pointsAtX", "pointsaty" -> "pointsAtY",
    "pointsatz" -> "pointsAtZ", "preservealpha" -> "preserveAlpha",
    "preserveaspectratio" -> "preserveAspectRatio",
    "primitiveunits" -> "primitiveUnits", "refx" -> "refX", "refy" -> "refY",
    "repeatcount" -> "repeatCount", "repeatdur" -> "repeatDur",
    "requiredextensions" -> "requiredExtensions",
    "requiredfeatures" -> "requiredFeatures", "specularconstant" -> "specularConstant",
    "specularexponent" -> "specularExponent", "spreadmethod" -> "spreadMethod",
    "startoffset" -> "startOffset", "stddeviation" -> "stdDeviation",
    "stitchtiles" -> "stitchTiles", "surfacescale" -> "surfaceScale",
    "systemlanguage" -> "systemLanguage", "tablevalues" -> "tableValues",
    "targetx" -> "targetX", "targety" -> "targetY", "textlength" -> "textLength",
    "viewbox" -> "viewBox", "viewtarget" -> "viewTarget",
    "xchannelselector" -> "xChannelSelector", "ychannelselector" -> "yChannelSelector",
    "zoomandpan" -> "zoomAndPan").toMap

  def adjustMathMLAttributes(attrs: AttrList): Unit = {
    var i = 0
    while (i < attrs.size) {
      if (attrs.nameAt(i) == "definitionurl") attrs.rename(i, "definitionURL")
      i += 1
    }
  }

  def adjustSvgAttributes(attrs: AttrList): Unit = {
    var i = 0
    while (i < attrs.size) {
      val n = SvgAttrAdjust.getOrElse(attrs.nameAt(i), null)
      if (n != null) attrs.rename(i, n)
      i += 1
    }
  }

  /** Foreign attributes keep their qualified names for dump purposes
    * (xlink:href etc. stay as written, xmlns → xmlns). The html5lib dump
    * renders them "xlink href"; we store "xlink href" style directly. */
  def adjustForeignAttributes(attrs: AttrList): Unit = {
    var i = 0
    while (i < attrs.size) {
      attrs.nameAt(i) match {
        case "xlink:actuate" => attrs.rename(i, "xlink actuate")
        case "xlink:arcrole" => attrs.rename(i, "xlink arcrole")
        case "xlink:href" => attrs.rename(i, "xlink href")
        case "xlink:role" => attrs.rename(i, "xlink role")
        case "xlink:show" => attrs.rename(i, "xlink show")
        case "xlink:title" => attrs.rename(i, "xlink title")
        case "xlink:type" => attrs.rename(i, "xlink type")
        case "xml:lang" => attrs.rename(i, "xml lang")
        case "xml:space" => attrs.rename(i, "xml space")
        case "xmlns" => attrs.rename(i, "xmlns xmlns")
        case "xmlns:xlink" => attrs.rename(i, "xmlns xlink")
        case _ =>
      }
      i += 1
    }
  }

  /** Quirks-mode detection tables (doctype public-id prefixes; the spec's
    * list, same data as the reference's QUIRKY_PUBLIC_IDS at
    * Core/TreeBuilderConstants.cs:40-90). */
  val QuirkyPublicIdPrefixes: Array[String] = Array(
    "+//silmaril//dtd html pro v0r11 19970101//",
    "-//as//dtd html 3.0 aswedit + extensions//",
    "-//advasoft ltd//dtd html 3.0 aswedit + extensions//",
    "-//ietf//dtd html 2.0 level 1//", "-//ietf//dtd html 2.0 level 2//",
    "-//ietf//dtd html 2.0 strict level 1//",
    "-//ietf//dtd html 2.0 strict level 2//", "-//ietf//dtd html 2.0 strict//",
    "-//ietf//dtd html 2.0//", "-//ietf//dtd html 2.1e//",
    "-//ietf//dtd html 3.0//", "-//ietf//dtd html 3.2 final//",
    "-//ietf//dtd html 3.2//", "-//ietf//dtd html 3//",
    "-//ietf//dtd html level 0//", "-//ietf//dtd html level 1//",
    "-//ietf//dtd html level 2//", "-//ietf//dtd html level 3//",
    "-//ietf//dtd html strict level 0//", "-//ietf//dtd html strict level 1//",
    "-//ietf//dtd html strict level 2//", "-//ietf//dtd html strict level 3//",
    "-//ietf//dtd html strict//", "-//ietf//dtd html//",
    "-//metrius//dtd metrius presentational//",
    "-//microsoft//dtd internet explorer 2.0 html strict//",
    "-//microsoft//dtd internet explorer 2.0 html//",
    "-//microsoft//dtd internet explorer 2.0 tables//",
    "-//microsoft//dtd internet explorer 3.0 html strict//",
    "-//microsoft//dtd internet explorer 3.0 html//",
    "-//microsoft//dtd internet explorer 3.0 tables//",
    "-//netscape comm. corp.//dtd html//",
    "-//netscape comm. corp.//dtd strict html//",
    "-//o'reilly and associates//dtd html 2.0//",
    "-//o'reilly and associates//dtd html extended 1.0//",
    "-//o'reilly and associates//dtd html extended relaxed 1.0//",
    "-//sq//dtd html 2.0 hotmetal + extensions//",
    "-//softquad software//dtd hotmetal pro 6.0::19990601::extensions to html 4.0//",
    "-//softquad//dtd hotmetal pro 4.0::19971010::extensions to html 4.0//",
    "-//spyglass//dtd html 2.0 extended//",
    "-//sun microsystems corp.//dtd hotjava html//",
    "-//sun microsystems corp.//dtd hotjava strict html//",
    "-//w3c//dtd html 3 1995-03-24//", "-//w3c//dtd html 3.2 draft//",
    "-//w3c//dtd html 3.2 final//", "-//w3c//dtd html 3.2//",
    "-//w3c//dtd html 3.2s draft//", "-//w3c//dtd html 4.0 frameset//",
    "-//w3c//dtd html 4.0 transitional//",
    "-//w3c//dtd html experimental 19960712//",
    "-//w3c//dtd html experimental 970421//", "-//w3c//dtd w3 html//",
    "-//w3o//dtd w3 html 3.0//", "-//webtechs//dtd mozilla html 2.0//",
    "-//webtechs//dtd mozilla html//")

  val QuirkyPublicIdsExact: Set[String] = Set(
    "-//w3o//dtd w3 html strict 3.0//en//", "-/w3c/dtd html 4.0 transitional/en",
    "html")

  val AlmostStandardsPrefixes: Array[String] = Array(
    "-//w3c//dtd xhtml 1.0 frameset//", "-//w3c//dtd xhtml 1.0 transitional//")

  val LimitedQuirksWithSystemPrefixes: Array[String] = Array(
    "-//w3c//dtd html 4.01 frameset//", "-//w3c//dtd html 4.01 transitional//")
}
