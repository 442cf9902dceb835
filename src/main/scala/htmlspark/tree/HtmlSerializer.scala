package htmlspark.tree

/** The WHATWG "serializing HTML fragments" algorithm over the engine's DOM
  * (SURVEY §5.2 item 4b needs it for the reparse-stability property; the
  * reference's commented benchmark re-serialized through XmlDocument,
  * Program.cs:62-85 — this is the HTML-native equivalent).
  *
  * Spec-faithful except one documented extension: a doctype's public and
  * system ids are emitted when present (the spec serializer emits only the
  * name, which silently un-quirks a quirks document on reparse — keeping
  * the ids preserves id-derived quirks modes and the dump). Quirks modes
  * derived from the force-quirks FLAG alone (e.g. `<!DOCTYPE html PUBLIC>`
  * with no ids) still cannot survive serialization — the flag has no
  * textual form — so `roundTrips` flags those doctypes.
  *
  * Known spec-acknowledged lossiness (callers must expect it): rawtext
  * content containing its own end tag, `-->` inside comments, and anything
  * after `<plaintext>` cannot round-trip; `roundTrips` below reports
  * whether a tree is free of those hazards.
  */
object HtmlSerializer {

  private val VoidElements = Set("area", "base", "basefont", "bgsound",
    "br", "col", "embed", "frame", "hr", "img", "input", "keygen", "link",
    "meta", "param", "source", "track", "wbr")

  /** HTML-namespace elements whose text children serialize RAW (noscript
    * excluded: this engine parses with scripting disabled, so noscript
    * children are a normal parsed subtree). */
  private val RawTextElements = Set("style", "script", "xmp", "iframe",
    "noembed", "noframes", "plaintext")

  private def escapeText(s: CharSequence, sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case ' ' => sb.append("&nbsp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c => sb.append(c)
      }
      i += 1
    }
  }

  private def escapeAttr(s: String, sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case ' ' => sb.append("&nbsp;")
        case '"' => sb.append("&quot;")
        case c => sb.append(c)
      }
      i += 1
    }
  }

  /** Stored display name ("xlink href") → serialized qualified name. */
  private def attrQName(stored: String): String = stored match {
    case "xmlns xmlns" => "xmlns"
    case n if n.startsWith("xlink ") => "xlink:" + n.substring(6)
    case n if n.startsWith("xml ") => "xml:" + n.substring(4)
    case n if n.startsWith("xmlns ") => "xmlns:" + n.substring(6)
    case n => n
  }

  /** Serialize the CHILDREN of `root` (fragment serialization; pass the
    * document node for whole-document output, or an element for the
    * spec's innerHTML-style fragment case — rawtext/template/pre-LF
    * context of the root itself is honored). Iterative — survives the
    * pathological-deep class. */
  def serialize(root: DomNode): String = {
    val sb = new java.lang.StringBuilder(256)
    // action stack: Left(node) = emit node, Right(name) = emit end tag
    var stack: List[Either[DomNode, String]] = Nil
    def pushChildren(n: DomNode): Unit =
      if (n.children != null) {
        var i = n.children.length - 1
        while (i >= 0) { stack = Left(n.children(i)) :: stack; i -= 1 }
      }
    // contents of an element context: template → its content fragment;
    // rawtext → children raw; otherwise escaped text + the pre-LF guard
    def pushContents(n: DomNode): Unit = {
      val isHtmlNs = n.kind != Dom.ELEMENT || n.ns == Dom.NS_HTML
      val contents =
        if (n.kind == Dom.ELEMENT && n.contentFragment != null) n.contentFragment
        else n
      if (n.kind == Dom.ELEMENT && isHtmlNs && RawTextElements.contains(n.name)) {
        pushChildren(contents)
      } else {
        if (n.kind == Dom.ELEMENT && isHtmlNs &&
            (n.name == "pre" || n.name == "textarea" || n.name == "listing") &&
            contents.children != null && contents.children.nonEmpty &&
            contents.children(0).kind == Dom.TEXT &&
            contents.children(0).text.length > 0 &&
            contents.children(0).text.charAt(0) == '\n')
          sb.append('\n')
        if (contents.children != null) {
          var i = contents.children.length - 1
          while (i >= 0) {
            val c = contents.children(i)
            if (c.kind == Dom.TEXT) stack = Left(escapedTextNode(c)) :: stack
            else stack = Left(c) :: stack
            i -= 1
          }
        }
      }
    }
    pushContents(root)
    while (stack.nonEmpty) {
      val action = stack.head; stack = stack.tail
      action match {
        case Right(endName) => sb.append("</").append(endName).append('>')
        case Left(n) => n.kind match {
          case Dom.TEXT =>
            sb.append(n.text) // raw-text parents push text via rawChild below
          case Dom.COMMENT =>
            sb.append("<!--").append(n.text).append("-->")
          case Dom.DOCTYPE =>
            sb.append("<!DOCTYPE ").append(n.name)
            val pub = n.publicId; val sys = n.systemId
            if (pub != null && pub.nonEmpty) {
              sb.append(" PUBLIC \"").append(pub).append('"')
              if (sys != null && sys.nonEmpty) sb.append(" \"").append(sys).append('"')
            } else if (sys != null && sys.nonEmpty)
              sb.append(" SYSTEM \"").append(sys).append('"')
            sb.append('>')
          case Dom.ELEMENT =>
            sb.append('<').append(n.name)
            if (n.attrs != null) {
              var i = 0
              while (i < n.attrs.size) {
                sb.append(' ').append(attrQName(n.attrs.nameAt(i))).append("=\"")
                escapeAttr(n.attrs.valueAt(i), sb)
                sb.append('"')
                i += 1
              }
            }
            sb.append('>')
            if (n.ns == Dom.NS_HTML && VoidElements.contains(n.name)) {
              // void: no children, no end tag
            } else {
              stack = Right(n.name) :: stack
              pushContents(n)
            }
        }
      }
    }
    sb.toString
  }

  // Marker wrapper: a TEXT node whose content must be escaped. We reuse the
  // TEXT kind but tag via a sentinel name to keep the action stack simple.
  private def escapedTextNode(t: DomNode): DomNode = {
    val n = new DomNode(Dom.TEXT, "#text-escaped", Dom.NS_HTML, null)
    n.text = new java.lang.StringBuilder(t.text.length + 8)
    escapeText(t.text, n.text)
    n
  }

  /** True when the tree contains none of the spec-acknowledged
    * serialization hazards, i.e. serialize∘parse is dump-identical.
    * Conservative: besides rawtext/comment/plaintext content hazards, any
    * ELEMENT sibling preceding a table is flagged — fostered elements were
    * built while the table sat on the open-element stack (a scope barrier
    * for li/button/etc. walks), and the serialized order loses that
    * context; fostered TEXT is always safe (no subtree). A literal
    * `<div></div><table>` is skipped too — the predicate cannot
    * distinguish it from fostering, and conservative-skip is the correct
    * failure direction for a round-trip guarantee. */
  def roundTrips(root: DomNode): Boolean = {
    var ok = true
    var stack: List[DomNode] = root :: Nil
    while (ok && stack.nonEmpty) {
      val n = stack.head; stack = stack.tail
      n.kind match {
        case Dom.COMMENT =>
          val t = n.text.toString
          if (t.contains("--") || t.endsWith("-")) ok = false
        case Dom.DOCTYPE =>
          // the id-emitting extension quotes ids with `"` — an id
          // containing one cannot round-trip
          if ((n.publicId != null && n.publicId.contains('"')) ||
              (n.systemId != null && n.systemId.contains('"'))) ok = false
          // The force-quirks flag has no textual carrier: a reparse of the
          // serialized doctype only re-derives it for an empty name
          // (`<!DOCTYPE >` → missing-doctype-name). Flag doctypes whose
          // reparse would land in a different quirks mode — e.g.
          // `<!DOCTYPE html PUBLIC>` (force-quirks, no ids) serializes as
          // `<!DOCTYPE html>` and reparses no-quirks (ADVICE r4).
          else {
            def nn(s: String) = if (s == null || s.isEmpty) null else s
            val reparsedFq = n.name.isEmpty
            if (TreeBuilder.decideQuirks(n.name, nn(n.publicId),
                  nn(n.systemId), reparsedFq) !=
                TreeBuilder.decideQuirks(n.name, n.publicId, n.systemId,
                  n.forceQuirks)) ok = false
          }
        case Dom.ELEMENT if n.ns == Dom.NS_HTML && n.name == "plaintext" =>
          ok = false
        case Dom.ELEMENT if n.ns == Dom.NS_HTML &&
            RawTextElements.contains(n.name) =>
          if (n.children != null && n.children.exists(c =>
            c.kind == Dom.TEXT && {
              val t = c.text.toString.toLowerCase(java.util.Locale.ROOT)
              t.contains("</") || t.contains("<!--")
            })) ok = false
        case _ =>
      }
      if (ok && n.children != null) {
        var sawElement = false
        var i = 0
        while (ok && i < n.children.length) {
          val c = n.children(i)
          if (c.kind == Dom.ELEMENT) {
            if (c.ns == Dom.NS_HTML && c.name == "table" && sawElement)
              ok = false
            sawElement = true
          }
          i += 1
        }
      }
      if (ok) {
        if (n.kind == Dom.ELEMENT && n.contentFragment != null)
          stack = n.contentFragment :: stack
        if (n.children != null) {
          var i = n.children.length - 1
          while (i >= 0) { stack = n.children(i) :: stack; i -= 1 }
        }
      }
    }
    ok
  }
}
