package htmlspark.tokenizer

import scala.collection.mutable.ArrayBuffer

/** Attribute list of one start tag: append-only parallel arrays, duplicate
  * names dropped (first wins), names already ASCII-lowercased by the
  * tokenizer. Mirrors the role of the reference's HtmlAttributes
  * (reference: Core/HtmlAttributes.cs:39-640) with a plain Scala shape.
  */
final class AttrList {
  val names = new ArrayBuffer[String](5)
  val values = new ArrayBuffer[String](5)

  /** Returns false (and drops) when the name already exists. */
  def add(name: String, value: String): Boolean = {
    var i = 0
    while (i < names.length) {
      if (names(i) == name) return false
      i += 1
    }
    names += name
    values += value
    true
  }

  def get(name: String): String = {
    var i = 0
    while (i < names.length) {
      if (names(i) == name) return values(i)
      i += 1
    }
    null
  }

  def contains(name: String): Boolean = get(name) != null
  def size: Int = names.length
  def nameAt(i: Int): String = names(i)
  def valueAt(i: Int): String = values(i)
  def isEmpty: Boolean = names.isEmpty

  /** Structural equality for the Noah's-Ark clause (same name set with same
    * values; order-insensitive, like the reference's HtmlAttributes.Equals
    * at Core/HtmlAttributes.cs:561-594). */
  def sameAs(other: AttrList): Boolean = {
    if (other.size != size) return false
    var i = 0
    while (i < names.length) {
      val v = other.get(names(i))
      if (v == null || v != values(i)) return false
      i += 1
    }
    true
  }

  def cloneAttrs(): AttrList = {
    val c = new AttrList
    var i = 0
    while (i < names.length) { c.names += names(i); c.values += values(i); i += 1 }
    c
  }

  /** In-place rename for foreign-content attribute adjustment. */
  def rename(i: Int, newName: String): Unit = names(i) = newName
}

object AttrList { val Empty = new AttrList }

/** Push-based token consumer (the reference's ITokenListener shape,
  * Common/ITokenListener.cs:34-123, re-expressed). The tokenizer calls these
  * synchronously; the tree builder may switch the tokenizer's content model
  * from inside a callback (title→RCDATA etc.).
  */
trait TokenSink {
  def doctype(name: String, publicId: String, systemId: String,
              forceQuirks: Boolean): Unit
  def startTag(name: String, attrs: AttrList, selfClosing: Boolean): Unit
  def endTag(name: String): Unit
  def comment(text: String): Unit
  /** A run of character tokens: buf[start until end). */
  def characters(buf: Array[Char], start: Int, end: Int): Unit
  def eof(): Unit
  /** Parse error hook (code only — messages cost allocations). */
  def parseError(code: String): Unit = ()
  /** True when the adjusted current node is in foreign content (CDATA ok). */
  def cdataAllowed: Boolean = false
}
