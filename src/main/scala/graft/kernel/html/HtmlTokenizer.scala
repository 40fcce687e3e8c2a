package graft.kernel.html

import scala.collection.mutable

/**
 * Streaming HTML tag tokenizer: single pass over the decoded page string,
 * no DOM materialization (north-star: "jsoup-style DOM build reimplemented
 * as a streaming tag tokenizer"). Built from scratch on the HTML5 tokenizer
 * state machine (simplified to the states that affect text extraction):
 * Data / TagOpen / TagName / Attributes (quoted values may contain '>') /
 * RawText (script, style, textarea, title) / Comment / Doctype-Bogus.
 *
 * The reference has no HTML parser at all — it reads .html files as plain
 * text (/root/reference/src/settings.py:58 routes .html into
 * TEXT_EXTRACT_EXTENSIONS, consumed by src/processor.py:799-802) — so this
 * capability is new, specified by BASELINE.json north_star, with
 * self-defined goldens.
 *
 * Events are pushed to a sink; the tokenizer never throws on arbitrary
 * input (property-tested), it just keeps scanning.
 */
object HtmlTokenizer {

  trait Sink {
    def text(s: String, rawtext: Boolean): Unit
    def startTag(name: String, selfClosing: Boolean): Unit
    def endTag(name: String): Unit
    /** Start tag with the element's class+id attribute values (lowercased,
      * space-joined, "" when absent) — the boilerplate-hint channel. The
      * default forwards to the 2-arg form so existing sinks are untouched. */
    def startTag(name: String, selfClosing: Boolean, classId: String): Unit =
      startTag(name, selfClosing)
  }

  /** Elements whose content is raw text until the matching close tag. */
  private val RawTextTags = Set("script", "style", "textarea", "title", "xmp", "noscript")

  private val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®", "deg" -> "°",
    "plusmn" -> "±", "middot" -> "·", "laquo" -> "«", "raquo" -> "»",
    "szlig" -> "ß", "agrave" -> "à", "aacute" -> "á", "auml" -> "ä",
    "eacute" -> "é", "egrave" -> "è", "iacute" -> "í", "ouml" -> "ö",
    "oacute" -> "ó", "uacute" -> "ú", "uuml" -> "ü", "ntilde" -> "ñ",
    "ccedil" -> "ç", "Auml" -> "Ä", "Ouml" -> "Ö", "Uuml" -> "Ü",
    "ndash" -> "–", "mdash" -> "—", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "bull" -> "•", "hellip" -> "…",
    "prime" -> "′", "euro" -> "€", "trade" -> "™", "times" -> "×",
    "divide" -> "÷", "minus" -> "−", "larr" -> "←", "uarr" -> "↑",
    "rarr" -> "→", "darr" -> "↓", "sect" -> "§", "para" -> "¶",
    "dagger" -> "†", "Dagger" -> "‡", "permil" -> "‰", "shy" -> "­",
    "pound" -> "£", "yen" -> "¥", "cent" -> "¢", "curren" -> "¤",
    "iexcl" -> "¡", "iquest" -> "¿", "frac12" -> "½", "frac14" -> "¼",
    "frac34" -> "¾", "sup1" -> "¹", "sup2" -> "²", "sup3" -> "³")

  /** Decode &name; / &#d; / &#xhh; entities in `s` (missing ';' tolerated for
    * numeric forms, as browsers do). Unknown entities pass through verbatim. */
  def decodeEntities(s: String): String = {
    var amp = s.indexOf('&')
    if (amp < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        var matched = false
        if (i + 2 < s.length && s.charAt(i + 1) == '#') {
          var j = i + 2
          var hex = false
          if (j < s.length && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) { hex = true; j += 1 }
          val start = j
          while (j < s.length && j - start < 8 &&
            (if (hex) Character.digit(s.charAt(j), 16) >= 0 else Character.isDigit(s.charAt(j)))) j += 1
          if (j > start) {
            try {
              val cp = Integer.parseInt(s.substring(start, j), if (hex) 16 else 10)
              if (cp > 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF)) {
                sb.appendCodePoint(cp)
                i = if (j < s.length && s.charAt(j) == ';') j + 1 else j
                matched = true
              }
            } catch { case _: NumberFormatException => }
          }
        } else {
          var j = i + 1
          while (j < s.length && j - i <= 10 && Character.isLetterOrDigit(s.charAt(j))) j += 1
          if (j < s.length && s.charAt(j) == ';') {
            NamedEntities.get(s.substring(i + 1, j)) match {
              case Some(rep) => sb.append(rep); i = j + 1; matched = true
              case None =>
            }
          }
        }
        if (!matched) { sb.append('&'); i += 1 }
      }
    }
    sb.toString
  }

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** Tokenize `html`, pushing events into `sink`. Never throws. */
  def tokenize(html: String, sink: Sink): Unit = {
    val n = html.length
    var i = 0
    var textStart = 0

    def flushText(until: Int): Unit =
      if (until > textStart) sink.text(html.substring(textStart, until), rawtext = false)

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!') {
          flushText(i)
          if (html.startsWith("<!--", i)) {
            val end = html.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else { // doctype / CDATA / bogus: skip to '>'
            val end = html.indexOf('>', i + 2)
            i = if (end < 0) n else end + 1
          }
          textStart = i
        } else if (c1 == '?') {
          flushText(i)
          val end = html.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
          textStart = i
        } else if (c1 == '/' && i + 2 < n && isAsciiLetter(html.charAt(i + 2))) {
          flushText(i)
          var j = i + 2
          while (j < n && html.charAt(j) != '>') j += 1
          val raw = html.substring(i + 2, math.min(j, n))
          val name = raw.takeWhile(ch => !Character.isWhitespace(ch)).toLowerCase(java.util.Locale.ROOT)
          sink.endTag(name)
          i = if (j < n) j + 1 else n
          textStart = i
        } else if (isAsciiLetter(c1)) {
          flushText(i)
          // tag name
          var j = i + 1
          while (j < n && (isAsciiLetter(html.charAt(j)) || Character.isDigit(html.charAt(j)) ||
            html.charAt(j) == '-' || html.charAt(j) == ':')) j += 1
          val name = html.substring(i + 1, j).toLowerCase(java.util.Locale.ROOT)
          // attributes: parse name[=value] pairs to '>', honoring quoted
          // values (may contain '>'); only class/id values are captured
          var selfClosing = false
          var done = false
          var classId: java.lang.StringBuilder = null
          while (j < n && !done) {
            val ch = html.charAt(j)
            if (ch == '>') { done = true; j += 1 }
            else if (ch == '/' && j + 1 < n && html.charAt(j + 1) == '>') {
              selfClosing = true; j += 2; done = true
            } else if (Character.isWhitespace(ch) || ch == '/' || ch == '=' ||
              ch == '"' || ch == '\'') {
              // stray value/quote outside an attribute: skip quoted payload
              if (ch == '"' || ch == '\'') {
                var k = j + 1; while (k < n && html.charAt(k) != ch) k += 1
                j = if (k < n) k + 1 else n
              } else j += 1
            } else {
              val ns = j
              while (j < n && { val d = html.charAt(j)
                d != '=' && d != '>' && d != '/' && !Character.isWhitespace(d) }) j += 1
              val aname = html.substring(ns, j)
              var k = j
              while (k < n && Character.isWhitespace(html.charAt(k))) k += 1
              if (k < n && html.charAt(k) == '=') {
                k += 1
                while (k < n && Character.isWhitespace(html.charAt(k))) k += 1
                var vs = k
                var ve = k
                if (k < n && (html.charAt(k) == '"' || html.charAt(k) == '\'')) {
                  val q = html.charAt(k); vs = k + 1; var m = vs
                  while (m < n && html.charAt(m) != q) m += 1
                  ve = m; k = if (m < n) m + 1 else n
                } else {
                  var m = k
                  while (m < n && { val d = html.charAt(m)
                    d != '>' && !Character.isWhitespace(d) }) m += 1
                  ve = m; k = m
                }
                if (aname.equalsIgnoreCase("class") || aname.equalsIgnoreCase("id")) {
                  if (classId == null) classId = new java.lang.StringBuilder
                  if (classId.length > 0) classId.append(' ')
                  var m = vs
                  while (m < ve) { classId.append(Character.toLowerCase(html.charAt(m))); m += 1 }
                }
                j = k
              }
            }
          }
          sink.startTag(name, selfClosing, if (classId == null) "" else classId.toString)
          i = j
          textStart = i
          // RawText mode: consume verbatim until matching close tag
          if (!selfClosing && RawTextTags.contains(name)) {
            val close = "</" + name
            val k = indexOfIgnoreCase(html, close, i)
            val end = if (k < 0) n else k
            if (end > i) sink.text(html.substring(i, end), rawtext = true)
            if (k < 0) { i = n; textStart = n }
            else {
              var m = k + close.length
              while (m < n && html.charAt(m) != '>') m += 1
              sink.endTag(name)
              i = if (m < n) m + 1 else n
              textStart = i
            }
          }
        } else { i += 1 } // stray '<' stays in text
      } else i += 1
    }
    flushText(n)
  }

  private def indexOfIgnoreCase(hay: String, needleLower: String, from: Int): Int = {
    val n = hay.length
    val m = needleLower.length
    var i = from
    while (i + m <= n) {
      var j = 0
      while (j < m && Character.toLowerCase(hay.charAt(i + j)) == needleLower.charAt(j)) j += 1
      if (j == m) return i
      i += 1
    }
    -1
  }
}
