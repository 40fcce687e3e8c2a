package graft.kernel.pdf

import PdfParser._

/**
 * Font-aware string decoding for text extraction (the part of PyMuPDF's
 * `page.get_text()` — consumed at /root/reference/src/processor.py:484 —
 * that turns show-string bytes into unicode):
 *
 *  - /ToUnicode CMap streams (bfchar + bfrange, 1- and 2-byte codespaces)
 *    take precedence when present — the spec-blessed extraction path;
 *  - simple fonts: /Encoding as a name (WinAnsiEncoding and
 *    MacRomanEncoding fully mapped per PDF 32000 Annex D,
 *    StandardEncoding ~ ASCII) or a dict with /BaseEncoding +
 *    /Differences over an Adobe-glyph-list subset
 *    (incl. uniXXXX / uXXXX[XX] names);
 *  - Type0 (composite) fonts: 2-byte codes (Identity-H assumption), decoded
 *    through the ToUnicode CMap; without a CMap the codes are unmappable
 *    and skipped;
 *  - fonts with none of the above keep the legacy latin-1/BOM decode, so
 *    pre-existing fixtures remain byte-identical.
 */
object Fonts {

  /** One decoded show-string: text plus the advance-width inputs the
    * interpreter needs (PDF 9.4.4): sum of glyph widths in glyph-space
    * thousandths, glyph count (for Tc) and single-byte-code-32 count
    * (for Tw). */
  final case class DecodedRun(text: String, widthSum: Double,
                              glyphs: Int, spaces: Int)

  /** Decoder for one font's show-string bytes. Width sources, in the spec's
    * order: simple fonts /FirstChar + /Widths (+ /MissingWidth from the
    * descriptor for out-of-range codes); Type0 fonts the descendant CIDFont
    * /W ranges with /DW default 1000. Fonts carrying no width info report
    * hasWidths=false and a flat 500/glyph estimate (the interpreter's
    * legacy assumption — explicit positioning dominates there). */
  final class FontDecoder(val twoByte: Boolean,
                          toUnicode: java.util.HashMap[Integer, String],
                          simple: Array[String],
                          widths: Array[Double] = null,
                          cidWidths: java.util.HashMap[Integer, java.lang.Double] = null,
                          missingWidth: Double = 0.0,
                          defaultWidth: Double = 1000.0) {
    val hasWidths: Boolean = widths != null || cidWidths != null

    private def widthOf(code: Int): Double =
      if (widths != null) {
        val w = if (code >= 0 && code < widths.length) widths(code) else -1.0
        if (w >= 0) w else missingWidth
      } else if (cidWidths != null) {
        val w = cidWidths.get(code)
        if (w != null) w.doubleValue() else defaultWidth
      } else 500.0

    def decode(bytes: Array[Byte]): String = decodeRun(bytes).text

    def decodeRun(bytes: Array[Byte]): DecodedRun = {
      val sb = new java.lang.StringBuilder(bytes.length)
      var widthSum = 0.0
      var glyphs = 0
      var spaces = 0
      if (twoByte) {
        var i = 0
        while (i + 1 < bytes.length) {
          val code = ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF)
          val u = if (toUnicode != null) toUnicode.get(code) else null
          if (u != null) sb.append(u)
          widthSum += widthOf(code)
          glyphs += 1
          i += 2
        }
      } else if (toUnicode == null && simple == null && bytes.length >= 2 &&
                 (bytes(0) & 0xFF) == 0xFE && (bytes(1) & 0xFF) == 0xFF) {
        // Width-only font (no /Encoding, no /ToUnicode) showing a
        // BOM-prefixed string: keep the legacy UTF-16BE decode that
        // TextInterp.decodeString applies on the no-decoder path — a
        // per-byte latin-1 walk would emit mojibake here. Widths advance
        // per 2-byte code unit (widthOf falls back to /MissingWidth for
        // codes outside the /Widths range).
        sb.append(new String(bytes, 2, bytes.length - 2,
          java.nio.charset.StandardCharsets.UTF_16BE))
        var i = 2
        while (i + 1 < bytes.length) {
          val code = ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF)
          widthSum += widthOf(code)
          glyphs += 1
          i += 2
        }
      } else {
        var i = 0
        while (i < bytes.length) {
          val code = bytes(i) & 0xFF
          val u = if (toUnicode != null) toUnicode.get(code) else null
          if (u != null) sb.append(u)
          else if (simple != null) { val s = simple(code); if (s != null) sb.append(s) }
          else sb.append(code.toChar) // latin-1 legacy
          widthSum += widthOf(code)
          glyphs += 1
          if (code == 32) spaces += 1 // Tw applies to single-byte code 32 only
          i += 1
        }
      }
      DecodedRun(sb.toString, widthSum, glyphs, spaces)
    }
  }

  /** The legacy (no font info) decoder: UTF-16BE with BOM, else latin-1. */
  val Legacy: FontDecoder = null // sentinel; TextInterp falls back to decodeString

  // ------------------------------------------------------------ encodings
  /** WinAnsiEncoding = cp1252: latin-1 plus the 0x80..0x9F block. */
  private lazy val winAnsi: Array[String] = {
    val t = Array.tabulate[String](256)(i => String.valueOf(i.toChar))
    val block = Map(
      0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192, 0x84 -> 0x201E,
      0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02C6,
      0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039, 0x8C -> 0x0152,
      0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C,
      0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
      0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161, 0x9B -> 0x203A,
      0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)
    block.foreach { case (c, u) => t(c) = String.valueOf(u.toChar) }
    t(0x81) = null; t(0x8D) = null; t(0x8F) = null; t(0x90) = null; t(0x9D) = null
    t
  }

  /** StandardEncoding approximation for extraction: ASCII identity; bytes
    * above 0x7F unmapped (real StandardEncoding upper half differs from
    * latin-1 and is rare in body text). */
  private lazy val standard: Array[String] = {
    val t = new Array[String](256)
    (0x20 to 0x7E).foreach(i => t(i) = String.valueOf(i.toChar))
    t('\n') = "\n"; t('\r') = "\r"; t('\t') = "\t"
    t
  }

  /** MacRomanEncoding, exact per PDF 32000 Annex D.2 / Mac OS Roman:
    * one string per 16-code row of the upper half. Deliberate choices the
    * old approximation got wrong: 0xDB is CURRENCY SIGN (PDF's
    * MacRomanEncoding predates the Mac OS euro revision), 0xF0 is the
    * Apple logo (AGLFN "apple" -> U+F8FF private use) — the old table
    * omitted it and shifted 0xF1..0xFF down by one. 0xCA is the no-break
    * space, extracted as U+00A0. */
  private lazy val macRoman: Array[String] = {
    val t = standard.clone()
    val rows = Seq(
      "ÄÅÇÉÑÖÜáàâäãåçéè", // 0x80
      "êëíìîïñóòôöõúùûü", // 0x90
      "†°¢£§•¶ß®©™´¨≠ÆØ", // 0xA0
      "∞±≤≥¥µ∂∑∏π∫ªºΩæø", // 0xB0
      "¿¡¬√ƒ≈∆«»… ÀÃÕŒœ", // 0xC0
      "–—“”‘’÷◊ÿŸ⁄¤‹›ﬁﬂ", // 0xD0
      "‡·‚„‰ÂÊÁËÈÍÎÏÌÓÔ", // 0xE0
      "ÒÚÛÙıˆ˜¯˘˙˚¸˝˛ˇ") // 0xF0
    rows.zipWithIndex.foreach { case (row, r) =>
      require(row.length == 16, s"MacRoman row $r has ${row.length} entries")
      (0 until 16).foreach(i => t(0x80 + r * 16 + i) = String.valueOf(row.charAt(i)))
    }
    t
  }

  // --------------------------------------------------- Adobe glyph list (subset)
  /** Curated AGL subset: ASCII names, Latin-1 accents, common typographic
    * glyphs, ligatures — the names that actually appear in real-world
    * /Differences arrays. uniXXXX / uXXXX.. names are parsed structurally. */
  private lazy val glyphList: Map[String, String] = {
    val m = Map.newBuilder[String, String]
    // ASCII letters and digits name themselves
    ('a' to 'z').foreach(c => m += c.toString -> c.toString)
    ('A' to 'Z').foreach(c => m += c.toString -> c.toString)
    val digits = Seq("zero", "one", "two", "three", "four", "five", "six",
      "seven", "eight", "nine")
    digits.zipWithIndex.foreach { case (n, i) => m += n -> i.toString }
    m ++= Seq(
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
      "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
      "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
      "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
      "greater" -> ">", "question" -> "?", "at" -> "@", "bracketleft" -> "[",
      "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
      "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
      "braceright" -> "}", "asciitilde" -> "~",
      "quoteleft" -> "‘", "quoteright" -> "’",
      "quotedblleft" -> "“", "quotedblright" -> "”",
      "quotesinglbase" -> "‚", "quotedblbase" -> "„",
      "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
      "ellipsis" -> "…", "dagger" -> "†", "daggerdbl" -> "‡",
      "perthousand" -> "‰", "guilsinglleft" -> "‹", "guilsinglright" -> "›",
      "guillemotleft" -> "«", "guillemotright" -> "»",
      "fi" -> "ﬁ", "fl" -> "ﬂ", "florin" -> "ƒ",
      "cent" -> "¢", "sterling" -> "£", "yen" -> "¥",
      "Euro" -> "€", "currency" -> "¤", "section" -> "§",
      "paragraph" -> "¶", "copyright" -> "©", "registered" -> "®",
      "trademark" -> "™", "degree" -> "°", "plusminus" -> "±",
      "multiply" -> "×", "divide" -> "÷", "onehalf" -> "½",
      "onequarter" -> "¼", "threequarters" -> "¾",
      "exclamdown" -> "¡", "questiondown" -> "¿",
      "brokenbar" -> "¦", "logicalnot" -> "¬", "micro" -> "µ",
      "periodcentered" -> "·", "middot" -> "·", "nbspace" -> " ",
      "dotlessi" -> "ı", "circumflex" -> "ˆ", "caron" -> "ˇ",
      "tilde" -> "˜", "breve" -> "˘", "dotaccent" -> "˙",
      "ring" -> "˚", "cedilla" -> "¸", "hungarumlaut" -> "˝",
      "ogonek" -> "˛", "macron" -> "¯")
    // Latin-1 accented letters: agrave..ydieresis and uppercase
    val latin1 = Seq(
      "Agrave" -> 0xC0, "Aacute" -> 0xC1, "Acircumflex" -> 0xC2, "Atilde" -> 0xC3,
      "Adieresis" -> 0xC4, "Aring" -> 0xC5, "AE" -> 0xC6, "Ccedilla" -> 0xC7,
      "Egrave" -> 0xC8, "Eacute" -> 0xC9, "Ecircumflex" -> 0xCA, "Edieresis" -> 0xCB,
      "Igrave" -> 0xCC, "Iacute" -> 0xCD, "Icircumflex" -> 0xCE, "Idieresis" -> 0xCF,
      "Eth" -> 0xD0, "Ntilde" -> 0xD1, "Ograve" -> 0xD2, "Oacute" -> 0xD3,
      "Ocircumflex" -> 0xD4, "Otilde" -> 0xD5, "Odieresis" -> 0xD6,
      "Oslash" -> 0xD8, "Ugrave" -> 0xD9, "Uacute" -> 0xDA, "Ucircumflex" -> 0xDB,
      "Udieresis" -> 0xDC, "Yacute" -> 0xDD, "Thorn" -> 0xDE, "germandbls" -> 0xDF,
      "agrave" -> 0xE0, "aacute" -> 0xE1, "acircumflex" -> 0xE2, "atilde" -> 0xE3,
      "adieresis" -> 0xE4, "aring" -> 0xE5, "ae" -> 0xE6, "ccedilla" -> 0xE7,
      "egrave" -> 0xE8, "eacute" -> 0xE9, "ecircumflex" -> 0xEA, "edieresis" -> 0xEB,
      "igrave" -> 0xEC, "iacute" -> 0xED, "icircumflex" -> 0xEE, "idieresis" -> 0xEF,
      "eth" -> 0xF0, "ntilde" -> 0xF1, "ograve" -> 0xF2, "oacute" -> 0xF3,
      "ocircumflex" -> 0xF4, "otilde" -> 0xF5, "odieresis" -> 0xF6,
      "oslash" -> 0xF8, "ugrave" -> 0xF9, "uacute" -> 0xFA, "ucircumflex" -> 0xFB,
      "udieresis" -> 0xFC, "yacute" -> 0xFD, "thorn" -> 0xFE, "ydieresis" -> 0xFF,
      "Scaron" -> 0x160, "scaron" -> 0x161, "Zcaron" -> 0x17D, "zcaron" -> 0x17E,
      "OE" -> 0x152, "oe" -> 0x153, "Ydieresis" -> 0x178)
    latin1.foreach { case (nm, cp) => m += nm -> String.valueOf(cp.toChar) }
    m.result()
  }

  /** Glyph name -> unicode string; handles uniXXXX / uXXXX[XX] structurally. */
  def glyphToUnicode(name: String): Option[String] = {
    glyphList.get(name).orElse {
      if (name.startsWith("uni") && name.length >= 7) {
        try {
          // uniXXXX(YYYY)* — concatenated UTF-16 code units
          val hex = name.substring(3)
          if (hex.length % 4 == 0 && hex.forall(c => Character.digit(c, 16) >= 0)) {
            val sb = new java.lang.StringBuilder
            hex.grouped(4).foreach(g => sb.append(Integer.parseInt(g, 16).toChar))
            Some(sb.toString)
          } else None
        } catch { case _: Exception => None }
      } else if (name.startsWith("u") && name.length >= 5 && name.length <= 7 &&
        name.substring(1).forall(c => Character.digit(c, 16) >= 0)) {
        try Some(new String(Character.toChars(Integer.parseInt(name.substring(1), 16))))
        catch { case _: Exception => None }
      } else None
    }
  }

  private def baseTable(name: String): Array[String] = name match {
    case "WinAnsiEncoding" => winAnsi.clone()
    case "MacRomanEncoding" => macRoman.clone()
    case "StandardEncoding" => standard.clone()
    case _ => null
  }

  /** Simple-font per-code advance widths: /FirstChar + /Widths, with
    * /MissingWidth from the /FontDescriptor for out-of-range codes.
    * Returns (table or null, missingWidth). */
  private def simpleWidths(font: PDict, resolve: Obj => Obj): (Array[Double], Double) = {
    val missing = resolve(font.get("FontDescriptor").getOrElse(PNull)) match {
      case d: PDict => resolve(d.get("MissingWidth").getOrElse(PNull)) match {
        case PNum(v) => v
        case _ => 0.0
      }
      case _ => 0.0
    }
    val first = resolve(font.get("FirstChar").getOrElse(PNull)) match {
      case PNum(v) => v.toInt
      case _ => -1
    }
    val table = resolve(font.get("Widths").getOrElse(PNull)) match {
      case PArr(items) if first >= 0 && first < 256 =>
        val t = Array.fill(256)(-1.0)
        items.zipWithIndex.foreach { case (it, i) =>
          val code = first + i
          if (code < 256) resolve(it) match {
            case PNum(v) => t(code) = v
            case _ =>
          }
        }
        t
      case _ => null
    }
    (table, missing)
  }

  /** CIDFont /W array -> per-CID width map (PDF 9.7.4.3): entries are either
    * `c [w1 w2 ...]` (consecutive CIDs from c) or `cFirst cLast w`. */
  private[pdf] def parseCidWidths(items: Seq[Obj], resolve: Obj => Obj)
      : java.util.HashMap[Integer, java.lang.Double] = {
    val m = new java.util.HashMap[Integer, java.lang.Double]()
    var i = 0
    def numAt(j: Int): Option[Double] = resolve(items(j)) match {
      case PNum(v) => Some(v)
      case _ => None
    }
    while (i < items.length) {
      resolve(items(i)) match {
        case PNum(c) =>
          if (i + 1 < items.length) resolve(items(i + 1)) match {
            case PArr(ws) =>
              ws.zipWithIndex.foreach { case (w, k) =>
                resolve(w) match {
                  case PNum(v) if c.toInt + k >= 0 => m.put(c.toInt + k, v)
                  case _ =>
                }
              }
              i += 2
            case PNum(cLast) =>
              if (i + 2 < items.length) {
                numAt(i + 2).foreach { w =>
                  var cid = c.toInt
                  val last = math.min(cLast.toInt, cid + 65535) // bound hostile ranges
                  while (cid <= last) { m.put(cid, w); cid += 1 }
                }
                i += 3
              } else i = items.length
            case _ => i += 2
          } else i = items.length
        case _ => i += 1
      }
    }
    m
  }

  /** Build a decoder from a font dict. `resolve` dereferences; `decode`
    * runs the stream filter chain. Returns null (= legacy latin-1/BOM
    * behavior) when the font carries no usable decode information. */
  def fromDict(font: PDict, resolve: Obj => Obj,
               decode: PStream => Option[Array[Byte]]): FontDecoder = {
    val subtype = resolve(font.get("Subtype").getOrElse(PNull)) match {
      case PName(s) => s
      case _ => ""
    }
    val isType0 = subtype == "Type0"
    val toUni: java.util.HashMap[Integer, String] =
      resolve(font.get("ToUnicode").getOrElse(PNull)) match {
        case s: PStream => decode(s).map(parseToUnicodeCMap).orNull
        case _ => null
      }
    if (isType0) {
      // composite font: 2-byte codes (Identity-H assumption — code == CID).
      // Without a ToUnicode CMap the codes are glyph ids we cannot map.
      // Widths come from the descendant CIDFont's /W with /DW default 1000.
      val (cidW, dw) = resolve(font.get("DescendantFonts").getOrElse(PNull)) match {
        case PArr(ds) if ds.nonEmpty =>
          resolve(ds.head) match {
            case d: PDict =>
              val dw = resolve(d.get("DW").getOrElse(PNull)) match {
                case PNum(v) => v
                case _ => 1000.0
              }
              val w = resolve(d.get("W").getOrElse(PNull)) match {
                case PArr(items) => parseCidWidths(items, resolve)
                case _ => null
              }
              (w, dw)
            case _ => (null, 1000.0)
          }
        case _ => (null, 1000.0)
      }
      return new FontDecoder(twoByte = true, toUni, null,
        cidWidths = cidW, defaultWidth = dw)
    }
    val (widthTable, missingW) = simpleWidths(font, resolve)
    val enc = resolve(font.get("Encoding").getOrElse(PNull))
    val simple: Array[String] = enc match {
      case PName(n) => baseTable(n)
      case d: PDict =>
        val base = resolve(d.get("BaseEncoding").getOrElse(PNull)) match {
          case PName(n) => Option(baseTable(n))
          case _ => None
        }
        // /Differences over latin-1 identity when no base is named: latin-1
        // is this engine's legacy assumption, so untouched codes behave as
        // before and only the remapped codes change.
        val t = base.getOrElse(Array.tabulate[String](256)(i => String.valueOf(i.toChar)))
        resolve(d.get("Differences").getOrElse(PNull)) match {
          case PArr(items) =>
            var code = 0
            items.foreach { it =>
              resolve(it) match {
                case PNum(v) => code = v.toInt
                case PName(g) =>
                  if (code >= 0 && code < 256) {
                    t(code) = glyphToUnicode(g).orNull
                    code += 1
                  }
                case _ =>
              }
            }
          case _ =>
        }
        t
      case _ => null
    }
    if (toUni == null && simple == null && widthTable == null) null
    else new FontDecoder(twoByte = false, toUni, simple,
      widths = widthTable, missingWidth = missingW)
  }

  // --------------------------------------------------------- ToUnicode CMap
  /** Parse a ToUnicode CMap stream: bfchar and bfrange sections. Codes are
    * keyed by integer value (1- and 2-byte sources share the map; the
    * decoder picks stride by font type). Destination hex strings are
    * UTF-16BE, possibly multi-code-unit. */
  def parseToUnicodeCMap(data: Array[Byte]): java.util.HashMap[Integer, String] = {
    val map = new java.util.HashMap[Integer, String]()
    val lex = new Lexer(data)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Obj]
    def codeOf(o: Obj): Int = o match {
      case PStr(b) =>
        var v = 0
        b.foreach(x => v = (v << 8) | (x & 0xFF))
        v
      case PNum(v) => v.toInt
      case _ => -1
    }
    def strOf(o: Obj): String = o match {
      case PStr(b) => new String(b, java.nio.charset.StandardCharsets.UTF_16BE)
      case _ => ""
    }
    var guard = 0
    while (lex.pos < lex.n && guard < 2000000) {
      guard += 1
      lex.skipWs()
      if (lex.pos >= lex.n) ()
      else {
        val c = lex.peek
        if (c == '<' || c == '(' || c == '[' || c == '/' || c == '+' || c == '-' ||
          c == '.' || (c >= '0' && c <= '9')) {
          stack += lex.parseObj()
          if (stack.length > 256) stack.remove(0, stack.length - 256)
        } else {
          val tok = lex.readToken()
          if (tok.isEmpty) lex.pos += 1
          else tok match {
            case "beginbfchar" =>
              var going = true
              while (going && lex.pos < lex.n) {
                lex.skipWs()
                if (lex.peek == '<') {
                  val src = lex.parseObj()
                  lex.skipWs()
                  val dst = lex.parseObj()
                  val code = codeOf(src)
                  if (code >= 0) map.put(code, strOf(dst))
                } else {
                  val t = lex.readToken()
                  if (t == "endbfchar" || t.isEmpty) going = false
                }
              }
            case "beginbfrange" =>
              var going = true
              while (going && lex.pos < lex.n) {
                lex.skipWs()
                if (lex.peek == '<') {
                  val lo = codeOf(lex.parseObj())
                  lex.skipWs()
                  val hi = codeOf(lex.parseObj())
                  lex.skipWs()
                  val dst = lex.parseObj()
                  if (lo >= 0 && hi >= lo && hi - lo < 65536) {
                    dst match {
                      case PArr(items) =>
                        items.zipWithIndex.foreach { case (it, i) =>
                          if (lo + i <= hi) map.put(lo + i, strOf(it))
                        }
                      case s: PStr =>
                        val base = strOf(s)
                        var i = 0
                        while (lo + i <= hi) {
                          val shifted =
                            if (base.isEmpty) ""
                            else base.substring(0, base.length - 1) +
                              (base.charAt(base.length - 1) + i).toChar
                          map.put(lo + i, shifted)
                          i += 1
                        }
                      case _ =>
                    }
                  }
                } else {
                  val t = lex.readToken()
                  if (t == "endbfrange" || t.isEmpty) going = false
                }
              }
            case _ =>
              stack.clear()
          }
        }
      }
    }
    map
  }
}
