package graft.kernel

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}

/**
 * Reference-exact text kernel: the byte-level text operators of the reference
 * worker (see /root/reference), re-expressed as pure JVM functions that run
 * inside `mapPartitions` on executors.
 *
 * Python→JVM byte-identity traps handled here (SURVEY.md §2.10):
 *   - all counting/slicing is by Unicode CODE POINT, not UTF-16 unit;
 *   - `str.isprintable()` / `str.isspace()` are reimplemented from the Unicode
 *     category definitions (Java has no built-in equivalent);
 *   - strict UTF-8 detection uses a REPORT-mode decoder (Java's default
 *     String(bytes, UTF_8) silently replaces malformed input);
 *   - latin-1 decoding is total and never fails.
 *
 * Reference evidence (files under /root/reference):
 *   - decode w/ fallback: src/processor.py:648-665 (extract_text_from_file)
 *   - fallback gate:      src/processor.py:676-713 (extract_text_fallback)
 *   - truncation:         src/text_limits.py:5-16
 *   - sanitize:           src/uploader.py:159-172
 *   - NUL strip:          src/processor.py:490,508,621,706
 *   - page join:          src/processor.py:479-496
 */
object TextKernel {

  /** Config mirroring the reference defaults (src/settings.py:45-49,
    * env.example MAX_TEXT_LENGTH=0 => unlimited). */
  final case class Config(
      maxTextLength: Option[Int] = None, // None = unlimited (reference default)
      fallbackMaxSize: Int = 204800,     // TEXT_FALLBACK_MAX_SIZE
      fallbackMinPrintable: Double = 0.99 // TEXT_FALLBACK_MIN_PRINTABLE
  )
  val defaultConfig: Config = Config()

  // ---------------------------------------------------------------------
  // Unicode predicates (Python parity)
  // ---------------------------------------------------------------------

  /** Python `str.isspace()` for one code point: bidi classes WS/B/S
    * (0x09-0x0D, 0x1C-0x1F, 0x20, 0x85) plus categories Zs/Zl/Zp. */
  def pyIsSpace(cp: Int): Boolean = {
    if ((cp >= 0x09 && cp <= 0x0D) || cp == 0x20 || (cp >= 0x1C && cp <= 0x1F) || cp == 0x85) true
    else if (cp < 0x80) false
    else Character.getType(cp) match {
      case Character.SPACE_SEPARATOR | Character.LINE_SEPARATOR | Character.PARAGRAPH_SEPARATOR => true
      case _ => false
    }
  }

  /** Python `str.isprintable()` for one code point: false iff category in
    * {Cc, Cf, Cs, Co, Cn, Zl, Zp} or (Zs and cp != U+0020). */
  def pyIsPrintable(cp: Int): Boolean = Character.getType(cp) match {
    case Character.CONTROL | Character.FORMAT | Character.SURROGATE |
        Character.PRIVATE_USE | Character.UNASSIGNED |
        Character.LINE_SEPARATOR | Character.PARAGRAPH_SEPARATOR => false
    case Character.SPACE_SEPARATOR => cp == 0x20
    case _ => true
  }

  /** Python `str.strip()` (no args): strip leading/trailing pyIsSpace code
    * points. Java's `trim` (<=U+0020 only) and `strip` (isWhitespace, which
    * excludes NBSP) both differ — NBSP *is* stripped by Python. */
  def pyStrip(s: String): String = {
    var i = 0
    val n = s.length
    while (i < n && pyIsSpace(s.codePointAt(i))) i += Character.charCount(s.codePointAt(i))
    var j = n
    while (j > i) {
      val cp = s.codePointBefore(j)
      if (!pyIsSpace(cp)) return s.substring(i, j)
      j -= Character.charCount(cp)
    }
    s.substring(i, j)
  }

  /** Python truthiness of `s.strip()` — "has any non-whitespace code point". */
  def hasContent(s: String): Boolean = {
    if (s == null) return false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (!pyIsSpace(cp)) return true
      i += Character.charCount(cp)
    }
    false
  }

  /** Python `len(s)` — code point count. */
  def cpLength(s: String): Int = s.codePointCount(0, s.length)

  // ---------------------------------------------------------------------
  // T5: truncate_text (src/text_limits.py:13-16) — s[:cap] by code points
  // ---------------------------------------------------------------------
  def truncate(s: String, cap: Option[Int]): String = cap match {
    case None => s
    case Some(c) =>
      if (c <= 0) s // cap<=0 never reaches here in reference (mapped to None), defensive
      else if (s.codePointCount(0, s.length) <= c) s
      else s.substring(0, s.offsetByCodePoints(0, c))
  }

  // ---------------------------------------------------------------------
  // T7: NUL strip (src/processor.py:490 etc.) — replace('\x00','')
  // ---------------------------------------------------------------------
  def stripNul(s: String): String =
    if (s.indexOf('\u0000') < 0) s else s.replace("\u0000", "")

  // ---------------------------------------------------------------------
  // T6: sanitize_text (src/uploader.py:159-172)
  //   truncate -> NUL strip -> keep only cp in 0x20..0x7E | {09,0A,0D} |
  //   0xA0..0xFFFF. Python char-class ranges over code points, so astral
  //   chars (>= U+10000, incl. emoji) are REMOVED — iterate codePoints,
  //   never a UTF-16 regex.
  // ---------------------------------------------------------------------
  def sanitizeKeep(cp: Int): Boolean =
    (cp >= 0x20 && cp <= 0x7E) || cp == 0x0A || cp == 0x0D || cp == 0x09 ||
      (cp >= 0xA0 && cp <= 0xFFFF)

  def sanitize(text: String, cfg: Config = defaultConfig): String = {
    if (text == null || text.isEmpty) return text
    val t = truncate(text, cfg.maxTextLength)
    // NUL is outside the keep-set anyway; single code-point pass does both.
    val sb = new java.lang.StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      if (sanitizeKeep(cp)) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    if (sb.length == t.length) t else sb.toString
  }

  // ---------------------------------------------------------------------
  // Strict UTF-8 decode (trap 4): detect malformed input like Python's
  // strict codec; returns Right(decoded) or Left(byte offset of error).
  // ---------------------------------------------------------------------
  def decodeUtf8Strict(bytes: Array[Byte]): Either[Int, String] = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try Right(dec.decode(ByteBuffer.wrap(bytes)).toString)
    catch {
      case _: CharacterCodingException =>
        // Find the error offset with a second, position-tracking pass.
        val d2 = StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(CodingErrorAction.REPORT)
          .onUnmappableCharacter(CodingErrorAction.REPORT)
        val in = ByteBuffer.wrap(bytes)
        val out = java.nio.CharBuffer.allocate(bytes.length + 1)
        val res = d2.decode(in, out, true)
        if (res.isError) Left(in.position()) else Left(bytes.length)
    }
  }

  /** latin-1 is total: every byte maps to U+0000..U+00FF. */
  def decodeLatin1(bytes: Array[Byte]): String =
    new String(bytes, StandardCharsets.ISO_8859_1)

  // ---------------------------------------------------------------------
  // Universal-newline translation (Python text mode, PEP 278): the reference
  // opens files with text-mode open(..., "r", encoding=...) at
  // src/processor.py:656,659, so \r\n and lone \r become \n BEFORE any
  // cap/strip — byte-identity requires reproducing it.
  // ---------------------------------------------------------------------
  def translateNewlines(s: String): String = {
    if (s.indexOf('\r') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\r') {
        sb.append('\n')
        if (i + 1 < s.length && s.charAt(i + 1) == '\n') i += 1
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  // ---------------------------------------------------------------------
  // T3: extract_text_from_file (src/processor.py:648-665)
  //   text-mode open utf-8; on UnicodeDecodeError reread latin-1; read at
  //   most `cap` characters (code points, counted AFTER universal-newline
  //   translation); None if blank.
  //
  //   Capped-read decode-error semantics match CPython's io.TextIOWrapper:
  //   the wrapper consumes 8 KiB byte chunks and decodes each chunk eagerly,
  //   so read(cap) raises iff a malformed byte lies within a consumed chunk
  //   (verified empirically: error at byte 8190 raises for cap=5, error at
  //   byte 8193 does not).
  // ---------------------------------------------------------------------
  private val TextIoChunk = 8192 // CPython io.TextIOWrapper chunk size

  /** io.TextIOWrapper(..., encoding=utf-8).read(cap): Right(text of exactly
    * min(cap, available) translated code points) or Left(()) on a
    * UnicodeDecodeError within the consumed chunks. */
  private def readTextModeUtf8(bytes: Array[Byte], cap: Int): Either[Unit, String] = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val in = ByteBuffer.wrap(bytes)
    val out = java.nio.CharBuffer.allocate(TextIoChunk + 8)
    val sb = new java.lang.StringBuilder(math.min(bytes.length, cap * 2))
    var cpCount = 0          // translated code points accumulated
    var pendingCr = false    // stateful \r at chunk boundary (IncrementalNewlineDecoder)
    var consumed = 0
    while (cpCount < cap && consumed < bytes.length) {
      val chunkEnd = math.min(bytes.length, consumed + TextIoChunk)
      in.limit(chunkEnd)
      out.clear()
      // cpCount is computed in exactly one place (a held \r counts as the
      // one code point it will eventually materialize as) so the overflow
      // and normal paths can never disagree on the cap test
      def recount(): Unit =
        cpCount = sb.codePointCount(0, sb.length) + (if (pendingCr) 1 else 0)
      var res = dec.decode(in, out, false)
      while (res.isOverflow) { // chunk produced more chars than buffer — grow via flush-to-sb
        out.flip()
        pendingCr = appendTranslated(sb, out, pendingCr); recount()
        out.clear()
        res = dec.decode(in, out, false)
      }
      if (res.isError) return Left(())
      out.flip()
      pendingCr = appendTranslated(sb, out, pendingCr)
      recount()
      consumed = chunkEnd
    }
    if (consumed >= bytes.length) {
      in.limit(bytes.length)
      out.clear()
      val res = dec.decode(in, out, true)
      if (res.isError) return Left(())
      dec.flush(out)
      out.flip()
      pendingCr = appendTranslated(sb, out, pendingCr)
    }
    if (pendingCr) sb.append('\n') // EOF flushes a held \r as \n
    val s = sb.toString
    Right(truncate(s, Some(cap)))
  }

  /** Append `buf` to `sb` with \r\n / \r -> \n translation; `heldCr` is a
    * \r seen at the end of the previous buffer. Returns whether a \r is now
    * held (last char of this buffer). */
  private def appendTranslated(sb: java.lang.StringBuilder, buf: java.nio.CharBuffer,
                               heldCr: Boolean): Boolean = {
    var held = heldCr
    var i = 0
    val n = buf.length
    while (i < n) {
      val c = buf.charAt(i)
      if (held) {
        sb.append('\n')
        held = false
        if (c == '\n') { i += 1 } // swallow the \n of a split \r\n
        else ()
      } else if (c == '\r') {
        if (i + 1 < n) {
          sb.append('\n')
          if (buf.charAt(i + 1) == '\n') i += 1
          i += 1
        } else { held = true; i += 1 }
      } else { sb.append(c); i += 1 }
    }
    held
  }

  def extractTextFromFile(bytes: Array[Byte], cfg: Config = defaultConfig): Option[String] = {
    val cap = cfg.maxTextLength
    val text = cap match {
      case None =>
        decodeUtf8Strict(bytes) match {
          case Right(full) => translateNewlines(full)
          case Left(_)     => translateNewlines(decodeLatin1(bytes))
        }
      case Some(c) =>
        readTextModeUtf8(bytes, c) match {
          case Right(s) => s
          case Left(_)  => // latin-1 is total: read(cap) can't fail on reread
            truncate(translateNewlines(decodeLatin1(bytes)), Some(c))
        }
    }
    if (hasContent(text)) Some(text) else None
  }

  // ---------------------------------------------------------------------
  // T4: extract_text_fallback (src/processor.py:676-713)
  //   reject size > fallbackMaxSize; read min(size, cap) BYTES; reject raw
  //   NUL byte; decode utf-8 -> latin-1; reject blank; printable ratio
  //   (isprintable or \n\r\t) >= 0.99 over code points; strip NUL chars.
  // ---------------------------------------------------------------------
  def printableRatio(text: String): Double = {
    if (text.isEmpty) return 0.0
    var printable = 0L
    var total = 0L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (pyIsPrintable(cp) || cp == 0x0A || cp == 0x0D || cp == 0x09) printable += 1
      total += 1
      i += Character.charCount(cp)
    }
    printable.toDouble / total.toDouble
  }

  def extractTextFallback(bytes: Array[Byte], cfg: Config = defaultConfig): Option[String] = {
    if (bytes.length > cfg.fallbackMaxSize) return None
    val readN = cfg.maxTextLength match {
      case Some(c) => math.min(bytes.length, c)
      case None    => bytes.length
    }
    val raw = if (readN == bytes.length) bytes else java.util.Arrays.copyOfRange(bytes, 0, readN)
    if (raw.exists(_ == 0x00.toByte)) return None
    val text = decodeUtf8Strict(raw).getOrElse(decodeLatin1(raw))
    if (!hasContent(text)) return None
    if (printableRatio(text) < cfg.fallbackMinPrintable) return None
    Some(stripNul(text)) // no-op post NUL-byte reject; kept for reference parity
  }

  // ---------------------------------------------------------------------
  // T1: page assembly (src/processor.py:479-496)
  //   keep pages whose text has content; join "\n\n"; strip NUL; truncate;
  //   None if blank.
  // ---------------------------------------------------------------------
  def assemblePdfText(pageTexts: Seq[String], cfg: Config = defaultConfig): Option[String] = {
    val parts = pageTexts.filter(hasContent)
    val full = truncate(stripNul(parts.mkString("\n\n")), cfg.maxTextLength)
    if (hasContent(full)) Some(full) else None
  }
}
