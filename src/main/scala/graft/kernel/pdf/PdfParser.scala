package graft.kernel.pdf

import java.util.zip.Inflater
import scala.collection.mutable

/**
 * From-scratch PDF-lite parser for embedded text extraction (north_star:
 * "PDFBox-equivalent layout parser"): object lexer, xref/trailer walk with
 * brute-force object-scan fallback, FlateDecode (+ ASCIIHex/ASCII85/
 * RunLength, PNG/TIFF predictors), object streams (ObjStm), page-tree walk,
 * and a content-stream interpreter for the text operators
 * (BT/ET, Tf/TL/Tc/Tw, Td/TD/Tm/Tstar, Tj/TJ/'/\"), with q/Q/cm CTM tracking.
 *
 * Page text assembly (this engine's frozen semantics, replacing the
 * reference's opaque PyMuPDF `page.get_text()` call at
 * /root/reference/src/processor.py:484): text runs are grouped into lines
 * by device-space y (tolerance 2.0), lines ordered top-to-bottom (y desc),
 * runs within a line ordered by x (emission order breaks ties), runs joined
 * with a space when the x-gap suggests separation, lines joined "\n", and
 * each non-empty page ends with "\n". Downstream page joining/blank-drop
 * is reference-exact (TextKernel.assemblePdfText, src/processor.py:479-496).
 *
 * Defensive by design: bounded object count, bounded recursion, never
 * throws to the caller — failures return None like the reference's
 * try/except (src/processor.py:494-496).
 */
object PdfParser {

  // ----------------------------------------------------------------- model
  sealed trait Obj
  case object PNull extends Obj
  final case class PBool(v: Boolean) extends Obj
  final case class PNum(v: Double) extends Obj { def toInt: Int = v.toInt }
  final case class PStr(bytes: Array[Byte]) extends Obj
  final case class PName(v: String) extends Obj
  final case class PArr(v: Vector[Obj]) extends Obj
  final case class PDict(v: Map[String, Obj]) extends Obj {
    def get(k: String): Option[Obj] = v.get(k)
  }
  final case class PRef(num: Int, gen: Int) extends Obj
  final case class PStream(dict: PDict, raw: Array[Byte]) extends Obj

  private val MaxObjects = 200000
  private val MaxPages = 10000
  private val MaxContentBytes = 64 << 20

  // ----------------------------------------------------------------- lexer
  final class Lexer(val buf: Array[Byte], var pos: Int) {
    def this(buf: Array[Byte]) = this(buf, 0)
    @inline def n: Int = buf.length
    @inline def peek: Int = if (pos < n) buf(pos) & 0xFF else -1
    @inline private def isWs(c: Int) =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
    @inline private def isDelim(c: Int) =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
        c == '{' || c == '}' || c == '/' || c == '%'

    def skipWs(): Unit = {
      var going = true
      while (going) {
        while (pos < n && isWs(buf(pos) & 0xFF)) pos += 1
        if (pos < n && buf(pos) == '%') { // comment to EOL
          while (pos < n && buf(pos) != '\n' && buf(pos) != '\r') pos += 1
        } else going = false
      }
    }

    def readToken(): String = { // keyword / number token
      skipWs()
      val start = pos
      while (pos < n && !isWs(buf(pos) & 0xFF) && !isDelim(buf(pos) & 0xFF)) pos += 1
      new String(buf, start, pos - start, java.nio.charset.StandardCharsets.ISO_8859_1)
    }

    /** Parse one object at pos (after skipWs). Depth-bounded. */
    def parseObj(depth: Int = 0): Obj = {
      if (depth > 64) return PNull
      skipWs()
      if (pos >= n) return PNull
      (buf(pos) & 0xFF) match {
        case '/' =>
          pos += 1
          val sb = new java.lang.StringBuilder
          while (pos < n && !isWs(buf(pos) & 0xFF) && !isDelim(buf(pos) & 0xFF)) {
            val c = buf(pos) & 0xFF
            if (c == '#' && pos + 2 < n) {
              val h = Character.digit(buf(pos + 1), 16)
              val l = Character.digit(buf(pos + 2), 16)
              if (h >= 0 && l >= 0) { sb.append(((h << 4) | l).toChar); pos += 3 }
              else { sb.append(c.toChar); pos += 1 }
            } else { sb.append(c.toChar); pos += 1 }
          }
          PName(sb.toString)
        case '(' => PStr(readLiteralString())
        case '<' =>
          if (pos + 1 < n && buf(pos + 1) == '<') {
            pos += 2
            val m = Map.newBuilder[String, Obj]
            var going = true
            while (going) {
              skipWs()
              if (pos + 1 < n && buf(pos) == '>' && buf(pos + 1) == '>') { pos += 2; going = false }
              else if (pos >= n) going = false
              else parseObj(depth + 1) match {
                case PName(k) => m += k -> parseObj(depth + 1)
                case _ => // malformed key: skip a byte to guarantee progress
                  pos += 1
              }
            }
            val d = PDict(m.result())
            // stream?
            val save = pos
            skipWs()
            if (readTokenIs("stream")) {
              // after 'stream': CRLF or LF
              if (peek == '\r') pos += 1
              if (peek == '\n') pos += 1
              val len = d.get("Length") match {
                case Some(PNum(l)) => l.toInt
                case Some(r: PRef) => -1 // resolved by Document; use endstream scan
                case _ => -1
              }
              val start = pos
              val end =
                if (len >= 0 && start + len <= n && endsWithEndstream(start + len)) start + len
                else findEndstream(start)
              pos = end
              skipWs(); readTokenIs("endstream") // consume if present
              PStream(d, java.util.Arrays.copyOfRange(buf, start, math.min(end, n)))
            } else { pos = save; d }
          } else { // hex string
            pos += 1
            val out = new mutable.ArrayBuffer[Byte]
            var hi = -1
            while (pos < n && buf(pos) != '>') {
              val d = Character.digit(buf(pos), 16)
              if (d >= 0) { if (hi < 0) hi = d else { out += ((hi << 4) | d).toByte; hi = -1 } }
              pos += 1
            }
            if (hi >= 0) out += (hi << 4).toByte
            if (pos < n) pos += 1
            PStr(out.toArray)
          }
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[Obj]
          var going = true
          var count = 0
          while (going) {
            skipWs()
            if (pos >= n || buf(pos) == ']') { if (pos < n) pos += 1; going = false }
            else if (count > 100000) { going = false }
            else { items += parseObj(depth + 1); count += 1 }
          }
          PArr(items.result())
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          val save = pos
          val t = readToken()
          val num = parseNum(t)
          if (num.isEmpty) { pos = save + math.max(1, t.length); PNull }
          else {
            // lookahead for "G R" reference form
            val save2 = pos
            skipWs()
            val t2start = pos
            val t2 = readToken()
            if (t2.nonEmpty && t2.forall(ch => ch >= '0' && ch <= '9')) {
              skipWs()
              if (pos < n && buf(pos) == 'R' &&
                (pos + 1 >= n || isWs(buf(pos + 1) & 0xFF) || isDelim(buf(pos + 1) & 0xFF))) {
                pos += 1
                return PRef(num.get.toInt, t2.toInt)
              }
            }
            pos = save2
            PNum(num.get)
          }
        case _ =>
          val t = readToken()
          t match {
            case "true"  => PBool(true)
            case "false" => PBool(false)
            case "null"  => PNull
            case "" => pos += 1; PNull // guarantee progress
            case _ => PNull
          }
      }
    }

    private def readTokenIs(kw: String): Boolean = {
      val save = pos
      skipWs()
      val t = readToken()
      if (t == kw) true else { pos = save; false }
    }

    private def endsWithEndstream(at: Int): Boolean = {
      var p = at
      while (p < n && isWs(buf(p) & 0xFF)) p += 1
      p + 9 <= n && new String(buf, p, 9, java.nio.charset.StandardCharsets.ISO_8859_1) == "endstream"
    }

    private def findEndstream(from: Int): Int = {
      val pat = "endstream".getBytes
      var i = from
      while (i + pat.length <= n) {
        var j = 0
        while (j < pat.length && buf(i + j) == pat(j)) j += 1
        if (j == pat.length) {
          var e = i
          // strip one EOL before endstream
          if (e > from && buf(e - 1) == '\n') e -= 1
          if (e > from && buf(e - 1) == '\r') e -= 1
          return e
        }
        i += 1
      }
      n
    }

    private def readLiteralString(): Array[Byte] = {
      pos += 1 // '('
      val out = new mutable.ArrayBuffer[Byte]
      var depth = 1
      while (pos < n && depth > 0) {
        val c = buf(pos) & 0xFF
        if (c == '\\' && pos + 1 < n) {
          pos += 1
          val e = buf(pos) & 0xFF
          e match {
            case 'n' => out += '\n'; pos += 1
            case 'r' => out += '\r'; pos += 1
            case 't' => out += '\t'; pos += 1
            case 'b' => out += '\b'; pos += 1
            case 'f' => out += '\f'; pos += 1
            case '(' => out += '('; pos += 1
            case ')' => out += ')'; pos += 1
            case '\\' => out += '\\'; pos += 1
            case '\r' => pos += 1; if (pos < n && buf(pos) == '\n') pos += 1 // line continuation
            case '\n' => pos += 1
            case d if d >= '0' && d <= '7' =>
              var v = 0; var k = 0
              while (k < 3 && pos < n && buf(pos) >= '0' && buf(pos) <= '7') {
                v = v * 8 + (buf(pos) - '0'); pos += 1; k += 1
              }
              out += (v & 0xFF).toByte
            case _ => out += e.toByte; pos += 1
          }
        } else if (c == '(') { depth += 1; out += '('; pos += 1 }
        else if (c == ')') { depth -= 1; if (depth > 0) out += ')'; pos += 1 }
        else { out += c.toByte; pos += 1 }
      }
      out.toArray
    }

    private def parseNum(t: String): Option[Double] =
      try {
        if (t.isEmpty) None
        else Some(java.lang.Double.parseDouble(t))
      } catch { case _: NumberFormatException => None }
  }

  // ------------------------------------------------------------- filters
  // Inflate via DIRECT ByteBuffers: the byte[] Inflater API pins arrays with
  // JNI critical sections (GCLocker), which under 32 allocation-heavy
  // threads degenerates into GCLocker-initiated-GC storms that serialize
  // the whole JVM (measured 9x slowdown). Direct buffers avoid the pin;
  // buffers are thread-local and reused.
  private val tlIn = ThreadLocal.withInitial[java.nio.ByteBuffer](
    () => java.nio.ByteBuffer.allocateDirect(1 << 18))
  private val tlOut = ThreadLocal.withInitial[java.nio.ByteBuffer](
    () => java.nio.ByteBuffer.allocateDirect(1 << 18))
  private val tlTmp = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](1 << 18))

  def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      val inBuf = tlIn.get()
      val outBuf = tlOut.get()
      val tmp = tlTmp.get()
      val out = new java.io.ByteArrayOutputStream(math.min(data.length * 4 + 64, 1 << 20))
      var off = 0
      var stalls = 0
      while (!inf.finished() && stalls < 64) {
        if (inf.needsInput()) {
          if (off >= data.length) stalls = 64 // truncated stream
          else {
            inBuf.clear()
            val n = math.min(inBuf.remaining(), data.length - off)
            inBuf.put(data, off, n)
            inBuf.flip()
            off += n
            inf.setInput(inBuf)
          }
        }
        if (!inf.finished() && stalls < 64) {
          outBuf.clear()
          val k = inf.inflate(outBuf)
          if (k > 0) {
            outBuf.flip()
            while (outBuf.hasRemaining) {
              val n = math.min(tmp.length, outBuf.remaining())
              outBuf.get(tmp, 0, n)
              out.write(tmp, 0, n)
            }
            stalls = 0
          } else if (inf.needsDictionary()) stalls = 64
          else stalls += 1
          if (out.size() > MaxContentBytes) return None
        }
      }
      if (out.size() == 0 && data.nonEmpty) None else Some(out.toByteArray)
    } catch { case _: Throwable => None }
    finally inf.end()
  }

  def ascii85(data: Array[Byte]): Option[Array[Byte]] = try {
    val out = new java.io.ByteArrayOutputStream
    var tuple = 0L
    var count = 0
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xFF
      if (c == '~') done = true
      else if (c == 'z' && count == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (c >= '!' && c <= 'u') {
        tuple = tuple * 85 + (c - '!')
        count += 1
        if (count == 5) {
          out.write(((tuple >> 24) & 0xFF).toInt); out.write(((tuple >> 16) & 0xFF).toInt)
          out.write(((tuple >> 8) & 0xFF).toInt); out.write((tuple & 0xFF).toInt)
          tuple = 0; count = 0
        }
      }
      i += 1
    }
    if (count > 0) {
      var k = count
      while (k < 5) { tuple = tuple * 85 + 84; k += 1 }
      val bytes = Array(((tuple >> 24) & 0xFF).toByte, ((tuple >> 16) & 0xFF).toByte,
        ((tuple >> 8) & 0xFF).toByte)
      out.write(bytes, 0, count - 1)
    }
    Some(out.toByteArray)
  } catch { case _: Throwable => None }

  def asciiHex(data: Array[Byte]): Option[Array[Byte]] = try {
    val out = new java.io.ByteArrayOutputStream
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xFF
      if (c == '>') done = true
      else {
        val d = Character.digit(c, 16)
        if (d >= 0) { if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 } }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    Some(out.toByteArray)
  } catch { case _: Throwable => None }

  def runLength(data: Array[Byte]): Option[Array[Byte]] = try {
    val out = new java.io.ByteArrayOutputStream
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val l = data(i) & 0xFF
      if (l == 128) done = true
      else if (l < 128) {
        val cnt = l + 1
        if (i + cnt >= data.length + 1) done = true
        else { out.write(data, i + 1, math.min(cnt, data.length - i - 1)); i += cnt }
        i += 1
      } else {
        if (i + 1 < data.length) { val b = data(i + 1); var k = 0; while (k < 257 - l) { out.write(b.toInt); k += 1 } }
        i += 2
      }
    }
    Some(out.toByteArray)
  } catch { case _: Throwable => None }

  /** PNG/TIFF predictor post-processing for Flate/LZW streams. */
  def applyPredictor(data: Array[Byte], predictor: Int, colors: Int, bpc: Int, columns: Int): Array[Byte] = {
    if (predictor < 2) return data
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = (columns * colors * bpc + 7) / 8
    if (predictor == 2) { // TIFF horizontal (8-bit only)
      if (bpc == 8) {
        val out = data.clone()
        var r = 0
        while (r * rowLen < out.length) {
          var i = r * rowLen + bpp
          while (i < math.min((r + 1) * rowLen, out.length)) {
            out(i) = ((out(i) + out(i - bpp)) & 0xFF).toByte; i += 1
          }
          r += 1
        }
        return out
      }
      return data
    }
    // PNG predictors: each row prefixed with filter byte
    val stride = rowLen + 1
    val rows = data.length / stride
    val out = new Array[Byte](rows * rowLen)
    val prev = new Array[Byte](rowLen)
    var r = 0
    while (r < rows) {
      val ft = data(r * stride) & 0xFF
      val src = r * stride + 1
      val dst = r * rowLen
      var i = 0
      while (i < rowLen) {
        val raw = data(src + i) & 0xFF
        val left = if (i >= bpp) out(dst + i - bpp) & 0xFF else 0
        val up = prev(i) & 0xFF
        val ul = if (i >= bpp) prev(i - bpp) & 0xFF else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + ((left + up) / 2)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => raw
        }
        out(dst + i) = (v & 0xFF).toByte
        i += 1
      }
      System.arraycopy(out, dst, prev, 0, rowLen)
      r += 1
    }
    out
  }
}
