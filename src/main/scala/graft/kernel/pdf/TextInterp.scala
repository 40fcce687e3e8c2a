package graft.kernel.pdf

import scala.collection.mutable
import PdfParser._

/**
 * Content-stream text interpreter: executes the PDF text-positioning and
 * text-showing operators and assembles layout-ordered page text.
 *
 * Supported operators: BT ET; Tf TL Tc Tw Tz Ts; Td TD Tm T*; Tj TJ ' ";
 * q Q cm (CTM stack). Everything else is consumed operand-wise and ignored
 * (safe for path/color/image operators).
 *
 * Simple-font assumption: string bytes decode as Latin-1-compatible
 * (Standard/WinAnsi); UTF-16BE strings (BOM FE FF) decoded as such.
 *
 * Glyph advances ARE modeled (PDF 9.4.4): each shown string moves the text
 * matrix by sum(w/1000 * Tfs + Tc + Tw[code 32]) * Th, with per-glyph widths
 * from the font's /Widths (or CID /W) when present and a 500/1000 estimate
 * otherwise; TJ numbers displace by -adj/1000 * Tfs * Th. The word-gap
 * decision in line assembly compares the next run's START against the
 * previous run's computed END — a split word ("Hel")("lo") repositioned by
 * exactly its advance rejoins with no phantom space, while a gap wider than
 * 15% of the device-space font size reads as a word break.
 */
object TextInterp {

  private final case class Run(x: Double, y: Double, endX: Double,
                               gapThr: Double, seq: Int, text: String)

  // 3x2 affine matrix (a b c d e f): [x' y'] = [x y 1] * M
  private type Mat = Array[Double]
  private def matIdentity: Mat = Array(1, 0, 0, 1, 0, 0)
  private def matMul(m1: Mat, m2: Mat): Mat = Array(
    m1(0) * m2(0) + m1(1) * m2(2),
    m1(0) * m2(1) + m1(1) * m2(3),
    m1(2) * m2(0) + m1(3) * m2(2),
    m1(2) * m2(1) + m1(3) * m2(3),
    m1(4) * m2(0) + m1(5) * m2(2) + m2(4),
    m1(4) * m2(1) + m1(5) * m2(3) + m2(5))

  private val LineTolerance = 2.0
  /** TJ kern adjustment (in text-space thousandths) that implies a word gap. */
  private val KernSpaceThreshold = -180.0

  def decodeString(bytes: Array[Byte]): String = {
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFE && (bytes(1) & 0xFF) == 0xFF)
      new String(bytes, 2, bytes.length - 2, java.nio.charset.StandardCharsets.UTF_16BE)
    else new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** Extract layout-ordered text from one decoded content stream.
    * `fonts` maps /Resources font names (e.g. "F1") to decoders built from
    * /Encoding /Differences / /ToUnicode (Fonts.fromDict); strings shown
    * under a font without decode info use the legacy latin-1/BOM decode. */
  def extract(content: Array[Byte],
              fonts: Map[String, Fonts.FontDecoder] = Map.empty): String = {
    if (content.isEmpty) return ""
    val runs = mutable.ArrayBuffer.empty[Run]
    val lex = new Lexer(content)
    val operands = mutable.ArrayBuffer.empty[Obj]

    var ctm: Mat = matIdentity
    val ctmStack = mutable.Stack.empty[Mat]
    var tm: Mat = matIdentity
    var tlm: Mat = matIdentity
    var leading = 0.0
    var fontSize = 1.0
    var charSpacing = 0.0   // Tc
    var wordSpacing = 0.0   // Tw
    var hScale = 1.0        // Tz / 100
    var curFont: Fonts.FontDecoder = null
    var seq = 0
    var inText = false

    def num(o: Obj): Double = o match { case PNum(v) => v; case _ => 0.0 }
    def dec(b: Array[Byte]): Fonts.DecodedRun =
      if (curFont != null) curFont.decodeRun(b)
      else {
        // legacy latin-1/BOM path: no width table; 500/1000 per char
        val s = decodeString(b)
        Fonts.DecodedRun(s, 500.0 * s.length, s.length, s.count(_ == ' '))
      }

    /** Text-space x displacement of one shown string (PDF 9.4.4). */
    def advanceOf(r: Fonts.DecodedRun): Double =
      (r.widthSum / 1000.0 * fontSize + r.glyphs * charSpacing +
        r.spaces * wordSpacing) * hScale

    /** Emit one run at the CURRENT tm, then advance tm by `tx`. The run
      * records its device start and end x plus the word-gap threshold
      * (15% of the device-space font size) used during line assembly. */
    def emit(s: String, tx: Double): Unit = {
      if (s.nonEmpty) {
        val dev = matMul(tm, ctm)
        val scaleX = math.sqrt(dev(0) * dev(0) + dev(1) * dev(1))
        val endX = dev(4) + tx * dev(0) // tx along the text-space x axis
        val thr = math.max(0.5, 0.15 * fontSize * scaleX)
        runs += Run(dev(4), dev(5), endX, thr, seq, s)
        seq += 1
      }
      if (tx != 0.0) tm = matMul(Array(1, 0, 0, 1, tx, 0), tm)
    }

    def td(tx: Double, ty: Double): Unit = {
      tlm = matMul(Array(1, 0, 0, 1, tx, ty), tlm)
      tm = tlm.clone()
    }

    var guard = 0
    val maxOps = 5000000
    while (lex.pos < lex.n && guard < maxOps) {
      guard += 1
      lex.skipWs()
      if (lex.pos >= lex.n) ()
      else {
        val c = lex.peek
        if (c == '/' || c == '(' || c == '<' || c == '[' || c == '+' || c == '-' || c == '.' ||
          (c >= '0' && c <= '9')) {
          operands += lex.parseObj()
          if (operands.length > 64) operands.remove(0, operands.length - 64)
        } else {
          val op = lex.readToken()
          if (op.isEmpty) lex.pos += 1
          else {
            op match {
              case "BT" => inText = true; tm = matIdentity; tlm = matIdentity
              case "ET" => inText = false
              case "Tf" =>
                if (operands.nonEmpty) fontSize = num(operands.last)
                if (operands.length >= 2) operands(operands.length - 2) match {
                  case PName(f) => curFont = fonts.getOrElse(f, null)
                  case _ =>
                }
              case "TL" => if (operands.nonEmpty) leading = num(operands.last)
              case "Tc" => if (operands.nonEmpty) charSpacing = num(operands.last)
              case "Tw" => if (operands.nonEmpty) wordSpacing = num(operands.last)
              case "Tz" => if (operands.nonEmpty) hScale = num(operands.last) / 100.0
              case "Td" if operands.length >= 2 =>
                td(num(operands(operands.length - 2)), num(operands.last))
              case "TD" if operands.length >= 2 =>
                leading = -num(operands.last)
                td(num(operands(operands.length - 2)), num(operands.last))
              case "Tm" if operands.length >= 6 =>
                val o = operands.takeRight(6).map(num).toArray
                tlm = o; tm = o.clone()
              case "T*" => td(0, -leading)
              case "Tj" =>
                operands.lastOption match {
                  case Some(PStr(b)) => val r = dec(b); emit(r.text, advanceOf(r))
                  case _ =>
                }
              case "'" =>
                td(0, -leading)
                operands.lastOption match {
                  case Some(PStr(b)) => val r = dec(b); emit(r.text, advanceOf(r))
                  case _ =>
                }
              case "\"" =>
                // aw ac string " — sets word and char spacing, then shows
                if (operands.length >= 3) {
                  wordSpacing = num(operands(operands.length - 3))
                  charSpacing = num(operands(operands.length - 2))
                }
                td(0, -leading)
                operands.lastOption match {
                  case Some(PStr(b)) => val r = dec(b); emit(r.text, advanceOf(r))
                  case _ =>
                }
              case "TJ" =>
                operands.lastOption match {
                  case Some(PArr(items)) =>
                    val sb = new java.lang.StringBuilder
                    var tx = 0.0
                    items.foreach {
                      case PStr(b) =>
                        val r = dec(b)
                        sb.append(r.text)
                        tx += advanceOf(r)
                      case PNum(adj) =>
                        tx -= adj / 1000.0 * fontSize * hScale
                        if (adj < KernSpaceThreshold &&
                          sb.length > 0 && sb.charAt(sb.length - 1) != ' ') sb.append(' ')
                      case _ =>
                    }
                    emit(sb.toString, tx)
                  case _ =>
                }
              case "q" => ctmStack.push(ctm.clone())
              case "Q" => if (ctmStack.nonEmpty) ctm = ctmStack.pop()
              case "cm" if operands.length >= 6 =>
                ctm = matMul(operands.takeRight(6).map(num).toArray, ctm)
              case "BI" => // inline image: skip to EI
                val pat = Array[Byte]('E', 'I')
                var i = lex.pos
                var found = false
                while (i + 1 < lex.n && !found) {
                  if (lex.buf(i) == 'E' && lex.buf(i + 1) == 'I') { found = true }
                  else i += 1
                }
                lex.pos = if (found) i + 2 else lex.n
              case _ => // ignore op
            }
            operands.clear()
          }
        }
      }
    }
    assemble(runs)
  }

  /** Group runs into lines (y within tolerance), order top-to-bottom then
    * left-to-right, join with spaces on x-GAPS between the previous run's
    * computed END and the next run's start (so a word split across runs and
    * repositioned by exactly its advance width rejoins seamlessly),
    * "\n" between lines, trailing "\n" on non-empty pages. */
  private def assemble(runs: mutable.ArrayBuffer[Run]): String = {
    if (runs.isEmpty) return ""
    val sorted = runs.sortBy(r => (-r.y, r.x, r.seq))
    val sb = new java.lang.StringBuilder
    var lineY = Double.NaN
    var firstInLine = true
    var lastEndX = Double.NaN
    sorted.foreach { r =>
      if (lineY.isNaN) { lineY = r.y }
      else if (math.abs(r.y - lineY) > LineTolerance) {
        sb.append('\n'); lineY = r.y; firstInLine = true; lastEndX = Double.NaN
      }
      if (!firstInLine && !lastEndX.isNaN && r.x > lastEndX + r.gapThr &&
        sb.length > 0 && sb.charAt(sb.length - 1) != ' ') sb.append(' ')
      sb.append(r.text)
      firstInLine = false
      lastEndX = math.max(if (lastEndX.isNaN) r.endX else lastEndX, r.endX)
    }
    if (sb.length > 0) sb.append('\n')
    sb.toString
  }
}
