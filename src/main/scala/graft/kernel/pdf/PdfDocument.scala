package graft.kernel.pdf

import scala.collection.mutable
import PdfParser._

/**
 * Document layer: object table (xref walk with brute-scan fallback +
 * ObjStm expansion), filter pipeline, page-tree walk, and per-page text
 * extraction via the content-stream interpreter (TextInterp).
 */
final class PdfDocument private (objects: Map[(Int, Int), Obj], buf: Array[Byte]) {

  private val byNum: Map[Int, Obj] =
    objects.groupBy(_._1._1).map { case (num, m) => num -> m.maxBy(_._1._2)._2 }

  def resolve(o: Obj, depth: Int = 0): Obj = o match {
    case PRef(num, _) if depth < 32 => byNum.get(num).map(resolve(_, depth + 1)).getOrElse(PNull)
    case other => other
  }

  private def dictGet(d: PDict, k: String): Obj = resolve(d.get(k).getOrElse(PNull))

  /** Apply the full filter chain of a stream. */
  def decodeStream(s: PStream): Option[Array[Byte]] = {
    val filters: Seq[String] = dictGet(s.dict, "Filter") match {
      case PName(f)  => Seq(f)
      case PArr(fs)  => fs.map(resolve(_)).collect { case PName(f) => f }
      case _         => Seq.empty
    }
    val parmsList: Seq[Option[PDict]] = dictGet(s.dict, "DecodeParms") match {
      case d: PDict => Seq(Some(d))
      case PArr(ps) => ps.map(resolve(_)).map { case d: PDict => Some(d); case _ => None }
      case _        => filters.map(_ => None)
    }
    var data = s.raw
    var i = 0
    while (i < filters.length) {
      val parms = if (i < parmsList.length) parmsList(i) else None
      val decoded: Option[Array[Byte]] = filters(i) match {
        case "FlateDecode" | "Fl" => PdfParser.inflate(data).map(post(_, parms))
        case "ASCIIHexDecode" | "AHx" => PdfParser.asciiHex(data)
        case "ASCII85Decode" | "A85" => PdfParser.ascii85(data)
        case "RunLengthDecode" | "RL" => PdfParser.runLength(data)
        case _ => None // LZW/DCT/unsupported
      }
      decoded match {
        case Some(dd) => data = dd
        case None     => return None
      }
      i += 1
    }
    Some(data)
  }

  private def post(data: Array[Byte], parms: Option[PDict]): Array[Byte] = parms match {
    case Some(p) =>
      val pred = dictGet(p, "Predictor") match { case PNum(v) => v.toInt; case _ => 1 }
      if (pred <= 1) data
      else {
        val colors = dictGet(p, "Colors") match { case PNum(v) => v.toInt; case _ => 1 }
        val bpc = dictGet(p, "BitsPerComponent") match { case PNum(v) => v.toInt; case _ => 8 }
        val cols = dictGet(p, "Columns") match { case PNum(v) => v.toInt; case _ => 1 }
        PdfParser.applyPredictor(data, pred, colors, bpc, cols)
      }
    case None => data
  }


  /** Page dictionaries in document order. */
  def pages: Vector[PDict] = {
    val root = findRoot()
    val out = Vector.newBuilder[PDict]
    var count = 0
    def walk(node: Obj, depth: Int): Unit = resolve(node) match {
      case d: PDict if depth < 64 && count < 10000 =>
        dictGet(d, "Type") match {
          case PName("Pages") =>
            dictGet(d, "Kids") match {
              case PArr(kids) => kids.foreach(walk(_, depth + 1))
              case _ =>
            }
          case PName("Page") => out += d; count += 1
          case _ =>
            // tolerate missing /Type on intermediate nodes
            dictGet(d, "Kids") match {
              case PArr(kids) => kids.foreach(walk(_, depth + 1))
              case _ => if (d.get("Contents").isDefined) { out += d; count += 1 }
            }
        }
      case _ =>
    }
    root.foreach(r => walk(dictGet(r, "Pages"), 0))
    val v = out.result()
    if (v.nonEmpty) v
    else // fallback: every object that looks like a page
      byNum.values.collect {
        case d: PDict if d.get("Type").contains(PName("Page")) => d
      }.toVector
  }

  private def findRoot(): Option[PDict] =
    byNum.values.collectFirst {
      case d: PDict if d.get("Type").contains(PName("Catalog")) => d
    }

  /** Concatenated decoded content streams of one page. */
  def pageContent(page: PDict): Array[Byte] = {
    val parts: Seq[Array[Byte]] = dictGet(page, "Contents") match {
      case s: PStream => decodeStream(s).toSeq
      case PArr(refs) => refs.map(resolve(_)).collect { case s: PStream => decodeStream(s) }.flatten
      case _ => Seq.empty
    }
    if (parts.isEmpty) Array.emptyByteArray
    else if (parts.length == 1) parts.head
    else {
      val out = new java.io.ByteArrayOutputStream()
      parts.foreach { p => out.write(p); out.write('\n') }
      out.toByteArray
    }
  }

  /** Extracted text per page (layout-ordered). */
  def pageTexts: Seq[String] = pages.map(p => TextInterp.extract(pageContent(p)))
}

object PdfDocument {

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' &&
      bytes(3) == 'F' && bytes(4) == '-'

  /** Load a document; never throws. Brute-scans `N G obj` sites (robust to
    * broken xref — later objects override earlier, matching incremental
    * update semantics), then expands object streams. */
  def load(bytes: Array[Byte]): Option[PdfDocument] = {
    try {
      if (!isPdf(bytes)) return None
      val objs = mutable.LinkedHashMap.empty[(Int, Int), Obj]
      scanObjects(bytes, objs)
      if (objs.isEmpty) return None
      // expand ObjStm (compressed object streams)
      val doc0 = new PdfDocument(objs.toMap, bytes)
      val extra = mutable.LinkedHashMap.empty[(Int, Int), Obj]
      objs.values.foreach {
        case s @ PStream(d, _) if d.get("Type").contains(PName("ObjStm")) =>
          doc0.decodeStream(s).foreach { data =>
            val nObjs = doc0.resolve(d.get("N").getOrElse(PNull)) match { case PNum(v) => v.toInt; case _ => 0 }
            val first = doc0.resolve(d.get("First").getOrElse(PNull)) match { case PNum(v) => v.toInt; case _ => 0 }
            val lex = new Lexer(data)
            val pairs = (0 until math.min(nObjs, 50000)).map { _ =>
              val num = lex.readToken(); val off = lex.readToken()
              (num, off)
            }
            pairs.foreach { case (numS, offS) =>
              try {
                val num = numS.toInt; val off = offS.toInt
                if (first + off >= 0 && first + off < data.length) {
                  val l2 = new Lexer(data, first + off)
                  extra.getOrElseUpdate((num, 0), l2.parseObj())
                }
              } catch { case _: NumberFormatException => }
            }
          }
        case _ =>
      }
      // brute-scanned top-level objects win over ObjStm-extracted on collision
      val merged = extra.toMap ++ objs.toMap
      Some(new PdfDocument(merged, bytes))
    } catch { case _: Throwable => None }
  }

  private def scanObjects(buf: Array[Byte], out: mutable.LinkedHashMap[(Int, Int), Obj]): Unit = {
    val n = buf.length
    var i = 0
    var found = 0
    while (i + 3 < n && found < 200000) {
      // find "obj" preceded by "num gen"
      if (buf(i) == 'o' && buf(i + 1) == 'b' && buf(i + 2) == 'j' &&
        (i + 3 >= n || !isRegular(buf(i + 3)))) {
        // walk backwards: ws, gen digits, ws, num digits
        var p = i - 1
        while (p >= 0 && isWsB(buf(p))) p -= 1
        val genEnd = p
        while (p >= 0 && buf(p) >= '0' && buf(p) <= '9') p -= 1
        val genStart = p + 1
        if (genEnd >= genStart) {
          var q = p
          while (q >= 0 && isWsB(buf(q))) q -= 1
          val numEnd = q
          while (q >= 0 && buf(q) >= '0' && buf(q) <= '9') q -= 1
          val numStart = q + 1
          val boundaryOk = q < 0 || isWsB(buf(q)) || isDelimB(buf(q))
          if (numEnd >= numStart && boundaryOk && numEnd - numStart < 10) {
            try {
              val num = new String(buf, numStart, numEnd - numStart + 1).toInt
              val gen = new String(buf, genStart, genEnd - genStart + 1).toInt
              val lex = new Lexer(buf, i + 3)
              val obj = lex.parseObj()
              out((num, gen)) = obj
              found += 1
              i = math.max(i + 3, lex.pos - 1)
            } catch { case _: Throwable => }
          }
        }
      }
      i += 1
    }
  }

  @inline private def isWsB(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0
  @inline private def isDelimB(b: Byte): Boolean =
    b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
      b == '{' || b == '}' || b == '/' || b == '%'
  @inline private def isRegular(b: Byte): Boolean = !isWsB(b) && !isDelimB(b)
}
