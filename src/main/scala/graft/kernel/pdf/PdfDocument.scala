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

  /** Sanity gate for the xref fast path: a catalog and at least one page
    * must be reachable, else the xref is not to be trusted. */
  private[pdf] def looksValid: Boolean =
    findRoot().isDefined && pages.nonEmpty

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

  // --------------------------------------------------------------- fonts
  private val fontCache = new java.util.IdentityHashMap[PDict, Fonts.FontDecoder]()

  private def fontFor(d: PDict): Fonts.FontDecoder = {
    val cached = fontCache.get(d)
    if (cached != null || fontCache.containsKey(d)) cached
    else {
      val built = try Fonts.fromDict(d, resolve(_), decodeStream) catch { case _: Throwable => null }
      fontCache.put(d, built)
      built
    }
  }

  /** /Resources /Font of a page, walking inherited /Parent resources. */
  def pageFonts(page: PDict): Map[String, Fonts.FontDecoder] = {
    var node: Obj = page
    var depth = 0
    while (depth < 16) {
      node match {
        case d: PDict =>
          dictGet(d, "Resources") match {
            case r: PDict =>
              dictGet(r, "Font") match {
                case f: PDict =>
                  return f.v.keysIterator.flatMap { name =>
                    resolve(f.v(name)) match {
                      case fd: PDict => Option(fontFor(fd)).map(name -> _)
                      case _ => None
                    }
                  }.toMap
                case _ =>
              }
            case _ =>
          }
          node = resolve(d.get("Parent").getOrElse(PNull))
        case _ => return Map.empty
      }
      depth += 1
    }
    Map.empty
  }

  /** Extracted text per page (layout-ordered, font-aware decode). */
  def pageTexts: Seq[String] =
    pages.map(p => TextInterp.extract(pageContent(p), pageFonts(p)))
}

object PdfDocument {

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' &&
      bytes(3) == 'F' && bytes(4) == '-'

  final case class LoadInfo(method: String, objectsParsed: Int)

  /** Load a document; never throws. Fast path: follow startxref into the
    * xref table / xref-stream chain (PDF 1.5+) and parse only the objects
    * the xref records — O(objects), not O(file bytes). Fallback: brute-scan
    * every `N G obj` site (robust to corrupt xref — later objects override
    * earlier, matching incremental-update semantics). Both paths then
    * expand object streams. */
  def load(bytes: Array[Byte]): Option[PdfDocument] = loadWithInfo(bytes).map(_._1)

  def loadWithInfo(bytes: Array[Byte]): Option[(PdfDocument, LoadInfo)] = {
    try {
      if (!isPdf(bytes)) return None
      // 1. xref fast path, validated before trust: a doc with no resolvable
      //    catalog or pages means the xref lied — fall back to the scan.
      val fast =
        try {
          xrefObjects(bytes).flatMap { objs =>
            if (objs.isEmpty) None
            else {
              val doc = expandObjStm(objs, bytes)
              if (doc.looksValid) Some((doc, LoadInfo("xref", objs.size))) else None
            }
          }
        } catch { case _: Throwable => None }
      if (fast.isDefined) return fast
      // 2. brute scan fallback
      val objs = mutable.LinkedHashMap.empty[(Int, Int), Obj]
      scanObjects(bytes, objs)
      if (objs.isEmpty) return None
      Some((expandObjStm(objs, bytes), LoadInfo("scan", objs.size)))
    } catch { case _: Throwable => None }
  }

  /** Expand ObjStm (compressed object streams) into the object table. */
  private def expandObjStm(objs: mutable.LinkedHashMap[(Int, Int), Obj],
                           bytes: Array[Byte]): PdfDocument = {
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
    // top-level objects win over ObjStm-extracted on collision
    val merged = extra.toMap ++ objs.toMap
    new PdfDocument(merged, bytes)
  }

  // ------------------------------------------------------------- xref walk
  /** Parse the xref chain (classic tables and /Type /XRef streams, /Prev and
    * hybrid /XRefStm links) and load exactly the recorded objects. */
  private def xrefObjects(buf: Array[Byte]): Option[mutable.LinkedHashMap[(Int, Int), Obj]] = {
    val start = findStartXref(buf).getOrElse(return None)
    // newest-first chain walk; first entry per object number wins (free
    // entries shadow older offsets, matching incremental-update semantics)
    val seen = mutable.HashSet.empty[Int]
    val offsets = mutable.ArrayBuffer.empty[(Int, Int, Int)] // (num, gen, offset)
    val queue = mutable.Queue(start)
    val visited = mutable.HashSet.empty[Int]
    val tmpDoc = new PdfDocument(Map.empty, buf) // direct-value stream decode
    var hops = 0
    while (queue.nonEmpty && hops < 64) {
      hops += 1
      val off = queue.dequeue()
      if (off >= 0 && off < buf.length && visited.add(off)) {
        val lex = new Lexer(buf, off)
        lex.skipWs()
        if (peekKeyword(buf, lex.pos, "xref")) {
          lex.pos += 4
          // classic table: sections of "start count" + 20-byte entries
          var inTable = true
          while (inTable) {
            lex.skipWs()
            if (lex.pos >= lex.n || peekKeyword(buf, lex.pos, "trailer")) {
              inTable = false
            } else {
              val startNum = lex.readToken().toInt
              val count = lex.readToken().toInt
              if (count < 0 || count > 5000000) throw new IllegalStateException("bad xref count")
              var i = 0
              while (i < count) {
                val o = lex.readToken()
                val g = lex.readToken()
                val t = lex.readToken()
                val num = startNum + i
                if (seen.add(num) && t == "n") offsets += ((num, g.toInt, o.toInt))
                i += 1
              }
            }
          }
          lex.skipWs()
          if (peekKeyword(buf, lex.pos, "trailer")) {
            lex.pos += 7
            lex.parseObj() match {
              case d: PDict =>
                // hybrid-reference precedence (PDF 7.5.8.4): the /XRefStm is
                // consulted BEFORE the /Prev chain — its entries (including
                // type-2 in-ObjStm entries, which mark `seen`) must shadow
                // stale offsets in older update sections, or an incremental
                // update silently resurrects the pre-update object
                d.get("XRefStm").foreach { case PNum(p) => queue += p.toInt; case _ => }
                d.get("Prev").foreach { case PNum(p) => queue += p.toInt; case _ => }
              case _ =>
            }
          }
        } else {
          // xref stream: "num gen obj << /Type /XRef ... >> stream"
          lex.readToken(); lex.readToken()
          if (lex.readToken() != "obj") throw new IllegalStateException("not an obj at startxref")
          lex.parseObj() match {
            case s @ PStream(d, _) if d.get("Type").contains(PName("XRef")) =>
              val data = tmpDoc.decodeStream(s).getOrElse(throw new IllegalStateException("xref stream decode"))
              val w = d.get("W") match {
                case Some(PArr(ws)) => ws.map { case PNum(v) => v.toInt; case _ => 0 }
                case _ => throw new IllegalStateException("no W")
              }
              if (w.length < 3) throw new IllegalStateException("short W")
              val size = d.get("Size") match { case Some(PNum(v)) => v.toInt; case _ => 0 }
              val index: Seq[(Int, Int)] = d.get("Index") match {
                case Some(PArr(ix)) =>
                  ix.map { case PNum(v) => v.toInt; case _ => 0 }.grouped(2)
                    .collect { case Seq(a, b) => (a, b) }.toSeq
                case _ => Seq((0, size))
              }
              val stride = w.sum
              var pos = 0
              index.foreach { case (first, count) =>
                var i = 0
                while (i < count && pos + stride <= data.length) {
                  def field(k: Int): Long = {
                    var v = 0L
                    val from = pos + w.take(k).sum
                    (0 until w(k)).foreach(j => v = (v << 8) | (data(from + j) & 0xFF))
                    v
                  }
                  val tpe = if (w(0) == 0) 1L else field(0)
                  val f2 = field(1)
                  val num = first + i
                  if (seen.add(num) && tpe == 1L) offsets += ((num, 0, f2.toInt))
                  // tpe == 2 (in ObjStm): the container is itself a type-1
                  // entry somewhere in the chain; ObjStm expansion covers it
                  pos += stride
                  i += 1
                }
              }
              d.get("Prev").foreach { case PNum(p) => queue += p.toInt; case _ => }
            case _ => throw new IllegalStateException("startxref target not an XRef stream")
          }
        }
      }
    }
    if (offsets.isEmpty) return None
    val objs = mutable.LinkedHashMap.empty[(Int, Int), Obj]
    offsets.sortBy(_._3).foreach { case (num, gen, off) =>
      if (off >= 0 && off < buf.length) {
        try {
          val lex = new Lexer(buf, off)
          val numTok = lex.readToken()
          lex.readToken() // gen
          if (lex.readToken() == "obj" && numTok.toInt == num)
            objs((num, gen)) = lex.parseObj()
        } catch { case _: Exception => }
      }
    }
    Some(objs)
  }

  private def peekKeyword(buf: Array[Byte], at: Int, kw: String): Boolean = {
    if (at + kw.length > buf.length) return false
    var i = 0
    while (i < kw.length) {
      if (buf(at + i) != kw.charAt(i)) return false
      i += 1
    }
    true
  }

  private def findStartXref(buf: Array[Byte]): Option[Int] = {
    val from = math.max(0, buf.length - 2048)
    var i = buf.length - 9
    while (i >= from) {
      if (peekKeyword(buf, i, "startxref")) {
        val lex = new Lexer(buf, i + 9)
        val tok = lex.readToken()
        return try Some(tok.toInt) catch { case _: NumberFormatException => None }
      }
      i -= 1
    }
    None
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
