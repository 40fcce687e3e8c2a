package graft.fixtures

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Deflater

/**
 * Deterministic minimal-PDF writer for fixtures: classic xref table,
 * catalog/pages/page tree, Helvetica, FlateDecode content streams with
 * BT/Tf/Td/TL/Tstar/Tj/TJ text operators — exactly the input domain of
 * graft.kernel.pdf. No wall-clock, no randomness: byte-reproducible.
 */
object MiniPdf {

  /** One page = lines of text (top-down). Empty seq => blank page. */
  def build(pages: Seq[Seq[String]], compress: Boolean = true, useTJ: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def wBytes(b: Array[Byte]): Unit = out.write(b)

    w("%PDF-1.4\n%âãÏÓ\n")

    val nPages = pages.length
    // object numbering: 1=catalog, 2=pages, 3=font, 4..3+n=page, 4+n..3+2n=content
    val catalogNum = 1; val pagesNum = 2; val fontNum = 3
    def pageNum(i: Int) = 4 + i
    def contentNum(i: Int) = 4 + nPages + i
    val total = 3 + 2 * nPages

    def beginObj(num: Int): Unit = { offsets += out.size(); w(s"$num 0 obj\n") }

    beginObj(catalogNum)
    w(s"<< /Type /Catalog /Pages $pagesNum 0 R >>\nendobj\n")
    beginObj(pagesNum)
    val kids = (0 until nPages).map(i => s"${pageNum(i)} 0 R").mkString(" ")
    w(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>\nendobj\n")
    beginObj(fontNum)
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>\nendobj\n")

    (0 until nPages).foreach { i =>
      beginObj(pageNum(i))
      w(s"<< /Type /Page /Parent $pagesNum 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Resources << /Font << /F1 $fontNum 0 R >> >> /Contents ${contentNum(i)} 0 R >>\nendobj\n")
    }

    (0 until nPages).foreach { i =>
      val content = contentFor(pages(i), useTJ)
      val body = if (compress) deflate(content) else content
      beginObj(contentNum(i))
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"<< /Length ${body.length}$filter >>\nstream\n")
      wBytes(body)
      w("\nendstream\nendobj\n")
    }

    val xrefPos = out.size()
    w(s"xref\n0 ${total + 1}\n")
    w("0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${total + 1} /Root $catalogNum 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** One page, one simple font with /BaseEncoding /WinAnsiEncoding and a
    * /Differences array; `codedLine` is raw byte codes shown with Tj. */
  def buildWithDifferences(codedLine: Array[Byte],
                           differences: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def beginObj(num: Int): Unit = { offsets += out.size(); w(s"$num 0 obj\n") }
    w("%PDF-1.4\n")
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2); w("<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>\nendobj\n")
    beginObj(3)
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      s"/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding /Differences [ $differences ] >> >>\nendobj\n")
    beginObj(4)
    w("<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
      "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>\nendobj\n")
    val content = {
      val b = new ByteArrayOutputStream()
      b.write("BT\n/F1 12 Tf\n72 720 Td\n(".getBytes(ISO_8859_1))
      codedLine.foreach { c =>
        if (c == '(' || c == ')' || c == '\\') b.write('\\')
        b.write(c)
      }
      b.write(") Tj\nET\n".getBytes(ISO_8859_1))
      b.toByteArray
    }
    beginObj(5)
    w(s"<< /Length ${content.length} >>\nstream\n"); out.write(content); w("\nendstream\nendobj\n")
    val xrefPos = out.size()
    w("xref\n0 6\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** One page, a Type0 (Identity-H, 2-byte codes) font with a /ToUnicode
    * CMap; `hexCodes` is the hex string shown with Tj (e.g. "00010002"). */
  def buildWithToUnicode(hexCodes: String, cmap: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def beginObj(num: Int): Unit = { offsets += out.size(); w(s"$num 0 obj\n") }
    w("%PDF-1.4\n")
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2); w("<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>\nendobj\n")
    beginObj(3)
    w("<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H " +
      "/Encoding /Identity-H /ToUnicode 6 0 R >>\nendobj\n")
    beginObj(4)
    w("<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
      "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>\nendobj\n")
    val content = s"BT\n/F1 12 Tf\n72 720 Td\n<$hexCodes> Tj\nET\n".getBytes(ISO_8859_1)
    beginObj(5)
    w(s"<< /Length ${content.length} >>\nstream\n"); out.write(content); w("\nendstream\nendobj\n")
    val cmapBytes = cmap.getBytes(ISO_8859_1)
    beginObj(6)
    w(s"<< /Length ${cmapBytes.length} >>\nstream\n"); out.write(cmapBytes); w("\nendstream\nendobj\n")
    val xrefPos = out.size()
    w("xref\n0 7\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** As build(), but the cross-reference is a PDF 1.5 xref STREAM (type-1
    * entries, W [1 4 2], no classic table, trailer folded into the stream
    * dict) — exercises the xref-stream fast path. */
  def buildXrefStream(pages: Seq[Seq[String]], compress: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def beginObj(num: Int): Unit = { offsets += out.size(); w(s"$num 0 obj\n") }
    w("%PDF-1.5\n")
    val nPages = pages.length
    val catalogNum = 1; val pagesNum = 2; val fontNum = 3
    def pageNum(i: Int) = 4 + i
    def contentNum(i: Int) = 4 + nPages + i
    val xrefNum = 4 + 2 * nPages
    beginObj(catalogNum); w(s"<< /Type /Catalog /Pages $pagesNum 0 R >>\nendobj\n")
    beginObj(pagesNum)
    val kids = (0 until nPages).map(i => s"${pageNum(i)} 0 R").mkString(" ")
    w(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>\nendobj\n")
    beginObj(fontNum)
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>\nendobj\n")
    (0 until nPages).foreach { i =>
      beginObj(pageNum(i))
      w(s"<< /Type /Page /Parent $pagesNum 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Resources << /Font << /F1 $fontNum 0 R >> >> /Contents ${contentNum(i)} 0 R >>\nendobj\n")
    }
    (0 until nPages).foreach { i =>
      val content = contentFor(pages(i), useTJ = false)
      val body = if (compress) deflate(content) else content
      beginObj(contentNum(i))
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"<< /Length ${body.length}$filter >>\nstream\n")
      out.write(body)
      w("\nendstream\nendobj\n")
    }
    // xref stream object: entry 0 = free, then type-1 entries for 1..xrefNum
    val xrefPos = out.size()
    offsets += xrefPos
    val entries = new ByteArrayOutputStream()
    def entry(tpe: Int, f2: Int, f3: Int): Unit = {
      entries.write(tpe)
      entries.write((f2 >>> 24) & 0xFF); entries.write((f2 >>> 16) & 0xFF)
      entries.write((f2 >>> 8) & 0xFF); entries.write(f2 & 0xFF)
      entries.write((f3 >>> 8) & 0xFF); entries.write(f3 & 0xFF)
    }
    entry(0, 0, 0xFFFF)
    offsets.foreach(o => entry(1, o, 0))
    val data = entries.toByteArray
    w(s"$xrefNum 0 obj\n<< /Type /XRef /Size ${xrefNum + 1} /W [ 1 4 2 ] " +
      s"/Root $catalogNum 0 R /Length ${data.length} >>\nstream\n")
    out.write(data)
    w(s"\nendstream\nendobj\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** PDF 1.5 with the catalog/pages/font/page dicts packed into an ObjStm
    * and referenced via TYPE-2 xref-stream entries — the fully compressed
    * modern layout (streams themselves stay top-level, as the spec
    * requires). Object map: 1=catalog 2=pages 3=font 4=page (all in ObjStm
    * 6), 5=content stream, 6=ObjStm, 7=xref stream. */
  def buildObjStmXref(lines: Seq[String]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.5\n")

    // top-level stream objects get real offsets
    val content = contentFor(lines, useTJ = false)
    val off5 = out.size()
    w(s"5 0 obj\n<< /Length ${content.length} >>\nstream\n")
    out.write(content)
    w("\nendstream\nendobj\n")

    // ObjStm: pairs header "num offset ..." then the objects
    val inner = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>",
      3 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>",
      4 -> ("<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"))
    val bodies = inner.map(_._2 + "\n")
    val offsets = bodies.scanLeft(0)(_ + _.length)
    val header = inner.zip(offsets).map { case ((num, _), off) => s"$num $off" }.mkString(" ") + "\n"
    val objStmData = (header + bodies.mkString).getBytes(ISO_8859_1)
    val first = header.length
    val off6 = out.size()
    w(s"6 0 obj\n<< /Type /ObjStm /N ${inner.length} /First $first /Length ${objStmData.length} >>\nstream\n")
    out.write(objStmData)
    w("\nendstream\nendobj\n")

    // xref stream: W [1 4 2]; entries 0..7
    val xrefPos = out.size()
    val entries = new ByteArrayOutputStream()
    def entry(tpe: Int, f2: Int, f3: Int): Unit = {
      entries.write(tpe)
      entries.write((f2 >>> 24) & 0xFF); entries.write((f2 >>> 16) & 0xFF)
      entries.write((f2 >>> 8) & 0xFF); entries.write(f2 & 0xFF)
      entries.write((f3 >>> 8) & 0xFF); entries.write(f3 & 0xFF)
    }
    entry(0, 0, 0xFFFF)                  // 0: free
    (0 until 4).foreach(i => entry(2, 6, i)) // 1-4: in ObjStm 6, index i
    entry(1, off5, 0)                    // 5: content stream
    entry(1, off6, 0)                    // 6: the ObjStm
    entry(1, xrefPos, 0)                 // 7: this xref stream
    val data = entries.toByteArray
    w(s"7 0 obj\n<< /Type /XRef /Size 8 /W [ 1 4 2 ] /Root 1 0 R /Length ${data.length} >>\nstream\n")
    out.write(data)
    w(s"\nendstream\nendobj\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** Helvetica AFM advance widths for codes 32..126 (public Adobe core-14
    * metrics), in glyph-space thousandths. */
  val HelveticaWidths: Array[Int] = Array(
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 278, 278,
    584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611, 778, 722, 278,
    500, 667, 556, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 278, 278, 278, 469, 556, 333, 556, 556, 500, 556, 556,
    278, 556, 556, 222, 222, 500, 222, 833, 556, 556, 556, 556, 333, 500,
    278, 556, 500, 722, 500, 500, 500, 334, 260, 334, 584)

  /** Text-space width (thousandths) of `s` under HelveticaWidths. */
  def helveticaWidth(s: String): Int =
    s.map(c => if (c >= 32 && c <= 126) HelveticaWidths(c - 32) else 500).sum

  /** One page with a RAW content stream and a simple font carrying
    * /FirstChar 32 /Widths (Helvetica metrics) — the fixture domain for
    * glyph-advance modeling (split runs, kern jitter, real word gaps). */
  def buildWithWidths(content: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def beginObj(num: Int): Unit = { offsets += out.size(); w(s"$num 0 obj\n") }
    w("%PDF-1.4\n")
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2); w("<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>\nendobj\n")
    beginObj(3)
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding " +
      s"/FirstChar 32 /LastChar 126 /Widths [ ${HelveticaWidths.mkString(" ")} ] >>\nendobj\n")
    beginObj(4)
    w("<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
      "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>\nendobj\n")
    val body = content.getBytes(ISO_8859_1)
    beginObj(5)
    w(s"<< /Length ${body.length} >>\nstream\n"); out.write(body); w("\nendstream\nendobj\n")
    val xrefPos = out.size()
    w("xref\n0 6\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** Hybrid-reference incremental update (PDF 7.5.8.4): the base file is a
    * classic-xref PDF whose page shows `oldLine`; the appended update
    * replaces the content stream (object 5) with `newLine`, records the new
    * offset ONLY in a cross-reference STREAM, and points at it from the
    * update's classic trailer via /XRefStm (with /Prev to the base table).
    * A conforming reader must consult the XRefStm before the Prev chain and
    * extract `newLine`; reading Prev first resurrects the stale object. */
  def buildHybridUpdate(oldLine: String, newLine: String): Array[Byte] = {
    val base = build(Seq(Seq(oldLine)), compress = false)
    val baseStr = new String(base, ISO_8859_1)
    val oldXref = {
      val m = "startxref\\s+(\\d+)".r.findAllMatchIn(baseStr).toSeq.last
      m.group(1).toInt
    }
    val out = new ByteArrayOutputStream()
    out.write(base)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    // new generation of the content stream (object 5), top-level
    val content = contentFor(Seq(newLine), useTJ = false)
    val off5 = out.size()
    w(s"5 0 obj\n<< /Length ${content.length} >>\nstream\n")
    out.write(content)
    w("\nendstream\nendobj\n")
    // hybrid xref stream (object 6): type-1 entries for 5 (new offset) and 6
    val off6 = out.size()
    val entries = new ByteArrayOutputStream()
    def entry(tpe: Int, f2: Int, f3: Int): Unit = {
      entries.write(tpe)
      entries.write((f2 >>> 24) & 0xFF); entries.write((f2 >>> 16) & 0xFF)
      entries.write((f2 >>> 8) & 0xFF); entries.write(f2 & 0xFF)
      entries.write((f3 >>> 8) & 0xFF); entries.write(f3 & 0xFF)
    }
    entry(1, off5, 0)
    entry(1, off6, 0)
    val data = entries.toByteArray
    w(s"6 0 obj\n<< /Type /XRef /Size 7 /W [ 1 4 2 ] /Index [ 5 2 ] " +
      s"/Root 1 0 R /Length ${data.length} >>\nstream\n")
    out.write(data)
    w("\nendstream\nendobj\n")
    // the update's classic table: EMPTY (hidden objects live in the XRefStm)
    val newTable = out.size()
    w("xref\n0 1\n0000000000 65535 f \n")
    w(s"trailer\n<< /Size 7 /Root 1 0 R /Prev $oldXref /XRefStm $off6 >>\n" +
      s"startxref\n$newTable\n%%EOF\n")
    out.toByteArray
  }

  private def contentFor(lines: Seq[String], useTJ: Boolean): Array[Byte] = {
    val sb = new StringBuilder
    if (lines.nonEmpty) {
      sb.append("BT\n/F1 12 Tf\n14 TL\n72 720 Td\n")
      lines.zipWithIndex.foreach { case (line, idx) =>
        if (idx > 0) sb.append("T*\n")
        if (useTJ) {
          // split words into a TJ array with kern gaps
          val parts = line.split(" ", -1)
          val arr = parts.map(p => s"(${esc(p)})").mkString(" -250 ")
          sb.append(s"[ $arr ] TJ\n")
        } else sb.append(s"(${esc(line)}) Tj\n")
      }
      sb.append("ET\n")
    }
    sb.toString.getBytes(ISO_8859_1)
  }

  /** PDF literal-string escaping; non-Latin-1 chars are dropped (fixture
    * strings are WinAnsi-safe by construction). */
  private def esc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '(' => sb.append("\\(")
      case ')' => sb.append("\\)")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c.toInt <= 0xFF => sb.append(c)
      case _ => sb.append('?')
    }
    sb.toString
  }

  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_COMPRESSION)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 32)
    val chunk = new Array[Byte](8192)
    while (!d.finished()) {
      val k = d.deflate(chunk)
      out.write(chunk, 0, k)
    }
    d.end()
    out.toByteArray
  }
}
