package graft.kernel.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.MiniPdf
import graft.kernel.TextKernel

class PdfSpec extends AnyFunSuite {

  test("single page, Tj lines, Flate-compressed") {
    val pdf = MiniPdf.build(Seq(Seq("Hello PDF world", "Second line here")))
    val text = PdfExtract.extractText(pdf)
    assert(text === Some("Hello PDF world\nSecond line here\n"))
  }

  test("multi-page join with \\n\\n and blank-page drop (T1 semantics)") {
    val pdf = MiniPdf.build(Seq(
      Seq("Page one text"),
      Seq(),                      // blank page -> dropped
      Seq("Page three text")))
    // each page's text carries its trailing \n; the T1 join adds "\n\n"
    val text = PdfExtract.extractText(pdf)
    assert(text === Some("Page one text\n\n\nPage three text\n"))
  }

  test("uncompressed stream and TJ arrays with kern-implied spaces") {
    val pdf = MiniPdf.build(Seq(Seq("alpha beta gamma")), compress = false, useTJ = true)
    val text = PdfExtract.extractText(pdf)
    assert(text === Some("alpha beta gamma\n"))
  }

  test("escapes in literal strings round-trip") {
    val pdf = MiniPdf.build(Seq(Seq("parens () and \\ backslash", "tab\tchar")))
    val text = PdfExtract.extractText(pdf).get
    assert(text.contains("parens () and \\ backslash"))
    assert(text.contains("tab\tchar"))
  }

  test("latin-1 high bytes decode (WinAnsi-ish)") {
    val pdf = MiniPdf.build(Seq(Seq("café über straße")))
    assert(PdfExtract.extractText(pdf) === Some("café über straße\n"))
  }

  test("page ordering: lines top-to-bottom by y") {
    // hand-built content with explicit Tm positioning out of order
    val content =
      """BT /F1 12 Tf
        |1 0 0 1 72 100 Tm (bottom line) Tj
        |1 0 0 1 72 700 Tm (top line) Tj
        |1 0 0 1 72 400 Tm (middle line) Tj
        |ET""".stripMargin.getBytes("ISO-8859-1")
    assert(TextInterp.extract(content) === "top line\nmiddle line\nbottom line\n")
  }

  test("same-line runs ordered by x with space on gap") {
    val content =
      """BT /F1 12 Tf
        |1 0 0 1 200 500 Tm (right) Tj
        |1 0 0 1 72 500 Tm (left) Tj
        |ET""".stripMargin.getBytes("ISO-8859-1")
    assert(TextInterp.extract(content) === "left right\n")
  }

  test("cm/q/Q transform affects device position") {
    val content =
      """q 1 0 0 1 0 300 cm
        |BT /F1 12 Tf 1 0 0 1 72 100 Tm (shifted) Tj ET
        |Q
        |BT /F1 12 Tf 1 0 0 1 72 500 Tm (plain) Tj ET""".stripMargin.getBytes("ISO-8859-1")
    // shifted is at y=400 device, plain at y=500 -> plain first
    assert(TextInterp.extract(content) === "plain\nshifted\n")
  }

  test("truncation config propagates (code points)") {
    val pdf = MiniPdf.build(Seq(Seq("abcdefghij")))
    val text = PdfExtract.extractText(pdf, TextKernel.Config(maxTextLength = Some(4)))
    assert(text === Some("abcd"))
  }

  test("font /Differences remaps byte codes through the glyph list") {
    // codes: 0x80 -> eacute, 0x81 -> adieresis, 0x82 -> emdash, ASCII around
    val coded = Array[Byte]('c', 'a', 'f', 0x80.toByte, ' ', 0x81.toByte,
      ' ', 'b', 0x82.toByte, 'c')
    val pdf = MiniPdf.buildWithDifferences(coded, "128 /eacute /adieresis /emdash")
    assert(PdfExtract.extractText(pdf) === Some("café ä b—c\n"))
  }

  test("font /Differences: uniXXXX names and re-pointed code runs") {
    val coded = Array[Byte](0x41, 0x20.toByte, 0xA0.toByte, 0xA1.toByte)
    val pdf = MiniPdf.buildWithDifferences(coded, "160 /uni20AC /oe")
    assert(PdfExtract.extractText(pdf) === Some("A €œ\n"))
  }

  test("Type0 + Identity-H + /ToUnicode CMap decodes 2-byte codes (incl. bfrange)") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |12 dict begin begincmap
        |1 begincodespacerange <0000> <FFFF> endcodespacerange
        |2 beginbfchar
        |<0001> <0048>
        |<0002> <00E9>
        |endbfchar
        |1 beginbfrange
        |<0010> <0012> <0061>
        |endbfrange
        |endcmap end end""".stripMargin
    // codes: 0001 (H), 0002 (é), 0010 0011 0012 (a b c)
    val pdf = MiniPdf.buildWithToUnicode("00010002001000110012", cmap)
    assert(PdfExtract.extractText(pdf) === Some("Héabc\n"))
  }

  test("ToUnicode bfchar with multi-code-unit target (ligature expansion)") {
    val cmap =
      """1 begincodespacerange <0000> <FFFF> endcodespacerange
        |1 beginbfchar
        |<0005> <00660069>
        |endbfchar""".stripMargin
    val pdf = MiniPdf.buildWithToUnicode("0005", cmap)
    assert(PdfExtract.extractText(pdf) === Some("fi\n"))
  }

  test("xref fast path is taken on valid files, scan on corrupt xref, same text") {
    val pdf = MiniPdf.build(Seq(Seq("fast path line one", "and line two")))
    val (doc, info) = PdfDocument.loadWithInfo(pdf).get
    assert(info.method === "xref", s"expected xref path, got $info")
    assert(info.objectsParsed > 0)
    val fastText = doc.pageTexts

    // corrupt the startxref offset -> must fall back to brute scan, same text
    val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    val idx = s.lastIndexOf("startxref")
    val corrupted = (s.substring(0, idx) + "startxref\n9999999\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val (doc2, info2) = PdfDocument.loadWithInfo(corrupted).get
    assert(info2.method === "scan")
    assert(doc2.pageTexts === fastText)
  }

  test("PDF 1.5 xref STREAM parses via the fast path") {
    val pdf = MiniPdf.buildXrefStream(Seq(Seq("xref stream page"), Seq("second page")))
    val (doc, info) = PdfDocument.loadWithInfo(pdf).get
    assert(info.method === "xref", s"expected xref-stream path, got $info")
    assert(doc.pageTexts === Seq("xref stream page\n", "second page\n"))
    assert(PdfExtract.extractText(pdf) === Some("xref stream page\n\n\nsecond page\n"))
  }

  test("ObjStm + xref-stream type-2 entries parse via the fast path (PDF 1.5 compressed layout)") {
    val pdf = MiniPdf.buildObjStmXref(Seq("compressed object stream page", "line two"))
    val (doc, info) = PdfDocument.loadWithInfo(pdf).get
    assert(info.method === "xref", s"expected xref path, got $info")
    assert(doc.pageTexts === Seq("compressed object stream page\nline two\n"))
    // brute-scan fallback agrees (corrupt the startxref)
    val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    val corrupted = (s.substring(0, s.lastIndexOf("startxref")) + "startxref\n0\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val (doc2, info2) = PdfDocument.loadWithInfo(corrupted).get
    assert(info2.method === "scan")
    assert(doc2.pageTexts === doc.pageTexts)
  }

  test("glyph advance widths: split runs rejoin, kern jitter joins, real gaps space") {
    // "Hel" is 722+556+222 = 1500 thousandths = 18pt at 12pt: the second run
    // placed at exactly the advance must rejoin with NO phantom space (the
    // pre-width interpreter compared START positions and mis-spaced this)
    val helEnd = 72.0 + MiniPdf.helveticaWidth("Hel") * 12.0 / 1000.0
    val keEnd = 72.0 + MiniPdf.helveticaWidth("ke") * 12.0 / 1000.0
    val content =
      f"""BT /F1 12 Tf 72 700 Td (Hel) Tj ET
         |BT /F1 12 Tf $helEnd%.3f 700 Td (lo world) Tj ET
         |BT /F1 12 Tf 72 650 Td (gap) Tj ET
         |BT /F1 12 Tf 200 650 Td (test) Tj ET
         |BT /F1 12 Tf 72 600 Td (ke) Tj ET
         |BT /F1 12 Tf ${keEnd + 1.0}%.3f 600 Td (rn) Tj ET""".stripMargin
    val pdf = MiniPdf.buildWithWidths(content)
    assert(PdfExtract.extractText(pdf) === Some("Hello world\ngap test\nkern\n"))
  }

  test("Tc/Tw feed the advance: padded split runs still rejoin") {
    // 1pt char spacing over 3 glyphs adds 3pt to the advance; the follow-on
    // run sits at width + 3pt and must still join seamlessly
    val end = 72.0 + MiniPdf.helveticaWidth("pad") * 12.0 / 1000.0 + 3.0
    val content =
      f"""BT /F1 12 Tf 1 Tc 72 700 Td (pad) Tj ET
         |BT /F1 12 Tf $end%.3f 700 Td (ded) Tj ET""".stripMargin
    val pdf = MiniPdf.buildWithWidths(content)
    assert(PdfExtract.extractText(pdf) === Some("padded\n"))
  }

  test("MacRoman exact table: currency at 0xDB, high block unshifted") {
    val coded = Array[Byte](0x8E.toByte, ' ', 0xDB.toByte, ' ', 0xF1.toByte, 0xFF.toByte)
    val pdf = MiniPdf.buildWithDifferences(coded, "")
      // buildWithDifferences uses WinAnsi base; build a MacRoman variant inline
    val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/BaseEncoding /WinAnsiEncoding /Differences [  ]", "/BaseEncoding /MacRomanEncoding")
    val text = PdfExtract.extractText(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    // 0x8E=é, 0xDB=¤ (currency, NOT euro), 0xF1=Ò, 0xFF=ˇ
    assert(text === Some("é ¤ Òˇ\n"))
  }

  test("hybrid incremental update: /XRefStm entries shadow the /Prev chain") {
    val pdf = MiniPdf.buildHybridUpdate("stale pre-update text", "fresh updated text")
    val (doc, info) = PdfDocument.loadWithInfo(pdf).get
    assert(info.method === "xref", s"expected xref path, got $info")
    // the update recorded object 5's new offset only in the xref STREAM;
    // reading /Prev before /XRefStm would resurrect the stale content
    assert(doc.pageTexts === Seq("fresh updated text\n"))
    assert(PdfExtract.extractText(pdf) === Some("fresh updated text\n"))
  }

  test("non-PDF and corrupt inputs return None, never throw") {
    assert(PdfExtract.extractText("not a pdf".getBytes) === None)
    assert(PdfExtract.extractText(Array.emptyByteArray) === None)
    val pdf = MiniPdf.build(Seq(Seq("x")))
    val corrupt = pdf.take(pdf.length / 2)
    PdfExtract.extractText(corrupt) // must not throw
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(2000))(rnd.nextInt.toByte)
      junk(0) = '%'; if (junk.length > 5) { junk(1) = 'P'; junk(2) = 'D'; junk(3) = 'F'; junk(4) = '-' }
      PdfExtract.extractText(junk) // must not throw
    }
  }

  test("ToUnicode CMap parser never throws on arbitrary bytes") {
    val rnd = new scala.util.Random(13)
    (1 to 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(500))(rnd.nextInt.toByte)
      Fonts.parseToUnicodeCMap(junk) // must not throw
    }
    // half-valid fragments
    Seq("beginbfchar <01>", "beginbfrange <00> <FF>", "<0001> beginbfchar",
      "1 beginbfrange <10> <05> <0041> endbfrange").foreach { s =>
      Fonts.parseToUnicodeCMap(s.getBytes("ISO-8859-1"))
    }
  }

  test("glyph name mapping: AGL subset, uniXXXX forms, unknown -> None") {
    assert(Fonts.glyphToUnicode("eacute") === Some("é"))
    assert(Fonts.glyphToUnicode("seven") === Some("7"))
    assert(Fonts.glyphToUnicode("uni0041") === Some("A"))
    assert(Fonts.glyphToUnicode("uni00480069") === Some("Hi"))
    assert(Fonts.glyphToUnicode("u1F600") === Some(new String(Character.toChars(0x1F600))))
    assert(Fonts.glyphToUnicode("g123") === None)
    assert(Fonts.glyphToUnicode("notaglyphname") === None)
  }

  test("extractPage (T2): single page text, blank -> None") {
    val pdf = MiniPdf.build(Seq(Seq("first"), Seq(), Seq("third")))
    assert(PdfExtract.extractPage(pdf, 0) === Some("first\n"))
    assert(PdfExtract.extractPage(pdf, 1) === None)
    assert(PdfExtract.extractPage(pdf, 2) === Some("third\n"))
    assert(PdfExtract.extractPage(pdf, 9) === None)
  }

  test("30-page document extracts all pages in order") {
    val pages = (1 to 30).map(i => Seq(s"Content of page number $i"))
    val text = PdfExtract.extractText(MiniPdf.build(pages)).get
    val expected = (1 to 30).map(i => s"Content of page number $i\n").mkString("\n\n")
    assert(text === expected)
  }
}
