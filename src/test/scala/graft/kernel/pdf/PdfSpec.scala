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
