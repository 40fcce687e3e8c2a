package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import OcrArbiter.OcrResult

/** O5 control-flow tests (src/processor.py:544-635 semantics). */
class OcrFlowSpec extends AnyFunSuite {
  private val pages = Seq("embedded page one text\n", "embedded page two text\n")

  test("generated PDF sources skip OCR entirely") {
    val ocr = Seq(Some(OcrResult("o" * 500, 0.9)), None)
    val got = OcrArbiter.processPdfWithOcr(pages, ocr, ".docx")
    assert(got === TextKernel.assemblePdfText(pages))
  }

  test("no OCR backend (all None) falls back to embedded text") {
    val got = OcrArbiter.processPdfWithOcr(pages, Seq(None, None), ".pdf")
    assert(got === Some("embedded page one text\n\n\nembedded page two text\n"))
  }

  test("OCR loses the comparison -> embedded path") {
    // embedded page1 has 22 chars; ocr short + low quality => embedded_ok
    val got = OcrArbiter.processPdfWithOcr(pages, Seq(Some(OcrResult("short", 0.2)), None), ".pdf")
    assert(got === TextKernel.assemblePdfText(pages))
  }

  test("OCR wins: OCR pages first, embedded tail beyond cap, blank parts dropped") {
    val manyPages = (1 to 5).map(i => s"embedded page $i\n")
    val ocr = Seq(
      Some(OcrResult("x" * 300, 0.9)), // page1: wins (emb<10? no; found-more: 300 > 2*16 & >200)
      Some(OcrResult("ocr page two", 0.9)),
      Some(OcrResult("", 0.9)),        // blank OCR -> dropped
      None,                             // no result -> skipped
      Some(OcrResult("ignored beyond cap", 0.9)))
    val got = OcrArbiter.processPdfWithOcr(manyPages, ocr, ".pdf", ocrMaxPages = 3)
    // OCR for pages 1-3 (blank dropped), embedded for pages 4-5
    assert(got === Some("x" * 300 + "\n\nocr page two\n\nembedded page 4\n\n\nembedded page 5\n"))
  }

  test("everything blank -> None") {
    assert(OcrArbiter.processPdfWithOcr(Seq("", "  "), Seq(None, None), ".pdf") === None)
  }

  // ------------------------------------------------ e2e with a plugged engine
  import graft.fixtures.MiniPdf

  /** Deterministic fake backend: OCR quality/length keyed off page index. */
  private class FakeEngine(textFor: Int => Option[OcrResult]) extends ExtractKernel.OcrEngine {
    override def ocrPage(pdfBytes: Array[Byte], pageIndex: Int): Option[OcrResult] =
      textFor(pageIndex)
  }

  test("e2e kernel: scanned-style PDF (blank embedded) takes the OCR text") {
    // a one-page PDF whose embedded text is tiny (< 10 chars)
    val pdf = MiniPdf.build(Seq(Seq("hi")))
    val ocrText = "recovered by optical recognition " * 3 // > 50 chars
    val engine = new FakeEngine(i => if (i == 0) Some(OcrResult(ocrText, 0.8)) else None)
    val doc = ExtractKernel.extractOne("u", pdf, 0, 0, ocr = Some(engine))
    assert(doc.lineage.extractor === "pdf-ocr")
    assert(doc.extracted_text === ocrText,
      s"expected OCR text, got: ${doc.extracted_text}")
  }

  test("e2e kernel: text-rich PDF keeps embedded text over weak OCR") {
    val lines = (1 to 6).map(i => s"plenty of embedded text content line number $i")
    val pdf = MiniPdf.build(Seq(lines))
    val engine = new FakeEngine(_ => Some(OcrResult("garbled", 0.1)))
    val doc = ExtractKernel.extractOne("u", pdf, 0, 0, ocr = Some(engine))
    val embeddedOnly = ExtractKernel.extractOne("u", pdf, 0, 0) // no engine
    assert(doc.extracted_text === embeddedOnly.extracted_text)
  }

  test("e2e kernel: without an engine the path and output are unchanged") {
    val pdf = MiniPdf.build(Seq(Seq("alpha line"), Seq("beta line")))
    val doc = ExtractKernel.extractOne("u", pdf, 0, 0)
    assert(doc.lineage.extractor === "pdf-lite")
    assert(doc.extracted_text === "alpha line\n\n\nbeta line\n")
  }
}
