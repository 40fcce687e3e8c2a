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
}
