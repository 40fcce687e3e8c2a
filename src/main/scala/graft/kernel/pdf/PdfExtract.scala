package graft.kernel.pdf

import graft.kernel.TextKernel

/**
 * T1 glue: bytes -> extracted PDF text with the reference's exact page
 * assembly (keep pages with content, join "\n\n", strip NUL, truncate,
 * None if blank — /root/reference/src/processor.py:479-496).
 */
object PdfExtract {
  def extractText(bytes: Array[Byte],
                  cfg: TextKernel.Config = TextKernel.defaultConfig): Option[String] =
    PdfDocument.load(bytes).flatMap { doc =>
      TextKernel.assemblePdfText(doc.pageTexts, cfg)
    }

  /** Raw per-page texts (pre NUL-strip/assembly) for OCR arbitration. */
  def pageTexts(bytes: Array[Byte]): Option[Seq[String]] =
    PdfDocument.load(bytes).map(_.pageTexts)

  /** T2: single page (src/processor.py:499-511): NUL-strip, None if blank. */
  def extractPage(bytes: Array[Byte], pageNum: Int): Option[String] =
    PdfDocument.load(bytes).flatMap { doc =>
      val pages = doc.pages
      if (pageNum >= pages.length) None
      else {
        val t = TextInterp.extract(doc.pageContent(pages(pageNum)), doc.pageFonts(pages(pageNum)))
        if (TextKernel.hasContent(t)) Some(TextKernel.stripNul(t)) else None
      }
    }
}
