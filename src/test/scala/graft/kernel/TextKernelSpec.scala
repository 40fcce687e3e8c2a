package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.util.Base64
import java.nio.charset.StandardCharsets.UTF_8

/** Byte-identity check of the Scala text kernel against frozen goldens
  * produced by a Python implementation of the reference semantics
  * (tools/gen_text_goldens.py — Python is the reference's native runtime,
  * so CPython output IS the expected behavior). */
class TextKernelSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper
  private lazy val golden: JsonNode = {
    val in = getClass.getResourceAsStream("/golden/text_kernel.json")
    require(in != null, "golden/text_kernel.json missing")
    try mapper.readTree(in) finally in.close()
  }

  private def optStr(n: JsonNode): Option[String] =
    if (n == null || n.isNull) None else Some(n.asText)
  private def cfg(cap: JsonNode): TextKernel.Config =
    TextKernel.Config(maxTextLength = if (cap.isNull) None else Some(cap.asInt))

  test("T3 extract_text_from_file + T4 fallback match CPython on all byte cases") {
    val it = golden.get("byte_cases").elements()
    var n = 0
    while (it.hasNext) {
      val c = it.next()
      val bytes = Base64.getDecoder.decode(c.get("input_b64").asText)
      val conf = cfg(c.get("cap"))
      assert(TextKernel.extractTextFromFile(bytes, conf) === optStr(c.get("from_file")),
        s"from_file mismatch case $n cap=${c.get("cap")}")
      assert(TextKernel.extractTextFallback(bytes, conf) === optStr(c.get("fallback")),
        s"fallback mismatch case $n cap=${c.get("cap")}")
      n += 1
    }
    assert(n > 0)
  }

  test("T5/T6 truncate + sanitize + printable ratio + strip match CPython") {
    val it = golden.get("text_cases").elements()
    while (it.hasNext) {
      val c = it.next()
      val t = c.get("text").asText
      assert(TextKernel.sanitize(t) === c.get("sanitize").asText, s"sanitize(${t.take(20)})")
      assert(TextKernel.sanitize(t, TextKernel.Config(maxTextLength = Some(10))) ===
        c.get("sanitize_cap10").asText, s"sanitize_cap10(${t.take(20)})")
      assert(TextKernel.truncate(t, Some(5)) === c.get("truncate5").asText, s"truncate5")
      val ratio = if (t.isEmpty) 0.0 else TextKernel.printableRatio(t)
      assert(math.abs(ratio - c.get("printable_ratio").asDouble) < 1e-12, s"ratio(${t.take(20)})")
      assert(!TextKernel.hasContent(t) === c.get("strip_blank").asBoolean, s"blank(${t.take(20)})")
    }
  }

  test("O2/O3 should_use_ocr + get_final_text match CPython decision tree") {
    val it = golden.get("ocr_cases").elements()
    while (it.hasNext) {
      val c = it.next()
      val emb = optStr(c.get("emb"))
      val ocr = OcrArbiter.OcrResult(c.get("ocr").asText, c.get("quality").asDouble)
      val (use, reason) = OcrArbiter.shouldUseOcr(emb, ocr)
      assert(use === c.get("use").asBoolean, s"use for ${c}")
      assert(reason === c.get("reason").asText, s"reason for ${c}")
      assert(OcrArbiter.getFinalText(emb, Some(ocr), reason) === c.get("final").asText, s"final for ${c}")
    }
  }

  test("O4 compute_quality matches CPython over bundled wordlist") {
    val it = golden.get("quality_cases").elements()
    while (it.hasNext) {
      val c = it.next()
      val got = QualityScore.computeQuality(c.get("text").asText)
      assert(math.abs(got - c.get("quality").asDouble) < 1e-12, s"quality(${c.get("text")})")
    }
  }

  test("T1 page assembly: blank pages dropped, \\n\\n join, NUL strip") {
    assert(TextKernel.assemblePdfText(Seq("p1\n", "  \t ", "p2")) === Some("p1\n\n\np2"))
    assert(TextKernel.assemblePdfText(Seq("", "  ")) === None)
    assert(TextKernel.assemblePdfText(Seq("a\u0000b")) === Some("ab"))
    // NBSP-only page IS blank under Python strip (U+00A0 is Zs => stripped).
    assert(TextKernel.assemblePdfText(Seq("\u00a0")) === None)
  }

  test("sanitize removes astral emoji but keeps BMP + NBSP (trap 3)") {
    assert(TextKernel.sanitize("a\ud83d\ude00b") === "ab") // U+1F600 astral
    assert(TextKernel.sanitize("a\u00a0b\ufffdc") === "a\u00a0b\ufffdc")
    assert(TextKernel.sanitize("ab\u0001c") === "abc")
  }

  test("translateNewlines: universal-newline properties (no CR out, idempotent)") {
    assert(TextKernel.translateNewlines("a\r\nb\rc\nd") === "a\nb\nc\nd")
    assert(TextKernel.translateNewlines("tail\r") === "tail\n")
    assert(TextKernel.translateNewlines("\r\r\n\r") === "\n\n\n")
    val rnd = new scala.util.Random(5)
    (1 to 300).foreach { _ =>
      val s = (0 until rnd.nextInt(60)).map(_ => "ab\r\n\té".charAt(rnd.nextInt(6))).mkString
      val t = TextKernel.translateNewlines(s)
      assert(!t.contains('\r'), s"CR survived: ${t.map(_.toInt)}")
      assert(TextKernel.translateNewlines(t) === t, "not idempotent")
      assert(t.length <= s.length)
      // char content modulo newlines is preserved
      assert(t.filterNot(_ == '\n') === s.filterNot(c => c == '\n' || c == '\r'))
    }
  }

  test("capped text-mode read counts translated chars and honors chunk semantics") {
    import java.nio.charset.StandardCharsets.UTF_8
    val cfg5 = TextKernel.Config(maxTextLength = Some(5))
    // cap counts translated chars: a\r\nb\r\nc -> a\nb\nc, first 5 = "a\nb\nc"
    assert(TextKernel.extractTextFromFile("a\r\nb\r\nc\r\nd".getBytes(UTF_8), cfg5)
      === Some("a\nb\nc"))
    // malformed byte beyond the 8 KiB chunk: capped read succeeds
    val big = ("x" * 9000).getBytes(UTF_8) ++ Array(0xFF.toByte)
    assert(TextKernel.extractTextFromFile(big, cfg5) === Some("xxxxx"))
    // malformed byte inside the first chunk: latin-1 fallback even when the
    // error is beyond the cap (chunk decoded eagerly, like CPython)
    val small = ("y" * 100).getBytes(UTF_8) ++ Array(0xFF.toByte)
    assert(TextKernel.extractTextFromFile(small, cfg5) === Some("yyyyy"))
    assert(TextKernel.extractTextFromFile(small, TextKernel.defaultConfig)
      === Some("y" * 100 + "ÿ"))
  }

  test("truncate counts code points, not UTF-16 units (trap 1)") {
    val s = "ab\ud83d\ude00cd" // 5 code points, 6 UTF-16 units
    assert(TextKernel.truncate(s, Some(3)) === "ab\ud83d\ude00")
    assert(TextKernel.truncate(s, Some(5)) === s)
  }
}
