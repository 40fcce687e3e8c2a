package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import java.util.Base64
import java.nio.charset.StandardCharsets.UTF_8
import graft.fixtures.PageGen

/** THE byte-identity gate (BASELINE.json input_hint): for every fixture url,
  * `extracted_text` must equal the frozen golden produced by the CPython
  * implementation of the reference semantics (tools/gen_page_goldens.py).
  * PDF rows assert this engine's own frozen semantics (determinism +
  * non-blank invariants; byte goldens for PDF live in PdfSpec). */
class GoldenCorpusSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper

  test("1k-page corpus: extracted_text byte-identical to CPython goldens") {
    val in = getClass.getResourceAsStream("/golden/pages_1k.jsonl")
    require(in != null)
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    assert(lines.size === 1000)
    var checkedBytes = 0L
    var nonEmpty = 0
    lines.zipWithIndex.foreach { case (line, i) =>
      val g = mapper.readTree(line)
      val page = PageGen.page(i.toLong, 42L)
      assert(page.url === g.get("url").asText, s"url drift at row $i — PageGen changed?")
      val doc = ExtractKernel.extractOne(page.url, page.html, 0, 0)
      assert(doc.error == null, s"row $i errored: ${doc.error}")
      val kind = g.get("kind").asText
      assert(doc.doc_type === kind, s"row $i sniffed ${doc.doc_type}, golden $kind")
      if (kind != "pdf") {
        val expected = Option(g.get("text_b64")).filter(!_.isNull)
          .map(n => new String(Base64.getDecoder.decode(n.asText), UTF_8))
        assert(Option(doc.extracted_text) === expected, s"byte mismatch at row $i (${page.text})")
        expected.foreach { e => checkedBytes += e.length; nonEmpty += 1 }
      } else {
        // engine-frozen semantics: deterministic, and blank pages never leak
        val again = ExtractKernel.extractOne(page.url, page.html, 0, 0)
        assert(Option(doc.extracted_text) === Option(again.extracted_text))
        Option(doc.extracted_text).foreach(t => assert(TextKernel.hasContent(t)))
      }
    }
    assert(nonEmpty > 400, s"suspiciously few non-empty goldens: $nonEmpty")
    info(s"verified $nonEmpty non-empty texts, $checkedBytes chars byte-exact")
  }

  test("text_main honors declared <meta charset>; extracted_text stays reference-exact") {
    def page(charset: String, body: String): Array[Byte] = {
      val html = s"""<!DOCTYPE html><html><head><meta charset="$charset"><title>t</title></head>
                    |<body><main><p>$body $body $body common filler words enough for density</p>
                    |<p>$body more words to keep the classifier confident about body text</p></main>
                    |</body></html>""".stripMargin
      html.getBytes(java.nio.charset.Charset.forName(charset))
    }
    // windows-1251 Cyrillic
    val ru = "привет мир это содержание статьи"
    val docRu = ExtractKernel.extractOne("u1", page("windows-1251", ru), 0, 0)
    assert(docRu.text_main != null && docRu.text_main.contains("привет"),
      s"cyrillic lost: ${docRu.text_main}")
    // the reference-exact column must contain the latin-1 mojibake, not the fix
    assert(docRu.extracted_text != null && !docRu.extracted_text.contains("привет"))

    // shift_jis Japanese
    val ja = "これは記事の本文です"
    val docJa = ExtractKernel.extractOne("u2", page("shift_jis", ja), 0, 0)
    assert(docJa.text_main != null && docJa.text_main.contains("記事"),
      s"japanese lost: ${docJa.text_main}")

    // a LYING charset declaration on valid utf-8 must not damage anything
    val utf8Bytes = new String(page("windows-1251", "plain ascii body"),
      java.nio.charset.Charset.forName("windows-1251")).getBytes("UTF-8")
    val docOk = ExtractKernel.extractOne("u3", utf8Bytes, 0, 0)
    assert(docOk.text_main != null && docOk.text_main.contains("plain ascii body"))
  }

  test("html rows also produce main content with valid spans") {
    var mains = 0
    (0 until 200).foreach { i =>
      val page = PageGen.page(i.toLong, 42L)
      val doc = ExtractKernel.extractOne(page.url, page.html, 0, 0)
      if (doc.doc_type == "html") {
        Option(doc.text_main).foreach { main =>
          mains += 1
          // boilerplate must be gone
          assert(!main.contains("copyright"), s"footer leaked at $i")
          doc.spans.foreach { s =>
            assert(s.start >= 0 && s.end <= main.length && s.start <= s.end)
          }
          assert(doc.spans.nonEmpty)
        }
      }
    }
    assert(mains > 80)
  }
}
