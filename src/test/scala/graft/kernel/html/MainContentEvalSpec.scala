package graft.kernel.html

import org.scalatest.funsuite.AnyFunSuite

/**
 * Quantitative main-content eval: pages are generated with UNIQUE marker
 * tokens per region (main/nav/aside/footer/header), so word-level precision
 * and recall are exact — no vocabulary confounding. The classifier must
 * keep body text and drop boilerplate across 100 structurally-varied pages.
 */
class MainContentEvalSpec extends AnyFunSuite {

  private def page(seed: Int): (String, Set[String], Set[String]) = {
    val r = new scala.util.Random(seed)
    def words(prefix: String, n: Int): Seq[String] =
      (0 until n).map(i => s"$prefix${seed}x$i")
    val mainWords = scala.collection.mutable.ArrayBuffer.empty[String]
    val boilWords = scala.collection.mutable.ArrayBuffer.empty[String]

    val paras = (0 until 2 + r.nextInt(5)).map { p =>
      val ws = words(s"mainp${p}w", 15 + r.nextInt(25))
      mainWords ++= ws
      s"<p>${ws.mkString(" ")}.</p>"
    }
    val nav = (0 until 4 + r.nextInt(5)).map { i =>
      val ws = words(s"navw${i}x", 2)
      boilWords ++= ws
      s"""<li><a href="/x/$i">${ws.mkString(" ")}</a></li>"""
    }
    val asideWs = words("asidew", 8 + r.nextInt(8))
    boilWords ++= asideWs
    val footWs = words("footw", 6)
    boilWords ++= footWs
    val headWs = words("headw", 3)
    boilWords ++= headWs

    val html =
      s"""<!DOCTYPE html><html><head><title>title $seed</title></head><body>
         |<header><h1>${headWs.mkString(" ")}</h1><a href="/">home</a></header>
         |<nav><ul>${nav.mkString}</ul></nav>
         |<main><h2>heading $seed</h2>
         |${paras.mkString("\n")}
         |</main>
         |<aside><p>${asideWs.mkString(" ")}</p></aside>
         |<footer><p>${footWs.mkString(" ")}</p></footer>
         |</body></html>""".stripMargin
    (html, mainWords.toSet, boilWords.toSet)
  }

  test("main-content precision/recall over 100 marker pages") {
    var recallSum = 0.0
    var leakSum = 0.0
    var n = 0
    (0 until 100).foreach { seed =>
      val (html, mainWords, boilWords) = page(seed)
      val ex = MainContent.extract(html)
      val got = ex.text.split("[^A-Za-z0-9]+").filter(_.nonEmpty).toSet
      val recall = mainWords.count(got.contains).toDouble / mainWords.size
      val leak = boilWords.count(got.contains).toDouble / boilWords.size
      recallSum += recall
      leakSum += leak
      n += 1
      assert(recall >= 0.6, s"page $seed: body recall collapsed to $recall")
    }
    val avgRecall = recallSum / n
    val avgLeak = leakSum / n
    info(f"avg body recall=$avgRecall%.3f avg boilerplate leakage=$avgLeak%.3f")
    assert(avgRecall >= 0.9, f"avg body recall too low: $avgRecall%.3f")
    assert(avgLeak <= 0.05, f"avg boilerplate leakage too high: $avgLeak%.3f")
  }
}
