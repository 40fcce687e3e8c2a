package graft.kernel.html

import org.scalatest.funsuite.AnyFunSuite

/**
 * Adversarial main-content eval (round-3 ask): the template eval in
 * MainContentEvalSpec is saturated (recall 1.000 / leakage 0.000), so this
 * corpus uses HOSTILE page shapes where naive density classifiers fail:
 *
 *  1. comment threads LONGER than the article (each comment is itself a
 *     plausible paragraph — only the class hint separates it);
 *  2. nav-dominant portals (plain-div link farms, no semantic nav tags);
 *  3. tables-as-layout (article in the center cell, link menus around it);
 *  4. single-div SPAs (no semantic tags at all; chrome marked only by
 *     class names).
 *
 * Marker tokens are unique per region, so word recall/leakage are exact.
 * Floors per class: body recall >= 0.9, boilerplate leakage <= 0.1.
 */
class AdversarialMainContentSpec extends AnyFunSuite {

  private type Page = (String, Set[String], Set[String]) // html, mainWords, boilWords

  private def words(r: scala.util.Random, prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  private def para(ws: Seq[String]): String = s"<p>${ws.mkString(" ")}.</p>"

  /** 1. Comment thread 3-5x longer than the 2-3 paragraph article. */
  private def commentPage(seed: Int): Page = {
    val r = new scala.util.Random(seed)
    val main = scala.collection.mutable.ArrayBuffer.empty[String]
    val boil = scala.collection.mutable.ArrayBuffer.empty[String]
    val paras = (0 until 2 + r.nextInt(2)).map { p =>
      val ws = words(r, s"art${seed}p${p}w", 20 + r.nextInt(20)); main ++= ws; para(ws)
    }
    val comments = (0 until 10 + r.nextInt(10)).map { c =>
      val ws = words(r, s"cmt${seed}c${c}w", 12 + r.nextInt(25)); boil ++= ws
      val by = words(r, s"cby${seed}c${c}w", 2); boil ++= by
      s"""<div class="comment"><p class="byline">${by.mkString(" ")} says:</p>${para(ws)}</div>"""
    }
    val html =
      s"""<html><body><div id="page">
         |<article><h1>title $seed</h1>${paras.mkString("\n")}</article>
         |<div class="comments-area"><h3>${3 + seed % 20} Comments</h3>
         |<div class="comment-list">${comments.mkString("\n")}</div></div>
         |</div></body></html>""".stripMargin
    (html, main.toSet, boil.toSet)
  }

  /** 2. Portal page: 8-12 plain-div link farms around a short article. */
  private def portalPage(seed: Int): Page = {
    val r = new scala.util.Random(1000 + seed)
    val main = scala.collection.mutable.ArrayBuffer.empty[String]
    val boil = scala.collection.mutable.ArrayBuffer.empty[String]
    val farms = (0 until 8 + r.nextInt(5)).map { f =>
      val links = (0 until 6 + r.nextInt(8)).map { l =>
        val ws = words(r, s"lnk${seed}f${f}l${l}w", 1 + r.nextInt(3)); boil ++= ws
        s"""<a href="/s/$f/$l">${ws.mkString(" ")}</a>"""
      }
      s"""<div><ul>${links.map(a => s"<li>$a</li>").mkString}</ul></div>"""
    }
    val paras = (0 until 2).map { p =>
      val ws = words(r, s"story${seed}p${p}w", 25 + r.nextInt(15)); main ++= ws; para(ws)
    }
    val html =
      s"""<html><body>
         |${farms.take(farms.length / 2).mkString("\n")}
         |<div><h2>story $seed</h2>${paras.mkString("\n")}</div>
         |${farms.drop(farms.length / 2).mkString("\n")}
         |</body></html>""".stripMargin
    (html, main.toSet, boil.toSet)
  }

  /** 3. Table-as-layout: menus in side cells, article in the center cell. */
  private def tablePage(seed: Int): Page = {
    val r = new scala.util.Random(2000 + seed)
    val main = scala.collection.mutable.ArrayBuffer.empty[String]
    val boil = scala.collection.mutable.ArrayBuffer.empty[String]
    def menuCell(tag: String): String = {
      val links = (0 until 8 + r.nextInt(6)).map { l =>
        val ws = words(r, s"$tag${seed}l${l}w", 1 + r.nextInt(2)); boil ++= ws
        s"""<a href="/$tag/$l">${ws.mkString(" ")}</a><br/>"""
      }
      s"<td>${links.mkString}</td>"
    }
    val paras = (0 until 3 + r.nextInt(3)).map { p =>
      val ws = words(r, s"cell${seed}p${p}w", 18 + r.nextInt(20)); main ++= ws; para(ws)
    }
    val footWs = words(r, s"tfoot${seed}w", 5); boil ++= footWs
    val html =
      s"""<html><body><table width="100%"><tr>
         |${menuCell("left")}
         |<td><h2>page $seed</h2>${paras.mkString("\n")}</td>
         |${menuCell("right")}
         |</tr><tr><td colspan="3"><a href="/about">${footWs.mkString(" ")}</a></td></tr>
         |</table></body></html>""".stripMargin
    (html, main.toSet, boil.toSet)
  }

  /** 4. Single-div SPA: chrome divs flagged only by class names. */
  private def spaPage(seed: Int): Page = {
    val r = new scala.util.Random(3000 + seed)
    val main = scala.collection.mutable.ArrayBuffer.empty[String]
    val boil = scala.collection.mutable.ArrayBuffer.empty[String]
    val menuWs = (0 until 6).map { l =>
      val ws = words(r, s"spm${seed}l${l}w", 2); boil ++= ws
      s"""<div><a href="/m/$l">${ws.mkString(" ")}</a></div>"""
    }
    val sideWs = words(r, s"spside${seed}w", 15 + r.nextInt(10)); boil ++= sideWs
    val promoWs = words(r, s"sppromo${seed}w", 12 + r.nextInt(8)); boil ++= promoWs
    val paras = (0 until 3 + r.nextInt(3)).map { p =>
      val ws = words(r, s"spa${seed}p${p}w", 20 + r.nextInt(20)); main ++= ws
      s"""<div><div>${ws.mkString(" ")}.</div></div>"""
    }
    val html =
      s"""<html><body><div id="root"><div><div>
         |<div class="top-menu">${menuWs.mkString}</div>
         |<div><div>${paras.mkString("\n")}</div></div>
         |<div class="sidebar"><div>${sideWs.mkString(" ")}</div></div>
         |<div class="promo-box"><div>${promoWs.mkString(" ")}</div></div>
         |</div></div></div></body></html>""".stripMargin
    (html, main.toSet, boil.toSet)
  }

  private def evalClass(name: String, pages: Seq[Page],
                        recallFloor: Double = 0.9, leakCeil: Double = 0.1): Unit = {
    var recallSum = 0.0
    var leakSum = 0.0
    pages.foreach { case (html, mainWords, boilWords) =>
      val got = MainContent.extract(html).text
        .split("[^A-Za-z0-9]+").filter(_.nonEmpty).toSet
      recallSum += mainWords.count(got.contains).toDouble / mainWords.size
      leakSum += boilWords.count(got.contains).toDouble / boilWords.size
    }
    val recall = recallSum / pages.size
    val leak = leakSum / pages.size
    info(f"$name: body recall=$recall%.3f boilerplate leakage=$leak%.3f (n=${pages.size})")
    assert(recall >= recallFloor, f"$name recall $recall%.3f below floor $recallFloor")
    assert(leak <= leakCeil, f"$name leakage $leak%.3f above ceiling $leakCeil")
  }

  test("comment threads longer than the article") {
    evalClass("comments", (0 until 40).map(commentPage))
  }
  test("nav-dominant portal pages") {
    evalClass("portal", (0 until 40).map(portalPage))
  }
  test("tables-as-layout pages") {
    evalClass("table-layout", (0 until 40).map(tablePage))
  }
  test("single-div SPA pages") {
    evalClass("spa", (0 until 40).map(spaPage))
  }
}
