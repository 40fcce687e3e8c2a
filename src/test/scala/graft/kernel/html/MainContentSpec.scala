package graft.kernel.html

import org.scalatest.funsuite.AnyFunSuite

class MainContentSpec extends AnyFunSuite {

  private val page =
    """<!DOCTYPE html>
      |<html><head><title>My &amp; Title</title>
      |<style>body { color: red; } /* <p>not text</p> */</style>
      |<script>if (a < b) { document.write("<div>junk</div>"); }</script>
      |</head>
      |<body>
      |<header><h1>Site Banner</h1><a href="/">home</a> <a href="/x">other</a></header>
      |<nav><ul><li><a href="/a">Link A</a></li><li><a href="/b">Link B</a></li></ul></nav>
      |<main>
      |<h2>The Article Heading</h2>
      |<p>This is the first real paragraph of the article with enough words
      |to count as main content for the classifier to keep it.</p>
      |<p>Second paragraph, also long enough to be kept as content; it talks
      |about entities like &eacute; and &#8212; and &lt;tags&gt;.</p>
      |<p><a href="/spam">click</a> <a href="/spam2">here</a> <a href="/s3">now</a></p>
      |<pre>  raw   spacing
      |kept</pre>
      |</main>
      |<aside><p>Advertisement text long enough to look like a paragraph but
      |inside an aside so it must be dropped by context.</p></aside>
      |<footer><p>Copyright 2026 Example Corp. All rights reserved legal text
      |footer junk that is long enough to look real.</p></footer>
      |</body></html>""".stripMargin

  test("boilerplate stripped: nav/header/footer/aside and link-lists dropped") {
    val ex = MainContent.extract(page)
    assert(ex.text.contains("first real paragraph"))
    assert(ex.text.contains("Second paragraph"))
    assert(ex.text.contains("The Article Heading"))
    assert(!ex.text.contains("Site Banner"))
    assert(!ex.text.contains("Link A"))
    assert(!ex.text.contains("Advertisement"))
    assert(!ex.text.contains("Copyright"))
    assert(!ex.text.contains("click"))
    assert(!ex.text.contains("color: red"))
    assert(!ex.text.contains("junk</div>"))
  }

  test("title captured separately; entities decoded") {
    val ex = MainContent.extract(page)
    assert(ex.title === "My & Title")
    assert(ex.text.contains("é and — and <tags>"))
  }

  test("pre blocks keep verbatim whitespace") {
    val ex = MainContent.extract(page)
    assert(ex.text.contains("  raw   spacing\nkept"))
  }

  test("spans are sorted, non-overlapping, within bounds, and cover kept blocks") {
    val ex = MainContent.extract(page)
    assert(ex.spans.nonEmpty)
    var last = 0L
    ex.spans.foreach { s =>
      assert(s.start >= last && s.end >= s.start && s.end <= ex.text.length)
      last = s.end
    }
    val h = ex.spans.find(_.kind == "h2")
    assert(h.isDefined)
    assert(ex.text.substring(h.get.start.toInt, h.get.end.toInt) === "The Article Heading")
  }

  test("whitespace collapsing matches HTML rendering semantics") {
    val ex = MainContent.extract(
      "<p>a  lot\n of   insignificant\t\twhitespace in this paragraph " +
        "which still has enough words to be kept by the classifier</p>")
    assert(ex.text.startsWith("a lot of insignificant whitespace"))
  }

  test("attributes with '>' inside quotes do not break tag scanning") {
    val ex = MainContent.extract(
      """<p title="a > b" data-x='1 > 0'>Quoted attr paragraph with more than
        |ten words to be counted as content by the block classifier.</p>""".stripMargin)
    assert(ex.text.contains("Quoted attr paragraph"))
  }

  test("entity decoder: numeric, hex, named, unknown, astral") {
    import HtmlTokenizer.decodeEntities
    assert(decodeEntities("&#65;&#x42;c") === "ABc")
    assert(decodeEntities("&amp;&unknown;&") === "&&unknown;&")
    assert(decodeEntities("&#128512;") === new String(Character.toChars(0x1F600)))
    assert(decodeEntities("x&#xD800;y") === "x&#xD800;y") // surrogate rejected
    assert(decodeEntities("&nbsp;") === " ")
  }

  test("tokenizer never throws and extraction is deterministic on arbitrary input") {
    val fragments = Array("word", "<", ">", "</", "<div>", "<!--", "-->", "&#",
      "<script>", "&amp;", "<a href='x>", "<p", "text with words",
      "<table><tr><td>", "&#x41;", "<![CDATA[", "<?php ", "</p>")
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val s = (1 to rnd.nextInt(40)).map(_ => fragments(rnd.nextInt(fragments.length))).mkString
      val a = MainContent.extract(s)
      val b = MainContent.extract(s)
      assert(a.text == b.text && a.spans == b.spans)
      a.spans.foreach(sp => assert(sp.start >= 0 && sp.end <= a.text.length))
    }
  }

  test("unclosed rawtext (script without close) consumes to end, no text leak") {
    val ex = MainContent.extract("<p>Good paragraph with plenty of words here to be " +
      "kept by the extractor today</p><script>var x = '<p>bad</p>';")
    assert(ex.text.contains("Good paragraph"))
    assert(!ex.text.contains("bad"))
  }
}
