package graft.kernel.html

import scala.collection.mutable

/**
 * Main-content extraction: block segmentation over the tokenizer's event
 * stream + a text-density/link-density boilerplate classifier in the spirit
 * of Kohlschütter et al., "Boilerplate Detection using Shallow Text
 * Features" (WSDM 2010) and trafilatura-class heuristics — word count per
 * block, link density, structural context (nav/header/footer/aside), and
 * neighbor smoothing.
 *
 * Output is the extracted main text (blocks joined with "\n") plus one span
 * per kept block with [start,end) character offsets into that text and the
 * block's tag kind — the `spans` column mandated by BASELINE.json
 * north_star.
 */
object MainContent {

  final case class Span(kind: String, start: Long, end: Long)
  final case class Extracted(text: String, spans: Seq[Span], title: String)

  /** Tags that terminate the current text block. */
  private val BlockTags = Set(
    "p", "div", "section", "article", "main", "body", "html",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "ul", "ol", "li", "dl", "dt", "dd",
    "table", "thead", "tbody", "tr", "td", "th",
    "blockquote", "pre", "figure", "figcaption", "hr",
    "header", "footer", "nav", "aside", "form", "fieldset",
    "address", "details", "summary")

  /** Contexts whose entire subtree is boilerplate or non-content. */
  private val DropContexts = Set("nav", "header", "footer", "aside", "form",
    "button", "select", "option", "label", "menu", "svg", "head", "figure")

  /** class/id tokens that mark a container as boilerplate (readability/
    * trafilatura-style hints): comment threads, nav/menu chrome, share and
    * promo widgets. Matched as WHOLE tokens of the class/id value (split on
    * non-alphanumerics), never substrings — "header" must not match
    * "subheader-article" by accident. */
  private val BoilerClassTokens = Set(
    "comment", "comments", "commentlist", "reply", "replies", "disqus",
    "sidebar", "footer", "nav", "navbar", "navigation", "menu", "menubar",
    "breadcrumb", "breadcrumbs", "share", "sharing", "sharebar", "social",
    "related", "recommended", "promo", "promotion", "sponsored",
    "ad", "ads", "advert", "advertisement", "adsense", "banner",
    "widget", "cookie", "popup", "modal", "subscribe", "newsletter",
    "pagination", "pager", "masthead", "byline", "crumbs")

  /** Container tags that are reliably balanced in generated HTML — the only
    * tags the class-drop stack counts. p/li/td are NOT counted: they are
    * routinely left unclosed and would desynchronize the stack. */
  private val CountedContainers = Set("div", "section", "article", "main",
    "ul", "ol", "dl", "table", "blockquote", "figure", "form", "fieldset",
    "details", "header", "footer", "nav", "aside")

  private def hasBoilerClass(classId: String): Boolean = {
    if (classId.isEmpty) return false
    var start = 0
    var i = 0
    val n = classId.length
    while (i <= n) {
      val boundary = i == n || !Character.isLetterOrDigit(classId.charAt(i))
      if (boundary) {
        if (i > start && BoilerClassTokens.contains(classId.substring(start, i)))
          return true
        start = i + 1
      }
      i += 1
    }
    false
  }

  /** Contexts whose text never renders. */
  private val InvisibleTags = Set("script", "style", "template", "noscript",
    "iframe", "object", "textarea", "title", "xmp")

  private val HeadingTags = Set("h1", "h2", "h3", "h4", "h5", "h6")

  private final class Block(
      var kind: String,
      var dropDepth: Int,  // >0: inside nav/header/footer/aside/... at creation
      val sb: java.lang.StringBuilder = new java.lang.StringBuilder,
      var linkedChars: Int = 0,
      var pre: Boolean = false) {
    def totalChars: Int = sb.length
  }

  private final class Builder extends HtmlTokenizer.Sink {
    val blocks = mutable.ArrayBuffer.empty[Block]
    private var cur = new Block("p", 0)
    private var anchorDepth = 0
    private var dropDepth = 0
    private var invisibleDepth = 0
    private var preDepth = 0
    private var titleBuf = new java.lang.StringBuilder
    private var inTitle = false
    private var pendingSpace = false

    private def flush(nextKind: String): Unit = {
      if (cur.totalChars > 0) blocks += cur
      cur = new Block(nextKind, dropDepth)
      cur.pre = preDepth > 0
      pendingSpace = false
    }

    override def text(s: String, rawtext: Boolean): Unit = {
      if (inTitle) { titleBuf.append(s); return }
      if (invisibleDepth > 0 || rawtext) return
      val decoded = HtmlTokenizer.decodeEntities(s)
      if (preDepth > 0) {
        cur.sb.append(decoded)
        if (anchorDepth > 0) cur.linkedChars += decoded.length
        return
      }
      // HTML whitespace collapsing
      var i = 0
      var appended = 0
      while (i < decoded.length) {
        val c = decoded.charAt(i)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') {
          pendingSpace = cur.totalChars > 0 || pendingSpace
        } else {
          if (pendingSpace && cur.totalChars > 0) { cur.sb.append(' '); appended += 1 }
          pendingSpace = false
          cur.sb.append(c)
          appended += 1
        }
        i += 1
      }
      if (anchorDepth > 0) cur.linkedChars += appended
    }

    // class-hinted boilerplate containers: entries are (tagName, openCount)
    // where openCount tracks unclosed counted-container DESCENDANTS, so the
    // drop scope closes with its element even in mildly-unbalanced HTML
    private val classDropNames = mutable.Stack.empty[String]
    private val classDropOpens = mutable.Stack.empty[Int]

    override def startTag(name: String, selfClosing: Boolean): Unit =
      startTag(name, selfClosing, "")

    override def startTag(name: String, selfClosing: Boolean, classId: String): Unit = {
      if (name == "title") { if (!selfClosing) inTitle = true; return }
      if (InvisibleTags.contains(name)) { if (!selfClosing) invisibleDepth += 1; return }
      if (name == "a") { if (!selfClosing) anchorDepth += 1; return }
      if (name == "br") { flush(cur.kind); return }
      val counted = CountedContainers.contains(name) && !selfClosing
      if (counted) {
        if (hasBoilerClass(classId)) {
          classDropNames.push(name)
          classDropOpens.push(0)
          dropDepth += 1
        } else if (classDropNames.nonEmpty) {
          classDropOpens.push(classDropOpens.pop() + 1)
        }
      }
      if (BlockTags.contains(name)) {
        flush(if (name == "div" || name == "body" || name == "html") "p" else name)
        if (DropContexts.contains(name) && !selfClosing) {
          dropDepth += 1
          cur.dropDepth = dropDepth
        }
        if (name == "pre" && !selfClosing) { preDepth += 1; cur.pre = true }
      } else if (DropContexts.contains(name) && !selfClosing) {
        dropDepth += 1
        cur.dropDepth = math.max(cur.dropDepth, dropDepth)
      }
    }

    override def endTag(name: String): Unit = {
      if (name == "title") { inTitle = false; return }
      if (InvisibleTags.contains(name)) { if (invisibleDepth > 0) invisibleDepth -= 1; return }
      if (name == "a") { if (anchorDepth > 0) anchorDepth -= 1; pendingSpace = true; return }
      if ((name == "body" || name == "html") && classDropNames.nonEmpty) {
        // safety valve: a class-hinted boiler container that was never
        // closed (or mis-nested past its counted descendants) must not
        // swallow the rest of the page — body/html end clears the scopes
        dropDepth = math.max(0, dropDepth - classDropNames.size)
        classDropNames.clear()
        classDropOpens.clear()
      }
      if (CountedContainers.contains(name) && classDropNames.nonEmpty) {
        val opens = classDropOpens.pop()
        if (opens > 0) classDropOpens.push(opens - 1)
        else if (classDropNames.top == name) {
          classDropNames.pop()
          if (dropDepth > 0) dropDepth -= 1
        } else classDropOpens.push(opens) // stray close of something else
      }
      if (BlockTags.contains(name)) {
        if (name == "pre" && preDepth > 0) preDepth -= 1
        if (DropContexts.contains(name) && dropDepth > 0) dropDepth -= 1
        flush("p")
      } else if (DropContexts.contains(name) && dropDepth > 0) dropDepth -= 1
    }

    def finish(): (IndexedSeq[Block], String) = {
      flush("p")
      (blocks.toIndexedSeq,
        HtmlTokenizer.decodeEntities(collapseWs(titleBuf.toString)))
    }
  }

  private def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pend = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) pend = sb.length > 0
      else { if (pend) sb.append(' '); pend = false; sb.append(c) }
      i += 1
    }
    sb.toString
  }

  private def wordCount(s: String): Int = {
    var words = 0
    var inWord = false
    var i = 0
    while (i < s.length) {
      val ws = Character.isWhitespace(s.charAt(i))
      if (!ws && !inWord) words += 1
      inWord = !ws
      i += 1
    }
    words
  }

  // Classifier thresholds (Kohlschütter-style defaults, tuned on fixtures).
  private val MaxLinkDensity = 0.333
  private val MinContentWords = 10
  private val SmoothableWords = 3

  /** Extract main content + spans from raw page string. Deterministic, never
    * throws on arbitrary input. */
  def extract(html: String): Extracted = {
    val builder = new Builder
    HtmlTokenizer.tokenize(html, builder)
    val (blocks, title) = builder.finish()

    val n = blocks.length
    val words = blocks.map(b => wordCount(b.sb.toString))
    val linkDensity = blocks.map(b =>
      if (b.totalChars == 0) 0.0 else b.linkedChars.toDouble / b.totalChars)
    val isHeading = blocks.map(b => HeadingTags.contains(b.kind))

    // Pass 1: strong classification.
    val strong = Array.tabulate(n) { i =>
      val b = blocks(i)
      b.dropDepth == 0 && linkDensity(i) <= MaxLinkDensity &&
        (words(i) >= MinContentWords ||
          (b.kind == "pre" && b.totalChars > 0) ||
          (b.kind == "blockquote" && words(i) >= SmoothableWords))
    }
    // Pass 2: neighbor smoothing — short clean blocks between/adjacent to
    // content survive; headings kept when followed by content.
    val kept = Array.tabulate(n) { i =>
      if (strong(i)) true
      else {
        val b = blocks(i)
        val clean = b.dropDepth == 0 && linkDensity(i) <= MaxLinkDensity && words(i) >= 1
        if (!clean) false
        else if (isHeading(i)) (i + 1 until math.min(i + 3, n)).exists(strong)
        else if (words(i) >= SmoothableWords) {
          val prev = (math.max(0, i - 2) until i).exists(strong)
          val next = (i + 1 until math.min(i + 3, n)).exists(strong)
          prev && next || (b.kind == "li" && (prev || next))
        } else false
      }
    }

    val out = new java.lang.StringBuilder
    val spans = Seq.newBuilder[Span]
    var first = true
    var i = 0
    while (i < n) {
      if (kept(i)) {
        val t0 = blocks(i).sb.toString
        val t = if (blocks(i).pre) t0 else t0 // pre kept verbatim; others already collapsed
        if (!first) out.append('\n')
        val start = out.length
        out.append(t)
        spans += Span(blocks(i).kind, start.toLong, out.length.toLong)
        first = false
      }
      i += 1
    }
    Extracted(out.toString, spans.result(), title)
  }
}
