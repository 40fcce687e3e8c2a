package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Specs for the round-6 corpus operators: line dedup with rebuild,
  * readability, crawl delta, script profile. */
class CorpusOpsSpec extends AnyFunSuite {

  private implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("corpusops")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // ----------------------------------------------------- dedupLinesRebuild
  test("dedupLinesRebuild: only the first corpus occurrence survives") {
    // chunk=2 lines: doc1 = ["a b", "c d"], doc2 = ["c d", "e f"],
    // doc3 = ["a b"]; "c d" first occurs in doc1@1, "a b" in doc1@0
    val docs = Seq(
      (1L, "a b c d"), (2L, "c d e f"), (3L, "a b")
    ).toDF("doc_id", "text")
    val out = QualityFilters.dedupLinesRebuild(docs, chunk = 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((2L, 0L, "a b\nc d")))
    assert(out(2L) === ((2L, 1L, "e f")))
    assert(out(3L) === ((1L, 1L, "")))
  }

  test("dedupLinesRebuild: duplicate WITHIN one doc keeps only the earlier line") {
    val docs = Seq((5L, "x y z w x y")).toDF("doc_id", "text")
    val out = QualityFilters.dedupLinesRebuild(docs, chunk = 2).collect()
    assert(out.length === 1)
    assert(out(0).getLong(2) === 1L) // one removed ("x y" at idx 2)
    assert(out(0).getString(3) === "x y\nz w")
  }

  test("dedupLinesRebuild: empty/whitespace docs yield zero lines, empty text") {
    val docs = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
    val out = QualityFilters.dedupLinesRebuild(docs, chunk = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(3)))).toMap
    assert(out(2L) === ((0L, "")))
    assert(out(1L) === ((1L, "a b")))
  }

  // ------------------------------------------------------ readabilityStats
  test("readabilityStats: counts and integer FK formula") {
    // 1 sentence, 4 words, syllable groups: "the"(1) "cat"(1) "sat"(1)
    // "down"(1) = 4
    val docs = Seq((1L, "The cat sat down.")).toDF("doc_id", "text")
    val r = QualityFilters.readabilityStats(docs).collect()(0)
    assert(r.getLong(1) === 4L) // n_words
    assert(r.getLong(2) === 1L) // n_sentences
    assert(r.getLong(3) === 4L) // n_syllables
    // (39*4)/1 + (1180*4)/4 - 1559 = 156 + 1180 - 1559 = -223
    assert(r.getLong(4) === -223L)
    assert(r.getInt(5) === 0) // below the gate
  }

  test("readabilityStats: zero sentences or words score 0 and fail the gate") {
    val docs = Seq((1L, "no terminal punctuation here"), (2L, ""))
      .toDF("doc_id", "text")
    val out = QualityFilters.readabilityStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getInt(5)))).toMap
    assert(out(1L) === ((0L, 0)))
    assert(out(2L) === ((0L, 0)))
  }

  test("readabilityStats: mid-range doc passes the gate, formula ties to counts") {
    val text = "the quick brown fox jumps over the lazy dog near the old " +
      "red barn today. children often play simple games outside when the " +
      "weather is warm and sunny there."
    val r = QualityFilters.readabilityStats(
      Seq((1L, text)).toDF("doc_id", "text")).collect()(0)
    val (w, s, syl) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(r.getLong(4) === (39L * w) / s + (1180L * syl) / w - 1559L)
    assert(r.getLong(4) >= 200L && r.getLong(4) <= 1600L)
    assert(r.getInt(5) === 1)
  }

  // ------------------------------------------------------------ crawlDelta
  test("crawlDelta: added/removed/changed/unchanged by content hash") {
    val old = Seq((1L, "aa"), (2L, "bb"), (3L, "cc")).toDF("doc_id", "text")
    val neu = Seq((1L, "aa"), (2L, "bb2"), (4L, "dd")).toDF("doc_id", "text")
    val out = CorpusStats.crawlDelta(old, neu).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  // ------------------------------------------------------------ datasetCard
  test("datasetCard: totals, gate count, exact vs normalized distincts") {
    val docs = Seq(
      (1L, "a b"), (2L, "a b"),  // exact duplicate pair
      (3L, "A, b!"),             // normalized-only duplicate of "a b"
      (4L, "c d e")
    ).toDF("doc_id", "text")
    val r = CorpusStats.datasetCard(docs).collect()(0)
    assert(r.getLong(0) === 4L)  // n_docs
    assert(r.getLong(1) === 16L) // n_chars: 3+3+5+5
    assert(r.getLong(2) === 9L)  // n_tokens: 2+2+2+3
    assert(r.getLong(3) === 0L)  // n_len_ok at the default 50-word floor
    assert(r.getLong(4) === 3L)  // exact uniques
    assert(r.getLong(5) === 2L)  // normalized uniques
    val r2 = CorpusStats.datasetCard(docs, minWords = 2L, maxWords = 2L)
      .collect()(0)
    assert(r2.getLong(3) === 3L) // three 2-token docs pass the gate
  }

  // ---------------------------------------------------- crawlDelta (nulls)
  test("crawlDelta: null-text rows classify by PRESENCE, not fingerprint nullity") {
    val old = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Some("x"))).toDF("doc_id", "text")
    val neu = Seq((2L, Option.empty[String]), (3L, Option.empty[String]),
      (4L, Option.empty[String])).toDF("doc_id", "text")
    val out = CorpusStats.crawlDelta(old, neu).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(
      1L -> "removed",   // null text, present only in old
      2L -> "unchanged", // null text both sides: null-safe equal
      3L -> "changed",   // text -> null is a content change
      4L -> "added"))    // null text, present only in new
  }

  // ------------------------------------------------------- sourceSignature
  test("sourceSignature: exact integer lifts and per-source ranking") {
    val docs = Seq(
      ("A", "x x y"), ("B", "y z")
    ).toDF("source", "text")
    // T_A=3, T_B=2, T_c=5; tf_c: x=2, y=2, z=1
    // A,x: (2*5*1000)//(2*3)=1666  A,y: (1*5*1000)//(2*3)=833
    // B,z: (1*5*1000)//(1*2)=2500  B,y: (1*5*1000)//(2*2)=1250
    val out = CorpusStats.sourceSignature(docs, k = 5).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getInt(3)))).toMap
    assert(out(("A", "x")) === ((1666L, 1)))
    assert(out(("A", "y")) === ((833L, 2)))
    assert(out(("B", "z")) === ((2500L, 1)))
    assert(out(("B", "y")) === ((1250L, 2)))
  }

  test("sourceSignature: k-cut keeps only the top lifts, tie broken by token") {
    val docs = Seq(("A", "p q r s t u")).toDF("source", "text")
    // single source: every token has identical lift; ties break alphabetically
    val out = CorpusStats.sourceSignature(docs, k = 3).collect()
      .map(r => (r.getString(1), r.getInt(3)))
    assert(out.sortBy(_._2).map(_._1).toSeq === Seq("p", "q", "r"))
  }

  // --------------------------------------------------------- robotsVerdict
  test("robotsVerdict: longest match wins, ties break to allow, default allow") {
    val docs = Seq(
      (1L, "a.com", "/private/x"),     // deny /private
      (2L, "a.com", "/private/ok/y"),  // deeper allow carve-in
      (3L, "a.com", "/public"),        // only '/' allow matches
      (4L, "a.com", "/tie/z"),         // same-length allow+deny -> allow
      (5L, "b.org", "/anything"),      // no rules for host -> default allow
      (6L, "c.net", "/x")              // default-deny host
    ).toDF("doc_id", "host", "path")
    val rules = Seq(
      ("a.com", "/", 1), ("a.com", "/private", 0),
      ("a.com", "/private/ok", 1),
      ("a.com", "/tie", 1), ("a.com", "/tie", 0),
      ("c.net", "/", 0))
    val out = CorpusStats.robotsVerdict(docs, rules).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(out(1L) === ((0, 2))) // '/' + '/private'
    assert(out(2L) === ((1, 3)))
    assert(out(3L) === ((1, 1)))
    assert(out(4L) === ((1, 3)))
    assert(out(5L) === ((1, 0)))
    assert(out(6L) === ((0, 1)))
  }

  test("robotsVerdict plan: rule side broadcasts, no shuffle on the doc side") {
    val docs = Seq((1L, "a.com", "/x")).toDF("doc_id", "host", "path")
    val plan = CorpusStats.robotsVerdict(docs, Seq(("a.com", "/", 1)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  // --------------------------------------------------------- scriptProfile
  test("scriptProfile: codepoint counts per script and dominant verdict") {
    val docs = Seq(
      (1L, "hello 123"),
      (2L, "привет мир x"),
      (3L, "你好世界"),
      (4L, "مرحبا")
    ).toDF("doc_id", "text")
    val out = CorpusStats.scriptProfile(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getString(6)))).toMap
    assert(out(1L) === ((5L, 0L, 0L, 0L, 3L, "latin")))
    assert(out(2L) === ((1L, 9L, 0L, 0L, 0L, "cyrillic")))
    assert(out(3L) === ((0L, 0L, 4L, 0L, 0L, "cjk")))
    assert(out(4L) === ((0L, 0L, 0L, 5L, 0L, "arabic")))
  }

  test("scriptProfile: all-zero counts break ties to latin (fixed priority)") {
    val out = CorpusStats.scriptProfile(Seq((9L, "...")).toDF("doc_id", "text"))
      .collect()(0)
    assert(out.getString(6) === "latin")
  }
}
