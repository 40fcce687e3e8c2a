package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class QualityFiltersSpec extends AnyFunSuite {

  private implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("quality-filters")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def flagsFor(text: String): Map[String, Int] = {
    import spark.implicits._
    val row = QualityFilters.gopherFlags(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head
    Seq("ok_word_count", "ok_mean_word_len", "ok_alpha", "ok_symbol", "ok_stop", "keep")
      .map(c => c -> row.getAs[Int](c)).toMap
  }

  // 60 plain words incl. >=2 distinct stopwords: passes every rule
  private val goodText =
    (("the quick brown fox jumps over and over for fun" + " ") * 6).trim

  test("gopher flags: clean text keeps, each rule fails for its own reason") {
    val good = flagsFor(goodText)
    assert(good.values.forall(_ == 1), s"expected all-pass: $good")

    // too short (10 words)
    val short = flagsFor("the cat and dog sat on the mat all day")
    assert(short("ok_word_count") === 0 && short("keep") === 0)
    assert(short("ok_stop") === 1) // other rules unaffected

    // mean word length > 10
    val longWords = flagsFor(Array.fill(60)("pneumonoultramicroscopic").mkString(" ")
      + " the and of to")
    assert(longWords("ok_mean_word_len") === 0 && longWords("keep") === 0)

    // >20% purely numeric words -> alpha fraction below 0.8
    val numeric = flagsFor((("12345 67890 " * 30) + "the and of in is it ").trim)
    assert(numeric("ok_alpha") === 0 && numeric("keep") === 0)

    // symbol-to-word ratio over 0.1 (every 5th word is '#')
    val symbols = flagsFor((("alpha beta gamma delta # " * 12) + "the and").trim)
    assert(symbols("ok_symbol") === 0 && symbols("keep") === 0)

    // no stopwords at all
    val noStop = flagsFor(Array.fill(60)("lorem").mkString(" "))
    assert(noStop("ok_stop") === 0 && noStop("keep") === 0)
  }

  test("gopher flags stay in codegen: no UDF in the plan") {
    import spark.implicits._
    val plan = QualityFilters.gopherFlags(Seq((1L, goodText)).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), plan)
  }

  test("derived lines: 8-word chunks, short tail, empty text") {
    import spark.implicits._
    val words = (1 to 17).map(i => s"w$i").mkString(" ")
    val lines = Seq((1L, words), (2L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), QualityFilters.derivedLines(col("text")).as("lines"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(lines(1L) === Seq(
      (1 to 8).map(i => s"w$i").mkString(" "),
      (9 to 16).map(i => s"w$i").mkString(" "),
      "w17"))
    assert(lines(2L).isEmpty)
  }

  test("line-shape flags: bullet and ellipsis fractions, planted failures") {
    import spark.implicits._
    def shapeFor(text: String): (Long, Long, Long, Int, Int, Int) = {
      val r = QualityFilters.lineShapeFlags(Seq((1L, text)).toDF("doc_id", "text"))
        .collect().head
      (r.getAs[Int]("n_lines").toLong, r.getAs[Int]("n_bullet_lines").toLong,
        r.getAs[Int]("n_ellipsis_lines").toLong, r.getAs[Int]("ok_bullet"),
        r.getAs[Int]("ok_ellipsis"), r.getAs[Int]("keep"))
    }
    // clean prose: keeps
    assert(shapeFor("first line\nsecond line\nthird line") ===
      ((3L, 0L, 0L, 1, 1, 1)))
    // all-bullet list (10/10 > 90%): rejected by the bullet rule alone
    val bullets = (1 to 10).map(i => s"- item $i").mkString("\n")
    assert(shapeFor(bullets) === ((10L, 10L, 0L, 0, 1, 0)))
    // 9/10 bullets: exactly at the <= 90% boundary, keeps
    val nineBullets = ((1 to 9).map(i => s"* item $i") :+ "prose tail").mkString("\n")
    assert(shapeFor(nineBullets) === ((10L, 9L, 0L, 1, 1, 1)))
    // 4/10 ellipsis-ended (> 30%): rejected by the ellipsis rule alone
    val ell = ((1 to 4).map(i => s"teaser $i...") ++ (5 to 10).map(i => s"line $i")).mkString("\n")
    assert(shapeFor(ell) === ((10L, 0L, 4L, 1, 0, 0)))
    // 3/10: at the <= 30% boundary, keeps
    val ell3 = ((1 to 3).map(i => s"teaser $i...") ++ (4 to 10).map(i => s"line $i")).mkString("\n")
    assert(shapeFor(ell3) === ((10L, 0L, 3L, 1, 1, 1)))
    // stays in codegen
    val plan = QualityFilters.lineShapeFlags(Seq((1L, "a\nb")).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), plan)
  }

  private def repFor(text: String): Map[String, AnyVal] = {
    import spark.implicits._
    val row = QualityFilters.gopherRepetitionFlags(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head
    row.schema.fieldNames.filterNot(_ == "doc_id")
      .map(c => c -> row.getAs[Int](c).asInstanceOf[AnyVal]).toMap
  }

  test("gopher repetition flags: planted failures trip exactly their rule") {
    // 60 distinct words: nothing repeats, every rule passes
    val clean = repFor((0 until 60).map(i => f"word$i%02d").mkString(" "))
    assert(clean("n_dup_lines") === 0 && clean("keep") === 1, s"$clean")

    // 8 identical 8-word lines: dup-line fraction 7/8 >> 30%
    val dupLines = repFor(Array.fill(8)((1 to 8).map(i => s"w$i").mkString(" ")).mkString(" "))
    assert(dupLines("n_dup_lines") === 7)
    assert(dupLines("ok_dup_line") === 0 && dupLines("ok_dup_line_char") === 0)
    assert(dupLines("keep") === 0)

    // "alpha beta" leads every otherwise-distinct 8-word line: the top
    // 2-gram covers 9*10 of ~270 chars (>20%) while no line duplicates
    val topBigram = repFor((1 to 10)
      .map(i => s"alpha beta x$i c$i d$i e$i f$i g$i").mkString(" "))
    assert(topBigram("n_dup_lines") === 0)
    assert(topBigram("ok_top2") === 0 && topBigram("keep") === 0)

    // "p q r s t" (5 single-char words) repeats in every chunk, diluted by
    // three 9-char unique words: dup-5-gram coverage 50/320 > 15% while
    // the inner top-2/3/4-gram fractions stay under their bars
    val dup5 = repFor((0 until 10)
      .map(i => s"p q r s t u${i}aaaaaaa v${i}bbbbbbb w${i}ccccccc").mkString(" "))
    assert(dup5("n_dup_lines") === 0)
    assert(dup5("ok_top2") === 1 && dup5("ok_top3") === 1 && dup5("ok_top4") === 1,
      s"$dup5")
    assert(dup5("ok_dup5") === 0 && dup5("keep") === 0, s"$dup5")
    assert(dup5("dup5_chars") === 50, s"$dup5")

    // empty text: zero denominators pass vacuously (0 <= 0)
    val empty = repFor("")
    assert(empty("n_lines") === 0 && empty("keep") === 1)

    // stays in codegen
    import spark.implicits._
    val plan = QualityFilters.gopherRepetitionFlags(
      Seq((1L, "a b c")).toDF("doc_id", "text")).queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), plan)
  }

  test("gopher repetition kernel: bit-identical to the array-HOF reference " +
       "formulas on a randomized corpus") {
    import spark.implicits._
    // the ORIGINAL per-position array-HOF spelling of the statistics (the
    // O(W²) reference the one-pass kernel replaced), kept here as an
    // executable specification — both must agree on every generated doc
    def hofStats(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val dupNs = 5 to 10
      val staged = df.select(col("doc_id"), QualityFilters.words(col("text")).as("w"),
          QualityFilters.derivedLines(col("text")).as("lines"))
        .withColumn("dl", array_distinct(col("lines")))
        .withColumns(
          (2 to 10).map(n => s"ng$n" ->
            when(size(col("w")) >= n,
              transform(sequence(lit(1), size(col("w")) - (n - 1)),
                i => array_join(slice(col("w"), i, lit(n)), " ")))
              .otherwise(array().cast("array<string>"))).toMap)
        .withColumns((2 to 4).map(n => s"dist$n" -> array_distinct(col(s"ng$n"))).toMap)
        .withColumns(dupNs.map { n =>
          s"ds$n" -> filter(sequence(lit(1), size(col("w")) - (n - 1)),
            i => size(filter(col(s"ng$n"), y => y === element_at(col(s"ng$n"), i))) > 1)
        }.toMap)
        .withColumns((2 to 4).map { n =>
          s"mc$n" -> array_max(transform(col(s"dist$n"),
            d => size(filter(col(s"ng$n"), y => y === d))))
        }.toMap)
      def topChars(n: Int) = coalesce(col(s"mc$n") * array_max(transform(
        filter(col(s"dist$n"),
          d => size(filter(col(s"ng$n"), y => y === d)) === col(s"mc$n")),
        d => length(d) - (n - 1))), lit(0))
      def dupChars(n: Int) =
        when(size(col("w")) >= n,
          aggregate(sequence(lit(1), size(col("w"))), lit(0), (a, j) =>
            a + when(exists(col(s"ds$n"), i => i <= j && j <= i + (n - 1)),
              length(element_at(col("w"), j))).otherwise(0)))
          .otherwise(lit(0))
      def lineCnt(d: org.apache.spark.sql.Column) =
        size(filter(col("lines"), y => y === d))
      staged.select(
        (Seq(col("doc_id"), size(col("lines")).as("n_lines"),
          (size(col("lines")) - size(col("dl"))).as("n_dup_lines"),
          aggregate(col("lines"), lit(0), (a, l) => a + length(l)).as("n_line_chars"),
          aggregate(col("dl"), lit(0), (a, d) =>
            a + when(lineCnt(d) > 1, lineCnt(d) * length(d)).otherwise(0))
            .as("n_dup_line_chars"),
          aggregate(col("w"), lit(0), (a, x) => a + length(x)).as("n_word_chars"),
          topChars(2).as("top2_chars"), topChars(3).as("top3_chars"),
          topChars(4).as("top4_chars")) ++
          dupNs.map(n => dupChars(n).as(s"dup${n}_chars"))): _*)
    }
    // randomized docs with heavy repetition pressure: small vocabularies
    // force duplicated lines/grams of every order; vary word lengths so
    // char-length tie-breaks are exercised; include unicode words
    val rnd = new scala.util.Random(20260818)
    val vocabs = Seq(
      (1 to 4).map(i => "w" * i),
      Seq("alpha", "béta", "γδ", "x", "yy", "zzz"),
      (1 to 30).map(i => s"t$i"),
      Seq("a"))
    val docs = (0 until 120).map { id =>
      val v = vocabs(id % vocabs.length)
      val len = rnd.nextInt(120)
      (id.toLong, (0 until len).map(_ => v(rnd.nextInt(v.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val fast = QualityFilters.gopherRepetitionFlags(docs)
      .select("doc_id", "n_lines", "n_dup_lines", "n_line_chars",
        "n_dup_line_chars", "n_word_chars", "top2_chars", "top3_chars",
        "top4_chars", "dup5_chars", "dup6_chars", "dup7_chars", "dup8_chars",
        "dup9_chars", "dup10_chars")
      .orderBy("doc_id").collect().map(_.toSeq)
    val ref = hofStats(docs).orderBy("doc_id").collect().map(_.toSeq)
    assert(fast.length === ref.length)
    fast.zip(ref).foreach { case (f, r) => assert(f === r) }
  }

  test("gopher repetition kernel: a 150k-word pathological doc finishes in " +
       "linear time (the O(W²) straggler class is gone)") {
    import spark.implicits._
    // maximal repetition pressure: a small cycling vocabulary means nearly
    // every n-gram duplicates — the worst case for the dup-gram marking
    val big = (0 until 150000).map(i => s"w${i % 13}").mkString(" ")
    val df = Seq((1L, big)).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val row = QualityFilters.gopherRepetitionFlags(df).collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    // the quadratic HOF form needed ~2*10^10 string comparisons here (many
    // minutes); the kernel is linear — generous bound for a throttled host
    assert(secs < 60.0, f"took $secs%.1f s")
    assert(row.getAs[Int]("n_word_chars") > 0)
    // every position is covered by a duplicated 5..10-gram
    assert(row.getAs[Int]("dup5_chars") === row.getAs[Int]("n_word_chars"))
    assert(row.getAs[Int]("keep") === 0)
  }

  test("c4Flags: line keep rules, page flags, sentence floor, clean_text") {
    import spark.implicits._
    val page1 =
      "This line has five good words." + "\n" +  // kept, 6 words, 1 sentence
      "Too short."                      + "\n" +  // dropped: < 5 words
      "No terminal punctuation here at all" + "\n" + // dropped: no [.!?"] end
      "Enable javascript to view this content." + "\n" + // dropped: javascript
      "Quoted lines also count as terminal \"" + "\n" +  // kept, 0 sentences
      "Two sentences live here. Yes they do!"             // kept, 2 sentences
    val page2 = "A lorem ipsum page with five words."     // lorem -> reject
    val page3 = "A curly { brace page with six words."    // brace -> reject
    val page4 = "One sentence only but five words."       // < 3 sentences -> reject
    val docs = Seq((1L, page1), (2L, page2), (3L, page3), (4L, page4))
      .toDF("doc_id", "text")
    val out = QualityFilters.c4Flags(docs).orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getInt(1) === 6 && r1.getInt(2) === 3)       // n_lines, n_kept
    assert(r1.getInt(3) === 3)                             // sentences: 1+0+2
    assert(r1.getInt(4) === 0 && r1.getInt(5) === 0)       // no lorem/brace
    assert(r1.getString(6) ===
      "This line has five good words.\n" +
      "Quoted lines also count as terminal \"\n" +
      "Two sentences live here. Yes they do!")
    assert(r1.getInt(7) === 1)                             // keep
    assert(out(1).getInt(4) === 1 && out(1).getInt(7) === 0) // lorem
    assert(out(2).getInt(5) === 1 && out(2).getInt(7) === 0) // brace
    assert(out(3).getInt(3) === 1 && out(3).getInt(7) === 0) // sentence floor

    // no shuffle, no UDF
    val plan = QualityFilters.c4Flags(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("ScalaUDF"), plan)
  }

  test("line dedup: corpus-wide duplicate chunks counted per document") {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"dup$i").mkString(" ")
    def uniq(d: Int, n: Int) = (1 to n * 8).map(i => s"u${d}x$i").mkString(" ")
    val docs = Seq(
      1L -> s"$shared ${uniq(1, 2)}",      // 3 lines, 1 shared with doc 2
      2L -> s"$shared ${uniq(2, 1)}",      // 2 lines, 1 shared with doc 1
      3L -> s"$shared $shared",            // internal repeat also counts
      4L -> uniq(4, 2)                     // fully unique
    ).toDF("doc_id", "text")
    val byId = QualityFilters.lineDedupStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byId(1L) === ((3L, 1L)))
    assert(byId(2L) === ((2L, 1L)))
    assert(byId(3L) === ((2L, 2L)))
    assert(byId(4L) === ((2L, 0L)))
  }
}
