package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends AnyFunSuite {

  private implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("corpusstats")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // ---------------------------------------------------------- hostProfile
  test("hostProfile: counts, distinct sources, char sums per host") {
    val df = Seq(
      ("a.com", "s1", 10L), ("a.com", "s1", 20L), ("a.com", "s2", 30L),
      ("b.org", "s1", 5L)
    ).toDF("host", "source", "n_chars")
    val out = CorpusStats.hostProfile(df).orderBy("host").collect()
    assert(out.length === 2)
    val a = out(0)
    assert(a.getString(0) === "a.com")
    assert(a.getLong(1) === 3L)  // n_docs
    assert(a.getLong(2) === 2L)  // n_sources
    assert(a.getLong(3) === 60L) // sum_chars
    val b = out(1)
    assert(b.getLong(1) === 1L && b.getLong(2) === 1L && b.getLong(3) === 5L)
  }

  test("hostProfile: NULL sources count docs/chars but are not a distinct source") {
    // count(DISTINCT source) semantics: the null-source rows contribute to
    // n_docs and sum_chars yet never inflate n_sources
    val df = Seq(
      ("a.com", Some("s1"), 10L), ("a.com", None, 20L), ("a.com", None, 30L),
      ("b.org", None, 5L)
    ).toDF("host", "source", "n_chars")
    val out = CorpusStats.hostProfile(df).orderBy("host").collect()
    val a = out(0)
    assert(a.getLong(1) === 3L && a.getLong(2) === 1L && a.getLong(3) === 60L)
    val b = out(1)
    assert(b.getLong(1) === 1L && b.getLong(2) === 0L && b.getLong(3) === 5L)
  }

  test("hostProfile: hot-host skew pre-shards across (host, source) groups") {
    // one host carrying 90% of rows across many sources must still come
    // out as one combined row with an exact distinct-source count
    val rows = (0 until 900).map(i => ("hot.com", s"s${i % 37}", 1L)) ++
      (0 until 100).map(i => (s"cold$i.com", "s0", 1L))
    val out = CorpusStats.hostProfile(rows.toDF("host", "source", "n_chars"))
    val hot = out.filter(col("host") === "hot.com").collect()(0)
    assert(hot.getLong(1) === 900L && hot.getLong(2) === 37L)
    assert(out.count() === 101L)
  }

  // ----------------------------------------------------------- blockFlags
  test("hostSuffixes: dot-boundary suffixes, longest first") {
    val out = spark.range(1).select(
      CorpusStats.hostSuffixes(lit("a.b.example.com")).as("s"))
      .collect()(0).getSeq[String](0)
    assert(out === Seq("a.b.example.com", "b.example.com", "example.com", "com"))
  }

  test("blockFlags: suffix entry blocks every subdomain, exact entry only itself") {
    val docs = Seq(
      (1L, "www.bad.com"), (2L, "cdn.bad.com"), (3L, "bad.com"),
      (4L, "notbad.com"), (5L, "exact.host.net"), (6L, "sub.exact.host.net"),
      (7L, "good.org")
    ).toDF("doc_id", "host")
    val out = CorpusStats.blockFlags(docs,
        blocked = Seq("bad.com", "sub.exact.host.net"))
      .orderBy("doc_id").collect()
    val flags = out.map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(flags === Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 0, 5L -> 0,
      6L -> 1, 7L -> 0))
  }

  test("blockFlags: blocklist side of the join is broadcast") {
    val docs = Seq((1L, "x.com")).toDF("doc_id", "host")
    val plan = CorpusStats.blockFlags(docs, blocked = Seq("x.com"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  // ------------------------------------------------------- rareTokenStats
  test("rareTokenStats: corpus-wide counts decide rarity; zero-token docs survive") {
    val docs = Seq(
      (1L, "common common common rare1"),
      (2L, "common common rare2 rare3"),
      (3L, ""),
      (4L, "common")
    ).toDF("doc_id", "text")
    // corpus counts: common=6, rare1=1, rare2=1, rare3=1 (rareMax=2)
    val out = CorpusStats.rareTokenStats(docs).orderBy("doc_id").collect()
    val byId = out.map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(byId(1L) === ((4L, 1L, 0)))   // 1/4 rare > 20% -> reject
    assert(byId(2L) === ((4L, 2L, 0)))   // 2/4 rare -> reject
    assert(byId(3L) === ((0L, 0L, 1)))   // empty doc: 0 tokens, keep
    assert(byId(4L) === ((1L, 0L, 1)))   // all common -> keep
  }

  test("rareTokenStats: tokens are lowercased before counting") {
    val docs = Seq((1L, "Word word WORD"), (2L, "word")).toDF("doc_id", "text")
    // all four occurrences collapse to "word" (count 4 > rareMax)
    val out = CorpusStats.rareTokenStats(docs).orderBy("doc_id").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(0L, 0L))
    assert(out.map(_.getInt(3)).toSeq === Seq(1, 1))
  }

  // -------------------------------------------------------- hostCapStats
  test("hostCapStats: salted two-stage top-K equals the single-window spec") {
    // skewed corpus: one hot host with 500 docs, 20 cold hosts with 1-7
    val rows = (0L until 500L).map(i => (i, "hot.example.com")) ++
      (0 until 20).flatMap(h => (0 to h % 7).map(j => (1000L + h * 10 + j, s"cold$h.example.org")))
    val df = rows.toDF("doc_id", "host")
    val out = CorpusStats.hostCapStats(df, cap = 5, salts = 8)
      .orderBy("doc_id").collect()
    // reference verdict: keep the 5 lowest doc_ids per host
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val ref = df.withColumn("rn",
        row_number().over(Window.partitionBy("host").orderBy("doc_id")))
      .withColumn("kept", (col("rn") <= 5).cast("int"))
      .orderBy("doc_id").select("doc_id", "host", "kept").collect()
    assert(out.length === ref.length)
    out.zip(ref).foreach { case (a, b) =>
      assert(a.getLong(0) === b.getLong(0))
      assert(a.getInt(3) === b.getInt(2), s"doc ${a.getLong(0)}")
    }
    // hot host keeps exactly cap; a fully-under-cap host keeps everything
    val hot = out.filter(_.getString(1) == "hot.example.com")
    assert(hot.count(_.getInt(3) == 1) === 5)
    assert(hot.filter(_.getInt(3) == 1).map(_.getLong(0)).toSeq === (0L to 4L))
    val cold0 = out.filter(_.getString(1) == "cold0.example.org")
    assert(cold0.forall(_.getInt(3) == 1))
    // n_host_docs reported per row
    assert(hot.head.getLong(2) === 500L)
  }

  test("hostCapStats: over-cap hosts rank inside (host, salt) first") {
    val df = (0L until 100L).map(i => (i, "hot.example.com")).toDF("doc_id", "host")
    val plan = CorpusStats.hostCapStats(df, cap = 3, salts = 8)
      .queryExecution.optimizedPlan.toString
    // two windows: the salted candidate stage and the final per-host rank
    assert(plan.sliding("Window".length).count(_ == "Window") >= 2, plan)
    assert(plan.contains("pmod") || plan.contains("xxhash64"), plan)
  }

  // -------------------------------------------------------- splitAssign
  test("splitAssign: deterministic, stable under growth, sane proportions") {
    val a = (0L until 2000L).map(Tuple1(_)).toDF("doc_id")
    val out = CorpusStats.splitAssign(a).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    // rerun identical (no rand() anywhere)
    val again = CorpusStats.splitAssign(a).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    assert(out === again)
    // growth stability: the first 500 ids keep their verdicts inside a
    // larger corpus (pure per-row function of id)
    val small = CorpusStats.splitAssign((0L until 500L).map(Tuple1(_)).toDF("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    small.foreach { case (id, s) => assert(out(id) === s) }
    // proportions near 230/13/13 out of 256
    val n = out.size.toDouble
    val train = out.values.count(_ == "train") / n
    val valf = out.values.count(_ == "val") / n
    assert(train > 0.85 && train < 0.93, s"train=$train")
    assert(valf > 0.02 && valf < 0.09, s"val=$valf")
    assert(out.values.toSet === Set("train", "val", "test"))
  }

  // -------------------------------------------------------- lengthQuantiles
  test("lengthQuantiles: exact percentile_disc on ties, singletons, uniform groups") {
    val rng = new scala.util.Random(42)
    val rows = (0 until 500).map(i => ("s" + i % 3, (rng.nextInt(40) + 1).toLong)) ++
      Seq(("lonely", 7L)) ++ (0 until 20).map(_ => ("flat", 13L))
    val out = CorpusStats.lengthQuantiles(rows.toDF("source", "n_chars"))
      .orderBy("source").collect()
    def disc(vs: Seq[Long], pct: Int): Long = {
      val sorted = vs.sorted
      sorted(((vs.size.toLong * pct + 99) / 100).toInt - 1)
    }
    val byGroup = rows.groupBy(_._1)
    out.foreach { r =>
      val vs = byGroup(r.getString(0)).map(_._2)
      assert(r.getLong(1) === vs.size.toLong, r.getString(0))
      assert(r.getLong(2) === disc(vs, 50), s"${r.getString(0)} p50")
      assert(r.getLong(3) === disc(vs, 90), s"${r.getString(0)} p90")
      assert(r.getLong(4) === disc(vs, 99), s"${r.getString(0)} p99")
    }
    val flat = out.find(_.getString(0) == "flat").get
    assert((2 to 4).forall(flat.getLong(_) == 13L))
    val lonely = out.find(_.getString(0) == "lonely").get
    assert((2 to 4).forall(lonely.getLong(_) == 7L))
  }

  test("lengthQuantiles: the window runs over the histogram, not raw rows") {
    val df = (0 until 100).map(i => ("s", (i % 5).toLong)).toDF("source", "n_chars")
    val plan = CorpusStats.lengthQuantiles(df)
      .queryExecution.optimizedPlan.toString
    // histogram aggregate BELOW the window + the final quantile aggregate
    assert(plan.sliding("Aggregate".length).count(_ == "Aggregate") >= 2, plan)
    assert(plan.contains("windowspecdefinition(source"), plan)
  }

  // -------------------------------------------------------- mixSample
  test("mixSample: verdicts match an independent md5 reference") {
    val rates = Map("a" -> 1.0, "b" -> 0.5, "c" -> 0.0)
    val rows = (0L until 400L).map(i =>
      (i, Seq("a", "b", "c", "unlisted")(i.toInt % 4)))
    val out = CorpusStats.mixSample(rows.toDF("doc_id", "source"), rates)
      .orderBy("doc_id").collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.zip(out).foreach { case ((id, src), r) =>
      val hex = md.digest(s"mix:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      assert(r.getString(2) === hex, s"doc $id")
      val expected = rates.get(src) match {
        case Some(rate) if hex < CorpusStats.rateToHexThreshold(rate) => 1
        case _ => 0
      }
      assert(r.getInt(3) === expected, s"doc $id src $src")
    }
    // rate 1.0 keeps every doc; rate 0.0 and unlisted keep none
    val bySrc = out.groupBy(_.getString(1))
    assert(bySrc("a").forall(_.getInt(3) == 1))
    assert(bySrc("c").forall(_.getInt(3) == 0))
    assert(bySrc("unlisted").forall(_.getInt(3) == 0))
    // rate 0.5 keeps roughly half (md5 is uniform)
    val bFrac = bySrc("b").count(_.getInt(3) == 1).toDouble / bySrc("b").length
    assert(bFrac > 0.3 && bFrac < 0.7, s"bFrac=$bFrac")
  }

  test("mixSample: the rates join broadcasts") {
    val df = (0L until 50L).map(i => (i, "a")).toDF("doc_id", "source")
    val plan = CorpusStats.mixSample(df, Map("a" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"), plan)
  }

  test("rateToHexThreshold: keep-all sorts above every hex string, fractions are exact") {
    assert(CorpusStats.rateToHexThreshold(1.0) === "g")
    assert(CorpusStats.rateToHexThreshold(0.5) === "80000000")
    assert(CorpusStats.rateToHexThreshold(0.25) === "40000000")
    assert(CorpusStats.rateToHexThreshold(0.0) === "00000000")
    assert("ffffffff" < "g")
  }

  // -------------------------------------------------------- budgetSample
  test("budgetSample: derived keep fraction lands the kept cost near the budget") {
    // source "a": 1000 docs x 100 chars = 100k total, budget 25k -> rate 1/4
    // source "b": 200 docs, budget exceeds total -> keep all
    // source "c": no budget -> drop all
    val rows = (0L until 1000L).map(i => (i, "a", 100L)) ++
      (1000L until 1200L).map(i => (i, "b", 50L)) ++
      (1200L until 1300L).map(i => (i, "c", 10L))
    val out = CorpusStats.budgetSample(rows.toDF("doc_id", "source", "n_chars"),
        Map("a" -> 25000L, "b" -> 999999L))
      .orderBy("doc_id").collect()
    val bySrc = out.groupBy(_.getString(1))
    assert(bySrc("b").forall(_.getInt(3) == 1))
    assert(bySrc("c").forall(_.getInt(3) == 0))
    val keptCostA = bySrc("a").count(_.getInt(3) == 1) * 100L
    assert(keptCostA > 15000L && keptCostA < 35000L, s"keptCostA=$keptCostA")
    // verdicts reproduce the exact threshold spec
    val th = CorpusStats.budgetToHexThreshold(25000L, 100000L)
    bySrc("a").foreach { r =>
      assert(r.getInt(3) === (if (r.getString(2) < th) 1 else 0))
    }
  }

  test("budgetToHexThreshold: exact integer spec, overflow-safe") {
    assert(CorpusStats.budgetToHexThreshold(1L, 1L) === "g")
    assert(CorpusStats.budgetToHexThreshold(2L, 1L) === "g")
    assert(CorpusStats.budgetToHexThreshold(0L, 7L) === "00000000")
    assert(CorpusStats.budgetToHexThreshold(500L, 1500L) === "55555555")
    assert(CorpusStats.budgetToHexThreshold(1L, 2L) === "80000000")
    // petabyte-scale totals: (target << 32) would overflow a Long
    assert(CorpusStats.budgetToHexThreshold(5000000000000L, 10000000000000L)
      === "80000000")
  }

  // -------------------------------------------------------- decontamStats
  test("decontamStats: shared n-grams with the benchmark flag a doc; counts exact") {
    val benchText = (1 to 6).map(i => s"b$i").mkString(" ") // 6 words
    val bench = Seq(Tuple1(benchText)).toDF("text")
    val corpus = Seq(
      // embeds the full benchmark text mid-document: 4-gram windows over
      // 10 words = 7 grams, of which positions 3..5 lie inside the
      // benchmark span (b1..b6 has 3 of its own 4-grams)
      (1L, "a1 a2 " + benchText + " a3 a4"),
      (2L, "c1 c2 c3 c4 c5 c6"), // disjoint vocab: 3 grams, 0 hits
      (3L, "c1 c2 c3"),          // shorter than n: no grams, clean
      (4L, benchText)            // the benchmark doc itself in-corpus
    ).toDF("doc_id", "text")
    val out = CorpusStats.decontamStats(corpus, bench, n = 4)
      .orderBy("doc_id").collect()
    val byId = out.map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(byId(1L) === ((7L, 3L, 1)))
    assert(byId(2L) === ((3L, 0L, 0)))
    assert(byId(3L) === ((0L, 0L, 0)))
    assert(byId(4L) === ((3L, 3L, 1)))
  }

  test("decontamStats: benchmark membership probe is a broadcast join") {
    val bench = Seq(Tuple1("b1 b2 b3 b4")).toDF("text")
    val corpus = Seq((1L, "b1 b2 b3 b4 x")).toDF("doc_id", "text")
    val plan = CorpusStats.decontamStats(corpus, bench, n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan)
  }
}
