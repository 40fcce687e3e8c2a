package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Physical-plan assertions: the plans we ship are the plans we designed
  * (column pruning to (url, html), filter pushdown to parquet, broadcast
  * only where intended, whole-stage codegen on the SQL surface, exactly
  * one exchange in the flagship pipeline). */
class PlanShapeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("plan-shape")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("extraction scan prunes to (url, html) — the fat column plus key only") {
    import spark.implicits._
    val dir = Files.createTempDirectory("plan-pages").toString
    spark.range(100).mapPartitions(_.map(i => graft.fixtures.PageGen.page(i, 42L)))
      .write.mode("overwrite").parquet(dir)
    val pipeline = spark.read.parquet(dir)
      .select(col("url"), col("html"))
      .withColumn("salt", pmod(xxhash64(col("url")), lit(16)).cast("int"))
      .repartition(4, col("salt"))
      .select(col("url"), col("html"))
    val plan = planOf(pipeline)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("url") && readSchema.contains("html"))
    assert(!readSchema.contains("warc_ts") && !readSchema.contains("lang"),
      s"unpruned columns leak into the scan: $readSchema")
  }

  test("flagship pipeline has exactly one exchange (the salted repartition)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("plan-pages2").toString
    spark.range(100).mapPartitions(_.map(i => graft.fixtures.PageGen.page(i, 42L)))
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(col("url"), col("html"))
      .withColumn("salt", pmod(xxhash64(col("url")), lit(16)).cast("int"))
      .repartition(4, col("salt"))
      .select(col("url"), col("html"))
      .as[graft.pipeline.Extract.PageSlim]
      .mapPartitions(_.map(p => graft.kernel.ExtractKernel.extractOne(p.url, p.html, 0, 0)))
      .toDF()
    val exchanges = planOf(df).linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, s"expected exactly 1 exchange, plan:\n${planOf(df)}")
  }

  test("filter pushdown reaches the parquet scan (PushedFilters)") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(l_quantity"),
      s"filter not pushed:\n$plan")
  }

  test("q_top_customers broadcasts the dimension side") {
    val plan = planOf(SparkEntry.queries("q_top_customers")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("resume anti-join on unbounded done-set does NOT force broadcast in the pipeline") {
    // Extract.run leaves strategy choice to Catalyst/AQE; assert the plan is
    // an anti join of either flavor and the query compiles + runs
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val done = docs.filter(col("doc_id") % 2 === 0).select("doc_id")
    val anti = docs.join(done, Seq("doc_id"), "left_anti")
    val plan = planOf(anti)
    assert(plan.contains("LeftAnti"), plan)
  }

  test("corpus-build chain: the gate + scrub stages add NO exchange beyond " +
       "the dedup's own (they fuse into the kernel output stage)") {
    import spark.implicits._
    implicit val sp: SparkSession = spark
    // the q_corpus_build composition, with the quality gate + PII scrub
    // switchable: both variants must shuffle exactly the same number of
    // times — the gate is a WHERE and the scrub a projection, both in the
    // kernel's stage
    def chain(gateAndScrub: Boolean): org.apache.spark.sql.DataFrame = {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("text"))
      val pages = docs.select(
          concat(lit("doc://"), col("doc_id")).as("url"),
          encode(col("text"), "UTF-8").as("html"))
        .as[graft.pipeline.Extract.PageSlim]
      val extracted = pages.mapPartitions { it =>
        it.map(p => graft.kernel.ExtractKernel.extractOne(p.url, p.html, 0, 0))
      }.toDF()
        .select(substring(col("url"), 7, 32).cast("long").as("doc_id"),
          col("extracted_text"))
      val gated =
        if (gateAndScrub)
          extracted
            .filter(graft.operators.QualityFilters.gopherKeep(col("extracted_text")))
            .select(col("doc_id"),
              graft.operators.PiiScrub.redact(col("extracted_text")).as("clean_text"))
        else extracted.select(col("doc_id"), col("extracted_text").as("clean_text"))
      graft.operators.Dedup
        .nearDupPairs(gated, "doc_id", "clean_text", threshold = 0.6).toDF()
    }
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      planOf(df).linesIterator.count(_.contains("Exchange"))
    // (a) pair generation — the dedup's only shuffling stage before the
    // rollup — shuffles exactly as often with the stages as without
    val withStages = chain(gateAndScrub = true)
    val without = chain(gateAndScrub = false)
    assert(exchanges(withStages) === exchanges(without),
      s"gate/scrub added exchanges: ${planOf(withStages)}")
    // (b) the scrub's regex replacements evaluate BELOW the first exchange
    // (in the kernel-output stage), not in a post-shuffle stage of their own
    val lines = planOf(withStages).linesIterator.toSeq
    val firstExchange = lines.indexWhere(_.contains("Exchange"))
    val scrubLine = lines.lastIndexWhere(_.contains("<EMAIL>"))
    assert(firstExchange >= 0 && scrubLine > firstExchange,
      "scrub projection not below the dedup exchange:\n" + lines.mkString("\n"))
  }

  test("native text expressions stay inside whole-stage codegen") {
    import graft.functions.TextFunctions
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(TextFunctions.sanitize_text(col("text")).as("t"),
        TextFunctions.printable_ratio(col("text")).as("r"))
    val plan = planOf(df)
    // "*(n)" prefixes mark whole-stage-codegen subtrees in executedPlan
    val projectLine = plan.linesIterator.find(_.contains("sanitize_text")).getOrElse("")
    assert(projectLine.trim.startsWith("*("),
      s"text expressions outside codegen:\n$plan")
    assert(df.count() > 0)
  }

  test("embedding near-dup LSH plan joins on bucket — no cartesian product") {
    val plan = planOf(SparkEntry.queries("q_embed_neardup_lsh")(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      s"LSH variant degenerated to all-pairs:\n$plan")
    assert(plan.contains("bucket"), s"bucket join key missing:\n$plan")
  }

  test("kernel-over-testdata query prunes the documents scan to (doc_id, text)") {
    val plan = planOf(SparkEntry.queries("q_extract_text")(spark, sf))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang") && !readSchema.contains("n_chars"),
      s"unpruned columns leak into the scan: $readSchema")
  }

  test("resume with failures aggregates only the failed subset (error filter pushed to scan)") {
    import spark.implicits._
    import graft.kernel.ExtractKernel.{ExtractedDoc, Lineage}
    val tableDir = Files.createTempDirectory("plan-table").toString
    val table = new graft.tables.SnapshotTable(tableDir)
    val rows = Seq(
      ExtractedDoc("u1", "html", "ok text", null, null, Array.empty, 0.5, 7L, null, Lineage(0, 0, "t")),
      ExtractedDoc("u2", "html", null, null, null, Array.empty, 0.5, 0L, "boom", Lineage(0, 0, "error")))
    table.commit(rows.toDS().toDF(), Map("input" -> 2L, "extracted" -> 1L, "failed" -> 1L))
    val done = table.doneUrls(spark).get
    val plan = planOf(done)
    assert(plan.toLowerCase.contains("isnotnull(error") ,
      s"terminal-failure aggregate not failure-filtered:\n$plan")
    // only url+error are read — no text columns in the resume scan
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!readSchemas.contains("extracted_text"),
      s"resume scan reads text columns:\n$readSchemas")
  }

  test("q_ann_ivf plan has no ScalaUDF node (assignment is typed mapPartitions)") {
    val plan = planOf(SparkEntry.queries("q_ann_ivf")(spark, sf))
    assert(!plan.contains("ScalaUDF") && !plan.toLowerCase.contains("batchevalpython"),
      s"IVF assignment fell back to a UDF:\n$plan")
  }

  test("minhash LSH bucket grouping is a DataFrame aggregate (no typed groupByKey exchange)") {
    implicit val sp: SparkSession = spark
    val docs = spark.read.parquet(s"$sf/documents.parquet").select(col("doc_id"), col("text"))
    val plan = planOf(
      graft.operators.Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.6).toDF())
    // typed groupByKey materializes an AppendColumns + keys-prefixed exchange;
    // the DataFrame groupBy(band,bucket) path must show an ObjectHashAggregate
    // (collect_list) and no AppendColumns node
    assert(!plan.contains("AppendColumns"), s"typed groupByKey leaked back in:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"bucket aggregation missing:\n$plan")
  }

  test("line-dedup exchanges are keyed on the 8-byte line hash, never the line text") {
    val df = graft.operators.QualityFilters.lineDedupStats(
      spark.read.parquet(s"$sf/documents.parquet"))
    val plan = planOf(df)
    val exchanges = plan.linesIterator.filter(_.contains("hashpartitioning")).toList
    assert(exchanges.nonEmpty, s"no keyed exchange found:\n$plan")
    // the count/join exchanges must partition on line_h (a BIGINT), not the
    // raw line string — at corpus scale the difference is shuffling 8 bytes
    // per line vs the full text twice
    assert(exchanges.exists(_.contains("line_h")),
      s"line_h is not an exchange key:\n$plan")
    assert(!exchanges.exists(e => e.contains("line#") || e.contains("line,")),
      s"an exchange still keys on the raw line text:\n$plan")
  }

  test("bloom resume plan: codegen might_contain probe + key-only scan branch") {
    val plan = planOf(SparkEntry.queries("q_resume_bloom")(spark, sf))
    assert(plan.contains("might_contain"), s"bloom probe missing:\n$plan")
    // the candidate branch must scan ONLY the key column — the fat text
    // columns are read once, on the final anti-join branch
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).toList
    assert(readSchemas.exists(rs => rs.contains("doc_id") && !rs.contains("text")),
      s"no key-only scan branch:\n${readSchemas.mkString("\n")}")
  }

  test("pipeline bloom resume: might_contain probe, fat column never crosses a shuffle") {
    import spark.implicits._
    val dir = Files.createTempDirectory("plan-pages3").toString
    spark.range(200).mapPartitions(_.map(i => graft.fixtures.PageGen.page(i, 42L)))
      .write.mode("overwrite").parquet(dir)
    val tableDir = Files.createTempDirectory("plan-table").toString
    val table = new graft.tables.SnapshotTable(tableDir)
    graft.pipeline.Extract.run(spark, spark.read.parquet(dir), table,
      numSalts = 4, numPartitions = 2)
    // the exact resume dataflow Extract.run builds above the bloom threshold
    val pages = spark.read.parquet(dir).select(col("url"), col("html"))
    val resumed = graft.operators.BloomResume.bloomAntiJoin(
      pages, table.doneUrls(spark).get, "url", table.chainRowTotal.get)
    // pin the static plan (AQE off) so join strategies are decided here
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = resumed.queryExecution.executedPlan
      val s = plan.toString
      assert(s.contains("might_contain"), s"bloom probe missing:\n$s")
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.forall(e => !e.output.exists(_.name == "html")),
        s"fat column crosses an exchange:\n$s")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("aggregates use partial (map-side) aggregation") {
    val plan = planOf(SparkEntry.queries("q_lang_stats")(spark, sf))
    // two HashAggregate nodes: partial + final
    val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"no partial aggregation:\n$plan")
  }

  test("inverted index: token-keyed stages reuse one partitioning (3 exchanges total)") {
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.operators.TextIndex.invertedIndex(
        spark.read.parquet(s"$sf/documents.parquet"))
      val plan = df.queryExecution.executedPlan
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // (tok, salt) window + tok window (reused by the postings aggregate
      // AND the join) + the df-count aggregate branch — nothing else
      assert(shuffles.length === 3,
        s"expected 3 exchanges, got ${shuffles.length}:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("line rebuild: dedup exchanges key on the 8-byte line hash") {
    val df = graft.operators.QualityFilters.dedupLinesRebuild(
      spark.read.parquet(s"$sf/documents.parquet"))
    val plan = planOf(df)
    val exchanges = plan.linesIterator.filter(_.contains("hashpartitioning")).toList
    assert(exchanges.exists(_.contains("line_h")),
      s"line_h is not an exchange key:\n$plan")
    // the verdict stage never partitions on the raw line string; the text
    // only moves in the doc-keyed rebuild group (inherent to a rewrite)
    assert(!exchanges.exists(e => e.contains("line#") || e.contains("line,")),
      s"an exchange keys on the raw line text:\n$plan")
  }

  test("pagerank: every iteration joins hash-keyed — no cartesian/nested-loop") {
    import spark.implicits._
    val edges = Seq.tabulate(64)(i => (s"h${i % 8}", s"h${(i * 3 + 1) % 8}"))
      .toDF("src", "dst")
    val plan = planOf(graft.operators.LinkGraph.pageRank(edges, iters = 3))
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in plan:\n$plan")
  }
}
