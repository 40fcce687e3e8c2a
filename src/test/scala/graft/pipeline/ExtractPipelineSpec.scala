package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import java.nio.file.Files

import graft.fixtures.PageGen
import graft.tables.SnapshotTable

/** End-to-end: synthesize pages -> Extract.run -> snapshot commit ->
  * resume is a no-op -> incremental append processes only new urls. */
class ExtractPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("extract-e2e")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // Both resume strategies must be row-identical end-to-end: plain left_anti
  // (bloomMin = MaxValue can never trigger) and the Bloom-pruned exact
  // anti-join (bloomMin = 0 forces it whenever a chain exists).
  for ((label, bloomMin) <- Seq("plain-anti" -> Long.MaxValue, "forced-bloom" -> 0L))
  test(s"extract 500 pages, commit, resume no-op, incremental append [$label]") {
    import spark.implicits._
    val pagesDir = tmp("pages")
    val tableDir = tmp("table")

    spark.range(500).mapPartitions(_.map(i => PageGen.page(i, 42L)))
      .write.mode("overwrite").parquet(pagesDir)

    val table = new SnapshotTable(tableDir)
    val pages = spark.read.parquet(pagesDir)

    // pass 1: everything pending
    val m1 = Extract.run(spark, pages, table, numSalts = 16, numPartitions = 4,
      bloomResumeMinRows = bloomMin)
    assert(m1.version === 0)
    assert(m1.input === 500)
    assert(m1.failed === 0, s"unexpected quarantine rows: ${m1.failed}")
    assert(table.read(spark).count() === 500)

    // pass 2 on same input: resume anti-join -> nothing to do
    val m2 = Extract.run(spark, pages, table, numSalts = 16, numPartitions = 4,
      bloomResumeMinRows = bloomMin)
    assert(m2.input === 0, "resume must be a no-op on unchanged input")
    assert(table.read(spark).count() === 500)

    // pass 3: 100 new pages appended -> only those processed
    spark.range(500, 600).mapPartitions(_.map(i => PageGen.page(i, 42L)))
      .write.mode("append").parquet(pagesDir)
    val m3 = Extract.run(spark, spark.read.parquet(pagesDir), table,
      numSalts = 16, numPartitions = 4, bloomResumeMinRows = bloomMin)
    assert(m3.input === 100, s"expected 100 incremental, got ${m3.input}")
    val all = table.read(spark)
    assert(all.count() === 600)
    assert(all.select("url").distinct().count() === 600, "exactly-once per url")

    // status rollup behaves like the reference's queue stats
    val statuses = Extract.statusCounts(spark, table).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statuses.getOrElse("done", 0L) > 400)
    assert(!statuses.contains("error"))

    // manifest metrics persisted
    val mf = table.manifest(0).get
    assert(mf.metrics("input") === 500)
    assert(mf.metrics("bytes_in") > 0)
  }

  for ((label, bloomMin) <- Seq("plain-anti" -> Long.MaxValue, "forced-bloom" -> 0L))
  test(s"failed rows re-driven with incremented attempt, terminal at maxRetries [$label]") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.kernel.ExtractKernel.{ExtractedDoc, Lineage}
    val tableDir = tmp("table3")
    val table = new SnapshotTable(tableDir)
    val pages = spark.range(20).mapPartitions(_.map(i => PageGen.page(i, 11L))).toDF()
    val urls = pages.select("url").as[String].collect().sorted
    val (retryUrl, deadUrl) = (urls(3), urls(5))

    // seed a snapshot holding only failures: retryUrl failed once (attempt 0),
    // deadUrl exhausted all 3 attempts (reference MAX_RETRIES)
    def failedRow(u: String, att: Int) = ExtractedDoc(u, "html", null, null, null,
      Array.empty, 0.5, 0L, "transient: simulated", Lineage(0, att, "error"))
    val seeded = Seq(failedRow(retryUrl, 0),
      failedRow(deadUrl, 0), failedRow(deadUrl, 1), failedRow(deadUrl, 2)).toDS().toDF()
    table.commit(seeded, Map("input" -> 4L, "extracted" -> 0L, "failed" -> 4L))

    // before the re-drive: one pending_retry, one terminal error
    val pre = Extract.statusCounts(spark, table).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pre.getOrElse("pending_retry", 0L) === 1)
    assert(pre.getOrElse("error", 0L) === 1)

    // run: all 20 minus deadUrl (terminal) are pending; retryUrl re-driven
    val m1 = Extract.run(spark, pages, table, numSalts = 4, numPartitions = 2,
      bloomResumeMinRows = bloomMin)
    assert(m1.input === 19, s"expected 19 pending (terminal url excluded), got ${m1.input}")
    val out = table.read(spark)
    val retryRows = out.filter(col("url") === retryUrl && col("error").isNull)
    assert(retryRows.count() === 1, "re-driven url must now have a success row")
    assert(retryRows.select("lineage.attempt").as[Int].head() === 1,
      "re-drive must carry attempt = prior failure count")
    assert(out.filter(col("url") === deadUrl && col("error").isNull).count() === 0,
      "terminal url must not be re-attempted")

    // resume is again a no-op (successes + terminal failures both done)
    val m2 = Extract.run(spark, pages, table, numSalts = 4, numPartitions = 2,
      bloomResumeMinRows = bloomMin)
    assert(m2.input === 0, "nothing pending after re-drive")

    val post = Extract.statusCounts(spark, table).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(post.getOrElse("pending_retry", 0L) === 0)
    assert(post.getOrElse("error", 0L) === 1)
    assert(post.getOrElse("done", 0L) + post.getOrElse("done_empty", 0L) === 19)
  }

  test("canonical url keys: case/port/fragment/param-order variants collapse to one extraction") {
    import spark.implicits._
    val tableDir = tmp("table4")
    val table = new SnapshotTable(tableDir)
    def page(u: String) =
      (u, s"<html><body><p>${"page body words " * 10}</p></body></html>"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val variants = Seq(
      "https://Example.COM:443/a?x=1&y=2#frag",
      "https://example.com/a?y=2&x=1",
      "https://example.com:443/a?x=1&y=2")
    val others = (1 to 5).map(i => s"https://host$i.org/p$i")
    val pages = (variants ++ others).map(page).toDF("url", "html")

    val m1 = Extract.run(spark, pages, table, numSalts = 4, numPartitions = 2)
    assert(m1.input === 6, s"3 variants must collapse to 1: ${m1.input}")
    val urls = table.read(spark).select("url").as[String].collect().toSet
    assert(urls.count(_.toLowerCase.contains("example.com")) === 1, s"$urls")
    // deterministic representative: lexicographically smallest spelling
    assert(urls.contains(variants.sorted.head), s"$urls")
    assert(table.manifest(0).get.metrics("deduped") === 2)

    // resume: yet another spelling of the same page is already done
    val respelled = Seq(page("https://EXAMPLE.com/a?y=2&x=1#other")).toDF("url", "html")
    val m2 = Extract.run(spark, respelled, table, numSalts = 4, numPartitions = 2)
    assert(m2.input === 0, "respelled url must resume as done")
  }

  test("incremental maintenance: crawlDelta-driven re-extract equals a full re-extract") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // crawl 1: 150 pages, extracted to the base table
    val crawl1 = spark.range(150).mapPartitions(_.map(i => PageGen.page(i, 42L)))
      .toDF().select("url", "html").cache()
    val base = new SnapshotTable(tmp("tbl-base"))
    Extract.run(spark, crawl1, base, numSalts = 4, numPartitions = 2)

    // crawl 2: %7 pages vanish, %5 pages get brand-new html (url-keyed
    // content so both paths extract identical bytes), 30 new pages appear
    val i = regexp_extract(col("url"), "/doc/42/(\\d+)$", 1).cast("long")
    val survivors = crawl1.filter(i % 7 =!= 0)
    val crawl2 = survivors
      .withColumn("html", when(i % 5 === 0,
        encode(concat(lit("<html><body><p>updated v2 content for "),
          col("url"), lit(" with enough words to extract</p></body></html>")),
          "UTF-8")).otherwise(col("html")))
      .unionByName(spark.range(1000, 1030)
        .mapPartitions(_.map(j => PageGen.page(j, 42L))).toDF()
        .select("url", "html"))
      .cache()

    // the delta classifies by content hash on the raw payload
    val delta = graft.operators.CorpusStats.crawlDelta(
      crawl1, crawl2, textCol = "html", idCol = "url").cache()
    val byStatus = delta.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus("removed") === 22)   // 0,7,...,147
    assert(byStatus("added") === 30)
    assert(byStatus("changed") === 25)   // 30 %5-multiples minus 5 %35-overlaps
    assert(byStatus("unchanged") === 103)

    // incremental path: re-extract ONLY added+changed into a staging
    // table, then assemble v2 = unchanged rows from base + staging
    val toProcess = crawl2.join(
      delta.filter(col("status").isin("added", "changed")).select("url"), "url")
    val staging = new SnapshotTable(tmp("tbl-staging"))
    val mInc = Extract.run(spark, toProcess, staging, numSalts = 4, numPartitions = 2)
    assert(mInc.input === 55, s"incremental must process 55, got ${mInc.input}")

    val keep = Seq("url", "doc_type", "extracted_text", "n_chars")
    val incremental = base.read(spark)
      .join(delta.filter(col("status") === "unchanged").select("url"), "url")
      .select(keep.head, keep.tail: _*)
      .unionByName(staging.read(spark).select(keep.head, keep.tail: _*))

    // full path: extract crawl 2 from scratch
    val full = new SnapshotTable(tmp("tbl-full"))
    Extract.run(spark, crawl2, full, numSalts = 4, numPartitions = 2)
    val fullOut = full.read(spark).select(keep.head, keep.tail: _*)

    def key(df: org.apache.spark.sql.DataFrame) = df.select(col("url"),
      col("doc_type"), md5(encode(coalesce(col("extracted_text"), lit("")),
        "UTF-8")).as("fp"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    val (inc, ful) = (key(incremental), key(fullOut))
    assert(inc === ful,
      s"incremental != full; only-inc=${(inc -- ful).take(3)} only-full=${(ful -- inc).take(3)}")
    crawl1.unpersist(); crawl2.unpersist(); delta.unpersist()
  }

  test("interrupted commit leaves previous snapshot intact (crash safety)") {
    import spark.implicits._
    val tableDir = tmp("table2")
    val table = new SnapshotTable(tableDir)
    val pages1 = spark.range(50).mapPartitions(_.map(i => PageGen.page(i, 7L))).toDF()
    Extract.run(spark, pages1, table, numSalts = 4, numPartitions = 2)
    assert(table.currentVersion === Some(0))

    // simulate a crash between writeData and commitManifest: data written,
    // pointer never flipped
    val pages2 = spark.range(50, 80).mapPartitions(_.map(i => PageGen.page(i, 7L))).toDF()
    import org.apache.spark.sql.functions._
    val (v, dir) = table.writeData(pages2.select(col("url")))
    assert(v === 1)
    // reader still sees snapshot 0 only
    assert(table.currentVersion === Some(0))
    assert(table.read(spark).count() === 50)
  }
}
