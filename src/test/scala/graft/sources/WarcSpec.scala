package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.warc.WarcFixtures

class WarcSpec extends AnyFunSuite {

  private implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("warc-source")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("warc-spec").toFile
    d.deleteOnExit()
    d
  }

  private def readWarc(path: String) =
    spark.read.format("graft.sources.warc.WarcDataSource").load(path)

  test("roundtrip: records written by the fixture writer parse back exactly") {
    val dir = tmpDir()
    val recs1 = Seq(
      ("http://a.example/1", "2026-01-01T00:00:01Z", "hello warc".getBytes("UTF-8")),
      ("http://a.example/2", "2026-01-01T00:00:02Z", Array.tabulate(1000)(_.toByte)))
    val recs2 = Seq(
      ("http://b.example/3", "2026-01-01T00:00:03Z", "".getBytes("UTF-8")))
    WarcFixtures.writeWarc(new java.io.File(dir, "a.warc"), recs1)
    WarcFixtures.writeWarc(new java.io.File(dir, "b.warc"), recs2)
    val got = readWarc(dir.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getAs[Array[Byte]](2)).map(_.toSeq).orNull)).sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq("http://a.example/1", "http://a.example/2", "http://b.example/3"))
    assert(got(0)._3 === "hello warc".getBytes("UTF-8").toSeq)
    assert(got(1)._3.length === 1000)
    assert(got(2)._3 === Seq.empty)
    assert(got.map(_._2).toSeq === Seq("2026-01-01T00:00:01Z", "2026-01-01T00:00:02Z", "2026-01-01T00:00:03Z"))
  }

  test("non-response records are skipped; truncated tail yields prior records") {
    val dir = tmpDir()
    val f = new java.io.File(dir, "mixed.warc")
    val out = new java.io.FileOutputStream(f)
    def w(s: String): Unit = out.write(s.getBytes("UTF-8"))
    // a warcinfo record (must be skipped)
    w("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 9\r\n\r\nsoftware\n\r\n\r\n")
    // a good response
    w("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://x/1\r\n" +
      "WARC-Date: 2026-02-02T00:00:00Z\r\nContent-Length: 4\r\n\r\nbody\r\n\r\n")
    // a truncated record (claims 100 bytes, has 3)
    w("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://x/2\r\nContent-Length: 100\r\n\r\nabc")
    out.close()
    val got = readWarc(dir.getAbsolutePath).collect()
    assert(got.length === 1)
    assert(got.head.getString(0) === "http://x/1")
    assert(new String(got.head.getAs[Array[Byte]](2), "UTF-8") === "body")
  }

  test("gz roundtrip: one gzip member per record, sniffed by magic not extension") {
    val dir = tmpDir()
    val recs = Seq(
      ("http://gz.example/1", "2026-01-01T00:00:01Z", "hello gz warc".getBytes("UTF-8")),
      ("http://gz.example/2", "2026-01-01T00:00:02Z", Array.tabulate(70000)(_.toByte)), // > one 64K buffer
      ("http://gz.example/3", "2026-01-01T00:00:03Z", "".getBytes("UTF-8")))
    WarcFixtures.writeWarc(new java.io.File(dir, "a.warc.gz"), recs, gzip = true)
    // same content, gzipped, but with a lying .warc extension: magic wins
    WarcFixtures.writeWarc(new java.io.File(dir, "b.warc"),
      Seq(("http://gz.example/4", "2026-01-01T00:00:04Z", "magic sniffed".getBytes("UTF-8"))),
      gzip = true)
    val got = readWarc(dir.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getAs[Array[Byte]](2))).sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq("http://gz.example/1", "http://gz.example/2",
      "http://gz.example/3", "http://gz.example/4"))
    assert(new String(got(0)._2, "UTF-8") === "hello gz warc")
    assert(got(1)._2.toSeq === Array.tabulate(70000)(_.toByte).toSeq)
    assert(got(2)._2.length === 0)
    assert(new String(got(3)._2, "UTF-8") === "magic sniffed")
  }

  test("whole-file gzip (one member spanning all records) also reads") {
    // some tools gzip the entire warc as a single member instead of
    // per-record members; the chain decoder must not care
    val dir = tmpDir()
    val plain = new java.io.File(dir, "plain.tmp")
    WarcFixtures.writeWarc(plain, Seq(
      ("http://w/1", "2026-01-01T00:00:01Z", "first body".getBytes("UTF-8")),
      ("http://w/2", "2026-01-01T00:00:02Z", ("z" * 100000).getBytes("UTF-8"))))
    val bytes = java.nio.file.Files.readAllBytes(plain.toPath)
    plain.delete()
    val dir2 = tmpDir()
    val out = new java.io.FileOutputStream(new java.io.File(dir2, "whole.warc.gz"))
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(bytes); gz.close()
    val got = readWarc(dir2.getAbsolutePath).collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](2).length)).sortBy(_._1)
    assert(got.toSeq === Seq(("http://w/1", 10), ("http://w/2", 100000)))
  }

  test("truncated gz tail yields the complete prior records, never throws") {
    val dir = tmpDir()
    val whole = new java.io.File(dir, "w.warc.gz")
    WarcFixtures.writeWarc(whole, Seq(
      ("http://t/1", "2026-01-01T00:00:01Z", ("x" * 5000).getBytes("UTF-8")),
      ("http://t/2", "2026-01-01T00:00:02Z", ("y" * 5000).getBytes("UTF-8"))),
      gzip = true)
    val bytes = java.nio.file.Files.readAllBytes(whole.toPath)
    // find the second member's gzip magic and cut inside it
    var cut = -1
    var i = 4
    while (cut < 0 && i < bytes.length - 1) {
      if ((bytes(i) & 0xFF) == 0x1F && (bytes(i + 1) & 0xFF) == 0x8B) cut = i + 40
      i += 1
    }
    assert(cut > 0 && cut < bytes.length)
    val dir2 = tmpDir()
    java.nio.file.Files.write(new java.io.File(dir2, "t.warc.gz").toPath,
      java.util.Arrays.copyOfRange(bytes, 0, cut))
    val got = readWarc(dir2.getAbsolutePath).collect()
    assert(got.length === 1)
    assert(got.head.getString(0) === "http://t/1")
    assert(got.head.getAs[Array[Byte]](2).length === 5000)
  }

  test("warc_http_body splits the HTTP message: content is the entity body alone") {
    val dir = tmpDir()
    val body = "the real page bytes éè".getBytes("UTF-8")
    WarcFixtures.writeWarc(new java.io.File(dir, "h.warc.gz"),
      Seq(("http://h/1", "2026-01-01T00:00:01Z", body)),
      gzip = true, httpWrap = true)
    // without the option the raw block (headers included) surfaces
    val raw = readWarc(dir.getAbsolutePath).collect().head.getAs[Array[Byte]]("content")
    assert(new String(raw, "UTF-8").startsWith("HTTP/1.1 200 OK\r\n"))
    assert(raw.length > body.length)
    // with the option only the entity body surfaces
    val split = spark.read.format("graft.sources.warc.WarcDataSource")
      .option("warc_http_body", "true")
      .load(dir.getAbsolutePath).collect().head.getAs[Array[Byte]]("content")
    assert(split.toSeq === body.toSeq)
  }

  test("unreadable or empty directory is an empty scan, not an NPE") {
    val dir = tmpDir()
    assert(readWarc(dir.getAbsolutePath).count() === 0)
    val gone = new java.io.File(dir, "does-not-exist-subdir")
    // a path that exists as neither file nor dir still plans (single-file
    // branch) and reads zero records gracefully
    assert(gone.isDirectory === false)
  }

  test("indexed .warc.gz splits into byte-range partitions with whole-file parity") {
    val dir = tmpDir()
    val f = new java.io.File(dir, "big.warc.gz")
    val recs = (0 until 400).map { i =>
      (s"http://s.example/$i", f"2026-03-03T00:${i / 60}%02d:${i % 60}%02dZ",
        (s"payload $i " * (20 + i % 50)).getBytes("UTF-8"))
    }
    WarcFixtures.writeWarc(f, recs, gzip = true, index = true)
    // the index is exact: every member starts a record, from byte 0
    val offsets = graft.sources.warc.WarcIndexer.readIndex(f)
    assert(offsets.length === 400)
    assert(offsets.head === 0L)
    assert(offsets.toSeq === offsets.sorted.toSeq)

    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1),
        new String(r.getAs[Array[Byte]](2), "UTF-8"))).sortBy(_._1).toSeq

    val whole = readWarc(f.getAbsolutePath)
    assert(whole.rdd.getNumPartitions === 1) // small file, default 128 MB ranges
    val split = spark.read.format("graft.sources.warc.WarcDataSource")
      .option("max_partition_bytes", "4096")
      .load(f.getAbsolutePath)
    assert(split.rdd.getNumPartitions > 4,
      s"expected a fan-out, got ${split.rdd.getNumPartitions} partitions")
    assert(rowsOf(split) === rowsOf(whole))
    // pruned read across split partitions still sees every record once
    val urls = spark.read.format("graft.sources.warc.WarcDataSource")
      .option("max_partition_bytes", "4096")
      .load(f.getAbsolutePath).select("url").collect().map(_.getString(0))
    assert(urls.length === 400 && urls.toSet.size === 400)
  }

  test("whole-file-gzip index has one split point; scan stays a single partition") {
    val dir = tmpDir()
    val plain = new java.io.File(dir, "plain.tmp")
    WarcFixtures.writeWarc(plain, Seq(
      ("http://one/1", "2026-01-01T00:00:01Z", "a".getBytes("UTF-8")),
      ("http://one/2", "2026-01-01T00:00:02Z", "bb".getBytes("UTF-8"))))
    val bytes = java.nio.file.Files.readAllBytes(plain.toPath)
    val f = new java.io.File(dir, "whole.warc.gz")
    val gz = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(f))
    gz.write(bytes); gz.close()
    assert(graft.sources.warc.WarcIndexer.writeIndex(f) === 1)
    val df = spark.read.format("graft.sources.warc.WarcDataSource")
      .option("max_partition_bytes", "64")
      .load(f.getAbsolutePath)
    assert(df.rdd.getNumPartitions === 1)
    assert(df.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("http://one/1", "http://one/2"))
  }

  test("stale .warci is rejected: a rewritten gz falls back to whole-file") {
    val dir = tmpDir()
    val f = new java.io.File(dir, "grow.warc.gz")
    def recs(n: Int) = (0 until n).map(i =>
      (s"http://g/$i", "2026-01-01T00:00:01Z", (s"body $i " * 30).getBytes("UTF-8")))
    WarcFixtures.writeWarc(f, recs(50), gzip = true, index = true)
    assert(graft.sources.warc.WarcIndexer.readIndex(f).length === 50)
    // rewrite the gz UNDER the old index (more records -> every old offset
    // is now wrong): the freshness header must invalidate the whole index
    WarcFixtures.writeWarc(f, recs(80), gzip = true, index = false)
    assert(graft.sources.warc.WarcIndexer.readIndex(f).isEmpty)
    // the scan falls back to one whole-file partition and drops no rows
    val df = spark.read.format("graft.sources.warc.WarcDataSource")
      .option("max_partition_bytes", "2048")
      .load(f.getAbsolutePath)
    assert(df.rdd.getNumPartitions === 1)
    assert(df.count() === 80L)
    // re-indexing refreshes the header; the fan-out returns, rows identical
    assert(graft.sources.warc.WarcIndexer.writeIndex(f) === 80)
    val again = spark.read.format("graft.sources.warc.WarcDataSource")
      .option("max_partition_bytes", "2048")
      .load(f.getAbsolutePath)
    assert(again.rdd.getNumPartitions > 1)
    assert(again.select("url").collect().map(_.getString(0)).sorted.toSeq ===
      df.select("url").collect().map(_.getString(0)).sorted.toSeq)
  }

  test("WarcIndexerMain indexes pre-existing gz files; ranged read is row-identical") {
    val dir = tmpDir()
    val f = new java.io.File(dir, "cli.warc.gz")
    val recs = (0 until 120).map(i =>
      (s"http://cli/$i", "2026-01-01T00:00:01Z", (s"page $i " * 40).getBytes("UTF-8")))
    // written WITHOUT an index — a third-party crawl file
    WarcFixtures.writeWarc(f, recs, gzip = true, index = false)
    val whole = readWarc(f.getAbsolutePath)
    assert(whole.rdd.getNumPartitions === 1)
    val wholeRows = whole.collect()
      .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](2), "UTF-8")))
      .sortBy(_._1).toSeq
    // the CLI indexes the directory (same entry point spark-submit drives)
    graft.sources.warc.WarcIndexerMain.main(Array(dir.getAbsolutePath))
    assert(graft.sources.warc.WarcIndexer.readIndex(f).length === 120)
    val ranged = spark.read.format("graft.sources.warc.WarcDataSource")
      .option("max_partition_bytes", "4096")
      .load(f.getAbsolutePath)
    assert(ranged.rdd.getNumPartitions > 2)
    assert(ranged.collect()
      .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](2), "UTF-8")))
      .sortBy(_._1).toSeq === wholeRows)
  }

  test("column pruning reaches the reader: select url never materializes content") {
    val dir = tmpDir()
    WarcFixtures.writeWarc(new java.io.File(dir, "p.warc"),
      Seq(("u://1", "2026-01-01T00:00:00Z", Array.fill(1 << 20)(7.toByte))))
    val df = readWarc(dir.getAbsolutePath).select("url")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("content#"), plan) // BatchScan output pruned to url
    assert(df.collect().map(_.getString(0)).toSeq === Seq("u://1"))
  }
}
