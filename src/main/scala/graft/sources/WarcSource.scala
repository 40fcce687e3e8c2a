package graft.sources

import java.io.{BufferedInputStream, FileInputStream, InputStream}
import java.util
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * DataSource V2 reader for WARC (Web ARChive, ISO 28500) response
 * records — the container Common Crawl ships — built from scratch on the
 * public spec: records are `WARC/1.0\r\n` + named headers +
 * `\r\n\r\n` + Content-Length payload + `\r\n\r\n`. Both plain `.warc`
 * and the crawl's native `.warc.gz` (one gzip member per record,
 * RFC 1952 chain) are read; compression is sniffed from the magic bytes,
 * not the file name.
 *
 *   spark.read.format("graft.sources.warc.WarcDataSource" or "warc")
 *     .option("warc_http_body", "true")   // optional, see below
 *     .load("/path/to/dir-or-file")
 *
 * Schema: url STRING, warc_date STRING (ISO-8601 as written), content
 * BINARY. Only WARC-Type: response records surface; others are skipped.
 * With `warc_http_body=true`, records whose Content-Type is
 * application/http carry an HTTP message (status line + headers +
 * CRLFCRLF + entity body) as their block; `content` is then the entity
 * body alone — the bytes an extraction kernel actually wants (the
 * reference's fetcher likewise hands the processor a clean payload,
 * /root/reference/src/storage.py:21-33) — split at the first CRLFCRLF
 * without copying the header bytes.
 *
 * Spark-first details:
 *  - unit of parallelism: one InputPartition per .warc/.warc.gz file, OR
 *    multiple ~128 MB byte-range partitions per gz file when a `.warci`
 *    side index (WarcIndexer — member starts that begin a record) is
 *    present, so a skewed file-size distribution cannot serialize the
 *    scan on a few giant files;
 *  - column pruning is pushed into the reader
 *    (SupportsPushDownRequiredColumns): `select url` never materializes
 *    page bytes — the reader SKIPS payloads instead of copying them
 *    (for gz, skipped payloads are inflated but never copied);
 *  - malformed records terminate the file gracefully (a truncated tail
 *    — plain or mid-gzip-member — yields the records before it, never
 *    an exception);
 *  - gzip inflation uses direct-ByteBuffer Inflater state
 *    (GzipChainInputStream): the byte[] zip APIs pin arrays via JNI and
 *    GCLocker-serialize 32-thread workloads.
 */
package warc {

  class WarcDataSource extends TableProvider
      with org.apache.spark.sql.sources.DataSourceRegister {
    override def shortName(): String = "warc"
    override def inferSchema(options: CaseInsensitiveStringMap): StructType =
      WarcTable.schema
    override def getTable(schema: StructType, partitioning: Array[Transform],
                          properties: util.Map[String, String]): Table =
      new WarcTable(properties.get("path"))
  }

  object WarcTable {
    val schema: StructType = StructType(Seq(
      StructField("url", StringType, nullable = true),
      StructField("warc_date", StringType, nullable = true),
      StructField("content", BinaryType, nullable = true)))
  }

  class WarcTable(path: String) extends Table with SupportsRead {
    override def name(): String = s"warc($path)"
    override def schema(): StructType = WarcTable.schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new WarcScanBuilder(Option(path).getOrElse(options.get("path")),
        options.getBoolean("warc_http_body", false),
        options.getLong("max_partition_bytes", WarcScan.DefaultMaxPartitionBytes))
  }

  class WarcScanBuilder(path: String, httpBody: Boolean,
                        maxPartitionBytes: Long) extends ScanBuilder
      with SupportsPushDownRequiredColumns {
    private var required: StructType = WarcTable.schema
    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema
    override def build(): Scan = new WarcScan(path, required, httpBody, maxPartitionBytes)
  }

  class WarcScan(path: String, required: StructType, httpBody: Boolean,
                 maxPartitionBytes: Long = WarcScan.DefaultMaxPartitionBytes)
      extends Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      val f = new java.io.File(path)
      val files =
        if (f.isDirectory)
          // listFiles returns null on IO error / unreadable dir — that is
          // an empty scan, not an NPE
          Option(f.listFiles((_, n) => n.endsWith(".warc") || n.endsWith(".warc.gz")))
            .getOrElse(Array.empty[java.io.File]).sortBy(_.getName)
        else Array(f)
      files.flatMap { p =>
        // A `.warci` side index (WarcIndexer) lists the safe split offsets
        // of a gz file: compressed member starts whose inflated payload
        // begins a WARC record. With one, a large file fans out into
        // ~maxPartitionBytes ranges, each ending exactly at another
        // member start — no partition ever double-reads or spans a
        // record. Without one (or for plain .warc), the file stays a
        // single partition: the whole-file-gzip layout (one member
        // spanning all records) has no safe interior split points, and
        // magic-byte guessing inside compressed payloads is not exact.
        val splits = WarcIndexer.readIndex(p)
        // split only when the index covers the file from byte 0 and every
        // offset is inside the file — an index whose first member starts
        // later (or that outlived a rewrite of the gz it describes; the
        // `#gzlen=` header catches that in readIndex) cannot reproduce the
        // whole-file read exactly, so it is ignored rather than trusted
        if (splits.length <= 1 || splits.head != 0L || splits.last >= p.length())
          Seq(WarcFilePartition(p.getAbsolutePath, 0L, p.length()))
        else {
          val starts = ArrayBuffer(splits.head)
          var chunkStart = splits.head
          splits.tail.foreach { off =>
            if (off - chunkStart >= maxPartitionBytes) { starts += off; chunkStart = off }
          }
          val bounds = starts :+ p.length()
          bounds.sliding(2).map { w =>
            WarcFilePartition(p.getAbsolutePath, w(0), w(1)) }.toSeq
        }
      }.map(p => p: InputPartition)
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new WarcReaderFactory(required.fieldNames, httpBody)
  }

  object WarcScan {
    /** Same default unit of scan parallelism Spark's own file sources use
      * (spark.sql.files.maxPartitionBytes). */
    val DefaultMaxPartitionBytes: Long = 128L << 20
  }

  case class WarcFilePartition(file: String, start: Long, end: Long) extends InputPartition

  class WarcReaderFactory(fields: Array[String], httpBody: Boolean)
      extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[WarcFilePartition]
      new WarcRecordReader(p.file, fields, httpBody, p.start, p.end)
    }
  }

  /** ReadableByteChannel view of `ch`'s next `remaining` bytes — a split
    * partition's gz chain must see EOF exactly at the next member start,
    * so the chain ends cleanly at the range boundary. */
  private[warc] final class BoundedChannel(ch: java.nio.channels.FileChannel,
                                           private var remaining: Long)
      extends java.nio.channels.ReadableByteChannel {
    override def read(dst: java.nio.ByteBuffer): Int = {
      if (remaining <= 0) return -1
      val oldLimit = dst.limit()
      if (dst.remaining() > remaining)
        dst.limit(dst.position() + remaining.toInt)
      val n = try ch.read(dst) finally dst.limit(oldLimit)
      if (n > 0) remaining -= n
      n
    }
    override def isOpen: Boolean = ch.isOpen
    override def close(): Unit = ch.close()
  }

  /** A parsed WARC response record. `content` is null when the payload was
    * pruned away (column not requested). */
  final case class WarcRec(url: String, date: String, content: Array[Byte])

  /** Streaming single-pass record parser over any InputStream of WARC
    * bytes; skips (never copies) payloads of pruned-away content columns
    * and of non-response records. Shared by the batch DSv2 reader (file
    * ranges) and the streaming path (whole in-memory files). */
  private[sources] final class WarcRecordIterator(in: InputStream,
                                                  needContent: Boolean,
                                                  httpBody: Boolean)
      extends Iterator[WarcRec] {
    private var nextRec: WarcRec = _
    private var done = false

    override def hasNext: Boolean = {
      if (nextRec == null && !done) { nextRec = advance(); done = nextRec == null }
      nextRec != null
    }
    override def next(): WarcRec = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRec; nextRec = null; r
    }

    private def readLine(): String = {
      // header lines are CRLF-terminated ASCII per spec
      val sb = new java.lang.StringBuilder(64)
      var c = in.read()
      while (c != -1 && c != '\n') {
        if (c != '\r') sb.append(c.toChar)
        c = in.read()
      }
      if (c == -1 && sb.length() == 0) null else sb.toString
    }

    private def skipFully(n: Long): Boolean = {
      var left = n
      while (left > 0) {
        val s = in.skip(left)
        if (s <= 0) { if (in.read() == -1) return false else left -= 1 }
        else left -= s
      }
      true
    }

    private def readFully(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) return null
        off += r
      }
      buf
    }

    /** Next response record, or null at (graceful) end of stream. */
    private def advance(): WarcRec = {
      while (true) {
        // seek the record header line (tolerates inter-record blank lines)
        var line = readLine()
        while (line != null && !line.startsWith("WARC/")) line = readLine()
        if (line == null) return null
        // named headers until the blank line
        var url: String = null
        var date: String = null
        var wtype: String = null
        var ctype: String = null
        var len = -1L
        var h = readLine()
        var ok = true
        while (ok && h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i > 0) {
            val k = h.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
            val v = h.substring(i + 1).trim
            k match {
              case "warc-target-uri" => url = v
              case "warc-date" => date = v
              case "warc-type" => wtype = v
              case "content-type" => ctype = v
              case "content-length" =>
                len = try v.toLong catch { case _: NumberFormatException => ok = false; -1L }
              case _ =>
            }
          }
          h = readLine()
        }
        if (!ok || h == null || len < 0) return null // malformed tail
        val isResponse = wtype == "response"
        // a block too large to materialize as one array is SKIPPED ENTIRELY
        // (no row) when content is required, not treated as a malformed
        // tail — the rest of the file still reads. Emitting a null-content
        // row here would be indistinguishable from a pruned-column read.
        val oversized = len > Int.MaxValue - 16
        if (!isResponse || !needContent || oversized) {
          if (!skipFully(len)) return null
          if (isResponse && !(needContent && oversized))
            return WarcRec(url, date, null)
          // else: skipped record type / oversized-with-content, keep scanning
        } else {
          val payload = readFully(len.toInt)
          if (payload == null) return null // truncated tail
          val content =
            if (httpBody && ctype != null &&
                ctype.toLowerCase(java.util.Locale.ROOT).startsWith("application/http"))
              httpEntityBody(payload)
            else payload
          return WarcRec(url, date, content)
        }
      }
      null
    }

    /** Entity body of an HTTP message block: everything after the first
      * CRLFCRLF (the status line + headers end there). A block with no
      * header terminator is returned whole — better the raw bytes than
      * silently dropping a malformed record's payload. */
    private def httpEntityBody(payload: Array[Byte]): Array[Byte] = {
      var i = 0
      val limit = payload.length - 3
      while (i < limit) {
        if (payload(i) == '\r' && payload(i + 1) == '\n' &&
            payload(i + 2) == '\r' && payload(i + 3) == '\n')
          return java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
        i += 1
      }
      payload
    }

    def close(): Unit = in.close()
  }

  /** DSv2 partition reader over one (file, start, end) byte range. A range
    * other than whole-file is only ever planned for an indexed gz file,
    * where both bounds are verified member-and-record starts. */
  class WarcRecordReader(file: String, fields: Array[String],
                         httpBody: Boolean = false,
                         start: Long = 0L, end: Long = Long.MaxValue)
      extends PartitionReader[InternalRow] {
    private val it: WarcRecordIterator = {
      // sniff the gzip magic rather than trusting the extension, then
      // rewind through the shared channel position
      val fis = new FileInputStream(file)
      val b0 = fis.read(); val b1 = fis.read()
      fis.getChannel.position(start)
      val in: InputStream =
        if (b0 == 0x1F && b1 == 0x8B)
          new GzipChainInputStream(new BoundedChannel(fis.getChannel, end - start))
        else new BufferedInputStream(fis, 1 << 16)
      new WarcRecordIterator(in, fields.contains("content"), httpBody)
    }
    private var current: InternalRow = _

    override def next(): Boolean = {
      if (!it.hasNext) return false
      val r = it.next()
      val values: Array[Any] = fields.map {
        case "url" => if (r.url == null) null else UTF8String.fromString(r.url)
        case "warc_date" => if (r.date == null) null else UTF8String.fromString(r.date)
        case "content" => r.content
        case _ => null
      }
      current = InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(values))
      true
    }

    override def get(): InternalRow = current
    override def close(): Unit = it.close()
  }

  /** Side index of safe split offsets for a `.warc.gz` file: the absolute
    * compressed offsets of gzip members whose FIRST inflated bytes begin a
    * WARC record ("WARC/"). In the crawl's one-member-per-record layout
    * that is every member; in the whole-file-gzip layout it is offset 0
    * alone (correctly yielding one partition). One decimal offset per
    * line in `<file>.warci` — the moral equivalent of Common Crawl's CDX
    * offsets, derived here from the gz framing itself in one sequential
    * pass (an O(file) indexing job a real deployment runs once per file
    * at crawl-ingest time, then every scan fans out). */
  object WarcIndexer {
    val Suffix = ".warci"

    /** Sequentially scan a gz file and write its split index. Returns the
      * number of split points found (0 for a non-gzip file: no index is
      * written). Exact by construction: offsets come from the chain
      * decoder's own member walk, and a member only qualifies if the
      * record header literally begins at its first inflated byte. */
    def writeIndex(gzFile: java.io.File): Int = {
      val fis = new FileInputStream(gzFile)
      val head0 = fis.read(); val head1 = fis.read()
      fis.getChannel.position(0L)
      if (head0 != 0x1F || head1 != 0x8B) { fis.close(); return 0 }
      val offsets = ArrayBuffer.empty[Long]
      val chain = new GzipChainInputStream(fis.getChannel)
      try {
        var pendingMember = -1L
        chain.onMemberStart = off => pendingMember = off
        val buf = new Array[Byte](1 << 16)
        var n = chain.read(buf, 0, buf.length)
        while (n >= 0) {
          // a read never spans a member boundary (the chain refills its
          // output one member-chunk at a time), so a member's first
          // inflated bytes are always the head of the chunk after its
          // onMemberStart fired
          if (pendingMember >= 0) {
            if (n >= 5 && buf(0) == 'W' && buf(1) == 'A' && buf(2) == 'R' &&
                buf(3) == 'C' && buf(4) == '/')
              offsets += pendingMember
            pendingMember = -1L
          }
          n = chain.read(buf, 0, buf.length)
        }
      } finally chain.close()
      val w = new java.io.FileWriter(new java.io.File(gzFile.getParentFile,
        gzFile.getName + Suffix))
      // freshness header: the exact byte length of the gz this index
      // describes. A rewritten/appended gz under a stale index would land
      // split offsets mid-member and silently drop rows — readIndex
      // rejects the index on any length mismatch instead.
      try {
        w.write(s"#gzlen=${gzFile.length()}\n")
        offsets.foreach(o => w.write(o.toString + "\n"))
      } finally w.close()
      offsets.length
    }

    /** Split offsets for a file, or empty when it has no (readable) index
      * OR the index's `#gzlen=` freshness header disagrees with the file's
      * current length (stale index — e.g. the gz was rewritten). Headerless
      * legacy indexes are still accepted; the planner's bounds check
      * (`splits.last < length`) is their only staleness guard. */
    def readIndex(file: java.io.File): Array[Long] = {
      val idx = new java.io.File(file.getParentFile, file.getName + Suffix)
      if (!idx.isFile) return Array.emptyLongArray
      val src = scala.io.Source.fromFile(idx, "UTF-8")
      try {
        val lines = src.getLines().filter(_.nonEmpty).toArray
        val stale = lines.headOption.exists(l =>
          l.startsWith("#gzlen=") && l.stripPrefix("#gzlen=") != file.length().toString)
        if (stale) Array.emptyLongArray
        else lines.filterNot(_.startsWith("#")).map(_.toLong)
      }
      catch { case _: NumberFormatException => Array.emptyLongArray }
      finally src.close()
    }
  }

  /** CLI to index pre-existing third-party `.warc.gz` files for
    * range-split scans (the once-per-file ingest job a real deployment
    * schedules at crawl-ingest time; every later scan of an indexed file
    * fans out into ~128 MB partitions):
    *
    *   java -cp ... graft.sources.warc.WarcIndexerMain <file-or-dir> ...
    *
    * Writes `<file>.warci` next to each gz file (one sequential pass per
    * file); non-gzip inputs are skipped (a plain `.warc` is never
    * splittable — see WarcScan). Prints one JSON line per file. */
  object WarcIndexerMain {
    def main(args: Array[String]): Unit = {
      require(args.nonEmpty, "usage: WarcIndexerMain <warc.gz-file-or-dir> ...")
      args.iterator.map(new java.io.File(_)).flatMap { f =>
        if (f.isDirectory)
          Option(f.listFiles((_, n) => n.endsWith(".warc.gz")))
            .getOrElse(Array.empty[java.io.File]).sortBy(_.getName).toSeq
        else Seq(f)
      }.foreach { f =>
        val n = WarcIndexer.writeIndex(f)
        println(s"""{"file":"${f.getAbsolutePath}","members":$n}""")
      }
    }
  }

  /** Streaming-side helper: parse WARC records out of one in-memory file
    * image (the row shape `binaryFile` file streams deliver — executors
    * hold one ~file per task, the same unit as the batch scan). Plain or
    * gz, magic-sniffed. */
  object WarcBytes {
    def records(bytes: Array[Byte], httpBody: Boolean): Iterator[WarcRec] = {
      if (bytes == null || bytes.length == 0) return Iterator.empty
      val base = new java.io.ByteArrayInputStream(bytes)
      val in: InputStream =
        if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B)
          new GzipChainInputStream(java.nio.channels.Channels.newChannel(base))
        else base
      new WarcRecordIterator(in, needContent = true, httpBody = httpBody)
    }
  }

  /** Minimal spec-correct WARC writer (fixture side): response records,
    * CRLF headers, Content-Length payloads, double-CRLF separators.
    * `gzip=true` writes the crawl's native layout — one RFC 1952 member
    * per record; `httpWrap=true` wraps each payload as an HTTP response
    * message (status line + headers + CRLFCRLF + body) with
    * Content-Type: application/http, the shape real response records
    * have. */
  object WarcFixtures {
    def writeWarc(file: java.io.File,
                  records: IterableOnce[(String, String, Array[Byte])],
                  gzip: Boolean = false,
                  httpWrap: Boolean = false,
                  index: Boolean = false): Unit = {
      import java.nio.charset.StandardCharsets.UTF_8
      val fileOut = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(file), 1 << 16)
      records.iterator.zipWithIndex.foreach { case ((url, date, payload0), i) =>
        val payload =
          if (!httpWrap) payload0
          else {
            val head = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n" +
              s"Content-Length: ${payload0.length}\r\n\r\n").getBytes(UTF_8)
            val b = new Array[Byte](head.length + payload0.length)
            System.arraycopy(head, 0, b, 0, head.length)
            System.arraycopy(payload0, 0, b, head.length, payload0.length)
            b
          }
        val rec = new java.io.ByteArrayOutputStream(payload.length + 256)
        def w(s: String): Unit = rec.write(s.getBytes(UTF_8))
        w("WARC/1.0\r\n")
        w("WARC-Type: response\r\n")
        w(s"WARC-Record-ID: <urn:uuid:${"%08d".format(i)}>\r\n")
        w(s"WARC-Date: $date\r\n")
        w(s"WARC-Target-URI: $url\r\n")
        if (httpWrap) w("Content-Type: application/http; msgtype=response\r\n")
        w(s"Content-Length: ${payload.length}\r\n")
        w("\r\n")
        rec.write(payload)
        w("\r\n\r\n")
        if (gzip) {
          // one gzip member per record, buffered so close() releases the
          // deflater's native state per member; members concatenate
          val mem = new java.io.ByteArrayOutputStream(rec.size() / 2 + 64)
          val gz = new java.util.zip.GZIPOutputStream(mem)
          gz.write(rec.toByteArray)
          gz.close()
          mem.writeTo(fileOut)
        } else rec.writeTo(fileOut)
      }
      fileOut.close()
      // index from the finished bytes (not from writer bookkeeping): the
      // same one-pass job that would index a crawl file we didn't write
      if (index && gzip) WarcIndexer.writeIndex(file)
    }
  }
}
