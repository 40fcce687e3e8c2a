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
 * `\r\n\r\n` + Content-Length payload + `\r\n\r\n`.
 *
 *   spark.read.format("graft.sources.warc.WarcDataSource" or "warc")
 *     .load("/path/to/dir-or-file")
 *
 * Schema: url STRING, warc_date STRING (ISO-8601 as written), content
 * BINARY. Only WARC-Type: response records surface; others are skipped.
 *
 * Spark-first details:
 *  - one InputPartition per .warc file — on a 100 TB crawl the unit of
 *    parallelism is the (many, ~1 GB) warc files, the standard layout;
 *    record-level splitting inside a file would need a gzip-member
 *    index (out of scope — plain-text WARC only here);
 *  - column pruning is pushed into the reader
 *    (SupportsPushDownRequiredColumns): `select url` never materializes
 *    page bytes — the reader SKIPS payloads instead of copying them;
 *  - malformed records terminate the file gracefully (a truncated tail
 *    yields the records before it, never an exception).
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
      new WarcScanBuilder(Option(path).getOrElse(options.get("path")))
  }

  class WarcScanBuilder(path: String) extends ScanBuilder
      with SupportsPushDownRequiredColumns {
    private var required: StructType = WarcTable.schema
    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema
    override def build(): Scan = new WarcScan(path, required)
  }

  class WarcScan(path: String, required: StructType) extends Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      val f = new java.io.File(path)
      val files =
        if (f.isDirectory)
          f.listFiles((_, n) => n.endsWith(".warc")).sortBy(_.getName)
        else Array(f)
      files.map(p => WarcFilePartition(p.getAbsolutePath): InputPartition)
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new WarcReaderFactory(required.fieldNames)
  }

  case class WarcFilePartition(file: String) extends InputPartition

  class WarcReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
      new WarcRecordReader(partition.asInstanceOf[WarcFilePartition].file, fields)
  }

  /** Streaming single-pass record reader; skips (never copies) payloads
    * of pruned-away content columns and of non-response records. */
  class WarcRecordReader(file: String, fields: Array[String])
      extends PartitionReader[InternalRow] {
    private val in = new BufferedInputStream(new FileInputStream(file), 1 << 16)
    private val needContent = fields.contains("content")
    private var current: InternalRow = _

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

    override def next(): Boolean = {
      while (true) {
        // seek the record header line (tolerates inter-record blank lines)
        var line = readLine()
        while (line != null && !line.startsWith("WARC/")) line = readLine()
        if (line == null) return false
        // named headers until the blank line
        var url: String = null
        var date: String = null
        var wtype: String = null
        var len = -1L
        var h = readLine()
        var ok = true
        while (ok && h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i > 0) {
            val k = h.substring(0, i).trim.toLowerCase
            val v = h.substring(i + 1).trim
            k match {
              case "warc-target-uri" => url = v
              case "warc-date" => date = v
              case "warc-type" => wtype = v
              case "content-length" =>
                len = try v.toLong catch { case _: NumberFormatException => ok = false; -1L }
              case _ =>
            }
          }
          h = readLine()
        }
        if (!ok || h == null || len < 0 || len > Int.MaxValue) return false // malformed tail
        val isResponse = wtype == "response"
        if (!isResponse || !needContent) {
          if (!skipFully(len)) return false
          if (isResponse) {
            current = buildRow(url, date, null)
            return true
          }
          // else: skipped record type, continue scanning
        } else {
          val payload = readFully(len.toInt)
          if (payload == null) return false // truncated tail
          current = buildRow(url, date, payload)
          return true
        }
      }
      false
    }

    private def buildRow(url: String, date: String, content: Array[Byte]): InternalRow = {
      val values: Array[Any] = fields.map {
        case "url" => if (url == null) null else UTF8String.fromString(url)
        case "warc_date" => if (date == null) null else UTF8String.fromString(date)
        case "content" => content
        case _ => null
      }
      InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(values))
    }

    override def get(): InternalRow = current
    override def close(): Unit = in.close()
  }

  /** Minimal spec-correct WARC writer (fixture side): response records,
    * CRLF headers, Content-Length payloads, double-CRLF separators. */
  object WarcFixtures {
    def writeWarc(file: java.io.File,
                  records: Seq[(String, String, Array[Byte])]): Unit = {
      val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(file))
      def w(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      records.zipWithIndex.foreach { case ((url, date, payload), i) =>
        w("WARC/1.0\r\n")
        w("WARC-Type: response\r\n")
        w(s"WARC-Record-ID: <urn:uuid:${"%08d".format(i)}>\r\n")
        w(s"WARC-Date: $date\r\n")
        w(s"WARC-Target-URI: $url\r\n")
        w(s"Content-Length: ${payload.length}\r\n")
        w("\r\n")
        out.write(payload)
        w("\r\n\r\n")
      }
      out.close()
    }
  }
}
