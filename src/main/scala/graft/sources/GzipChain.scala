package graft.sources.warc

import java.io.InputStream
import java.nio.ByteBuffer
import java.nio.channels.ReadableByteChannel
import java.util.zip.{CRC32, DataFormatException, Inflater}

/**
 * InputStream over a chain of concatenated gzip members (RFC 1952) — the
 * layout Common Crawl uses for `.warc.gz`: one gzip member per WARC
 * record, which is exactly what makes record-parallel reading possible
 * (any member boundary is a safe resume point).
 *
 * Built from scratch on the public RFC 1952 framing (header flag walk,
 * raw-deflate body, CRC32+ISIZE trailer) over the JDK Inflater's
 * ByteBuffer API with DIRECT buffers: the byte[] overloads
 * (GZIPInputStream's path) pin arrays via GetPrimitiveArrayCritical,
 * which under 32 allocation-heavy threads degenerates into
 * GCLocker-initiated GC storms that serialize the whole JVM (measured 9x
 * on the mixed extraction workload) — the direct-buffer path never pins.
 *
 * Truncation/corruption tolerant by contract (WARC reader semantics): a
 * mid-member truncated tail, a bad trailer, or corrupt deflate data ends
 * the stream — never an exception. Only bytes of CRC-verified members
 * (plus any chunks of an oversized corrupt member that were already
 * consumed before its trailer could be checked) ever surface; the final
 * unverified chunk of a bad member is dropped at the trailer check. The
 * enclosing record parser then discards any partial record.
 */
final class GzipChainInputStream(ch: ReadableByteChannel,
                                 bufSize: Int = 1 << 16) extends InputStream {

  private val inf = new Inflater(true) // nowrap: raw deflate inside gzip framing
  private val crc = new CRC32
  // both buffers kept in READ mode (position..limit = unconsumed)
  private val raw = ByteBuffer.allocateDirect(bufSize); raw.limit(0)
  private val out = ByteBuffer.allocateDirect(bufSize); out.limit(0)

  /** Invoked with the absolute COMPRESSED offset of each member whose
    * header parses cleanly, before any of its payload surfaces. Offsets
    * are relative to the channel's position at construction — callers
    * indexing a file must hand the channel over at offset 0. The hook
    * fires only between members (`out` fully drained), so the next bytes
    * the consumer reads are exactly the member's first inflated bytes —
    * what WarcIndexer relies on to test record alignment. */
  var onMemberStart: Long => Unit = _

  private var chRead = 0L // total bytes taken from the channel
  /** Absolute compressed offset of the next unconsumed raw byte. */
  private def rawOffset: Long = chRead - raw.remaining()

  private final val StHeader = 0
  private final val StBody = 1
  private final val StEof = 2
  private var state = StHeader

  /** Refill `raw` from the channel; returns bytes added, -1 on channel EOF
    * with nothing added. Only called when the inflater has consumed all
    * prior input (needsInput), so compacting cannot invalidate its view. */
  private def refillRaw(): Int = {
    raw.compact()
    var n = ch.read(raw)
    while (n == 0) n = ch.read(raw) // non-blocking channels never appear here
    raw.flip()
    if (n > 0) chRead += n
    if (n < 0 && !raw.hasRemaining) -1 else math.max(n, 0)
  }

  private def readRawByte(): Int = {
    if (!raw.hasRemaining && refillRaw() < 0) return -1
    if (!raw.hasRemaining) return -1
    raw.get() & 0xFF
  }

  /** RFC 1952 member header: magic, CM=8, FLG, MTIME/XFL/OS, then the
    * optional FEXTRA/FNAME/FCOMMENT/FHCRC fields the flags announce. */
  private def readHeader(): Boolean = {
    val m1 = readRawByte()
    if (m1 < 0) return false // clean EOF between members
    val m2 = readRawByte()
    if (m1 != 0x1F || m2 != 0x8B) return false
    if (readRawByte() != 8) return false // CM: deflate only
    val flg = readRawByte()
    if (flg < 0) return false
    var i = 0
    while (i < 6) { if (readRawByte() < 0) return false; i += 1 } // MTIME+XFL+OS
    if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
      val x1 = readRawByte(); val x2 = readRawByte()
      if (x1 < 0 || x2 < 0) return false
      var xlen = x1 | (x2 << 8)
      while (xlen > 0) { if (readRawByte() < 0) return false; xlen -= 1 }
    }
    if ((flg & 8) != 0) { // FNAME: zero-terminated
      var c = readRawByte()
      while (c > 0) c = readRawByte()
      if (c < 0) return false
    }
    if ((flg & 16) != 0) { // FCOMMENT: zero-terminated
      var c = readRawByte()
      while (c > 0) c = readRawByte()
      if (c < 0) return false
    }
    if ((flg & 2) != 0) { // FHCRC
      if (readRawByte() < 0 || readRawByte() < 0) return false
    }
    inf.reset()
    crc.reset()
    true
  }

  /** CRC32 + ISIZE (both LE). A mismatch means the member is corrupt; the
    * caller treats it as end-of-stream. */
  private def readTrailer(): Boolean = {
    var tcrc = 0L
    var isize = 0L
    var i = 0
    while (i < 4) { val b = readRawByte(); if (b < 0) return false; tcrc |= b.toLong << (8 * i); i += 1 }
    i = 0
    while (i < 4) { val b = readRawByte(); if (b < 0) return false; isize |= b.toLong << (8 * i); i += 1 }
    tcrc == crc.getValue && isize == (inf.getBytesWritten & 0xFFFFFFFFL)
  }

  /** Ensure `out` has unconsumed bytes; false at (graceful) end of chain. */
  private def ensureOut(): Boolean = {
    while (!out.hasRemaining) {
      state match {
        case StEof => return false
        case StHeader =>
          val memberOff = rawOffset
          if (!readHeader()) { state = StEof; return false }
          if (onMemberStart != null) onMemberStart(memberOff)
          state = StBody
        case StBody =>
          out.clear()
          val produced =
            try {
              if (inf.needsInput() && !inf.finished()) {
                if (!raw.hasRemaining && refillRaw() < 0) { // truncated member
                  state = StEof; out.limit(0); return false
                }
                inf.setInput(raw) // inflater consumes raw in place (position advances)
              }
              inf.inflate(out)
            } catch {
              case _: DataFormatException => state = StEof; out.limit(0); return false
            }
          if (produced > 0) {
            val d = out.duplicate(); d.flip(); crc.update(d)
          }
          out.flip()
          if (inf.finished()) {
            // the inflater leaves unconsumed bytes (trailer + next member)
            // in `raw` at its advanced position
            if (readTrailer()) state = StHeader
            else {
              // trailer missing or CRC32/ISIZE mismatch: drop the final,
              // not-yet-verified chunk so only bytes from CRC-verified
              // members surface (earlier already-consumed chunks of an
              // oversized corrupt member cannot be retracted; the record
              // parser discards them as a partial record)
              state = StEof; out.limit(out.position()); return out.hasRemaining
            }
          } else if (produced == 0 && inf.needsDictionary()) {
            state = StEof; return out.hasRemaining
          }
      }
    }
    true
  }

  override def read(): Int =
    if (!ensureOut()) -1 else out.get() & 0xFF

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    if (!ensureOut()) return -1
    val k = math.min(len, out.remaining())
    out.get(b, off, k)
    k
  }

  /** Skips by advancing the output buffer position — payload bytes of
    * pruned columns are inflated (unavoidable) but never copied out. */
  override def skip(n: Long): Long = {
    var left = n
    while (left > 0 && ensureOut()) {
      val k = math.min(left, out.remaining().toLong).toInt
      out.position(out.position() + k)
      left -= k
    }
    n - left
  }

  override def close(): Unit = {
    inf.end()
    ch.close()
  }
}
