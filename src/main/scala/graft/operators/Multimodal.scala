package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque BINARY columns
 * with typed metadata, processed per-partition in batches (the Scala
 * equivalent of mapInPandas for this JVM-only engine).
 *
 * Decoders, sniffed by magic bytes:
 *  - BMP ("BM", BITMAPINFOHEADER, uncompressed BI_RGB) — REAL from-scratch
 *    parser: width/height/bit-depth/stride from the DIB header, pixel-array
 *    size computed from the 4-byte-aligned row stride;
 *  - WAV ("RIFF"+"WAVE", PCM fmt chunk) — REAL from-scratch parser:
 *    channels/sample-rate/bits from fmt, duration from the data chunk;
 *  - "GMM1" — this repo's deterministic fake header (type:u8 width:u16
 *    height:u16 channels:u8 durationMs:u32 | payload), kept for the VIDEO
 *    type, which has no sandbox-feasible from-scratch container format;
 *  - anything else decodes as invalid/unknown (never throws).
 */
object Multimodal {

  final case class MediaMeta(media_type: String, width: Int, height: Int,
                             channels: Int, duration_ms: Long, payload_bytes: Long,
                             valid: Boolean)
  final case class MediaFeatures(media_id: Long, meta: MediaMeta,
                                 // stub features: deterministic content digest stats
                                 mean_byte: Double, byte_entropy: Double,
                                 frame_samples: Seq[Long])

  private val Magic = Array[Byte]('G', 'M', 'M', '1')
  private val Types = IndexedSeq("image", "audio", "video")

  /** Encode a fake media blob (fixture side). */
  def encodeStub(mediaType: Int, width: Int, height: Int, channels: Int,
                 durationMs: Long, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 1 + 2 + 2 + 1 + 4 + payload.length)
    bb.put(Magic).put(mediaType.toByte)
      .putShort(width.toShort).putShort(height.toShort)
      .put(channels.toByte).putInt(durationMs.toInt)
      .put(payload)
    bb.array()
  }

  /** GMM1 fake-header decoder (the remaining stub, used for video only). */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.length < 14 ||
      bytes(0) != Magic(0) || bytes(1) != Magic(1) || bytes(2) != Magic(2) || bytes(3) != Magic(3))
      return MediaMeta("unknown", 0, 0, 0, 0L, if (bytes == null) 0 else bytes.length, valid = false)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.position(4)
    val t = bb.get() & 0xFF
    val w = bb.getShort & 0xFFFF
    val h = bb.getShort & 0xFFFF
    val c = bb.get() & 0xFF
    val d = bb.getInt.toLong & 0xFFFFFFFFL
    MediaMeta(Types.lift(t).getOrElse("unknown"), w, h, c, d, (bytes.length - 14).toLong,
      valid = t < Types.length)
  }

  // --------------------------------------------------------------- BMP (real)
  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) | ((b(o + 2) & 0xFFL) << 16) |
      ((b(o + 3) & 0xFFL) << 24)
  private def i32le(b: Array[Byte], o: Int): Int = u32le(b, o).toInt

  private val invalid = MediaMeta("unknown", 0, 0, 0, 0L, 0L, valid = false)

  /** Windows BMP, BITMAPINFOHEADER (or later, size >= 40), uncompressed
    * BI_RGB. payload_bytes = pixel-array size from the 4-byte-aligned row
    * stride (the format's real geometry, not the blob length). */
  def decodeBmp(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M')
      return invalid.copy(payload_bytes = if (bytes == null) 0 else bytes.length)
    val dibSize = u32le(bytes, 14)
    if (dibSize < 40) return invalid.copy(payload_bytes = bytes.length)
    val width = i32le(bytes, 18)
    val heightRaw = i32le(bytes, 22)
    val height = math.abs(heightRaw) // negative = top-down row order
    val planes = u16le(bytes, 26)
    val bpp = u16le(bytes, 28)
    val compression = u32le(bytes, 30)
    if (width <= 0 || height == 0 || planes != 1 || compression != 0L ||
      !Set(8, 24, 32).contains(bpp))
      return invalid.copy(payload_bytes = bytes.length)
    val stride = ((width.toLong * bpp + 31) / 32) * 4
    val pixelBytes = stride * height
    val pixelOffset = u32le(bytes, 10)
    if (pixelOffset + pixelBytes > bytes.length) // truncated pixel array
      return invalid.copy(payload_bytes = bytes.length)
    MediaMeta("image", width, height, bpp / 8, 0L, pixelBytes, valid = true)
  }

  /** Minimal BMP writer (fixture side): 24-bit BI_RGB, bottom-up, pixel
    * bytes cycled from `content` (zero-padded rows). */
  def encodeBmp(width: Int, height: Int, content: Array[Byte]): Array[Byte] = {
    val stride = ((width * 24 + 31) / 32) * 4
    val pixelBytes = stride * height
    val size = 54 + pixelBytes
    val bb = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(size).putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(pixelBytes).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    var k = 0
    while (y < height) {
      var x = 0
      while (x < stride) {
        val inRow = x < width * 3
        bb.put(if (inRow && content.nonEmpty) content(k % content.length) else 0.toByte)
        if (inRow && content.nonEmpty) k += 1
        x += 1
      }
      y += 1
    }
    bb.array()
  }

  // --------------------------------------------------------------- WAV (real)
  /** RIFF/WAVE with a PCM fmt chunk: channels and sample geometry from fmt,
    * duration from the data chunk (samples * 1000 / sampleRate). */
  def decodeWav(bytes: Array[Byte]): MediaMeta = {
    def tag(o: Int, s: String): Boolean =
      o + 4 <= bytes.length && (0 until 4).forall(i => bytes(o + i) == s.charAt(i).toByte)
    if (bytes == null || bytes.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE"))
      return invalid.copy(payload_bytes = if (bytes == null) 0 else bytes.length)
    var off = 12
    var channels = 0
    var sampleRate = 0L
    var blockAlign = 0
    var bits = 0
    var dataLen = -1L
    var fmtSeen = false
    while (off + 8 <= bytes.length && (dataLen < 0 || !fmtSeen)) {
      val len = u32le(bytes, off + 4)
      if (tag(off, "fmt ") && off + 8 + 16 <= bytes.length) {
        val audioFormat = u16le(bytes, off + 8)
        if (audioFormat != 1) return invalid.copy(payload_bytes = bytes.length) // PCM only
        channels = u16le(bytes, off + 10)
        sampleRate = u32le(bytes, off + 12)
        blockAlign = u16le(bytes, off + 20)
        bits = u16le(bytes, off + 22)
        fmtSeen = true
      } else if (tag(off, "data")) {
        dataLen = math.min(len, (bytes.length - off - 8).toLong)
      }
      val step = 8L + len + (len & 1L) // chunks are word-aligned
      off = if (off + step > bytes.length.toLong) bytes.length else (off + step).toInt
    }
    if (!fmtSeen || dataLen < 0 || channels <= 0 || sampleRate <= 0 ||
      blockAlign <= 0 || bits <= 0 || blockAlign != channels * (bits / 8))
      return invalid.copy(payload_bytes = bytes.length)
    val samples = dataLen / blockAlign
    MediaMeta("audio", 0, 0, channels, samples * 1000L / sampleRate, dataLen, valid = true)
  }

  /** Minimal PCM WAV writer (fixture side): 16-bit samples cycled from
    * `content`. */
  def encodeWav(channels: Int, sampleRate: Int, nSamples: Int,
                content: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * 2
    val dataLen = nSamples * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * blockAlign)
      .putShort(blockAlign.toShort).putShort(16)
    bb.put("data".getBytes).putInt(dataLen)
    var i = 0
    while (i < dataLen) {
      bb.put(if (content.nonEmpty) content(i % content.length) else 0.toByte)
      i += 1
    }
    bb.array()
  }

  /** Magic-sniffing decoder over all supported containers. */
  def decodeMedia(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.length < 4)
      return invalid.copy(payload_bytes = if (bytes == null) 0 else bytes.length)
    if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')
      decodeWav(bytes)
    else decodeStub(bytes)
  }

  /** Feature extraction over (media_id, bytes): batched per partition,
    * one pass per blob; frame sampling = every `frameStepMs` over duration
    * (stub: returns the sampled offsets; a real impl would decode frames). */
  def extractFeatures(df: DataFrame, idCol: String = "media_id",
                      bytesCol: String = "bytes", frameStepMs: Long = 1000L)
                     (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val meta = decodeMedia(bytes)
          val (mean, entropy) = byteStats(bytes)
          val frames =
            if (meta.media_type == "video" && meta.duration_ms > 0)
              (0L until meta.duration_ms by frameStepMs).take(64).toSeq
            else Seq.empty[Long]
          MediaFeatures(id, meta, mean, entropy, frames)
        }
      }.toDF()
  }

  private def byteStats(bytes: Array[Byte]): (Double, Double) = {
    if (bytes == null || bytes.isEmpty) return (0.0, 0.0)
    val hist = new Array[Long](256)
    var sum = 0L
    var i = 0
    while (i < bytes.length) { val b = bytes(i) & 0xFF; hist(b) += 1; sum += b; i += 1 }
    var ent = 0.0
    var k = 0
    while (k < 256) {
      if (hist(k) > 0) {
        val p = hist(k).toDouble / bytes.length
        ent -= p * (math.log(p) / math.log(2))
      }
      k += 1
    }
    (sum.toDouble / bytes.length, ent)
  }

  /** Doc-derived media blob: every header parameter is pure doc_id
    * arithmetic and the content bytes come from the doc text, so a SQL
    * oracle can independently recompute what the decode+feature pipeline
    * must emit. Routing by doc_id % 4:
    *  0 -> REAL 24-bit BMP, width 4+(id*7)%32, height 4+(id*11)%32
    *       (payload_bytes = aligned stride * height);
    *  1 -> REAL PCM WAV, channels 1+id%2, 8 kHz, 8*(1+id%50) samples
    *       (duration_ms = 1+id%50 exactly);
    *  2 -> GMM1 fake video header (the remaining stub type);
    *  3 -> corrupt blob (text bytes, no magic). */
  def mediaFromDoc(docId: Long, text: String): (Long, Array[Byte]) = {
    val t = (docId % 4).toInt
    val payload = (if (text == null) "" else text)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val blob = t match {
      case 0 => encodeBmp((4 + (docId * 7) % 32).toInt, (4 + (docId * 11) % 32).toInt, payload)
      case 1 => encodeWav((1 + docId % 2).toInt, 8000, (8 * (1 + docId % 50)).toInt, payload)
      case 2 => encodeStub(2,
        (64 + (docId * 37) % 1920).toInt,
        (64 + (docId * 53) % 1080).toInt,
        (1 + docId % 4).toInt,
        1000L + (docId * 97) % 60000,
        payload)
      case _ => payload
    }
    (docId, blob)
  }

  /** Deterministic fixture media table generator. */
  def mediaRow(i: Long, seed: Long = 42L): (Long, Array[Byte]) = {
    var x = seed * 0x9E3779B97F4A7C15L + i * 0xC2B2AE3D27D4EB4FL
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def nextInt(b: Int): Int = Math.floorMod(next(), b.toLong).toInt
    val t = nextInt(4) // 3 => corrupt blob
    val payload = Array.fill(64 + nextInt(512))(next().toByte)
    val blob =
      if (t == 3) payload // corrupt: no magic
      else encodeStub(t, 64 + nextInt(1920), 64 + nextInt(1080), 1 + nextInt(4),
        if (t == 2) 1000L + nextInt(60000) else 0L, payload)
    (i, blob)
  }
}
