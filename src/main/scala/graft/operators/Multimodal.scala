package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque BINARY columns
 * with typed metadata, processed per-partition in batches (the Scala
 * equivalent of mapInPandas for this JVM-only engine).
 *
 * The actual codec work is STUBBED (no image/audio libs in this sandbox):
 * `decodeStub` parses this repo's deterministic fake media header —
 * magic "GMM1" | type:u8 | width:u16 | height:u16 | channels:u8 |
 * durationMs:u32 | payload — so the Spark-side contract (schema,
 * partitioning, batch shape, null/corrupt handling) is real and tested,
 * and a real decoder drops in by replacing ONE function.
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

  /** STUB decoder — replace with a real codec binding in production. */
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
          val meta = decodeStub(bytes)
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
    * arithmetic and the payload is the doc text, so a SQL oracle can
    * independently recompute what the decode+feature pipeline must emit.
    * doc_id % 4 == 3 yields a corrupt blob (payload only, no magic). */
  def mediaFromDoc(docId: Long, text: String): (Long, Array[Byte]) = {
    val t = (docId % 4).toInt
    val payload = (if (text == null) "" else text)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val blob =
      if (t == 3) payload
      else encodeStub(t,
        (64 + (docId * 37) % 1920).toInt,
        (64 + (docId * 53) % 1080).toInt,
        (1 + docId % 4).toInt,
        if (t == 2) 1000L + (docId * 97) % 60000 else 0L,
        payload)
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
