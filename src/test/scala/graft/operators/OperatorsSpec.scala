package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class OperatorsSpec extends AnyFunSuite {

  private implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("operators")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def baseText(i: Int): String = {
    val r = new scala.util.Random(1000 + i)
    (0 until 80).map(_ => s"word${r.nextInt(500)}").mkString(" ")
  }
  private def mutate(t: String, edits: Int, seed: Int): String = {
    val words = t.split(" ")
    val r = new scala.util.Random(seed)
    (0 until edits).foreach(_ => words(r.nextInt(words.length)) = s"changed${r.nextInt(100)}")
    words.mkString(" ")
  }

  // ------------------------------------------------------------- minhash
  test("minhash: identical texts agree fully; mutations degrade smoothly") {
    val t = baseText(1)
    val s1 = Dedup.signature(t)
    val s2 = Dedup.signature(t)
    assert(s1.sameElements(s2))
    assert(Dedup.estimateJaccard(s1, s2) === 1.0)
    val light = Dedup.estimateJaccard(s1, Dedup.signature(mutate(t, 4, 9)))
    val heavy = Dedup.estimateJaccard(s1, Dedup.signature(mutate(t, 40, 9)))
    assert(light > heavy)
    assert(light > 0.5 && heavy < 0.5)
  }

  test("minhash estimate tracks exact jaccard within 0.15") {
    val t = baseText(2)
    (1 to 5).foreach { e =>
      val m = mutate(t, e * 8, e)
      val est = Dedup.estimateJaccard(Dedup.signature(t, 128), Dedup.signature(m, 128))
      val exact = Dedup.exactJaccard(t, m)
      assert(math.abs(est - exact) < 0.15, s"edits=${e * 8}: est=$est exact=$exact")
    }
  }

  test("LSH near-dup pairs: planted duplicates found, unrelated docs not paired") {
    import spark.implicits._
    // 60 distinct docs + 10 planted near-dups (ids 1000+i duplicates i)
    val originals = (0 until 60).map(i => (i.toLong, baseText(i)))
    val planted = (0 until 10).map(i => (1000L + i, mutate(baseText(i), 3, i)))
    val df = (originals ++ planted).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(df, "doc_id", "text", threshold = 0.6).collect()
    val found = pairs.map(p => (p.id_a, p.id_b)).toSet
    val expected = (0 until 10).map(i => (i.toLong, 1000L + i)).toSet
    val hits = expected.count(found.contains)
    assert(hits >= 9, s"found only $hits/10 planted pairs: $found")
    // no unrelated pair (different base text => exact jaccard near 0)
    val textById = (originals ++ planted).toMap
    found.foreach { case (a, b) =>
      val exact = Dedup.exactJaccard(textById(a), textById(b))
      assert(exact > 0.4, s"false positive pair ($a,$b) exact=$exact")
    }
  }

  test("windowDupStats: planted copies flagged, short and repetitive docs exact") {
    import spark.implicits._
    val a = (1 to 30).map(i => s"w$i").mkString(" ")  // 30 words, unique
    val b = (1 to 30).map(i => s"x$i").mkString(" ")
    val rep = Array.fill(5)("r1 r2 r3 r4 r5").mkString(" ") // 25 words, 5-word period
    val df = Seq(
      (0L, a), (1L, b), (2L, a),      // doc 2 is a full copy of doc 0
      (3L, "too short"),              // < 10 words -> zero windows, keep
      (4L, rep)                       // internally repetitive
    ).toDF("doc_id", "text")
    val out = Dedup.windowDupStats(df).orderBy("doc_id").collect()
    // docs 0 and 2: 21 windows each, every one duplicated by the copy
    assert(out(0).getLong(1) === 21L && out(0).getLong(2) === 21L && out(0).getInt(3) === 0)
    assert(out(2).getLong(1) === 21L && out(2).getLong(2) === 21L && out(2).getInt(3) === 0)
    // doc 1: unique text, nothing duplicated
    assert(out(1).getLong(1) === 21L && out(1).getLong(2) === 0L && out(1).getInt(3) === 1)
    // doc 3: below window size -> (0, 0, keep)
    assert(out(3).getLong(1) === 0L && out(3).getLong(2) === 0L && out(3).getInt(3) === 1)
    // doc 4: 16 windows; the 5-word period makes every window recur
    // WITHIN the doc (window i equals window i+5), so all 16 are dups
    assert(out(4).getLong(1) === 16L && out(4).getLong(2) === 16L && out(4).getInt(3) === 0)
  }

  test("cluster collapse: connected components + keeper semantics") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11}, singleton 20 untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val cl = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cl(_) == 1L))
    assert(cl(10L) === 10L && cl(11L) === 10L)

    val corpus = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("doc_id")
    val kept = Dedup.collapseNearDups(corpus, pairs, "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 10L, 20L))
  }

  test("vec_dot: bit-identical to the zip_with+aggregate left fold, in codegen") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{aggregate, zip_with}
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map { _ =>
      (Array.fill(64)((rnd.nextFloat() - 0.5f) * 10f),
        Array.fill(64)((rnd.nextFloat() - 0.5f) * 10f))
    } :+ ((Array.empty[Float], Array.empty[Float]))
    val df = rows.toDF("a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)
    val out = df.select(
      graft.functions.DedupFunctions.vec_dot(col("a"), col("b")).as("fast"),
      hof.as("ref")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
    // double-element arrays take the other element accessor
    val d = Seq((Array(1.5d, -2.25d, 3.0d), Array(0.5d, 4.0d, -1.25d)))
      .toDF("a", "b")
      .select(graft.functions.DedupFunctions.vec_dot(col("a"), col("b")))
      .head().getDouble(0)
    assert(d === 1.5 * 0.5 + -2.25 * 4.0 + 3.0 * -1.25)

    // the null edges the HOF spelling defines: zip_with null-pads a length
    // mismatch and a null element nulls its product; aggregate's + fold
    // then propagates null to the whole sum. vec_dot must match both.
    val edges = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),          // length mismatch
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),    // null element left
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](null, 4.0)),    // null element right
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0))      // clean control
    ).toDF("a", "b")
    val edgeOut = edges.select(
      graft.functions.DedupFunctions.vec_dot(col("a"), col("b")).as("fast"),
      hof.as("ref")).collect()
    edgeOut.take(3).foreach(r => assert(r.isNullAt(0) && r.isNullAt(1)))
    assert(edgeOut(3).getDouble(0) === 11.0 && edgeOut(3).getDouble(1) === 11.0)
  }

  test("IVF ANN: high recall on clustered vectors via probed cells") {
    import spark.implicits._
    val dim = 16
    def member(c: Int, m: Int): Array[Float] = {
      val base = vec(c * 7777, dim)
      val r = new scala.util.Random(c * 100 + m)
      base.map(x => x + (r.nextFloat() - 0.5f) * 0.1f)
    }
    val corpus = (for (c <- 0 until 20; m <- 0 until 20)
      yield ((c * 100 + m).toLong, member(c, m).toSeq)).toDF("vec_id", "embedding")
    val queries = (0 until 20).map(c => ((10000 + c).toLong, member(c, 99).toSeq))
      .toDF("query_id", "embedding")
    val ivf = Similarity.ivfTopK(corpus, queries, k = 5, nlist = 20, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF recall too low on clustered corpus: $recall")
    // determinism: same training sample -> same cells -> same result
    val again = Similarity.ivfTopK(corpus, queries, k = 5, nlist = 20, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === ivf)
  }

  test("minhash/simhash Catalyst expressions equal the kernel and stay in codegen") {
    import spark.implicits._
    import graft.functions.DedupFunctions
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val texts = (0 until 10).map(i => (i.toLong, baseText(i))) :+ (99L, "")
    val df = texts.toDF("id", "text")
    val viaExpr = df.select(col("id"),
      DedupFunctions.minhash_signature(coalesce(col("text"), lit(""))).as("sig"),
      DedupFunctions.simhash64(coalesce(col("text"), lit(""))).as("sh"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1).toArray, r.getLong(2)))).toMap
    texts.foreach { case (id, t) =>
      val (sig, sh) = viaExpr(id)
      assert(sig.sameElements(Dedup.signature(t)), s"sig mismatch id=$id")
      assert(sh === Dedup.simHash64(t), s"simhash mismatch id=$id")
    }
    // whole-stage codegen: the projection line carries the *(n) marker
    // (a parquet scan, not a LocalRelation — Catalyst eagerly evaluates
    // deterministic projections over local data)
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(DedupFunctions.simhash64(col("text")).as("x"),
        DedupFunctions.minhash_signature(col("text")).as("sig"))
      .queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("simhash64")).getOrElse("")
    assert(line.trim.startsWith("*("), s"expression outside codegen:\n$plan")
  }

  test("embedding near-dup: bucketed pairs recover planted scaled duplicates exactly") {
    import spark.implicits._
    def vec(seed: Int): Array[Double] = {
      val r = new scala.util.Random(seed)
      Array.fill(64)(r.nextGaussian())
    }
    val base = (0 until 40).map(i => (i.toLong, vec(i).toSeq))
    val planted = (0 until 8).map(i => (1000L + i, vec(i).map(_ * 2.0).toSeq))
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding",
      threshold = 0.999, bits = 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 8).map(i => (i.toLong, 1000L + i)).toSet
    assert(pairs === expected, s"got $pairs")
  }

  test("LSH bucket cap is not silent: degenerate corpus fires the drop counter") {
    import spark.implicits._
    val same = baseText(7)
    val df = (0 until 100).map(i => (i.toLong, same)).toDF("doc_id", "text")
    val (pairs, dropped) = Dedup.nearDupPairsCounted(df, "doc_id", "text",
      threshold = 0.6, maxBucket = 8)
    val n = pairs.count() // the action that drives the accumulator
    assert(n > 0)
    assert(dropped.value > 0, "identical corpus must overflow the bucket cap loudly")
  }

  test("confirmPairs: distributed exact-Jaccard verification of candidates") {
    import spark.implicits._
    val docs = ((0 until 20).map(i => (i.toLong, baseText(i))) :+
      (1000L, mutate(baseText(0), 3, 1)) :+ (1001L, mutate(baseText(1), 60, 2)))
      .toDF("doc_id", "text")
    // candidates: a true near-dup, a heavily-mutated pair, an unrelated pair
    val cands = Seq((0L, 1000L), (1L, 1001L), (2L, 3L)).toDF("id_a", "id_b")
    val confirmed = Dedup.confirmPairs(cands, docs, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(confirmed === Set((0L, 1000L)), s"got $confirmed")
  }

  test("distributed CC (large-star/small-star) handles deep chains and matches union-find") {
    import spark.implicits._
    // diameter-40 path (the old fixed-10-iteration label propagation would
    // silently split this), plus a second component and reversed edges
    val chain = (0L until 40L).map(i => (i, i + 1))
    val other = Seq((100L, 101L), (102L, 101L), (103L, 100L))
    val edges = spark.createDataset(chain ++ other).toDF("u", "v")
    val labels = Dedup.largeSmallStar(edges, maxRounds = 25)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 40L).forall(labels(_) == 0L), s"chain split: $labels")
    assert(Seq(100L, 101L, 102L, 103L).forall(labels(_) == 100L))

    // driver union-find agrees on the same graph
    val uf = Dedup.unionFindMinLabel((chain ++ other).toArray).toMap
    assert(uf === labels)

    // the public API picks the driver path for small edge sets and yields
    // identical labels
    val viaClusters = Dedup.clusters(
      edges.select(col("u").as("id_a"), col("v").as("id_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaClusters === labels)
  }

  // ------------------------------------------------------------- simhash
  test("simhash: identity, locality, and pair detection") {
    val t = baseText(3)
    assert(Dedup.simHash64(t) === Dedup.simHash64(t))
    assert(Dedup.hamming64(Dedup.simHash64(t), Dedup.simHash64(t)) === 0)
    val near = Dedup.hamming64(Dedup.simHash64(t), Dedup.simHash64(mutate(t, 2, 4)))
    val far = Dedup.hamming64(Dedup.simHash64(t), Dedup.simHash64(baseText(99)))
    assert(near < far)
    import spark.implicits._
    val df = Seq((1L, t), (2L, mutate(t, 1, 5)), (3L, baseText(50))).toDF("doc_id", "text")
    val pairs = Dedup.simHashPairs(df, "doc_id", "text", maxHamming = 6).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!pairs.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  // ------------------------------------------------------------- similarity
  private def vec(i: Int, dim: Int): Array[Float] = {
    val r = new scala.util.Random(i)
    Array.fill(dim)(r.nextFloat() - 0.5f)
  }
  private def cosineLocal(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb) + 1e-12)
  }

  test("brute-force cosine top-k matches local computation exactly") {
    import spark.implicits._
    val dim = 16
    val corpus = (0 until 200).map(i => (i.toLong, vec(i, dim))).toDF("vec_id", "embedding")
    val queries = Seq((0L, vec(0, dim)), (7L, vec(7, dim))).toDF("query_id", "embedding")
    val got = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // local oracle
    val vecs = (0 until 200).map(i => i.toLong -> vec(i, dim)).toMap
    val expected = Seq(0L, 7L).flatMap { q =>
      vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cosineLocal(vecs(q), v)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(5).zipWithIndex
        .map { case ((id, _), rank) => (q, id, rank + 1) }
    }.toSet
    assert(got === expected)
  }

  test("LSH ANN: reasonable recall on clustered vectors, far less work") {
    import spark.implicits._
    val dim = 16
    // clustered corpus: 20 clusters x 20 members
    def member(c: Int, m: Int): Array[Float] = {
      val base = vec(c * 7777, dim)
      val r = new scala.util.Random(c * 100 + m)
      base.map(x => x + (r.nextFloat() - 0.5f) * 0.1f)
    }
    val corpus = (for (c <- 0 until 20; m <- 0 until 20)
      yield ((c * 20 + m).toLong, member(c, m))).toDF("vec_id", "embedding")
    val queries = (0 until 5).map(c => (c.toLong * 20, member(c, 0))).toDF("query_id", "embedding")
    val brute = Similarity.bruteForceTopK(corpus, queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.lshTopK(corpus, queries, 10, bits = 6, dim = dim, probes = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(ann.contains).toDouble / brute.size
    assert(recall >= 0.5, s"ANN recall too low: $recall")
  }

  // ------------------------------------------------------------- multimodal
  test("media batch: all-real-format corpus, corrupt detection, batch features") {
    import spark.implicits._
    assert(!Multimodal.decodeMedia(Array[Byte](1, 2, 3)).valid)
    assert(!Multimodal.decodeMedia(null).valid)

    val rows = (0 until 200).map(i => Multimodal.mediaRow(i.toLong))
    val df = rows.toDF("media_id", "bytes")
    val feats = Multimodal.extractFeatures(df).collect()
    assert(feats.length === 200)
    val byValid = feats.groupBy(_.getStruct(1).getBoolean(6))
    assert(byValid(true).length > 100)  // ~3/4 valid
    assert(byValid(false).length > 20)  // ~1/4 corrupt, handled not thrown
    // video rows sample real frame offsets
    val videos = feats.filter(_.getStruct(1).getString(0) == "video")
    assert(videos.nonEmpty && videos.forall(_.getSeq[Long](4).nonEmpty))
  }

  test("AVI decode: real container round-trip, frame offsets, truncation, fuzz") {
    // 5x3 24-bit, 7 frames at 5 fps: stride = 16, frame = 48 bytes
    val avi = Multimodal.encodeAvi(5, 3, 7, 200000, "videocontent".getBytes)
    val m = Multimodal.decodeAvi(avi)
    assert(m === Multimodal.MediaMeta("video", 5, 3, 3, 1400L, 7L * 48, valid = true))
    assert(Multimodal.decodeMedia(avi) === m) // sniffed via RIFF form type
    // 1400 ms sampled at 1000 ms -> frames 0 and 5; each returned offset
    // must point at pixel data directly after a '00db' chunk header
    val offs = Multimodal.aviFrameOffsets(avi, 1000L)
    assert(offs.length === 2 && offs.distinct.length === 2)
    offs.foreach { o =>
      assert(o >= 12 && o + 48 <= avi.length)
      assert(avi(o.toInt - 8) == '0' && avi(o.toInt - 7) == '0' &&
        avi(o.toInt - 6) == 'd' && avi(o.toInt - 5) == 'b')
    }
    // compressed stream (biCompression != 0 in strf) rejected
    val comp = avi.clone(); comp(188) = 1
    assert(!Multimodal.decodeAvi(comp).valid)
    // truncation mid-movi: headers intact, payload clamps to real chunks
    val cut = Multimodal.decodeAvi(avi.take(avi.length - 40))
    assert(cut.valid && cut.payload_bytes === 7L * 48 - 40)
    // truncation before movi: no frame data -> invalid
    assert(!Multimodal.decodeAvi(avi.take(150)).valid)
    val rnd = new scala.util.Random(13)
    (1 to 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(300))(rnd.nextInt.toByte)
      if (junk.length >= 12) {
        junk(0) = 'R'; junk(1) = 'I'; junk(2) = 'F'; junk(3) = 'F'
        junk(8) = 'A'; junk(9) = 'V'; junk(10) = 'I'; junk(11) = ' '
      }
      Multimodal.decodeMedia(junk) // must not throw
    }
  }

  test("BMP decode: real geometry round-trip, stride padding, truncation, fuzz") {
    // 5x3 24-bit: stride = ceil(15/4)*4 = 16, pixel array = 48
    val bmp = Multimodal.encodeBmp(5, 3, "pixelcontent".getBytes)
    val m = Multimodal.decodeBmp(bmp)
    assert(m === Multimodal.MediaMeta("image", 5, 3, 3, 0L, 48L, valid = true))
    assert(Multimodal.decodeMedia(bmp) === m) // sniffed by magic
    // truncated pixel array -> invalid, never throws
    assert(!Multimodal.decodeBmp(bmp.take(bmp.length - 10)).valid)
    assert(!Multimodal.decodeBmp(bmp.take(20)).valid)
    // compressed (BI_RLE8) rejected
    val rle = bmp.clone(); rle(30) = 1
    assert(!Multimodal.decodeBmp(rle).valid)
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(300))(rnd.nextInt.toByte)
      if (junk.length >= 2) { junk(0) = 'B'; junk(1) = 'M' }
      Multimodal.decodeMedia(junk) // must not throw
    }
  }

  test("WAV decode: PCM geometry round-trip, exact duration, fuzz") {
    // 2ch 16-bit 8kHz, 4000 samples = exactly 500 ms, data 16000 bytes
    val wav = Multimodal.encodeWav(2, 8000, 4000, "audiocontent".getBytes)
    val m = Multimodal.decodeWav(wav)
    assert(m === Multimodal.MediaMeta("audio", 0, 0, 2, 500L, 16000L, valid = true))
    assert(Multimodal.decodeMedia(wav) === m)
    // data chunk truncated by the blob: reported length clamps, stays valid
    val cut = Multimodal.decodeWav(wav.take(wav.length - 400))
    assert(cut.valid && cut.payload_bytes === 15600L)
    assert(!Multimodal.decodeWav(wav.take(30)).valid)
    // non-PCM format code rejected
    val alaw = wav.clone(); alaw(20) = 6
    assert(!Multimodal.decodeWav(alaw).valid)
    val rnd = new scala.util.Random(12)
    (1 to 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(300))(rnd.nextInt.toByte)
      if (junk.length >= 4) { junk(0) = 'R'; junk(1) = 'I'; junk(2) = 'F'; junk(3) = 'F' }
      Multimodal.decodeMedia(junk) // must not throw
    }
  }

  test("bloom anti-join: row-identical to plain left_anti, any filter size") {
    import spark.implicits._
    // pages with DUPLICATE keys (multiplicity must survive) + a done set
    val pages = ((0L until 400L) ++ (0L until 400L by 5)).map(i => (i, s"body-$i"))
      .toDF("doc_id", "body")
    val done = (0L until 400L by 3).toDF("doc_id")
    val expected = pages.join(done, Seq("doc_id"), "left_anti")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    // well-sized filter
    val got = BloomResume.bloomAntiJoin(pages, done, "doc_id", expectedDone = 200L)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got === expected)
    // absurdly undersized filter (64 bits for 134 keys -> ~everything is a
    // false positive): result must STILL be exact, only the pruning degrades
    val tiny = BloomResume.bloomAntiJoin(pages, done, "doc_id",
      expectedDone = 200L, numBits = 64L)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(tiny === expected)
    // the membership probe really fires: a fresh bloom over done admits
    // every done key (no false negatives, the exactness precondition)
    val bloom = BloomResume.buildBloom(done, "doc_id", 200L)
    val admitted = done.filter(BloomResume.mightContain(bloom, col("doc_id"))).count()
    assert(admitted === done.count())
    // EMPTY done-set (first pipeline run): everything is new, still exact
    val emptyDone = spark.range(0).toDF("doc_id")
    val freshRun = BloomResume.bloomAntiJoin(pages, emptyDone, "doc_id", 10L)
    assert(freshRun.count() === pages.count())
  }

  test("PNG defilter: every RFC 2083 filter type reconstructs the original pixels") {
    val content = "defilter roundtrip content 0123456789".getBytes
    for (ft <- 0 to 4; colorType <- Seq(0, 2)) {
      val w = 11; val h = 6
      val channels = if (colorType == 2) 3 else 1
      val expected = Array.tabulate(w * channels * h)(i => content(i % content.length))
      val (meta, px) = Multimodal.decodePngPixels(
        Multimodal.encodePng(w, h, colorType, content, filterType = ft))
      assert(meta.valid, s"filter $ft colorType $colorType must decode valid")
      assert(px != null && java.util.Arrays.equals(px, expected),
        s"filter $ft colorType $colorType pixels differ")
      // the filtered stream itself must differ from the pixels for ft > 0
      // (otherwise the encoder never really filtered and this test is vacuous)
      if (ft > 0) {
        val m2 = Multimodal.decodePngPixels(
          Multimodal.encodePng(w, h, colorType, content, filterType = 0))
        assert(java.util.Arrays.equals(m2._2, px), "same pixels via filter 0")
      }
    }
    // a filter byte outside 0..4 reads invalid even when the zlib stream
    // itself is intact: patch the raw scanlines and re-deflate (valid adler)
    val png0 = Multimodal.encodePng(4, 3, 0, content)
    val raw0 = {
      var off = 8 + 25
      var idat: Array[Byte] = null
      while (idat == null) {
        val len = ((png0(off) & 0xFF) << 24) | ((png0(off + 1) & 0xFF) << 16) |
          ((png0(off + 2) & 0xFF) << 8) | (png0(off + 3) & 0xFF)
        if (new String(png0, off + 4, 4, "US-ASCII") == "IDAT")
          idat = java.util.Arrays.copyOfRange(png0, off + 8, off + 8 + len)
        off += 12 + len
      }
      graft.kernel.pdf.PdfParser.inflate(idat).get
    }
    raw0(0) = 9 // first scanline's filter byte
    val d = new java.util.zip.Deflater()
    d.setInput(raw0); d.finish()
    val comp = new Array[Byte](raw0.length + 64)
    val n = d.deflate(comp); d.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    out.write(java.util.Arrays.copyOfRange(png0, 8, 8 + 25))
    out.write(java.nio.ByteBuffer.allocate(8).putInt(n).put("IDAT".getBytes, 0, 4).array())
    out.write(comp, 0, n); out.write(new Array[Byte](4))
    out.write(java.nio.ByteBuffer.allocate(8).putInt(0).put("IEND".getBytes, 0, 4).array())
    out.write(new Array[Byte](4))
    assert(!Multimodal.decodePng(out.toByteArray).valid, "filter byte 9 must be invalid")
  }

  test("PNG decode: IHDR geometry, real IDAT inflate, corruption, fuzz") {
    // 7x5 RGB: rowBytes = 21, scanlines = 5 * (1 + 21) = 110
    val png = Multimodal.encodePng(7, 5, 2, "pngcontent".getBytes)
    val m = Multimodal.decodePng(png)
    assert(m === Multimodal.MediaMeta("image", 7, 5, 3, 0L, 110L, valid = true))
    assert(Multimodal.decodeMedia(png) === m) // sniffed by magic
    // greyscale: rowBytes = width
    val grey = Multimodal.decodePng(Multimodal.encodePng(9, 4, 0, Array.emptyByteArray))
    assert(grey === Multimodal.MediaMeta("image", 9, 4, 1, 0L, 40L, valid = true))
    // a blob bigger than one stored deflate block (> 65535 raw bytes)
    val big = Multimodal.decodePng(Multimodal.encodePng(200, 150, 2, "x".getBytes))
    assert(big.valid && big.payload_bytes === 150L * (1 + 600))
    // the JDK's own encoder must also decode: a dynamic-huffman zlib IDAT
    // (proves the decoder reads real deflate, not just our stored blocks)
    // -- re-deflate our raw scanlines with default compression
    val raw = graft.kernel.pdf.PdfParser.inflate {
      // slice the IDAT data back out of our own png: chunk walk
      var off = 8 + 25
      var idat: Array[Byte] = null
      while (idat == null) {
        val len = ((png(off) & 0xFF) << 24) | ((png(off + 1) & 0xFF) << 16) |
          ((png(off + 2) & 0xFF) << 8) | (png(off + 3) & 0xFF)
        val tag = new String(png, off + 4, 4, "US-ASCII")
        if (tag == "IDAT") idat = java.util.Arrays.copyOfRange(png, off + 8, off + 8 + len)
        off += 12 + len
      }
      idat
    }.get
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val comp = new Array[Byte](raw.length + 64)
    val n = d.deflate(comp)
    d.end()
    val ihdr = java.util.Arrays.copyOfRange(png, 8, 8 + 25)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    out.write(ihdr)
    val bb = java.nio.ByteBuffer.allocate(8).putInt(n).put("IDAT".getBytes, 0, 4)
    out.write(bb.array()); out.write(comp, 0, n); out.write(new Array[Byte](4)) // CRC unchecked
    out.write(java.nio.ByteBuffer.allocate(8).putInt(0).put("IEND".getBytes, 0, 4).array())
    out.write(new Array[Byte](4))
    val rezipped = Multimodal.decodePng(out.toByteArray)
    assert(rezipped.valid && rezipped.payload_bytes === 110L)
    // corrupt deflate data -> invalid (the inflate really runs)
    val bad = png.clone()
    bad(8 + 25 + 8 + 3) = (bad(8 + 25 + 8 + 3) ^ 0x5A).toByte
    assert(!Multimodal.decodePng(bad).valid)
    // lying IHDR (claims a different height) -> inflate size mismatch -> invalid
    val lying = png.clone(); lying(23) = 9 // height low byte
    assert(!Multimodal.decodePng(lying).valid)
    // truncation and fuzz never throw
    assert(!Multimodal.decodePng(png.take(30)).valid)
    assert(!Multimodal.decodePng(png.take(png.length - 14)).valid) // IEND gone
    val rnd = new scala.util.Random(13)
    (1 to 200).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(300))(rnd.nextInt.toByte)
      if (junk.length >= 2) { junk(0) = 0x89.toByte; junk(1) = 'P' }
      Multimodal.decodeMedia(junk) // must not throw
    }
  }
}
