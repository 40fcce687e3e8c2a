package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/**
 * Sequence-packing planner: assign every document a global start offset
 * in the concatenated id-ordered token/char stream and the training-bin
 * it starts in (bin byte/token budget `binSize`). This is the planning
 * pass a pre-training data build runs before writing packed sequences —
 * the reference processes one file at a time and has no notion of a
 * corpus-wide order at all (`/root/reference/src/app.py` drains a queue
 * one message per document).
 *
 * Semantics (the oracle spec): docs ordered by `idCol`;
 * `start_offset = exclusive prefix sum of costCol`;
 * `bin = start_offset DIV binSize` — contiguous greedy packing where a
 * document belongs to the bin its first token lands in (straddlers stay
 * with their start bin, the packer's usual choice so no doc is split
 * across plan rows).
 *
 * Scale shape (100 TB): a prefix sum spelled as one global
 * `Window.orderBy(id)` serializes the corpus onto a single task — the
 * classic accidental driver-equivalent. This is the two-phase
 * distributed prefix sum instead:
 *   1. one cheap aggregate finds (min, max) of `idCol` (two longs to the
 *      driver);
 *   2. rows map to `nBuckets` contiguous id ranges (monotone in id by
 *      construction), and a groupBy(bucket) computes per-bucket cost
 *      totals — at most `nBuckets` tiny rows collect to the driver
 *      (BOUNDED by the parameter, default 64; same documented-bounded
 *      discipline as the IVF training sample);
 *   3. the driver turns bucket totals into exclusive bucket offsets,
 *      broadcast-joins them back, and a window partitioned BY BUCKET
 *      computes the local exclusive prefix — every partition sums only
 *      its own range, all `nBuckets` run in parallel.
 * Only (id, cost) pairs shuffle; text never moves.
 *
 * Output: (idCol, costCol, start_offset, bin), one row per input row.
 */
object Packing {

  def packStats(df: DataFrame, idCol: String = "doc_id",
                costCol: String = "n_chars", binSize: Long = 20000L,
                nBuckets: Int = 64): DataFrame = {
    require(binSize >= 1, s"binSize must be >= 1, got $binSize")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window

    val slim = df.select(col(idCol).cast("long").as(idCol),
      col(costCol).cast("long").as(costCol))

    // Phase 1: id range (two longs to the driver — bounded by definition).
    val bounds = slim.agg(min(col(idCol)).as("lo"), max(col(idCol)).as("hi"))
      .collect()
    val (lo, hi) = bounds.headOption match {
      case Some(r) if !r.isNullAt(0) => (r.getLong(0), r.getLong(1))
      case _ =>
        return slim.withColumn("start_offset", lit(0L))
          .withColumn("bin", lit(0L)).limit(0)
    }
    // Bucket width >= 1; bucket index is monotone non-decreasing in id, so
    // concatenating buckets in index order IS the global id order.
    val width = math.max(1L, (hi - lo) / nBuckets + 1L)
    val bucket = ((col(idCol) - lit(lo)) / lit(width)).cast("long")
    val bucketed = slim.withColumn("_bkt", bucket)

    // Phase 2: per-bucket totals — at most nBuckets rows (bounded collect).
    val totals = bucketed.groupBy(col("_bkt"))
      .agg(sum(col(costCol)).as("tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (b, tot) =>
      val off = acc; acc += tot; (b, off)
    }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("_bkt", "_bktOff")

    // Phase 3: local exclusive prefix inside each bucket + bucket offset.
    val w = Window.partitionBy(col("_bkt")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(F.broadcast(offDf), Seq("_bkt"))
      .withColumn("start_offset",
        coalesce(sum(col(costCol)).over(w), lit(0L)) + col("_bktOff"))
      .withColumn("bin", expr(s"start_offset div ${binSize}L"))
      .select(col(idCol), col(costCol), col("start_offset"), col("bin"))
  }
}
