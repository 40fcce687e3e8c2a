package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/**
 * Bloom-pruned EXACT anti-join — the resume pattern that survives a
 * 100 TB done-set.
 *
 * The plain resume anti-join (`pages LEFT ANTI done`,
 * pipeline/Extract.scala) is correct at any scale, but when the done-set
 * outgrows broadcast range Catalyst falls back to a sort-merge anti join
 * that SHUFFLES the fat page rows (url + html) in full — on an
 * incremental crawl where 95%+ of pages are genuinely new, almost all of
 * that exchange is wasted motion. This operator keeps the join exact
 * while making the fat exchange disappear:
 *
 *   1. build a Bloom filter over the done keys (distributed aggregate;
 *      the filter itself is a few MB and rides the plan as a literal,
 *      exactly how Spark's own InjectRuntimeFilter ships its filters);
 *   2. scan ONLY the key column of pages and keep bloom HITS — the
 *      done rows plus an fpp-bounded sliver of false positives (a Bloom
 *      filter has no false negatives, so no done row can escape);
 *   3. exact LEFT SEMI against done (shuffles keys only) — false
 *      positives die here;
 *   4. LEFT ANTI of the fat pages against that small verified key set —
 *      AQE broadcasts it, so the fat side is never exchanged at all.
 *
 * Exactness: step 3's output is precisely keys(pages) ∩ keys(done), so
 * step 4 removes exactly the done rows — row-identical to the plain
 * anti-join, any fpp, any filter size. An undersized filter only grows
 * the semi-join input, never the result.
 *
 * Spark's InjectRuntimeFilter cannot do this for us: runtime filters
 * prune the PROBE side of inner/semi joins, but an anti-join's probe
 * negatives ARE the output, so they must not be pre-filtered — hence the
 * explicit two-phase shape (key-only scan for the membership probe, fat
 * scan joined against verified keys).
 *
 * The bloom expressions are Spark's own codegen'd
 * BloomFilterAggregate / BloomFilterMightContain (internal — reached via
 * the graftbridge, same idiom as our other native expressions).
 */
object BloomResume {

  /** Serialized Bloom filter over xxhash64(keyCol) of `done`.
    * numBits defaults to ~10 bits/key (fpp ≈ 1%), capped at 2^26 bits
    * (8 MB — the same ceiling Spark's runtime filters use); an
    * over-full filter degrades fpp, never correctness. */
  def buildBloom(done: DataFrame, keyCol: String, expectedItems: Long,
                 numBits: Long = -1L): Array[Byte] = {
    val bits = if (numBits > 0) numBits
      else math.min(math.max(expectedItems, 1L) * 10L, 1L << 26)
    val agg = ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(keyCol))),
      Literal(math.max(expectedItems, 1L)), Literal(bits)).toAggregateExpression())
    done.agg(agg.as("bf")).head.getAs[Array[Byte]](0)
  }

  /** `might_contain(bloom, xxhash64(keyCol))` as a codegen predicate. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom), ColumnBridge.expression(xxhash64(key))))

  /**
   * Row-identical to `pages.join(done.select(keyCol), Seq(keyCol),
   * "left_anti")` with the fat-exchange-free plan described above.
   */
  def bloomAntiJoin(pages: DataFrame, done: DataFrame, keyCol: String,
                    expectedDone: Long, numBits: Long = -1L): DataFrame = {
    val bloom = buildBloom(done, keyCol, expectedDone, numBits)
    // key-only scan: column pruning reaches the source, the fat columns
    // are never read on this branch
    val candidates = pages.select(col(keyCol))
      .filter(mightContain(bloom, col(keyCol)))
    // exact verification — false positives die here; shuffles keys only
    val seenKeys = candidates.join(done.select(col(keyCol)), Seq(keyCol), "left_semi")
    // the fat side joins a small verified key set (AQE broadcasts it)
    pages.join(seenKeys, Seq(keyCol), "left_anti")
  }
}
