package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Embedding similarity search over an `Array[Float]` column, Spark-first:
 *
 *  - cosine is computed with built-in higher-order functions
 *    (zip_with + aggregate), which stay in whole-stage codegen — no UDF;
 *  - brute-force top-k broadcasts the (small) query set against the
 *    (huge) corpus: one scan, zero shuffle of the corpus, per-query top-k
 *    via window over a filtered candidate set;
 *  - the scale path buckets vectors with sign-LSH (random hyperplanes, a
 *    pure projection) so the join touches only same-bucket candidates —
 *    the 100 TB shape: corpus stays partitioned by bucket, queries
 *    broadcast.
 */
object Similarity {

  /** dot(a,b) via zip_with+aggregate (codegen'd, no UDF). Elements are cast
    * to double BEFORE the multiply: float*float would round at float
    * precision and diverge from any double-precision oracle. The aggregate
    * is a sequential left fold — deterministic, engine-reproducible. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b) + lit(1e-12))

  /**
   * Brute-force cosine top-k: every query against every corpus vector.
   * `queries` must be small (it is broadcast). Deterministic ties:
   * (sim desc, vec_id asc).
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     queryIdCol: String = "query_id"): DataFrame = {
    val q = queries.select(col(queryIdCol), col(vecCol).as("q_vec"))
    val joined = corpus.select(col(idCol), col(vecCol))
      .join(broadcast(q), col(idCol) =!= col(queryIdCol)) // exclude self-match
      .withColumn("sim", cosine(col(vecCol), col("q_vec")))
    val w = Window.partitionBy(queryIdCol).orderBy(col("sim").desc, col(idCol))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("rank"), col("sim"))
  }

  /** Deterministic random hyperplanes (splitmix64 gaussians via CLT-sum). */
  def hyperplanes(bits: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    var x = seed
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def unit(): Double = ((next() >>> 11) * 1.1102230246251565e-16) - 0.5
    Array.fill(bits)(Array.fill(dim)((unit() + unit() + unit() + unit()).toFloat))
  }

  /** Sign-LSH bucket id of one vector. */
  def lshBucket(vec: Array[Float], planes: Array[Array[Float]]): Int = {
    var b = 0
    var i = 0
    while (i < planes.length) {
      var s = 0.0f
      val p = planes(i)
      val n = math.min(p.length, vec.length)
      var j = 0
      while (j < n) { s += vec(j) * p(j); j += 1 }
      if (s >= 0) b |= (1 << i)
      i += 1
    }
    b
  }

  /**
   * LSH-bucketed ANN top-k: corpus and queries are bucketed by sign-LSH
   * (a pure codegen'd projection — graft.functions.LshBucket, no UDF, no
   * broadcast variable: hyperplanes regenerate deterministically per
   * executor), then joined bucket-to-bucket. Recall < 1 by design;
   * `probes` extra buckets (hamming-1 flips) trade compute for recall.
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bits: Int = 8, dim: Int = 64, seed: Long = 42L, probes: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding",
              queryIdCol: String = "query_id")
             (implicit spark: SparkSession): DataFrame = {
    import graft.functions.DedupFunctions.{lsh_bucket, lsh_probes}
    val corpusB = corpus.select(col(idCol), col(vecCol))
      .withColumn("bucket", lsh_bucket(col(vecCol), bits, dim, seed))
    // queries probe their own bucket + `probes` single-bit flips
    val q = queries.select(col(queryIdCol), col(vecCol).as("q_vec"))
      .withColumn("bucket", explode(lsh_probes(col("q_vec"), bits, dim, seed, probes)))
    val joined = corpusB.join(broadcast(q), Seq("bucket"))
      .filter(col(idCol) =!= col(queryIdCol))
      .withColumn("sim", cosine(col(vecCol), col("q_vec")))
    val w = Window.partitionBy(queryIdCol).orderBy(col("sim").desc, col(idCol))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("rank"), col("sim"))
  }
}
