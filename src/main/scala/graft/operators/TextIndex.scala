package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Inverted-index construction over the extracted corpus: per token, its
 * document frequency and a capped, sorted posting list. This is the
 * retrieval-side companion to the extraction pipeline — dedup audits
 * ("which docs share this rare token"), contamination lookups, and
 * quality forensics all start from exactly this table. The reference
 * has no corpus-level view (single-file worker, /root/reference/src/
 * app.py); this is standard equipment for the 100 TB replacement.
 *
 * Scale notes:
 *  - Tokens are deduplicated PER DOCUMENT in the scan projection
 *    (array_distinct before explode), so document frequency is a plain
 *    count and a stopword contributes one row per document, never one
 *    per occurrence.
 *  - The posting cap uses the salted two-stage top-K discipline of
 *    CorpusStats.hostCapStats: stage one ranks within (token, salt)
 *    buckets so a stopword's millions of rows spread over `salts`
 *    window partitions; stage two ranks only the <= salts*k survivors.
 *    No unbounded collect_list ever forms — the only collect_list runs
 *    after the <= k filter.
 *  - Document frequency aggregates with map-side partial combine; the
 *    final join (df ⋈ postings) is keyed on the token both sides, so
 *    the exchange is reused.
 */
object TextIndex {

  /**
   * One row per distinct lowercase whitespace token: (tok, df,
   * top_docs), where df counts documents containing the token and
   * top_docs is the comma-joined ascending list of the k smallest doc
   * ids containing it.
   */
  def invertedIndex(df: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id", k: Int = 10,
                    salts: Int = 16): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val pairs = df.select(col(idCol).as("did"),
      explode(array_distinct(QualityFilters.words(lower(col(textCol)))))
        .as("tok"))
    val dfCounts = pairs.groupBy(col("tok"))
      .agg(count(lit(1)).cast("long").as("df"))
    val w1 = Window
      .partitionBy(col("tok"), pmod(xxhash64(col("did")), lit(salts)))
      .orderBy(col("did"))
    val w2 = Window.partitionBy(col("tok")).orderBy(col("did"))
    val top = pairs
      .withColumn("r1", row_number().over(w1)).filter(col("r1") <= k)
      .withColumn("r2", row_number().over(w2)).filter(col("r2") <= k)
      .groupBy(col("tok"))
      .agg(array_join(
        transform(sort_array(collect_list(col("did"))),
          d => d.cast("string")), ",").as("top_docs"))
    dfCounts.join(top, Seq("tok"))
      .select(col("tok"), col("df"), col("top_docs"))
  }

  /**
   * Integer TF-IDF-lite top-k search over the corpus: score(doc) =
   * Σ_t tf(doc,t) · (N div df(t)) for the query terms t — the idf as a
   * plain integer quotient, so ranking is bit-exact across engines (a
   * float/log idf could not be oracled; the ordering it induces on a
   * query this size is the same). Rare terms dominate exactly as in
   * real BM25-family scoring.
   *
   * Scale notes: the query-term filter is an `isin` on a config-sized
   * list evaluated in the scan projection, so only matching (doc, term)
   * pairs ever leave the scan; tf and df aggregate with map-side
   * combine; N joins in as a broadcast one-row aggregate (never a
   * driver-side collect); the global top-k is Spark's
   * TakeOrderedAndProject — per-partition heads of size k, then one
   * k-sized merge, no full sort. Full tie-break (score DESC, id ASC)
   * keeps the cut deterministic.
   */
  def searchTopK(df: DataFrame, terms: Seq[String], k: Int = 50,
                 textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "searchTopK needs at least one query term")
    val toks = df.select(col(idCol).as("did"),
        explode(QualityFilters.words(lower(col(textCol)))).as("tok"))
      .filter(col("tok").isin(terms: _*))
    val tf = toks.groupBy(col("did"), col("tok"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val dfc = tf.groupBy(col("tok"))
      .agg(count(lit(1)).cast("long").as("df"))
    val n = df.agg(count(lit(1)).cast("long").as("n_total"))
    tf.join(dfc, Seq("tok"))
      .crossJoin(broadcast(n))
      .groupBy(col("did"))
      .agg(sum(expr("tf * (n_total div df)")).cast("long").as("score"))
      .orderBy(col("score").desc, col("did"))
      .limit(k)
      .select(col("did").as(idCol), col("score"))
  }
}
