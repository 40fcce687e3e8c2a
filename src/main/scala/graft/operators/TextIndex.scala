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
}
