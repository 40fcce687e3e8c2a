package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization over an event stream — the standard web
 * analytics operator the reference's single-file worker has no analog
 * for (it processes documents one at a time, /root/reference/src/app.py;
 * a crawl pipeline needs the per-user/session view the moment events
 * flow next to documents).
 *
 * Semantics: events of one user belong to the same session while the
 * gap to the previous event is <= gapUs microseconds (default 30 min);
 * a larger gap starts a new session. Timestamps compare as integer
 * epoch-microseconds (exact, engine-portable — never float seconds),
 * and ties order by the event id so the lag() frame is deterministic.
 *
 * Scale notes (100 TB of events):
 *  - sessionStats: ONE shuffle total — the window partitions by user; the
 *    per-session aggregation that follows groups by (user, session_idx),
 *    which a hash-partitioning on user already clusters — Spark's
 *    EnsureRequirements adds no second exchange (pinned in the spec).
 *  - A pathologically hot user serializes sessionStats into one
 *    partition. sessionStatsSkewAware is the standard mitigation:
 *    pre-split by (user, time-bucket), sessionize locally, merge boundary
 *    sessions — EXACTLY equivalent output (proof in its scaladoc), at the
 *    price of a second (tiny, session-level) shuffle.
 *  - Everything is built-in window/agg expressions — no UDF, no
 *    mapGroups, partial aggregation stays map-side.
 */
object Sessionize {

  /** Per-event session assignment: (idCol, userCol, ts_us, session_idx)
    * where session_idx numbers a user's sessions from 1 in time order. */
  def assign(df: DataFrame, userCol: String = "user_id",
             tsCol: String = "ts", idCol: String = "event_id",
             gapUs: Long = 1800L * 1000000L): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col("ts_us"), col(idCol))
    // parquet TIMESTAMP_NTZ needs the cast; with the session timezone
    // pinned to UTC the NTZ->instant interpretation matches DuckDB's
    // epoch_us over the same naive value
    df.select(col(idCol), col(userCol),
        unix_micros(col(tsCol).cast("timestamp")).as("ts_us"))
      .withColumn("new_s",
        when(lag(col("ts_us"), 1).over(w).isNull ||
          col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("session_idx",
        sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .drop("new_s")
  }

  /** Per-session rollup: event count, start/end/duration in integer
    * microseconds. Exactly one shuffle (see scaladoc above). */
  def sessionStats(df: DataFrame, userCol: String = "user_id",
                   tsCol: String = "ts", idCol: String = "event_id",
                   gapUs: Long = 1800L * 1000000L): DataFrame =
    assign(df, userCol, tsCol, idCol, gapUs)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))

  /**
   * sessionStats with explicit hot-user skew handling: events pre-split by
   * (user, time-bucket) so one user's stream parallelizes across buckets,
   * sessionized locally per bucket, then boundary sessions merge in a
   * second, SESSION-level pass (orders of magnitude fewer rows than
   * events — the expensive event shuffle never keys on user alone).
   *
   * EXACTLY equivalent to sessionStats, for any bucketUs > 0:
   *  - time buckets partition the timeline, so a user's local sessions
   *    ordered by start time are its event stream segmented in order, and
   *    the last event of one local session is globally ADJACENT to the
   *    first event of the next;
   *  - therefore merging consecutive local sessions when
   *    `start - prev_end <= gapUs` applies the gap rule to exactly the
   *    event pairs the bucket boundaries severed — two local sessions in
   *    the SAME bucket already satisfy start - prev_end > gapUs (that is
   *    why they split), so the merge can only rejoin boundary cuts;
   *  - session numbering by merged start order equals event-order
   *    numbering (two sessions of one user cannot share a start
   *    microsecond: equal timestamps always share a session).
   *
   * Two shuffles: events on (user, bucket) — hot keys fan out — and local
   * sessions on (user). The equivalence (plain == skew-aware, row for
   * row) and the fan-out histogram are pinned in SessionizeSpec; the
   * driver's q_sessionize oracle certifies this path hash-exactly.
   */
  def sessionStatsSkewAware(df: DataFrame, userCol: String = "user_id",
                            tsCol: String = "ts", idCol: String = "event_id",
                            gapUs: Long = 1800L * 1000000L,
                            bucketUs: Long = 6L * 3600L * 1000000L): DataFrame = {
    // stage 1: local sessionization within (user, time-bucket)
    val wb = Window.partitionBy(col(userCol), col("bucket"))
      .orderBy(col("ts_us"), col(idCol))
    val local = df.select(col(idCol), col(userCol),
        unix_micros(col(tsCol).cast("timestamp")).as("ts_us"))
      // integer DIV (exact; a double division could misbucket exact
      // boundary multiples). Truncation toward zero just makes the bucket
      // straddling epoch 0 wider — buckets stay contiguous time intervals,
      // which is all the equivalence proof needs.
      .withColumn("bucket", expr(s"ts_us DIV ${bucketUs}L"))
      .withColumn("new_s",
        when(lag(col("ts_us"), 1).over(wb).isNull ||
          col("ts_us") - lag(col("ts_us"), 1).over(wb) > gapUs, 1).otherwise(0))
      .withColumn("ls",
        sum(col("new_s")).over(
          wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // same-keyed as the window's partitioning: no extra exchange
      .groupBy(col(userCol), col("bucket"), col("ls"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
    // stage 2: merge boundary sessions (session rows only — tiny)
    val wu = Window.partitionBy(col(userCol))
      .orderBy(col("start_us"), col("end_us"))
    local
      .withColumn("new_m",
        when(lag(col("end_us"), 1).over(wu).isNull ||
          col("start_us") - lag(col("end_us"), 1).over(wu) > gapUs, 1).otherwise(0))
      .withColumn("session_idx",
        sum(col("new_m")).over(
          wu.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .groupBy(col(userCol), col("session_idx"))
      .agg(sum(col("n_events")).cast("long").as("n_events"),
        min(col("start_us")).as("start_us"),
        max(col("end_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }
}
