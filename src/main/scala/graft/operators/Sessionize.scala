package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization over an event stream — the standard web
 * analytics operator the reference's single-file worker has no analog
 * for (it processes documents one at a time, /root/reference/src/main.py;
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
 *  - ONE shuffle total: the window partitions by user; the per-session
 *    aggregation that follows groups by (user, session_idx), which a
 *    hash-partitioning on user already clusters — Spark's
 *    EnsureRequirements adds no second exchange (pinned in the spec).
 *  - A pathologically hot user serializes into one partition — the
 *    standard mitigation (pre-split by (user, time-bucket), then merge
 *    boundary sessions) is a documented extension point, not needed for
 *    the user-cardinality profile the events table models.
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
}
