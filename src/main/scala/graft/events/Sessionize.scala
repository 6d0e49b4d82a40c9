package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization of an event log: per-user sessions split where
  * the gap to the previous event EXCEEDS `gapSeconds` — exactly the
  * merge rule of Spark's streaming `session_window(ts, gap)` (an event
  * at ts ≤ previous+gap merges; the boundary is INCLUSIVE, pinned by
  * EventsSpec's exact-gap pair), so the batch and streaming spellings
  * agree row-for-row and [[graft.streaming.SessionStream]] shares this
  * query's oracle.
  *
  * Engine-agnostic output: session_start in epoch MICROSECONDS (exact
  * BIGINT both engines under a UTC session), event counts, and value
  * summed in integer cents (round(v·100) per event — float sums never
  * cross the oracle; the stream_window_counts discipline).
  *
  * Scale shape: one hash-partition by user_id carries both the lag and
  * the running session-id sum — no global window anywhere; per-partition
  * memory is bounded by one user's events (skew = a power user, the
  * usual salting candidate if one key dominates). The final per-session
  * aggregate reuses the same partitioning.
  */
object Sessionize {

  def sessions(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      // parquet timestamps read as NTZ in Spark 4; the UTC session makes
      // the LTZ cast the identity instant, matching DuckDB's epoch_us
      .withColumn("us", expr("unix_micros(cast(ts as timestamp))"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(cum))
    marked.groupBy("user_id", "sid")
      .agg(min(col("us")).as("session_start_us"),
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      .select("user_id", "session_start_us", "n_events", "cents")
  }

  /** Per-event session assignment — the [[sessions]] gap marking with the
    * event payload kept: the input shape for session-scoped analyses
    * (session funnel, per-session paths). Output
    * (user_id, sid, event_id, event_type, us).
    */
  def withSessionIds(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("us", expr("unix_micros(cast(ts as timestamp))"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(cum))
      .select("user_id", "sid", "event_id", "event_type", "us")
  }
}
