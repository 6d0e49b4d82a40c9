package graft

import org.apache.spark.sql.functions._

import graft.events.Sessionize
import graft.text.TextOps

/** Batch sessionization (gap rule, boundary semantics, cent sums) and
  * corpus n-gram counting goldens.
  */
class EventsSpec extends SparkSpec {

  private def eventsDf(rows: Seq[(Long, Long, Long, Double)]) = {
    val s = spark; import s.implicits._
    rows.toDF("event_id", "user_id", "secs", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("secs")).as("ts"), col("value"))
  }

  test("sessions: gap rule with the inclusive session_window boundary") {
    // user 1: 0s, 100s (merge), 20000s (new); user 2: one event.
    // boundary user 3: 0s then EXACTLY gap later -> still ONE session
    // (session_window's boundary is inclusive; only a strictly larger
    // gap splits).
    val ev = eventsDf(Seq(
      (0L, 1L, 0L, 1.0), (1L, 1L, 100L, 2.5), (2L, 1L, 20000L, 4.0),
      (3L, 2L, 50L, 10.0),
      (4L, 3L, 0L, 1.0), (5L, 3L, 10000L, 1.0),
      (6L, 4L, 0L, 1.0), (7L, 4L, 10001L, 1.0)))
    val got = Sessionize.sessions(ev, gapSeconds = 10000L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map(
      (1L, 0L) -> (2L, 350L),          // 100 + 250 cents
      (1L, 20000L * 1000000L) -> (1L, 400L),
      (2L, 50L * 1000000L) -> (1L, 1000L),
      (3L, 0L) -> (2L, 200L),          // exactly-gap event merges
      (4L, 0L) -> (1L, 100L),          // one past the gap splits
      (4L, 10001L * 1000000L) -> (1L, 100L)))
  }

  test("sessions: event count and span preserved") {
    val ev = eventsDf((0L until 20L).map(i => (i, i % 3, i * 3600L, 1.0)))
    val out = Sessionize.sessions(ev, gapSeconds = 14400L)
    assert(out.agg(sum("n_events")).collect()(0).getLong(0) == 20L)
  }

  test("sessionsViaStream replays the batch gap sessions exactly") {
    // 3 users, gaps straddling the 5000 s rule, plus an exact-boundary
    // pair (user 9) pinning the >= semantics across both spellings
    val rows = (0L until 48L).map { i =>
      (i, i % 3, (i / 3) * 1700L + (i % 3) * 37L, (i % 7) * 1.25)
    } ++ Seq((100L, 9L, 0L, 1.0), (101L, 9L, 5000L, 1.0))
    val ev = eventsDf(rows)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val batch = key(Sessionize.sessions(ev, gapSeconds = 5000L))
    val stream = key(graft.streaming.SessionStream
      .sessionsViaStream(ev, gapSeconds = 5000L, splits = 3)
      .select("user_id", "session_start_us", "n_events", "cents"))
    assert(stream == batch)
    assert(batch.size > 2) // non-trivial: multiple sessions actually split
  }

  test("ngramCounts: bigram and trigram goldens, non-distinct") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "x"), (3L, "b a")).toDF("doc_id", "text")
    val bi = TextOps.ngramCounts(docs, 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bi == Map("a b" -> 2L, "b a" -> 2L))
    val tri = TextOps.ngramCounts(docs, 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tri == Map("a b a" -> 1L, "b a b" -> 1L))
  }
}
