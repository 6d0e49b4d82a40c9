package graft.bench

import org.apache.spark.sql.functions._

import graft.events.Sessionize
import graft.streaming.SessionStream

/** Probe: does the bounded session_window replay FLUSH every session in
  * append mode? Prints per-batch watermark/row progress from the last
  * run plus the batch-vs-stream diff — the evidence trail for the
  * two-sentinel design in [[SessionStream]] (append emission happens in
  * the batch AFTER a watermark advance; a single sentinel leaves the
  * final sessions un-emitted when AvailableNow stops).
  */
object SessionFlushProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.Sessions.local(4, "session-flush-probe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rows = (0L until 48L).map { i =>
      (i, i % 3, (i / 3) * 1700L + (i % 3) * 37L, (i % 7) * 1.25)
    } ++ Seq((100L, 9L, 0L, 1.0), (101L, 9L, 5000L, 1.0))
    val ev = rows.toDF("event_id", "user_id", "secs", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("secs")).as("ts"), col("value"))
    val batch = Sessionize.sessions(ev, gapSeconds = 5000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val stream = SessionStream.sessionsViaStream(ev, gapSeconds = 5000L,
      splits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    SessionStream.lastProgress.foreach(println)
    println(s"batch sessions:  ${batch.size}")
    println(s"stream sessions: ${stream.size}")
    println(s"missing from stream: ${(batch -- stream).toSeq.sorted}")
    println(s"extra in stream:     ${(stream -- batch).toSeq.sorted}")
    println(if (batch == stream) "FLUSH-OK" else "FLUSH-INCOMPLETE")
    spark.stop()
  }
}
