package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EdgeStream
import graft.streaming.EdgeStream.{EdgeEvent, VertexDegree}

/** Structured Streaming operators driven through MemoryStream micro-batches. */
class EdgeStreamSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("runningOutDegrees accumulates keyed state across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[EdgeEvent]
    val q = EdgeStream.runningOutDegrees(input.toDS())
      .writeStream.format("memory").queryName("degrees")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(EdgeEvent(1L, 2L, ts(1)), EdgeEvent(1L, 3L, ts(2)),
        EdgeEvent(2L, 3L, ts(3)))
      q.processAllAvailable()
      val batch1 = s.table("degrees").as[VertexDegree].collect()
        .map(d => d.id -> d.outdeg).toMap
      assert(batch1 === Map(1L -> 2L, 2L -> 1L))

      input.addData(EdgeEvent(1L, 4L, ts(4)))
      q.processAllAvailable()
      val all = s.table("degrees").as[VertexDegree].collect()
        .groupBy(_.id).map { case (k, v) => k -> v.map(_.outdeg).max }
      assert(all === Map(1L -> 3L, 2L -> 1L)) // state carried: 2+1 edges
    } finally q.stop()
  }

  test("windowedEdgeCounts groups into tumbling windows with watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[EdgeEvent]
    val q = EdgeStream.windowedEdgeCounts(input.toDF(), "1 minute",
        "2 minutes")
      .writeStream.format("memory").queryName("wincounts")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(EdgeEvent(1L, 2L, ts(10)), EdgeEvent(1L, 3L, ts(20)),
        EdgeEvent(1L, 9L, ts(70)), EdgeEvent(5L, 1L, ts(75)))
      q.processAllAvailable()
      val rows = s.table("wincounts").collect()
        .map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(1),
          r.getLong(2))).toSet
      assert(rows === Set((0L, 1L, 2L), (60L, 1L, 1L), (60L, 5L, 1L)))
    } finally q.stop()
  }

  test("windowedCountsViaStream final state ≡ batch groupBy") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val events = (0 until 500).map { i =>
      (ts(i * 37L), if (i % 3 == 0) "click" else "view", i * 0.07 + 0.005)
    }.toDF("ts", "event_type", "value")
    val got = EdgeStream.windowedCountsViaStream(events, splits = 3)
      .orderBy("hour_bucket", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val exp = events
      .groupBy((unix_timestamp(col("ts")).divide(3600)).cast("long")
          .as("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      .orderBy("hour_bucket", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty && got.toSeq === exp.toSeq)
  }
}
