package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming ingestion for a continuously-arriving edge log. LA3 itself is
  * batch-iterative (SURVEY.md §2.9/§2.10 — no streaming surface to match),
  * but a production link-graph pipeline tails an edge log; these operators
  * maintain graph statistics incrementally so the batch engine can be
  * re-run from fresh snapshots:
  *
  *  - [[windowedEdgeCounts]]: tumbling-window edge rates per source with a
  *    watermark (late events beyond the bound are dropped).
  *  - [[runningOutDegrees]]: exact per-vertex degree kept in keyed state
  *    (KeyValueGroupedDataset.mapGroupsWithState) — the streaming analog of
  *    G3, feeding degree-aware planning (hub split thresholds) without a
  *    full rescan.
  */
object EdgeStream {

  final case class EdgeEvent(src: Long, dst: Long, ts: Timestamp)
  final case class VertexDegree(id: Long, outdeg: Long)

  /** Tumbling-window per-source edge counts; watermarked so state is
    * bounded (windows older than the watermark are finalized and evicted).
    */
  def windowedEdgeCounts(edges: DataFrame, windowLen: String = "1 minute",
                         watermark: String = "2 minutes"): DataFrame =
    edges
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("src"))
      .agg(count(lit(1)).as("edges"))
      .select(col("window.start").as("window_start"), col("src"),
        col("edges"))

  /** Exact running out-degree per vertex in keyed state; emits the updated
    * degree for every vertex touched in a micro-batch (Update output mode).
    */
  def runningOutDegrees(events: Dataset[EdgeEvent]): Dataset[VertexDegree] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.src)
      .mapGroupsWithState[Long, VertexDegree](GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[EdgeEvent], state: GroupState[Long]) =>
          val updated = state.getOption.getOrElse(0L) + rows.size
          state.update(updated)
          VertexDegree(id, updated)
      }
  }
}
