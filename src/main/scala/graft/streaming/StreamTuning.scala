package graft.streaming

import org.apache.spark.sql.SparkSession

/** Scale-adaptive parallelism for the bounded stream replays (r6, guide
  * §2): each micro-batch of an AvailableNow replay commits one state-store
  * instance PER shuffle partition, so a 100k-row replay at the configured
  * 32 partitions pays splits × 32 near-empty state commits of pure
  * overhead. The clamp derives the stream's shuffle-partition count from
  * the measured replay row count (parquet metadata count of the staged
  * input — no data scan), with the configured count as the ceiling, and
  * restores the session conf afterwards. Results are unchanged: every
  * gated streaming shape is a count/sum/min/dedup/session merge, all
  * partition-count-invariant; production-scale replays exceed the clamp
  * threshold and keep full parallelism.
  */
private[streaming] object StreamTuning {

  def withReplayParallelism[T](spark: SparkSession, stagedPath: String)
                              (body: => T): T = {
    val req = spark.conf.get("spark.sql.shuffle.partitions", "200")
    val rows =
      try spark.read.parquet(stagedPath).count()
      catch { case _: Throwable => Long.MaxValue } // unreadable → no clamp
    val n = graft.engine.Lineage.adaptiveParallelism(rows, req.toInt)
    if (n == req.toInt) body
    else {
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      try body
      finally spark.conf.set("spark.sql.shuffle.partitions", req)
    }
  }
}
