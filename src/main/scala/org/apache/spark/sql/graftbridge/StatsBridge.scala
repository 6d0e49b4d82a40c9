package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Clamp the plan-size estimate a checkpointed frame carries.
  *
  * `Dataset.localCheckpoint` truncates the LOGICAL plan (LogicalRDD leaf)
  * but hands the new leaf the ORIGIN plan's computed `Statistics` — and in
  * an iterative kernel the origin plan of round r+1 contains joins over
  * round r's leaf, whose sizeInBytes estimates MULTIPLY. The estimate's
  * bit-length therefore doubles per round (measured: 34 → 75 → … →
  * 2.8e8 bits by sweep round 8 of the SCC chain spec), and Catalyst's
  * stats visitor ends up doing megabit BigInteger multiplications on every
  * plan — 100+ seconds of pure planning per round. Any loop kernel pays
  * this; short loops (≤ ~15 materializations) just never noticed.
  *
  * The fix: after each checkpoint, rebuild the LogicalRDD with its stats
  * clamped to Long.MaxValue (any estimate beyond that is already
  * meaningless — it exceeds addressable storage). Genuine small estimates
  * pass through untouched, so broadcast planning on honestly-small frames
  * is unaffected; compounded garbage is cut at every round boundary, so
  * round-plan stats stay O(hundreds of bits) forever. Same RDD, same
  * partitioning, same ordering — only the estimate changes.
  */
object StatsBridge {

  private val cap = BigInt(Long.MaxValue)

  def clampStats(df: DataFrame): DataFrame =
    df.queryExecution.logical match {
      case l: LogicalRDD if l.stats.sizeInBytes > cap =>
        val session = df.sparkSession.asInstanceOf[SparkSession]
        Dataset.ofRows(session,
          LogicalRDD(l.output, l.rdd, l.outputPartitioning,
            l.outputOrdering, l.isStreaming, l.stream)(
            session, Some(Statistics(sizeInBytes = cap)), None))
      case _ => df
    }
}
