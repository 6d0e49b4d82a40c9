package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.StatsBridge

/** Per-round lineage truncation for iterative kernels. */
object Lineage {

  /** Loop-scoped session tuning shared by every iterative kernel (the
    * Superstep discipline, extracted in r5 when SccRoundsProbe measured
    * AQE splitting each one-action round into ~8 stage-jobs): AQE off
    * (pure scheduling overhead for hundreds of small identical round
    * jobs), sort-merge join off (round joins must be shuffled-hash — SMJ
    * re-sorts the big side every round), shuffle partitions pinned to the
    * loop's co-partitioning. Restores the previous values on exit.
    */
  def withLoopConf[T](spark: SparkSession, numPartitions: Int)(body: => T): T = {
    val restore = Seq(
      "spark.sql.adaptive.enabled" -> spark.conf.get(
        "spark.sql.adaptive.enabled", "true"),
      "spark.sql.join.preferSortMergeJoin" -> spark.conf.get(
        "spark.sql.join.preferSortMergeJoin", "true"),
      "spark.sql.shuffle.partitions" -> spark.conf.get(
        "spark.sql.shuffle.partitions", "200"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    spark.conf.set("spark.sql.shuffle.partitions", numPartitions.toString)
    try body
    finally restore.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  /** `localCheckpoint` + plan-size clamp. The checkpoint truncates the
    * logical plan but carries the origin plan's size ESTIMATE into the new
    * leaf; in a loop those estimates multiply through every join and their
    * bit-length doubles per round, until Catalyst planning drowns in
    * megabit BigInteger products (see
    * [[org.apache.spark.sql.graftbridge.StatsBridge]] for the measurement).
    * Every loop kernel must truncate lineage through THIS, not through raw
    * localCheckpoint. Honest estimates (≤ Long.MaxValue) pass through
    * unchanged, so one-off checkpoints lose nothing.
    */
  def cut(df: DataFrame, eager: Boolean = false): DataFrame =
    StatsBridge.clampStats(df.localCheckpoint(eager))
}
