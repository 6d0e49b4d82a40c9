package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.StatsBridge

/** Per-round lineage truncation for iterative kernels. */
object Lineage {

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
