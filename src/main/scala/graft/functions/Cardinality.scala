package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-cardinality operators (§2.6 aggregation family).
  *
  * The exact spelling expands to Spark's two-phase distinct aggregate
  * (partial dedup per partition → exchange on (group, value) → final
  * count) — exact but the exchange carries one row per distinct pair.
  * The approximate spelling is the built-in HyperLogLog++ sketch
  * (`approx_count_distinct`): a fixed-size mergeable register set per
  * group, so the exchange carries one sketch per group regardless of
  * cardinality — the only viable shape when the value domain at 100 TB is
  * itself huge (distinct repos per token, distinct documents per shingle).
  * Functions-not-UDFs discipline: both are codegen'd built-ins.
  */
object Cardinality {

  /** Exact distinct `valueCol` count per `groupCol` (oracle-checkable). */
  def exactDistinct(df: DataFrame, groupCol: String, valueCol: String,
                    as: String = "n_distinct"): DataFrame =
    df.groupBy(col(groupCol))
      .agg(countDistinct(col(valueCol)).as(as))

  /** HLL++ distinct count per group; `rsd` = target relative standard
    * deviation (sketch size grows as 1/rsd²).
    */
  def approxDistinct(df: DataFrame, groupCol: String, valueCol: String,
                     rsd: Double = 0.01,
                     as: String = "n_approx"): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as(as))
}
