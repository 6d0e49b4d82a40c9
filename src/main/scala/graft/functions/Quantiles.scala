package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact discrete quantiles over a numeric column (SURVEY.md §2.6 family):
  * value v such that at least ceil(pct·n/100) rows are ≤ v — i.e.
  * percentile_disc, computed WITHOUT a global sort of the data. The input
  * collapses to a (value, count) histogram first; the running-sum window
  * then runs over the histogram only, which for degree/length-shaped
  * columns is tiny (distinct values ≪ rows) — the centroid-table-window
  * discipline, not a whole-data single-partition sort. All arithmetic is
  * integer (`ceil` spelled as `(n·pct + 99) div 100`), so the result is
  * engine-exact against DuckDB's identical spelling.
  */
object Quantiles {

  /** (pct, value) per requested percent, ordered by pct. */
  def discrete(df: DataFrame, valueCol: String,
               percents: Seq[Int]): DataFrame = {
    val hist = df.groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    // the one window: ordered prefix sum over the DISTINCT-VALUE histogram
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("v"))))
    val n = hist.agg(sum(col("cnt")).as("n"))
    val p = df.sparkSession
      .createDataFrame(percents.map(Tuple1(_))).toDF("pct")
      .crossJoin(broadcast(n))
      .select(col("pct").cast("long").as("pct"),
        expr("(n * pct + 99) div 100").as("target"))
    broadcast(p).join(cum, col("cum") >= col("target"))
      .groupBy("pct")
      .agg(min(col("v")).as("value"))
  }

  /** Per-group percentile_disc — [[discrete]] with every step keyed by a
    * group column (the per-segment latency/value dashboard shape). The
    * prefix-sum window PARTITIONS BY group, so its state is one group's
    * distinct-value histogram, never the table; group count and targets
    * ride a co-partitioned join on the group key.
    */
  def discreteBy(df: DataFrame, groupCol: String, valueCol: String,
                 percents: Seq[Int]): DataFrame = {
    val hist = df.groupBy(col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy("g").orderBy(col("v"))))
    val n = hist.groupBy("g").agg(sum(col("cnt")).as("n"))
    val p = n.crossJoin(broadcast(df.sparkSession
        .createDataFrame(percents.map(Tuple1(_))).toDF("pct")))
      .select(col("g"), col("pct").cast("long").as("pct"),
        expr("(n * pct + 99) div 100").as("target"))
    p.join(cum, Seq("g"))
      .where(col("cum") >= col("target"))
      .groupBy(col("g").as(groupCol), col("pct"))
      .agg(min(col("v")).as("value"))
  }
}
