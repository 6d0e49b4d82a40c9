package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in [[Queries]]; their DuckDB oracles in [[OracleSql]].
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * top-20 PageRank over the co-purchase graph (derivation → degrees →
    * 5 supersteps → top-k), exercising the whole §2 pipeline in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.all("pr_top20")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (convergence-driven runs, xxhash64 scale paths) → rows-only check.
    */
  def oracleSql: Map[String, String] = OracleSql.all
}
