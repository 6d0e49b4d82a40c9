package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.algos.KCore
import graft.graph.TestGraphs

/** Measures the core-decomposition shape on the weight≥2 co-purchase
  * graph — max coreness and total peel rounds — to size the over-unrolled
  * DuckDB oracle (levels × rounds, ≥2× margin on the rounds axis; extra
  * LEVELS past the max core are empty and safe by construction).
  */
object CorenessProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("coreness-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      val t0 = System.nanoTime()
      val (core, maxK, rounds) = KCore.coreness(
        TestGraphs.copurchase(spark, dir).where(col("weight") >= 2)
          .select("src", "dst"))
      val byLevel = core.groupBy("coreness").count()
        .orderBy("coreness").collect()
        .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[coreness-probe] dir=$dir maxCore=$maxK " +
        f"perLevelRounds=${rounds.mkString("/")} " +
        f"perLevelCounts=[$byLevel] wall=$secs%.1f s")
    }
    spark.stop()
  }
}
