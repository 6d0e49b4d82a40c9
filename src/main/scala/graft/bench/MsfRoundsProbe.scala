package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.algos.Msf
import graft.graph.TestGraphs

/** Measures Borůvka MSF round counts (outer rounds, total/max pointer-jump
  * rounds) on the weight≥2 co-purchase graph at each SF dir passed on the
  * command line — sizes the over-unrolled DuckDB oracle (unroll ≥ 2×
  * measured, the misRounds/trussRounds discipline).
  */
object MsfRoundsProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("msf-rounds-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      val t0 = System.nanoTime()
      val (forest, stats) = Msf.runWithStats(spark,
        TestGraphs.copurchase(spark, dir).where(col("weight") >= 2))
      val n = forest.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[msf-probe] dir=$dir forestEdges=$n stats=$stats " +
        f"wall=$secs%.1f s")
    }
    spark.stop()
  }
}
