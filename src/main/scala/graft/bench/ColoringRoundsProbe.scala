package graft.bench

import org.apache.spark.sql.functions._

import graft.algos.Coloring
import graft.graph.TestGraphs

/** Measures Jones–Plassmann round counts and palette size for both
  * priority orders (xxhash64 scale default vs the md5 oracle-twin) — the
  * md5 variant's DuckDB unroll depth comes from here (over-unroll 2×, the
  * mis discipline). Run:
  * `runMain graft.bench.ColoringRoundsProbe [sfDir]`.
  */
object ColoringRoundsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.util.Sessions.local(cpus, "coloring-rounds-probe")
    spark.sparkContext.setLogLevel("WARN")
    val e = TestGraphs.copurchase(spark, dir)
      .where(col("weight") >= 2).select("src", "dst").localCheckpoint(true)
    for (md5 <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val (df, rounds) = Coloring.runWithRounds(spark, e,
        numPartitions = cpus, md5Pri = md5)
      val colors = df.agg(countDistinct(col("color"))).head().getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"md5Pri=$md5%-5s rounds=$rounds colors=$colors wall=$wall%.1f s")
    }
    spark.stop()
  }
}
