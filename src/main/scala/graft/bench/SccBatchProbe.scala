package graft.bench

import org.apache.spark.sql.functions._

import graft.algos.Scc
import graft.graph.TestGraphs

/** A/B: SCC inner-fixpoint batch depth (1 = one materialized round per
  * action, like the r3 kernels; 3 = three lazily-composed rounds per
  * action). Interleaved runs in ONE warmed JVM — single-run walls on this
  * box carry ±50% noise (BASELINE.md). Run:
  * `runMain graft.bench.SccBatchProbe [sfDir] [reps]`.
  */
object SccBatchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.util.Sessions.local(cpus, "scc-batch-probe")
    spark.sparkContext.setLogLevel("WARN")
    val cp = TestGraphs.copurchase(spark, dir)
    val dg = cp.where(col("weight") >= 2).select("src", "dst")
      .unionByName(cp.where(col("weight") >= 3)
        .select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    def time(b: Int): Double = {
      val t0 = System.nanoTime()
      Scc.run(spark, dg, numPartitions = cpus, batch = b).count()
      (System.nanoTime() - t0) / 1e9
    }
    time(1); time(3) // warm-up both paths
    val runs = (1 to reps).map(_ => (time(1), time(3)))
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    println(f"PROBE sccbatch $dir batch1=${runs.map(_._1).map(x => f"$x%.1f").mkString(",")} " +
      f"median=${med(runs.map(_._1))}%.1f s | " +
      f"batch3=${runs.map(_._2).map(x => f"$x%.1f").mkString(",")} " +
      f"median=${med(runs.map(_._2))}%.1f s")
    spark.stop()
  }
}
