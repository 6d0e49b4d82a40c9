package graft.bench

import org.apache.spark.sql.functions._

import graft.algos.{KCore, Paths}
import graft.engine.SuperstepConfig
import graft.graph.TestGraphs

/** Prints the data-dependent convergence round counts that size the
  * unrolled DuckDB oracles for `sssp_converged` / `kcore3_converged`
  * (VERDICT r2 item 5): a fixpoint is stable under extra rounds, so any
  * oracle unroll ≥ the measured count reproduces the converged result.
  * Run: `runMain graft.bench.ConvergenceProbe [sfDir...]`.
  */
object ConvergenceProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.util.Sessions.local(cpus, "convergence-probe")
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      val cp = TestGraphs.copurchase(spark, dir)
      val ew = cp.select(col("src"), col("dst"),
          col("weight").cast("double").as("weight"))
        .union(cp.select(col("dst"), col("src"), col("weight").cast("double")))
        .localCheckpoint(true)
      val src0 = ew.agg(min(col("src"))).head().getLong(0)
      val r = Paths.sssp(spark, ew, src0,
        SuperstepConfig(maxIter = 100, numPartitions = cpus))
      val (kc, kr) = KCore.converged(
        cp.where(col("weight") >= 2).select("src", "dst"), 3)
      val kRows = kc.count()
      println(s"PROBE $dir sssp_supersteps=${r.supersteps} " +
        s"sssp_converged=${r.converged} kcore_rounds=$kr kcore_rows=$kRows")
    }
    spark.stop()
  }
}
