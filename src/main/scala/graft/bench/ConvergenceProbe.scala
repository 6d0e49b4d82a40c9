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
      val (sdDf, sdB, sdL) = Paths.deltaStepping(spark, ew,
        ew.select(col("src")).agg(min(col("src"))), 2.0,
        numPartitions = cpus)
      println(s"PROBE $dir sssp_delta_buckets=$sdB " +
        s"sssp_delta_light_rounds=$sdL " +
        s"sssp_delta_reached=${sdDf.where(col("dist").isNotNull).count()}")
      val (kc, kr) = KCore.converged(
        cp.where(col("weight") >= 2).select("src", "dst"), 3)
      val kRows = kc.count()
      // r4: truss peel rounds (sizes the ktruss over-unroll) + scc shape
      val (tr, trr) = graft.algos.Truss.converged(
        cp.where(col("weight") >= 2).select("src", "dst"), 3)
      val tRows = tr.count()
      val sccStart = System.nanoTime()
      val scc = graft.algos.Scc.run(spark,
        cp.where(col("weight") >= 2).select("src", "dst")
          .unionByName(cp.where(col("weight") >= 3)
            .select(col("dst").as("src"), col("src").as("dst"))),
        numPartitions = cpus, verbose = true)
      val sccRows = scc.count()
      val nontrivial = scc.groupBy("scc").agg(count(lit(1)).as("n"))
        .where(col("n") > 1).count()
      val sccSecs = (System.nanoTime() - sccStart) / 1e9
      val (misDf, misR) = graft.algos.Mis.run(spark,
        cp.where(col("weight") >= 2).select("src", "dst"),
        numPartitions = cpus)
      val misIn = misDf.agg(sum(col("in_mis"))).head().getLong(0)
      println(s"PROBE $dir mis_rounds=$misR mis_size=$misIn")
      val (mDf, mR) = graft.algos.Matching.run(spark,
        cp.where(col("weight") >= 2).select("src", "dst"),
        numPartitions = cpus)
      println(s"PROBE $dir matching_rounds=$mR matching_size=${mDf.count()}")
      val (mbDf, mbR) = graft.algos.Matching.runB(spark,
        cp.where(col("weight") >= 2).select("src", "dst"), 2,
        numPartitions = cpus)
      println(s"PROBE $dir matching_b2_rounds=$mbR matching_b2_size=${mbDf.count()}")
      val (mwDf, mwR) = graft.algos.Matching.runWeighted(spark,
        cp.where(col("weight") >= 2).select("src", "dst", "weight"),
        numPartitions = cpus)
      println(s"PROBE $dir matching_w_rounds=$mwR matching_w_size=${mwDf.count()}")
      println(s"PROBE $dir sssp_supersteps=${r.supersteps} " +
        s"sssp_converged=${r.converged} kcore_rounds=$kr kcore_rows=$kRows " +
        s"truss_rounds=$trr truss_rows=$tRows " +
        f"scc_rows=$sccRows scc_nontrivial=$nontrivial scc_secs=$sccSecs%.1f")
    }
    spark.stop()
  }
}
