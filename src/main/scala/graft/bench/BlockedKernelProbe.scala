package graft.bench

import graft.engine.BlockedKernel
import graft.graph.TestGraphs

/** Settles SURVEY.md §9 queue item 2 (carried from round 1): does a typed
  * cogroup flatMap over packed CSR blocks beat the relational
  * explode-blocks kernel? Warm-up + 3 timed runs per variant, medians
  * printed. Run: `runMain graft.bench.BlockedKernelProbe [sfDir]`.
  */
object BlockedKernelProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.util.Sessions.local(cpus, "blocked-kernel-probe")
    spark.sparkContext.setLogLevel("WARN")
    val e = TestGraphs.copurchaseUndirected(spark, dir).localCheckpoint(true)
    // NB .count() would measure nothing: the final left-outer join on the
    // aggregate's unique key gets ELIMINATED under count (distinct-key join
    // elimination), skipping the whole rank pipeline. Sum the ranks instead.
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      df.agg(org.apache.spark.sql.functions.sum("rank")).collect(); ()
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    // warm both paths first (JIT), then interleave timed runs
    force(BlockedKernel.prFixedExplode(e, 5, cpus))
    force(BlockedKernel.prFixedCogroup(e, 5, cpus))
    val (ex, cg) = (1 to 5).map { _ =>
      (time(force(BlockedKernel.prFixedExplode(e, 5, cpus))),
        time(force(BlockedKernel.prFixedCogroup(e, 5, cpus))))
    }.unzip
    println(f"PROBE blocked explode runs=${ex.map(x => f"$x%.2f").mkString(",")} median=${med(ex)}%.2f s")
    println(f"PROBE blocked cogroup runs=${cg.map(x => f"$x%.2f").mkString(",")} median=${med(cg)}%.2f s")
    // value parity on a sample
    val a = BlockedKernel.prFixedExplode(e, 5, cpus)
    val b = BlockedKernel.prFixedCogroup(e, 5, cpus)
    val diff = a.toDF("id", "ra").join(b.toDF("id", "rb"), "id")
      .where(org.apache.spark.sql.functions.abs(
        org.apache.spark.sql.functions.col("ra") -
          org.apache.spark.sql.functions.col("rb")) > 1e-9)
      .count()
    println(s"PROBE blocked value_mismatches=$diff")
    spark.stop()
  }
}
