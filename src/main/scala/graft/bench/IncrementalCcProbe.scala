package graft.bench

import org.apache.spark.sql.functions._

import graft.algos.ConnectedComponents
import graft.engine.{Lineage, SuperstepConfig}
import graft.graph.GraphOps
import graft.graph.TestGraphs

/** Prices the cc_incr claim: folding a small delta into EXISTING labels
  * via component-graph contraction vs re-running CC from scratch on the
  * union graph. The driver query composes base-run + fold (end-to-end
  * demo); this probe isolates the fold with the base labels
  * pre-materialized — the state a production pipeline actually holds when
  * the daily delta arrives. Interleaved reps in one warmed JVM. Run:
  * `runMain graft.bench.IncrementalCcProbe [sfDir] [reps]`.
  */
object IncrementalCcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.util.Sessions.local(cpus, "cc-incr-probe")
    spark.sparkContext.setLogLevel("WARN")
    val cfg = SuperstepConfig(numPartitions = cpus)

    val cp = TestGraphs.copurchase(spark, dir).select("src", "dst")
      .localCheckpoint(true)
    val inDelta =
      GraphOps.md5Prio(concat_ws(":", col("src"), col("dst"))) % 50 === 0
    val baseEdges = cp.where(!inDelta).localCheckpoint(true)
    val delta = cp.where(inDelta).localCheckpoint(true)
    val union = baseEdges.unionByName(delta).localCheckpoint(true)
    val baseLabels = Lineage.cut(
      ConnectedComponents.run(spark, baseEdges, cfg).state, eager = true)
    println(s"base=${baseEdges.count()} delta=${delta.count()} " +
      s"union=${union.count()} edges")

    def t(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths
    ConnectedComponents.incremental(spark, baseLabels, delta, cfg).count()
    ConnectedComponents.run(spark, union, cfg).state.count()
    val rows = (1 to reps).map { i =>
      val inc = t(ConnectedComponents
        .incremental(spark, baseLabels, delta, cfg).count())
      val scratch = t(ConnectedComponents.run(spark, union, cfg).state.count())
      println(f"rep $i: incremental $inc%.2f s vs from-scratch $scratch%.2f s")
      (inc, scratch)
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    println(f"MEDIAN incremental ${med(rows.map(_._1))}%.2f s vs " +
      f"from-scratch ${med(rows.map(_._2))}%.2f s over $reps reps")
    spark.stop()
  }
}
