package graft.bench

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.algos.Scc
import graft.graph.TestGraphs

/** Measures the round-5 SCC rewrite (signature decomposition + pointer
  * jumping): wall, outer/trim/sweep round counts, and DRIVER JOBS per run
  * (SparkListener on job starts) — the r4 verdict flagged two actions per
  * inner round plus O(diameter) sweeps; this probe records both fixes.
  * Interleaved reps in one warmed JVM (single-run walls on this box carry
  * ±50% noise — BASELINE.md). Run:
  * `runMain graft.bench.SccRoundsProbe [sfDir] [reps]`.
  */
object SccRoundsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.util.Sessions.local(cpus, "scc-rounds-probe")
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val cp = TestGraphs.copurchase(spark, dir)
    val dg = cp.where(col("weight") >= 2).select("src", "dst")
      .unionByName(cp.where(col("weight") >= 3)
        .select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    val trimCap = args.lift(2).map(_.toInt).getOrElse(4)
    val trimFrac = args.lift(3).map(_.toDouble).getOrElse(1.0)
    def time(): (Double, Long, Map[String, Int]) = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val (df, stats) = Scc.runWithStats(spark, dg, numPartitions = cpus,
        maxTrimRounds = trimCap, trimContinueFrac = trimFrac)
      df.count()
      ((System.nanoTime() - t0) / 1e9, jobs.get() - j0, stats)
    }
    time() // warm-up
    val runs = (1 to reps).map(_ => time())
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val s = runs.head._3
    println(f"PROBE sccrounds $dir " +
      f"wall=${runs.map(_._1).map(x => f"$x%.1f").mkString(",")} " +
      f"median=${med(runs.map(_._1))}%.1f s " +
      f"jobs=${runs.map(_._2).mkString(",")} " +
      s"outer=${s("outer")} trimRounds=${s("trimRounds")} " +
      s"sweepRounds=${s("sweepRounds")}")
    spark.stop()
  }
}
