package graft.bench

import org.apache.spark.sql.functions._

import graft.algos.PageRank
import graft.engine.SuperstepConfig
import graft.graph.TestGraphs

/** The measure-first A/B for the carried "PR tolerance schedule" item
  * (VERDICT r3 item "Missing #2", r4 "Next 3"): run PageRank to a TRUE
  * 1e-6 fixpoint three ways on the co-purchase graph and report
  * supersteps, scattered rows (the shuffle volume at 100 TB), wall, and
  * final-rank L∞ agreement:
  *
  *  A. stationary power iteration (the engine's PrProgram, tol=1e-6) —
  *     every superstep scatters ALL n vertices;
  *  B. delta PR, loose→tight schedule (θ = 1e-3 then 1e-7);
  *  C. delta PR, single tight phase (θ = 1e-7) — isolates the schedule's
  *     contribution from delta-PR's.
  *
  * Interleaved reps in one warmed JVM (±50% single-run noise on this box,
  * BASELINE.md). Results recorded in BASELINE.md round 5; the schedule is
  * kept only where this probe shows a win at equal fixpoint.
  * Run: `runMain graft.bench.ToleranceScheduleProbe [sfDir] [reps]`.
  */
object ToleranceScheduleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.util.Sessions.local(cpus, "tol-schedule-probe")
    spark.sparkContext.setLogLevel("WARN")
    val e = TestGraphs.copurchase(spark, dir).select("src", "dst")
      .localCheckpoint(true)
    val n = graft.graph.GraphOps.vertices(e).count()

    def runA(): (Map[Long, Double], Int, Long, Double) = {
      val t0 = System.nanoTime()
      val r = PageRank.run(spark, e,
        SuperstepConfig(tol = 1e-6, maxIter = 300, numPartitions = cpus))
      val m = r.state.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      (m, r.supersteps, r.supersteps.toLong * n, (System.nanoTime() - t0) / 1e9)
    }
    def runDelta(schedule: Seq[(Double, Int)])
        : (Map[Long, Double], Int, Long, Double) = {
      val t0 = System.nanoTime()
      val (df, rounds, scattered) =
        PageRank.deltaScheduled(spark, e, cpus, schedule)
      val m = df.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      (m, rounds, scattered, (System.nanoTime() - t0) / 1e9)
    }
    def linf(a: Map[Long, Double], b: Map[Long, Double]): Double =
      a.map { case (k, v) => math.abs(v - b(k)) }.max

    val sched = Seq((1e-3, 200), (1e-7, 400))
    val tight = Seq((1e-7, 400))
    runA(); runDelta(sched) // warm-up
    val runs = (1 to reps).map { _ =>
      (runA(), runDelta(sched), runDelta(tight))
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val (a, b, c) = (runs.head._1, runs.head._2, runs.head._3)
    println(f"PROBE tolsched $dir n=$n " +
      f"A_stationary: supersteps=${a._2} scattered=${a._3} " +
      f"wall=${runs.map(_._1._4).map(x => f"$x%.1f").mkString(",")} med=${med(runs.map(_._1._4))}%.1f | " +
      f"B_sched(1e-3,1e-7): rounds=${b._2} scattered=${b._3} " +
      f"wall=${runs.map(_._2._4).map(x => f"$x%.1f").mkString(",")} med=${med(runs.map(_._2._4))}%.1f " +
      f"linfVsA=${linf(b._1, a._1)}%.2e | " +
      f"C_tight(1e-7): rounds=${c._2} scattered=${c._3} " +
      f"wall=${runs.map(_._3._4).map(x => f"$x%.1f").mkString(",")} med=${med(runs.map(_._3._4))}%.1f " +
      f"linfVsA=${linf(c._1, a._1)}%.2e")
    spark.stop()
  }
}
