package graft.bench

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

import graft.algos.PageRank
import graft.engine.SuperstepConfig

/** Breaks a PageRank superstep loop down into executor task time vs
  * driver-side gap (planning/broadcast/scheduling) vs GC — the numbers
  * that explain local-mode scaling efficiency.
  *
  * Usage: runMain graft.bench.SuperstepProbe [cores] [iters] [edgeDir]
  */
object SuperstepProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.lift(0).map(_.toInt).getOrElse(32)
    val iters = args.lift(1).map(_.toInt).getOrElse(8)
    val edgeDir = args.lift(2).getOrElse("target/scaling/edges")
    val spark = graft.util.Sessions.local(cores, s"probe-$cores",
      shufflePartitions = 32)
    spark.sparkContext.setLogLevel("ERROR")

    val taskTime = new AtomicLong(0)
    val gcTime = new AtomicLong(0)
    val deserTime = new AtomicLong(0)
    val resultSerTime = new AtomicLong(0)
    val tasks = new AtomicInteger(0)
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          taskTime.addAndGet(m.executorRunTime)
          gcTime.addAndGet(m.jvmGCTime)
          deserTime.addAndGet(m.executorDeserializeTime)
          resultSerTime.addAndGet(m.resultSerializationTime)
        }
        tasks.incrementAndGet(); ()
      }
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); ()
      }
    })

    val edges = spark.read.parquet(edgeDir)
    val t0 = System.nanoTime()
    val r = PageRank.run(spark, edges,
      SuperstepConfig(numPartitions = 32, tol = 1e-12, maxIter = iters))
    val wall = (System.nanoTime() - t0) / 1e9
    // settle listener
    Thread.sleep(1000)
    val walls = r.metrics.map(m => m("wallMs").toInt)
    println(s"""{"cores":$cores,"iters":${r.supersteps},""" +
      f""""wall_sec":$wall%.2f,"task_time_sec":${taskTime.get / 1e3}%.2f,""" +
      f""""gc_sec":${gcTime.get / 1e3}%.2f,"deser_sec":${deserTime.get / 1e3}%.2f,""" +
      f""""result_ser_sec":${resultSerTime.get / 1e3}%.2f,""" +
      s""""tasks":${tasks.get},"jobs":${jobs.get},"stages":${stages.get},""" +
      s""""superstep_wall_ms":${walls.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
