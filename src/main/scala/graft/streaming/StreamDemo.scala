package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Self-contained streaming demo: rate source → synthetic edge events →
  * stateful running out-degrees → memory sink. Runs a few micro-batches and
  * prints the maintained per-vertex state.
  *
  * Usage: runMain graft.streaming.StreamDemo [seconds]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val runSecs = args.lift(0).map(_.toInt).getOrElse(5)
    val spark = graft.util.Sessions.local(4, "graft-stream-demo")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val edges = spark.readStream.format("rate")
      .option("rowsPerSecond", "50").load()
      .select(pmod(col("value"), lit(7)).as("src"),
        pmod(col("value") * 31, lit(7)).as("dst"),
        col("timestamp").as("ts"))
      .as[EdgeStream.EdgeEvent]

    val q = EdgeStream.runningOutDegrees(edges)
      .writeStream.format("memory").queryName("stream_degrees")
      .outputMode(OutputMode.Update()).start()
    Thread.sleep(runSecs * 1000L)
    q.processAllAvailable()
    q.stop()

    val latest = spark.table("stream_degrees")
      .groupBy("id").agg(max("outdeg").as("outdeg")).orderBy("id")
    latest.show()
    println(s"total tracked vertices: ${latest.count()}")
    spark.stop()
  }
}
