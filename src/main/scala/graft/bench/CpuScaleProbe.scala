package graft.bench

import org.apache.spark.sql.functions._

/** Raw CPU-scaling probe: embarrassingly parallel hash work with no
  * shuffle, then one shuffle-heavy aggregate — separates the machine/JVM
  * ceiling from engine overheads when interpreting scaling-run numbers.
  */
object CpuScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(400000000L)
    Seq(8, 32).foreach { c =>
      val spark = graft.util.Sessions.local(c, s"probe-$c",
        shufflePartitions = 64)
      spark.sparkContext.setLogLevel("ERROR")
      val t0 = System.nanoTime()
      spark.range(rows)
        .select(sum(pmod(xxhash64(col("id")), lit(1000)))).head()
      val t1 = System.nanoTime()
      spark.range(rows / 4)
        .select(pmod(xxhash64(col("id")), lit(100000)).as("k"))
        .groupBy("k").count().agg(sum("count")).head()
      val t2 = System.nanoTime()
      println(f"""{"cores":$c,"nosuffle_sec":${(t1 - t0) / 1e9}%.2f,"shuffle_sec":${(t2 - t1) / 1e9}%.2f}""")
      spark.stop()
    }
  }
}
