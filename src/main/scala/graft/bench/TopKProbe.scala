package graft.bench

import graft.Queries

/** VERDICT r2 item 6: pr_top20 measured 8× pr5 under the driver's clock on
  * an identical 5-iteration plan plus TakeOrderedAndProject. Interleaved
  * medians-of-3 for both queries (plus bfs5, the other unexplained gap)
  * after a warm-up, same harness shape as the driver's Bench.
  * Run: `runMain graft.bench.TopKProbe [sfDir]`.
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("pr5", "pr_top20", "bfs5")
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      Queries.all(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(time) // warm-up pass at the measured scale
    val runs = (1 to 3).map(_ => names.map(n => n -> time(n)))
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    names.foreach { n =>
      val xs = runs.map(_.toMap.apply(n))
      println(f"PROBE topk $n runs=${xs.map(x => f"$x%.2f").mkString(",")} median=${med(xs)}%.2f s")
    }
    spark.stop()
  }
}
