package graft.bench

import org.apache.spark.sql.functions._

/** Plan audit for the 2D grid superstep (SURVEY.md §2.2 G5): reconstructs
  * one grid-path superstep exactly as [[graft.engine.Superstep]] composes it
  * and prints the formatted physical plan. The pass criterion, checked by
  * eye / grep on the output:
  *
  *   - exactly TWO Exchange nodes: the frontier shuffle to
  *     hashpartitioning(srcBlk, dstBlk) and the post-partial-agg message
  *     shuffle to hashpartitioning(id);
  *   - NO Exchange above the edge-side Scan ExistingRDD (the tiled edges
  *     stream in place every superstep);
  *   - NO Exchange above the state side of the apply join (co-partitioned).
  *
  * Usage: runMain graft.bench.GridProbe [outFile]
  */
object GridProbe {
  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse("target/plans_grid.txt")
    val n = 8
    val g = 3
    val spark = graft.util.Sessions.local(8, "graft-gridprobe",
      shufflePartitions = n)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    // the gather join clusters on (srcBlk, dstBlk, src) but the tiles are
    // partitioned by the (srcBlk, dstBlk) PREFIX — allow subset-key
    // co-partitioning or EnsureRequirements re-shuffles the edge side
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")

    def blk(c: org.apache.spark.sql.Column) =
      pmod(xxhash64(c), lit(g.toLong)).cast("int")

    val raw = spark.range(200000)
      .select((col("id") % 5000).as("src"),
        ((col("id") * 31 + 7) % 5000).as("dst"))
      .where(col("src") =!= col("dst"))
    val eB = raw
      .withColumn("srcBlk", blk(col("src")))
      .withColumn("dstBlk", blk(col("dst")))
      .repartition(n, col("srcBlk"), col("dstBlk"))
      .sortWithinPartitions("src", "dst")
      .localCheckpoint(true)
    val state = raw.select(col("src").as("id")).distinct()
      .withColumn("rank", lit(1.0)).withColumn("outdeg", lit(2L))
      .repartition(n, col("id"))
      .localCheckpoint(true)

    val fr = state.withColumnRenamed("id", "src")
      .withColumn("srcBlk", blk(col("src")))
      .withColumn("dstBlk", explode(array((0 until g).map(lit): _*)))
      .hint("shuffle_hash")
    val msgs = eB.join(fr, Seq("srcBlk", "dstBlk", "src"))
      .select(col("dst").as("id"), (col("rank") / col("outdeg")).as("msg"))
      .groupBy("id").agg(sum(col("msg")).as("agg"))
    val next = state.join(msgs.hint("shuffle_hash"), Seq("id"), "left_outer")
      .select(col("id"),
        (lit(0.15) + lit(0.85) * coalesce(col("agg"), lit(0.0))).as("rank"),
        col("outdeg"))

    val plan = next.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(out).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), plan)
    // formatted mode prints each node in the tree AND the detail section
    val nExchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
    println(s"exchanges=$nExchanges (expect 2: frontier ×g shuffle + " +
      "post-partial-agg message shuffle; edges and state never move)")
    println(plan.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Scan") ||
        l.contains("Join") || l.contains("HashAggregate"))
      .take(30).mkString("\n"))
    spark.stop()
  }
}
