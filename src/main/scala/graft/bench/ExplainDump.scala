package graft.bench

import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for representative queries so plan
  * regressions (lost pushdown, surprise shuffles, missing broadcast,
  * codegen breaks) are reviewable as a text artifact.
  *
  * Usage: runMain graft.bench.ExplainDump [sfDir] [outFile]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("target/plans.txt")
    val spark = graft.util.Sessions.local(4, "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("g_copurchase", "degrees", "pr5", "tc", "dedup_minhash",
      "dedup_simhash", "dedup_exact", "minhash_buckets_xx", "kcore3",
      "embed_neardup", "ann_top5", "ann_multi_top5", "text_stats")
    val sb = new StringBuilder
    names.foreach { name =>
      val df = graft.Queries.all(name)(spark, sfDir)
      sb.append(s"\n===== $name =====\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    Files.createDirectories(Paths.get(out).getParent)
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out (${sb.length} chars)")
    spark.stop()
  }
}
