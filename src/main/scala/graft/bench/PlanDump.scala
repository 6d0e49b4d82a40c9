package graft.bench

import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for named queries into per-query files —
  * the round-6 optimization evidence artifacts (plans/r06/<name>_<tag>.txt).
  *
  * Usage: runMain graft.bench.PlanDump <sfDir> <outDir> <tag> <name>...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.util.Sessions.local(cpus.toInt, "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = graft.Queries.all(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), txt)
        println(s"wrote $outDir/${name}_$tag.txt (${txt.length} chars)")
      } catch {
        case e: Throwable =>
          println(s"FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
