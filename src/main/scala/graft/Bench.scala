package graft
import org.apache.spark.sql.SparkSession

/** Driver bench harness: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and emits ONE bare JSON line on stdout (build.sbt sets StdoutOutput so
  * sbt does not decorate it). Failed queries are recorded under "errors"
  * and excluded from the total instead of silently improving it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Optional args = subset of query names to run (iteration aid; the
    // driver passes none and gets the full set).
    val selected: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up at smoke scale: the first queries executed otherwise absorb
    // all JIT/codegen compilation (measured ±3x ordering noise at sf0.1).
    // Paths are canonicalized so a trailing slash or symlink can't skip the
    // warm-up; when timing the smoke scale itself, warm on the same dir.
    def canon(p: String): String =
      try new java.io.File(p).getCanonicalPath catch { case _: Throwable => p }
    val warmCandidate = "/root/testdata/sf0.001"
    val warmDir =
      if (new java.io.File(warmCandidate).isDirectory) warmCandidate else sfDir
    val effectiveWarm = if (canon(warmDir) == canon(sfDir)) sfDir else warmDir
    selected.foreach { case (name, fn) =>
      try { fn(spark, effectiveWarm).count(); () } catch {
        case e: Throwable =>
          System.err.println(s"[bench] warm-up $name failed: ${e.getMessage}")
      }
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
      }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val good = results.collect { case (n, s, true) => n -> s }
    val bad = results.collect { case (n, _, false) => n }
    val qs = good.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = bad.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = good.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    System.out.println(line)
    System.out.flush()
    spark.stop()
  }
}
