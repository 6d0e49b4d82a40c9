package graft.util

import org.apache.spark.sql.SparkSession

/** Session builders used by tests and benches (Verify/Bench build their own
  * per the driver contract). Defaults follow SURVEY.md §7.4: shuffle
  * partitions = cores at test scale, AQE on as the skew backstop.
  */
object Sessions {
  def local(cores: Int, appName: String = "graft",
            shufflePartitions: Int = -1): SparkSession = {
    val sp = if (shufflePartitions > 0) shufflePartitions else cores
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
