package graft.engine

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-shaped snapshot store (SURVEY.md §7.6 — no Iceberg jars ship in
  * this sandbox, so the layout emulates a table format over plain parquet):
  *
  * {{{
  * base/<algo>/<runId>/snap=<superstep>/part-*.parquet
  * base/<algo>/<runId>/manifest-<superstep>.json
  * }}}
  *
  * Commit protocol (SURVEY.md §7.4.5): data dir is written first, then the
  * manifest is written to a temp name and atomically renamed — a snapshot
  * exists iff its manifest exists, so readers never observe partial data.
  * The manifest carries per-partition lineage (row count per partition),
  * metrics, and the parent-snapshot pointer, per the north rule's
  * "checkpoints per-partition vertex state and lineage/metrics".
  */
final class CheckpointStore(base: String, algo: String, runId: String) {
  val root: Path = Paths.get(base, algo, runId)
  Files.createDirectories(root)

  private def snapDir(s: Int): Path = root.resolve(s"snap=$s")
  private def manifestPath(s: Int): Path = root.resolve(s"manifest-$s.json")

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Write superstep `s`: parquet data + per-partition row counts + metrics
    * manifest. Returns total row count (one pass over the written files, so
    * the expensive lineage is materialized exactly once).
    */
  def write(s: Int, state: DataFrame, metrics: Map[String, String]): Long = {
    val dir = snapDir(s)
    state.write.mode("overwrite").parquet(dir.toString)
    val spark = state.sparkSession
    val written = spark.read.parquet(dir.toString)
    val perPart = written
      .groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("rows"), min("id").as("minId"), max("id").as("maxId"))
      .collect()
      .map(r => s"""{"pid":${r.getInt(0)},"rows":${r.getLong(1)},""" +
        s""""minId":${r.get(2)},"maxId":${r.get(3)}}""")
    val total = written.count()
    val parent = if (s > 0) s"${s - 1}" else "null"
    val metricsJson = metrics.map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }
      .mkString("{", ",", "}")
    val schemaJson = jstr(state.schema.json)
    val json =
      s"""{"superstep":$s,"rows":$total,"parentSnapshot":$parent,
         |"partitions":[${perPart.mkString(",")}],
         |"metrics":$metricsJson,
         |"schema":$schemaJson}""".stripMargin
    val tmp = root.resolve(s"manifest-$s.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, manifestPath(s), StandardCopyOption.ATOMIC_MOVE)
    total
  }

  /** Latest superstep with a committed manifest, if any. The pattern is
    * anchored (full-name match) so a leftover `manifest-N.json.tmp` from a
    * crash mid-write is NOT counted as committed.
    */
  def latestComplete(): Option[Int] = {
    if (!Files.isDirectory(root)) return None
    val re = "^manifest-(\\d+)\\.json$".r
    val stream = Files.list(root)
    try {
      stream.iterator().asScala
        .flatMap(p => re.findFirstMatchIn(p.getFileName.toString)
          .filter(m => m.matched == p.getFileName.toString)
          .map(_.group(1).toInt))
        .toList
        .reduceOption(_ max _)
    } finally stream.close()
  }

  def read(spark: SparkSession, s: Int): DataFrame =
    spark.read.parquet(snapDir(s).toString)

  def readManifest(s: Int): String = Files.readString(manifestPath(s))
}
