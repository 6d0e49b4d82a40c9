package graft.bench

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.streaming.StreamDedup
import graft.text.TextOps

/** Where do stream_minhash's ~29 s go at sf0.1 (driver bench #2 cost)?
  * Candidate culprits: (a) the 16 interpreted-HOF md5 passes of the
  * per-row signature spelling, (b) the streaming machinery itself
  * (parquet re-write + 4 micro-batches + memory sink). Legs, interleaved:
  *
  *   hof_batch — signaturesPerRowMd5 run as a PLAIN batch job (no stream):
  *               isolates the interpreted-HOF cost.
  *   agg_batch — the codegen'd wide-agg batch spelling (shingleRows +
  *               minhashSignatures): the known-fast floor.
  *   stream_hof — current minhashViaStream (per-row HOF inside the stream).
  *   stream_agg — same bounded replay, but signatures computed per
  *                micro-batch with the codegen'd wide-agg via foreachBatch
  *                (docs arrive whole, so per-batch aggregation is exact;
  *                zero cross-batch state).
  *
  * Run: `SPARK_GRAFT_SF_DIR=... runMain graft.bench.StreamMinhashProbe [reps]`
  */
object StreamMinhashProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.util.Sessions.local(cores, "stream-minhash-probe")
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.graph.TestGraphs.table(spark, sfDir, "documents")
      .localCheckpoint(true)
    println(s"docs=${docs.count()} sfDir=$sfDir cores=$cores")

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$label%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    // warm the JVM once with the cheap batch leg
    Dedup.minhashSignatures(
      TextOps.shingleRows(docs, "doc_id", "text", 3), 16).count()

    for (r <- 1 to reps) {
      println(s"--- rep $r ---")
      time("agg_batch") {
        Dedup.minhashSignatures(
          TextOps.shingleRows(docs, "doc_id", "text", 3), 16).count()
      }
      time("hof_batch") {
        StreamDedup.signaturesPerRowMd5(docs, 3, 16).count()
      }
      time("stream_hof") {
        StreamDedup.minhashViaStream(docs, 3, 16).count()
      }
      time("stream_agg") {
        streamViaForeachBatch(spark, docs).count()
      }
    }
    spark.stop()
  }

  /** Prototype of the foreachBatch spelling: bounded replay identical to
    * minhashViaStream, signatures computed per micro-batch with the batch
    * wide-agg, appended to a parquet sink dir.
    */
  private def streamViaForeachBatch(
      spark: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame) = {
    import java.nio.file.{Files => F, Path}
    val tmp = F.createTempDirectory("graft-mhfb-src").toString
    val out = F.createTempDirectory("graft-mhfb-out").toString
    docs.select(col("doc_id"), col("text")).repartition(4)
      .write.mode("overwrite").parquet(tmp)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(tmp)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Dedup.minhashSignatures(
            TextOps.shingleRows(batch, "doc_id", "text", 3), 16)
          .write.mode("append").parquet(out)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(out).localCheckpoint(true)
  }
}
