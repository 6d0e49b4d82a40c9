package graft.bench

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.algos.PageRank
import graft.corpus.CorpusGen
import graft.engine.SuperstepConfig
import graft.graph.EdgeDerivation

/** The north-rule scaling evidence (BASELINE.json): PageRank-to-convergence
  * on the corpus-derived co-change graph, run at two parallelism levels on
  * IDENTICAL input — local[N] and local[4N] stand in for N and 4N
  * executors (no real cluster in this sandbox; see BASELINE.md).
  *
  * Usage: runMain graft.bench.ScalingBench [nRepos] [filesPerRepo]
  *        [commitsPerRepo] [coresLo] [coresHi]
  *
  * Prints one JSON line per level: wall seconds, supersteps, edges,
  * supersteps/min, edges-processed/sec; then the scaling efficiency
  * (T_lo/T_hi)/(coresHi/coresLo).
  */
object ScalingBench {

  def buildEdges(spark: SparkSession, nRepos: Int, filesPerRepo: Int,
                 commitsPerRepo: Int, dir: String): Unit = {
    val corpus = CorpusGen.generate(spark, nRepos, filesPerRepo,
      commitsPerRepo)
    val ids = EdgeDerivation.idMap(corpus,
      spark.sparkContext.defaultParallelism)
    val edges = EdgeDerivation.coChangeEdges(corpus, ids)
      .union(EdgeDerivation.importEdges(corpus, ids)
        .select(col("src"), col("dst"), col("weight")))
    edges.write.mode("overwrite").parquet(dir)
  }

  def timePr(cores: Int, edgeDir: String, tol: Double,
             maxIter: Int): (Double, Int, Long) = {
    val spark = graft.util.Sessions.local(cores, s"graft-scaling-$cores",
      shufflePartitions = cores * 2)
    spark.sparkContext.setLogLevel("WARN")
    try {
      val edges = spark.read.parquet(edgeDir)
      val nEdges = edges.count()
      val t0 = System.nanoTime()
      val r = PageRank.runFiltered(spark, edges,
        SuperstepConfig(numPartitions = cores * 2, tol = tol,
          maxIter = maxIter))
      // force the final result
      r.state.agg(sum(col("rank"))).head()
      val secs = (System.nanoTime() - t0) / 1e9
      (secs, r.supersteps, nEdges)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nRepos = args.lift(0).map(_.toInt).getOrElse(300)
    val filesPerRepo = args.lift(1).map(_.toInt).getOrElse(60)
    val commitsPerRepo = args.lift(2).map(_.toInt).getOrElse(30)
    val coresLo = args.lift(3).map(_.toInt).getOrElse(8)
    val coresHi = args.lift(4).map(_.toInt).getOrElse(32)
    val edgeDir = "target/scaling/edges"

    // Build the input once, at fixed parallelism, so both runs read the
    // exact same parquet bytes.
    val gen = graft.util.Sessions.local(8, "graft-scaling-gen")
    gen.sparkContext.setLogLevel("WARN")
    buildEdges(gen, nRepos, filesPerRepo, commitsPerRepo, edgeDir)
    gen.stop()

    val results = Seq(coresLo, coresHi).map { c =>
      val (secs, steps, edges) = timePr(c, edgeDir, tol = 1e-6, maxIter = 60)
      val line =
        s"""{"cores":$c,"wall_sec":${f"$secs%.2f"},"supersteps":$steps,""" +
          s""""edges":$edges,"supersteps_per_min":${f"${steps * 60.0 / secs}%.2f"},""" +
          s""""edges_per_sec":${f"${steps.toLong * edges / secs}%.0f"}}"""
      println(line)
      (c, secs, steps, edges, line)
    }
    val (cLo, tLo, _, _, _) = results(0)
    val (cHi, tHi, _, _, _) = results(1)
    val eff = (tLo / tHi) / (cHi.toDouble / cLo)
    println(f"""{"scaling_efficiency":$eff%.3f,"lo_cores":$cLo,"hi_cores":$cHi}""")

    val report = results.map(_._5).mkString("\n")
    Files.createDirectories(Paths.get("target/scaling"))
    Files.writeString(Paths.get("target/scaling/scaling.json"),
      report + "\n" +
        f"""{"scaling_efficiency":$eff%.3f,"lo_cores":$cLo,"hi_cores":$cHi}""")
  }
}
