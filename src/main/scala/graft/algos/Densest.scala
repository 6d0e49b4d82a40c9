package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Lineage

/** Densest-subgraph greedy peel (Charikar's 2-approximation, in the
  * parallel ε-batched form of Bahmani, Kumar & Vassilvitskii, VLDB 2012 —
  * both public algorithms): each round measures the current subgraph, then
  * removes EVERY vertex whose degree is at most 2(1+ε)·m/n. At ε = 1 the
  * kept set is strictly smaller than n/2 (vertices above twice the average
  * degree hold less than half the degree mass), so the peel terminates in
  * at most ⌈log₂ n⌉ rounds and the densest round is a 2(1+ε)=4-approx of
  * the optimum density — the standard "find the core community / spam
  * cluster" primitive on link graphs.
  *
  * Exactness discipline: the threshold test `deg ≤ 2m/n` is spelled
  * `deg·n ≤ 2·m2` (m2 = half-edge count = Σdeg, always even) and the
  * best-round argmax compares densities by cross-multiplication
  * (`m2_i·n_j vs m2_j·n_i`) — no float division anywhere, so the whole
  * per-round profile crosses the DuckDB gate as hard integers.
  *
  * Scale shape: each round is ONE degree aggregate (shuffle on vertex id)
  * + one 2-value scalar read + two co-partitioned semi-joins to shrink the
  * edge set; rounds are logarithmic in |V|. The per-round profile is
  * O(log n) scalar pairs on the driver — never row data.
  */
object Densest {

  /** WEIGHTED peel profile — the same ε=1 greedy peel on weighted degree
    * (density = total edge weight / vertices; Σw plays m): remove every
    * vertex with wdeg·n ≤ 2·w2 where w2 = Σ over symmetric edges of the
    * integral weight. The ≥half-shrink argument carries over verbatim
    * (vertices above twice the average weighted degree hold less than
    * half the weight mass), so rounds stay ≤ ⌈log₂ n⌉. Columns:
    * (round, n_vertices, w2_weight, is_best).
    *
    * @param edgesW symmetrized weighted edges (src, dst, weight), integral
    */
  def peelProfileWeighted(spark: SparkSession, edgesW: DataFrame,
                          numPartitions: Int = 32,
                          maxRounds: Int = 64): DataFrame =
    Lineage.withLoopConf(spark, numPartitions) {
      var e = edgesW.select(col("src"), col("dst"),
          col("weight").cast("long").as("w"))
        .repartition(numPartitions, col("src"))
        .transform(Lineage.cut(_, eager = true))
      // scale-adaptive round parallelism (restored by withLoopConf's exit)
      spark.conf.set("spark.sql.shuffle.partitions",
        Lineage.adaptiveParallelism(e.count(), numPartitions).toString)
      val prof = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var n = -1L
      var round = 0
      while (n != 0L) {
        if (round >= maxRounds)
          throw new IllegalStateException(
            s"weighted densest peel did not drain in $maxRounds rounds")
        val deg = e.groupBy(col("src").as("id"))
          .agg(sum(col("w")).as("wdeg"))
          .transform(Lineage.cut(_))
        val row = deg.agg(count(lit(1)), coalesce(sum(col("wdeg")), lit(0L)))
          .head()
        n = row.getLong(0)
        val w2 = row.getLong(1)
        if (n > 0) {
          round += 1
          prof += ((round.toLong, n, w2))
          val keep = deg.where(col("wdeg") * lit(n) > lit(2L * w2))
            .select("id")
          e = e
            .join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
            .transform(Lineage.cut(_))
        }
      }
      val rows = prof.toSeq
      import spark.implicits._
      rows.map { case (r, nv, w2) =>
        val best = rows.forall { case (_, nj, w2j) => w2 * nj >= w2j * nv }
        (r, nv, w2, if (best) 1L else 0L)
      }.toDF("round", "n_vertices", "w2_weight", "is_best")
    }

  /** Peel profile: one row per executed round, measured BEFORE that
    * round's removal. Columns (all BIGINT): `round` (1-based),
    * `n_vertices` (vertices with ≥1 edge in the current subgraph),
    * `m2_edges` (directed half-edge count = 2× undirected edges),
    * `is_best` (1 on max-density rounds by exact rational compare).
    *
    * @param edges symmetrized simple undirected edge list (src, dst)
    */
  def peelProfile(spark: SparkSession, edges: DataFrame,
                  numPartitions: Int = 32,
                  maxRounds: Int = 64): DataFrame =
    Lineage.withLoopConf(spark, numPartitions) {
      var e = edges.select("src", "dst")
        .repartition(numPartitions, col("src"))
        .transform(Lineage.cut(_, eager = true))
      // scale-adaptive round parallelism (restored by withLoopConf's exit)
      spark.conf.set("spark.sql.shuffle.partitions",
        Lineage.adaptiveParallelism(e.count(), numPartitions).toString)
      val prof = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var n = -1L
      var round = 0
      while (n != 0L) {
        if (round >= maxRounds)
          throw new IllegalStateException(
            s"densest peel did not drain in $maxRounds rounds")
        val deg = e.groupBy(col("src").as("id"))
          .agg(count(lit(1)).as("deg"))
          .transform(Lineage.cut(_))
        // ONE action per round: vertex count + half-edge count off the
        // materialized degree table
        val row = deg.agg(count(lit(1)), coalesce(sum(col("deg")), lit(0L)))
          .head()
        n = row.getLong(0)
        val m2 = row.getLong(1)
        if (n > 0) {
          round += 1
          prof += ((round.toLong, n, m2))
          // keep deg·n > 2·m2 ⇔ deg > 2(1+ε)·m/n at ε=1; exact integers
          val keep = deg.where(col("deg") * lit(n) > lit(2L * m2))
            .select("id")
          e = e
            .join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
            .transform(Lineage.cut(_))
        }
      }
      // best round(s) by cross-multiplied rational density compare — the
      // profile is O(log n) driver-side scalars, not row data
      val rows = prof.toSeq
      import spark.implicits._
      rows.map { case (r, nv, m2) =>
        val best = rows.forall { case (_, nj, m2j) => m2 * nj >= m2j * nv }
        (r, nv, m2, if (best) 1L else 0L)
      }.toDF("round", "n_vertices", "m2_edges", "is_best")
    }
}
