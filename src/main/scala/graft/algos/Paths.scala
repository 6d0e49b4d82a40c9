package graft.algos

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Superstep, SuperstepConfig, SuperstepResult, VertexProgram}
import graft.graph.GraphOps

/** BFS and SSSP (SURVEY.md §2.4 A5) — the min-plus semiring on the same
  * superstep kernel as CC; non-stationary frontier = vertices whose
  * distance improved. Integer weights ⇒ exact results.
  */
object Paths {

  private final class MinPlusProgram(sourceId: Long) extends VertexProgram {
    val name = "sssp"
    def initState(vertices: DataFrame): DataFrame =
      vertices.select(col("id"),
        when(col("id") === lit(sourceId), lit(0.0)).otherwise(lit(null)
          .cast("double")).as("dist"))
    def gatherExpr: Column = col("dist") + col("weight")
    def gatherStateColumns: Seq[String] = Seq("dist")
    def combineExpr(msg: Column): Column = min(msg)
    def applyState(state: DataFrame, msgs: DataFrame): DataFrame =
      state.join(msgs, Seq("id"), "left_outer")
        .select(col("id"), least(col("dist"), col("agg")).as("dist"),
          (col("agg").isNotNull &&
            (col("dist").isNull || col("agg") < col("dist"))).as("changed"))
    val isStationary = false
  }

  /** Converged single-source shortest paths. `edges` needs (src, dst
    * [, weight]); missing weight = 1.0 (BFS). Unreached vertices keep null.
    */
  def sssp(spark: SparkSession, edges: DataFrame, sourceId: Long,
           cfg: SuperstepConfig, resume: Boolean = false): SuperstepResult = {
    val verts = GraphOps.vertices(edges.select("src", "dst"))
    Superstep.run(spark, edges, verts, new MinPlusProgram(sourceId),
      cfg.copy(tol = 0.0), resume)
  }

  /** k rounds of min-plus relaxation (Bellman-Ford unrolled — distance
    * over paths of ≤ k edges). Matches the unrolled DuckDB SQL exactly;
    * weights must be integral for the exact gate. The source is a one-row
    * DataFrame (e.g. min vertex id) cross-joined in. Each round references
    * the previous round's frame twice (relax + carry-forward), which would
    * double the plan per round (2^k leaf copies — measured 45s at sf0.1
    * for k=5); rounds are therefore localCheckpoint-materialized.
    */
  def fixedRounds(edges: DataFrame, source: DataFrame, k: Int,
                  weighted: Boolean): DataFrame = {
    // The edge table is loop-invariant but each eagerly-materialized round
    // would otherwise re-execute its (possibly expensive) derivation plan —
    // measured k+1 recomputes of the co-purchase self-join (bfs5 63.5 s vs
    // pr5 18.5 s on the same graph). Materialize it once up front.
    val e = (
      if (weighted) edges.select(col("src"), col("dst"),
        col("weight").cast("double"))
      else edges.select(col("src"), col("dst"), lit(1.0).as("weight"))
    ).localCheckpoint(true)
    val verts = GraphOps.vertices(e)
    var dist = verts.crossJoin(broadcast(source.toDF("s0")))
      .select(col("id"),
        when(col("id") === col("s0"), lit(0.0))
          .otherwise(lit(null).cast("double")).as("dist"))
    for (i <- 1 to k) {
      val msgs = e.join(dist.where(col("dist").isNotNull)
          .withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), (col("dist") + col("weight")).as("nd"))
        .groupBy("id").agg(min(col("nd")).as("nd"))
      dist = dist.join(msgs, Seq("id"), "left_outer")
        .select(col("id"), least(col("dist"), col("nd")).as("dist"))
      if (i < k) dist = dist.localCheckpoint(true)
    }
    dist
  }
}
