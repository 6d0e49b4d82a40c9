package graft.algos

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Superstep, SuperstepConfig, SuperstepResult, VertexProgram}
import graft.graph.GraphOps

/** HashMin connected components (SURVEY.md §2.4 A2): symmetrize, label =
  * min vertex id in component, non-stationary frontier until fixpoint.
  * Integer domain → exact-match correctness gate.
  */
object ConnectedComponents {

  private object CcProgram extends VertexProgram {
    val name = "cc"
    def initState(vertices: DataFrame): DataFrame =
      vertices.select(col("id"), col("id").as("label"))
    def gatherExpr: Column = col("label")
    def gatherStateColumns: Seq[String] = Seq("label")
    override def usesEdgeWeight: Boolean = false
    def combineExpr(msg: Column): Column = min(msg)
    def applyState(state: DataFrame, msgs: DataFrame): DataFrame =
      state.join(msgs, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("label"), col("agg")).as("label"),
          (col("agg").isNotNull && col("agg") < col("label")).as("changed"))
    val isStationary = false
  }

  /** Exact components to fixpoint. Input edges may be directed — they are
    * symmetrized here. Output: (id, component).
    */
  def run(spark: SparkSession, edges: DataFrame, cfg: SuperstepConfig,
          resume: Boolean = false): SuperstepResult = {
    val und = GraphOps.symmetrize(edges)
    val verts = GraphOps.vertices(und)
    val r = Superstep.run(spark, und, verts, CcProgram,
      cfg.copy(tol = 0.0), resume)
    r.copy(state = r.state.select(col("id"), col("label").as("component")))
  }
}
