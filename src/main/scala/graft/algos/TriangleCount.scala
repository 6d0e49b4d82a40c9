package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.GraphOps

/** Triangle counting (SURVEY.md §2.4 A4, §3.3): orient each undirected edge
  * a<b, build wedges a<b<c with two joins, close with a left-semi join —
  * each triangle counted exactly once. Not the iterate kernel: LA3's TC is
  * likewise a two-phase neighborhood-exchange + intersection app.
  *
  * Scale notes: wedge generation is the quadratic-in-degree step — the
  * oriented b-join fans out by forward-degree only (orientation caps hub
  * blowup: a hub's wedge count depends on its higher-id neighbors only),
  * and AQE skew-join covers residual skew. The closing join is left-semi
  * (no payload moves).
  */
object TriangleCount {

  /** Global triangle count; single row (triangles: long). */
  def count(edges: DataFrame): DataFrame = {
    val e = GraphOps.orient(edges)
    val e1 = e.select(col("src").as("a"), col("dst").as("b"))
    val e2 = e.select(col("src").as("b"), col("dst").as("c"))
    val wedges = e1.join(e2, "b").select("a", "c")
    val closing = e.select(col("src").as("a"), col("dst").as("c"))
    wedges.join(closing, Seq("a", "c"), "left_semi")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("triangles"))
  }

  /** Per-vertex triangle participation counts (id, tri_cnt) — each closed
    * wedge credits all three corners.
    */
  def perVertex(edges: DataFrame): DataFrame = {
    val e = GraphOps.orient(edges)
    val e1 = e.select(col("src").as("a"), col("dst").as("b"))
    val e2 = e.select(col("src").as("b"), col("dst").as("c"))
    val wedges = e1.join(e2, "b").select("a", "b", "c")
    val closing = e.select(col("src").as("a"), col("dst").as("c"))
    val tris = wedges.join(closing, Seq("a", "c"), "left_semi")
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("tri_cnt"))
  }
}
