package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Lineage
import graft.graph.GraphOps

/** k-truss peeling (SURVEY.md §10 round-4 queue item 3): the maximal
  * subgraph in which every edge closes ≥ k−2 triangles WITHIN the
  * subgraph — the standard cohesion companion to [[TriangleCount]] and
  * [[KCore]] (edge-level where k-core is vertex-level).
  *
  * Each synchronous round re-enumerates triangles over the surviving edge
  * set with [[TriangleCount]]'s wedge machinery — degree-ordered
  * orientation (√(2m) forward-degree bound on the wedge fan-out), one
  * self-join for wedges, left-semi closing — credits each triangle's three
  * edges in canonical (min,max) form, and drops edges with support < k−2.
  * Rounds are materialized with the 1-job lazy-checkpoint+count pattern
  * (KCore's); peeling is monotone, so the fixpoint is stable under extra
  * rounds and the driver oracle is an over-unrolled CTE chain
  * (the kcore3_converged recipe, [[graft.OracleSql]]).
  */
object Truss {

  /** Per-edge triangle support (common-neighbor count) over a canonical
    * (src<dst) simple edge set, INCLUDING zero-support edges — the
    * cohesion profile (which edges are embedded in dense neighborhoods vs
    * bridges) that truss peeling consumes as its round-0 table and that a
    * pipeline reads directly for edge-strength features. One degree-
    * oriented wedge enumeration (√(2m)-bounded fan-out) plus a coalescing
    * left join back onto the edge list.
    */
  def edgeSupport(edges: DataFrame): DataFrame =
    edges.select("src", "dst")
      .join(supports(edges.select("src", "dst")), Seq("src", "dst"), "left")
      .select(col("src"), col("dst"),
        coalesce(col("support"), lit(0L)).as("support"))

  /** Per-edge triangle support over the current canonical (src<dst) edge
    * set. Edges in no triangle simply have no row (support 0).
    */
  private def supports(e: DataFrame): DataFrame = {
    val deg = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val fwd = e.join(deg.toDF("src", "dsrc").hint("shuffle_hash"), "src")
      .join(deg.toDF("dst", "ddst").hint("shuffle_hash"), "dst")
    val srcFirst = col("dsrc") < col("ddst") ||
      (col("dsrc") === col("ddst") && col("src") < col("dst"))
    // materialized lazily: three plan legs below reference the oriented
    // set; the caller's count materializes everything in one job
    val o = fwd.select(
        when(srcFirst, col("src")).otherwise(col("dst")).as("src"),
        when(srcFirst, col("dst")).otherwise(col("src")).as("dst"))
      .transform(Lineage.cut(_))
    val e1 = o.select(col("src").as("a"), col("dst").as("b"))
    val e2 = o.select(col("src").as("b"), col("dst").as("c"))
    val wedges = e1.join(e2.hint("shuffle_hash"), "b").select("a", "b", "c")
    val closing = o.select(col("src").as("a"), col("dst").as("c"))
    val tris = wedges.join(closing.hint("shuffle_hash"), Seq("a", "c"),
      "left_semi")
    tris.select(explode(array(
        struct(least(col("a"), col("b")).as("src"),
          greatest(col("a"), col("b")).as("dst")),
        struct(least(col("b"), col("c")).as("src"),
          greatest(col("b"), col("c")).as("dst")),
        struct(least(col("a"), col("c")).as("src"),
          greatest(col("a"), col("c")).as("dst")))).as("ed"))
      .select(col("ed.src").as("src"), col("ed.dst").as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("support"))
  }

  /** Peel to the k-truss fixpoint (k ≥ 3). Output: surviving canonical
    * edges with their final in-truss support ((src, dst, support), src <
    * dst), plus the number of peel rounds run.
    */
  def converged(edges: DataFrame, k: Int,
                maxRounds: Int = 100): (DataFrame, Int) = {
    require(k >= 3, s"k-truss needs k >= 3 (got $k)")
    val spark = edges.sparkSession
    var e = GraphOps.orient(edges).transform(Lineage.cut(_, eager = true))
    var n = e.count()
    val req = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    Lineage.withAdaptiveLoopConf(spark, n, req) { _ =>
    var lastSupp = spark.range(0)
      .select(col("id").as("src"), col("id").as("dst"),
        col("id").as("support"))
    var r = 0
    var done = n == 0
    while (r < maxRounds && !done) {
      // supp is lazily checkpointed too: the count below caches it, so the
      // post-loop output read is served from cache instead of re-running
      // the final wedge join
      val supp = supports(e).transform(Lineage.cut(_))
      val next = supp.where(col("support") >= k - 2).select("src", "dst")
        .transform(Lineage.cut(_))
      val m = next.count() // materializes supp's round in one job
      lastSupp = supp
      done = m == n
      n = m
      e = next
      r += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"k-truss did not converge in $maxRounds rounds")
    // at the fixpoint the last support table was computed ON the surviving
    // set, so its ≥ k−2 rows are the final edges with final support
    (lastSupp.where(col("support") >= k - 2), r)
    }
  }
}
