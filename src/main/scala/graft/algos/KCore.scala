package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Lineage
import graft.graph.GraphOps

/** k-core peeling (coverage extension beyond LA3's four apps; the standard
  * companion analysis on link graphs). Each synchronous round removes every
  * vertex whose degree in the current surviving subgraph is < k; run to a
  * fixpoint this yields the k-core. Rounds are MATERIALIZED (one
  * localCheckpoint per round): each round references its predecessor three
  * times (degree agg + two semi-joins), so a lazily-composed unroll grows
  * 3^rounds subtrees — the same reason CC/PR materialize per superstep.
  * The fixed-round variant has an unrolled ANSI-SQL twin in
  * [[graft.OracleSql]].
  */
object KCore {

  /** `rounds` synchronous peels on the symmetrized simple graph.
    * Output: surviving vertices with their in-subgraph degree (id, deg).
    */
  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = GraphOps.symmetrize(edges).transform(Lineage.cut(_, eager = true))
    for (_ <- 1 to rounds) {
      val keep = e.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k)
        .select("id")
      e = e
        .join(keep.toDF("src"), Seq("src"), "left_semi")
        .join(keep.toDF("dst"), Seq("dst"), "left_semi")
        .select("src", "dst")
        .transform(Lineage.cut(_, eager = true))
    }
    e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
  }

  /** Peel to the true k-core: rounds until no vertex is removed; each round
    * materialized (lineage-truncated). ONE job per round: the lazy
    * localCheckpoint is materialized by the surviving-edge count (the same
    * pattern as LabelPropagation.run — never an eager checkpoint plus a
    * separate count). Returns ((id, deg), roundsRun).
    */
  def converged(edges: DataFrame, k: Int,
                maxRounds: Int = 100): (DataFrame, Int) = {
    var e = GraphOps.symmetrize(edges).transform(Lineage.cut(_, eager = true))
    var n = e.count()
    var r = 0
    var done = false
    while (r < maxRounds && !done) {
      val keep = e.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k)
        .select("id")
      val next = e
        .join(keep.toDF("src"), Seq("src"), "left_semi")
        .join(keep.toDF("dst"), Seq("dst"), "left_semi")
        .select("src", "dst")
        .transform(Lineage.cut(_))
      val m = next.count() // materializes + truncates lineage in one job
      done = m == n
      n = m
      e = next
      r += 1
    }
    (e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")), r)
  }
}
