package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Lineage

/** Synchronous level-1 Louvain: `rounds` rounds of simultaneous
  * best-neighbour-community moves under the exact integer modularity gain
  * (Blondel et al., "Fast unfolding of communities in large networks",
  * J. Stat. Mech. 2008 — the move rule of phase 1, made deterministic and
  * parallel in the label-propagation style).
  *
  * For vertex i and candidate community c the 2m-scaled gain of adopting c
  * is `G(c) = 2m·k_{i,in}(c) − k_i·(Σtot(c) − k_i·[i∈c])` — every term an
  * exact BIGINT with integral edge weights, so the full 4-round trajectory
  * is value-reproducible in DuckDB ([[graft.OracleSql]] `louvain4` unrolls
  * the same rounds; constant terms of the textbook ΔQ cancel across
  * candidates, and the `[i∈c]` correction prices "stay" with Σtot taken
  * over c∖{i}). Every vertex moves simultaneously to its argmax community
  * (ties → smallest community id), the synchronous variant used by
  * distributed Louvain implementations; a fixed round budget bounds the
  * oscillation such schedules allow.
  *
  * Scale shape per round: one edge⋈label join co-partitioned on the vertex
  * key + a (vertex, community) hash-agg for k_in; one tiny per-community
  * sum for Σtot; one broadcast-size 1-row 2m factor; argmax as TWO
  * hash-aggs (max g, then min community at the max — the two-phase MSF
  * discipline, never a struct min_by SortAggregate). State is one LONG
  * label per vertex.
  */
object Louvain {

  /** @param edges symmetrized weighted edges (src, dst, weight), no
    *              self-loops, both directions present
    * @return (id, comm) after `rounds` synchronous move rounds
    */
  def rounds(edges: DataFrame, rounds: Int): DataFrame = {
    val e = Lineage.cut(edges.select(col("src"), col("dst"),
      col("weight").cast("long").as("w")))
    val kt = Lineage.cut(
      e.groupBy(col("src").as("id")).agg(sum("w").cast("long").as("k")))
    val m2 = e.agg(sum("w").cast("long").as("m2"))
    var c = Lineage.cut(e.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comm")))
    for (_ <- 1 to rounds) {
      val sig = kt.join(c, "id")
        .groupBy("comm").agg(sum("k").cast("long").as("sig"))
      val kin = e.join(c.select(col("id").as("did"), col("comm")),
          e("dst") === col("did"))
        .select(e("src").as("id"), col("comm"), col("w").as("kin"))
        .unionByName(c.select(col("id"), col("comm"), lit(0L).as("kin")))
        .groupBy("id", "comm").agg(sum("kin").cast("long").as("kin"))
      val score = kin
        .join(c.select(col("id"), col("comm").as("cur")), "id")
        .join(sig, "comm")
        .join(kt, "id")
        .crossJoin(broadcast(m2))
        .select(col("id"), col("comm"),
          (col("m2") * col("kin") - col("k") *
            (col("sig") - when(col("comm") === col("cur"), col("k"))
              .otherwise(lit(0L)))).as("g"))
      // single-pass argmax (r6): max_by over (g, -comm) ≡ the old two-phase
      // max-g-then-min-comm (ties on g are broken by the larger -comm =
      // smaller comm) — one aggregate instead of agg + join + agg per
      // round, the LabelPropagation mode-vote spelling
      val next = score.groupBy(col("id"))
        .agg(max_by(col("comm"),
          struct(col("g"), (-col("comm")).as("nc"))).as("comm"))
      c = Lineage.cut(next)
    }
    c
  }

  /** Louvain phase 2 — community coarsening: contract each community to a
    * super-vertex and aggregate edge weights between communities, producing
    * the graph the next Louvain level runs on. Convention: the diagonal
    * (comm_src = comm_dst) carries 2× the intra-community mass (both
    * directions of each intra edge survive the `cs ≤ cd` canonicalization),
    * matching the 2m scaling of the phase-1 gain; off-diagonal rows carry
    * each undirected inter-community weight once.
    *
    * Two label joins co-partitioned on the edge endpoints + one
    * map-side-combinable pair agg; output size is communities², usually
    * orders of magnitude below the input.
    */
  def coarsen(edges: DataFrame, labels: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"), col("weight").cast("long").as("w"))
      .join(labels.toDF("src", "cs"), "src")
      .join(labels.toDF("dst", "cd"), "dst")
      .where(col("cs") <= col("cd"))
      .groupBy(col("cs").as("comm_src"), col("cd").as("comm_dst"))
      .agg(sum("w").cast("long").as("weight"))
}
