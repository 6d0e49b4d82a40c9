package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Lineage

/** Temporal (time-respecting) graph reachability — the contagion /
  * information-diffusion primitive over timestamped edge sets (Holme &
  * Saramäki, "Temporal networks", Phys. Rep. 519, 2012). A vertex v is
  * reached at time t iff some already-reached u has an edge (u, v, t) with
  * t ≥ arrival(u): paths must respect edge timestamps, so static
  * reachability over-counts (it follows edges "back in time").
  *
  * Earliest-arrival is a monotone min fixpoint — exactly the HashMin shape
  * (SURVEY.md §2.4 C5/C6) with the frontier filter `t >= arrival(src)`
  * layered onto the scatter join — so the unrolled DuckDB twin gates it
  * value-exactly ([[graft.OracleSql]] `temporal_reach4`).
  *
  * Scale shape: each round is ONE equi-join on src (the timestamp guard is
  * a post-join filter, never a range-join plan) + one min hash-agg on dst +
  * one full-outer min-merge, all co-partitioned on the vertex key;
  * per-round state is (id, arrival) LONGs. Rounds are materialized through
  * [[Lineage.cut]] (stats-clamped) like every other iterative kernel.
  */
object Temporal {

  /** Earliest-arrival reachability from `seeds` over timestamped directed
    * edges, truncated at `rounds` hops.
    *
    * @param edges (src: long, dst: long, t: long) — t in any monotone
    *              integer unit (epoch micros here)
    * @param seeds (id: long, arrival: long)
    * @return (id, arrival) for every vertex reached within `rounds` hops
    */
  def earliestArrival(edges: DataFrame, seeds: DataFrame,
                      rounds: Int): DataFrame = {
    val e = Lineage.cut(edges.select("src", "dst", "t"))
    var arr = Lineage.cut(seeds.select("id", "arrival"))
    for (_ <- 1 to rounds) {
      val upd = e.join(arr, e("src") === arr("id"))
        .where(col("t") >= col("arrival"))
        .groupBy(col("dst").as("uid")).agg(min(col("t")).as("na"))
      val merged = arr.join(upd, arr("id") === upd("uid"), "full_outer")
        .select(coalesce(col("id"), col("uid")).as("id"),
          least(coalesce(col("arrival"), col("na")),
            coalesce(col("na"), col("arrival"))).as("arrival"))
      arr = Lineage.cut(merged)
    }
    arr
  }
}
