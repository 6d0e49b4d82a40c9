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
      val upd = e.join(arr.hint("shuffle_hash"), e("src") === arr("id"))
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

  /** Time-respecting wedge census (the 2-path temporal motif of Paranjape,
    * Benson & Leskovec, "Motifs in temporal networks", WSDM 2017): count,
    * per mid vertex m, the ordered pairs a→t₁→m→t₂→b with a ≠ b and
    * t₁ ≤ t₂ ≤ t₁ + delta.
    *
    * Both legs join ON the mid key — co-partitioned, one shuffle each — and
    * the timestamp guard is a post-join filter (never a range-join plan).
    * The per-mid fan-out is deg(m)², so mids with degree > `maxDeg` are
    * excluded up front (the hot-center cap discipline of neighborJaccard);
    * the cap is part of the declared semantics and mirrored by the oracle.
    *
    * @param edges (src, dst, t) timestamped directed edges, deduplicated
    * @return (m, wedges) for every qualifying mid with ≥1 wedge
    */
  def timeWedges(edges: DataFrame, delta: Long, maxDeg: Long): DataFrame = {
    val te = edges.select("src", "dst", "t")
    val ok = te.groupBy(col("src").as("m")).agg(count(lit(1)).as("d"))
      .where(col("d") <= maxDeg).select("m")
    val e1 = te.select(col("src").as("a"), col("dst").as("m"),
      col("t").as("t1"))
    val e2 = te.select(col("src").as("m"), col("dst").as("b"),
      col("t").as("t2"))
    e1.join(ok, "m").join(e2, "m")
      .where(col("a") =!= col("b") && col("t2") >= col("t1") &&
        col("t2") <= col("t1") + lit(delta))
      .groupBy(col("m")).agg(count(lit(1)).as("wedges"))
  }
}
