package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.GraphOps

/** Maximal matching — the [[Mis]] recipe on the line graph, without
  * materializing it: an edge joins the matching when its md5 priority
  * strictly beats every adjacent edge's (adjacency = shared endpoint),
  * which — priorities being distinct — is exactly "maximal at BOTH
  * endpoints", two per-vertex aggregations per round instead of an
  * edge×edge join. Winners' endpoints leave; incident edges drop out;
  * repeat until no edge remains — expected O(log m) rounds.
  *
  * Priorities are md5 over the canonical "src:dst" string, so the DuckDB
  * twin reproduces every round byte-for-byte (oracle-parity discipline);
  * the all-matched fixpoint is stable under extra rounds → over-unrolled
  * CTE oracle. Output: the matching's canonical (src < dst) edges.
  * Spec pins validity (no shared endpoints), maximality (every dropped
  * edge touches a matched vertex), and exact equality with a sequential
  * reference using the same priorities.
  */
object Matching {

  def run(spark: SparkSession, edges: DataFrame, numPartitions: Int = 32,
          maxRounds: Int = 100): (DataFrame, Int) = {
    var active = GraphOps.orient(edges) // canonical src<dst simple edges
      .select(col("src"), col("dst"),
        md5(concat_ws(":", col("src"), col("dst"))).as("p"))
      .repartition(numPartitions, col("src"))
      .localCheckpoint(true)
    var nActive = active.count()
    var matched = spark.range(0)
      .select(col("id").as("src"), col("id").as("dst"))
    var r = 0
    while (nActive > 0 && r < maxRounds) {
      // per-endpoint max priority over incident ACTIVE edges
      val byV = active.select(col("src").as("v"), col("p"))
        .union(active.select(col("dst").as("v"), col("p")))
        .groupBy("v").agg(max(col("p")).as("mp"))
      val winners = active
        .join(byV.toDF("src", "mps"), "src")
        .join(byV.toDF("dst", "mpd"), "dst")
        .where(col("p") === col("mps") && col("p") === col("mpd"))
        .select("src", "dst")
      // vertices consumed by this round's winners
      val used = winners.select(col("src").as("v"))
        .union(winners.select(col("dst").as("v"))).distinct()
      matched = matched.unionByName(winners).localCheckpoint(true)
      active = active
        .join(used.toDF("src"), Seq("src"), "left_anti")
        .join(used.toDF("dst"), Seq("dst"), "left_anti")
        .localCheckpoint(false)
      nActive = active.count()
      r += 1
    }
    if (nActive > 0)
      throw new IllegalStateException(
        s"matching did not drain $nActive edges in $maxRounds rounds")
    (matched, r)
  }
}
