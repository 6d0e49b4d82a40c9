package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Lineage

/** Deterministic hash-seeded random walks — the graph-embedding corpus
  * generator shape (DeepWalk: Perozzi, Al-Rfou & Skiena, KDD 2014;
  * node2vec: Grover & Leskovec, KDD 2016), derandomized with md5
  * priorities per the engine's Mis/Matching discipline: at step t the
  * walker at v moves to argmin_{w∈N(v)} md5(v||':'||t||':'||w). The
  * choice is uniform-ish over neighbors, reproducible in any engine with
  * md5 (the DuckDB twin replays the identical trajectory), and varies per
  * step so walks don't lock into 2-cycles deterministically.
  *
  * Scale shape: one hash join frontier⋈edges + one min_by aggregate on
  * the walker key per step — the frontier is |starts| rows regardless of
  * graph size, so per-step shuffle volume is O(Σ deg(cur)), never |E|.
  * The tie-break suffix (zero-padded neighbor id) makes the argmin a
  * total order even under md5 collisions, keeping the gate deterministic.
  */
object Walks {

  /** `edges`: directed adjacency (pre-symmetrize for undirected walks);
    * `starts`: one-column (id) frame of walk origins. Returns
    * (start_id, path, end_id) after `steps` hops; a walker at a sink
    * keeps its position (path unextended).
    */
  def walks(edges: DataFrame, starts: DataFrame, steps: Int): DataFrame = {
    val e = edges.select("src", "dst").transform(Lineage.cut(_, eager = true))
    var cur = starts.select(col("id").as("start_id"), col("id").as("cur"),
      col("id").cast("string").as("path"))
    for (t <- 1 to steps) {
      val joined = cur.join(e.withColumnRenamed("src", "cur"), Seq("cur"),
        "left_outer")
        .withColumn("pri",
          concat(md5(concat_ws(":", col("cur"), lit(t), col("dst"))),
            lpad(col("dst").cast("string"), 20, "0")))
      cur = joined.groupBy("start_id")
        .agg(max(col("cur")).as("prev"), max(col("path")).as("path0"),
          min_by(col("dst"), col("pri")).as("nxt"))
        .select(col("start_id"),
          coalesce(col("nxt"), col("prev")).as("cur"),
          when(col("nxt").isNotNull,
            concat(col("path0"), lit("->"), col("nxt").cast("string")))
            .otherwise(col("path0")).as("path"))
      if (t < steps) cur = cur.transform(Lineage.cut(_, eager = true))
    }
    cur.select(col("start_id"), col("path"), col("cur").as("end_id"))
  }
}
