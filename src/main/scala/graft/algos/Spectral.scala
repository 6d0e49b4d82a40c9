package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Lineage

/** SALSA and eigenvector centrality in exact-integer fixed-k forms — the
  * same oracle-parity discipline as [[Hits]]: no float normalization, so
  * every intermediate score is a BIGINT both engines reproduce bit-exactly.
  */
object Spectral {

  /** SALSA (Lempel & Moran, "The stochastic approach for link-structure
    * analysis", WWW 2000): HITS with the adjacency matrix replaced by its
    * row/column-stochastic normalizations — a random walk alternating
    * hub→auth→hub sides. Spelled in fixed-point micro-units with FLOOR
    * division (`div` here, `//` in DuckDB — identical semantics on
    * non-negative BIGINTs), so the full trajectory is integer-exact:
    * h₀ ≡ 10¹², then per round
    * a(v) = Σ_{u→v} h(u) div outdeg(u), h(u) = Σ_{u→v} a(v) div indeg(v).
    *
    * The division happens per VERTEX before the edge join (one
    * co-partitioned deg join on the |V|-row score table), so each round is
    * two join+hash-agg shuffles of |V| rows — the HITS/PageRank superstep
    * shape. Stochastic updates preserve total mass (≤ Σh₀ = |hubs|·10¹²),
    * so scores stay ~6 digits under the BIGINT ceiling at any |V| ≤ 10⁶·
    * larger graphs shrink per-vertex mass, never grow it.
    */
  def salsa(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val e = edges.select("src", "dst").transform(Lineage.cut(_, eager = true))
    val outd = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
      .transform(Lineage.cut(_, eager = true))
    val ind = e.groupBy(col("dst").as("id")).agg(count(lit(1)).as("indeg"))
      .transform(Lineage.cut(_, eager = true))
    var h = outd.select(col("id"), lit(1000000000000L).as("h"))
    var a: DataFrame = null
    for (i <- 1 to k) {
      val hd = h.join(outd.hint("shuffle_hash"), "id")
        .select(col("id").as("src"), expr("h div outdeg").as("hd"))
      a = e.join(hd.hint("shuffle_hash"), "src")
        .groupBy(col("dst").as("id")).agg(sum("hd").cast("long").as("a"))
        .transform(Lineage.cut(_))
      val ad = a.join(ind.hint("shuffle_hash"), "id")
        .select(col("id").as("dst"), expr("a div indeg").as("ad"))
      h = e.join(ad.hint("shuffle_hash"), "dst")
        .groupBy(col("src").as("id")).agg(sum("ad").cast("long").as("h"))
      // lazy per-round cuts: one pipelined job at the caller's action
      if (i < k) h = h.transform(Lineage.cut(_))
    }
    h.select(col("id"), lit("hub").as("kind"), col("h").as("score"))
      .unionByName(
        a.select(col("id"), lit("auth").as("kind"), col("a").as("score")))
  }

  /** Eigenvector centrality by power iteration with per-round integer
    * max-normalization: x₀ ≡ 10⁶, then y = A·x (one src-equi join + one
    * dst hash-agg) and x = y·10⁶ div max(y) — the max is a 1-row broadcast
    * cross-join, and the floor division keeps the trajectory BIGINT-exact
    * in both engines (rankings match float power iteration; normalization
    * is a positive per-round scalar). Overflow budget: y ≤ maxdeg·10⁶ and
    * y·10⁶ ≤ maxdeg·10¹² — 6 digits of headroom at maxdeg 10⁶.
    *
    * Isolated-in-degree vertices leave the frame after round 1 (score 0),
    * the standard reading on a directed/symmetrized edge set.
    */
  def eigenvector(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val e = edges.select("src", "dst").transform(Lineage.cut(_, eager = true))
    var x = e.select(col("src").as("id")).distinct()
      .select(col("id"), lit(1000000L).as("x"))
    for (i <- 1 to k) {
      // lazy cut: y is referenced twice (max-normalizer build + output
      // projection) — uncut, the broadcast build re-executed the round's
      // join+agg a second time every round (r6; the eigen4 2× join)
      val y = e.join(x.withColumnRenamed("id", "src")
          .hint("shuffle_hash"), "src")
        .groupBy(col("dst").as("id")).agg(sum("x").cast("long").as("y"))
        .transform(Lineage.cut(_))
      val m = y.agg(max("y").as("m"))
      x = y.crossJoin(broadcast(m))
        .select(col("id"), expr("(y * 1000000) div m").as("x"))
      if (i < k) x = Lineage.cut(x)
    }
    x.select(col("id"), col("x").as("score"))
  }
}
