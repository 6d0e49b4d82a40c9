package graft.algos

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Lineage
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
    override val partitionCountInvariant = true // exact min combine
  }

  /** Exact components to fixpoint. Input edges may be directed — they are
    * symmetrized here. Output: (id, component).
    *
    * `orientedInput = true` asserts the edges are a unique oriented
    * (src < dst) simple set (e.g. a co-purchase-derivation subset), so the
    * symmetrizing union needs no dedup shuffle; `symmetricInput = true`
    * asserts both directions are already present and symmetrize is skipped
    * outright. Both flags only remove provably no-op work — the HashMin
    * fixpoint is identical (r6, guide §2.1).
    */
  def run(spark: SparkSession, edges: DataFrame, cfg: SuperstepConfig,
          resume: Boolean = false, orientedInput: Boolean = false,
          symmetricInput: Boolean = false): SuperstepResult = {
    require(!(orientedInput && symmetricInput),
      "edges cannot be both oriented and symmetric")
    val und =
      if (symmetricInput) edges.select("src", "dst")
      else if (orientedInput) GraphOps.symmetrizeOriented(edges)
      else GraphOps.symmetrize(edges)
    val verts = GraphOps.vertices(und)
    val r = Superstep.run(spark, und, verts, CcProgram,
      cfg.copy(tol = 0.0), resume)
    r.copy(state = r.state.select(col("id"), col("label").as("component")))
  }

  /** Large-star/small-star components (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014): alternating star
    * contractions converge in O(log² n) ROUNDS regardless of diameter,
    * where [[run]]'s HashMin needs O(diameter) rounds — the scale path for
    * high-diameter graphs (chains of links, long dependency paths). Per
    * round:
    *
    *  - '''large-star''': every vertex u points its LARGER neighbors at
    *    m = min(N(u) ∪ u) — emit (v, m) for v ∈ N(u), v > u;
    *  - '''small-star''': u links its ≤-neighbors and itself to
    *    m = min({v ∈ N(u): v ≤ u} ∪ u) — emit (v, m) for those v plus
    *    (u, m).
    *
    * Both preserve connectivity and monotonically pull ids toward the
    * component minimum; at the fixpoint the edge set is a star forest
    * (v → component-min root). Convergence is detected on the edge
    * MULTISET (count + order-independent xxhash64 xor — one agg riding
    * the materializing action). Output ((id, component), rounds) — exact,
    * same result as [[run]], shared oracle.
    */
  def stars(spark: SparkSession, edges: DataFrame, numPartitions: Int = 32,
            maxRounds: Int = 200): (DataFrame, Int) = {
    // LAZY cuts + one fused prep action (r6): verts is only read by the
    // caller's final action; the initial signature aggregate materializes
    // the edge cache AND yields the row count the adaptive clamp needs, so
    // the old verts-cut / edge-cut / count / isEmpty prep (4 driver
    // round-trips, paid per stream_cc micro-batch fold) collapses to one.
    // The up-front repartition is dropped too: every round's aggregates
    // re-shuffle to the loop layout anyway, and min/xor-signature results
    // are partition-count-invariant.
    val verts = GraphOps.vertices(edges.select("src", "dst"))
      .transform(Lineage.cut(_))
    var e = edges.select("src", "dst").where(col("src") =!= col("dst"))
      .distinct()
      .transform(Lineage.cut(_))

    def nbrs(ed: DataFrame): DataFrame =
      ed.select(col("src").as("u"), col("dst").as("v"))
        .union(ed.select(col("dst").as("u"), col("src").as("v")))

    def largeStar(ed: DataFrame): DataFrame = {
      val t = nbrs(ed)
      val m = t.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      t.join(m, "u").where(col("v") > col("u"))
        .select(col("v").as("src"), col("m").as("dst"))
        .where(col("src") =!= col("dst")).distinct()
    }

    def smallStar(ed: DataFrame): DataFrame = {
      val t = nbrs(ed)
      // least() skips nulls, so vertices with no ≤-neighbor fall back to u
      val m = t.groupBy("u")
        .agg(least(min(when(col("v") <= col("u"), col("v"))),
          col("u")).as("m"))
      val linked = t.where(col("v") <= col("u"))
        .join(m, "u")
        .select(col("v").as("src"), col("m").as("dst"))
      val self = m.select(col("u").as("src"), col("m").as("dst"))
      linked.union(self)
        .where(col("src") =!= col("dst")).distinct()
    }

    // order-independent multiset signature: count + xor of row hashes
    // (xor, not sum — ANSI mode makes a long-sum overflow throw, and the
    // distinct edge set cannot cancel xor terms)
    def sig(ed: DataFrame): (Long, Long) = {
      val r = ed.agg(count(lit(1)),
        expr("bit_xor(xxhash64(src, dst))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var s = sig(e) // ONE prep action: materializes e, counts it, empty-checks
    val nEff = Lineage.adaptiveParallelism(s._1, numPartitions)
    Lineage.withLoopConf(spark, nEff) {
    var rounds = 0
    var done = s._1 == 0L
    while (rounds < maxRounds && !done) {
      val next = smallStar(largeStar(e))
        .repartition(nEff, col("src"))
        .transform(Lineage.cut(_))
      val s2 = sig(next) // materializes the round in one job
      done = s2 == s
      s = s2
      e = next
      rounds += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"star contraction did not converge in $maxRounds rounds")
    // fixpoint edge set is a star forest (v → root); isolated vertices are
    // their own component
    val comp = verts
      .join(e.select(col("src").as("id"), col("dst").as("root")),
        Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("root"), col("id")).as("component"))
    (comp, rounds)
    }
  }

  /** Incremental connected components — the daily-delta production path:
    * fold a batch of NEW edges into an existing labeling without
    * re-traversing the full graph. The delta edges are projected onto
    * COMPONENT ids (one join against the prior labels), components are
    * merged by running [[stars]] on that contracted graph — it has at most
    * one vertex per touched component + new vertex, orders of magnitude
    * smaller than the input graph — and the result maps back over the
    * prior labels with one join. Prior labels are component-minimum ids
    * (what [[run]] and [[stars]] emit), so the contracted minima are
    * exactly the union graph's component minima: the output matches a
    * from-scratch run over old ∪ delta edges (shared closure oracle).
    *
    * At 100 TB this touches the full vertex set only in the final
    * label-rewrite join; everything proportional to work actually runs on
    * |delta| + |touched components|.
    */
  def incremental(spark: SparkSession, labels: DataFrame,
                  deltaEdges: DataFrame, cfg: SuperstepConfig): DataFrame = {
    // LAZY cuts (r6): stars()'s first signature action materializes lab,
    // delta and compEdges in ONE job instead of three eager round-trips —
    // stream_cc pays this prep per micro-batch fold
    val lab = labels.select(col("id"), col("component"))
      .transform(Lineage.cut(_))
    val delta = GraphOps.simplify(deltaEdges.select("src", "dst"))
      .transform(Lineage.cut(_))
    val compEdges = delta
      .join(lab.select(col("id").as("src"), col("component").as("csrc")),
        Seq("src"), "left_outer")
      .join(lab.select(col("id").as("dst"), col("component").as("cdst")),
        Seq("dst"), "left_outer")
      .select(coalesce(col("csrc"), col("src")).as("src"),
        coalesce(col("cdst"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .transform(Lineage.cut(_))
    val merged = stars(spark, compEdges, cfg.numPartitions)._1
      .select(col("id").as("component"), col("component").as("newcomp"))
    val newVerts = GraphOps.vertices(delta)
      .join(lab.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    lab.unionByName(newVerts)
      .join(merged, Seq("component"), "left_outer")
      .select(col("id"),
        coalesce(col("newcomp"), col("component")).as("component"))
  }

  /** Robustness-after-hub-removal census (targeted-attack percolation,
    * Albert/Jeong/Barabási, Nature 406, 2000): drop the `k` highest-degree
    * vertices (deterministic (deg desc, id) tie-break), re-run HashMin CC
    * over the surviving edges, and report a 1-row component census
    * (n_components, max_comp, n_left). Vertices whose every edge touched a
    * hub vanish with their edges — the census counts vertices that still
    * have ≥1 edge, the same reading the oracle closure takes.
    *
    * The hub list is a top-k (driver-size) sort+limit; the removal is two
    * broadcast anti-joins; the rest is [[run]]'s cost.
    */
  def hubAttackCensus(spark: SparkSession, undirected: DataFrame, k: Int,
                      cfg: SuperstepConfig): DataFrame = {
    val e0 = undirected.select("src", "dst")
    val deg = e0.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val hubs = deg.orderBy(col("deg").desc, col("id")).limit(k).select("id")
    val e = e0
      .join(hubs.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
      .join(hubs.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
    // removal is endpoint-symmetric, so the surviving edge set is still
    // symmetric — re-symmetrizing would double then dedup 4.8M rows (r6)
    val comp = run(spark, e, cfg, symmetricInput = true).state
    comp.groupBy("component").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).cast("long").as("n_components"),
        max("sz").cast("long").as("max_comp"),
        sum("sz").cast("long").as("n_left"))
  }
}
