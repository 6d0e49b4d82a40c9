package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Lineage
import graft.graph.GraphOps

/** Synchronous label propagation (SURVEY.md §2.4 A3, §5.3): label₀ = id;
  * each round every vertex adopts the MODE of its in-neighbors' labels,
  * ties broken toward the smallest label; a vertex with no in-neighbors
  * keeps its label. The mode-with-tiebreak ⊕ doesn't fit a single built-in
  * aggregate, so LP runs a two-level aggregation instead of the
  * [[graft.engine.Superstep]] kernel (SURVEY.md §2.6): groupBy(dst, label)
  * count, then max_by(label, (count, -label)) — deterministic, which is
  * what makes the exact-match gate achievable.
  */
object LabelPropagation {

  /** One synchronous round; withFlag adds a `chg` column so the convergence
    * check can ride the materializing aggregate instead of a second action.
    *
    * `allIn = true` asserts every vertex has at least one in-neighbor (true
    * for any symmetrized graph) — then the mode exists for every vertex,
    * the keep-label carry join disappears, and the round references the
    * previous labels ONCE. That turns a lazily-composed k-round batch from
    * ~2^k plan leaves into a linear chain, which is what lets [[run]] batch
    * more rounds per action on undirected graphs.
    */
  private def round(edges: DataFrame, labels: DataFrame,
                    withFlag: Boolean = false,
                    allIn: Boolean = false): DataFrame = {
    val msgs = edges.join(labels.withColumnRenamed("id", "src")
        .hint("shuffle_hash"), "src")
      .groupBy(col("dst"), col("label"))
      .agg(count(lit(1)).as("cnt"))
    val best = msgs.groupBy(col("dst").as("id"))
      .agg(max_by(col("label"),
        struct(col("cnt"), (-col("label")).as("nl"))).as("newlabel"))
    if (allIn && !withFlag)
      best.select(col("id"), col("newlabel").as("label"))
    else if (allIn) // flag round: the one double-reference, last in a batch
      best.join(labels, Seq("id"))
        .select(col("id"), col("newlabel").as("label"),
          (col("newlabel") =!= col("label")).as("chg"))
    else {
      val joined = labels.join(best, Seq("id"), "left_outer")
      if (withFlag)
        joined.select(col("id"),
          coalesce(col("newlabel"), col("label")).as("label"),
          (col("newlabel").isNotNull &&
            col("newlabel") =!= col("label")).as("chg"))
      else
        joined.select(col("id"),
          coalesce(col("newlabel"), col("label")).as("label"))
    }
  }

  /** Lazily-composed fixed-k rounds (no actions) — oracle-checked path.
    *
    * `allIn = true` (caller-asserted: every vertex has ≥1 in-neighbor —
    * true for any symmetrized graph) drops the carry join: the mode then
    * exists for every vertex, `coalesce(newlabel, label)` ≡ `newlabel`,
    * and each round references the previous labels ONCE. The k-round lazy
    * plan collapses from ~2^k leaves (688 KB of formatted plan at k=5 —
    * measured r6) to a linear chain, and k carry joins disappear outright.
    * Results are identical by construction; the oracle is unchanged.
    */
  def fixedRounds(edges: DataFrame, k: Int,
                  allIn: Boolean = false): DataFrame = {
    val e = edges.select("src", "dst")
    var labels = GraphOps.vertices(e).select(col("id"), col("id").as("label"))
    for (_ <- 1 to k) labels = round(e, labels, allIn = allIn)
    labels
  }

  /** Semi-supervised (seeded) label propagation: vertices with
    * id % seedMod == 0 are SEEDS holding their own id as an immutable
    * label; every other vertex starts unlabeled and each round adopts the
    * mode label among its LABELED in-neighbors (count desc, smallest-label
    * tie-break — the lp5 determinism discipline), keeping its previous
    * label when no labeled neighbor votes. Labels only ever spread outward
    * from seeds, so after k rounds a vertex is labeled iff it is within k
    * hops of a seed; never-reached vertices report -1 (no NULL crosses the
    * oracle gate). The k-round trajectory replays exactly in SQL.
    *
    * This is the production shape for propagating a small curated taxonomy
    * (spam/license/topic tags on a few repos) over the whole link graph:
    * the frontier is sparse early on, and each round is the same
    * co-partitioned edge join as lp5.
    */
  def seededFixedRounds(edges: DataFrame, k: Int, seedMod: Long): DataFrame = {
    val e = edges.select("src", "dst")
      .transform(Lineage.cut(_, eager = true))
    var labels = GraphOps.vertices(e).select(col("id"),
      when(col("id") % seedMod === 0, col("id"))
        .otherwise(lit(null).cast("long")).as("label"))
    for (_ <- 1 to k) {
      val msgs = e.join(labels.where(col("label").isNotNull)
          .withColumnRenamed("id", "src").hint("shuffle_hash"), "src")
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val best = msgs.groupBy(col("dst").as("id"))
        .agg(max_by(col("label"),
          struct(col("cnt"), (-col("label")).as("nl"))).as("newlabel"))
      labels = labels.join(best, Seq("id"), "left_outer")
        .select(col("id"),
          when(col("id") % seedMod === 0, col("id"))
            .otherwise(coalesce(col("newlabel"), col("label"))).as("label"))
    }
    labels.select(col("id"), coalesce(col("label"), lit(-1L)).as("label"))
  }

  /** Weighted synchronous LP: neighbor votes weighted by edge weight
    * (Σ weight instead of count), ties broken toward the smallest label —
    * same determinism discipline as the unweighted mode, so exact-match
    * oracles stay achievable. Lazily-composed fixed-k rounds.
    */
  def weightedFixedRounds(edges: DataFrame, k: Int,
                          allIn: Boolean = false): DataFrame = {
    val e = edges.select(col("src"), col("dst"),
      col("weight").cast("double").as("weight"))
    var labels = GraphOps.vertices(e.select("src", "dst"))
      .select(col("id"), col("id").as("label"))
    for (_ <- 1 to k) {
      val msgs = e.join(labels.withColumnRenamed("id", "src")
          .hint("shuffle_hash"), "src")
        .groupBy(col("dst"), col("label"))
        .agg(sum(col("weight")).as("w"))
      val best = msgs.groupBy(col("dst").as("id"))
        .agg(max_by(col("label"),
          struct(col("w"), (-col("label")).as("nl"))).as("newlabel"))
      // allIn (symmetrized input): every vertex gets a mode vote, so the
      // carry join is a proven no-op — single-reference linear chain (the
      // fixedRounds discipline; plan shrinks from ~2^k leaves to k).
      labels =
        if (allIn) best.select(col("id"), col("newlabel").as("label"))
        else labels.join(best, Seq("id"), "left_outer")
          .select(col("id"),
            coalesce(col("newlabel"), col("label")).as("label"))
    }
    labels
  }

  /** Materializing variant: runs up to maxRounds, stops early when no label
    * changes; lineage truncated per batch. Output: (id, label), rounds run.
    *
    * `batch` composes k rounds lazily per materializing action (ONE job of
    * pipelined stages per batch, amortizing the per-round serial term).
    * Each round references the previous labels twice (vote join + carry),
    * so a lazy batch grows ~2^k plan leaves — all pointing at the same
    * cached frame, fine for small k (default 4 → ≤16 leaves), ruinous
    * for large k (SURVEY.md §9 anti-lesson). The changed-flag is computed
    * on the LAST round of the batch only: if that round changed nothing
    * the labels are a fixpoint, so stopping is exact; a run may execute up
    * to batch-1 extra no-op rounds past the fixpoint.
    */
  def run(spark: SparkSession, edges: DataFrame, maxRounds: Int = 50,
          numPartitions: Int = 32, batch: Int = 4): (DataFrame, Int) = {
    val e = edges.select("src", "dst")
      .repartition(numPartitions, col("src")).transform(Lineage.cut(_, eager = true))
    val nEff = Lineage.adaptiveParallelism(e.count(), numPartitions)
    Lineage.withLoopConf(spark, nEff) {
    var labels = GraphOps.vertices(e)
      .select(col("id"), col("id").as("label"))
      .repartition(nEff, col("id")).transform(Lineage.cut(_, eager = true))
    // One cheap prep count on the checkpointed edges: if every vertex has
    // an in-neighbor (any symmetrized graph), rounds single-reference the
    // labels — the k-round lazy batch is then a linear chain instead of
    // ~2^k plan leaves, so per-batch planning shrinks. (Doubling the batch
    // on top was measured slightly SLOWER here: the extra stages per
    // action cost more planning than the saved actions on this box.)
    val allIn = e.select(col("dst")).distinct().count() == labels.count()
    val effBatch = math.max(1, batch)
    var r = 0
    var done = false
    while (r < maxRounds && !done) {
      val inner = math.min(effBatch, maxRounds - r)
      var next = labels
      for (i <- 1 to inner)
        next = round(e, next, withFlag = i == inner, allIn = allIn)
      // ONE action per batch: the lazy localCheckpoint is materialized by
      // the changed-count aggregate (same shape as the Superstep kernel).
      val nextM = next.transform(Lineage.cut(_))
      val m = nextM.agg(sum(when(col("chg"), 1L).otherwise(0L))).head()
      val changed = if (m.isNullAt(0)) 0L else m.getLong(0)
      labels = nextM.drop("chg")
      r += inner
      done = changed == 0
    }
    (labels, r)
    }
  }
}
