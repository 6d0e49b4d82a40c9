package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loop configuration (SURVEY.md §3.4, §4.3).
  *
  * @param maxIter      superstep cap
  * @param tol          stationary convergence: stop when max(residual) < tol
  * @param numPartitions fixed partition count for the co-partitioning the
  *                     whole loop reuses (= LA3's process-grid dimension)
  * @param broadcastFrontierBelow broadcast the frontier side of the gather
  *                     join when its row count drops below this (LA3's
  *                     column-broadcast of active x-segments)
  * @param checkpoint   durable snapshot store; None = in-memory only
  *                     (localCheckpoint lineage truncation each round)
  * @param durableEvery write a durable snapshot every k supersteps
  * @param hubTau       explicit skew handling: salt-split adjacency of
  *                     vertices with out-degree > tau (SURVEY.md §2.2 G7)
  */
final case class SuperstepConfig(
    maxIter: Int = 100,
    tol: Double = 1e-6,
    numPartitions: Int = 32,
    broadcastFrontierBelow: Long = 2L * 1000 * 1000,
    checkpoint: Option[CheckpointStore] = None,
    durableEvery: Int = 1,
    hubTau: Option[Long] = None)

final case class SuperstepResult(
    state: DataFrame, supersteps: Int, converged: Boolean,
    metrics: Vector[Map[String, String]])

/** The engine's core: LA3's SpMV superstep (scatter → gather ⊗ → combine ⊕
  * → apply, PAPER §4) as one Catalyst plan per iteration:
  *
  * {{{
  * msgs   = edges ⋈ frontier on src   |> select gather ⊗  |> groupBy(dst).agg(⊕)
  * state' = state ⟕ msgs on id        |> apply
  * }}}
  *
  * Scale discipline (SURVEY.md §3.4): edges are hash-co-partitioned by src
  * and materialized once — only frontier/messages move per superstep; the
  * plan is truncated every round (localCheckpoint or durable parquet
  * snapshot) so lineage depth stays O(1); exactly one expensive action per
  * superstep, with convergence metrics read off the materialized state.
  */
object Superstep {

  def run(spark: SparkSession, edges: DataFrame, graphVertices: DataFrame,
          vp: VertexProgram, cfg: SuperstepConfig,
          resume: Boolean = false): SuperstepResult = {

    // Loop-scoped session tuning, restored on exit:
    // - AQE re-plans every shuffle — worth it for one big query, pure
    //   scheduling overhead for hundreds of small identical superstep jobs
    //   (measured ~30% of superstep wall at sf0.1). Skew inside the loop is
    //   handled explicitly (hubTau).
    // - preferSortMergeJoin=false: the gather join must be shuffled-hash —
    //   SMJ would re-sort the (big, already co-partitioned) edge side by
    //   the join key every superstep.
    // - shuffle.partitions = cfg.numPartitions: every shuffle in the loop
    //   aligns with the edge co-partitioning, independent of core count —
    //   same physical work at any parallelism (the scaling-run invariant).
    val restore = Seq(
      "spark.sql.adaptive.enabled" -> spark.conf.get(
        "spark.sql.adaptive.enabled", "true"),
      "spark.sql.join.preferSortMergeJoin" -> spark.conf.get(
        "spark.sql.join.preferSortMergeJoin", "true"),
      "spark.sql.shuffle.partitions" -> spark.conf.get(
        "spark.sql.shuffle.partitions", "200"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    spark.conf.set("spark.sql.shuffle.partitions", cfg.numPartitions.toString)
    try {
      runLoop(spark, edges, graphVertices, vp, cfg, resume)
    } finally restore.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  private def runLoop(spark: SparkSession, edges: DataFrame,
                      graphVertices: DataFrame, vp: VertexProgram,
                      cfg: SuperstepConfig, resume: Boolean): SuperstepResult = {
    val n = cfg.numPartitions

    // --- one-time graph prep ---
    // LA3's 2D tiling insight, 1D-projected for Spark: the per-superstep
    // y-reduction (groupBy dst) must be SHUFFLE-FREE, because shuffle
    // throughput does not scale with cores in a single box (measured: a
    // shuffle-heavy agg ran 4.7s at 8 cores and 4.4s at 32). So edges are
    // hash-co-partitioned by DST once; each superstep broadcasts the
    // frontier (LA3's column-broadcast of active x-segments) and the
    // gather join + combine aggregate + apply join all run partition-local
    // — zero exchanges per superstep.
    //
    // With hubTau set, the alternative src+salt co-partitioned path spreads
    // pathological hub adjacency across partitions (shuffled-hash join on
    // (src, salt)); it trades the broadcast for a frontier shuffle.
    val withW =
      if (vp.usesEdgeWeight && edges.columns.contains("weight"))
        edges.select(col("src"), col("dst"), col("weight").cast("double"))
      else if (vp.usesEdgeWeight)
        edges.select(col("src"), col("dst"), lit(1.0).as("weight"))
      else edges.select(col("src"), col("dst"))
    val saltMode = cfg.hubTau.isDefined
    val (eB, joinKeys) = cfg.hubTau match {
      case Some(tau) =>
        val salted = graft.graph.GraphOps
          .splitHubs(withW.withColumn("weight",
            if (vp.usesEdgeWeight) col("weight") else lit(1.0)), tau)
          .repartition(n, col("src"), col("salt"))
          .sortWithinPartitions("src", "dst")
        (salted.localCheckpoint(true), Seq("src", "salt"))
      case None =>
        val plain = withW
          .repartition(n, col("dst"))
          .sortWithinPartitions("dst", "src")
        (plain.localCheckpoint(true), Seq("src"))
    }
    // src → number of salt groups (1 for non-hubs); tiny unless pathological.
    // Only materialized when hub splitting is on.
    lazy val saltMap = eB.select("src", "nsalts").distinct()
      .repartition(n, col("src")).localCheckpoint(true)
    val anyHubs = saltMode &&
      saltMap.where(col("nsalts") > 1).limit(1).count() > 0

    // --- init or resume ---
    var (startStep, state) = cfg.checkpoint.flatMap { ck =>
      if (resume) ck.latestComplete().map { s =>
        (s + 1, ck.read(spark, s))
      } else None
    }.getOrElse {
      val s0 = vp.initState(graphVertices)
        .withColumn("changed", lit(true))
        .repartition(n, col("id"))
        .localCheckpoint(true)
      (0, s0)
    }

    var metrics = Vector.empty[Map[String, String]]
    var converged = false
    var step = startStep
    var frontierSize = state.where(col("changed")).count()

    while (step < cfg.maxIter && !converged) {
      val t0 = System.nanoTime()
      val frontierRaw =
        if (vp.isStationary) state else state.where(col("changed"))
      // LA3 communication filtering: only active vertices scatter. Project
      // to the columns the gather expression actually reads before the
      // broadcast — state bookkeeping columns don't belong on the wire.
      val gatherRefs = vp.gatherStateColumns.toSet
      val keepCols = frontierRaw.columns
        .filter(c => c == "id" || gatherRefs.contains(c))
      val frontier0 = frontierRaw.select(keepCols.map(col).toSeq: _*)
        .withColumnRenamed("id", "src")
      // Hub replication: frontier rows for salted vertices go to every salt.
      val frontier =
        if (anyHubs)
          frontier0.join(saltMap, "src")
            .withColumn("salt", explode(sequence(lit(0), col("nsalts") - 1)))
            .drop("nsalts")
        else if (saltMode) frontier0.withColumn("salt", lit(0))
        else frontier0
      // Default (dst-partitioned) path: broadcast the frontier — the join
      // streams the in-place edge partitions, and because gather output is
      // already hash-distributed by dst(=id), the combine aggregate needs
      // no exchange. Salt path: shuffled-hash join on (src, salt); the
      // shuffle_hash hint is required because localCheckpointed inputs
      // have unknown stats and the planner would fall back to sort-merge,
      // re-sorting the edge side every superstep.
      val frontierHinted =
        if (!saltMode || frontierSize < cfg.broadcastFrontierBelow)
          broadcast(frontier)
        else frontier.hint("shuffle_hash")
      val msgs = eB.join(frontierHinted, joinKeys)
        .select(col("dst").as("id"), vp.gatherExpr.as("msg"))
        .groupBy("id")
        .agg(vp.combineExpr(col("msg")).as("agg"))
      val newState =
        vp.applyState(state.drop("changed"), msgs.hint("shuffle_hash"))

      // Materialize once: durable snapshot (Iceberg-shaped) or in-memory.
      val durable = cfg.checkpoint.isDefined &&
        ((step + 1) % cfg.durableEvery == 0 || step + 1 == cfg.maxIter)
      val materialized =
        if (durable) {
          val ck = cfg.checkpoint.get
          ck.write(step, newState, Map(
            "superstep" -> step.toString,
            "frontier" -> frontierSize.toString,
            "wallMs" -> ((System.nanoTime() - t0) / 1000000).toString))
          ck.read(spark, step)
        } else newState.localCheckpoint(false) // lazy: materialized by the
      // metrics aggregate below — ONE job per superstep computes the
      // pipeline, caches the state blocks, and truncates lineage.
      val resCol = vp.residualExpr.getOrElse(lit(0.0))
      val m = materialized.agg(
        sum(when(col("changed"), 1L).otherwise(0L)).as("nChanged"),
        max(resCol).as("residual"),
        count(lit(1)).as("rows")).head()
      val nChanged = Option(m.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
      val residual = Option(m.get(1)).map(_.toString.toDouble).getOrElse(0.0)
      val wallMs = (System.nanoTime() - t0) / 1000000
      metrics :+= Map(
        "superstep" -> step.toString, "rows" -> m.getLong(2).toString,
        "changed" -> nChanged.toString, "residual" -> residual.toString,
        "frontier" -> frontierSize.toString, "wallMs" -> wallMs.toString)

      state = materialized
      frontierSize = nChanged
      converged =
        if (vp.isStationary) vp.residualExpr.isDefined && residual < cfg.tol
        else nChanged == 0L
      step += 1
    }
    SuperstepResult(state.drop("changed"), step, converged, metrics)
  }

  /** Purely lazy fixed-k unrolled loop — no actions, used by the
    * oracle-checked `SparkEntry.queries` so the driver's Bench times a
    * single composed Catalyst plan. Semantics identical to `run` without
    * frontier filtering (all vertices active, stationary-style).
    */
  def lazyLoop(edges: DataFrame, state0: DataFrame, vp: VertexProgram,
               k: Int): DataFrame = {
    val withW =
      if (edges.columns.contains("weight"))
        edges.select(col("src"), col("dst"), col("weight").cast("double"))
      else edges.select(col("src"), col("dst"), lit(1.0).as("weight"))
    var state = state0
    for (_ <- 1 to k) {
      val frontier = state.withColumnRenamed("id", "src")
      val msgs = withW.join(frontier, "src")
        .select(col("dst").as("id"), vp.gatherExpr.as("msg"))
        .groupBy("id")
        .agg(vp.combineExpr(col("msg")).as("agg"))
      state = vp.applyState(state, msgs).drop("changed")
    }
    state
  }
}
