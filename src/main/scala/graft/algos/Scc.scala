package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.GraphOps

/** Strongly connected components — the directed companion to
  * [[ConnectedComponents]] (SURVEY.md §10 round-4 queue item 3; the first
  * thing a code-graph user asks of a directed import/co-change graph:
  * cycles and strong modules).
  *
  * Forward-backward coloring with trimming (the standard distributed SCC
  * shape; Tarjan's stack is inherently sequential):
  *
  *  1. '''Trim''' to a fixpoint: a vertex with no in-edges or no out-edges
  *     inside the active subgraph is a singleton SCC — peeling these
  *     resolves the acyclic majority of a mostly-DAG graph without ever
  *     running a fixpoint on it (each peel is one semi-join pass, the
  *     k-core movement bound).
  *  2. '''Forward color''' fixpoint: color(v) = min id that reaches v along
  *     forward edges (HashMin on the directed graph — CC's kernel without
  *     symmetrization). Roots are vertices with color(v) = v; a root is
  *     provably the minimum id of its SCC.
  *  3. '''Backward mark''' fixpoint: starting from the roots, follow edges
  *     BACKWARD but only within the same color class; every marked vertex
  *     both reaches and is reached by its root ⇒ scc(v) = color(v). All
  *     color classes resolve one SCC each, in parallel, per outer round.
  *  4. Remove the resolved vertices and repeat — newly exposed trivial
  *     vertices fall to the next trim.
  *
  * Every inner round is one co-partitioned join + aggregation over the
  * SHRINKING active subgraph (frontier-bound movement); rounds are
  * materialized with the 1-job localCheckpoint(false)+count pattern
  * (KCore's). Output: (id, scc) with scc = min member id — exact, so the
  * driver gate is a hard integer compare against DuckDB's closure-based
  * definition (algorithm-independent: mutual reachability).
  */
object Scc {

  def run(spark: SparkSession, edges: DataFrame, numPartitions: Int = 32,
          maxOuter: Int = 100, verbose: Boolean = false,
          batch: Int = 1): DataFrame = {
    var e = edges.select("src", "dst").where(col("src") =!= col("dst"))
      .distinct()
      .repartition(numPartitions, col("src"))
      .localCheckpoint(true)
    var active = GraphOps.vertices(e).localCheckpoint(true)
    var nActive = active.count()
    var done = spark.range(0).select(col("id"), col("id").as("scc"))
    var outer = 0

    while (outer < maxOuter && nActive > 0) {
      var (trimR, colorR, markR) = (0, 0, 0)
      // --- 1. trim singleton SCCs (no in- or no out-edges) to a fixpoint
      var trimming = true
      while (trimming && nActive > 0) {
        trimR += 1
        val srcs = e.select(col("src").as("id")).distinct()
        val dsts = e.select(col("dst").as("id")).distinct()
        val keep = srcs.join(dsts, Seq("id"), "left_semi")
          .localCheckpoint(false)
        val nKeep = keep.count()
        if (nKeep == nActive) trimming = false
        else {
          done = done
            .unionByName(active.join(keep, Seq("id"), "left_anti")
              .select(col("id"), col("id").as("scc")))
          active = keep
          // lazy: the next round's keep.count (or the color sweep's first
          // job) materializes the shrunken edge set
          e = e.join(keep.withColumnRenamed("id", "src"), Seq("src"),
              "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), Seq("dst"),
              "left_semi")
            .select("src", "dst")
            .localCheckpoint(false)
          nActive = nKeep
        }
      }
      if (nActive > 0) {
        // Inner fixpoints compose `batch` rounds lazily per materializing
        // action. Both sweeps are monotone, so "last composed round changed
        // nothing" ⇒ fixpoint, and up to batch−1 overshoot rounds are
        // absorbed by it. Default batch=1: MEASURED winner (SccBatchProbe,
        // interleaved medians — batch3 lost 21.0→23.5 s at sf0.01 and
        // 5.9→13.0 s at sf0.1; unlike the PR grid loop, every composed
        // round here is its own shuffle pair, so batching saves only
        // driver round-trips while paying 2^batch leaf re-scans).
        // --- 2. forward HashMin color fixpoint on the active subgraph
        var color = active.select(col("id"), col("id").as("color"))
          .localCheckpoint(false)
        var changed = true
        while (changed) {
          colorR += 1
          var cur = color
          for (b <- 1 to batch) {
            val msgs = e
              .join(cur.select(col("id").as("src"), col("color")), "src")
              .groupBy(col("dst").as("id")).agg(min(col("color")).as("mc"))
            cur = cur.join(msgs, Seq("id"), "left_outer")
              .select(col("id"), least(col("color"), col("mc")).as("color"),
                (col("mc").isNotNull && col("mc") < col("color")).as("ch"))
            if (b < batch) cur = cur.select("id", "color")
          }
          val next = cur.localCheckpoint(false)
          changed = next.agg(sum(when(col("ch"), 1L).otherwise(0L)))
            .head().getLong(0) > 0
          color = next.select("id", "color")
        }
        // --- 3. backward mark within color classes, from the roots
        var state = color.select(col("id"), col("color"),
          (col("id") === col("color")).as("marked")).localCheckpoint(false)
        var nMarked = state.where(col("marked")).count()
        var growing = true
        while (growing) {
          markR += 1
          var cur = state
          for (_ <- 1 to batch) {
            val markedDst = cur.where(col("marked"))
              .select(col("id").as("dst"), col("color").as("wcolor"))
            // renamed (cid, wcolor) so the cur⋈cands condition can never
            // self-join-ambiguate (cands derives from cur)
            val cands = e.join(markedDst, "dst")
              .select(col("src").as("cid"), col("wcolor")).distinct()
            cur = cur
              .join(cands, col("id") === col("cid") &&
                col("color") === col("wcolor"), "left_outer")
              .select(col("id"), col("color"),
                (col("marked") || col("cid").isNotNull).as("marked"))
          }
          val next = cur.localCheckpoint(false)
          val m = next.where(col("marked")).count()
          growing = m > nMarked
          nMarked = m
          state = next
        }
        // --- 4. assign and shrink
        done = done.unionByName(
          state.where(col("marked")).select(col("id"),
            col("color").as("scc")))
        val rest = state.where(!col("marked")).select("id")
          .localCheckpoint(false)
        e = e.join(rest.withColumnRenamed("id", "src"), Seq("src"),
            "left_semi")
          .join(rest.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
          .select("src", "dst")
          .localCheckpoint(false)
        active = rest
        nActive = nActive - nMarked
      }
      // truncate the accumulated result lineage once per outer round
      done = done.localCheckpoint(true)
      outer += 1
      if (verbose)
        println(s"[scc] outer=$outer trimRounds=$trimR colorRounds=$colorR " +
          s"markRounds=$markR remaining=$nActive")
    }
    if (nActive > 0)
      throw new IllegalStateException(
        s"SCC did not resolve $nActive vertices in $maxOuter outer rounds")
    done
  }
}
