package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algos.{Betweenness, Community, ConnectedComponents, KCore, Katz, LabelPropagation, LinkPrediction, Hits, Msf, PageRank, Paths, TriangleCount, Walks}
import graft.ann.Similarity
import graft.corpus.CorpusGen
import graft.dedup.Dedup
import graft.engine.{CheckpointStore, SuperstepConfig}
import graft.graph.{EdgeDerivation, GraphOps, TestGraphs}
import graft.multimodal.Multimodal
import graft.text.TextOps

/** The engine's operator surface wired over the driver's testdata parquets
  * (one entry per operator family, SURVEY.md §2). Each oracle-checked query
  * mirrors its [[OracleSql]] statement value-for-value: identical column
  * names, identical ordering, identical rounding.
  */
object Queries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    TestGraphs.table(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    TestGraphs.table(s, dir, "embeddings")

  private def und(s: SparkSession, dir: String): DataFrame =
    TestGraphs.copurchaseUndirected(s, dir)

  /** und(), materialized once (Lineage.cut eager): the k-round unrolled
    * kernels otherwise replay the co-purchase self-join per plan reference
    * — pr5's initial plan carried 128 parquet scans (measured r6).
    */
  private def undM(s: SparkSession, dir: String): DataFrame =
    und(s, dir).transform(graft.engine.Lineage.cut(_, eager = true))

  private def cfg(s: SparkSession): SuperstepConfig = SuperstepConfig(
    numPartitions = s.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  /** Blocked-kernel PR (CSR EdgeBlocks, SURVEY.md §2.2 G6): same trajectory
    * as [[PageRank.fixedIterations]] — outdeg is the packed adjacency
    * length — so it shares pr5's oracle. The relational explode spelling is
    * the measured winner over the typed cogroup flatMap
    * (BlockedKernelProbe, BASELINE.md round 3).
    */
  private def prBlocked(e: DataFrame, k: Int, numBlocks: Int): DataFrame =
    graft.engine.BlockedKernel.prFixedExplode(e, k, numBlocks)

  val oracleChecked: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- graph derivation (G8 analogs) -----------------------------------
    "g_copurchase" -> ((s, dir) =>
      TestGraphs.copurchase(s, dir).orderBy("src", "dst")),

    "g_custpart" -> ((s, dir) =>
      TestGraphs.custPart(s, dir).orderBy("src", "dst")),

    "g_user_event" -> ((s, dir) =>
      TestGraphs.userEvent(s, dir).orderBy("src", "dst")),

    // --- degrees / classification (G3, G4) --------------------------------
    "degrees" -> ((s, dir) => {
      val cp = TestGraphs.copurchase(s, dir)
      GraphOps.outDegrees(cp).join(GraphOps.inDegrees(cp), Seq("id"),
          "full_outer")
        .select(col("id"), coalesce(col("outdeg"), lit(0L)).as("outdeg"),
          coalesce(col("indeg"), lit(0L)).as("indeg"))
        .orderBy("id")
    }),

    // --- log2-bucketed degree histogram (the power-law profile plot's
    // data): bucket = length of the binary representation — integer-exact
    // in both engines (bin() string length), no float log ----------------
    "deg_hist" -> ((s, dir) =>
      und(s, dir).groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("deg"))
        .groupBy(length(bin(col("deg"))).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_vertices"))
        .orderBy("bucket")),

    // --- exact discrete degree quantiles via the histogram-prefix-sum
    // spelling (the window runs over distinct degree VALUES, never rows) --
    "deg_percentiles" -> ((s, dir) => {
      val deg = und(s, dir).groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("deg"))
      graft.functions.Quantiles.discrete(deg, "deg",
        Seq(25, 50, 75, 90, 99)).orderBy("pct")
    }),

    "vertex_classes" -> ((s, dir) => {
      val cp = TestGraphs.copurchase(s, dir)
      val universe = TestGraphs.table(s, dir, "part")
        .select(col("p_partkey").as("id"))
      GraphOps.classify(cp, universe)
        .withColumnRenamed("class", "vclass")
        .orderBy("id")
    }),

    // --- PageRank (A1): flat kernel, blocked kernel, top-k ---------------
    // NB every lazily-composed fixed-k query below ends in a filter the
    // optimizer cannot drop (no null ranks/labels exist, so the oracle
    // output is unchanged): without it, Bench's count() triggers
    // distinct-key join elimination on the final left-outer join and the
    // "measured" time never runs the k iterations (TopKProbe, BASELINE.md
    // round 3 — the pr_top20 8× mystery).
    "pr5" -> ((s, dir) =>
      PageRank.fixedIterations(undM(s, dir), 5)
        .select(col("id"), round(col("rank"), 6).as("pr"))
        .where(col("pr").isNotNull)
        .orderBy("id")),

    "pr5_blocked" -> ((s, dir) =>
      prBlocked(undM(s, dir), 5,
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        .select(col("id"), round(col("rank"), 6).as("pr"))
        .where(col("pr").isNotNull)
        .orderBy("id")),

    // --- weighted PR: scatter shares ∝ edge weight over the symmetrized
    // weighted graph (completes the weighted companion set: wlp5,
    // harmonic_w8, matching_w, diameter_w2sweep) ---------------------------
    "wpr5" -> ((s, dir) => {
      val cp = TestGraphs.copurchase(s, dir)
      val we = cp.select(col("src"), col("dst"), col("weight"))
        .unionByName(cp.select(col("dst").as("src"), col("src").as("dst"),
          col("weight")))
        .transform(graft.engine.Lineage.cut(_)) // lazy (bfs5 r6 note)
      PageRank.weightedFixedIterations(we, 5)
        .select(col("id"), round(col("rank"), 6).as("pr"))
        .where(col("pr").isNotNull)
        .orderBy("id")
    }),

    "pr_top20" -> ((s, dir) =>
      PageRank.fixedIterations(undM(s, dir), 5)
        .select(col("id"), round(col("rank"), 6).as("pr"))
        .orderBy(col("pr").desc, col("id"))
        .limit(20)),

    // --- the 2D grid kernel under the hard oracle gate (G5): same 5-step
    // trajectory as pr5 (GridKernelSpec proves grid ≡ dst), forced through
    // gridSide=4 with batched supersteps so the driver pins the SCALE path
    // to DuckDB, not just the dst-broadcast layout.
    "pr5_grid" -> ((s, dir) =>
      PageRank.run(s, undM(s, dir),
        cfg(s).copy(maxIter = 5, tol = 0.0, gridSide = Some(4),
          batchSize = 5))
        .state.select(col("id"), round(col("rank"), 6).as("pr"))
        .orderBy("id")),

    // --- the hub/skew salt layout under the hard oracle gate (G7): same
    // 5-step trajectory as pr5, forced through hubTau=16 so hub adjacency
    // splits into salt groups, the frontier replicates across salts, and
    // the salted shuffled-hash join runs (batchSize>1 disables the
    // broadcast shortcut; 5 = one action for the whole fixed-5 unroll —
    // with tol=0 the trajectory is identical at any batch size, r6).
    "pr5_hubsplit" -> ((s, dir) =>
      PageRank.run(s, undM(s, dir),
        cfg(s).copy(maxIter = 5, tol = 0.0, hubTau = Some(16L),
          batchSize = 5))
        .state.select(col("id"), round(col("rank"), 6).as("pr"))
        .orderBy("id")),

    // --- S1 text edge-list reader under the hard oracle gate: the weighted
    // co-purchase edges round-trip through the converter input format
    // ("src dst weight" lines) and come back via the distributed csv-schema
    // reader; materialized eagerly so the temp dir can be removed.
    // co-purchase edges round-trip through JSON lines (S-family source
    // format beside text + parquet): explicit-schema read, no inferSchema
    // pre-scan; materialized eagerly so the temp dir can be removed.
    "jsonl_roundtrip" -> ((s, dir) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-jsonl").toString
      try {
        val jsonDir = s"$base/edges"
        TestGraphs.copurchase(s, dir)
          .select(col("src"), col("dst"), col("weight"))
          .write.mode("overwrite").json(jsonDir)
        GraphOps.readJsonEdges(s, jsonDir)
          .orderBy("src", "dst").localCheckpoint(true)
      } finally {
        import java.nio.file.{Files => F, Path}
        import java.util.Comparator
        val walk = F.walk(Path.of(base))
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(p => F.deleteIfExists(p))
        finally walk.close()
      }
    }),

    // --- CSV edge sink + source (S-family): explicit schema, header,
    // no inferSchema pre-scan; shares jsonl_roundtrip's oracle semantics -
    "csv_roundtrip" -> ((s, dir) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-csv").toString
      try {
        val csvDir = s"$base/edges"
        TestGraphs.copurchase(s, dir)
          .select(col("src"), col("dst"), col("weight"))
          .write.mode("overwrite").option("header", "true").csv(csvDir)
        GraphOps.readCsvEdges(s, csvDir)
          .orderBy("src", "dst").localCheckpoint(true)
      } finally {
        import java.nio.file.{Files => F, Path}
        import java.util.Comparator
        val walk = F.walk(Path.of(base))
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(p => F.deleteIfExists(p))
        finally walk.close()
      }
    }),

    // --- ORC edge sink + source (S-family): the columnar format beside
    // text / parquet / JSON-lines / CSV; explicit schema, integral weight
    // preserved exactly -----------------------------------------------------
    "orc_roundtrip" -> ((s, dir) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-orc").toString
      try {
        val orcDir = s"$base/edges"
        TestGraphs.copurchase(s, dir)
          .select(col("src"), col("dst"), col("weight"))
          .write.mode("overwrite").orc(orcDir)
        GraphOps.readOrcEdges(s, orcDir)
          .orderBy("src", "dst").localCheckpoint(true)
      } finally {
        import java.nio.file.{Files => F, Path}
        import java.util.Comparator
        val walk = F.walk(Path.of(base))
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(p => F.deleteIfExists(p))
        finally walk.close()
      }
    }),

    "edgelist_roundtrip" -> ((s, dir) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-edgelist").toString
      try {
        val txtDir = s"$base/edges"
        TestGraphs.copurchase(s, dir)
          .select(concat_ws(" ", col("src"), col("dst"), col("weight"))
            .as("value"))
          .write.mode("overwrite").text(txtDir)
        GraphOps.readEdgeList(s, txtDir)
          .orderBy("src", "dst").localCheckpoint(true)
      } finally {
        import java.nio.file.{Files => F, Path}
        import java.util.Comparator
        val walk = F.walk(Path.of(base))
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(p => F.deleteIfExists(p))
        finally walk.close()
      }
    }),

    // --- S4 checkpoint/resume under the hard oracle gate: run 1 stops at
    // superstep 3 leaving durable snapshots; run 2 resumes from the latest
    // manifest and completes the SAME fixed 5-superstep trajectory as pr5
    // (same undirected graph — its post-rounding sums are proven to agree
    // with DuckDB's, where the weight-filtered directed graph hit 6-dp
    // double-rounding boundaries), so the resumed final state is SQL-pinned.
    // (CheckpointSpec separately proves resume ≡ straight on
    // convergence-driven runs.)
    "pr_resume" -> ((s, dir) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-resume").toString
      val e = und(s, dir).localCheckpoint(true)
      try {
        val ck = new CheckpointStore(base, "pr", "driver")
        PageRank.run(s, e, cfg(s).copy(tol = 0.0, maxIter = 3,
          checkpoint = Some(ck), durableEvery = 2))
        PageRank.run(s, e, cfg(s).copy(tol = 0.0, maxIter = 5,
          checkpoint = Some(ck), durableEvery = 2), resume = true)
          .state.select(col("id"), round(col("rank"), 6).as("pr"))
          .orderBy("id")
      } finally {
        // Final state is eagerly cached (localCheckpoint blocks), so the
        // snapshot files are no longer needed; Bench runs each query twice
        // and the dirs would otherwise accumulate.
        import java.nio.file.{Files => F, Path}
        import java.util.Comparator
        val walk = F.walk(Path.of(base))
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(p => F.deleteIfExists(p))
        finally walk.close()
      }
    }),

    // --- personalized PR: teleport mass only to S = {id ≡ 0 mod 100} ------
    "ppr5" -> ((s, dir) =>
      PageRank.personalizedFixedIterations(undM(s, dir),
        id => pmod(id, lit(100L)) === 0, 5)
        .select(col("id"), round(col("rank"), 6).as("pr"))
        .where(col("pr").isNotNull)
        .orderBy("id")),

    // --- PageRank on the bipartite repo→file analog (sources + sinks) ----
    "pr5_bipartite" -> ((s, dir) =>
      PageRank.fixedIterations(TestGraphs.custPart(s, dir)
          .transform(graft.engine.Lineage.cut(_)), 5) // lazy (r6)
        .select(col("id"), round(col("rank"), 6).as("pr"))
        .where(col("pr").isNotNull)
        .orderBy("id")),

    // --- k-core peeling (5 synchronous peels, k=3) ------------------------
    "kcore3" -> ((s, dir) =>
      KCore.peel(TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst"), 3, 5)
        .orderBy("id")),

    // --- weighted s-core (Eidsaa–Almaas): 2 synchronous peels at s=110 on
    // weighted degree over the FULL integral-weight co-purchase graph.
    // Fixed-round (the kcore3 discipline — parity is exact at any equal
    // unroll): this graph's weighted degrees are tightly concentrated
    // (~118 median at both SFs), so every s that peels at all cascades to
    // an EMPTY fixpoint within ~3 rounds — the round-2 snapshot is the
    // non-trivial object (2000→1307→228 vertices at sf0.01,
    // 20000→13035→2327 at sf0.1; measured via the oracle CTE chain) ------
    "wkcore110" -> ((s, dir) =>
      KCore.peelWeighted(
        TestGraphs.copurchase(s, dir).select("src", "dst", "weight"),
        110, 2)
        .orderBy("id")),

    // --- 2-hop reach |{u : dist ≤ 2}| per vertex (exact distinct over the
    // weight≥2 graph — friend-of-friend audience size) ---------------------
    "reach2" -> ((s, dir) =>
      GraphOps.twoHopReach(TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst"))
        .orderBy("id")),

    // --- reach2 with the documented hot-mid cap ENGAGED (maxMidDeg=8 —
    // genuinely excludes hub mids on this graph): the scale path is
    // driver-visible, not only a scaladoc promise; the cap predicate is a
    // pure degree threshold, so the oracle mirrors it exactly ------------
    "reach2_capped" -> ((s, dir) =>
      GraphOps.twoHopReach(TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst"), maxMidDeg = 8L)
        .orderBy("id")),

    // --- multi-source BFS / graph-Voronoi landmark assignment over the
    // weight≥2 graph (~2% md5-sampled seeds; (dist, seed) min packed into
    // one BIGINT so every round is a plain hash-agg). Fixed-8 unroll:
    // exact at any EQUAL unroll in both engines --------------------------
    "nearest_seed8" -> ((s, dir) => {
      val cpf = TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst")
      Paths.nearestSeeds(GraphOps.symmetrizeOriented(cpf), 8, 50L)
        .orderBy("id")
    }),

    // --- truncated odd-cycle / bipartiteness profile: per component,
    // reached vertices + same-parity (odd-cycle-witness) edge count — one
    // packed HashMin-with-distance sweep, 8 rounds -------------------------
    "oddcycle8" -> ((s, dir) =>
      Paths.oddCycleProfile(TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst"), 8)
        .orderBy("comp")),

    // --- modularity of the BRAND partition (attribute homophily: do
    // same-brand parts co-purchase?) — the exact-rational modularity
    // machinery over a metadata labeling instead of a computed one ---------
    "modularity_brand" -> ((s, dir) => {
      val e = GraphOps.symmetrizeOriented(
          TestGraphs.copurchase(s, dir).select("src", "dst"))
        .where(col("src") =!= col("dst")).localCheckpoint(true)
      Community.modularity(e,
        TestGraphs.table(s, dir, "part")
          .select(col("p_partkey").as("id"), col("p_brand").as("label")))
        .orderBy("n_comms")
    }),

    // Streaming CC maintenance (the eighth streaming shape): per-batch
    // incremental fold over the replayed edge stream; confluent, so the
    // drained labels share cc's closure oracle verbatim.
    "stream_cc" -> ((s, dir) =>
      graft.streaming.EdgeStream.ccViaStream(
        TestGraphs.copurchase(s, dir)
          .where(col("weight") >= 2).select("src", "dst"),
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        .orderBy("id")),

    // --- connected components (A2): converged, exact ---------------------
    "cc" -> ((s, dir) => {
      val cpf = TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst")
      // batchSize=4 (r6): convergence checked every 4 supersteps — extra
      // post-fixpoint supersteps are no-ops (empty frontier), state identical
      ConnectedComponents.run(s, cpf, cfg(s).copy(batchSize = 4))
        .state.orderBy("id")
    }),

    // --- CC via large-star/small-star contraction (Kiveris et al.): the
    // diameter-immune scale path — O(log² n) rounds where HashMin needs
    // O(diameter). Same fixpoint as `cc`, so it shares the closure oracle.
    "cc_stars" -> ((s, dir) => {
      val cpf = TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst")
      graft.algos.ConnectedComponents.stars(s, cpf,
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        ._1.orderBy("id")
    }),

    // --- incremental CC (the daily-delta production path): the full
    // co-purchase graph is split by a deterministic md5 mod-50 edge hash
    // (the doc_split discipline) into a ~98% base — "yesterday's graph",
    // whose labels a pipeline already holds — and a ~2% delta; the delta
    // folds into the base labels via component-graph contraction, merge
    // work O(|delta|), never a re-traversal. Base ∪ delta = ALL edges, so
    // the oracle is the plain closure over the unfiltered graph ----------
    "cc_incr" -> ((s, dir) => {
      val cp = TestGraphs.copurchase(s, dir).select("src", "dst")
      val inDelta =
        GraphOps.md5Prio(concat_ws(":", col("src"), col("dst"))) % 50 === 0
      // base edges are a subset of the oriented-unique derivation output —
      // the symmetrizing dedup would be a no-op over 2.3M rows (r6)
      val base = ConnectedComponents.run(s, cp.where(!inDelta),
        cfg(s).copy(batchSize = 4), orientedInput = true).state
      ConnectedComponents.incremental(s, base, cp.where(inDelta), cfg(s))
        .orderBy("id")
    }),

    // --- component size distribution (the web-graph bowtie headline
    // number): converged CC, then sizes, then size multiplicities --------
    "comp_sizes" -> ((s, dir) => {
      val cpf = TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst")
      ConnectedComponents.run(s, cpf, cfg(s).copy(batchSize = 4)).state
        .groupBy("component").agg(count(lit(1)).as("csize"))
        .groupBy("csize").agg(count(lit(1)).as("n_comps"))
        .orderBy("csize")
    }),

    // --- graph snapshot diff (the daily-ETL edge-churn report): the
    // co-purchase graph windowed by order year — OLD = 1995–1998, NEW =
    // 1997–2001 — full-outer diffed into ±1 change rows; both directions
    // nonempty because the windows overlap but neither contains the other
    "graph_diff" -> ((s, dir) => {
      def snap(lo: Int, hi: Int): DataFrame = {
        val li = TestGraphs.table(s, dir, "lineitem")
          .select("l_orderkey", "l_partkey")
        val ok = TestGraphs.table(s, dir, "orders")
          .where(year(col("o_orderdate")).between(lo, hi))
          .select(col("o_orderkey").as("l_orderkey"))
        val filt = li.join(ok, Seq("l_orderkey"), "left_semi")
        filt.toDF("ok", "src").join(filt.toDF("ok", "dst"), Seq("ok"))
          .where(col("src") < col("dst"))
          .select("src", "dst").distinct()
      }
      GraphOps.edgeDiff(snap(1995, 1998), snap(1997, 2001))
        .orderBy("src", "dst")
    }),

    // --- double-sweep BFS diameter lower bound (integer-exact, one row);
    // both sweeps unrolled k rounds ≥ the measured eccentricities, the
    // DuckDB twin unrolls the same chains
    "diameter2sweep" -> ((s, dir) =>
      Paths.doubleSweepDiameter(und(s, dir), 8).orderBy("root")),

    // --- weighted double-sweep diameter lower bound (min-plus sweeps over
    // the integral co-purchase weights; same equal-k parity argument)
    "diameter_w2sweep" -> ((s, dir) => {
      val cp = TestGraphs.copurchase(s, dir)
      // no query-level checkpoint: doubleSweepDiameter cuts its input once
      // and derives root/far from that cache (the eager copy was redundant)
      val ew = cp.select(col("src"), col("dst"), col("weight"))
        .union(cp.select(col("dst"), col("src"), col("weight")))
      Paths.doubleSweepDiameter(ew, 8, weighted = true).orderBy("root")
    }),

    // --- label propagation (A3): 5 synchronous rounds --------------------
    "lp5" -> ((s, dir) =>
      LabelPropagation.fixedRounds(undM(s, dir), 5, allIn = true)
        .where(col("label").isNotNull).orderBy("id")),

    // --- semi-supervised seeded LP: ids ≡ 0 (mod 10) hold their own label
    // fixed; everyone else adopts the mode among LABELED neighbors — the
    // curated-taxonomy-spread production shape; unreached vertices -1 ----
    "lp_seeded" -> ((s, dir) =>
      LabelPropagation.seededFixedRounds(undM(s, dir), 5, 10L)
        .orderBy("id")),

    // --- weighted LP: votes weighted by co-purchase multiplicity ----------
    "wlp5" -> ((s, dir) => {
      val cp = TestGraphs.copurchase(s, dir)
      val ew = cp.select(col("src"), col("dst"), col("weight"))
        .union(cp.select(col("dst"), col("src"), col("weight")))
        .transform(graft.engine.Lineage.cut(_, eager = true))
      LabelPropagation.weightedFixedRounds(ew, 5, allIn = true)
        .where(col("label").isNotNull).orderBy("id")
    }),

    // --- triangle count (A4) ----------------------------------------------
    "tc" -> ((s, dir) =>
      TriangleCount.count(TestGraphs.copurchase(s, dir),
        canonicalInput = true)),

    "tc_pervertex" -> ((s, dir) =>
      TriangleCount.perVertex(TestGraphs.copurchase(s, dir),
        canonicalInput = true).orderBy("id")),

    // --- global 4-clique count (K4 — the next motif up from triangles;
    // orientation-invariant, so Spark's degree orientation and the
    // oracle's id orientation agree on the count) --------------------------
    "kclique4" -> ((s, dir) =>
      TriangleCount.fourCliques(TestGraphs.copurchase(s, dir),
        canonicalInput = true)),

    // Local clustering coefficient in exact integer micro-units
    // (floor(2e6·tri/deg·(deg−1)), 0 when deg<2) — Spark `div` ≡ DuckDB
    // `//` on non-negative BIGINTs, so the twin is float-free.
    "lcc" -> ((s, dir) =>
      TriangleCount.localClustering(TestGraphs.copurchase(s, dir),
          canonicalInput = true)
        .orderBy("id")),

    // --- BFS / SSSP (A5): 5 unrolled min-plus rounds ----------------------
    "bfs5" -> ((s, dir) => {
      // LAZY shared cut: fixedRounds' own eager cut materializes the und
      // cache in the same job, and the source agg reuses it — the query-
      // level eager checkpoint was a second cache copy + extra action (r6)
      val e = und(s, dir).transform(graft.engine.Lineage.cut(_))
      Paths.fixedRounds(e, e.agg(min(col("src"))), 5, weighted = false)
        .where(col("dist").isNotNull).orderBy("id")
    }),

    "sssp5" -> ((s, dir) => {
      val cp = TestGraphs.copurchase(s, dir)
      val ew = cp.select(col("src"), col("dst"),
          col("weight").cast("double").as("weight"))
        .union(cp.select(col("dst"), col("src"),
          col("weight").cast("double")))
        .localCheckpoint(true)
      Paths.fixedRounds(ew, ew.select(col("src")).agg(min(col("src"))), 5,
          weighted = true)
        .where(col("dist").isNotNull).orderBy("id")
    }),

    // --- training-data pipeline: dedup family -----------------------------
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(docs(s, dir)).orderBy("keep_id")),

    // Structured Streaming path under the same oracle: documents streamed
    // in micro-batches (one file per trigger), complete-mode stateful agg
    // per digest — final state ≡ Dedup.exact (min/count merge is
    // order-independent across batches).
    "stream_dedup_exact" -> ((s, dir) =>
      graft.streaming.StreamDedup.exactViaStream(docs(s, dir))
        .orderBy("keep_id")),

    // Structured Streaming windowed aggregation under the same oracle:
    // events streamed one file per trigger, tumbling 1-hour windows per
    // event type in complete mode — final state ≡ the batch groupBy
    // (integer hour buckets + cent sums keep it engine-exact).
    "stream_window_counts" -> ((s, dir) =>
      graft.streaming.EdgeStream
        .windowedCountsViaStream(TestGraphs.table(s, dir, "events"))
        .orderBy("hour_bucket", "event_type")),

    // Stream-STATIC join shape under the oracle: the edge log replayed one
    // file per trigger, equi-joined per micro-batch against the static
    // part-brand dim (broadcast side), complete-mode rollup per brand —
    // final state ≡ the batch join+groupBy (count/long-sum merges are
    // order-independent).
    "stream_enrich" -> ((s, dir) =>
      graft.streaming.EdgeStream.enrichedEdgeCountsViaStream(
        TestGraphs.copurchase(s, dir),
        TestGraphs.table(s, dir, "part")
          .select(col("p_partkey").as("id"), col("p_brand").as("attr")))
        .orderBy("attr")),

    // Streaming heavy hitters (complete-mode sort+limit — the seventh
    // streaming shape under the gate): top-20 in-degree vertices over the
    // replayed edge stream ≡ the batch groupBy count top-k under the
    // deterministic (cnt DESC, id ASC) total order.
    "stream_topk20" -> ((s, dir) =>
      graft.streaming.EdgeStream.topKCountsViaStream(
        TestGraphs.copurchase(s, dir), 20)
        .orderBy(col("cnt").desc, col("id").asc)),

    // Keyed-state streaming path (mapGroupsWithState, update mode) under
    // the oracle: per-vertex running out-degree counters drained over a
    // bounded replay — final state ≡ the batch out-degrees (the counter is
    // monotone, so max over update rows is exact).
    "stream_degrees" -> ((s, dir) =>
      graft.streaming.EdgeStream
        .runningDegreesViaStream(TestGraphs.copurchase(s, dir))
        .orderBy("id")),

    // Stateless streaming path under the oracle: per-row md5 minhash
    // signatures appended per micro-batch over a bounded replay — the
    // drained sink ≡ the batch wide-agg signature table (no state, no
    // watermark; the row-local spelling is proven value-identical in
    // StreamDedupSpec).
    "stream_minhash" -> ((s, dir) =>
      graft.streaming.StreamDedup.minhashViaStream(docs(s, dir), 3, 16)
        .orderBy("doc_id", "i")),

    "dedup_jaccard3" -> ((s, dir) =>
      Dedup.jaccardPairs(docs(s, dir), 3, 0.5).orderBy("doc1", "doc2")),

    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashLsh(docs(s, dir), 3, 16, 0.5).orderBy("doc1", "doc2")),

    // --- asymmetric containment |S(a)∩S(b)|/|S(a)| in integer micro-units
    // — the quote/subset detector Jaccard misses (a short doc embedded in
    // a long one): directed pairs at ≥ 0.5 containment ---------------------
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(docs(s, dir), 3, 500000L)
        .orderBy("src_doc", "dst_doc")),

    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(docs(s, dir), 3, 3, 0.5).orderBy("doc1", "doc2")),

    // --- near-dup cluster canonicalization: minhash-LSH pairs → connected
    // components → every doc mapped to its cluster's min doc_id (unique
    // docs keep themselves) — "which row do I keep", not just pairs
    "dedup_clusters" -> ((s, dir) =>
      Dedup.clusters(s, docs(s, dir),
        Dedup.minhashLsh(docs(s, dir), 3, 16, 0.5),
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        .orderBy("doc_id")),

    // --- batch sessionization of the event log: 4-hour gap rule (the
    // session_window merge semantics — stream_sessions shares the same
    // oracle shape); epoch-micro starts + integer cents, so nothing float
    // crosses the gate -----------------------------------------------------
    // --- ordered conversion funnel view → click → purchase: stage reached
    // + first-hit epoch micros per user (−1 sentinels, min-agg ties) --------
    "funnel3" -> ((s, dir) =>
      graft.events.Analytics.funnel(TestGraphs.table(s, dir, "events"),
        "view", "click", "purchase").orderBy("user_id")),

    // --- day-k retention cohorts (first-activity epoch day; users still
    // active exactly 1 / 7 days later) — integer day arithmetic only -------
    "retention" -> ((s, dir) =>
      graft.events.Analytics.retention(TestGraphs.table(s, dir, "events"))
        .orderBy("cohort_day")),

    // --- JSON property extraction + rollup (get_json_object, codegen'd;
    // DuckDB twins via its json extension) ----------------------------------
    "props_rollup" -> ((s, dir) =>
      graft.events.Analytics.propsRollup(TestGraphs.table(s, dir, "events"))
        .orderBy("event_type")),

    "sessionize" -> ((s, dir) =>
      graft.events.Sessionize
        .sessions(TestGraphs.table(s, dir, "events"), gapSeconds = 14400L)
        .orderBy("user_id", "session_start_us")),

    // --- the SAME sessions via Structured Streaming session_window
    // (append mode, watermark-flushed bounded replay) — shares
    // sessionize's oracle row-for-row ------------------------------------
    "stream_sessions" -> ((s, dir) =>
      graft.streaming.SessionStream
        .sessionsViaStream(TestGraphs.table(s, dir, "events"),
          gapSeconds = 14400L)
        .orderBy("user_id", "session_start_us")),

    // --- corpus-wide top-50 bigram counts (boilerplate/contamination
    // profile); deterministic under the total (cnt, gram) order ------------
    "topk_bigrams" -> ((s, dir) =>
      TextOps.ngramCounts(docs(s, dir), 2)
        .orderBy(col("cnt").desc, col("gram"))
        .limit(50)),

    // --- top-50 bigram collocations by lift (PMI family) in overflow-proof
    // integer micro-units — association strength, where topk_bigrams is
    // raw frequency ---------------------------------------------------------
    "bigram_lift" -> ((s, dir) =>
      TextOps.bigramLift(docs(s, dir), minCount = 5)
        .orderBy(col("lift_micro").desc, col("gram"))
        .limit(50)),

    // --- top-50 skip-gram co-occurrence pairs within a 7-token window
    // (the word2vec training-pair corpus; per-distance equi-join legs,
    // never a theta join) ----------------------------------------------------
    "cooccur7" -> ((s, dir) =>
      TextOps.cooccurrence(docs(s, dir), 7)
        .orderBy(col("cnt").desc, col("w1"), col("w2"))
        .limit(50)),

    // --- per-doc top-3 TF·IDF terms: idf as the integer micro-unit
    // inverse-df ratio (no float log crosses the gate — the link_pred
    // RA-over-Adamic-Adar reasoning) ---------------------------------------
    "tfidf_top3" -> ((s, dir) =>
      TextOps.tfIdfTop(docs(s, dir), 3).orderBy("doc_id", "rank")),

    // --- 40-token context-window chunking with per-chunk md5 fingerprints
    // (training context prep; shuffle-free per-row array expressions) ------
    "chunk40" -> ((s, dir) =>
      TextOps.chunkFingerprints(docs(s, dir), 40)
        .orderBy("doc_id", "chunk_idx")),

    // --- deterministic md5 train/valid/test split (8/1/1): per-row, no
    // shuffle, stable under corpus growth — the reproducible-split
    // primitive every training pipeline needs ------------------------------
    "doc_split" -> ((s, dir) =>
      TextOps.hashSplit(docs(s, dir))
        .select("doc_id", "lang", "bucket", "split")
        .orderBy("doc_id")),

    // --- benchmark-contamination check across the md5 split: distinct
    // shared 8-grams per (test doc, train doc) candidate pair; hot-shingle
    // cap df≤100 (deterministic, mirrored in the oracle) -------------------
    "contamination8" -> ((s, dir) =>
      TextOps.contamination(docs(s, dir), 8, 100L)
        .orderBy("test_doc", "train_doc")),

    // --- text analysis -----------------------------------------------------
    "text_stats" -> ((s, dir) =>
      TextOps.textStats(docs(s, dir)).orderBy("doc_id")),

    "lang_id" -> ((s, dir) =>
      TextOps.langId(docs(s, dir)).orderBy("doc_id")),

    "token_count" -> ((s, dir) =>
      TextOps.tokenCounts(docs(s, dir)).orderBy("doc_id")),

    // --- stratified per-language sampling: the md5 hash is keyed by
    // (pred_lang : doc_id), so each stratum's ~20% sample is independent
    // of the others and stable under corpus growth — the balanced
    // training-mix primitive on top of doc_split's hash discipline -------
    "stratified_sample" -> ((s, dir) =>
      TextOps.langId(docs(s, dir))
        .select(col("doc_id"), col("pred_lang"))
        .where(GraphOps.md5Prio(
          concat_ws(":", col("pred_lang"), col("doc_id"))) % 5 === 0)
        .orderBy("doc_id")),

    // --- document length distribution (whitespace tokens) as exact
    // discrete quantiles — the corpus-curation length-filter calibrator --
    "doc_len_quantiles" -> ((s, dir) =>
      graft.functions.Quantiles.discrete(
        TextOps.tokenCounts(docs(s, dir)), "ws_tokens",
        Seq(25, 50, 75, 90, 99)).orderBy("pct")),

    "doc_fingerprint" -> ((s, dir) =>
      TextOps.fingerprint(docs(s, dir)).orderBy("doc_id")),

    // --- per-doc boilerplate fraction: share of distinct 5-gram shingles
    // recurring in ≥3 corpus docs, in integer micro-units — the template/
    // chrome quality signal; df lookup on the shingle key, no pair join ---
    "boilerplate5" -> ((s, dir) =>
      TextOps.boilerplateFrac(docs(s, dir), 5, 3L).orderBy("doc_id")),

    // --- within-doc 5-gram repetition ratio (degenerate-text detector):
    // pure per-row array expressions, zero shuffles --------------------------
    "repetition5" -> ((s, dir) =>
      TextOps.repetition(docs(s, dir), 5).orderBy("doc_id")),

    // --- GPT-style sequence-packing layout: md5-sharded concat-and-cut
    // into 2048-token context windows; the one wide op is a running-sum
    // window PARTITIONED BY shard (per-partition state, never a global
    // sort) ----------------------------------------------------------------
    "pack2048" -> ((s, dir) =>
      TextOps.packBins(docs(s, dir), 2048L, 8L).orderBy("doc_id")),

    // --- exact-integer Lloyd k-means over quantized embeddings (k=8, two
    // assignment rounds, md5-seeded): corpus-curation clustering with a
    // bit-exact DuckDB twin — micro-unit lattice coords, packed-BIGINT
    // argmin, floored-mean centroids ----------------------------------------
    "kmeans8" -> ((s, dir) =>
      graft.ann.KMeans.run(s, emb(s, dir), 8, 2).orderBy("vec_id")),

    // --- product quantization (4 × 16-dim subspaces, k=4 codebooks):
    // per-vector code tuple + exact summed reconstruction error — the
    // vector-compression primitive behind ADC search ------------------------
    "pq4" -> ((s, dir) =>
      graft.ann.KMeans.pq(s, emb(s, dir), 4, 16, 4, 2).orderBy("vec_id")),

    // --- composed training-data cleaning pipeline: language filter →
    // exact-dedup survivors → quality threshold, one declarative plan (the
    // operators fuse; Catalyst shares the token-array projection) ---------
    "pipeline_clean" -> ((s, dir) => {
      val d = docs(s, dir)
      val en = TextOps.langId(d).where(col("pred_lang") === "en")
        .select("doc_id")
      val kept = Dedup.exact(d).select(col("keep_id").as("doc_id"))
      TextOps.textStats(d).select(col("doc_id"), col("quality_score"))
        .join(en, Seq("doc_id"), "left_semi")
        .join(kept, Seq("doc_id"), "left_semi")
        .where(col("quality_score") >= 0.5)
        .orderBy("doc_id")
    }),

    // --- per-row content invariant (BASELINE.json input_hint) -------------
    "corpus_sha" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), sha2(col("text"), 256).as("sha"))
        .orderBy("doc_id")),

    // --- spec-mandated corpus path (G8), synthesized in-query: the corpus
    // is a pure md5/sha256 function of (i, j, k) so DuckDB regenerates it
    // from generate_series — deterministic CorpusGen → dense ids →
    // co-change / import edges, all under the hard oracle gate.
    "g_cochange_corpus" -> ((s, dir) => {
      val corpus = CorpusGen.generate(s, 20, 30, 8)
      val ids = EdgeDerivation.idMap(corpus,
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        .localCheckpoint(true)
      EdgeDerivation.coChangeEdges(corpus, ids).orderBy("src", "dst")
    }),

    "g_import_corpus" -> ((s, dir) => {
      val corpus = CorpusGen.generate(s, 20, 30, 8)
      val ids = EdgeDerivation.idMap(corpus,
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        .localCheckpoint(true)
      EdgeDerivation.importEdges(corpus, ids).orderBy("src", "dst")
    }),

    // --- neighbor-set OVERLAP coefficient at ≥0.5 in integer micro-units:
    // the hub-subset detector Jaccard misses (graph-side containment) ----
    "g_overlap_sim" -> ((s, dir) =>
      GraphOps.neighborOverlap(
        TestGraphs.copurchase(s, dir)
          .where(col("weight") >= 2).select("src", "dst"), 500000L)
        .orderBy("v1", "v2")),

    // --- neighbor-set Jaccard similarity (link prediction): candidate
    // pairs from one wedge join, sim = inter/(d1+d2-inter) rounded ------
    "g_jaccard_sim" -> ((s, dir) =>
      GraphOps.neighborJaccard(
        TestGraphs.copurchase(s, dir)
          .where(col("weight") >= 2).select("src", "dst"), 0.3)
        .orderBy("v1", "v2")),

    // --- the SAME similarity with the hot-center cap ENGAGED (maxDeg=8 —
    // 75 of the sf0.01 graph's wedge centers exceed it, so the capped
    // output genuinely differs from g_jaccard_sim's):
    // wedge centers above the cap are skipped — the documented production
    // default for the 100 TB path, where one celebrity vertex otherwise
    // contributes deg² wedge pairs. The cap is deterministic, so this is
    // a full oracle gate, not a rows-only concession (VERDICT r4 item 7).
    "g_jaccard_capped" -> ((s, dir) =>
      GraphOps.neighborJaccard(
        TestGraphs.copurchase(s, dir)
          .where(col("weight") >= 2).select("src", "dst"), 0.3,
        maxDeg = 8)
        .orderBy("v1", "v2")),

    // --- one-row exact moment profile of the undirected graph: counts,
    // max degree, wedges, and degree assortativity as an exact rational --
    "graph_profile" -> ((s, dir) =>
      GraphOps.profile(undM(s, dir)).orderBy("n_vertices")),

    // --- bipartite butterfly (4-cycle) count on the customer→part graph
    // (the bipartite triangle analog); exact integers, hot-center cap ----
    "butterflies" -> ((s, dir) =>
      TriangleCount.butterflies(
        TestGraphs.custPart(s, dir).select("src", "dst"))
        .orderBy("butterflies")),

    // --- HITS hubs & authorities on the customer→part bipartite graph,
    // unnormalized fixed-4 form: every score an exact integer (sums of
    // degree products), so the full trajectory crosses the gate; k=4 is
    // 5 digits under the BIGINT ceiling (measured, Hits scaladoc) --------
    "hits4" -> ((s, dir) =>
      Hits.fixedIterations(TestGraphs.custPart(s, dir)
          .select("src", "dst"), 4)
        .orderBy("id", "kind")),

    // --- truncated longest-path DAG layering (topological levels) on the
    // weight≥2 co-purchase DAG (src<dst orientation ⇒ acyclic); 8 rounds,
    // integer-exact at any equal k (harmonic8 truncation discipline) ------
    "dag_layers8" -> ((s, dir) =>
      Paths.dagLayers(
        TestGraphs.copurchase(s, dir).where(col("weight") >= 2)
          .select("src", "dst"), 8)
        .orderBy("id")),

    // --- deterministic md5-seeded random walks (the DeepWalk corpus
    // generator shape): 4 hops from every id≡0 (mod 20) vertex of the
    // weight≥2 undirected graph — the trajectory replays exactly in SQL --
    "walks4" -> ((s, dir) => {
      val e = GraphOps.symmetrizeOriented(
          TestGraphs.copurchase(s, dir).where(col("weight") >= 2)
            .select("src", "dst"))
        .where(col("src") =!= col("dst")).localCheckpoint(true)
      Walks.walks(e, GraphOps.vertices(e).where(col("id") % 20 === 0), 4)
        .orderBy("start_id")
    }),

    // --- community quality: Newman modularity of the 5-round LP partition
    // on the weight≥2 subgraph (the dense full graph collapses LP to ≤2
    // communities — a trivial gate), reported as the exact rational
    // (q_num, q_den) so no float crosses the oracle ------------------------
    "modularity_lp5" -> ((s, dir) => {
      val e = GraphOps.symmetrizeOriented(
          TestGraphs.copurchase(s, dir).where(col("weight") >= 2)
            .select("src", "dst"))
        .where(col("src") =!= col("dst")).localCheckpoint(true)
      Community.modularity(e,
        LabelPropagation.fixedRounds(e, 5, allIn = true))
        .orderBy("n_comms")
    }),

    // --- link prediction (common neighbors + Resource Allocation in exact
    // integer micro-units — no float log crosses the gate): top-100
    // non-adjacent pairs on the same weight≥2 graph as g_jaccard_sim ------
    "link_pred" -> ((s, dir) =>
      LinkPrediction.scores(
          TestGraphs.copurchase(s, dir).where(col("weight") >= 2)
            .select("src", "dst"))
        .orderBy(col("ra_micro").desc, col("cn").desc, col("u"), col("v"))
        .limit(100)),

    // --- average-neighbor-degree curve knn(k): degree-degree correlation
    // as a function, integer micro-units --------------------------------------
    "knn_degree" -> ((s, dir) =>
      GraphOps.knnDegree(TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst"))
        .orderBy("deg")),

    // --- item-to-item co-visitation recommendations ("customers also
    // bought"): top-3 co-purchase partners per part under the total
    // (weight DESC, id) order — one key-partitioned window ------------------
    "covisit_top3" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cp = TestGraphs.copurchase(s, dir)
      val sym = cp.select("src", "dst", "weight")
        .unionByName(cp.select(col("dst").as("src"), col("src").as("dst"),
          col("weight")))
      sym.withColumn("rk", row_number().over(Window.partitionBy("src")
          .orderBy(col("weight").desc, col("dst"))).cast("long"))
        .where(col("rk") <= 3)
        .select(col("src").as("id"), col("dst").as("rec"), col("weight"),
          col("rk"))
        .orderBy("id", "rk")
    }),

    // --- per-event-type value percentiles (grouped percentile_disc in
    // integer cents — the per-segment dashboard shape) -----------------------
    "value_quantiles" -> ((s, dir) =>
      graft.functions.Quantiles.discreteBy(
        TestGraphs.table(s, dir, "events")
          .select(col("event_type"),
            round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents", Seq(50, 90, 99))
        .orderBy("event_type", "pct")),

    // --- deterministic negative edge sampling (md5-keyed trials onto the
    // dense vertex-rank space, known edges anti-joined out): the other
    // half of a link-prediction / embedding training set ---------------------
    "neg_sample2" -> ((s, dir) =>
      LinkPrediction.negativeSample(undM(s, dir), trials = 8, k = 2)
        .orderBy("id", "trial")),

    // --- directed dyad census: reciprocity + transitivity as exact
    // rationals on the scc digraph (the one graph in the family with
    // reciprocated edges — the pure src<dst orientation has none) ---------
    "digraph_profile" -> ((s, dir) => {
      val cp = TestGraphs.copurchase(s, dir)
      val dg = cp.where(col("weight") >= 2).select("src", "dst")
        .unionByName(cp.where(col("weight") >= 3)
          .select(col("dst").as("src"), col("src").as("dst")))
      GraphOps.digraphProfile(dg).orderBy("n_vertices")
    }),

    // --- unipartite 4-cycle (rectangle) count on the weight≥2 graph —
    // butterflies' analog off the bipartite projection; exact BIGINTs ----
    "rectangles" -> ((s, dir) =>
      TriangleCount.rectangles(
        TestGraphs.copurchase(s, dir).where(col("weight") >= 2)
          .select("src", "dst"))
        .orderBy("rectangles")),

    // --- directed triangle census on the same digraph: cyclic vs
    // transitive closed-wedge instances, exact BIGINTs -------------------
    "ditriangles" -> ((s, dir) => {
      val cp = TestGraphs.copurchase(s, dir)
      val dg = cp.where(col("weight") >= 2).select("src", "dst")
        .unionByName(cp.where(col("weight") >= 3)
          .select(col("dst").as("src"), col("src").as("dst")))
      TriangleCount.directedCensus(dg).orderBy("cyclic3")
    }),

    // --- truncated Katz centrality on the weight≥2 DAG (src<dst ⇒
    // acyclic): per-length walk counts + beta-attenuated numerator, all
    // exact integers (the hits4 unnormalized discipline) -------------------
    "katz4" -> ((s, dir) =>
      Katz.truncated(TestGraphs.copurchase(s, dir).where(col("weight") >= 2)
        .select("src", "dst"), 4)
        .orderBy("id")),

    // --- full core decomposition: coreness(v) = max k with v ∈ k-core;
    // level-synchronous peeling, each level reusing the previous level's
    // fixpoint edge set -----------------------------------------------------
    "coreness" -> ((s, dir) =>
      KCore.coreness(TestGraphs.copurchase(s, dir).where(col("weight") >= 2)
        .select("src", "dst"))._1
        .orderBy("id")),

    // --- Borůvka minimum spanning forest of the weight≥2 co-purchase
    // graph; md5-packed distinct priorities make the MSF unique, so the
    // over-unrolled DuckDB Borůvka must reproduce the exact edge set ------
    "msf" -> ((s, dir) =>
      Msf.run(s, TestGraphs.copurchase(s, dir).where(col("weight") >= 2),
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        .orderBy("src", "dst")),

    // --- strongly connected components (A: directed companion to cc) on
    // the directed graph: weight≥2 co-purchase edges forward plus weight≥3
    // edges reversed (mutual strong ties create the cycles; the pure
    // src<dst orientation is a DAG with only trivial SCCs). FW-BW coloring
    // with trimming runs to the true fixpoint; the oracle is DuckDB's
    // algorithm-independent mutual-reachability closure — a hard gate with
    // no unroll assumption.
    "scc" -> ((s, dir) => {
      val cp = TestGraphs.copurchase(s, dir)
      val dg = cp.where(col("weight") >= 2).select("src", "dst")
        .unionByName(cp.where(col("weight") >= 3)
          .select(col("dst").as("src"), col("src").as("dst")))
      graft.algos.Scc.run(s, dg,
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        .orderBy("id")
    }),

    // --- k-truss (edge-support peeling to fixpoint, k=3: every surviving
    // edge closes ≥1 triangle within the truss); oracle = over-unrolled
    // peel (fixpoint stable under extra rounds; ConvergenceProbe measured
    // 2 rounds at sf0.01 AND sf0.1 — 5 rounds = 2.5× margin)
    "ktruss3" -> ((s, dir) =>
      graft.algos.Truss.converged(TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst"), 3)
        ._1.orderBy("src", "dst")),

    // --- per-edge triangle support incl. zero-support bridges (truss's
    // round-0 table as a driver-visible edge-strength profile) -------------
    "tri_support" -> ((s, dir) =>
      graft.algos.Truss.edgeSupport(TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst"))
        .orderBy("src", "dst")),

    // --- condensation DAG over the SCC labels: component-pair crossing
    // edges — the cycles-contracted dependency graph (always acyclic) ------
    "scc_condense" -> ((s, dir) => {
      val cp = TestGraphs.copurchase(s, dir)
      val dg = cp.where(col("weight") >= 2).select("src", "dst")
        .unionByName(cp.where(col("weight") >= 3)
          .select(col("dst").as("src"), col("src").as("dst")))
      graft.algos.Scc.condensation(s, dg,
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        .orderBy("src_scc", "dst_scc")
    }),

    // --- truncated harmonic centrality (multi-root BFS, integer-exact
    // micro-unit scores — sums of round(1e6/d) over the 8 smallest-id
    // roots within 4 hops, so the whole score is a long in both engines)
    "harmonic8" -> ((s, dir) =>
      Paths.harmonicFixedRounds(und(s, dir), 8, 4).orderBy("id")),

    // --- landmark distance oracle over the same 8-root/4-hop tables:
    // triangle-inequality upper bounds for the md5-sampled pair set --------
    "landmark_dist" -> ((s, dir) =>
      Paths.landmarkDistances(und(s, dir), 8, 4, 25L).orderBy("a", "b")),

    // --- truncated closeness over the same 8-root sample: exact integer
    // (reached, sum_dist) pairs — closeness = reached/sum_dist left to the
    // caller so no float crosses the gate -------------------------------
    "closeness8" -> ((s, dir) =>
      Paths.closenessFixedRounds(und(s, dir), 8, 4).orderBy("id")),

    // --- Jones–Plassmann coloring under the FULL oracle: md5Prio
    // priorities (the mis/matching discipline) have a byte-exact DuckDB
    // twin where the xxhash64 default (`coloring`) is rows-only ----------
    "coloring_md5" -> ((s, dir) =>
      graft.algos.Coloring.run(s,
        TestGraphs.copurchase(s, dir)
          .where(col("weight") >= 2).select("src", "dst"),
        numPartitions =
          s.conf.get("spark.sql.shuffle.partitions", "32").toInt,
        md5Pri = true)
        .select(col("id"), col("color").cast("long").as("color"))
        .orderBy("id")),

    // --- maximal independent set (Luby, md5 priorities — deterministic in
    // BOTH engines, unlike coloring's xxhash64): converged run; the oracle
    // over-unrolls the rounds (fixpoint = everyone decided, stable under
    // extra rounds; ConvergenceProbe measures the count)
    "mis" -> ((s, dir) =>
      graft.algos.Mis.run(s, TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst"),
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        ._1.orderBy("id")),

    // --- maximal matching (greedy by md5 edge priority — the MIS recipe
    // on the line graph without materializing it): converged run, oracle
    // over-unrolled (6/3 measured rounds → 12)
    "matching" -> ((s, dir) =>
      graft.algos.Matching.run(s, TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst"),
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        ._1.orderBy("src", "dst")),

    // --- greedy b-matching (each vertex accepts up to b = 2 edges — the
    // b-suitor rank-within-capacity rule): converged run, oracle
    // over-unrolled (ConvergenceProbe: 5 rounds at sf0.01, 2 at sf0.1)
    "matching_b2" -> ((s, dir) =>
      graft.algos.Matching.runB(s, TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst"), 2,
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        ._1.orderBy("src", "dst")),

    // --- greedy max-weight maximal matching (locally-dominant edges —
    // Preis/Hoepman 1/2-approx): weight-first packed priority, md5-prefix
    // tie-break; converged run, oracle over-unrolled
    "matching_w" -> ((s, dir) =>
      graft.algos.Matching.runWeighted(s, TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst", "weight"),
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        ._1.orderBy("src", "dst")),

    // --- weighted truncated harmonic centrality: min-plus multi-root
    // sweep over the weighted undirected graph; integral weights keep
    // round(1e6/d) engine-exact
    "harmonic_w8" -> ((s, dir) => {
      val cp = TestGraphs.copurchase(s, dir)
      val ew = cp.select(col("src"), col("dst"), col("weight"))
        .union(cp.select(col("dst"), col("src"), col("weight")))
      Paths.harmonicFixedRounds(ew, 8, 4, weighted = true).orderBy("id")
    }),

    // --- distinct cardinality (§2.6): exact two-phase distinct agg --------
    "distinct_users" -> ((s, dir) =>
      graft.functions.Cardinality.exactDistinct(
        TestGraphs.table(s, dir, "events"), "event_type", "user_id")
        .orderBy("event_type")),

    // --- multimodal plumbing ----------------------------------------------
    "multimodal_meta" -> ((s, dir) =>
      Multimodal.payloadMeta(docs(s, dir)).orderBy("doc_id")),

    // --- strided keyframe sampling over the binary payload: real
    // byte-level BinaryType slicing + per-frame md5, shuffle-free ------------
    "frame_sample4" -> ((s, dir) =>
      Multimodal.frameSample(docs(s, dir), 16, 4)
        .orderBy("doc_id", "frame_idx")),

    // --- similarity search -------------------------------------------------
    "embed_neardup" -> ((s, dir) =>
      Similarity.nearDupPairs(emb(s, dir), 0.4).orderBy("v1", "v2")),

    "ann_top5" -> ((s, dir) =>
      Similarity.topK(emb(s, dir).where(col("vec_id") < 20), emb(s, dir), 5)
        .select("query_id", "neighbor_id", "rk", "cos")
        .orderBy("query_id", "rk")),

    // --- time-respecting (temporal) reachability: earliest-arrival BFS
    // over the timestamped cust↔part purchase edges — a static closure
    // over-counts here because it follows edges back in time. Seeds =
    // custkey % 50 customers at arrival 0; 4 alternating hops -------------
    "temporal_reach4" -> ((s, dir) => {
      val o = TestGraphs.table(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = TestGraphs.table(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey")
      val te0 = o.join(li, o("o_orderkey") === li("l_orderkey"))
        .select(col("o_custkey").as("cust"),
          (col("l_partkey") + lit(1000000000L)).as("part"),
          expr("unix_micros(cast(o_orderdate as timestamp))").as("t"))
        .distinct()
      val te = te0.select(col("cust").as("src"), col("part").as("dst"),
          col("t"))
        .unionByName(te0.select(col("part").as("src"),
          col("cust").as("dst"), col("t")))
      val seeds = te0.select(col("cust").as("id")).distinct()
        .where(col("id") % 50 === 0)
        .select(col("id"), lit(0L).as("arrival"))
      graft.algos.Temporal.earliestArrival(te, seeds, 4).orderBy("id")
    }),

    // --- first-order event-type transition counts (the empirical Markov
    // table): one key-partitioned lead window + one pair count ------------
    "event_transitions" -> ((s, dir) =>
      graft.events.Analytics.transitions(TestGraphs.table(s, dir, "events"))
        .orderBy("from_type", "to_type")),

    // --- DAU / trailing-7-day WAU stickiness in exact ppm: the WAU window
    // as a bounded 7-row fan-out, never a BETWEEN range join --------------
    "stickiness7" -> ((s, dir) =>
      graft.events.Analytics.stickiness(TestGraphs.table(s, dir, "events"))
        .orderBy("day")),

    // --- ANF / HyperBall: FM sketch OR-propagation, 4 hops × 8 registers.
    // Deterministic md5-seeded bits make the approximate algorithm's exact
    // register trajectory the oracle surface -----------------------------
    "anf4" -> ((s, dir) =>
      graft.algos.Sketches.anf(und(s, dir), 4, 8).orderBy("id")),

    // --- synchronous level-1 Louvain, 4 integer-gain move rounds over the
    // weighted copurchase graph ------------------------------------------
    "louvain4" -> ((s, dir) => {
      val cp = TestGraphs.copurchase(s, dir)
      val ew = cp.unionByName(cp.select(col("dst").as("src"),
        col("src").as("dst"), col("weight")))
      graft.algos.Louvain.rounds(ew, 4).orderBy("id")
    }),

    // --- Heaps-law vocabulary growth: new/cumulative distinct 3-shingle
    // types per 5-doc bucket; first-seen = ONE min hash-agg on the shingle
    // key, the running sum a window over the tiny bucket table only -------
    "vocab_growth" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val first = TextOps.shingleRows(docs(s, dir), "doc_id", "text", 3)
        .groupBy("shingle").agg(min("doc_id").as("fd"))
      val perB = first.groupBy(expr("fd div 5").as("bucket"))
        .agg(count(lit(1)).as("new_types"))
      perB.select(col("bucket"), col("new_types"),
          sum("new_types").over(Window.orderBy("bucket"))
            .cast("long").as("cum_types"))
        .orderBy("bucket")
    }),

    // --- SALSA on the customer→part bipartite graph: the stochastic HITS,
    // fixed-point micro-units with per-vertex floor division BEFORE the
    // edge join — integer-exact trajectory, hits4's cost shape ------------
    "salsa4" -> ((s, dir) =>
      graft.algos.Spectral.salsa(
        TestGraphs.custPart(s, dir).select("src", "dst"), 4)
        .orderBy("id", "kind")),

    // --- eigenvector centrality, 4 power-iteration rounds with integer
    // max-normalization (y·1e6 div max(y)); the max is a 1-row broadcast --
    "eigen4" -> ((s, dir) =>
      graft.algos.Spectral.eigenvector(und(s, dir), 4).orderBy("id")),

    // --- rich-club density profile φ(k) in ppm over thresholds 2/4/8/16:
    // one deg-tag of the edges + ONE conditional-sum pass per the broadcast
    // threshold table --------------------------------------------------
    "richclub" -> ((s, dir) =>
      GraphOps.richClub(undM(s, dir), Seq(2, 4, 8, 16)).orderBy("k")),

    // --- Lee et al. duplicated-window profile: 20-token windows occurring
    // ≥2× anywhere in the corpus, per-doc exact ppm; one shuffle on the
    // window-hash key + the join-back on the SAME key — never doc×doc -----
    "windowdup20" -> ((s, dir) =>
      TextOps.duplicatedWindows(docs(s, dir), 20).orderBy("doc_id")),

    // --- winnowing (MOSS) fingerprint density, k=4 grams / w=5 windows:
    // the sliding min is a rows-between window PARTITIONED BY doc ---------
    "winnow45" -> ((s, dir) =>
      TextOps.winnow(docs(s, dir), 4, 5).orderBy("doc_id")),

    // --- time-respecting wedge census: a→m→b with t1 ≤ t2 ≤ t1+30d over
    // the timestamped cust↔part edges, per mid vertex; both legs join ON
    // the mid key (co-partitioned), hot mids capped at deg ≤ 128 so the
    // deg² fan-out is bounded — the declared semantics, mirrored in the
    // oracle -------------------------------------------------------------
    "temporal_wedges" -> ((s, dir) => {
      val o = TestGraphs.table(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = TestGraphs.table(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey")
      val te0 = o.join(li, o("o_orderkey") === li("l_orderkey"))
        .select(col("o_custkey").as("cust"),
          (col("l_partkey") + lit(1000000000L)).as("part"),
          expr("unix_micros(cast(o_orderdate as timestamp))").as("t"))
        .distinct()
      val te = te0.select(col("cust").as("src"), col("part").as("dst"),
          col("t"))
        .unionByName(te0.select(col("part").as("src"),
          col("cust").as("dst"), col("t")))
      graft.algos.Temporal.timeWedges(te, 30L * 86400L * 1000000L, 128L)
        .orderBy("m")
    }),

    // --- HashMin CC forced onto the 2D grid edge layout (G5): the same
    // fixpoint as cc — shared closure oracle — proving the grid kernel is
    // algorithm-generic, not a PR special case --------------------------
    "cc_grid" -> ((s, dir) => {
      val cpf = TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst")
      ConnectedComponents.run(s, cpf,
          cfg(s).copy(gridSide = Some(4), batchSize = 4))
        .state.orderBy("id")
    }),

    // --- ANF neighbourhood-function curve N(t): per-round corpus-wide
    // first-zero-bit sums — the integer core of an effective-diameter
    // estimate; same per-round cost as anf4 plus one tiny agg -------------
    "anf_profile" -> ((s, dir) =>
      graft.algos.Sketches.anfProfile(und(s, dir), 4, 8).orderBy("round")),

    // --- robustness-after-hub-removal: drop the top-50 degree hubs
    // (deterministic (deg desc, id) tie-break), re-run CC over the
    // remainder, report component census ---------------------------------
    "hub_attack" -> ((s, dir) =>
      ConnectedComponents.hubAttackCensus(s, undM(s, dir), 50,
        cfg(s).copy(batchSize = 4))),

    // --- wedge-sampling triangle estimate, md5-deterministic 1/16 sample:
    // the sampled/closed counts are exact (the oracle gate), the estimator
    // is the 100 TB-scale triangle path -----------------------------------
    "tc_sampled" -> ((s, dir) =>
      TriangleCount.sampledCount(
        TestGraphs.copurchase(s, dir).select("src", "dst"), 16,
        canonicalInput = true)),

    // --- second-order event-type transitions (the trigram Markov table):
    // two leads over ONE user-partitioned window --------------------------
    "transitions2" -> ((s, dir) =>
      graft.events.Analytics.transitions2(TestGraphs.table(s, dir, "events"))
        .orderBy("t1", "t2", "t3")),

    // --- Louvain phase 2: contract communities after the 4 move rounds and
    // aggregate super-edge weights (diagonal = 2× intra mass) -------------
    "louvain_coarsen" -> ((s, dir) => {
      val cp = TestGraphs.copurchase(s, dir)
      // lazy cut shared by the move rounds AND the coarsen joins — coarsen
      // otherwise replayed the whole co-purchase derivation plan (r6)
      val ew = cp.unionByName(cp.select(col("dst").as("src"),
        col("src").as("dst"), col("weight")))
        .transform(graft.engine.Lineage.cut(_))
      val labels = graft.algos.Louvain.rounds(ew, 4)
      graft.algos.Louvain.coarsen(ew, labels)
        .orderBy("comm_src", "comm_dst")
    }),

    // --- keyed-state streaming transitions (flatMapGroupsWithState): the
    // last event per user carried ACROSS micro-batches over an ordered
    // time-chunk replay — shares event_transitions' batch oracle ---------
    "stream_transitions" -> ((s, dir) =>
      graft.streaming.TransitionStream
        .transitionsViaStream(TestGraphs.table(s, dir, "events"))
        .orderBy("from_type", "to_type")),

    // --- k-means inertia (elbow) curve: Σ dist² after each of 3 Lloyd
    // rounds — one 1-row agg per materialized assignment -----------------
    "kmeans_inertia" -> ((s, dir) =>
      graft.ann.KMeans.runProfile(s, emb(s, dir), 8, 3).orderBy("round")),

    // --- Zipf rank-frequency profile: corpus token counts, top-50 by
    // (cnt desc, tok); the rank window runs over the 50-row table only ----
    "zipf50" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tf = docs(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      tf.orderBy(col("cnt").desc, col("tok")).limit(50)
        .select(row_number()
            .over(Window.orderBy(col("cnt").desc, col("tok")))
            .cast("long").as("rank"),
          col("tok"), col("cnt"))
        .orderBy("rank")
    }),

    // --- log2-bucketed joint degree matrix (the degree-correlation
    // profile): two co-partitioned deg joins + one pair-bucket count ------
    "joint_degree" -> ((s, dir) => {
      val e = undM(s, dir)
      val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      e.join(deg.toDF("src", "ds"), "src")
        .join(deg.toDF("dst", "dd"), "dst")
        .groupBy(length(bin(col("ds"))).cast("long").as("src_bucket"),
          length(bin(col("dd"))).cast("long").as("dst_bucket"))
        .agg(count(lit(1)).as("n_edges"))
        .orderBy("src_bucket", "dst_bucket")
    }),

    // --- densest-subgraph greedy peel profile (Charikar 2-approx, ε=1
    // batched peel) on the weight≥2 co-purchase graph (the full graph is
    // near-regular and drains in one round — measured): integer-exact
    // per-round (n, m2) curve + cross-mult density argmax flag;
    // rounds ≤ ⌈log₂ n⌉ ----------------------------------------------------
    "densest" -> ((s, dir) =>
      graft.algos.Densest.peelProfile(s,
        GraphOps.symmetrizeOriented(TestGraphs.copurchase(s, dir)
          .where(col("weight") >= 2).select("src", "dst")),
        cfg(s).numPartitions).orderBy("round")),

    // --- signed-triangle structural balance census: md5-parity edge
    // signs, balanced ⇔ even number of negative edges; one exact row ------
    "balance_tri" -> ((s, dir) =>
      TriangleCount.signedBalance(TestGraphs.copurchase(s, dir),
        canonicalInput = true)),

    // --- Markov stationary distribution of the event-type transition
    // chain: 4 power-iteration steps in exact integer micro-units ---------
    "markov4" -> ((s, dir) =>
      graft.events.Analytics.markovStationary(
          TestGraphs.table(s, dir, "events"), 4)
        .withColumnRenamed("w", "weight")
        .orderBy("event_type")),

    // --- weighted neighbor Jaccard (Ruzicka Σmin/Σmax) in exact integer
    // micro-units — wedge-join candidates, never all-pairs ----------------
    "g_wjaccard" -> ((s, dir) =>
      GraphOps.neighborJaccardWeighted(
        TestGraphs.copurchase(s, dir).where(col("weight") >= 2)
          .select("src", "dst", "weight"), 300000L)
        .orderBy("v1", "v2")),

    // --- shortest-path σ counts within 4 hops of the min-id source (the
    // Brandes forward phase as its own operator); exact BIGINT counts ----
    "sigma4" -> ((s, dir) => {
      val e = und(s, dir).transform(graft.engine.Lineage.cut(_)) // lazy shared cut (the bfs5 r6 note)
      Paths.sigmaCounts(e, e.agg(min(col("src"))), 4).orderBy("id")
    }),

    // --- multi-seed personalized PageRank: one SPARSE vector per seed
    // (ids ≡ 0 mod 500), 4 fixed iterations keyed (seed, id) -------------
    "ppr_multi4" -> ((s, dir) =>
      PageRank.multiSeedFixedIterations(undM(s, dir),
        id => pmod(id, lit(500L)) === 0, 4)
        .select(col("seed"), col("id"), round(col("rank"), 6).as("pr"))
        .orderBy("seed", "id")),

    // --- connected components OF the 3-truss subgraph (operator
    // composition: truss peel → CC over the survivors — the
    // "triangle-reinforced community cores" pipeline) ---------------------
    "truss_comm" -> ((s, dir) => {
      val (te, _) = graft.algos.Truss.converged(
        TestGraphs.copurchase(s, dir)
          .where(col("weight") >= 2).select("src", "dst"), 3)
      ConnectedComponents.run(s, te.select("src", "dst"), cfg(s))
        .state.orderBy("id")
    }),

    // --- APPEND-mode windowed counts under a real watermark late-drop
    // (the streaming semantics complete mode can't show): deterministic
    // event_id%4 batches, mtime-pinned replay order; boundaries pinned by
    // Wave26Spec (drop iff end ≤ wm, emit iff end ≤ final wm) -------------
    "stream_late" -> ((s, dir) =>
      graft.streaming.EdgeStream.lateDropWindowCounts(
        TestGraphs.table(s, dir, "events"), 4, "1 hour")
        .orderBy("hour_bucket", "event_type")),

    // --- bond-percolation robustness profile: keep each edge iff its
    // md5 hash falls under p% (deterministic random failure — the
    // complement of hub_attack's targeted removal), then component
    // structure per threshold via the CC kernel ---------------------------
    "percolation3" -> ((s, dir) => {
      val cpf = TestGraphs.copurchase(s, dir).where(col("weight") >= 2)
        .select("src", "dst").localCheckpoint(true)
      val keyed = cpf.withColumn("h",
        GraphOps.md5Prio(concat_ws(":", col("src"), col("dst"))) % 100)
      Seq(25, 50, 75).map { p =>
        val kept = keyed.where(col("h") < p).select("src", "dst")
        ConnectedComponents.run(s, kept, cfg(s)).state
          .groupBy("component").agg(count(lit(1)).as("sz"))
          .agg(lit(p.toLong).as("p_pct"),
            count(lit(1)).as("n_components"),
            coalesce(sum("sz"), lit(0L)).as("n_vertices"),
            coalesce(max("sz"), lit(0L)).as("max_size"))
      }.reduce(_ unionByName _).orderBy("p_pct")
    }),

    // --- language confusion matrix: corpus lang metadata × n-gram-marker
    // prediction — the quality dashboard for the lang-ID heuristic --------
    "lang_confusion" -> ((s, dir) =>
      TextOps.langId(docs(s, dir))
        .join(docs(s, dir).select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred_lang")),

    // --- top-3 PageRank vertices per LP community (operator composition:
    // lp5 labels ⋈ pr5 ranks + one per-community window); ordering runs
    // on the ROUNDED rank so both engines break ties identically ----------
    "community_top3" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // weight≥2 graph: LP on the dense full graph collapses to ONE
      // community (measured at sf0.01) — the sparse graph keeps real ones
      val e = GraphOps.symmetrizeOriented(TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst"))
        .localCheckpoint(true)
      val labels = LabelPropagation.fixedRounds(e, 5, allIn = true)
      val ranks = PageRank.fixedIterations(e, 5)
        .select(col("id"), round(col("rank"), 6).as("pr"))
      val w = Window.partitionBy("label")
        .orderBy(col("pr").desc, col("id"))
      labels.join(ranks, "id")
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 3)
        .select("label", "id", "pr", "rk")
        .orderBy("label", "rk")
    }),

    // --- reciprocal best match (mutual top-1 cosine neighbors) within the
    // vec_id % 20 stratum — the high-precision duplicate-pair primitive
    // (a pair survives only if each is the other's nearest) ---------------
    "mutual_nn" -> ((s, dir) => {
      val sub = emb(s, dir).where(pmod(col("vec_id"), lit(20L)) === 0)
        .localCheckpoint(true)
      val t1 = Similarity.topK(sub, sub, 1)
        .select(col("query_id"), col("neighbor_id"), col("cos"))
        .localCheckpoint(true)
      t1.join(t1.toDF("q2", "n2", "c2"),
          col("query_id") === col("n2") && col("neighbor_id") === col("q2"))
        .where(col("query_id") < col("neighbor_id"))
        .select(col("query_id").as("v1"), col("neighbor_id").as("v2"),
          col("cos"))
        .orderBy("v1")
    }),

    // --- robust daily-active-users statistics: exact discrete median +
    // median absolute deviation (no mean/stddev float path) ---------------
    "dau_mad" -> ((s, dir) => {
      val dau = TestGraphs.table(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("dau"))
        .localCheckpoint(true)
      val med = graft.functions.Quantiles.discreteBy(
          dau.select(lit("all").as("g"), col("dau")), "g", "dau", Seq(50))
        .select(col("value").as("median_dau"))
      val dev = dau.crossJoin(broadcast(med))
        .select(lit("all").as("g"),
          abs(col("dau") - col("median_dau")).as("dev"))
      val mad = graft.functions.Quantiles.discreteBy(dev, "g", "dev", Seq(50))
        .select(col("value").as("mad_dau"))
      med.crossJoin(mad)
    }),

    // --- weighted triangle strength: Σ over triangles of the min edge
    // weight (the weighted-clustering mass tc's pure count misses) --------
    "tri_strength" -> ((s, dir) =>
      TriangleCount.triangleStrength(
        TestGraphs.copurchase(s, dir).where(col("weight") >= 2)
          .select("src", "dst", "weight"))),

    // --- star-schema revenue rollup (the §2.5 broadcast-dim join family
    // end-to-end): fact lineitem through orders→customer→nation→region,
    // revenue in exact cents, grouped by (region, order year) -------------
    "rev_region" -> ((s, dir) => {
      val li = TestGraphs.table(s, dir, "lineitem")
      val o = TestGraphs.table(s, dir, "orders")
      val c = TestGraphs.table(s, dir, "customer")
      val n = TestGraphs.table(s, dir, "nation")
      val r = TestGraphs.table(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), year(col("o_orderdate")).cast("long")
          .as("yr"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0)
            - col("l_discount")) * 100, 0).cast("long")).as("rev_cents"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy("r_name", "yr")
    }),

    // --- user-day basket lift between event types: co-occurrence in the
    // same (user, day) basket vs independence, in exact micro-units -------
    "basket_lift" -> ((s, dir) => {
      val b = TestGraphs.table(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day"), col("event_type"))
        .distinct().localCheckpoint(true)
      val nb = b.select("user_id", "day").distinct()
        .agg(count(lit(1)).as("nb")) // lazy 1-row basket count
      val nt = b.groupBy(col("event_type")).agg(count(lit(1)).as("nt"))
      val pairs = b.toDF("user_id", "day", "t1")
        .join(b.toDF("user_id", "day", "t2"), Seq("user_id", "day"))
        .where(col("t1") < col("t2"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("n_pair"))
      pairs
        .join(broadcast(nt.toDF("t1", "n1")), "t1")
        .join(broadcast(nt.toDF("t2", "n2")), "t2")
        .crossJoin(broadcast(nb))
        .select(col("t1"), col("t2"), col("n_pair"),
          expr("(n_pair * nb * 1000000) div (n1 * n2)")
            .as("lift_micro"))
        .orderBy("t1", "t2")
    }),

    // --- ego-net density of the top-8 degree hubs (weight≥2 graph): the
    // "is the celebrity's neighborhood a clique or a star?" diagnostic ----
    "ego_density" -> ((s, dir) => {
      val cpf = TestGraphs.copurchase(s, dir).where(col("weight") >= 2)
        .select("src", "dst").localCheckpoint(true)
      val und2 = GraphOps.symmetrizeOriented(cpf)
      val deg = und2.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("deg"))
      val hubs = deg.orderBy(col("deg").desc, col("id")).limit(8)
        .toDF("hub", "hdeg")
      val nbrs = und2.join(broadcast(hubs),
          col("src") === col("hub"))
        .select(col("hub"), col("dst").as("nbr"))
        .localCheckpoint(true)
      val among = cpf
        .join(nbrs.toDF("hub", "src"), Seq("src"))
        .join(nbrs.toDF("hub", "dst"), Seq("dst", "hub"), "left_semi")
        .groupBy("hub").agg(count(lit(1)).as("among"))
      hubs.join(among, Seq("hub"), "left")
        .select(col("hub"), col("hdeg").as("deg"),
          (col("hdeg") + coalesce(col("among"), lit(0L))).as("ego_edges"),
          expr("(2 * (hdeg + coalesce(among, 0)) * 1000000) div ((hdeg + 1) * hdeg)")
            .as("density_micro"))
        .orderBy(col("deg").desc, col("hub"))
    }),

    // --- 1-WL (Weisfeiler–Leman) color refinement, 3 rounds: label' =
    // md5(label | sorted neighbor labels) from a degree seed — the graph
    // fingerprinting / structural-role primitive; sort_array makes the
    // aggregate order-insensitive so the hash is shuffle-stable -----------
    "wl3" -> ((s, dir) => {
      val e = GraphOps.symmetrizeOriented(TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst"))
        .localCheckpoint(true)
      val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      var lab = deg.select(col("id"),
        md5(col("deg").cast("string")).as("wl"))
      for (_ <- 1 to 3) {
        val nl = e
          .join(lab.select(col("id").as("src"), col("wl").as("nwl")), "src")
          .groupBy(col("dst").as("id"))
          .agg(concat_ws(",", sort_array(collect_list(col("nwl"))))
            .as("ns"))
        lab = lab.join(nl, Seq("id"), "left")
          .select(col("id"),
            md5(concat_ws("|", col("wl"), coalesce(col("ns"), lit(""))))
              .as("wl"))
      }
      lab.orderBy("id")
    }),

    // --- Apriori step: frequent event-type triples in (user, day)
    // baskets at ≥5% support — candidate triples come ONLY from frequent
    // pairs (the pruning join), then one 3-way basket membership count ---
    "basket_triples" -> ((s, dir) => {
      val b = TestGraphs.table(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day"), col("event_type"))
        .distinct().localCheckpoint(true)
      // 5% support threshold as a lazy 1-row broadcast (no eager .count()
      // in the builder — SURVEY §7.3; ADVICE r5)
      val minSup = b.select("user_id", "day").distinct()
        .agg(expr("(count(1) * 5 + 99) div 100").as("min_sup"))
      val pairs = b.toDF("user_id", "day", "t1")
        .join(b.toDF("user_id", "day", "t2"), Seq("user_id", "day"))
        .where(col("t1") < col("t2"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("np"))
        .crossJoin(broadcast(minSup))
        .where(col("np") >= col("min_sup"))
        .select("t1", "t2", "np").localCheckpoint(true)
      val cand = pairs.select("t1", "t2")
        .join(pairs.toDF("t1", "t3", "np2").select("t1", "t3"), "t1")
        .where(col("t2") < col("t3"))
        .join(pairs.toDF("t2", "t3", "np3").select("t2", "t3"),
          Seq("t2", "t3"), "left_semi")
      cand
        .join(b.toDF("user_id", "day", "t1"), "t1")
        .join(b.toDF("user_id", "day", "t2"), Seq("user_id", "day", "t2"),
          "left_semi")
        .join(b.toDF("user_id", "day", "t3"), Seq("user_id", "day", "t3"),
          "left_semi")
        .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(minSup.select(col("min_sup").as("ms2"))))
        .where(col("n") >= col("ms2"))
        .select("t1", "t2", "t3", "n")
        .orderBy("t1", "t2", "t3")
    }),

    // --- inter-arrival gap quantiles per event type (gap to the user's
    // next event, attributed to the earlier event's type; exact discrete
    // ranks in whole seconds) ---------------------------------------------
    "gap_quantiles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
      val gaps = TestGraphs.table(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(cast(ts as timestamp))").as("us"))
        .withColumn("nxt", lead(col("us"), 1).over(w))
        .where(col("nxt").isNotNull)
        .select(col("event_type"),
          expr("(nxt - us) div 1000000").as("gap_s"))
      graft.functions.Quantiles.discreteBy(gaps, "event_type", "gap_s",
          Seq(50, 90, 99))
        .orderBy("event_type", "pct")
    }),

    // --- distinctive terms per language: corpus-lift in exact micro-units
    // (tf_lang/tok_lang vs tf_all/tok_all, cross-multiplied), top-3 per
    // lang at a tf ≥ 5 noise floor --------------------------------------
    "lang_terms3" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = docs(s, dir)
        .select(col("lang"), explode(TextOps.tokens(col("text"))).as("tok"))
        .localCheckpoint(true)
      val tfLang = toks.groupBy("lang", "tok").agg(count(lit(1)).as("tfl"))
      val tfAll = toks.groupBy("tok").agg(count(lit(1)).as("tfa"))
      val tokLang = toks.groupBy("lang").agg(count(lit(1)).as("nl"))
      val tokAll = toks.agg(count(lit(1)).as("ta")) // lazy 1-row corpus size
      val w = Window.partitionBy("lang")
        .orderBy(col("lift_micro").desc, col("tok"))
      tfLang.where(col("tfl") >= 5)
        .join(tfAll, "tok")
        .join(broadcast(tokLang), "lang")
        .crossJoin(broadcast(tokAll))
        .select(col("lang"), col("tok"), col("tfl"),
          expr("(tfl * ta * 1000000) div (tfa * nl)")
            .as("lift_micro"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 3)
        .orderBy("lang", "rk")
    }),

    // --- trailing-7-day revenue per event type: a RANGE-frame window
    // over the daily rollup (day-keyed frame, not row-counted) ------------
    "rev_rolling7" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = TestGraphs.table(s, dir, "events")
        .select(col("event_type"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy("event_type", "day").agg(sum(col("cents")).as("cents"))
      val w = Window.partitionBy("event_type").orderBy(col("day"))
        .rangeBetween(-6, 0)
      daily.withColumn("cents7", sum(col("cents")).over(w))
        .orderBy("event_type", "day")
    }),

    // --- robust outlier days: |dau − median| > 3·MAD (the dau_mad
    // statistics applied as a filter — no mean/stddev float path) ---------
    "dau_outliers" -> ((s, dir) => {
      val dau = TestGraphs.table(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("dau"))
        .localCheckpoint(true)
      val med = graft.functions.Quantiles.discreteBy(
          dau.select(lit("all").as("g"), col("dau")), "g", "dau", Seq(50))
        .select(col("value").as("med"))
      val dev = dau.crossJoin(broadcast(med))
        .select(lit("all").as("g"), abs(col("dau") - col("med")).as("dev"))
      val mad = graft.functions.Quantiles.discreteBy(dev, "g", "dev", Seq(50))
        .select(col("value").as("mad"))
      dau.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
        .where(abs(col("dau") - col("med")) > lit(3) * col("mad"))
        .select("day", "dau")
        .orderBy("day")
    }),

    // --- last-touch attribution: each purchase credited to the user's
    // immediately preceding event (any type) within 7 days, else 'none';
    // one user-keyed lag window + a small count --------------------------
    "attribution_last" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
      TestGraphs.table(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(cast(ts as timestamp))").as("us"))
        .withColumn("prev_t", lag(col("event_type"), 1).over(w))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .where(col("event_type") === "purchase")
        .select(when(col("prev_t").isNotNull &&
            col("us") - col("prev_us") <= 7L * 86400000000L,
            col("prev_t")).otherwise(lit("none")).as("attr_type"))
        .groupBy("attr_type").agg(count(lit(1)).as("n"))
        .orderBy("attr_type")
    }),

    // --- out-of-vocabulary rate per document vs the top-k corpus
    // vocabulary (top-10 here: the synthetic corpus has only 31 distinct
    // tokens, measured - a larger cut would be vacuously all-in-vocab) — the data-quality
    // "is this doc normal text?" signal, exact micro-units ----------------
    "oov_rate" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), explode(TextOps.tokens(col("text")))
          .as("tok"))
        .localCheckpoint(true)
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(10)
        .select("tok")
      val flags = toks.join(broadcast(vocab.withColumn("iv", lit(1L))),
          Seq("tok"), "left")
      flags.groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          sum(when(col("iv").isNull, 1L).otherwise(0L)).as("oov"))
        .select(col("doc_id"), col("n_toks"),
          expr("(oov * 1000000) div n_toks").as("oov_micro"))
        .orderBy("doc_id")
    }),

    // --- stream-stream windowed self-join (the missing streaming join
    // shape): same-user event pairs within (0, 1h], watermark beyond the
    // replay span so the drained append output ≡ the batch interval join —
    // which is exactly the oracle ----------------------------------------
    "stream_sj" -> ((s, dir) =>
      graft.streaming.EdgeStream.pairJoinViaStream(
        TestGraphs.table(s, dir, "events"), 4)
        .orderBy("t1", "t2")),

    // --- temporal 3-chain motif census: ordered same-user event triples
    // with each consecutive gap in (0, 1h] — the time-bounded
    // generalization of transitions2's adjacent-only trigram table --------
    "chains3" -> ((s, dir) => {
      val e = TestGraphs.table(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(cast(ts as timestamp))").as("us"))
        .localCheckpoint(true)
      val h = 3600000000L
      e.toDF("user_id", "t1", "us1")
        .join(e.toDF("user_id", "t2", "us2"), Seq("user_id"))
        .where(col("us2") > col("us1") && col("us2") <= col("us1") + h)
        .join(e.toDF("user_id", "t3", "us3"), Seq("user_id"))
        .where(col("us3") > col("us2") && col("us3") <= col("us2") + h)
        .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n"))
        .orderBy("t1", "t2", "t3")
    }),

    // --- WEIGHTED densest-subgraph peel: density = Σweight/|V| on the
    // weight≥2 co-purchase graph (both full-graph peels — weighted and
    // not — drain in one round on the near-regular full graph; measured) --
    "densest_w" -> ((s, dir) => {
      val cp = TestGraphs.copurchase(s, dir).where(col("weight") >= 2)
      graft.algos.Densest.peelProfileWeighted(s,
        cp.select("src", "dst", "weight")
          .unionByName(cp.select(col("dst").as("src"),
            col("src").as("dst"), col("weight"))),
        cfg(s).numPartitions).orderBy("round")
    }),

    // --- clustering-by-degree curve c(k): mean lcc_micro per log2 degree
    // bucket — the hierarchical-structure fingerprint (falling c(k) =
    // hub-and-spoke neighborhoods); per-vertex micros are already exact,
    // the bucket mean is their floored integer average --------------------
    "lcc_by_degree" -> ((s, dir) =>
      TriangleCount.localClustering(TestGraphs.copurchase(s, dir),
          canonicalInput = true)
        .groupBy(length(bin(col("deg"))).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_vertices"),
          expr("sum(lcc_micro) div count(1)").as("avg_lcc_micro"))
        .orderBy("bucket")),

    // --- per-part butterfly participation on the customer→part graph:
    // the bipartite analog of tc_pervertex (local cohesion per item) ------
    "bfly_pervertex" -> ((s, dir) =>
      TriangleCount.butterfliesPerVertex(
        TestGraphs.custPart(s, dir).select("src", "dst"))
        .orderBy("id")),

    // --- per-type burstiness: the variance-to-mean (Fano) factor of
    // daily counts as an exact cross-multiplied rational
    // (num = n·Σc²−(Σc)², den = n·Σc) -------------------------------------
    "burstiness" -> ((s, dir) =>
      TestGraphs.table(s, dir, "events")
        .select(col("event_type"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(col("c")).as("total"),
          (count(lit(1)) * sum(col("c") * col("c"))
            - sum(col("c")) * sum(col("c"))).as("fano_num"),
          (count(lit(1)) * sum(col("c"))).as("fano_den"))
        .orderBy("event_type")),

    // --- Pearson moments of (n_chars, token_count) per document, as
    // exact integers: corr² = num² / (den_x·den_y) is derivable without
    // any float crossing the gate ----------------------------------------
    "doc_corr" -> ((s, dir) => {
      val m = docs(s, dir)
        .select(col("n_chars").cast("long").as("x"),
          size(TextOps.tokens(col("text"))).cast("long").as("y"))
      m.agg(count(lit(1)).as("n"),
        (count(lit(1)) * sum(col("x") * col("y"))
          - sum(col("x")) * sum(col("y"))).as("corr_num"),
        (count(lit(1)) * sum(col("x") * col("x"))
          - sum(col("x")) * sum(col("x"))).as("den_x"),
        (count(lit(1)) * sum(col("y") * col("y"))
          - sum(col("y")) * sum(col("y"))).as("den_y"))
    }),

    // --- supplier co-supply graph derivation (closes source coverage:
    // supplier was the one unread table): suppliers linked by DISTINCT
    // shared parts, src<dst, weight = shared-part count ------------------
    "g_cosupply" -> ((s, dir) => {
      val sp = TestGraphs.table(s, dir, "lineitem")
        .select(col("l_suppkey").as("supp"), col("l_partkey").as("part"))
        .distinct()
      sp.toDF("s1", "part")
        .join(sp.toDF("s2", "part"), Seq("part"))
        .where(col("s1") < col("s2"))
        .groupBy(col("s1").as("src"), col("s2").as("dst"))
        .agg(count(lit(1)).as("weight"))
        .orderBy("src", "dst")
    }),

    // --- revenue by supplier nation (the supplier-side dimension chain,
    // mirroring rev_region's customer-side one) ---------------------------
    "rev_supp_nation" -> ((s, dir) =>
      TestGraphs.table(s, dir, "lineitem")
        .join(broadcast(TestGraphs.table(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(TestGraphs.table(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0)
            - col("l_discount")) * 100, 0).cast("long")).as("rev_cents"),
          countDistinct(col("l_suppkey")).as("n_suppliers"))
        .orderBy("n_name")),

    // --- deterministic degree-bounded sparsifier: keep each vertex's
    // top-2 incident edges under the md5 total order — the "cap every
    // adjacency list" primitive behind bounded-degree approximations ------
    "edge_sample2" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = und(s, dir)
      val w = Window.partitionBy("src").orderBy(col("h"), col("dst"))
      e.withColumn("h",
          GraphOps.md5Prio(concat_ws(":", col("src"), col("dst"))))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 2)
        .select(col("src"), col("dst"), col("rk").cast("long").as("rk"))
        .orderBy("src", "rk")
    }),

    // --- audience overlap between event types: pairwise user-set Jaccard
    // in exact micro-units (the "do buyers also click?" matrix) -----------
    "audience_overlap" -> ((s, dir) => {
      val a = TestGraphs.table(s, dir, "events")
        .select(col("event_type"), col("user_id")).distinct()
        .localCheckpoint(true)
      val sz = a.groupBy(col("event_type")).agg(count(lit(1)).as("nu"))
      a.toDF("t1", "user_id")
        .join(a.toDF("t2", "user_id"), Seq("user_id"))
        .where(col("t1") < col("t2"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("inter"))
        .join(broadcast(sz.toDF("t1", "n1")), "t1")
        .join(broadcast(sz.toDF("t2", "n2")), "t2")
        .select(col("t1"), col("t2"), col("inter"),
          expr("(inter * 1000000) div (n1 + n2 - inter)")
            .as("jac_micro"))
        .orderBy("t1", "t2")
    }),

    // --- Benford first-digit profile of positive transaction cents per
    // type — the classic fabricated-data smell test, exact counts ---------
    "benford" -> ((s, dir) =>
      TestGraphs.table(s, dir, "events")
        .select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .where(col("cents") > 0)
        .groupBy(col("event_type"),
          substring(col("cents").cast("string"), 1, 1).as("digit"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "digit")),

    // --- RFM segmentation: per-user recency (days since last activity),
    // frequency (events), monetary (cents) bucketed into terciles by the
    // exact discrete-rank thresholds, counted per (r, f, m) segment -------
    "rfm_segments" -> ((s, dir) => {
      val ev = TestGraphs.table(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .localCheckpoint(true)
      // r = maxDay − max(day) = min(maxDay − day): the corpus max rides a
      // lazy 1-row broadcast instead of an eager .head() (SURVEY §7.3
      // lazily-built contract; ADVICE r5)
      val maxDay = ev.agg(max(col("day")).as("max_day"))
      val rfm = ev.crossJoin(broadcast(maxDay))
        .groupBy("user_id")
        .agg(min(col("max_day") - col("day")).as("r"),
          count(lit(1)).as("f"), sum(col("cents")).as("m"))
        .localCheckpoint(true)
      // tercile thresholds via the exact discrete-rank recipe (33/66),
      // pivoted to lazy 1-row frames (no .collect() in the builder)
      def th(c: String, n: String) = graft.functions.Quantiles.discreteBy(
          rfm.select(lit("all").as("g"), col(c)), "g", c, Seq(33, 66))
        .groupBy()
        .agg(max(when(col("pct") === 33, col("value"))).as(s"${n}33"),
          max(when(col("pct") === 66, col("value"))).as(s"${n}66"))
      def bucket(c: org.apache.spark.sql.Column, lo: org.apache.spark.sql.Column,
                 hi: org.apache.spark.sql.Column) =
        when(c <= lo, 1L).when(c <= hi, 2L).otherwise(3L)
      rfm.crossJoin(broadcast(th("r", "r")))
        .crossJoin(broadcast(th("f", "f")))
        .crossJoin(broadcast(th("m", "m")))
        .select(bucket(col("r"), col("r33"), col("r66")).as("rb"),
          bucket(col("f"), col("f33"), col("f66")).as("fb"),
          bucket(col("m"), col("m33"), col("m66")).as("mb"))
        .groupBy("rb", "fb", "mb").agg(count(lit(1)).as("n_users"))
        .orderBy("rb", "fb", "mb")
    }),

    // --- link-prediction ranking quality: concordant/tied pair counts of
    // RA scores between TRUE edges and the deterministic negative sample —
    // AUC = (concordant + tied/2)/(n_pos·n_neg) derivable downstream with
    // no float at the gate ------------------------------------------------
    "linkpred_auc" -> ((s, dir) => {
      // weight≥2 graph: the full graph's 1.15M-pair RA join costs ~40 s at
      // sf0.1 (measured) for the same ranking-quality story
      val cp = TestGraphs.copurchase(s, dir).where(col("weight") >= 2)
        .select("src", "dst")
      val und2 = GraphOps.symmetrizeOriented(cp).where(col("src") =!= col("dst"))
        .localCheckpoint(true)
      val deg = und2.groupBy(col("src").as("w"))
        .agg(count(lit(1)).as("degw"))
      val pos = cp.toDF("u", "v")
      val neg = LinkPrediction.negativeSample(und2, 8, 2)
        .select(least(col("id"), col("neg_id")).as("u"),
          greatest(col("id"), col("neg_id")).as("v"))
        .distinct()
      // RA score of an explicit pair set: common neighbors via two
      // adjacency joins restricted to the pairs, 0 when none shared
      def ra(p: DataFrame) = {
        val cnw = p.join(und2.toDF("u", "w"), "u")
          .join(und2.toDF("v", "w"), Seq("v", "w"))
          .join(deg, "w")
          .groupBy("u", "v")
          .agg(sum(expr("1000000L div degw")).as("ra"))
        p.join(cnw, Seq("u", "v"), "left")
          .select(coalesce(col("ra"), lit(0L)).as("ra"))
      }
      val rp = ra(pos).groupBy("ra").agg(count(lit(1)).as("cp"))
        .toDF("rp", "cp").localCheckpoint(true)
      val rn = ra(neg).groupBy("ra").agg(count(lit(1)).as("cn2"))
        .toDF("rn", "cn2").localCheckpoint(true)
      val conc = rp.join(rn, col("rp") > col("rn"))
        .agg(coalesce(sum(col("cp") * col("cn2")), lit(0L))
          .as("concordant"))
      val tied = rp.join(rn, col("rp") === col("rn"))
        .agg(coalesce(sum(col("cp") * col("cn2")), lit(0L)).as("tied"))
      rp.agg(sum(col("cp")).as("n_pos"))
        .crossJoin(rn.agg(sum(col("cn2")).as("n_neg")))
        .crossJoin(conc).crossJoin(tied)
    }),

    // --- recency-decayed activity score per user: half-life decay as
    // PURE bit shifts (2^(10−age_weeks), capped) — no float pow ----------
    "decay_degree" -> ((s, dir) => {
      val ev = TestGraphs.table(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day"))
        .localCheckpoint(true)
      // corpus max rides a lazy 1-row broadcast (no eager .head() in the
      // builder — SURVEY §7.3 lazily-built contract; ADVICE r5)
      val maxDay = ev.agg(max(col("day")).as("max_day"))
      ev.crossJoin(broadcast(maxDay))
        .select(col("user_id"),
          expr("shiftleft(1L, 10 - least(" +
            "cast((max_day - day) div 7 as int), 10))").as("contrib"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum(col("contrib")).as("score"))
        .orderBy("user_id")
    }),

    // --- 2-approximate minimum vertex cover = the endpoints of a maximal
    // matching (König-style classic composition; maximality ⇒ coverage) --
    "vertex_cover" -> ((s, dir) => {
      val (m, _) = graft.algos.Matching.run(s,
        TestGraphs.copurchase(s, dir).where(col("weight") >= 2)
          .select("src", "dst"),
        cfg(s).numPartitions)
      m.select(explode(array(col("src"), col("dst"))).as("id"))
        .distinct().orderBy("id")
    }),

    // --- dropDuplicatesWithinWatermark under a duplicated deterministic
    // replay: every event streamed TWICE, deduped counts ≡ batch counts --
    "stream_dedup_wm" -> ((s, dir) =>
      graft.streaming.EdgeStream.dedupWithinWatermarkViaStream(
        TestGraphs.table(s, dir, "events"), 4)
        .orderBy("event_type")),

    // --- SESSION-scoped ordered funnel (view → click → purchase inside
    // one 4-hour-gap session): the per-visit conversion table beside
    // funnel3's per-user lifetime one ------------------------------------
    "session_funnel" -> ((s, dir) => {
      val ev = graft.events.Sessionize.withSessionIds(
          TestGraphs.table(s, dir, "events"), 14400L)
        .localCheckpoint(true)
      val base = ev.select("user_id", "sid").distinct()
      val s1 = ev.where(col("event_type") === "view")
        .groupBy("user_id", "sid").agg(min(col("us")).as("t1"))
      val s2 = ev.where(col("event_type") === "click")
        .join(s1, Seq("user_id", "sid")).where(col("us") > col("t1"))
        .groupBy("user_id", "sid").agg(min(col("us")).as("t2"))
      val s3 = ev.where(col("event_type") === "purchase")
        .join(s2, Seq("user_id", "sid")).where(col("us") > col("t2"))
        .groupBy("user_id", "sid").agg(min(col("us")).as("t3"))
      base
        .join(s1, Seq("user_id", "sid"), "left")
        .join(s2, Seq("user_id", "sid"), "left")
        .join(s3, Seq("user_id", "sid"), "left")
        .select(when(col("t3").isNotNull, 3L)
          .when(col("t2").isNotNull, 2L)
          .when(col("t1").isNotNull, 1L).otherwise(0L).as("stage"))
        .groupBy("stage").agg(count(lit(1)).as("n_sessions"))
        .orderBy("stage")
    }),

    // --- Gini coefficient of transaction cents per type, exact rational
    // via the sorted prefix-sum identity Σ|xi−xj| = 2Σ(2·rank−n−1)·x —
    // one partitioned window, no pairwise join ----------------------------
    "value_gini" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val c = TestGraphs.table(s, dir, "events")
        .select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .where(col("cents") >= 0)
      val w = Window.partitionBy("event_type").orderBy("cents")
      c.withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("nn",
          count(lit(1)).over(Window.partitionBy("event_type")))
        .groupBy("event_type")
        .agg(max(col("nn")).as("n"),
          sum((lit(2) * col("rn") - col("nn") - 1) * col("cents"))
            .as("gini_num"),
          (max(col("nn")) * sum(col("cents"))).as("gini_den"))
        .orderBy("event_type")
    }),

    // --- time-to-convert quantiles: seconds from first view to the
    // funnel-ordered purchase for fully-converted users, exact discrete
    // ranks (funnel3's chain + the discreteBy recipe) ---------------------
    "conversion_time" -> ((s, dir) => {
      val f = graft.events.Analytics.funnel(
          TestGraphs.table(s, dir, "events"), "view", "click", "purchase")
        .where(col("stage") === 3)
        .select(lit("all").as("g"),
          expr("(t3 - t1) div 1000000").as("secs"))
      graft.functions.Quantiles.discreteBy(f, "g", "secs", Seq(50, 90))
        .select(col("pct"), col("value").as("secs"))
        .orderBy("pct")
    }),

    // --- brand-affinity matrix: co-purchase (weight≥2) edges lifted to
    // part-brand pairs — two broadcast dim joins + one pair count ---------
    "brand_pairs" -> ((s, dir) => {
      val bd = TestGraphs.table(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      val e = TestGraphs.copurchase(s, dir).where(col("weight") >= 2)
        .select("src", "dst")
      e.join(broadcast(bd.toDF("src", "b1")), "src")
        .join(broadcast(bd.toDF("dst", "b2")), "dst")
        .select(least(col("b1"), col("b2")).as("brand1"),
          greatest(col("b1"), col("b2")).as("brand2"))
        .groupBy("brand1", "brand2").agg(count(lit(1)).as("n_edges"))
        .orderBy("brand1", "brand2")
    }),

    // --- CUBE rollup counts (event_type × epoch-day, all 4 grouping
    // sets), null groups coalesced to engine-agnostic sentinels ----------
    "cube_counts" -> ((s, dir) => {
      val ev = TestGraphs.table(s, dir, "events")
        .select(col("event_type"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day"))
      ev.cube(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("day"), lit(-1L)).as("day"), col("n"))
        .orderBy("event_type", "day")
    })
  )

  /** Convergence-driven engine runs and xxhash64-based scale paths.
    * Most are rows-only (no SQL-expressible oracle); `sssp_converged` and
    * `kcore3_converged` DO carry oracles — their fixpoints are stable under
    * extra rounds, so an over-unrolled CTE chain reproduces them exactly
    * (see [[OracleSql]]).
    */
  val rowsOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    // full engine path: computation filtering + frontier; iteration-capped
    // for the bench harness (true convergence runs live in ScalingBench).
    // Runs the grid layout with batched supersteps: 5 supersteps per
    // materializing action instead of one, cutting the per-superstep serial
    // term (~1 s at local[32]) that dominated this query on the unbatched
    // broadcast layout (driver r2: 81.7 s). Convergence is checked at batch
    // boundaries only — up to 4 extra supersteps past the tolerance, which
    // the fixpoint absorbs.
    "pr_converged" -> ((s, dir) =>
      PageRank.runFiltered(s, TestGraphs.copurchase(s, dir),
        cfg(s).copy(tol = 1e-6, maxIter = 30, gridSide = Some(4),
          batchSize = 5)).state.orderBy("id")),

    // LSH-bucketed ANN (recall<1 by design — rows-only)
    "ann_lsh_top5" -> ((s, dir) =>
      Similarity.annTopK(emb(s, dir), 8, 5)
        .select("query_id", "neighbor_id", "rk", "cos")
        .orderBy("query_id", "rk")),

    // production minhash banding (xxhash64 — not reproducible in DuckDB)
    "minhash_buckets_xx" -> ((s, dir) =>
      Dedup.minhashBucketsXx(docs(s, dir), 3, 8, 2)
        .orderBy("doc_id", "band")),

    // multi-table LSH ANN (band-OR over 24 4-bit tables + bucket cap;
    // recall<1 by design — the ≥0.9 recall gate lives in AnnRecallSpec vs
    // the exact topK; short codes × many tables because the synthetic
    // embeddings are near-isotropic)
    "ann_multi_top5" -> ((s, dir) =>
      Similarity.annTopKMulti(emb(s, dir), 4, 24, 5)
        .select("query_id", "neighbor_id", "rk", "cos")
        .orderBy("query_id", "rk")),

    // IVF-flat ANN (hash-sampled centroids → broadcast argmax assignment →
    // capped inverted-list probe join; recall<1 by design — the recall gate
    // vs exact topK lives in AnnRecallSpec)
    "ann_ivf_top5" -> ((s, dir) =>
      Similarity.ivfTopK(emb(s, dir), 16, 8, 5)
        .select("query_id", "neighbor_id", "rk", "cos")
        .orderBy("query_id", "rk")),

    // converged engine runs with no SQL-expressible fixpoint: LP mode-votes
    // are not monotone (an over-unrolled oracle would diverge), and
    // pr_converged's stopping step is data-dependent in a way float SQL
    // can't pin — both stay rows-only by design.
    "lp_converged" -> ((s, dir) => {
      val cpf = TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst")
      val und = GraphOps.symmetrizeOriented(cpf).localCheckpoint(true)
      LabelPropagation.run(s, und, maxRounds = 30,
        numPartitions =
          s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        ._1.orderBy("id")
    }),

    // --- delta-stepping SSSP (Meyer–Sanders bucket schedule — settled
    // vertices never re-shuffle, inner rounds ship only the changed
    // frontier): schedule-independent distances, so the oracle is the
    // same over-unrolled relaxation as sssp_converged
    "sssp_delta" -> ((s, dir) => {
      val cp = TestGraphs.copurchase(s, dir)
      val ew = cp.select(col("src"), col("dst"),
          col("weight").cast("double").as("weight"))
        .union(cp.select(col("dst"), col("src"),
          col("weight").cast("double")))
        .transform(graft.engine.Lineage.cut(_)) // lazy shared cut (the bfs5 r6 note)
      Paths.deltaStepping(s, ew, ew.select(col("src")).agg(min(col("src"))),
        delta = 2.0,
        numPartitions =
          s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        ._1.where(col("dist").isNotNull).orderBy("id")
    }),

    "sssp_converged" -> ((s, dir) => {
      val cp = TestGraphs.copurchase(s, dir)
      val ew = cp.select(col("src"), col("dst"),
          col("weight").cast("double").as("weight"))
        .union(cp.select(col("dst"), col("src"),
          col("weight").cast("double")))
        .transform(graft.engine.Lineage.cut(_)) // lazy shared cut (the bfs5 r6 note)
      // min-src source folded into the engine's init state (lazy one-row
      // agg, broadcast cross-join) — no eager .head() in the builder
      Paths.ssspFrom(s, ew, ew.agg(min(col("src"))),
        cfg(s).copy(maxIter = 50, batchSize = 4))
        .state.where(col("dist").isNotNull).orderBy("id")
    }),

    // HLL++ sketch distinct (fixed-size mergeable registers per group —
    // the 100 TB shape when the value domain is huge); estimate, so
    // rows-only; the ≤2% error gate vs exact lives in CardinalitySpec
    "distinct_users_approx" -> ((s, dir) =>
      graft.functions.Cardinality.approxDistinct(
        TestGraphs.table(s, dir, "events"), "event_type", "user_id", 0.01)
        .orderBy("event_type")),

    // deterministic Jones–Plassmann coloring — integer colors are exact
    // and reproducible, but the xxhash64 priority order has no DuckDB
    // twin, so rows-only; exact equality with sequential JP is pinned in
    // ColoringSpec
    "coloring" -> ((s, dir) =>
      graft.algos.Coloring.run(s,
        TestGraphs.copurchase(s, dir)
          .where(col("weight") >= 2).select("src", "dst"),
        numPartitions =
          s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        .orderBy("id")),

    // sampled-source Brandes betweenness (8 hash-sampled roots) on the
    // filtered symmetrized graph — float dependency sums are partition-
    // order-dependent, so rows-only; exactness vs sequential Brandes is
    // pinned in AlgosSpec's golden-graph spec instead.
    "betweenness8" -> ((s, dir) => {
      val cpf = TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst")
      val undE = GraphOps.symmetrizeOriented(cpf).localCheckpoint(true)
      Betweenness.run(s, undE,
        Betweenness.sampledSources(GraphOps.vertices(undE), 8),
        numPartitions =
          s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        .orderBy("id")
    }),

    // k-core peeled to the true fixpoint (data-dependent round count);
    // oracle = over-unrolled peel (fixpoint stable under extra rounds)
    "kcore3_converged" -> ((s, dir) =>
      KCore.converged(TestGraphs.copurchase(s, dir)
        .where(col("weight") >= 2).select("src", "dst"), 3)
        ._1.orderBy("id"))
  )

  val all: Map[String, (SparkSession, String) => DataFrame] =
    oracleChecked ++ rowsOnly
}
