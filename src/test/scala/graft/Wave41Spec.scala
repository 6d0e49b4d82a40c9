package graft

import org.apache.spark.sql.functions._

import graft.algos.{ConnectedComponents, PageRank, TriangleCount}
import graft.engine.SuperstepConfig
import graft.graph.GraphOps

/** Round-6 optimization equivalences: every fast path added in the
  * optimization round must be RESULT-identical to the generic path it
  * bypasses — the dedup-skip flags (symmetrizeOriented, canonicalInput,
  * orientedInput/symmetricInput) and the broadcast-layout superstep
  * batching (per-superstep lazy cuts).
  */
class Wave41Spec extends SparkSpec {

  /** Seeded unique ORIENTED (src < dst) simple edge set — the shape the
    * co-purchase derivation's groupBy output guarantees.
    */
  private def orientedSet(seed: Int, n: Int, m: Int): Seq[(Long, Long)] =
    Oracles.randomGraph(seed, n, m)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct

  test("symmetrizeOriented ≡ symmetrize on a unique oriented input") {
    val e = edgesDf(orientedSet(101, 40, 160))
    val want = GraphOps.symmetrize(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = GraphOps.symmetrizeOriented(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size) // no dup rows introduced
    assert(got.toSet == want)
  }

  test("TriangleCount canonicalInput=true ≡ generic on canonical edges") {
    val pairs = orientedSet(202, 30, 140)
    val e = edgesDf(pairs)
    assert(TriangleCount.count(e).collect().toSeq.map(_.getLong(0)) ==
      TriangleCount.count(e, canonicalInput = true).collect().toSeq
        .map(_.getLong(0)))
    val pv = collectL(TriangleCount.perVertex(e), "id", "tri_cnt")
    val pvC = collectL(TriangleCount.perVertex(e, canonicalInput = true),
      "id", "tri_cnt")
    assert(pv == pvC)
    val sc = TriangleCount.sampledCount(e, 4).collect().head
    val scC = TriangleCount.sampledCount(e, 4, canonicalInput = true)
      .collect().head
    assert((sc.getLong(0), sc.getLong(1)) == (scC.getLong(0), scC.getLong(1)))
  }

  test("CC.run input-shape flags ≡ generic symmetrize") {
    val s = spark
    val pairs = orientedSet(303, 50, 120)
    val e = edgesDf(pairs)
    val cfg = SuperstepConfig(numPartitions = 4)
    val want = collectL(ConnectedComponents.run(s, e, cfg).state,
      "id", "component")
    val gotO = collectL(
      ConnectedComponents.run(s, e, cfg, orientedInput = true).state,
      "id", "component")
    assert(gotO == want)
    val sym = GraphOps.symmetrize(e)
    val gotS = collectL(
      ConnectedComponents.run(s, sym, cfg, symmetricInput = true).state,
      "id", "component")
    assert(gotS == want)
  }

  test("broadcast-layout superstep batching ≡ unbatched (CC fixpoint)") {
    val s = spark
    val pairs = Oracles.randomGraph(404, 60, 150)
    val e = edgesDf(pairs)
    val want = collectL(ConnectedComponents
        .run(s, e, SuperstepConfig(numPartitions = 4, batchSize = 1)).state,
      "id", "component")
    val got = collectL(ConnectedComponents
        .run(s, e, SuperstepConfig(numPartitions = 4, batchSize = 4)).state,
      "id", "component")
    assert(got == want)
    // and against the union-find oracle
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    assert(want == Oracles.unionFind(verts, pairs))
  }

  test("grid-layout superstep batching with lazy cuts ≡ unbatched (PR)") {
    val s = spark
    val pairs = Oracles.randomGraph(505, 40, 160)
    val e = edgesDf(pairs)
    def pr(batch: Int): Map[Long, Double] =
      collectD(PageRank.run(s, e, SuperstepConfig(numPartitions = 4,
          tol = 0.0, maxIter = 4, gridSide = Some(2), batchSize = batch))
        .state.select(col("id"), col("rank")), "id", "rank")
    assert(pr(1) == pr(3)) // bit-identical trajectory at any batch size
  }
}
