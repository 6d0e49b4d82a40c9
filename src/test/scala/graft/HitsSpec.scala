package graft

import graft.algos.Hits

/** Unnormalized HITS: hand-checked golden on a 2×2 bipartite graph plus
  * brute-force equality on a seeded random digraph.
  */
class HitsSpec extends SparkSpec {

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

  test("hits: 2-iteration golden on the tiny bipartite graph") {
    // edges 1→10, 1→11, 2→11. h0={1:1,2:1}; a1={10:1,11:2};
    // h1={1:3,2:2}; a2={10:3,11:5}; h2={1:8,2:5}.
    val out = collect(Hits.fixedIterations(
      edgesDf(Seq((1L, 10L), (1L, 11L), (2L, 11L))), 2))
    assert(out == Map((1L, "hub") -> 8L, (2L, "hub") -> 5L,
      (10L, "auth") -> 3L, (11L, "auth") -> 5L))
  }

  test("hits: seeded random digraph matches brute iteration") {
    val pairs = Oracles.randomGraph(seed = 19, n = 20, m = 60)
    val k = 3
    val got = collect(Hits.fixedIterations(edgesDf(pairs), k))
    val srcs = pairs.map(_._1).distinct
    var h = srcs.map(v => v -> 1L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to k) {
      a = pairs.filter(p => h.contains(p._1))
        .groupBy(_._2).view.mapValues(_.map(p => h(p._1)).sum).toMap
      h = pairs.filter(p => a.contains(p._2))
        .groupBy(_._1).view.mapValues(_.map(p => a(p._2)).sum).toMap
    }
    val want = h.map { case (v, s) => (v, "hub") -> s } ++
      a.map { case (v, s) => (v, "auth") -> s }
    assert(got == want)
  }
}
