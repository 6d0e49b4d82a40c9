package graft

import org.apache.spark.sql.functions._

import graft.algos.ConnectedComponents
import graft.engine.SuperstepConfig
import graft.graph.GraphOps

/** Round-5 wave-8 operators: hot-mid-capped 2-hop reach, snapshot edge
  * diff, log2 degree histogram, component size distribution.
  */
class Wave8Spec extends SparkSpec {

  // ---- capped 2-hop reach -------------------------------------------------

  /** Brute 2-hop reach with the mid-degree cap. */
  private def bruteReach2(pairs: Seq[(Long, Long)],
                          cap: Long): Map[Long, Long] = {
    val nbr = pairs.flatMap { case (a, b) =>
      if (a == b) Nil else Seq(a -> b, b -> a)
    }.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    nbr.keys.map { v =>
      val twoHop = nbr(v).filter(m => nbr(m).size <= cap)
        .flatMap(nbr(_)) - v
      v -> (nbr(v) ++ twoHop).size.toLong
    }.toMap
  }

  test("twoHopReach cap ≡ brute and equals uncapped when cap ≥ max degree") {
    val pairs = Oracles.randomGraph(seed = 97, n = 30, m = 70)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val capped = collectL(
      GraphOps.twoHopReach(edgesDf(pairs), maxMidDeg = 4L), "id", "reach2")
    assert(capped == bruteReach2(pairs, 4L))
    val loose = collectL(
      GraphOps.twoHopReach(edgesDf(pairs), maxMidDeg = 1000L),
      "id", "reach2")
    val un = collectL(GraphOps.twoHopReach(edgesDf(pairs)), "id", "reach2")
    assert(loose == un)
  }

  test("twoHopReach cap: hub mid excluded, direct edges kept") {
    // star 0–{1..6} plus edge 1–7: through hub 0 (deg 6 > cap 3) nothing
    // flows, so 2's reach is just {0}; 1 still reaches 7's side directly
    val e = (1L to 6L).map(n => (0L, n)) ++ Seq((1L, 7L))
    val got = collectL(
      GraphOps.twoHopReach(edgesDf(e), maxMidDeg = 3L), "id", "reach2")
    assert(got(2L) == 1L)          // only the direct edge to 0
    assert(got(7L) == 2L)          // 1 direct, 0 via mid 1 (deg 2 ≤ 3)
  }

  // ---- snapshot edge diff -------------------------------------------------

  test("edgeDiff: added +1, removed -1, common dropped") {
    val a = edgesDf(Seq((1L, 2L), (2L, 3L), (4L, 5L)))
    val b = edgesDf(Seq((2L, 3L), (4L, 5L), (6L, 7L), (8L, 9L)))
    val got = GraphOps.edgeDiff(a, b).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 2L) -> -1L, (6L, 7L) -> 1L, (8L, 9L) -> 1L))
  }

  test("edgeDiff of identical snapshots is empty") {
    val a = edgesDf(Seq((1L, 2L), (3L, 4L)))
    assert(GraphOps.edgeDiff(a, a).isEmpty)
  }

  // ---- log2 degree buckets ------------------------------------------------

  test("bin-length bucket = floor(log2) + 1 on sample degrees") {
    val s = spark; import s.implicits._
    val degs = Seq(1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L)
    val got = degs.toDF("deg")
      .select(length(bin(col("deg"))).cast("long").as("b"))
      .collect().map(_.getLong(0)).toSeq
    val exp = degs.map(d => (63 - java.lang.Long.numberOfLeadingZeros(d)) + 1L)
    assert(got == exp)
  }

  // ---- component size distribution ---------------------------------------

  test("component size distribution ≡ union-find sizes") {
    val pairs = Oracles.randomGraph(seed = 101, n = 50, m = 40)
    val vs = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val sizes = Oracles.unionFind(vs, pairs).groupBy(_._2).map(_._2.size)
    val exp = sizes.groupBy(identity).view
      .mapValues(_.size.toLong).toMap.map { case (k, v) => (k.toLong, v) }
    val got = ConnectedComponents
      .run(spark, edgesDf(pairs), SuperstepConfig(numPartitions = 4)).state
      .groupBy("component").agg(count(lit(1)).as("csize"))
      .groupBy("csize").agg(count(lit(1)).as("n_comps"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }
}
