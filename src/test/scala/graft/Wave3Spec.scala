package graft

import org.apache.spark.sql.functions._

import graft.algos.KCore
import graft.dedup.Dedup
import graft.graph.GraphOps

/** Round-5 wave-3 operators: weighted s-core peeling, asymmetric shingle
  * containment, 2-hop reach. Golden hand-checked values plus brute-force
  * cross-checks on seeded random inputs (the SURVEY §5.2 pyramid).
  */
class Wave3Spec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def wEdges(triples: Seq[(Long, Long, Long)]) = {
    val s = spark; import s.implicits._
    triples.toDF("src", "dst", "weight")
  }

  /** Brute sequential weighted s-core peel (symmetrized, integral
    * weights): survivors with their in-core weighted degree.
    */
  private def bruteSCore(edges: Seq[(Long, Long, Long)],
                         s: Long): Map[Long, Long] = {
    var und = edges.flatMap { case (a, b, w) =>
      if (a == b) Nil else Seq((a, b, w), (b, a, w))
    }
    var changed = true
    while (changed) {
      val wdeg = und.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val keep = wdeg.filter(_._2 >= s).keySet
      val next = und.filter { case (a, b, _) => keep(a) && keep(b) }
      changed = next.size != und.size
      und = next
    }
    und.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
  }

  test("s-core: weighted peel keeps the heavy pendant the 2-core drops") {
    // triangle 0-1-2 (weights 3,1,1) + heavy pendant 2-3 (weight 5):
    // s=5 peels 0 and 1 (wdeg 4 each), then the triangle edges vanish and
    // {2,3} survive on the weight-5 edge alone.
    val e = Seq((0L, 1L, 3L), (1L, 2L, 1L), (0L, 2L, 1L), (2L, 3L, 5L))
    val got = collectL(KCore.peelWeighted(wEdges(e), 5, 5), "id", "wdeg")
    assert(got == Map(2L -> 5L, 3L -> 5L))
    assert(got == bruteSCore(e, 5))
  }

  test("s-core: unit weights reduce to the unweighted k-core") {
    // canonicalize to the documented src<dst-oriented simple input (the
    // raw random digraph can hold BOTH (a,b) and (b,a), which the
    // weighted UNION ALL symmetrize keeps as parallel edges by contract)
    val pairs = Oracles.randomGraph(seed = 23, n = 40, m = 120)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val unit = pairs.map { case (a, b) => (a, b, 1L) }
    val weighted =
      collectL(KCore.peelWeighted(wEdges(unit), 3, 8), "id", "wdeg")
    val plain = collectL(KCore.peel(edgesDf(pairs), 3, 8), "id", "deg")
    assert(weighted == plain)
  }

  test("s-core: seeded random weighted graph matches brute fixpoint") {
    val rnd = new scala.util.Random(7)
    val e = Oracles.randomGraph(seed = 7, n = 25, m = 70)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      .map { case (a, b) => (a, b, 1L + rnd.nextInt(4).toLong) }
    // 8 rounds >= the brute fixpoint depth on 25 vertices
    val got = collectL(KCore.peelWeighted(wEdges(e), 6, 8), "id", "wdeg")
    assert(got == bruteSCore(e, 6))
  }

  test("containment: subset doc scores 1e6 forward, 3/5 backward") {
    // S(10) = {"a b","b c","c d"} (all inside doc 11's 5 shingles)
    val docs = docsDf(Seq(
      10L -> "a b c d",
      11L -> "a b c d e f",
      12L -> "x y z"))
    val got = Dedup.containmentPairs(docs, 2, 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set((10L, 11L, 3L, 1000000L), (11L, 10L, 3L, 600000L)))
    // tighter threshold keeps only the fully-contained direction
    val tight = Dedup.containmentPairs(docs, 2, 700000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight == Set((10L, 11L)))
  }

  test("containment: seeded random corpus matches brute set arithmetic") {
    val rnd = new scala.util.Random(31)
    val vocab = "abcdefgh".map(_.toString)
    val docs = (0L until 14L).map { i =>
      i -> (1 to (4 + rnd.nextInt(8)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    def sh(t: String): Set[String] = {
      val ts = t.split(" ").toSeq
      ts.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSet
    }
    val brute = (for {
      (a, ta) <- docs; (b, tb) <- docs if a != b
      inter = (sh(ta) & sh(tb)).size.toLong if sh(ta).nonEmpty
      cm = 1000000L * inter / sh(ta).size if cm >= 300000L
    } yield (a, b, inter, cm)).toSet
    val got = Dedup.containmentPairs(docsDf(docs), 2, 300000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == brute)
  }

  test("reach2: path graph golden values") {
    // 0-1-2-3-4: reach2 = |vertices within distance 2|
    val r = collectL(
      GraphOps.twoHopReach(edgesDf(Seq((0L, 1L), (1L, 2L), (2L, 3L),
        (3L, 4L)))), "id", "reach2")
    assert(r == Map(0L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 3L, 4L -> 2L))
  }

  test("reach2: star graph — every vertex reaches all others") {
    val star = edgesDf((1L to 6L).map(i => (0L, i)))
    val r = collectL(GraphOps.twoHopReach(star), "id", "reach2")
    assert(r == (0L to 6L).map(v => v -> 6L).toMap)
  }

  test("reach2: seeded random graph matches 2-step BFS") {
    val pairs = Oracles.randomGraph(seed = 41, n = 35, m = 90)
    val adj = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val vs = pairs.flatMap { case (a, b) => Seq(a, b) }.distinct
    val brute = vs.map { v =>
      val one = adj.getOrElse(v, Set.empty)
      val two = one.flatMap(u => adj.getOrElse(u, Set.empty))
      v -> ((one ++ two) - v).size.toLong
    }.toMap
    val got = collectL(GraphOps.twoHopReach(edgesDf(pairs)), "id", "reach2")
    assert(got == brute)
  }
}
