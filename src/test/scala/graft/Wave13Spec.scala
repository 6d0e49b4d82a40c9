package graft

import graft.algos.Paths
import graft.ann.KMeans

/** Round-5 wave-13 operators: product quantization, landmark distance
  * oracle.
  */
class Wave13Spec extends SparkSpec {

  // ---- product quantization ----------------------------------------------------

  test("pq ≡ independent per-subspace sequential Lloyd; exact error sum") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(71)
    val (m, dsub) = (3, 4)
    val vecs = (0L until 30L).map(id =>
      id -> Array.fill(m * dsub)((rnd.nextDouble() - 0.5).toFloat))
    val got = KMeans.pq(s, vecs.toDF("vec_id", "embedding"), m, dsub, 4, 2)
      .collect()
      .map(r => r.getLong(0) ->
        (((0 until m).map(j => r.getLong(1 + j)), r.getLong(1 + m))))
      .toMap
    val want = (0 until m).map { j =>
      Oracles.bruteKMeans(
        vecs.map { case (id, v) => id -> v.slice(j * dsub, (j + 1) * dsub) },
        4, 2, 10000L, 10000L)
    }
    vecs.foreach { case (id, _) =>
      val (codes, dist2) = got(id)
      assert(codes == (0 until m).map(j => want(j)(id)._1))
      assert(dist2 == (0 until m).map(j => want(j)(id)._2).sum)
    }
    assert(got.values.forall { case (codes, _) =>
      codes.forall(c => c >= 0 && c < 4)
    })
  }

  // ---- landmark distance oracle --------------------------------------------------

  /** Brute truncated multi-root BFS + min-over-landmark pair estimates. */
  private def bruteLandmark(pairs: Seq[(Long, Long)], numRoots: Int, k: Int,
                            mod: Long): Map[(Long, Long), Long] = {
    val nbr = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val vs = nbr.keySet.toSeq.sorted
    def bfs(root: Long): Map[Long, Long] = {
      var dist = Map(root -> 0L); var frontier = Set(root)
      for (d <- 1 to k if frontier.nonEmpty) {
        val next = frontier.flatMap(nbr(_)).filterNot(dist.contains)
        next.foreach(u => dist += u -> d.toLong)
        frontier = next
      }
      dist
    }
    val tables = vs.take(numRoots).map(bfs)
    val sample = vs.filter(v => Oracles.md5Prio(v.toString) % mod == 0)
    (for {
      a <- sample; b <- sample if a < b
      ests = tables.flatMap(t =>
        for (da <- t.get(a); db <- t.get(b)) yield da + db)
      if ests.nonEmpty
    } yield (a, b) -> ests.min).toMap
  }

  test("landmarkDistances ≡ brute; estimates upper-bound true distances") {
    val pairs = Oracles.randomGraph(seed = 79, n = 30, m = 55)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).distinct
    val undDf = edgesDf(
      pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct)
    val got = Paths.landmarkDistances(undDf, 4, 3, 3L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == bruteLandmark(pairs, 4, 3, 3L))
    // upper-bound property vs true (untruncated) BFS distance
    val nbr = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def trueDist(a: Long, b: Long): Long = {
      var dist = Map(a -> 0L); var frontier = Set(a); var d = 0L
      while (frontier.nonEmpty && !dist.contains(b)) {
        d += 1
        val next = frontier.flatMap(nbr(_)).filterNot(dist.contains)
        next.foreach(u => dist += u -> d)
        frontier = next
      }
      dist.getOrElse(b, Long.MaxValue)
    }
    assert(got.forall { case ((a, b), est) => est >= trueDist(a, b) })
  }
}
