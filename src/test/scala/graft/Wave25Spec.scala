package graft

import org.apache.spark.sql.functions._

import graft.algos.Paths
import graft.graph.GraphOps

/** Round-5 wave-25: weighted neighbor Jaccard (Ruzicka), shortest-path
  * sigma counts, CUBE rollup counts.
  */
class Wave25Spec extends SparkSpec {

  test("weighted Jaccard ≡ brute Ruzicka over weighted neighborhoods") {
    val rnd = new scala.util.Random(2203)
    val canon = Oracles.randomGraph(2203, 40, 160)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(t => t._1 != t._2).distinct
      .map { case (a, b) => (a, b, 1L + rnd.nextInt(9).toLong) }
    // brute: weighted adjacency maps
    val adj = scala.collection.mutable
      .Map.empty[Long, Map[Long, Long]].withDefaultValue(Map.empty)
    canon.foreach { case (a, b, w) =>
      adj(a) = adj(a) + (b -> w); adj(b) = adj(b) + (a -> w)
    }
    val ids = adj.keys.toSeq.sorted
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      na = adj(a); nb = adj(b)
      shared = na.keySet intersect nb.keySet
      if shared.nonEmpty
      num = shared.toSeq.map(x => math.min(na(x), nb(x))).sum
      den = na.values.sum + nb.values.sum - num
      micro = num * 1000000L / den
      if micro >= 300000L
    } yield (a, b, micro)).toVector
    val got = GraphOps.neighborJaccardWeighted(
        edgesWDf(canon.map(t => (t._1, t._2, t._3.toDouble)))
          .select(col("src"), col("dst"), col("weight").cast("long")),
        300000L)
      .orderBy("v1", "v2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
    assert(got == want.sortBy(t => (t._1, t._2)))
    assert(want.nonEmpty, "threshold must keep some pairs")
  }

  test("sigma counts ≡ brute BFS with path counting, incl. truncation") {
    val canon = Oracles.randomGraph(2301, 50, 110)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(t => t._1 != t._2).distinct
    val sym = canon.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val src = sym.map(_._1).min
    // brute level-synchronous BFS with sigma
    var dist = Map(src -> 0L)
    var sigma = Map(src -> 1L)
    for (i <- 1 to 4) {
      val frontier = dist.filter(_._2 == i - 1).keys
      val nsig = scala.collection.mutable.Map.empty[Long, Long]
      frontier.foreach { u =>
        adj.getOrElse(u, Nil).foreach { v =>
          if (!dist.contains(v)) nsig(v) = nsig.getOrElse(v, 0L) + sigma(u)
        }
      }
      dist = dist ++ nsig.keys.map(_ -> i.toLong)
      sigma = sigma ++ nsig
    }
    val want = dist.keys.toSeq.sorted.map(v => (v, dist(v), sigma(v))).toVector
    val e = edgesDf(sym)
    val got = Paths.sigmaCounts(e, e.agg(min(col("src"))), 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
    assert(got == want)
    assert(want.exists(_._3 > 1L), "some vertex must have multiple paths")
  }

  test("cube counts ≡ brute four grouping sets") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(2407)
    val rows = (0 until 200).map { i =>
      (s"2026-01-0${1 + rnd.nextInt(3)} 12:00:00",
        Seq("view", "click", "buy")(rnd.nextInt(3)))
    }
    val df = rows.toDF("ts", "event_type")
    val withDay = rows.map { case (ts, t) =>
      val day = ts.substring(8, 10).toLong + 20454 - 1 // 2026-01-01 = day 20454
      (t, day)
    }
    val fine = withDay.groupBy(identity).view.mapValues(_.size.toLong)
    val byType = withDay.groupBy(_._1).view.mapValues(_.size.toLong)
    val byDay = withDay.groupBy(_._2).view.mapValues(_.size.toLong)
    val want = (fine.map { case ((t, d), n) => (t, d, n) } ++
      byType.map { case (t, n) => (t, -1L, n) } ++
      byDay.map { case (d, n) => ("ALL", d, n) } ++
      Seq(("ALL", -1L, withDay.size.toLong)))
      .toVector.sortBy(r => (r._1, r._2))
    val ev = df.select(col("event_type"),
      expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
    val got = ev.cube(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day"), lit(-1L)).as("day"), col("n"))
      .orderBy("event_type", "day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toVector
    assert(got == want)
  }
}
