package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.algos.Temporal
import graft.events.Analytics

/** Round-5 wave-16 operators: time-respecting temporal reachability,
  * event-type transition counts, DAU/WAU stickiness.
  */
class Wave16Spec extends SparkSpec {

  private def teDf(triples: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    triples.toDF("src", "dst", "t")
  }

  private def seedsDf(ids: Seq[Long]) = {
    val s = spark
    import s.implicits._
    ids.map(id => (id, 0L)).toDF("id", "arrival")
  }

  /** Brute earliest-arrival over time-respecting paths, k hops. */
  private def bruteArrival(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                           k: Int): Map[Long, Long] = {
    var arr = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to k) {
      val upd = edges.flatMap { case (u, v, t) =>
        arr.get(u) match {
          case Some(a) if t >= a => Seq(v -> t)
          case _                 => Nil
        }
      }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      arr = (arr.keySet ++ upd.keySet).map { v =>
        v -> math.min(arr.getOrElse(v, Long.MaxValue),
          upd.getOrElse(v, Long.MaxValue))
      }.toMap
    }
    arr
  }

  test("earliestArrival ≡ brute on a random temporal graph") {
    val rnd = new scala.util.Random(167)
    val edges = (1 to 120).map { _ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong,
        (rnd.nextInt(100) + 1).toLong)
    }.filter(e => e._1 != e._2).distinct
    val seeds = Seq(0L, 7L)
    val got = Temporal.earliestArrival(teDf(edges), seedsDf(seeds), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == bruteArrival(edges, seeds, 4))
  }

  test("temporal reachability refuses edges that go back in time") {
    // 0 -(t=10)-> 1 -(t=5)-> 2 : static reach hits 2, temporal must not.
    val edges = Seq((0L, 1L, 10L), (1L, 2L, 5L))
    val got = Temporal.earliestArrival(teDf(edges), seedsDf(Seq(0L)), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 10L))
    // flip the second timestamp forward and 2 becomes reachable at 15
    val got2 = Temporal
      .earliestArrival(teDf(Seq((0L, 1L, 10L), (1L, 2L, 15L))),
        seedsDf(Seq(0L)), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(0L -> 0L, 1L -> 10L, 2L -> 15L))
  }

  test("earliest arrival takes the min over later rounds too") {
    // two time-respecting routes to 3: direct at t=50, two-hop arriving 20
    val edges = Seq((0L, 3L, 50L), (0L, 1L, 5L), (1L, 3L, 20L))
    val got = Temporal.earliestArrival(teDf(edges), seedsDf(Seq(0L)), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) == 20L)
  }

  private def eventsDf(rows: Seq[(Long, Long, Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("event_id", "user_id", "us", "event_type")
      .select(col("event_id"), col("user_id"),
        expr("timestamp_micros(us)").as("ts"), col("event_type"))
  }

  test("transitions ≡ brute consecutive-pair counts under (ts, id) order") {
    val rnd = new scala.util.Random(53)
    val types = Array("view", "click", "buy")
    val rows = (1 to 200).map { i =>
      (i.toLong, rnd.nextInt(12).toLong, (rnd.nextInt(40) * 1000L),
        types(rnd.nextInt(3)))
    }
    val want = rows.groupBy(_._2).toSeq.flatMap { case (_, es) =>
      val ordered = es.sortBy(e => (e._3, e._1)).map(_._4)
      ordered.zip(ordered.drop(1))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Analytics.transitions(eventsDf(rows)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("stickiness ≡ brute DAU/WAU; single-day golden is 1e6 ppm") {
    val day = 86400000000L
    val rnd = new scala.util.Random(71)
    val rows = (1 to 300).map { i =>
      (i.toLong, rnd.nextInt(15).toLong,
        rnd.nextInt(20).toLong * day + rnd.nextInt(1000).toLong, "e")
    }
    val du = rows.map(r => (r._3 / day, r._2)).distinct
    val days = du.map(_._1).distinct
    val want = days.map { d =>
      val dau = du.count(_._1 == d).toLong
      val wau = du.filter(x => x._1 >= d - 6 && x._1 <= d)
        .map(_._2).distinct.size.toLong
      d -> ((dau, wau, dau * 1000000L / wau))
    }.toMap
    val got = Analytics.stickiness(eventsDf(rows)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want)
    val one = Analytics.stickiness(
      eventsDf(Seq((1L, 3L, 42L * day + 5L, "e")))).collect()
    assert(one.map(r => (r.getLong(0), r.getLong(3))).toSeq ==
      Seq((42L, 1000000L)))
  }
}
