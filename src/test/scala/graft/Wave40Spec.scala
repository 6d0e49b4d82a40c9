package graft

import org.apache.spark.sql.functions._

/** Round-5 wave-40: conversion-time quantiles, brand-affinity pairs. */
class Wave40Spec extends SparkSpec {

  test("conversion time quantiles ≡ brute funnel gaps + rank stats") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5603)
    val types = Array("view", "click", "purchase")
    val ev = (0L until 500L).map { i =>
      (i, i % 25L, 1000000L * rnd.nextInt(100000), types(rnd.nextInt(3)))
    }
    // brute funnel per user (ordered strictly-after first hits)
    val gaps = ev.groupBy(_._2).values.flatMap { es =>
      val so = es.sortBy(_._3)
      val t1 = so.filter(_._4 == "view").map(_._3).minOption
      val t2 = t1.flatMap(t =>
        so.filter(e => e._4 == "click" && e._3 > t).map(_._3).minOption)
      val t3 = t2.flatMap(t =>
        so.filter(e => e._4 == "purchase" && e._3 > t).map(_._3).minOption)
      for (a <- t1; c <- t3) yield (c - a) / 1000000L
    }.toSeq
    def rank(vs: Seq[Long], p: Int): Long = {
      val so = vs.sorted; so(((vs.size * p + 99) / 100 - 1).toInt)
    }
    val want = Seq(50, 90).map(p => (p.toLong, rank(gaps, p))).toVector
    val df = ev.map { case (id, u, us, t) =>
      (id, u, new java.sql.Timestamp(us / 1000), t)
    }.toDF("event_id", "user_id", "ts", "event_type")
    val f = graft.events.Analytics.funnel(df, "view", "click", "purchase")
      .where(col("stage") === 3)
      .select(lit("all").as("g"), expr("(t3 - t1) div 1000000").as("secs"))
    val got = graft.functions.Quantiles.discreteBy(f, "g", "secs",
        Seq(50, 90))
      .select(col("pct"), col("value").as("secs"))
      .orderBy("pct").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(got == want)
    assert(gaps.nonEmpty)
  }

  test("brand pairs ≡ brute lifted edge counts") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5701)
    val brands = (0L until 20L).map(p => p -> s"B${rnd.nextInt(4)}").toMap
    val canon = Oracles.randomGraph(5701, 20, 60)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(t => t._1 != t._2).distinct
    val want = canon.map { case (a, b) =>
      val (x, y) = (brands(a), brands(b))
      (if (x <= y) x else y, if (x <= y) y else x)
    }.groupBy(identity).map { case ((b1, b2), v) => (b1, b2, v.size.toLong) }
      .toSeq.sortBy(t => (t._1, t._2)).toVector
    val bd = brands.toSeq.toDF("p_partkey", "p_brand")
    val got = edgesDf(canon)
      .join(broadcast(bd.toDF("src", "b1")), "src")
      .join(broadcast(bd.toDF("dst", "b2")), "dst")
      .select(least(col("b1"), col("b2")).as("brand1"),
        greatest(col("b1"), col("b2")).as("brand2"))
      .groupBy("brand1", "brand2").agg(count(lit(1)).as("n_edges"))
      .orderBy("brand1", "brand2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toVector
    assert(got == want)
  }
}
