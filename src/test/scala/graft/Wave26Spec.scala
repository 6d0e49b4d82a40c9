package graft

import org.apache.spark.sql.functions._

import graft.streaming.EdgeStream

/** Round-5 wave-26 (part 1): pins the append-mode watermark semantics of
  * [[EdgeStream.lateDropWindowCounts]] against handcrafted batches,
  * including the exact ≤/< boundaries the DuckDB oracle twin encodes.
  */
class Wave26Spec extends SparkSpec {

  private def hb(ts: String): Long =
    java.sql.Timestamp.valueOf(ts).getTime / 1000 / 3600

  test("late-filter watermark LAGS one batch (batch k filters with stats ≤ k−2)") {
    val s = spark
    import s.implicits._
    // batch = event_id % 3:
    //  b0 (id 0): 13:00  -> stats max 13:00
    //  b1 (id 1): 10:30  -> win[10,11) end 11:00. If the filter used b0's
    //             stats (wm 12:00) this would drop; under the one-batch
    //             lag the filter wm is still 0 -> kept.
    //  b2 (id 2): 10:45  -> filter wm = b0 stats - 1h = 12:00 -> dropped.
    // final wm = 12:00 -> emit [10,11) end 11:00 <= 12:00.
    val rows = Seq(
      (0L, "2026-03-01 13:00:00", "a"),
      (1L, "2026-03-01 10:30:00", "a"),
      (2L, "2026-03-01 10:45:00", "a"))
    val df = rows.toDF("event_id", "ts", "event_type")
      .select(col("event_id"), col("ts").cast("timestamp"), col("event_type"))
    val got = EdgeStream.lateDropWindowCounts(df, 3, "1 hour")
      .orderBy("hour_bucket").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toVector
    assert(got == Vector((hb("2026-03-01 10:30:00"), "a", 1L)),
      s"expected the lag-1 outcome ([10,11) n=1): $got")
  }

  test("drop boundary: window end == filter wm") {
    val s = spark
    import s.implicits._
    //  b0 (id 0): 13:00 -> wm for b2 = 12:00 (lag-1)
    //  b1 (id 1): 13:05
    //  b2 (ids 2,5,8): 11:30 -> win[11,12) end 12:00 == wm (boundary)
    //                  10:30 -> win[10,11) end 11:00 <  wm (dropped)
    //                  13:30 -> raises final wm to 12:30
    // emit end <= 12:30: [11,12) present iff the boundary event was kept.
    val rows = Seq(
      (0L, "2026-03-01 13:00:00", "a"),
      (1L, "2026-03-01 13:05:00", "a"),
      (2L, "2026-03-01 11:30:00", "a"),
      (5L, "2026-03-01 10:30:00", "a"),
      (8L, "2026-03-01 13:30:00", "a"))
    val df = rows.toDF("event_id", "ts", "event_type")
      .select(col("event_id"), col("ts").cast("timestamp"), col("event_type"))
    val got = EdgeStream.lateDropWindowCounts(df, 3, "1 hour")
      .orderBy("hour_bucket").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toVector
    // the oracle twin encodes drop-at-equality (keeps only wend > wm), so
    // the boundary event MUST be dropped — asserted, not just logged
    // (ADVICE r5: an either-way accept left the boundary unverified)
    assert(got == Vector.empty,
      s"expected the end==wm window dropped (oracle: keep iff wend > wm): $got")
  }

  test("emit boundary: window with end == final wm") {
    val s = spark
    import s.implicits._
    // single batch: 10:30 -> win[10,11) end 11:00; 12:00 -> win[12,13).
    // final wm = 12:00 - 1h = 11:00 == end of [10,11).
    val rows = Seq(
      (0L, "2026-03-01 10:30:00", "a"),
      (1L, "2026-03-01 12:00:00", "a"))
    val df = rows.toDF("event_id", "ts", "event_type")
      .select(col("event_id"), col("ts").cast("timestamp"), col("event_type"))
    val got = EdgeStream.lateDropWindowCounts(df, 1, "1 hour")
      .orderBy("hour_bucket").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toVector
    info(s"emit-at-equality rows: $got")
    val h10 = java.sql.Timestamp.valueOf("2026-03-01 10:30:00")
      .getTime / 1000 / 3600
    // the oracle twin emits at end == final wm — asserted, not just
    // logged (ADVICE r5)
    assert(got == Vector((h10, "a", 1L)),
      s"expected the end==final-wm window emitted (oracle: emit iff end <= wm): $got")
  }

  test("multi-seed PPR ≡ dense per-seed power iteration") {
    val canon = Oracles.randomGraph(2601, 30, 90)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(t => t._1 != t._2).distinct
    val sym = canon.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val ids = sym.map(_._1).distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val out = sym.groupBy(_._1).view.mapValues(_.size).toMap
    val seeds = ids.filter(_ % 5 == 0)
    // dense per-seed reference
    val want = (for (s0 <- seeds) yield {
      var r = ids.map(v => v -> (if (v == s0) 1.0 else 0.0)).toMap
      for (_ <- 1 to 4) {
        val mass = scala.collection.mutable.Map.empty[Long, Double]
          .withDefaultValue(0.0)
        sym.foreach { case (u, v) => mass(v) += r(u) / out(u) }
        r = ids.map(v =>
          v -> ((if (v == s0) 0.15 else 0.0) + 0.85 * mass(v))).toMap
      }
      r.map { case (v, p) => (s0, v) -> p }
    }).flatten.toMap
    val got = graft.algos.PageRank.multiSeedFixedIterations(
        edgesDf(sym), id => pmod(id, lit(5L)) === 0, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // sparse result: absent (seed, id) pairs must be 0 in the dense ref
    want.foreach { case (k, p) =>
      val g = got.getOrElse(k, 0.0)
      assert(math.abs(g - p) < 1e-9, s"$k: got $g want $p")
    }
    got.keys.foreach(k => assert(want.contains(k)))
    assert(seeds.size >= 2 && got.nonEmpty)
  }

  test("truss components ≡ union-find over brute 3-truss survivors") {
    val canon = Oracles.randomGraph(2707, 40, 170)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(t => t._1 != t._2).distinct
    val survivors = Oracles.bruteTruss(canon, 3).keys.toSeq
    val want = Oracles.unionFind(
      survivors.flatMap(t => Seq(t._1, t._2)).distinct, survivors)
    val (te, _) = graft.algos.Truss.converged(edgesDf(canon), 3)
    val got = graft.algos.ConnectedComponents.run(spark,
        te.select("src", "dst"),
        graft.engine.SuperstepConfig(numPartitions = 4))
      .state.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(want.nonEmpty, "random graph must keep a non-empty 3-truss")
  }
}
