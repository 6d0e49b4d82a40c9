package graft

import org.apache.spark.sql.functions._

/** Round-5 wave-30: 1-WL color refinement, Apriori frequent triples,
  * inter-arrival gap quantiles.
  */
class Wave30Spec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("wl3 ≡ brute Weisfeiler–Leman refinement; refines a cycle-vs-path difference") {
    // two components: a 6-cycle and a 6-path — degree seeds split path
    // endpoints immediately; refinement must keep cycle vertices uniform
    // while splitting the path by distance-to-endpoint
    val cycle = (0L until 6L).map(i => (i, (i + 1) % 6))
    val path = (10L until 15L).map(i => (i, i + 1))
    val canon = (cycle ++ path)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val sym = canon.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lab = adj.map { case (v, ns) => v -> md5hex(ns.size.toString) }
    for (_ <- 1 to 3) {
      lab = adj.map { case (v, ns) =>
        val sortedNs = ns.map(lab).sorted.mkString(",")
        v -> md5hex(lab(v) + "|" + sortedNs)
      }
    }
    val want = lab.toSeq.sortBy(_._1).toVector
    val e = edgesDf(sym).localCheckpoint(true)
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    var l = deg.select(col("id"), md5(col("deg").cast("string")).as("wl"))
    for (_ <- 1 to 3) {
      val nl = e
        .join(l.select(col("id").as("src"), col("wl").as("nwl")), "src")
        .groupBy(col("dst").as("id"))
        .agg(concat_ws(",", sort_array(collect_list(col("nwl")))).as("ns"))
      l = l.join(nl, Seq("id"), "left")
        .select(col("id"),
          md5(concat_ws("|", col("wl"), coalesce(col("ns"), lit(""))))
            .as("wl"))
    }
    val got = l.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toVector
    assert(got == want)
    val cycleLabels = want.filter(_._1 < 6).map(_._2).distinct
    assert(cycleLabels.size == 1, "cycle must stay uniform under 1-WL")
    val pathLabels = want.filter(_._1 >= 10).map(_._2).distinct
    assert(pathLabels.size == 3, "6-path splits into 3 distance classes")
  }

  test("frequent triples ≡ brute Apriori on baskets") {
    val rnd = new scala.util.Random(3607)
    val types = Array("a", "b", "c", "d", "e")
    val baskets = (0 until 60).map { i =>
      (i.toLong, (0 until 2 + rnd.nextInt(3))
        .map(_ => types(rnd.nextInt(5))).toSet)
    }
    val nb = baskets.size.toLong
    val minSup = (nb * 5 + 99) / 100
    val pairSup = scala.collection.mutable.Map.empty[(String, String), Long]
    val triSup = scala.collection.mutable
      .Map.empty[(String, String, String), Long]
    baskets.foreach { case (_, ts) =>
      val so = ts.toSeq.sorted
      for (i <- so.indices; j <- (i + 1) until so.size) {
        pairSup((so(i), so(j))) = pairSup.getOrElse((so(i), so(j)), 0L) + 1
        for (k <- (j + 1) until so.size)
          triSup((so(i), so(j), so(k))) =
            triSup.getOrElse((so(i), so(j), so(k)), 0L) + 1
      }
    }
    val fp = pairSup.filter(_._2 >= minSup).keySet
    val want = triSup.toSeq.filter { case ((t1, t2, t3), n) =>
      n >= minSup && fp((t1, t2)) && fp((t1, t3)) && fp((t2, t3))
    }.map { case ((t1, t2, t3), n) => (t1, t2, t3, n) }
      .sortBy(t => (t._1, t._2, t._3)).toVector
    // same shape as the query over a (user, day)-less basket id
    val s = spark
    import s.implicits._
    val b = baskets.flatMap { case (bid, ts) => ts.map(t => (bid, 0L, t)) }
      .toDF("user_id", "day", "event_type").localCheckpoint(true)
    val pairs = b.toDF("user_id", "day", "t1")
      .join(b.toDF("user_id", "day", "t2"), Seq("user_id", "day"))
      .where(col("t1") < col("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("np"))
      .where(col("np") >= minSup).localCheckpoint(true)
    val cand = pairs.select("t1", "t2")
      .join(pairs.toDF("t1", "t3", "np2").select("t1", "t3"), "t1")
      .where(col("t2") < col("t3"))
      .join(pairs.toDF("t2", "t3", "np3").select("t2", "t3"),
        Seq("t2", "t3"), "left_semi")
    val got = cand
      .join(b.toDF("user_id", "day", "t1"), "t1")
      .join(b.toDF("user_id", "day", "t2"), Seq("user_id", "day", "t2"),
        "left_semi")
      .join(b.toDF("user_id", "day", "t3"), Seq("user_id", "day", "t3"),
        "left_semi")
      .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n"))
      .where(col("n") >= minSup)
      .orderBy("t1", "t2", "t3").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toVector
    assert(got == want)
    assert(want.nonEmpty, "some triple must be frequent at 5%")
  }

  test("gap quantiles ≡ brute rank stats per type") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3701)
    val ev = (0L until 300L).map { i =>
      (i, i % 9L, 1000000L * (10 + rnd.nextInt(5000)),
        Seq("x", "y")(rnd.nextInt(2)))
    }
    val byU = ev.groupBy(_._2).values
    val gaps = byU.flatMap { seq =>
      seq.sortBy(e => (e._3, e._1)).sliding(2).filter(_.size == 2)
        .map(p => (p(0)._4, (p(1)._3 - p(0)._3) / 1000000L))
    }.toSeq
    def rank(vs: Seq[Long], p: Int): Long = {
      val so = vs.sorted
      so(((vs.size * p + 99) / 100 - 1).toInt)
    }
    val want = gaps.groupBy(_._1).toSeq.flatMap { case (t, vs) =>
      Seq(50, 90, 99).map(p => (t, p.toLong, rank(vs.map(_._2), p)))
    }.sortBy(t => (t._1, t._2)).toVector
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val gdf = ev.toDF("event_id", "user_id", "us", "event_type")
      .withColumn("nxt", lead(col("us"), 1).over(w))
      .where(col("nxt").isNotNull)
      .select(col("event_type"), expr("(nxt - us) div 1000000").as("gap_s"))
    val got = graft.functions.Quantiles.discreteBy(gdf, "event_type",
        "gap_s", Seq(50, 90, 99))
      .orderBy("event_type", "pct").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toVector
    assert(got == want)
  }
}
