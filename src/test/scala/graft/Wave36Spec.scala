package graft

import org.apache.spark.sql.functions._

/** Round-5 wave-36: audience overlap, Benford digits, RFM segmentation. */
class Wave36Spec extends SparkSpec {

  test("audience overlap ≡ brute pairwise user-set Jaccard") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(4803)
    val types = Array("a", "b", "c")
    val rows = (0 until 200).map(_ =>
      (types(rnd.nextInt(3)), rnd.nextInt(25).toLong)).distinct
    val sets = rows.groupBy(_._1).map { case (t, v) => t -> v.map(_._2).toSet }
    val want = (for {
      t1 <- sets.keys.toSeq.sorted; t2 <- sets.keys.toSeq.sorted
      if t1 < t2
      inter = (sets(t1) intersect sets(t2)).size.toLong
      if inter > 0
    } yield (t1, t2, inter,
      inter * 1000000L / (sets(t1).size + sets(t2).size - inter))).toVector
    val a = rows.toDF("event_type", "user_id").distinct().localCheckpoint(true)
    val sz = a.groupBy(col("event_type")).agg(count(lit(1)).as("nu"))
    val got = a.toDF("t1", "user_id")
      .join(a.toDF("t2", "user_id"), Seq("user_id"))
      .where(col("t1") < col("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("inter"))
      .join(broadcast(sz.toDF("t1", "n1")), "t1")
      .join(broadcast(sz.toDF("t2", "n2")), "t2")
      .select(col("t1"), col("t2"), col("inter"),
        expr("(inter * 1000000) div (n1 + n2 - inter)").as("jac_micro"))
      .orderBy("t1", "t2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toVector
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("Benford digits ≡ brute first-digit counts") {
    val s = spark
    import s.implicits._
    val vals = Seq(1L, 19L, 190L, 2L, 25L, 999L, 31L, 7L, 70L)
    val want = vals.map(_.toString.take(1))
      .groupBy(identity).map { case (d, v) => ("x", d, v.size.toLong) }
      .toSeq.sortBy(_._2).toVector
    val got = vals.map(v => ("x", v)).toDF("event_type", "cents")
      .where(col("cents") > 0)
      .groupBy(col("event_type"),
        substring(col("cents").cast("string"), 1, 1).as("digit"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "digit").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toVector
    assert(got == want)
  }

  test("RFM terciles ≡ brute rank thresholds and segment counts") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(4903)
    // (user, day, cents) events
    val ev = (0 until 400).map { _ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(20).toLong,
        (1 + rnd.nextInt(500)).toLong)
    }
    val maxDay = ev.map(_._2).max
    val rfm = ev.groupBy(_._1).map { case (u, es) =>
      (u, maxDay - es.map(_._2).max, es.size.toLong, es.map(_._3).sum)
    }.toSeq
    def rank(vs: Seq[Long], pct: Int): Long = {
      val so = vs.sorted
      so(((vs.size * pct + 99) / 100 - 1).toInt)
    }
    def bucket(v: Long, lo: Long, hi: Long): Long =
      if (v <= lo) 1L else if (v <= hi) 2L else 3L
    val (r33, r66) = (rank(rfm.map(_._2), 33), rank(rfm.map(_._2), 66))
    val (f33, f66) = (rank(rfm.map(_._3), 33), rank(rfm.map(_._3), 66))
    val (m33, m66) = (rank(rfm.map(_._4), 33), rank(rfm.map(_._4), 66))
    val want = rfm.map { case (_, r, f, m) =>
      (bucket(r, r33, r66), bucket(f, f33, f66), bucket(m, m33, m66))
    }.groupBy(identity).map { case (k, v) => (k._1, k._2, k._3, v.size.toLong) }
      .toSeq.sortBy(t => (t._1, t._2, t._3)).toVector
    // same shape as the query
    val evDf = ev.toDF("user_id", "day", "cents").localCheckpoint(true)
    val rfmDf = evDf.groupBy("user_id")
      .agg((lit(maxDay) - max(col("day"))).as("r"),
        count(lit(1)).as("f"), sum(col("cents")).as("m"))
      .localCheckpoint(true)
    def th(c: String) = graft.functions.Quantiles.discreteBy(
        rfmDf.select(lit("all").as("g"), col(c)), "g", c, Seq(33, 66))
      .orderBy("pct").collect().map(_.getLong(2))
    val tr = th("r"); val tf = th("f"); val tm = th("m")
    assert((tr(0), tr(1), tf(0), tf(1), tm(0), tm(1)) ==
      ((r33, r66, f33, f66, m33, m66)))
    def b(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
      when(c <= lo, 1L).when(c <= hi, 2L).otherwise(3L)
    val got = rfmDf.select(b(col("r"), tr(0), tr(1)).as("rb"),
        b(col("f"), tf(0), tf(1)).as("fb"),
        b(col("m"), tm(0), tm(1)).as("mb"))
      .groupBy("rb", "fb", "mb").agg(count(lit(1)).as("n_users"))
      .orderBy("rb", "fb", "mb").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toVector
    assert(got == want)
    assert(want.size > 3, "multiple RFM segments must appear")
  }
}
