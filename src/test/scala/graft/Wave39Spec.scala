package graft

import org.apache.spark.sql.functions._

/** Round-5 wave-39: session-scoped funnel, exact-rational Gini. */
class Wave39Spec extends SparkSpec {

  test("session funnel ≡ brute per-session ordered scan") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5503)
    val types = Array("view", "click", "purchase", "error")
    val gap = 14400L * 1000000L
    val ev = (0L until 400L).map { i =>
      (i, i % 9L, 1000000L * rnd.nextInt(500000), types(rnd.nextInt(4)))
    }
    // brute: session ids by gap rule, then ordered first-hit chain
    val bySession = ev.groupBy(_._2).values.flatMap { seq =>
      val so = seq.sortBy(e => (e._3, e._1))
      var sid = 0L
      var prev = Long.MinValue
      so.map { e =>
        if (prev == Long.MinValue || e._3 - prev > gap) sid += 1
        prev = e._3
        ((e._2, sid), e)
      }
    }.groupBy(_._1).values.map(_.map(_._2).toSeq).toSeq
    val stages = bySession.map { es =>
      val so = es.sortBy(e => (e._3, e._1))
      val t1 = so.filter(_._4 == "view").map(_._3).minOption
      val t2 = t1.flatMap(t =>
        so.filter(e => e._4 == "click" && e._3 > t).map(_._3).minOption)
      val t3 = t2.flatMap(t =>
        so.filter(e => e._4 == "purchase" && e._3 > t).map(_._3).minOption)
      if (t3.isDefined) 3L else if (t2.isDefined) 2L
      else if (t1.isDefined) 1L else 0L
    }
    val want = stages.groupBy(identity)
      .map { case (st, v) => (st, v.size.toLong) }.toSeq.sortBy(_._1)
      .toVector
    val df = ev.map { case (id, u, us, t) =>
      (id, u, new java.sql.Timestamp(us / 1000), t)
    }.toDF("event_id", "user_id", "ts", "event_type")
    val sev = graft.events.Sessionize.withSessionIds(df, 14400L)
      .localCheckpoint(true)
    val base = sev.select("user_id", "sid").distinct()
    val s1 = sev.where(col("event_type") === "view")
      .groupBy("user_id", "sid").agg(min(col("us")).as("t1"))
    val s2 = sev.where(col("event_type") === "click")
      .join(s1, Seq("user_id", "sid")).where(col("us") > col("t1"))
      .groupBy("user_id", "sid").agg(min(col("us")).as("t2"))
    val s3 = sev.where(col("event_type") === "purchase")
      .join(s2, Seq("user_id", "sid")).where(col("us") > col("t2"))
      .groupBy("user_id", "sid").agg(min(col("us")).as("t3"))
    val got = base
      .join(s1, Seq("user_id", "sid"), "left")
      .join(s2, Seq("user_id", "sid"), "left")
      .join(s3, Seq("user_id", "sid"), "left")
      .select(when(col("t3").isNotNull, 3L)
        .when(col("t2").isNotNull, 2L)
        .when(col("t1").isNotNull, 1L).otherwise(0L).as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_sessions"))
      .orderBy("stage").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(got == want)
    assert(want.map(_._2).sum == bySession.size.toLong)
  }

  test("Gini rational ≡ brute pairwise |xi − xj| sum") {
    val s = spark
    import s.implicits._
    val vals = Seq(("a", 1L), ("a", 1L), ("a", 4L), ("a", 10L),
      ("b", 5L), ("b", 5L), ("b", 5L))
    // num = Σ(2rn−n−1)·x over the sorted values; the identity
    // Σ_{i,j}|xi−xj| = 2·num is asserted against the brute pairwise sum
    val wantExact = vals.groupBy(_._1).map { case (t, vs) =>
      val xs = vs.map(_._2).sorted
      val n = xs.size.toLong
      val num = xs.zipWithIndex.map { case (x, i) =>
        (2L * (i + 1) - n - 1) * x
      }.sum
      val pairSum = (for (x <- xs; y <- xs) yield math.abs(x - y)).sum
      assert(2 * num == pairSum, "prefix-sum identity must hold")
      (t, n, num, n * xs.sum)
    }.toSeq.sortBy(_._1).toVector
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("cents")
    val got = vals.toDF("event_type", "cents")
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("nn",
        count(lit(1)).over(Window.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(max(col("nn")).as("n"),
        sum((lit(2) * col("rn") - col("nn") - 1) * col("cents"))
          .as("gini_num"),
        (max(col("nn")) * sum(col("cents"))).as("gini_den"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toVector
    assert(got == wantExact)
    // uniform series ⇒ Gini 0
    assert(wantExact.find(_._1 == "b").get._3 == 0L)
  }
}
