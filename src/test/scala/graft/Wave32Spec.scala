package graft

import org.apache.spark.sql.functions._

/** Round-5 wave-32: last-touch attribution, OOV rate, stream-stream
  * windowed self-join.
  */
class Wave32Spec extends SparkSpec {

  test("last-touch attribution ≡ brute predecessor scan") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3907)
    val types = Array("view", "click", "purchase")
    val ev = (0L until 300L).map { i =>
      (i, i % 11L, 1000000L * rnd.nextInt(20 * 86400), types(rnd.nextInt(3)))
    }
    val want = ev.groupBy(_._2).values.flatMap { seq =>
      val so = seq.sortBy(e => (e._3, e._1))
      so.zipWithIndex.collect {
        case (e, i) if e._4 == "purchase" =>
          if (i > 0 && e._3 - so(i - 1)._3 <= 7L * 86400000000L) so(i - 1)._4
          else "none"
      }
    }.groupBy(identity).map { case (t, v) => (t, v.size.toLong) }
      .toSeq.sortBy(_._1).toVector
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val got = ev.toDF("event_id", "user_id", "us", "event_type")
      .withColumn("prev_t", lag(col("event_type"), 1).over(w))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .where(col("event_type") === "purchase")
      .select(when(col("prev_t").isNotNull &&
          col("us") - col("prev_us") <= 7L * 86400000000L,
          col("prev_t")).otherwise(lit("none")).as("attr_type"))
      .groupBy("attr_type").agg(count(lit(1)).as("n"))
      .orderBy("attr_type").collect()
      .map(r => (r.getString(0), r.getLong(1))).toVector
    assert(got == want)
    assert(want.exists(_._1 == "none"), "some purchase must lack a touch")
  }

  test("oov rate ≡ brute top-k vocab membership") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(4001)
    val vocabW = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docsSeq = (0L until 30L).map { i =>
      (i, (0 until 20).map(_ => vocabW(rnd.nextInt(8))).mkString(" "))
    }
    val toks = docsSeq.flatMap { case (d, t) => t.split(" ").map((d, _)) }
    val top3 = toks.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(3).map(_._1).toSet
    val want = toks.groupBy(_._1).toSeq.map { case (d, ts) =>
      val oov = ts.count(t => !top3(t._2)).toLong
      (d, ts.size.toLong, oov * 1000000L / ts.size)
    }.sortBy(_._1).toVector
    val tk = docsSeq.toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      .localCheckpoint(true)
    val vocab = tk.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(3).select("tok")
    val got = tk.join(broadcast(vocab.withColumn("iv", lit(1L))),
        Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        sum(when(col("iv").isNull, 1L).otherwise(0L)).as("oov"))
      .select(col("doc_id"), col("n_toks"),
        expr("(oov * 1000000) div n_toks").as("oov_micro"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
    assert(got == want)
    assert(want.exists(_._3 > 0L))
  }

  test("stream-stream self-join ≡ batch interval join (no drops at long watermark)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(4103)
    val types = Array("a", "b")
    val ev = (0L until 120L).map { i =>
      (i, new java.sql.Timestamp(1700000000000L + rnd.nextInt(10000) * 1000L),
        i % 7L, types(rnd.nextInt(2)))
    }
    val want = (for {
      x <- ev; y <- ev
      if x._3 == y._3 && y._2.getTime > x._2.getTime &&
        y._2.getTime <= x._2.getTime + 3600000L
    } yield (x._4, y._4)).groupBy(identity)
      .map { case (k, v) => (k._1, k._2, v.size.toLong) }
      .toSeq.sortBy(t => (t._1, t._2)).toVector
    val df = ev.toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.streaming.EdgeStream.pairJoinViaStream(df, 3)
      .orderBy("t1", "t2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toVector
    assert(got == want)
    assert(want.nonEmpty)
  }
}
