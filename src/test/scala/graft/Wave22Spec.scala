package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.events.Analytics
import graft.streaming.TransitionStream

/** Round-5 wave-22: keyed-state streaming transitions (state carried
  * ACROSS micro-batches) and the bucketed co-located join plan shape.
  */
class Wave22Spec extends SparkSpec {

  test("transitionsViaStream ≡ batch transitions across batch boundaries") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1013)
    val types = Array("view", "click", "buy", "error")
    val rows = (0L until 300L).map { i =>
      (i, new Timestamp(1700000000000L + i * 60000L + rnd.nextInt(1000)),
        rnd.nextInt(6).toLong, types(rnd.nextInt(4)))
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type")
    val want = Analytics.transitions(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // users span the whole time range, so every user's chain crosses the
    // 4 replay chunks — the across-batch state path is what's exercised
    val got = TransitionStream.transitionsViaStream(df, splits = 4)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
    assert(want.values.sum > 200, "chains must cross batch boundaries")
  }

  test("bucketed tables join with NO exchange (co-located join)") {
    val s = spark
    import s.implicits._
    val tmp = Files.createTempDirectory("graft-bucket")
    val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      val a = (0L until 1000L).map(i => (i % 97, i)).toDF("k", "va")
      val b = (0L until 600L).map(i => (i % 97, i * 2)).toDF("k", "vb")
      a.write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$tmp/ta").saveAsTable("graft_bkt_a")
      b.write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$tmp/tb").saveAsTable("graft_bkt_b")
      val j = s.table("graft_bkt_a").join(s.table("graft_bkt_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      val want = {
        val cb = (0L until 600L).groupBy(_ % 97).view.mapValues(_.size)
        (0L until 1000L).map(i => cb.getOrElse(i % 97, 0)).map(_.toLong).sum
      }
      assert(j.count() == want)
    } finally {
      s.sql("DROP TABLE IF EXISTS graft_bkt_a")
      s.sql("DROP TABLE IF EXISTS graft_bkt_b")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      val walk = Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
