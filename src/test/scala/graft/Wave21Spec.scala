package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.algos.{Louvain, TriangleCount}
import graft.events.Analytics

/** Round-5 wave-21 operators: wedge-sampling triangle estimate, trigram
  * event transitions, Louvain community coarsening.
  */
class Wave21Spec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("sampledCount ≡ brute degree-oriented wedge sampling") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(733)
    val und = (for (_ <- 0 until 160) yield {
      val a = rnd.nextInt(25).toLong; val b = rnd.nextInt(25).toLong
      (math.min(a, b), math.max(a, b))
    }).filter(e => e._1 != e._2).distinct
    val deg = und.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    def fwd(x: Long, y: Long): Boolean =
      deg(x) < deg(y) || (deg(x) == deg(y) && x < y)
    val o = und.map { case (x, y) => if (fwd(x, y)) (x, y) else (y, x) }
    val oSet = o.toSet
    val rate = 4
    val wedges = for {
      (a, b1) <- o
      (b2, c) <- o if b1 == b2
      if java.lang.Long.parseLong(
        md5Hex(s"$a:$b1:$c").substring(0, 15), 16) % rate == 0
    } yield (a, b1, c)
    val closed = wedges.count(w => oSet((w._1, w._3))).toLong
    val want = (wedges.size.toLong, closed, closed * rate)
    val got = TriangleCount.sampledCount(und.toDF("src", "dst"), rate)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    assert(got == want)
    assert(want._1 > 0)
  }

  test("transitions2 ≡ brute per-user trigram counts") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(839)
    val types = Array("view", "click", "buy")
    val rows = (0L until 200L).map { i =>
      (i, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        rnd.nextInt(8).toLong, types(rnd.nextInt(3)))
    }
    val want = rows.groupBy(_._3).toSeq.flatMap { case (_, es) =>
      val seq = es.sortBy(e => (e._2.getTime, e._1)).map(_._4)
      seq.sliding(3).filter(_.length == 3).map(t => (t(0), t(1), t(2)))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Analytics.transitions2(
        rows.toDF("event_id", "ts", "user_id", "event_type"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("coarsen ≡ brute community contraction") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(941)
    val dir = (for (_ <- 0 until 120) yield
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong,
        (1 + rnd.nextInt(5)).toLong))
      .filter(e => e._1 != e._2)
      .groupBy(e => (e._1, e._2)).map { case ((a, b), es) =>
        (a, b, es.map(_._3).sum) }.toSeq
    val ew = dir ++ dir.map(e => (e._2, e._1, e._3))
    val labels = ew.map(_._1).distinct.map(v => (v, v % 4))
    val lm = labels.toMap
    val want = ew.map { case (a, b, w) => ((lm(a), lm(b)), w) }
      .filter { case ((ca, cb), _) => ca <= cb }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = Louvain.coarsen(ew.toDF("src", "dst", "weight"),
        labels.toDF("id", "comm"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
    assert(want.exists { case ((a, b), _) => a == b },
      "fixture must exercise the 2x-diagonal convention")
  }
}
