package graft

import org.apache.spark.sql.functions._

import graft.algos.Temporal
import graft.text.TextOps

/** Round-5 wave-19 operators: duplicated-window profile (substring-dedup
  * signal), winnowing fingerprints, temporal wedge census.
  */
class Wave19Spec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def toks(t: String): Seq[String] =
    t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  test("duplicatedWindows ≡ brute corpus window counts") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(191)
    val words = Array("ant", "bee", "cat", "dog", "elk", "fox")
    val shared = (1 to 6).map(_ => words(rnd.nextInt(6))).mkString(" ")
    val docs = (0L until 20L).map { d =>
      val own = (1 to 10).map(_ => words(rnd.nextInt(6))).mkString(" ")
      // every third doc embeds the shared 6-token run → guaranteed dups
      (d, if (d % 3 == 0) s"$own $shared" else own)
    }
    val n = 4
    val all = docs.flatMap { case (d, t) =>
      toks(t).sliding(n).filter(_.length == n)
        .map(w => (d, md5Hex(w.mkString(" "))))
    }
    val cnt = all.groupBy(_._2).view.mapValues(_.size).toMap
    val want = all.groupBy(_._1).map { case (d, ws) =>
      val dup = ws.count(w => cnt(w._2) >= 2).toLong
      (d, ws.size.toLong, dup, dup * 1000000L / ws.size)
    }.toSet
    val got = TextOps.duplicatedWindows(docs.toDF("doc_id", "text"), n)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(want.exists(_._3 > 0), "fixture must contain real duplicates")
  }

  test("winnow ≡ brute sliding-min fingerprints") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(233)
    val words = Array("red", "blue", "green", "gold", "iron", "clay", "moss")
    val docs = (0L until 15L).map { d =>
      (d, (1 to (8 + rnd.nextInt(20))).map(_ => words(rnd.nextInt(7)))
        .mkString(" "))
    }
    val (k, w) = (4, 5)
    val want = docs.flatMap { case (d, t) =>
      val grams = toks(t).sliding(k).filter(_.length == k)
        .map(g => java.lang.Long.parseLong(
          md5Hex(g.mkString(" ")).substring(0, 15), 16)).toSeq
      if (grams.isEmpty) None else {
        val nGrams = grams.length.toLong
        val fps = grams.sliding(w).filter(_.length == w).map(_.min)
          .toSeq.distinct
        if (fps.isEmpty) None
        else Some((d, nGrams, fps.size.toLong,
          fps.size.toLong * 1000000L / nGrams))
      }
    }.toSet
    val got = TextOps.winnow(docs.toDF("doc_id", "text"), k, w)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("timeWedges ≡ brute time-respecting 2-path count with deg cap") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(97)
    val edges = (for (_ <- 0 until 300) yield
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong,
        rnd.nextInt(100).toLong)).distinct
      .filter(e => e._1 != e._2)
    val delta = 25L
    val maxDeg = 20L
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = edges.groupBy(_._2).flatMap { case (m, in) =>
      if (deg.getOrElse(m, 0L) > maxDeg) None else {
        val out = edges.filter(_._1 == m)
        val c = (for {
          (a, _, t1) <- in
          (_, b, t2) <- out
          if a != b && t2 >= t1 && t2 <= t1 + delta
        } yield 1).size.toLong
        if (c > 0) Some(m -> c) else None
      }
    }.toMap
    val got = Temporal.timeWedges(edges.toDF("src", "dst", "t"), delta,
        maxDeg)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
    assert(want.nonEmpty)
  }
}
