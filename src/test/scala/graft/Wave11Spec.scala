package graft

import org.apache.spark.sql.functions._

import graft.algos.LinkPrediction
import graft.multimodal.Multimodal
import graft.text.TextOps

/** Round-5 wave-11 operators: windowed co-occurrence pairs, binary
  * keyframe sampling, deterministic negative edge sampling.
  */
class Wave11Spec extends SparkSpec {

  // ---- windowed co-occurrence -------------------------------------------------

  private def bruteCooccur(docs: Seq[(Long, String)],
                           window: Int): Map[(String, String), Long] =
    docs.flatMap { case (_, t) =>
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      for {
        i <- toks.indices; d <- 1 to window if i + d < toks.length
      } yield {
        val (a, b) = (toks(i), toks(i + d))
        if (a <= b) (a, b) else (b, a)
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("cooccurrence ≡ brute window pairs; window 1 ≡ bigram counts") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      0L -> "a b c a b c a",
      1L -> "x y x y z",
      2L -> "solo")
    val df = docs.toDF("doc_id", "text")
    val got = TextOps.cooccurrence(df, 3).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == bruteCooccur(docs, 3))
    val g1 = TextOps.cooccurrence(df, 1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(g1 == bruteCooccur(docs, 1))
  }

  // ---- binary keyframe sampling -------------------------------------------------

  private def bruteFrames(docs: Seq[(Long, String)], fb: Int, stride: Int,
                          prefix: Int): Map[(Long, Long), (Long, String)] = {
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map(x => f"$x%02x").mkString
    docs.flatMap { case (id, t) =>
      val bytes = t.take(prefix).getBytes("UTF-8") // chars first, then bytes
      val nframes = (bytes.length + fb - 1) / fb
      (0 until nframes).filter(_ % stride == 0).map { fi =>
        val fr = bytes.slice(fi * fb, math.min((fi + 1) * fb, bytes.length))
        (id, fi.toLong) -> ((fr.length.toLong, md5hex(fr)))
      }
    }.toMap
  }

  test("frameSample ≡ brute byte slicing incl. short tail frame") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      0L -> ("abcdefgh" * 12),          // 96 chars -> 64-byte payload
      1L -> "exactly sixteen!",         // one full frame
      2L -> "short tail frame here x",  // 23 bytes: frames 16 + 7
      3L -> "tiny")                     // single 4-byte frame
    val got = Multimodal.frameSample(docs.toDF("doc_id", "text"), 16, 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(got == bruteFrames(docs, 16, 2, 64))
    assert(got((2L, 0L))._1 == 16L) // full frame
    assert(!got.contains((2L, 1L))) // stride 2 skips frame 1
  }

  test("frameSample slices BYTES after the char-prefix encode (UTF-8)") {
    val s = spark
    import s.implicits._
    // 2-byte char é: 10 chars but 11 bytes -> frames of 8 bytes split
    // mid-text; pins the chars-then-bytes contract
    val docs = Seq(0L -> "café latte")
    val got = Multimodal.frameSample(docs.toDF("doc_id", "text"), 8, 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(got == bruteFrames(docs, 8, 1, 64))
    assert(got((0L, 0L))._1 == 8L && got((0L, 1L))._1 == 3L)
  }

  // ---- deterministic negative sampling ----------------------------------------

  private def bruteNeg(pairs: Seq[(Long, Long)], trials: Int,
                       k: Int): Set[(Long, Long, Long)] = {
    val und = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }.toSet
    val vs = und.map(_._1).toSeq.distinct
    val n = vs.size.toLong
    val rank = vs.sortBy(_.toString).zipWithIndex
      .map { case (id, r) => r.toLong -> id }.toMap
    vs.flatMap { v =>
      (0 until trials).flatMap { t =>
        val u = rank(Oracles.md5Prio(s"$v:$t") % n)
        if (u != v && !und.contains((v, u))) Some((v, u, t.toLong)) else None
      }.take(k)
    }.toSet
  }

  test("negativeSample ≡ brute; never an edge, ≤ k per vertex") {
    val pairs = Oracles.randomGraph(seed = 53, n = 20, m = 40)
      .filter(e => e._1 != e._2).distinct
    val undDf = edgesDf(pairs.flatMap { case (a, b) =>
      Seq((a, b), (b, a))
    }.distinct)
    val got = LinkPrediction.negativeSample(undDf, trials = 6, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == bruteNeg(pairs, 6, 2))
    val und = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }.toSet
    assert(got.forall { case (v, u, _) => v != u && !und.contains((v, u)) })
    assert(got.groupBy(_._1).values.forall(_.size <= 2))
  }
}
