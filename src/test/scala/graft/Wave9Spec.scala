package graft

import org.apache.spark.sql.functions._

import graft.ann.KMeans
import graft.graph.GraphOps
import graft.text.TextOps

/** Round-5 wave-9 operators: exact-integer k-means, boilerplate fraction,
  * sequence-packing layout, ORC edge round-trip.
  */
class Wave9Spec extends SparkSpec {

  // ---- exact-integer k-means ------------------------------------------------

  /** Sequential Lloyd reference lives in [[Oracles.bruteKMeans]] (shared
    * with the product-quantization spec).
    */
  private def bruteKMeans(vecs: Seq[(Long, Array[Float])], k: Int,
                          iters: Int, scale: Long,
                          offset: Long): Map[Long, (Long, Long)] =
    Oracles.bruteKMeans(vecs, k, iters, scale, offset)

  private def collectKm(df: org.apache.spark.sql.DataFrame)
  : Map[Long, (Long, Long)] =
    df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("kmeans ≡ sequential Lloyd on random vectors") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(id =>
      id -> Array.fill(6)((rnd.nextDouble() - 0.5).toFloat))
    val got = collectKm(
      KMeans.run(s, vecs.toDF("vec_id", "embedding"), 4, 3)
        .orderBy("vec_id"))
    assert(got == bruteKMeans(vecs, 4, 3, 10000L, 10000L))
  }

  test("kmeans is translation-invariant in the offset") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 25L).map(id =>
      id -> Array.fill(5)((rnd.nextDouble() - 0.5).toFloat))
    val df = vecs.toDF("vec_id", "embedding")
    val a = collectKm(KMeans.run(s, df, 3, 2, offset = 10000L))
    val b = collectKm(KMeans.run(s, df, 3, 2, offset = 50000L))
    assert(a == b)
  }

  test("kmeans empty-cluster coalesce: duplicate seed keeps its centroid") {
    val s = spark
    import s.implicits._
    // Find the two smallest md5-prio ids in 0..9 and give them IDENTICAL
    // vectors: both seed clusters sit on the same point, round 1's packed
    // min sends every member to the lower cluster id, and the higher seed
    // cluster goes EMPTY — the coalesce must keep its centroid. Cluster 0's
    // centroid then moves to the floored mean while the kept centroid stays
    // on the duplicate point, so round 2 reassigns the points sitting on it
    // to cluster 1 — visible proof the empty cluster survived the update.
    val ids = (0L until 10L)
    val seedPair = ids.sortBy(id => (Oracles.md5Prio(id.toString), id)).take(2)
    val rnd = new scala.util.Random(13)
    val base = Array.fill(4)((rnd.nextDouble() - 0.5).toFloat)
    val vecs = ids.map { id =>
      id -> (if (seedPair.contains(id)) base.clone()
             else Array.fill(4)((rnd.nextDouble() - 0.5).toFloat))
    }
    val got = collectKm(KMeans.run(s, vecs.toDF("vec_id", "embedding"), 2, 3))
    assert(got == bruteKMeans(vecs, 2, 3, 10000L, 10000L))
    assert(got.values.exists(_._1 == 1L)) // the coalesced centroid won back
  }

  // ---- boilerplate fraction -------------------------------------------------

  private def bruteBoiler(docs: Seq[(Long, String)], n: Int,
                          minDf: Int): Map[Long, (Long, Long, Long)] = {
    val sh: Map[Long, Set[String]] = docs.map { case (id, t) =>
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      id -> (if (toks.length >= n)
        toks.sliding(n).map(_.mkString(" ")).toSet
      else Set.empty[String])
    }.toMap
    val df = sh.values.flatten.toSeq.groupBy(identity)
      .view.mapValues(_.size).toMap
    sh.collect { case (id, grams) if grams.nonEmpty =>
      val g = grams.size.toLong
      val dup = grams.count(df(_) >= minDf).toLong
      id -> ((g, dup, dup * 1000000L / g))
    }
  }

  test("boilerplateFrac ≡ brute shingle sets") {
    val s = spark
    import s.implicits._
    val chrome = "all rights reserved click here to subscribe"
    val words = Vector("data", "spark", "query", "join", "agg", "scan")
    val rnd = new scala.util.Random(17)
    val docs = (0L until 20L).map { id =>
      val body = Seq.fill(12)(words(rnd.nextInt(words.size))).mkString(" ")
      id -> (if (id % 3 == 0) s"$chrome $body" else body)
    } :+ (99L -> "too short")          // < 5 tokens: no shingles, absent
    val got = TextOps.boilerplateFrac(docs.toDF("doc_id", "text"), 5, 3L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == bruteBoiler(docs, 5, 3))
    assert(!got.contains(99L))
  }

  // ---- sequence-packing layout ----------------------------------------------

  private def brutePack(docs: Seq[(Long, String)], cap: Long, shards: Long)
  : Map[Long, (Long, Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split("\\s+").count(_.nonEmpty).toLong
    }.filter(_._2 > 0L)
    toks.groupBy { case (id, _) => Oracles.md5Prio(id.toString) % shards }
      .flatMap { case (shard, ds) =>
        var cum = 0L
        ds.sortBy(_._1).map { case (id, tok) =>
          val start = cum; cum += tok
          id -> ((shard, tok, start / cap, (cum - 1) / cap, start % cap))
        }
      }
  }

  test("packBins ≡ sequential per-shard packing, docs straddle windows") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val docs = (0L until 30L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(25))("w").mkString(" ")
    } :+ (77L -> "   ")                 // zero tokens: dropped
    val got = TextOps.packBins(docs.toDF("doc_id", "text"), 16L, 4L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == brutePack(docs, 16L, 4L))
    assert(!got.contains(77L))
    // at least one document crosses a window boundary under cap 16
    assert(got.values.exists { case (_, _, first, last, _) => last > first })
  }

  // ---- ORC edge round-trip ----------------------------------------------------

  test("ORC edge sink + source round-trips integral weights exactly") {
    val e = edgesWDf(Seq((1L, 2L, 3.0), (2L, 5L, 1.0), (4L, 1L, 7.0)))
      .select(col("src"), col("dst"), col("weight").cast("long").as("weight"))
    val base = java.nio.file.Files.createTempDirectory("graft-orc-spec")
    try {
      e.write.mode("overwrite").orc(base.toString + "/edges")
      val back = GraphOps.readOrcEdges(spark, base.toString + "/edges")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(back == Set((1L, 2L, 3L), (2L, 5L, 1L), (4L, 1L, 7L)))
    } finally {
      import java.nio.file.{Files => F, Path}
      import java.util.Comparator
      val walk = F.walk(base)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => F.deleteIfExists(p))
      finally walk.close()
    }
  }
}
