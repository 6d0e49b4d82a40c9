package graft

import org.apache.spark.sql.functions._

import graft.graph.GraphOps
import graft.text.TextOps

/** Round-5 wave-5 operators: neighbor-set overlap coefficient, JSON-lines
  * edge source, token-window chunking, stream-static join enrichment.
  * Golden hand-checked values plus brute-force cross-checks (SURVEY §5.2).
  */
class Wave5Spec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** Brute overlap: symmetrized neighbor sets, all pairs. */
  private def bruteOverlap(pairs: Seq[(Long, Long)],
                           thr: Long): Map[(Long, Long), Long] = {
    val nbr = pairs.flatMap { case (a, b) =>
      if (a == b) Nil else Seq((a, b), (b, a))
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val vs = nbr.keys.toSeq.sorted
    (for {
      i <- vs.indices; j <- (i + 1) until vs.size
      (a, b) = (vs(i), vs(j))
      inter = (nbr(a) & nbr(b)).size.toLong if inter > 0
      om = inter * 1000000L / math.min(nbr(a).size, nbr(b).size)
      if om >= thr
    } yield (a, b) -> om).toMap
  }

  test("neighborOverlap: the hub-subset pair Jaccard misses") {
    // hub 0 with neighbors 1..6; vertex 7 sees exactly {1, 2}:
    // overlap(0,7) = 2/min(6,2) = 1.0 but jaccard = 2/6 — the containment
    // asymmetry this operator exists for
    val e = (1L to 6L).map(n => (0L, n)) ++ Seq((7L, 1L), (7L, 2L))
    val got = GraphOps.neighborOverlap(edgesDf(e), 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got((0L, 7L)) == 1000000L)
    assert(got == bruteOverlap(e, 500000L))
  }

  test("neighborOverlap ≡ brute all-pairs on a random graph") {
    val pairs = Oracles.randomGraph(seed = 53, n = 30, m = 90)
      .filter { case (a, b) => a != b }
    val got = GraphOps.neighborOverlap(edgesDf(pairs), 250000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == bruteOverlap(pairs, 250000L))
    assert(got.nonEmpty)
  }

  /** Brute chunking with the exact tokenizer + md5 discipline. */
  private def bruteChunks(texts: Seq[(Long, String)],
                          k: Int): Seq[(Long, Long, Long, String)] =
    texts.flatMap { case (id, t) =>
      val ts = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      ts.grouped(k).zipWithIndex.map { case (chunk, i) =>
        (id, (i + 1).toLong, chunk.size.toLong, md5Hex(chunk.mkString(" ")))
      }
    }

  test("chunkFingerprints ≡ brute grouped tokens incl. boundary + empty") {
    val texts = Seq(
      1L -> "a b c d e f g",       // 7 tokens / k=3 → 3,3,1
      2L -> "x y z",               // exactly one full chunk
      3L -> "",                    // empty → zero rows (no descending seq)
      4L -> "!!! ???",             // tokenizes to empty → zero rows
      5L -> (1 to 10).map(i => s"w$i").mkString(" ")) // 10 / 3 → 3,3,3,1
    val s = spark; import s.implicits._
    val got = TextOps.chunkFingerprints(texts.toDF("doc_id", "text"), 3)
      .orderBy("doc_id", "chunk_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got == bruteChunks(texts, 3).sorted)
    assert(!got.exists(_._1 == 3L) && !got.exists(_._1 == 4L))
  }

  test("readJsonEdges round-trips an edge frame exactly") {
    val s = spark; import s.implicits._
    val e = Seq((1L, 2L, 3L), (2L, 5L, 1L), (4L, 1L, 7L))
      .toDF("src", "dst", "weight")
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-spec")
      .toString
    try {
      e.write.mode("overwrite").json(dir)
      val back = GraphOps.readJsonEdges(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(back == Set((1L, 2L, 3L), (2L, 5L, 1L), (4L, 1L, 7L)))
    } finally {
      import java.nio.file.{Files => F, Path}
      val walk = F.walk(Path.of(dir))
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => F.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("stream-static enrichment drains to the batch join+groupBy") {
    val s = spark; import s.implicits._
    val edges = Seq((1L, 2L, 5L), (1L, 3L, 1L), (2L, 3L, 2L), (3L, 1L, 4L),
      (4L, 2L, 1L), (4L, 3L, 9L)).toDF("src", "dst", "weight")
    val dim = Seq((1L, "red"), (2L, "red"), (3L, "blue"), (4L, "green"))
      .toDF("id", "attr")
    val got = graft.streaming.EdgeStream
      .enrichedEdgeCountsViaStream(edges, dim, splits = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val exp = edges.join(dim.withColumnRenamed("id", "src"), "src")
      .groupBy("attr")
      .agg(count(lit(1)).as("n"), sum("weight").as("w"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == exp)
    // src-side enrichment: red = srcs {1,2} → edges (1,2),(1,3),(2,3)
    assert(got("red") == (3L, 8L) && got("green") == (2L, 10L) &&
      got("blue") == (1L, 4L))
  }
}
