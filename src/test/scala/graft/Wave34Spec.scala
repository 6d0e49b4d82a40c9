package graft

import org.apache.spark.sql.functions._

import graft.algos.TriangleCount

/** Round-5 wave-34: per-vertex butterflies, burstiness rationals,
  * Pearson moment integers.
  */
class Wave34Spec extends SparkSpec {

  test("per-vertex butterflies ≡ brute C(codeg,2) credit") {
    val rnd = new scala.util.Random(4507)
    // bipartite: left 0..9 (centers), right 100..119
    val edges = (for {
      l <- 0L until 10L; r <- 0 until 6
    } yield (l, 100L + rnd.nextInt(20))).distinct
    val byCenter = edges.groupBy(_._1).map { case (_, v) => v.map(_._2) }
    val pairCn = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byCenter.foreach { rs =>
      val so = rs.sorted
      for (i <- so.indices; j <- (i + 1) until so.size)
        pairCn((so(i), so(j))) = pairCn.getOrElse((so(i), so(j)), 0L) + 1
    }
    val credit = scala.collection.mutable.Map.empty[Long, Long]
    pairCn.foreach { case ((v, w), cn) =>
      if (cn >= 2) {
        val b = cn * (cn - 1) / 2
        credit(v) = credit.getOrElse(v, 0L) + b
        credit(w) = credit.getOrElse(w, 0L) + b
      }
    }
    val want = credit.toSeq.sortBy(_._1).toVector
    val got = TriangleCount.butterfliesPerVertex(edgesDf(edges))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("burstiness rational ≡ brute n·Σc²−(Σc)² over daily counts") {
    val s = spark
    import s.implicits._
    val counts = Map("a" -> Seq(3L, 3L, 3L), "b" -> Seq(1L, 5L, 9L))
    val rows = counts.toSeq.flatMap { case (t, cs) =>
      cs.zipWithIndex.flatMap { case (c, d) =>
        (0L until c).map(i => (t, d.toLong, i))
      }
    }
    val want = counts.toSeq.map { case (t, cs) =>
      val n = cs.size.toLong
      val s1 = cs.sum
      val s2 = cs.map(c => c * c).sum
      (t, n, s1, n * s2 - s1 * s1, n * s1)
    }.sortBy(_._1).toVector
    val got = rows.toDF("event_type", "day", "i")
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("total"),
        (count(lit(1)) * sum(col("c") * col("c"))
          - sum(col("c")) * sum(col("c"))).as("fano_num"),
        (count(lit(1)) * sum(col("c"))).as("fano_den"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toVector
    assert(got == want)
    // the uniform series must have zero burst numerator
    assert(want.find(_._1 == "a").get._4 == 0L)
    assert(want.find(_._1 == "b").get._4 > 0L)
  }

  test("Pearson moment integers ≡ brute moments") {
    val s = spark
    import s.implicits._
    val data = Seq((10L, 2L), (20L, 4L), (30L, 5L), (40L, 9L))
    val n = data.size.toLong
    val sx = data.map(_._1).sum
    val sy = data.map(_._2).sum
    val wantNum = n * data.map(t => t._1 * t._2).sum - sx * sy
    val wantDx = n * data.map(t => t._1 * t._1).sum - sx * sx
    val wantDy = n * data.map(t => t._2 * t._2).sum - sy * sy
    val row = data.toDF("x", "y")
      .agg(count(lit(1)).as("n"),
        (count(lit(1)) * sum(col("x") * col("y"))
          - sum(col("x")) * sum(col("y"))).as("corr_num"),
        (count(lit(1)) * sum(col("x") * col("x"))
          - sum(col("x")) * sum(col("x"))).as("den_x"),
        (count(lit(1)) * sum(col("y") * col("y"))
          - sum(col("y")) * sum(col("y"))).as("den_y"))
      .head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3)) == ((n, wantNum, wantDx, wantDy)))
    assert(wantNum * wantNum <= wantDx * wantDy,
      "Cauchy-Schwarz sanity: corr² ≤ 1")
  }
}
