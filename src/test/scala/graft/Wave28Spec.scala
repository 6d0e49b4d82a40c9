package graft

import org.apache.spark.sql.functions._

import graft.algos.TriangleCount

/** Round-5 wave-28: mutual nearest neighbors, robust DAU stats (median +
  * MAD), weighted triangle strength.
  */
class Wave28Spec extends SparkSpec {

  test("mutual top-1 ≡ brute reciprocal argmax on rounded cosine") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3103)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      BigDecimal(dot / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val top1 = vecs.map { case (i, a) =>
      val best = vecs.filter(_._1 != i)
        .map { case (j, b) => (j, cos(a, b)) }
        .minBy { case (j, c) => (-c, j) }
      i -> best
    }.toMap
    val want = (for {
      (i, (j, c)) <- top1.toSeq
      if i < j && top1(j)._1 == i
    } yield (i, j, c)).sortBy(_._1).toVector
    val df = vecs.toDF("vec_id", "embedding")
    val t1 = graft.ann.Similarity.topK(df, df, 1)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    val got = t1.join(t1.toDF("q2", "n2", "c2"),
        col("query_id") === col("n2") && col("neighbor_id") === col("q2"))
      .where(col("query_id") < col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("cos"))
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toVector
    assert(got == want)
    assert(want.nonEmpty, "some mutual pair must exist")
  }

  test("discrete median + MAD ≡ brute rank statistics") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3203)
    val daily = (0 until 31).map(d => (d.toLong, 5L + rnd.nextInt(40)))
    def rankStat(vs: Seq[Long]): Long = {
      val sorted = vs.sorted
      val target = (vs.size * 50 + 99) / 100
      sorted(target - 1)
    }
    val med = rankStat(daily.map(_._2))
    val mad = rankStat(daily.map(t => math.abs(t._2 - med)))
    val dau = daily.toDF("day", "dau")
    val medDf = graft.functions.Quantiles.discreteBy(
        dau.select(lit("all").as("g"), col("dau")), "g", "dau", Seq(50))
      .select(col("value").as("median_dau"))
    val dev = dau.crossJoin(broadcast(medDf))
      .select(lit("all").as("g"), abs(col("dau") - col("median_dau")).as("dev"))
    val madDf = graft.functions.Quantiles.discreteBy(dev, "g", "dev", Seq(50))
      .select(col("value").as("mad_dau"))
    val row = medDf.crossJoin(madDf).head()
    assert((row.getLong(0), row.getLong(1)) == ((med, mad)))
  }

  test("triangle strength ≡ brute min-weight sum over triangles") {
    val rnd = new scala.util.Random(3301)
    val canon = Oracles.randomGraph(3301, 50, 250)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(t => t._1 != t._2).distinct
      .map { case (a, b) => (a, b, 1L + rnd.nextInt(9).toLong) }
    val wmap = canon.map { case (a, b, w) => (a, b) -> w }.toMap
    val adj = canon.map { case (a, b, _) => (a, b) }.toSet
    val ids = canon.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    var n = 0L
    var strength = 0L
    for {
      i <- ids.indices; j <- (i + 1) until ids.size; k <- (j + 1) until ids.size
      a = ids(i); b = ids(j); c = ids(k)
      if adj((a, b)) && adj((b, c)) && adj((a, c))
    } {
      n += 1
      strength += Seq(wmap((a, b)), wmap((b, c)), wmap((a, c))).min
    }
    val row = TriangleCount.triangleStrength(
        edgesWDf(canon.map(t => (t._1, t._2, t._3.toDouble)))
          .select(col("src"), col("dst"), col("weight").cast("long")))
      .head()
    assert((row.getLong(0), row.getLong(1)) == ((n, strength)))
    assert(n > 0, "test graph must contain triangles")
  }
}
