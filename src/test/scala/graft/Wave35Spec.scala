package graft

import org.apache.spark.sql.functions._

/** Round-5 wave-35: supplier co-supply derivation, supplier-nation
  * revenue, deterministic top-2 edge sparsifier.
  */
class Wave35Spec extends SparkSpec {

  test("co-supply derivation ≡ brute shared-part pair counts") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(4603)
    val sp = (for (_ <- 0 until 200)
      yield (rnd.nextInt(8).toLong, rnd.nextInt(30).toLong)).distinct
    val byPart = sp.groupBy(_._2).map { case (_, v) => v.map(_._1).sorted }
    val cnt = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byPart.foreach { ss =>
      for (i <- ss.indices; j <- (i + 1) until ss.size)
        cnt((ss(i), ss(j))) = cnt.getOrElse((ss(i), ss(j)), 0L) + 1
    }
    val want = cnt.toSeq.map { case ((a, b), w) => (a, b, w) }
      .sortBy(t => (t._1, t._2)).toVector
    val spDf = sp.toDF("supp", "part").distinct()
    val got = spDf.toDF("s1", "part")
      .join(spDf.toDF("s2", "part"), Seq("part"))
      .where(col("s1") < col("s2"))
      .groupBy(col("s1").as("src"), col("s2").as("dst"))
      .agg(count(lit(1)).as("weight"))
      .orderBy("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("top-2 md5 sparsifier ≡ brute per-vertex rank; degree ≤ 2 kept side") {
    val canon = Oracles.randomGraph(4701, 30, 120)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(t => t._1 != t._2).distinct
    val sym = canon.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val want = sym.groupBy(_._1).toSeq.flatMap { case (v, es) =>
      es.map { case (_, d) => (d, Oracles.md5Prio(s"$v:$d")) }
        .sortBy { case (d, h) => (h, d) }.take(2).zipWithIndex
        .map { case ((d, _), i) => (v, d, i + 1L) }
    }.sortBy(t => (t._1, t._3)).toVector
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("src").orderBy(col("h"), col("dst"))
    val got = edgesDf(sym)
      .withColumn("h", graft.graph.GraphOps.md5Prio(
        concat_ws(":", col("src"), col("dst"))))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 2)
      .select(col("src"), col("dst"), col("rk").cast("long").as("rk"))
      .orderBy("src", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
    assert(got == want)
    // every vertex keeps min(deg, 2) edges
    val degs = sym.groupBy(_._1).view.mapValues(_.size).toMap
    val kept = want.groupBy(_._1).view.mapValues(_.size).toMap
    degs.foreach { case (v, d) => assert(kept(v) == math.min(d, 2)) }
  }
}
