package graft

import org.apache.spark.sql.functions._

import graft.functions.Quantiles
import graft.graph.GraphOps

/** Round-5 wave-15 operators: grouped percentile_disc, average-neighbor-
  * degree curve, co-visitation top-k.
  */
class Wave15Spec extends SparkSpec {

  test("discreteBy ≡ per-group brute percentile_disc") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(83)
    val rows = Seq.tabulate(300)(i =>
      (s"g${i % 3}", rnd.nextInt(40).toLong))
    val pcts = Seq(25, 50, 75, 99)
    val got = Quantiles.discreteBy(rows.toDF("grp", "v"), "grp", "v", pcts)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = rows.groupBy(_._1).flatMap { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      pcts.map { pct =>
        val target = (sorted.size.toLong * pct + 99) / 100
        (g, pct.toLong) -> sorted((target - 1).toInt)
      }
    }
    assert(got == want)
  }

  test("knnDegree ≡ brute degree-degree correlation; star golden") {
    val pairs = Oracles.randomGraph(seed = 89, n = 22, m = 45)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).distinct
    val nbr = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = nbr.toSeq.groupBy(_._2.size).map { case (k, vs) =>
      val samples = k.toLong * vs.size
      val nds = vs.map(_._2.toSeq.map(nbr(_).size.toLong).sum).sum
      k.toLong -> ((vs.size.toLong, nds * 1000000L / samples))
    }
    val got = GraphOps.knnDegree(edgesDf(pairs)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    // star golden: center deg n sees leaves (deg 1); leaves see the center
    val star = (1L to 5L).map(l => (0L, l))
    val g2 = GraphOps.knnDegree(edgesDf(star)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(g2 == Map(5L -> ((1L, 1000000L)), 1L -> ((5L, 5000000L))))
  }

  test("covisit top-3 respects the (weight DESC, id) tie order") {
    val s = spark
    import s.implicits._
    // part 0 co-purchased with 1..4; weight ties between 2 and 3
    val cp = Seq((0L, 1L, 9L), (0L, 2L, 5L), (0L, 3L, 5L), (0L, 4L, 1L))
      .toDF("src", "dst", "weight")
    import org.apache.spark.sql.expressions.Window
    val sym = cp.unionByName(cp.select(col("dst").as("src"),
      col("src").as("dst"), col("weight")))
    val got = sym.withColumn("rk",
        row_number().over(Window.partitionBy("src")
          .orderBy(col("weight").desc, col("dst"))).cast("long"))
      .where(col("src") === 0L && col("rk") <= 3)
      .orderBy("rk").collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSeq
    assert(got == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }
}
