package graft

import org.apache.spark.sql.functions._

import graft.algos.{ConnectedComponents, LabelPropagation, PageRank}
import graft.engine.SuperstepConfig

/** Round-5 wave-27: bond-percolation robustness profile, language
  * confusion matrix (composition — lang_id already has its own gate),
  * top-3 PageRank per LP community.
  */
class Wave27Spec extends SparkSpec {

  test("percolation profile ≡ brute md5-survival + union-find per threshold") {
    val canon = Oracles.randomGraph(2803, 60, 200)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(t => t._1 != t._2).distinct
    def survives(a: Long, b: Long, p: Int): Boolean =
      Oracles.md5Prio(s"$a:$b") % 100 < p
    val want = Seq(25, 50, 75).map { p =>
      val kept = canon.filter(t => survives(t._1, t._2, p))
      val vs = kept.flatMap(t => Seq(t._1, t._2)).distinct
      val comp = Oracles.unionFind(vs, kept)
      val sizes = comp.groupBy(_._2).map(_._2.size.toLong)
      (p.toLong, sizes.size.toLong, vs.size.toLong,
        if (sizes.isEmpty) 0L else sizes.max)
    }.toVector
    val keyed = edgesDf(canon).withColumn("h",
      graft.graph.GraphOps.md5Prio(
        concat_ws(":", col("src"), col("dst"))) % 100)
    val got = Seq(25, 50, 75).map { p =>
      val kept = keyed.where(col("h") < p).select("src", "dst")
      ConnectedComponents.run(spark, kept, SuperstepConfig(numPartitions = 4))
        .state.groupBy("component").agg(count(lit(1)).as("sz"))
        .agg(lit(p.toLong).as("p_pct"), count(lit(1)).as("n_components"),
          coalesce(sum("sz"), lit(0L)).as("n_vertices"),
          coalesce(max("sz"), lit(0L)).as("max_size"))
    }.reduce(_ unionByName _).orderBy("p_pct").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toVector
    assert(got == want)
    assert(want.map(_._3).distinct.size > 1,
      "thresholds must produce different survivor sets")
  }

  test("community_top3 ≡ brute LP labels + PR ranks + per-label top-3") {
    val canon = Oracles.randomGraph(2903, 40, 120)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(t => t._1 != t._2).distinct
    val sym = canon.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val ids = sym.map(_._1).distinct.sorted
    val labels = Oracles.bruteLp(ids, sym, 5)
    // brute PR, 5 fixed rounds, r0 = 1
    val out = sym.groupBy(_._1).view.mapValues(_.size).toMap
    var r = ids.map(_ -> 1.0).toMap
    for (_ <- 1 to 5) {
      val mass = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      sym.foreach { case (u, v) => mass(v) += r(u) / out(u) }
      r = ids.map(v => v -> (0.15 + 0.85 * mass(v))).toMap
    }
    val rounded = r.view.mapValues(p =>
      BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble).toMap
    val want = labels.toSeq.groupBy(_._2).toSeq.flatMap { case (lab, vs) =>
      vs.map(_._1).sortBy(v => (-rounded(v), v)).take(3).zipWithIndex
        .map { case (v, i) => (lab, v, rounded(v), i + 1L) }
    }.sortBy(t => (t._1, t._4)).toVector
    val got = {
      import org.apache.spark.sql.expressions.Window
      val e = edgesDf(sym)
      val lab = LabelPropagation.fixedRounds(e, 5)
      val pr = PageRank.fixedIterations(e, 5)
        .select(col("id"), round(col("rank"), 6).as("pr"))
      val w = Window.partitionBy("label").orderBy(col("pr").desc, col("id"))
      lab.join(pr, "id")
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 3).select("label", "id", "pr", "rk")
        .orderBy("label", "rk").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3)))
        .toVector
    }
    assert(got == want)
  }
}
