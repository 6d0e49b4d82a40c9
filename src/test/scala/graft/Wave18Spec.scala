package graft

import org.apache.spark.sql.functions._

import graft.algos.Spectral
import graft.graph.GraphOps

/** Round-5 wave-18 operators: SALSA, eigenvector centrality, rich-club
  * profile — each against a sequential integer reference on a random graph.
  */
class Wave18Spec extends SparkSpec {

  private def randomBipartite(n: Int, seed: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (for {
      u <- 0L until n.toLong
      _ <- 0 until (1 + rnd.nextInt(3))
    } yield (u, 1000L + rnd.nextInt(n / 2 + 1))).distinct
  }

  test("salsa ≡ sequential floor-division reference") {
    val s = spark
    import s.implicits._
    val edges = randomBipartite(40, 181)
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val in = edges.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    var h = out.keys.map(_ -> 1000000000000L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 4) {
      a = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => h(e._1) / out(e._1)).sum
      }
      h = edges.groupBy(_._1).map { case (u, es) =>
        u -> es.map(e => a(e._2) / in(e._2)).sum
      }
    }
    val want = (h.map { case (v, x) => (v, "hub", x) } ++
      a.map { case (v, x) => (v, "auth", x) }).toSet
    val got = Spectral.salsa(edges.toDF("src", "dst"), 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("eigenvector ≡ sequential max-normalized power iteration") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(307)
    val dir = (for {
      u <- 0L until 60L
      _ <- 0 until (1 + rnd.nextInt(3))
    } yield (u, rnd.nextInt(60).toLong)).filter(e => e._1 != e._2).distinct
    val edges = (dir ++ dir.map(_.swap)).distinct
    var x = edges.map(_._1).distinct.map(_ -> 1000000L).toMap
    for (_ <- 1 to 4) {
      val y = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => x(e._1)).sum
      }
      val m = y.values.max
      x = y.map { case (v, yv) => v -> (yv * 1000000L) / m }
    }
    val got = Spectral.eigenvector(edges.toDF("src", "dst"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == x)
  }

  test("richClub ≡ brute-force induced-subgraph density") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(271)
    val dir = (for {
      u <- 0L until 50L
      _ <- 0 until (1 + rnd.nextInt(4))
    } yield (u, rnd.nextInt(50).toLong)).filter(e => e._1 != e._2).distinct
    val edges = (dir ++ dir.map(_.swap)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = Seq(2L, 4L, 8L, 16L).flatMap { k =>
      val club = deg.filter(_._2 >= k).keySet
      val e2 = edges.count(e => club(e._1) && club(e._2)).toLong
      val n = club.size.toLong
      if (n > 1) Some((k, n, e2, e2 * 1000000L / (n * (n - 1)))) else None
    }.toSet
    val got = GraphOps.richClub(edges.toDF("src", "dst"), Seq(2, 4, 8, 16))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty)
  }
}
