package graft

import org.apache.spark.sql.functions._

import graft.algos.{ConnectedComponents, Sketches}
import graft.engine.SuperstepConfig

/** Round-5 wave-20 operators: grid-layout CC, ANF neighbourhood-function
  * profile, hub-removal robustness census.
  */
class Wave20Spec extends SparkSpec {

  private def randomUnd(n: Int, m: Int, seed: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val dir = (for (_ <- 0 until m) yield
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2).distinct
    (dir ++ dir.map(_.swap)).distinct
  }

  private def bruteComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> find(v)).toMap
  }

  test("cc on the forced 2D grid layout ≡ union-find components") {
    val s = spark
    import s.implicits._
    val edges = randomUnd(80, 100, 411)
    val want = bruteComponents(edges)
    // component ids are the per-component MIN vertex id in both
    val canon = want.values.toSeq.distinct
      .map(r => r -> want.filter(_._2 == r).keys.min).toMap
    val got = ConnectedComponents.run(s, edges.toDF("src", "dst"),
        SuperstepConfig(numPartitions = 4, gridSide = Some(3)))
      .state.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want.map { case (v, r) => v -> canon(r) })
  }

  test("anfProfile ≡ brute per-round lsb sums") {
    val s = spark
    import s.implicits._
    def md5Hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def seedBit(j: Int, id: Long): Long = {
      val h = java.lang.Long.parseLong(md5Hex(s"$j:$id").substring(0, 15), 16)
      1L << math.min(java.lang.Long.numberOfTrailingZeros(h), 30)
    }
    val edges = randomUnd(50, 70, 523)
    val regs = 8
    var st = edges.map(_._1).distinct
      .map(v => v -> (0 until regs).map(j => seedBit(j, v))).toMap
    def lsbSum(m: Map[Long, Seq[Long]]): Long =
      m.values.map(_.map(r =>
        java.lang.Long.numberOfTrailingZeros(~r).toLong).sum).sum
    var want = Vector(0L -> lsbSum(st))
    for (t <- 1 to 4) {
      val upd = edges.groupBy(_._2).map { case (d, es) =>
        d -> (0 until regs).map(j => es.map(e => st(e._1)(j)).reduce(_ | _))
      }
      st = st.map { case (v, r) =>
        v -> upd.get(v).fold(r)(u => r.zip(u).map(p => p._1 | p._2))
      }
      want :+= t.toLong -> lsbSum(st)
    }
    val got = Sketches.anfProfile(edges.toDF("src", "dst"), 4, regs)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(got == want)
  }

  test("hubAttackCensus ≡ brute top-k removal + union-find census") {
    val s = spark
    import s.implicits._
    val edges = randomUnd(60, 140, 619)
    val k = 5
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val hubs = deg.toSeq.sortBy { case (id, d) => (-d, id) }.take(k)
      .map(_._1).toSet
    val left = edges.filterNot(e => hubs(e._1) || hubs(e._2))
    val comps = bruteComponents(left).groupBy(_._2)
    val want = (comps.size.toLong,
      comps.values.map(_.size).max.toLong,
      comps.values.map(_.size).sum.toLong)
    val got = ConnectedComponents.hubAttackCensus(s,
        edges.toDF("src", "dst"), k, SuperstepConfig(numPartitions = 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    assert(got == want)
    assert(left.nonEmpty)
  }
}
