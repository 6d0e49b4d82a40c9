package graft

import org.apache.spark.sql.functions._

import graft.ann.KMeans

/** Round-5 wave-23: k-means inertia curve, Zipf profile, joint degree
  * matrix.
  */
class Wave23Spec extends SparkSpec {

  test("runProfile ≡ brute per-round inertia, non-increasing") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1103)
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(6)(rnd.nextFloat() * 2f - 1f)))
    val got = KMeans.runProfile(s, vecs.toDF("vec_id", "embedding"), 4, 3)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toVector
    val want = (1 to 3).map { iters =>
      iters.toLong -> Oracles.bruteKMeans(vecs, 4, iters, 10000L, 10000L)
        .values.map(_._2).sum
    }.toVector
    assert(got == want)
    assert(got.map(_._2) == got.map(_._2).sorted.reverse,
      "Lloyd inertia must be non-increasing")
  }

  test("zipf50 ≡ brute token counts with (cnt desc, tok) rank") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1201)
    val words = Array("the", "of", "and", "to", "ant", "bee", "sky")
    val docs = (0L until 30L).map(d =>
      (d, (1 to 20).map(_ => words(rnd.nextInt(7))).mkString(" ")))
    val cnt = docs.flatMap(_._2.split(" ")).groupBy(identity)
      .view.mapValues(_.size.toLong).toSeq
    val want = cnt.sortBy { case (t, c) => (-c, t) }.take(50).zipWithIndex
      .map { case ((t, c), i) => (i + 1L, t, c) }.toVector
    val got = {
      import org.apache.spark.sql.expressions.Window
      val tf = docs.toDF("doc_id", "text")
        .select(explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      tf.orderBy(col("cnt").desc, col("tok")).limit(50)
        .select(row_number()
            .over(Window.orderBy(col("cnt").desc, col("tok")))
            .cast("long").as("rank"), col("tok"), col("cnt"))
        .orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toVector
    }
    assert(got == want)
  }

  test("joint degree matrix ≡ brute log2 bucket counts") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1301)
    val dir = (for (_ <- 0 until 200) yield
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2).distinct
    val edges = (dir ++ dir.map(_.swap)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def bucket(d: Long): Long = 64 - java.lang.Long.numberOfLeadingZeros(d)
    val want = edges.groupBy(e => (bucket(deg(e._1)), bucket(deg(e._2))))
      .view.mapValues(_.size.toLong).toMap
    val e = edges.toDF("src", "dst")
    val dd = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val got = e.join(dd.toDF("src", "ds"), "src")
      .join(dd.toDF("dst", "dd"), "dst")
      .groupBy(length(bin(col("ds"))).cast("long").as("sb"),
        length(bin(col("dd"))).cast("long").as("db"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == want)
    assert(want.size > 1)
  }
}
