package graft

import org.apache.spark.sql.functions._

/** Round-5 wave-31: per-language distinctive terms, RANGE-frame rolling
  * revenue, MAD outlier days.
  */
class Wave31Spec extends SparkSpec {

  test("lang lift top-3 ≡ brute cross-multiplied lift ranks") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3803)
    val vocab = Array("uno", "dos", "tres", "cat", "dog", "sun", "moon")
    val langs = Array("aa", "bb")
    val docsSeq = (0L until 40L).map { i =>
      val lang = langs(rnd.nextInt(2))
      // bias: "uno/dos" 3x more likely in lang aa, "cat/dog" in bb
      val words = (0 until 30).map { _ =>
        val r = rnd.nextInt(10)
        if (lang == "aa") (if (r < 5) vocab(rnd.nextInt(3))
          else vocab(3 + rnd.nextInt(4)))
        else (if (r < 5) vocab(3 + rnd.nextInt(2))
          else vocab(rnd.nextInt(7)))
      }
      (i, lang, words.mkString(" "))
    }
    val toks = docsSeq.flatMap { case (_, l, t) => t.split(" ").map((l, _)) }
    val tfl = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tfa = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nl = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val na = toks.size.toLong
    val want = tfl.toSeq.filter(_._2 >= 5).map { case ((l, t), f) =>
      (l, t, f, f * na * 1000000L / (tfa(t) * nl(l)))
    }.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._4, r._2)).take(3).zipWithIndex
        .map { case ((l, t, f, m), i) => (l, t, f, m, i + 1L) }
    }.sortBy(r => (r._1, r._5)).toVector
    val df = docsSeq.toDF("doc_id", "lang", "text")
    import org.apache.spark.sql.expressions.Window
    val tk = df.select(col("lang"),
      explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      .localCheckpoint(true)
    val tflD = tk.groupBy("lang", "tok").agg(count(lit(1)).as("tfl"))
    val tfaD = tk.groupBy("tok").agg(count(lit(1)).as("tfa"))
    val nlD = tk.groupBy("lang").agg(count(lit(1)).as("nl"))
    val naD = tk.count()
    val w = Window.partitionBy("lang").orderBy(col("lift_micro").desc,
      col("tok"))
    val got = tflD.where(col("tfl") >= 5)
      .join(tfaD, "tok").join(broadcast(nlD), "lang")
      .select(col("lang"), col("tok"), col("tfl"),
        expr(s"(tfl * ${naD}L * 1000000) div (tfa * nl)").as("lift_micro"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3).orderBy("lang", "rk").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toVector
    assert(got == want)
    assert(want.size == 6)
  }

  test("RANGE-frame rolling sum ≡ brute trailing 7-day window incl. gaps") {
    val s = spark
    import s.implicits._
    // days with HOLES so RANGE vs ROWS frames genuinely differ
    val daily = Seq(
      ("x", 1L, 10L), ("x", 2L, 20L), ("x", 9L, 5L), ("x", 10L, 7L),
      ("x", 20L, 1L), ("y", 3L, 4L), ("y", 8L, 6L), ("y", 9L, 2L))
    val want = daily.map { case (t, d, c) =>
      val c7 = daily.filter(r => r._1 == t && r._2 >= d - 6 && r._2 <= d)
        .map(_._3).sum
      (t, d, c, c7)
    }.sortBy(r => (r._1, r._2)).toVector
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy(col("day"))
      .rangeBetween(-6, 0)
    val got = daily.toDF("event_type", "day", "cents")
      .withColumn("cents7", sum(col("cents")).over(w))
      .orderBy("event_type", "day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toVector
    assert(got == want)
    // the holes matter: day 9 of x must NOT include day 1-2
    assert(want.find(r => r._1 == "x" && r._2 == 9L).get._4 == 5L)
  }

  test("MAD outliers ≡ brute |v - med| > 3*mad filter") {
    val s = spark
    import s.implicits._
    val vals = Seq(10L, 11L, 12L, 11L, 10L, 12L, 11L, 50L, 10L, 1L)
    val daily = vals.zipWithIndex.map { case (v, d) => (d.toLong, v) }
    def rank50(vs: Seq[Long]): Long = {
      val so = vs.sorted; so(((vs.size * 50 + 99) / 100 - 1).toInt)
    }
    val med = rank50(vals)
    val mad = rank50(vals.map(v => math.abs(v - med)))
    val want = daily.filter { case (_, v) => math.abs(v - med) > 3 * mad }
      .sortBy(_._1).toVector
    val dau = daily.toDF("day", "dau").localCheckpoint(true)
    val medDf = graft.functions.Quantiles.discreteBy(
        dau.select(lit("all").as("g"), col("dau")), "g", "dau", Seq(50))
      .select(col("value").as("med"))
    val devDf = dau.crossJoin(broadcast(medDf))
      .select(lit("all").as("g"), abs(col("dau") - col("med")).as("dev"))
    val madDf = graft.functions.Quantiles.discreteBy(devDf, "g", "dev",
      Seq(50)).select(col("value").as("mad"))
    val got = dau.crossJoin(broadcast(medDf)).crossJoin(broadcast(madDf))
      .where(abs(col("dau") - col("med")) > lit(3) * col("mad"))
      .select("day", "dau").orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(got == want)
    assert(want.nonEmpty, "the planted outliers must be flagged")
  }
}
