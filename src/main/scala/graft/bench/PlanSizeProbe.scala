package graft.bench

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ann.Similarity

/** VERDICT r3 item 6: the literal-array spelling of lshBucketsMulti inlines
  * tables·bits·dim weight literals into ONE projection — at realistic
  * embedding dims (512–4096) that is 50k–400k literals and plan/codegen
  * build time becomes the bottleneck before data does. A/B: time to
  * ANALYZE + PHYSICALLY PLAN (queryExecution.executedPlan) plus one tiny
  * execution, literal-array vs broadcast-plane-table spelling, at dim
  * 512 and 2048 (bits=4, tables=24, 64 rows — the cost under test is plan
  * build, not data). Run: `runMain graft.bench.PlanSizeProbe`.
  */
object PlanSizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.Sessions.local(8, "plansize-probe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val bits = 4
    val tables = 24

    def emb(dim: Int): DataFrame =
      spark.range(64).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => pmod(xxhash64(col("id"), i), lit(1000)).cast("float") / 1000)
          .as("embedding")).localCheckpoint(true)

    def w(t: Int, b: Int, i: Int): Double =
      if ((scala.util.hashing.MurmurHash3.productHash((t, b, i)) & 1) == 0)
        1.0 else -1.0

    /** The pre-r4 spelling, kept here for the A/B: per-plane literal
      * arrays inlined into the projection.
      */
    def literalSpelling(e: DataFrame, dim: Int): DataFrame = {
      val tableCols = (0 until tables).map { t =>
        (0 until bits).map { b =>
          val plane = array((0 until dim).map(i => lit(w(t, b, i))): _*)
          when(graft.functions.VectorFunctions
            .dot_product(col("__vd"), plane) > 0, lit(1L << b))
            .otherwise(lit(0L))
        }.reduce(_ + _).as(s"bkt$t")
      }
      val stackArgs = (0 until tables).map(t => s"$t, bkt$t").mkString(", ")
      e.select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("__vd"))
        .select(col("vec_id") +: tableCols: _*)
        .selectExpr("vec_id", s"stack($tables, $stackArgs) AS (tbl, bucket)")
    }

    def timePlanAndRun(mk: () => DataFrame): (Double, Double) = {
      val t0 = System.nanoTime()
      val df = mk()
      df.queryExecution.executedPlan // force analysis + physical planning
      val tPlan = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      df.count() // codegen compile + run over the 64 rows
      val tRun = (System.nanoTime() - t1) / 1e9
      (tPlan, tRun)
    }

    // warm-up (JIT + catalyst caches) at a small dim
    timePlanAndRun(() => literalSpelling(emb(32), 32))
    timePlanAndRun(() =>
      Similarity.lshBucketsMulti(emb(32), bits, tables, 32))

    for (dim <- Seq(512, 2048)) {
      val e = emb(dim)
      val (lp, lr) = timePlanAndRun(() => literalSpelling(e, dim))
      val (bp, br) = timePlanAndRun(() =>
        Similarity.lshBucketsMulti(e, bits, tables, dim))
      println(f"PROBE plansize dim=$dim literals=${tables * bits * dim}%d " +
        f"literal plan=$lp%.2f s run=$lr%.2f s | " +
        f"broadcast plan=$bp%.2f s run=$br%.2f s")
      // the two spellings must bucket identically
      val a = literalSpelling(e, dim).orderBy("vec_id", "tbl").collect()
      val b = Similarity.lshBucketsMulti(e, bits, tables, dim)
        .orderBy("vec_id", "tbl").collect()
      require(a.sameElements(b), s"bucket mismatch at dim=$dim")
      println(s"PROBE plansize dim=$dim buckets identical: true")
    }
    spark.stop()
  }
}
