package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-log analytics: ordered funnel progression, day-k retention
  * cohorts, JSON property rollups — the product-analytics queries every
  * event pipeline serves, in the engine's engine-agnostic integer
  * discipline (epoch micros / epoch days as BIGINTs, -1 sentinels instead
  * of nulls).
  */
object Analytics {

  private def us(c: String): org.apache.spark.sql.Column =
    expr(s"unix_micros(cast($c as timestamp))")

  /** Ordered three-stage funnel (stage1 → stage2 → stage3, each strictly
    * AFTER the previous stage's first hit — the conversion question "did
    * the user view, then click, then purchase, in that order?"). Output
    * per user: stage reached (0–3) and the first-hit epoch-micro
    * timestamps (−1 where never reached). First hits are min-aggregates,
    * so ties collapse deterministically.
    *
    * Scale shape: three key-partitioned conditional min-aggs chained by
    * co-partitioned joins on user_id — no window over the raw event
    * stream, no per-user event materialization.
    */
  def funnel(events: DataFrame, stage1: String, stage2: String,
             stage3: String): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"),
      us("ts").as("us"))
    val users = e.select("user_id").distinct()
    val s1 = e.where(col("event_type") === stage1)
      .groupBy("user_id").agg(min(col("us")).as("t1"))
    val s2 = e.where(col("event_type") === stage2)
      .join(s1, Seq("user_id")).where(col("us") > col("t1"))
      .groupBy("user_id").agg(min(col("us")).as("t2"))
    val s3 = e.where(col("event_type") === stage3)
      .join(s2, Seq("user_id")).where(col("us") > col("t2"))
      .groupBy("user_id").agg(min(col("us")).as("t3"))
    users
      .join(s1, Seq("user_id"), "left").join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"),
        (when(col("t3").isNotNull, 3L)
          .when(col("t2").isNotNull, 2L)
          .when(col("t1").isNotNull, 1L).otherwise(0L)).as("stage"),
        coalesce(col("t1"), lit(-1L)).as("t1"),
        coalesce(col("t2"), lit(-1L)).as("t2"),
        coalesce(col("t3"), lit(-1L)).as("t3"))
  }

  /** Day-k retention cohorts: users grouped by first-activity epoch day,
    * with the count still active exactly 1 and exactly 7 days later — the
    * growth-dashboard table. Days are integer `epoch_us div 86400000000`
    * (no calendar/timezone function crosses the gate).
    *
    * Scale shape: one distinct on (user, day), one per-user min, one
    * co-partitioned join back, two conditional sums — every shuffle keys
    * on user_id or the (small) cohort day.
    */
  def retention(events: DataFrame): DataFrame = {
    val act = events
      .select(col("user_id"), expr(
        "unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .distinct()
    val first = act.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    val flags = act.join(first, Seq("user_id"))
      .groupBy("user_id", "cohort_day")
      .agg(max(when(col("day") === col("cohort_day") + 1, 1L)
        .otherwise(0L)).as("f1"),
        max(when(col("day") === col("cohort_day") + 7, 1L)
          .otherwise(0L)).as("f7"))
    flags.groupBy("cohort_day")
      .agg(count(lit(1)).as("users"), sum(col("f1")).as("d1"),
        sum(col("f7")).as("d7"))
  }

  /** First-order event-type transition counts (the empirical Markov-chain
    * table "what do users do next?"): consecutive event pairs per user
    * under the total (ts, event_id) order, counted per (from, to) pair.
    *
    * Scale shape: ONE key-partitioned window (lead over user_id — state is
    * one user's ordered events, never the global stream) + one
    * map-side-combinable pair count.
    */
  def transitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        us("ts").as("us"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Second-order (trigram) transition counts — the 2nd-order Markov table
    * behind sequence models of user behaviour: (t1, t2, t3) for every
    * consecutive event triple per user, ordered by (ts, event_id) like
    * [[transitions]]. Two leads over the SAME key-partitioned window — one
    * shuffle on user_id, per-user state only.
    */
  def transitions2(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        us("ts").as("us"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .where(col("t3").isNotNull)
      .groupBy(col("event_type").as("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
  }

  /** DAU / trailing-7-day WAU stickiness per day, in exact ppm integers.
    * The WAU window is spelled as a bounded 7-row fan-out (each active
    * (day, user) contributes to the windows of day..day+6) instead of a
    * `BETWEEN` range join — a broadcast-nested-loop plan at scale, this
    * never is. Days are integer epoch days; windows with zero activity
    * don't exist by construction (wau ≥ dau ≥ 1, so the ppm div is safe).
    */
  def stickiness(events: DataFrame): DataFrame = {
    val du = events
      .select(col("user_id"), expr(
        "unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .distinct()
    val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(sequence(col("day"),
        col("day") + lit(6L))).as("wday"), col("user_id"))
      .distinct()
      .groupBy(col("wday").as("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        expr("dau * 1000000 div wau").as("stickiness_ppm"))
  }

  /** JSON property rollup: the typed-extraction path over a JSON string
    * column (`get_json_object` — codegen'd, no UDF) aggregated per event
    * type. The DuckDB twin uses its native json extension; both engines
    * agree because the extracted field is an integer.
    */
  def propsRollup(events: DataFrame, path: String = "$.k"): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), path).cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"))

  /** Empirical-Markov-chain stationary distribution over event types, by
    * fixed-k power iteration in exact integer micro-units: starting from a
    * uniform 1 000 000 µu per type, each step routes
    * `(p(i)·c(i,j)) div rowsum(i)` µu along every observed transition —
    * the floor division is applied PER TERM in both engines (Spark `div`
    * on non-negatives ≡ DuckDB `//`), so the whole trajectory is
    * integer-exact. Types with no outgoing transitions leak their mass
    * (dangling states — documented, matching the plain power iteration
    * without a teleport term). Output after k steps: (event_type, weight).
    *
    * Scale shape: the transition matrix is a ≤|types|² aggregate of
    * [[transitions]] (one user-keyed window + one pair count); the k
    * iteration steps are broadcast joins over that tiny table — all the
    * data-scale work is in the derivation, exactly where it should be.
    */
  def markovStationary(events: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"need at least one step, got $iters")
    val c = transitions(events).localCheckpoint(true)
    val rs = c.groupBy("from_type").agg(sum(col("n")).as("rs"))
    val cr = broadcast(c.join(rs, "from_type"))
    val types = events.select(col("event_type")).distinct()
      .localCheckpoint(true)
    var p = types.select(col("event_type"), lit(1000000L).as("w"))
    for (_ <- 1 to iters) {
      val routed = p
        .join(cr, p("event_type") === cr("from_type"))
        .groupBy(col("to_type"))
        .agg(sum(expr("(w * n) div rs")).as("nw"))
      p = types
        .join(routed, types("event_type") === routed("to_type"), "left")
        .select(types("event_type"), coalesce(col("nw"), lit(0L)).as("w"))
    }
    p
  }
}
