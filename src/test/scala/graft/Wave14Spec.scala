package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.events.Analytics

/** Round-5 wave-14 operators: conversion funnel, day-k retention,
  * JSON property rollup.
  */
class Wave14Spec extends SparkSpec {

  private val Day = 86400000000L // epoch micros per day

  /** (user_id, epoch_us, event_type, props) → events frame with a real
    * timestamp column (timestamp_micros — timezone-proof).
    */
  private def eventsDf(rows: Seq[(Long, Long, String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "us", "event_type", "props")
      .select(col("user_id"), expr("timestamp_micros(us)").as("ts"),
        col("event_type"), col("props"))
  }

  test("funnel: stages require strict order; min-hit timestamps exact") {
    val e = eventsDf(Seq(
      // user 0: full funnel in order
      (0L, 10L, "view", "{}"), (0L, 20L, "click", "{}"),
      (0L, 30L, "purchase", "{}"),
      // user 1: purchase BEFORE click -> stage 2 only
      (1L, 10L, "view", "{}"), (1L, 15L, "purchase", "{}"),
      (1L, 20L, "click", "{}"),
      // user 2: click without view -> stage 0
      (2L, 10L, "click", "{}"), (2L, 20L, "purchase", "{}"),
      // user 3: view only
      (3L, 10L, "view", "{}"),
      // user 4: simultaneous view+click (click NOT strictly after) then
      // later click -> t2 is the later one
      (4L, 10L, "view", "{}"), (4L, 10L, "click", "{}"),
      (4L, 25L, "click", "{}")))
    val got = Analytics.funnel(e, "view", "click", "purchase").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) == ((3L, 10L, 20L, 30L)))
    assert(got(1L) == ((2L, 10L, 20L, -1L)))
    assert(got(2L) == ((0L, -1L, -1L, -1L)))
    assert(got(3L) == ((1L, 10L, -1L, -1L)))
    assert(got(4L) == ((2L, 10L, 25L, -1L)))
  }

  test("retention: cohorts by first-activity day, exact d1/d7 counts") {
    val e = eventsDf(Seq(
      // cohort day 0: user 0 returns d1 and d7; user 1 returns d2 only
      (0L, 5L, "view", "{}"), (0L, Day + 1, "view", "{}"),
      (0L, 7 * Day + 1, "view", "{}"),
      (1L, 6L, "view", "{}"), (1L, 2 * Day + 1, "view", "{}"),
      // cohort day 3: user 2 returns d1
      (2L, 3 * Day + 9L, "view", "{}"), (2L, 4 * Day + 2, "view", "{}")))
    val got = Analytics.retention(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(0L -> ((2L, 1L, 1L)), 3L -> ((1L, 1L, 0L))))
  }

  test("propsRollup: JSON extraction with missing keys ignored by aggs") {
    val e = eventsDf(Seq(
      (0L, 1L, "click", """{"k": 5}"""),
      (1L, 2L, "click", """{"k": 11}"""),
      (2L, 3L, "click", """{"other": 1}"""), // no k -> null, aggs skip
      (3L, 4L, "view", """{"k": 7}""")))
    val got = Analytics.propsRollup(e).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("click") == ((3L, 16L, 5L, 11L)))
    assert(got("view") == ((1L, 7L, 7L, 7L)))
  }
}
