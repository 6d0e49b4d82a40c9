package graft

import graft.functions.Cardinality

/** Error gate for the HLL++ sketch path against the exact distinct agg on
  * the driver's events table: rsd 0.01 must land within 2% per group.
  */
class CardinalitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("approxDistinct within 2% of exactDistinct per event_type at sf0.01") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val exact = Cardinality.exactDistinct(ev, "event_type", "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Cardinality.approxDistinct(ev, "event_type", "user_id", 0.01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet === approx.keySet && exact.nonEmpty)
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k) - n).toDouble / n
      info(f"$k: exact $n approx ${approx(k)} err ${err * 100}%.2f%%")
      assert(err <= 0.02, s"$k: err $err above 2%")
    }
  }
}
