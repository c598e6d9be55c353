package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamQueries

/** Exact Scala replay of the throttle recurrence (emit iff ≥30 min
  * since the last EMITTED event, per user, in event-time order)
  * against the transformWithState implementation on sf0.001 — the
  * sequential-state semantics no window composition can express.
  */
class ThrottleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("stream_throttle_state matches the sequential replay exactly") {
    import org.apache.spark.sql.functions._
    val gapUs = 30L * 60 * 1000000L
    val events = Tables.t(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = events.groupBy(_._1).map { case (u, xs) =>
      var last = Long.MinValue
      var n = 0L
      xs.sortBy(x => (x._2, x._3)).foreach { case (_, ts, _) =>
        if (last == Long.MinValue || ts - last >= gapUs) {
          n += 1; last = ts
        }
      }
      u -> n
    }
    val got = StreamQueries.streamThrottleState(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"diff=${(got.toSet diff expected.toSet) ++ (expected.toSet diff got.toSet)}")
    // throttle emits no more than gap-debounce's island count + drift
    // re-emissions, and at least one per active user
    assert(got.values.forall(_ >= 1))
  }
}
