package graft

import org.scalatest.funsuite.AnyFunSuite

/** Streaming state-size lint (round-13 directive #4): planted
  * violations of each [[graft.streaming.StreamLint]] rule must be
  * flagged, the bounded forms must pass, and the real `stream_*`
  * builders — which run every stream through the enforcing memory-sink
  * driver — must still complete (the enforcement path is exercised on
  * EVERY stream run, not just here). */
class StreamStateLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  import org.apache.spark.sql.functions._
  import graft.streaming.StreamLint

  private def rateStream = spark.readStream.format("rate")
    .option("rowsPerSecond", "1").load()

  private def lint(df: org.apache.spark.sql.Dataset[_]): Seq[String] =
    StreamLint.failures(df.queryExecution.analyzed)

  test("planted flatMapGroupsWithState without timeout is flagged") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def planted(timeout: GroupStateTimeout) = rateStream
      .withWatermark("timestamp", "1 minute")
      .select(col("value").as[Long])
      .groupByKey(_ % 10)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update(), timeout) {
        (k: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator((k, n))
      }
    val bad = lint(planted(GroupStateTimeout.NoTimeout()))
    assert(bad.exists(_.contains("NoTimeout")), bad.mkString("; "))
    val good = lint(planted(GroupStateTimeout.EventTimeTimeout()))
    assert(good.isEmpty, good.mkString("; "))
  }

  test("planted unwatermarked streaming dedup and grouped agg are flagged") {
    val dedup = lint(rateStream.dropDuplicates("value"))
    assert(dedup.exists(_.contains("dropDuplicates")), dedup.mkString("; "))
    val agg = lint(rateStream.groupBy(col("value") % 100)
      .agg(count(lit(1))))
    assert(agg.exists(_.contains("grouped aggregate")), agg.mkString("; "))
    // bounded forms pass: watermarked dedup; calendar-bounded window
    // grouping; scalar aggregate
    assert(lint(rateStream.withWatermark("timestamp", "1 minute")
      .dropDuplicatesWithinWatermark("value")).isEmpty)
    assert(lint(rateStream.groupBy(window(col("timestamp"), "1 hour"))
      .agg(count(lit(1)))).isEmpty)
    assert(lint(rateStream.agg(count(lit(1)))).isEmpty)
  }

  test("planted unwatermarked stream-stream join is flagged") {
    val l = rateStream.select(col("value").as("k"), col("timestamp").as("lts"))
    val r = rateStream.select(col("value").as("k"), col("timestamp").as("rts"))
    val bad = lint(l.join(r, "k"))
    assert(bad.exists(_.contains("stream-stream join")), bad.mkString("; "))
    val goodL = rateStream.withWatermark("timestamp", "1 minute")
      .select(col("value").as("k"), col("timestamp").as("lts"))
    val goodR = rateStream.withWatermark("timestamp", "1 minute")
      .select(col("value").as("k"), col("timestamp").as("rts"))
    assert(lint(goodL.join(goodR, "k")).isEmpty)
  }

  test("bounded stateful builders still run through the enforcing driver") {
    // the three keys whose state story round 13 re-cut: event-time
    // timeout (fmgws), processing-time TTL (transformWithState x2)
    val counts = graft.streaming.StreamQueries
      .streamStatefulCounter(spark, sf).collect()
    assert(counts.nonEmpty)
    // final emission per key still equals the batch total (the oracle
    // contract the timeout re-cut must not disturb)
    val batch = graft.Tables.t(spark, sf, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.map(r => r.getLong(0) -> r.getLong(1)).toMap == batch)
    val maxes = graft.streaming.StreamQueries
      .streamTransformWithState(spark, sf).collect()
    assert(maxes.nonEmpty)
    val throttled = graft.streaming.StreamQueries
      .streamThrottleState(spark, sf).collect()
    assert(throttled.nonEmpty)
  }
}
