package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Aggregates, Windows}

/** Brute-force replays for the round-9 batch-39 operators: Apdex,
  * MTBF/MTTR, and the SLO burn-down. Each recomputes the answer from
  * the row-level definition on collected sf0.001 data. */
class Round9mOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rnd(v: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  test("agg_apdex replays the half-weight integer ratio") {
    val ev = Tables.t(spark, sf, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val exp = ev.groupBy(_._1).map { case (ty, xs) =>
      val n = xs.length.toLong
      val sat = xs.count(_._2 <= 25.0).toLong
      val tol = xs.count(t0 => t0._2 > 25.0 && t0._2 <= 100.0).toLong
      ty -> (n, sat, tol,
        rnd((2 * sat + tol).toDouble / (2 * n).toDouble, 6))
    }
    val got = Aggregates.aggApdex(spark, sf).collect()
    assert(got.length == exp.size && got.nonEmpty)
    for (r <- got) {
      val (n, sat, tol, a) = exp(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((n, sat, tol)))
      assert(r.getDouble(4) == a, r.getString(0))
    }
  }

  test("agg_mtbf_mttr replays gaps and recovery lookups") {
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type",
        "unix_micros(ts)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val byUser = ev.groupBy(_._1).view.mapValues(
      _.sortBy(t0 => (t0._4, t0._2))).toMap
    var (nErr, nRec, ttr) = (0L, 0L, 0L)
    var (nGaps, gaps) = (0L, 0L)
    for ((_, xs) <- byUser) {
      val errs = xs.filter(_._3 == "error")
      nErr += errs.length
      for (i <- 1 until errs.length) {
        nGaps += 1; gaps += errs(i)._4 - errs(i - 1)._4
      }
      for ((_, id, _, us) <- errs) {
        val idx = xs.indexWhere(t0 => t0._2 == id && t0._4 == us)
        val nxt = xs.drop(idx + 1).filter(_._3 != "error")
          .map(_._4).minOption
        nxt.foreach { v => nRec += 1; ttr += v - us }
      }
    }
    val got = Aggregates.aggMtbfMttr(spark, sf).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2))
      == ((nErr, nRec, nGaps)))
    assert(r.getDouble(3) == rnd(gaps.toDouble / nGaps.toDouble / 1e6, 6))
    assert(r.getDouble(4) == rnd(ttr.toDouble / nRec.toDouble / 1e6, 6))
  }

  test("window_slo_burn replays the budget burn-down") {
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("CAST(ts AS DATE)", "event_type").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getString(1)))
    val daily = ev.groupBy(_._1).toSeq.sortBy(_._1.toEpochDay)
      .map { case (d0, xs) =>
        (d0, xs.length.toLong, xs.count(_._2 == "error").toLong)
      }
    val periodTotal = daily.map(_._2).sum
    var cum = 0L
    val got = Windows.windowSloBurn(spark, sf).collect()
    assert(got.length == daily.length && got.nonEmpty)
    for ((r, (d0, tot, err)) <- got.zip(daily)) {
      cum += err
      assert(r.getDate(0).toLocalDate == d0)
      assert(r.getLong(1) == tot && r.getLong(2) == err)
      assert(r.getDouble(3)
        == rnd(err.toDouble / tot.toDouble / 0.01, 6))
      assert(r.getDouble(4)
        == rnd(cum.toDouble / (0.01 * periodTotal.toDouble), 6))
    }
  }
}
