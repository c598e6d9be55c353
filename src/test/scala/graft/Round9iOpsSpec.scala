package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Aggregates, Windows}

/** Brute-force replays for the round-9 batch-35 operators: the
  * capture–recapture estimators, the pooled two-proportion z, the
  * pass@5 decile histogram, and the lag-feature matrix. Each
  * recomputes the answer from the row-level definition on collected
  * sf0.001 data. */
class Round9iOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rnd(v: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  test("agg_capture_recapture replays the two-window overlap") {
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "user_id", "CAST(ts AS DATE)").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDate(2).toLocalDate.toEpochDay))
    val dMin = ev.map(_._3).min
    val dMax = ev.map(_._3).max
    val cut = dMin + (dMax - dMin) / 2
    val exp = ev.groupBy(_._1).map { case (ty, xs) =>
      val byUser = xs.groupBy(_._2).values.map { ys =>
        (if (ys.exists(_._3 == dMin)) 1L else 0L,
          if (ys.exists(_._3 == cut)) 1L else 0L)
      }
      val n1 = byUser.map(_._1).sum
      val n2 = byUser.map(_._2).sum
      val m = byUser.count(t0 => t0._1 == 1L && t0._2 == 1L).toLong
      ty -> (n1, n2, m,
        if (m == 0) null
        else rnd(n1.toDouble * n2.toDouble / m.toDouble, 6),
        rnd(((n1 + 1) * (n2 + 1)).toDouble / (m + 1).toDouble - 1.0, 6))
    }
    val got = Aggregates.aggCaptureRecapture(spark, sf).collect()
    assert(got.length == exp.size && got.nonEmpty)
    for (r <- got) {
      val (n1, n2, m, lp, ch) = exp(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((n1, n2, m)))
      assert(r.get(4) == lp && r.getDouble(5) == ch, r.getString(0))
    }
  }

  test("agg_two_proportion_z replays the pooled z closure") {
    val ev = Tables.t(spark, sf, "events")
      .select("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val exp = ev.groupBy(_._1).map { case (ty, xs) =>
      val n1 = xs.count(_._2 % 2 == 0).toLong
      val k1 = xs.count(t0 => t0._2 % 2 == 0 && t0._3 >= 50.0).toLong
      val n2 = xs.count(_._2 % 2 != 0).toLong
      val k2 = xs.count(t0 => t0._2 % 2 != 0 && t0._3 >= 50.0).toLong
      val z =
        if (k1 + k2 == 0 || k1 + k2 == n1 + n2) null
        else {
          val p = (k1 + k2).toDouble / (n1 + n2).toDouble
          rnd((k1.toDouble / n1.toDouble - k2.toDouble / n2.toDouble)
            / math.sqrt(p * (1.0 - p)
              * (1.0 / n1.toDouble + 1.0 / n2.toDouble)), 6)
        }
      ty -> (n1, k1, n2, k2, z)
    }
    val got = Aggregates.aggTwoProportionZ(spark, sf).collect()
    assert(got.length == exp.size && got.nonEmpty)
    for (r <- got) {
      val (n1, k1, n2, k2, z) = exp(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        == ((n1, k1, n2, k2)), r.getString(0))
      assert(r.get(5) == z, r.getString(0))
    }
  }

  test("agg_pass_at_k replays the 5-term estimator histogram") {
    val ev = Tables.t(spark, sf, "events")
      .select("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val exp = ev.groupBy(t0 => (t0._1, t0._2)).toSeq.flatMap {
      case ((ty, _), xs) =>
        val n = xs.length.toLong
        val c = xs.count(_._3 >= 50.0).toLong
        if (n < 5) None
        else {
          val p =
            if (n - c < 5) 1.0
            else 1.0 -
              ((n - c).toDouble / n.toDouble) *
              ((n - c - 1).toDouble / (n - 1).toDouble) *
              ((n - c - 2).toDouble / (n - 2).toDouble) *
              ((n - c - 3).toDouble / (n - 3).toDouble) *
              ((n - c - 4).toDouble / (n - 4).toDouble)
          Some((ty, math.min(9, math.floor(p * 10.0).toInt)))
        }
    }.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val got = Aggregates.aggPassAtK(spark, sf).collect()
    assert(got.length == exp.size && got.nonEmpty)
    for (r <- got)
      assert(r.getLong(2) == exp((r.getString(0), r.getInt(1))),
        s"${r.getString(0)}/${r.getInt(1)}")
  }

  test("window_lag_features replays the feature projection") {
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(ts AS DATE)").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val exp = ev.groupBy(_._1).toSeq.flatMap { case (ty, xs) =>
      val daily = xs.groupBy(_._2).map { case (d0, ys) =>
        (d0, ys.size.toLong)
      }.toSeq.sortBy(_._1.toEpochDay)
      daily.indices.map { i =>
        val lag1 = if (i >= 1) Some(daily(i - 1)._2) else None
        val lag7 = if (i >= 7) Some(daily(i - 7)._2) else None
        val ma7 = if (i >= 6)
          Some(rnd(daily.slice(i - 6, i + 1).map(_._2).sum.toDouble
            / 7.0, 6))
        else None
        ((ty, daily(i)._1), (daily(i)._2, lag1, lag7,
          lag1.map(daily(i)._2 - _), ma7))
      }
    }.toMap
    val got = Windows.windowLagFeatures(spark, sf).collect()
    assert(got.length == exp.size && got.nonEmpty)
    for (r <- got) {
      val k = (r.getString(0), r.getDate(1).toLocalDate)
      val (cnt, lag1, lag7, dod, ma7) = exp(k)
      assert(r.getLong(2) == cnt, k.toString)
      assert(Option(r.get(3)).map(_.asInstanceOf[Long]) == lag1)
      assert(Option(r.get(4)).map(_.asInstanceOf[Long]) == lag7)
      assert(Option(r.get(5)).map(_.asInstanceOf[Long]) == dod)
      assert(Option(r.get(6)).map(_.asInstanceOf[Double]) == ma7,
        k.toString)
    }
  }
}
