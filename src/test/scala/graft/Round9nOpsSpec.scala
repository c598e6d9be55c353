package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Aggregates, Windows}

/** Brute-force replays for the round-9 batch-40 operators: growth
  * accounting, the power-user activity histogram, and cohort LTV
  * curves. Each recomputes the answer from the row-level definition
  * on collected sf0.001 data. */
class Round9nOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rnd(v: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  private lazy val ud = Tables.t(spark, sf, "events")
    .selectExpr("user_id", "CAST(ts AS DATE)").collect()
    .map(r => (r.getLong(0), r.getDate(1).toLocalDate)).distinct.toSeq

  test("agg_growth_accounting replays the DAU decomposition") {
    val first = ud.groupBy(_._1).view
      .mapValues(_.map(_._2.toEpochDay).min).toMap
    val activeSet = ud.map(t0 => (t0._1, t0._2.toEpochDay)).toSet
    val days = ud.map(_._2.toEpochDay)
    val allDays = (days.min to days.max + 1)
    val exp = allDays.flatMap { d0 =>
      val actives = ud.filter(_._2.toEpochDay == d0)
      val nNew = actives.count(t0 => first(t0._1) == d0).toLong
      val nRet = actives.count(t0 => activeSet((t0._1, d0 - 1))).toLong
      val nRes = actives.count(t0 =>
        first(t0._1) != d0 && !activeSet((t0._1, d0 - 1))).toLong
      val nChu = ud.filter(_._2.toEpochDay == d0 - 1)
        .count(t0 => !activeSet((t0._1, d0))).toLong
      if (actives.isEmpty && nChu == 0) None
      else Some(d0 -> (actives.length.toLong, nNew, nRet, nRes, nChu))
    }.toMap
    val got = Aggregates.aggGrowthAccounting(spark, sf).collect()
    assert(got.length == exp.size && got.nonEmpty)
    for (r <- got) {
      val d0 = r.getDate(0).toLocalDate.toEpochDay
      val (na, nn, nr, ns, nc) = exp(d0)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) == ((na, nn, nr, ns, nc)), d0.toString)
    }
  }

  test("agg_activity_histogram replays the power-user curve") {
    val perUser = ud.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val total = perUser.size.toLong
    val exp = perUser.values.groupBy(identity)
      .map { case (k, xs) => k -> xs.size.toLong }
    val got = Aggregates.aggActivityHistogram(spark, sf).collect()
    assert(got.length == exp.size && got.nonEmpty)
    for (r <- got) {
      val n = exp(r.getLong(0))
      assert(r.getLong(1) == n, r.getLong(0).toString)
      assert(r.getDouble(2) == rnd(n.toDouble / total.toDouble, 6))
    }
  }

  test("window_turning_points replays the extrema census") {
    val daily = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(ts AS DATE)").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues { xs =>
        xs.groupBy(_._2).toSeq.sortBy(_._1.toEpochDay)
          .map(_._2.size.toLong)
      }.toMap
    val got = graft.queries.Windows.windowTurningPoints(spark, sf)
      .collect()
    assert(got.length == daily.size && got.nonEmpty)
    for (r <- got) {
      val cs = daily(r.getString(0))
      val n = cs.length.toLong
      val tp = (1 until cs.length - 1).count { i =>
        (cs(i) - cs(i - 1)) * (cs(i + 1) - cs(i)) < 0
      }.toLong
      assert(r.getLong(1) == n && r.getLong(2) == tp, r.getString(0))
      val z = rnd((tp.toDouble - 2.0 * (n - 2).toDouble / 3.0)
        / math.sqrt((16 * n - 29).toDouble / 90.0), 6)
      assert(r.getDouble(3) == z, r.getString(0))
    }
  }

  test("window_seasonal_strength replays the variance decomposition") {
    val daily = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(ts AS DATE)").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues { xs =>
        xs.groupBy(_._2).toSeq.sortBy(_._1.toEpochDay)
          .map(t0 => (t0._1, t0._2.size.toLong))
      }.toMap
    val got = graft.queries.Windows.windowSeasonalStrength(spark, sf)
      .collect()
    assert(got.length == daily.size && got.nonEmpty)
    for (row <- got) {
      val cs = daily(row.getString(0))
      val interior = (3 until cs.length - 3).map { i =>
        val sum7 = (i - 3 to i + 3).map(j => cs(j)._2).sum
        (cs(i)._1.getDayOfWeek.getValue % 7 + 1, 7L * cs(i)._2 - sum7)
      }
      val n = interior.length.toLong
      val s1 = interior.map(_._2).sum
      val s2 = interior.map(t0 => t0._2 * t0._2).sum
      val byDow = interior.groupBy(_._1).view
        .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
      // identical fixed dow order 1..7 as the engine expression
      val ssb = (1 to 7).map { k =>
        byDow.get(k) match {
          case Some((nd, sr)) if nd != 0 =>
            sr.toDouble * sr.toDouble / nd.toDouble
          case _ => 0.0
        }
      }.reduceLeft(_ + _)
      val mean2 = s1.toDouble * s1.toDouble / n.toDouble
      val strength = rnd(math.max(0.0,
        (ssb - mean2) / (s2.toDouble - mean2)), 6)
      assert(row.getLong(1) == n, row.getString(0))
      assert(row.getDouble(2) == strength, row.getString(0))
    }
  }

  test("agg_diff_in_diff replays the four-cell estimator") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "user_id", "CAST(ts AS DATE)", "value")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDate(2).toLocalDate.toEpochDay,
        BigDecimal(r.getDouble(3)).setScale(4, HALF_UP)))
    val dMin = ev.map(_._3).min
    val cut = dMin + (ev.map(_._3).max - dMin) / 2
    val got = graft.queries.Aggregates.aggDiffInDiff(spark, sf).collect()
    val byType = ev.groupBy(_._1)
    assert(got.length == byType.size && got.nonEmpty)
    for (r <- got) {
      val xs = byType(r.getString(0))
      def cellOf(treat: Boolean, post: Boolean) = {
        val ys = xs.filter(t0 => (t0._2 % 2 == 0) == treat
          && (t0._3 > cut) == post)
        (ys.map(_._4).sum, ys.length.toLong)
      }
      val (st0, ct0) = cellOf(treat = true, post = false)
      val (st1, ct1) = cellOf(treat = true, post = true)
      val (sc0, cc0) = cellOf(treat = false, post = false)
      val (sc1, cc1) = cellOf(treat = false, post = true)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        == ((ct0, ct1, cc0, cc1)), r.getString(0))
      val did = rnd((st1.toDouble / ct1 - st0.toDouble / ct0)
        - (sc1.toDouble / cc1 - sc0.toDouble / cc0), 6)
      assert(r.getDouble(5) == did, r.getString(0))
    }
  }

  test("window_cohort_ltv replays the cumulative cohort curves") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("user_id", "CAST(ts AS DATE)", "value").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        BigDecimal(r.getDouble(2)).setScale(4, HALF_UP)))
    def weekStart(d0: java.time.LocalDate): java.time.LocalDate =
      d0.minusDays((d0.getDayOfWeek.getValue - 1).toLong)
    val cohort = ev.groupBy(_._1).view
      .mapValues(xs => weekStart(xs.map(_._2).min)).toMap
    val size = cohort.values.groupBy(identity)
      .map { case (k, xs) => k -> xs.size.toLong }
    val wk = ev.groupBy { case (u, d0, _) =>
      (cohort(u), (d0.toEpochDay - cohort(u).toEpochDay) / 7)
    }.view.mapValues(_.map(_._3).sum).toMap
    val exp = wk.keys.groupBy(_._1).flatMap { case (cw, ks) =>
      val ages = ks.map(_._2).toSeq.sorted
      var cum = BigDecimal(0)
      ages.map { a =>
        cum += wk((cw, a))
        (cw, a) -> rnd(cum.toDouble / size(cw).toDouble, 6)
      }
    }
    val got = Windows.windowCohortLtv(spark, sf).collect()
    assert(got.length == exp.size && got.nonEmpty)
    for (r <- got) {
      val k = (r.getDate(0).toLocalDate, r.getInt(1).toLong)
      assert(r.getLong(2) == size(k._1), k.toString)
      assert(r.getDouble(3) == exp(k), k.toString)
    }
  }
}
