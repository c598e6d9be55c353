package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Aggregates
import graft.llm.Curation

/** Brute-force replays for the round-9 batch-34 operators: Cochran's
  * Q over extreme-day indicators, McNemar on paired rule decisions,
  * Tukey-fence outlier census, the Poisson dispersion index, and
  * prime-step systematic sampling. Each recomputes the answer from
  * the row-level definition on collected sf0.001 data. */
class Round9hOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rnd(v: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  test("agg_cochran_q replays the complete-block binary moments") {
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(ts AS DATE)", "value").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate,
        r.getDouble(2)))
    val k = ev.map(_._1).distinct.length
    // round-10 indicator: the type ran above its average daily volume
    val typeTotals = ev.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val typeDays = ev.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.size.toLong).toMap
    val cells = ev.groupBy(t0 => (t0._2, t0._1))
      .map { case ((day, ty), xs) =>
        (day, ty,
          if (typeDays(ty) * xs.size > typeTotals(ty)) 1L else 0L)
      }
    val blocks = cells.groupBy(_._1).filter(_._2.size == k)
    val rs = blocks.values.map(_.map(_._3).sum).toSeq
    val (sumR, sumR2) = (rs.sum, rs.map(r => r * r).sum)
    val cj = blocks.values.flatten.groupBy(_._2)
      .map { case (ty, xs) => ty -> (xs.size.toLong, xs.map(_._3).sum) }
    val sumC2 = cj.values.map(t0 => t0._2 * t0._2).sum
    val q =
      if (k * sumR - sumR2 == 0) null
      else rnd((k - 1).toDouble
        * (k.toDouble * sumC2.toDouble - sumR.toDouble * sumR.toDouble)
        / (k.toDouble * sumR.toDouble - sumR2.toDouble), 6)
    val got = Aggregates.aggCochranQ(spark, sf).collect()
    assert(got.length == cj.size && got.nonEmpty)
    for (r <- got) {
      val (n, c) = cj(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == c, r.getString(0))
      assert(r.get(3) == q, r.getString(0))
    }
  }

  test("agg_mcnemar_test replays the paired-rule cells") {
    val stop = Set("the", "a", "of", "and", "to", "in")
    val preds = Tables.t(spark, sf, "documents")
      .select("text").collect().map(_.getString(0)).map { tx =>
        val toks = tx.split(" ", -1)
        (toks.count(stop.contains).toDouble / toks.length > 0.05,
          toks.contains("the"))
      }
    val nb = preds.count(p => p._1 && p._2).toLong
    val b = preds.count(p => p._1 && !p._2).toLong
    val c = preds.count(p => !p._1 && p._2).toLong
    val nn = preds.count(p => !p._1 && !p._2).toLong
    val got = Aggregates.aggMcnemarTest(spark, sf).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((nb, b, c, nn)))
    val chi2 = if (b + c == 0) null
    else rnd((b - c).toDouble * (b - c).toDouble / (b + c).toDouble, 6)
    assert(r.get(4) == chi2)
  }

  test("agg_tukey_outliers replays quartile picks and the census") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val ev = Tables.t(spark, sf, "events")
      .select("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(4, HALF_UP)))
    val exp = ev.groupBy(_._1).map { case (ty, xs) =>
      val sorted = xs.sortBy(t0 => (t0._3, t0._2)).map(_._3)
      val n = sorted.length
      val q1 = sorted((n + 3) / 4 - 1)
      val q3 = sorted((3 * n + 3) / 4 - 1)
      val (q1d, q3d) = (q1.toDouble, q3.toDouble)
      val lo = q1d - 1.5 * (q3d - q1d)
      val hi = q3d + 1.5 * (q3d - q1d)
      ty -> (n.toLong, q1d, q3d,
        sorted.count(_.toDouble < lo).toLong,
        sorted.count(_.toDouble > hi).toLong)
    }
    val got = Aggregates.aggTukeyOutliers(spark, sf).collect()
    assert(got.length == exp.size && got.nonEmpty)
    for (r <- got) {
      val (n, q1, q3, nl, nh) = exp(r.getString(0))
      assert(r.getLong(1) == n, r.getString(0))
      assert(r.getDouble(2) == q1 && r.getDouble(3) == q3,
        r.getString(0))
      assert(r.getLong(4) == nl && r.getLong(5) == nh, r.getString(0))
    }
  }

  test("agg_dispersion_index replays the daily-count moments") {
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(ts AS DATE)").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val exp = ev.groupBy(_._1).map { case (ty, xs) =>
      val cs = xs.groupBy(_._2).values.map(_.size.toLong).toSeq
      val (n, s1, s2) = (cs.length.toLong, cs.sum, cs.map(c => c * c).sum)
      ty -> (n, s1,
        rnd((n.toDouble * s2.toDouble - s1.toDouble * s1.toDouble)
          / ((n - 1).toDouble * s1.toDouble), 6),
        n * s2 - s1 * s1 > (n - 1) * s1)
    }
    val got = Aggregates.aggDispersionIndex(spark, sf).collect()
    assert(got.length == exp.size && got.nonEmpty)
    for (r <- got) {
      val (n, s1, disp, over) = exp(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == s1, r.getString(0))
      assert(r.getDouble(3) == disp && r.getBoolean(4) == over,
        r.getString(0))
    }
  }

  test("sample_systematic replays the prime-step picks") {
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("event_id", "unix_micros(ts)").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, us) => (us, id) }
    val exp = ev.zipWithIndex.collect {
      case ((id, us), i) if i % 997 == 0 =>
        ((i / 997).toLong, id, us)
    }
    val got = Curation.sampleSystematic(spark, sf).collect()
    assert(got.length == exp.length && got.nonEmpty)
    for ((r, (p, id, us)) <- got.zip(exp))
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((p, id, us)))
  }
}
