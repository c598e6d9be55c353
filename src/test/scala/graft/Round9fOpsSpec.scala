package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Aggregates, Scans, Windows}
import graft.llm.{Curation, Multimodal}

/** Brute-force replays for the round-9 batch-32 operators: the dHash
  * gradient bits, the τ-thresholded DP histogram, candidate-FD
  * verification, the Friedman rank test, and the rolling Theil–Sen
  * median slope. Each recomputes the answer from the row-level
  * definition on collected sf0.001 data — independently of both the
  * engine's decomposition and the DuckDB oracle's formulation. */
class Round9fOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rnd(v: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("multimodal_dhash replays the adjacent-cell gradient bits") {
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.length >= 33)
    val exp = docs.map { case (id, tx) =>
      val px = (1 to 33).map(i => tx.charAt(i - 1).toInt)
      val bits = (1 to 32)
        .map(i => if (px(i) > px(i - 1)) '1' else '0').mkString
      (id, bits)
    }.groupBy(_._2).map { case (b, xs) =>
      b -> (xs.map(_._1).min, xs.length.toLong)
    }
    val got = Multimodal.multimodalDhash(spark, sf).collect()
    assert(got.length == exp.size)
    for (r <- got) {
      val (rep, n) = exp(r.getString(0))
      assert(r.getLong(1) == rep && r.getLong(2) == n, r.getString(0))
    }
  }

  test("privacy_dp_histogram replays seeded noise and the threshold") {
    val ev = Tables.t(spark, sf, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) / 5.0).toLong))
    val exp = ev.groupBy(identity).flatMap { case ((ty, b), xs) =>
      val seed = java.lang.Long.parseLong(
        md5hex(s"dph|$ty|$b").substring(0, 6), 16)
      val u = (seed.toDouble + 0.5) / 16777216.0
      val noise = (if (u >= 0.5) -1.0 else 1.0) *
        math.log(1.0 - 2.0 * math.abs(u - 0.5))
      val noisy = rnd(xs.size.toDouble + noise, 6)
      if (noisy > 10.0) Some((ty, b) -> noisy) else None
    }
    val got = Curation.privacyDpHistogram(spark, sf).collect()
    assert(got.length == exp.size && got.nonEmpty)
    for (r <- got)
      assert(r.getDouble(2) == exp((r.getString(0), r.getLong(1))),
        s"${r.getString(0)}/${r.getLong(1)}")
  }

  test("profile_functional_deps replays the candidate verdicts") {
    def check[A, B](pairs: Seq[(A, B)]): (Long, Long, Long) = {
      val m = pairs.distinct.groupBy(_._1)
        .map { case (_, xs) => xs.map(_._2).distinct.length.toLong }
      (m.size.toLong, m.count(_ > 1).toLong, m.max)
    }
    val part = Tables.t(spark, sf, "part")
      .select("p_brand", "p_type", "p_partkey", "p_name").collect()
    val exp = Map(
      ("part", "p_brand") ->
        check(part.toSeq.map(r => (r.getString(0), r.getString(1)))),
      ("part", "p_partkey") ->
        check(part.toSeq.map(r => (r.getLong(2), r.getString(3)))),
      ("orders", "o_custkey") -> check(
        Tables.t(spark, sf, "orders")
          .select("o_custkey", "o_orderpriority").collect().toSeq
          .map(r => (r.getLong(0), r.getString(1)))),
      ("events", "user_id") -> check(
        Tables.t(spark, sf, "events")
          .select("user_id", "event_type").collect().toSeq
          .map(r => (r.getLong(0), r.getString(1)))),
      ("documents", "doc_id") -> check(
        Tables.t(spark, sf, "documents")
          .select("doc_id", "lang").collect().toSeq
          .map(r => (r.getLong(0), r.getString(1)))))
    val got = Scans.profileFunctionalDeps(spark, sf).collect()
    assert(got.length == exp.size)
    for (r <- got) {
      val (nd, nv, mx) = exp((r.getString(0), r.getString(1)))
      assert(r.getLong(3) == nd && r.getLong(4) == nv
        && r.getLong(5) == mx, s"${r.getString(0)}.${r.getString(1)}")
      assert(r.getBoolean(6) == (nv == 0L))
    }
  }

  test("agg_friedman_test replays complete-block ranks and chi2") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(ts AS DATE)", "value").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate,
        BigDecimal(r.getDouble(2)).setScale(4, HALF_UP)))
    val k = ev.map(_._1).distinct.length
    val cells = ev.groupBy(t0 => (t0._2, t0._1))
      .map { case ((day, ty), xs) => (day, ty, xs.map(_._3).sum) }
    val blocks = cells.groupBy(_._1).filter(_._2.size == k)
    val ranks = blocks.toSeq.flatMap { case (_, xs) =>
      xs.toSeq.sortBy(t0 => (t0._3, t0._2)).zipWithIndex
        .map { case ((_, ty, _), i) => (ty, (i + 1).toLong) }
    }
    val rSums = ranks.groupBy(_._1)
      .map { case (ty, xs) => ty -> (xs.length.toLong, xs.map(_._2).sum) }
    val sumR2 = rSums.values.map(t0 => t0._2 * t0._2).sum
    val got = Aggregates.aggFriedmanTest(spark, sf).collect()
    assert(got.length == rSums.size && got.nonEmpty)
    for (r <- got) {
      val (n, rs) = rSums(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == rs, r.getString(0))
      val chi2 = rnd(12.0 * sumR2.toDouble
        / (n.toDouble * k.toDouble * (k + 1).toDouble)
        - 3.0 * n.toDouble * (k + 1).toDouble, 6)
      assert(r.getDouble(3) == chi2, r.getString(0))
    }
  }

  test("window_theil_sen replays the trailing median slopes") {
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(ts AS DATE)").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val daily = ev.groupBy(identity)
      .map { case ((ty, day), xs) =>
        (ty, day.toEpochDay, xs.size.toLong)
      }.toSeq
    val exp = daily.flatMap { case (ty, dd, cnt) =>
      val slopes = daily
        .filter(t0 => t0._1 == ty && dd - t0._2 >= 1 && dd - t0._2 <= 6)
        .map(t0 => (cnt - t0._3).toDouble / (dd - t0._2).toDouble)
        .sorted
      if (slopes.isEmpty) None
      else {
        val m = slopes.length
        val med = (slopes((m + 1) / 2 - 1) + slopes(m / 2)) / 2.0
        Some((ty, dd) -> (m.toLong, rnd(med, 6)))
      }
    }.toMap
    val got = Windows.windowTheilSen(spark, sf).collect()
    assert(got.length == exp.size && got.nonEmpty)
    for (r <- got) {
      val key = (r.getString(0), r.getDate(1).toLocalDate.toEpochDay)
      val (m, med) = exp(key)
      assert(r.getLong(2) == m && r.getDouble(3) == med, key.toString)
    }
  }
}
