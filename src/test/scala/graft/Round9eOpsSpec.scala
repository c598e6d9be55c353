package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Aggregates, Graphs}
import graft.llm.TextStats

/** Brute-force replays for the round-9 batch-31 operators: lexical
  * richness constants, the 2×2 odds-ratio and Wilson CI closures,
  * the bipartite co-purchase projection, and the Lorenz decile
  * table. Each recomputes the answer from the row-level definition
  * on collected sf0.001 data — independently of both the engine's
  * decomposition and the DuckDB oracle's formulation. */
class Round9eOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Spark's ROUND(double, s): BigDecimal.valueOf (shortest repr)
    * HALF_UP — the exact engine semantics, not binary rounding. */
  private def rnd(v: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  test("text_yule_k replays the frequency-spectrum moments") {
    val docs = Tables.t(spark, sf, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val exp = docs.groupBy(_._1).map { case (lang, xs) =>
      val freq = xs.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(identity).map(_._2.length.toLong)
      val n = freq.sum
      val s2 = freq.map(c => c * c).sum
      lang -> (freq.size.toLong, n,
        rnd(1e4 * (s2 - n).toDouble / (n.toDouble * n.toDouble), 6),
        rnd((s2 - n).toDouble / (n.toDouble * (n - 1).toDouble), 9))
    }
    val got = TextStats.textYuleK(spark, sf).collect()
    assert(got.length == exp.size)
    for (r <- got) {
      val (vocab, n, k, d) = exp(r.getString(0))
      assert(r.getLong(1) == vocab && r.getLong(2) == n, r.getString(0))
      assert(r.getDouble(3) == k && r.getDouble(4) == d, r.getString(0))
    }
  }

  test("agg_odds_ratio replays the 2x2 cells and Woolf CI") {
    val ev = Tables.t(spark, sf, "events")
      .select("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val exp = ev.groupBy(_._1).map { case (ty, xs) =>
      val a = xs.count(t => t._2 % 2 == 0 && t._3 >= 50.0).toLong
      val b = xs.count(t => t._2 % 2 == 0 && t._3 < 50.0).toLong
      val c = xs.count(t => t._2 % 2 != 0 && t._3 >= 50.0).toLong
      val d = xs.count(t => t._2 % 2 != 0 && t._3 < 50.0).toLong
      val lor = math.log((a.toDouble * d.toDouble)
        / (b.toDouble * c.toDouble))
      val se = math.sqrt(1.0 / a.toDouble + 1.0 / b.toDouble
        + 1.0 / c.toDouble + 1.0 / d.toDouble)
      ty -> (a, b, c, d, rnd(lor, 6), rnd(lor - 1.96 * se, 6),
        rnd(lor + 1.96 * se, 6))
    }
    val got = Aggregates.aggOddsRatio(spark, sf).collect()
    assert(got.length == exp.size)
    for (r <- got) {
      val (a, b, c, d, lor, lo, hi) = exp(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        == ((a, b, c, d)), r.getString(0))
      assert(a > 0 && b > 0 && c > 0 && d > 0, "fixture has empty cell")
      assert(r.getDouble(5) == lor && r.getDouble(6) == lo
        && r.getDouble(7) == hi, r.getString(0))
    }
  }

  test("agg_wilson_ci replays the score-interval closure") {
    val ev = Tables.t(spark, sf, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val exp = ev.groupBy(_._1).map { case (ty, xs) =>
      val n = xs.length.toDouble
      val k = xs.count(_._2 >= 50.0).toDouble
      val p = k / n
      def bound(sign: Double): Double =
        rnd((p + 1.9208 / n + sign * 1.96 *
          math.sqrt(p * (1.0 - p) / n + 0.9604 / (n * n)))
          / (1.0 + 3.8416 / n), 6)
      ty -> (xs.length.toLong, k.toLong, bound(-1.0), bound(1.0))
    }
    val got = Aggregates.aggWilsonCi(spark, sf).collect()
    assert(got.length == exp.size)
    for (r <- got) {
      val (n, k, lo, hi) = exp(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == k, r.getString(0))
      assert(r.getDouble(3) == lo && r.getDouble(4) == hi,
        r.getString(0))
    }
  }

  test("graph_copurchase_projection replays the pair counts") {
    val li = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct.toSeq
    val exp = li.groupBy(_._1).values.toSeq.flatMap { xs =>
      val pks = xs.map(_._2)
      for (a <- pks; b <- pks if a < b) yield (a, b)
    }.groupBy(identity).map { case (p, v) => (p, v.length.toLong) }
      .toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.take(50)
    val got = Graphs.graphCopurchaseProjection(spark, sf).collect()
    assert(got.length == exp.length)
    for ((r, ((a, b), c)) <- got.zip(exp))
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((a, b, c)))
  }

  test("agg_lorenz_curve replays the decile concentration table") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val spend = Tables.t(spark, sf, "orders")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0),
        BigDecimal(r.getDouble(1)).setScale(4, HALF_UP)))
      .groupBy(_._1).map { case (ck, xs) => (ck, xs.map(_._2).sum) }
      .toSeq.sortBy { case (ck, sp) => (sp, ck) }
    val n = spend.length
    val (q, rr) = (n / 10, n % 10)
    val deciles = spend.zipWithIndex.map { case ((ck, sp), i) =>
      val rank = i + 1
      val cut = rr * (q + 1)
      val dec = if (rank <= cut) (rank + q) / (q + 1)
      else rr + (rank - cut + q - 1) / q
      (dec, sp)
    }
    val total = spend.map(_._2).sum
    val byDec = deciles.groupBy(_._1).toSeq.sortBy(_._1)
    var cum = BigDecimal(0)
    val got = Aggregates.aggLorenzCurve(spark, sf).collect()
    assert(got.length == byDec.length && got.length == 10)
    for ((r, (dec, xs)) <- got.zip(byDec)) {
      val dSpend = xs.map(_._2).sum
      cum += dSpend
      assert(r.getInt(0) == dec && r.getLong(1) == xs.length.toLong)
      assert(r.getDouble(2) == dSpend.toDouble, s"decile $dec")
      assert(r.getDouble(3)
        == rnd(cum.toDouble / total.toDouble, 6), s"decile $dec")
    }
  }
}
