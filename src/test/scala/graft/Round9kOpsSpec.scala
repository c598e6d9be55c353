package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Aggregates, Graphs, SourceFormats, Windows}

/** Brute-force replays for the round-9 batch-37 operators: global
  * transitivity, session-level rollup, the rescaled-range statistic,
  * and the schema-drift report. Each recomputes the answer from the
  * row-level definition on collected sf0.001 data. */
class Round9kOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rnd(v: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  test("graph_clustering_coefficient replays global transitivity") {
    val edges = BruteKnn.undirectedEdges(spark, sf)
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val deg = adj.map { case (k, v) => k -> v.size.toLong }
    val wedges = deg.values.map(d0 => d0 * (d0 - 1) / 2).sum
    // Σ_edges |N(u) ∩ N(v)| counts each triangle once per edge = 3T
    val tri = edges.toSeq
      .map { case (u, v) => (adj(u) & adj(v)).size }.sum / 3
    val got = Graphs.graphClusteringCoefficient(spark, sf).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == deg.size.toLong)
    assert(r.getLong(1) == edges.size.toLong)
    assert(r.getLong(2) == wedges)
    assert(r.getLong(3) == tri.toLong)
    assert(r.getDouble(4)
      == rnd(3.0 * tri.toDouble / wedges.toDouble, 6))
  }

  test("agg_session_stats replays the island rollup and median") {
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_id", "unix_micros(ts)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (u, xs) =>
      val sorted = xs.sortBy(t0 => (t0._3, t0._2))
      val sids = sorted.zipWithIndex.scanLeft(0L) {
        case (sid, ((_, _, us), i)) =>
          if (i == 0 || us - sorted(i - 1)._3 > 1800000000L) sid + 1
          else sid
      }.tail
      sorted.zip(sids).groupBy(_._2).values.map { ys =>
        val uss = ys.map(_._1._3)
        (u, ys.head._2, ys.size.toLong, uss.max - uss.min)
      }
    }
    val nS = sessions.length.toLong
    val nE = sessions.map(_._3).sum
    val ordered = sessions.sortBy(t0 => (t0._4, t0._1, t0._2))
      .map(_._4)
    val dLo = ordered(((nS + 1) / 2 - 1).toInt)
    val dHi = ordered((nS / 2).toInt)
    val got = Aggregates.aggSessionStats(spark, sf).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == nS && r.getLong(1) == nE)
    assert(r.getDouble(2) == rnd(nE.toDouble / nS.toDouble, 6))
    assert(r.getDouble(3)
      == rnd((dLo + dHi) / 2.0 / 1e6, 6))
  }

  test("window_rescaled_range replays the prefix-deviation range") {
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(ts AS DATE)").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val exp = ev.groupBy(_._1).map { case (ty, xs) =>
      val cs = xs.groupBy(_._2).toSeq
        .sortBy(_._1.toEpochDay).map(_._2.size.toLong)
      val n = cs.length.toLong
      val s1 = cs.sum
      val s2 = cs.map(c => c * c).sum
      val prefixes = cs.scanLeft(0L)((acc, c) => acc + (n * c - s1)).tail
      val pMax = math.max(prefixes.max, 0L)
      val pMin = math.min(prefixes.min, 0L)
      ty -> (n, pMax - pMin,
        rnd((pMax - pMin).toDouble
          / math.sqrt((n * s2 - s1 * s1).toDouble), 6))
    }
    val got = Windows.windowRescaledRange(spark, sf).collect()
    assert(got.length == exp.size && got.nonEmpty)
    for (r <- got) {
      val (n, rn, rs) = exp(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == rn, r.getString(0))
      assert(r.getDouble(3) == rs, r.getString(0))
    }
  }

  test("ingest_schema_drift_report replays the presence audit") {
    val keys = Tables.t(spark, sf, "orders")
      .select("o_orderkey").collect().map(_.getLong(0))
    val nA = keys.count(_ % 2 == 0).toLong
    val nB = keys.count(_ % 2 == 1).toLong
    val exp = Map(
      ("a", "o_orderkey") -> (nA, nA, true),
      ("a", "o_totalprice") -> (nA, nA, true),
      ("a", "o_orderstatus") -> (nA, 0L, false),
      ("b", "o_orderkey") -> (nB, nB, true),
      ("b", "o_totalprice") -> (nB, nB, true),
      ("b", "o_orderstatus") -> (nB, nB, true))
    val got = SourceFormats.ingestSchemaDriftReport(spark, sf).collect()
    assert(got.length == 6)
    for (r <- got) {
      val (n, nn, p) = exp((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == n && r.getLong(3) == nn
        && r.getBoolean(4) == p, s"${r.getString(0)}/${r.getString(1)}")
    }
  }
}
