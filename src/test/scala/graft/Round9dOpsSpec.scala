package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Aggregates, Windows}
import graft.llm.{Dedup, Ranking}

/** Brute-force replays for the round-9 batch-20 operators: the
  * day-peak concurrency sweep, split-conformal coverage, Kneser-Ney
  * bigram smoothing, and SemDeDup cell-representative pruning. Each
  * recomputes the answer from the row-level definition on collected
  * sf0.001 data — independently of both the engine's decomposition
  * and the DuckDB oracle's formulation. */
class Round9dOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("window_max_concurrency replays the session sweep day peaks") {
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts)", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val deltas = ev.groupBy(_._1).values.flatMap { rows =>
      val ts = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val sessions = ts.foldLeft(List.empty[(Long, Long)]) {
        case (acc, us) => acc match {
          case (st, en) :: rest if us - en <= 1800L * 1000000L =>
            (st, us) :: rest
          case _ => (us, us) :: acc
        }
      }
      sessions.flatMap { case (st, en) => Seq((st, 1), (en, -1)) }
    }.toSeq
    var run = 0L
    val byDay = scala.collection.mutable.Map[Long, (Long, Long)]()
    for ((us, dl) <- deltas.sortBy { case (us, dl) => (us, -dl) }) {
      run += dl
      val day = us / 86400000000L
      val (p, n) = byDay.getOrElse(day, (Long.MinValue, 0L))
      byDay(day) = (math.max(p, run), n + 1)
    }
    val got = Windows.windowMaxConcurrency(spark, sf).collect()
    assert(got.length == byDay.size)
    for (r <- got) {
      val day = r.getDate(0).toLocalDate.toEpochDay
      assert((r.getLong(1), r.getLong(2)) == byDay(day), s"day $day")
    }
  }

  test("agg_conformal_interval replays split-conformal coverage") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "unix_micros(ts)", "value").collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(4, HALF_UP)))
    val got = Aggregates.aggConformalInterval(spark, sf).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val ty = r.getString(0)
      val rows = ev.filter(_._1 == ty)
      val cal = rows.filter(t => (t._2 / 86400000000L) % 5 < 4)
        .map(_._3).sorted
      val hold = rows.filterNot(t => (t._2 / 86400000000L) % 5 < 4)
        .map(_._3)
      val n = cal.length
      val med = cal((n + 1) / 2 - 1)
      val resid = cal.map(v => (v - med).abs).sorted
      val kq = math.min(((n + 1) * 9 + 9) / 10, n)
      val q = resid(kq.toInt - 1)
      val nCov = hold.count(v => (v - med).abs <= q)
      assert(r.getLong(1) == n.toLong, s"$ty n_cal")
      assert(r.getDouble(2) == med.toDouble, s"$ty med")
      assert(r.getDouble(3) == q.toDouble, s"$ty q")
      assert(r.getLong(4) == hold.length.toLong, s"$ty n_hold")
      assert(r.getLong(5) == nCov.toLong, s"$ty n_covered")
      assert(math.abs(r.getDouble(6) -
        nCov.toDouble / hold.length) < 1e-6, s"$ty coverage")
    }
  }

  test("text_kneser_ney replays the interpolated-KN formula") {
    val docs = Tables.t(spark, sf, "documents")
      .select("text").collect().map(_.getString(0).split(" ", -1))
    val bigrams = docs.filter(_.length >= 2)
      .flatMap(t => t.dropRight(1).zip(t.drop(1)))
    val c2 = bigrams.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val c1 = c2.groupBy(_._1._1).view
      .mapValues(m => (m.values.sum, m.size.toLong)).toMap
    val nbw = c2.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val nTypes = c2.size.toLong
    val head = c2.toSeq
      .sortBy { case ((p, c), n) => (-n, p, c) }.take(20)
    val got = Ranking.textKneserNey(spark, sf).collect()
    assert(got.length == head.length)
    for ((r, ((p, c), n)) <- got.zip(head)) {
      val (c1v, nfw) = c1(p)
      assert(r.getString(0) == p && r.getString(1) == c)
      assert(r.getLong(2) == n && r.getLong(3) == c1v &&
        r.getLong(4) == nfw && r.getLong(5) == nbw(c) &&
        r.getLong(6) == nTypes)
      val pkn = (math.max(n - 0.75, 0d) +
        0.75 * (nfw.toDouble * nbw(c).toDouble / nTypes.toDouble)) / c1v
      assert(math.abs(r.getDouble(7) - pkn) < 1e-6, s"($p,$c)")
    }
  }

  test("embedding_isotropy replays the concentration ratio") {
    val em = Tables.t(spark, sf, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => BigDecimal(x.toDouble * 1000000d)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray)
    val n = em.length
    val dim = em.head.length
    val sumNorm2 = em.map(v => v.map(x => x * x).sum).sum
    val dimSums = (0 until dim).map(j => em.map(_(j)).sum)
    val ns2 = dimSums.map(s => BigInt(s) * BigInt(s)).sum
    val got = graft.llm.Similarity.embeddingIsotropy(spark, sf).collect()
    assert(got.length == 1)
    val r = got(0)
    // sum_norm2 is emitted as the nearest double of the exact
    // DECIMAL(38,0) sum (round 14 — a BIGINT output wraps at corpus
    // scale); at fixture scale the value is < 2^53 so it is exact
    assert(r.getLong(0) == n.toLong && r.getDouble(1) == sumNorm2.toDouble)
    assert(r.getDouble(2) == BigDecimal(ns2).toDouble)
    val conc = BigDecimal(ns2).toDouble / (n.toDouble * sumNorm2.toDouble)
    assert(math.abs(r.getDouble(3) - conc) < 1e-6)
  }

  test("agg_mean_excess replays the p95 tail summary") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0),
        BigDecimal(r.getDouble(1)).setScale(4, HALF_UP)))
    val got = Aggregates.aggMeanExcess(spark, sf).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val vs = ev.filter(_._1 == r.getString(0)).map(_._2).sorted
      val n = vs.length
      val u = vs((n * 19 + 19) / 20 - 1)
      val exc = vs.filter(_ > u).map(_ - u)
      assert(r.getLong(1) == n.toLong && r.getDouble(2) == u.toDouble)
      assert(r.getLong(3) == exc.length.toLong)
      assert(math.abs(r.getDouble(4) -
        exc.sum.toDouble / exc.length) < 1e-6)
      assert(r.getDouble(5) == exc.max.toDouble)
    }
  }

  test("agg_cvm_test replays the pooled-EDF squared-gap sum") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "value").collect()
      .filter(r => Set("view", "purchase")(r.getString(0)))
      .map(r => (r.getString(0),
        BigDecimal(r.getDouble(1)).setScale(4, HALF_UP)))
    val n1 = ev.count(_._1 == "view").toLong
    val n2 = ev.length - n1
    var cum1 = 0L; var cum2 = 0L; var s = BigInt(0)
    for (v <- ev.map(_._2).distinct.sorted) {
      val c1 = ev.count(t => t._1 == "view" && t._2 == v).toLong
      val c2 = ev.count(t => t._1 != "view" && t._2 == v).toLong
      cum1 += c1; cum2 += c2
      val dGap = cum1 * n2 - cum2 * n1
      s += BigInt(c1 + c2) * BigInt(dGap) * BigInt(dGap)
    }
    val got = Aggregates.aggCvmTest(spark, sf).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(r.getDouble(2) == BigDecimal(s).toDouble)
    val t0 = BigDecimal(s).toDouble /
      (n1.toDouble * n2.toDouble * (n1 + n2).toDouble * (n1 + n2).toDouble)
    assert(math.abs(r.getDouble(3) - t0) < 1e-6)
  }

  test("agg_hill_tail_index replays the top-50 log-ratio sum") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "value").collect()
      .filter(r => Set("view", "purchase", "click")(r.getString(0)) &&
        r.getDouble(1) > 0)
      .map(r => (r.getString(0),
        BigDecimal(r.getDouble(1)).setScale(4, HALF_UP)))
    val got = Aggregates.aggHillTailIndex(spark, sf).collect()
    assert(got.length == 3)
    for (r <- got) {
      val vs = ev.filter(_._1 == r.getString(0)).map(_._2)
        .sorted(Ordering[BigDecimal].reverse)
      val xk1 = vs(50)
      val sum = vs.take(50)
        .map(v => BigDecimal(math.log(v.toDouble / xk1.toDouble))
          .setScale(12, HALF_UP))
        .sum
      assert(r.getLong(1) == 50L && r.getDouble(2) == xk1.toDouble)
      assert(math.abs(r.getDouble(3) - sum.toDouble) < 1e-9)
      assert(math.abs(r.getDouble(4) - 50d / sum.toDouble) < 1e-5)
    }
  }

  test("text_distinct_ngrams replays distinct-1/2/3 ratios") {
    val docs = Tables.t(spark, sf, "documents")
      .select("text").collect().map(_.getString(0).split(" ", -1))
    val got = graft.llm.TextStats.textDistinctNgrams(spark, sf).collect()
    assert(got.length == 3)
    for (r <- got) {
      val n = r.getInt(0)
      val grams = docs.filter(_.length >= n)
        .flatMap(_.sliding(n).map(_.mkString(" ")))
      assert(r.getLong(1) == grams.length.toLong, s"n=$n total")
      assert(r.getLong(2) == grams.distinct.length.toLong, s"n=$n uniq")
      assert(math.abs(r.getDouble(3) -
        grams.distinct.length.toDouble / grams.length) < 1e-6)
    }
  }

  private def md5hex12(s0: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s0.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 12), 16)
  }

  test("agg_sample_native replays the bottom-10 priority sample") {
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(user_id AS STRING)").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val got = Aggregates.aggSampleNative(spark, sf).collect()
    val byType = got.groupBy(_.getString(0))
    for ((ty, rows) <- ev.groupBy(_._1)) {
      val want = rows.map(_._2)
        .map(u => (md5hex12(s"smp|$u"), u))
        .sortBy { case (p, u) => (p, u) }.take(10).map(_._2).toSeq
      val gotRows = byType(ty).sortBy(_.getInt(1)).map(_.getString(2)).toSeq
      assert(gotRows == want, ty)
    }
  }

  test("sample_rendezvous_shard replays the HRW argmax routing") {
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val exp = docs.map { id =>
      val best = (0 until 5)
        .map(i => (md5hex12(s"shard|$i|$id"), i)).max
      id -> best._2
    }.groupBy(_._2).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._1).min, xs.map(_._1).max))
      .toMap
    val got = graft.llm.Curation.sampleRendezvousShard(spark, sf).collect()
    assert(got.map(_.getLong(1)).sum == docs.length.toLong)
    for (r <- got) {
      val (n, lo, hi) = exp(r.getInt(0))
      assert(r.getLong(1) == n && r.getLong(2) == lo && r.getLong(3) == hi,
        s"shard ${r.getInt(0)}")
    }
  }

  test("agg_dau_wau replays the fan-out distinct decomposition") {
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("user_id", "CAST(ts AS DATE)").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
      .distinct
    val dau = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val wau = ev.flatMap { case (u, d0) => (0 to 6).map(i => (u, d0 + i)) }
      .distinct.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val got = Aggregates.aggDauWau(spark, sf).collect()
    assert(got.length == dau.size)
    for (r <- got) {
      val d0 = r.getDate(0).toLocalDate.toEpochDay
      assert(r.getLong(1) == dau(d0) && r.getLong(2) == wau(d0), s"$d0")
      assert(math.abs(r.getDouble(3) -
        dau(d0).toDouble / wau(d0)) < 1e-6)
    }
  }

  test("window_mau_sketch replays exact MAU and the estimate bound") {
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("user_id", "CAST(ts AS DATE)").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
      .distinct
    val dau = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val mau = ev.flatMap { case (u, d0) => (0 to 29).map(i => (u, d0 + i)) }
      .distinct.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val got = Windows.windowMauSketch(spark, sf).collect()
    assert(got.length == dau.size)
    for (r <- got) {
      val d0 = r.getDate(0).toLocalDate.toEpochDay
      assert(r.getLong(1) == dau(d0) && r.getLong(2) == mau(d0), s"$d0")
      assert(r.getBoolean(3), s"estimate out of 5% bound on $d0")
    }
  }

  test("multimodal_chunk_roundtrip reassembles every doc losslessly") {
    val got = graft.llm.Multimodal
      .multimodalChunkRoundtrip(spark, sf).collect()
    val docs = Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "length(text)").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.length == docs.count(_._2 > 0))
    for (r <- got) {
      assert(r.getBoolean(3), s"doc ${r.getLong(0)} not lossless")
      val want = (docs(r.getLong(0)) + 63) / 64
      assert(r.getLong(1) == want.toLong, s"doc ${r.getLong(0)} chunks")
    }
  }

  test("graph_hits replays two unnormalized HITS rounds") {
    val em = Tables.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x =>
          math.floor(x.toDouble * 1000000.0 + 0.5).toLong).toArray))
    def dot(p: Array[Long], q: Array[Long]): Long =
      p.zip(q).map { case (x, y) => x * y }.sum
    val edges = em.flatMap { case (src, p) =>
      em.filter(_._1 != src)
        .map { case (d0, q) => (dot(p, q), d0) }
        .sortBy { case (s0, d0) => (-s0, d0) }.take(5)
        .map { case (_, d0) => (src, d0) }
    }
    val a1 = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val h1 = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val a2 = edges.groupBy(_._2).view
      .mapValues(_.map(e => h1.getOrElse(e._1, 0L)).sum).toMap
    val h2 = edges.groupBy(_._1).view
      .mapValues(_.map(e => a2.getOrElse(e._2, 0L)).sum).toMap
    val nodes = (a1.keys ++ h1.keys ++ a2.keys ++ h2.keys).toSet
    val want = nodes.toSeq.map(n => (n,
        a1.getOrElse(n, 0L), h1.getOrElse(n, 0L),
        a2.getOrElse(n, 0L), h2.getOrElse(n, 0L)))
      .sortBy { case (n, _, _, a, _) => (-a, n) }.take(20)
    val got = graft.queries.Graphs.graphHits(spark, sf).collect()
    assert(got.length == want.length)
    for ((r, w) <- got.zip(want))
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)) == w, s"node ${r.getLong(0)}")
  }

  test("hierarchy_rollup_cte replays the digit-truncation rollup") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val parts = Tables.t(spark, sf, "part")
      .select("p_partkey", "p_retailprice").collect()
      .map(r => (r.getLong(0),
        BigDecimal(r.getDouble(1)).setScale(4, HALF_UP)))
    def rootOf(k: Long): Long = if (k < 10) k else rootOf(k / 10)
    def depthOf(k: Long): Int = if (k < 10) 0 else depthOf(k / 10) + 1
    val exp = parts.groupBy(t0 => rootOf(t0._1)).map { case (root, xs) =>
      root -> (xs.length.toLong, xs.map(t0 => depthOf(t0._1)).max,
        xs.map(_._2).sum)
    }
    val got = graft.queries.Composite.hierarchyRollupCte(spark, sf)
      .collect()
    assert(got.length == exp.size)
    for (r <- got) {
      val (n, dep, tot) = exp(r.getLong(0))
      assert(r.getLong(1) == n && r.getInt(2) == dep, s"root ${r.get(0)}")
      assert(r.getDouble(3) == tot.toDouble, s"root ${r.get(0)}")
    }
  }

  test("agg_average_precision replays the per-positive precision sum") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("event_id", "event_type", "value").collect()
      .filter(r => Set("view", "purchase")(r.getString(1)))
      .map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(4, HALF_UP)))
    val ranked = ev.sortBy { case (id, _, v) => (-v, id) }.zipWithIndex
      .map { case ((id, ty, _), i) => (ty, i + 1L) }
    val posRanks = ranked.filter(_._1 == "purchase").map(_._2)
    val terms = posRanks.sorted.zipWithIndex.map { case (rk, i) =>
      BigDecimal((i + 1).toDouble / rk.toDouble).setScale(12, HALF_UP) }
    val got = Aggregates.aggAveragePrecision(spark, sf).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(0) == posRanks.length.toLong)
    assert(math.abs(r.getDouble(1) - terms.sum.toDouble) < 1e-9)
    assert(math.abs(r.getDouble(2) -
      terms.sum.toDouble / posRanks.length) < 1e-6)
  }

  test("join_spatial_knn replays the bounded-ball argmin") {
    def h(s0: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s0.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 6), 16)
    }
    val pts = Tables.t(spark, sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
      .map(ck => (ck, h(s"lat|$ck") % 18000, h(s"lon|$ck") % 36000))
    val exp = pts.map { case (ck, la, lo) =>
      val cand = pts.filter { case (bk, lb, ob) =>
        bk != ck && math.abs(la - lb) < 100 && math.abs(lo - ob) < 100 }
        .map { case (bk, lb, ob) =>
          ((la - lb) * (la - lb) + (lo - ob) * (lo - ob), bk) }
      ck -> (if (cand.isEmpty) None else Some(cand.min.swap))
    }.toMap
    val got = graft.queries.Joins.joinSpatialKnn(spark, sf).collect()
    assert(got.length == pts.length)
    for (r <- got) {
      val want = exp(r.getLong(0))
      val gotNn = if (r.isNullAt(3)) None
        else Some((r.getLong(3), r.getLong(4)))
      assert(gotNn == want, s"ck ${r.getLong(0)}")
    }
  }

  test("embedding_rvq_encode replays the two-level argmin chain") {
    val em = Tables.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000000d)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray))
      .sortBy(_._1)
    val cb1 = em.filter(_._1 < 8).map(_._2)
    def a1(m: Array[Long]): (Long, Int) =
      cb1.zipWithIndex.map { case (cm, c) =>
        (cm.zip(m).map { case (b, a) => (a - b) * (a - b) }.sum, c)
      }.min
    val cb2 = em.filter(t => t._1 >= 8 && t._1 < 16).map { case (_, m) =>
      val cm = cb1(a1(m)._2)
      m.zip(cm).map { case (a, b) => a - b }
    }
    val got = graft.llm.Similarity.embeddingRvqEncode(spark, sf).collect()
    assert(got.length == em.length)
    val byId = em.toMap
    for (r <- got) {
      val m = byId(r.getLong(0))
      val (d1, c1) = a1(m)
      val res = m.zip(cb1(c1)).map { case (a, b) => a - b }
      val (d2, c2) = cb2.zipWithIndex.map { case (rm, k) =>
        (rm.zip(res).map { case (b, a) => (a - b) * (a - b) }.sum, k)
      }.min
      assert(r.getInt(1) == c1 && r.getLong(2) == d1 &&
        r.getInt(3) == c2 && r.getLong(4) == d2, s"vec ${r.getLong(0)}")
    }
  }

  test("agg_weight_ess replays the source-level ESS arithmetic") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val docs = Tables.t(spark, sf, "documents")
      .selectExpr("source", "size(split(text, ' '))").collect()
      .map(r => (r.getString(0), r.getInt(1).toLong))
    val bySrc = docs.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
    val totTok = bySrc.values.map(_._2).sum
    val wts = bySrc.map { case (src, (nd, nt)) =>
      src -> (nd, nt.toDouble / totTok,
        BigDecimal(math.sqrt(nt.toDouble / totTok)).setScale(10, HALF_UP))
    }
    val sumWt = wts.values.map(_._3).sum
    val w = wts.map { case (src, (nd, p, wt)) =>
      src -> (nd,
        BigDecimal(wt.toDouble / sumWt.toDouble / p).setScale(6, HALF_UP))
    }
    val n = w.values.map(_._1).sum
    val sw = w.values.map { case (nd, wv) => BigDecimal(nd) * wv }.sum
    val sw2 = w.values.map { case (nd, wv) => BigDecimal(nd) * wv * wv }.sum
    val got = graft.llm.Curation.aggWeightEss(spark, sf).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(0) == n && r.getLong(1) == w.size.toLong)
    assert(math.abs(r.getDouble(2) - sw.toDouble) < 1e-6)
    val ess = sw.toDouble * sw.toDouble / sw2.toDouble
    assert(math.abs(r.getDouble(3) - ess) < 1e-3)
    assert(math.abs(r.getDouble(4) - ess / n) < 1e-6)
  }

  test("sim_search_graph_beam replays the two unrolled beam hops") {
    val em = Tables.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x =>
          math.floor(x.toDouble * 1000000.0 + 0.5).toLong).toArray))
    def dot(p: Array[Long], q: Array[Long]): Long =
      p.zip(q).map { case (x, y) => x * y }.sum
    val byId = em.toMap
    val nbrs = em.map { case (src, p) =>
      src -> em.filter(_._1 != src)
        .map { case (dst, q) => (dot(p, q), dst) }
        .sortBy { case (s0, d0) => (-s0, d0) }.take(5).map(_._2).toSeq
    }.toMap
    val pq = byId(0L)
    def hop(beam: Seq[Long], keep: Int): Seq[Long] =
      (beam ++ beam.flatMap(nbrs)).distinct.filter(_ != 0L)
        .map(id => (dot(byId(id), pq), id))
        .sortBy { case (s0, id) => (-s0, id) }.take(keep).map(_._2)
    val b1 = hop(Seq(1L), 3)
    val want = hop(b1, 10)
      .map(id => (id, dot(byId(id), pq)))
    val got = graft.queries.Graphs.simSearchGraphBeam(spark, sf).collect()
    assert(got.length == want.length)
    for ((r, (id, d0)) <- got.zip(want)) {
      assert(r.getLong(1) == id && r.getLong(2) == d0,
        s"rank ${r.getInt(0)}")
    }
  }

  test("dedup_semdedup replays assignment, reps and the cos>0.9 cut") {
    val em = Tables.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000000d)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray))
    // the engine plants one sentinel duplicate of vec 0 (round-11
    // degeneracy fix) — mirror it before replaying
    val em2 = em :+ ((1900000000L, em.find(_._1 == 0L).get._2))
    val cents = em2.filter(_._1 < 8).sortBy(_._1)
    val assign = em2.map { case (id, m) =>
      val best = cents.map { case (c, cm) =>
        (m.zip(cm).map { case (a, b) => (a - b) * (a - b) }.sum, c.toInt)
      }.min
      id -> best._2
    }.toMap
    val reps = assign.groupBy(_._2).view.mapValues(_.keys.min).toMap
    val byId = em2.toMap
    val got = Dedup.dedupSemdedup(spark, sf).collect()
    assert(got.length == em2.length)
    for (r <- got) {
      val id = r.getLong(0)
      val cell = assign(id)
      val repId = reps(cell)
      val a = byId(id); val b = byId(repId)
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na2 = a.map(x => x * x).sum
      val nb2 = b.map(x => x * x).sum
      val isDup = id != repId && dot > 0 &&
        BigInt(10 * dot) * BigInt(10 * dot) >
          BigInt(9 * na2) * BigInt(9 * nb2)
      assert(r.getInt(1) == cell && r.getLong(2) == repId &&
        r.getLong(3) == dot && r.getLong(4) == na2 &&
        r.getLong(5) == nb2 && r.getBoolean(6) == isDup, s"vec $id")
    }
  }
}
