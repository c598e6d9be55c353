package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Aggregates

/** Brute-force replays for the round-10 batch: classifier-eval
  * statistics (confusion/F1, Fleiss' κ, Brier decomposition, Granger
  * F), the SymSpell deletion-join dedup, audio byte features and the
  * quality-classifier inference. Each recomputes the answer from the
  * row-level definition on collected sf0.001 data — independent of
  * both the engine plan and the DuckDB oracle. */
class Round10OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rnd(v: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  private lazy val users: Seq[(Long, Long, Long)] =
    Tables.t(spark, sf, "events")
      .selectExpr("user_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).toSeq
      .map { case (u, rows) =>
        (u, rows.length.toLong,
          if (rows.exists(_._2 >= 200.0)) 1L else 0L)
      }

  test("agg_confusion_f1 replays the per-threshold confusion counts") {
    val got = Aggregates.aggConfusionF1(spark, sf).collect()
    assert(got.length == 5)
    for (r <- got) {
      val tau = r.getLong(0)
      val tp = users.count(u => u._2 >= tau && u._3 == 1L).toLong
      val fp = users.count(u => u._2 >= tau && u._3 == 0L).toLong
      val fn = users.count(u => u._2 < tau && u._3 == 1L).toLong
      val tn = users.count(u => u._2 < tau && u._3 == 0L).toLong
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((tp, fp, fn, tn)), s"tau=$tau")
      // every user lands in exactly one cell
      assert(tp + fp + fn + tn == users.length.toLong)
      if (tp + fp > 0)
        assert(r.getDouble(5) == rnd(tp.toDouble / (tp + fp), 6))
      if (tp + fn > 0)
        assert(r.getDouble(6) == rnd(tp.toDouble / (tp + fn), 6))
    }
  }

  test("agg_fleiss_kappa matches the direct formula on complete blocks") {
    val rows = Tables.t(spark, sf, "events")
      .selectExpr("CAST(ts AS DATE) AS day", "event_type", "value")
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getString(1), r.getDouble(2)))
    val k = rows.map(_._2).distinct.length
    val typeTotals = rows.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    val typeDays = rows.groupBy(_._2).view
      .mapValues(_.map(_._1).distinct.size.toLong).toMap
    val cells = rows.groupBy(t0 => (t0._1, t0._2)).view
      .mapValues(vs => vs.toSeq).toMap.map { case ((dy, ty), vs) =>
        ((dy, ty),
          if (typeDays(ty) * vs.size > typeTotals(ty)) 1L else 0L)
      }
    val blocks = cells.keys.map(_._1).toSeq.distinct
      .map(day => (day, cells.filter(_._1._1 == day)))
      .filter(_._2.size == k)
    val n = blocks.length.toLong
    val rs = blocks.map(_._2.values.sum)
    val bigR = rs.sum
    val t2 = rs.map(r0 => r0 * r0).sum
    val a = 2 * t2 - 2 * k * bigR + n * k * (k - 1)
    val b = n * k * (k - 1)
    val c = bigR * bigR + (n * k - bigR) * (n * k - bigR)
    val e = n * k * n * k
    val got = Aggregates.aggFleissKappa(spark, sf).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == n && got(0).getLong(1) == k.toLong)
    assert(got(0).getDouble(2) == rnd(a.toDouble / b, 6))
    assert(got(0).getDouble(3) == rnd(c.toDouble / e, 6))
    if (e != c)
      assert(got(0).getDouble(4) ==
        rnd((a * e - b * c).toDouble / (b * (e - c)), 6))
  }

  test("agg_brier_decomposition: terms obey the Murphy identity") {
    // Brier = REL - RES + UNC must hold over the summed bin terms
    // (the identity is exact before rounding; with 6-dp rounded terms
    // across 10 bins the reconstruction is good to ~1e-5)
    val got = Aggregates.aggBrierDecomposition(spark, sf).collect()
    assert(got.length == 10)
    val nTot = got.map(_.getLong(1)).sum
    val cTot = got.map(_.getLong(2)).sum
    assert(nTot == users.length.toLong)
    assert(cTot == users.map(_._3).sum)
    val brier = got.map(_.getDouble(5)).sum
    val rel = got.map(_.getDouble(6)).sum
    val res = got.map(_.getDouble(7)).sum
    val ybar = cTot.toDouble / nTot
    val unc = ybar * (1 - ybar)
    assert(math.abs(brier - (rel - res + unc)) < 1e-4,
      s"brier=$brier rel=$rel res=$res unc=$unc")
    // per-bin sanity: forecast midpoints are the decile grid
    assert(got.map(_.getDouble(3)).toSeq ==
      (1 to 10).map(b0 => rnd((2 * b0 - 1) / 20.0, 6)).toSeq)
  }

  test("agg_granger_causality replays the two-regression F test") {
    val daily = Tables.t(spark, sf, "events")
      .selectExpr("CAST(ts AS DATE) AS day", "event_type").collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getString(1)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d0, rows) =>
        (d0, rows.count(_._2 == "click").toLong,
          rows.count(_._2 == "purchase").toLong)
      }
    def fStat(y: Seq[Double], l1: Seq[Double], l2: Seq[Double]): Double = {
      val t = y.length.toDouble
      def dot(a: Seq[Double], b: Seq[Double]) =
        a.zip(b).map { case (u, v) => u * v }.sum
      val (sy, s1, s2) = (y.sum, l1.sum, l2.sum)
      val m11 = t * dot(l1, l1) - s1 * s1
      val m22 = t * dot(l2, l2) - s2 * s2
      val m12 = t * dot(l1, l2) - s1 * s2
      val m1y = t * dot(l1, y) - s1 * sy
      val m2y = t * dot(l2, y) - s2 * sy
      val myy = t * dot(y, y) - sy * sy
      val det = m11 * m22 - m12 * m12
      val rssR = myy - m1y * m1y / m11
      val rssU = myy - (m22 * m1y * m1y - 2 * m12 * m1y * m2y +
        m11 * m2y * m2y) / det
      (t - 3) * (rssR - rssU) / rssU
    }
    // lag over OBSERVED days (the engine's lag-over-present-days rule)
    val y = daily.tail.map(_._3.toDouble)
    val x = daily.tail.map(_._2.toDouble)
    val yl = daily.init.map(_._3.toDouble)
    val xl = daily.init.map(_._2.toDouble)
    val got = Aggregates.aggGrangerCausality(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.size == 2)
    val cp = got("click->purchase")
    assert(cp.getLong(1) == daily.length - 1L)
    assert(math.abs(cp.getDouble(2) - fStat(y, yl, xl)) < 1e-3)
    val pc = got("purchase->click")
    assert(math.abs(pc.getDouble(2) - fStat(x, xl, yl)) < 1e-3)
  }

  test("dedup_edit_distance equals brute-force all-pairs levenshtein <= 1") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val SENT0 = 900000000000L
    val prefixes = Tables.t(spark, sf, "documents")
      .selectExpr("doc_id",
        "substring(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), 1, 12) AS p")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.length >= 4)
      .toSeq ++ (0 until 48).map(i => (SENT0 + i, "copyright 20"))
    // replay the capped SymSpell recipe exactly: per-doc distinct
    // deletion neighborhood, bucket counts, all-pairs under the cap,
    // star pairs around the min-id rep past it, then lev-verify
    def dels(p: String): Set[String] =
      (Set(p) ++ (1 to p.length).map(i =>
        p.substring(0, i - 1) + p.substring(i)))
    val byKey = prefixes.flatMap { case (id, p) =>
      dels(p).map(k => (k, id, p)) }
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val cand = scala.collection.mutable.Set.empty[(Long, Long, String, String)]
    byKey.values.foreach { rows0 =>
      if (rows0.size <= 32)
        for (a <- rows0; b <- rows0 if a._2 < b._2)
          cand += ((a._2, b._2, a._3, b._3))
      else {
        val rep = rows0.head // sorted by doc_id
        rows0.tail.foreach(m => cand += ((rep._2, m._2, rep._3, m._3)))
      }
    }
    val exp = cand.toSeq
      .filter(t0 => lev(t0._3, t0._4) <= 1)
      .map(t0 => (t0._1, t0._2, lev(t0._3, t0._4).toLong))
      .sortBy(t0 => (t0._1, t0._2))
    val rows = graft.llm.Dedup.dedupEditDistance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == exp,
      s"got ${rows.length} pairs vs brute ${exp.length}")
    // the skew cap is EXECUTED, not just documented: the planted
    // 48-doc hot bucket yields exactly 47 star pairs anchored on the
    // min-id sentinel — not C(48,2) = 1128 quadratic candidates
    val sentPairs = rows.filter(t0 => t0._1 >= SENT0 && t0._2 >= SENT0)
    assert(sentPairs.length == 47, s"star cap: ${sentPairs.length}")
    assert(sentPairs.forall(t0 => t0._1 == SENT0 && t0._3 == 0L))
    // and no real doc accidentally collides into the planted bucket
    // (if a fixture regeneration ever plants real 'copyright 20'-like
    // prefixes, the rep would become a real id — fail loudly here)
    assert(!rows.exists(t0 => t0._1 < SENT0 && t0._2 >= SENT0))
  }

  private lazy val vpValues: (Seq[BigDecimal], Seq[BigDecimal]) = {
    val rows = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(value AS DECIMAL(19,4)) AS v")
      .where("event_type IN ('view', 'purchase')").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDecimal(1))))
    (rows.filter(_._1 == "view").map(_._2).toSeq,
      rows.filter(_._1 == "purchase").map(_._2).toSeq)
  }

  test("agg_cliffs_delta equals brute-force pair counting") {
    val (xs, ys) = vpValues
    var conc = 0L; var disc = 0L; var ties = 0L
    // brute-force over the value HISTOGRAM (not raw pairs) to keep
    // the replay O(|grid|²) instead of O(n²)
    val hx = xs.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val hy = ys.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    for ((vx, cx) <- hx; (vy, cy) <- hy) {
      if (vx > vy) conc += cx * cy
      else if (vx < vy) disc += cx * cy
      else ties += cx * cy
    }
    val r = Aggregates.aggCliffsDelta(spark, sf).collect()(0)
    assert((r.getLong(0), r.getLong(1)) ==
      ((xs.length.toLong, ys.length.toLong)))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((conc, disc, ties)))
    val delta = (conc - disc).toDouble / (xs.length.toLong * ys.length)
    assert(r.getDouble(5) == rnd(delta, 6))
  }

  test("agg_cohens_d replays the pooled-SD formula") {
    val (xs, ys) = vpValues
    def mv(v: Seq[BigDecimal]) = {
      val s = v.sum.toDouble; val ss = v.map(x => (x * x).toDouble).sum
      (v.length, s, ss)
    }
    val (n1, s1, ss1) = mv(xs); val (n2, s2, ss2) = mv(ys)
    val sp = math.sqrt(((ss1 - s1 * s1 / n1) + (ss2 - s2 * s2 / n2)) /
      (n1 + n2 - 2))
    val d0 = (s1 / n1 - s2 / n2) / sp
    val g0 = d0 * (1.0 - 3.0 / (4 * (n1 + n2) - 9))
    val r = Aggregates.aggCohensD(spark, sf).collect()(0)
    assert(math.abs(r.getDouble(2) - d0) < 1e-5)
    assert(math.abs(r.getDouble(3) - g0) < 1e-5)
  }

  test("agg_tost_equivalence: verdict follows the two one-sided stats") {
    for (r <- Aggregates.aggTostEquivalence(spark, sf).collect()) {
      val (tl, tu, eq) = (r.getDouble(5), r.getDouble(6), r.getBoolean(7))
      // rounded stats reconstruct the verdict except in a hair's
      // width of the boundary (none of the fixture types sit there)
      assert(eq == (tl > 1.645 && tu < -1.645), r.toString)
    }
  }

  test("embedding_drift replays per-dim micro means") {
    val vecs = Tables.t(spark, sf, "embeddings")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0) % 2, r.getSeq[Float](1).map(x =>
        BigDecimal(x.toDouble * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)))
    val got = graft.llm.Similarity.embeddingDrift(spark, sf).collect()
    assert(got.length == 64)
    for (r <- got) {
      val dim = r.getLong(0).toInt
      val a = vecs.filter(_._1 == 0L).map(_._2(dim))
      val b = vecs.filter(_._1 == 1L).map(_._2(dim))
      assert(r.getLong(1) == a.length.toLong &&
        r.getLong(2) == b.length.toLong)
      assert(r.getDouble(3) ==
        rnd(a.sum.toDouble / a.length / 1e6, 6), s"dim=$dim")
      assert(r.getDouble(5) == rnd((b.sum.toDouble / b.length -
        a.sum.toDouble / a.length) / 1e6, 6), s"dim=$dim")
    }
  }

  test("window_page_hinkley replays the running-min excursion") {
    val daily = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(ts AS DATE) AS day").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((t0, d0), n) => (t0, d0, n) }
    val got = graft.queries.Windows.windowPageHinkley(spark, sf)
      .collect()
    for (r <- got) {
      val tp = r.getString(0)
      val series = daily.filter(_._1 == tp).sortBy(_._2).map(_._3)
      val n = series.length.toLong
      val total = series.sum
      var cum = 0L; var runmin = Long.MaxValue; var ph = 0L
      for (x <- series) {
        cum += n * x - total
        runmin = math.min(runmin, cum) // inclusive running min
        ph = math.max(ph, cum - runmin)
      }
      assert(r.getLong(1) == n && r.getLong(2) == ph, tp)
      assert(r.getDouble(3) == rnd(ph.toDouble / n, 4))
    }
  }

  test("multimodal_audio_energy replays byte arithmetic on a sample") {
    val rows = graft.llm.Multimodal.multimodalAudioEnergy(spark, sf)
      .limit(20).collect()
    val texts = Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows.nonEmpty)
    for (r <- rows) {
      val samples = texts(r.getLong(0)).take(64)
        .map(c => if (c == ' ') 0 else c.toInt - 110)
      assert(samples.length == 64)
      val energy = samples.map(v => v.toLong * v).sum
      val peak = samples.map(v => math.abs(v).toLong).max
      val zc = samples.sliding(2)
        .count(p => (p(0) >= 0) != (p(1) >= 0)).toLong
      assert(r.getLong(1) == energy && r.getLong(2) == peak &&
        r.getLong(3) == zc, s"doc=${r.getLong(0)}")
      assert(r.getDouble(4) == rnd(math.sqrt(energy.toDouble / 64), 4))
    }
  }

  test("agg_anderson_darling replays Pettitt's A2 from the value grid") {
    val (xs, ys) = vpValues
    val grid = (xs.map((_, true)) ++ ys.map((_, false)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (v, rows) =>
        (v, rows.count(_._2).toLong, rows.count(!_._2).toLong)
      }
    val n1 = xs.length.toLong; val n2 = ys.length.toLong; val nn = n1 + n2
    var cum1 = 0L; var bj = 0L
    var sum = BigDecimal(0)
    for ((_, c1, c2) <- grid) {
      cum1 += c1; bj += c1 + c2
      if (bj < nn) {
        val a = nn.toDouble * cum1 - n1.toDouble * bj
        val t = (c1 + c2) * a * a / (bj.toDouble * (nn - bj))
        sum += BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
    }
    val r = Aggregates.aggAndersonDarling(spark, sf).collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((n1, n2)))
    assert(r.getDouble(2) == rnd((sum / (BigDecimal(n1) * n2)).toDouble, 6))
  }

  test("graph_harmonic_centrality replays BFS distances") {
    val seq0 = Tables.t(spark, sf, "events")
      .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_id",
        "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3)))
    val edges = seq0.groupBy(_._1).values.flatMap { rows =>
      val o = rows.sortBy(r => (r._2.getTime, r._3)).map(_._4)
      o.zip(o.tail).filter(p => p._1 != p._2)
    }.toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    // derived bound, matching the engine: #nodes − 1 saturates BFS
    val walkBound = math.max(1, nodes.size - 1)
    def bfs(u: String): Map[String, Int] = {
      var dist = Map(u -> 0)
      var frontier = Set(u)
      var hop = 0
      while (frontier.nonEmpty && hop < walkBound) {
        hop += 1
        frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .filterNot(dist.contains)
        dist ++= frontier.map(_ -> hop)
      }
      dist - u
    }
    val got = graft.queries.Graphs.graphHarmonicCentrality(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    for (u <- nodes) {
      val ds = bfs(u)
      val hLcm = ds.values.map(d0 => (27720 / d0).toLong).sum
      assert(got(u) == ((ds.size.toLong, hLcm)), s"node=$u")
    }
  }

  test("agg_cvar: tail take sums to exactly k, VaR bounds the tail") {
    val rows = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(value AS DECIMAL(19,4)) AS v")
      .collect().map(r => (r.getString(0), BigDecimal(r.getDecimal(1))))
    val got = Aggregates.aggCvar(spark, sf).collect()
    for (r <- got) {
      val vs = rows.filter(_._1 == r.getString(0)).map(_._2)
        .sortBy(x => -x)
      val n = vs.length.toLong
      val k = ((n + 19) / 20).toInt
      assert(r.getLong(1) == n && r.getLong(2) == k.toLong)
      val tail = vs.take(k)
      assert(r.getDouble(3) == tail.last.toDouble, "VaR = k-th largest")
      assert(r.getDouble(4) ==
        rnd((tail.sum / k).toDouble, 4), r.toString)
    }
  }

  test("agg_nelson_aalen: hazard increments replay from lifetimes") {
    // reconstruct lifetimes exactly as the engine defines them
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_type", "CAST(ts AS DATE) AS day")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toLocalDate.toEpochDay))
    val obsEnd = ev.map(_._3).max
    val lifetimes = ev.groupBy(_._1).values.flatMap { rows =>
      val fv = rows.filter(_._2 == "view").map(_._3).minOption
      val fp = rows.filter(_._2 == "purchase").map(_._3).minOption
      fv.map { v =>
        fp.filter(_ >= v) match {
          case Some(p) => (p - v, 1L)
          case None => (obsEnd - v, 0L)
        }
      }
    }.toSeq
    val hist = lifetimes.groupBy(_._1).view
      .mapValues(ls => (ls.size.toLong, ls.map(_._2).sum)).toSeq
      .sortBy(_._1)
    val got = Aggregates.aggNelsonAalen(spark, sf).collect()
    var cum = BigDecimal(0)
    var gi = 0
    for ((t0, (n0, d0)) <- hist) {
      val nRisk = hist.filter(_._1 >= t0).map(_._2._1).sum
      if (d0 > 0) {
        cum += BigDecimal(d0.toDouble / nRisk)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        val r = got(gi); gi += 1
        assert(r.getInt(0).toLong == t0 && r.getLong(1) == d0 &&
          r.getLong(2) == nRisk, s"t=$t0")
        assert(r.getDouble(3) == rnd(cum.toDouble, 4), s"t=$t0")
      }
    }
    assert(gi == got.length)
  }

  test("subquery_lateral: aggregate-per-customer replays, 0-order rows kept") {
    val bld = Tables.t(spark, sf, "customer")
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .filter(_.getString(1) == "BUILDING").map(_.getLong(0)).toSet
    val orders = Tables.t(spark, sf, "orders")
      .selectExpr("o_custkey", "CAST(o_totalprice AS DECIMAL(18,4))")
      .collect().map(r => (r.getLong(0), BigDecimal(r.getDecimal(1))))
      .groupBy(_._1)
    val got = graft.queries.Subqueries.subqueryLateral(spark, sf)
      .collect()
    assert(got.length == bld.size, "every BUILDING customer has a row")
    for (r <- got) {
      val os = orders.get(r.getLong(0))
        .map(_.map(_._2).toSeq).getOrElse(Seq.empty[BigDecimal])
      assert(r.getLong(1) == os.length.toLong)
      if (os.isEmpty) assert(r.isNullAt(2) && r.isNullAt(3))
      else {
        assert(r.getDouble(2) == os.sum.setScale(2,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
        assert(r.getDouble(3) == os.max.setScale(2,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
  }

  test("graph_scc equals transitive-closure mutual reachability") {
    val seq0 = Tables.t(spark, sf, "events")
      .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_id",
        "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3)))
    val edges = seq0.groupBy(_._1).values.flatMap { rows =>
      val o = rows.sortBy(r => (r._2.getTime, r._3)).map(_._4)
      o.zip(o.tail).filter(p => p._1 != p._2)
    }.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    // Floyd-Warshall closure on the tiny node set
    var reach = edges
    var changed = true
    while (changed) {
      val next = reach ++ (for {
        (a, b) <- reach; (c, dd) <- reach if b == c
      } yield (a, dd))
      changed = next.size != reach.size
      reach = next
    }
    val scc = nodes.map { u =>
      val comp = nodes.filter(v => v == u ||
        (reach((u, v)) && reach((v, u))))
      u -> comp.min
    }.toMap
    val sizes = scc.values.groupBy(identity).view.mapValues(_.size).toMap
    val got = graft.queries.Graphs.graphScc(spark, sf).collect()
    assert(got.length == nodes.size)
    for (r <- got) {
      assert(r.getString(1) == scc(r.getString(0)), r.toString)
      assert(r.getLong(2) == sizes(scc(r.getString(0))).toLong)
    }
  }

  test("sample_group_kfold: folds partition users, counts replay") {
    def fold(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      val hex = md.take(3).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 5L
    }
    val exp = users.groupBy(u => fold(u._1)).view.mapValues { us =>
      (us.size.toLong, us.map(_._2).sum, us.map(_._3).sum)
    }.toMap
    val got = graft.llm.Curation.sampleGroupKfold(spark, sf).collect()
    assert(got.map(_.getLong(1)).sum == users.length.toLong)
    for (r <- got) {
      val (nu, ne, nc) = exp(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((nu, ne, nc)))
    }
  }

  test("multimodal_silence_trim replays trim offsets on a sample") {
    val texts = Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val rows = graft.llm.Multimodal.multimodalSilenceTrim(spark, sf)
      .limit(25).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val ss = texts(r.getLong(0)).take(64).map(_.toInt - 128)
      val act = ss.zipWithIndex.filter(p => math.abs(p._1) >= 32)
        .map(_._2 + 1)
      val (lead, trail, alen) =
        if (act.isEmpty) (64L, 0L, 0L)
        else (act.min - 1L, 64L - act.max, act.max - act.min + 1L)
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) ==
        ((lead, trail, alen)), s"doc=${r.getLong(0)}")
      // invariant: lead + trail + active = 64 for non-silent clips
      if (act.nonEmpty)
        assert(r.getLong(1) + r.getLong(2) + r.getLong(3) == 64L)
    }
  }

  test("agg_geometric_mean replays the rounded-ln discipline") {
    val rows = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val exp = rows.groupBy(_._1).view.mapValues { vs =>
      val terms = vs.filter(_._2 > 0).map(v =>
        BigDecimal(math.log(v._2)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP))
      (terms.size.toLong,
        rnd(math.exp((terms.sum / terms.size).toDouble), 4))
    }.toMap
    for (r <- Aggregates.aggGeometricMean(spark, sf).collect()) {
      val (n, gm) = exp(r.getString(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - gm) < 2e-4, r.toString)
    }
  }

  test("text_stylometrics replays regex class counts on a sample") {
    val rows = graft.llm.TextStats.textStylometrics(spark, sf)
      .limit(25).collect()
    val texts = Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    for (r <- rows) {
      val tx = texts(r.getLong(0))
      val vowels = tx.count("aeiou".contains(_)).toLong
      val spaces = tx.count(_ == ' ').toLong
      val alnum = tx.count(c => c.isLetterOrDigit && c < 128).toLong
      val words = tx.split(" ", -1)
      val short = words.count(w => w.nonEmpty && w.length <= 2 &&
        w.forall(c => c >= 'a' && c <= 'z')).toLong
      assert(r.getLong(1) == tx.length.toLong)
      assert(r.getLong(2) == words.length.toLong)
      assert(r.getDouble(3) == rnd(vowels.toDouble / alnum, 6))
      assert(r.getDouble(4) == rnd(spaces.toDouble / tx.length, 6))
      assert(r.getDouble(5) == rnd(short.toDouble / words.length, 6))
      assert(r.getDouble(6) == rnd(alnum.toDouble / words.length, 4))
      // signal check: the ratios this corpus CAN express are nonzero
      assert(r.getDouble(3) > 0 && r.getDouble(4) > 0)
    }
  }

  test("agg_att_matching replays the grid nearest-score match") {
    def arm(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      val hex = md.take(3).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 2L
    }
    val byArm = users.map(u => (arm(u._1), u._2, u._3))
    val ctl = byArm.filter(_._1 == 0L).groupBy(_._2).view
      .mapValues(v => (v.size.toLong, v.map(_._3).sum)).toMap
    val trt = byArm.filter(_._1 == 1L).groupBy(_._2).view
      .mapValues(v => (v.size.toLong, v.map(_._3).sum)).toMap
    val cScores = ctl.keys.toSeq.sorted
    var attNum = BigDecimal(0); var gapSum = 0L
    for ((sc, (n, sy)) <- trt) {
      val prev = cScores.filter(_ <= sc).lastOption
      val nxt = cScores.find(_ > sc)
      val m = (prev, nxt) match {
        case (None, Some(x)) => x
        case (Some(x), None) => x
        case (Some(p0), Some(x)) =>
          if (sc - p0 <= x - sc) p0 else x
        case _ => fail("no controls")
      }
      val (cn, csy) = ctl(m)
      attNum += BigDecimal(sy - n.toDouble * csy / cn)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      gapSum += n * math.abs(sc - m)
    }
    val nT = trt.values.map(_._1).sum
    val r = Aggregates.aggAttMatching(spark, sf).collect()(0)
    assert(r.getLong(0) == nT)
    assert(r.getLong(1) == ctl.values.map(_._1).sum)
    assert(r.getDouble(3) == rnd((attNum / nT).toDouble, 6))
    assert(r.getDouble(4) == rnd(gapSum.toDouble / nT, 4))
  }

  test("agg_em_step replays the E/M arithmetic; masses sum to N") {
    val vals = Tables.t(spark, sf, "events")
      .selectExpr("value").collect().map(_.getDouble(0))
    def pdf(x: Double, mu: Double, sg: Double) =
      math.exp(0.0 - (x - mu) * (x - mu) / (2.0 * sg * sg)) / sg
    var s1 = BigDecimal(0); var s1x = BigDecimal(0); var s1xx = BigDecimal(0)
    var s2 = BigDecimal(0); var s2x = BigDecimal(0); var s2xx = BigDecimal(0)
    for (x <- vals) {
      val f1 = pdf(x, 30, 20); val f2 = pdf(x, 100, 50)
      val r1 = BigDecimal(f1 / (f1 + f2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val r2 = BigDecimal(1).setScale(6) - r1
      s1 += r1; s2 += r2
      s1x += BigDecimal(r1.toDouble * x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      s2x += BigDecimal(r2.toDouble * x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      s1xx += BigDecimal(r1.toDouble * x * x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      s2xx += BigDecimal(r2.toDouble * x * x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    // exact complement: responsibilities add to N by construction
    assert((s1 + s2).toDouble == vals.length.toDouble)
    val got = Aggregates.aggEmStep(spark, sf).collect()
    assert(got.length == 2)
    for ((r, (sr, srx, srxx)) <- got.zip(
        Seq((s1, s1x, s1xx), (s2, s2x, s2xx)))) {
      assert(r.getLong(1) == vals.length.toLong)
      assert(r.getDouble(2) == rnd(sr.toDouble, 4))
      assert(r.getDouble(4) == rnd((srx / sr).toDouble, 4))
      val v = (srxx / sr - (srx / sr) * (srx / sr)).toDouble
      assert(math.abs(r.getDouble(5) - math.sqrt(v)) < 1e-3)
    }
  }

  test("text_classifier_train_step replays the per-bucket gradient") {
    val wts = Array.tabulate(64)(b =>
      ((31L * b * b + 17L * b) % 2001L - 1000L) * 200L)
    def bucket(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = md.take(3).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 64L).toInt
    }
    val docs = Tables.t(spark, sf, "documents")
      .selectExpr("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val acc = Array.fill(64)(BigDecimal(0))
    val touched = Array.fill(64)(0L)
    for ((lang, text) <- docs) {
      val bs = text.split(" ", -1).map(bucket)
      val n = bs.length
      val sw = bs.map(wts(_)).sum
      val err = 1.0 / (1.0 + math.exp(0.0 - sw.toDouble / (1e6 * n))) -
        (if (lang == "en") 1.0 else 0.0)
      for ((b, x) <- bs.groupBy(identity).view.mapValues(_.length)) {
        acc(b) += BigDecimal(err * x / n.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        touched(b) += 1
      }
    }
    val got = graft.llm.TextStats.textClassifierTrainStep(spark, sf)
      .collect()
    // only TOUCHED buckets emit rows — the synthetic corpus draws
    // from a ~31-token vocabulary, so far fewer than 64 buckets carry
    // any feature mass (verified against the replay's touched set)
    assert(got.length == touched.count(_ > 0))
    for (r <- got) {
      val b = r.getLong(0).toInt
      assert(r.getLong(1) == touched(b), s"bucket=$b")
      assert(r.getLong(2) == wts(b))
      assert(r.getDouble(3) == rnd(acc(b).toDouble, 6), s"bucket=$b")
      assert(r.getDouble(4) ==
        rnd(wts(b) / 1e6 - 0.1 * acc(b).toDouble, 6), s"bucket=$b")
    }
  }

  test("text_quality_classifier: kept counts replay the literal model") {
    val wts = Array.tabulate(64)(b =>
      ((31L * b * b + 17L * b) % 2001L - 1000L) * 200L)
    def bucket(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = md.take(3).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 64L).toInt
    }
    val docs = Tables.t(spark, sf, "documents")
      .selectExpr("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val perLang = docs.groupBy(_._1).view.mapValues { ds =>
      val scored = ds.map { case (_, text) =>
        val toks = text.split(" ", -1)
        val sw = toks.map(t0 => wts(bucket(t0))).sum
        (toks.length.toLong, sw)
      }
      (scored.length.toLong,
        scored.count { case (n, sw) => sw * 25 >= n * -1000000L }.toLong)
    }.toMap
    val got = graft.llm.TextStats.textQualityClassifier(spark, sf)
      .collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val (nd, nk) = perLang(r.getString(0))
      assert((r.getLong(1), r.getLong(2)) == ((nd, nk)),
        s"lang=${r.getString(0)}")
    }
  }
}
