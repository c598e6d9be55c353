package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-12 batch checks: independent brute-force replays for the five
  * new keys (the NonparamSpec discipline — an engine+oracle pair that
  * drifts TOGETHER is exactly what these catch), plus the structural
  * properties the cross-engine gate cannot express (IVF-PQ candidates
  * confined to probed cells, SSSP frontier monotonicity, DP noise
  * staying inside its truncated support).
  */
class Round12OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def micro(v: Seq[Float]): Seq[Long] =
    v.map(x => BigDecimal(x.toDouble * 1000000d)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)

  private def sq(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("sim_search_ivf_pq replays the full IVFADC pipeline") {
    val vecs = Tables.t(spark, sf, "embeddings")
      .selectExpr("CAST(vec_id AS INT) AS vec_id", "embedding")
      .collect()
      .map(r => r.getInt(0) -> micro(r.getSeq[Float](1)))
      .toMap
    val coarse = (16 to 19).map(c => c -> vecs(c))
    val cb = (0 to 15).map(c => c -> vecs(c))
    val probe = vecs(0)
    val probed = coarse.map { case (c, cq) => (sq(probe, cq), c) }
      .sorted.take(2).map(_._2).toSet
    def cellOf(q: Seq[Long]): Int =
      coarse.map { case (c, cq) => (sq(q, cq), c) }.min._2
    def codes(rq: Seq[Long]): Seq[Int] =
      (0 until 8).map { m =>
        cb.map { case (c, cbq) =>
          (sq(rq.slice(m * 8, m * 8 + 8), cbq.slice(m * 8, m * 8 + 8)), c)
        }.min._2
      }
    val expected = vecs.toSeq
      .filter { case (id, _) => id != 0 }
      .map { case (id, q) => (id, cellOf(q), q) }
      .filter { case (_, cell, _) => probed(cell) }
      .map { case (id, cell, q) =>
        val rq = q.zip(vecs(cell)).map { case (a, b) => a - b }
        val pr = probe.zip(vecs(cell)).map { case (a, b) => a - b }
        val adc = codes(rq).zipWithIndex.map { case (c, m) =>
          sq(pr.slice(m * 8, m * 8 + 8),
            vecs(c).slice(m * 8, m * 8 + 8))
        }.sum
        (id, cell, adc)
      }
      .sortBy { case (id, _, adc) => (adc, id) }
      .take(10)
    val got = graft.llm.Similarity.simSearchIvfPq(spark, sf)
      .collect().map(r => (r.getLong(0).toInt, r.getInt(1), r.getLong(2)))
    assert(got.length == 10)
    assert(got.toSeq ==
      expected.map { case (id, c, adc) => (id, c, adc) })
    // every candidate the engine scored sits in a probed cell
    assert(got.forall { case (_, cell, _) => probed(cell) })
  }

  test("graph_sssp_weighted replays 4 Bellman-Ford rounds exactly") {
    // independent kNN edge build (BruteKnn discipline): micro dots,
    // top-5 by (dot desc, dst), weight = 7e13 - dot. NOTE the knn
    // build quantizes floor(x·1e6 + 0.5) (BruteKnn recipe), which
    // differs from the PQ keys' HALF_UP on negative .5 boundaries —
    // the replay must mirror the knn recipe, not micro().
    val vecs = Tables.t(spark, sf, "embeddings")
      .selectExpr("CAST(vec_id AS INT) AS vec_id", "embedding")
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1)
        .map(x => math.floor(x.toDouble * 1000000.0 + 0.5).toLong).toSeq)
      .toMap
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val ids = vecs.keys.toSeq.sorted
    val edges = ids.flatMap { s0 =>
      ids.filter(_ != s0)
        .map(d0 => (d0, dot(vecs(s0), vecs(d0))))
        .sortBy { case (d0, dt) => (-dt, d0) }
        .take(5)
        .map { case (d0, dt) => (s0, d0, 70000000000000L - dt) }
    }
    assert(edges.forall(_._3 > 0L), "weights must be positive")
    var dist = Map(0 -> 0L)
    val frontierSizes = (1 to 4).map { _ =>
      val relaxed = edges.flatMap { case (u, v, w) =>
        dist.get(u).map(du => v -> (du + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
      dist.size
    }
    // reached set grows monotonically (frontier expansion is the
    // property a wrong join direction would silently break)
    assert(frontierSizes.sliding(2).forall { case Seq(a, b) => b >= a })
    val got = graft.queries.Graphs.graphSsspWeighted(spark, sf)
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    assert(got == dist)
    assert(got(0) == 0L)
    assert(got.size > 1, "source must reach its out-neighborhood")
  }

  test("text_ner_gazetteer replays dictionary bigram matching") {
    val gaz = Map(
      "hash join" -> "OPERATOR", "table scan" -> "OPERATOR",
      "sort merge" -> "OPERATOR", "window batch" -> "OPERATOR",
      "key order" -> "CONCEPT", "data stream" -> "CONCEPT")
    val docs = Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val mentions = docs.flatMap { case (id, src, text) =>
      val toks = text.split(' ')
      toks.sliding(2).filter(_.length == 2)
        .map(_.mkString(" "))
        .filter(gaz.contains)
        .map(b => (src, b, id))
    }
    val expected = mentions.groupBy { case (src, b, _) => (src, b) }
      .map { case ((src, b), ms) =>
        (src, b, gaz(b), ms.length.toLong, ms.map(_._3).distinct.length.toLong)
      }.toSeq.sortBy { case (src, b, _, _, _) => (src, b) }
    val got = graft.llm.TextStats.textNerGazetteer(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // the detector fires on the fixture (a gazetteer that never
    // matches reads identically to a broken one)
    assert(got.nonEmpty && got.map(_._4).sum > 10)
  }

  test("text_keyword_rake replays degree/frequency scoring") {
    val stop = Set("the", "a", "of", "and", "to", "in")
    val docs = Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.split(' ')
      // phrases keyed by running stopword count at each position
      val phrases = toks.zipWithIndex
        .map { case (t, i) =>
          (t, i, toks.take(i + 1).count(stop.contains)) }
        .filterNot { case (t, _, _) => stop.contains(t) }
        .groupBy { case (_, _, pid) => pid }
      val lens = phrases.map { case (pid, ms) => pid -> ms.length }
      val wordOcc = phrases.toSeq.flatMap { case (pid, ms) =>
        ms.map { case (t, i, _) => (t, i, pid) } }
      val wScore = wordOcc.groupBy(_._1).map { case (w, occ) =>
        val f = occ.length.toLong
        val deg = occ.map { case (_, _, pid) => lens(pid).toLong }.sum
        w -> (1000000L * deg) / f
      }
      phrases.toSeq.map { case (pid, ms) =>
        val sortedMs = ms.sortBy { case (_, i, _) => i }
        val phrase = sortedMs.map(_._1).mkString(" ")
        val score = sortedMs.map { case (w, _, _) => wScore(w) }.sum
        (pid, phrase, score)
      }.sortBy { case (pid, p, sc) => (-sc, p, pid) }
        .take(3).zipWithIndex
        .map { case ((_, p, sc), i) => (id, i + 1, p, sc) }
    }.sortBy { case (id, rk, _, _) => (id, rk) }
    val got = graft.llm.TextStats.textKeywordRake(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expected.toSeq)
    // scores carry signal: not all equal, all positive
    assert(got.map(_._4).distinct.size > 1 && got.forall(_._4 > 0L))
  }

  test("privacy_dp_quantile: geometric noise bucket + rank selection") {
    val events = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // replay the noise table: weights 2^(8-|k|) in (|k|, k) order
    val ordered = (-8 to 8).sortBy(k => (math.abs(k), k))
      .map(k => (k, 1L << (8 - math.abs(k))))
    val cum = ordered.scanLeft(0L) { case (acc, (_, w)) => acc + w }
    assert(cum.last == 766L)
    val buckets = ordered.zip(cum.zip(cum.tail))
      .map { case ((k, _), (lo, hi)) => (k, lo, hi) }
    def draw(tpe: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tpe.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(md.take(6), 16) % 766L
      buckets.find { case (_, lo, hi) => u >= lo && u < hi }.get._1
    }
    val expected = events.groupBy(_._1).map { case (tpe, es) =>
      val sorted = es.sortBy { case (_, id, v) => (v, id) }
      val n = es.length.toLong
      val k = draw(tpe)
      val rp = math.max(1L, math.min(n, (n + 1) / 2 + k))
      (tpe, n, k, sorted((rp - 1).toInt)._3)
    }.toSeq.sortBy(_._1)
    val got = graft.llm.Curation.privacyDpQuantile(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
    // noise stays inside the truncated support and actually moved at
    // least one group off the true median (the planted-condition
    // discipline: a mechanism that never perturbs reads identically
    // to a broken one)
    assert(got.forall { case (_, _, k, _) => k >= -8 && k <= 8 })
    assert(got.exists { case (_, _, k, _) => k != 0 })
  }

  test("agg_kmv_distinct: sketch replay + estimate within KMV bounds") {
    val rows = Tables.t(spark, sf, "orders")
      .selectExpr("o_orderpriority", "o_orderstatus", "o_custkey")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    def h48(v: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(v.toString.getBytes("UTF-8")).map("%02x".format(_))
        .mkString
      java.lang.Long.parseLong(md.take(12), 16)
    }
    val expected = rows.groupBy(_._1).map { case ((p, st), vs) =>
      val kept = vs.map(v => h48(v._2)).distinct.sorted.take(64)
      val est =
        if (kept.length < 64) kept.length.toLong
        else (63L * 281474976710656L) / kept.last
      (p, st, kept.length.toLong,
        if (kept.length == 64) kept.last else 0L, est)
    }.toSeq.sortBy(e => (e._1, e._2))
    val got = graft.queries.Aggregates.aggKmvDistinct(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
    // BOTH regimes execute at the gate sf: at least one unsaturated
    // cell (exact fallback) and many saturated ones (real estimate)
    assert(got.exists(_._3 < 64L) && got.exists(_._3 == 64L))
    // when saturated, the estimate is within the KMV 3σ band of the
    // TRUE distinct count (σ ≈ |D|/√(k−2)): a broken hash or an
    // off-by-one rank would land far outside
    val trueD = rows.groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).distinct.length.toLong }
    got.filter(_._3 == 64).foreach { case (p, st, _, _, est) =>
      val d0 = trueD((p, st)).toDouble
      assert(math.abs(est - d0) <= 3 * d0 / math.sqrt(62.0),
        s"($p,$st): est $est vs true $d0")
    }
  }

  test("privacy_dp_topk replays noisy counts and per-lang ranking") {
    val docs = Tables.t(spark, sf, "documents")
      .selectExpr("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val ordered = (-8 to 8).sortBy(k => (math.abs(k), k))
      .map(k => (k, 1L << (8 - math.abs(k))))
    val cum = ordered.scanLeft(0L) { case (acc, (_, w)) => acc + w }
    val buckets = ordered.zip(cum.zip(cum.tail))
      .map { case ((k, _), (lo, hi)) => (k, lo, hi) }
    def draw(seed: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(md.take(6), 16) % 766L
      buckets.find { case (_, lo, hi) => u >= lo && u < hi }.get._1
    }
    val expected = docs.groupBy(identity).map { case ((l, src), ds) =>
      (l, src, ds.length.toLong + draw(s"topk|$l|$src"))
    }.toSeq.groupBy(_._1).toSeq.flatMap { case (l, ss) =>
      ss.sortBy { case (_, src, ny) => (-ny, src) }.take(5).zipWithIndex
        .map { case ((_, src, ny), i) => (l, i + 1, src, ny) }
    }.sortBy { case (l, rk, _, _) => (l, rk) }
    val got = graft.llm.Curation.privacyDpTopk(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // at least one released rank differs from the TRUE count ranking
    // (the mechanism visibly perturbed something on this fixture)
    val trueTop = docs.groupBy(identity).map { case ((l, s0), ds) =>
      (l, s0, ds.length.toLong)
    }.toSeq.groupBy(_._1).toSeq.flatMap { case (l, ss) =>
      ss.sortBy { case (_, src, n) => (-n, src) }.take(5).zipWithIndex
        .map { case ((_, src, _), i) => (l, i + 1, src) }
    }.toSet
    assert(got.exists { case (l, rk, src, _) => !trueTop((l, rk, src)) })
  }

  test("window_holt_linear replays the level/trend recursion") {
    val rows = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(ts AS DATE) AS day",
        "CAST(value AS DECIMAL(18,4)) AS v").collect()
      .map(r => (r.getString(0), r.getDate(1),
        BigDecimal(r.getDecimal(2))))
    def posDiv10(x: Long): Long =
      (x + 1000000000000000L) / 10L - 100000000000000L
    val expected = rows.groupBy(_._1).map { case (tpe, es) =>
      val daily = es.groupBy(_._2).toSeq
        .map { case (day, vs) =>
          (day, (vs.map(_._3).sum * 100).toLongExact) }
        .sortBy(_._1.getTime)
      var level = daily.head._2
      var trend = 0L
      daily.tail.foreach { case (_, y) =>
        val l2 = posDiv10(2 * y + 8 * (level + trend))
        trend = posDiv10(l2 - level + 9 * trend)
        level = l2
      }
      (tpe, daily.length, level, trend, level + 7 * trend)
    }.toSeq.sortBy(_._1)
    val got = graft.queries.Windows.windowHoltLinear(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq
    assert(got == expected)
    // trend carries signal somewhere (a frozen 0 trend would mean the
    // β update never fired)
    assert(got.exists(_._4 != 0L))
  }

  test("multimodal_phash: replayed DCT bits + brightness invariance") {
    // integer DCT basis replay (same driver-side rounding)
    val c = Array.tabulate(8, 8)((u, j) =>
      math.round(math.cos(math.Pi * (2 * j + 1) * u / 16.0) * 1000000.0))
    def phash(px: Seq[Long]): String = {
      val ac = for {
        u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0
      } yield (0 until 64).map(i =>
        px(i) * c(u)(i / 8) * c(v)(i % 8)).sum
      val mean = (ac.sum + 63000000000000000L) / 63L - 1000000000000000L
      ac.map(d => if (d > mean) '1' else '0').mkString
    }
    val docs = Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.length >= 64)
    val expected = docs
      .map { case (id, t0) =>
        (phash(t0.take(64).map(_.toLong)), id) }
      .groupBy(_._1).map { case (bits, ds) =>
        (bits, ds.map(_._2).min, ds.length.toLong) }
      .toSeq.sortBy(_._1)
    val got = graft.llm.Multimodal.multimodalPhash(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // the property pHash exists for: a uniform brightness shift (+1
    // on every stub pixel) leaves every bit unchanged (DC absorbs it;
    // AC coefficients of a constant block are 0) — aHash/dHash do NOT
    // guarantee this across their thresholds
    val base = docs.head._2.take(64).map(_.toLong)
    assert(phash(base) == phash(base.map(_ + 1)))
  }

  test("multimodal_scene_cut replays histogram-L1 shot detection") {
    val docs = Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.length >= 96)
    val expected = docs.map { case (id, text) =>
      val maxf = (text.length - 32) / 16
      val frames = (0 to maxf).map(f => text.substring(f * 16, f * 16 + 32))
      val hists = frames.map(_.groupBy(identity).map {
        case (c, cs) => c -> cs.length })
      val l1s = hists.zip(hists.tail).map { case (a, b) =>
        (a.keySet ++ b.keySet).toSeq
          .map(c => math.abs(a.getOrElse(c, 0) - b.getOrElse(c, 0)))
          .sum.toLong
      }
      val cuts = l1s.zipWithIndex.filter(_._1 > 20L)
      (id, (maxf + 1).toLong, cuts.length.toLong,
        cuts.headOption.map(_._2.toLong),
        l1s.max)
    }.sortBy(_._1)
    val got = graft.llm.Multimodal.multimodalSceneCut(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4)))
      .toSeq
    assert(got == expected.toSeq)
    // BOTH branches populated: some docs cut, some not (a saturated
    // or dead detector reads identically to a broken one — the first
    // cut of this key fired on 76% of transitions and was rebuilt)
    assert(got.exists(_._3 == 0L) && got.exists(_._3 > 0L))
  }

  test("multimodal_tempo replays the centered-ACF argmax") {
    val docs = Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.length >= 64)
    val expected = docs.map { case (id, text) =>
      val x = text.take(64).map(_.toLong)
      val s0 = x.sum
      val xc = x.map(v => 64L * v - s0)
      val r0 = xc.map(v => v * v).sum
      val rs = (4 to 32).map { l =>
        (l, (0 until 64 - l).map(i => xc(i) * xc(i + l)).sum)
      }
      val (lag, peak) = rs.minBy { case (l, r) => (-r, l) }
      (id, lag, peak, r0)
    }.sortBy(_._1)
    val got = graft.llm.Multimodal.multimodalTempo(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected.toSeq)
    // the fixture's word+space structure produces a REAL modal period
    // (lag ≈ 5-6) yet not a constant one — the detector discriminates
    val lags = got.map(_._2)
    assert(lags.distinct.size > 3)
    val modal = lags.groupBy(identity).maxBy(_._2.size)._1
    assert(modal >= 4 && modal <= 8, s"modal lag $modal")
  }
}
