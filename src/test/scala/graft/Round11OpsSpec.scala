package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11 batch checks. The SGD training loop gets a
  * training-dynamics test (the property the cross-engine gate cannot
  * express: both engines could agree on a DIVERGING curve) plus a
  * step-0 consistency link to the single-step key's evidence. */
class Round11OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("text_classifier_train_loop: loss strictly decreases over 3 steps") {
    val rows = graft.llm.TextStats.textClassifierTrainLoop(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    val losses = rows.map(_._2)
    // strictly decreasing — the assertion that makes "training loop"
    // mean something (a sign error or a doubled gradient would still
    // gate-match, since the oracle replays the same algebra)
    losses.sliding(2).foreach { case Array(a, b) =>
      assert(b < a, s"loss did not decrease: ${losses.mkString(", ")}")
    }
    // gradient norm shrinks as the model approaches the optimum of
    // this convex objective (diagnostic of a sane step size: an
    // overshooting learning rate would oscillate or grow)
    val grads = rows.map(_._3)
    assert(grads.forall(_ > 0d))
    assert(grads.last < grads.head / 2,
      s"gradient barely moved: ${grads.mkString(", ")}")
    // logistic loss at any finite weights is bounded below by the
    // label-entropy floor; with ~ln(2) start, 3 bounded steps must
    // stay in (0, ln 2 + margin)
    assert(losses.forall(l => l > 0d && l < 0.75))
  }

  private def rnd(v: Double, sc: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(sc, java.math.RoundingMode.HALF_UP).doubleValue()

  test("agg_trimmed_mean replays exact rank trimming") {
    val rows = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "event_id",
        "CAST(value AS DECIMAL(18,4)) AS v").collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDecimal(2))))
    val got = graft.queries.Aggregates.aggTrimmedMean(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    for ((ty, xs) <- rows.groupBy(_._1)) {
      val sorted = xs.sortBy(t0 => (t0._3, t0._2)).map(_._3)
      val k = sorted.length / 10
      val kept = sorted.slice(k, sorted.length - k)
      val mean = (kept.sum / kept.length).toDouble
      assert(got(ty)._1 == kept.length.toLong, ty)
      assert(got(ty)._2 == rnd(mean, 4), ty)
    }
  }

  test("agg_shapley_attribution: credits obey the efficiency axiom") {
    // sum of Shapley values = v(grand coalition) - v(empty set): the
    // one algebraic identity the cross-engine gate cannot see (both
    // engines replay the same grid, so a mis-weighted grid would
    // still gate-match)
    val rows = Tables.t(spark, sf, "events")
      .selectExpr("user_id", "event_type", "value",
        """ROW_NUMBER() OVER (PARTITION BY user_id
          | ORDER BY unix_micros(ts), event_id) AS rn"""
          .stripMargin.replace("\n", " ")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getInt(3).toLong))
    val chs = Seq("click", "error", "signup", "view")
    val perUser = rows.groupBy(_._1).toSeq.map { case (_, es) =>
      val mask = chs.zipWithIndex.collect {
        case (c, i) if es.exists(e => e._4 <= 6 && e._2 == c) =>
          1 << i
      }.sum
      val y = if (es.exists(e => e._2 == "purchase" && e._3 >= 200.0))
        1 else 0
      (mask, y)
    }
    val v = perUser.groupBy(_._1).map { case (m, us) =>
      m -> BigDecimal(us.map(_._2).sum.toDouble / us.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.withDefaultValue(BigDecimal(0))
    // brute Shapley over all 24 permutations per channel
    val perms = (0 to 3).permutations.toSeq
    val brute = (0 to 3).map { c =>
      val tot = perms.map { p =>
        val before = p.takeWhile(_ != c)
        val m0 = before.map(1 << _).sum
        v(m0 | (1 << c)) - v(m0)
      }.sum / 24
      chs(c) -> rnd(tot.toDouble, 6)
    }.toMap
    val got = graft.queries.Aggregates
      .aggShapleyAttribution(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (c <- chs)
      assert(math.abs(got(c) - brute(c)) < 2e-6, s"$c ${got(c)} ${brute(c)}")
    // efficiency: credits sum to v(1111) - v(0000)
    assert(math.abs(got.values.sum - (v(15) - v(0)).toDouble) < 1e-5)
  }

  test("text_burrows_delta: symmetry, identity bound, and a replayed pair") {
    val toks = Tables.t(spark, sf, "documents")
      .selectExpr("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ").map(w => (r.getString(0), w)))
    val top = toks.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(10).map(_._1)
    val n = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val srcs = n.keys.toSeq.sorted
    def fi(src: String, w: String): Long = {
      val c = toks.count(t0 => t0._1 == src && t0._2 == w).toLong
      (2 * c * 1000000L + n(src)) / (2 * n(src))
    }
    val z = (for (w <- top) yield {
      val fs = srcs.map(fi(_, w))
      val ns = fs.length.toLong
      val sf = fs.sum; val sf2 = fs.map(x => x * x).sum
      val disc = BigInt(ns) * BigInt(sf2) - BigInt(sf) * BigInt(sf)
      w -> srcs.zip(fs).map { case (s0, f0) =>
        s0 -> (if (disc == 0) BigDecimal(0)
          else BigDecimal((ns * f0 - sf).toDouble /
            math.sqrt(disc.toDouble))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP))
      }.toMap
    }).toMap
    def delta(a: String, b: String): Double = {
      val sd = top.map(w => (z(w)(a) - z(w)(b)).abs).sum
      val sdi = (sd * 1000000).toBigInt
      ((2 * sdi + 10) / 20).toDouble / 1000000
    }
    val got = graft.llm.TextStats.textBurrowsDelta(spark, sf)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      .toMap
    assert(got.size == srcs.length * (srcs.length - 1) / 2)
    for (((a, b), d0) <- got) {
      assert(d0 == delta(a, b), s"$a-$b")
      assert(d0 >= 0d)
    }
  }

  test("dedup_cdc_chunking: replayed chunker + boundary re-synchronization") {
    val texts = Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val minDoc = texts.minBy(_._1)
    val all = texts.toSeq :+ ((940000000000L, "xyz " + minDoc._2))
    val P = Array(27512614111L, 887503681L, 28629151L, 923521L,
      29791L, 961L, 31L, 1L)
    def chunks(text: String): Seq[String] = {
      val bnd = (8 to text.length).filter { i =>
        val h = (0 until 8).map(j =>
          text.charAt(i - 8 + j).toLong * P(j)).sum
        h % 64 == 0
      }
      val starts = 1 +: bnd.map(_ + 1)
      val ends = bnd :+ text.length
      starts.zip(ends).collect {
        case (a, b) if b >= a => text.substring(a - 1, b)
      }
    }
    val perDoc = all.map { case (id, t0) => id -> chunks(t0) }
    val spread = perDoc.flatMap { case (id, cs) =>
      cs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val exp = perDoc.map { case (id, cs) =>
      id -> ((cs.length.toLong, cs.count(spread(_) > 1).toLong))
    }.toMap
    val got = graft.llm.Dedup.dedupCdcChunking(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == exp)
    // the CDC selling point, pinned: the prefix-shifted sentinel
    // re-synchronizes — every chunk after its first boundary is
    // shared with the original doc
    val sentChunks = perDoc.find(_._1 == 940000000000L).get._2
    val origChunks = perDoc.find(_._1 == minDoc._1).get._2.toSet
    assert(sentChunks.length > 1)
    assert(sentChunks.tail.forall(origChunks.contains),
      "CDC failed to re-synchronize after the planted prefix shift")
  }

  test("sample_coreset_kcenter replays the exact greedy and its monotone cover") {
    val em = Tables.t(spark, sf, "embeddings")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000000d)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
          .toIndexedSeq))
    val byId = em.toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var sel = Vector((0L, Option.empty[Long]))
    var md = em.map { case (id, m) => id -> d2(m, byId(0L)) }.toMap
    for (_ <- 1 to 7) {
      val cand = md.filterNot(kv => sel.exists(_._1 == kv._1))
      val next = cand.toSeq.maxBy { case (id, dd) => (dd, -id) }
      sel :+= ((next._1, Some(next._2)))
      md = md.map { case (id, dd) =>
        id -> math.min(dd, d2(byId(id), byId(next._1))) }
    }
    val got = graft.llm.Curation.sampleCoresetKcenter(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got.map(g => (g._2, g._3)).toSeq == sel.toSeq)
    // coverage radius non-increasing — the greedy invariant
    val covers = got.flatMap(_._3)
    covers.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, covers.mkString(","))
    }
  }

  test("multimodal_spectral_centroid replays the stub byte folds") {
    val texts = Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val got = graft.llm.Multimodal
      .multimodalSpectralCentroid(spark, sf).limit(20).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val p = texts(r.getLong(0)).take(64)
        .map(c => if (c == ' ') 0 else c.toInt - 110)
      val wpos = p.zipWithIndex
        .map { case (v0, i) => (i + 1).toLong * math.abs(v0) }.sum
      val mass = p.map(v0 => math.abs(v0).toLong).sum
      val peak = p.map(v0 => math.abs(v0).toLong).max
      assert(r.getLong(1) == mass && r.getLong(2) == peak)
      assert(r.getDouble(3) == rnd(wpos.toDouble / mass, 4))
      assert(r.getDouble(4) == rnd(64d * peak / mass, 4))
    }
  }
}
