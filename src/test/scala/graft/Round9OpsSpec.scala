package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Aggregates, SortsSets}
import graft.llm.{Curation, Ranking, TextStats}

/** Brute-force replays for the round-9 batch-9 operators: the
  * Mann–Whitney doubled-rank identity, the Monroe log-odds formula,
  * bag-semantics set ops, and the two-phase stratified top-k. */
class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s0: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("agg_mann_whitney matches the pairwise U definition and tie term") {
    val qs = Tables.t(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong))
    val a = qs.filter(_._1 == "A").map(_._2)
    val b = qs.filter(_._1 == "R").map(_._2)
    // 2·U1 straight from the definition: 2 per win, 1 per tie
    var u2 = 0L
    for (x <- a; y <- b) u2 += (if (x > y) 2L else if (x == y) 1L else 0L)
    val tie = (a ++ b).groupBy(identity).values
      .map(g => { val t = g.length.toLong; t * t * t - t }).sum
    val row = Aggregates.aggMannWhitney(spark, sf).collect().head
    assert(row.getLong(0) == a.length.toLong &&
      row.getLong(1) == b.length.toLong)
    assert(row.getLong(2) == u2, s"u1_doubled ${row.getLong(2)} != $u2")
    assert(row.getLong(3) == tie)
    val n1 = a.length.toDouble; val n2 = b.length.toDouble
    val n = n1 + n2
    val z = (u2 - n1 * n2) /
      (2 * math.sqrt((n1 * n2 / 12) * ((n + 1) - tie / (n * (n - 1)))))
    assert(math.abs(row.getDouble(4) - z) < 1e-6)
  }

  test("agg_anova_f matches the textbook SSB/SSW decomposition") {
    val xs = Tables.t(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val groups = xs.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val n = xs.length.toDouble
    val k = groups.length.toDouble
    val grand = xs.map(_._2).sum / n
    val ssb = groups.map(g =>
      g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = groups.map(g => {
      val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum }).sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    val row = Aggregates.aggAnovaF(spark, sf).collect().head
    assert(row.getLong(0) == groups.length.toLong &&
      row.getLong(1) == xs.length.toLong)
    assert(math.abs(row.getDouble(4) - f) < 1e-4,
      s"${row.getDouble(4)} vs $f")
  }

  test("text_log_odds replays the prior-smoothed formula per word") {
    val docs = Tables.t(spark, sf, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val toks = docs.flatMap { case (l, t0) =>
      t0.split(" ", -1).filter(_.nonEmpty).map(l -> _) }
    val perW = toks.groupBy(_._2).map { case (w, xs) =>
      w -> (xs.count(_._1 == "en").toLong,
        xs.count(_._1 != "en").toLong) }
    val n1 = perW.values.map(_._1).sum
    val n2 = perW.values.map(_._2).sum
    val got = TextStats.textLogOdds(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == perW.keySet)
    for ((w, (y1, y2)) <- perW) {
      val z = (math.log((2 * y1 + y2).toDouble /
          (2 * n1 + n2 - 2 * y1 - y2)) -
        math.log((y1 + 2 * y2).toDouble /
          (2 * n2 + n1 - y1 - 2 * y2))) /
        math.sqrt(1.0 / (2 * y1 + y2) + 1.0 / (y1 + 2 * y2))
      val (g1, g2, gz) = got(w)
      assert(g1 == y1 && g2 == y2, w)
      assert(math.abs(gz - z) < 1e-6, s"$w: $gz vs $z")
    }
  }

  test("set_except_all / set_intersect_all carry exact residual multiplicities") {
    val rows = Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ca = rows.filter(_._1 % 3 == 0).groupBy(_._2).view
      .mapValues(_.length.toLong).toMap
    val cb = rows.filter(_._1 % 2 == 0).groupBy(_._2).view
      .mapValues(_.length.toLong).toMap
    val expExcept = ca.flatMap { case (k, n) =>
      val r = n - cb.getOrElse(k, 0L)
      if (r > 0) Some(k -> r) else None }
    val expIntersect = ca.flatMap { case (k, n) =>
      val r = math.min(n, cb.getOrElse(k, 0L))
      if (r > 0) Some(k -> r) else None }
    val gotE = SortsSets.setExceptAll(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotI = SortsSets.setIntersectAll(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotE == expExcept)
    assert(gotI == expIntersect)
  }

  test("agg_ece equals the weighted |acc - conf| sum over the curve bins") {
    val curve = Aggregates.aggCalibrationCurve(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(3), r.getDouble(4)))
    val nAll = curve.map(_._1).sum
    // the un-telescoped definition, from the published curve columns
    val ece = curve.map { case (n, conf, acc) =>
      (n.toDouble / nAll) * math.abs(acc - conf) }.sum
    val row = Aggregates.aggEce(spark, sf).collect().head
    assert(row.getLong(1) == nAll)
    // curve columns are rounded@6, so allow that rounding's slack
    assert(math.abs(row.getDouble(3) - ece) < 1e-4,
      s"${row.getDouble(3)} vs $ece")
  }

  test("agg_cohen_kappa matches the po/pe definition") {
    val row = Aggregates.aggCohenKappa(spark, sf).collect().head
    val (n, n11, n10, n01, n00) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4))
    assert(n == n11 + n10 + n01 + n00)
    assert(Seq(n11, n10, n00).forall(_ > 0), "degenerate confusion")
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble * (n11 + n01) +
      (n01 + n00).toDouble * (n10 + n00)) / (n.toDouble * n)
    assert(math.abs(row.getDouble(5) - (po - pe) / (1 - pe)) < 1e-6)
  }

  test("text_rbo_overlap replays the prefix-intersection RBO") {
    val docs = Tables.t(spark, sf, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val toks = docs.flatMap { case (l, t0) =>
      t0.split(" ", -1).filter(_.nonEmpty).map(l -> _) }
    def head(xs: Seq[String]): Seq[String] =
      xs.groupBy(identity).view.mapValues(_.length).toSeq
        .sortBy { case (w, n) => (-n, w) }.take(20).map(_._1)
    val a = head(toks.map(_._2).toIndexedSeq)
    val b = head(toks.filter(_._1 == "en").map(_._2).toIndexedSeq)
    val rbo = (1 to 20).map { dd =>
      val xd = (a.take(dd).toSet & b.take(dd).toSet).size
      BigDecimal(xd.toDouble / (dd * (1L << dd)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val row = Ranking.textRboOverlap(spark, sf).collect().head
    assert(math.abs(row.getDouble(2) - rbo) < 1e-6,
      s"${row.getDouble(2)} vs $rbo")
  }

  test("privacy_pseudonymize preserves the per-user multiset (no collisions)") {
    val ev = Tables.t(spark, sf, "events")
      .select("user_id").collect().map(_.getLong(0))
    val row = Curation.privacyPseudonymize(spark, sf).collect().head
    assert(row.getLong(0) == ev.distinct.length.toLong,
      "pseudonym collision or loss")
    assert(row.getLong(1) == ev.length.toLong)
  }

  test("text_source_vocab_jaccard replays the pairwise set arithmetic") {
    val docs = Tables.t(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vocab = docs.groupBy(_._1).view.mapValues(
      _.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty).toSet).toMap
    val got = graft.llm.TextStats.textSourceVocabJaccard(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
    val srcs = vocab.keys.toSeq.sorted
    val expPairs = for {
      a <- srcs; b <- srcs if a < b
      inter = (vocab(a) & vocab(b)).size if inter > 0
    } yield (a, b)
    assert(got.map(_._1).toSeq == expPairs)
    for (((a, b), (ni, va, vb, j)) <- got) {
      val inter = (vocab(a) & vocab(b)).size
      assert(ni == inter && va == vocab(a).size && vb == vocab(b).size)
      assert(math.abs(j - inter.toDouble / (vocab(a) ++ vocab(b)).size)
        < 1e-6)
    }
  }

  test("sample_stratified_fixed_k equals the single-window definition") {
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (lang, xs) =>
      xs.map { case (id, _) =>
        val pri = java.lang.Long.parseLong(
          md5hex("strat" + id).take(15), 16)
        (pri, id)
      }.sorted.take(20).zipWithIndex
        .map { case ((_, id), i) => (lang, i + 1L, id) }
    }.sortBy(x => (x._1, x._2))
    val got = Curation.sampleStratifiedFixedK(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2))).toSeq
    assert(got == expected)
  }
}
