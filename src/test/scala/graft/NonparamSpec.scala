package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Aggregates, Graphs}
import graft.llm.TextStats

/** Brute-force replays for the round-9 batch-17 operators: the
  * distinct-value doubled-midrank machinery (Kruskal–Wallis, Spearman),
  * value-space pair concordance (Kendall τ-b), doubled group medians
  * (Brown–Forsythe), kNN-graph degree assortativity, and the two text
  * corpus profiles. Each test recomputes the statistic from its
  * textbook row-level definition and compares against the engine's
  * aggregate-table formulation. */
class NonparamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val flagQty: Array[(String, Long)] =
    Tables.t(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong))

  private lazy val qtyDisc: Array[(Long, Long)] =
    Tables.t(spark, sf, "lineitem")
      .select("l_quantity", "l_discount").collect()
      .map(r => (r.getDouble(0).toLong, math.round(r.getDouble(1) * 100)))

  /** Average (mid)ranks, 1-based, ties share the mean rank. */
  private def midranks(xs: Array[Long]): Map[Long, Double] = {
    val sorted = xs.sorted
    sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> (g.map(_._2 + 1.0).sum / g.length) }
  }

  test("agg_kruskal_wallis matches the rank-sum definition") {
    val ranks = midranks(flagQty.map(_._2))
    val n = flagQty.length.toDouble
    val groups = flagQty.groupBy(_._1).values.toSeq
    val hRaw = 12.0 / (n * (n + 1)) * groups.map { g =>
      val r = g.map(x => ranks(x._2)).sum
      r * r / g.length
    }.sum - 3 * (n + 1)
    val tie = flagQty.map(_._2).groupBy(identity).values
      .map(g => { val t = g.length.toDouble; t * t * t - t }).sum
    val h = hRaw / (1 - tie / (n * n * n - n))
    val row = Aggregates.aggKruskalWallis(spark, sf).collect().head
    assert(row.getLong(0) == groups.length.toLong)
    assert(row.getLong(1) == flagQty.length.toLong)
    assert(math.abs(row.getDouble(3) - h) < 1e-4,
      s"${row.getDouble(3)} vs $h")
  }

  test("agg_spearman_corr matches Pearson-on-midranks") {
    val rx = midranks(qtyDisc.map(_._1))
    val ry = midranks(qtyDisc.map(_._2))
    val pts = qtyDisc.map { case (x, y) => (rx(x), ry(y)) }
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val rho = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val row = Aggregates.aggSpearmanCorr(spark, sf).collect().head
    assert(row.getLong(0) == qtyDisc.length.toLong)
    assert(math.abs(row.getDouble(3) - rho) < 1e-5,
      s"${row.getDouble(3)} vs $rho")
  }

  test("agg_kendall_tau matches the O(n²) pairwise definition") {
    var conc = 0L; var disc = 0L
    val a = qtyDisc
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) {
        val dx = java.lang.Long.compare(a(i)._1, a(j)._1)
        val dy = java.lang.Long.compare(a(i)._2, a(j)._2)
        if (dx != 0 && dy != 0) {
          if (dx == dy) conc += 1 else disc += 1
        }
        j += 1
      }
      i += 1
    }
    val n = a.length.toDouble
    val n0 = n * (n - 1) / 2
    val n1 = a.map(_._1).groupBy(identity).values
      .map(g => g.length.toDouble * (g.length - 1) / 2).sum
    val n2 = a.map(_._2).groupBy(identity).values
      .map(g => g.length.toDouble * (g.length - 1) / 2).sum
    val tau = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
    val row = Aggregates.aggKendallTau(spark, sf).collect().head
    assert(row.getLong(1) == 2 * conc, s"c2 ${row.getLong(1)} vs 2·$conc")
    assert(row.getLong(2) == 2 * disc)
    assert(math.abs(row.getDouble(5) - tau) < 1e-6)
  }

  test("agg_levene_test matches Brown–Forsythe on |x − group median|") {
    val groups = flagQty.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val devs = groups.map { g =>
      val s0 = g.sorted
      val m2 = s0((g.length + 1) / 2 - 1) + s0(g.length / 2)
      g.map(x => math.abs(2 * x - m2).toDouble)
    }
    val n = devs.map(_.length).sum.toDouble
    val k = devs.length.toDouble
    val grand = devs.map(_.sum).sum / n
    val ssb = devs.map(g =>
      g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = devs.map(g => {
      val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum }).sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    val row = Aggregates.aggLeveneTest(spark, sf).collect().head
    assert(row.getLong(0) == groups.length.toLong)
    assert(row.getLong(1) == flagQty.length.toLong)
    assert(math.abs(row.getDouble(4) - f) < 1e-4,
      s"${row.getDouble(4)} vs $f")
  }

  test("graph_assortativity matches brute-force 5-NN endpoint degrees") {
    val edges = BruteKnn.undirectedEdges(spark, sf)
    val deg = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for ((u, v) <- edges) { deg(u) += 1; deg(v) += 1 }
    val ends = edges.toSeq.flatMap { case (u, v) =>
      Seq((deg(u), deg(v)), (deg(v), deg(u))) }
    val m = ends.length.toDouble
    val sx = ends.map(_._1).sum.toDouble
    val sxx = ends.map(e => e._1 * e._1).sum.toDouble
    val sxy = ends.map(e => e._1 * e._2).sum.toDouble
    val r = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    val row = Graphs.graphAssortativity(spark, sf).collect().head
    assert(row.getLong(0) == ends.length.toLong)
    assert(math.abs(row.getDouble(4) - r) < 1e-6)
  }

  test("text_readability replays the Flesch formula per language") {
    val docs = Tables.t(spark, sf, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sentRe = "[.!?]+".r
    val sylRe = "[aeiouy]+".r
    val perLang = docs.groupBy(_._1).map { case (l, ds) =>
      val w = ds.map(d => d._2.split(" ", -1).length.toLong).sum
      val sn = ds.map(d =>
        math.max(sentRe.findAllIn(d._2).length.toLong, 1L)).sum
      val y = ds.map(d =>
        math.max(sylRe.findAllIn(d._2.toLowerCase).length.toLong, 1L)).sum
      l -> (ds.length.toLong, w, sn, y,
        206.835 - 1.015 * (w.toDouble / sn) - 84.6 * (y.toDouble / w))
    }
    val got = TextStats.textReadability(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == perLang.keySet)
    for (r <- got) {
      val (nd, w, sn, y, fl) = perLang(r.getString(0))
      assert(r.getLong(1) == nd && r.getLong(2) == w &&
        r.getLong(3) == sn && r.getLong(4) == y)
      assert(math.abs(r.getDouble(5) - fl) < 1e-3)
    }
  }

  test("text_hapax_ratio replays once/twice BIGRAM vocabulary shares") {
    // Mirrors the round-11 re-cut (TextStats.scala textHapaxRatio): the
    // key counts overlapping token BIGRAMS, not unigrams — the closed
    // 31-word fixture vocabulary made unigram dislegomena structurally
    // zero (DegeneracyLint check (e) find). Tokenization must match
    // TokenNGrams exactly: split(' ') with NO empty-token filter
    // (Java split drops only trailing empties), grams re-joined with
    // a single space.
    val docs = Tables.t(spark, sf, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = docs.flatMap { case (l, t0) =>
      val toks = t0.split(' ')
      if (toks.length < 2) Iterator.empty
      else toks.sliding(2).map(p => l -> p.mkString(" "))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val perLang = counts.groupBy(_._1._1).map { case (l, m) =>
      l -> (m.size.toLong, m.values.sum,
        m.values.count(_ == 1L).toLong, m.values.count(_ == 2L).toLong)
    }
    val got = TextStats.textHapaxRatio(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == perLang.keySet)
    for (r <- got) {
      val (v, nt, h, d2) = perLang(r.getString(0))
      assert(r.getLong(1) == v && r.getLong(2) == nt &&
        r.getLong(3) == h && r.getLong(4) == d2)
      assert(math.abs(r.getDouble(5) - h.toDouble / v) < 1e-6)
    }
  }
}
