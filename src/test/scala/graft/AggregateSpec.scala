package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Aggregates

/** Sketch-aggregate guarantees that the DuckDB oracle can't express:
  * the count-min sketch is deserialized and its estimates checked
  * against exact per-key counts (CMS never under-counts; over-count is
  * bounded by eps·N with the configured confidence). */
class AggregateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("agg_quantile_approx lands within GK rank-error bounds of exact") {
    val rows = Aggregates.aggQuantileApprox(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows.nonEmpty)
    val byGroup = Tables.t(spark, sf, "orders")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { case (prio, (n, p50, p90, p99)) =>
      val vals = byGroup(prio)
      assert(n == vals.length.toLong)
      // rank error <= n/1000 (+1 slack for discrete ranks at fixture n)
      val tol = vals.length / 1000 + 1
      Seq(0.5 -> p50, 0.9 -> p90, 0.99 -> p99).foreach { case (p, approx) =>
        val target = (p * (vals.length - 1)).toInt
        val lo = vals(math.max(0, target - tol))
        val hi = vals(math.min(vals.length - 1, target + tol))
        assert(approx >= lo - 0.01 && approx <= hi + 0.01,
          s"$prio p$p: $approx outside [$lo, $hi]")
      }
    }
  }

  test("agg_regression matches a BigDecimal brute-force fit per group") {
    val rows = Aggregates.aggRegression(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows.nonEmpty)
    val data = Tables.t(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)),
        BigDecimal(r.getDouble(2))))
    data.groupBy(_._1).foreach { case (flag, g) =>
      val n = g.length.toLong
      val (sx, sy) = (g.map(_._2).sum, g.map(_._3).sum)
      val sxy = g.map(p => p._2 * p._3).sum
      val (sxx, syy) = (g.map(p => p._2 * p._2).sum, g.map(p => p._3 * p._3).sum)
      val cov = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
      val dxx = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
      val dyy = n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
      val (gn, slope, intercept, r2) = rows(flag)
      assert(gn == n)
      assert(math.abs(slope - cov / dxx) < 1e-6)
      assert(math.abs(intercept - (sy.toDouble - cov / dxx * sx.toDouble) / n) < 1e-4)
      assert(math.abs(r2 - cov * cov / (dxx * dyy)) < 1e-6)
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("count_min_sketch estimates bound exact counts per group") {
    val rows = Aggregates.aggCountMinSketch(spark, sf).collect()
    assert(rows.nonEmpty)
    val exact = Tables.t(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"), col("l_suppkey"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val totals = exact.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    rows.foreach { r =>
      val flag = r.getString(0)
      val bytes = java.util.HexFormat.of().parseHex(r.getString(1))
      val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      val n = totals(flag)
      exact.filter(_._1._1 == flag).foreach { case ((_, suppkey), cnt) =>
        val est = cms.estimateCount(suppkey)
        assert(est >= cnt, s"CMS under-counted $flag/$suppkey: $est < $cnt")
        assert(est <= cnt + math.ceil(0.01 * n).toLong + 1,
          s"CMS over-count beyond eps*N for $flag/$suppkey: $est vs $cnt (N=$n)")
      }
    }
  }

  test("hll union estimate tracks exact distinct counts within 5%") {
    val rows = Aggregates.aggHllUnion(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = Tables.t(spark, sf, "lineitem")
    val exactPer = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    (exactPer + ("ALL" -> exactAll)).foreach { case (k, exact) =>
      val est = rows(k)
      assert(math.abs(est - exact).toDouble / exact <= 0.05,
        s"$k: estimate $est vs exact $exact")
    }
    // merged ALL row must come from the union, not a re-aggregation:
    // with lgK=12 and this cardinality the estimate is near-exact, and
    // it must be >= the largest single group (union can only grow)
    assert(rows("ALL") >= exactPer.values.max * 95 / 100)
  }

  test("deterministic mode picks the smallest most-frequent key") {
    val rows = Aggregates.aggMode(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = Tables.t(spark, sf, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val (tpe, user, n) = (r.getString(0), r.getLong(1), r.getLong(2))
      val grp = byType(tpe).map(x => (x.getLong(1), x.getLong(2)))
      val maxN = grp.map(_._2).max
      assert(n == maxN, s"$tpe mode count $n != max $maxN")
      assert(user == grp.filter(_._2 == maxN).map(_._1).min,
        s"$tpe tie not broken by smallest user")
    }
  }

  test("agg_heavy_hitters: exact result equals the plain HAVING query") {
    import org.apache.spark.sql.functions._
    val m = graft.queries.TypedAggs.mgCapacity
    val toks = Tables.t(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok")).collect()
      .map(_.getString(0))
    val n = toks.length.toLong
    val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      .filter { case (_, c) => c * (m + 1) > n }
    val got = Aggregates.aggHeavyHitters(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, s"got=$got exact=$exact")
  }

  test("native graft_misra_gries agrees with the typed Aggregator sketch") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.ingest.Codecs.register(spark)
    val m = graft.queries.TypedAggs.mgCapacity
    // same adversarial stream as below: 3 heavy among 7000 distinct
    val heavy = (1 to 3).flatMap(i => Seq.fill(3000)(s"heavy$i"))
    val light = (1 to 5000).map(i => s"light$i") ++
      (1 to 2000).flatMap(i => Seq(s"mid$i", s"mid$i"))
    val data = new scala.util.Random(7).shuffle(heavy ++ light)
    val n = data.size.toLong
    val df = data.toDF("tok").repartition(8)
    df.createOrReplaceTempView("mg_input")
    val native = spark.sql(
      s"SELECT graft_misra_gries(tok, $m) AS mg FROM mg_input")
      .collect().head.getMap[String, Long](0)
    // the plan must be a partial+final imperative aggregate, i.e. the
    // sketch merges map-side like any built-in
    val p = spark.sql(s"SELECT graft_misra_gries(tok, $m) FROM mg_input")
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_graft_misra_gries") ||
      "ObjectHashAggregate|SortAggregate".r.findFirstIn(p).isDefined, p)
    assert(native.size <= m)
    (1 to 3).foreach { i =>
      assert(native.contains(s"heavy$i"), s"heavy$i missing: $native")
      val c = native(s"heavy$i")
      assert(c <= 3000L && 3000L - c <= n / (m + 1) + 1, s"heavy$i count $c")
    }
  }

  test("misra-gries guarantee holds on an adversarial skewed stream (vocab >> m)") {
    import spark.implicits._
    val m = graft.queries.TypedAggs.mgCapacity
    // 3 genuinely heavy tokens drowning in 5000 distinct light ones:
    // heavy freq 3000 each; 5000 singletons + 2000 doubles; n = 18000
    val heavy = (1 to 3).flatMap(i => Seq.fill(3000)(s"heavy$i"))
    val light = (1 to 5000).map(i => s"light$i") ++
      (1 to 2000).flatMap(i => Seq(s"mid$i", s"mid$i"))
    val data = new scala.util.Random(7).shuffle(heavy ++ light)
    val n = data.size.toLong
    val sketch = data.toDS()
      .repartition(8) // force real partial sketches + merges
      .select(graft.queries.TypedAggs.misraGries.toColumn.name("mg"))
      .collect().head
    // every token with true freq > n/(m+1) must be present
    val threshold = n.toDouble / (m + 1)
    (1 to 3).foreach { i =>
      assert(sketch.contains(s"heavy$i"),
        s"heavy$i (freq 3000 > $threshold) missing from sketch: $sketch")
    }
    // bounded state survived the whole stream
    assert(sketch.size <= m, s"sketch overflow: ${sketch.size}")
    // stored counts are valid lower bounds within the deviation bound
    sketch.foreach { case (t, c) =>
      val truth = if (t.startsWith("heavy")) 3000L
        else if (t.startsWith("mid")) 2L else 1L
      assert(c <= truth, s"$t overcounted: $c > $truth")
      assert(truth - c <= n / (m + 1) + 1, s"$t undercount beyond bound")
    }
  }

  test("agg_cuped: adjustment never increases variance; reduction is 100*rho^2") {
    val r = Aggregates.aggCuped(spark, sf).collect().head
    val (n, theta, varY, varCuped, redPct) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))
    val nUsers = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(n == nUsers)
    assert(varCuped <= varY + 1e-9, "CUPED cannot add variance")
    assert(varCuped >= -1e-9)
    assert(redPct >= 0.0 && redPct <= 100.0)
    // var_cuped/var_y must equal 1 - reduction/100 (same moments)
    assert(math.abs(varCuped / varY - (1.0 - redPct / 100.0)) < 1e-3)
    assert(!theta.isNaN)
  }

  test("agg_permutation_test: p consistent with count; under re-randomization p is non-extreme") {
    val r = Aggregates.aggPermutationTest(spark, sf).collect().head
    val (obs, nGe, p) = (r.getDouble(0), r.getLong(1), r.getDouble(2))
    assert(nGe >= 0L && nGe <= 100L)
    assert(math.abs(p - (nGe + 1.0) / 101.0) < 1e-6)
    assert(p > 0.0 && p <= 1.0)
    // arms are themselves hash-random, so the observed diff is a null
    // draw: p should not be extreme on the fixture
    assert(p > 0.01, s"suspiciously small p=$p for a null effect")
    assert(!obs.isNaN)
  }

  test("agg_delta_ratio_ci: ratio replays brute-force; CI brackets it") {
    val rows = Aggregates.aggDeltaRatioCi(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    rows.foreach { case (et, nU, ratio, se, lo, hi) =>
      val vs = ev.filter(_._1 == et).map(_._2)
      // cents-exact ratio replay
      val expect = vs.map(v => BigDecimal(v)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum / vs.length
      assert(math.abs(ratio - expect.toDouble) < 1e-4, s"$et ratio")
      assert(se > 0.0, s"$et zero se")
      assert(lo <= ratio && ratio <= hi, s"$et CI")
      assert(nU > 0L)
    }
  }

  test("agg_power_analysis: n_per_arm replays the closed form from its own moments") {
    val rows = Aggregates.aggPowerAnalysis(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, mean, sigma2, nArm) =>
      assert(n > 0 && sigma2 > 0.0 && mean > 0.0, et)
      val expect = math.ceil(2.0 * sigma2 * math.pow(1.96 + 0.8416, 2) /
        math.pow(0.05 * mean, 2))
      // rounded mean/sigma2 vs exact internals: allow 1% slack
      assert(math.abs(nArm - expect) <= expect * 0.01 + 1,
        s"$et: $nArm vs $expect")
    }
  }

  test("window_rolling_corr replays driver Pearson over each 7-day frame") {
    val got = graft.queries.Windows.windowRollingCorr(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
    assert(got.nonEmpty)
    val daily = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"),
        sum(col("value").cast("decimal(18,4)")).as("y"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getDecimal(3).doubleValue()))
    val byType = daily.groupBy(_._1).map { case (k, vs) =>
      k -> vs.sortBy(_._2)
    }
    got.groupBy(_._1).foreach { case (et, rows) =>
      val series = byType(et)
      rows.sortBy(_._2).zipWithIndex.foreach { case ((_, day, n7, c), i) =>
        val fr = series.slice(math.max(0, i - 6), i + 1)
        assert(fr.last._2 == day)
        assert(n7 == fr.length.toLong)
        val xs = fr.map(_._3.toDouble); val ys = fr.map(_._4)
        val n = xs.length
        val (sx, sy) = (xs.sum, ys.sum)
        val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
        val (sxx, syy) = (xs.map(a => a * a).sum, ys.map(b => b * b).sum)
        val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
        if (vx > 1e-9 && vy > 1e-9) {
          val expect = (n * sxy - sx * sy) / math.sqrt(vx * vy)
          assert(math.abs(c - expect) < 1e-4, s"$et $day: $c vs $expect")
          assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
        } else assert(c.isNaN, s"$et $day: expected NULL corr")
      }
    }
  }

  test("agg_hll_intersection: exact side replays brute-force sets; i-e bound holds") {
    val r = Aggregates.aggHllIntersectionCheck(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"), col("user_id")).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val va = ev.collect { case ("view", u) => u }.toSet
    val pb = ev.collect { case ("purchase", u) => u }.toSet
    assert(row.getLong(0) == va.size.toLong)
    assert(row.getLong(1) == pb.size.toLong)
    assert(row.getLong(2) == (va ++ pb).size.toLong)
    assert(row.getLong(3) == (va & pb).size.toLong)
    assert(row.getBoolean(4), "inclusion-exclusion outside the 5%-sum bound")
  }

  test("agg_bootstrap_ci: CI brackets the sample mean, covers every order, is deterministic") {
    val rows = Aggregates.aggBootstrapCi(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // every order counted exactly once across priorities
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows.map(_._2).sum == nOrders)
    rows.foreach { case (p, n, mean, lo, hi) =>
      assert(lo < hi, s"$p: degenerate CI [$lo,$hi]")
      // with n >> 1 and B=100 Poisson replicates the 95% CI must
      // bracket the full-sample mean
      assert(lo <= mean && mean <= hi, s"$p: $mean outside [$lo,$hi]")
      // CI half-width should be within an order of magnitude of the
      // normal-theory sigma/sqrt(n) scale, not collapsed or exploded
      assert((hi - lo) / mean < 1.0, s"$p: CI absurdly wide")
      assert(hi - lo > 1e-4, s"$p: CI collapsed")
    }
    val again = Aggregates.aggBootstrapCi(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.toSeq == again.toSeq, "seeded bootstrap must be deterministic")
  }

  test("agg_exp_histogram replays brute-force bit-length buckets; median bucket brackets the exact median") {
    val events = graft.Tables.t(spark, sf, "events")
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .filter(_._2 > 0)
    // brute force: exact cents -> bit length -> per-(type,bucket) counts
    val cents = events.map { case (t0, v) =>
      (t0, BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(10000)).toLongExact)
    }
    val expected = cents.groupBy { case (t0, c) =>
      (t0, java.lang.Long.toBinaryString(c).length)
    }.map { case (k, rows) => k -> rows.length.toLong }
    val got = Aggregates.aggExpHistogram(spark, sf).collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getLong(5), r.getLong(6)))
    assert(got.map(g => g._1 -> g._2).toMap == expected,
      "bucket counts differ from brute force")
    // the flagged median bucket must CONTAIN the exact median cents
    // value per type, and be flagged exactly once per type
    for ((tpe, rows) <- got.groupBy(_._1._1)) {
      val flagged = rows.filter(_._4)
      assert(flagged.length == 1, s"$tpe: ${flagged.length} median buckets")
      val sorted = cents.filter(_._1 == tpe).map(_._2).sorted
      val med = sorted((sorted.length - 1) / 2)
      val (lo, hi) = (flagged.head._5, flagged.head._6)
      assert(med >= lo && med <= hi,
        s"$tpe: exact median $med outside flagged bucket [$lo,$hi]")
      // bucket bounds really are the power-of-2 frame of the bit length
      for ((k, _, _, _, lo0, hi0) <- rows) {
        assert(lo0 == (1L << (k._2 - 1)) && hi0 == (1L << k._2) - 1)
      }
    }
  }

  test("text_oov_rate replays the vocab cut and per-lang rates") {
    val docs = graft.Tables.t(spark, sf, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val toks = docs.flatMap { case (l, t0) => t0.split(" ", -1).map(l -> _) }
    val vocab = toks.groupBy(_._2).map { case (t0, xs) => t0 -> xs.length }
      .toSeq.sortBy { case (t0, n) => (-n, t0) }.take(10).map(_._1).toSet
    val expected = toks.groupBy(_._1).map { case (l, xs) =>
      val oov = xs.count(x => !vocab(x._2))
      l -> (xs.length.toLong, oov.toLong,
        BigDecimal(oov.toDouble / xs.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = graft.llm.TextStats.textOovRate(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == expected,
      s"first diff: ${expected.find { case (k, v) => got.get(k) != Some(v) }}")
  }
}
