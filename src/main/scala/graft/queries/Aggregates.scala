package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Typed row for the Dataset-API aggregation (compile-time field
  * checks; the Encoder keeps execution in Tungsten rows). */
case class LineSlice(l_returnflag: String, l_quantity: Double,
    l_extendedprice: Double)

/** Typed Aggregator recipe (SURVEY.md §2.2 "UDF/UDAF surface"):
  * `org.apache.spark.sql.expressions.Aggregator[IN, BUF, OUT]` with
  * explicit encoders — partial (reduce) + merge shape means map-side
  * combine works exactly like built-in aggregates. */
object TypedAggs {
  import org.apache.spark.sql.{Encoder, Encoders}
  import org.apache.spark.sql.expressions.Aggregator

  val sumQty: Aggregator[LineSlice, Double, Double] =
    new Aggregator[LineSlice, Double, Double] {
      def zero: Double = 0.0
      def reduce(b: Double, a: LineSlice): Double = b + a.l_quantity
      def merge(x: Double, y: Double): Double = x + y
      def finish(r: Double): Double = r
      def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  val avgPrice: Aggregator[LineSlice, (Double, Long), Double] =
    new Aggregator[LineSlice, (Double, Long), Double] {
      def zero: (Double, Long) = (0.0, 0L)
      def reduce(b: (Double, Long), a: LineSlice): (Double, Long) =
        (b._1 + a.l_extendedprice, b._2 + 1)
      def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
        (x._1 + y._1, x._2 + y._2)
      def finish(r: (Double, Long)): Double = r._1 / r._2
      def bufferEncoder: Encoder[(Double, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Misra-Gries heavy-hitters sketch as a typed Aggregator — the
    * bounded-state frequent-items summary (Misra & Gries '82; merge
    * rule from Agarwal et al., "Mergeable Summaries", PODS'12).
    * State is AT MOST `mgCapacity` counters regardless of input size,
    * and the merge (sum counts, then subtract the (m+1)-th largest and
    * drop ≤0) preserves the deviation bound n/(m+1) — so partial
    * sketches combine map-side exactly like any built-in aggregate
    * and the shuffle moves ≤ m entries per task at any scale.
    * Guarantee used downstream: every token with true frequency
    * > n/(m+1) survives in the sketch (its stored count can be
    * undercounted by at most n/(m+1), hence stays positive).
    * The immutable-Map buffer is the didactic shape; a production
    * TypedImperativeAggregate would carry an open-addressing map. */
  val mgCapacity = 30
  val misraGries: Aggregator[String, Map[String, Long], Map[String, Long]] =
    new Aggregator[String, Map[String, Long], Map[String, Long]] {
      def zero: Map[String, Long] = Map.empty
      def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
        b.get(tok) match {
          case Some(c) => b.updated(tok, c + 1)
          case None if b.size < mgCapacity => b.updated(tok, 1L)
          case None => // decrement-all step: at most n/(m+1) times total
            b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
        }
      def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
        val combined = y.foldLeft(x) { case (acc, (t, c)) =>
          acc.updated(t, acc.getOrElse(t, 0L) + c)
        }
        if (combined.size <= mgCapacity) combined
        else {
          // subtract the (m+1)-th largest count from everything
          val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)
            .apply(mgCapacity)
          combined.view.mapValues(_ - cut).filter(_._2 > 0).toMap
        }
      }
      def finish(r: Map[String, Long]): Map[String, Long] = r
      def bufferEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
      def outputEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
}

/** Aggregation surface (SURVEY.md §2.2 "Aggregations"). The reference only
  * merges rows per routing group and records a `row_count`
  * (reference src/function_app.py:344-379); the relational aggregate
  * surface is engine scope.
  *
  * Scale notes: all group-bys here are hash aggregates with map-side
  * partial aggregation — one shuffle on the grouping key, partials combined
  * before the exchange, so the shuffle volume is |groups| per mapper, not
  * |rows|. `count(DISTINCT …)` expands to a two-phase plan; multiple
  * distincts use Spark's `expand` operator (row multiplication ×
  * #distincts — at 100 TB prefer `approx_count_distinct`, exposed as
  * `agg_approx_distinct_hll`). All double sums are rounded per the
  * oracle-safety rule (SURVEY.md §2.2).
  */
object Aggregates {

  /** TPC-H Q1 shape — the flagship aggregation. */
  def aggHashGroupby(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  def aggCountDistinct(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"))
      .orderBy(col("l_returnflag"))

  def aggMultiDistinct(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag"))

  def aggRollup(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  def aggCube(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** GROUPING SETS via SQL (the DataFrame API exposes only rollup/cube). */
  def aggGroupingSets(s: SparkSession, d: String): DataFrame = {
    t(s, d, "lineitem").createOrReplaceTempView("graft_li_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS cnt
        |FROM graft_li_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        |""".stripMargin)
  }

  /** collect_list / collect_set, sorted for determinism. The collected
    * array is serialized to a comma-joined string so every output column
    * is a scalar (the driver's oracle comparator sorts pandas columns and
    * crashes on raw array cells). */
  def aggCollect(s: SparkSession, d: String): DataFrame =
    // grouped per CUSTOMER, not per priority: all 5 priority groups
    // see all 3 order statuses at every sf, so the collected set was
    // the constant "F,O,P" — a round-12 constant-label lint find. A
    // customer's ~10 orders miss a status often enough that the sets
    // discriminate at every sf (sf0.001: {F,O,P}×136, {F,O}×7,
    // {O,P}×5, {F,P}×2), which is also the operator's natural shape:
    // collect_set is a profile builder, and profiles are per-entity
    t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(
        array_join(sort_array(collect_set(col("o_orderstatus"))), ",")
          .as("statuses"),
        count(lit(1)).as("cnt"))
      .orderBy(col("o_custkey"))

  /** Statistical aggregates: stddev/variance/correlation/covariance.
    * Ratio-of-sums math keeps cross-engine error ~1e-9 relative, so a
    * 2-dp round is safe (magnitudes here are ≥1). */
  def aggStats(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 2).as("sd_qty"),
        round(var_samp(col("l_quantity")), 2).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("cov_qd"),
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"))
      .orderBy(col("l_returnflag"))

  /** Per-group least-squares regression (slope / intercept / r²) from
    * EXACT decimal moments: the five sums (Σx, Σy, Σxy, Σx², Σy²) go
    * through DECIMAL so they are order-independent (double summation
    * order varies run-to-run under a shuffle; [[aggStats]]'s builtin
    * corr tolerates that only because of output rounding), then the
    * closed-form solution is a fixed sequence of IEEE double ops both
    * engines evaluate identically. Same trick as embedding_standardize.
    *
    * Scale shape: one hash aggregate with map-side partials — the
    * shuffle carries five decimals per group per task, never rows. This
    * is how regr_slope/regr_r2 over 100 TB stays a one-pass job. */
  def aggRegression(s: SparkSession, d: String): DataFrame = {
    val dbl: String => Column = n => col(n).cast("double")
    t(s, d, "lineitem")
      .select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("decimal(18,4)").as("x"),
        col("l_extendedprice").cast("decimal(18,4)").as("y"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("cov", dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy"))
      .withColumn("dxx", dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx"))
      .withColumn("dyy", dbl("n") * dbl("syy") - dbl("sy") * dbl("sy"))
      .select(col("flag"), col("n"),
        round(col("cov") / col("dxx"), 6).as("slope"),
        round((dbl("sy") - col("cov") / col("dxx") * dbl("sx")) / dbl("n"), 4)
          .as("intercept"),
        round(col("cov") * col("cov") / (col("dxx") * col("dyy")), 6)
          .as("r2"))
      .orderBy(col("flag"))
  }

  /** Mergeable approximate quantiles (Greenwald-Khanna summaries, the
    * sketch behind `approx_percentile`) — completes the sketch family
    * (HLL distinct, count-min frequency, bitmap exact-distinct, GK
    * quantiles). Unlike [[aggPercentile]]'s exact two-phase sort, the
    * GK summary is a bounded-size mergeable state: at 100 TB each task
    * folds its partition into a ~(1/eps) summary and the shuffle moves
    * sketches, not rows. accuracy=1e6 → rank error ≤ n/1e6, which is
    * < 1 rank at gate scale, so the sketch answers the EXACT discrete
    * percentile there and the query is ORACLED against quantile_disc
    * (round 5; was accuracy=1000 rows-only). The sketch path — bounded
    * memory, merge on shuffle — is unchanged; AggregateSpec still
    * bounds the result by rank against exact percentiles. */
  def aggQuantileApprox(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        expr("approx_percentile(o_totalprice, array(0.5D, 0.9D, 0.99D), 1000000)")
          .as("q"))
      .select(col("o_orderpriority"), col("n"),
        round(element_at(col("q"), 1), 2).as("p50"),
        round(element_at(col("q"), 2), 2).as("p90"),
        round(element_at(col("q"), 3), 2).as("p99"))
      .orderBy(col("o_orderpriority"))

  /** Two-sample Kolmogorov-Smirnov distance between the value
    * distributions of two event types — the distribution-drift test
    * beside [[aggChi2Independence]]'s categorical one. D = max |F₁−F₂|
    * evaluated over the merged order; cross-multiplying by n₁·n₂ keeps
    * the running statistic an exact integer (|n₂·cum₁ − n₁·cum₂|), so
    * both engines take the max over identical values and the single
    * division at the end is the only float op. sup|F₁−F₂| is defined
    * only at distinct-value boundaries, so the cums collapse to the
    * last row per distinct v before the max (round-5 advice: taking the
    * max inside a tied run overstates D when equal values span both
    * samples). The merged ranking is a global order statistic,
    * computed distributed (round 8 — the fixture path used to be one
    * unpartitioned window over the raw event rows, the single-task
    * class): per-distinct-value sample counts first (the CDF only
    * moves at distinct values, so cumulating per-value counts equals
    * collapsing the merged row cumsum per value), then the bucketed
    * prefix-sum recipe — ordered equi-width value buckets (count =
    * the session's shuffle parallelism, so the decomposition widens
    * with the cluster; the prefix-sum algebra is bucket-count-
    * invariant), parallel local running sums (one hash exchange on
    * the bucket id), and a broadcast bucket-offset relation of that
    * bounded size, the only empty-partitionBy window. Identical
    * arithmetic, identical oracle. */
  /** The (view, purchase) per-value count grid shared by the
    * two-sample rank statistics (KS, Cliff's δ): one hash aggregate
    * keyed on the DECIMAL(19,4) value — value-space bounded, never
    * corpus-bounded. */
  private def viewPurchaseGrid(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("value").cast("decimal(19,4)").as("v"),
        when(col("event_type") === "view", 1L).otherwise(0L).as("is1"))
      .groupBy(col("v"))
      .agg(sum(col("is1")).as("c1"),
        (count(lit(1)) - sum(col("is1"))).as("c2"))

  /** Distributed inclusive cumulative sums of (c1, c2) over the value
    * order WITHOUT a single global-ordered window: range-bucket the
    * grid by value, run the cumulative window inside each bucket,
    * then add the broadcast per-bucket prefix offsets (the two-level
    * prefix-sum shape — the only empty-partitionBy window left runs
    * over the ≤nBuckets offsets relation). Returns (v, c1, c2, cum1,
    * cum2). */
  private def gridCumulative(s: SparkSession, perV: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = perV
      .agg(min(col("v")).as("__lo"), max(col("v")).as("__hi"))
    val nBuckets = Ordered.defaultParts(s)
    val bucketed = perV.crossJoin(broadcast(bounds))
      .withColumn("__bkt",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(nBuckets - 1),
            floor((col("v").cast("double") - col("__lo").cast("double")) /
              (col("__hi").cast("double") - col("__lo").cast("double")) *
              nBuckets).cast("int"))))
    val localW = Window.partitionBy(col("__bkt")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefixW = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("__bkt"))
      .agg(sum(col("c1")).as("__t1"), sum(col("c2")).as("__t2"))
      .withColumn("__o1", coalesce(sum(col("__t1")).over(prefixW), lit(0L)))
      .withColumn("__o2", coalesce(sum(col("__t2")).over(prefixW), lit(0L)))
      .select(col("__bkt"), col("__o1"), col("__o2"))
    bucketed
      .withColumn("__l1", sum(col("c1")).over(localW))
      .withColumn("__l2", sum(col("c2")).over(localW))
      .join(broadcast(offsets), "__bkt")
      .select(col("v"), col("c1"), col("c2"),
        (col("__o1") + col("__l1")).as("cum1"),
        (col("__o2") + col("__l2")).as("cum2"))
  }

  def aggKsTest(s: SparkSession, d: String): DataFrame = {
    val perV = viewPurchaseGrid(s, d)
    val tot = perV.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    gridCumulative(s, perV)
      .select(col("cum1"), col("cum2"))
      .crossJoin(broadcast(tot))
      .groupBy(col("n1"), col("n2"))
      .agg(max(abs(col("n2") * col("cum1") - col("n1") * col("cum2")))
        .as("d_scaled"))
      .select(col("n1"), col("n2"), col("d_scaled"),
        round(col("d_scaled").cast("double") / (col("n1") * col("n2")), 6)
          .as("ks_d"))
  }

  /** Two-sample Anderson–Darling statistic (Pettitt 1976 form,
    * computed over the distinct-value grid): A² = (1/(n₁n₂)) Σⱼ
    * lⱼ·(N·Mⱼ − n₁·Bⱼ)²/(Bⱼ(N−Bⱼ)) over grid values with Bⱼ < N —
    * the tail-sensitive complement to [[aggKsTest]]'s sup-norm D (AD
    * weights discrepancies by the inverse CDF variance, so tail
    * differences KS misses move it). The k=2 identity folds both
    * sample terms into one: (N·M₂−n₂·B) = −(N·M₁−n₁·B). Same
    * [[gridCumulative]] two-level distributed prefix; each grid term
    * is one fixed double expression over exact BIGINTs, rounded then
    * DECIMAL-summed (the round-then-decimal discipline — no float
    * accumulates in partition order), one closing division. */
  def aggAndersonDarling(s: SparkSession, d: String): DataFrame = {
    val perV = viewPurchaseGrid(s, d)
    val tot = perV.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    gridCumulative(s, perV)
      .select(col("c1"), col("c2"), col("cum1"), col("cum2"))
      .crossJoin(broadcast(tot))
      .withColumn("nn", col("n1") + col("n2"))
      .withColumn("bj", col("cum1") + col("cum2"))
      .filter(col("bj") < col("nn"))
      .withColumn("term", expr(
        """CAST(ROUND((c1 + c2) *
          |  (CAST(nn AS DOUBLE) * cum1 - CAST(n1 AS DOUBLE) * bj) *
          |  (CAST(nn AS DOUBLE) * cum1 - CAST(n1 AS DOUBLE) * bj) /
          |  (CAST(bj AS DOUBLE) * (nn - bj)), 6) AS DECIMAL(28,6))"""
          .stripMargin))
      .groupBy(col("n1"), col("n2"))
      .agg(sum(col("term")).as("sum_t"))
      .select(col("n1"), col("n2"),
        expr("""ROUND(CAST(sum_t AS DOUBLE)
                / (CAST(n1 AS DOUBLE) * n2), 6)""").as("a2"))
  }

  /** Cliff's δ (Cliff 1993) — the nonparametric effect size the
    * Mann-Whitney p-value doesn't give you: δ = (#{x>y} − #{x<y}) /
    * (n₁n₂) between the view and purchase value distributions,
    * computed WITHOUT an all-pairs pass from the same value grid as
    * [[aggKsTest]]: concordant pairs C = Σᵥ c1(v)·cum2(v−) (strictly-
    * below cumulative), ties T = Σᵥ c1(v)·c2(v), D = n₁n₂ − C − T,
    * δ = (2C + T − n₁n₂)/(n₁n₂) — all exact BIGINT, one closing
    * division, plus the standard Romano magnitude bands on |δ|.
    * Scale: one value-space-bounded grid aggregate + the two-level
    * distributed cumulative of [[gridCumulative]]. */
  def aggCliffsDelta(s: SparkSession, d: String): DataFrame = {
    val perV = viewPurchaseGrid(s, d)
    gridCumulative(s, perV)
      .select(col("c1"), col("c2"), col("cum2"))
      .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        sum(col("c1") * (col("cum2") - col("c2"))).as("conc"),
        sum(col("c1") * col("c2")).as("ties"))
      .select(col("n1"), col("n2"), col("conc").as("concordant"),
        (col("n1") * col("n2") - col("conc") - col("ties"))
          .as("discordant"),
        col("ties"),
        expr("""ROUND(CAST(2 * conc + ties - n1 * n2 AS DOUBLE)
                / (n1 * n2), 6)""").as("cliffs_delta"),
        expr("""CASE
                WHEN abs(CAST(2 * conc + ties - n1 * n2 AS DOUBLE)
                  / (n1 * n2)) < 0.147 THEN 'negligible'
                WHEN abs(CAST(2 * conc + ties - n1 * n2 AS DOUBLE)
                  / (n1 * n2)) < 0.33 THEN 'small'
                WHEN abs(CAST(2 * conc + ties - n1 * n2 AS DOUBLE)
                  / (n1 * n2)) < 0.474 THEN 'medium'
                ELSE 'large' END""").as("magnitude"))
  }

  /** Cohen's d / Hedges' g — the PARAMETRIC effect sizes next to
    * [[aggCliffsDelta]] (dashboards report both): pooled-SD
    * standardized mean difference between view and purchase values
    * from the same exact DECIMAL moments as [[aggTTest]], with the
    * small-sample correction J = 1 − 3/(4(n₁+n₂)−9) an exact
    * rational. One conditional aggregate; d and g each close in one
    * double expression. */
  def aggCohensD(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(
        when(col("event_type") === "view", 1L).otherwise(0L).as("is1"),
        col("value").cast("decimal(18,4)").as("vq"))
    val zero = lit(0).cast("decimal(18,4)")
    val zero2 = lit(0).cast("decimal(37,8)")
    base.agg(
      sum(col("is1")).as("n1"),
      (count(lit(1)) - sum(col("is1"))).as("n2"),
      sum(when(col("is1") === 1, col("vq")).otherwise(zero)).as("sx1q"),
      sum(when(col("is1") === 0, col("vq")).otherwise(zero)).as("sx2q"),
      sum(when(col("is1") === 1, col("vq") * col("vq")).otherwise(zero2))
        .as("sxx1q"),
      sum(when(col("is1") === 0, col("vq") * col("vq")).otherwise(zero2))
        .as("sxx2q"))
      .select(col("n1"), col("n2"),
        expr("CAST(sx1q AS DOUBLE)").as("sx1"),
        expr("CAST(sx2q AS DOUBLE)").as("sx2"),
        expr("CAST(sxx1q AS DOUBLE)").as("sxx1"),
        expr("CAST(sxx2q AS DOUBLE)").as("sxx2"))
      .select(col("n1"), col("n2"),
        expr("""ROUND((sx1 / n1 - sx2 / n2) /
                sqrt(((sxx1 - sx1 * sx1 / n1) + (sxx2 - sx2 * sx2 / n2))
                     / (n1 + n2 - 2)), 6)""").as("cohens_d"),
        expr("""ROUND((sx1 / n1 - sx2 / n2) /
                sqrt(((sxx1 - sx1 * sx1 / n1) + (sxx2 - sx2 * sx2 / n2))
                     / (n1 + n2 - 2))
                * (1e0 - 3e0 / (4 * (n1 + n2) - 9)), 6)""")
          .as("hedges_g"))
  }

  /** TOST equivalence test (Schuirmann 1987) — the A/B question
    * "are the arms the SAME within margin δ?", which a failed
    * superiority test cannot answer: per event type, hash-parity arms
    * drawn from the first 6 md5 hex chars of user_id (the same draw
    * as agg_att_matching / sample_group_kfold; NOTE [[aggAbtestLift]]
    * draws from the first 2 chars, so the two keys assign some users
    * to different arms — each is internally consistent with its own
    * oracle), Welch standard error from
    * exact DECIMAL moments, and the two one-sided statistics
    * t_lower = (diff+δ)/se, t_upper = (diff−δ)/se with δ = 5.0 value
    * units; equivalence is declared when t_lower > 1.645 AND
    * t_upper < −1.645 (normal approximation — the fixture's per-arm
    * n makes t≈z; documented). One conditional aggregate per type;
    * every statistic closes over exact moments. */
  def aggTostEquivalence(s: SparkSession, d: String): DataFrame = {
    val arm = (conv(substring(md5(col("user_id").cast("string")), 1, 6),
      16, 10).cast("long") % 2L).as("arm")
    val zero = lit(0).cast("decimal(18,4)")
    val zero2 = lit(0).cast("decimal(37,8)")
    t(s, d, "events")
      .select(col("event_type"), arm,
        col("value").cast("decimal(18,4)").as("vq"))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 0L, col("vq")).otherwise(zero)).as("s0q"),
        sum(when(col("arm") === 1L, col("vq")).otherwise(zero)).as("s1q"),
        sum(when(col("arm") === 0L, col("vq") * col("vq")).otherwise(zero2))
          .as("ss0q"),
        sum(when(col("arm") === 1L, col("vq") * col("vq")).otherwise(zero2))
          .as("ss1q"))
      .select(col("event_type"), col("n0"), col("n1"),
        expr("CAST(s0q AS DOUBLE)").as("s0"),
        expr("CAST(s1q AS DOUBLE)").as("s1"),
        expr("CAST(ss0q AS DOUBLE)").as("ss0"),
        expr("CAST(ss1q AS DOUBLE)").as("ss1"))
      .withColumn("se", expr(
        """sqrt(((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1 +
          |      ((ss0 - s0 * s0 / n0) / (n0 - 1)) / n0)""".stripMargin))
      .select(col("event_type"), col("n0"), col("n1"),
        expr("ROUND(s1 / n1 - s0 / n0, 6)").as("diff"),
        round(col("se"), 6).as("se"),
        expr("ROUND((s1 / n1 - s0 / n0 + 5.0) / se, 4)").as("t_lower"),
        expr("ROUND((s1 / n1 - s0 / n0 - 5.0) / se, 4)").as("t_upper"),
        expr("""(s1 / n1 - s0 / n0 + 5.0) / se > 1.645 AND
                (s1 / n1 - s0 / n0 - 5.0) / se < -1.645""")
          .as("equivalent"))
      .orderBy(col("event_type"))
  }

  /** AUC by rank statistic (Mann-Whitney U) — the ML-eval metric over
    * (label = purchase, score = value): AUC = U / (n₊·n₋) with
    * U = Σ ranks₊ − n₊(n₊+1)/2, kept integer by reporting 2U (so the
    * halving never leaves ℤ) and ranking by the deterministic total
    * order (score, event_id) — equal scores resolve identically in
    * both engines (deterministic-tiebreak AUC, not mid-rank; noted).
    * The global rank is computed distributed (round 8 — this used to
    * be a single-partition row_number over the raw event rows):
    * [[Ordered.withGlobalIndex]]'s range-partition + per-partition id
    * + broadcast prefix-sum, exact at any parallelism. */
  def aggAucRank(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"),
        col("value").cast("decimal(19,4)").as("v"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
    Ordered.withGlobalIndex(base, Seq(col("v"), col("event_id")), "__idx")
      .withColumn("rk", col("__idx") + 1L)
      .agg(sum(col("pos")).as("n_pos"),
        (count(lit(1)) - sum(col("pos"))).as("n_neg"),
        sum(when(col("pos") === 1, col("rk")).otherwise(0L)).as("rsum"))
      .select(col("n_pos"), col("n_neg"),
        (col("rsum") * 2 - col("n_pos") * (col("n_pos") + 1))
          .as("u_stat_2x"),
        round((col("rsum") * 2 - col("n_pos") * (col("n_pos") + 1))
          .cast("double") / (col("n_pos") * col("n_neg") * 2), 6)
          .as("auc"))
  }

  /** Theil index of per-user activity per event type — the third
    * inequality measure beside [[aggGini]] (rank-based) and [[aggHhi]]
    * (share-of-squares): T = (1/n)·Σ (xᵤ/μ)·ln(xᵤ/μ), the
    * entropy-based one that DECOMPOSES across subgroups (why
    * economists use it). Integer inputs (xᵤ, X, n); each irrational
    * term rounds to decimal before the order-independent sum, one
    * division at the end. Counts are ≥ 1, so ln is total. */
  def aggTheilIndex(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"))
      .withColumn("xx", sum(col("x")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))))
      .withColumn("term",
        expr("""CAST(ROUND((CAST(x AS DOUBLE) * n / xx) *
            ln(CAST(x AS DOUBLE) * n / xx), 8) AS DECIMAL(20,8))"""))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_users"),
        max(col("xx")).as("n_events"),
        expr("ROUND(CAST(SUM(term) AS DOUBLE) / MAX(n), 6)")
          .as("theil"))
      .orderBy(col("event_type"))

  /** Cramér's V — the [0,1]-normalized effect size for the chi2
    * contingency table (chi2 grows with N even for trivial dependence;
    * V = √(χ²/(N·min(r−1, c−1))) is the comparable-across-datasets
    * number). Reuses the exact-integer chi2 term discipline; the final
    * sqrt of a ratio of exact aggregates is the only extra float op. */
  def aggCramersV(s: SparkSession, d: String): DataFrame = {
    val cells = t(s, d, "events")
      .groupBy(col("event_type"), dayofweek(col("ts")).as("dow"))
      .agg(count(lit(1)).as("n"))
    val rowT = cells.groupBy(col("event_type")).agg(sum(col("n")).as("r"))
    val colT = cells.groupBy(col("dow")).agg(sum(col("n")).as("c"))
    val nTot = cells.agg(sum(col("n")).as("nn"))
    val dims = cells.agg(
      least(countDistinct(col("event_type")) - 1,
        countDistinct(col("dow")) - 1).as("mindim"))
    cells.join(broadcast(rowT), "event_type")
      .join(broadcast(colT), "dow")
      .crossJoin(broadcast(nTot))
      .withColumn("diff",
        (col("nn") * col("n") - col("r") * col("c")).cast("double"))
      .withColumn("term",
        round(col("diff") * col("diff") /
          (col("nn").cast("double") * col("r") * col("c")), 6)
          .cast("decimal(20,6)"))
      .groupBy(col("nn"))
      .agg(sum(col("term")).as("t"))
      .crossJoin(broadcast(dims))
      .select(col("nn").as("n_total"), col("mindim"),
        expr("ROUND(CAST(t AS DOUBLE), 4)").as("chi2"),
        expr("ROUND(sqrt(CAST(t AS DOUBLE) / (nn * mindim)), 6)")
          .as("cramers_v"))
  }

  /** Mutual information between event type and day-of-week — the
    * information-theoretic dependence measure beside
    * [[aggChi2Independence]]'s significance test (chi2 says "is there
    * dependence", MI says "how many bits"): I = Σ pᵢⱼ·log₂(N·nᵢⱼ/(rᵢcⱼ))
    * from the same exact integer contingency cells, each term rounded
    * to decimal before the order-independent sum (the agg_entropy
    * discipline). Same plan shape as chi2: one cells aggregate, two
    * marginal rollups joined back (bounded — |types|×|dow| cells). */
  def aggMutualInformation(s: SparkSession, d: String): DataFrame = {
    val cells = t(s, d, "events")
      .groupBy(col("event_type"), dayofweek(col("ts")).as("dow"))
      .agg(count(lit(1)).as("n"))
    val rowT = cells.groupBy(col("event_type")).agg(sum(col("n")).as("r"))
    val colT = cells.groupBy(col("dow")).agg(sum(col("n")).as("c"))
    val nTot = cells.agg(sum(col("n")).as("nn"))
    cells.join(broadcast(rowT), "event_type")
      .join(broadcast(colT), "dow")
      .crossJoin(broadcast(nTot))
      .withColumn("term",
        expr("""CAST(ROUND((CAST(n AS DOUBLE) / nn) *
            log2(CAST(nn AS DOUBLE) * n / (CAST(r AS DOUBLE) * c)), 8)
          AS DECIMAL(20,8))"""))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("n")).as("n_total"),
        expr("ROUND(CAST(SUM(term) AS DOUBLE), 6)").as("mi_bits"))
  }

  /** Winsorized mean per event type — the robust aggregate every
    * metrics pipeline needs when a few huge values swamp the mean:
    * values clipped at the type's rank-exact p5/p95 (quantile_disc
    * edges — data values, identical doubles both engines), clipped
    * values cast to DECIMAL before summing (order-independent), and
    * the raw-vs-winsorized delta exposes the outlier influence. Edge
    * table is |types| rows — broadcast is bounded and safe here
    * (unlike vocabulary-sized relations). */
  def aggWinsorizedMean(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").select(col("event_type"), col("value"))
    val edges = ev.groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, array(0.05D, 0.95D), 1000000)")
        .as("q"))
      .select(col("event_type"), element_at(col("q"), 1).as("lo"),
        element_at(col("q"), 2).as("hi"))
    ev.join(broadcast(edges), "event_type")
      .select(col("event_type"),
        col("value").cast("decimal(18,4)").as("vq"),
        least(greatest(col("value"), col("lo")), col("hi"))
          .cast("decimal(18,4)").as("wq"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("vq")).as("sv"), sum(col("wq")).as("sw"))
      .select(col("event_type"), col("n"),
        expr("ROUND(CAST(sv AS DOUBLE) / n, 4)").as("mean_raw"),
        expr("ROUND(CAST(sw AS DOUBLE) / n, 4)").as("mean_winsorized"),
        expr("ROUND(CAST(sv - sw AS DOUBLE) / n, 4)")
          .as("outlier_influence"))
      .orderBy(col("event_type"))
  }

  /** Exact SHAPLEY channel attribution (Shapley 1953; the
    * order-symmetric credit rule marketing attribution converged on —
    * first/last-touch live in [[aggAttribution]]): credit each of the
    * 4 non-purchase channels for high-value conversion by its average
    * marginal contribution over all 4! exposure orderings. Exposure
    * set = distinct channels among the user's FIRST 6 events in the
    * (us, event_id) event-time order (the session-head attribution
    * window — a full-history window saturates every mask at 1111 in
    * this dense fixture and the credits degenerate; first-6 yields
    * 8/13/15 distinct masks at the three sfs), conversion = any
    * purchase with value ≥ 200, mask encoded in 4 bits.
    * v(S) = observed conversion rate of users with exactly mask S
    * (unobserved masks ⇒ 0, documented); with 4 players the subset
    * space is 16 rows and the Shapley sum is a LITERAL 32-row
    * (channel, S, S∪{i}) grid with ×12-integer weights {3,1,1,3} by
    * |S| — so 12·φ_i accumulates in exact DECIMAL over round-6 v's
    * and one closing division by 12 emits the credit. Scale: one
    * conversion-instant window + one user aggregate are the only
    * corpus-sized work; everything after lives on ≤16-row relations.
    * First-conversion tiebreak is the (us, event_id) event-time total
    * order, written as an explicit two-term comparison in BOTH
    * engines (no reliance on struct-ordering semantics). */
  def aggShapleyAttribution(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    def bit(ch: String) =
      max(when(col("rn") <= 6 && col("event_type") === ch, 1L)
        .otherwise(0L))
    val perUser = t(s, d, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        col("value"))
      .withColumn("rn", row_number().over(byTime))
      .groupBy(col("user_id"))
      .agg(bit("click").as("b0"), bit("error").as("b1"),
        bit("signup").as("b2"), bit("view").as("b3"),
        max(when(col("event_type") === "purchase" &&
          col("value") >= 200.0, 1L).otherwise(0L)).as("y"))
    val v = perUser
      .select((col("b0") + col("b1") * 2 + col("b2") * 4 +
        col("b3") * 8).as("mask"), col("y"))
      .groupBy(col("mask"))
      .agg(count(lit(1)).as("n_u"), sum(col("y")).as("n_c"))
      .select(col("mask"),
        expr("CAST(ROUND(CAST(n_c AS DOUBLE) / n_u, 6) " +
          "AS DECIMAL(18,6))").as("v"))
    val chNames = Seq("click", "error", "signup", "view")
    val grid = for {
      c <- 0 to 3; m <- 0 to 15 if ((m >> c) & 1) == 0
    } yield (chNames(c), m, m | (1 << c),
      Seq(3, 1, 1, 3)(Integer.bitCount(m)).toLong)
    val g = s.createDataFrame(grid)
      .toDF("channel", "m0", "m1", "w12")
    g.join(v.select(col("mask").as("m0"), col("v").as("v0")),
        Seq("m0"), "left")
      .join(v.select(col("mask").as("m1"), col("v").as("v1")),
        Seq("m1"), "left")
      .groupBy(col("channel"))
      .agg(sum(col("w12") *
        (coalesce(col("v1"), lit(0).cast("decimal(18,6)")) -
          coalesce(col("v0"), lit(0).cast("decimal(18,6)"))))
        .as("shap12"))
      .select(col("channel"),
        expr("ROUND(CAST(shap12 AS DOUBLE) / 12, 6)").as("shapley"))
      .orderBy(col("channel"))
  }

  /** 10% two-sided TRIMMED mean per event type — the robust-mean
    * sibling of [[aggWinsorizedMean]] with the other textbook
    * treatment of the tails: winsorizing CLAMPS the outer deciles to
    * the fences, trimming DROPS them, so the pair brackets how much
    * of a metric's movement lives in its tails. Trim bounds are EXACT
    * integer ranks (rn > n DIV 10, rn ≤ n − n DIV 10 over the total
    * order (value, event_id) — no approximate percentile enters, so
    * both engines keep the identical row set); the kept mass is an
    * exact decimal sum; mean and kept-range both close in one double
    * expression each. Scale: two window passes on ONE event_type
    * partitioning (ordered rank + unordered count — one shuffle),
    * then a hash aggregate. */
  def aggTrimmedMean(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byV = Window.partitionBy(col("event_type"))
      .orderBy(col("vq"), col("event_id"))
    val whole = Window.partitionBy(col("event_type"))
    t(s, d, "events")
      .select(col("event_type"), col("event_id"),
        col("value").cast("decimal(18,4)").as("vq"))
      .withColumn("rn", row_number().over(byV))
      .withColumn("n", count(lit(1)).over(whole))
      .filter(col("rn") > expr("n DIV 10") &&
        col("rn") <= col("n") - expr("n DIV 10"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("vq")).as("sv"),
        min(col("vq")).as("lo"), max(col("vq")).as("hi"))
      .select(col("event_type"), col("n_kept"),
        expr("ROUND(CAST(sv AS DOUBLE) / n_kept, 4)")
          .as("trimmed_mean"),
        expr("CAST(lo AS DOUBLE)").as("kept_lo"),
        expr("CAST(hi AS DOUBLE)").as("kept_hi"))
      .orderBy(col("event_type"))
  }

  /** Per-stream freshness profile — the "is this source still alive"
    * operational check: each event type's last-seen time against the
    * corpus watermark, staleness and span in integer microseconds.
    * One aggregate + a broadcast 1-row watermark cross join; at 100 TB
    * the per-type aggregate reads only (type, ts) after pruning. */
  def profileFreshness(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val wm = ev.agg(max(unix_micros(col("ts"))).as("watermark_us"))
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"))
      .crossJoin(broadcast(wm))
      .select(col("event_type"), col("n"),
        col("first_us"), col("last_us"),
        (col("watermark_us") - col("last_us")).as("staleness_us"),
        (col("last_us") - col("first_us")).as("span_us"))
      .orderBy(col("event_type"))
  }

  /** Pairwise Pearson correlation matrix over the four lineitem
    * measures, from EXACT integer/decimal moments: one map-side-
    * combined pass accumulates n, Σx, Σx², and the six Σxy as
    * DECIMAL (order-independent — the values are exact 2-decimal
    * money/rate figures), then ONE closing double formula per pair
    * (identical expression text on both engines). A naive corr() of
    * doubles would be summation-order-dependent and could not
    * hash-match across engines or partition counts. One scan, one
    * 12-cell reduce — nothing corpus-sized ever shuffles. */
  def aggCorrMatrix(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem").select(
      col("l_quantity").cast("decimal(18,4)").as("q"),
      col("l_extendedprice").cast("decimal(18,4)").as("p"),
      col("l_discount").cast("decimal(18,4)").as("dd"),
      col("l_tax").cast("decimal(18,4)").as("tt"))
    val m = li.agg(
      count(lit(1)).as("n"),
      sum(col("q")).as("sq"), sum(col("p")).as("sp"),
      sum(col("dd")).as("sd"), sum(col("tt")).as("st"),
      sum(expr("q*q")).as("sqq"), sum(expr("p*p")).as("spp"),
      sum(expr("dd*dd")).as("sdd"), sum(expr("tt*tt")).as("stt"),
      sum(expr("q*p")).as("sqp"), sum(expr("q*dd")).as("sqd"),
      sum(expr("q*tt")).as("sqt"), sum(expr("p*dd")).as("spd"),
      sum(expr("p*tt")).as("spt"), sum(expr("dd*tt")).as("sdt"))
    def corr(x: String, y: String, sxy: String, sxx: String, syy: String,
        sx: String, sy: String): String =
      s"""ROUND((CAST(n AS DOUBLE) * CAST($sxy AS DOUBLE)
         | - CAST($sx AS DOUBLE) * CAST($sy AS DOUBLE))
         | / sqrt((CAST(n AS DOUBLE) * CAST($sxx AS DOUBLE)
         |   - CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE))
         |  * (CAST(n AS DOUBLE) * CAST($syy AS DOUBLE)
         |   - CAST($sy AS DOUBLE) * CAST($sy AS DOUBLE))), 6)
         | AS corr_${x}_$y""".stripMargin.replaceAll("\n", "")
    m.selectExpr("n",
      corr("qty", "price", "sqp", "sqq", "spp", "sq", "sp"),
      corr("qty", "disc", "sqd", "sqq", "sdd", "sq", "sd"),
      corr("qty", "tax", "sqt", "sqq", "stt", "sq", "st"),
      corr("price", "disc", "spd", "spp", "sdd", "sp", "sd"),
      corr("price", "tax", "spt", "spp", "stt", "sp", "st"),
      corr("disc", "tax", "sdt", "sdd", "stt", "sd", "st"))
  }

  /** Join-key skew profile — the operational complement of
    * join_skew_salted: BEFORE salting a 100 TB join you measure which
    * keys are hot. Per-key counts for the shuffle key (one map-side-
    * combined aggregate — the only corpus-sized work), then a bounded
    * summary: key count, row count, min/max per-key cardinality, the
    * hottest key (deterministic: min key among those at the max), and
    * an integer-exact skew factor ×1000 (max·n_keys·1000 div n_rows —
    * the ratio a shuffle planner compares against its salt
    * threshold). All-integer output: nothing to round, bit-exact on
    * any engine. */
  def profileKeySkew(s: SparkSession, d: String): DataFrame = {
    val perKey = t(s, d, "lineitem")
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
    // single reduce over the per-key counts: the hottest key rides the
    // same pass as an argmax on (cnt, -key) — max cnt, ties to the
    // smallest key — so the corpus aggregates exactly once
    perKey.agg(
        count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_per_key"),
        min(col("cnt")).as("min_per_key"),
        max(struct(col("cnt"), (-col("l_suppkey")).as("nk"))).as("am"))
      .select(col("n_keys"), col("n_rows"), col("max_per_key"),
        col("min_per_key"), (-col("am.nk")).as("hot_key"),
        expr("max_per_key * n_keys * 1000 div n_rows").as("skew_x1000"))
  }

  /** Wald-Wolfowitz runs test on the daily count series — "is the
    * up/down pattern random, or is there momentum/alternation": runs of
    * consecutive same-sign day-over-day changes counted exactly
    * (zero-change days dropped, documented), then the normal
    * approximation z = (R − μ)/σ from the exact integers n₊, n₋, R —
    * identical formula text both engines, one float pass. */
  def aggRunsTest(s: SparkSession, d: String): DataFrame = {
    t(s, d, "events").createOrReplaceTempView("graft_ev_runs")
    s.sql(
      """WITH dc AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x
        |  FROM graft_ev_runs GROUP BY 1
        |), sg AS (
        |  SELECT day, CASE WHEN chg > 0 THEN 1 ELSE 0 END AS up
        |  FROM (SELECT day, x - lag(x) OVER (ORDER BY day) AS chg
        |        FROM dc) t1
        |  WHERE chg IS NOT NULL AND chg <> 0
        |), rr AS (
        |  SELECT up,
        |    CASE WHEN lag(up) OVER (ORDER BY day) IS NULL
        |         OR lag(up) OVER (ORDER BY day) <> up
        |         THEN 1 ELSE 0 END AS new_run
        |  FROM sg
        |)
        |SELECT CAST(SUM(up) AS BIGINT) AS n_up,
        |  CAST(COUNT(*) - SUM(up) AS BIGINT) AS n_down,
        |  CAST(SUM(new_run) AS BIGINT) AS n_runs,
        |  ROUND((CAST(SUM(new_run) AS DOUBLE) -
        |    (2.0 * SUM(up) * (COUNT(*) - SUM(up)) / COUNT(*) + 1)) /
        |    sqrt(2.0 * SUM(up) * (COUNT(*) - SUM(up)) *
        |      (2.0 * SUM(up) * (COUNT(*) - SUM(up)) - COUNT(*)) /
        |      (CAST(COUNT(*) AS DOUBLE) * COUNT(*) * (COUNT(*) - 1))),
        |    6) AS z
        |FROM rr HAVING COUNT(*) > 1""".stripMargin)
  }

  /** Mann-Kendall trend test — the nonparametric monotone-trend
    * complement of the runs test (randomness) and changepoint (level
    * shift) over the same daily count series: S = Σ_{i<j}
    * sign(x_j − x_i) counted EXACTLY over the bounded day×day pair
    * grid (calendar-bounded, never corpus-sized), tie-corrected
    * variance from exact integer tie groups, one closing
    * continuity-corrected z. The only corpus-sized work is the daily
    * aggregate; everything after runs on |days| rows. */
  def aggMannKendall(s: SparkSession, d: String): DataFrame = {
    t(s, d, "events").createOrReplaceTempView("graft_ev_mk")
    s.sql(
      """WITH dc AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x
        |  FROM graft_ev_mk GROUP BY 1
        |), p AS (
        |  SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
        |                       WHEN b.x < a.x THEN -1
        |                       ELSE 0 END) AS BIGINT) AS s_stat,
        |    COUNT(*) AS n_pairs
        |  FROM dc a JOIN dc b ON b.day > a.day
        |), nn AS (SELECT COUNT(*) AS n FROM dc
        |), ties AS (
        |  SELECT CAST(COALESCE(SUM(tj * (tj - 1) * (2 * tj + 5)), 0)
        |    AS BIGINT) AS tie_term
        |  FROM (SELECT COUNT(*) AS tj FROM dc
        |        GROUP BY x HAVING COUNT(*) > 1) tt
        |)
        |SELECT n, s_stat, n_pairs, tie_term,
        |  ROUND((CASE WHEN s_stat > 0 THEN s_stat - 1
        |              WHEN s_stat < 0 THEN s_stat + 1
        |              ELSE 0 END)
        |    / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
        |            - tie_term) / 18.0), 6) AS z
        |FROM nn, p, ties""".stripMargin)
  }

  /** Bootstrap confidence interval for the per-priority mean order
    * value — via the POISSON bootstrap (Chamandy et al., Google 2012;
    * Kleiner et al.'s BLB is the other classic), the only bootstrap
    * shape that works at 100 TB: classic resampling draws n rows WITH
    * replacement B times (B full shuffles of the corpus); the Poisson
    * approximation instead gives every row an independent
    * Poisson(1)-distributed multiplicity in each replicate, so all
    * B = 100 replicates ride ONE scan — the ×B fan-out collapses in
    * the map-side partial aggregate to (group × B) rows and nothing
    * row-sized is ever shuffled or re-sampled.
    *
    * Determinism for the gate: the Poisson draw is seeded — a 24-bit
    * md5 prefix of (orderkey, replicate) compared against FIXED
    * integer thresholds 16777216·CDF_Poisson(1)(k), so multiplicity
    * is an all-integer decision. Replicate means are exact decimal
    * sums (cents × integer weight) with ONE closing double division,
    * and the 95% CI bounds are order statistics (3rd / 98th of the
    * 100 sorted replicate means — pure selection, no interpolated
    * quantile whose arithmetic could differ across engines). A
    * replicate whose weights all drew zero (probability ~e^-n per
    * (priority, b)) would yield sw = 0 and a NULL mean — and Spark
    * orders NULLS FIRST where DuckDB defaults NULLS LAST, so such a
    * row would silently shift the order statistics on one engine
    * only (round-8 advice); the rank ordering is therefore pinned
    * NULLS LAST EXPLICITLY on both engines, making the ranked order
    * identical by construction even in that measure-zero case. (The
    * advice's other remedy — filtering sw > 0 before ranking — was
    * tried and reverted: the filter makes the replicate weight sums
    * load-bearing for CARDINALITY, which blocks Catalyst from
    * pruning them under counting consumers and cost the bench 10 s;
    * the explicit null ordering has zero plan impact.) The
    * order-statistic window partitions by priority over at most B
    * rows per group — bounded, never corpus-sized. */
  def aggBootstrapCi(s: SparkSession, d: String): DataFrame = {
    val B = 100
    val o = t(s, d, "orders").select(col("o_orderkey"),
      col("o_orderpriority").as("priority"),
      col("o_totalprice").cast("decimal(18,2)").as("x"))
    val rep = o
      .select(col("o_orderkey"), col("priority"), col("x"),
        explode(sequence(lit(1), lit(B))).as("b"))
      .withColumn("h",
        conv(substring(md5(concat_ws("_", col("o_orderkey"), col("b"))),
          1, 6), 16, 10).cast("long"))
      .withColumn("w",
        when(col("h") < 6171992L, 0)
          .when(col("h") < 12343985L, 1)
          .when(col("h") < 15429982L, 2)
          .when(col("h") < 16458647L, 3)
          .when(col("h") < 16715813L, 4)
          .otherwise(5))
    val means = rep.groupBy(col("priority"), col("b"))
      .agg(sum(col("w")).as("sw"),
        sum(col("w") * col("x")).as("swx"))
      .select(col("priority"), col("b"),
        round(col("swx").cast("double") / col("sw"), 6).as("mean_b"))
    val byMean = org.apache.spark.sql.expressions.Window
      .partitionBy(col("priority"))
      .orderBy(col("mean_b").asc_nulls_last, col("b"))
    val ci = means.withColumn("rn", row_number().over(byMean))
      .groupBy(col("priority"))
      .agg(max(when(col("rn") === 3, col("mean_b"))).as("ci_lo"),
        max(when(col("rn") === 98, col("mean_b"))).as("ci_hi"))
    val full = o.groupBy(col("priority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("x")).cast("double") / count(lit(1)), 6)
          .as("mean_full"))
    full.join(ci, Seq("priority")).orderBy(col("priority"))
  }

  /** CUPED variance reduction (Deng et al., WSDM'13) — the standard
    * experimentation-platform adjustment: regress the experiment
    * metric (post-cut per-user value mass) on a pre-experiment
    * covariate (pre-cut activity count), θ = cov(X,Y)/var(X), and
    * report how much metric variance the adjustment removes
    * (reduction = 100·ρ² percent — smaller A/B sample sizes for the
    * same power). Cut date 2024-01-16 splits the fixture's January
    * window at every sf.
    *
    * Float discipline: per-user (X, Y) come from ONE conditional
    * aggregate (X integer count, Y exact decimal); the five moments
    * (ΣX, ΣY, ΣXY, ΣX², ΣY²) are exact integer/decimal sums, so
    * summation order cannot move a bit; the closing θ/variance
    * formulas are ONE double expression with identical text on both
    * engines, rounded once.
    *
    * Scale shape: two map-side-combined aggregates (events → users →
    * one moments row). Nothing driver-side, nothing broadcast,
    * nothing corpus-sized past the first aggregate. */
  def aggCuped(s: SparkSession, d: String): DataFrame = {
    val cut = lit("2024-01-16").cast("timestamp")
    t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(sum(when(col("ts") < cut, 1L).otherwise(0L)).as("x"),
        sum(when(col("ts") >= cut, col("value").cast("decimal(18,4)"))
          .otherwise(lit(0).cast("decimal(18,4)"))).as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .selectExpr(
        "n AS n_users",
        """ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
           CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
          (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
           CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS theta""",
        """ROUND((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
           CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) /
          (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS var_y""",
        """ROUND(((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
           CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) -
          (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
           CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) *
          (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
           CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
          (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
           CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) /
          (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS var_cuped""",
        """ROUND(100.0 *
          (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
           CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) *
          (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
           CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
          ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
            CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
           (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
            CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
          AS var_reduction_pct""")
  }

  /** Permutation test for the arm difference (Fisher randomization —
    * the assumption-free significance answer beside [[aggAbtestLift]]'s
    * point estimate): re-randomize the USER-level arm assignment
    * B = 100 times with a seeded hash, recompute the between-arm mean
    * difference each time, p = (1 + #{|diff_b| ≥ |observed|})/(B+1)
    * (the add-one form — valid at any B, never returns 0).
    * Permuting users, not events, respects the clustered
    * randomization unit — event-level shuffles understate p when a
    * user's events correlate.
    *
    * Determinism: arm draws are parity bits of 24-bit md5 prefixes
    * (observed: md5(user); replicate b: md5(user_b)); arm means are
    * exact decimal sums with one double division; the ≥ compares two
    * identically-derived doubles, so both engines count the same set.
    *
    * Scale shape: like [[aggBootstrapCi]] — all B replicates ride ONE
    * scan, the ×B fan-out collapses map-side to (B × 2 arms) rows.
    * The only corpus-sized shuffle is the per-user pre-aggregate that
    * both the observed and permuted sides reuse. */
  def aggPermutationTest(s: SparkSession, d: String): DataFrame = {
    val B = 100
    val users = t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("ne"),
        sum(col("value").cast("decimal(18,4)")).as("sv"))
      .cache()
    def armOf(seed: Column): Column =
      conv(substring(md5(seed), 1, 6), 16, 10).cast("long") % 2L
    def diffOf(df: DataFrame, grp: Seq[Column]): DataFrame =
      df.groupBy(grp: _*)
        .agg(sum(col("sv")).as("s"), sum(col("ne")).as("c"))
        .groupBy(grp.dropRight(1): _*)
        .agg(((max(when(col("arm") === 1L, col("s"))).cast("double") /
          max(when(col("arm") === 1L, col("c")))) -
          (max(when(col("arm") === 0L, col("s"))).cast("double") /
            max(when(col("arm") === 0L, col("c"))))).as("diff"))
    val obs = diffOf(users.withColumn("arm",
      armOf(col("user_id").cast("string"))), Seq(col("arm")))
    val perm = diffOf(
      users.select(col("user_id"), col("ne"), col("sv"),
        explode(sequence(lit(1), lit(B))).as("b"))
        .withColumn("arm",
          armOf(concat_ws("_", col("user_id"), col("b")))),
      Seq(col("b"), col("arm")))
    perm.crossJoin(broadcast(obs.select(col("diff").as("obs_diff"))))
      .agg(round(max(col("obs_diff")), 6).as("obs_diff"),
        sum(when(abs(col("diff")) >= abs(col("obs_diff")), 1L)
          .otherwise(0L)).as("n_ge"))
      .select(col("obs_diff"), col("n_ge"),
        // n_ge→DOUBLE first: in DuckDB a bare 1.0 is DECIMAL and
        // bigint+decimal/decimal would divide at decimal scales
        round((col("n_ge").cast("double") + lit(1.0)) / lit(101.0), 6)
          .as("p_value"))
  }

  /** Delta-method CI for a ratio metric (value per event with
    * user-level clustering — Deng et al., KDD'18's "ratio metrics"
    * recipe): R = ΣY/ΣX over per-user (X = events, Y = value mass);
    * var(R) ≈ (σ²_Y − 2R·σ_XY + R²·σ²_X)/(n·μ²_X) — the clustered
    * standard error a naive per-event variance understates. Same
    * exact-moment discipline as [[aggCuped]]: per-user integers/
    * decimals, five exact moment sums per event_type, ONE closing
    * double expression (population variances), z = 1.96 literal.
    * Two map-side-combined aggregates; output is |event_types| rows. */
  def aggDeltaRatioCi(s: SparkSession, d: String): DataFrame = {
    t(s, d, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"),
        sum(col("value").cast("decimal(18,4)")).as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .selectExpr(
        "event_type", "n AS n_users",
        "ROUND(CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE), 6) AS ratio",
        """ROUND(sqrt(
            ((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
              CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) /
             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) -
             2.0 * (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)) *
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
              CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) +
             (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)) *
             (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)) *
             (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
              CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) /
            (CAST(n AS DOUBLE) *
             (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) *
             (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))), 6) AS se""")
      .selectExpr("event_type", "n_users", "ratio", "se",
        "ROUND(ratio - 1.96 * se, 6) AS ci_lo",
        "ROUND(ratio + 1.96 * se, 6) AS ci_hi")
      .orderBy(col("event_type"))
  }

  /** Power analysis / sample-size calculation — the question every
    * experiment starts with: per event_type, how many units per arm
    * to detect a 5%-of-mean effect at α=0.05 two-sided, power 0.8:
    * n = 2σ²(z_{α/2}+z_β)²/δ². Closes the experimentation loop beside
    * [[aggAbtestLift]] (estimate), [[aggPermutationTest]]
    * (significance), [[aggCuped]] (variance reduction — rerun this
    * on the CUPED-adjusted σ² to see the sample-size saving) and
    * [[aggDeltaRatioCi]] (clustered CI).
    *
    * σ² from the usual exact decimal moments; z literals 1.96/0.8416
    * combine as EXACT decimal arithmetic in both parsers before the
    * single double expression; CEIL of identically-derived doubles.
    * One map-side-combined aggregate to |event_types| rows. */
  def aggPowerAnalysis(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).as("sy"),
        sum(col("value").cast("decimal(18,4)") *
          col("value").cast("decimal(18,4)")).as("syy"))
      .selectExpr("event_type", "n AS n_obs",
        "ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_v",
        """ROUND((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
           CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) /
          (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS sigma2""",
        """CAST(CEIL(2.0 *
           ((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
             CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) /
            (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) *
           ((1.96 + 0.8416) * (1.96 + 0.8416)) /
           ((0.05 * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))) *
            (0.05 * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))))
           AS BIGINT) AS n_per_arm""")
      .orderBy(col("event_type"))

  /** Binary-segmentation changepoint — the level-shift locator beside
    * [[Windows.windowCusum]]'s drift alarm: the split k of the daily
    * count series maximizing the between-segment fit S₁²/n₁ + S₂²/n₂
    * (equivalently the SSE drop; the constant S²/n cancels). Prefix
    * sums are integers, so each candidate's score is a ratio of exact
    * integers; candidates rank on the round-6 double with split-day
    * tiebreak — deterministic in both engines. The series is |days|
    * rows; the scan over candidate splits is a window, not a join. */
  def aggChangepointBinary(s: SparkSession, d: String): DataFrame = {
    val byT = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    val dc = t(s, d, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("t", row_number().over(byT))
      .withColumn("s1", sum(col("x")).over(
        byT.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
    val tot = dc.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    dc.crossJoin(broadcast(tot))
      .filter(col("t") < col("n"))
      .select(col("day").as("split_day"), col("t").as("n1"),
        (col("n") - col("t")).as("n2"), col("s1"),
        (col("sx") - col("s1")).as("s2"), col("n"))
      .select(col("split_day"), col("n1"), col("n2"),
        expr("ROUND(CAST(s1 AS DOUBLE) / n1, 4)").as("mean1"),
        expr("ROUND(CAST(s2 AS DOUBLE) / n2, 4)").as("mean2"),
        expr("""ROUND(CAST(s1 AS DOUBLE) * s1 / n1 +
                CAST(s2 AS DOUBLE) * s2 / n2, 6)""").as("fit"))
      .orderBy(col("fit").desc, col("split_day"))
      .limit(1)
  }

  /** Herfindahl-Hirschman concentration of user activity per event
    * type — the "is this signal dominated by a few accounts" check
    * (bot/spam triage; the scalar cousin of [[aggGini]]). HHI =
    * Σ(nᵤ/N)² computed as integer Σnᵤ² over N², one rounded division;
    * effective-participant count 1/HHI comes from the same integers.
    * Two mergeable hash aggregates, keys bounded by (type × user). */
  def aggHhi(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("nu"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("nu")).as("n_total"),
        sum(col("nu") * col("nu")).as("sum_sq"))
      .select(col("event_type"), col("n_users"), col("n_total"),
        expr("ROUND(CAST(sum_sq AS DOUBLE) / (n_total * n_total), 6)")
          .as("hhi"),
        expr("ROUND(CAST(n_total AS DOUBLE) * n_total / sum_sq, 2)")
          .as("effective_users"))
      .orderBy(col("event_type"))

  /** Kaplan-Meier survival curve over view→purchase conversion — the
    * censoring-aware version of [[aggTimeToConvert]]: users who never
    * purchase are CENSORED at the observation end, not dropped (dropping
    * them biases conversion-time estimates downward — the reason KM
    * exists). Per conversion-day t: d_t converts, n_t at risk (lifetime
    * ≥ t, converted or censored), S(t) = Π(1 − d/n). The product is
    * carried as a window SUM of per-term round-6 DECIMAL ln terms (the
    * agg_entropy discipline — order-independent, engine-exact), exp'd
    * once at the end. Terminal d = n days are filtered identically on
    * both sides (ln 0). The per-user reduction is one aggregate; the
    * curve is |distinct days| rows. */
  /** The censoring-aware per-user (lifetime, converted) relation
    * shared by [[aggSurvivalKm]] and [[aggNelsonAalen]]; registered
    * as the `graft_km` temp view. */
  private def kmLifetimesView(s: SparkSession, d: String): Unit = {
    val ev = t(s, d, "events")
    val perUser = ev
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", to_date(col("ts"))))
          .as("first_view"),
        min(when(col("event_type") === "purchase", to_date(col("ts"))))
          .as("first_purchase"))
      .crossJoin(broadcast(ev.agg(max(to_date(col("ts"))).as("obs_end"))))
      .filter(col("first_view").isNotNull)
      .select(
        when(col("first_purchase").isNotNull &&
          col("first_purchase") >= col("first_view"),
          datediff(col("first_purchase"), col("first_view")))
          .otherwise(datediff(col("obs_end"), col("first_view")))
          .as("lifetime"),
        (col("first_purchase").isNotNull &&
          col("first_purchase") >= col("first_view")).cast("int")
          .as("converted"))
    perUser.createOrReplaceTempView("graft_km")
  }

  def aggSurvivalKm(s: SparkSession, d: String): DataFrame = {
    kmLifetimesView(s, d)
    // n_risk via a REVERSE running sum over the |lifetimes|-bounded
    // histogram, NOT a correlated `COUNT(*) WHERE lifetime >= t`
    // subquery: Spark decorrelates that count into a non-equi join
    // whose only strategy is a nested-loop broadcast of the PER-USER
    // table — corpus-sized at scale (the round-10 PlanLintSpec catch).
    // The histogram is one mergeable aggregate; the window is the
    // allowed over-aggregate class (≤ |distinct days| rows).
    s.sql(
      """WITH hist AS (
        |  SELECT lifetime AS t, COUNT(*) AS n,
        |    CAST(SUM(converted) AS BIGINT) AS d
        |  FROM graft_km GROUP BY lifetime
        |), risk AS (
        |  SELECT t, d,
        |    SUM(n) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
        |  FROM hist
        |), terms AS (
        |  SELECT t, d, n_risk,
        |    CAST(ROUND(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 6)
        |      AS DECIMAL(18,6)) AS lnterm
        |  FROM risk WHERE d > 0 AND d < n_risk
        |)
        |SELECT t, d, n_risk,
        |  ROUND(exp(CAST(SUM(lnterm) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE)), 4) AS survival
        |FROM terms ORDER BY t""".stripMargin)
  }

  /** Nelson–Aalen cumulative hazard — [[aggSurvivalKm]]'s companion
    * estimator (H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ; preferred over −ln(KM) for
    * small risk sets, and the pair every survival dashboard plots
    * together). Same machinery end to end: the shared per-user
    * lifetime view, the reverse-running-sum risk counts (NOT a
    * correlated count — the round-10 PlanLintSpec catch), and the
    * per-term round-then-decimal discipline so the irrational hazard
    * increments sum order-independently cross-engine. */
  def aggNelsonAalen(s: SparkSession, d: String): DataFrame = {
    kmLifetimesView(s, d)
    s.sql(
      """WITH hist AS (
        |  SELECT lifetime AS t, COUNT(*) AS n,
        |    CAST(SUM(converted) AS BIGINT) AS d
        |  FROM graft_km GROUP BY lifetime
        |), risk AS (
        |  SELECT t, d,
        |    SUM(n) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
        |  FROM hist
        |), terms AS (
        |  SELECT t, d, n_risk,
        |    CAST(ROUND(CAST(d AS DOUBLE) / n_risk, 6)
        |      AS DECIMAL(18,6)) AS hterm
        |  FROM risk WHERE d > 0
        |)
        |SELECT t, d, n_risk,
        |  ROUND(CAST(SUM(hterm) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE), 4) AS cum_hazard
        |FROM terms ORDER BY t""".stripMargin)
  }

  /** Conditional value-at-risk (expected shortfall) at the 95% level
    * per event type — the coherent tail-risk metric reported next to
    * the plain [[aggPercentile]] quantile: the mean of the k = ⌈n/20⌉
    * largest values. Computed WITHOUT a global sort of raw rows: the
    * per-(type, value) grid (value-space bounded), a per-type
    * DESC-cumulative count, and the exact partial-bucket take
    * take = min(c, k − cum_before) clamps the tail to exactly k
    * values; the tail sum is an exact DECIMAL (values × integer
    * takes), VaR is the k-th largest grid value, CVaR one closing
    * division. */
  def aggCvar(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = t(s, d, "events")
      .groupBy(col("event_type"),
        col("value").cast("decimal(19,4)").as("v"))
      .agg(count(lit(1)).as("c"))
    val tot = grid.groupBy(col("event_type"))
      .agg(sum(col("c")).as("n"))
    val wDesc = Window.partitionBy(col("event_type"))
      .orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(broadcast(tot), "event_type")
      .withColumn("k", expr("(n + 19) DIV 20"))
      .withColumn("cum", sum(col("c")).over(wDesc))
      .withColumn("take",
        greatest(lit(0L), least(col("c"),
          col("k") - (col("cum") - col("c")))))
      .filter(col("take") > 0)
      .groupBy(col("event_type"), col("n"), col("k"))
      .agg(min(col("v")).as("var_v"),
        sum(col("v") * col("take")).as("tail_sum"))
      .select(col("event_type"), col("n"), col("k"),
        expr("CAST(var_v AS DOUBLE)").as("var_95"),
        expr("ROUND(CAST(tail_sum AS DOUBLE) / k, 4)").as("cvar_95"))
      .orderBy(col("event_type"))
  }

  /** Autocorrelation of the daily event-count series at lags 1..7 —
    * the seasonality detector (a weekly cycle shows as a lag-7 peak).
    * The estimator is cross-multiplied into pure integers:
    * r_k = Σ(n·x_t − S)(n·x_{t+k} − S) / Σ(n·x_t − S)² where S = Σx —
    * multiplying numerator and denominator by n² clears the rational
    * mean, so the single rounded division is the only float op. The
    * series is |days| rows (tiny at any corpus scale — the aggregate
    * upstream is the mergeable part); lag pairing is a self-join on the
    * dense day index. */
  def aggAutocorrelation(s: SparkSession, d: String): DataFrame = {
    val dc = t(s, d, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("t", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("day"))))
      .select(col("t"), col("x"))
    val tot = dc.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val den = dc.crossJoin(broadcast(tot))
      .select(((col("n") * col("x") - col("sx")) *
        (col("n") * col("x") - col("sx"))).as("d2"))
      .agg(sum(col("d2")).as("den"))
    val ks = s.range(1, 8).select(col("id").as("k"))
    val a = dc.select(col("t").as("ta"), col("x").as("xa"))
    val b = dc.select(col("t").as("tb"), col("x").as("xb"))
    a.crossJoin(ks)
      .join(b, col("tb") === col("ta") + col("k"))
      .crossJoin(broadcast(tot))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("n") * col("xa") - col("sx")) *
          (col("n") * col("xb") - col("sx"))).as("num"))
      .crossJoin(broadcast(den))
      .filter(col("den") > 0)
      .select(col("k"), col("n_pairs"),
        expr("ROUND(CAST(num AS DOUBLE) / den, 6)").as("acf"))
      .orderBy(col("k"))
  }

  /** Rare-category collapse — the cardinality cap every feature
    * pipeline applies before one-hot/embedding: categories (users)
    * below a support floor fold into 'other'. Two aggregates: the
    * support table is category-sized (grows with the corpus, so it
    * joins by plain shuffle — the text_pmi lesson: never broadcast a
    * corpus-growing relation; AQE may still choose broadcast when the
    * runtime size allows), then one re-aggregate over the capped label
    * space. */
  def aggRareCollapse(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(col("user_id"), col("value").cast("decimal(18,4)").as("vq"))
    val support = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_user"))
    ev.join(support, "user_id")
      .select(when(col("n_user") >= 70, col("user_id").cast("string"))
        .otherwise(lit("other")).as("category"), col("vq"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("vq")), 2).cast("double").as("sum_value"))
      .orderBy(col("category"))
  }

  /** Welch's two-sample t-test between the value distributions of two
    * event types — the mean-shift drift test beside [[aggKsTest]]'s
    * distributional one. The sufficient statistics (n, Σx, Σx²) are
    * EXACT decimal sums from one conditional hash aggregate (a single
    * scan, mergeable at any scale); the t statistic and
    * Welch–Satterthwaite df are the only float ops, computed from
    * identical exact inputs with identical formula text — so both
    * engines run the same IEEE sequence. */
  def aggTTest(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(
        when(col("event_type") === "view", 1L).otherwise(0L).as("is1"),
        col("value").cast("decimal(18,4)").as("vq"))
    val zero = lit(0).cast("decimal(18,4)")
    val zero2 = lit(0).cast("decimal(37,8)")
    base.agg(
      sum(col("is1")).as("n1"),
      (count(lit(1)) - sum(col("is1"))).as("n2"),
      sum(when(col("is1") === 1, col("vq")).otherwise(zero)).as("sx1q"),
      sum(when(col("is1") === 0, col("vq")).otherwise(zero)).as("sx2q"),
      sum(when(col("is1") === 1, col("vq") * col("vq")).otherwise(zero2))
        .as("sxx1q"),
      sum(when(col("is1") === 0, col("vq") * col("vq")).otherwise(zero2))
        .as("sxx2q"))
      .select(col("n1"), col("n2"),
        expr("CAST(sx1q AS DOUBLE)").as("sx1"),
        expr("CAST(sx2q AS DOUBLE)").as("sx2"),
        expr("CAST(sxx1q AS DOUBLE)").as("sxx1"),
        expr("CAST(sxx2q AS DOUBLE)").as("sxx2"))
      .select(col("n1"), col("n2"),
        expr("ROUND(sx1 / n1, 4)").as("mean1"),
        expr("ROUND(sx2 / n2, 4)").as("mean2"),
        expr("""ROUND((sx1 / n1 - sx2 / n2) /
          sqrt(((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1 +
               ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2), 6)""")
          .as("t_stat"),
        expr("""ROUND((((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1 +
                 ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2) *
                (((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1 +
                 ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2) /
                ((((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1) *
                 (((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1) / (n1 - 1) +
                 (((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2) *
                 (((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2) / (n2 - 1)), 3)""")
          .as("df_welch"))
  }

  /** Population Stability Index — THE production feature-drift gate:
    * decile edges fit on the baseline period (first half-month), both
    * bucketed by the same edges, PSI contribution per bucket. Bucketing
    * compares raw doubles against edge values drawn FROM the data
    * (quantile_disc semantics — rank-exact at gate accuracy), so the
    * integer bucket counts match across engines exactly; the only float
    * math is the add-one-smoothed contribution from those exact counts.
    * One scan + one 10-row aggregate; edges ride a broadcast 1-row
    * cross join (no driver collect). */
  def profileDriftPsi(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(dayofmonth(col("ts")).as("dom"), col("value").as("v"))
    val edges = ev.filter(col("dom") <= 15)
      .agg(expr(
        "approx_percentile(v, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D), 1000000)")
        .as("edges"))
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    ev.crossJoin(broadcast(edges))
      .select(col("dom"),
        expr("aggregate(edges, 1, (acc, e) -> acc + CASE WHEN v > e THEN 1 ELSE 0 END)")
          .as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("dom") <= 15, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("dom") > 15, 1L).otherwise(0L)).as("n_b"))
      .withColumn("tot_a", sum(col("n_a")).over(w))
      .withColumn("tot_b", sum(col("n_b")).over(w))
      .select(col("bucket"), col("n_a"), col("n_b"),
        expr("""ROUND(((n_a + 1.0) / (tot_a + 10.0) -
                 (n_b + 1.0) / (tot_b + 10.0)) *
                ln(((n_a + 1.0) / (tot_a + 10.0)) /
                   ((n_b + 1.0) / (tot_b + 10.0))), 6)""").as("psi_c"))
      .orderBy(col("bucket"))
  }

  /** Chi-square independence test between event type and day-of-week —
    * the data-drift / feature-dependence screen: χ² = Σ (O−E)²/E over
    * the contingency cells, computed from EXACT integer marginals via
    * the cross-multiplied identity (N·n − r·c)² / (N·r·c) so no
    * fractional expected value is ever materialized; each cell's term
    * rounds to 6 then sums in DECIMAL (the order-independence
    * discipline). Cells are |types|×7 — bounded — so the three
    * marginal aggregates and the final join all stay tiny after one
    * (type, dow) hash aggregate over the data. */
  def aggChi2Independence(s: SparkSession, d: String): DataFrame = {
    val cells = t(s, d, "events")
      .groupBy(col("event_type"), dayofweek(col("ts")).as("dow"))
      .agg(count(lit(1)).as("n"))
    val rowT = cells.groupBy(col("event_type")).agg(sum(col("n")).as("r"))
    val colT = cells.groupBy(col("dow")).agg(sum(col("n")).as("c"))
    val nTot = cells.agg(sum(col("n")).as("nn"))
    val dof = cells.agg(((countDistinct(col("event_type")) - 1) *
      (countDistinct(col("dow")) - 1)).as("dof"))
    cells.join(broadcast(rowT), "event_type")
      .join(broadcast(colT), "dow")
      .crossJoin(broadcast(nTot))
      .withColumn("diff",
        (col("nn") * col("n") - col("r") * col("c")).cast("double"))
      .withColumn("term",
        round(col("diff") * col("diff") /
          (col("nn").cast("double") * col("r") * col("c")), 6)
          .cast("decimal(20,6)"))
      .agg(count(lit(1)).as("n_cells"), sum(col("term")).as("t"))
      .crossJoin(broadcast(dof))
      .select(col("n_cells"), col("dof"),
        round(col("t").cast("double"), 4).as("chi2"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) with tie-corrected normal
    * approximation — the nonparametric two-sample location test that
    * complements [[aggTTest]] (parametric) and [[aggKsTest]] (full
    * distribution): does l_quantity differ between returned ('A') and
    * rejected ('R') lineitems? l_quantity takes ≤50 integer values, so
    * ties dominate and the tie machinery is genuinely exercised.
    *
    * All arithmetic is integer until ONE closing double expression:
    * the corpus collapses to per-value (c1, c2) counts in one hash
    * aggregate; average ranks are kept doubled so they stay integral
    * (value with t ties starting after cb predecessors has doubled
    * avg rank 2·cb + t + 1); the doubled rank-sum identity gives
    * 2·U1 = Σc1·(2cb+t+1) − n1(n1+1) exactly (U1 itself can be a
    * half-integer under ties, so the gate exposes u1_doubled); the
    * tie term Σ(t³−t) feeds the corrected variance
    * n1·n2/12 · [(n+1) − T/(n(n−1))]. The ordered window runs over
    * the ≤50-row aggregate (the allowed post-aggregate class). */
  def aggMannWhitney(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perV = t(s, d, "lineitem")
      .filter(col("l_returnflag").isin("A", "R"))
      .groupBy(col("l_quantity").cast("long").as("q"))
      .agg(sum(when(col("l_returnflag") === "A", 1L).otherwise(0L)).as("c1"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("c2"))
    val w = Window.orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perV
      .withColumn("t", col("c1") + col("c2"))
      .withColumn("cb", coalesce(sum(col("t")).over(w), lit(0L)))
      .agg(
        sum(col("c1")).as("n1"),
        sum(col("c2")).as("n2"),
        sum(col("c1") * (lit(2) * col("cb") + col("t") + 1)).as("r1d"),
        sum(col("t") * col("t") * col("t") - col("t")).as("tie_term"))
      .withColumn("u1_doubled",
        col("r1d") - col("n1") * (col("n1") + 1))
      .select(col("n1"), col("n2"), col("u1_doubled"), col("tie_term"),
        expr("""ROUND((u1_doubled - CAST(n1 AS DOUBLE) * n2) /
                (2 * SQRT((CAST(n1 AS DOUBLE) * n2 / 12) *
                  ((n1 + n2 + 1) - CAST(tie_term AS DOUBLE) /
                   (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))), 6)""")
          .as("z"))
  }

  /** Stratified treatment-effect table — the observational-eval
    * companion to [[aggCuped]]/[[aggSrmCheck]]: per-user hash-assigned
    * arms, outcome = purchase value mass, stratified by the
    * ACTIVITY-bucket confounder so the per-stratum diff-in-means is
    * computed between comparable users (the blocking/stratification
    * estimator; Neyman weights are the published n_t+n_c per row).
    * Strata are bit-length buckets of the per-user event count (the
    * [[aggExpHistogram]] idiom) — integer, bounded ~10, no global
    * sort. Decimal-exact outcome sums per (stratum, arm); counts
    * integer; each mean/diff is ONE closing double expression.
    * Corpus-sized work = one user-level hash aggregate. */
  def aggStratifiedEffect(s: SparkSession, d: String): DataFrame = {
    val zero = lit(0).cast("decimal(18,4)")
    val perU = t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"),
        sum(when(col("event_type") === "purchase",
          col("value").cast("decimal(18,4)")).otherwise(zero)).as("y"))
      .select(
        expr("length(bin(n_ev))").as("stratum"),
        expr("""CAST(conv(substring(md5(concat('exp1|',
          |CAST(user_id AS STRING))), 1, 6), 16, 10) AS BIGINT) % 2"""
          .stripMargin.replace("\n", " ")).as("arm"),
        col("y").cast("decimal(18,4)").as("y"))
    perU.groupBy(col("stratum"))
      .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("arm") === 1, col("y")).otherwise(zero)).as("y_t"),
        sum(when(col("arm") === 0, col("y")).otherwise(zero)).as("y_c"))
      .filter(col("n_t") > 0 && col("n_c") > 0)
      .select(col("stratum"), col("n_t"), col("n_c"),
        expr("ROUND(CAST(y_t AS DOUBLE) / n_t, 4)").as("mean_t"),
        expr("ROUND(CAST(y_c AS DOUBLE) / n_c, 4)").as("mean_c"),
        expr("ROUND(CAST(y_t AS DOUBLE) / n_t - " +
          "CAST(y_c AS DOUBLE) / n_c, 6)").as("diff"))
      .orderBy(col("stratum"))
  }

  /** One-way ANOVA F — the k-group mean comparison completing the
    * two-sample tests ([[aggTTest]] parametric, [[aggMannWhitney]]
    * rank-based): does mean l_quantity differ across the three
    * return-flag groups? Group moments (n_g, Σx, Σx²) are EXACT
    * integers (x ≤ 50 so x² ≤ 2500); the only non-integer quantity,
    * Σ_g (Σx)²/n_g, follows the house decimal-sum discipline —
    * per-group round@8 into DECIMAL so the 3-term sum is
    * order-independent — and SSB/SSW/F close in ONE double expression
    * with identical text on both engines. The corpus collapses in one
    * hash aggregate; everything after runs on ≤3 rows. */
  def aggAnovaF(s: SparkSession, d: String): DataFrame = {
    val g = t(s, d, "lineitem")
      .select(col("l_returnflag").as("grp"),
        col("l_quantity").cast("long").as("x"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_g"), sum(col("x")).as("s_g"),
        sum(col("x") * col("x")).as("ss_g"))
    g.select(col("n_g"), col("s_g"), col("ss_g"),
        expr("CAST(ROUND(CAST(s_g AS DOUBLE) * s_g / n_g, 8) " +
          "AS DECIMAL(28,8))").as("term"))
      .agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(col("s_g")).as("s"), sum(col("ss_g")).as("ss"),
        sum(col("term")).as("a"))
      .select(col("k"), col("n"), col("s"), col("ss"),
        expr("""ROUND(((CAST(a AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                 / (k - 1)) /
                ((ss - CAST(a AS DOUBLE)) / (n - k)), 6)""").as("f_stat"))
  }

  /** Pivot: one output column per l_linestatus value. The value list is
    * given explicitly — at scale an implicit pivot adds a distinct-value
    * job; explicit values keep it a single pass. */
  def aggPivot(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum(col("l_quantity")), 2))
      .withColumnsRenamed(Map("F" -> "qty_f", "O" -> "qty_o"))
      .orderBy(col("l_returnflag"))

  /** Exact percentiles (linear interpolation — same definition as
    * DuckDB's quantile_cont). */
  def aggPercentile(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 2).as("p99"))
      .orderBy(col("o_orderpriority"))

  /** Typed Dataset[T] aggregation: groupByKey over a case class with
    * typed aggregators — same physical plan as the untyped version
    * (hash aggregate, partial+final), with compile-time field safety. */
  def aggTypedDataset(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    t(s, d, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .as[LineSlice]
      .groupByKey(_.l_returnflag)
      .agg(
        TypedAggs.sumQty.toColumn.name("sum_qty"),
        TypedAggs.avgPrice.toColumn.name("avg_price"))
      .select(col("key").as("l_returnflag"),
        round(col("sum_qty"), 2).as("sum_qty"),
        round(col("avg_price"), 2).as("avg_price"))
      .orderBy(col("l_returnflag"))
  }

  /** UNPIVOT (melt): wide per-priority metrics back to long form. */
  def aggUnpivot(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        round(sum(col("o_totalprice")), 2).as("sum_price"),
        round(avg(col("o_totalprice")), 2).as("avg_price"),
        count(lit(1)).cast("double").as("cnt"))
      .unpivot(
        Array(col("o_orderpriority")),
        Array(col("sum_price"), col("avg_price"), col("cnt")),
        "metric", "value")
      .orderBy(col("o_orderpriority"), col("metric"))

  /** Bitwise aggregates (bit_and / bit_or / bit_xor) — one long of
    * state per group regardless of input size; partial+final combine
    * like any hash aggregate. */
  def aggBitwise(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        bit_and(col("o_orderkey")).as("ba"),
        bit_or(col("o_orderkey")).as("bo"),
        bit_xor(col("o_orderkey")).as("bx"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** Fixed-width histogram: the bucket id is a pure projection, so the
    * plan is scan → map → hash agg — one shuffle carrying |buckets|
    * rows. At 100 TB this is the histogram recipe that works (never
    * sort, never window); bounds chosen ahead of time or from a cheap
    * approx min/max pre-pass. */
  def aggHistogram(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(
        least(floor(col("o_totalprice") / 50000.0), lit(11.0))
          .cast("int").as("bucket"),
        col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
      .orderBy(col("bucket"))

  /** Arg-extremes (max_by / min_by): the key of the row holding the
    * extreme value — one pass, no join-back. Deterministic on this
    * fixture (no per-group price ties at any sf, verified). */
  def aggArgExtremes(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        max_by(col("o_orderkey"), col("o_totalprice")).as("top_order"),
        min_by(col("o_orderkey"), col("o_totalprice")).as("bottom_order"),
        round(max(col("o_totalprice")), 2).as("top_price"))
      .orderBy(col("o_orderpriority"))

  /** Two-stage salted aggregation over a hot key (events has only a
    * handful of event_type values — the classic skewed-reducer shape).
    * Stage 1 aggregates on (key, salt) spreading each hot key over 8
    * reducers; stage 2 combines the partials. Exact for additive
    * aggregates, so the oracle is the plain GROUP BY. */
  def aggSkewSalted(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .withColumn("__salt",
        graft.ingest.Skew.salt(8, col("event_id")))
      .groupBy(col("event_type"), col("__salt"))
      .agg(sum(col("value")).as("pv"), count(lit(1)).as("pc"))
      .groupBy(col("event_type"))
      .agg(round(sum(col("pv")).cast("decimal(18,4)"), 2)
        .cast("double").as("sum_value"),
        sum(col("pc")).as("n"))
      .orderBy(col("event_type"))

  /** Ordered string aggregation (LISTAGG/string_agg shape): collect,
    * sort numerically, join — deterministic because the order-by key is
    * explicit, unlike a bare collect_list. */
  def aggStringConcat(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .groupBy(col("c_nationkey"))
      .agg(concat_ws(",",
        transform(sort_array(collect_list(col("c_custkey"))),
          x => x.cast("string"))).as("ids"),
        count(lit(1)).as("n"))
      .orderBy(col("c_nationkey"))

  /** FILTER clause on aggregates + boolean aggregates (SQL surface) —
    * conditional aggregation without self-joins or CASE pyramids; still
    * one partial+final hash aggregate. */
  def aggFilterClause(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("graft_agg_filter")
    s.sql(
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        |  ROUND(COALESCE(sum(o_totalprice)
        |    FILTER (WHERE o_orderstatus = 'F'), 0), 2) AS sum_f,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bool_or(o_orderstatus = 'P') AS any_pending
        |FROM graft_agg_filter
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** HLL sketch — approximate, no oracle (rows-only check). */
  def aggApproxDistinctHll(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .orderBy(col("l_returnflag"))

  /** Deterministic per-group mode (most frequent value, smallest value
    * winning ties — Spark's and DuckDB's native `mode()` are both
    * tie-nondeterministic, so the portable shape is count + rank):
    * count is one hash aggregate, the argmax is WindowGroupLimit (a
    * 1-row heap per group before any final shuffle). */
  def aggMode(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byFreq = Window.partitionBy(col("event_type"))
      .orderBy(col("n").desc, col("user_id").asc)
    t(s, d, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(byFreq))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("user_id").as("mode_user"), col("n"))
      .orderBy(col("event_type"))
  }

  /** Count-min sketch — the mergeable heavy-hitters summary (bounded
    * memory per group regardless of key cardinality; sketches from
    * different partitions/days merge associatively, which is what makes
    * it a 100 TB aggregation primitive). Seeded → deterministic bytes;
    * no DuckDB equivalent, so rows-only here and the estimate-vs-exact
    * bounds are asserted in AggregateSpec by deserializing the sketch. */
  def aggCountMinSketch(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("hex(count_min_sketch(l_suppkey, 0.01d, 0.95d, 42)) as cms_hex"))
      .orderBy(col("l_returnflag"))

  /** HLL sketch build + MERGE — the property that makes sketches a
    * 100 TB primitive: per-group sketches (one hash aggregate) union
    * associatively into the global distinct estimate WITHOUT re-reading
    * data (the Datasketches HLL registers are max-merged, so building
    * per partition/day and merging later equals building once over
    * everything). Output: per-group estimates plus the merged ALL row.
    * No DuckDB oracle (no sketch equivalent) — AggregateSpec asserts
    * the estimates against exact distinct counts. */
  def aggHllUnion(s: SparkSession, d: String): DataFrame = {
    val perGroup = t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey"), 12).as("sk"))
    val union = perGroup
      .agg(hll_union_agg(col("sk")).as("sk"))
      .select(lit("ALL").as("l_returnflag"),
        hll_sketch_estimate(col("sk")).as("approx_parts"))
    perGroup
      .select(col("l_returnflag"), hll_sketch_estimate(col("sk")).as("approx_parts"))
      .unionByName(union)
      .orderBy(col("l_returnflag"))
  }

  /** Derived-check gate row for [[aggApproxDistinctHll]] (round 6): the
    * HLL estimate has no DuckDB equivalent, so the gate emits the EXACT
    * per-group distinct count (oracle-able) plus the estimator's error
    * bound as a boolean — rsd 0.02 makes |approx − exact| ≤ 5% · exact
    * hold with enormous margin on the fixture, deterministically (HLL
    * is seed-free and order-independent). The raw estimate surface
    * stays available as [[aggApproxDistinctHll]]. */
  def aggApproxDistinctHllCheck(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx") - col("exact_parts")).cast("double") <=
          col("exact_parts").cast("double") * 0.05).as("within_5pct"))
      .orderBy(col("l_returnflag"))

  /** Derived-check gate row for [[aggHllUnion]] (round 6): pins the
    * property that makes sketches a 100 TB primitive — per-group
    * sketches union-merged estimate what one build over the whole
    * table estimates. NOT pinned as exact equality: measured on the
    * fixture, the Datasketches union operator returns a sketch in a
    * different internal mode (union targets HLL_8 and re-coupons),
    * so its estimate differs from the directly-built sketch by a
    * fraction of a percent even over identical data. The invariant
    * emitted (`merge_consistent`, ALL row) is |merged − direct| ≤
    * 5% · direct — deterministic, and red if merge ever diverges
    * structurally — plus per-group exact distinct counts and the 5%
    * error bound vs exact. */
  def aggHllUnionCheck(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val perGroup = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey"), 12).as("sk"),
        countDistinct(col("l_partkey")).as("exact_parts"))
    val direct = li.agg(hll_sketch_agg(col("l_partkey"), 12).as("dsk"),
      countDistinct(col("l_partkey")).as("exact_all"))
    val allRow = perGroup.agg(hll_union_agg(col("sk")).as("msk"))
      .crossJoin(direct)
      .select(lit("ALL").as("l_returnflag"),
        col("exact_all").as("exact_parts"),
        (abs(hll_sketch_estimate(col("msk")) - col("exact_all"))
          .cast("double") <= col("exact_all").cast("double") * 0.05)
          .as("within_5pct"),
        (abs(hll_sketch_estimate(col("msk")) -
          hll_sketch_estimate(col("dsk"))).cast("double") <=
          hll_sketch_estimate(col("dsk")).cast("double") * 0.05)
          .as("merge_consistent"))
    perGroup
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(hll_sketch_estimate(col("sk")) - col("exact_parts"))
          .cast("double") <= col("exact_parts").cast("double") * 0.05)
          .as("within_5pct"),
        lit(true).as("merge_consistent"))
      .unionByName(allRow)
      .orderBy(col("l_returnflag"))
  }

  /** Audience-overlap estimation via HLL inclusion–exclusion —
    * |A∩B| ≈ est(A) + est(B) − est(A∪B) over the viewer and purchaser
    * user sets: the sketch-only answer to "how much do these two
    * segments overlap" that a 100 TB pipeline computes WITHOUT ever
    * shuffling a user set (three lgK=12 sketches, each a map-side
    * partial + one 4 KB merge; the union sketch merges the other two
    * for free). Intersection via inclusion–exclusion compounds the
    * three estimators' errors, so the derived-check bound is the SUM
    * of the per-sketch 5% envelopes (0.05·(|A|+|B|+|A∪B|)) — the
    * standard caveat that i-e degrades for small overlaps, pinned as
    * a gate boolean rather than hidden.
    *
    * Derived-check discipline (round 6): estimates have no DuckDB
    * equivalent; the gate row carries the EXACT side (distinct
    * viewers, purchasers, union, and the true intersection from a
    * distinct-key equi-join — fixture-scale harness work; production
    * reads the sketch columns) plus the theory-pinned boolean. */
  def aggHllIntersectionCheck(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val a = ev.filter(col("event_type") === "view")
      .agg(hll_sketch_agg(col("user_id"), 12).as("ska"),
        countDistinct(col("user_id")).as("exact_a"))
    val b = ev.filter(col("event_type") === "purchase")
      .agg(hll_sketch_agg(col("user_id"), 12).as("skb"),
        countDistinct(col("user_id")).as("exact_b"))
    val u = ev.filter(col("event_type").isin("view", "purchase"))
      .agg(hll_sketch_agg(col("user_id"), 12).as("sku"),
        countDistinct(col("user_id")).as("exact_union"))
    val inter = ev.filter(col("event_type") === "view")
      .select(col("user_id")).distinct()
      .join(ev.filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct(), Seq("user_id"))
      .agg(count(lit(1)).as("exact_intersection"))
    a.crossJoin(b).crossJoin(u).crossJoin(inter)
      .select(col("exact_a"), col("exact_b"), col("exact_union"),
        col("exact_intersection"),
        (abs(hll_sketch_estimate(col("ska")) +
          hll_sketch_estimate(col("skb")) -
          hll_sketch_estimate(col("sku")) -
          col("exact_intersection")).cast("double") <=
          (col("exact_a") + col("exact_b") + col("exact_union"))
            .cast("double") * 0.05)
          .as("ie_within_bound"))
  }

  /** Derived-check gate row for [[aggCountMinSketch]] (round 6): the
    * sketch bytes are seed-determined but opaque to DuckDB, so the gate
    * probes the sketch for three fixed keys (suppkeys 1–3, present at
    * every sf) and pins the CMS contract — estimates never undercount,
    * and overcount is bounded by eps·N (eps = 0.01, N = group rows;
    * deterministic for the fixed seed) — against exact per-group
    * conditional counts the oracle recomputes. Deserialization uses
    * Spark's own CountMinSketch codec; three rows pay the UDF, the
    * sketch build stays a codegen'd aggregate. */
  def aggCountMinSketchCheck(s: SparkSession, d: String): DataFrame = {
    val estimate = udf((b: Array[Byte], key: Long) =>
      org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(b)).estimateCount(key))
    val g = t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("count_min_sketch(CAST(l_suppkey AS BIGINT), 0.01d, 0.95d, 42)")
          .as("sk"),
        count(lit(1)).as("n_rows"),
        count(when(col("l_suppkey") === 1, true)).as("exact_s1"),
        count(when(col("l_suppkey") === 2, true)).as("exact_s2"),
        count(when(col("l_suppkey") === 3, true)).as("exact_s3"))
    val bound = col("n_rows").cast("double") * 0.01
    def ok(i: Int) = {
      val est = estimate(col("sk"), lit(i.toLong))
      est >= col(s"exact_s$i") &&
        (est - col(s"exact_s$i")).cast("double") <= bound
    }
    g.select(col("l_returnflag"), col("n_rows"),
        col("exact_s1"), col("exact_s2"), col("exact_s3"),
        (ok(1) && ok(2) && ok(3)).as("cms_bounds_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** Conversion funnel (ClickHouse windowFunnel semantics, strictly
    * ordered first-reach): per user, t1 = first view, t2 = first click
    * at/after t1, t3 = first purchase at/after t2; `reached` = deepest
    * stage. ONE shuffle: per-type sorted timestamp arrays aggregate per
    * user (collect_list partials combine map-side), then every stage
    * resolves inside the row with HOF filters — no self-joins, no
    * window passes. Each lambda references only bound columns (the
    * HOF-lambda rule, PERF.md). Per-user state is the user's own event
    * count; at 100 TB a per-user cap (slice before sort) bounds skew
    * from bot users — the fixture needs none. */
  def aggFunnel(s: SparkSession, d: String): DataFrame = {
    def stageTs(tpe: String) = sort_array(collect_list(
      when(col("event_type") === tpe, unix_micros(col("ts")))))
    t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(stageTs("view").as("va"), stageTs("click").as("ca"),
        stageTs("purchase").as("pa"))
      .withColumn("t1", expr("try_element_at(va, 1)"))
      .withColumn("t2", expr("try_element_at(filter(ca, x -> x >= t1), 1)"))
      .withColumn("t3", expr("try_element_at(filter(pa, x -> x >= t2), 1)"))
      .select(col("user_id"), col("t1"), col("t2"), col("t3"),
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1)
          .otherwise(0).as("reached"))
      .orderBy(col("user_id"))
  }

  /** Cohort retention (day-1 / day-7): users grouped by their first
    * active DATE; for each cohort, how many came back exactly one /
    * seven days later. ONE shuffle on user_id: collect_set(day)
    * per user (set partials merge map-side; day grain bounds the set
    * at #active-days regardless of event volume), then anchor and
    * return flags are array lookups inside the row, and only the tiny
    * per-cohort rollup re-partitions. A distinct-pairs + join-back
    * formulation was rejected: distinct partitions on (user, day), so
    * the per-user anchor re-shuffles — two corpus exchanges instead of
    * one. */
  def aggRetention(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id"))
      .agg(collect_set(col("day")).as("days"))
      .withColumn("cohort", array_min(col("days")))
      .select(col("cohort"),
        array_contains(col("days"), date_add(col("cohort"), 1)).as("d1"),
        array_contains(col("days"), date_add(col("cohort"), 7)).as("d7"))
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("d1"), 1L).otherwise(0L)).as("n_day1"),
        sum(when(col("d7"), 1L).otherwise(0L)).as("n_day7"))
      .orderBy(col("cohort"))

  /** Event-sequence pattern match (ClickHouse sequenceMatch shape):
    * each user's history collapses to an ordered initial-letter string
    * (v/c/p/s/e — first letters are unique in this event vocabulary),
    * then sequence questions become string questions: "did view→click→
    * purchase happen in order" is one regex, "how many direct
    * view→click transitions" is a substring count. One shuffle
    * (collect_list partials combine map-side); ordering ties break on
    * (micros, event_id) so the sequence string is deterministic. */
  def aggSequenceMatch(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(
          unix_micros(col("ts")).as("us"), col("event_id").as("eid"),
          substring(col("event_type"), 1, 1).as("c")))),
        x => x.getField("c")), "").as("seq"))
      .select(col("user_id"), col("seq"),
        col("seq").rlike("v.*c.*p").as("funnel_matched"),
        ((length(col("seq")) -
          length(regexp_replace(col("seq"), "vc", ""))) / 2)
          .cast("long").as("n_view_click"))
      .orderBy(col("user_id"))

  /** Exact distinct counting via bucketed BITMAPS (Spark 4 bitmap_*):
    * ids map to (bucket, bit) and each (group, bucket) builds a bitmap
    * that partial aggregation merges MAP-SIDE — unlike
    * `count(DISTINCT)`, which expands rows and re-shuffles raw ids.
    * The shuffle then carries one bitmap per (group, bucket) per task,
    * and the final rollup sums per-bucket cardinalities. The exact
    * answer with HLL's aggregation shape — this is how
    * ClickHouse/Doris-style engines make exact distinct scale, and it
    * stays correct under ANY re-aggregation (bitmaps OR-merge). */
  def aggBitmapDistinct(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"),
        bitmap_bucket_number(col("user_id")).as("bucket"))
      .agg(bitmap_construct_agg(bitmap_bit_position(col("user_id")))
        .as("bm"))
      .groupBy(col("event_type"))
      .agg(sum(bitmap_count(col("bm"))).as("n_distinct_users"))
      .orderBy(col("event_type"))

  /** Statistical outlier detection — per-group z-score flagging, the
    * cheap anomaly gate a telemetry pipeline runs before alerting.
    * Values are quantized to DECIMAL(19,4) so the per-group moment
    * sums (Σv, Σv²) are EXACT and order-independent; mean/sd/z are
    * then plain double math on exact inputs (bit-identical across
    * engines — a double Σv² would hash-differ by reduction order).
    * Scale shape: one hash-aggregate shuffle carrying 2 decimals per
    * group, then the tiny stats table broadcasts back onto the scan —
    * the corpus itself never reshuffles, and the anomaly filter
    * happens map-side in the joined stage. */
  def anomalyZscore(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(col("event_id"), col("event_type"),
        col("value").cast("decimal(19,4)").as("vq"))
    val stats = ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("vq")).as("sx"),
      sum(col("vq") * col("vq")).as("sxx"))
    ev.join(broadcast(stats), "event_type")
      // Degenerate-group guards pinned identically in the oracle: a
      // single-row group has n-1 = 0 and a constant group has sd = 0;
      // cross-engine /0.0 semantics differ (NULL vs inf), so both
      // emit no outliers by definition.
      .filter(col("n") > 1)
      .withColumn("mean", col("sx").cast("double") / col("n"))
      .withColumn("sd", sqrt(
        (col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double") / col("n")) /
          (col("n") - lit(1))))
      .filter(col("sd") > 0)
      .withColumn("z", (col("vq").cast("double") - col("mean")) / col("sd"))
      .filter(abs(col("z")) > 2.5)
      .select(col("event_id"), col("event_type"),
        col("vq").cast("double").as("value_q"), round(col("z"), 3).as("z"))
      .orderBy(col("event_id"))
  }

  /** Shannon entropy of each user's event-type distribution — the
    * diversity/behavioral-quality signal (bots spike one type, entropy
    * ~0; organic traffic spreads). H = ln(n) − Σ c·ln(c) / n computed
    * from EXACT integer counts, with the single irrational term per
    * group (Σ c·ln c) assembled from per-type ln values rounded → cast
    * to decimal BEFORE the sum, so the aggregation is order-independent
    * across engines. Two hash aggregates, both shuffling only
    * (user, type) / user keys — unbounded-cardinality safe. */
  def aggEntropy(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .withColumn("clnc",
        round(col("c") * log(col("c").cast("double")), 6)
          .cast("decimal(20,6)"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_types"),
        sum(col("clnc")).as("sum_clnc"))
      .select(col("user_id"), col("n"), col("n_types"),
        round(log(col("n").cast("double")) -
          col("sum_clnc").cast("double") / col("n"), 4).as("entropy"))
      .orderBy(col("user_id"))

  /** Robust outlier detection — the median/MAD complement to
    * [[anomalyZscore]] (mean/sd break down when the outliers
    * themselves inflate the moments; the median absolute deviation
    * does not). Two grouped exact medians (Spark `median` and DuckDB
    * `median` both interpolate the middle pair — the same IEEE
    * average of the same two values), then the 1.4826·MAD-normalized
    * robust score per row. Scale shape: medians need a per-group
    * sort — at 100 TB swap `median` for `approx_percentile(0.5)`
    * (same plan, mergeable sketch, no sort); flagging joins the tiny
    * per-type stats table back via broadcast, the corpus never
    * reshuffles. */
  def windowMadOutlier(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(col("event_id"), col("event_type"),
        col("value").cast("decimal(19,4)").cast("double").as("v"))
    val med = ev.groupBy(col("event_type"))
      .agg(median(col("v")).as("med"))
    val mad = ev.join(broadcast(med), "event_type")
      .groupBy(col("event_type"))
      .agg(first(col("med")).as("med"),
        median(abs(col("v") - col("med"))).as("mad"))
    ev.join(broadcast(mad), "event_type")
      // A group where >half the values equal the median has MAD = 0;
      // Spark's x/0.0 and DuckDB's diverge (NULL-dropped vs inf-
      // flagged), so pin the semantics: degenerate groups emit no
      // outliers. Same filter in the oracle SQL.
      .filter(col("mad") > 0)
      .withColumn("score",
        abs(col("v") - col("med")) / (col("mad") * lit(1.4826)))
      .filter(col("score") > 3.5)
      .select(col("event_id"), col("event_type"), col("v").as("value_q"),
        round(col("score"), 3).as("robust_z"))
      .orderBy(col("event_id"))
  }

  /** Gini concentration of per-user activity within each event type —
    * the inequality signal ("do a few bots generate most clicks?").
    * Inputs are INTEGER event counts, so every sum is exact; the rank
    * weighting uses the deterministic (count, user_id) total order and
    * the closed form G = (2·Σ rᵢxᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ), with one
    * final double division. One count aggregate, one per-type window
    * rank, one closing aggregate — all shuffling bounded keys. */
  def aggGini(s: SparkSession, d: String): DataFrame = {
    val byCount = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("x"), col("user_id"))
    t(s, d, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"))
      .withColumn("r", row_number().over(byCount))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("total"),
        sum(col("r") * col("x")).as("rx"))
      .select(col("event_type"), col("n_users"), col("total"),
        round((lit(2) * col("rx") - (col("n_users") + lit(1)) * col("total"))
          .cast("double") /
          (col("n_users") * col("total")).cast("double"), 6).as("gini"))
      .orderBy(col("event_type"))
  }

  /** Heavy hitters via the two-pass sketch-then-verify recipe: pass 1
    * runs the [[TypedAggs.misraGries]] bounded-state sketch (≤ m
    * counters per task, mergeable map-side), whose guarantee is that
    * every token with true frequency > n/(m+1) is in the sketch; pass
    * 2 exactly counts ONLY the ≤ m candidates (a broadcast semi-join
    * against the count aggregate) and applies the integer-exact
    * threshold cnt·(m+1) > n. The result is therefore EXACT — the
    * sketch bounds the candidate set, never the answer — which is
    * what makes the query oracle-able and is the standard production
    * topology (sketch over the stream, verify against the aggregate).
    * At 100 TB: pass 1 shuffles ≤ m map entries per task, pass 2 is
    * the ordinary count aggregate it would run anyway. */
  def aggHeavyHitters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toksDf = t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val sketch = toksDf.as[String]
      .select(TypedAggs.misraGries.toColumn.name("mg"))
    val cand = sketch.select(explode(col("mg")).as(Seq("tok", "mg_lower")))
      .select(col("tok"))
    val tot = toksDf.agg(count(lit(1)).as("n_total"))
    toksDf.groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(cand), "tok")
      .crossJoin(broadcast(tot))
      .filter(col("cnt") * (TypedAggs.mgCapacity + 1) > col("n_total"))
      .select(col("tok"), col("cnt"), col("n_total"),
        round(col("cnt").cast("double") / col("n_total"), 6).as("share"))
      .orderBy(col("cnt").desc, col("tok"))
  }

  /** Same two-pass heavy-hitters topology as [[aggHeavyHitters]], but
    * the sketch pass runs the NATIVE `TypedImperativeAggregate`
    * ([[graft.functions.MisraGriesAgg]], SQL `graft_misra_gries`):
    * mutable open-hash buffer updated in place, compact byte-stream
    * partials, PODS'12 merge. The exact verify pass makes the answer
    * identical to the Aggregator route — both gate-checked against
    * the same oracle. */
  def aggHeavyHittersNative(s: SparkSession, d: String): DataFrame = {
    graft.ingest.Codecs.register(s)
    val toksDf = t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val cand = toksDf
      .select(expr(s"graft_misra_gries(tok, ${TypedAggs.mgCapacity})")
        .as("mg"))
      .select(explode(col("mg")).as(Seq("tok", "mg_lower")))
      .select(col("tok"))
    val tot = toksDf.agg(count(lit(1)).as("n_total"))
    toksDf.groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(cand), "tok")
      .crossJoin(broadcast(tot))
      .filter(col("cnt") * (TypedAggs.mgCapacity + 1) > col("n_total"))
      .select(col("tok"), col("cnt"), col("n_total"),
        round(col("cnt").cast("double") / col("n_total"), 6).as("share"))
      .orderBy(col("cnt").desc, col("tok"))
  }

  /** Audience-overlap matrix: for every unordered pair of event
    * types, how many distinct users did BOTH — the co-occurrence /
    * cross-feature signal behind funnel design and segment overlap.
    * Computed on the DEDUPLICATED (user, type) relation (one hash
    * aggregate), then a self-equi-join on user — candidate work is
    * Σ per-user |types|² with |types| bounded (≤ 5 here; event
    * taxonomies are small), never |users|². */
  /** Association rules over the per-user event-type market basket —
    * [[aggTypeCooccurrence]]'s pair counts extended to the standard
    * support / confidence / lift triple (and both rule directions per
    * unordered pair, since confidence is asymmetric). Exact integer
    * counts all the way: the basket relation is one (user, type)
    * distinct, marginals one tiny aggregate broadcast back onto the
    * |types|²-bounded pair table, and the three ratios are ONE
    * closing double expression each. At 100 TB the only corpus-sized
    * work is the distinct (one shuffle); everything after is
    * value-space-bounded. */
  /** The per-user "basket" both market-basket keys mine: the event
    * types where the user went HIGH-VALUE (max value ≥ 200) — the
    * round-10 degeneracy audit replaced plain type presence, which is
    * universal in this fixture (every user does every type → all
    * supports/confidences/lifts identically 1.0); high-value presence
    * runs 14-25%% per type, so the ratios actually discriminate. */
  private def highValueBaskets(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(col("value")).as("mx"))
      .filter(col("mx") >= 200.0)
      .select(col("user_id"), col("event_type"))

  def aggAssociationRules(s: SparkSession, d: String): DataFrame = {
    val ut = highValueBaskets(s, d)
    val marg = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
    val nU = ut.agg(countDistinct(col("user_id")).as("n_users"))
    val pairs = ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") =!= col("b.event_type"))
      .groupBy(col("a.event_type").as("lhs"),
        col("b.event_type").as("rhs"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(marg.select(col("event_type").as("lhs"),
        col("n_t").as("n_lhs"))), "lhs")
      .join(broadcast(marg.select(col("event_type").as("rhs"),
        col("n_t").as("n_rhs"))), "rhs")
      .crossJoin(broadcast(nU))
      .select(col("lhs"), col("rhs"), col("n_both"), col("n_lhs"),
        col("n_rhs"), col("n_users"),
        expr("ROUND(n_both / CAST(n_users AS DOUBLE), 6)").as("support"),
        expr("ROUND(n_both / CAST(n_lhs AS DOUBLE), 6)").as("confidence"),
        expr("ROUND(CAST(n_users AS DOUBLE) * n_both / " +
          "(CAST(n_lhs AS DOUBLE) * n_rhs), 6)").as("lift"))
      .orderBy(col("lhs"), col("rhs"))
  }

  def aggTypeCooccurrence(s: SparkSession, d: String): DataFrame = {
    val ut = highValueBaskets(s, d)
    ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_users_both"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** User-journey path mining: the most common 3-step event-type
    * sequences across users (ordered by event time, ties broken by
    * event_id) — the funnel-discovery complement of
    * [[aggSequenceMatch]] (which checks a KNOWN pattern). Per-user
    * ordering costs one user_id shuffle; the path vocabulary is
    * |types|³-bounded, so the count aggregate and top-k are constant
    * size regardless of corpus. */
  def aggPathMining(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .filter(col("t2").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t1"), col("t2"))
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(10)
  }

  /** Benford first-digit audit of order totals — the classic
    * fabricated-data / unit-mix-up detector a data-quality survey
    * runs on money columns. The leading digit comes from the DECIMAL
    * string form (regexp for the first [1-9]) — NOT from
    * floor(x/10^floor(log10 x)), whose 1-ulp log10 differences can
    * flip at exact powers of ten across engines. Counts are exact;
    * the Benford expectation log₁₀(1+1/d) is per-digit constant math
    * rounded to 4. One hash aggregate of 9 groups. */
  def aggBenford(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(regexp_extract(
        col("o_totalprice").cast("decimal(18,2)").cast("string"),
        "[1-9]", 0).as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("total"), 4).as("share"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 4)
          .as("benford"))
      .orderBy(col("digit"))

  /** Full cohort-retention triangle — the generalization of
    * [[aggRetention]]'s day-1/day-7 rates: users are cohorted by
    * first-activity week, and each (cohort week, activity week) cell
    * counts distinct active users. Two hash aggregates (per-user min
    * for the cohort, then the distinct cell count) plus one equi join
    * back on user_id; cells are |weeks|²-bounded — calendar-sized, not
    * data-sized. */
  def aggCohortMatrix(s: SparkSession, d: String): DataFrame = {
    val uw = t(s, d, "events")
      .select(col("user_id"),
        unix_micros(date_trunc("week", col("ts"))).as("week_us"))
      .distinct()
    val cohort = uw.groupBy(col("user_id"))
      .agg(min(col("week_us")).as("cohort_us"))
    uw.join(cohort, "user_id")
      .groupBy(col("cohort_us"), col("week_us"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_us"), col("week_us"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences — P(next type | current type) from exact bigram counts
    * (the probabilistic view of [[aggPathMining]]). The row-normalizing
    * divisor is a window sum of exact integers, so the only float is
    * the final rounded ratio. |types|²-bounded output; one user_id
    * shuffle for the lead(), one hash aggregate. */
  def aggMarkovTransition(s: SparkSession, d: String): DataFrame = {
    val byTs = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val byFrom = org.apache.spark.sql.expressions.Window
      .partitionBy(col("from_type"))
    t(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(byTs))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total", sum(col("n")).over(byFrom))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("row_total"), 4).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Population skewness/kurtosis per group from exact decimal RAW
    * moments (Σx…Σx⁴ over quantized values, then one closed-form
    * double sequence) — NOT the built-in skewness()/kurtosis(), whose
    * bias corrections differ across engines (Spark emits population
    * g₁/g₂, DuckDB sample-adjusted) and whose float accumulation is
    * order-dependent. The decimal-moments route is the same recipe as
    * agg_regression: order-independent sums, bit-identical finals. */
  def aggHigherMoments(s: SparkSession, d: String): DataFrame = {
    val q = col("l_quantity").cast("decimal(6,2)")
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(q).as("s1"),
        sum(q * q).as("s2"),
        sum(q * q * q).as("s3"),
        sum(q * q * q * q).as("s4"))
      .withColumn("mean", col("s1").cast("double") / col("n"))
      .withColumn("m2",
        col("s2").cast("double") / col("n") - col("mean") * col("mean"))
      .withColumn("m3",
        col("s3").cast("double") / col("n") -
          col("mean") * (col("s2").cast("double") / col("n")) * 3 +
          col("mean") * col("mean") * col("mean") * 2)
      .withColumn("m4",
        col("s4").cast("double") / col("n") -
          col("mean") * (col("s3").cast("double") / col("n")) * 4 +
          col("mean") * col("mean") *
            (col("s2").cast("double") / col("n")) * 6 -
          col("mean") * col("mean") * col("mean") * col("mean") * 3)
      // + 0.0 after every final ROUND: normalizes IEEE -0.0 to +0.0 in
      // both engines (DuckDB ROUND keeps the sign, Spark does not — the
      // window_zscore_rolling signed-zero class; surfaced here at
      // sf0.001 by the bit-exact gate, round 6)
      .select(col("l_returnflag"), col("n"),
        (round(col("mean"), 4) + 0.0).as("mean"),
        (round(col("m3") / pow(col("m2"), 1.5), 4) + 0.0).as("skewness"),
        (round(col("m4") / (col("m2") * col("m2")) - 3, 4) + 0.0)
          .as("kurtosis"))
      .orderBy(col("l_returnflag"))
  }

  /** Traffic seasonality heatmap — (day-of-week × hour-of-day) event
    * counts with per-cell share: the load-profile every capacity plan
    * starts from. Calendar-bounded 168 cells; exact counts, one
    * rounded division against a window total. */
  def aggSeasonality(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hod"))
      .groupBy(col("dow"), col("hod"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("dow"), col("hod"), col("n"),
        round(col("n").cast("double") / col("total"), 6).as("share"))
      .orderBy(col("dow"), col("hod"))

  /** A/B comparison scaffold — users deterministically split by md5
    * parity (the same hash-bucketing a real experiment assigner uses;
    * reproducible, no assignment table), then per-arm conversion
    * rates and the B-over-A lift. "Converted" = the user produced a
    * high-value (≥ 200) event — the round-10 degeneracy audit found
    * the original any-purchase outcome saturates at 100% in this
    * fixture (every user purchases), making the lift identically 0;
    * the value cut splits users ~68/32 at every sf. Exact user
    * counts; the only floats are the final rounded ratios. At scale
    * this is two hash aggregates on user_id. */
  def aggAbtestLift(s: SparkSession, d: String): DataFrame = {
    val perUser = t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(max(when(col("value") >= 200.0, 1).otherwise(0))
        .as("converted"))
      .withColumn("arm",
        when(conv(substring(md5(col("user_id").cast("string")), 1, 2),
          16, 10).cast("long") % 2 === 0, "A").otherwise("B"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("converted")).as("n_converted"))
      .withColumn("cvr",
        round(col("n_converted").cast("double") / col("n_users"), 6))
    val a = arms.filter(col("arm") === "A")
      .select(col("cvr").as("cvr_a"))
    arms.crossJoin(broadcast(a))
      .select(col("arm"), col("n_users"), col("n_converted"), col("cvr"),
        round(col("cvr") / col("cvr_a") - 1.0, 6).as("lift_vs_a"))
      .orderBy(col("arm"))
  }

  /** Time-to-conversion — seconds from each user's FIRST view to
    * their FIRST purchase (counted only when the purchase follows):
    * the latency metric behind funnel SLAs. Exact integer micro
    * deltas; the summary row carries count, min/max, and a mean from
    * the exact sum with one rounded division. Two min-aggregates on
    * user_id and a join — unbounded-user safe. */
  def aggTimeToConvert(s: SparkSession, d: String): DataFrame = {
    val firstOf = (tpe: String) =>
      t(s, d, "events").filter(col("event_type") === tpe)
        .groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as(s"first_$tpe"))
    firstOf("view").join(firstOf("purchase"), "user_id")
      .filter(col("first_purchase") > col("first_view"))
      .withColumn("delta_s",
        ((col("first_purchase") - col("first_view")) / 1000000L)
          .cast("long"))
      .agg(count(lit(1)).as("n_converted"),
        min(col("delta_s")).as("min_s"),
        max(col("delta_s")).as("max_s"),
        sum(col("delta_s")).as("sum_s"))
      .select(col("n_converted"), col("min_s"), col("max_s"),
        round(col("sum_s").cast("double") / col("n_converted"), 2)
          .as("mean_s"))
  }

  /** Exponential (log-bucketed) histogram with a mergeable median
    * estimate — the DDSketch/HDR-histogram family's shape: bucket
    * boundaries grow geometrically, so a fixed bucket count covers
    * any value range with bounded RELATIVE error, and per-bucket
    * counts merge associatively across partitions/days/shards (the
    * reason production latency/value pipelines ship these instead of
    * exact quantiles). Base 2 here: bucket(v) = ⌊log₂(cents)⌋ + 1,
    * computed as `length(bin(cents))` — the bit length of the exact
    * integer cents value, INTEGER arithmetic end to end where
    * DDSketch's γ≈1.02 bucket index would need a float ln both
    * engines round identically (the known 1-ulp JVM-vs-DuckDB ln
    * hazard, SURVEY round-8); production would restore the fine γ
    * with the same plan shape, paying a derived-check gate instead.
    * The median bucket (first with 2·cum ≥ n) pins the estimate
    * within one bucket = a factor-2 relative bound, by construction.
    *
    * Scale shape: one map-side-combined aggregate to (type × ≤64
    * buckets); the cumulative window runs over that bounded relation,
    * partitioned by type. Zero corpus-sized shuffles; the sketch is a
    * ≤64-long vector per group at any data size. Float discipline:
    * none needed — counts, bit lengths, and the 2·cum ≥ n median rule
    * are all integers; lo/hi cents are pow(2, b) at b ≤ 62, exact in
    * IEEE and identical text both engines. */
  def aggExpHistogram(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = t(s, d, "events")
      .filter(col("value") > 0)
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(19,4)) * 10000 AS BIGINT)")
          .as("c"))
    val b = v.groupBy(col("event_type"),
        length(expr("bin(c)")).as("bucket"))
      .agg(count(lit(1)).as("n"))
    val byB = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("event_type"))
    b.withColumn("cum", sum(col("n")).over(byB))
      .withColumn("n_total", sum(col("n")).over(tot))
      .select(col("event_type"), col("bucket"), col("n"), col("cum"),
        (col("cum") * 2 >= col("n_total") &&
          (col("cum") - col("n")) * 2 < col("n_total"))
          .as("is_median_bucket"),
        expr("CAST(pow(2, bucket - 1) AS BIGINT)").as("lo_cents"),
        expr("CAST(pow(2, bucket) - 1 AS BIGINT)").as("hi_cents"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** Calibration curve (reliability diagram) — the ML-eval staple:
    * bin a model score into deciles of score space and compare each
    * bin's PREDICTED mean against its OBSERVED positive rate; a
    * calibrated model tracks the diagonal. The fixture has no model,
    * so the score is a deterministic md5-derived pseudo-probability
    * s = (h mod 1000)/1000 per event (both engines derive the same h
    * — the house seeded-randomness recipe) and the outcome is
    * event_type = 'purchase'.
    *
    * All decisions integer: the bin is (h mod 1000) div 100, counts
    * and score sums are exact integer sums; the two closing ratios
    * (mean score, positive rate) are single double divisions rounded
    * once. One map-side-combined aggregate to exactly ≤10 rows. */
  def aggCalibrationCurve(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(
        expr("""CAST(conv(substring(md5(concat('cal|',
          |CAST(event_id AS STRING))), 1, 6), 16, 10) AS BIGINT) % 1000"""
          .stripMargin).as("sc"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy(expr("sc DIV 100").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("sc")).as("sum_sc"),
        sum(col("y")).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("sum_sc").cast("double") / (col("n") * 1000), 6)
          .as("mean_score"),
        round(col("n_pos").cast("double") / col("n"), 6).as("pos_rate"))
      .orderBy(col("bin"))

  /** Order-independent table content checksum — the cross-system
    * reconciliation primitive (did the migration/replica/backfill
    * deliver byte-identical content?): each row renders to a
    * canonical '|'-joined string of INTEGER/STRING columns only
    * (float formatting is engine-specific, so floats enter checksums
    * via fixed-point integers or not at all), hashes through the
    * house 24-bit md5 prefix, and SUMs — commutative, so no ordering
    * assumption survives into the compare, and the whole check is one
    * map-side-combined aggregate over the scan (the gate itself IS
    * the cross-engine proof: Spark and DuckDB compute it from their
    * own reads of the same parquet). */
  def aggTableChecksum(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(expr("""CAST(conv(substring(md5(concat_ws('|',
        |CAST(l_orderkey AS STRING), CAST(l_linenumber AS STRING),
        |l_returnflag, l_linestatus,
        |CAST(CAST(l_quantity AS BIGINT) AS STRING))), 1, 6), 16, 10)
        |AS BIGINT)""".stripMargin.replace("\n", " ")).as("h"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("h")).as("checksum_sum"),
        min(col("h")).as("checksum_min"),
        max(col("h")).as("checksum_max"))

  /** Expected calibration error — the one-number summary of
    * [[aggCalibrationCurve]]'s reliability diagram (the model-eval
    * gate "is the score usable as a probability"). The usual
    * Σ (n_b/N)·|acc_b − conf_b| telescopes into EXACT integer
    * arithmetic under the same ×1000 score scale: per bin
    * |1000·n_pos − sum_sc| is integral, so
    * ECE = Σ_b |1000·n_pos_b − sum_sc_b| / (1000·N) — one integer
    * sum over ≤10 bin rows and ONE closing double division. Same
    * single hash aggregate over the corpus as the curve. */
  def aggEce(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(
        expr("""CAST(conv(substring(md5(concat('cal|',
          |CAST(event_id AS STRING))), 1, 6), 16, 10) AS BIGINT) % 1000"""
          .stripMargin).as("sc"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy(expr("sc DIV 100").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("sc")).as("sum_sc"),
        sum(col("y")).as("n_pos"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("n")).as("n_all"),
        sum(abs(lit(1000) * col("n_pos") - col("sum_sc")))
          .as("ece_scaled"))
      .select(col("n_bins"), col("n_all"), col("ece_scaled"),
        expr("ROUND(ece_scaled / (1000 * CAST(n_all AS DOUBLE)), 6)")
          .as("ece"))

  /** Cohen's kappa between two deterministic quality raters — the
    * label-agreement audit run before trusting any heuristic filter
    * pair (do the char-length gate and the token-count gate agree
    * beyond chance?). Both raters are integer rules (n_chars ≥ 300;
    * whitespace token count ≥ 60), the confusion matrix is four
    * exact counts from one aggregate, and kappa telescopes to
    * (N·(n11+n00) − a1·b1 − a0·b0) / (N² − a1·b1 − a0·b0) — integer
    * numerator and denominator, ONE closing double division. */
  def aggCohenKappa(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(
        (col("n_chars") >= 300).cast("long").as("ra"),
        (size(split(col("text"), " ")) >= 60).cast("long").as("rb"))
      .agg(count(lit(1)).as("n"),
        sum(col("ra") * col("rb")).as("n11"),
        sum(col("ra") * (lit(1) - col("rb"))).as("n10"),
        sum((lit(1) - col("ra")) * col("rb")).as("n01"),
        sum((lit(1) - col("ra")) * (lit(1) - col("rb"))).as("n00"))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        expr("""ROUND((n * (n11 + n00) -
                 ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))) /
                CAST(n * n -
                 ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
                 AS DOUBLE), 6)""").as("kappa"))

  /** Gains/lift table by score decile — the campaign-targeting eval
    * next to [[aggCalibrationCurve]]: rank the population by score,
    * cut into 10 equal deciles, and report each decile's cumulative
    * capture of positives and its lift over the base rate. The decile
    * is a GLOBAL ntile — exactly the operation the round-9
    * [[Ordered.withGlobalIndex]] + [[Ordered.ntileFromRank]] machinery
    * distributes (range shuffle + zipWithIndex + closed-form bucket
    * arithmetic, no single-partition window) — and the oracle uses
    * DuckDB's plain NTILE(10), so the gate PROVES the decomposition
    * equals SQL ntile row for row at this sf.
    *
    * Integer counts per decile; cumulative sums over the 10-row
    * aggregate; ONE closing double expression for lift (cum-positive
    * rate over base rate), identical text, rounded once. */
  def aggGainsDeciles(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base0 = t(s, d, "events")
      .select(col("event_id"),
        expr("""CAST(conv(substring(md5(concat('cal|',
          |CAST(event_id AS STRING))), 1, 6), 16, 10) AS BIGINT) % 1000"""
          .stripMargin).as("sc"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    // total row count via broadcast aggregate — NOT a global window
    // over the corpus (the banned single-partition class)
    val base = base0.crossJoin(
      broadcast(base0.agg(count(lit(1)).as("n_all"))))
    val ranked = Ordered.withGlobalIndex(base,
        Seq(col("sc").desc, col("event_id")), "__idx")
      .withColumn("__rank", col("__idx") + 1)
    val deciled = Ordered.ntileFromRank(ranked, "__rank", "n_all", 10,
      "decile")
    val byD = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deciled.groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      .withColumn("cum_n", sum(col("n")).over(byD))
      .withColumn("cum_pos", sum(col("n_pos")).over(byD))
      .withColumn("total_n", sum(col("n")).over(Window.partitionBy()))
      .withColumn("total_pos", sum(col("n_pos")).over(Window.partitionBy()))
      .selectExpr("decile", "n", "n_pos", "cum_n", "cum_pos",
        """ROUND((CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE)) /
          |(CAST(total_pos AS DOUBLE) / CAST(total_n AS DOUBLE)), 6)
          |AS cum_lift""".stripMargin.replace("\n", " "))
      .orderBy(col("decile"))
  }

  /** Sample-ratio-mismatch (SRM) check — the daily health gate every
    * experimentation platform runs before reading ANY metric: if the
    * hash-based 50/50 arm assignment doesn't produce ~50/50 observed
    * users, the experiment is corrupted (redirect loss, bot filtering
    * skew, logging gaps) and all downstream stats are invalid
    * (Fabijan et al., KDD'19 diagnosis taxonomy). Arms come from a
    * 24-bit md5 of the user id over the DISTINCT-user relation —
    * deterministic, the [[Curation]] split discipline. χ² against the
    * 50/50 null collapses algebraically to (n₀−n₁)²/n, so the
    * statistic is an exact integer square over an integer total with
    * ONE closing double division; the detection bit compares that
    * identically-computed double against the χ²₁ 95% literal
    * 3.841458820694124 on both engines. One distinct-user aggregate,
    * one 2-row rollup — nothing corpus-sized past the first shuffle. */
  def aggSrmCheck(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("user_id")).distinct()
      .select(
        (expr("""CAST(conv(substring(md5(concat('srm|',
          |CAST(user_id AS STRING))), 1, 6), 16, 10) AS BIGINT)"""
          .stripMargin) % 2).as("arm"))
      .groupBy()
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_arm0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_arm1"))
      .selectExpr("n_users", "n_arm0", "n_arm1",
        """ROUND(CAST((n_arm0 - n_arm1) * (n_arm0 - n_arm1) AS DOUBLE) /
          |CAST(n_users AS DOUBLE), 6) AS chi2""".stripMargin
          .replace("\n", " "),
        """(CAST((n_arm0 - n_arm1) * (n_arm0 - n_arm1) AS DOUBLE) /
          |CAST(n_users AS DOUBLE)) > 3.841458820694124 AS srm_detected"""
          .stripMargin.replace("\n", " "))

  /** Inter-arrival cadence profile per event type — the freshness/SLA
    * diagnostic beside [[profileFreshness]]: the gap distribution
    * between consecutive events answers "how often does this stream
    * actually tick" (mean for capacity, p50 for typical cadence, p95
    * for the stall tail that alerting keys on). Gaps are exact
    * integer µs from one lag() over the (type)-partitioned
    * (ts, event_id) order — the engine's event-time contract; mean is
    * exact integer division; the two quantiles ride the established
    * approx_percentile@1e6 ↔ quantile_disc exact pairing (rank-exact
    * at fixture cardinalities). One O(1)/row streaming window + one
    * map-side-combined aggregate to |types| rows. */
  def profileInterarrival(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("tsu"), col("event_id"))
    t(s, d, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("tsu"),
        col("event_id"))
      .withColumn("gap_us", col("tsu") - lag(col("tsu"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_us")).as("sum_gap"),
        expr("approx_percentile(gap_us, array(0.5D, 0.95D), 1000000)")
          .as("q"))
      .select(col("event_type"), col("n_gaps"),
        expr("sum_gap DIV n_gaps").as("mean_gap_us"),
        element_at(col("q"), 1).as("p50_gap_us"),
        element_at(col("q"), 2).as("p95_gap_us"))
      .orderBy(col("event_type"))
  }

  /** Kruskal–Wallis H across the l_returnflag groups on l_quantity —
    * the k-sample nonparametric ANOVA (rank-based, no normality
    * assumption). Ranks come from the DISTINCT-VALUE table (≤50 rows
    * for integer quantities), never a corpus-wide sort: per value v the
    * doubled midrank is 2·cb + t + 1 (cb = count of smaller rows,
    * t = tie count at v) — all integer, so the per-group doubled rank
    * sums R2_g are exact BIGINTs at any parallelism. Per-group
    * R2_g²/n_g terms follow the [[aggAnovaF]] round@8-decimal
    * discipline; H and its tie correction close in ONE double
    * expression with identical text in DuckDB. The only window runs
    * over the ≤50-row value table (above an aggregate — PlanSpec-legal);
    * corpus work is one map-side-combined groupBy. */
  def aggKruskalWallis(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = t(s, d, "lineitem")
      .groupBy(col("l_returnflag").as("grp"),
        col("l_quantity").cast("long").as("q"))
      .agg(count(lit(1)).as("c"))
    val perQ = cnt.groupBy(col("q")).agg(sum(col("c")).as("tq"))
      .withColumn("cb", coalesce(sum(col("tq")).over(
        Window.orderBy(col("q"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("dr", lit(2L) * col("cb") + col("tq") + 1L)
    val perG = cnt.join(perQ.select(col("q"), col("dr")), "q")
      .groupBy(col("grp"))
      .agg(sum(col("c")).as("n_g"), sum(col("c") * col("dr")).as("r2_g"))
      .select(col("n_g"),
        expr("CAST(ROUND(CAST(r2_g AS DOUBLE) * r2_g / n_g, 8) " +
          "AS DECIMAL(38,8))").as("term"))
    val ties = perQ.agg(
      sum(col("tq") * col("tq") * col("tq") - col("tq")).as("tie_term"))
    perG.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(col("term")).as("a"))
      .crossJoin(ties)
      .select(col("k"), col("n"), col("tie_term"),
        // doubled ranks: Σ R_g²/n_g = a/4; H = 12/(N(N+1))·(a/4) − 3(N+1)
        expr("""ROUND((3 * CAST(a AS DOUBLE) / (CAST(n AS DOUBLE) * (n + 1))
                 - 3 * (n + 1)) /
                (1 - CAST(tie_term AS DOUBLE) /
                  (CAST(n AS DOUBLE) * n * n - n)), 6)""").as("h_stat"))
  }

  /** Spearman rank correlation between l_quantity and the discount
    * percent — monotone-association strength, robust to the marginal
    * shapes. Both variables are value-space bounded (50 × 11 distinct
    * values), so midranks come from cumulative counts over each
    * DISTINCT-VALUE table (doubled to stay integer: 2·cb + t + 1) and
    * every Pearson moment of the doubled ranks is an exact BIGINT
    * (Pearson r is affine-invariant, so corr(2r_x, 2r_y) = ρ). Corpus
    * work is ONE groupBy to the ≤550-cell joint table; the two rank
    * windows run over ≤50-row aggregates. ρ closes in one double
    * expression, identical text in DuckDB. */
  def aggSpearmanCorr(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = t(s, d, "lineitem")
      .groupBy(col("l_quantity").cast("long").as("x"),
        expr("CAST(ROUND(l_discount * 100) AS BIGINT)").as("y"))
      .agg(count(lit(1)).as("c"))
    def ranks(key: String): DataFrame = {
      val w = Window.orderBy(col(key))
        .rowsBetween(Window.unboundedPreceding, -1)
      cells.groupBy(col(key)).agg(sum(col("c")).as("t"))
        .withColumn("cb", coalesce(sum(col("t")).over(w), lit(0L)))
        .select(col(key),
          (lit(2L) * col("cb") + col("t") + 1L).as(s"dr_$key"))
    }
    cells.join(ranks("x"), "x").join(ranks("y"), "y")
      .agg(sum(col("c")).as("n"),
        sum(col("c") * col("dr_x")).as("sx"),
        sum(col("c") * col("dr_y")).as("sy"),
        sum(col("c") * col("dr_x") * col("dr_x")).as("sxx"),
        sum(col("c") * col("dr_y") * col("dr_y")).as("syy"),
        sum(col("c") * col("dr_x") * col("dr_y")).as("sxy"))
      .select(col("n"), col("sx"), col("sy"),
        expr("""ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
                SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
                     (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                6)""").as("rho"))
  }

  /** Kendall τ-b between l_quantity and the discount percent — the
    * pairwise-concordance association measure. The naive definition is
    * O(n²) over ROWS; this computes it over the JOINT FREQUENCY table
    * (≤550 cells): concordant/discordant pair counts are a self-join
    * over cell pairs weighted by n_a·n_b — all-pairs over the VALUE
    * SPACE (≤550² = 302k combinations, constant in corpus size), never
    * over rows. Tie terms come from the two marginals. Everything is
    * doubled-count integer arithmetic (2C, 2D, 2n0, 2n1, 2n2 — exact
    * BIGINTs); τ-b closes in one double expression, identical in
    * DuckDB. */
  def aggKendallTau(s: SparkSession, d: String): DataFrame = {
    val cells = t(s, d, "lineitem")
      .groupBy(col("l_quantity").cast("long").as("x"),
        expr("CAST(ROUND(l_discount * 100) AS BIGINT)").as("y"))
      .agg(count(lit(1)).as("c"))
    val a = cells.select(col("x").as("xa"), col("y").as("ya"),
      col("c").as("ca"))
    val b = cells.select(col("x").as("xb"), col("y").as("yb"),
      col("c").as("cb"))
    val cd = a.join(b, col("xa") < col("xb"))
      .agg(
        sum(when(col("ya") < col("yb"), lit(2L) * col("ca") * col("cb"))
          .otherwise(0L)).as("c2"),
        sum(when(col("ya") > col("yb"), lit(2L) * col("ca") * col("cb"))
          .otherwise(0L)).as("d2"))
    val marg = cells
      .agg(sum(col("c")).as("n"))
      .crossJoin(cells.groupBy(col("x")).agg(sum(col("c")).as("tx"))
        .agg(sum(col("tx") * (col("tx") - 1)).as("n1_2")))
      .crossJoin(cells.groupBy(col("y")).agg(sum(col("c")).as("ty"))
        .agg(sum(col("ty") * (col("ty") - 1)).as("n2_2")))
      .withColumn("n0_2", col("n") * (col("n") - 1))
    cd.crossJoin(marg)
      .select(col("n"), col("c2"), col("d2"), col("n1_2"), col("n2_2"),
        expr("""ROUND((c2 - CAST(d2 AS DOUBLE)) /
                SQRT((CAST(n0_2 AS DOUBLE) - n1_2) *
                     (CAST(n0_2 AS DOUBLE) - n2_2)), 6)""").as("tau_b"))
  }

  /** Brown–Forsythe (median-based Levene) test for variance
    * homogeneity across the l_returnflag groups — the robust
    * prerequisite check before trusting [[aggAnovaF]]'s pooled-variance
    * denominator. Group medians come from cumulative counts over the
    * ≤50-row distinct-value table (doubled median m2 = x_(⌈n/2⌉) +
    * x_(⌊n/2⌋+1), so even-n midpoints stay integer); per-row deviations
    * d = |2x − m2| are exact BIGINTs, and the F statistic on d reuses
    * the [[aggAnovaF]] exact-moment shape. Corpus work: one groupBy to
    * the value table + one 3-row broadcast join back; the only windows
    * run over per-group ≤50-row aggregates. */
  def aggLeveneTest(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = t(s, d, "lineitem")
      .groupBy(col("l_returnflag").as("grp"),
        col("l_quantity").cast("long").as("q"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("grp")).orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val med = cnt
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("grp"))))
      .groupBy(col("grp"))
      .agg(min(when(col("cum") >= expr("(n + 1) DIV 2"), col("q")))
          .as("x_lo"),
        min(when(col("cum") >= expr("n DIV 2 + 1"), col("q"))).as("x_hi"))
      .select(col("grp"), (col("x_lo") + col("x_hi")).as("m2"))
    val g = t(s, d, "lineitem")
      .select(col("l_returnflag").as("grp"),
        col("l_quantity").cast("long").as("x"))
      .join(broadcast(med), "grp")
      .select(col("grp"),
        abs(lit(2L) * col("x") - col("m2")).as("dv"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_g"), sum(col("dv")).as("s_g"),
        sum(col("dv") * col("dv")).as("ss_g"))
    g.select(col("n_g"), col("s_g"), col("ss_g"),
        expr("CAST(ROUND(CAST(s_g AS DOUBLE) * s_g / n_g, 8) " +
          "AS DECIMAL(28,8))").as("term"))
      .agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(col("s_g")).as("s"), sum(col("ss_g")).as("ss"),
        sum(col("term")).as("a"))
      .select(col("k"), col("n"), col("s"), col("ss"),
        expr("""ROUND(((CAST(a AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                 / (k - 1)) /
                ((ss - CAST(a AS DOUBLE)) / (n - k)), 6)""").as("f_stat"))
  }

  /** Exact weighted median of l_quantity weighted by extended price —
    * the "where does the money-mass sit" statistic (an unweighted
    * median answers rows; curation and revenue analyses weight by
    * value/tokens/bytes). Same distinct-value discipline as
    * [[aggKruskalWallis]]: weights collapse to the ≤50-row value table
    * as exact integer CENTS, the cumulative runs over that aggregate,
    * and the lower weighted median is the smallest value with
    * 2·cumw ≥ W — an all-integer selection, no division anywhere.
    * Corpus work: one map-side-combined groupBy. */
  def aggWeightedMedian(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perV = t(s, d, "lineitem")
      .groupBy(col("l_returnflag").as("grp"),
        col("l_quantity").cast("long").as("q"))
      .agg(sum(expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)"))
        .as("w"))
    val win = Window.partitionBy(col("grp")).orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, 0)
    perV
      .withColumn("cumw", sum(col("w")).over(win))
      .withColumn("tot", sum(col("w")).over(Window.partitionBy(col("grp"))))
      .groupBy(col("grp"))
      .agg(max(col("tot")).as("w_total"),
        min(when(col("cumw") * 2 >= col("tot"), col("q")))
          .as("w_median"))
      .orderBy(col("grp"))
  }

  /** Marketing-style conversion attribution over the event stream:
    * each purchase credits the user's PRECEDING events — last-touch
    * (all credit to the most recent prior channel) and linear (credit
    * split across prior channels in proportion to their counts). Both
    * ride ONE per-user window pass: four conditional cumulative counts
    * (O(1)/row growing frames) plus a last_value(ignore nulls) carry —
    * no self-join, no per-purchase rescan, one user-key shuffle at any
    * history density. Per-purchase linear shares are round@12 decimals
    * (the [[aggAnovaF]] intermediate discipline) so the per-channel
    * sums are order-independent; last-touch credits are integers. */
  def aggAttribution(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val chans = Seq("click", "view", "signup", "error")
    val withCums = t(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumns(chans.map(c => s"n_$c" ->
        coalesce(sum(when(col("event_type") === c, 1L).otherwise(0L))
          .over(w), lit(0L))).toMap)
      .withColumn("last_chan",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
    val purchases = withCums.filter(col("event_type") === "purchase")
      .withColumn("n_prior",
        chans.map(c => col(s"n_$c")).reduce(_ + _))
      .filter(col("n_prior") > 0)
    val unpiv = purchases.select(col("last_chan"), col("n_prior"),
      expr("stack(4, 'click', n_click, 'view', n_view, " +
        "'signup', n_signup, 'error', n_error) AS (channel, cnt)"))
    unpiv
      .groupBy(col("channel"))
      .agg(
        sum(when(col("last_chan") === col("channel"), 1L).otherwise(0L))
          .as("last_touch"),
        sum(expr("CAST(ROUND(CAST(cnt AS DOUBLE) / n_prior, 12) " +
          "AS DECIMAL(28,12))")).as("lin"))
      .select(col("channel"), col("last_touch"),
        expr("ROUND(CAST(lin AS DOUBLE), 6)").as("linear_credit"))
      .orderBy(col("channel"))
  }

  /** Split-conformal prediction interval (Vovk et al.; Lei et al.
    * 2018) per event type — the distribution-free eval primitive
    * behind "is my model's uncertainty calibrated": calibrate on 80%
    * of days (deterministic epoch-day % 5 split), set the
    * nonconformity quantile q = the ⌈(n+1)·0.9⌉-th smallest residual
    * |v − median|, then measure holdout coverage of median ± q. The
    * conformal guarantee (coverage ≥ 0.9 under exchangeability) is
    * what makes the reported `coverage` column directly actionable.
    *
    * Everything before the one closing division is exact: values as
    * DECIMAL(18,4), the median and the residual quantile picked by
    * [[aggWeightedMedian]]'s distinct-value cumulative-crossing
    * discipline (windows run over the VALUE-SPACE-bounded (type,
    * value) aggregate, never corpus rows — no global sort, no
    * percentile over raw data), the rank ⌈(n+1)·9/10⌉ in pure
    * integer arithmetic ((a·9+9) DIV 10, capped at n). At 100 TB the
    * corpus cost is ONE map-side-combined aggregate; the crossing
    * tables broadcast (≤ value-space rows). */
  def aggConformalInterval(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE corpus pass: the (type, value, split) count table is the
    // only thing the corpus contributes; the median, the residual
    // quantile AND the holdout coverage are all recomputed from that
    // value-space-bounded aggregate (residual counts per |v−med| are
    // a re-aggregation of the value counts — no second corpus scan;
    // coverage sums holdout counts under the q4 predicate). Measured
    // 2.20 → 1.3 s at sf0.1; at 100 TB the saving is two corpus
    // scans.
    val counts = t(s, d, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"),
        col("value").cast("decimal(18,4)").as("v4"),
        (expr("unix_micros(ts) div 86400000000") % 5 < 4).as("is_cal"))
      .agg(count(lit(1)).as("c"))
      // localCheckpoint, not cache (round 15, the sample_dsir lesson):
      // the InMemoryRelation's columnar encode of the near-distinct
      // (type, value, split) grid dominated the query's CPU; every
      // downstream join is explicitly broadcast-hinted, so the
      // checkpoint's stats loss cannot flip a join strategy
      .localCheckpoint()
    val calV = counts.filter(col("is_cal"))
      .select(col("event_type"), col("v4"), col("c"))
    val winV = Window.partitionBy(col("event_type")).orderBy(col("v4"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val med = calV
      .withColumn("cum", sum(col("c")).over(winV))
      .withColumn("n_cal",
        sum(col("c")).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(max(col("n_cal")).as("n_cal"),
        min(when(col("cum") >= expr("(n_cal + 1) DIV 2"), col("v4")))
          .as("med4"))
    val winR = Window.partitionBy(col("event_type")).orderBy(col("r4"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val qv = calV.join(broadcast(med), "event_type")
      .groupBy(col("event_type"), col("n_cal"),
        abs(col("v4") - col("med4")).as("r4"))
      .agg(sum(col("c")).as("c"))
      .withColumn("cum", sum(col("c")).over(winR))
      .groupBy(col("event_type"))
      .agg(min(when(col("cum") >=
          expr("LEAST(((n_cal + 1) * 9 + 9) DIV 10, n_cal)"),
        col("r4"))).as("q4"))
    counts.filter(!col("is_cal"))
      .join(broadcast(med), "event_type")
      .join(broadcast(qv), "event_type")
      .groupBy(col("event_type"), col("n_cal"), col("med4"), col("q4"))
      .agg(sum(col("c")).as("n_hold"),
        sum(when(abs(col("v4") - col("med4")) <= col("q4"), col("c")))
          .as("n_covered"))
      .select(col("event_type"), col("n_cal"),
        col("med4").cast("double").as("med"),
        col("q4").cast("double").as("q"),
        col("n_hold"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        expr("""ROUND(CAST(COALESCE(n_covered, 0) AS DOUBLE)
                / CAST(n_hold AS DOUBLE), 6)""").as("coverage"))
      .orderBy(col("event_type"))
  }

  /** Peaks-over-threshold tail summary (the EVT/mean-excess primitive
    * behind tail-latency SLOs and loss-severity modeling; the mean
    * excess function is THE diagnostic for picking a GPD threshold):
    * per event type, the threshold u = exact p95 of value, the
    * exceedance count above u, the mean excess E[v − u | v > u], and
    * the max excess. A roughly constant/linear mean excess across
    * types is the heavy-tail signal downstream fitting relies on.
    *
    * Same discipline as [[aggConformalInterval]]: u is picked by the
    * distinct-value cumulative crossing at rank ⌈n·19/20⌉ (windows
    * over the VALUE-SPACE-bounded (type, value) aggregate, never
    * corpus rows; pure-integer ceil (n·19+19) DIV 20), excesses are
    * exact DECIMAL(19,4) sums, and the mean closes in ONE double
    * division. Corpus cost: two column-pruned scans with
    * map-side-combined aggregates. */
  def aggMeanExcess(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = t(s, d, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        col("value").cast("decimal(18,4)").as("v4"))
    val winV = Window.partitionBy(col("event_type")).orderBy(col("v4"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val thr = base.groupBy(col("event_type"), col("v4"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(winV))
      .withColumn("n",
        sum(col("c")).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        min(when(col("cum") >= expr("(n * 19 + 19) DIV 20"), col("v4")))
          .as("u4"))
    base.join(broadcast(thr), "event_type")
      .groupBy(col("event_type"), col("n"), col("u4"))
      .agg(sum(when(col("v4") > col("u4"), 1L)).as("n_exc"),
        sum(when(col("v4") > col("u4"), col("v4") - col("u4")))
          .as("sum_exc"),
        max(when(col("v4") > col("u4"), col("v4") - col("u4")))
          .as("max_exc"))
      .select(col("event_type"), col("n"),
        col("u4").cast("double").as("u"),
        col("n_exc"),
        expr("""ROUND(CAST(sum_exc AS DOUBLE)
                / CAST(n_exc AS DOUBLE), 6)""").as("mean_excess"),
        col("max_exc").cast("double").as("max_excess"))
      .orderBy(col("event_type"))
  }

  /** Two-sample Cramér–von Mises statistic between the view and
    * purchase value distributions — the EDF companion to [[aggKsTest]]
    * (KS reads the max CDF gap; CvM integrates the SQUARED gap over
    * the pooled sample, so it sees distributed small departures KS
    * misses — the standard pair to run for drift):
    * T = Σ_pooled (F_n − G_m)² · nm/(n+m)². Identical bucketed-CDF
    * decomposition as KS (distinct-value aggregate → equi-width
    * buckets → local cumsums + broadcast offsets — never a
    * single-partition window over the value table), with the per-value
    * squared gap held exactly: D = cum1·n2 − cum2·n1 (BIGINT), the
    * term ((c1+c2)·D)·D in DECIMAL(19,0)×DECIMAL(19,0) (the width-19
    * int128 discipline), decimal-summed; T closes in ONE double
    * division by n1·n2·(n1+n2)². */
  def aggCvmTest(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = t(s, d, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("value").cast("decimal(19,4)").as("v"),
        when(col("event_type") === "view", 1L).otherwise(0L).as("is1"))
    val perV = base.groupBy(col("v"))
      .agg(sum(col("is1")).as("c1"),
        (count(lit(1)) - sum(col("is1"))).as("c2"))
    val bounds = perV
      .agg(min(col("v")).as("__lo"), max(col("v")).as("__hi"))
    val nBuckets = Ordered.defaultParts(s)
    val bucketed = perV.crossJoin(broadcast(bounds))
      .withColumn("__bkt",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(nBuckets - 1),
            floor((col("v").cast("double") - col("__lo").cast("double")) /
              (col("__hi").cast("double") - col("__lo").cast("double")) *
              nBuckets).cast("int"))))
    val localW = Window.partitionBy(col("__bkt")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefixW = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("__bkt"))
      .agg(sum(col("c1")).as("__t1"), sum(col("c2")).as("__t2"))
      .withColumn("__o1", coalesce(sum(col("__t1")).over(prefixW), lit(0L)))
      .withColumn("__o2", coalesce(sum(col("__t2")).over(prefixW), lit(0L)))
      .select(col("__bkt"), col("__o1"), col("__o2"))
    val tot = perV.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    bucketed
      .withColumn("__l1", sum(col("c1")).over(localW))
      .withColumn("__l2", sum(col("c2")).over(localW))
      .join(broadcast(offsets), "__bkt")
      .select(col("c1"), col("c2"),
        (col("__o1") + col("__l1")).as("cum1"),
        (col("__o2") + col("__l2")).as("cum2"))
      .crossJoin(broadcast(tot))
      .withColumn("d", col("cum1") * col("n2") - col("cum2") * col("n1"))
      .groupBy(col("n1"), col("n2"))
      .agg(sum(expr("""CAST((c1 + c2) * d AS DECIMAL(19,0))
                       * CAST(d AS DECIMAL(19,0))""")).as("s"))
      .select(col("n1"), col("n2"),
        col("s").cast("double").as("sum_sq_gap"),
        expr("""ROUND(CAST(s AS DOUBLE) /
                (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 * CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)),
                6)""").as("cvm_t"))
  }

  /** Hill tail-index estimator over the top-k order statistics of
    * purchase values — the companion to [[aggMeanExcess]] (mean excess
    * diagnoses heavy tails; Hill QUANTIFIES the tail exponent α that
    * a GPD/Pareto fit reports): α̂ = k / Σ_{i≤k} ln(x_(i)/x_(k+1)),
    * k = 50. The corpus work is one TakeOrderedAndProject 51-heap per
    * type — no global sort; the window runs over the bounded head
    * only (the text_zipf_fit precedent). Each ln term is round@12 →
    * decimal before the exact sum (the [[graft.llm.Ranking]] log
    * discipline — JVM log vs DuckDB ln carry 1-ulp slack, rounding
    * before summing keeps the sum order- and engine-independent);
    * α̂ closes in ONE double division. Tie handling: only VALUES
    * enter the terms, so rank order among equal values is
    * irrelevant. */
  def aggHillTailIndex(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 50
    val head = t(s, d, "events")
      .filter(col("event_type").isin("view", "purchase", "click") &&
        col("value") > 0)
      .select(col("event_type"),
        col("value").cast("decimal(18,4)").as("v"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("v").desc)))
      .filter(col("rn") <= k + 1)
    val xk1 = head.filter(col("rn") === k + 1)
      .select(col("event_type"), col("v").as("xk1"))
    head.filter(col("rn") <= k)
      .join(broadcast(xk1), "event_type")
      .select(col("event_type"), col("xk1"),
        expr("""CAST(ROUND(ln(CAST(v AS DOUBLE)
                / CAST(xk1 AS DOUBLE)), 12) AS DECIMAL(24,12))""")
          .as("term"))
      .groupBy(col("event_type"), col("xk1"))
      .agg(count(lit(1)).as("k"), sum(col("term")).as("s"))
      .select(col("event_type"), col("k"),
        col("xk1").cast("double").as("x_k1"),
        col("s").cast("double").as("sum_log"),
        expr("ROUND(CAST(k AS DOUBLE) / CAST(s AS DOUBLE), 6)")
          .as("hill_alpha"))
      .orderBy(col("event_type"))
  }

  /** Average precision (the area under the precision-recall curve —
    * the imbalanced-class companion to [[aggAucRank]]'s ROC AUC:
    * ROC-AUC stays optimistic when positives are rare; AP collapses,
    * which is why retrieval and anomaly evals report it):
    * AP = (1/P) Σ_{positives} precision@rank(positive). Ranking is
    * value-DESC with an event_id tiebreak — a defined total order, so
    * AP is deterministic under ties.
    *
    * Scale shape: the global rank rides [[Ordered.withGlobalIndex]]
    * (range-sort + zipWithIndex — the engine's distributed total-order
    * machinery, never a single-partition window); the positive-side
    * cumulative count is a SECOND withGlobalIndex over the positives
    * subset ordered by global rank. Each precision term j/rk is
    * round@12 → decimal before the exact sum (order-independent);
    * AP closes in ONE double division. */
  def aggAveragePrecision(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"),
        col("value").cast("decimal(19,4)").as("v"),
        when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("pos"))
    val ranked = Ordered.withGlobalIndex(base,
        Seq(col("v").desc, col("event_id")), "__idx")
      .withColumn("rk", col("__idx") + 1L)
    val posRanked = Ordered.withGlobalIndex(
        ranked.filter(col("pos") === 1).select(col("rk")),
        Seq(col("rk")), "__pidx")
      .withColumn("j", col("__pidx") + 1L)
    posRanked
      .select(expr("""CAST(ROUND(CAST(j AS DOUBLE)
                      / CAST(rk AS DOUBLE), 12)
                      AS DECIMAL(20,12))""").as("term"))
      .agg(count(lit(1)).as("n_pos"), sum(col("term")).as("s"))
      .select(col("n_pos"), col("s").cast("double").as("sum_prec"),
        expr("ROUND(CAST(s AS DOUBLE) / CAST(n_pos AS DOUBLE), 6)")
          .as("avg_precision"))
  }

  /** Deterministic bottom-k sample per group on the NATIVE
    * [[graft.functions.AresSampleAgg]] (`graft_ares_sample`) — the
    * distributed-sampling twin of [[aggHeavyHittersNative]]: the whole
    * per-type sample rides ONE TypedImperativeAggregate whose partials
    * carry ≤ k entries regardless of partition size (union-then-
    * retake-bottom-k merge), where the SQL formulation shuffles a
    * ranked window over corpus rows. Priorities are the house
    * cross-engine md5 hash, so the oracle's ORDER BY priority LIMIT k
    * reproduces the identical sample — deterministic,
    * order-independent, re-runnable. */
  def aggSampleNative(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_type"), col("user_id").cast("string").as("uid"))
      .groupBy(col("event_type"))
      .agg(expr("graft_ares_sample(uid, 10)").as("sample"))
      .select(col("event_type"),
        posexplode(col("sample")).as(Seq("pos", "uid")))
      .orderBy(col("event_type"), col("pos"))

  /** DAU / WAU / stickiness — the growth-metrics triple every product
    * pipeline reports, and the textbook case where the naive form (a
    * 7-day sliding COUNT DISTINCT window) does not distribute: exact
    * sliding distinct counts keep per-frame state proportional to the
    * user set. The scalable decomposition: dedup activity to (user,
    * day) ONCE, then fan each active day out to the ≤7 report days it
    * supports and dedup again — two hash aggregates on (user, day)
    * keys, no window at all, exact at any scale. WAU days beyond the
    * activity range are clipped by the inner join with DAU;
    * stickiness = DAU/WAU closes in one double division. */
  def aggDauWau(s: SparkSession, d: String): DataFrame = {
    val ud = t(s, d, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val dau = ud.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6)))
          .as("day"))
      .distinct()
      .groupBy(col("day"))
      .agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        expr("ROUND(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 6)")
          .as("stickiness"))
      .orderBy(col("day"))
  }

  /** 2×2 odds ratio with 95 % Wald CI per event type — the
    * case-control summary every observational-metrics pipeline ships
    * (exposure = even user_id, outcome = value ≥ 50). The four cell
    * counts are ONE conditional hash aggregate (no joins, no second
    * scan); log-OR and its CI close in one double expression each
    * from the integer cells (Woolf SE = √(1/a+1/b+1/c+1/d)). Empty
    * cells short-circuit to NULL via an exact integer guard — never
    * a 4-way BIGINT product (overflows at ~150k-row cells). */
  def aggOddsRatio(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(
        sum(expr("CASE WHEN user_id % 2 = 0 AND value >= 50e0 " +
          "THEN 1 ELSE 0 END")).as("a"),
        sum(expr("CASE WHEN user_id % 2 = 0 AND value < 50e0 " +
          "THEN 1 ELSE 0 END")).as("b"),
        sum(expr("CASE WHEN user_id % 2 <> 0 AND value >= 50e0 " +
          "THEN 1 ELSE 0 END")).as("c"),
        sum(expr("CASE WHEN user_id % 2 <> 0 AND value < 50e0 " +
          "THEN 1 ELSE 0 END")).as("d"))
      .select(col("event_type"), col("a"), col("b"), col("c"), col("d"),
        expr("""CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0 THEN NULL
                ELSE ROUND(LN((CAST(a AS DOUBLE) * CAST(d AS DOUBLE))
                  / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))), 6)
                END""").as("log_or"),
        expr("""CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0 THEN NULL
                ELSE ROUND(LN((CAST(a AS DOUBLE) * CAST(d AS DOUBLE))
                    / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
                  - 1.96e0 * SQRT(1e0 / CAST(a AS DOUBLE)
                    + 1e0 / CAST(b AS DOUBLE) + 1e0 / CAST(c AS DOUBLE)
                    + 1e0 / CAST(d AS DOUBLE)), 6)
                END""").as("ci_lo"),
        expr("""CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0 THEN NULL
                ELSE ROUND(LN((CAST(a AS DOUBLE) * CAST(d AS DOUBLE))
                    / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
                  + 1.96e0 * SQRT(1e0 / CAST(a AS DOUBLE)
                    + 1e0 / CAST(b AS DOUBLE) + 1e0 / CAST(c AS DOUBLE)
                    + 1e0 / CAST(d AS DOUBLE)), 6)
                END""").as("ci_hi"))
      .orderBy(col("event_type"))

  /** Wilson score interval per event type — the boundary-safe
    * proportion CI (never leaves [0,1], correct at extreme p̂ where
    * Wald collapses), the standard for CTR / success-rate dashboards.
    * Two integer cells (n, k) from one aggregate; the interval closes
    * in one double expression per bound with z = 1.96 and the exact
    * decimal literals z² = 3.8416, z²/2 = 1.9208, z²/4 = 0.9604 —
    * literals, not computed powers, so both engines parse identical
    * IEEE doubles. */
  def aggWilsonCi(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CASE WHEN value >= 50e0 THEN 1 ELSE 0 END")).as("k"))
      .select(col("event_type"), col("n"), col("k"),
        expr("""ROUND(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                  + 1.9208e0 / CAST(n AS DOUBLE)
                  - 1.96e0 * SQRT((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                    * (1e0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                    / CAST(n AS DOUBLE)
                    + 0.9604e0 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
                / (1e0 + 3.8416e0 / CAST(n AS DOUBLE)), 6)""")
          .as("wilson_lo"),
        expr("""ROUND(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                  + 1.9208e0 / CAST(n AS DOUBLE)
                  + 1.96e0 * SQRT((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                    * (1e0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                    / CAST(n AS DOUBLE)
                    + 0.9604e0 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
                / (1e0 + 3.8416e0 / CAST(n AS DOUBLE)), 6)""")
          .as("wilson_hi"))
      .orderBy(col("event_type"))

  /** Lorenz curve by customer-spend decile — the concentration table
    * behind every "top 10 % of customers drive X % of revenue" chart
    * (the decile-resolution companion to [[aggGini]]'s scalar). The
    * global decile assignment is the distributed total-order
    * machinery, never a single-partition window: [[Ordered
    * .withGlobalIndex]] (range shuffle + zipWithIndex) gives the
    * exact spend rank, [[Ordered.ntileFromRank]] closes SQL ntile's
    * bucket arithmetic from (rank, n) in integer DIV — bit-identical
    * to the oracle's native ntile(10). Spend sums are exact
    * DECIMAL(18,4); the 10-row decile rollup carries cumulative
    * shares via a window ABOVE the aggregate (the allowed class);
    * decimals leave the plan as one double cast per share. */
  def aggLorenzCurve(s: SparkSession, d: String): DataFrame = {
    val w10 = org.apache.spark.sql.expressions.Window
      .orderBy(col("decile"))
      .rowsBetween(Long.MinValue, 0)
    val spend = t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("spend"))
    // n and the grand total come from ONE 1-row aggregate over the
    // customer-spend relation (not two extra orders scans) — the
    // per-customer aggregate is 1/|orders per customer| the size
    val nTotal = broadcast(spend.agg(count(lit(1)).as("n"),
      sum(col("spend")).as("total")))
    val ranked = Ordered
      .withGlobalIndex(spend, Seq(col("spend").asc, col("o_custkey").asc),
        "i")
      .withColumn("rank", col("i") + lit(1L))
      .crossJoin(nTotal)
    Ordered.ntileFromRank(ranked, "rank", "n", 10, "decile")
      .groupBy(col("decile"), col("total"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend")).as("dec_spend"))
      .withColumn("cum_spend", sum(col("dec_spend")).over(w10))
      .select(col("decile"), col("n_customers"),
        expr("CAST(dec_spend AS DOUBLE)").as("dec_spend"),
        expr("ROUND(CAST(cum_spend AS DOUBLE) / CAST(total AS DOUBLE), 6)")
          .as("cum_spend_share"))
      .orderBy(col("decile"))
  }

  /** Friedman rank test (Friedman 1937) — the nonparametric
    * repeated-measures ANOVA: blocks = days, treatments = event
    * types, metric = exact decimal daily value mass. Ranks are
    * assigned WITHIN each block (k rows per day — the bounded keyed
    * window class), blocks missing any treatment are dropped (the
    * complete-block design), and χ²_F = 12/(nk(k+1))·ΣR_j² − 3n(k+1)
    * closes in one double expression from integer rank sums. Ties in
    * the decimal cell values are broken by treatment name — a
    * deterministic deviation from classic midranks, documented here,
    * chosen so every rank stays an exact integer (midranks would put
    * a float into the rank sums). The k-treatment rollup carries
    * ΣR_j² via a window ABOVE the aggregate (allowed class); k itself
    * is counted from the data and broadcast as one row. */
  def aggFriedmanTest(s: SparkSession, d: String): DataFrame = {
    val byDay = org.apache.spark.sql.expressions.Window
      .partitionBy(col("day")).orderBy(col("sv"), col("event_type"))
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val k1 = t(s, d, "events")
      .agg(countDistinct(col("event_type")).as("k"))
    val cell = t(s, d, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("value").cast("decimal(18,4)").as("v"))
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("v")).as("sv"))
    val blocks = cell.groupBy(col("day"))
      .agg(count(lit(1)).as("nt"))
      .crossJoin(broadcast(k1))
      .filter(col("nt") === col("k"))
      .select(col("day"))
    cell.join(blocks, "day")
      .withColumn("r", row_number().over(byDay))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("r").cast("long")).as("r_sum"))
      .withColumn("sum_r2", sum(col("r_sum") * col("r_sum")).over(all))
      .crossJoin(broadcast(k1))
      .select(col("event_type"), col("n_blocks"), col("r_sum"),
        expr("""ROUND(12e0 * CAST(sum_r2 AS DOUBLE)
                / (CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE)
                   * CAST(k + 1 AS DOUBLE))
                - 3e0 * CAST(n_blocks AS DOUBLE)
                  * CAST(k + 1 AS DOUBLE), 6)""").as("chi2_f"))
      .orderBy(col("event_type"))
  }

  /** Benjamini–Hochberg FDR control over a FAMILY of per-metric
    * permutation tests — the multiple-comparisons step every
    * many-metric experiment dashboard needs (test each event type's
    * arm difference, then control the expected false-discovery rate
    * instead of per-test α). The per-type p-values reuse
    * [[aggPermutationTest]]'s machinery (hash-seeded arms, B = 100
    * sign permutations, p = (1 + #{|diff_b| ≥ |obs|})/101 — an EXACT
    * RATIONAL), so the BH step decision p_(i) ≤ (i/m)·α reduces to
    * the INTEGER comparison 100·m·p_num ≤ 505·i (α = 0.05,
    * multiplied through by 100·m·(B+1)); the family size m is
    * COUNTED from the aggregate itself (a |types|-row window, like
    * aggFriedmanTest counts k) so a taxonomy change can never
    * miscalibrate the step-up — no float thresholds anywhere; the
    * step-up cutoff and rejections close over the m-row aggregate
    * (windows above aggregate, the allowed class). Scale: one
    * (type, user) aggregate, B-way fan-out of the USER table (never
    * raw events), everything after is m rows. */
  def aggBhFdr(s: SparkSession, d: String): DataFrame = {
    val B = 100
    def armOf(seed: Column): Column =
      conv(substring(md5(seed), 1, 6), 16, 10).cast("long") % 2L
    def diffOf(df: DataFrame, grp: Seq[Column]): DataFrame =
      df.groupBy(grp :+ col("arm"): _*)
        .agg(sum(col("sv")).as("s"), sum(col("ne")).as("c"))
        .groupBy(grp: _*)
        .agg(((max(when(col("arm") === 1L, col("s"))).cast("double") /
          max(when(col("arm") === 1L, col("c")))) -
          (max(when(col("arm") === 0L, col("s"))).cast("double") /
            max(when(col("arm") === 0L, col("c"))))).as("diff"))
    val cells = t(s, d, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("ne"),
        sum(col("value").cast("decimal(18,4)")).as("sv"))
      .cache()
    val obs = diffOf(cells.withColumn("arm",
        armOf(col("user_id").cast("string"))), Seq(col("event_type")))
      .withColumnRenamed("diff", "obs_diff")
    val perm = diffOf(
      cells.select(col("event_type"), col("user_id"), col("ne"),
        col("sv"), explode(sequence(lit(1), lit(B))).as("b"))
        .withColumn("arm", armOf(concat_ws("_", col("user_id"), col("b")))),
      Seq(col("event_type"), col("b")))
    val byP = org.apache.spark.sql.expressions.Window
      .orderBy(col("p_num"), col("event_type"))
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(Long.MinValue, Long.MaxValue)
    perm.join(obs, "event_type")
      .groupBy(col("event_type"))
      .agg(round(max(col("obs_diff")), 6).as("obs_diff"),
        (sum(when(abs(col("diff")) >= abs(col("obs_diff")), 1L)
          .otherwise(0L)) + lit(1L)).as("p_num"))
      .withColumn("rnk", row_number().over(byP))
      // BH family size m is COUNTED from the aggregate (like
      // aggFriedmanTest/aggCochranQ count k), never a fixture
      // constant: p/(B+1) ≤ 0.05·i/m ⟺ 100·m·p_num ≤ 505·i.
      .withColumn("m", count(lit(1)).over(all))
      .withColumn("istar_pnum",
        max(when(col("p_num") * 100L * col("m") <= lit(505L) * col("rnk"),
          col("p_num"))).over(all))
      .select(col("event_type"), col("obs_diff"), col("p_num"),
        expr("ROUND(CAST(p_num AS DOUBLE) / 101e0, 6)").as("p_value"),
        coalesce(col("p_num") <= col("istar_pnum"), lit(false))
          .as("rejected"))
      .orderBy(col("event_type"))
  }

  /** Cochran's Q test (Cochran 1950) — the k-treatment extension of
    * McNemar for BINARY outcomes over matched blocks: blocks = days,
    * treatments = event types, x = "the type ran above its average
    * daily volume that day" ([[dayTypeBusyCells]]; the round-10
    * degeneracy audit replaced the always-true extreme-value rule). Incomplete blocks are dropped
    * (complete-block design, like [[aggFriedmanTest]]); Q = (k−1)·
    * (k·ΣC_j² − T²)/(k·ΣR_i − ΣR_i²) closes in one double expression
    * from FOUR integer moments (column-total squares, grand total,
    * row-total first/second moments); a degenerate denominator (every
    * block all-0 or all-1) short-circuits to NULL via the exact
    * integer guard. Two bounded aggregates; k counted from data. */
  /** Day×type "above-average-volume" indicator cells shared by
    * [[aggCochranQ]] and [[aggFleissKappa]]: x = 1 iff the day's count
    * for the type exceeds the type's own daily average, taken in the
    * exact integer cross-multiplication nd·c > tot. Chosen by the
    * round-10 degeneracy audit: the original extreme-value indicator
    * (max ≥ 95) is ALWAYS true at fixture volumes (every day's
    * per-type max clears it), which made every block unanimous and
    * both statistics identically NULL; the above-average indicator is
    * non-degenerate BY CONSTRUCTION (a nonconstant series must have
    * days on both sides of its mean), splitting 40-60%% per type at
    * every sf. */
  private def dayTypeBusyCells(s: SparkSession, d: String): DataFrame = {
    val daily = t(s, d, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val tot = daily.groupBy(col("event_type"))
      .agg(sum(col("c")).as("tot"), count(lit(1)).as("nd"))
    daily.join(broadcast(tot), "event_type")
      .select(col("day"), col("event_type"),
        (col("nd") * col("c") > col("tot")).cast("long").as("x"))
  }

  def aggCochranQ(s: SparkSession, d: String): DataFrame = {
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val k1 = t(s, d, "events")
      .agg(countDistinct(col("event_type")).as("k"))
    val cell = dayTypeBusyCells(s, d)
    val blocks = cell.groupBy(col("day"))
      .agg(count(lit(1)).as("nt"), sum(col("x")).as("r_i"))
      .crossJoin(broadcast(k1))
      .filter(col("nt") === col("k"))
    val rMoments = broadcast(blocks
      .agg(sum(col("r_i")).as("sum_r"),
        sum(col("r_i") * col("r_i")).as("sum_r2")))
    cell.join(blocks.select(col("day")), "day")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("x")).as("c_j"))
      .withColumn("sum_c2", sum(col("c_j") * col("c_j")).over(all))
      .crossJoin(rMoments)
      .crossJoin(broadcast(k1))
      .select(col("event_type"), col("n_blocks"), col("c_j"),
        expr("""CASE WHEN k * sum_r - sum_r2 = 0 THEN NULL
                ELSE ROUND(CAST(k - 1 AS DOUBLE)
                  * (CAST(k AS DOUBLE) * CAST(sum_c2 AS DOUBLE)
                     - CAST(sum_r AS DOUBLE) * CAST(sum_r AS DOUBLE))
                  / (CAST(k AS DOUBLE) * CAST(sum_r AS DOUBLE)
                     - CAST(sum_r2 AS DOUBLE)), 6)
                END""").as("q_stat"))
      .orderBy(col("event_type"))
  }

  /** McNemar's test on two curation rules' paired keep-decisions —
    * "do the vocabulary-based and density-based English detectors
    * disagree systematically?", the question asked before swapping
    * one gate for another. Rule A = stopword-density > 0.05 (the
    * [[graft.llm.TextStats.textLangId]] rule); rule B = membership of
    * 'the' in the token set. Four integer cells in ONE conditional
    * aggregate over the corpus; χ² = (b−c)²/(b+c) closes in one
    * double expression, NULL when the discordant count is zero. */
  def aggMcnemarTest(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(
        (expr("size(filter(split(text, ' '), " +
          "t -> t IN ('the', 'a', 'of', 'and', 'to', 'in')))")
          .cast("double") / size(split(col("text"), " ")) > 0.05)
          .as("pred_a"),
        array_contains(split(col("text"), " "), "the").as("pred_b"))
      .agg(
        sum(when(col("pred_a") && col("pred_b"), 1L).otherwise(0L))
          .as("n_both"),
        sum(when(col("pred_a") && !col("pred_b"), 1L).otherwise(0L))
          .as("b"),
        sum(when(!col("pred_a") && col("pred_b"), 1L).otherwise(0L))
          .as("c"),
        sum(when(!col("pred_a") && !col("pred_b"), 1L).otherwise(0L))
          .as("n_neither"))
      .select(col("n_both"), col("b"), col("c"), col("n_neither"),
        expr("""CASE WHEN b + c = 0 THEN NULL
                ELSE ROUND(CAST(b - c AS DOUBLE) * CAST(b - c AS DOUBLE)
                  / CAST(b + c AS DOUBLE), 6)
                END""").as("chi2_mcnemar"))

  /** Tukey-fence outlier census per event type — the box-plot rule
    * (outside Q1 − 1.5·IQR, Q3 + 1.5·IQR) every anomaly triage
    * starts from. Quartiles are EXACT type-1 order statistics
    * (rank = ⌈p·n⌉ via integer DIV, picked by row_number over the
    * per-type value sort — the doubled-rank class already used by
    * the Mann-Whitney family), so no interpolation floats exist; the
    * fences are one double expression from the two decimal picks,
    * and the census is a second pass joined against the broadcast
    * k-row fence table. */
  def aggTukeyOutliers(s: SparkSession, d: String): DataFrame = {
    val byVal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("v"), col("event_id"))
    val vals = t(s, d, "events")
      .select(col("event_type"), col("event_id"),
        col("value").cast("decimal(18,4)").as("v"))
    val fences = vals
      .withColumn("rn", row_number().over(byVal))
      .withColumn("nn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(max(col("nn")).as("n"),
        max(when(expr("rn = (nn + 3) DIV 4"), col("v"))).as("q1"),
        max(when(expr("rn = (3 * nn + 3) DIV 4"), col("v"))).as("q3"))
    fences
      .select(col("event_type"), col("n"),
        expr("CAST(q1 AS DOUBLE)").as("q1"),
        expr("CAST(q3 AS DOUBLE)").as("q3"),
        expr("""CAST(q1 AS DOUBLE)
                - 1.5e0 * (CAST(q3 AS DOUBLE) - CAST(q1 AS DOUBLE))""")
          .as("lo"),
        expr("""CAST(q3 AS DOUBLE)
                + 1.5e0 * (CAST(q3 AS DOUBLE) - CAST(q1 AS DOUBLE))""")
          .as("hi"))
      .join(vals, "event_type")
      .groupBy(col("event_type"), col("n"), col("q1"), col("q3"))
      .agg(
        sum(when(expr("CAST(v AS DOUBLE) < lo"), 1L).otherwise(0L))
          .as("n_low"),
        sum(when(expr("CAST(v AS DOUBLE) > hi"), 1L).otherwise(0L))
          .as("n_high"))
      .orderBy(col("event_type"))
  }

  /** Poisson dispersion index of the daily arrival counts per event
    * type — the burstiness check run before trusting any Poisson
    * rate model (index ≈ 1 ⇒ Poisson arrivals; > 1 ⇒ overdispersed/
    * bursty). All moments integer (day counts), the index
    * var/mean = (n·Σc² − (Σc)²)/((n−1)·Σc) closes in one double
    * expression, and the overdispersion VERDICT is decided by the
    * EXACT integer comparison n·Σc² − (Σc)² > (n−1)·Σc — the gate
    * boolean never touches a float. */
  def aggDispersionIndex(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("s1"),
        sum(col("c") * col("c")).as("s2"))
      .select(col("event_type"), col("n_days"), col("s1"),
        expr("""ROUND((CAST(n_days AS DOUBLE) * CAST(s2 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                / (CAST(n_days - 1 AS DOUBLE) * CAST(s1 AS DOUBLE)),
                6)""").as("dispersion"),
        expr("n_days * s2 - s1 * s1 > (n_days - 1) * s1")
          .as("overdispersed"))
      .orderBy(col("event_type"))

  /** Lincoln–Petersen / Chapman capture–recapture estimate of the
    * true population per event type — the mark-recapture trick a data
    * platform uses to estimate TRUE audience (or true corpus size)
    * from two overlapping observation windows: capture 1 is the
    * active user set on the FIRST calendar day, capture 2 the active
    * set on the data-driven MIDPOINT day, and N̂ = n₁n₂/m from the
    * overlap. (Single-day captures are the discriminating cut: with
    * half-calendar captures every user appeared in both halves at
    * every sf and both estimators were frozen at the exact user
    * count — the round-11 degeneracy lint's saturation class.)
    * Chapman's (n₁+1)(n₂+1)/(m+1) − 1 is the bias-corrected,
    * zero-overlap-safe variant. All inputs integer (per-(type, user)
    * presence bits from one aggregate); each estimate closes in one
    * double expression; m = 0 short-circuits Lincoln–Petersen to
    * NULL via the exact integer guard. */
  def aggCaptureRecapture(s: SparkSession, d: String): DataFrame = {
    val bounds = broadcast(t(s, d, "events")
      .agg(min(to_date(col("ts"))).as("d_min"),
        max(to_date(col("ts"))).as("d_max")))
    t(s, d, "events")
      .select(col("event_type"), col("user_id"),
        to_date(col("ts")).as("day"))
      .crossJoin(bounds)
      .withColumn("cut",
        expr("date_add(d_min, CAST(datediff(d_max, d_min) DIV 2 AS INT))"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(max(when(col("day") === col("d_min"), 1L).otherwise(0L))
        .as("h1"),
        max(when(col("day") === col("cut"), 1L).otherwise(0L)).as("h2"))
      .groupBy(col("event_type"))
      .agg(sum(col("h1")).as("n1"), sum(col("h2")).as("n2"),
        sum(col("h1") * col("h2")).as("m"))
      .select(col("event_type"), col("n1"), col("n2"), col("m"),
        expr("""CASE WHEN m = 0 THEN NULL
                ELSE ROUND(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                  / CAST(m AS DOUBLE), 6) END""").as("n_lp"),
        expr("""ROUND(CAST((n1 + 1) * (n2 + 1) AS DOUBLE)
                / CAST(m + 1 AS DOUBLE) - 1e0, 6)""").as("n_chapman"))
      .orderBy(col("event_type"))
  }

  /** Two-proportion pooled z statistic per event type (arms by user
    * parity, success = value ≥ 50) — the proportion counterpart of
    * [[aggTTest]], the first test any conversion-rate comparison
    * runs. Four integer cells from one conditional aggregate; the
    * pooled-variance z closes in one double expression; a degenerate
    * pooled rate (all successes or none) short-circuits to NULL via
    * the exact integer guard k₁+k₂ ∈ {0, n₁+n₂}. */
  def aggTwoProportionZ(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(
        sum(expr("CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END"))
          .as("n1"),
        sum(expr("CASE WHEN user_id % 2 = 0 AND value >= 50e0 " +
          "THEN 1 ELSE 0 END")).as("k1"),
        sum(expr("CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END"))
          .as("n2"),
        sum(expr("CASE WHEN user_id % 2 <> 0 AND value >= 50e0 " +
          "THEN 1 ELSE 0 END")).as("k2"))
      .select(col("event_type"), col("n1"), col("k1"), col("n2"),
        col("k2"),
        expr("""CASE WHEN k1 + k2 = 0 OR k1 + k2 = n1 + n2 THEN NULL
                ELSE ROUND((CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                  / SQRT((CAST(k1 + k2 AS DOUBLE)
                          / CAST(n1 + n2 AS DOUBLE))
                    * (1e0 - CAST(k1 + k2 AS DOUBLE)
                             / CAST(n1 + n2 AS DOUBLE))
                    * (1e0 / CAST(n1 AS DOUBLE)
                       + 1e0 / CAST(n2 AS DOUBLE))), 6)
                END""").as("z_stat"))
      .orderBy(col("event_type"))

  /** pass@k (k = 5) estimator histogram — the unbiased Codex/HumanEval
    * estimator 1 − C(n−c, k)/C(n, k) (Chen et al. 2021) over
    * (task = user, trial = event, correct = value ≥ 50), the eval
    * aggregation every code/reasoning benchmark pipeline runs.
    * C-ratio expanded as the FIXED 5-term product Π(n−c−i)/(n−i) —
    * exact integer operands, one double expression per task; tasks
    * with n − c < k short-circuit to pass@k = 1 exactly. Because a
    * corpus-wide MEAN of doubles is summation-order-dependent (the
    * float-discipline ban), the output is the DECILE HISTOGRAM of
    * per-task estimates per event type — bucketing a double is
    * order-independent — which is also the more useful eval artifact
    * (the shape, not just the mean). */
  def aggPassAtK(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CASE WHEN value >= 50e0 THEN 1 ELSE 0 END")).as("c"))
      .filter(col("n") >= 5L)
      .withColumn("pass5",
        expr("""CASE WHEN n - c < 5 THEN 1e0
                ELSE 1e0
                  - (CAST(n - c AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(n - c - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE))
                  * (CAST(n - c - 2 AS DOUBLE) / CAST(n - 2 AS DOUBLE))
                  * (CAST(n - c - 3 AS DOUBLE) / CAST(n - 3 AS DOUBLE))
                  * (CAST(n - c - 4 AS DOUBLE) / CAST(n - 4 AS DOUBLE))
                END"""))
      .groupBy(col("event_type"),
        expr("LEAST(9, CAST(FLOOR(pass5 * 10e0) AS INT))").as("bucket"))
      .agg(count(lit(1)).as("n_tasks"))
      .orderBy(col("event_type"), col("bucket"))

  /** Session-level rollup — the product-analytics table built on top
    * of sessionization (30-min-gap islands, the [[graft.queries
    * .Windows.windowSession]] rule): session count, total events,
    * events/session, and the EXACT median session duration. Island
    * assignment is one keyed (user) window (lag + running sum of
    * new-session flags — integers); per-session duration is an exact
    * integer µs span; the global median over the session table goes
    * through the sanctioned total-order machinery ([[Ordered
    * .withGlobalIndex]] + two-order-statistic pick), never a
    * single-partition window. */
  def aggSessionStats(s: SparkSession, d: String): DataFrame = {
    val byTs = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Long.MinValue, 0)
    val gapUs = 30L * 60 * 1000000L
    // checkpointed (round 15, the window_rfm lesson): the session
    // table feeds the totals aggregate AND the global-index machinery
    // (range-boundary sampling + the ranged shuffle) — three
    // re-executions of the sessionization window un-checkpointed
    val sessions = graft.llm.Dedup.ckpt(t(s, d, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byTs))
      .withColumn("new_s",
        (col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > gapUs).cast("long"))
      .withColumn("sid", sum(col("new_s")).over(run))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_ev"),
        (max(col("ts_us")) - min(col("ts_us"))).as("dur_us")),
      rebuild = false)
    val totals = broadcast(sessions
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_ev")).as("n_events")))
    val picked = Ordered
      .withGlobalIndex(sessions.select(col("dur_us"), col("user_id"),
        col("sid")),
        Seq(col("dur_us").asc, col("user_id").asc, col("sid").asc), "i")
      .crossJoin(totals)
      .filter(expr("i + 1 = (n_sessions + 1) DIV 2 " +
        "OR i + 1 = n_sessions DIV 2 + 1"))
      .agg(min(col("dur_us")).as("d_lo"), max(col("dur_us")).as("d_hi"))
    broadcast(picked).crossJoin(totals)
      .select(col("n_sessions"), col("n_events"),
        expr("""ROUND(CAST(n_events AS DOUBLE)
                / CAST(n_sessions AS DOUBLE), 6)""")
          .as("events_per_session"),
        expr("ROUND((d_lo + d_hi) / 2e0 / 1e6, 6)")
          .as("median_dur_s"))
  }

  /** ROC curve points at the nine decade thresholds — the eval table
    * behind every binary-classifier dashboard (label = even user_id,
    * score = value). Scale shape: the corpus collapses ONCE to the
    * (label, decade-bucket) contingency table (≤22 rows), and the
    * nine thresholds fan out over THAT — never over the corpus; all
    * cells integer, TPR/FPR one double division each. Complements
    * [[aggAucRank]] (the area) with the curve itself. */
  def aggRocPoints(s: SparkSession, d: String): DataFrame = {
    val cells = t(s, d, "events")
      .groupBy((col("user_id") % 2 === 0).cast("int").as("label"),
        floor(col("value") / lit(10.0)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
    cells.crossJoin(broadcast(
        s.range(1, 10).select(col("id").as("thr"))))
      .groupBy(col("thr"))
      .agg(
        sum(when(col("label") === 1 && col("bucket") >= col("thr"),
          col("n")).otherwise(0L)).as("tp"),
        sum(when(col("label") === 0 && col("bucket") >= col("thr"),
          col("n")).otherwise(0L)).as("fp"),
        sum(when(col("label") === 1 && col("bucket") < col("thr"),
          col("n")).otherwise(0L)).as("fn"),
        sum(when(col("label") === 0 && col("bucket") < col("thr"),
          col("n")).otherwise(0L)).as("tn"))
      .select(col("thr"), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("""ROUND(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE),
                6)""").as("tpr"),
        expr("""ROUND(CAST(fp AS DOUBLE) / CAST(fp + tn AS DOUBLE),
                6)""").as("fpr"))
      .orderBy(col("thr"))
  }

  /** Apdex score per event type (the Application Performance Index
    * standard: satisfied ≤ T, tolerating ≤ 4T, score = (satisfied +
    * tolerating/2)/n, here with T = 25 on the value column as the
    * latency stand-in). The half-weight closes EXACTLY as the
    * integer ratio (2·sat + tol)/(2n) — no fractional intermediate;
    * one conditional hash aggregate, one double division. */
  def aggApdex(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CASE WHEN value <= 25e0 THEN 1 ELSE 0 END"))
          .as("sat"),
        sum(expr("CASE WHEN value > 25e0 AND value <= 100e0 " +
          "THEN 1 ELSE 0 END")).as("tol"))
      .select(col("event_type"), col("n"), col("sat"), col("tol"),
        expr("""ROUND(CAST(2 * sat + tol AS DOUBLE)
                / CAST(2 * n AS DOUBLE), 6)""").as("apdex"))
      .orderBy(col("event_type"))

  /** MTBF / MTTR from the event stream — the reliability pair every
    * ops review reports: MTBF = mean gap between consecutive 'error'
    * events of a user, MTTR = mean time from an 'error' to that
    * user's NEXT non-error event (the recovery proxy). The
    * next-non-error lookup is a reverse-cumulative MIN over an
    * unbounded-FOLLOWING keyed frame (the as-of pattern — Spark
    * evaluates it as a reverse running min, O(rows) per partition,
    * no per-row rescan). All gaps exact integer µs; the two means
    * close as single divisions. */
  def aggMtbfMttr(s: SparkSession, d: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val follow = byUser.rowsBetween(1, Long.MaxValue)
    val byUserErr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val ev = t(s, d, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val recov = ev
      .withColumn("next_ok_us",
        min(when(col("event_type") =!= "error", col("ts_us")))
          .over(follow))
      .filter(col("event_type") === "error")
      .agg(count(lit(1)).as("n_errors"),
        count(col("next_ok_us")).as("n_recovered"),
        sum(col("next_ok_us") - col("ts_us")).as("ttr_us"))
    val between = ev.filter(col("event_type") === "error")
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUserErr))
      .filter(col("prev_us").isNotNull)
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("ts_us") - col("prev_us")).as("gap_us"))
    broadcast(recov).crossJoin(broadcast(between))
      .select(col("n_errors"), col("n_recovered"), col("n_gaps"),
        expr("""ROUND(CAST(gap_us AS DOUBLE)
                / CAST(n_gaps AS DOUBLE) / 1e6, 6)""").as("mtbf_s"),
        expr("""ROUND(CAST(ttr_us AS DOUBLE)
                / CAST(n_recovered AS DOUBLE) / 1e6, 6)""")
          .as("mttr_s"))
  }

  /** Growth accounting (the new / retained / resurrected / churned
    * decomposition, a.k.a. the "quick ratio" inputs) — the canonical
    * DAU decomposition every growth team reports: for each day,
    * actives split into first-ever-day users, users also active the
    * previous day, and returners after a gap; churned is charged to
    * the day a previously-active user went silent. Shape: ONE
    * (user, day) dedup, a per-user min, and two self-joins of the
    * day-shifted activity table — all hash joins on (user, day) keys,
    * all counts integer, no windows. */
  def aggGrowthAccounting(s: SparkSession, d: String): DataFrame = {
    val ud = t(s, d, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val first = ud.groupBy(col("user_id")).agg(min(col("day")).as("fd"))
    val yesterday = ud.select(col("user_id"),
      date_add(col("day"), 1).as("day"), lit(1L).as("was_prev"))
    val active = ud.join(first, "user_id")
      .join(yesterday, Seq("user_id", "day"), "left")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("fd"), 1L).otherwise(0L))
          .as("n_new"),
        sum(when(col("was_prev").isNotNull, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("day") =!= col("fd") && col("was_prev").isNull,
          1L).otherwise(0L)).as("n_resurrected"))
    val churned = yesterday.select(col("user_id"), col("day"))
      .join(ud, Seq("user_id", "day"), "left_anti")
      .groupBy(col("day")).agg(count(lit(1)).as("n_churned"))
    active.join(churned, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .orderBy(col("day"))
  }

  /** Power-user curve — the activity histogram (how many users were
    * active exactly k days) behind L28-style engagement charts; the
    * shape (bimodal = a power-user core, monotone = casual drive-by)
    * is the first thing a growth review reads. Two hash aggregates,
    * all integer, plus each bucket's share of users in one double. */
  def aggActivityHistogram(s: SparkSession, d: String): DataFrame = {
    val perUser = t(s, d, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("days_active"))
    perUser.groupBy(col("days_active"))
      .agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(perUser.agg(count(lit(1)).as("total_users"))))
      .select(col("days_active"), col("n_users"),
        expr("""ROUND(CAST(n_users AS DOUBLE)
                / CAST(total_users AS DOUBLE), 6)""").as("user_share"))
      .orderBy(col("days_active"))
  }

  /** Difference-in-differences per event type — the workhorse causal
    * estimator for "the change shipped mid-period: what was its
    * effect?": treatment = even user_id, periods split at the
    * data-driven calendar midpoint (the [[aggCaptureRecapture]]
    * convention), DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre).
    * Eight exact cells (4 decimal value masses + 4 counts) from ONE
    * conditional aggregate; every mean and the DiD close in one
    * double expression each. */
  def aggDiffInDiff(s: SparkSession, d: String): DataFrame = {
    val bounds = broadcast(t(s, d, "events")
      .agg(min(to_date(col("ts"))).as("d_min"),
        max(to_date(col("ts"))).as("d_max")))
    def cell(treat: Boolean, post: Boolean, agg: String): Column = {
      val tc = if (treat) "user_id % 2 = 0" else "user_id % 2 <> 0"
      val pc = if (post) "day > cut" else "day <= cut"
      expr(s"$agg(CASE WHEN $tc AND $pc THEN v END)")
    }
    t(s, d, "events")
      .select(col("event_type"), col("user_id"),
        to_date(col("ts")).as("day"),
        col("value").cast("decimal(18,4)").as("v"))
      .crossJoin(bounds)
      .withColumn("cut",
        expr("date_add(d_min, CAST(datediff(d_max, d_min) DIV 2 AS INT))"))
      .groupBy(col("event_type"))
      .agg(cell(treat = true, post = false, "SUM").as("s_t0"),
        cell(treat = true, post = false, "COUNT").as("c_t0"),
        cell(treat = true, post = true, "SUM").as("s_t1"),
        cell(treat = true, post = true, "COUNT").as("c_t1"),
        cell(treat = false, post = false, "SUM").as("s_c0"),
        cell(treat = false, post = false, "COUNT").as("c_c0"),
        cell(treat = false, post = true, "SUM").as("s_c1"),
        cell(treat = false, post = true, "COUNT").as("c_c1"))
      .select(col("event_type"), col("c_t0"), col("c_t1"), col("c_c0"),
        col("c_c1"),
        expr("""ROUND((CAST(s_t1 AS DOUBLE) / CAST(c_t1 AS DOUBLE)
                - CAST(s_t0 AS DOUBLE) / CAST(c_t0 AS DOUBLE))
                - (CAST(s_c1 AS DOUBLE) / CAST(c_c1 AS DOUBLE)
                - CAST(s_c0 AS DOUBLE) / CAST(c_c0 AS DOUBLE)), 6)""")
          .as("did"))
      .orderBy(col("event_type"))
  }

  /** ONE expectation–maximization step for a two-component Gaussian
    * mixture over `value` — the distributed model-fitting companion
    * to [[graft.llm.TextStats.textClassifierTrainStep]] (E-step
    * responsibilities from literal initial parameters μ=(30,100),
    * σ=(20,50), equal priors; M-step updated priors/means/sigmas).
    * Float discipline: the per-row responsibility is ONE
    * deterministic double expression ROUNDED to 6 dp then carried as
    * DECIMAL (its complement is the EXACT decimal 1 − r, so masses
    * add to N exactly); the r·x and r·x² contributions are likewise
    * rounded-then-decimal, so every E-step sum is order-independent
    * cross-engine; each M-step output closes in one expression.
    * Scale: one scan, ONE 7-sum aggregate (state O(1)), a 2-row
    * stack — the textbook data-parallel EM shape. */
  def aggEmStep(s: SparkSession, d: String): DataFrame = {
    val r1 = expr(
      """CAST(ROUND(
        |  (EXP(0e0 - (value - 30e0) * (value - 30e0) / (2e0 * 400e0))
        |     / 20e0)
        |  / (EXP(0e0 - (value - 30e0) * (value - 30e0) / (2e0 * 400e0))
        |       / 20e0
        |     + EXP(0e0 - (value - 100e0) * (value - 100e0)
        |         / (2e0 * 2500e0)) / 50e0), 6) AS DECIMAL(18,6))"""
        .stripMargin)
    t(s, d, "events")
      .select(col("value"), r1.as("r1"))
      .withColumn("r2",
        lit(BigDecimal(1).setScale(6)).cast("decimal(18,6)") - col("r1"))
      .select(col("value"), col("r1"), col("r2"),
        expr("CAST(ROUND(CAST(r1 AS DOUBLE) * value, 6) AS DECIMAL(24,6))")
          .as("r1x"),
        expr("""CAST(ROUND(CAST(r1 AS DOUBLE) * value * value, 6)
                AS DECIMAL(28,6))""").as("r1xx"),
        expr("CAST(ROUND(CAST(r2 AS DOUBLE) * value, 6) AS DECIMAL(24,6))")
          .as("r2x"),
        expr("""CAST(ROUND(CAST(r2 AS DOUBLE) * value * value, 6)
                AS DECIMAL(28,6))""").as("r2xx"))
      .agg(count(lit(1)).as("n"),
        sum(col("r1")).as("s1"), sum(col("r1x")).as("s1x"),
        sum(col("r1xx")).as("s1xx"),
        sum(col("r2")).as("s2"), sum(col("r2x")).as("s2x"),
        sum(col("r2xx")).as("s2xx"))
      .select(expr(
        """stack(2,
          |  1, n, CAST(s1 AS DOUBLE), CAST(s1x AS DOUBLE),
          |     CAST(s1xx AS DOUBLE),
          |  2, n, CAST(s2 AS DOUBLE), CAST(s2x AS DOUBLE),
          |     CAST(s2xx AS DOUBLE))
          |AS (component, n, sr, srx, srxx)""".stripMargin))
      .select(col("component"), col("n"),
        expr("ROUND(sr, 4)").as("n_eff"),
        expr("ROUND(sr / n, 6)").as("pi_new"),
        expr("ROUND(srx / sr, 4)").as("mu_new"),
        expr("ROUND(SQRT(srxx / sr - (srx / sr) * (srx / sr)), 4)")
          .as("sigma_new"))
      .orderBy(col("component"))
  }

  /** ATT by nearest-neighbor matching on an activity score — the
    * observational-causal estimator completing the CUPED /
    * diff-in-diff / permutation family: every hash-arm-1 ("treated")
    * user is matched WITH REPLACEMENT to the control population at
    * the nearest activity score, and the average treatment effect on
    * the treated is the mean outcome gap over matches (outcome = the
    * high-value event indicator). Scale discipline: matching never
    * touches user pairs — both arms reduce to their (score → count,
    * positives) GRIDS (value-space bounded), the nearest control
    * score comes from two ignore-nulls running windows over the
    * merged grid (above aggregates — the allowed class), equal
    * scores match at distance 0 via the (score, arm) ordering, and
    * ties between sides break toward the previous (≤) score on both
    * engines. Per-score ATT terms are round-then-decimal (the
    * rational control mean ȳc enters each), so the sum is
    * partition-order independent; the estimate closes in one
    * division. */
  def aggAttMatching(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val users = t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("score"),
        max(when(col("value") >= 200.0, 1L).otherwise(0L)).as("y"))
      .withColumn("arm",
        conv(substring(md5(col("user_id").cast("string")), 1, 6), 16, 10)
          .cast("long") % 2L)
    val grid = users.groupBy(col("arm"), col("score"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
    val ctlStruct = when(col("arm") === 0L,
      struct(col("score").as("cs"), col("n").as("cn"),
        col("sy").as("csy")))
    val wPrev = Window.orderBy(col("score"), col("arm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.orderBy(col("score").desc, col("arm").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nCtl = grid.filter(col("arm") === 0L)
      .agg(sum(col("n")).as("n_controls"))
    grid
      .withColumn("prev", last(ctlStruct, ignoreNulls = true).over(wPrev))
      .withColumn("next", last(ctlStruct, ignoreNulls = true).over(wNext))
      .filter(col("arm") === 1L)
      .withColumn("m",
        when(col("prev").isNull, col("next"))
          .when(col("next").isNull, col("prev"))
          .when(col("score") - col("prev.cs") <=
            col("next.cs") - col("score"), col("prev"))
          .otherwise(col("next")))
      .withColumn("term", expr(
        """CAST(ROUND(sy - CAST(n AS DOUBLE) * m.csy / m.cn, 6)
          |  AS DECIMAL(20,6))""".stripMargin))
      .withColumn("gap", col("n") * abs(col("score") - col("m.cs")))
      .agg(sum(col("n")).as("n_treated"),
        sum(col("sy")).as("n_pos_treated"),
        sum(col("term")).as("att_num"),
        sum(col("gap")).as("gap_sum"))
      .crossJoin(broadcast(nCtl))
      .select(col("n_treated"), col("n_controls"), col("n_pos_treated"),
        expr("ROUND(CAST(att_num AS DOUBLE) / n_treated, 6)").as("att"),
        expr("ROUND(CAST(gap_sum AS DOUBLE) / n_treated, 4)")
          .as("mean_score_gap"))
  }

  /** Geometric mean of value per event type — the right average for
    * multiplicative quantities (latencies, ratios) and a standard SQL
    * gap (no GEOMEAN builtin in either engine). Rides the
    * [[aggEntropy]] irrational-term discipline: ln(value) is rounded
    * to 6 dp PER ROW and summed as an exact DECIMAL (order-
    * independent, cross-engine identical), then ONE closing
    * exp(sum/n). values are > 0 by fixture contract; a NULL-on-
    * nonpositive guard keeps the ln total. */
  def aggGeometricMean(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_type"),
        when(col("value") > 0.0, round(log(col("value")), 6))
          .cast("decimal(20,6)").as("lnv"))
      .groupBy(col("event_type"))
      .agg(count(col("lnv")).as("n"), sum(col("lnv")).as("sln"))
      .select(col("event_type"), col("n"),
        expr("ROUND(EXP(CAST(sln AS DOUBLE) / n), 4)").as("geo_mean"))
      .orderBy(col("event_type"))

  /** Threshold confusion matrices + precision/recall/F1 — the eval
    * table every binary classifier ships with (here: "will this user
    * produce a high-value (≥ 200) event?" predicted from activity
    * volume; the thresholds straddle the per-user count distribution
    * — min ~45, median ~66, max ~99 at every sf — and the outcome
    * splits ~68/32, both chosen by the round-10 degeneracy audit
    * after the original purchase outcome saturated). One per-user
    * reduction, a 5-way
    * literal-threshold fan-out of the USER table (never raw events),
    * one ≤5-row aggregate; every metric closes in ONE double division
    * over exact counts, NULL (not NaN/0) when a denominator is empty. */
  def aggConfusionF1(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("value") >= 200.0, 1L).otherwise(0L))
          .as("y"))
      .select(col("n_events"), col("y"),
        explode(array(lit(55L), lit(62L), lit(67L), lit(72L), lit(80L)))
          .as("tau"))
      .groupBy(col("tau"))
      .agg(
        sum(when(col("n_events") >= col("tau") && col("y") === 1L, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("n_events") >= col("tau") && col("y") === 0L, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("n_events") < col("tau") && col("y") === 1L, 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("n_events") < col("tau") && col("y") === 0L, 1L)
          .otherwise(0L)).as("tn"))
      .select(col("tau"), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 6)")
          .as("prec"),
        expr("ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 6)")
          .as("rec"),
        expr("ROUND(CAST(2 * tp AS DOUBLE) / NULLIF(2 * tp + fp + fn, 0), 6)")
          .as("f1"))
      .orderBy(col("tau"))

  /** Fleiss' κ (Fleiss 1971) — inter-rater agreement for MORE than two
    * raters, the multi-rater extension of [[aggCohenKappa]]: subjects =
    * complete days (every event type present, the [[aggCochranQ]]
    * block rule), raters = the k event types, binary category = "the
    * type ran above its average daily volume that day"
    * ([[dayTypeBusyCells]]). κ =
    * (P̄ − P̄ₑ)/(1 − P̄ₑ) closes as ONE division of exact integer
    * cross-multiplications: with R = Σrᵢ, T₂ = Σrᵢ², a = 2T₂ − 2kR +
    * Nk(k−1), b = Nk(k−1), c = R² + (Nk−R)², e = (Nk)², κ = (ae − bc)
    * / (b(e − c)); degenerate all-one-category data (e = c) is NULL
    * via the exact integer guard. Two bounded aggregates, k counted
    * from data. */
  def aggFleissKappa(s: SparkSession, d: String): DataFrame = {
    val k1 = t(s, d, "events")
      .agg(countDistinct(col("event_type")).as("k"))
    val cell = dayTypeBusyCells(s, d)
    val blocks = cell.groupBy(col("day"))
      .agg(count(lit(1)).as("nt"), sum(col("x")).as("r_i"))
      .crossJoin(broadcast(k1))
      .filter(col("nt") === col("k"))
    blocks
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("r_i")).as("r"),
        sum(col("r_i") * col("r_i")).as("t2"))
      .withColumn("a",
        lit(2L) * col("t2") - lit(2L) * col("k") * col("r") +
          col("n_days") * col("k") * (col("k") - 1L))
      .withColumn("b", col("n_days") * col("k") * (col("k") - 1L))
      .withColumn("c",
        col("r") * col("r") +
          (col("n_days") * col("k") - col("r")) *
          (col("n_days") * col("k") - col("r")))
      .withColumn("e",
        col("n_days") * col("k") * col("n_days") * col("k"))
      .select(col("n_days"), col("k").cast("long").as("k"),
        expr("ROUND(CAST(a AS DOUBLE) / b, 6)").as("p_bar"),
        expr("ROUND(CAST(c AS DOUBLE) / e, 6)").as("p_e"),
        expr("""ROUND(CASE WHEN e = c THEN NULL
                ELSE CAST(a * e - b * c AS DOUBLE) / (b * (e - c))
                END, 6)""").as("kappa"))
  }

  /** Brier score with the Murphy (1973) reliability/resolution
    * decomposition — the probabilistic-forecast audit behind every
    * calibration dashboard ([[aggCalibrationCurve]] plots it; this
    * SCORES it). Forecast = activity-decile midpoint p = (2d−1)/20
    * (the [[aggGainsDeciles]] global-decile machinery — exact ntile
    * from the zipWithIndex rank), outcome = the user produced a
    * high-value (≥ 200) event (~68/32 split; the purchase outcome
    * saturated — round-10 degeneracy audit). Every bin term
    * is an exact integer cross-multiplication over (n_k, c_k, S_k =
    * Σ(p_num − 20y)², N, C): the per-bin Brier contribution is
    * S_k/(400N), reliability n_k(p_k−ȳ_k)² = (p_num·n_k − 20c_k)²/
    * (400·n_k·N), resolution n_k(ȳ_k−ȳ)²/N = (c_k·N − C·n_k)²/(n_k·N³)
    * — one ROUND each, no float accumulates anywhere (per-bin rows,
    * never a float sum across bins). Scale: one user reduction, one
    * |users|-row range shuffle for the decile, one 10-row aggregate +
    * windows above it. */
  def aggBrierDecomposition(s: SparkSession, d: String): DataFrame = {
    val users = t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("value") >= 200.0, 1L).otherwise(0L))
          .as("y"))
    val withN = users.crossJoin(
      broadcast(users.agg(count(lit(1)).as("n_all"))))
    val ranked = graft.queries.Ordered
      .withGlobalIndex(withN, Seq(col("n_events"), col("user_id")), "__idx")
      .withColumn("__rank", col("__idx") + 1)
    val binned = graft.queries.Ordered
      .ntileFromRank(ranked, "__rank", "n_all", 10, "bin")
      .withColumn("p_num", lit(2L) * col("bin") - 1L)
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(Long.MinValue, Long.MaxValue)
    binned
      .groupBy(col("bin"), col("p_num"))
      .agg(count(lit(1)).as("n_k"),
        sum(col("y")).as("c_k"),
        sum((col("p_num") - lit(20L) * col("y")) *
          (col("p_num") - lit(20L) * col("y"))).as("s_k"))
      .withColumn("n", sum(col("n_k")).over(all))
      .withColumn("c", sum(col("c_k")).over(all))
      .select(col("bin"), col("n_k").as("n_users"), col("c_k").as("n_conv"),
        expr("ROUND(CAST(p_num AS DOUBLE) / 20, 6)").as("forecast_p"),
        expr("ROUND(CAST(c_k AS DOUBLE) / n_k, 6)").as("obs_rate"),
        expr("ROUND(CAST(s_k AS DOUBLE) / (400 * n), 6)").as("brier_term"),
        expr("""ROUND(CAST((p_num * n_k - 20 * c_k) *
                (p_num * n_k - 20 * c_k) AS DOUBLE)
                / (400e0 * n_k * n), 6)""").as("rel_term"),
        expr("""ROUND(CAST((c_k * n - c * n_k) * (c_k * n - c * n_k)
                AS DOUBLE) / (CAST(n_k AS DOUBLE) * n * n * n), 6)""")
          .as("res_term"))
      .orderBy(col("bin"))
  }

  /** Granger causality (Granger 1969) at lag 1 between the daily
    * click and purchase count series — "do yesterday's clicks help
    * predict today's purchases beyond yesterday's purchases?", the
    * standard lead-lag screen in growth analytics. Both directions
    * ship as rows. The restricted (AR(1)) and unrestricted (+ the
    * other series' lag) OLS fits close over FOURTEEN exact BIGINT
    * moments of the |days|-row lagged series, computed in ONE
    * aggregate (both directions share the scan); the centered normal-
    * equation determinants and RSS quotients are plain single-row
    * double arithmetic over those exact integers (identical
    * expression text in the oracle ⇒ identical IEEE results), with
    * F = (T−3)(RSS_r − RSS_u)/RSS_u; singular designs are NULL via
    * exact guards. Scale: one (day) aggregate, a calendar-bounded lag
    * window above it, everything after is one row. */
  def aggGrangerCausality(s: SparkSession, d: String): DataFrame = {
    val byDay = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    val lagged = t(s, d, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("xv"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("yv"))
      .withColumn("xl", lag(col("xv"), 1).over(byDay))
      .withColumn("yl", lag(col("yv"), 1).over(byDay))
      .filter(col("xl").isNotNull)
    val moments = lagged.agg(
      count(lit(1)).as("t"),
      sum(col("yv")).as("sy"), sum(col("xv")).as("sx"),
      sum(col("yl")).as("syl"), sum(col("xl")).as("sxl"),
      sum(col("yv") * col("yv")).as("syy"),
      sum(col("xv") * col("xv")).as("sxx"),
      sum(col("yl") * col("yl")).as("syl2"),
      sum(col("xl") * col("xl")).as("sxl2"),
      sum(col("yl") * col("xl")).as("sylxl"),
      sum(col("yl") * col("yv")).as("syly"),
      sum(col("xl") * col("yv")).as("sxly"),
      sum(col("xl") * col("xv")).as("sxlx"),
      sum(col("yl") * col("xv")).as("sylx"))
    // direction rows: (target sums, own-lag sums, cross-lag sums)
    val stacked = moments.select(expr(
      """stack(2,
        |  'click->purchase', t, sy,  syl,  sxl,  syy, syl2, sxl2,
        |    sylxl, syly, sxly,
        |  'purchase->click', t, sx,  sxl,  syl,  sxx, sxl2, syl2,
        |    sylxl, sxlx, sylx)
        |AS (direction, t, s_y, s_1, s_2, s_yy, s_11, s_22, s_12,
        |    s_1y, s_2y)""".stripMargin))
    stacked
      .withColumn("m11", col("t") * col("s_11") - col("s_1") * col("s_1"))
      .withColumn("m22", col("t") * col("s_22") - col("s_2") * col("s_2"))
      .withColumn("m12", col("t") * col("s_12") - col("s_1") * col("s_2"))
      .withColumn("m1y", col("t") * col("s_1y") - col("s_1") * col("s_y"))
      .withColumn("m2y", col("t") * col("s_2y") - col("s_2") * col("s_y"))
      .withColumn("myy", col("t") * col("s_yy") - col("s_y") * col("s_y"))
      .withColumn("det",
        expr("CAST(m11 AS DOUBLE) * m22 - CAST(m12 AS DOUBLE) * m12"))
      .withColumn("rss_r",
        expr("CAST(myy AS DOUBLE) - CAST(m1y AS DOUBLE) * m1y / m11"))
      .withColumn("rss_u",
        expr("""CAST(myy AS DOUBLE)
                - (CAST(m22 AS DOUBLE) * m1y * m1y
                   - 2e0 * CAST(m12 AS DOUBLE) * m1y * m2y
                   + CAST(m11 AS DOUBLE) * m2y * m2y) / det"""))
      .select(col("direction"), col("t").as("n_obs"),
        expr("""ROUND(CASE WHEN m11 <= 0 OR det <= 0e0 OR rss_u <= 0e0
                THEN NULL
                ELSE (t - 3) * (rss_r - rss_u) / rss_u END, 4)""")
          .as("f_stat"))
      .orderBy(col("direction"))
  }

  /** KMV (bottom-k / k-minimum-values) distinct sketch — the
    * MERGEABLE cardinality estimator (Bar-Yossef et al., RANDOM'02;
    * the theta-sketch core): hash every value to a uniform 48-bit
    * integer, keep each group's k = 64 smallest DISTINCT hashes, and
    * estimate |D| ≈ (k−1)·2⁴⁸ / h_(k) from the k-th minimum. Unlike
    * the built-in HLL key (agg_approx_distinct_hll, rows-only), the
    * KMV estimate is exact integer algebra over a deterministic md5
    * hash, so the DuckDB gate replays it bit-for-bit — an ORACLED
    * approximate-distinct.
    *
    * Scale shape: the per-group bottom-k is a rank filter Spark
    * executes as a WindowGroupLimit k-heap BEFORE the exchange (each
    * map task forwards ≤ k rows per group — the sketch's mergeability
    * materialized in the plan); estimate algebra runs on k·|groups|
    * rows. Groups under k distinct values fall back to the exact
    * count (the sketch is exact below saturation by construction). */
  def aggKmvDistinct(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // (priority, status) grouping: at sf0.001 one cell sits BELOW
    // k = 64 distinct customers, so the unsaturated exact-count
    // fallback executes and gates alongside the saturated estimate
    // path (both branches live at the gate sf)
    val h = t(s, d, "orders")
      .select(col("o_orderpriority"), col("o_orderstatus"),
        conv(substring(md5(col("o_custkey").cast("string")), 1, 12),
          16, 10).cast("long").as("h"))
      .distinct()
    val rk = Window
      .partitionBy(col("o_orderpriority"), col("o_orderstatus"))
      .orderBy(col("h"))
    // rank filter ≤ k ⇒ WindowGroupLimit k-heap per map task — only
    // the sketch (≤ k rows/group) ever crosses the exchange; the
    // exact count is deliberately NOT computed (that would be the
    // full distinct the sketch exists to avoid)
    h.withColumn("r", row_number().over(rk))
      .filter(col("r") <= 64)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_kept"),
        max(when(col("r") === 64, col("h"))).as("hk"))
      .select(col("o_orderpriority"), col("o_orderstatus"),
        col("n_kept"),
        coalesce(col("hk"), lit(0L)).as("h_k"),
        when(col("hk").isNull, col("n_kept"))
          .otherwise(expr("(63 * 281474976710656L) div hk"))
          .as("kmv_estimate"))
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_kmv_distinct" -> (aggKmvDistinct _),
    "agg_confusion_f1" -> (aggConfusionF1 _),
    "agg_nelson_aalen" -> (aggNelsonAalen _),
    "agg_em_step" -> (aggEmStep _),
    "agg_att_matching" -> (aggAttMatching _),
    "agg_cvar" -> (aggCvar _),
    "agg_geometric_mean" -> (aggGeometricMean _),
    "agg_cliffs_delta" -> (aggCliffsDelta _),
    "agg_anderson_darling" -> (aggAndersonDarling _),
    "agg_cohens_d" -> (aggCohensD _),
    "agg_tost_equivalence" -> (aggTostEquivalence _),
    "agg_fleiss_kappa" -> (aggFleissKappa _),
    "agg_brier_decomposition" -> (aggBrierDecomposition _),
    "agg_granger_causality" -> (aggGrangerCausality _),
    "agg_diff_in_diff" -> (aggDiffInDiff _),
    "agg_growth_accounting" -> (aggGrowthAccounting _),
    "agg_activity_histogram" -> (aggActivityHistogram _),
    "agg_apdex" -> (aggApdex _),
    "agg_mtbf_mttr" -> (aggMtbfMttr _),
    "agg_roc_points" -> (aggRocPoints _),
    "agg_session_stats" -> (aggSessionStats _),
    "agg_capture_recapture" -> (aggCaptureRecapture _),
    "agg_trimmed_mean" -> (aggTrimmedMean _),
    "agg_shapley_attribution" -> (aggShapleyAttribution _),
    "agg_two_proportion_z" -> (aggTwoProportionZ _),
    "agg_pass_at_k" -> (aggPassAtK _),
    "agg_cochran_q" -> (aggCochranQ _),
    "agg_mcnemar_test" -> (aggMcnemarTest _),
    "agg_tukey_outliers" -> (aggTukeyOutliers _),
    "agg_dispersion_index" -> (aggDispersionIndex _),
    "agg_bh_fdr" -> (aggBhFdr _),
    "agg_friedman_test" -> (aggFriedmanTest _),
    "agg_lorenz_curve" -> (aggLorenzCurve _),
    "agg_odds_ratio" -> (aggOddsRatio _),
    "agg_wilson_ci" -> (aggWilsonCi _),
    "agg_dau_wau" -> (aggDauWau _),
    "agg_sample_native" -> (aggSampleNative _),
    "agg_average_precision" -> (aggAveragePrecision _),
    "agg_cvm_test" -> (aggCvmTest _),
    "agg_hill_tail_index" -> (aggHillTailIndex _),
    "agg_mean_excess" -> (aggMeanExcess _),
    "agg_conformal_interval" -> (aggConformalInterval _),
    "agg_weighted_median" -> (aggWeightedMedian _),
    "agg_attribution" -> (aggAttribution _),
    "agg_kruskal_wallis" -> (aggKruskalWallis _),
    "agg_spearman_corr" -> (aggSpearmanCorr _),
    "agg_kendall_tau" -> (aggKendallTau _),
    "agg_levene_test" -> (aggLeveneTest _),
    "profile_interarrival" -> (profileInterarrival _),
    "agg_srm_check" -> (aggSrmCheck _),
    "agg_calibration_curve" -> (aggCalibrationCurve _),
    "agg_ece" -> (aggEce _),
    "agg_table_checksum" -> (aggTableChecksum _),
    "agg_cohen_kappa" -> (aggCohenKappa _),
    "agg_gains_deciles" -> (aggGainsDeciles _),
    "agg_exp_histogram" -> (aggExpHistogram _),
    "agg_time_to_convert" -> (aggTimeToConvert _),
    "agg_abtest_lift" -> (aggAbtestLift _),
    "agg_seasonality" -> (aggSeasonality _),
    "agg_higher_moments" -> (aggHigherMoments _),
    "agg_markov_transition" -> (aggMarkovTransition _),
    "agg_cohort_matrix" -> (aggCohortMatrix _),
    "agg_benford" -> (aggBenford _),
    "agg_path_mining" -> (aggPathMining _),
    "agg_type_cooccurrence" -> (aggTypeCooccurrence _),
    "agg_association_rules" -> (aggAssociationRules _),
    "agg_heavy_hitters_native" -> (aggHeavyHittersNative _),
    "agg_heavy_hitters" -> (aggHeavyHitters _),
    "window_mad_outlier" -> (windowMadOutlier _),
    "agg_gini" -> (aggGini _),
    "agg_entropy" -> (aggEntropy _),
    "agg_chi2_independence" -> (aggChi2Independence _),
    "agg_ks_test" -> (aggKsTest _),
    "agg_mann_whitney" -> (aggMannWhitney _),
    "agg_anova_f" -> (aggAnovaF _),
    "agg_stratified_effect" -> (aggStratifiedEffect _),
    "agg_auc_rank" -> (aggAucRank _),
    "agg_t_test" -> (aggTTest _),
    "profile_drift_psi" -> (profileDriftPsi _),
    "profile_key_skew" -> (profileKeySkew _),
    "agg_corr_matrix" -> (aggCorrMatrix _),
    "agg_rare_collapse" -> (aggRareCollapse _),
    "agg_autocorrelation" -> (aggAutocorrelation _),
    "agg_survival_km" -> (aggSurvivalKm _),
    "agg_changepoint_binary" -> (aggChangepointBinary _),
    "agg_hhi" -> (aggHhi _),
    "agg_runs_test" -> (aggRunsTest _),
    "agg_mann_kendall" -> (aggMannKendall _),
    "agg_bootstrap_ci" -> (aggBootstrapCi _),
    "agg_cuped" -> (aggCuped _),
    "agg_permutation_test" -> (aggPermutationTest _),
    "agg_delta_ratio_ci" -> (aggDeltaRatioCi _),
    "agg_power_analysis" -> (aggPowerAnalysis _),
    "profile_freshness" -> (profileFreshness _),
    "agg_winsorized_mean" -> (aggWinsorizedMean _),
    "agg_mutual_information" -> (aggMutualInformation _),
    "agg_cramers_v" -> (aggCramersV _),
    "agg_theil_index" -> (aggTheilIndex _),
    "anomaly_zscore" -> (anomalyZscore _),
    "agg_bitmap_distinct" -> (aggBitmapDistinct _),
    "agg_funnel" -> (aggFunnel _),
    "agg_retention" -> (aggRetention _),
    "agg_sequence_match" -> (aggSequenceMatch _),
    "agg_hll_union" -> (aggHllUnionCheck _),
    "agg_hll_intersection" -> (aggHllIntersectionCheck _),
    "agg_mode" -> (aggMode _),
    "agg_count_min_sketch" -> (aggCountMinSketchCheck _),
    "agg_hash_groupby" -> (aggHashGroupby _),
    "agg_count_distinct" -> (aggCountDistinct _),
    "agg_multi_distinct" -> (aggMultiDistinct _),
    "agg_rollup" -> (aggRollup _),
    "agg_cube" -> (aggCube _),
    "agg_grouping_sets" -> (aggGroupingSets _),
    "agg_collect" -> (aggCollect _),
    "agg_stats" -> (aggStats _),
    "agg_regression" -> (aggRegression _),
    "agg_quantile_approx" -> (aggQuantileApprox _),
    "agg_pivot" -> (aggPivot _),
    "agg_percentile" -> (aggPercentile _),
    "agg_typed_dataset" -> (aggTypedDataset _),
    "agg_unpivot" -> (aggUnpivot _),
    "agg_bitwise" -> (aggBitwise _),
    "agg_filter_clause" -> (aggFilterClause _),
    "agg_string_concat" -> (aggStringConcat _),
    "agg_skew_salted" -> (aggSkewSalted _),
    "agg_arg_extremes" -> (aggArgExtremes _),
    "agg_histogram" -> (aggHistogram _),
    "agg_approx_distinct_hll" -> (aggApproxDistinctHllCheck _)
  )

  private[graft] val heavyHittersOracle =
    """WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
      |), c AS (
      |  SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1
      |), t AS (
      |  SELECT COUNT(*) AS n_total FROM toks
      |)
      |SELECT tok, cnt, n_total,
      |  ROUND(CAST(cnt AS DOUBLE) / n_total, 6) AS share
      |FROM c CROSS JOIN t
      |WHERE cnt * 31 > n_total
      |ORDER BY cnt DESC, tok""".stripMargin

  val oracles: Map[String, String] = Map(
    // same 48-bit md5 hash space, same bottom-64 per group, same
    // (k−1)·2⁴⁸ div h_k integer estimate with unsaturated fallback
    "agg_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT o_orderpriority, o_orderstatus,
        |    CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)),
        |      1, 12)) AS BIGINT) AS h
        |  FROM orders),
        |r AS (
        |  SELECT o_orderpriority, o_orderstatus, h,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority,
        |      o_orderstatus ORDER BY h) AS r
        |  FROM h),
        |k AS (
        |  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_kept,
        |    MAX(CASE WHEN r = 64 THEN h END) AS hk
        |  FROM r WHERE r <= 64 GROUP BY 1, 2)
        |SELECT o_orderpriority, o_orderstatus,
        |  CAST(n_kept AS BIGINT) AS n_kept,
        |  CAST(COALESCE(hk, 0) AS BIGINT) AS h_k,
        |  CAST(CASE WHEN hk IS NULL THEN n_kept
        |       ELSE (63 * 281474976710656) // hk END AS BIGINT)
        |    AS kmv_estimate
        |FROM k ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    // exact confusion counts per literal threshold; P/R/F1 one
    // division each, NULL (not 0) on empty denominators
    "agg_confusion_f1" ->
      """WITH u AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    MAX(CASE WHEN value >= 200.0 THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY 1),
        |g AS (
        |  SELECT tau,
        |    CAST(SUM(CASE WHEN n_events >= tau AND y = 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN n_events >= tau AND y = 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN n_events < tau AND y = 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(SUM(CASE WHEN n_events < tau AND y = 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM u CROSS JOIN (SELECT CAST(unnest([55, 62, 67, 72, 80])
        |    AS BIGINT) AS tau)
        |  GROUP BY 1)
        |SELECT tau, tp, fp, fn, tn,
        |  ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 6) AS prec,
        |  ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 6) AS rec,
        |  ROUND(CAST(2 * tp AS DOUBLE) / NULLIF(2 * tp + fp + fn, 0), 6)
        |    AS f1
        |FROM g ORDER BY tau""".stripMargin,
    // the survival_km lifetime relation, hazard increments d/n via
    // round-then-decimal, exact running sum, one closing cast
    "agg_nelson_aalen" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view'
        |        THEN CAST(ts AS DATE) END) AS first_view,
        |    MIN(CASE WHEN event_type = 'purchase'
        |        THEN CAST(ts AS DATE) END) AS first_purchase
        |  FROM events GROUP BY user_id
        |), km AS (
        |  SELECT CASE WHEN first_purchase IS NOT NULL
        |              AND first_purchase >= first_view
        |         THEN datediff('day', first_view, first_purchase)
        |         ELSE datediff('day', first_view,
        |           (SELECT MAX(CAST(ts AS DATE)) FROM events)) END
        |      AS lifetime,
        |    CAST(first_purchase IS NOT NULL
        |         AND first_purchase >= first_view AS INTEGER) AS converted
        |  FROM pu WHERE first_view IS NOT NULL
        |), hist AS (
        |  SELECT lifetime AS t, COUNT(*) AS n,
        |    CAST(SUM(converted) AS BIGINT) AS d
        |  FROM km GROUP BY lifetime
        |), risk AS (
        |  SELECT t, d,
        |    CAST(SUM(n) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS n_risk
        |  FROM hist
        |), terms AS (
        |  SELECT t, d, n_risk,
        |    CAST(ROUND(CAST(d AS DOUBLE) / n_risk, 6)
        |      AS DECIMAL(18,6)) AS hterm
        |  FROM risk WHERE d > 0
        |)
        |SELECT t, d, n_risk,
        |  ROUND(CAST(SUM(hterm) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE), 4) AS cum_hazard
        |FROM terms ORDER BY t""".stripMargin,
    // grid-level nearest-score matching: ignore-nulls running windows
    // over the merged (arm, score) grid, prev-tie rule, per-score
    // round-then-decimal ATT terms, one closing division
    "agg_att_matching" ->
      """WITH u AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS score,
        |    CAST(MAX(CASE WHEN value >= 200.0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y,
        |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
        |      1, 6)) AS BIGINT) % 2 AS arm
        |  FROM events GROUP BY 1),
        |grid AS (
        |  SELECT arm, score, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS sy
        |  FROM u GROUP BY 1, 2),
        |w AS (
        |  SELECT arm, score, n, sy,
        |    last_value(CASE WHEN arm = 0 THEN score END IGNORE NULLS)
        |      OVER (ORDER BY score, arm
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS p_cs,
        |    last_value(CASE WHEN arm = 0 THEN n END IGNORE NULLS)
        |      OVER (ORDER BY score, arm
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS p_cn,
        |    last_value(CASE WHEN arm = 0 THEN sy END IGNORE NULLS)
        |      OVER (ORDER BY score, arm
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS p_csy,
        |    last_value(CASE WHEN arm = 0 THEN score END IGNORE NULLS)
        |      OVER (ORDER BY score DESC, arm DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS n_cs,
        |    last_value(CASE WHEN arm = 0 THEN n END IGNORE NULLS)
        |      OVER (ORDER BY score DESC, arm DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS n_cn,
        |    last_value(CASE WHEN arm = 0 THEN sy END IGNORE NULLS)
        |      OVER (ORDER BY score DESC, arm DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS n_csy
        |  FROM grid),
        |m AS (
        |  SELECT score, n, sy,
        |    CASE WHEN p_cs IS NULL THEN n_cs
        |         WHEN n_cs IS NULL THEN p_cs
        |         WHEN score - p_cs <= n_cs - score THEN p_cs
        |         ELSE n_cs END AS m_cs,
        |    CASE WHEN p_cs IS NULL THEN n_cn
        |         WHEN n_cs IS NULL THEN p_cn
        |         WHEN score - p_cs <= n_cs - score THEN p_cn
        |         ELSE n_cn END AS m_cn,
        |    CASE WHEN p_cs IS NULL THEN n_csy
        |         WHEN n_cs IS NULL THEN p_csy
        |         WHEN score - p_cs <= n_cs - score THEN p_csy
        |         ELSE n_csy END AS m_csy
        |  FROM w WHERE arm = 1),
        |f AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS n_treated,
        |    CAST(SUM(sy) AS BIGINT) AS n_pos_treated,
        |    SUM(CAST(ROUND(sy - CAST(n AS DOUBLE) * m_csy / m_cn, 6)
        |      AS DECIMAL(20,6))) AS att_num,
        |    CAST(SUM(n * abs(score - m_cs)) AS BIGINT) AS gap_sum
        |  FROM m),
        |nc AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS n_controls
        |  FROM grid WHERE arm = 0)
        |SELECT n_treated, n_controls, n_pos_treated,
        |  ROUND(CAST(att_num AS DOUBLE) / n_treated, 6) AS att,
        |  ROUND(CAST(gap_sum AS DOUBLE) / n_treated, 4)
        |    AS mean_score_gap
        |FROM f CROSS JOIN nc""".stripMargin,
    // E-step responsibilities rounded-then-decimal (complement exact
    // 1 - r), one 7-sum aggregate, M-step closes per component
    "agg_em_step" ->
      """WITH e AS (
        |  SELECT value,
        |    CAST(ROUND(
        |      (EXP(0e0 - (value - 30e0) * (value - 30e0) / (2e0 * 400e0))
        |         / 20e0)
        |      / (EXP(0e0 - (value - 30e0) * (value - 30e0)
        |           / (2e0 * 400e0)) / 20e0
        |         + EXP(0e0 - (value - 100e0) * (value - 100e0)
        |             / (2e0 * 2500e0)) / 50e0), 6) AS DECIMAL(18,6))
        |      AS r1
        |  FROM events),
        |c AS (
        |  SELECT value, r1,
        |    CAST(1.000000 AS DECIMAL(18,6)) - r1 AS r2
        |  FROM e),
        |k AS (
        |  SELECT r1, r2,
        |    CAST(ROUND(CAST(r1 AS DOUBLE) * value, 6) AS DECIMAL(24,6))
        |      AS r1x,
        |    CAST(ROUND(CAST(r1 AS DOUBLE) * value * value, 6)
        |      AS DECIMAL(28,6)) AS r1xx,
        |    CAST(ROUND(CAST(r2 AS DOUBLE) * value, 6) AS DECIMAL(24,6))
        |      AS r2x,
        |    CAST(ROUND(CAST(r2 AS DOUBLE) * value * value, 6)
        |      AS DECIMAL(28,6)) AS r2xx
        |  FROM c),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(r1) AS DOUBLE) AS sr1, CAST(SUM(r1x) AS DOUBLE)
        |      AS sr1x, CAST(SUM(r1xx) AS DOUBLE) AS sr1xx,
        |    CAST(SUM(r2) AS DOUBLE) AS sr2, CAST(SUM(r2x) AS DOUBLE)
        |      AS sr2x, CAST(SUM(r2xx) AS DOUBLE) AS sr2xx
        |  FROM k),
        |st AS (
        |  SELECT 1 AS component, n, sr1 AS sr, sr1x AS srx,
        |    sr1xx AS srxx FROM m
        |  UNION ALL
        |  SELECT 2, n, sr2, sr2x, sr2xx FROM m)
        |SELECT component, n,
        |  ROUND(sr, 4) AS n_eff,
        |  ROUND(sr / n, 6) AS pi_new,
        |  ROUND(srx / sr, 4) AS mu_new,
        |  ROUND(SQRT(srxx / sr - (srx / sr) * (srx / sr)), 4)
        |    AS sigma_new
        |FROM st ORDER BY component""".stripMargin,
    // per-type DESC-cumulative over the value grid; exact partial-
    // bucket take clamps the tail to k values, one closing division
    "agg_cvar" ->
      """WITH grid AS (
        |  SELECT event_type, CAST(value AS DECIMAL(19,4)) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
        |  FROM grid GROUP BY 1),
        |cum AS (
        |  SELECT g.event_type, v, c, n, (n + 19) // 20 AS k,
        |    CAST(SUM(c) OVER (PARTITION BY g.event_type ORDER BY v DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM grid g JOIN tot USING (event_type)),
        |tk AS (
        |  SELECT event_type, n, k, v,
        |    GREATEST(0, LEAST(c, k - (cum - c))) AS take
        |  FROM cum)
        |SELECT event_type, n, k,
        |  CAST(MIN(v) AS DOUBLE) AS var_95,
        |  ROUND(CAST(SUM(v * take) AS DOUBLE) / k, 4) AS cvar_95
        |FROM tk WHERE take > 0
        |GROUP BY 1, 2, 3 ORDER BY event_type NULLS FIRST""".stripMargin,
    // per-row round-then-decimal ln terms (agg_entropy discipline),
    // exact sum, one closing exp
    "agg_geometric_mean" ->
      """SELECT event_type, CAST(COUNT(lnv) AS BIGINT) AS n,
        |  ROUND(EXP(CAST(SUM(lnv) AS DOUBLE) / COUNT(lnv)), 4)
        |    AS geo_mean
        |FROM (
        |  SELECT event_type,
        |    CASE WHEN value > 0.0
        |      THEN CAST(ROUND(ln(value), 6) AS DECIMAL(20,6)) END AS lnv
        |  FROM events)
        |GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,
    // plain cumulative over the value grid (the engine's two-level
    // bucketed prefix is the distributed equivalent); exact pair
    // counts, one closing division, Romano magnitude bands
    "agg_cliffs_delta" ->
      """WITH base AS (
        |  SELECT CAST(value AS DECIMAL(19,4)) AS v,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is1
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |perv AS (
        |  SELECT v, CAST(SUM(is1) AS BIGINT) AS c1,
        |    CAST(COUNT(*) - SUM(is1) AS BIGINT) AS c2
        |  FROM base GROUP BY 1),
        |cum AS (
        |  SELECT c1, c2,
        |    CAST(SUM(c2) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum2
        |  FROM perv),
        |m AS (
        |  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2,
        |    CAST(SUM(c1 * (cum2 - c2)) AS BIGINT) AS conc,
        |    CAST(SUM(c1 * c2) AS BIGINT) AS ties
        |  FROM cum)
        |SELECT n1, n2, conc AS concordant,
        |  n1 * n2 - conc - ties AS discordant, ties,
        |  ROUND(CAST(2 * conc + ties - n1 * n2 AS DOUBLE)
        |    / (n1 * n2), 6) AS cliffs_delta,
        |  CASE
        |  WHEN abs(CAST(2 * conc + ties - n1 * n2 AS DOUBLE)
        |    / (n1 * n2)) < 0.147 THEN 'negligible'
        |  WHEN abs(CAST(2 * conc + ties - n1 * n2 AS DOUBLE)
        |    / (n1 * n2)) < 0.33 THEN 'small'
        |  WHEN abs(CAST(2 * conc + ties - n1 * n2 AS DOUBLE)
        |    / (n1 * n2)) < 0.474 THEN 'medium'
        |  ELSE 'large' END AS magnitude
        |FROM m""".stripMargin,
    // Pettitt A² over the same value grid; per-term double rounded
    // then DECIMAL-summed, one closing division
    "agg_anderson_darling" ->
      """WITH base AS (
        |  SELECT CAST(value AS DECIMAL(19,4)) AS v,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is1
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |perv AS (
        |  SELECT v, CAST(SUM(is1) AS BIGINT) AS c1,
        |    CAST(COUNT(*) - SUM(is1) AS BIGINT) AS c2
        |  FROM base GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2
        |  FROM perv),
        |cum AS (
        |  SELECT c1, c2,
        |    CAST(SUM(c1) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum1,
        |    CAST(SUM(c1 + c2) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS bj
        |  FROM perv),
        |terms AS (
        |  SELECT n1, n2,
        |    CAST(ROUND((c1 + c2) *
        |      (CAST(n1 + n2 AS DOUBLE) * cum1 - CAST(n1 AS DOUBLE) * bj) *
        |      (CAST(n1 + n2 AS DOUBLE) * cum1 - CAST(n1 AS DOUBLE) * bj) /
        |      (CAST(bj AS DOUBLE) * (n1 + n2 - bj)), 6)
        |      AS DECIMAL(28,6)) AS term
        |  FROM cum CROSS JOIN tot
        |  WHERE bj < n1 + n2)
        |SELECT n1, n2,
        |  ROUND(CAST(SUM(term) AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) * n2), 6) AS a2
        |FROM terms GROUP BY 1, 2""".stripMargin,
    // the agg_t_test moment pipeline closing into pooled-SD effect
    // sizes; Hedges' correction is an exact rational factor
    "agg_cohens_d" ->
      """WITH base AS (
        |  SELECT CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is1,
        |    CAST(value AS DECIMAL(18,4)) AS vq
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |), m AS (
        |  SELECT CAST(SUM(is1) AS BIGINT) AS n1,
        |    CAST(COUNT(*) - SUM(is1) AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN is1 = 1 THEN vq
        |             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS sx1,
        |    CAST(SUM(CASE WHEN is1 = 0 THEN vq
        |             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS sx2,
        |    CAST(SUM(CASE WHEN is1 = 1 THEN vq * vq
        |             ELSE CAST(0 AS DECIMAL(37,8)) END) AS DOUBLE) AS sxx1,
        |    CAST(SUM(CASE WHEN is1 = 0 THEN vq * vq
        |             ELSE CAST(0 AS DECIMAL(37,8)) END) AS DOUBLE) AS sxx2
        |  FROM base
        |)
        |SELECT n1, n2,
        |  ROUND((sx1 / n1 - sx2 / n2) /
        |    sqrt(((sxx1 - sx1 * sx1 / n1) + (sxx2 - sx2 * sx2 / n2))
        |         / (n1 + n2 - 2)), 6) AS cohens_d,
        |  ROUND((sx1 / n1 - sx2 / n2) /
        |    sqrt(((sxx1 - sx1 * sx1 / n1) + (sxx2 - sx2 * sx2 / n2))
        |         / (n1 + n2 - 2))
        |    * (1e0 - 3e0 / (4 * (n1 + n2) - 9)), 6) AS hedges_g
        |FROM m""".stripMargin,
    // hash-parity arms, Welch SE from exact decimal moments, the two
    // one-sided statistics and the z-approximate equivalence verdict
    "agg_tost_equivalence" ->
      """WITH base AS (
        |  SELECT event_type,
        |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
        |      1, 6)) AS BIGINT) % 2 AS arm,
        |    CAST(value AS DECIMAL(18,4)) AS vq
        |  FROM events
        |), m AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(SUM(CASE WHEN arm = 0 THEN vq
        |             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS s0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN vq
        |             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS s1,
        |    CAST(SUM(CASE WHEN arm = 0 THEN vq * vq
        |             ELSE CAST(0 AS DECIMAL(37,8)) END) AS DOUBLE) AS ss0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN vq * vq
        |             ELSE CAST(0 AS DECIMAL(37,8)) END) AS DOUBLE) AS ss1
        |  FROM base GROUP BY 1
        |), se AS (
        |  SELECT *,
        |    sqrt(((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1 +
        |          ((ss0 - s0 * s0 / n0) / (n0 - 1)) / n0) AS se
        |  FROM m
        |)
        |SELECT event_type, n0, n1,
        |  ROUND(s1 / n1 - s0 / n0, 6) AS diff,
        |  ROUND(se, 6) AS se,
        |  ROUND((s1 / n1 - s0 / n0 + 5.0) / se, 4) AS t_lower,
        |  ROUND((s1 / n1 - s0 / n0 - 5.0) / se, 4) AS t_upper,
        |  (s1 / n1 - s0 / n0 + 5.0) / se > 1.645 AND
        |  (s1 / n1 - s0 / n0 - 5.0) / se < -1.645 AS equivalent
        |FROM se ORDER BY event_type NULLS FIRST""".stripMargin,
    // complete-block day×type extreme indicators → Fleiss' kappa via
    // the exact integer cross-multiplication (ae - bc) / (b(e - c))
    "agg_fleiss_kappa" ->
      """WITH kk AS (
        |  SELECT COUNT(DISTINCT event_type) AS k FROM events),
        |daily AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |tt AS (
        |  SELECT event_type, CAST(SUM(c) AS BIGINT) AS tot,
        |    CAST(COUNT(*) AS BIGINT) AS nd
        |  FROM daily GROUP BY 1),
        |cell AS (
        |  SELECT day, event_type,
        |    CASE WHEN nd * c > tot THEN 1 ELSE 0 END AS x
        |  FROM daily JOIN tt USING (event_type)),
        |blocks AS (
        |  SELECT day, COUNT(*) AS nt, CAST(SUM(x) AS BIGINT) AS r_i
        |  FROM cell GROUP BY 1),
        |m AS (
        |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(r_i) AS BIGINT) AS r,
        |    CAST(SUM(r_i * r_i) AS BIGINT) AS t2
        |  FROM blocks JOIN kk ON nt = k GROUP BY 1),
        |f AS (
        |  SELECT n_days, CAST(k AS BIGINT) AS k,
        |    2 * t2 - 2 * k * r + n_days * k * (k - 1) AS a,
        |    n_days * k * (k - 1) AS b,
        |    r * r + (n_days * k - r) * (n_days * k - r) AS c,
        |    n_days * k * n_days * k AS e
        |  FROM m)
        |SELECT n_days, k,
        |  ROUND(CAST(a AS DOUBLE) / b, 6) AS p_bar,
        |  ROUND(CAST(c AS DOUBLE) / e, 6) AS p_e,
        |  ROUND(CASE WHEN e = c THEN NULL
        |    ELSE CAST(a * e - b * c AS DOUBLE) / (b * (e - c))
        |    END, 6) AS kappa
        |FROM f""".stripMargin,
    // global activity deciles (plain NTILE mirrors the zipWithIndex
    // closed-form ntile); every decomposition term is an integer
    // cross-multiplication per bin — no float sum across bins exists
    "agg_brier_decomposition" ->
      """WITH u AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(MAX(CASE WHEN value >= 200.0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |b AS (
        |  SELECT y,
        |    CAST(NTILE(10) OVER (ORDER BY n_events, user_id) AS BIGINT)
        |      AS bin
        |  FROM u),
        |g AS (
        |  SELECT bin, 2 * bin - 1 AS p_num,
        |    CAST(COUNT(*) AS BIGINT) AS n_k,
        |    CAST(SUM(y) AS BIGINT) AS c_k,
        |    CAST(SUM((2 * bin - 1 - 20 * y) * (2 * bin - 1 - 20 * y))
        |      AS BIGINT) AS s_k
        |  FROM b GROUP BY 1, 2),
        |w AS (
        |  SELECT *, CAST(SUM(n_k) OVER () AS BIGINT) AS n,
        |    CAST(SUM(c_k) OVER () AS BIGINT) AS c
        |  FROM g)
        |SELECT bin, n_k AS n_users, c_k AS n_conv,
        |  ROUND(CAST(p_num AS DOUBLE) / 20, 6) AS forecast_p,
        |  ROUND(CAST(c_k AS DOUBLE) / n_k, 6) AS obs_rate,
        |  ROUND(CAST(s_k AS DOUBLE) / (400 * n), 6) AS brier_term,
        |  ROUND(CAST((p_num * n_k - 20 * c_k) *
        |    (p_num * n_k - 20 * c_k) AS DOUBLE)
        |    / (400e0 * n_k * n), 6) AS rel_term,
        |  ROUND(CAST((c_k * n - c * n_k) * (c_k * n - c * n_k)
        |    AS DOUBLE) / (CAST(n_k AS DOUBLE) * n * n * n), 6) AS res_term
        |FROM w ORDER BY bin""".stripMargin,
    // fourteen exact BIGINT moments of the lagged daily series; the
    // normal-equation and F arithmetic replays the identical double
    // expressions over those integers
    "agg_granger_causality" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS xv,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS yv
        |  FROM events GROUP BY 1),
        |lagged AS (
        |  SELECT yv, xv,
        |    LAG(xv) OVER (ORDER BY day) AS xl,
        |    LAG(yv) OVER (ORDER BY day) AS yl
        |  FROM daily),
        |mom AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS t,
        |    CAST(SUM(yv) AS BIGINT) AS sy, CAST(SUM(xv) AS BIGINT) AS sx,
        |    CAST(SUM(yl) AS BIGINT) AS syl, CAST(SUM(xl) AS BIGINT) AS sxl,
        |    CAST(SUM(yv * yv) AS BIGINT) AS syy,
        |    CAST(SUM(xv * xv) AS BIGINT) AS sxx,
        |    CAST(SUM(yl * yl) AS BIGINT) AS syl2,
        |    CAST(SUM(xl * xl) AS BIGINT) AS sxl2,
        |    CAST(SUM(yl * xl) AS BIGINT) AS sylxl,
        |    CAST(SUM(yl * yv) AS BIGINT) AS syly,
        |    CAST(SUM(xl * yv) AS BIGINT) AS sxly,
        |    CAST(SUM(xl * xv) AS BIGINT) AS sxlx,
        |    CAST(SUM(yl * xv) AS BIGINT) AS sylx
        |  FROM lagged WHERE xl IS NOT NULL),
        |stacked AS (
        |  SELECT 'click->purchase' AS direction, t, sy AS s_y,
        |    syl AS s_1, sxl AS s_2, syy AS s_yy, syl2 AS s_11,
        |    sxl2 AS s_22, sylxl AS s_12, syly AS s_1y, sxly AS s_2y
        |  FROM mom
        |  UNION ALL
        |  SELECT 'purchase->click', t, sx, sxl, syl, sxx, sxl2, syl2,
        |    sylxl, sxlx, sylx
        |  FROM mom),
        |mm AS (
        |  SELECT direction, t,
        |    t * s_11 - s_1 * s_1 AS m11,
        |    t * s_22 - s_2 * s_2 AS m22,
        |    t * s_12 - s_1 * s_2 AS m12,
        |    t * s_1y - s_1 * s_y AS m1y,
        |    t * s_2y - s_2 * s_y AS m2y,
        |    t * s_yy - s_y * s_y AS myy
        |  FROM stacked),
        |dd AS (
        |  SELECT direction, t, m11, m22, m12, m1y, m2y, myy,
        |    CAST(m11 AS DOUBLE) * m22 - CAST(m12 AS DOUBLE) * m12 AS det
        |  FROM mm),
        |rr AS (
        |  SELECT direction, t, m11, det,
        |    CAST(myy AS DOUBLE) - CAST(m1y AS DOUBLE) * m1y / m11 AS rss_r,
        |    CAST(myy AS DOUBLE)
        |      - (CAST(m22 AS DOUBLE) * m1y * m1y
        |         - 2e0 * CAST(m12 AS DOUBLE) * m1y * m2y
        |         + CAST(m11 AS DOUBLE) * m2y * m2y) / det AS rss_u
        |  FROM dd)
        |SELECT direction, t AS n_obs,
        |  ROUND(CASE WHEN m11 <= 0 OR det <= 0e0 OR rss_u <= 0e0
        |    THEN NULL
        |    ELSE (t - 3) * (rss_r - rss_u) / rss_u END, 4) AS f_stat
        |FROM rr ORDER BY direction""".stripMargin,
    // eight exact cells in one conditional aggregate; means and the
    // DiD close in one double expression
    "agg_diff_in_diff" ->
      """WITH b AS (
        |  SELECT MIN(CAST(ts AS DATE)) AS d_min,
        |    MAX(CAST(ts AS DATE)) AS d_max
        |  FROM events
        |), e AS (
        |  SELECT event_type, user_id, CAST(ts AS DATE) AS day,
        |    CAST(value AS DECIMAL(18,4)) AS v,
        |    d_min + CAST((d_max - d_min) // 2 AS INTEGER) AS cut
        |  FROM events CROSS JOIN b
        |), g AS (
        |  SELECT event_type,
        |    SUM(CASE WHEN user_id % 2 = 0 AND day <= cut THEN v END)
        |      AS s_t0,
        |    CAST(COUNT(CASE WHEN user_id % 2 = 0 AND day <= cut
        |      THEN v END) AS BIGINT) AS c_t0,
        |    SUM(CASE WHEN user_id % 2 = 0 AND day > cut THEN v END)
        |      AS s_t1,
        |    CAST(COUNT(CASE WHEN user_id % 2 = 0 AND day > cut
        |      THEN v END) AS BIGINT) AS c_t1,
        |    SUM(CASE WHEN user_id % 2 <> 0 AND day <= cut THEN v END)
        |      AS s_c0,
        |    CAST(COUNT(CASE WHEN user_id % 2 <> 0 AND day <= cut
        |      THEN v END) AS BIGINT) AS c_c0,
        |    SUM(CASE WHEN user_id % 2 <> 0 AND day > cut THEN v END)
        |      AS s_c1,
        |    CAST(COUNT(CASE WHEN user_id % 2 <> 0 AND day > cut
        |      THEN v END) AS BIGINT) AS c_c1
        |  FROM e GROUP BY 1
        |)
        |SELECT event_type, c_t0, c_t1, c_c0, c_c1,
        |  ROUND((CAST(s_t1 AS DOUBLE) / CAST(c_t1 AS DOUBLE)
        |    - CAST(s_t0 AS DOUBLE) / CAST(c_t0 AS DOUBLE))
        |    - (CAST(s_c1 AS DOUBLE) / CAST(c_c1 AS DOUBLE)
        |    - CAST(s_c0 AS DOUBLE) / CAST(c_c0 AS DOUBLE)), 6)
        |    AS did
        |FROM g ORDER BY event_type NULLS FIRST""".stripMargin,
    // (user, day) dedup + day-shifted self-joins; integer splits
    "agg_growth_accounting" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), f AS (
        |  SELECT user_id, MIN(day) AS fd FROM ud GROUP BY 1
        |), y AS (
        |  SELECT user_id, day + 1 AS day, 1 AS was_prev FROM ud
        |), act AS (
        |  SELECT ud.day, CAST(COUNT(*) AS BIGINT) AS n_active,
        |    CAST(SUM(CASE WHEN ud.day = f.fd THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_new,
        |    CAST(SUM(CASE WHEN y.was_prev IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |    CAST(SUM(CASE WHEN ud.day <> f.fd AND y.was_prev IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |  FROM ud JOIN f ON ud.user_id = f.user_id
        |  LEFT JOIN y ON ud.user_id = y.user_id AND ud.day = y.day
        |  GROUP BY ud.day
        |), ch AS (
        |  SELECT y.day, CAST(COUNT(*) AS BIGINT) AS n_churned
        |  FROM y LEFT JOIN ud
        |    ON y.user_id = ud.user_id AND y.day = ud.day
        |  WHERE ud.user_id IS NULL
        |  GROUP BY y.day
        |)
        |SELECT COALESCE(act.day, ch.day) AS day,
        |  COALESCE(n_active, 0) AS n_active,
        |  COALESCE(n_new, 0) AS n_new,
        |  COALESCE(n_retained, 0) AS n_retained,
        |  COALESCE(n_resurrected, 0) AS n_resurrected,
        |  COALESCE(n_churned, 0) AS n_churned
        |FROM act FULL OUTER JOIN ch ON act.day = ch.day
        |ORDER BY day""".stripMargin,
    // distinct-day counts per user → bucket counts; one share
    // division per bucket
    "agg_activity_histogram" ->
      """WITH u AS (
        |  SELECT user_id, CAST(COUNT(DISTINCT CAST(ts AS DATE))
        |    AS BIGINT) AS days_active
        |  FROM events GROUP BY 1
        |)
        |SELECT days_active, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  ROUND(CAST(COUNT(*) AS DOUBLE)
        |    / CAST((SELECT COUNT(*) FROM u) AS DOUBLE), 6)
        |    AS user_share
        |FROM u GROUP BY 1 ORDER BY days_active""".stripMargin,
    // integer half-weight ratio (2·sat + tol)/(2n)
    "agg_apdex" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN value <= 25e0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS sat,
        |  CAST(SUM(CASE WHEN value > 25e0 AND value <= 100e0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS tol,
        |  ROUND(CAST(2 * SUM(CASE WHEN value <= 25e0 THEN 1 ELSE 0 END)
        |      + SUM(CASE WHEN value > 25e0 AND value <= 100e0
        |            THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(2 * COUNT(*) AS DOUBLE), 6) AS apdex
        |FROM events GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin,
    // per-user reverse-cumulative next-non-error lookup; exact µs
    // gap sums; two single-division closes
    "agg_mtbf_mttr" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events
        |), r AS (
        |  SELECT user_id, event_id, event_type, ts_us,
        |    MIN(CASE WHEN event_type <> 'error' THEN ts_us END)
        |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS next_ok_us
        |  FROM e
        |), rec AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_errors,
        |    CAST(COUNT(next_ok_us) AS BIGINT) AS n_recovered,
        |    CAST(SUM(next_ok_us - ts_us) AS BIGINT) AS ttr_us
        |  FROM r WHERE event_type = 'error'
        |), g AS (
        |  SELECT user_id, ts_us,
        |    LAG(ts_us) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS prev_us
        |  FROM e WHERE event_type = 'error'
        |), bet AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |    CAST(SUM(ts_us - prev_us) AS BIGINT) AS gap_us
        |  FROM g WHERE prev_us IS NOT NULL
        |)
        |SELECT n_errors, n_recovered, n_gaps,
        |  ROUND(CAST(gap_us AS DOUBLE) / CAST(n_gaps AS DOUBLE)
        |    / 1e6, 6) AS mtbf_s,
        |  ROUND(CAST(ttr_us AS DOUBLE) / CAST(n_recovered AS DOUBLE)
        |    / 1e6, 6) AS mttr_s
        |FROM rec CROSS JOIN bet""".stripMargin,
    // corpus → 22-row (label, bucket) table once; thresholds fan over
    // that; integer cells, one division per rate
    "agg_roc_points" ->
      """WITH cells AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS label,
        |    CAST(floor(value / 10e0) AS BIGINT) AS bucket,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |), thr AS (
        |  SELECT unnest(generate_series(1, 9)) AS thr
        |), g AS (
        |  SELECT thr,
        |    CAST(SUM(CASE WHEN label = 1 AND bucket >= thr
        |      THEN n ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN label = 0 AND bucket >= thr
        |      THEN n ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN label = 1 AND bucket < thr
        |      THEN n ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(SUM(CASE WHEN label = 0 AND bucket < thr
        |      THEN n ELSE 0 END) AS BIGINT) AS tn
        |  FROM cells CROSS JOIN thr GROUP BY 1
        |)
        |SELECT thr, tp, fp, fn, tn,
        |  ROUND(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6)
        |    AS tpr,
        |  ROUND(CAST(fp AS DOUBLE) / CAST(fp + tn AS DOUBLE), 6)
        |    AS fpr
        |FROM g ORDER BY thr""".stripMargin,
    // 30-min-gap islands via keyed lag+running-sum; exact integer
    // durations; naive global row_number replays the zipWithIndex
    // median machinery
    "agg_session_stats" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        |), f AS (
        |  SELECT user_id, ts_us, event_id,
        |    CASE WHEN LAG(ts_us) OVER w IS NULL
        |      OR ts_us - LAG(ts_us) OVER w > 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |                      ORDER BY ts_us, event_id)
        |), g AS (
        |  SELECT user_id, ts_us, event_id,
        |    SUM(new_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f
        |), sess AS (
        |  SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_ev,
        |    MAX(ts_us) - MIN(ts_us) AS dur_us
        |  FROM g GROUP BY 1, 2
        |), tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |    CAST(SUM(n_ev) AS BIGINT) AS n_events FROM sess
        |), r AS (
        |  SELECT dur_us,
        |    ROW_NUMBER() OVER (ORDER BY dur_us, user_id, sid) AS rn
        |  FROM sess
        |), p AS (
        |  SELECT MIN(dur_us) AS d_lo, MAX(dur_us) AS d_hi
        |  FROM r CROSS JOIN tot
        |  WHERE rn = (n_sessions + 1) // 2 OR rn = n_sessions // 2 + 1
        |)
        |SELECT n_sessions, n_events,
        |  ROUND(CAST(n_events AS DOUBLE) / CAST(n_sessions AS DOUBLE),
        |    6) AS events_per_session,
        |  ROUND((d_lo + d_hi) / 2e0 / 1e6, 6) AS median_dur_s
        |FROM p CROSS JOIN tot""".stripMargin,
    // identical mask/first-conversion recipe; the 32-row weight grid
    // is generated with the same bit algebra; exact decimal 12-phi
    "agg_shapley_attribution" ->
      """WITH r AS (
        |  SELECT user_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |pu AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN rn <= 6 AND event_type = 'click'
        |      THEN 1 ELSE 0 END)
        |      + 2 * MAX(CASE WHEN rn <= 6 AND event_type = 'error'
        |      THEN 1 ELSE 0 END)
        |      + 4 * MAX(CASE WHEN rn <= 6 AND event_type = 'signup'
        |      THEN 1 ELSE 0 END)
        |      + 8 * MAX(CASE WHEN rn <= 6 AND event_type = 'view'
        |      THEN 1 ELSE 0 END) AS mask,
        |    MAX(CASE WHEN event_type = 'purchase' AND value >= 200
        |      THEN 1 ELSE 0 END) AS y
        |  FROM r GROUP BY user_id),
        |v AS (
        |  SELECT mask,
        |    CAST(ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6)
        |      AS DECIMAL(18,6)) AS v
        |  FROM pu GROUP BY mask),
        |g AS (
        |  SELECT CASE c WHEN 0 THEN 'click' WHEN 1 THEN 'error'
        |           WHEN 2 THEN 'signup' ELSE 'view' END AS channel,
        |    m AS m0, m | (1 << c) AS m1,
        |    CASE (m & 1) + ((m >> 1) & 1) + ((m >> 2) & 1)
        |         + ((m >> 3) & 1)
        |      WHEN 0 THEN 3 WHEN 1 THEN 1 WHEN 2 THEN 1
        |      ELSE 3 END AS w12
        |  FROM generate_series(0, 3) AS gc(c)
        |  CROSS JOIN generate_series(0, 15) AS gm(m)
        |  WHERE ((m >> c) & 1) = 0)
        |SELECT g.channel,
        |  ROUND(CAST(SUM(g.w12 * (COALESCE(v1.v, 0) - COALESCE(v0.v, 0)))
        |    AS DOUBLE) / 12, 6) AS shapley
        |FROM g
        |LEFT JOIN v v0 ON v0.mask = g.m0
        |LEFT JOIN v v1 ON v1.mask = g.m1
        |GROUP BY g.channel ORDER BY g.channel""".stripMargin,
    // exact integer trim ranks over the (value, event_id) total
    // order; decimal kept mass; one closing division
    "agg_trimmed_mean" ->
      """WITH r AS (
        |  SELECT event_type,
        |    CAST(value AS DECIMAL(18,4)) AS vq,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY CAST(value AS DECIMAL(18,4)), event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  ROUND(CAST(SUM(vq) AS DOUBLE) / COUNT(*), 4)
        |    AS trimmed_mean,
        |  CAST(MIN(vq) AS DOUBLE) AS kept_lo,
        |  CAST(MAX(vq) AS DOUBLE) AS kept_hi
        |FROM r WHERE rn > n // 10 AND rn <= n - n // 10
        |GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,
    // per-(type, user) presence bits; integer captures; one double
    // per estimator with exact m = 0 guard
    "agg_capture_recapture" ->
      """WITH b AS (
        |  SELECT MIN(CAST(ts AS DATE)) AS d_min,
        |    MAX(CAST(ts AS DATE)) AS d_max
        |  FROM events
        |), u AS (
        |  SELECT event_type, user_id,
        |    MAX(CASE WHEN CAST(ts AS DATE) = d_min
        |      THEN 1 ELSE 0 END) AS h1,
        |    MAX(CASE WHEN CAST(ts AS DATE) =
        |      d_min + CAST((d_max - d_min) // 2 AS INTEGER)
        |      THEN 1 ELSE 0 END) AS h2
        |  FROM events CROSS JOIN b
        |  GROUP BY 1, 2
        |), g AS (
        |  SELECT event_type, CAST(SUM(h1) AS BIGINT) AS n1,
        |    CAST(SUM(h2) AS BIGINT) AS n2,
        |    CAST(SUM(h1 * h2) AS BIGINT) AS m
        |  FROM u GROUP BY 1
        |)
        |SELECT event_type, n1, n2, m,
        |  CASE WHEN m = 0 THEN NULL
        |  ELSE ROUND(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |    / CAST(m AS DOUBLE), 6) END AS n_lp,
        |  ROUND(CAST((n1 + 1) * (n2 + 1) AS DOUBLE)
        |    / CAST(m + 1 AS DOUBLE) - 1e0, 6) AS n_chapman
        |FROM g ORDER BY event_type NULLS FIRST""".stripMargin,
    // four integer cells; pooled z in one double expression; exact
    // degenerate-rate guard
    "agg_two_proportion_z" ->
      """WITH g AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND value >= 50e0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS k1,
        |    CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN user_id % 2 <> 0 AND value >= 50e0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS k2
        |  FROM events GROUP BY 1
        |)
        |SELECT event_type, n1, k1, n2, k2,
        |  CASE WHEN k1 + k2 = 0 OR k1 + k2 = n1 + n2 THEN NULL
        |  ELSE ROUND((CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |    - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |    / SQRT((CAST(k1 + k2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
        |      * (1e0 - CAST(k1 + k2 AS DOUBLE)
        |               / CAST(n1 + n2 AS DOUBLE))
        |      * (1e0 / CAST(n1 AS DOUBLE)
        |         + 1e0 / CAST(n2 AS DOUBLE))), 6)
        |  END AS z_stat
        |FROM g ORDER BY event_type NULLS FIRST""".stripMargin,
    // fixed 5-term integer-ratio product per task; deterministic
    // decile bucketing of the double (no order-dependent mean)
    "agg_pass_at_k" ->
      """WITH t0 AS (
        |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN value >= 50e0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2
        |), p AS (
        |  SELECT event_type,
        |    CASE WHEN n - c < 5 THEN 1e0
        |    ELSE 1e0
        |      - (CAST(n - c AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(n - c - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE))
        |      * (CAST(n - c - 2 AS DOUBLE) / CAST(n - 2 AS DOUBLE))
        |      * (CAST(n - c - 3 AS DOUBLE) / CAST(n - 3 AS DOUBLE))
        |      * (CAST(n - c - 4 AS DOUBLE) / CAST(n - 4 AS DOUBLE))
        |    END AS pass5
        |  FROM t0 WHERE n >= 5
        |)
        |SELECT event_type,
        |  LEAST(9, CAST(FLOOR(pass5 * 10e0) AS INTEGER)) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_tasks
        |FROM p GROUP BY 1, 2
        |ORDER BY event_type NULLS FIRST, bucket""".stripMargin,
    // complete-block binary cells; four integer moments; exact
    // degenerate-denominator guard
    "agg_cochran_q" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2
        |), tt AS (
        |  SELECT event_type, CAST(SUM(c) AS BIGINT) AS tot,
        |    CAST(COUNT(*) AS BIGINT) AS nd
        |  FROM daily GROUP BY 1
        |), cell AS (
        |  SELECT day, event_type,
        |    CASE WHEN nd * c > tot THEN 1 ELSE 0 END AS x
        |  FROM daily JOIN tt USING (event_type)
        |), kk AS (
        |  SELECT COUNT(DISTINCT event_type) AS k FROM events
        |), blocks AS (
        |  SELECT day, CAST(SUM(x) AS BIGINT) AS r_i FROM cell
        |  GROUP BY day HAVING COUNT(*) = (SELECT k FROM kk)
        |), rm AS (
        |  SELECT CAST(SUM(r_i) AS BIGINT) AS sum_r,
        |    CAST(SUM(r_i * r_i) AS BIGINT) AS sum_r2
        |  FROM blocks
        |), g AS (
        |  SELECT c.event_type, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    CAST(SUM(c.x) AS BIGINT) AS c_j
        |  FROM cell c JOIN blocks b ON c.day = b.day
        |  GROUP BY 1
        |), s AS (
        |  SELECT event_type, n_blocks, c_j,
        |    CAST(SUM(c_j * c_j) OVER () AS BIGINT) AS sum_c2,
        |    (SELECT k FROM kk) AS k,
        |    (SELECT sum_r FROM rm) AS sum_r,
        |    (SELECT sum_r2 FROM rm) AS sum_r2
        |  FROM g
        |)
        |SELECT event_type, n_blocks, c_j,
        |  CASE WHEN k * sum_r - sum_r2 = 0 THEN NULL
        |  ELSE ROUND(CAST(k - 1 AS DOUBLE)
        |    * (CAST(k AS DOUBLE) * CAST(sum_c2 AS DOUBLE)
        |       - CAST(sum_r AS DOUBLE) * CAST(sum_r AS DOUBLE))
        |    / (CAST(k AS DOUBLE) * CAST(sum_r AS DOUBLE)
        |       - CAST(sum_r2 AS DOUBLE)), 6)
        |  END AS q_stat
        |FROM s ORDER BY event_type NULLS FIRST""".stripMargin,
    // paired keep-decisions; four integer cells, one double closure
    "agg_mcnemar_test" ->
      """WITH p AS (
        |  SELECT
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the', 'a', 'of', 'and', 'to', 'in')))
        |      AS DOUBLE) / len(string_split(text, ' ')) > 0.05
        |      AS pred_a,
        |    list_contains(string_split(text, ' '), 'the') AS pred_b
        |  FROM documents
        |), g AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN pred_a AND pred_b THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_both,
        |    CAST(SUM(CASE WHEN pred_a AND NOT pred_b THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(SUM(CASE WHEN NOT pred_a AND pred_b THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN NOT pred_a AND NOT pred_b
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
        |  FROM p
        |)
        |SELECT n_both, b, c, n_neither,
        |  CASE WHEN b + c = 0 THEN NULL
        |  ELSE ROUND(CAST(b - c AS DOUBLE) * CAST(b - c AS DOUBLE)
        |    / CAST(b + c AS DOUBLE), 6)
        |  END AS chi2_mcnemar
        |FROM g""".stripMargin,
    // exact type-1 quartile picks (integer DIV ranks); fence census
    // in a second pass against the k-row fence table
    "agg_tukey_outliers" ->
      """WITH v AS (
        |  SELECT event_type, event_id,
        |    CAST(value AS DECIMAL(18,4)) AS v
        |  FROM events
        |), r AS (
        |  SELECT event_type, v,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY v, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS nn
        |  FROM v
        |), f AS (
        |  SELECT event_type, CAST(MAX(nn) AS BIGINT) AS n,
        |    MAX(CASE WHEN rn = (nn + 3) // 4 THEN v END) AS q1,
        |    MAX(CASE WHEN rn = (3 * nn + 3) // 4 THEN v END) AS q3
        |  FROM r GROUP BY 1
        |), fd AS (
        |  SELECT event_type, n,
        |    CAST(q1 AS DOUBLE) AS q1, CAST(q3 AS DOUBLE) AS q3,
        |    CAST(q1 AS DOUBLE)
        |      - 1.5e0 * (CAST(q3 AS DOUBLE) - CAST(q1 AS DOUBLE)) AS lo,
        |    CAST(q3 AS DOUBLE)
        |      + 1.5e0 * (CAST(q3 AS DOUBLE) - CAST(q1 AS DOUBLE)) AS hi
        |  FROM f
        |)
        |SELECT fd.event_type, n, fd.q1, fd.q3,
        |  CAST(SUM(CASE WHEN CAST(v.v AS DOUBLE) < lo
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(SUM(CASE WHEN CAST(v.v AS DOUBLE) > hi
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM fd JOIN v ON fd.event_type = v.event_type
        |GROUP BY 1, 2, 3, 4
        |ORDER BY fd.event_type NULLS FIRST""".stripMargin,
    // integer daily-count moments; overdispersion verdict decided in
    // exact integers, never on the rounded double
    "agg_dispersion_index" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2
        |), g AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(c) AS BIGINT) AS s1,
        |    CAST(SUM(c * c) AS BIGINT) AS s2
        |  FROM daily GROUP BY 1
        |)
        |SELECT event_type, n_days, s1,
        |  ROUND((CAST(n_days AS DOUBLE) * CAST(s2 AS DOUBLE)
        |    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |    / (CAST(n_days - 1 AS DOUBLE) * CAST(s1 AS DOUBLE)), 6)
        |    AS dispersion,
        |  n_days * s2 - s1 * s1 > (n_days - 1) * s1 AS overdispersed
        |FROM g ORDER BY event_type NULLS FIRST""".stripMargin,
    // per-type permutation p-values (exact rationals k/101) → BH
    // step-up via the integer comparison 100·m·p_num ≤ 505·rank,
    // with family size m counted in-query (COUNT(*) OVER ())
    "agg_bh_fdr" ->
      """WITH u AS (
        |  SELECT event_type, user_id, COUNT(*) AS ne,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS sv
        |  FROM events GROUP BY 1, 2),
        |oa AS (
        |  SELECT event_type,
        |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
        |      1, 6)) AS BIGINT) % 2 AS arm, ne, sv
        |  FROM u),
        |obs AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN arm = 1 THEN sv END) AS DOUBLE) /
        |      SUM(CASE WHEN arm = 1 THEN ne END) -
        |    CAST(SUM(CASE WHEN arm = 0 THEN sv END) AS DOUBLE) /
        |      SUM(CASE WHEN arm = 0 THEN ne END) AS obs_diff
        |  FROM oa GROUP BY 1),
        |pa AS (
        |  SELECT event_type, b,
        |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR) || '_' ||
        |      CAST(b AS VARCHAR)), 1, 6)) AS BIGINT) % 2 AS arm, ne, sv
        |  FROM u CROSS JOIN (SELECT unnest(generate_series(1, 100)) AS b)),
        |pd AS (
        |  SELECT event_type, b,
        |    CAST(SUM(CASE WHEN arm = 1 THEN sv END) AS DOUBLE) /
        |      SUM(CASE WHEN arm = 1 THEN ne END) -
        |    CAST(SUM(CASE WHEN arm = 0 THEN sv END) AS DOUBLE) /
        |      SUM(CASE WHEN arm = 0 THEN ne END) AS diff
        |  FROM pa GROUP BY 1, 2),
        |p AS (
        |  SELECT pd.event_type, ROUND(MAX(obs_diff), 6) AS obs_diff,
        |    CAST(SUM(CASE WHEN abs(diff) >= abs(obs_diff)
        |      THEN 1 ELSE 0 END) + 1 AS BIGINT) AS p_num
        |  FROM pd JOIN obs ON pd.event_type = obs.event_type
        |  GROUP BY 1),
        |r AS (
        |  SELECT event_type, obs_diff, p_num,
        |    ROW_NUMBER() OVER (ORDER BY p_num, event_type NULLS FIRST) AS rnk,
        |    COUNT(*) OVER () AS m
        |  FROM p),
        |cut AS (
        |  SELECT event_type, obs_diff, p_num,
        |    MAX(CASE WHEN p_num * 100 * m <= 505 * rnk THEN p_num END)
        |      OVER () AS istar_pnum
        |  FROM r)
        |SELECT event_type, obs_diff, p_num,
        |  ROUND(CAST(p_num AS DOUBLE) / 101e0, 6) AS p_value,
        |  COALESCE(p_num <= istar_pnum, FALSE) AS rejected
        |FROM cut ORDER BY event_type NULLS FIRST""".stripMargin,
    // complete-block day×type decimal cells → integer within-day
    // ranks (type tiebreak, no midranks) → rank-sum χ²_F closure
    "agg_friedman_test" ->
      """WITH cell AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS sv
        |  FROM events GROUP BY 1, 2
        |), kk AS (
        |  SELECT COUNT(DISTINCT event_type) AS k FROM events
        |), blocks AS (
        |  SELECT day FROM cell GROUP BY day
        |  HAVING COUNT(*) = (SELECT k FROM kk)
        |), ranked AS (
        |  SELECT c.event_type,
        |    ROW_NUMBER() OVER (PARTITION BY c.day
        |      ORDER BY c.sv, c.event_type NULLS FIRST) AS r
        |  FROM cell c JOIN blocks b ON c.day = b.day
        |), g AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    CAST(SUM(r) AS BIGINT) AS r_sum
        |  FROM ranked GROUP BY 1
        |), s AS (
        |  SELECT event_type, n_blocks, r_sum,
        |    CAST(SUM(r_sum * r_sum) OVER () AS BIGINT) AS sum_r2,
        |    (SELECT k FROM kk) AS k
        |  FROM g
        |)
        |SELECT event_type, n_blocks, r_sum,
        |  ROUND(12e0 * CAST(sum_r2 AS DOUBLE)
        |    / (CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE)
        |       * CAST(k + 1 AS DOUBLE))
        |    - 3e0 * CAST(n_blocks AS DOUBLE)
        |      * CAST(k + 1 AS DOUBLE), 6) AS chi2_f
        |FROM s ORDER BY event_type NULLS FIRST""".stripMargin,
    // exact DECIMAL spend sums; decile via native ntile (mirrors
    // ntileFromRank's closed-form bucket arithmetic bit-identically);
    // cumulative window above the 10-row aggregate; double casts last
    "agg_lorenz_curve" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS spend
        |  FROM orders GROUP BY 1
        |), q AS (
        |  SELECT o_custkey, spend,
        |    CAST(ntile(10) OVER (ORDER BY spend, o_custkey) AS INTEGER)
        |      AS decile
        |  FROM spend
        |), g AS (
        |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |    SUM(spend) AS dec_spend
        |  FROM q GROUP BY 1
        |), c AS (
        |  SELECT decile, n_customers, dec_spend,
        |    SUM(dec_spend) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum_spend
        |  FROM g
        |)
        |SELECT decile, n_customers,
        |  CAST(dec_spend AS DOUBLE) AS dec_spend,
        |  ROUND(CAST(cum_spend AS DOUBLE)
        |    / CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |            FROM orders) AS DOUBLE), 6) AS cum_spend_share
        |FROM c ORDER BY decile""".stripMargin,
    // four integer cells in one conditional aggregate; log-OR and
    // Wald CI are single double expressions, zero cells → NULL via
    // integer OR-guard (no 4-way product)
    "agg_odds_ratio" ->
      """WITH g AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND value >= 50e0
        |             THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND value < 50e0
        |             THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(SUM(CASE WHEN user_id % 2 <> 0 AND value >= 50e0
        |             THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN user_id % 2 <> 0 AND value < 50e0
        |             THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM events GROUP BY event_type
        |)
        |SELECT event_type, a, b, c, d,
        |  CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0 THEN NULL
        |  ELSE ROUND(LN((CAST(a AS DOUBLE) * CAST(d AS DOUBLE))
        |    / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))), 6)
        |  END AS log_or,
        |  CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0 THEN NULL
        |  ELSE ROUND(LN((CAST(a AS DOUBLE) * CAST(d AS DOUBLE))
        |      / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
        |    - 1.96e0 * SQRT(1e0 / CAST(a AS DOUBLE)
        |      + 1e0 / CAST(b AS DOUBLE) + 1e0 / CAST(c AS DOUBLE)
        |      + 1e0 / CAST(d AS DOUBLE)), 6)
        |  END AS ci_lo,
        |  CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0 THEN NULL
        |  ELSE ROUND(LN((CAST(a AS DOUBLE) * CAST(d AS DOUBLE))
        |      / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
        |    + 1.96e0 * SQRT(1e0 / CAST(a AS DOUBLE)
        |      + 1e0 / CAST(b AS DOUBLE) + 1e0 / CAST(c AS DOUBLE)
        |      + 1e0 / CAST(d AS DOUBLE)), 6)
        |  END AS ci_hi
        |FROM g ORDER BY event_type NULLS FIRST""".stripMargin,
    // (n, k) integer cells; Wilson bounds are one double expression
    // each with literal z-constants (identical text both engines)
    "agg_wilson_ci" ->
      """WITH g AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN value >= 50e0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k
        |  FROM events GROUP BY event_type
        |)
        |SELECT event_type, n, k,
        |  ROUND(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |      + 1.9208e0 / CAST(n AS DOUBLE)
        |      - 1.96e0 * SQRT((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (1e0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |        / CAST(n AS DOUBLE)
        |        + 0.9604e0 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |    / (1e0 + 3.8416e0 / CAST(n AS DOUBLE)), 6) AS wilson_lo,
        |  ROUND(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |      + 1.9208e0 / CAST(n AS DOUBLE)
        |      + 1.96e0 * SQRT((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (1e0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |        / CAST(n AS DOUBLE)
        |        + 0.9604e0 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |    / (1e0 + 3.8416e0 / CAST(n AS DOUBLE)), 6) AS wilson_hi
        |FROM g ORDER BY event_type NULLS FIRST""".stripMargin,
    // (user, day) dedup + 7-day fan-out + second dedup — two exact
    // aggregates, no sliding distinct window; one closing division
    "agg_dau_wau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), dau AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
        |  FROM ud GROUP BY day
        |), f AS (
        |  SELECT DISTINCT user_id, day + CAST(u.i AS INTEGER) AS day
        |  FROM ud, LATERAL unnest(range(0, 7)) AS u(i)
        |), wau AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS wau
        |  FROM f GROUP BY day
        |)
        |SELECT day, dau, wau,
        |  ROUND(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 6)
        |    AS stickiness
        |FROM dau JOIN wau USING (day)
        |ORDER BY day""".stripMargin,
    // oracle states the sample as ORDER BY md5-priority LIMIT k; the
    // native bounded-state aggregate must reproduce it exactly
    "agg_sample_native" ->
      """WITH rws AS (
        |  SELECT event_type, CAST(user_id AS VARCHAR) AS uid,
        |    CAST(('0x' || substring(md5('smp|' ||
        |      CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT) AS p
        |  FROM events
        |), r AS (
        |  SELECT event_type, uid,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY p, uid) AS rn
        |  FROM rws
        |)
        |SELECT event_type, CAST(rn - 1 AS INTEGER) AS pos, uid
        |FROM r WHERE rn <= 10
        |ORDER BY event_type NULLS FIRST, pos""".stripMargin,
    // value-DESC/event_id total order; per-positive precision terms
    // round@12 → decimal; ONE closing double division
    "agg_average_precision" ->
      """WITH base AS (
        |  SELECT event_id, CAST(value AS DECIMAL(19,4)) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |), r AS (
        |  SELECT pos,
        |    ROW_NUMBER() OVER (ORDER BY v DESC, event_id) AS rk
        |  FROM base
        |), p AS (
        |  SELECT rk, ROW_NUMBER() OVER (ORDER BY rk) AS j
        |  FROM r WHERE pos = 1
        |), terms AS (
        |  SELECT CAST(ROUND(CAST(j AS DOUBLE) / CAST(rk AS DOUBLE),
        |    12) AS DECIMAL(20,12)) AS term
        |  FROM p
        |), agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pos, SUM(term) AS s
        |  FROM terms
        |)
        |SELECT n_pos, CAST(s AS DOUBLE) AS sum_prec,
        |  ROUND(CAST(s AS DOUBLE) / CAST(n_pos AS DOUBLE), 6)
        |    AS avg_precision
        |FROM agg""".stripMargin,
    // oracle states the direct pooled-EDF definition; the engine's
    // bucketed decomposition must integer-match D at every distinct
    // value; width-19 decimal products; ONE closing double division
    "agg_cvm_test" ->
      """WITH base AS (
        |  SELECT CAST(value AS DECIMAL(19,4)) AS v,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is1
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |), perv AS (
        |  SELECT v, CAST(SUM(is1) AS BIGINT) AS c1,
        |    CAST(COUNT(*) - SUM(is1) AS BIGINT) AS c2
        |  FROM base GROUP BY v
        |), cum AS (
        |  SELECT c1, c2,
        |    CAST(SUM(c1) OVER (ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1,
        |    CAST(SUM(c2) OVER (ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum2
        |  FROM perv
        |), tot AS (
        |  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2 FROM perv
        |), terms AS (
        |  SELECT n1, n2, c1, c2,
        |    cum1 * n2 - cum2 * n1 AS d
        |  FROM cum CROSS JOIN tot
        |), agg AS (
        |  SELECT n1, n2,
        |    SUM(CAST((c1 + c2) * d AS DECIMAL(19,0))
        |        * CAST(d AS DECIMAL(19,0))) AS s
        |  FROM terms GROUP BY n1, n2
        |)
        |SELECT n1, n2, CAST(s AS DOUBLE) AS sum_sq_gap,
        |  ROUND(CAST(s AS DOUBLE) /
        |  (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |   * CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)),
        |  6) AS cvm_t
        |FROM agg""".stripMargin,
    // 51-head order statistics; round@12 decimal ln terms (the house
    // log discipline); ONE closing double division
    "agg_hill_tail_index" ->
      """WITH ranked AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,4)) AS v,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY CAST(value AS DECIMAL(18,4)) DESC) AS rn
        |  FROM events
        |  WHERE event_type IN ('view', 'purchase', 'click')
        |    AND value > 0
        |), xk AS (
        |  SELECT event_type, v AS xk1 FROM ranked WHERE rn = 51
        |)
        |SELECT r.event_type, CAST(COUNT(*) AS BIGINT) AS k,
        |  CAST(xk1 AS DOUBLE) AS x_k1,
        |  CAST(SUM(CAST(ROUND(ln(CAST(v AS DOUBLE)
        |    / CAST(xk1 AS DOUBLE)), 12) AS DECIMAL(24,12)))
        |    AS DOUBLE) AS sum_log,
        |  ROUND(CAST(COUNT(*) AS DOUBLE) /
        |    CAST(SUM(CAST(ROUND(ln(CAST(v AS DOUBLE)
        |      / CAST(xk1 AS DOUBLE)), 12) AS DECIMAL(24,12)))
        |      AS DOUBLE), 6) AS hill_alpha
        |FROM ranked r JOIN xk USING (event_type)
        |WHERE rn <= 50
        |GROUP BY r.event_type, xk1
        |ORDER BY r.event_type NULLS FIRST""".stripMargin,
    // exact p95 via the distinct-value crossing at ceil(n*19/20);
    // decimal-exact excess sums; ONE closing double division
    "agg_mean_excess" ->
      """WITH base AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,4)) AS v4
        |  FROM events WHERE value IS NOT NULL
        |), perv AS (
        |  SELECT event_type, v4, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2
        |), cumc AS (
        |  SELECT event_type, v4,
        |    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY v4
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM perv
        |), thr AS (
        |  SELECT event_type, MAX(n) AS n,
        |    MIN(CASE WHEN cum >= (n * 19 + 19) // 20 THEN v4 END) AS u4
        |  FROM cumc GROUP BY event_type
        |)
        |SELECT b.event_type, n, CAST(u4 AS DOUBLE) AS u,
        |  CAST(SUM(CASE WHEN v4 > u4 THEN 1 END) AS BIGINT) AS n_exc,
        |  ROUND(CAST(SUM(CASE WHEN v4 > u4 THEN v4 - u4 END) AS DOUBLE)
        |    / CAST(SUM(CASE WHEN v4 > u4 THEN 1 END) AS DOUBLE), 6)
        |    AS mean_excess,
        |  CAST(MAX(CASE WHEN v4 > u4 THEN v4 - u4 END) AS DOUBLE)
        |    AS max_excess
        |FROM base b JOIN thr USING (event_type)
        |GROUP BY 1, 2, 3
        |ORDER BY b.event_type NULLS FIRST""".stripMargin,
    // decimal-exact values; median and residual quantile via the
    // distinct-value cumulative crossing; integer ceil rank
    // ((a*9+9)//10); ONE closing double division
    "agg_conformal_interval" ->
      """WITH base AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,4)) AS v4,
        |    (epoch_us(ts) // 86400000000) % 5 < 4 AS is_cal
        |  FROM events WHERE value IS NOT NULL
        |), cal AS (
        |  SELECT event_type, v4 FROM base WHERE is_cal
        |), perv AS (
        |  SELECT event_type, v4, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM cal GROUP BY 1, 2
        |), medc AS (
        |  SELECT event_type, v4,
        |    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY v4
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS n_cal
        |  FROM perv
        |), med AS (
        |  SELECT event_type, MAX(n_cal) AS n_cal,
        |    MIN(CASE WHEN cum >= (n_cal + 1) // 2 THEN v4 END) AS med4
        |  FROM medc GROUP BY event_type
        |), perr AS (
        |  SELECT event_type, n_cal, ABS(v4 - med4) AS r4,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM cal JOIN med USING (event_type) GROUP BY 1, 2, 3
        |), qc AS (
        |  SELECT event_type, n_cal, r4,
        |    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY r4
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM perr
        |), qv AS (
        |  SELECT event_type,
        |    MIN(CASE WHEN cum >= LEAST(((n_cal + 1) * 9 + 9) // 10,
        |      n_cal) THEN r4 END) AS q4
        |  FROM qc GROUP BY event_type
        |)
        |SELECT b.event_type, n_cal,
        |  CAST(med4 AS DOUBLE) AS med, CAST(q4 AS DOUBLE) AS q,
        |  CAST(COUNT(*) AS BIGINT) AS n_hold,
        |  CAST(SUM(CASE WHEN ABS(v4 - med4) <= q4 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_covered,
        |  ROUND(CAST(SUM(CASE WHEN ABS(v4 - med4) <= q4 THEN 1 ELSE 0
        |      END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS coverage
        |FROM base b JOIN med USING (event_type)
        |  JOIN qv USING (event_type)
        |WHERE NOT is_cal
        |GROUP BY 1, 2, 3, 4
        |ORDER BY b.event_type NULLS FIRST""".stripMargin,
    // integer-cent weights on the value table; lower weighted median
    // by all-integer 2·cumw ≥ W selection
    "agg_weighted_median" ->
      """WITH perv AS (
        |  SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS q,
        |    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2
        |), c AS (
        |  SELECT grp, q, w,
        |    CAST(SUM(w) OVER (PARTITION BY grp ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cumw,
        |    CAST(SUM(w) OVER (PARTITION BY grp) AS BIGINT) AS tot
        |  FROM perv
        |)
        |SELECT grp, MAX(tot) AS w_total,
        |  MIN(CASE WHEN cumw * 2 >= tot THEN q END) AS w_median
        |FROM c GROUP BY grp ORDER BY grp""".stripMargin,
    // one per-user window pass: conditional growing-frame counts +
    // last_value carry; round@12 decimal linear shares; integer
    // last-touch credits
    "agg_attribution" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1
        |      ELSE 0 END) OVER wb, 0) AS n_click,
        |    COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1
        |      ELSE 0 END) OVER wb, 0) AS n_view,
        |    COALESCE(SUM(CASE WHEN event_type = 'signup' THEN 1
        |      ELSE 0 END) OVER wb, 0) AS n_signup,
        |    COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1
        |      ELSE 0 END) OVER wb, 0) AS n_error,
        |    LAST_VALUE(CASE WHEN event_type <> 'purchase'
        |      THEN event_type END IGNORE NULLS) OVER wb AS last_chan
        |  FROM events
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |), p AS (
        |  SELECT last_chan,
        |    n_click + n_view + n_signup + n_error AS n_prior,
        |    n_click, n_view, n_signup, n_error
        |  FROM e WHERE event_type = 'purchase'
        |    AND n_click + n_view + n_signup + n_error > 0
        |), u AS (
        |  SELECT last_chan, n_prior, 'click' AS channel,
        |    n_click AS cnt FROM p
        |  UNION ALL SELECT last_chan, n_prior, 'view', n_view FROM p
        |  UNION ALL SELECT last_chan, n_prior, 'signup', n_signup FROM p
        |  UNION ALL SELECT last_chan, n_prior, 'error', n_error FROM p
        |), g AS (
        |  SELECT channel,
        |    CAST(SUM(CASE WHEN last_chan = channel THEN 1 ELSE 0 END)
        |      AS BIGINT) AS last_touch,
        |    SUM(CAST(ROUND(CAST(cnt AS DOUBLE) / n_prior, 12)
        |      AS DECIMAL(28,12))) AS lin
        |  FROM u GROUP BY 1
        |)
        |SELECT channel, last_touch,
        |  ROUND(CAST(lin AS DOUBLE), 6) AS linear_credit
        |FROM g ORDER BY channel""".stripMargin,
    // distinct-value doubled midranks (2cb+t+1); per-group round@8
    // decimal terms (the anova discipline); ONE closing double H with
    // the tie correction
    "agg_kruskal_wallis" ->
      """WITH cnt AS (
        |  SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS q,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2
        |), perq AS (
        |  SELECT q, CAST(SUM(c) AS BIGINT) AS tq FROM cnt GROUP BY 1
        |), pr AS (
        |  SELECT q, tq,
        |    COALESCE(CAST(SUM(tq) OVER (ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS cb
        |  FROM perq
        |), perg AS (
        |  SELECT cnt.grp, CAST(SUM(c) AS BIGINT) AS n_g,
        |    CAST(SUM(c * (2 * cb + tq + 1)) AS BIGINT) AS r2_g
        |  FROM cnt JOIN pr USING (q) GROUP BY 1
        |), agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(n_g) AS BIGINT) AS n,
        |    SUM(CAST(ROUND(CAST(r2_g AS DOUBLE) * r2_g / n_g, 8)
        |      AS DECIMAL(38,8))) AS a
        |  FROM perg
        |), ties AS (
        |  SELECT CAST(SUM(tq * tq * tq - tq) AS BIGINT) AS tie_term
        |  FROM perq
        |)
        |SELECT k, n, tie_term,
        |  ROUND((3 * CAST(a AS DOUBLE) / (CAST(n AS DOUBLE) * (n + 1))
        |     - 3 * (n + 1)) /
        |    (1 - CAST(tie_term AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * n * n - n)), 6) AS h_stat
        |FROM agg CROSS JOIN ties""".stripMargin,
    // doubled midranks on both marginals; exact BIGINT Pearson moments
    // of the doubled ranks (affine-invariant); one closing double rho
    "agg_spearman_corr" ->
      """WITH cells AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(ROUND(l_discount * 100) AS BIGINT) AS y,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2
        |), rx AS (
        |  SELECT x, 2 * COALESCE(CAST(SUM(t) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) + t + 1 AS dr_x
        |  FROM (SELECT x, CAST(SUM(c) AS BIGINT) AS t
        |        FROM cells GROUP BY 1)
        |), ry AS (
        |  SELECT y, 2 * COALESCE(CAST(SUM(t) OVER (ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) + t + 1 AS dr_y
        |  FROM (SELECT y, CAST(SUM(c) AS BIGINT) AS t
        |        FROM cells GROUP BY 1)
        |), m AS (
        |  SELECT CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(SUM(c * dr_x) AS BIGINT) AS sx,
        |    CAST(SUM(c * dr_y) AS BIGINT) AS sy,
        |    CAST(SUM(c * dr_x * dr_x) AS BIGINT) AS sxx,
        |    CAST(SUM(c * dr_y * dr_y) AS BIGINT) AS syy,
        |    CAST(SUM(c * dr_x * dr_y) AS BIGINT) AS sxy
        |  FROM cells JOIN rx USING (x) JOIN ry USING (y)
        |)
        |SELECT n, sx, sy,
        |  ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        |    SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
        |         (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
        |    6) AS rho
        |FROM m""".stripMargin,
    // concordance counted over the ≤550-cell joint table (value-space
    // all-pairs, never row pairs); doubled integer counts; one closing
    // double tau-b
    "agg_kendall_tau" ->
      """WITH cells AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(ROUND(l_discount * 100) AS BIGINT) AS y,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM cells_src GROUP BY 1, 2
        |), cd AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN a.y < b.y THEN 2 * a.c * b.c
        |      ELSE 0 END) AS BIGINT) AS c2,
        |    CAST(SUM(CASE WHEN a.y > b.y THEN 2 * a.c * b.c
        |      ELSE 0 END) AS BIGINT) AS d2
        |  FROM cells a JOIN cells b ON a.x < b.x
        |), marg AS (
        |  SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM cells) AS n,
        |    (SELECT CAST(SUM(tx * (tx - 1)) AS BIGINT) FROM
        |      (SELECT CAST(SUM(c) AS BIGINT) AS tx FROM cells
        |       GROUP BY x)) AS n1_2,
        |    (SELECT CAST(SUM(ty * (ty - 1)) AS BIGINT) FROM
        |      (SELECT CAST(SUM(c) AS BIGINT) AS ty FROM cells
        |       GROUP BY y)) AS n2_2
        |)
        |SELECT n, c2, d2, n1_2, n2_2,
        |  ROUND((c2 - CAST(d2 AS DOUBLE)) /
        |    SQRT((CAST(n * (n - 1) AS DOUBLE) - n1_2) *
        |         (CAST(n * (n - 1) AS DOUBLE) - n2_2)), 6) AS tau_b
        |FROM cd CROSS JOIN marg""".stripMargin
        .replace("cells_src", "lineitem"),
    // doubled group medians from distinct-value cumulative counts;
    // exact BIGINT |2x − m2| deviations; anova-shaped exact-moment F
    "agg_levene_test" ->
      """WITH cnt AS (
        |  SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS q,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2
        |), cum AS (
        |  SELECT grp, q, c,
        |    CAST(SUM(c) OVER (PARTITION BY grp ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY grp) AS BIGINT) AS n
        |  FROM cnt
        |), med AS (
        |  SELECT grp,
        |    MIN(CASE WHEN cum >= (n + 1) // 2 THEN q END) +
        |    MIN(CASE WHEN cum >= n // 2 + 1 THEN q END) AS m2
        |  FROM cum GROUP BY 1
        |), g AS (
        |  SELECT l.l_returnflag AS grp,
        |    CAST(COUNT(*) AS BIGINT) AS n_g,
        |    CAST(SUM(ABS(2 * CAST(l_quantity AS BIGINT) - m2))
        |      AS BIGINT) AS s_g,
        |    CAST(SUM(ABS(2 * CAST(l_quantity AS BIGINT) - m2) *
        |      ABS(2 * CAST(l_quantity AS BIGINT) - m2)) AS BIGINT) AS ss_g
        |  FROM lineitem l JOIN med ON l.l_returnflag = med.grp
        |  GROUP BY 1
        |), agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(n_g) AS BIGINT) AS n,
        |    CAST(SUM(s_g) AS BIGINT) AS s,
        |    CAST(SUM(ss_g) AS BIGINT) AS ss,
        |    SUM(CAST(ROUND(CAST(s_g AS DOUBLE) * s_g / n_g, 8)
        |      AS DECIMAL(28,8))) AS a
        |  FROM g
        |)
        |SELECT k, n, s, ss,
        |  ROUND(((CAST(a AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
        |     / (k - 1)) /
        |    ((ss - CAST(a AS DOUBLE)) / (n - k)), 6) AS f_stat
        |FROM agg""".stripMargin,
    // exact integer gaps + integer-div mean; quantile_disc matches
    // approx_percentile@1e6 exactly at fixture cardinalities
    "profile_interarrival" ->
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(ts) - LAG(epoch_us(ts)) OVER (
        |      PARTITION BY event_type
        |      ORDER BY epoch_us(ts), event_id) AS gap_us
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n_gaps,
        |  CAST(SUM(gap_us) AS BIGINT) // COUNT(*) AS mean_gap_us,
        |  quantile_disc(gap_us, 0.5) AS p50_gap_us,
        |  quantile_disc(gap_us, 0.95) AS p95_gap_us
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,
    // integer arm counts; (n0-n1)^2/n with identical double text and
    // the chi2_1 95% literal pinned on both engines
    "agg_srm_check" ->
      """WITH u AS (
        |  SELECT DISTINCT user_id FROM events),
        |a AS (
        |  SELECT CAST(('0x' || substring(md5('srm|' ||
        |    CAST(user_id AS VARCHAR)), 1, 6)) AS BIGINT) % 2 AS arm
        |  FROM u)
        |SELECT COUNT(*) AS n_users,
        |  CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_arm0,
        |  CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_arm1,
        |  ROUND(CAST((SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) -
        |              SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)) *
        |             (SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) -
        |              SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END))
        |        AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS chi2,
        |  (CAST((SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) -
        |         SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)) *
        |        (SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) -
        |         SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END))
        |   AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) > 3.841458820694124
        |    AS srm_detected
        |FROM a""".stripMargin,
    // integer md5-derived score, integer bins; two closing divisions
    // commutative 24-bit md5-prefix sum over a canonical integer/string
    // row rendering; engine-formatted floats excluded by design
    "agg_table_checksum" ->
      """WITH h AS (
        |  SELECT CAST(('0x' || substring(md5(concat_ws('|',
        |    CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
        |    l_returnflag, l_linestatus,
        |    CAST(CAST(l_quantity AS BIGINT) AS VARCHAR))), 1, 6))
        |    AS BIGINT) AS h
        |  FROM lineitem)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(h) AS BIGINT) AS checksum_sum,
        |  CAST(MIN(h) AS BIGINT) AS checksum_min,
        |  CAST(MAX(h) AS BIGINT) AS checksum_max
        |FROM h""".stripMargin,
    // |1000·n_pos − sum_sc| is integral per bin: ECE is one integer
    // sum and one closing division
    "agg_ece" ->
      """WITH e AS (
        |  SELECT CAST(('0x' || substring(md5('cal|' ||
        |      CAST(event_id AS VARCHAR)), 1, 6)) AS BIGINT) % 1000 AS sc,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |b AS (
        |  SELECT sc // 100 AS bin, COUNT(*) AS n,
        |    CAST(SUM(sc) AS BIGINT) AS sum_sc,
        |    CAST(SUM(y) AS BIGINT) AS n_pos
        |  FROM e GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
        |  CAST(SUM(n) AS BIGINT) AS n_all,
        |  CAST(SUM(ABS(1000 * n_pos - sum_sc)) AS BIGINT) AS ece_scaled,
        |  ROUND(CAST(SUM(ABS(1000 * n_pos - sum_sc)) AS BIGINT) /
        |    (1000 * CAST(SUM(n) AS DOUBLE)), 6) AS ece
        |FROM b""".stripMargin,
    // integer confusion counts; kappa telescoped to one division
    "agg_cohen_kappa" ->
      """WITH r AS (
        |  SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS ra,
        |    CASE WHEN len(string_split(text, ' ')) >= 60
        |      THEN 1 ELSE 0 END AS rb
        |  FROM documents),
        |c AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(ra * rb) AS BIGINT) AS n11,
        |    CAST(SUM(ra * (1 - rb)) AS BIGINT) AS n10,
        |    CAST(SUM((1 - ra) * rb) AS BIGINT) AS n01,
        |    CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS n00
        |  FROM r)
        |SELECT n, n11, n10, n01, n00,
        |  ROUND((n * (n11 + n00) -
        |     ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))) /
        |    CAST(n * n -
        |     ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
        |     AS DOUBLE), 6) AS kappa
        |FROM c""".stripMargin,
    "agg_calibration_curve" ->
      """WITH e AS (
        |  SELECT CAST(('0x' || substring(md5('cal|' ||
        |      CAST(event_id AS VARCHAR)), 1, 6)) AS BIGINT) % 1000 AS sc,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events)
        |SELECT sc // 100 AS bin, COUNT(*) AS n,
        |  CAST(SUM(y) AS BIGINT) AS n_pos,
        |  ROUND(CAST(SUM(sc) AS DOUBLE) / (COUNT(*) * 1000), 6)
        |    AS mean_score,
        |  ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS pos_rate
        |FROM e GROUP BY 1 ORDER BY bin""".stripMargin,
    // plain SQL NTILE(10) — proves the withGlobalIndex+ntileFromRank
    // decomposition equals the engine ntile row for row
    "agg_gains_deciles" ->
      """WITH e AS (
        |  SELECT event_id,
        |    CAST(('0x' || substring(md5('cal|' ||
        |      CAST(event_id AS VARCHAR)), 1, 6)) AS BIGINT) % 1000 AS sc,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |r AS (
        |  SELECT y, CAST(NTILE(10) OVER (ORDER BY sc DESC, event_id)
        |    AS INTEGER) AS decile
        |  FROM e),
        |g AS (
        |  SELECT decile, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos
        |  FROM r GROUP BY decile),
        |c AS (
        |  SELECT decile, n, n_pos,
        |    CAST(SUM(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
        |    CAST(SUM(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
        |    CAST(SUM(n) OVER () AS BIGINT) AS total_n,
        |    CAST(SUM(n_pos) OVER () AS BIGINT) AS total_pos
        |  FROM g)
        |SELECT decile, n, n_pos, cum_n, cum_pos,
        |  ROUND((CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE)) /
        |        (CAST(total_pos AS DOUBLE) / CAST(total_n AS DOUBLE)), 6)
        |    AS cum_lift
        |FROM c ORDER BY decile""".stripMargin,
    // all-integer: exact cents, bit-length buckets, 2·cum >= n median
    // rule; pow(2,b) exact in IEEE at b <= 62 with identical text
    "agg_exp_histogram" ->
      """WITH v AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(19,4)) * 10000 AS BIGINT) AS c
        |  FROM events WHERE value > 0),
        |b AS (
        |  SELECT event_type, length(bin(c)) AS bucket, COUNT(*) AS n
        |  FROM v GROUP BY 1, 2),
        |cm AS (
        |  SELECT event_type, bucket, n,
        |    CAST(SUM(n) OVER (PARTITION BY event_type
        |                      ORDER BY bucket) AS BIGINT) AS cum,
        |    CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS n_total
        |  FROM b)
        |SELECT event_type, bucket, n, cum,
        |  (cum * 2 >= n_total AND (cum - n) * 2 < n_total)
        |    AS is_median_bucket,
        |  CAST(pow(2, bucket - 1) AS BIGINT) AS lo_cents,
        |  CAST(pow(2, bucket) - 1 AS BIGINT) AS hi_cents
        |FROM cm ORDER BY event_type NULLS FIRST, bucket""".stripMargin,
    "agg_time_to_convert" ->
      """WITH v AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS first_view
        |  FROM events WHERE event_type = 'view' GROUP BY 1
        |), p AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS first_purchase
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1
        |), d AS (
        |  SELECT (first_purchase - first_view) // 1000000 AS delta_s
        |  FROM v JOIN p USING (user_id)
        |  WHERE first_purchase > first_view
        |)
        |SELECT COUNT(*) AS n_converted, MIN(delta_s) AS min_s,
        |  MAX(delta_s) AS max_s,
        |  ROUND(CAST(SUM(delta_s) AS DOUBLE) / COUNT(*), 2) AS mean_s
        |FROM d""".stripMargin,
    "agg_abtest_lift" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN value >= 200.0 THEN 1 ELSE 0 END)
        |      AS converted,
        |    CASE WHEN CAST(('0x' || substring(
        |        md5(CAST(user_id AS VARCHAR)), 1, 2)) AS BIGINT) % 2 = 0
        |      THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY user_id
        |), arms AS (
        |  SELECT arm, COUNT(*) AS n_users,
        |    CAST(SUM(converted) AS BIGINT) AS n_converted,
        |    ROUND(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6) AS cvr
        |  FROM pu GROUP BY arm
        |)
        |SELECT arm, n_users, n_converted, cvr,
        |  ROUND(cvr / (SELECT cvr FROM arms WHERE arm = 'A') - 1.0, 6)
        |    AS lift_vs_a
        |FROM arms ORDER BY arm""".stripMargin,
    // Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek(ts):
    // 0=Sunday..6 — shift to match
    "agg_seasonality" ->
      """WITH c AS (
        |  SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
        |    CAST(hour(ts) AS INTEGER) AS hod, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT dow, hod, n,
        |  ROUND(CAST(n AS DOUBLE) / (SELECT SUM(n) FROM c), 6) AS share
        |FROM c ORDER BY dow, hod""".stripMargin,
    "agg_higher_moments" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(6,2))) AS s1,
        |    SUM(CAST(l_quantity AS DECIMAL(6,2)) *
        |        CAST(l_quantity AS DECIMAL(6,2))) AS s2,
        |    SUM(CAST(l_quantity AS DECIMAL(6,2)) *
        |        CAST(l_quantity AS DECIMAL(6,2)) *
        |        CAST(l_quantity AS DECIMAL(6,2))) AS s3,
        |    SUM(CAST(l_quantity AS DECIMAL(6,2)) *
        |        CAST(l_quantity AS DECIMAL(6,2)) *
        |        CAST(l_quantity AS DECIMAL(6,2)) *
        |        CAST(l_quantity AS DECIMAL(6,2))) AS s4
        |  FROM lineitem GROUP BY l_returnflag
        |), f AS (
        |  SELECT l_returnflag, n,
        |    CAST(s1 AS DOUBLE) / n AS mean,
        |    CAST(s2 AS DOUBLE) / n AS r2,
        |    CAST(s3 AS DOUBLE) / n AS r3,
        |    CAST(s4 AS DOUBLE) / n AS r4
        |  FROM m
        |), c AS (
        |  SELECT l_returnflag, n, mean,
        |    r2 - mean * mean AS m2,
        |    r3 - mean * r2 * 3 + mean * mean * mean * 2 AS m3,
        |    r4 - mean * r3 * 4 + mean * mean * r2 * 6 -
        |      mean * mean * mean * mean * 3 AS m4
        |  FROM f
        |)
        |SELECT l_returnflag, n, ROUND(mean, 4) + 0.0 AS mean,
        |  ROUND(m3 / pow(m2, 1.5), 4) + 0.0 AS skewness,
        |  ROUND(m4 / (m2 * m2) - 3, 4) + 0.0 AS kurtosis
        |FROM c ORDER BY l_returnflag""".stripMargin,
    "agg_markov_transition" ->
      """WITH pairs AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events
        |), c AS (
        |  SELECT from_type, to_type, COUNT(*) AS n
        |  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n,
        |  ROUND(CAST(n AS DOUBLE) /
        |    SUM(n) OVER (PARTITION BY from_type), 4) AS p
        |FROM c ORDER BY from_type NULLS FIRST, to_type""".stripMargin,
    "agg_cohort_matrix" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(date_trunc('week', ts)) AS week_us
        |  FROM events
        |), cohort AS (
        |  SELECT user_id, MIN(week_us) AS cohort_us FROM uw GROUP BY 1
        |)
        |SELECT cohort_us, week_us,
        |  COUNT(DISTINCT uw.user_id) AS n_active
        |FROM uw JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "agg_benford" ->
      """WITH d AS (
        |  SELECT regexp_extract(
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
        |    '[1-9]') AS digit
        |  FROM orders
        |), c AS (
        |  SELECT digit, COUNT(*) AS n FROM d GROUP BY 1
        |)
        |SELECT digit, n,
        |  ROUND(CAST(n AS DOUBLE) / (SELECT SUM(n) FROM c), 4) AS share,
        |  ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 4) AS benford
        |FROM c ORDER BY digit""".stripMargin,
    "agg_path_mining" ->
      """WITH seq AS (
        |  SELECT event_type,
        |    lead(event_type, 1) OVER w AS t1,
        |    lead(event_type, 2) OVER w AS t2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |-- concat_ws skips NULLs exactly like the engine's concat_ws
        |-- (a NULL head yields 't1>t2', not a NULL path)
        |SELECT concat_ws('>', event_type, t1, t2) AS path,
        |  COUNT(*) AS n
        |FROM seq WHERE t2 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin,
    "agg_type_cooccurrence" ->
      """WITH ut AS (
        |  SELECT user_id, event_type FROM events
        |  GROUP BY 1, 2 HAVING MAX(value) >= 200.0
        |)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  COUNT(*) AS n_users_both
        |FROM ut a JOIN ut b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // exact integer basket counts; three identical-text closing ratios
    "agg_association_rules" ->
      """WITH ut AS (
        |  SELECT user_id, event_type FROM events
        |  GROUP BY 1, 2 HAVING MAX(value) >= 200.0
        |), marg AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
        |  FROM ut GROUP BY 1
        |), nu AS (
        |  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM ut
        |), pairs AS (
        |  SELECT a.event_type AS lhs, b.event_type AS rhs,
        |    CAST(COUNT(*) AS BIGINT) AS n_both
        |  FROM ut a JOIN ut b
        |    ON a.user_id = b.user_id AND a.event_type <> b.event_type
        |  GROUP BY 1, 2
        |)
        |SELECT lhs, rhs, n_both, ml.n_t AS n_lhs, mr.n_t AS n_rhs,
        |  n_users,
        |  ROUND(n_both / CAST(n_users AS DOUBLE), 6) AS support,
        |  ROUND(n_both / CAST(ml.n_t AS DOUBLE), 6) AS confidence,
        |  ROUND(CAST(n_users AS DOUBLE) * n_both /
        |    (CAST(ml.n_t AS DOUBLE) * mr.n_t), 6) AS lift
        |FROM pairs
        |JOIN marg ml ON pairs.lhs = ml.event_type
        |JOIN marg mr ON pairs.rhs = mr.event_type
        |CROSS JOIN nu
        |ORDER BY lhs, rhs""".stripMargin,
    "agg_heavy_hitters_native" -> heavyHittersOracle,
    "agg_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        |), c AS (
        |  SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1
        |), t AS (
        |  SELECT COUNT(*) AS n_total FROM toks
        |)
        |SELECT tok, cnt, n_total,
        |  ROUND(CAST(cnt AS DOUBLE) / n_total, 6) AS share
        |FROM c CROSS JOIN t
        |WHERE cnt * 31 > n_total
        |ORDER BY cnt DESC, tok""".stripMargin,
    "window_mad_outlier" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CAST(CAST(value AS DECIMAL(19,4)) AS DOUBLE) AS v
        |  FROM events
        |), med AS (
        |  SELECT event_type, median(v) AS med FROM ev GROUP BY 1
        |), mad AS (
        |  SELECT ev.event_type, ANY_VALUE(med.med) AS med,
        |    median(abs(ev.v - med.med)) AS mad
        |  FROM ev JOIN med USING (event_type) GROUP BY ev.event_type
        |)
        |SELECT event_id, event_type, v AS value_q,
        |  ROUND(abs(v - med) / (mad * 1.4826), 3) AS robust_z
        |FROM ev JOIN mad USING (event_type)
        |WHERE mad > 0 AND abs(v - med) / (mad * 1.4826) > 3.5
        |ORDER BY event_id""".stripMargin,
    // rank-sum AUC over the identical deterministic (v, event_id)
    // order; 2U stays integer end to end
    "agg_auc_rank" ->
      """WITH base AS (
        |  SELECT event_id, CAST(value AS DECIMAL(19,4)) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |), rk AS (
        |  SELECT pos,
        |    ROW_NUMBER() OVER (ORDER BY v, event_id) AS r
        |  FROM base
        |)
        |SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
        |  CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n_neg,
        |  CAST(SUM(CASE WHEN pos = 1 THEN r ELSE 0 END) * 2 -
        |       SUM(pos) * (SUM(pos) + 1) AS BIGINT) AS u_stat_2x,
        |  ROUND(CAST(SUM(CASE WHEN pos = 1 THEN r ELSE 0 END) * 2 -
        |             SUM(pos) * (SUM(pos) + 1) AS DOUBLE) /
        |        (SUM(pos) * (COUNT(*) - SUM(pos)) * 2), 6) AS auc
        |FROM rk""".stripMargin,
    // rank-exact clip edges (quantile_disc ↔ approx_percentile@1e6);
    // clipped decimals sum order-independently
    "agg_winsorized_mean" ->
      """WITH ed AS (
        |  SELECT event_type,
        |    quantile_disc(value, 0.05) AS lo,
        |    quantile_disc(value, 0.95) AS hi
        |  FROM events GROUP BY 1
        |), cl AS (
        |  SELECT e.event_type,
        |    CAST(e.value AS DECIMAL(18,4)) AS vq,
        |    CAST(LEAST(GREATEST(e.value, ed.lo), ed.hi)
        |      AS DECIMAL(18,4)) AS wq
        |  FROM events e JOIN ed USING (event_type)
        |)
        |SELECT event_type, COUNT(*) AS n,
        |  ROUND(CAST(SUM(vq) AS DOUBLE) / COUNT(*), 4) AS mean_raw,
        |  ROUND(CAST(SUM(wq) AS DOUBLE) / COUNT(*), 4)
        |    AS mean_winsorized,
        |  ROUND(CAST(SUM(vq) - SUM(wq) AS DOUBLE) / COUNT(*), 4)
        |    AS outlier_influence
        |FROM cl GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,
    // operands cast to DECIMAL(19,4): DuckDB needs the product width
    // (19+19=38) to fit its max decimal; the VALUES are identical to
    // the engine's (18,4) casts, so the sums match exactly
    "agg_corr_matrix" ->
      """WITH c AS (
        |  SELECT CAST(l_quantity AS DECIMAL(19,4)) AS q,
        |    CAST(l_extendedprice AS DECIMAL(19,4)) AS p,
        |    CAST(l_discount AS DECIMAL(19,4)) AS dd,
        |    CAST(l_tax AS DECIMAL(19,4)) AS tt
        |  FROM lineitem),
        |m AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(q) AS sq, SUM(p) AS sp, SUM(dd) AS sd, SUM(tt) AS st,
        |    SUM(q*q) AS sqq, SUM(p*p) AS spp,
        |    SUM(dd*dd) AS sdd, SUM(tt*tt) AS stt,
        |    SUM(q*p) AS sqp, SUM(q*dd) AS sqd, SUM(q*tt) AS sqt,
        |    SUM(p*dd) AS spd, SUM(p*tt) AS spt, SUM(dd*tt) AS sdt
        |  FROM c)
        |SELECT n,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))), 6) AS corr_qty_price,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sqd AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 6) AS corr_qty_disc,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sqt AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(st AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))), 6) AS corr_qty_tax,
        |  ROUND((CAST(n AS DOUBLE) * CAST(spd AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sd AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 6) AS corr_price_disc,
        |  ROUND((CAST(n AS DOUBLE) * CAST(spt AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(st AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))), 6) AS corr_price_tax,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sdt AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(st AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))), 6) AS corr_disc_tax
        |FROM m""".stripMargin,
    "profile_key_skew" ->
      """WITH pk AS (
        |  SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem
        |  GROUP BY l_suppkey),
        |summary AS (
        |  SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |    MAX(cnt) AS max_per_key, MIN(cnt) AS min_per_key
        |  FROM pk),
        |hot AS (
        |  SELECT MIN(l_suppkey) AS hot_key FROM pk
        |  WHERE cnt = (SELECT MAX(cnt) FROM pk))
        |SELECT n_keys, n_rows, max_per_key, min_per_key, hot_key,
        |  CAST(max_per_key * n_keys * 1000 // n_rows AS BIGINT)
        |    AS skew_x1000
        |FROM summary, hot""".stripMargin,
    "profile_freshness" ->
      """WITH wm AS (SELECT MAX(epoch_us(ts)) AS watermark_us FROM events)
        |SELECT event_type, COUNT(*) AS n,
        |  MIN(epoch_us(ts)) AS first_us,
        |  MAX(epoch_us(ts)) AS last_us,
        |  CAST(watermark_us - MAX(epoch_us(ts)) AS BIGINT)
        |    AS staleness_us,
        |  CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT)
        |    AS span_us
        |FROM events CROSS JOIN wm
        |GROUP BY event_type, watermark_us
        |ORDER BY event_type NULLS FIRST""".stripMargin,
    // exact integer/decimal moments; identical closing double text
    "agg_cuped" ->
      """WITH u AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
        |      AS x,
        |    SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
        |        THEN CAST(value AS DECIMAL(18,4))
        |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS y
        |  FROM events GROUP BY user_id),
        |m AS (
        |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM u)
        |SELECT n AS n_users,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS theta,
        |  ROUND((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |     CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS var_y,
        |  ROUND(((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |     CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) -
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) *
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) /
        |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS var_cuped,
        |  ROUND(100.0 *
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) *
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |     (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
        |    AS var_reduction_pct
        |FROM m""".stripMargin,
    // seeded parity arms; exact decimal arm sums; the >= compares
    // identically-derived doubles in both engines
    "agg_permutation_test" ->
      """WITH u AS (
        |  SELECT user_id, COUNT(*) AS ne,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS sv
        |  FROM events GROUP BY user_id),
        |oa AS (
        |  SELECT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
        |      1, 6)) AS BIGINT) % 2 AS arm, ne, sv
        |  FROM u),
        |obs AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN arm = 1 THEN sv END) AS DOUBLE) /
        |      SUM(CASE WHEN arm = 1 THEN ne END) -
        |    CAST(SUM(CASE WHEN arm = 0 THEN sv END) AS DOUBLE) /
        |      SUM(CASE WHEN arm = 0 THEN ne END) AS obs_diff
        |  FROM oa),
        |pa AS (
        |  SELECT b,
        |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR) || '_' ||
        |      CAST(b AS VARCHAR)), 1, 6)) AS BIGINT) % 2 AS arm, ne, sv
        |  FROM u CROSS JOIN (SELECT unnest(generate_series(1, 100)) AS b)),
        |pd AS (
        |  SELECT b,
        |    CAST(SUM(CASE WHEN arm = 1 THEN sv END) AS DOUBLE) /
        |      SUM(CASE WHEN arm = 1 THEN ne END) -
        |    CAST(SUM(CASE WHEN arm = 0 THEN sv END) AS DOUBLE) /
        |      SUM(CASE WHEN arm = 0 THEN ne END) AS diff
        |  FROM pa GROUP BY b)
        |SELECT ROUND(MAX(obs_diff), 6) AS obs_diff,
        |  CAST(SUM(CASE WHEN abs(diff) >= abs(obs_diff) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_ge,
        |  ROUND((CAST(SUM(CASE WHEN abs(diff) >= abs(obs_diff)
        |         THEN 1 ELSE 0 END) AS DOUBLE) + 1.0) / 101.0, 6)
        |    AS p_value
        |FROM pd CROSS JOIN obs""".stripMargin,
    // same five exact moments as agg_cuped; one closing sqrt
    "agg_delta_ratio_ci" ->
      """WITH u AS (
        |  SELECT event_type, user_id, COUNT(*) AS x,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS y
        |  FROM events GROUP BY event_type, user_id),
        |m AS (
        |  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM u GROUP BY event_type),
        |r AS (
        |  SELECT event_type, n AS n_users,
        |    ROUND(CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE), 6) AS ratio,
        |    ROUND(sqrt(
        |      ((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |        CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |       (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) -
        |       2.0 * (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)) *
        |       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |        CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |       (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) +
        |       (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)) *
        |       (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)) *
        |       (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
        |       (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) /
        |      (CAST(n AS DOUBLE) *
        |       (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) *
        |       (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))), 6) AS se
        |  FROM m)
        |SELECT event_type, n_users, ratio, se,
        |  ROUND(ratio - 1.96 * se, 6) AS ci_lo,
        |  ROUND(ratio + 1.96 * se, 6) AS ci_hi
        |FROM r
        |ORDER BY event_type NULLS FIRST""".stripMargin,
    // same exact moments; z literals combine as exact decimals; CEIL
    // of identically-derived doubles
    "agg_power_analysis" ->
      """SELECT event_type, COUNT(*) AS n_obs,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS mean_v,
        |  ROUND((CAST(COUNT(*) AS DOUBLE) *
        |     CAST(SUM(CAST(value AS DECIMAL(18,4)) *
        |              CAST(value AS DECIMAL(18,4))) AS DOUBLE) -
        |     CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) *
        |     CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)) /
        |    (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)), 6)
        |    AS sigma2,
        |  CAST(CEIL(2.0 *
        |    ((CAST(COUNT(*) AS DOUBLE) *
        |      CAST(SUM(CAST(value AS DECIMAL(18,4)) *
        |               CAST(value AS DECIMAL(18,4))) AS DOUBLE) -
        |      CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) *
        |      CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)) /
        |     (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE))) *
        |    ((1.96 + 0.8416) * (1.96 + 0.8416)) /
        |    ((0.05 * (CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) /
        |              CAST(COUNT(*) AS DOUBLE))) *
        |     (0.05 * (CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) /
        |              CAST(COUNT(*) AS DOUBLE)))))
        |    AS BIGINT) AS n_per_arm
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin,
    // seeded Poisson weights are all-integer decisions; replicate
    // means are exact decimal sums with one closing double division;
    // CI bounds are order statistics (no interpolated quantile)
    "agg_bootstrap_ci" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority AS priority,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS x
        |  FROM orders),
        |rep AS (
        |  SELECT priority, x, b,
        |    CASE
        |      WHEN h < 6171992 THEN 0 WHEN h < 12343985 THEN 1
        |      WHEN h < 15429982 THEN 2 WHEN h < 16458647 THEN 3
        |      WHEN h < 16715813 THEN 4 ELSE 5 END AS w
        |  FROM (
        |    SELECT priority, x, b,
        |      CAST(('0x' || substring(md5(
        |        CAST(o_orderkey AS VARCHAR) || '_' || CAST(b AS VARCHAR)),
        |        1, 6)) AS BIGINT) AS h
        |    FROM o CROSS JOIN (SELECT unnest(generate_series(1, 100)) AS b)
        |  ) t),
        |m AS (
        |  SELECT priority, b,
        |    ROUND(CAST(SUM(w * x) AS DOUBLE) / SUM(w), 6) AS mean_b
        |  FROM rep GROUP BY priority, b),
        |r AS (
        |  SELECT priority, mean_b,
        |    row_number() OVER (PARTITION BY priority
        |                       ORDER BY mean_b ASC NULLS LAST, b) AS rn
        |  FROM m),
        |ci AS (
        |  SELECT priority,
        |    MAX(CASE WHEN rn = 3 THEN mean_b END) AS ci_lo,
        |    MAX(CASE WHEN rn = 98 THEN mean_b END) AS ci_hi
        |  FROM r GROUP BY priority),
        |f AS (
        |  SELECT priority, COUNT(*) AS n,
        |    ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS mean_full
        |  FROM o GROUP BY priority)
        |SELECT priority, n, mean_full, ci_lo, ci_hi
        |FROM f JOIN ci USING (priority)
        |ORDER BY priority""".stripMargin,
    // exact integer (n_up, n_down, R); identical z formula text
    "agg_mann_kendall" ->
      """WITH dc AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1
        |), p AS (
        |  SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
        |                       WHEN b.x < a.x THEN -1
        |                       ELSE 0 END) AS BIGINT) AS s_stat,
        |    COUNT(*) AS n_pairs
        |  FROM dc a JOIN dc b ON b.day > a.day
        |), nn AS (SELECT COUNT(*) AS n FROM dc
        |), ties AS (
        |  SELECT CAST(COALESCE(SUM(tj * (tj - 1) * (2 * tj + 5)), 0)
        |    AS BIGINT) AS tie_term
        |  FROM (SELECT COUNT(*) AS tj FROM dc
        |        GROUP BY x HAVING COUNT(*) > 1) tt
        |)
        |SELECT n, s_stat, n_pairs, tie_term,
        |  ROUND((CASE WHEN s_stat > 0 THEN s_stat - 1
        |              WHEN s_stat < 0 THEN s_stat + 1
        |              ELSE 0 END)
        |    / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
        |            - tie_term) / 18.0), 6) AS z
        |FROM nn, p, ties""".stripMargin,
    "agg_runs_test" ->
      """WITH dc AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1
        |), sg AS (
        |  SELECT day, CASE WHEN chg > 0 THEN 1 ELSE 0 END AS up
        |  FROM (SELECT day, x - lag(x) OVER (ORDER BY day) AS chg
        |        FROM dc) t1
        |  WHERE chg IS NOT NULL AND chg <> 0
        |), rr AS (
        |  SELECT up,
        |    CASE WHEN lag(up) OVER (ORDER BY day) IS NULL
        |         OR lag(up) OVER (ORDER BY day) <> up
        |         THEN 1 ELSE 0 END AS new_run
        |  FROM sg
        |)
        |SELECT CAST(SUM(up) AS BIGINT) AS n_up,
        |  CAST(COUNT(*) - SUM(up) AS BIGINT) AS n_down,
        |  CAST(SUM(new_run) AS BIGINT) AS n_runs,
        |  ROUND((CAST(SUM(new_run) AS DOUBLE) -
        |    (2.0 * SUM(up) * (COUNT(*) - SUM(up)) / COUNT(*) + 1)) /
        |    sqrt(2.0 * SUM(up) * (COUNT(*) - SUM(up)) *
        |      (2.0 * SUM(up) * (COUNT(*) - SUM(up)) - COUNT(*)) /
        |      (CAST(COUNT(*) AS DOUBLE) * COUNT(*) * (COUNT(*) - 1))),
        |    6) AS z
        |FROM rr HAVING COUNT(*) > 1""".stripMargin,
    // integer prefix sums; round-6 fit + split-day tiebreak pins the
    // argmax identically
    "agg_changepoint_binary" ->
      """WITH dc AS (
        |  SELECT day, x,
        |    ROW_NUMBER() OVER (ORDER BY day) AS t,
        |    CAST(SUM(x) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS s1
        |  FROM (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x
        |        FROM events GROUP BY 1)
        |), tot AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx FROM dc
        |)
        |SELECT day AS split_day, t AS n1, n - t AS n2,
        |  ROUND(CAST(s1 AS DOUBLE) / t, 4) AS mean1,
        |  ROUND(CAST(sx - s1 AS DOUBLE) / (n - t), 4) AS mean2,
        |  ROUND(CAST(s1 AS DOUBLE) * s1 / t +
        |        CAST(sx - s1 AS DOUBLE) * (sx - s1) / (n - t), 6) AS fit
        |FROM dc, tot WHERE t < n
        |ORDER BY fit DESC, split_day LIMIT 1""".stripMargin,
    "agg_hhi" ->
      """WITH u AS (
        |  SELECT event_type, user_id, COUNT(*) AS nu
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, COUNT(*) AS n_users,
        |  CAST(SUM(nu) AS BIGINT) AS n_total,
        |  ROUND(CAST(SUM(nu * nu) AS DOUBLE) /
        |        (SUM(nu) * SUM(nu)), 6) AS hhi,
        |  ROUND(CAST(SUM(nu) AS DOUBLE) * SUM(nu) / SUM(nu * nu), 2)
        |    AS effective_users
        |FROM u GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    // same per-user reduction in SQL; identical d < n_risk guard and
    // round-6 decimal ln-sum discipline
    "agg_survival_km" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view'
        |        THEN CAST(ts AS DATE) END) AS first_view,
        |    MIN(CASE WHEN event_type = 'purchase'
        |        THEN CAST(ts AS DATE) END) AS first_purchase
        |  FROM events GROUP BY user_id
        |), km AS (
        |  SELECT CASE WHEN first_purchase IS NOT NULL
        |              AND first_purchase >= first_view
        |         THEN datediff('day', first_view, first_purchase)
        |         ELSE datediff('day', first_view,
        |           (SELECT MAX(CAST(ts AS DATE)) FROM events)) END
        |      AS lifetime,
        |    CAST(first_purchase IS NOT NULL
        |         AND first_purchase >= first_view AS INTEGER) AS converted
        |  FROM pu WHERE first_view IS NOT NULL
        |), days AS (
        |  SELECT lifetime AS t, CAST(SUM(converted) AS BIGINT) AS d
        |  FROM km GROUP BY lifetime HAVING SUM(converted) > 0
        |), risk AS (
        |  SELECT days.t, days.d,
        |    (SELECT COUNT(*) FROM km k WHERE k.lifetime >= days.t)
        |      AS n_risk
        |  FROM days
        |), terms AS (
        |  SELECT t, d, n_risk,
        |    CAST(ROUND(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 6)
        |      AS DECIMAL(18,6)) AS lnterm
        |  FROM risk WHERE d < n_risk
        |)
        |SELECT t, d, CAST(n_risk AS BIGINT) AS n_risk,
        |  ROUND(exp(CAST(SUM(lnterm) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE)), 4) AS survival
        |FROM terms ORDER BY t""".stripMargin,
    // integer cross-multiplied ACF; SUMs pass through BIGINT casts
    "agg_autocorrelation" ->
      """WITH dc AS (
        |  SELECT ROW_NUMBER() OVER (ORDER BY day) AS t, x FROM (
        |    SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x
        |    FROM events GROUP BY 1)
        |), tot AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx FROM dc
        |), den AS (
        |  SELECT CAST(SUM((n * x - sx) * (n * x - sx)) AS BIGINT) AS den
        |  FROM dc, tot
        |), num AS (
        |  SELECT k.k, COUNT(*) AS n_pairs,
        |    CAST(SUM((n * a.x - sx) * (n * b.x - sx)) AS BIGINT) AS num
        |  FROM dc a CROSS JOIN (SELECT unnest(range(1, 8)) AS k) k
        |  JOIN dc b ON b.t = a.t + k.k
        |  CROSS JOIN tot
        |  GROUP BY k.k
        |)
        |SELECT k, n_pairs, ROUND(CAST(num AS DOUBLE) / den, 6) AS acf
        |FROM num, den WHERE den > 0 ORDER BY k""".stripMargin,
    "agg_rare_collapse" ->
      """WITH s AS (
        |  SELECT user_id, COUNT(*) AS n_user FROM events GROUP BY 1
        |)
        |SELECT CASE WHEN s.n_user >= 70 THEN CAST(e.user_id AS VARCHAR)
        |            ELSE 'other' END AS category,
        |  COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,4))), 2) AS DOUBLE)
        |    AS sum_value
        |FROM events e JOIN s ON e.user_id = s.user_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // identical formula text over identical exact decimal moments —
    // same IEEE sequence in both engines
    "agg_t_test" ->
      """WITH base AS (
        |  SELECT CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is1,
        |    CAST(value AS DECIMAL(18,4)) AS vq
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |), m AS (
        |  SELECT CAST(SUM(is1) AS BIGINT) AS n1,
        |    CAST(COUNT(*) - SUM(is1) AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN is1 = 1 THEN vq
        |             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS sx1,
        |    CAST(SUM(CASE WHEN is1 = 0 THEN vq
        |             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS sx2,
        |    CAST(SUM(CASE WHEN is1 = 1 THEN vq * vq
        |             ELSE CAST(0 AS DECIMAL(37,8)) END) AS DOUBLE) AS sxx1,
        |    CAST(SUM(CASE WHEN is1 = 0 THEN vq * vq
        |             ELSE CAST(0 AS DECIMAL(37,8)) END) AS DOUBLE) AS sxx2
        |  FROM base
        |)
        |SELECT n1, n2,
        |  ROUND(sx1 / n1, 4) AS mean1,
        |  ROUND(sx2 / n2, 4) AS mean2,
        |  ROUND((sx1 / n1 - sx2 / n2) /
        |    sqrt(((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1 +
        |         ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2), 6) AS t_stat,
        |  ROUND((((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1 +
        |         ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2) *
        |        (((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1 +
        |         ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2) /
        |        ((((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1) *
        |         (((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1) / (n1 - 1) +
        |         (((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2) *
        |         (((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2) / (n2 - 1)),
        |    3) AS df_welch
        |FROM m""".stripMargin,
    // bucket counts are exact ints (quantile_disc edges are data
    // values, compared on identical doubles); smoothing +1/+10 keeps
    // ln() finite on empty buckets
    "profile_drift_psi" ->
      """WITH ev AS (
        |  SELECT day(ts) AS dom, value AS v FROM events
        |), ed AS (
        |  SELECT quantile_disc(v, [0.1, 0.2, 0.3, 0.4, 0.5,
        |                           0.6, 0.7, 0.8, 0.9]) AS edges
        |  FROM ev WHERE dom <= 15
        |), bk AS (
        |  SELECT dom, CAST(1 + list_sum(list_transform(edges,
        |    e -> CASE WHEN v > e THEN 1 ELSE 0 END)) AS INTEGER) AS bucket
        |  FROM ev CROSS JOIN ed
        |), c AS (
        |  SELECT bucket,
        |    CAST(SUM(CASE WHEN dom <= 15 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN dom > 15 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b
        |  FROM bk GROUP BY bucket
        |), tc AS (
        |  SELECT bucket, n_a, n_b,
        |    CAST(SUM(n_a) OVER () AS BIGINT) AS tot_a,
        |    CAST(SUM(n_b) OVER () AS BIGINT) AS tot_b
        |  FROM c
        |)
        |SELECT bucket, n_a, n_b,
        |  ROUND(((n_a + 1.0) / (tot_a + 10.0) -
        |         (n_b + 1.0) / (tot_b + 10.0)) *
        |        ln(((n_a + 1.0) / (tot_a + 10.0)) /
        |           ((n_b + 1.0) / (tot_b + 10.0))), 6) AS psi_c
        |FROM tc ORDER BY bucket""".stripMargin,
    // cross-multiplied integer KS statistic over the identical merged
    // (v, event_id) order; window SUM -> HUGEINT needs the BIGINT cast
    // decimal outcome masses per (stratum, arm); identical closing
    // mean/diff divisions; bit-length strata via length(bin(n))
    "agg_stratified_effect" ->
      """WITH u AS (
        |  SELECT user_id, COUNT(*) AS n_ev,
        |    SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,4))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS y
        |  FROM events GROUP BY 1
        |), p AS (
        |  SELECT length(bin(n_ev)) AS stratum,
        |    CAST(('0x' || substring(md5('exp1|' ||
        |      CAST(user_id AS VARCHAR)), 1, 6)) AS BIGINT) % 2 AS arm,
        |    CAST(y AS DECIMAL(18,4)) AS y
        |  FROM u
        |), g AS (
        |  SELECT stratum,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_t,
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_c,
        |    SUM(CASE WHEN arm = 1 THEN y
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS y_t,
        |    SUM(CASE WHEN arm = 0 THEN y
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS y_c
        |  FROM p GROUP BY 1
        |)
        |SELECT stratum, n_t, n_c,
        |  ROUND(CAST(y_t AS DOUBLE) / n_t, 4) AS mean_t,
        |  ROUND(CAST(y_c AS DOUBLE) / n_c, 4) AS mean_c,
        |  ROUND(CAST(y_t AS DOUBLE) / n_t -
        |    CAST(y_c AS DOUBLE) / n_c, 6) AS diff
        |FROM g WHERE n_t > 0 AND n_c > 0
        |ORDER BY stratum""".stripMargin,
    // exact integer group moments; per-group round@8 decimal A-sum;
    // SSB/SSW/F in one identical closing double expression
    "agg_anova_f" ->
      """WITH g AS (
        |  SELECT l_returnflag AS grp, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s_g,
        |    CAST(SUM(CAST(l_quantity AS BIGINT) *
        |      CAST(l_quantity AS BIGINT)) AS BIGINT) AS ss_g
        |  FROM lineitem GROUP BY 1
        |), a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(n_g) AS BIGINT) AS n,
        |    CAST(SUM(s_g) AS BIGINT) AS s,
        |    CAST(SUM(ss_g) AS BIGINT) AS ss,
        |    SUM(CAST(ROUND(CAST(s_g AS DOUBLE) * s_g / n_g, 8)
        |      AS DECIMAL(28,8))) AS a
        |  FROM g
        |)
        |SELECT k, n, s, ss,
        |  ROUND(((CAST(a AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
        |     / (k - 1)) /
        |    ((ss - CAST(a AS DOUBLE)) / (n - k)), 6) AS f_stat
        |FROM a""".stripMargin,
    // doubled-rank identity: integer (c1, c2, t, cb) per distinct value,
    // 2U1 = Sum c1*(2cb+t+1) - n1(n1+1); one closing double z
    "agg_mann_whitney" ->
      """WITH perv AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS q,
        |    CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c2
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1
        |), m AS (
        |  SELECT q, c1, c2, c1 + c2 AS t,
        |    COALESCE(CAST(SUM(c1 + c2) OVER (ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS cb
        |  FROM perv
        |), a AS (
        |  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2,
        |    CAST(SUM(c1 * (2 * cb + t + 1)) AS BIGINT) AS r1d,
        |    CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
        |  FROM m
        |), u AS (
        |  SELECT n1, n2, r1d - n1 * (n1 + 1) AS u1_doubled, tie_term
        |  FROM a
        |)
        |SELECT n1, n2, u1_doubled, tie_term,
        |  ROUND((u1_doubled - CAST(n1 AS DOUBLE) * n2) /
        |    (2 * SQRT((CAST(n1 AS DOUBLE) * n2 / 12) *
        |      ((n1 + n2 + 1) - CAST(tie_term AS DOUBLE) /
        |       (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))), 6) AS z
        |FROM u""".stripMargin,
    "agg_ks_test" ->
      """WITH base AS (
        |  SELECT event_id, CAST(value AS DECIMAL(19,4)) AS v,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is1
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |), tot AS (
        |  SELECT CAST(SUM(is1) AS BIGINT) AS n1,
        |    CAST(COUNT(*) - SUM(is1) AS BIGINT) AS n2
        |  FROM base
        |), c AS (
        |  SELECT v, SUM(is1) OVER w AS cum1, SUM(1 - is1) OVER w AS cum2
        |  FROM base
        |  WINDOW w AS (ORDER BY v, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), cv AS (
        |  SELECT v, MAX(cum1) AS cum1, MAX(cum2) AS cum2
        |  FROM c GROUP BY v
        |)
        |SELECT n1, n2,
        |  CAST(MAX(ABS(n2 * cum1 - n1 * cum2)) AS BIGINT) AS d_scaled,
        |  ROUND(CAST(MAX(ABS(n2 * cum1 - n1 * cum2)) AS DOUBLE) /
        |        (n1 * n2), 6) AS ks_d
        |FROM cv, tot GROUP BY n1, n2""".stripMargin,
    // Spark dayofweek = DuckDB dayofweek+1 (agg_seasonality precedent);
    // cross-multiplied χ² identity from exact BIGINT marginals, per-cell
    // round-6 → DECIMAL sum for order independence
    // integer (x, X, n) per type; round-8 decimal terms, one division
    "agg_theil_index" ->
      """WITH u AS (
        |  SELECT event_type, user_id, COUNT(*) AS x
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, user_id, x,
        |    CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS xx,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM u
        |)
        |SELECT event_type,
        |  CAST(MAX(n) AS BIGINT) AS n_users,
        |  CAST(MAX(xx) AS BIGINT) AS n_events,
        |  ROUND(CAST(SUM(CAST(ROUND((CAST(x AS DOUBLE) * n / xx) *
        |      ln(CAST(x AS DOUBLE) * n / xx), 8) AS DECIMAL(20,8)))
        |    AS DOUBLE) / MAX(n), 6) AS theil
        |FROM m GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,
    // chi2 machinery + the min(r-1,c-1) normalizer; final sqrt is the
    // only extra float op
    "agg_cramers_v" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |), rt AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS r
        |  FROM cells GROUP BY 1
        |), ct AS (
        |  SELECT dow, CAST(SUM(n) AS BIGINT) AS c FROM cells GROUP BY 1
        |), tt AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells),
        |dm AS (
        |  SELECT LEAST(COUNT(DISTINCT event_type) - 1,
        |               COUNT(DISTINCT dow) - 1) AS mindim FROM cells
        |), terms AS (
        |  SELECT nn, CAST(ROUND(
        |    CAST(nn * n - r * c AS DOUBLE) *
        |    CAST(nn * n - r * c AS DOUBLE) /
        |    (CAST(nn AS DOUBLE) * r * c), 6) AS DECIMAL(20,6)) AS term
        |  FROM cells JOIN rt USING (event_type) JOIN ct USING (dow)
        |  CROSS JOIN tt
        |)
        |SELECT nn AS n_total, CAST(mindim AS BIGINT) AS mindim,
        |  ROUND(CAST(SUM(term) AS DOUBLE), 4) AS chi2,
        |  ROUND(sqrt(CAST(SUM(term) AS DOUBLE) / (nn * mindim)), 6)
        |    AS cramers_v
        |FROM terms CROSS JOIN dm GROUP BY nn, mindim""".stripMargin,
    // same contingency cells and dow offset as chi2; per-term round-8
    // decimal before the sum (log2 terms are irrational)
    "agg_mutual_information" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |), rt AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS r
        |  FROM cells GROUP BY 1
        |), ct AS (
        |  SELECT dow, CAST(SUM(n) AS BIGINT) AS c FROM cells GROUP BY 1
        |), tt AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells),
        |terms AS (
        |  SELECT n, CAST(ROUND((CAST(n AS DOUBLE) / nn) *
        |      log2(CAST(nn AS DOUBLE) * n / (CAST(r AS DOUBLE) * c)), 8)
        |    AS DECIMAL(20,8)) AS term
        |  FROM cells JOIN rt USING (event_type) JOIN ct USING (dow)
        |  CROSS JOIN tt
        |)
        |SELECT COUNT(*) AS n_cells,
        |  CAST(SUM(n) AS BIGINT) AS n_total,
        |  ROUND(CAST(SUM(term) AS DOUBLE), 6) AS mi_bits
        |FROM terms""".stripMargin,
    "agg_chi2_independence" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |), rt AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS r
        |  FROM cells GROUP BY 1
        |), ct AS (
        |  SELECT dow, CAST(SUM(n) AS BIGINT) AS c FROM cells GROUP BY 1
        |), tt AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells),
        |terms AS (
        |  SELECT CAST(ROUND(
        |    CAST(nn * n - r * c AS DOUBLE) *
        |    CAST(nn * n - r * c AS DOUBLE) /
        |    (CAST(nn AS DOUBLE) * r * c), 6) AS DECIMAL(20,6)) AS term
        |  FROM cells JOIN rt USING (event_type) JOIN ct USING (dow)
        |  CROSS JOIN tt
        |)
        |SELECT COUNT(*) AS n_cells,
        |  (SELECT (COUNT(DISTINCT event_type) - 1) *
        |          (COUNT(DISTINCT dow) - 1) FROM cells) AS dof,
        |  ROUND(CAST(SUM(term) AS DOUBLE), 4) AS chi2
        |FROM terms""".stripMargin,
    // exact at gate scale: rank error n/1e6 < 1, and Spark's GK rank
    // ceil(p·n) coincides with quantile_disc's discrete convention
    "agg_quantile_approx" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  ROUND(quantile_disc(o_totalprice, 0.5), 2) AS p50,
        |  ROUND(quantile_disc(o_totalprice, 0.9), 2) AS p90,
        |  ROUND(quantile_disc(o_totalprice, 0.99), 2) AS p99
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_gini" ->
      """WITH x AS (
        |  SELECT event_type, user_id, COUNT(*) AS x
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT event_type, x,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |                       ORDER BY x, user_id) AS r
        |  FROM x
        |)
        |SELECT event_type, COUNT(*) AS n_users,
        |  CAST(SUM(x) AS BIGINT) AS total,
        |  ROUND(CAST(2 * SUM(r * x) - (COUNT(*) + 1) * SUM(x) AS DOUBLE) /
        |        CAST(COUNT(*) * SUM(x) AS DOUBLE), 6) AS gini
        |FROM r GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,
    "agg_entropy" ->
      """WITH ct AS (
        |  SELECT user_id, event_type, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2
        |), t AS (
        |  SELECT user_id,
        |    CAST(ROUND(c * ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(20,6))
        |      AS clnc,
        |    c
        |  FROM ct
        |)
        |SELECT user_id, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_types,
        |  ROUND(ln(CAST(SUM(c) AS DOUBLE)) -
        |        CAST(SUM(clnc) AS DOUBLE) / SUM(c), 4) AS entropy
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,
    "anomaly_zscore" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CAST(value AS DECIMAL(19,4)) AS vq
        |  FROM events
        |), stats AS (
        |  SELECT event_type, COUNT(*) AS n, SUM(vq) AS sx,
        |    SUM(vq * vq) AS sxx
        |  FROM ev GROUP BY event_type
        |), z AS (
        |  SELECT ev.event_id, ev.event_type,
        |    CAST(ev.vq AS DOUBLE) AS value_q,
        |    (CAST(ev.vq AS DOUBLE) - CAST(sx AS DOUBLE) / n) /
        |      sqrt((CAST(sxx AS DOUBLE) -
        |            CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) /
        |           (n - 1)) AS zv,
        |    sqrt((CAST(sxx AS DOUBLE) -
        |          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) /
        |         (n - 1)) AS sd
        |  FROM ev JOIN stats USING (event_type)
        |  WHERE n > 1
        |)
        |SELECT event_id, event_type, value_q, ROUND(zv, 3) AS z
        |FROM z WHERE sd > 0 AND abs(zv) > 2.5
        |ORDER BY event_id""".stripMargin,
    "agg_bitmap_distinct" ->
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS n_distinct_users
        |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,
    "agg_funnel" ->
      """WITH g AS (
        |  SELECT user_id,
        |    list_sort(list(epoch_us(ts)) FILTER (WHERE event_type = 'view'))
        |      AS va,
        |    list_sort(list(epoch_us(ts)) FILTER (WHERE event_type = 'click'))
        |      AS ca,
        |    list_sort(list(epoch_us(ts)) FILTER (WHERE event_type = 'purchase'))
        |      AS pa
        |  FROM events GROUP BY user_id),
        |s1 AS (SELECT user_id, va[1] AS t1, ca, pa FROM g),
        |s2 AS (SELECT user_id, t1,
        |         list_filter(ca, x -> x >= t1)[1] AS t2, pa FROM s1),
        |s3 AS (SELECT user_id, t1, t2,
        |         list_filter(pa, x -> x >= t2)[1] AS t3 FROM s2)
        |SELECT user_id, t1, t2, t3,
        |  CASE WHEN t3 IS NOT NULL THEN 3
        |       WHEN t2 IS NOT NULL THEN 2
        |       WHEN t1 IS NOT NULL THEN 1
        |       ELSE 0 END AS reached
        |FROM s3 ORDER BY user_id""".stripMargin,
    "agg_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |anchors AS (
        |  SELECT user_id, MIN(day) AS cohort FROM days GROUP BY user_id),
        |flags AS (
        |  SELECT d.user_id, a.cohort,
        |    MAX(CASE WHEN d.day = a.cohort + INTERVAL 1 DAY
        |             THEN 1 ELSE 0 END) AS d1,
        |    MAX(CASE WHEN d.day = a.cohort + INTERVAL 7 DAY
        |             THEN 1 ELSE 0 END) AS d7
        |  FROM days d JOIN anchors a USING (user_id)
        |  GROUP BY d.user_id, a.cohort)
        |SELECT cohort, COUNT(*) AS n_users,
        |  CAST(SUM(d1) AS BIGINT) AS n_day1,
        |  CAST(SUM(d7) AS BIGINT) AS n_day7
        |FROM flags GROUP BY cohort ORDER BY cohort""".stripMargin,
    "agg_sequence_match" ->
      """WITH s AS (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), ''
        |      ORDER BY epoch_us(ts), event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, seq,
        |  regexp_matches(seq, 'v.*c.*p') AS funnel_matched,
        |  CAST((length(seq) - length(replace(seq, 'vc', ''))) / 2
        |    AS BIGINT) AS n_view_click
        |FROM s ORDER BY user_id""".stripMargin,
    "agg_mode" ->
      """WITH freq AS (
        |  SELECT event_type, user_id, count(*) AS n
        |  FROM events GROUP BY event_type, user_id),
        |ranked AS (
        |  SELECT event_type, user_id, n,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY n DESC, user_id ASC) AS rn
        |  FROM freq)
        |SELECT event_type, user_id AS mode_user, n
        |FROM ranked WHERE rn = 1 ORDER BY event_type NULLS FIRST""".stripMargin,
    "agg_arg_extremes" ->
      """SELECT o_orderpriority,
        |  arg_max(o_orderkey, o_totalprice) AS top_order,
        |  arg_min(o_orderkey, o_totalprice) AS bottom_order,
        |  ROUND(MAX(o_totalprice), 2) AS top_price
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "agg_skew_salted" ->
      """SELECT event_type,
        |  CAST(ROUND(CAST(SUM(value) AS DECIMAL(19,4)), 2) AS DOUBLE)
        |    AS sum_value,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,
    "agg_string_concat" ->
      """SELECT c_nationkey,
        |  string_agg(CAST(c_custkey AS VARCHAR), ','
        |    ORDER BY c_custkey) AS ids,
        |  count(*) AS n
        |FROM customer GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "agg_filter_clause" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        |  ROUND(COALESCE(sum(o_totalprice)
        |    FILTER (WHERE o_orderstatus = 'F'), 0), 2) AS sum_f,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bool_or(o_orderstatus = 'P') AS any_pending
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "agg_bitwise" ->
      """SELECT o_orderpriority,
        |  bit_and(o_orderkey) AS ba,
        |  bit_or(o_orderkey) AS bo,
        |  bit_xor(o_orderkey) AS bx,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "agg_histogram" ->
      """SELECT CAST(LEAST(FLOOR(o_totalprice / 50000.0), 11) AS INTEGER)
        |    AS bucket,
        |  count(*) AS n,
        |  ROUND(MIN(o_totalprice), 2) AS lo,
        |  ROUND(MAX(o_totalprice), 2) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "agg_hash_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty,
        |       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       ROUND(AVG(l_quantity), 2) AS avg_qty,
        |       ROUND(AVG(l_discount), 4) AS avg_disc,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_multi_distinct" ->
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(DISTINCT l_suppkey) AS n_supps,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS cnt
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "agg_collect" ->
      """SELECT o_custkey,
        |       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
        |         AS statuses,
        |       COUNT(*) AS cnt
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "agg_stats" ->
      """SELECT l_returnflag,
        |  ROUND(stddev_samp(l_quantity), 2) AS sd_qty,
        |  ROUND(var_samp(l_quantity), 2) AS var_qty,
        |  ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  ROUND(covar_samp(l_quantity, l_discount), 4) AS cov_qd,
        |  ROUND(MIN(l_extendedprice), 2) AS min_price,
        |  ROUND(MAX(l_extendedprice), 2) AS max_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_regression" ->
      """WITH m AS (
        |  SELECT l_returnflag AS flag, COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(19,4))) AS sx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS sy,
        |    SUM(CAST(l_quantity AS DECIMAL(19,4)) *
        |        CAST(l_extendedprice AS DECIMAL(19,4))) AS sxy,
        |    SUM(CAST(l_quantity AS DECIMAL(19,4)) *
        |        CAST(l_quantity AS DECIMAL(19,4))) AS sxx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(19,4)) *
        |        CAST(l_extendedprice AS DECIMAL(19,4))) AS syy
        |  FROM lineitem GROUP BY l_returnflag),
        |e AS (
        |  SELECT flag, n,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dxx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS dyy,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        |  FROM m)
        |SELECT flag, n,
        |  ROUND(cov / dxx, 6) AS slope,
        |  ROUND((syd - cov / dxx * sxd) / CAST(n AS DOUBLE), 4) AS intercept,
        |  ROUND(cov * cov / (dxx * dyy), 6) AS r2
        |FROM e ORDER BY flag""".stripMargin,
    "agg_pivot" ->
      """SELECT l_returnflag,
        |  ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
        |  ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_percentile" ->
      """SELECT o_orderpriority,
        |  ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90,
        |  ROUND(quantile_cont(o_totalprice, 0.99), 2) AS p99
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_unpivot" ->
      """WITH w AS (
        |  SELECT o_orderpriority,
        |    ROUND(SUM(o_totalprice), 2) AS sum_price,
        |    ROUND(AVG(o_totalprice), 2) AS avg_price,
        |    CAST(COUNT(*) AS DOUBLE) AS cnt
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, metric, value FROM (
        |  SELECT o_orderpriority, 'sum_price' AS metric, sum_price AS value FROM w
        |  UNION ALL
        |  SELECT o_orderpriority, 'avg_price', avg_price FROM w
        |  UNION ALL
        |  SELECT o_orderpriority, 'cnt', cnt FROM w) u
        |ORDER BY o_orderpriority, metric""".stripMargin,
    "agg_typed_dataset" ->
      """SELECT l_returnflag,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(AVG(l_extendedprice), 2) AS avg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // Derived checks (round 6): sketch estimates have no DuckDB
    // equivalent; the oracle pins the exact-side quantities and the
    // estimator-contract booleans (see the *Check Scaladocs).
    "agg_approx_distinct_hll" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_hll_union" ->
      """SELECT * FROM (
        |  SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
        |    TRUE AS within_5pct, TRUE AS merge_consistent
        |  FROM lineitem GROUP BY l_returnflag
        |  UNION ALL
        |  SELECT 'ALL', COUNT(DISTINCT l_partkey), TRUE, TRUE
        |  FROM lineitem)
        |ORDER BY l_returnflag""".stripMargin,
    "agg_hll_intersection" ->
      """WITH va AS (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
        |pb AS (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |SELECT
        |  (SELECT COUNT(*) FROM va) AS exact_a,
        |  (SELECT COUNT(*) FROM pb) AS exact_b,
        |  (SELECT COUNT(DISTINCT user_id) FROM events
        |   WHERE event_type IN ('view', 'purchase')) AS exact_union,
        |  (SELECT COUNT(*) FROM va JOIN pb USING (user_id))
        |    AS exact_intersection,
        |  TRUE AS ie_within_bound""".stripMargin,
    "agg_count_min_sketch" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows,
        |  COUNT(*) FILTER (WHERE l_suppkey = 1) AS exact_s1,
        |  COUNT(*) FILTER (WHERE l_suppkey = 2) AS exact_s2,
        |  COUNT(*) FILTER (WHERE l_suppkey = 3) AS exact_s3,
        |  TRUE AS cms_bounds_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
