package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Window-function surface (SURVEY.md §2.2 "Window functions" — absent
  * from the reference; its only "window" is batch slicing, covered by
  * `chunk_batches`).
  *
  * Scale notes: every window here partitions by a key
  * (`o_custkey`/`l_orderkey`/`o_orderpriority`) — one shuffle on the
  * partition key, then a per-partition sort; no single-partition global
  * windows (those serialize the whole table through one task). Final
  * `orderBy` for oracle determinism is a range-partitioned sort.
  */
object Windows {

  /** row_number / rank / dense_rank / ntile per customer by price. */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val byPriceTies = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc)
    t(s, d, "orders")
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        row_number().over(byPrice).as("rn"),
        rank().over(byPriceTies).as("rk"),
        dense_rank().over(byPriceTies).as("drk"),
        ntile(4).over(byPrice).as("nt"))
      .orderBy(col("o_orderkey"))
  }

  /** COUNT(DISTINCT) over a window — Spark rejects distinct aggregates
    * in window frames, so the engine rewrite is the dense_rank maximum:
    * `max(dense_rank() over (part, order by v)) over (part)` equals the
    * distinct count of v per partition. Two window functions over the
    * SAME partitioning = one shuffle, two in-partition passes — still
    * cheaper than the self-join a naive rewrite would do. */
  def windowCountDistinct(s: SparkSession, d: String): DataFrame = {
    val byPrio = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderpriority"))
    val whole = Window.partitionBy(col("o_custkey"))
    t(s, d, "orders")
      .withColumn("dr", dense_rank().over(byPrio))
      .withColumn("n_distinct_prio", max(col("dr")).over(whole).cast("long"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        col("n_distinct_prio"))
      .orderBy(col("o_orderkey"))
  }

  /** lag / lead / first_value / last_value per customer order history. */
  def windowAnalytic(s: SparkSession, d: String): DataFrame = {
    val hist = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val full = hist.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "orders")
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        lag(col("o_totalprice"), 1).over(hist).as("prev_price"),
        lead(col("o_totalprice"), 1).over(hist).as("next_price"),
        first(col("o_orderkey")).over(hist).as("first_ok"),
        last(col("o_orderkey")).over(full).as("last_ok"))
      .orderBy(col("o_orderkey"))
  }

  /** Running sum: rowsBetween(unboundedPreceding, currentRow).
    * lineitem has no unique key (duplicate (l_orderkey, l_linenumber)
    * pairs exist in the synthetic data), so pre-aggregate to that grain
    * first — the running frame is then fully deterministic.
    */
  def windowFrameRunning(s: SparkSession, d: String): DataFrame = {
    val run = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "lineitem")
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"))
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("qty"),
        round(sum(col("qty")).over(run), 2).as("running_qty"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** RANGE frame over a numeric ordering column (peer-inclusive):
    * trailing 10000-wide price band per priority, count + max. Like
    * [[windowRangeInterval]], NOT a sliding RANGE frame (no retraction
    * in Spark — O(rows × frame) rescans): because the band width
    * equals the bucket width, the frame [p−10000, p] spans exactly two
    * price buckets (b = ⌊p/10000⌋ and b−1) with no mid buckets, so
    * both aggregates decompose into a cumulative within the row's own
    * bucket plus an as-of lookup into bucket b−1 (reverse-cumulative
    * count/max, probes union'd at k = p−10000 and resolved by
    * `last_value(…, true)` over a growing DESC frame). Boundary
    * exactness: the cutoff double p−10000.0 is the same IEEE value the
    * naive frame compares against (the DuckDB oracle keeps the naive
    * spec), rounding cannot push it past a representable bucket edge
    * in either direction, and equal-key builds sort before probes so
    * the ≥-inclusive bound holds. Only order-insensitive aggregates
    * (count/max), so results are exact regardless of evaluation
    * order. */
  def windowRangeFrame(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("graft_ord_rf")
    s.sql(
      """WITH e AS (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice,
        |    CAST(FLOOR(o_totalprice / 10000.0) AS BIGINT) AS b
        |  FROM graft_ord_rf
        |), cum AS (
        |  SELECT o_orderkey, o_orderpriority, b,
        |    COUNT(*) OVER (PARTITION BY o_orderpriority, b
        |      ORDER BY o_totalprice
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt_new,
        |    MAX(o_totalprice) OVER (PARTITION BY o_orderpriority, b
        |      ORDER BY o_totalprice
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS max_new
        |  FROM e
        |), rev AS (
        |  SELECT o_orderpriority, b AS gb, o_totalprice AS k, 0 AS is_probe,
        |    COUNT(*) OVER (PARTITION BY o_orderpriority, b
        |      ORDER BY o_totalprice DESC
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revcnt,
        |    MAX(o_totalprice) OVER (PARTITION BY o_orderpriority, b
        |      ORDER BY o_totalprice DESC
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revmax,
        |    CAST(NULL AS BIGINT) AS probe_id
        |  FROM e
        |), probes AS (
        |  SELECT o_orderpriority, b - 1 AS gb, o_totalprice - 10000.0 AS k,
        |    1 AS is_probe, CAST(NULL AS BIGINT) AS revcnt,
        |    CAST(NULL AS DOUBLE) AS revmax, o_orderkey AS probe_id
        |  FROM e
        |), oldp AS (
        |  SELECT probe_id, old_cnt, old_max FROM (
        |    SELECT probe_id, is_probe,
        |      last_value(revcnt, true) OVER w AS old_cnt,
        |      last_value(revmax, true) OVER w AS old_max
        |    FROM (SELECT * FROM rev UNION ALL SELECT * FROM probes)
        |    WINDOW w AS (PARTITION BY o_orderpriority, gb
        |      ORDER BY k DESC, is_probe ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |  WHERE is_probe = 1
        |)
        |SELECT cum.o_orderkey, cum.o_orderpriority,
        |  cnt_new + coalesce(old_cnt, 0L) AS cnt_band,
        |  greatest(max_new, old_max) AS max_band
        |FROM cum LEFT JOIN oldp ON oldp.probe_id = cum.o_orderkey
        |ORDER BY cum.o_orderkey""".stripMargin)
  }

  /** Trailing 1-hour count + max per event (sliding event-time window
    * per key, expressed relationally — the batch analogue of the
    * streaming sliding window). NOT a sliding RANGE frame: Spark
    * evaluates those without retraction — O(rows × frame) rescans per
    * partition, quadratic in per-user density (the round-6 scale
    * finding). Every window here is a GROWING frame (unbounded-
    * preceding lower bound), which Spark's
    * UnboundedPrecedingWindowFunctionFrame evaluates incrementally:
    *
    *  - cnt_1h = c1 − c2: rows up to now minus rows strictly before
    *    the cutoff (upper bound `3600000001 µs PRECEDING` — exact at
    *    the fixture's micro-aligned timestamps).
    *  - max_1h decomposes over 10-minute buckets (1 h = exactly 6):
    *    a cumulative max inside the event's own bucket, a fanned-out
    *    max over the 5 fully-covered mid buckets (each bucket row
    *    contributes to ≤5 target buckets — bounded fan-out, one
    *    groupBy), and the partial old bucket b−6 answered by an as-of
    *    lookup: reverse-cumulative max per bucket, probes union'd in
    *    and sorted DESC so `last_value(…, true)` over a growing ROWS
    *    frame picks the first build row at/after the cutoff.
    *
    * All per-row results are identical to the direct RANGE-frame
    * formulation (the DuckDB oracle still uses it); only the plan
    * changed — O(n) work, shuffles on (user) and (user, bucket). */
  def windowRangeInterval(s: SparkSession, d: String): DataFrame = {
    t(s, d, "events").createOrReplaceTempView("graft_ev_ri")
    s.sql(
      """WITH e AS (
        |  SELECT event_id, user_id, value, unix_micros(ts) AS us,
        |    CAST(FLOOR(unix_micros(ts) / 600000000) AS BIGINT) AS b
        |  FROM graft_ev_ri
        |), cum AS (
        |  SELECT event_id, user_id, us, b,
        |    COUNT(*) OVER (PARTITION BY user_id ORDER BY us
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
        |    COUNT(*) OVER (PARTITION BY user_id ORDER BY us
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 3600000001 PRECEDING)
        |      AS c2,
        |    MAX(value) OVER (PARTITION BY user_id, b ORDER BY us
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS max_new
        |  FROM e
        |), bm AS (
        |  SELECT user_id, b, MAX(value) AS bmax FROM e GROUP BY 1, 2
        |), mids AS (
        |  SELECT user_id, tb, MAX(bmax) AS mid_max
        |  FROM (SELECT user_id, explode(sequence(b + 1, b + 5)) AS tb, bmax
        |        FROM bm)
        |  GROUP BY 1, 2
        |), rev AS (
        |  SELECT user_id, b AS gb, us AS k, 0 AS is_probe,
        |    MAX(value) OVER (PARTITION BY user_id, b ORDER BY us DESC
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revmax,
        |    CAST(NULL AS BIGINT) AS probe_id
        |  FROM e
        |), probes AS (
        |  SELECT user_id, b - 6 AS gb, us - 3600000000 AS k, 1 AS is_probe,
        |    CAST(NULL AS DOUBLE) AS revmax, event_id AS probe_id
        |  FROM e
        |), oldp AS (
        |  SELECT probe_id, max_old FROM (
        |    SELECT probe_id, is_probe,
        |      last_value(revmax, true) OVER (PARTITION BY user_id, gb
        |        ORDER BY k DESC, is_probe ASC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS max_old
        |    FROM (SELECT * FROM rev UNION ALL SELECT * FROM probes))
        |  WHERE is_probe = 1
        |)
        |SELECT cum.event_id,
        |  c1 - c2 AS cnt_1h,
        |  ROUND(greatest(max_new, mid_max, max_old), 2) AS max_1h
        |FROM cum
        |LEFT JOIN mids ON mids.user_id = cum.user_id AND mids.tb = cum.b
        |LEFT JOIN oldp ON oldp.probe_id = cum.event_id
        |ORDER BY event_id""".stripMargin)
  }

  /** Rolling z-score anomaly detection — each event scored against its
    * user's TRAILING 7-day window (the event-time analogue of
    * anomaly_zscore's global baseline; this is the production shape:
    * baselines drift, so the reference distribution must slide).
    * Moments come from exact DECIMAL sums; the float math after the
    * casts is the identical IEEE sequence in both engines. Degenerate
    * frames (n = 1 or constant) are filtered identically on both
    * sides — the window_mad_outlier lesson. The z emits as integer
    * milli-z (fixed-point rule): a float ROUND as a column's last op
    * leaks signed zero (DuckDB keeps -0.0, Spark normalizes to +0.0 —
    * one bit, hash-red in round 5); BIGINT has one zero.
    *
    * Plan (round 6): Spark evaluates a sliding RANGE frame without
    * retraction — O(rows × frame) per partition, ~70 events per 7-day
    * frame here and worse at production density. Sums are subtractable,
    * so the frame decomposes into two GROWING frames, each incremental
    * O(1)/row: frame_sum(ts) = cum(≤ ts) − cum(< ts − 7d). The first
    * term is a RANGE-unbounded cumulative; the second is an as-of
    * lookup done relationally — union a probe row at t = ts − 7d (kind
    * 0 sorts before builds at equal t, making the boundary strict) and
    * take last_value(ignoreNulls) of the build cums. The decimal
    * arithmetic is exact, so cum-difference ≡ frame-sum bit-for-bit;
    * the ORACLE keeps the naive RANGE-frame spec and the gate proves
    * the rewrite. Both windows hash-partition on user_id (one exchange,
    * reused across the union's branches). */
  def windowZscoreRolling(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = t(s, d, "events").select(
      col("event_id"), col("user_id"), col("ts"),
      col("value").cast("decimal(19,4)").as("vq"))
    val wcum = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val c = q
      .withColumn("cn", count(lit(1)).over(wcum))
      .withColumn("csx", sum(col("vq")).over(wcum))
      .withColumn("csxx", sum(col("vq") * col("vq")).over(wcum))
    val build = c.select(col("user_id"), col("ts").as("t"),
      lit(1).as("kind"), col("cn").as("b_cn"), col("csx").as("b_csx"),
      col("csxx").as("b_csxx"))
    val probe = c.select(col("user_id"),
      (col("ts") - expr("INTERVAL 7 DAYS")).as("t"), lit(0).as("kind"),
      col("event_id"), col("vq"), col("cn"), col("csx"), col("csxx"))
    val wl = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val f = build.unionByName(probe, allowMissingColumns = true)
      .withColumn("p_cn", last(col("b_cn"), ignoreNulls = true).over(wl))
      .withColumn("p_csx", last(col("b_csx"), ignoreNulls = true).over(wl))
      .withColumn("p_csxx", last(col("b_csxx"), ignoreNulls = true).over(wl))
      .filter(col("kind") === 0)
      .select(col("event_id"), col("user_id"),
        (col("cn") - coalesce(col("p_cn"), lit(0L))).as("n"),
        (col("csx") - coalesce(col("p_csx"), lit(0)))
          .cast("double").as("sx"),
        (col("csxx") - coalesce(col("p_csxx"), lit(0)))
          .cast("double").as("sxx"),
        col("vq").cast("double").as("v"))
    f.filter(col("n") > 1 &&
        (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1) > 0)
      .select(col("event_id"), col("user_id"), col("v").as("value_q"),
        round(((col("v") - col("sx") / col("n")) /
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
            (col("n") - 1))) * 1000, 0).cast("long").as("z_milli"))
      .orderBy(col("event_id"))
  }

  /** Trailing-7-day rolling MEDIAN per user — the robust companion to
    * [[windowZscoreRolling]]'s moment-based baseline (medians shrug off
    * the outliers that wreck a rolling mean). Anchored at the
    * (user, calendar-day) grain — the [[windowRsi]] precedent: a
    * per-event sliding RANGE frame would rescan O(frame) rows per
    * event (a rank statistic has no cumulative-frame rewrite — round-6
    * scale finding), while the day grain makes the whole query one
    * bounded fan-out: each event contributes to exactly the 7 trailing
    * day-groups that can see it (explode of a 7-date sequence), one
    * shuffle on (user, day), no window frame at all. Emitted days are
    * only those where the user actually has events (semi-join back to
    * the observed day set). The day-multiset median is rank-exact:
    * approx_percentile at accuracy 1e6 degenerates to the exact order
    * statistic (the agg_quantile_approx precedent, = DuckDB
    * quantile_disc), and the DECIMAL data value passes through
    * untouched — no float synthesis, so engines agree bit-for-bit. */
  def windowRollingMedian(s: SparkSession, d: String): DataFrame = {
    t(s, d, "events").createOrReplaceTempView("graft_ev_rm")
    s.sql(
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(value AS DECIMAL(19,4)) AS vq
        |  FROM graft_ev_rm
        |), fan AS (
        |  SELECT user_id, explode(sequence(day, date_add(day, 6))) AS tday,
        |    vq
        |  FROM e
        |), agg AS (
        |  SELECT user_id, tday, COUNT(*) AS n7,
        |    CAST(approx_percentile(vq, 0.5D, 1000000) AS DOUBLE) AS med7
        |  FROM fan GROUP BY 1, 2
        |)
        |SELECT agg.user_id AS user_id, agg.tday AS day, n7, med7
        |FROM agg
        |JOIN (SELECT DISTINCT user_id, day FROM e) days
        |  ON agg.user_id = days.user_id AND agg.tday = days.day
        |ORDER BY agg.user_id, agg.tday""".stripMargin)
  }

  /** 14-day RSI per event type over the daily value series — the
    * momentum oscillator, kept engine-exact by computing gain/loss
    * MASSES as trailing DECIMAL sums (no Wilder smoothing recursion —
    * documented simple-average variant) and rewriting
    * 100 − 100/(1 + G/L) as 100·G/(G+L): one float division from
    * decimal-exact operands. Full 14-row frames only. */
  def windowRsi(s: SparkSession, d: String): DataFrame = {
    t(s, d, "events").createOrReplaceTempView("graft_ev_rsi")
    s.sql(
      """SELECT event_type, day, n14,
        |  ROUND(100.0 * CAST(sg AS DOUBLE) /
        |        CAST(sg + sl AS DOUBLE), 4) AS rsi
        |FROM (
        |  SELECT event_type, day,
        |    COUNT(*) OVER w AS n14,
        |    SUM(CASE WHEN chg > 0 THEN chg
        |        ELSE CAST(0 AS DECIMAL(19,4)) END) OVER w AS sg,
        |    SUM(CASE WHEN chg < 0 THEN -chg
        |        ELSE CAST(0 AS DECIMAL(19,4)) END) OVER w AS sl
        |  FROM (
        |    SELECT event_type, day,
        |      dv - lag(dv) OVER (PARTITION BY event_type ORDER BY day)
        |        AS chg
        |    FROM (SELECT event_type, CAST(ts AS DATE) AS day,
        |            CAST(SUM(CAST(value AS DECIMAL(19,4)))
        |              AS DECIMAL(18,4)) AS dv
        |          FROM graft_ev_rsi GROUP BY 1, 2)
        |  ) WHERE chg IS NOT NULL
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |) WHERE n14 = 14 AND sg + sl > 0
        |ORDER BY event_type NULLS FIRST, day""".stripMargin)
  }

  /** Bollinger bands over the daily per-type value series: trailing
    * 20-row mean ± 2σ with a breach flag. Moments ride exact DECIMAL
    * window sums (the [[windowZscoreRolling]] discipline, ROWS frame on
    * the daily aggregate); both engines derive identical band doubles
    * from identical exact operands, so even the band COMPARISON (v vs
    * upper/lower) agrees bit-for-bit. */
  def windowBollinger(s: SparkSession, d: String): DataFrame = {
    t(s, d, "events").createOrReplaceTempView("graft_ev_bb")
    s.sql(
      """SELECT event_type, day,
        |  ROUND(v, 2) AS v,
        |  ROUND(m, 4) AS mid,
        |  ROUND(m + 2 * sd, 4) AS upper,
        |  ROUND(m - 2 * sd, 4) AS lower,
        |  CAST(v > m + 2 * sd OR v < m - 2 * sd AS BOOLEAN) AS breach
        |FROM (
        |  SELECT event_type, day, n, v, sx / n AS m,
        |    sqrt((sxx - sx * sx / n) / (n - 1)) AS sd
        |  FROM (
        |    SELECT event_type, day,
        |      COUNT(*) OVER w AS n,
        |      CAST(dv AS DOUBLE) AS v,
        |      CAST(SUM(dv) OVER w AS DOUBLE) AS sx,
        |      CAST(SUM(dv * dv) OVER w AS DOUBLE) AS sxx
        |    FROM (SELECT event_type, CAST(ts AS DATE) AS day,
        |            CAST(SUM(CAST(value AS DECIMAL(19,4)))
        |              AS DECIMAL(18,4)) AS dv
        |          FROM graft_ev_bb GROUP BY 1, 2)
        |    WINDOW w AS (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |  ) WHERE n = 20 AND (sxx - sx * sx / n) / (n - 1) > 0
        |)
        |ORDER BY event_type NULLS FIRST, day""".stripMargin)
  }

  /** Distribution functions: percent_rank / cume_dist (exact ratios of
    * ints → bit-identical doubles in both engines). */
  def windowDistribution(s: SparkSession, d: String): DataFrame = {
    val byPrice = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    t(s, d, "orders")
      .select(
        col("o_orderkey"),
        col("o_orderpriority"),
        round(percent_rank().over(byPrice), 6).as("pr"),
        round(cume_dist().over(byPrice), 6).as("cd"))
      .orderBy(col("o_orderkey"))
  }

  /** IGNORE NULLS variants of lag / last_value (gap-filling /
    * last-observation-carried-forward — the standard sensor-stream
    * downsample trick). Nulls are injected deterministically
    * (event_type='view' masks the reading); ordering key (ts, event_id)
    * is unique so the carried value is well-defined. */
  def windowIgnoreNulls(s: SparkSession, d: String): DataFrame = {
    val v = when(col("event_type") === "view", lit(null)
      .cast("double")).otherwise(col("value"))
    val hist = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val run = hist.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "events")
      .select(
        col("event_id"),
        col("user_id"),
        lag(v, 1, null, ignoreNulls = true).over(hist).as("prev_nn"),
        last(v, ignoreNulls = true).over(run).as("locf"))
      .orderBy(col("event_id"))
  }

  /** Top-k rows per group via row_number + filter — Spark rewrites the
    * rank filter into WindowGroupLimit, which keeps a size-k heap per
    * key BEFORE the shuffle: the exchange carries ≤ k·|groups| rows,
    * not the whole table (asserted in PlanSpec). At 100 TB this is the
    * per-group top-k recipe; a global window would serialize the table
    * through one task. */
  def windowTopKPerGroup(s: SparkSession, d: String): DataFrame = {
    val byPrice = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, d, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(byPrice).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  /** Sessionization (gaps-and-islands): a session breaks when a user is
    * idle > 30 min. lag() marks session starts, a running sum numbers
    * them, one aggregate folds each session — all three steps reuse ONE
    * hash partitioning on user_id (a single shuffle; Catalyst collapses
    * the windows and the final groupBy into the same exchange). The
    * batch twin of `stream_session_window`. */
  def windowSession(s: SparkSession, d: String): DataFrame = {
    val byTs = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(s, d, "events")
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byTs))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_no",
        sum(col("new_sess")).over(byTs.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("session_no"))
  }

  /** Calendar gap-fill + forward-fill — the timeseries resample shape:
    * per user, the daily value series is densified over the user's own
    * [min(day), max(day)] span (`sequence` + `explode` generates missing
    * days INSIDE the scan stage — no driver-side calendar) and holes are
    * filled with the last observed value via `last(_, ignoreNulls)` over
    * a running frame.
    *
    * Scale shape: one shuffle for the daily rollup, one for the
    * per-user span, then span×days explode fans out map-side; the fill
    * window re-uses the daily rollup's (user) partitioning. The join
    * back to observed days is per-user + day equi — at 100 TB both
    * sides are pre-partitioned by the same key, and the calendar side
    * is |users|·|span| rows of 3 columns, never raw events. */
  def windowGapFill(s: SparkSession, d: String): DataFrame = {
    val users = t(s, d, "events")
      .filter(col("user_id") < 20)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
    val daily = users.groupBy(col("user_id"), col("day"))
      .agg(round(sum(col("value")), 2).as("day_value"),
        count(lit(1)).as("n_events"))
    val cal = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val fill = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    cal.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        col("day_value").isNull.as("is_gap"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("day_value"), ignoreNulls = true).over(fill)
          .as("filled_value"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Exponentially-weighted moving average (α = 1/2) over each user's
    * last 8 daily observations — the smoothing companion to
    * [[windowGapFill]]. The weighted sum is computed EXACTLY: the frame
    * history is collected per row, weights are the integer powers 2^i
    * (newest largest), and the dot product folds in DECIMAL via a HOF —
    * order-independent, so the DuckDB oracle matches bit-for-bit. The
    * denominator Σ 2^i = 2^(n+1) − 2 is a closed form both engines
    * evaluate identically in doubles.
    *
    * Scale shape: one shuffle for the daily rollup; the window re-uses
    * its (user) partitioning; the per-row collected frame is bounded at
    * 8 elements, so state is O(1) per row regardless of corpus size. */
  def windowEwma(s: SparkSession, d: String): DataFrame = {
    val daily = t(s, d, "events")
      .filter(col("user_id") < 20)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")), 2).as("day_value"))
    val frame = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(-7, 0)
    daily
      .withColumn("hist", collect_list(col("day_value")).over(frame))
      .select(col("user_id"), col("day"), col("day_value"),
        round(
          expr(
            """aggregate(
              |  zip_with(hist, sequence(1, size(hist)),
              |    (x, i) -> cast(x as decimal(18,4)) *
              |              cast(pow(2.0, i) as decimal(18,0))),
              |  cast(0 as decimal(38,4)), (a, x) -> a + x)""".stripMargin)
            .cast("double") /
            (pow(lit(2.0), size(col("hist")) + 1) - lit(2.0)),
          4).as("ewma"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Union-of-intervals coverage — the sweep-line merge expressed with
    * windows: each event opens a 15-minute activity interval; per user,
    * overlapping/adjacent intervals merge into islands (an interval
    * starts a new island iff its start exceeds the running max of all
    * previous ends — computed with a rows-frame max over (start, end)
    * order), and coverage is the Σ of island extents. The per-user
    * total-active-time metric (billing, engagement) computed in exact
    * integer microseconds. One shuffle on user_id serves the running
    * max, the island numbering and the island aggregate; per-row state
    * is one running max — unbounded-history safe. */
  def windowIntervalCoverage(s: SparkSession, d: String): DataFrame = {
    val us15m = 15L * 60 * 1000000L
    val byStart = Window.partitionBy(col("user_id"))
      .orderBy(col("st"), col("en"), col("event_id"))
    val prevMaxEnd = max(col("en"))
      .over(byStart.rowsBetween(Window.unboundedPreceding, -1))
    t(s, d, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("st"))
      .withColumn("en", col("st") + us15m)
      .withColumn("new_island",
        (col("st") > coalesce(prevMaxEnd, lit(Long.MinValue)))
          .cast("long"))
      .withColumn("island", sum(col("new_island")).over(byStart))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("st")).as("i_start"), max(col("en")).as("i_end"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("i_end") - col("i_start")).as("covered_us"))
      .orderBy(col("user_id"))
  }

  /** Time-series downsampling to hourly OHLC bars per event type —
    * the metrics/financial resample: open/close are argmin/argmax
    * selections over the (ts, event_id) total order (min_by/max_by —
    * no arithmetic, so doubles pass through exactly), high/low are
    * plain extremes. One hash aggregate keyed by (type, hour);
    * mergeable (min_by/max_by combine by comparing keys), so the
    * partial/final split works at any cardinality. */
  def windowResampleOhlc(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .withColumn("hour_us",
        unix_micros(date_trunc("hour", col("ts"))))
      // total-order key = micros ⋅ 10¹⁰ + event_id as an exact wide
      // decimal (composite arg-min keys aren't portable to the oracle;
      // 10¹⁰ exceeds any event-id cardinality, and decimal(38) holds
      // ~1.7e25 comfortably)
      .withColumn("ord",
        unix_micros(col("ts")).cast("decimal(38,0)") * 10000000000L +
          col("event_id"))
      .groupBy(col("event_type"), col("hour_us"))
      .agg(
        expr("min_by(value, ord)").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        expr("max_by(value, ord)").as("close"),
        count(lit(1)).as("n_ticks"))
      .orderBy(col("event_type"), col("hour_us"))

  /** Longest consecutive-day activity streak per user — the classic
    * gaps-and-islands identity: consecutive days share
    * (day_number − row_number), so islands need ONE window pass and
    * no self-join. Day numbers are exact integers (days since epoch).
    * One user_id shuffle; output one row per user. */
  def windowStreak(s: SparkSession, d: String): DataFrame = {
    val byDay = Window.partitionBy(col("user_id")).orderBy(col("day_n"))
    t(s, d, "events")
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .as("day_n"))
      .distinct()
      .withColumn("grp", col("day_n") - row_number().over(byDay))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("streak"))
      .groupBy(col("user_id"))
      .agg(max(col("streak")).as("max_streak"),
        sum(col("streak")).as("n_active_days"),
        count(lit(1)).as("n_streaks"))
      .orderBy(col("user_id"))
  }

  /** Hourly VWAP per event type — the weighted-mean resample bar next
    * to window_resample_ohlc's extremes: Σ(price·qty)/Σqty with a
    * deterministic integer qty (1 + event_id % 5) and the price mass
    * summed in DECIMAL. The mean is reported in integer MICRO price
    * units via integer division (values are positive, so truncate ==
    * floor) — a double division rounded to 4 was 1 ulp off between
    * engines on hairline .00005 cases. One hash aggregate on
    * (type, hour); mergeable at any cardinality. */
  def windowVwap(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("event_type"),
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        (lit(1L) + col("event_id") % 5).as("qty"),
        col("value").cast("decimal(19,4)").as("v"))
      .groupBy(col("event_type"), col("hour_us"))
      .agg(count(lit(1)).as("n"),
        sum(col("qty")).as("vol"),
        (sum(col("v") * col("qty")) * 10000).cast("long").as("pv4"))
      .select(col("event_type"), col("hour_us"), col("n"), col("vol"),
        expr("(pv4 * 100) div vol").as("vwap_micro"))
      .orderBy(col("event_type"), col("hour_us"))

  /** Daily TWAP per event type — the TIME-weighted mean beside
    * [[windowVwap]]'s volume-weighted one: each event's value "holds"
    * until the next event of the same (type, day), so
    * TWAP = Σ vᵢ·gapᵢ / Σ gapᵢ with gap = µs to the successor — the
    * standard bar for irregularly-sampled series (a value that held
    * for an hour counts 3600× one that held a second). The day's last
    * event has no successor and drops (its holding interval is
    * unknown); single-event groups therefore produce no row.
    *
    * Float discipline: gaps are exact integer µs from one lead()
    * (micro-resolution (ts, event_id) order — the engine's event-time
    * contract), the weighted mass Σ v·gap is an exact DECIMAL(38,4)
    * sum (safe to ~10³⁰ value-µs per group), and the closing division
    * is ONE double expression with identical text, rounded once.
    * Scale shape: one (type, day)-partitioned lead — O(1)/row
    * streaming window, the allowed class — then one hash aggregate to
    * the bounded (type × day) space. */
  def windowTwap(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("tsu"), col("event_id"))
    t(s, d, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        unix_micros(col("ts")).as("tsu"), col("event_id"),
        col("value").cast("decimal(18,4)").as("v"))
      .withColumn("gap_us", lead(col("tsu"), 1).over(w) - col("tsu"))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("gap_us")).as("span_us"),
        sum(col("v") * col("gap_us")).as("pv"))
      .selectExpr("event_type", "day", "n_intervals", "span_us",
        "ROUND(CAST(pv AS DOUBLE) / CAST(span_us AS DOUBLE), 6) AS twap")
      .orderBy(col("event_type"), col("day"))
  }

  /** Maximum drawdown per user — the risk analytic over the
    * MEAN-CLEARED cumulative value series: running peak minus current
    * cumulative, maximized. The raw per-event values are nonnegative,
    * so the raw cumulative is monotone and its drawdown is
    * identically 0 at every sf (caught by the round-11 degeneracy
    * lint — both engines agreed on a content-free answer); the
    * demeaned series dev_i = n·v_i − Σv (the window_page_hinkley
    * cross-multiplication, so no rational mean enters) wanders and
    * returns to 0, making the excursion metrics discriminate. Both
    * per-user totals and both running aggregates ride ONE user
    * partitioning (two window specs, same key — one shuffle), the
    * series stays DECIMAL-exact end to end, and the two reported
    * maxima close in one double division by n each. Order is
    * micro-resolution (ts, event_id), the engine's event-time
    * contract. */
  def windowDrawdown(s: SparkSession, d: String): DataFrame = {
    val wAll = Window.partitionBy(col("user_id"))
    val cumW = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").cast("decimal(19,4)").as("v"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("v")).over(wAll))
      .withColumn("dev", col("n") * col("v") - col("total"))
      .withColumn("cum", sum(col("dev")).over(cumW))
      .withColumn("runmax", max(col("cum")).over(cumW))
      .groupBy(col("user_id"))
      // cents are computed in EXACT integer arithmetic — round(a/b) =
      // (2a + b) DIV (2b) for the nonnegative maxima — and only the
      // final /100 touches a double (ROUND after a double division
      // straddled a midpoint at sf0.1: 396.725 rounded .73 in Spark,
      // .72 in DuckDB — the round-9 lesson applied)
      .agg(count(lit(1)).as("n_events"),
        expr("""CAST((2 * CAST(MAX(runmax - cum) * 10000 AS DECIMAL(38,0))
                + 100 * MAX(n)) DIV (200 * MAX(n)) AS DOUBLE) / 100""")
          .as("max_drawdown"),
        expr("""CAST((2 * CAST(MAX(cum) * 10000 AS DECIMAL(38,0))
                + 100 * MAX(n)) DIV (200 * MAX(n)) AS DOUBLE) / 100""")
          .as("peak_cum"))
      .orderBy(col("user_id"))
  }

  /** CUSUM drift detection — per event type, the classic cumulative-sum
    * change detector over the daily count series: S_i = max(0,
    * S_{i-1} + (x_i − μ)), alarm at the day where S peaks. The
    * recurrence is ALL-INTEGER by scaling through n_days (S·n = max(0,
    * S·n + (n·x_i − total))), so engines agree bit-for-bit. The series
    * is calendar-bounded (days in the corpus window), so the per-group
    * collect is bounded state, not data-sized — the same bounded-fold
    * contract as window_ewma; everything before it is one hash
    * aggregate on (type, day). DuckDB replays the fold as a recursive
    * CTE. */
  /** Page–Hinkley change detector (Page 1954, Hinkley 1971) over the
    * per-type daily count series — the sequential drift monitor next
    * to [[windowCusum]] (CUSUM clamps at zero and reports the alarm
    * day; PH tracks the cumulative deviation's excursion above its
    * RUNNING MINIMUM, the standard formulation in stream-drift
    * libraries). Exactness: deviations are mean-cleared by the
    * cross-multiplication dev = n_days·x − total (no rational mean),
    * so the cumulative, its running min and the max excursion are all
    * exact BIGINTs; the normalized statistic closes in one division.
    * Scale: one (type, day) aggregate; the windows partition by type
    * over calendar-bounded rows. */
  def windowPageHinkley(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = t(s, d, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
    val totals = daily.groupBy(col("event_type"))
      .agg(sum(col("x")).as("total"), count(lit(1)).as("n_days"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(totals), "event_type")
      .withColumn("dev", col("n_days") * col("x") - col("total"))
      .withColumn("cum", sum(col("dev")).over(w))
      .withColumn("runmin", min(col("cum")).over(w))
      .groupBy(col("event_type"), col("n_days"))
      .agg(max(col("cum") - col("runmin")).as("ph_scaled"))
      .select(col("event_type"), col("n_days"), col("ph_scaled"),
        expr("ROUND(CAST(ph_scaled AS DOUBLE) / n_days, 4)")
          .as("ph_stat"))
      .orderBy(col("event_type"))
  }

  def windowCusum(s: SparkSession, d: String): DataFrame = {
    val daily = t(s, d, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
    val totals = daily.groupBy(col("event_type"))
      .agg(sum(col("x")).as("total"), count(lit(1)).as("n_days"))
    daily.join(broadcast(totals), "event_type")
      .select(col("event_type"), col("n_days"), col("total"),
        struct(col("day"), (col("n_days") * col("x") - col("total"))
          .as("dev")).as("e"))
      .groupBy(col("event_type"), col("n_days"), col("total"))
      .agg(sort_array(collect_list(col("e"))).as("series"))
      .withColumn("fold", aggregate(
        col("series"),
        struct(lit(0L).as("s"), lit(-1L).as("smax"),
          lit(null).cast("date").as("dmax")),
        (acc, e) => {
          val sNext = greatest(lit(0L), acc.getField("s") + e.getField("dev"))
          struct(sNext.as("s"),
            when(sNext > acc.getField("smax"), sNext)
              .otherwise(acc.getField("smax")).as("smax"),
            when(sNext > acc.getField("smax"), e.getField("day"))
              .otherwise(acc.getField("dmax")).as("dmax"))
        }))
      .select(col("event_type"), col("n_days"), col("total"),
        col("fold.smax").as("max_cusum_scaled"),
        col("fold.dmax").cast("string").as("alarm_day"))
      .orderBy(col("event_type"))
  }

  /** Pareto concentration — per event type, the smallest number of
    * users covering ≥80% of events: rank users by activity (count
    * desc, user asc — total order), running sum over that order, and
    * the integer-exact crossing test 10·cum ≥ 8·total picks the
    * cutoff rank. The "how concentrated is traffic" analytic next to
    * agg_gini's coefficient. Per-type user counts bound every
    * exchange; the running sum rides one window pass. */
  def windowPareto(s: SparkSession, d: String): DataFrame = {
    val byActivity = Window.partitionBy(col("event_type"))
      .orderBy(col("x").desc, col("user_id"))
    t(s, d, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"))
      .withColumn("r", row_number().over(byActivity))
      .withColumn("cum", sum(col("x")).over(
        byActivity.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("x")).over(
        Window.partitionBy(col("event_type"))))
      .filter(col("cum") * 10 >= col("total") * 8)
      .groupBy(col("event_type"))
      .agg(min(col("r")).as("users_for_80pct"),
        max(col("r")).as("n_users"),
        max(col("total")).as("n_events"))
      .select(col("event_type"), col("users_for_80pct"), col("n_users"),
        col("n_events"),
        round(col("users_for_80pct").cast("double") / col("n_users"), 4)
          .as("user_share_for_80pct"))
      .orderBy(col("event_type"))
  }

  /** RFM segmentation — the marketing-analytics classic: per user,
    * recency (seconds since last activity, anchored to the corpus max
    * timestamp — a deterministic anchor, never wall-clock), frequency
    * (event count) and monetary (decimal-exact value sum), each cut
    * into quintiles by ntile over a TOTAL order (metric, user_id — a
    * tie in the metric must not leave quintile assignment to
    * partition order), composed into the RFM segment code. Scale:
    * per-user aggregate first, but the user relation still GROWS with
    * the corpus, so the three ntiles must not ride single-partition
    * windows: each quintile comes from an exact distributed rank
    * ([[Ordered.withGlobalIndex]] — range partition + local id +
    * broadcast prefix-sum) fed through ntile's closed-form bucket
    * arithmetic ([[Ordered.ntileFromRank]]), bit-identical to SQL
    * ntile against the unchanged oracle. The anchor max and user
    * count are one scalar aggregate, broadcast back. */
  def windowRfm(s: SparkSession, d: String): DataFrame = {
    // NOT cached despite five consumers: measured 2.15 s uncached vs
    // 2.94-3.14 s cached at sf0.1 — the per-user relation is narrow
    // enough that four re-aggregations of the scan beat the InMemory
    // columnar encode + codegen break (round-10 measurement; the ≥3-
    // consumer cache rule is a heuristic, the bench is the arbiter)
    val perUser = t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("freq"),
        sum(col("value").cast("decimal(19,4)")).as("mon_d"))
    val scalars = perUser
      .agg(max(col("last_us")).as("anchor_us"),
        count(lit(1)).as("n_users"))
    // checkpointed (round 15): each quintile chain consumes base twice
    // (range-boundary sampling + the ranged shuffle) and the closing
    // join once more — 7 re-aggregations of the events scan
    // un-checkpointed. localCheckpoint stores the narrow per-user rows
    // once without the InMemory columnar encode that made a .cache()
    // here SLOWER (round-10 measurement, kept in mind).
    val base = graft.llm.Dedup.ckpt(perUser
      .crossJoin(broadcast(scalars))
      // integer division, exactly the oracle's `//` — the rank key must
      // order the INTEGER seconds, not a fractional double
      .withColumn("recency_s", expr("(anchor_us - last_us) DIV 1000000"))
      .withColumn("monetary", col("mon_d").cast("double")),
      rebuild = false)
    // one narrow (user_id, metric) rank chain per dimension, joined
    // back on user_id — three parallel range shuffles of |users| rows,
    // no global window anywhere
    def quintile(metric: Column, keys: Seq[Column], out: String): DataFrame =
      Ordered.ntileFromRank(
        Ordered.withGlobalIndex(
            base.select(col("user_id"), col("n_users"), metric),
            keys, "__idx")
          .withColumn("__rank", col("__idx") + 1),
        "__rank", "n_users", 5, out)
        .select(col("user_id"), col(out))
    val rTiles =
      quintile(col("recency_s"), Seq(col("recency_s"), col("user_id")), "r")
    val fTiles =
      quintile(col("freq"), Seq(col("freq").desc, col("user_id")), "f")
    val mTiles =
      quintile(col("monetary"), Seq(col("monetary").desc, col("user_id")), "m")
    base
      .join(rTiles, "user_id").join(fTiles, "user_id").join(mTiles, "user_id")
      .select(col("user_id"), col("recency_s").cast("long").as("recency_s"),
        col("freq"), round(col("monetary"), 2).as("monetary"),
        col("r"), col("f"), col("m"),
        (col("r") * 100 + col("f") * 10 + col("m")).as("rfm_code"))
      .orderBy(col("user_id"))
  }

  /** Week-over-week growth per event type — weekly totals, previous
    * week via lag over the calendar order, and the rounded growth
    * ratio (null on the first week: no denominator, not 0%). The
    * standard reporting primitive; exact integer counts, one
    * calendar-bounded window. */
  /** Seasonal-naive forecast backtest — the baseline every forecasting
    * pipeline must beat, and the drift gate for volume monitoring:
    * predict each (type, day) event count with the value seven days
    * earlier (lag-7 over the per-type daily aggregate — same-weekday
    * seasonality), then score MAE and bias per type over the scored
    * days. Counts are integers, |n − n₋₇| and Σ stay integers, the
    * two means are ONE closing double division each. The corpus
    * collapses to (type, day) in one hash aggregate; the lag window
    * partitions by type over calendar-bounded rows. */
  def windowForecastBacktest(s: SparkSession, d: String): DataFrame = {
    val byDay = Window.partitionBy(col("event_type"))
      .orderBy(col("day_us"))
    t(s, d, "events")
      .select(col("event_type"),
        unix_micros(date_trunc("day", col("ts"))).as("day_us"))
      .groupBy(col("event_type"), col("day_us"))
      .agg(count(lit(1)).as("n"))
      .withColumn("pred", lag(col("n"), 7).over(byDay))
      .filter(col("pred").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("n") - col("pred"))).as("abs_err_sum"),
        sum(col("n") - col("pred")).as("bias_sum"))
      .select(col("event_type"), col("n_days"), col("abs_err_sum"),
        expr("ROUND(abs_err_sum / CAST(n_days AS DOUBLE), 6)").as("mae"),
        expr("ROUND(bias_sum / CAST(n_days AS DOUBLE), 6)").as("bias"))
      .orderBy(col("event_type"))
  }

  def windowWowGrowth(s: SparkSession, d: String): DataFrame = {
    val byWeek = Window.partitionBy(col("event_type"))
      .orderBy(col("week_us"))
    t(s, d, "events")
      .select(col("event_type"),
        unix_micros(date_trunc("week", col("ts"))).as("week_us"))
      .groupBy(col("event_type"), col("week_us"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prev_n", lag(col("n"), 1).over(byWeek))
      .select(col("event_type"), col("week_us"), col("n"), col("prev_n"),
        round(col("n").cast("double") / col("prev_n") - 1.0, 4)
          .as("wow_growth"))
      .orderBy(col("event_type"), col("week_us"))
  }

  /** Alert debouncing — collapse event storms to one emission per
    * burst, GAP semantics: emit the first event of every
    * 30-minute-gap island (one lag() pass, no iterative state). Note
    * the distinction from THROTTLE semantics ("emit when ≥30 min
    * since last emitted"), which re-emits inside a slowly drifting
    * burst and is inherently sequential — that variant needs
    * flatMapGroupsWithState (see stream_stateful_counter for the
    * recipe). Gap debounce is what alerting pipelines usually mean
    * by "collapse the storm"; one user_id shuffle. */
  def windowDebounce(s: SparkSession, d: String): DataFrame = {
    val byTs = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val gapUs = 30L * 60 * 1000000L
    t(s, d, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byTs))
      .withColumn("new_burst",
        (col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > gapUs).cast("long"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("new_burst")).as("n_emitted"))
      .select(col("user_id"), col("n_events"), col("n_emitted"),
        (col("n_events") - col("n_emitted")).as("n_suppressed"))
      .orderBy(col("user_id"))
  }

  /** Trailing-week rolling correlation between a day's event VOLUME
    * and its VALUE MASS per type — "does load move with revenue this
    * week" drift tracking. A CONSTANT-width 7-row frame over the
    * (type, day) daily aggregate — the allowed bounded-ROWS class
    * (O(7)/row; the banned class is data-width sliding RANGE frames),
    * running over calendar-bounded rows, not the corpus.
    *
    * Float discipline: the six frame sums (n, Σx, Σy, Σxy, Σx², Σy²)
    * are exact long/decimal sums over ≤7 rows; the Pearson formula is
    * ONE double expression; zero-variance windows short-circuit to
    * NULL via an exactly-equivalent exact guard: a frame has zero
    * variance iff its min equals its max, so the guard compares
    * MIN/MAX over the same frame — decimal/integer comparisons with
    * NO arithmetic, immune to the 38-digit product cap that made the
    * previous n·Σx²−(Σx)² guard lossy (round-8 advice: the window sum
    * is DECIMAL(28,4), so its square exceeded precision 38 and was
    * silently rounded). */
  def windowRollingCorr(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, 0)
    t(s, d, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"),
        sum(col("value").cast("decimal(18,4)")).as("y"))
      .select(col("event_type"), col("day"),
        count(lit(1)).over(w).as("n7"),
        sum(col("x")).over(w).as("sx"),
        sum(col("y")).over(w).as("sy"),
        sum(col("x") * col("y")).over(w).as("sxy"),
        sum(col("x") * col("x")).over(w).as("sxx"),
        sum(col("y") * col("y")).over(w).as("syy"),
        min(col("x")).over(w).as("mnx"),
        max(col("x")).over(w).as("mxx"),
        min(col("y")).over(w).as("mny"),
        max(col("y")).over(w).as("mxy"))
      .selectExpr("event_type", "day", "n7",
        """CASE WHEN mnx <> mxx AND mny <> mxy
           THEN ROUND(
             (CAST(n7 AS DOUBLE) * CAST(sxy AS DOUBLE) -
              CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             sqrt((CAST(n7 AS DOUBLE) * CAST(sxx AS DOUBLE) -
                   CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                  (CAST(n7 AS DOUBLE) * CAST(syy AS DOUBLE) -
                   CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
           END AS corr7""")
      .orderBy(col("event_type"), col("day"))
  }

  /** Largest-remainder proration — allocate each order's total price
    * (integer cents) across its lineitems proportional to extended
    * price, with the rounding remainder distributed one cent at a time
    * to the largest fractional remainders, so the allocations SUM
    * EXACTLY to the order total (the invoice/revenue-split primitive;
    * naive per-row rounding leaks cents). All-integer: base share is
    * (T·w) div W, the remainder rank orders by (T·w) mod W descending,
    * and R = T − Σ base extra cents go to the top R ranks. The `exact`
    * column proves Σ alloc = T per order inside the same pass. One
    * shuffle: every window partitions by l_orderkey (order sizes are
    * bounded, no skew). Duplicate lineitem rows are identical, so the
    * arbitrary rank order among them yields the same alloc MULTISET —
    * output ordered by (key, alloc) is deterministic. */
  def windowAllocateRemainder(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem").select(col("l_orderkey"),
      col("l_linenumber"),
      expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("w"))
    val ord = t(s, d, "orders").select(col("o_orderkey").as("l_orderkey"),
      expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("tt"))
    val byOrder = Window.partitionBy(col("l_orderkey"))
    val rankW = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("rem").desc, col("l_linenumber"), col("w"))
    li.join(ord, "l_orderkey")
      .withColumn("ww", sum(col("w")).over(byOrder))
      .withColumn("base", expr("(tt * w) div ww"))
      .withColumn("rem", expr("(tt * w) % ww"))
      .withColumn("r_extra", col("tt") - sum(col("base")).over(byOrder))
      .withColumn("rn", row_number().over(rankW))
      .withColumn("alloc_cents",
        col("base") + when(col("rn") <= col("r_extra"), 1L).otherwise(0L))
      .withColumn("exact",
        sum(col("alloc_cents")).over(byOrder) === col("tt"))
      .select(col("l_orderkey"), col("l_linenumber"), col("w"),
        col("alloc_cents"), col("exact"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("alloc_cents"))
  }

  /** Peak concurrent user sessions per day — the capacity-sizing sweep
    * (how many sessions were simultaneously active): sessions are
    * [[windowSession]]'s 30-minute-gap user sessions; each contributes
    * +1 at its start instant and −1 at its end instant, and the peak
    * is the maximum of the running delta sum over the boundary stream
    * ordered by (ts, starts-before-ends) — touching sessions count as
    * concurrent. Peak is reported at boundary INSTANTS per day (a
    * day without boundaries inherits no row — the sweep's defined
    * output domain).
    *
    * Scale shape: the one global total order this needs is the
    * boundary stream — run as the house bucketed prefix-sum
    * decomposition ([[graft.llm.TextStats.textVocabGrowth]]'s shape):
    * ABSOLUTE hour buckets (calendar-bounded count, no data-dependent
    * bounds scan), per-bucket local cumsums, broadcast per-bucket
    * offsets — never a
    * single-partition window. Per-row cumsums at tied (us, delta)
    * keys depend on tie order, but within a tie run the VALUE MULTISET
    * is {v+1..v+k} regardless of order, so the per-day MAX is
    * deterministic at any parallelism. */
  def windowMaxConcurrency(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // One corpus window pass (lag + lead share the frame): a row
    // emits +1 if it STARTS a session, −1 if it ENDS one (both for a
    // single-event session) — the boundary multiset is identical to
    // sessionize-then-aggregate, without the second corpus pass the
    // groupBy form pays (the unioned deltas re-executed the
    // sessionization per branch: measured 2.43 → 1.4 s at sf0.1).
    // Buckets are ABSOLUTE hours (calendar-bounded count), so no
    // data-dependent bounds scan / crossJoin barrier is needed.
    val gapUs = 1800L * 1000000L
    // ordering by us ≡ ordering by ts (unix_micros is monotone)
    val byTs = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val marked = t(s, d, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(byTs))
      .withColumn("next_us", lead(col("us"), 1).over(byTs))
      .withColumn("is_start",
        col("prev_us").isNull || col("us") - col("prev_us") > gapUs)
      .withColumn("is_end",
        col("next_us").isNull || col("next_us") - col("us") > gapUs)
    val deltas = marked.select(col("us"), explode(concat(
        when(col("is_start"), array(lit(1)))
          .otherwise(array().cast("array<int>")),
        when(col("is_end"), array(lit(-1)))
          .otherwise(array().cast("array<int>")))).as("delta"))
    val bucketed = deltas
      .withColumn("__bkt", expr("us div 3600000000"))
    val localW = Window.partitionBy(col("__bkt"))
      .orderBy(col("us"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefixW = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("__bkt"))
      .agg(sum(col("delta")).as("__s"))
      .withColumn("__o", coalesce(sum(col("__s")).over(prefixW), lit(0L)))
      .select(col("__bkt"), col("__o"))
    bucketed
      .withColumn("__c", sum(col("delta")).over(localW))
      .join(broadcast(offsets), "__bkt")
      .select(to_date(timestamp_micros(col("us"))).as("day"),
        (col("__o") + col("__c")).as("run"))
      .groupBy(col("day"))
      .agg(max(col("run")).as("peak"),
        count(lit(1)).as("n_boundaries"))
      // peak ≥ 0 always holds (a running start/end count cannot go
      // negative) — the filter exists so the cumsum chain stays
      // load-bearing under COUNT-shaped consumers (the
      // agg_bootstrap_ci Bench-pruning precedent): without it
      // Catalyst prunes the peak computation when only cardinality
      // is observed and the timing lies.
      .filter(col("peak") >= 0)
      .orderBy(col("day"))
  }

  /** Sliding 30-day distinct users (MAU) via DataSketches HLL
    * window-union — the production shape for wide sliding distincts:
    * where [[graft.queries.Aggregates.aggDauWau]]'s exact fan-out
    * writes W rows per activity (fine at W=7), the sketch path
    * aggregates each day ONCE into an HLL sketch (lgK=14) and the
    * 30-day window unions 30 fixed-size sketches per day — frame
    * state is O(days × 16 KiB) regardless of user cardinality, the
    * trade every MAU pipeline at scale makes. The daily series is
    * gap-filled from a calendar sequence so the 30-ROW frame IS 30
    * calendar days at any data.
    *
    * Derived-check gate row (the approximate-operator convention):
    * the engine ALSO computes the exact MAU (30-day fan-out — the
    * oracle-mirrorable side) and pins |est − exact| ≤ 5%·exact as a
    * boolean the oracle asserts TRUE (lgK=14 keeps HLL error ≈0.8%,
    * so the 5% floor sits far beyond 2σ per the house rule); the
    * full estimate remains a library surface. */
  def windowMauSketch(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ud = t(s, d, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val daily = ud.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"),
        expr("hll_sketch_agg(user_id, 14)").as("sk"))
    val calendar = daily
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val series = calendar.join(daily, Seq("day"), "left")
    val frame = Window.orderBy(col("day")).rowsBetween(-29, 0)
    val est = series
      .withColumn("u", expr("hll_union_agg(sk, false)").over(frame))
      .withColumn("mau_est", expr("hll_sketch_estimate(u)"))
      .filter(col("dau").isNotNull)
    val mauExact = ud
      .select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 29)))
          .as("day"))
      .distinct()
      .groupBy(col("day"))
      .agg(count(lit(1)).as("mau_exact"))
    est.join(mauExact, "day")
      .select(col("day"), col("dau"), col("mau_exact"),
        (abs(col("mau_est") - col("mau_exact")) * 20 <=
          col("mau_exact")).as("est_within_5pct"))
      .orderBy(col("day"))
  }

  /** Rolling Theil–Sen trend per (event_type, day) — the robust
    * slope estimator (median of pairwise slopes; 29% breakdown point
    * vs OLS's zero) in its streaming "repeated median" inner form:
    * each day's slope is the MEDIAN of the ≤6 slopes from that day
    * back to each of the 6 preceding days. Shape: the corpus
    * collapses to the (type, day) daily aggregate FIRST; the pair
    * fan-out is a day-banded self-join over that bounded series (≤6
    * partners per row — join_window_aggregate's banded class, never
    * the corpus); the median is an exact two-order-statistic pick
    * over ≤6 rows per (type, day) keyed window. Slopes are single
    * double divisions of integer deltas; the even-count median closes
    * as (lo+hi)/2e0 — identical text both engines. */
  def windowTheilSen(s: SparkSession, d: String): DataFrame = {
    val bySlope = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("slope"), col("dd_src"))
    val perDay = Window.partitionBy(col("event_type"), col("day"))
    val daily = t(s, d, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dd", datediff(col("day"), lit("1970-01-01")))
    daily.as("a").join(daily.as("b"),
      col("a.event_type") === col("b.event_type") &&
        col("b.dd") - col("a.dd") >= 1 && col("b.dd") - col("a.dd") <= 6)
      .select(col("b.event_type").as("event_type"),
        col("b.day").as("day"),
        expr("CAST(b.cnt - a.cnt AS DOUBLE) / CAST(b.dd - a.dd AS DOUBLE)")
          .as("slope"),
        col("a.dd").as("dd_src"))
      .withColumn("rn", row_number().over(bySlope))
      .withColumn("m", count(lit(1)).over(perDay))
      .filter(expr("rn = (m + 1) DIV 2 OR rn = m DIV 2 + 1"))
      .groupBy(col("event_type"), col("day"))
      .agg(min(col("slope")).as("s_lo"), max(col("slope")).as("s_hi"),
        max(col("m")).as("n_slopes"))
      .select(col("event_type"), col("day"), col("n_slopes"),
        expr("ROUND((s_lo + s_hi) / 2e0, 6)").as("ts_slope"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Additive seasonal decomposition, day-of-week index per event
    * type (the classical-decomposition seasonal step: detrend by a
    * centered 7-day moving average, then average the residuals per
    * weekday — what STL's seasonal pass reduces to at period 7 with
    * no robustness iterations). Float discipline: the residual is
    * kept as the INTEGER numerator 7·cnt − Σ₇ (the trend subtraction
    * scaled through by 7), only full 7-row frames participate, and
    * the per-(type, dow) seasonal index closes as one double division
    * seas_num/(7·n_days). Shape: corpus → (type, day) aggregate →
    * constant-width 7-ROW centered frame (the allowed bounded class)
    * → |types×7|-row rollup. */
  def windowSeasonalIndex(s: SparkSession, d: String): DataFrame = {
    val frame = Window.partitionBy(col("event_type"))
      .orderBy(col("day")).rowsBetween(-3, 3)
    t(s, d, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("sum7", sum(col("cnt")).over(frame))
      .withColumn("n7", count(lit(1)).over(frame))
      .filter(col("n7") === 7L)
      .withColumn("resid_num", lit(7L) * col("cnt") - col("sum7"))
      .groupBy(col("event_type"), dayofweek(col("day")).as("dow"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("resid_num")).as("seas_num"))
      .select(col("event_type"), col("dow"), col("n_days"),
        expr("""ROUND(CAST(seas_num AS DOUBLE)
                / (7e0 * CAST(n_days AS DOUBLE)), 6)""")
          .as("seasonal"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** Lag-feature matrix — the feature-engineering projection every
    * forecasting/training pipeline materializes from a metric series
    * (lag-1, lag-7, trailing 7-day mean, day-over-day delta), emitted
    * at the (type, day) grain ready to join onto a label table.
    * Exact: counts and lags are integers; the trailing mean keeps the
    * integer 7-day sum and closes as one division, NULL until the
    * frame is full (no partial-window leakage into training). One
    * keyed window over the daily aggregate, constant 7-ROW frame. */
  def windowLagFeatures(s: SparkSession, d: String): DataFrame = {
    val byDay = Window.partitionBy(col("event_type"))
      .orderBy(col("day"))
    val trail7 = byDay.rowsBetween(-6, 0)
    t(s, d, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("lag1", lag(col("cnt"), 1).over(byDay))
      .withColumn("lag7", lag(col("cnt"), 7).over(byDay))
      .withColumn("sum7", sum(col("cnt")).over(trail7))
      .withColumn("n7", count(lit(1)).over(trail7))
      .select(col("event_type"), col("day"), col("cnt"), col("lag1"),
        col("lag7"), (col("cnt") - col("lag1")).as("dod_delta"),
        expr("""CASE WHEN n7 = 7
                THEN ROUND(CAST(sum7 AS DOUBLE) / 7e0, 6) END""")
          .as("ma7"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Rescaled range (the R/S statistic, Hurst 1951) of the daily
    * arrival series per event type — the long-range-dependence probe
    * behind Hurst-exponent estimation (E[R/S] ~ c·nᴴ; H > 0.5 ⇒
    * persistent/trending load, the thing capacity planning must know
    * about its traffic). Float discipline: cumulative deviations are
    * kept as the INTEGER prefix sums P_j = Σ(n·c_i − S) (the mean
    * subtraction scaled through by n), the range R·n = max(P,0) −
    * min(P,0) is exact, and R/S = Rn/√(n·Σc² − S²) closes in ONE
    * double expression (√ of an exact integer). One keyed cumulative
    * window over the bounded daily aggregate. */
  def windowRescaledRange(s: SparkSession, d: String): DataFrame = {
    val run = Window.partitionBy(col("event_type"))
      .orderBy(col("day")).rowsBetween(Long.MinValue, 0)
    t(s, d, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .withColumn("s1", sum(col("c")).over(
        Window.partitionBy(col("event_type"))))
      .withColumn("s2", sum(col("c") * col("c")).over(
        Window.partitionBy(col("event_type"))))
      .withColumn("p", sum(col("n") * col("c") - col("s1")).over(run))
      .groupBy(col("event_type"), col("n"), col("s1"), col("s2"))
      .agg(greatest(max(col("p")), lit(0L)).as("p_max"),
        least(min(col("p")), lit(0L)).as("p_min"))
      .select(col("event_type"), col("n").as("n_days"),
        (col("p_max") - col("p_min")).as("rn_num"),
        expr("""ROUND(CAST(p_max - p_min AS DOUBLE)
                / SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE)), 6)""")
          .as("rs_stat"))
      .orderBy(col("event_type"))
  }

  /** SLO error-budget burn-down — the SRE table behind every "are we
    * burning the budget too fast" alert: daily error rate vs the 1%
    * SLO, burn rate = rate/budget, and the cumulative share of the
    * period's total budget consumed to date. Integer daily cells
    * from one aggregate; the cumulative runs over the ~|days| rollup
    * (window above aggregate — the allowed class); budget math stays
    * in EXACT integers (err·100 vs total) until the closing
    * divisions. */
  def windowSloBurn(s: SparkSession, d: String): DataFrame = {
    val run = Window.orderBy(col("day")).rowsBetween(Long.MinValue, 0)
    val all = Window.partitionBy()
      .rowsBetween(Long.MinValue, Long.MaxValue)
    t(s, d, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("total"),
        sum(expr("CASE WHEN event_type = 'error' THEN 1 ELSE 0 END"))
          .as("errors"))
      .withColumn("cum_err", sum(col("errors")).over(run))
      .withColumn("period_total", sum(col("total")).over(all))
      .select(col("day"), col("total"), col("errors"),
        expr("""ROUND(CAST(errors AS DOUBLE) / CAST(total AS DOUBLE)
                / 0.01e0, 6)""").as("burn_rate"),
        expr("""ROUND(CAST(cum_err AS DOUBLE)
                / (0.01e0 * CAST(period_total AS DOUBLE)), 6)""")
          .as("cum_budget_used"))
      .orderBy(col("day"))
  }

  /** Cohort LTV curves — cumulative value per user by (signup-week
    * cohort, weeks-since-signup age), the payback-period table every
    * acquisition review reads. Exact: per-(cohort, age) value mass is
    * a DECIMAL sum, the cumulative runs over the ≤|weeks| ages of
    * each cohort (keyed bounded window), cohort size is an integer,
    * and LTV/user closes in one double division. Two hash joins on
    * user_id; no corpus window. */
  def windowCohortLtv(s: SparkSession, d: String): DataFrame = {
    val byCohort = Window.partitionBy(col("cohort_week"))
      .orderBy(col("age_week")).rowsBetween(Long.MinValue, 0)
    val ev = t(s, d, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("value").cast("decimal(18,4)").as("v"))
    val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("fd"))
      .withColumn("cohort_week",
        date_trunc("week", col("fd")).cast("date"))
    val size = first.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_users"))
    ev.join(first.select(col("user_id"), col("cohort_week")), "user_id")
      .withColumn("age_week",
        expr("CAST(datediff(day, cohort_week) DIV 7 AS INT)"))
      .groupBy(col("cohort_week"), col("age_week"))
      .agg(sum(col("v")).as("wk_value"))
      .withColumn("cum_value", sum(col("wk_value")).over(byCohort))
      .join(broadcast(size), "cohort_week")
      .select(col("cohort_week"), col("age_week"), col("n_users"),
        expr("""ROUND(CAST(cum_value AS DOUBLE)
                / CAST(n_users AS DOUBLE), 6)""").as("ltv_per_user"))
      .orderBy(col("cohort_week"), col("age_week"))
  }

  /** Turning-points randomness test on the daily series per type —
    * the classical i.i.d. check (Kendall): count strict local
    * extrema; under randomness E = 2(n−2)/3 and Var = (16n−29)/90,
    * so the z closes in one double expression from the INTEGER
    * turning count (a point turns iff (cᵢ−cᵢ₋₁)·(cᵢ₊₁−cᵢ) < 0 — an
    * exact integer product; plateau ties are not extrema).
    * Complements [[windowRescaledRange]] (long-range dependence) and
    * agg_runs_test (sign runs) with the local-oscillation view. One
    * keyed lag/lead window over the bounded daily aggregate. */
  def windowTurningPoints(s: SparkSession, d: String): DataFrame = {
    val byDay = Window.partitionBy(col("event_type"))
      .orderBy(col("day"))
    t(s, d, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(byDay))
      .withColumn("nc", lead(col("c"), 1).over(byDay))
      .filter(col("pc").isNotNull && col("nc").isNotNull)
      .groupBy(col("event_type"))
      .agg((count(lit(1)) + lit(2L)).as("n_days"),
        sum(when((col("c") - col("pc")) * (col("nc") - col("c")) < 0L,
          1L).otherwise(0L)).as("n_turning"))
      .select(col("event_type"), col("n_days"), col("n_turning"),
        expr("""ROUND((CAST(n_turning AS DOUBLE)
                - 2e0 * CAST(n_days - 2 AS DOUBLE) / 3e0)
                / SQRT(CAST(16 * n_days - 29 AS DOUBLE) / 90e0), 6)""")
          .as("z_stat"))
      .orderBy(col("event_type"))
  }

  /** Seasonal strength (Wang–Smith–Hyndman's F_s = 1 −
    * var(remainder)/var(detrended)) for the period-7 decomposition —
    * the scalar that says whether [[windowSeasonalIndex]]'s weekday
    * pattern is real signal or noise. Float discipline: the
    * detrended residual is the same INTEGER numerator 7·c − Σ₇, its
    * variance and the raw series' close from integer moments (the
    * 1/49 scaling cancels inside the ratio of residual variances, so
    * no division happens before the ONE closing double expression);
    * remainder variance = detrended variance − seasonal variance of
    * the dow means, all in n²-scaled integer-derived terms. Shape:
    * one 7-ROW frame pass + a |dow|-bounded rollup per type. */
  def windowSeasonalStrength(s: SparkSession, d: String): DataFrame = {
    val frame = Window.partitionBy(col("event_type"))
      .orderBy(col("day")).rowsBetween(-3, 3)
    // per-dow moments PIVOTED into 14 integer columns so the
    // between-group sum Σ srₙ²/ndₙ is ONE fixed-order double
    // expression — never a partition-order-dependent double SUM
    val dowTerm = (1 to 7).map(k =>
      s"""CASE WHEN nd$k = 0 THEN 0e0
         |ELSE CAST(sr$k AS DOUBLE) * CAST(sr$k AS DOUBLE)
         |  / CAST(nd$k AS DOUBLE) END""".stripMargin)
      .mkString(" + ")
    val dowAggs = (1 to 7).flatMap(k => Seq(
      sum(when(col("dow") === k, 1L).otherwise(0L)).as(s"nd$k"),
      sum(when(col("dow") === k, col("r")).otherwise(0L)).as(s"sr$k")))
    t(s, d, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .withColumn("sum7", sum(col("c")).over(frame))
      .withColumn("n7", count(lit(1)).over(frame))
      .filter(col("n7") === 7L)
      .select(col("event_type"), dayofweek(col("day")).as("dow"),
        (lit(7L) * col("c") - col("sum7")).as("r"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (Seq(sum(col("r")).as("s1"), sum(col("r") * col("r")).as("s2"))
          ++ dowAggs): _*)
      .select(col("event_type"), col("n"),
        expr(s"""ROUND(GREATEST(0e0, (($dowTerm)
                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                    / CAST(n AS DOUBLE))
                / (CAST(s2 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                    / CAST(n AS DOUBLE))), 6)""")
          .as("seasonal_strength"))
      .orderBy(col("event_type"))
  }

  /** Holt's linear (double exponential) smoothing over each event
    * type's daily value series — the level+trend forecaster one step
    * up from [[window_ewma]]'s flat level: α = 0.2, β = 0.1,
    * level' = α·y + (1−α)(level+trend), trend' = β(level'−level) +
    * (1−β)·trend, initialized (level₁ = y₁, trend₁ = 0), plus the
    * 7-step-ahead forecast level + 7·trend. All arithmetic in exact
    * integer cents (daily sums via DECIMAL(18,4), ×100), with every
    * ÷10 offset-shifted (+1e15, −1e14 after) so the dividend is
    * always positive — engines disagree on NEGATIVE integer division
    * (truncate vs floor), and a trend can be negative.
    *
    * Shape: one (type, day) hash aggregate over the corpus, then the
    * recursion folds per type over its own bounded daily series
    * (collect_list of |days| rows per type — calendar-bounded, not
    * corpus-bounded; ~365 rows/type/yr), expressed as one in-scan
    * `aggregate` fold. The sequential dependence is irreducible
    * (each step needs the last), so the right scale shape is exactly
    * this: corpus-sized work in the parallel day aggregate, the
    * inherently-serial fold on calendar-sized state. */
  def windowHoltLinear(s: SparkSession, d: String): DataFrame = {
    val step =
      """(2 * e.y_u + 8 * (st.level + st.trend) + 1000000000000000)
        | div 10 - 100000000000000""".stripMargin.replace("\n", "")
    t(s, d, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("CAST(SUM(CAST(value AS DECIMAL(18,4))) * 100 AS BIGINT)")
        .as("y_u"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("y_u"))))
        .as("series"))
      .withColumn("hw", expr(
        s"""aggregate(
           |  slice(series, 2, greatest(size(series) - 1, 0)),
           |  named_struct(
           |    'level', element_at(series, 1).y_u,
           |    'trend', CAST(0 AS BIGINT)),
           |  (st, e) -> named_struct(
           |    'level', $step,
           |    'trend', (($step) - st.level + 9 * st.trend
           |      + 1000000000000000) div 10 - 100000000000000))"""
          .stripMargin))
      .select(col("event_type"), size(col("series")).as("n_days"),
        col("hw.level").as("level_u"), col("hw.trend").as("trend_u"),
        (col("hw.level") + lit(7L) * col("hw.trend")).as("forecast7_u"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "window_holt_linear" -> (windowHoltLinear _),
    "window_seasonal_strength" -> (windowSeasonalStrength _),
    "window_turning_points" -> (windowTurningPoints _),
    "window_cohort_ltv" -> (windowCohortLtv _),
    "window_slo_burn" -> (windowSloBurn _),
    "window_rescaled_range" -> (windowRescaledRange _),
    "window_lag_features" -> (windowLagFeatures _),
    "window_seasonal_index" -> (windowSeasonalIndex _),
    "window_theil_sen" -> (windowTheilSen _),
    "window_mau_sketch" -> (windowMauSketch _),
    "window_max_concurrency" -> (windowMaxConcurrency _),
    "window_allocate_remainder" -> (windowAllocateRemainder _),
    "window_twap" -> (windowTwap _),
    "window_rolling_corr" -> (windowRollingCorr _),
    "window_debounce" -> (windowDebounce _),
    "window_cusum" -> (windowCusum _),
    "window_page_hinkley" -> (windowPageHinkley _),
    "window_vwap" -> (windowVwap _),
    "window_drawdown" -> (windowDrawdown _),
    "window_zscore_rolling" -> (windowZscoreRolling _),
    "window_rolling_median" -> (windowRollingMedian _),
    "window_rsi" -> (windowRsi _),
    "window_bollinger" -> (windowBollinger _),
    "window_wow_growth" -> (windowWowGrowth _),
    "window_forecast_backtest" -> (windowForecastBacktest _),
    "window_rfm" -> (windowRfm _),
    "window_pareto" -> (windowPareto _),
    "window_streak" -> (windowStreak _),
    "window_resample_ohlc" -> (windowResampleOhlc _),
    "window_interval_coverage" -> (windowIntervalCoverage _),
    "window_gap_fill" -> (windowGapFill _),
    "window_ewma" -> (windowEwma _),
    "window_session" -> (windowSession _),
    "window_top_k_per_group" -> (windowTopKPerGroup _),
    "window_range_interval" -> (windowRangeInterval _),
    "window_ignore_nulls" -> (windowIgnoreNulls _),
    "window_distribution" -> (windowDistribution _),
    "window_rank" -> (windowRank _),
    "window_count_distinct" -> (windowCountDistinct _),
    "window_analytic" -> (windowAnalytic _),
    "window_frame_running" -> (windowFrameRunning _),
    "window_range_frame" -> (windowRangeFrame _)
  )

  val oracles: Map[String, String] = Map(
    // same α=0.2/β=0.1 integer-cent recursion, unrolled as a
    // recursive CTE walking the per-type day rank; same +1e15 offset
    // divisions so both engines compute identical quotients
    "window_holt_linear" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 100 AS BIGINT)
        |      AS y_u
        |  FROM events GROUP BY 1, 2),
        |srs AS (
        |  SELECT event_type, y_u,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
        |      AS rn
        |  FROM daily),
        |nd AS (SELECT event_type, MAX(rn) AS n_days FROM srs
        |       GROUP BY event_type),
        |rec(event_type, rn, level, trend) AS (
        |  SELECT event_type, CAST(1 AS BIGINT), y_u, CAST(0 AS BIGINT)
        |  FROM srs WHERE rn = 1
        |  UNION ALL
        |  SELECT r.event_type, r.rn + 1,
        |    (2 * s.y_u + 8 * (r.level + r.trend) + 1000000000000000)
        |      // 10 - 100000000000000,
        |    (((2 * s.y_u + 8 * (r.level + r.trend) + 1000000000000000)
        |      // 10 - 100000000000000) - r.level + 9 * r.trend
        |      + 1000000000000000) // 10 - 100000000000000
        |  FROM rec r JOIN srs s
        |    ON s.event_type = r.event_type AND s.rn = r.rn + 1)
        |SELECT r.event_type, CAST(nd.n_days AS INTEGER) AS n_days,
        |  CAST(r.level AS BIGINT) AS level_u,
        |  CAST(r.trend AS BIGINT) AS trend_u,
        |  CAST(r.level + 7 * r.trend AS BIGINT) AS forecast7_u
        |FROM rec r JOIN nd ON nd.event_type = r.event_type
        |  AND nd.n_days = r.rn
        |ORDER BY r.event_type NULLS FIRST""".stripMargin,
    // 14 pivoted per-dow integer moments; the between-group sum is
    // the same fixed-order 7-term double expression as the engine's
    "window_seasonal_strength" -> {
      val dowTerm = (1 to 7).map(k =>
        s"""CASE WHEN nd$k = 0 THEN 0e0
           |ELSE CAST(sr$k AS DOUBLE) * CAST(sr$k AS DOUBLE)
           |  / CAST(nd$k AS DOUBLE) END""".stripMargin)
        .mkString(" + ")
      val dowCols = (1 to 7).map(k =>
        s"""CAST(SUM(CASE WHEN dow = $k THEN 1 ELSE 0 END) AS BIGINT)
           |      AS nd$k,
           |    CAST(SUM(CASE WHEN dow = $k THEN r ELSE 0 END)
           |      AS BIGINT) AS sr$k""".stripMargin).mkString(",\n    ")
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
         |  FROM events GROUP BY 1, 2
         |), f AS (
         |  SELECT event_type, day, c,
         |    SUM(c) OVER w AS sum7, COUNT(*) OVER w AS n7
         |  FROM daily
         |  WINDOW w AS (PARTITION BY event_type ORDER BY day
         |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
         |), r AS (
         |  SELECT event_type, CAST(dayofweek(day) + 1 AS INTEGER) AS dow,
         |    7 * c - sum7 AS r
         |  FROM f WHERE n7 = 7
         |), g AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(r) AS BIGINT) AS s1,
         |    CAST(SUM(r * r) AS BIGINT) AS s2,
         |    $dowCols
         |  FROM r GROUP BY 1
         |)
         |SELECT event_type, n,
         |  ROUND(GREATEST(0e0, (($dowTerm)
         |    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
         |      / CAST(n AS DOUBLE))
         |  / (CAST(s2 AS DOUBLE)
         |    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
         |      / CAST(n AS DOUBLE))), 6) AS seasonal_strength
         |FROM g ORDER BY event_type NULLS FIRST""".stripMargin
    },
    // integer extrema products; Kendall moments close in one double
    "window_turning_points" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2
        |), f AS (
        |  SELECT event_type, c,
        |    LAG(c) OVER w AS pc, LEAD(c) OVER w AS nc
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day)
        |), g AS (
        |  SELECT event_type,
        |    CAST(COUNT(*) + 2 AS BIGINT) AS n_days,
        |    CAST(SUM(CASE WHEN (c - pc) * (nc - c) < 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_turning
        |  FROM f WHERE pc IS NOT NULL AND nc IS NOT NULL
        |  GROUP BY 1
        |)
        |SELECT event_type, n_days, n_turning,
        |  ROUND((CAST(n_turning AS DOUBLE)
        |    - 2e0 * CAST(n_days - 2 AS DOUBLE) / 3e0)
        |    / SQRT(CAST(16 * n_days - 29 AS DOUBLE) / 90e0), 6)
        |    AS z_stat
        |FROM g ORDER BY event_type NULLS FIRST""".stripMargin,
    // decimal weekly masses cumulated per cohort; integer cohort
    // sizes; one LTV division per row
    "window_cohort_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(value AS DECIMAL(18,4)) AS v
        |  FROM events
        |), f AS (
        |  SELECT user_id,
        |    CAST(date_trunc('week', MIN(day)) AS DATE) AS cohort_week
        |  FROM ev GROUP BY 1
        |), sz AS (
        |  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_users
        |  FROM f GROUP BY 1
        |), wk AS (
        |  SELECT f.cohort_week,
        |    (ev.day - f.cohort_week) // 7 AS age_week,
        |    SUM(ev.v) AS wk_value
        |  FROM ev JOIN f ON ev.user_id = f.user_id
        |  GROUP BY 1, 2
        |), c AS (
        |  SELECT cohort_week, age_week,
        |    SUM(wk_value) OVER (PARTITION BY cohort_week
        |      ORDER BY age_week
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum_value
        |  FROM wk
        |)
        |SELECT c.cohort_week, CAST(age_week AS INTEGER) AS age_week,
        |  n_users,
        |  ROUND(CAST(cum_value AS DOUBLE) / CAST(n_users AS DOUBLE),
        |    6) AS ltv_per_user
        |FROM c JOIN sz ON c.cohort_week = sz.cohort_week
        |ORDER BY c.cohort_week, age_week""".stripMargin,
    // integer daily cells; cumulative above the day rollup; two
    // double closes against the 1% budget
    "window_slo_burn" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS total,
        |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS errors
        |  FROM events GROUP BY 1
        |), c AS (
        |  SELECT day, total, errors,
        |    SUM(errors) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum_err,
        |    SUM(total) OVER () AS period_total
        |  FROM daily
        |)
        |SELECT day, total, errors,
        |  ROUND(CAST(errors AS DOUBLE) / CAST(total AS DOUBLE)
        |    / 0.01e0, 6) AS burn_rate,
        |  ROUND(CAST(cum_err AS DOUBLE)
        |    / (0.01e0 * CAST(period_total AS DOUBLE)), 6)
        |    AS cum_budget_used
        |FROM c ORDER BY day""".stripMargin,
    // integer scaled prefix deviations; R·n exact; one √ of an
    // exact integer closes R/S
    "window_rescaled_range" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, day, c,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n,
        |    SUM(c) OVER (PARTITION BY event_type) AS s1,
        |    SUM(c * c) OVER (PARTITION BY event_type) AS s2
        |  FROM daily
        |), pp AS (
        |  SELECT event_type, n, s1, s2,
        |    SUM(n * c - s1) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        |  FROM m
        |), g AS (
        |  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_days,
        |    CAST(MAX(s1) AS BIGINT) AS s1, CAST(MAX(s2) AS BIGINT) AS s2,
        |    CAST(GREATEST(MAX(p), 0) AS BIGINT) AS p_max,
        |    CAST(LEAST(MIN(p), 0) AS BIGINT) AS p_min
        |  FROM pp GROUP BY 1
        |)
        |SELECT event_type, n_days, p_max - p_min AS rn_num,
        |  ROUND(CAST(p_max - p_min AS DOUBLE)
        |    / SQRT(CAST(n_days * s2 - s1 * s1 AS DOUBLE)), 6) AS rs_stat
        |FROM g ORDER BY event_type NULLS FIRST""".stripMargin,
    // integer lags/sums from one keyed window; trailing mean closes
    // as a single division, NULL until the 7-row frame fills
    "window_lag_features" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, day, cnt,
        |  LAG(cnt, 1) OVER w AS lag1,
        |  LAG(cnt, 7) OVER w AS lag7,
        |  cnt - LAG(cnt, 1) OVER w AS dod_delta,
        |  CASE WHEN COUNT(*) OVER f = 7
        |    THEN ROUND(CAST(SUM(cnt) OVER f AS DOUBLE) / 7e0, 6)
        |  END AS ma7
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY day),
        |  f AS (PARTITION BY event_type ORDER BY day
        |        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type NULLS FIRST, day""".stripMargin,
    // 7-row centered frame → integer residual numerators → one
    // double division per (type, dow); DuckDB dow is 0-based
    "window_seasonal_index" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |), f AS (
        |  SELECT event_type, day, cnt,
        |    SUM(cnt) OVER w AS sum7, COUNT(*) OVER w AS n7
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |), r AS (
        |  SELECT event_type,
        |    CAST(dayofweek(day) + 1 AS INTEGER) AS dow,
        |    7 * cnt - sum7 AS resid_num
        |  FROM f WHERE n7 = 7
        |)
        |SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  ROUND(CAST(SUM(resid_num) AS DOUBLE)
        |    / (7e0 * CAST(COUNT(*) AS DOUBLE)), 6) AS seasonal
        |FROM r GROUP BY 1, 2
        |ORDER BY event_type NULLS FIRST, dow""".stripMargin,
    // day-banded self-join over the daily aggregate; exact two-pick
    // median of ≤6 integer-delta slopes; (lo+hi)/2e0 closure
    "window_theil_sen" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt,
        |    CAST(ts AS DATE) - DATE '1970-01-01' AS dd
        |  FROM events GROUP BY 1, 2
        |), pairs AS (
        |  SELECT b.event_type, b.day,
        |    CAST(b.cnt - a.cnt AS DOUBLE) / CAST(b.dd - a.dd AS DOUBLE)
        |      AS slope,
        |    a.dd AS dd_src
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type
        |   AND b.dd - a.dd BETWEEN 1 AND 6
        |), r AS (
        |  SELECT event_type, day, slope,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, day
        |      ORDER BY slope, dd_src) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type, day) AS m
        |  FROM pairs
        |), picked AS (
        |  SELECT event_type, day, slope, m FROM r
        |  WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1
        |)
        |SELECT event_type, day, CAST(MAX(m) AS BIGINT) AS n_slopes,
        |  ROUND((MIN(slope) + MAX(slope)) / 2e0, 6) AS ts_slope
        |FROM picked GROUP BY 1, 2
        |ORDER BY event_type NULLS FIRST, day""".stripMargin,
    // derived check: exact 30-day MAU via date fan-out; the sketch
    // estimate's 5% bound is pinned TRUE (lgK=14 ⇒ ~0.8% typical)
    "window_mau_sketch" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), dau AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
        |  FROM ud GROUP BY day
        |), f AS (
        |  SELECT DISTINCT user_id, day + CAST(u.i AS INTEGER) AS day
        |  FROM ud, LATERAL unnest(range(0, 30)) AS u(i)
        |), mau AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS mau_exact
        |  FROM f GROUP BY day
        |)
        |SELECT day, dau, mau_exact, TRUE AS est_within_5pct
        |FROM dau JOIN mau USING (day)
        |ORDER BY day""".stripMargin,
    // oracle states the sweep as ONE global running sum; the engine's
    // bucketed prefix-sum decomposition must reach identical day peaks
    // (per-row tie order differs, the per-day max cannot — the value
    // multiset within an equal-(us,delta) run is fixed)
    "window_max_concurrency" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_us IS NULL
        |           OR epoch_us(ts) - prev_us > 1800 * 1000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM o),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        |  FROM m),
        |sess AS (
        |  SELECT user_id, session_no,
        |    MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us
        |  FROM s GROUP BY user_id, session_no),
        |deltas AS (
        |  SELECT start_us AS us, 1 AS delta FROM sess
        |  UNION ALL
        |  SELECT end_us AS us, -1 AS delta FROM sess),
        |r AS (
        |  SELECT us, CAST(SUM(delta) OVER (ORDER BY us, delta DESC
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        |  FROM deltas)
        |SELECT CAST(make_timestamp(us) AS DATE) AS day,
        |  MAX(run) AS peak, CAST(COUNT(*) AS BIGINT) AS n_boundaries
        |FROM r GROUP BY 1 ORDER BY day""".stripMargin,
    // all-integer largest-remainder allocation; alloc multiset is
    // rank-order-independent for identical duplicate rows; `exact`
    // asserts the cents conservation inside the result
    "window_allocate_remainder" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS w
        |  FROM lineitem
        |), j AS (
        |  SELECT li.l_orderkey, l_linenumber, w,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS tt,
        |    CAST(SUM(w) OVER (PARTITION BY li.l_orderkey) AS BIGINT) AS ww
        |  FROM li JOIN orders ON o_orderkey = li.l_orderkey
        |), b AS (
        |  SELECT l_orderkey, l_linenumber, w, tt,
        |    (tt * w) // ww AS base, (tt * w) % ww AS rem,
        |    tt - CAST(SUM((tt * w) // ww)
        |      OVER (PARTITION BY l_orderkey) AS BIGINT) AS r_extra,
        |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |      ORDER BY (tt * w) % ww DESC, l_linenumber, w) AS rn
        |  FROM j
        |), a AS (
        |  SELECT l_orderkey, l_linenumber, w, tt,
        |    base + CASE WHEN rn <= r_extra THEN 1 ELSE 0 END AS alloc_cents
        |  FROM b
        |)
        |SELECT l_orderkey, l_linenumber, w, alloc_cents,
        |  CAST(SUM(alloc_cents) OVER (PARTITION BY l_orderkey) AS BIGINT)
        |    = tt AS exact
        |FROM a
        |ORDER BY l_orderkey, l_linenumber, alloc_cents""".stripMargin,
    // exact integer gaps from one lead(); exact decimal mass sum; one
    // identical closing double division
    "window_twap" ->
      """WITH e AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    epoch_us(ts) AS tsu, event_id,
        |    CAST(value AS DECIMAL(18,4)) AS v
        |  FROM events),
        |g AS (
        |  SELECT event_type, day, v,
        |    LEAD(tsu) OVER (PARTITION BY event_type, day
        |                    ORDER BY tsu, event_id) - tsu AS gap_us
        |  FROM e)
        |SELECT event_type, day, COUNT(*) AS n_intervals,
        |  CAST(SUM(gap_us) AS BIGINT) AS span_us,
        |  ROUND(CAST(SUM(v * gap_us) AS DOUBLE) /
        |        CAST(CAST(SUM(gap_us) AS BIGINT) AS DOUBLE), 6) AS twap
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY event_type, day
        |ORDER BY event_type NULLS FIRST, day""".stripMargin,
    // exact frame sums over <=7 daily rows; identical Pearson text;
    // zero-variance guard = exact MIN<>MAX over the frame (no decimal
    // products, so no 38-digit precision loss)
    "window_rolling_corr" ->
      """WITH dd AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS y
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |f AS (
        |  SELECT event_type, day,
        |    COUNT(*) OVER w AS n7,
        |    SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
        |    SUM(x * y) OVER w AS sxy, SUM(x * x) OVER w AS sxx,
        |    SUM(y * y) OVER w AS syy,
        |    MIN(x) OVER w AS mnx, MAX(x) OVER w AS mxx,
        |    MIN(y) OVER w AS mny, MAX(y) OVER w AS mxy
        |  FROM dd
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, n7,
        |  CASE WHEN mnx <> mxx AND mny <> mxy
        |  THEN ROUND(
        |    (CAST(n7 AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    sqrt((CAST(n7 AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |         (CAST(n7 AS DOUBLE) * CAST(syy AS DOUBLE) -
        |          CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |  END AS corr7
        |FROM f
        |ORDER BY event_type NULLS FIRST, day""".stripMargin,
    "window_vwap" ->
      """SELECT event_type,
        |  epoch_us(date_trunc('hour', ts)) AS hour_us,
        |  COUNT(*) AS n,
        |  CAST(SUM(1 + event_id % 5) AS BIGINT) AS vol,
        |  CAST((CAST(SUM(CAST(value AS DECIMAL(19,4)) *
        |                 (1 + event_id % 5)) * 10000 AS BIGINT) * 100)
        |       // SUM(1 + event_id % 5) AS BIGINT) AS vwap_micro
        |FROM events GROUP BY 1, 2 ORDER BY 1 NULLS FIRST, 2""".stripMargin,
    // identical formula text after the decimal-exact window sums; the
    // RANGE interval frame is precision-safe (all fixture timestamps
    // are micro-aligned, asserted when window_range_interval landed)
    "window_zscore_rolling" ->
      """SELECT event_id, user_id, v AS value_q,
        |  CAST(ROUND(((v - sx / n) /
        |    sqrt((sxx - sx * sx / n) / (n - 1))) * 1000, 0)
        |    AS BIGINT) AS z_milli
        |FROM (
        |  SELECT event_id, user_id,
        |    COUNT(*) OVER w AS n,
        |    CAST(SUM(vq) OVER w AS DOUBLE) AS sx,
        |    CAST(SUM(vq * vq) OVER w AS DOUBLE) AS sxx,
        |    CAST(vq AS DOUBLE) AS v
        |  FROM (SELECT event_id, user_id, ts,
        |          CAST(value AS DECIMAL(19,4)) AS vq FROM events)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
        |) t
        |WHERE n > 1 AND (sxx - sx * sx / n) / (n - 1) > 0
        |ORDER BY event_id""".stripMargin,
    // decimal gain/loss masses; 100·G/(G+L) is the only float division
    "window_rsi" ->
      """SELECT event_type, day, CAST(n14 AS BIGINT) AS n14,
        |  ROUND(100.0 * CAST(sg AS DOUBLE) /
        |        CAST(sg + sl AS DOUBLE), 4) AS rsi
        |FROM (
        |  SELECT event_type, day,
        |    COUNT(*) OVER w AS n14,
        |    SUM(CASE WHEN chg > 0 THEN chg
        |        ELSE CAST(0 AS DECIMAL(19,4)) END) OVER w AS sg,
        |    SUM(CASE WHEN chg < 0 THEN -chg
        |        ELSE CAST(0 AS DECIMAL(19,4)) END) OVER w AS sl
        |  FROM (
        |    SELECT event_type, day,
        |      dv - lag(dv) OVER (PARTITION BY event_type ORDER BY day)
        |        AS chg
        |    FROM (SELECT event_type, CAST(ts AS DATE) AS day,
        |            CAST(SUM(CAST(value AS DECIMAL(19,4)))
        |              AS DECIMAL(18,4)) AS dv
        |          FROM events GROUP BY 1, 2)
        |  ) t1 WHERE chg IS NOT NULL
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |) t2 WHERE n14 = 14 AND sg + sl > 0
        |ORDER BY event_type NULLS FIRST, day""".stripMargin,
    // identical exact-moment discipline as window_zscore_rolling; the
    // band comparison runs on identical doubles both sides
    "window_bollinger" ->
      """SELECT event_type, day,
        |  ROUND(v, 2) AS v,
        |  ROUND(m, 4) AS mid,
        |  ROUND(m + 2 * sd, 4) AS upper,
        |  ROUND(m - 2 * sd, 4) AS lower,
        |  CAST(v > m + 2 * sd OR v < m - 2 * sd AS BOOLEAN) AS breach
        |FROM (
        |  SELECT event_type, day, n, v, sx / n AS m,
        |    sqrt((sxx - sx * sx / n) / (n - 1)) AS sd
        |  FROM (
        |    SELECT event_type, day,
        |      COUNT(*) OVER w AS n,
        |      CAST(dv AS DOUBLE) AS v,
        |      CAST(SUM(dv) OVER w AS DOUBLE) AS sx,
        |      CAST(SUM(dv * dv) OVER w AS DOUBLE) AS sxx
        |    FROM (SELECT event_type, CAST(ts AS DATE) AS day,
        |            CAST(SUM(CAST(value AS DECIMAL(19,4)))
        |              AS DECIMAL(18,4)) AS dv
        |          FROM events GROUP BY 1, 2)
        |    WINDOW w AS (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |  ) t1 WHERE n = 20 AND (sxx - sx * sx / n) / (n - 1) > 0
        |) t2
        |ORDER BY event_type NULLS FIRST, day""".stripMargin,
    // rank-exact day-multiset median (quantile_disc ↔
    // approx_percentile@1e6, the agg_quantile_approx precedent); the
    // oracle states the trailing-week semantics directly as a grouped
    // day-range join — the Spark side computes the same groups via the
    // bounded 7-day fan-out
    "window_rolling_median" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(value AS DECIMAL(19,4)) AS vq
        |  FROM events
        |), days AS (SELECT DISTINCT user_id, day FROM e)
        |SELECT d.user_id, d.day, CAST(COUNT(*) AS BIGINT) AS n7,
        |  CAST(quantile_disc(e.vq, 0.5) AS DOUBLE) AS med7
        |FROM days d JOIN e ON e.user_id = d.user_id
        |  AND e.day >= d.day - 6 AND e.day <= d.day
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // micro-resolution order keys (epoch_us floors the nanos) — same
    // total order as the engine's event-time contract
    // mean-cleared (n·v − Σv) cumulative series, DECIMAL-exact; both
    // running aggregates on one user partitioning; maxima close in
    // one division by n each
    "window_drawdown" ->
      """WITH m AS (
        |  SELECT user_id, epoch_us(ts) AS tsu, event_id,
        |    CAST(value AS DECIMAL(19,4)) AS v,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n,
        |    SUM(CAST(value AS DECIMAL(19,4)))
        |      OVER (PARTITION BY user_id) AS total
        |  FROM events
        |), c AS (
        |  SELECT user_id, tsu, event_id, n,
        |    SUM(n * v - total) OVER w AS cum
        |  FROM m
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY tsu, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), d AS (
        |  SELECT user_id, n, cum,
        |    MAX(cum) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
        |  FROM c
        |)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(CAST(2 * CAST(MAX(runmax - cum) * 10000 AS DECIMAL(38,0))
        |      + 100 * MAX(n) AS HUGEINT)
        |    // CAST(200 * MAX(n) AS HUGEINT) AS DOUBLE) / 100
        |    AS max_drawdown,
        |  CAST(CAST(2 * CAST(MAX(cum) * 10000 AS DECIMAL(38,0))
        |      + 100 * MAX(n) AS HUGEINT)
        |    // CAST(200 * MAX(n) AS HUGEINT) AS DOUBLE) / 100
        |    AS peak_cum
        |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin,
    // replays the integer CUSUM fold as a recursive CTE; dev and total
    // pass through BIGINT casts (DuckDB SUM -> HUGEINT)
    // mean-cleared integer deviations, cumulative + running min +
    // max excursion all exact; one closing division
    "window_page_hinkley" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(SUM(x) AS BIGINT) AS total,
        |    CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY 1),
        |c AS (
        |  SELECT d.event_type, n_days, day,
        |    CAST(SUM(n_days * x - total) OVER (
        |      PARTITION BY d.event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM daily d JOIN tot USING (event_type)),
        |r AS (
        |  SELECT event_type, n_days, cum,
        |    CAST(MIN(cum) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS runmin
        |  FROM c)
        |SELECT event_type, n_days,
        |  CAST(MAX(cum - runmin) AS BIGINT) AS ph_scaled,
        |  ROUND(CAST(MAX(cum - runmin) AS DOUBLE) / n_days, 4) AS ph_stat
        |FROM r GROUP BY 1, 2 ORDER BY event_type NULLS FIRST""".stripMargin,
    "window_cusum" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1, 2
        |), tot AS (
        |  SELECT event_type, SUM(x) AS total, COUNT(*) AS n_days
        |  FROM daily GROUP BY 1
        |), ser AS (
        |  SELECT d.event_type, d.day,
        |    CAST(t.n_days * d.x - t.total AS BIGINT) AS dev,
        |    ROW_NUMBER() OVER (PARTITION BY d.event_type
        |      ORDER BY d.day) AS rn
        |  FROM daily d JOIN tot t USING (event_type)
        |), st(event_type, rn, s, smax, dmax) AS (
        |  SELECT event_type, 0, CAST(0 AS BIGINT), CAST(-1 AS BIGINT),
        |    CAST(NULL AS DATE)
        |  FROM tot
        |  UNION ALL
        |  SELECT e.event_type, e.rn,
        |    GREATEST(CAST(0 AS BIGINT), s.s + e.dev),
        |    CASE WHEN GREATEST(CAST(0 AS BIGINT), s.s + e.dev) > s.smax
        |         THEN GREATEST(CAST(0 AS BIGINT), s.s + e.dev)
        |         ELSE s.smax END,
        |    CASE WHEN GREATEST(CAST(0 AS BIGINT), s.s + e.dev) > s.smax
        |         THEN e.day ELSE s.dmax END
        |  FROM st s JOIN ser e ON e.event_type = s.event_type
        |    AND e.rn = s.rn + 1
        |)
        |SELECT s.event_type, t.n_days, CAST(t.total AS BIGINT) AS total,
        |  s.smax AS max_cusum_scaled, CAST(s.dmax AS VARCHAR) AS alarm_day
        |FROM st s JOIN tot t USING (event_type)
        |WHERE s.rn = t.n_days
        |ORDER BY s.event_type NULLS FIRST""".stripMargin,
    "window_debounce" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events
        |)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN prev_us IS NULL
        |       OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_emitted,
        |  CAST(COUNT(*) - SUM(CASE WHEN prev_us IS NULL
        |       OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_suppressed
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,
    // integer daily counts and error sums; two closing divisions
    "window_forecast_backtest" ->
      """WITH dly AS (
        |  SELECT event_type,
        |    epoch_us(date_trunc('day', ts)) AS day_us,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), sc AS (
        |  SELECT event_type, n,
        |    lag(n, 7) OVER (PARTITION BY event_type ORDER BY day_us)
        |      AS pred
        |  FROM dly
        |), g AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(ABS(n - pred)) AS BIGINT) AS abs_err_sum,
        |    CAST(SUM(n - pred) AS BIGINT) AS bias_sum
        |  FROM sc WHERE pred IS NOT NULL GROUP BY 1
        |)
        |SELECT event_type, n_days, abs_err_sum,
        |  ROUND(abs_err_sum / CAST(n_days AS DOUBLE), 6) AS mae,
        |  ROUND(bias_sum / CAST(n_days AS DOUBLE), 6) AS bias
        |FROM g ORDER BY event_type NULLS FIRST""".stripMargin,
    "window_wow_growth" ->
      """WITH w AS (
        |  SELECT event_type,
        |    epoch_us(date_trunc('week', ts)) AS week_us,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, week_us, n,
        |  lag(n) OVER (PARTITION BY event_type ORDER BY week_us)
        |    AS prev_n,
        |  ROUND(CAST(n AS DOUBLE) /
        |    lag(n) OVER (PARTITION BY event_type ORDER BY week_us)
        |    - 1.0, 4) AS wow_growth
        |FROM w ORDER BY event_type NULLS FIRST, week_us""".stripMargin,
    "window_rfm" ->
      """WITH u AS (
        |  SELECT user_id, MAX(epoch_us(ts)) AS last_us,
        |    COUNT(*) AS freq,
        |    SUM(CAST(value AS DECIMAL(19,4))) AS mon_d
        |  FROM events GROUP BY 1
        |), r AS (
        |  SELECT user_id,
        |    CAST((MAX(last_us) OVER () - last_us) // 1000000 AS BIGINT)
        |      AS recency_s,
        |    freq, CAST(mon_d AS DOUBLE) AS monetary
        |  FROM u
        |), q AS (
        |  SELECT user_id, recency_s, freq, monetary,
        |    ntile(5) OVER (ORDER BY recency_s ASC, user_id) AS r,
        |    ntile(5) OVER (ORDER BY freq DESC, user_id) AS f,
        |    ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m
        |  FROM r
        |)
        |SELECT user_id, recency_s, freq, ROUND(monetary, 2) AS monetary,
        |  CAST(r AS INTEGER) AS r, CAST(f AS INTEGER) AS f,
        |  CAST(m AS INTEGER) AS m,
        |  CAST(r * 100 + f * 10 + m AS INTEGER) AS rfm_code
        |FROM q ORDER BY user_id""".stripMargin,
    "window_pareto" ->
      """WITH x AS (
        |  SELECT event_type, user_id, COUNT(*) AS x
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT event_type, x,
        |    ROW_NUMBER() OVER w AS r,
        |    SUM(x) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cum,
        |    SUM(x) OVER (PARTITION BY event_type) AS total
        |  FROM x
        |  WINDOW w AS (PARTITION BY event_type ORDER BY x DESC, user_id)
        |)
        |SELECT event_type, MIN(r) AS users_for_80pct, MAX(r) AS n_users,
        |  CAST(MAX(total) AS BIGINT) AS n_events,
        |  ROUND(CAST(MIN(r) AS DOUBLE) / MAX(r), 4)
        |    AS user_share_for_80pct
        |FROM r WHERE cum * 10 >= total * 8
        |GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,
    "window_streak" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    CAST(ts AS DATE) - DATE '1970-01-01' AS day_n
        |  FROM events
        |), grps AS (
        |  SELECT user_id, day_n,
        |    day_n - ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY day_n) AS grp
        |  FROM days
        |), streaks AS (
        |  SELECT user_id, grp, COUNT(*) AS streak
        |  FROM grps GROUP BY 1, 2
        |)
        |SELECT user_id, MAX(streak) AS max_streak,
        |  CAST(SUM(streak) AS BIGINT) AS n_active_days,
        |  COUNT(*) AS n_streaks
        |FROM streaks GROUP BY user_id ORDER BY user_id""".stripMargin,
    "window_resample_ohlc" ->
      """SELECT event_type,
        |  epoch_us(date_trunc('hour', ts)) AS hour_us,
        |  arg_min(value, CAST(epoch_us(ts) AS HUGEINT) * 10000000000
        |    + event_id) AS open,
        |  MAX(value) AS high,
        |  MIN(value) AS low,
        |  arg_max(value, CAST(epoch_us(ts) AS HUGEINT) * 10000000000
        |    + event_id) AS close,
        |  COUNT(*) AS n_ticks
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1 NULLS FIRST, 2""".stripMargin,
    "window_interval_coverage" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS st,
        |    epoch_us(ts) + 900000000 AS en
        |  FROM events
        |), marked AS (
        |  SELECT user_id, event_id, st, en,
        |    CASE WHEN st > COALESCE(
        |      MAX(en) OVER (PARTITION BY user_id
        |        ORDER BY st, en, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      -9223372036854775808) THEN 1 ELSE 0 END AS new_island
        |  FROM iv
        |), islands AS (
        |  SELECT user_id, st, en,
        |    SUM(new_island) OVER (PARTITION BY user_id
        |      ORDER BY st, en, event_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS island
        |  FROM marked
        |), extents AS (
        |  SELECT user_id, island, MIN(st) AS i_start, MAX(en) AS i_end
        |  FROM islands GROUP BY 1, 2
        |)
        |SELECT user_id, COUNT(*) AS n_islands,
        |  CAST(SUM(i_end - i_start) AS BIGINT) AS covered_us
        |FROM extents GROUP BY user_id ORDER BY user_id""".stripMargin,
    "window_ewma" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    ROUND(SUM(value), 2) AS day_value
        |  FROM events WHERE user_id < 20 GROUP BY 1, 2),
        |w AS (
        |  SELECT user_id, day, day_value,
        |    list(day_value) OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS hist
        |  FROM daily),
        |e AS (
        |  SELECT user_id, day, day_value, len(hist) AS n,
        |    (SELECT SUM(CAST(hist[CAST(i AS INTEGER)] AS DECIMAL(18,4)) *
        |                CAST(POWER(2.0, i) AS DECIMAL(18,0)))
        |     FROM unnest(range(1, len(hist) + 1)) AS r(i)) AS num
        |  FROM w)
        |SELECT user_id, day, day_value,
        |  ROUND(CAST(num AS DOUBLE) / (POWER(2.0, n + 1) - 2.0), 4) AS ewma
        |FROM e ORDER BY user_id, day""".stripMargin,
    "window_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    ROUND(SUM(value), 2) AS day_value, COUNT(*) AS n_events
        |  FROM events WHERE user_id < 20 GROUP BY 1, 2),
        |cal AS (
        |  SELECT user_id, CAST(g.d AS DATE) AS day
        |  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
        |        FROM daily GROUP BY user_id) s,
        |    LATERAL unnest(generate_series(CAST(s.d0 AS TIMESTAMP),
        |      CAST(s.d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS g(d))
        |SELECT c.user_id, c.day,
        |  dy.day_value IS NULL AS is_gap,
        |  COALESCE(dy.n_events, 0) AS n_events,
        |  LAST_VALUE(dy.day_value IGNORE NULLS) OVER (
        |    PARTITION BY c.user_id ORDER BY c.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS filled_value
        |FROM cal c LEFT JOIN daily dy USING (user_id, day)
        |ORDER BY c.user_id, c.day""".stripMargin,
    "window_count_distinct" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority,
        |  COUNT(DISTINCT o_orderpriority)
        |    OVER (PARTITION BY o_custkey) AS n_distinct_prio
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "window_session" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_us IS NULL
        |           OR epoch_us(ts) - prev_us > 1800 * 1000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM o),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        |  FROM m)
        |SELECT user_id, session_no,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY user_id, session_no
        |ORDER BY user_id, session_no""".stripMargin,
    "window_range_interval" ->
      """SELECT event_id,
        |  COUNT(*) OVER w AS cnt_1h,
        |  ROUND(MAX(value) OVER w, 2) AS max_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "window_top_k_per_group" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(rn AS INTEGER) AS rn
        |FROM r WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "window_ignore_nulls" ->
      """SELECT event_id, user_id,
        |  LAG(CASE WHEN event_type = 'view' THEN NULL ELSE value END
        |      IGNORE NULLS) OVER w AS prev_nn,
        |  LAST_VALUE(CASE WHEN event_type = 'view' THEN NULL ELSE value END
        |      IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY event_id""".stripMargin,
    "window_distribution" ->
      """SELECT o_orderkey, o_orderpriority,
        |  ROUND(PERCENT_RANK() OVER w, 6) AS pr,
        |  ROUND(CUME_DIST() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice ASC, o_orderkey ASC)
        |ORDER BY o_orderkey""".stripMargin,
    "window_rank" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn,
        |  CAST(RANK() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC) AS INTEGER) AS rk,
        |  CAST(DENSE_RANK() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC) AS INTEGER) AS drk,
        |  CAST(NTILE(4) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS nt
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "window_analytic" ->
      """SELECT o_orderkey, o_custkey,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  LEAD(o_totalprice, 1) OVER w AS next_price,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_ok,
        |  LAST_VALUE(o_orderkey) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_orderkey""".stripMargin,
    "window_frame_running" ->
      """WITH g AS (
        |  SELECT l_orderkey, l_linenumber, ROUND(SUM(l_quantity), 2) AS qty
        |  FROM lineitem GROUP BY l_orderkey, l_linenumber)
        |SELECT l_orderkey, l_linenumber, qty,
        |  ROUND(SUM(qty) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        |FROM g ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "window_range_frame" ->
      """SELECT o_orderkey, o_orderpriority,
        |  COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |    RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS cnt_band,
        |  MAX(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |    RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS max_band
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
