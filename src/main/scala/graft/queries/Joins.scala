package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Join surface (SURVEY.md §2.2 "Joins" — absent from the reference, which
  * is a single-stream ingest; this is the engine's relational extension).
  *
  * Scale notes per query:
  *  - equi joins on surrogate keys shuffle both sides on the key; Catalyst
  *    picks sort-merge for large×large and broadcast-hash when one side is
  *    under `spark.sql.autoBroadcastJoinThreshold`. At 100 TB the
  *    orders⋈customer join would be bucketed on the key to avoid the
  *    shuffle entirely (see PERF.md).
  *  - `joinBroadcast` pins the dimension side with `broadcast()` — no
  *    shuffle at any scale for small dims.
  *  - theta/band joins have no hash strategy; Spark uses
  *    BroadcastNestedLoopJoin. Keep the broadcast side a dimension table.
  *  - the as-of join is expressed as bounded-condition join + per-key
  *    `row_number` pick: both sides shuffle once on the join key and the
  *    window reuses that partitioning (no extra shuffle).
  */
object Joins {

  private def ordersCust(s: SparkSession, d: String): (DataFrame, DataFrame) =
    (t(s, d, "orders"), t(s, d, "customer"))

  def joinInnerEqui(s: SparkSession, d: String): DataFrame = {
    val (o, c) = ordersCust(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** High-price orders per customer; customers with none keep nulls. */
  def joinLeftOuter(s: SparkSession, d: String): DataFrame = {
    val (o, c) = ordersCust(s, d)
    val big = o.filter(col("o_totalprice") > 300000.0)
    c.join(big, c("c_custkey") === big("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)
  }

  def joinRightOuter(s: SparkSession, d: String): DataFrame = {
    val (o, c) = ordersCust(s, d)
    val big = o.filter(col("o_totalprice") > 300000.0)
    big.join(c, big("o_custkey") === c("c_custkey"), "right")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)
  }

  def joinFullOuter(s: SparkSession, d: String): DataFrame = {
    val (o, c) = ordersCust(s, d)
    val lowNat = c.filter(col("c_nationkey") < 13)
    val big = o.filter(col("o_totalprice") > 300000.0)
    lowNat.join(big, lowNat("c_custkey") === big("o_custkey"), "full")
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
  }

  def joinSemi(s: SparkSession, d: String): DataFrame = {
    val (o, c) = ordersCust(s, d)
    val big = o.filter(col("o_totalprice") > 350000.0)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Existence-mark projection: every customer with a has_big_order
    * flag — the keep-all-rows complement of semi/anti. Shape: the probe
    * side reduces to DISTINCT keys before the left join (the mark join
    * rewrite), so the join ships one row per key, not one per order,
    * and no row multiplication can occur. */
  def joinExistsFlag(s: SparkSession, d: String): DataFrame = {
    val (o, c) = ordersCust(s, d)
    val bigKeys = o.filter(col("o_totalprice") > 350000.0)
      .select(col("o_custkey")).distinct()
      .withColumn("mark", lit(true))
    c.join(bigKeys, c("c_custkey") === bigKeys("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("mark"), lit(false)).as("has_big_order"))
      .orderBy(col("c_custkey"))
  }

  def joinAnti(s: SparkSession, d: String): DataFrame = {
    val (o, c) = ordersCust(s, d)
    val big = o.filter(col("o_totalprice") > 350000.0)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Explicit broadcast of the small dimension (region, 5 rows). */
  def joinBroadcast(s: SparkSession, d: String): DataFrame = {
    val n = t(s, d, "nation")
    val r = t(s, d, "region")
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "inner")
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy(col("n_nationkey"))
  }

  /** Band (theta) join: customers within ±100 of a supplier's balance. */
  def joinThetaRange(s: SparkSession, d: String): DataFrame = {
    val sup = t(s, d, "supplier")
      .select(col("s_suppkey"), col("s_acctbal"))
    val c = t(s, d, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    // A theta join has no equi key, so one side MUST broadcast (BNLJ);
    // broadcast supplier — the dimension-sized side (10x smaller here,
    // bounded at scale) — and stream customer, the fact-like side.
    c.join(
        broadcast(sup),
        col("c_acctbal") >= col("s_acctbal") - 100.0 &&
          col("c_acctbal") <= col("s_acctbal") + 100.0)
      .select(col("s_suppkey"), col("c_custkey"), col("s_acctbal"), col("c_acctbal"))
      .orderBy(col("s_suppkey"), col("c_custkey"))
  }

  /** The same band join as [[joinThetaRange]], re-expressed as the
    * 100 TB shape: bucketize both balances into width-100 bins, explode
    * the smaller side into its 3 candidate bins, hash-join on the bin
    * key, filter exactly. No nested-loop anywhere — when BOTH sides are
    * too big to broadcast this is THE scalable range join (candidates
    * per row are bounded by bin occupancy, not the other table's size).
    * Any pair within +-100 differs by at most one bin (width = range),
    * so the 3-bin explode is complete; a pair matches exactly one bin
    * (the customer's), so no dedup pass is needed. */
  def joinRangeBucketed(s: SparkSession, d: String): DataFrame = {
    val sup = t(s, d, "supplier")
      .select(col("s_suppkey"), col("s_acctbal"),
        floor(col("s_acctbal") / 100.0).cast("long").as("b0"))
    val supExp = sup.select(col("s_suppkey"), col("s_acctbal"),
      explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("bucket"))
    val c = t(s, d, "customer")
      .select(col("c_custkey"), col("c_acctbal"),
        floor(col("c_acctbal") / 100.0).cast("long").as("bucket"))
    c.join(supExp, "bucket")
      .filter(col("c_acctbal") >= col("s_acctbal") - 100.0 &&
        col("c_acctbal") <= col("s_acctbal") + 100.0)
      .select(col("s_suppkey"), col("c_custkey"),
        col("s_acctbal"), col("c_acctbal"))
      .orderBy(col("s_suppkey"), col("c_custkey"))
  }

  /** Bloom-filter runtime-pruned fact join — the 100 TB shuffle killer:
    * a SELECTIVE dimension filter (urgent half-million-dollar orders)
    * means most lineitem rows will not survive the join, yet a plain
    * shuffle join still moves ALL of lineitem. Spark's runtime bloom
    * filter (`spark.sql.optimizer.runtime.bloomFilter.*`) builds a
    * bloom of the surviving order keys and injects
    * `bloom_filter_might_contain` into the fact scan, dropping
    * non-joining rows BEFORE the exchange. The query's RESULT is
    * filter-independent (the oracle is the plain join); PlanSpec
    * asserts the injection fires with cluster-scale thresholds. At the
    * fixture's statistics Spark may elide it (cheaper to just shuffle)
    * — also correct. */
  def joinBloomPrune(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"), col("o_totalprice"))
    t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_quantity").cast("decimal(18,4)")), 2)
          .cast("double").as("sum_qty"))
      .orderBy(col("o_orderkey"))
  }

  /** Point-in-time lookup against an SCD2 dimension — "which segment
    * version was this user in when the purchase happened": the
    * time-travel join every feature store / warehouse runs against
    * versioned dimensions. NOT an interval join: both sides stack into
    * ONE relation tagged (dim-start | probe) and a single (user, time)
    * window carries the latest version forward onto each probe row —
    * one shuffle on the user key, zero joins, the scalable recipe (an
    * interval join would band-explode; this is linear in rows and
    * reuses the exact partitioning the SCD2 build itself needs). Dim
    * rows sort before probes at equal timestamps (valid_from <= ts is
    * inclusive), versions ascending within the tie. */
  def joinScd2Pointintime(s: SparkSession, d: String): DataFrame = {
    val byTs = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ev = t(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val dim = ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(byTs))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(byTs))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        lit(0).as("tag"), col("version").cast("long").as("ord"),
        col("version"), col("event_type").as("seg_type"),
        lit(null).cast("long").as("event_id"))
    val probes = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        lit(1).as("tag"), col("event_id").as("ord"),
        lit(null).cast("int").as("version"),
        lit(null).cast("string").as("seg_type"), col("event_id"))
    val carry = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("tag"), col("ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dim.unionByName(probes)
      .withColumn("cur_version", last(col("version"), ignoreNulls = true)
        .over(carry))
      .withColumn("cur_type", last(col("seg_type"), ignoreNulls = true)
        .over(carry))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("cur_version").as("version"), col("cur_type").as("seg_type"))
      .orderBy(col("event_id"))
  }

  def joinCross(s: SparkSession, d: String): DataFrame =
    t(s, d, "region").crossJoin(t(s, d, "nation"))
      .select(col("r_regionkey"), col("n_nationkey"), col("r_name"), col("n_name"))
      .orderBy(col("r_regionkey"), col("n_nationkey"))

  /** As-of join: for each purchase event, the most recent prior 'view'
    * event of the same user (ties broken by highest event id).
    *
    * Round-12 re-cut to the 100 TB shape: an UNBOUNDED backward as-of
    * has no prunable candidate band, so the former keyed-join +
    * row_number pick made every purchase meet every same-user view —
    * O(Σᵤ purchasesᵤ·viewsᵤ) intermediate rows, quadratic in per-user
    * history. The scalable form is the [[joinScd2Pointintime]] recipe:
    * UNION views and purchases, ONE shuffle on the user key, and a
    * last-non-null carry-forward over (ts, tag, id) — linear in rows,
    * zero joins, and the tie-break is encoded in the sort (views
    * ascending by (ts, v_id) so the carried value at a purchase is
    * the latest prior view with the highest id; views sort before
    * purchases at equal ts, preserving the inclusive v_ts ≤ p_ts
    * bound). Output is byte-identical to the join form — the oracle
    * is unchanged. */
  def joinAsof(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events")
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        lit(0).as("tag"), col("event_id").as("ord"),
        col("event_id").as("v_id"),
        lit(null).cast("long").as("p_id"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        lit(1).as("tag"), col("event_id").as("ord"),
        lit(null).cast("long").as("v_id"),
        col("event_id").as("p_id"))
    val carry = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("tag"), col("ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v.unionByName(p)
      .withColumn("cur_v", last(col("v_id"), ignoreNulls = true)
        .over(carry))
      .filter(col("tag") === 1)
      .select(col("p_id"), col("cur_v").as("v_id"))
      .orderBy(col("p_id"))
  }

  /** FORWARD as-of join: for each view event, the same user's NEXT
    * purchase within 24 h — the label-construction shape of a training
    * pipeline ("did this impression convert?"), where the lookahead
    * bound is the leakage boundary: features may only see ≤ t, labels
    * only (t, t+horizon].
    *
    * Round-12 re-cut to the bucketed band-join shape (the backward
    * [[joinAsofTolerance]] recipe mirrored forward): purchases land in
    * 24 h buckets, each view probes its two covering (user, bucket)
    * keys, the exact (v_ts, v_ts+24h] predicate runs on the bucket
    * survivors, and the per-view arg-min is a rank filter
    * (WindowGroupLimit 1-heap). Candidate width rides per-user-per-day
    * purchase activity instead of whole-history purchase count.
    * Byte-identical output, oracle unchanged. */
  def joinAsofForward(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400000000L
    val e = t(s, d, "events")
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("uid"),
        unix_micros(col("ts")).as("v_us"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("uid"),
        unix_micros(col("ts")).as("p_us"))
      .withColumn("pb", expr(s"p_us div $dayUs"))
    val probes = v.withColumn("pb",
      explode(array(expr(s"v_us div $dayUs"),
        expr(s"v_us div $dayUs + 1"))))
    val w = Window.partitionBy(col("v_id"))
      .orderBy(col("p_us").asc_nulls_last, col("p_id").asc_nulls_last)
    val best = probes.join(p, Seq("uid", "pb"))
      .filter(col("p_us") > col("v_us") &&
        col("p_us") <= col("v_us") + dayUs)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("v_id"), col("p_id"))
    v.select(col("v_id")).join(best, Seq("v_id"), "left")
      .select(col("v_id"), col("p_id"),
        (col("p_id").isNotNull).as("converted"))
      .orderBy(col("v_id"))
  }

  /** Backward as-of join with a TOLERANCE bound (pandas merge_asof
    * semantics): for each purchase, the same user's latest view, but
    * only if it happened within the last hour — otherwise NULL.
    *
    * Round-12 re-cut to the 100 TB shape it used to only cite: the
    * tolerance bound makes the candidate set prunable, but the former
    * plan joined on the user key alone and applied the band as a
    * post-join filter — a sort-merge join whose per-user candidate
    * volume is the user's WHOLE view history. Now the band is
    * decomposed to hash-partitionable form (the [[joinWindowAggregate]]
    * bucket recipe): views land in 1-hour buckets, each purchase
    * probes exactly its two covering (user, bucket) keys, the exact
    * band predicate runs on the bucket survivors, and the per-probe
    * arg-max is a rank filter (WindowGroupLimit keeps a 1-heap per
    * purchase before the exchange). Candidate width is bounded by
    * per-user-per-hour activity, not history length; the (uid, vb)
    * join key is also strictly finer than uid, so hot users spread
    * across bucket keys before AQE even looks. Byte-identical output,
    * oracle unchanged. */
  def joinAsofTolerance(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600000000L
    val e = t(s, d, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("uid"),
        unix_micros(col("ts")).as("p_us"))
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("uid"),
        unix_micros(col("ts")).as("v_us"))
      .withColumn("vb", expr(s"v_us div $hourUs"))
    val probes = p.withColumn("vb",
      explode(array(expr(s"p_us div $hourUs"),
        expr(s"p_us div $hourUs - 1"))))
    val w = Window.partitionBy(col("p_id"))
      .orderBy(col("v_us").desc_nulls_last, col("v_id").desc_nulls_last)
    val best = probes.join(v, Seq("uid", "vb"))
      .filter(col("v_us") <= col("p_us") &&
        col("v_us") >= col("p_us") - hourUs)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_id"), col("v_id"))
    p.select(col("p_id")).join(best, Seq("p_id"), "left")
      .select(col("p_id"), col("v_id"),
        (col("v_id").isNotNull).as("matched"))
      .orderBy(col("p_id"))
  }

  /** Banded prior-window AGGREGATE join: for each purchase, COUNT and
    * recency of the same user's views in [p_ts − 1h, p_ts). Where
    * [[joinAsofTolerance]] picks ONE prior row, this aggregates the
    * whole band — the feature-engineering primitive behind every
    * "activity in the last hour" model input. The implementation IS
    * the 100 TB shape: views land in 1-hour buckets, each purchase
    * probes exactly two (user, bucket) keys, and the join is a plain
    * equi-join on those keys — a time-banded join decomposed to
    * hash-partitionable form, no theta join, no per-probe history
    * scan; candidate width is bounded by per-user-per-hour activity,
    * not history length. The exact band filter runs on the bucket
    * survivors. */
  def joinWindowAggregate(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600000000L
    val e = t(s, d, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("uid"),
        unix_micros(col("ts")).as("p_us"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("uid"), unix_micros(col("ts")).as("v_us"))
      .withColumn("vb", expr(s"v_us div $hourUs"))
    val probes = p.withColumn("vb",
      explode(array(expr(s"p_us div $hourUs"),
        expr(s"p_us div $hourUs - 1"))))
    val hits = probes.join(v, Seq("uid", "vb"))
      .filter(col("v_us") >= col("p_us") - hourUs &&
        col("v_us") < col("p_us"))
      .groupBy(col("p_id"))
      .agg(count(lit(1)).as("nv"), max(col("v_us")).as("last_v"))
    p.join(hits, Seq("p_id"), "left")
      .select(col("p_id"), coalesce(col("nv"), lit(0L)).as("n_views"),
        (col("p_us") - col("last_v")).as("gap_us"))
      .orderBy(col("p_id"))
  }

  /** Grid-cell-bucketed spatial neighbor join — the geohash/S2 scale
    * pattern: points land in 1°×1° cells, each probe expands to its
    * 3×3 cell neighborhood, and the candidate join is a plain
    * equi-join on cell keys; the exact Chebyshev band (< 1° in both
    * axes) filters survivors. No all-pairs path at any scale —
    * candidates are bounded by local point density, and the cell keys
    * hash-partition perfectly. Coordinates are deterministic synthetic
    * centidegrees derived from the customer key via the house
    * cross-engine md5 recipe (the fixture has no geo columns), on an
    * UNSHIFTED [0,18000)×[0,36000) grid so every division is on
    * non-negatives (Spark `div` truncates toward zero, DuckDB `//`
    * floors — they agree only there). */
  /** Deterministic synthetic centidegree points (pts: ck, lat, lon,
    * cell keys) and their 3×3 cell-expansion probes — the ONE copy of
    * a cross-engine-delicate recipe (Spark `div` vs DuckDB `//` agree
    * only on the unshifted non-negative grid) shared by
    * [[joinGeoGrid]] and [[joinSpatialKnn]]; two verbatim copies meant
    * a coordinate edit in one silently broke the other's oracle
    * parity (round-14 review). Both oracles replay the identical pts
    * CTE. */
  private def geoPoints(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val pts = t(s, d, "customer").select(col("c_custkey").as("ck"),
        expr("""CAST(conv(substring(md5(concat('lat|',
                CAST(c_custkey AS STRING))), 1, 6), 16, 10) AS BIGINT)
                % 18000""").as("lat"),
        expr("""CAST(conv(substring(md5(concat('lon|',
                CAST(c_custkey AS STRING))), 1, 6), 16, 10) AS BIGINT)
                % 36000""").as("lon"))
      .withColumn("cla", expr("lat div 100"))
      .withColumn("clo", expr("lon div 100"))
    val probes = pts
      .withColumn("dla", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dlo", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("ck").as("a"), col("lat").as("la"), col("lon").as("oa"),
        (col("cla") + col("dla")).as("cla"),
        (col("clo") + col("dlo")).as("clo"))
    (pts, probes)
  }

  def joinGeoGrid(s: SparkSession, d: String): DataFrame = {
    val (pts, probes) = geoPoints(s, d)
    val hits = probes
      .join(pts.select(col("ck").as("b"), col("lat").as("lb"),
        col("lon").as("ob"), col("cla"), col("clo")), Seq("cla", "clo"))
      .filter(col("a") =!= col("b") &&
        abs(col("la") - col("lb")) < 100 && abs(col("oa") - col("ob")) < 100)
      .groupBy(col("a")).agg(count(lit(1)).as("nn"))
    pts.join(hits, pts("ck") === hits("a"), "left")
      .select(col("ck"), col("lat"), col("lon"),
        coalesce(col("nn"), lit(0L)).as("n_neighbors"))
      .orderBy(col("ck"))
  }

  /** Grid-bucketed spatial NEAREST-neighbor join — [[joinGeoGrid]]'s
    * argmin sibling (count → which point is closest): for each point,
    * the nearest OTHER point among those within Chebyshev distance
    * < 100 centidegrees, by squared Euclidean distance with a
    * lowest-id tiebreak. The 3×3 cell expansion EXACTLY covers the
    * Chebyshev-<100 ball (cell width = band width), so the candidate
    * equi-join on cell keys is lossless for this semantics — a
    * bounded-radius kNN, the form spatial joins take at scale
    * (unbounded nearest has no prunable candidate set). Isolated
    * points (empty ball) keep a NULL neighbor. Same deterministic
    * synthetic coordinates as joinGeoGrid; argmin via struct-min,
    * exact integer d². */
  def joinSpatialKnn(s: SparkSession, d: String): DataFrame = {
    val (pts, probes) = geoPoints(s, d)
    val nn = probes
      .join(pts.select(col("ck").as("b"), col("lat").as("lb"),
        col("lon").as("ob"), col("cla"), col("clo")), Seq("cla", "clo"))
      .filter(col("a") =!= col("b") &&
        abs(col("la") - col("lb")) < 100 && abs(col("oa") - col("ob")) < 100)
      .groupBy(col("a"))
      .agg(min(struct(
        ((col("la") - col("lb")) * (col("la") - col("lb")) +
         (col("oa") - col("ob")) * (col("oa") - col("ob"))).as("d2"),
        col("b").as("id"))).as("best"))
      .select(col("a"), col("best.id").as("nn_id"),
        col("best.d2").as("nn_d2"))
    pts.join(nn, pts("ck") === nn("a"), "left")
      .select(col("ck"), col("lat"), col("lon"),
        col("nn_id"), col("nn_d2"))
      .orderBy(col("ck"))
  }

  /** As-of NEAREST join: for each purchase, the same user's closest
    * view in EITHER direction, bounded to ±1 hour. The bound is what
    * makes this scale: an unbounded nearest join has no prunable
    * candidate set. Round-12 re-cut to the bucketed band-join shape
    * ([[joinAsofTolerance]] recipe, two-sided): views land in 1-hour
    * buckets, each purchase probes its THREE covering (user, bucket)
    * keys (±1 h spans at most the bucket below, its own, and the one
    * above), the exact |Δt| ≤ 1 h predicate runs on the bucket
    * survivors, and the per-purchase arg-min over |Δt| is a rank
    * filter (WindowGroupLimit 1-heap). Micros arithmetic keeps the
    * distance exact — no float time math. Candidate width is bounded
    * by per-user activity in a 3-hour strip, not history length.
    * Byte-identical output, oracle unchanged. */
  def joinAsofNearest(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600000000L
    val e = t(s, d, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("uid"),
        unix_micros(col("ts")).as("p_us"))
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("uid"),
        unix_micros(col("ts")).as("v_us"))
      .withColumn("vb", expr(s"v_us div $hourUs"))
    val probes = p.withColumn("vb",
      explode(array(expr(s"p_us div $hourUs - 1"),
        expr(s"p_us div $hourUs"),
        expr(s"p_us div $hourUs + 1"))))
    val w = Window.partitionBy(col("p_id"))
      .orderBy(col("dt_us").asc_nulls_last, col("v_id").asc_nulls_last)
    val best = probes.join(v, Seq("uid", "vb"))
      .filter(col("v_us") >= col("p_us") - hourUs &&
        col("v_us") <= col("p_us") + hourUs)
      .withColumn("dt_us", abs(col("v_us") - col("p_us")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_id"), col("v_id"), col("dt_us"))
    p.select(col("p_id")).join(best, Seq("p_id"), "left")
      .select(col("p_id"), col("v_id"), col("dt_us"))
      .orderBy(col("p_id"))
  }

  /** Interval join: views within the hour preceding each purchase. */
  def joinInterval(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_uid"), col("ts").as("p_ts"))
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_uid"), col("ts").as("v_ts"))
    p.join(
        v,
        col("p_uid") === col("v_uid") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("v_ts") <= col("p_ts"),
        "left")
      .groupBy(col("p_id"))
      .agg(count(col("v_id")).as("n_views"))
      .orderBy(col("p_id"))
  }

  /** Deterministically salted equi join (graft.ingest.Skew): the fact
    * side gets a content-derived salt in [0,8), the dimension side is
    * replicated 8 ways, the join key becomes (key, salt) — each hot
    * key's rows spread over 8 reducers. Salting is exact, so the
    * oracle is the plain join. (AQE's skew split covers sort-merge
    * joins at runtime; this is the explicit fallback for the cases it
    * can't reach.) */
  def joinSkewSalted(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val sup = t(s, d, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    graft.ingest.Skew.saltedJoin(li, sup, "l_suppkey", 8,
        Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))
      .groupBy(col("s_name"))
      .agg(
        // per-row DECIMAL(18,4) INSIDE the sum — the late cast summed
        // raw doubles first, leaving the rounded cents at the mercy of
        // partial-agg addition order (round-14 review; house rule)
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("s_name"))
  }

  /** Interval-overlap join at scale — the ad-attribution/session-
    * overlap shape: two interval relations (30-day order activity
    * windows of even- vs odd-keyed orders, blocked by nation) joined
    * on `a.start < b.end AND b.start < a.end`. Executed as the
    * standard BANDED recipe, not a nested loop: each interval explodes
    * into its covering coarse buckets (granularity = max interval
    * length, so ≤ 2 buckets per interval), candidates come from an
    * EQUI join on (block, bucket), the exact overlap predicate then
    * filters, and `distinct` collapses the ≤ 2-bucket double-counts.
    * Work is Σ per-(block,bucket) cell products — local densities,
    * never |A|×|B| — and every operator is a hash shuffle on narrow
    * keys. The DuckDB oracle runs the plain theta join; both count
    * distinct overlapping pairs per nation. */
  def joinIntervalOverlap(s: SparkSession, d: String): DataFrame = {
    val us30d = 30L * 86400 * 1000000L
    val oc = t(s, d, "orders")
      .join(t(s, d, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey").as("k"), col("c_nationkey").as("nk"),
        // o_orderdate is TIMESTAMP_NTZ; session is pinned UTC, so the
        // cast is value-preserving
        unix_micros(col("o_orderdate").cast("timestamp")).as("st"))
      .withColumn("en", col("st") + lit(us30d)) // [st, en)
    def withBuckets(df: DataFrame): DataFrame =
      df.withColumn("b",
        explode(sequence(floor(col("st") / us30d),
          floor((col("en") - 1) / us30d))))
    val a = withBuckets(oc.filter(col("k") % 2 === 0))
      .select(col("nk"), col("b"), col("k").as("a_key"),
        col("st").as("a_st"), col("en").as("a_en"))
    val b = withBuckets(oc.filter(col("k") % 2 === 1))
      .select(col("nk"), col("b"), col("k").as("b_key"),
        col("st").as("b_st"), col("en").as("b_en"))
    a.join(b, Seq("nk", "b"))
      .filter(col("a_st") < col("b_en") && col("b_st") < col("a_en"))
      .select(col("nk"), col("a_key"), col("b_key"))
      .distinct()
      .groupBy(col("nk"))
      .agg(count(lit(1)).as("n_overlaps"),
        countDistinct(col("a_key")).as("n_a"),
        countDistinct(col("b_key")).as("n_b"))
      .orderBy(col("nk"))
  }

  /** Null-aware anti join — SQL NOT IN's three-valued trap, pinned:
    * one NULL in the subquery makes NOT IN return NOTHING (x <> NULL
    * is unknown), while the null-free variant is an ordinary anti
    * join. Spark plans the nullable case as a dedicated
    * BroadcastNestedLoopJoin-backed null-aware anti join (the subquery
    * must be broadcastable — an engine-level constraint worth knowing
    * at scale; prefer NOT EXISTS, which is never null-ambushed and
    * plans a hash anti join on any size). Both counts in one row. */
  def joinNullAwareAnti(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("graft_naaj_orders")
    t(s, d, "customer").createOrReplaceTempView("graft_naaj_customer")
    s.sql(
      """SELECT
        |  (SELECT COUNT(*) FROM graft_naaj_orders
        |   WHERE o_custkey NOT IN
        |     (SELECT CASE WHEN c_custkey % 97 = 0 THEN NULL
        |             ELSE c_custkey END
        |      FROM graft_naaj_customer WHERE c_custkey % 3 = 0))
        |    AS n_with_nulls,
        |  (SELECT COUNT(*) FROM graft_naaj_orders
        |   WHERE o_custkey NOT IN
        |     (SELECT c_custkey FROM graft_naaj_customer
        |      WHERE c_custkey % 3 = 0 AND c_custkey % 97 <> 0))
        |    AS n_clean""".stripMargin)
  }

  /** Fuzzy record linkage — match corrupted identifiers (here: each
    * source name with its last character dropped) back to the clean
    * registry under edit distance ≤ 1. The scale recipe: BLOCK first
    * (candidates must share a length band — each probe explodes into
    * its two admissible lengths and equi-joins on length), THEN verify
    * with levenshtein on the candidates only. Work is Σ per-block
    * |probes|·|registry| — block sizes, never the full cross product;
    * richer blockers (first-char, phonetic, q-gram) drop in as extra
    * equi-join keys. */
  def joinFuzzyMatch(s: SparkSession, d: String): DataFrame = {
    val registry = t(s, d, "documents")
      .select(col("source")).distinct()
    val probes = registry
      .select(expr("substring(source, 1, length(source) - 1)")
        .as("corrupt"))
      .distinct()
    // ALL THREE admissible length bands: edit distance ≤ 1 admits
    // len−1 (a registry entry one char SHORTER than the probe), len,
    // and len+1 — the old two-band block silently missed deletion
    // matches, and the oracle shared the gap so the gate was
    // structurally blind to it (round-14 review)
    val probeB = probes.withColumn("blen",
      explode(array(length(col("corrupt")) - 1, length(col("corrupt")),
        length(col("corrupt")) + 1)))
    val regB = registry.withColumn("blen", length(col("source")))
    probeB.join(regB, "blen")
      .withColumn("lev", levenshtein(col("corrupt"), col("source")))
      .filter(col("lev") <= 1)
      .select(col("corrupt"), col("source"), col("lev"))
      .distinct()
      .orderBy(col("corrupt"), col("source"))
  }

  /** Bucketed co-located join — the 100 TB shuffle eliminator for
    * repeated fact⋈fact joins: both sides are written ONCE bucketed on
    * the join key (`bucketBy(8, custkey)` + in-bucket sort), and every
    * subsequent join on that key reads bucket i against bucket i with
    * NO exchange — each bucketed scan already reports
    * HashPartitioning(custkey, 8), satisfying sort-merge's
    * distribution requirement. The write cost amortizes across every
    * downstream join/aggregation on the key; at 100 TB this is the
    * difference between shuffling the fact table per query and never
    * shuffling it. The `merge` hint pins SMJ so the plan demonstrates
    * the exchange-free co-location even at fixture sizes where
    * broadcast would win (PlanSpec asserts no shuffle below the join).
    * Result is bucketing-independent — the oracle is the plain join.
    *
    * The bucketed writes go through
    * [[graft.util.Materialize.bucketedTableFor]] (round-8 advice), so
    * they really do happen ONCE per (dataset, JVM): the first
    * invocation pays the two writes, every later invocation — and
    * every downstream query that joins or aggregates on the key — is
    * a pure bucketed scan with zero writes (MaterializeSpec asserts
    * the second-call build count is 0). That is the amortization the
    * operator exists to demonstrate. */
  def joinBucketedColocated(s: SparkSession, d: String): DataFrame = {
    val base = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_bucketed").getAbsolutePath
    val o = graft.util.Materialize.bucketedTableFor(s, "orders", d,
      name => t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$base/$name").saveAsTable(name))
    val c = graft.util.Materialize.bucketedTableFor(s, "customer", d,
      name => t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$base/$name").saveAsTable(name))
    o.hint("merge")
      .join(c, o("o_custkey") === c("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")), 2)
          .cast("double").as("revenue"))
      .orderBy(col("c_mktsegment"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_bucketed_colocated" -> (joinBucketedColocated _),
    "join_fuzzy_match" -> (joinFuzzyMatch _),
    "join_null_aware_anti" -> (joinNullAwareAnti _),
    "join_interval_overlap" -> (joinIntervalOverlap _),
    "join_skew_salted" -> (joinSkewSalted _),
    "join_inner_equi" -> (joinInnerEqui _),
    "join_left_outer" -> (joinLeftOuter _),
    "join_right_outer" -> (joinRightOuter _),
    "join_full_outer" -> (joinFullOuter _),
    "join_semi" -> (joinSemi _),
    "join_anti" -> (joinAnti _),
    "join_exists_flag" -> (joinExistsFlag _),
    "join_broadcast" -> (joinBroadcast _),
    "join_theta_range" -> (joinThetaRange _),
    "join_range_bucketed" -> (joinRangeBucketed _),
    "join_cross" -> (joinCross _),
    "join_bloom_prune" -> (joinBloomPrune _),
    "join_scd2_pointintime" -> (joinScd2Pointintime _),
    "join_asof" -> (joinAsof _),
    "join_asof_forward" -> (joinAsofForward _),
    "join_asof_tolerance" -> (joinAsofTolerance _),
    "join_window_aggregate" -> (joinWindowAggregate _),
    "join_geo_grid" -> (joinGeoGrid _),
    "join_spatial_knn" -> (joinSpatialKnn _),
    "join_asof_nearest" -> (joinAsofNearest _),
    "join_interval" -> (joinInterval _)
  )

  val oracles: Map[String, String] = Map(
    "join_bucketed_colocated" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
        |       AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "join_fuzzy_match" ->
      """WITH registry AS (
        |  SELECT DISTINCT source FROM documents
        |), probes AS (
        |  SELECT DISTINCT substr(source, 1, length(source) - 1)
        |    AS corrupt
        |  FROM registry
        |)
        |SELECT DISTINCT corrupt, source,
        |  CAST(levenshtein(corrupt, source) AS INTEGER) AS lev
        |FROM probes JOIN registry
        |  ON length(source) IN (length(corrupt) - 1, length(corrupt),
        |                        length(corrupt) + 1)
        |WHERE levenshtein(corrupt, source) <= 1
        |ORDER BY corrupt, source NULLS FIRST""".stripMargin,
    "join_null_aware_anti" ->
      """SELECT
        |  (SELECT COUNT(*) FROM orders
        |   WHERE o_custkey NOT IN
        |     (SELECT CASE WHEN c_custkey % 97 = 0 THEN NULL
        |             ELSE c_custkey END
        |      FROM customer WHERE c_custkey % 3 = 0)) AS n_with_nulls,
        |  (SELECT COUNT(*) FROM orders
        |   WHERE o_custkey NOT IN
        |     (SELECT c_custkey FROM customer
        |      WHERE c_custkey % 3 = 0 AND c_custkey % 97 <> 0))
        |    AS n_clean""".stripMargin,
    "join_interval_overlap" ->
      """WITH oc AS (
        |  SELECT o_orderkey AS k, c_nationkey AS nk,
        |    epoch_us(o_orderdate) AS st,
        |    epoch_us(o_orderdate) + 2592000000000 AS en
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |), a AS (SELECT * FROM oc WHERE k % 2 = 0),
        |b AS (SELECT * FROM oc WHERE k % 2 = 1),
        |pairs AS (
        |  SELECT a.nk, a.k AS a_key, b.k AS b_key
        |  FROM a JOIN b ON a.nk = b.nk
        |   AND a.st < b.en AND b.st < a.en
        |)
        |SELECT nk, COUNT(*) AS n_overlaps,
        |  COUNT(DISTINCT a_key) AS n_a,
        |  COUNT(DISTINCT b_key) AS n_b
        |FROM pairs GROUP BY nk ORDER BY nk""".stripMargin,
    "join_skew_salted" ->
      """SELECT s_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin,
    "join_inner_equi" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "join_left_outer" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN
        |  (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
        |  ON c_custkey = o.o_custkey
        |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,
    "join_right_outer" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
        |RIGHT JOIN customer ON o.o_custkey = c_custkey
        |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,
    "join_full_outer" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM (SELECT * FROM customer WHERE c_nationkey < 13) c
        |FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY c_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 350000.0)
        |ORDER BY c_custkey""".stripMargin,
    "join_exists_flag" ->
      """SELECT c_custkey, c_name,
        |  EXISTS (SELECT 1 FROM orders o
        |          WHERE o.o_custkey = c.c_custkey
        |            AND o.o_totalprice > 350000.0) AS has_big_order
        |FROM customer c
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 350000.0)
        |ORDER BY c_custkey""".stripMargin,
    "join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,
    "join_theta_range" ->
      """SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
        |FROM supplier JOIN customer
        |  ON c_acctbal >= s_acctbal - 100.0 AND c_acctbal <= s_acctbal + 100.0
        |ORDER BY s_suppkey, c_custkey""".stripMargin,
    "join_range_bucketed" ->
      """SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
        |FROM supplier JOIN customer
        |  ON c_acctbal >= s_acctbal - 100.0 AND c_acctbal <= s_acctbal + 100.0
        |ORDER BY s_suppkey, c_custkey""".stripMargin,
    "join_cross" ->
      """SELECT r_regionkey, n_nationkey, r_name, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,
    // the bloom runtime filter is plan-level only — the result is the
    // plain selective join
    "join_bloom_prune" ->
      """SELECT o_orderkey, COUNT(*) AS n_lines,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2)
        |       AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 400000
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    // independent formulation: the oracle joins probes to the SCD2
    // validity INTERVALS (valid_from <= ts < valid_to) — a different
    // algorithm than the engine's stacked-window carry, pinning the
    // semantics rather than mirroring the plan
    "join_scd2_pointintime" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |), seg AS (
        |  SELECT user_id,
        |    CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
        |    event_type,
        |    epoch_us(ts) AS valid_from_us,
        |    lead(epoch_us(ts)) OVER w AS valid_to_us
        |  FROM (SELECT user_id, ts, event_id, event_type FROM marked
        |        WHERE prev_type IS NULL OR prev_type <> event_type)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  s.version, s.event_type AS seg_type
        |FROM events e JOIN seg s ON s.user_id = e.user_id
        |  AND s.valid_from_us <= epoch_us(e.ts)
        |  AND (s.valid_to_us IS NULL OR epoch_us(e.ts) < s.valid_to_us)
        |WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id""".stripMargin,
    // oracle states the SEMANTICS as a direct range join; the engine's
    // bucketed decomposition must produce identical aggregates
    "join_window_aggregate" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase'
        |), v AS (
        |  SELECT user_id, epoch_us(ts) AS v_us
        |  FROM events WHERE event_type = 'view'
        |), g AS (
        |  SELECT p.p_id,
        |    CAST(COUNT(v.v_us) AS BIGINT) AS n_views,
        |    MAX(v.v_us) AS last_v,
        |    MAX(p.p_us) AS p_us
        |  FROM p LEFT JOIN v ON v.user_id = p.user_id
        |    AND v.v_us >= p.p_us - 3600000000 AND v.v_us < p.p_us
        |  GROUP BY p.p_id
        |)
        |SELECT p_id, n_views, p_us - last_v AS gap_us
        |FROM g ORDER BY p_id""".stripMargin,
    // direct theta-join argmin over the Chebyshev-<100 ball; the
    // engine's 3×3 cell expansion must pick identical neighbors
    "join_spatial_knn" ->
      """WITH pts AS (
        |  SELECT c_custkey AS ck,
        |    CAST(('0x' || substring(md5('lat|' ||
        |      CAST(c_custkey AS VARCHAR)), 1, 6)) AS BIGINT)
        |      % 18000 AS lat,
        |    CAST(('0x' || substring(md5('lon|' ||
        |      CAST(c_custkey AS VARCHAR)), 1, 6)) AS BIGINT)
        |      % 36000 AS lon
        |  FROM customer
        |), cand AS (
        |  SELECT a.ck, b.ck AS b_id,
        |    (a.lat - b.lat) * (a.lat - b.lat)
        |      + (a.lon - b.lon) * (a.lon - b.lon) AS d2
        |  FROM pts a JOIN pts b ON b.ck <> a.ck
        |    AND ABS(a.lat - b.lat) < 100 AND ABS(a.lon - b.lon) < 100
        |), nn AS (
        |  SELECT ck, b_id AS nn_id, d2 AS nn_d2 FROM (
        |    SELECT ck, b_id, d2,
        |      ROW_NUMBER() OVER (PARTITION BY ck
        |        ORDER BY d2, b_id) AS rn
        |    FROM cand) WHERE rn = 1
        |)
        |SELECT pts.ck, lat, lon, nn_id, nn_d2
        |FROM pts LEFT JOIN nn ON nn.ck = pts.ck
        |ORDER BY pts.ck""".stripMargin,
    // oracle is the direct Chebyshev-band theta join; the engine's
    // 3×3 cell expansion must count the identical neighbor sets
    "join_geo_grid" ->
      """WITH pts AS (
        |  SELECT c_custkey AS ck,
        |    CAST(('0x' || substring(md5('lat|' ||
        |      CAST(c_custkey AS VARCHAR)), 1, 6)) AS BIGINT)
        |      % 18000 AS lat,
        |    CAST(('0x' || substring(md5('lon|' ||
        |      CAST(c_custkey AS VARCHAR)), 1, 6)) AS BIGINT)
        |      % 36000 AS lon
        |  FROM customer
        |), nn AS (
        |  SELECT a.ck, CAST(COUNT(b.ck) AS BIGINT) AS n_neighbors
        |  FROM pts a LEFT JOIN pts b ON b.ck <> a.ck
        |    AND ABS(a.lat - b.lat) < 100 AND ABS(a.lon - b.lon) < 100
        |  GROUP BY a.ck
        |)
        |SELECT pts.ck, lat, lon, n_neighbors
        |FROM pts JOIN nn ON nn.ck = pts.ck
        |ORDER BY pts.ck""".stripMargin,
    "join_asof_tolerance" ->
      """SELECT p_id, v_id, v_id IS NOT NULL AS matched FROM (
        |  SELECT p.event_id AS p_id, v.event_id AS v_id,
        |         ROW_NUMBER() OVER (PARTITION BY p.event_id
        |           ORDER BY v.ts DESC NULLS LAST, v.event_id DESC NULLS LAST)
        |           AS rn
        |  FROM events p LEFT JOIN events v
        |    ON v.user_id = p.user_id AND v.event_type = 'view'
        |    AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
        |  WHERE p.event_type = 'purchase') q
        |WHERE rn = 1 ORDER BY p_id""".stripMargin,
    "join_asof_forward" ->
      """SELECT v_id, p_id, p_id IS NOT NULL AS converted FROM (
        |  SELECT v.event_id AS v_id, p.event_id AS p_id,
        |         ROW_NUMBER() OVER (PARTITION BY v.event_id
        |           ORDER BY p.ts ASC NULLS LAST, p.event_id ASC NULLS LAST)
        |           AS rn
        |  FROM events v LEFT JOIN events p
        |    ON p.user_id = v.user_id AND p.event_type = 'purchase'
        |    AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 24 HOUR
        |  WHERE v.event_type = 'view') q
        |WHERE rn = 1 ORDER BY v_id""".stripMargin,
    "join_asof" ->
      """SELECT p_id, v_id FROM (
        |  SELECT p.event_id AS p_id, v.event_id AS v_id,
        |         ROW_NUMBER() OVER (PARTITION BY p.event_id
        |           ORDER BY v.ts DESC NULLS LAST, v.event_id DESC NULLS LAST) AS rn
        |  FROM events p LEFT JOIN events v
        |    ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
        |  WHERE p.event_type = 'purchase') q
        |WHERE rn = 1 ORDER BY p_id""".stripMargin,
    "join_asof_nearest" ->
      """SELECT p_id, v_id, dt_us FROM (
        |  SELECT p.event_id AS p_id, v.event_id AS v_id,
        |         abs(epoch_us(v.ts) - epoch_us(p.ts)) AS dt_us,
        |         ROW_NUMBER() OVER (PARTITION BY p.event_id
        |           ORDER BY abs(epoch_us(v.ts) - epoch_us(p.ts)) ASC NULLS LAST,
        |                    v.event_id ASC NULLS LAST) AS rn
        |  FROM events p LEFT JOIN events v
        |    ON v.user_id = p.user_id AND v.event_type = 'view'
        |    AND v.ts >= p.ts - INTERVAL 1 HOUR
        |    AND v.ts <= p.ts + INTERVAL 1 HOUR
        |  WHERE p.event_type = 'purchase') q
        |WHERE rn = 1 ORDER BY p_id""".stripMargin,
    "join_interval" ->
      """SELECT p.event_id AS p_id, COUNT(v.event_id) AS n_views
        |FROM events p LEFT JOIN events v
        |  ON v.user_id = p.user_id AND v.event_type = 'view'
        | AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id ORDER BY p_id""".stripMargin
  )
}
