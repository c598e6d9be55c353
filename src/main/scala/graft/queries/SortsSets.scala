package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Sorts, limits, top-k and set operations (SURVEY.md §2.2).
  *
  * `set_union_by_name` is the direct Spark equivalent of the reference's
  * `_merge_columnars` (reference src/function_app.py:177-191): union of the
  * column sets with null padding for columns missing on either side —
  * `unionByName(allowMissingColumns = true)`.
  *
  * Scale notes: `sort_limit_topk` compiles to `TakeOrderedAndProject`
  * (per-partition top-k + driver merge of k·partitions rows — no global
  * sort). Full sorts are range-partitioned (sampled boundaries, no single
  * reducer). Set ops hash-partition both sides on the full row.
  */
object SortsSets {

  def sortMultiKey(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      .orderBy(
        col("c_nationkey").desc_nulls_last,
        col("c_acctbal").asc_nulls_first,
        col("c_custkey").asc)

  def sortLimitTopk(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  /** Null-padded union of heterogeneous schemas — the reference's
    * `_merge_columnars` semantics (src/function_app.py:177-191). */
  def setUnionByName(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "customer")
      .select(col("c_custkey").as("id"), lit("cust").as("src"), col("c_acctbal").as("bal"))
    val supp = t(s, d, "supplier")
      .select(lit("supp").as("src"), col("s_suppkey").as("id"), col("s_name").as("nm"))
    cust.unionByName(supp, allowMissingColumns = true)
      .orderBy(col("src"), col("id"))
  }

  def setUnionDistinct(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").select(col("l_suppkey").as("k"))
      .union(t(s, d, "supplier").select(col("s_suppkey").as("k")))
      .distinct()
      .orderBy(col("k"))

  def setIntersect(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").select(col("o_custkey").as("k"))
      .intersect(t(s, d, "customer").select(col("c_custkey").as("k")))
      .orderBy(col("k"))

  /** EXCEPT over deterministic overlapping key slices (%7 minus %5 —
    * the [[setSymmetricDiff]] convention): the raw customers-minus-
    * order-custkeys form is EMPTY by referential integrity in this
    * fixture (every customer has orders), which demonstrates nothing
    * (round-10 degeneracy audit). */
  def setExcept(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("k"))
      .except(t(s, d, "customer").filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey").as("k")))
      .orderBy(col("k"))

  /** Symmetric difference — members of exactly one side, with the side
    * tagged: customers who never ordered ∪ order-custkeys missing from
    * the customer table. Composed as two anti-directional EXCEPTs
    * (each a hash aggregate + anti join in the plan) unioned; at scale
    * both legs shuffle once on the key. */
  def setSymmetricDiff(s: SparkSession, d: String): DataFrame = {
    // overlapping deterministic subsets (every customer has orders in
    // the fixture, so the raw key sets coincide — the %7/%5 slices
    // leave both exclusive sides non-empty)
    val c = t(s, d, "customer").select(col("c_custkey").as("k"))
      .filter(col("k") % 7 === 0)
    val o = t(s, d, "orders").select(col("o_custkey").as("k"))
      .filter(col("k") % 5 === 0)
    c.except(o).withColumn("side", lit("customer_only"))
      .unionByName(o.except(c).withColumn("side", lit("orders_only")))
      .orderBy(col("k"), col("side"))
  }

  /** EXCEPT ALL — BAG difference with multiplicity, the reconciliation
    * primitive DISTINCT-semantics [[setExcept]] can't express: "rows
    * of batch A not yet accounted for in B, counted with multiplicity"
    * (e.g. re-delivered events vs the committed log). Each custkey
    * appears max(0, countA − countB) times in the raw result; the gate
    * groups the survivors so the residual multiplicities are visible
    * and the output is compactly ordered. Overlapping %3/%2 orderkey
    * slices give both engines a mix of fully-cancelled, partially-
    * cancelled and untouched keys.
    *
    * Scale shape: Spark plans exceptAll as per-side counts on one
    * hash-partitioned exchange + a generate to replicate the residual
    * — one shuffle on the row value, no pairwise work. */
  def setExceptAll(s: SparkSession, d: String): DataFrame = {
    val a = t(s, d, "orders").filter(col("o_orderkey") % 3 === 0)
      .select(col("o_custkey").as("k"))
    val b = t(s, d, "orders").filter(col("o_orderkey") % 2 === 0)
      .select(col("o_custkey").as("k"))
    a.exceptAll(b)
      .groupBy(col("k")).agg(count(lit(1)).as("n_residual"))
      .orderBy(col("k"))
  }

  /** INTERSECT ALL — bag intersection: each key min(countA, countB)
    * times; same slices and same plan shape as [[setExceptAll]]. */
  def setIntersectAll(s: SparkSession, d: String): DataFrame = {
    val a = t(s, d, "orders").filter(col("o_orderkey") % 3 === 0)
      .select(col("o_custkey").as("k"))
    val b = t(s, d, "orders").filter(col("o_orderkey") % 2 === 0)
      .select(col("o_custkey").as("k"))
    a.intersectAll(b)
      .groupBy(col("k")).agg(count(lit(1)).as("n_common"))
      .orderBy(col("k"))
  }

  /** Pagination: LIMIT + OFFSET over a total order. Spark executes
    * offset+limit as a single GlobalLimit(offset+k) — fine for page-size
    * offsets; deep pagination at scale should keyset-paginate on the
    * sort key instead (documented, not a different operator). */
  def sortLimitOffset(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .offset(20)
      .limit(10)

  /** Correlated LATERAL subquery (SQL surface): top-2 customers by
    * balance per nation. Catalyst decorrelates this into a
    * window/top-k per key — same physical shape as
    * `window_top_k_per_group`, exposed through the SQL front door. */
  def joinLateral(s: SparkSession, d: String): DataFrame = {
    t(s, d, "nation").createOrReplaceTempView("graft_lat_nation")
    t(s, d, "customer").createOrReplaceTempView("graft_lat_customer")
    s.sql(
      """SELECT n.n_name, top.c_custkey, top.c_acctbal
        |FROM graft_lat_nation n,
        |LATERAL (
        |  SELECT c_custkey, c_acctbal FROM graft_lat_customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) top
        |ORDER BY n.n_name, top.c_acctbal DESC, top.c_custkey""".stripMargin)
  }

  /** Z-order (Morton) clustering key: interleave the low 16 bits of two
    * dimensions so that sorting by one value co-locates rows that are
    * near in BOTH — the standard multi-dimensional file-clustering
    * trick (Delta/Iceberg OPTIMIZE ZORDER). Written with
    * `repartitionByRange(zval)`, parquet min/max stats then prune scans
    * on either dimension. The interleave is 32 codegen'd shift/mask
    * terms summed (disjoint bits, so + ≡ |) — one projection, no
    * shuffle beyond the demonstration sort. Low-16-bit truncation is
    * the demo simplification; production normalizes each dimension to
    * its rank/quantile first. */
  def sortZorder(s: SparkSession, d: String): DataFrame = {
    val x = col("o_custkey").cast("long") % 65536L
    // floor-then-cast: Spark's double→long cast truncates while
    // DuckDB's rounds, so both sides go through an explicit floor
    val y = floor(col("o_totalprice")).cast("long") % 65536L
    val zval = (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
    t(s, d, "orders")
      .select(col("o_orderkey"), x.as("zx"), y.as("zy"), zval.as("zval"))
      .orderBy(col("zval"), col("o_orderkey"))
  }

  private val zorderOracle: String = {
    val terms = (0 until 16).flatMap { i =>
      Seq(s"(((zx >> $i) & 1) << ${2 * i})",
        s"(((zy >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")
    s"""WITH b AS (
       |  SELECT o_orderkey,
       |    CAST(o_custkey AS BIGINT) % 65536 AS zx,
       |    CAST(floor(o_totalprice) AS BIGINT) % 65536 AS zy
       |  FROM orders)
       |SELECT o_orderkey, zx, zy, $terms AS zval
       |FROM b ORDER BY zval, o_orderkey""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sort_zorder" -> (sortZorder _),
    "sort_limit_offset" -> (sortLimitOffset _),
    "join_lateral" -> (joinLateral _),
    "sort_multi_key" -> (sortMultiKey _),
    "sort_limit_topk" -> (sortLimitTopk _),
    "set_union_by_name" -> (setUnionByName _),
    "set_union_distinct" -> (setUnionDistinct _),
    "set_intersect" -> (setIntersect _),
    "set_except" -> (setExcept _),
    "set_except_all" -> (setExceptAll _),
    "set_intersect_all" -> (setIntersectAll _),
    "set_symmetric_diff" -> (setSymmetricDiff _)
  )

  val oracles: Map[String, String] = Map(
    "set_except_all" ->
      """WITH e AS (
        |  SELECT o_custkey AS k FROM orders WHERE o_orderkey % 3 = 0
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT k, CAST(COUNT(*) AS BIGINT) AS n_residual
        |FROM e GROUP BY k ORDER BY k""".stripMargin,
    "set_intersect_all" ->
      """WITH e AS (
        |  SELECT o_custkey AS k FROM orders WHERE o_orderkey % 3 = 0
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT k, CAST(COUNT(*) AS BIGINT) AS n_common
        |FROM e GROUP BY k ORDER BY k""".stripMargin,
    "set_symmetric_diff" ->
      """SELECT k, 'customer_only' AS side FROM (
        |  SELECT c_custkey AS k FROM customer WHERE c_custkey % 7 = 0
        |  EXCEPT SELECT o_custkey FROM orders WHERE o_custkey % 5 = 0)
        |UNION ALL
        |SELECT k, 'orders_only' FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_custkey % 5 = 0
        |  EXCEPT SELECT c_custkey FROM customer WHERE c_custkey % 7 = 0)
        |ORDER BY k, side""".stripMargin,
    "sort_zorder" -> zorderOracle,
    "sort_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10 OFFSET 20""".stripMargin,
    "join_lateral" ->
      """SELECT n.n_name, top.c_custkey, top.c_acctbal
        |FROM nation n,
        |LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) top
        |ORDER BY n.n_name, top.c_acctbal DESC, top.c_custkey""".stripMargin,
    "sort_multi_key" ->
      """SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer
        |ORDER BY c_nationkey DESC NULLS LAST, c_acctbal ASC NULLS FIRST,
        |         c_custkey ASC""".stripMargin,
    "sort_limit_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "set_union_by_name" ->
      """SELECT c_custkey AS id, 'cust' AS src, c_acctbal AS bal FROM customer
        |UNION ALL BY NAME
        |SELECT 'supp' AS src, s_suppkey AS id, s_name AS nm FROM supplier
        |ORDER BY src, id""".stripMargin,
    "set_union_distinct" ->
      """SELECT l_suppkey AS k FROM lineitem
        |UNION
        |SELECT s_suppkey AS k FROM supplier
        |ORDER BY k""".stripMargin,
    "set_intersect" ->
      """SELECT o_custkey AS k FROM orders
        |INTERSECT
        |SELECT c_custkey AS k FROM customer
        |ORDER BY k""".stripMargin,
    "set_except" ->
      """SELECT c_custkey AS k FROM customer WHERE c_custkey % 7 = 0
        |EXCEPT
        |SELECT c_custkey AS k FROM customer WHERE c_custkey % 5 = 0
        |ORDER BY k""".stripMargin
  )
}
