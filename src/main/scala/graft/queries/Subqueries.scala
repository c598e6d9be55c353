package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables.t

/** SQL subquery surface: scalar subqueries, IN/EXISTS (correlated and
  * not), HAVING, null-safe equality. Expressed through `spark.sql` —
  * this is Catalyst's subquery machinery (RewritePredicateSubquery
  * de-correlates EXISTS/IN into semi joins; scalar subqueries become
  * broadcast singletons), deliberately distinct from the DataFrame join
  * API covered in [[Joins]].
  *
  * Scale notes: the scalar subquery is computed once and broadcast; IN/
  * EXISTS rewrite to left-semi hash joins (verify via explain — no
  * per-row re-execution anywhere).
  */
object Subqueries {

  private def withViews(s: SparkSession, d: String): Unit = {
    t(s, d, "orders").createOrReplaceTempView("graft_orders")
    t(s, d, "customer").createOrReplaceTempView("graft_customer")
    t(s, d, "lineitem").createOrReplaceTempView("graft_lineitem")
  }

  /** Orders above the global average price (scalar subquery). */
  def subqueryScalar(s: SparkSession, d: String): DataFrame = {
    withViews(s, d)
    s.sql(
      """SELECT o_orderkey, o_totalprice
        |FROM graft_orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM graft_orders)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Uncorrelated IN subquery. */
  def subqueryIn(s: SparkSession, d: String): DataFrame = {
    withViews(s, d)
    s.sql(
      """SELECT o_orderkey, o_custkey
        |FROM graft_orders
        |WHERE o_custkey IN (SELECT c_custkey FROM graft_customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Correlated EXISTS with an aggregate HAVING inside. */
  def subqueryCorrelated(s: SparkSession, d: String): DataFrame = {
    withViews(s, d)
    s.sql(
      """SELECT c_custkey, c_name
        |FROM graft_customer c
        |WHERE EXISTS (SELECT 1 FROM graft_orders o
        |              WHERE o.o_custkey = c.c_custkey
        |              GROUP BY o.o_custkey
        |              HAVING COUNT(*) >= 12)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** GROUP BY + HAVING over an aggregate. */
  def aggHaving(s: SparkSession, d: String): DataFrame = {
    withViews(s, d)
    s.sql(
      """SELECT l_suppkey, ROUND(SUM(l_quantity), 2) AS sum_qty,
        |       COUNT(*) AS cnt
        |FROM graft_lineitem
        |GROUP BY l_suppkey
        |HAVING COUNT(*) > 100
        |ORDER BY l_suppkey""".stripMargin)
  }

  /** Null-safe equality (<=> / IS NOT DISTINCT FROM). */
  def nullSafeEq(s: SparkSession, d: String): DataFrame = {
    withViews(s, d)
    s.sql(
      """SELECT o_orderkey,
        |  NULLIF(o_orderstatus, 'O') <=> NULL AS status_is_open,
        |  NULLIF(o_orderstatus, 'O') <=> 'F' AS status_is_f
        |FROM graft_orders
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Correlated LATERAL over a SCALAR AGGREGATE — the second lateral
    * decorrelation class, deliberately distinct from
    * [[graft.queries.SortsSets.joinLateral]]'s ORDER BY … LIMIT form
    * (that one rewrites to a window-ranked join; an aggregate lateral
    * rewrites to an aggregate + outer join): per BUILDING customer,
    * their order count / total / max in one per-outer-row subquery.
    * A no-GROUP-BY aggregate yields exactly one row per outer row, so
    * order-less customers surface with n_orders = 0 and NULL money
    * columns — the left-outer semantics a naive groupBy+join drops.
    * Money rounding rides the house DECIMAL(18,4) route; nothing
    * re-executes per outer row. */
  def subqueryLateral(s: SparkSession, d: String): DataFrame = {
    withViews(s, d)
    s.sql(
      """SELECT c.c_custkey, o.n_orders, o.total_spend, o.max_price
        |FROM graft_customer c,
        |LATERAL (
        |  SELECT COUNT(*) AS n_orders,
        |    CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
        |      AS DOUBLE) AS total_spend,
        |    CAST(ROUND(MAX(CAST(o_totalprice AS DECIMAL(18,4))), 2)
        |      AS DOUBLE) AS max_price
        |  FROM graft_orders
        |  WHERE o_custkey = c.c_custkey) o
        |WHERE c.c_mktsegment = 'BUILDING'
        |ORDER BY c.c_custkey""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "subquery_lateral" -> (subqueryLateral _),
    "subquery_scalar" -> (subqueryScalar _),
    "subquery_in" -> (subqueryIn _),
    "subquery_correlated" -> (subqueryCorrelated _),
    "agg_having" -> (aggHaving _),
    "null_safe_eq" -> (nullSafeEq _)
  )

  val oracles: Map[String, String] = Map(
    "subquery_lateral" ->
      """SELECT c.c_custkey, o.n_orders, o.total_spend, o.max_price
        |FROM customer c,
        |LATERAL (
        |  SELECT COUNT(*) AS n_orders,
        |    CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
        |      AS DOUBLE) AS total_spend,
        |    CAST(ROUND(MAX(CAST(o_totalprice AS DECIMAL(18,4))), 2)
        |      AS DOUBLE) AS max_price
        |  FROM orders o
        |  WHERE o.o_custkey = c.c_custkey) o
        |WHERE c.c_mktsegment = 'BUILDING'
        |ORDER BY c.c_custkey""".stripMargin,
    "subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "subquery_in" ->
      """SELECT o_orderkey, o_custkey
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "subquery_correlated" ->
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |              GROUP BY o.o_custkey
        |              HAVING COUNT(*) >= 12)
        |ORDER BY c_custkey""".stripMargin,
    "agg_having" ->
      """SELECT l_suppkey, ROUND(SUM(l_quantity), 2) AS sum_qty,
        |       COUNT(*) AS cnt
        |FROM lineitem
        |GROUP BY l_suppkey
        |HAVING COUNT(*) > 100
        |ORDER BY l_suppkey""".stripMargin,
    "null_safe_eq" ->
      """SELECT o_orderkey,
        |  NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL AS status_is_open,
        |  NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F' AS status_is_f
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin
  )
}
