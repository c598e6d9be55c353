package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Scans, projections, filters (SURVEY.md §2.2 "Scans / Projections").
  *
  * The reference's only projection/filter surface is envelope-field access
  * and the routing-validity filter (reference src/function_app.py:98,106,273
  * and :339-341); the full relational filter surface is engine scope.
  *
  * Scale notes: both queries are a single parquet scan with the predicate
  * and the projection pushed into the scan (verify: `PushedFilters` and
  * `ReadSchema` in `.explain("formatted")`) — no shuffle except the final
  * sort, which at cluster scale is a range-partitioned global sort.
  */
object Scans {

  /** Filter on ship date range + arithmetic projection. */
  def scanProjectFilter(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        // Per-row money rounding must go through DECIMAL: price×discount
        // products land exactly on half-cent boundaries, where Spark
        // (rounds the shortest decimal repr of the double) and DuckDB
        // (rounds the binary value) disagree. DECIMAL(18,4) recovers the
        // exact 4-dp product in both engines first.
        round((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)"), 2).cast("double").as("revenue"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("revenue"))

  /** AND / OR / NOT / IN / BETWEEN / LIKE / IS NULL predicate mix. */
  def filterPredicates(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(
        col("l_quantity").between(5, 45) &&
          col("l_returnflag").isin("A", "R") &&
          !(col("l_discount") < 0.02) &&
          (col("l_linestatus").like("F%") || col("l_tax") > 0.07) &&
          col("l_shipdate").isNotNull)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_quantity"),
        col("l_discount"),
        col("l_returnflag"))
      // (l_orderkey, l_linenumber) is not unique in the synthetic data —
      // order by every output column for a fully deterministic row order.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), col("l_returnflag"))

  /** File-provenance scan via Spark's hidden `_metadata` struct — the
    * engine-native version of the reference's per-file provenance
    * metadata (reference src/function_app.py:390-399 embeds
    * row_count/batch info per blob): every row knows its source file,
    * size, and modification time with ZERO extra I/O (the values come
    * from the file index, not the data). Output is aggregated to
    * file-level facts so the oracle can replay it (absolute paths
    * differ per engine). */
  def scanFileMetadata(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/lineitem.parquet")
      .select(col("_metadata.file_name").as("f"), col("_metadata.file_size")
        .as("sz"))
      .agg(countDistinct(col("f")).as("n_files"),
        count(lit(1)).as("n_rows"),
        (min(col("sz")) > 0L).as("sized"))

  /** Column profiling — the data-quality survey an engine runs before
    * ingesting a new table (row counts, null counts, exact distinct
    * cardinality, min/max per column). One INDEPENDENT aggregate per
    * column, unioned: each leg's parquet scan reads exactly its own
    * column (columnar pruning — total I/O equals one full-width scan)
    * and runs as a partial+final hash aggregate. This beats the
    * single-pass multi-distinct agg by 30× (measured 12.7 s → 0.4 s
    * at sf0.1): Spark plans N countDistincts in one agg as an Expand
    * that multiplies every row ×N through a SortAggregate chain,
    * while the union's legs are narrow, codegen'd and run
    * concurrently. Unbounded-table safe: each leg shuffles only its
    * per-column distinct values. */
  def profileColumns(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    def prof(c: String, isNum: Boolean): DataFrame = {
      val agg = li.select(col(c)).agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_notnull"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).as("mn"),
        max(col(c)).as("mx"))
      if (isNum)
        agg.select(lit(c).as("column_name"), col("n_rows"),
          col("n_notnull"), col("n_distinct"),
          col("mn").cast("double").as("min_num"),
          col("mx").cast("double").as("max_num"),
          lit(null).cast("string").as("min_str"),
          lit(null).cast("string").as("max_str"))
      else
        agg.select(lit(c).as("column_name"), col("n_rows"),
          col("n_notnull"), col("n_distinct"),
          lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"),
          col("mn").cast("string").as("min_str"),
          col("mx").cast("string").as("max_str"))
    }
    prof("l_quantity", isNum = true)
      .unionByName(prof("l_extendedprice", isNum = true))
      .unionByName(prof("l_returnflag", isNum = false))
      .unionByName(prof("l_linestatus", isNum = false))
      .orderBy(col("column_name"))
  }

  /** Parquet AGGREGATE pushdown (Spark 3.3+/4 DSv2): COUNT/MIN/MAX
    * answered from footer statistics — zero data pages read. At
    * 100 TB this turns full-table profiling (row counts, key ranges)
    * from a corpus scan into a metadata walk: the scan node reports
    * `PushedAggregation: [COUNT(*), MIN(...), MAX(...)]` and emits
    * one pre-aggregated row per row group. Requires the v2 parquet
    * path (`useV1SourceList` cleared) and the
    * `spark.sql.parquet.aggregatePushdown` flag, both set on a
    * cloned session so the engine default stays untouched; the
    * result is identical either way (the gate pins it), the PLAN is
    * what changes (PlanSpec asserts the PushedAggregation marker).
    * No filter, no grouping — the pushdown contract's supported
    * shape; with either present Spark falls back to a normal scan. */
  def scanAggPushdown(s: SparkSession, d: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    ss.conf.set("spark.sql.sources.useV1SourceList", "")
    ss.read.parquet(s"$d/lineitem.parquet")
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_orderkey")).as("min_orderkey"),
        max(col("l_orderkey")).as("max_orderkey"),
        min(col("l_quantity")).as("min_quantity"),
        max(col("l_quantity")).as("max_quantity"))
  }

  /** Candidate functional-dependency verification (the TANE-style
    * single-pass check behind schema-discovery / DQ tooling): for
    * each candidate A→B, the FD holds iff no A-value maps to more
    * than one distinct B — verified by ONE det-keyed aggregate per
    * candidate (countDistinct over the dependent), reporting the
    * violation count and the worst fan-out. Each leg shuffles only
    * its determinant's distinct values (narrow, codegen'd, concurrent
    * — the [[profileColumns]] union topology); nothing is ever
    * collected, so the check runs unchanged over a 100 TB table. */
  def profileFunctionalDeps(s: SparkSession, d: String): DataFrame = {
    def fd(tbl: String, det: String, dep: String): DataFrame =
      t(s, d, tbl)
        .groupBy(col(det))
        .agg(countDistinct(col(dep)).as("nd"))
        .agg(count(lit(1)).as("n_dets"),
          sum(when(col("nd") > 1L, 1L).otherwise(0L)).as("n_violating"),
          max(col("nd")).as("max_deps"))
        .select(lit(tbl).as("table_name"), lit(det).as("determinant"),
          lit(dep).as("dependent"), col("n_dets"), col("n_violating"),
          col("max_deps"), (col("n_violating") === 0L).as("holds"))
    fd("part", "p_brand", "p_type")
      .unionByName(fd("part", "p_partkey", "p_name"))
      .unionByName(fd("orders", "o_custkey", "o_orderpriority"))
      .unionByName(fd("events", "user_id", "event_type"))
      .unionByName(fd("documents", "doc_id", "lang"))
      .orderBy(col("table_name"), col("determinant"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_functional_deps" -> (profileFunctionalDeps _),
    "scan_agg_pushdown" -> (scanAggPushdown _),
    "scan_project_filter" -> (scanProjectFilter _),
    "filter_predicates" -> (filterPredicates _),
    "scan_file_metadata" -> (scanFileMetadata _),
    "profile_columns" -> (profileColumns _)
  )

  val oracles: Map[String, String] = Map(
    // one det-keyed countDistinct aggregate per candidate, unioned;
    // all-integer verdicts
    "profile_functional_deps" ->
      """WITH c1 AS (SELECT p_brand AS det, COUNT(DISTINCT p_type) AS nd
        |            FROM part GROUP BY 1),
        |c2 AS (SELECT p_partkey AS det, COUNT(DISTINCT p_name) AS nd
        |       FROM part GROUP BY 1),
        |c3 AS (SELECT o_custkey AS det,
        |         COUNT(DISTINCT o_orderpriority) AS nd
        |       FROM orders GROUP BY 1),
        |c4 AS (SELECT user_id AS det, COUNT(DISTINCT event_type) AS nd
        |       FROM events GROUP BY 1),
        |c5 AS (SELECT doc_id AS det, COUNT(DISTINCT lang) AS nd
        |       FROM documents GROUP BY 1),
        |agg AS (
        |  SELECT 'part' AS table_name, 'p_brand' AS determinant,
        |    'p_type' AS dependent, CAST(COUNT(*) AS BIGINT) AS n_dets,
        |    CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating,
        |    CAST(MAX(nd) AS BIGINT) AS max_deps
        |  FROM c1
        |  UNION ALL
        |  SELECT 'part', 'p_partkey', 'p_name',
        |    CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(MAX(nd) AS BIGINT)
        |  FROM c2
        |  UNION ALL
        |  SELECT 'orders', 'o_custkey', 'o_orderpriority',
        |    CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(MAX(nd) AS BIGINT)
        |  FROM c3
        |  UNION ALL
        |  SELECT 'events', 'user_id', 'event_type',
        |    CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(MAX(nd) AS BIGINT)
        |  FROM c4
        |  UNION ALL
        |  SELECT 'documents', 'doc_id', 'lang',
        |    CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(MAX(nd) AS BIGINT)
        |  FROM c5
        |)
        |SELECT table_name, determinant, dependent, n_dets,
        |  n_violating, max_deps, n_violating = 0 AS holds
        |FROM agg ORDER BY table_name, determinant""".stripMargin,
    // plain aggregates — the pushdown changes the PLAN, not the answer
    "scan_agg_pushdown" ->
      """SELECT COUNT(*) AS n_rows,
        |  MIN(l_orderkey) AS min_orderkey,
        |  MAX(l_orderkey) AS max_orderkey,
        |  MIN(l_quantity) AS min_quantity,
        |  MAX(l_quantity) AS max_quantity
        |FROM lineitem""".stripMargin,
    "profile_columns" ->
      """SELECT 'l_quantity' AS column_name, COUNT(*) AS n_rows,
        |  COUNT(l_quantity) AS n_notnull,
        |  COUNT(DISTINCT l_quantity) AS n_distinct,
        |  MIN(l_quantity) AS min_num, MAX(l_quantity) AS max_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_extendedprice', COUNT(*), COUNT(l_extendedprice),
        |  COUNT(DISTINCT l_extendedprice),
        |  MIN(l_extendedprice), MAX(l_extendedprice), NULL, NULL
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', COUNT(*), COUNT(l_returnflag),
        |  COUNT(DISTINCT l_returnflag), NULL, NULL,
        |  MIN(l_returnflag), MAX(l_returnflag)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_linestatus', COUNT(*), COUNT(l_linestatus),
        |  COUNT(DISTINCT l_linestatus), NULL, NULL,
        |  MIN(l_linestatus), MAX(l_linestatus)
        |FROM lineitem
        |ORDER BY column_name""".stripMargin,
    "scan_file_metadata" ->
      """SELECT CAST(1 AS BIGINT) AS n_files, COUNT(*) AS n_rows,
        |  TRUE AS sized
        |FROM lineitem""".stripMargin,
    "scan_project_filter" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(ROUND(CAST(l_extendedprice * (1 - l_discount)
        |            AS DECIMAL(18,4)), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey, l_linenumber, revenue""".stripMargin,
    "filter_predicates" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE l_quantity BETWEEN 5 AND 45
        |  AND l_returnflag IN ('A', 'R')
        |  AND NOT (l_discount < 0.02)
        |  AND (l_linestatus LIKE 'F%' OR l_tax > 0.07)
        |  AND l_shipdate IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount,
        |         l_returnflag""".stripMargin
  )
}
