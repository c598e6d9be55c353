package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Source-format coverage (SURVEY.md §2.2 "Scans / sources / sinks"):
  * the engine reads/writes parquet natively everywhere; these queries
  * prove the CSV, JSON and ORC paths round-trip the same relational
  * data — write a projected subset, read it back through the format,
  * and let the DuckDB oracle check the result against the original
  * parquet. (JDBC is documented-only: no database exists in the offline
  * container.)
  *
  * Scale notes: CSV/JSON are row formats — splittable but not columnar;
  * at 100 TB they are landing formats only, converted to
  * partitioned parquet on ingest (exactly what Pipeline.ingest does).
  * ORC is columnar with pushdown/pruning like parquet.
  */
object SourceFormats {

  private def subset(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .filter(col("o_totalprice") > 200000.0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))

  private def roundtrip(s: SparkSession, d: String, fmt: String): DataFrame = {
    val dir = graft.util.TempDirs.create(s"graft_src_$fmt").toString
    val sub = subset(s, d)
    val w = sub.write.mode("overwrite")
    (fmt match {
      case "csv" => w.option("header", "true")
      case "xml" => w.option("rowTag", "row")
      case _ => w
    }).format(fmt).save(dir)
    val r = s.read
    (fmt match {
      // schema pinned explicitly — inference is a second full read
      case "csv" => r.option("header", "true").schema(sub.schema)
      case "json" => r.schema(sub.schema)
      case "xml" => r.option("rowTag", "row").schema(sub.schema)
      case _ => r
    }).format(fmt).load(dir)
      .orderBy(col("o_orderkey"))
  }

  /** Nested parquet + nested-schema pruning — the multimodal/metadata
    * reality that lake tables carry struct and array columns, and the
    * scale property that matters: a projection of `order.price` must
    * prune BOTH the sibling struct fields and the unrelated array at
    * the parquet column-chunk level (Spark's nestedSchemaPruning, on
    * by default since 3.1 — ReadSchema shows struct<price> only,
    * PlanSpec-pinned). At 100 TB the difference is reading one leaf
    * column vs deserializing every struct field of every row. The
    * staged file is written once per invocation from orders (the
    * [[sourceParquetEvolution]] staging precedent); the oracle
    * replays the flat equivalent on the base table. */
  def sourceNestedParquet(s: SparkSession, d: String): DataFrame = {
    val dir = graft.util.TempDirs.create("graft_src_nested").toString
    t(s, d, "orders")
      .select(col("o_custkey"),
        struct(col("o_orderkey").as("key"),
          col("o_totalprice").as("price"),
          col("o_orderstatus").as("status")).as("order"),
        array(col("o_orderpriority"), col("o_orderstatus")).as("tags"))
      .write.mode("overwrite").parquet(dir)
    s.read.parquet(dir)
      .select(col("o_custkey"), col("order.price").as("price"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("price").cast("decimal(18,4)")), 2)
          .cast("double").as("sum_price"))
      .orderBy(col("o_custkey"))
  }

  def sourceCsvRoundtrip(s: SparkSession, d: String): DataFrame =
    roundtrip(s, d, "csv")

  def sourceJsonRoundtrip(s: SparkSession, d: String): DataFrame =
    roundtrip(s, d, "json")

  def sourceOrcRoundtrip(s: SparkSession, d: String): DataFrame =
    roundtrip(s, d, "orc")

  /** XML source/sink (built into Spark since 4.0, SPARK-44265) — the
    * format legacy enterprise feeds still arrive in. Row-per-element
    * with an explicit rowTag; schema pinned like csv/json (inference
    * is a second full read). XML is NOT splittable within an element
    * stream the way csv lines are — at 100 TB the ingest plan is many
    * medium files (one task each), never one giant document. */
  def sourceXmlRoundtrip(s: SparkSession, d: String): DataFrame =
    roundtrip(s, d, "xml")

  /** Parquet schema evolution — the lakehouse reality that batches
    * written months apart have different columns: batch A writes
    * (o_orderkey, o_totalprice), batch B later adds o_orderstatus.
    * `mergeSchema` unions the file footers at read time; A's rows
    * surface the added column as null. The oracle replays the union
    * semantics in SQL. At 100 TB, schema merge is a FOOTER-only
    * operation (no data read) — its cost scales with file count, not
    * bytes, which is why a real deployment tracks the merged schema
    * in a catalog instead of re-merging per read (documented, same
    * result). */
  /** Stage the even/odd two-batch evolved-schema layout (batch=a
    * without o_orderstatus, batch=b with it) — the ONE copy shared by
    * [[sourceParquetEvolution]] and [[ingestSchemaDriftReport]]; both
    * oracles hard-code this split, so a one-sided staging edit would
    * silently desynchronize the other query from its oracle (round-14
    * review). Returns the staged dir. */
  private def stageEvolvedBatches(s: SparkSession, d: String,
      prefix: String): String = {
    val dir = graft.util.TempDirs.create(prefix).toString
    val o = t(s, d, "orders")
    o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$dir/batch=a")
    o.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .write.mode("overwrite").parquet(s"$dir/batch=b")
    dir
  }

  def sourceParquetEvolution(s: SparkSession, d: String): DataFrame = {
    val dir = stageEvolvedBatches(s, d, "graft_src_evolve")
    s.read.option("mergeSchema", "true").parquet(dir)
      .groupBy(col("batch"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")), 2)
          .cast("double").as("sum_price"))
      .orderBy(col("batch"), col("o_orderstatus"))
  }

  /** Schema-drift audit report — the DATA-level check an ingest
    * pipeline runs when consecutive batches disagree on schema
    * (companion to [[sourceParquetEvolution]], which proves the READ
    * path; this key produces the drift REPORT a platform alerts on):
    * merge-read both batches, then per (batch, column) count rows vs
    * non-nulls — a column absent from a batch's files surfaces as
    * all-NULL there, so `present` flags exactly the written schema.
    * One narrow aggregate per audited column (the [[Scans
    * .profileColumns]] union topology); nothing collected. */
  def ingestSchemaDriftReport(s: SparkSession, d: String): DataFrame = {
    val dir = stageEvolvedBatches(s, d, "graft_schema_drift")
    val m = s.read.option("mergeSchema", "true").parquet(dir)
    def leg(c: String): DataFrame =
      m.groupBy(col("batch"))
        .agg(count(lit(1)).as("n_rows"), count(col(c)).as("n_nonnull"))
        .select(col("batch").cast("string").as("batch"),
          lit(c).as("column_name"), col("n_rows"), col("n_nonnull"),
          (col("n_nonnull") > 0L).as("present"))
    leg("o_orderkey").unionByName(leg("o_totalprice"))
      .unionByName(leg("o_orderstatus"))
      .orderBy(col("batch"), col("column_name"))
  }

  /** Partitioned sink + partition-pruned read — the layout contract
    * that makes 100 TB tables queryable: `partitionBy(event_type)`
    * writes one directory per key, and an equality filter on the
    * partition column prunes to ONE directory at planning time
    * (PartitionFilters in the scan, zero I/O elsewhere). The oracle
    * checks the filtered aggregate; PlanSpec-style pruning assertion
    * lives in the spec. */
  def sinkPartitionedPrune(s: SparkSession, d: String): DataFrame = {
    val dir = graft.util.TempDirs.create("graft_sink_part").toString
    t(s, d, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    s.read.parquet(dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,4)")), 2)
          .cast("double").as("sum_value"))
  }

  /** Non-default CSV dialect (| delimiter, quoted fields, custom
    * escape): the landing-format reality of enterprise feeds. The
    * text column forces quoting (it contains spaces — and the
    * delimiter check rides the same path). Round-trips through write
    * + schema-pinned read; the oracle checks content equality. */
  def sourceCsvDialect(s: SparkSession, d: String): DataFrame = {
    val dir = graft.util.TempDirs.create("graft_src_dialect").toString
    val sub = t(s, d, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    sub.write.mode("overwrite")
      .option("header", "true").option("delimiter", "|")
      .option("quote", "\"").option("escape", "\\")
      .csv(dir)
    s.read
      .option("header", "true").option("delimiter", "|")
      .option("quote", "\"").option("escape", "\\")
      .schema(sub.schema)
      .csv(dir)
      .orderBy(col("doc_id"))
  }

  /** Binary-file source (`format("binaryFile")`) — how a multimodal
    * corpus lands in Spark: one row per file with (path, mtime,
    * length, content BINARY), the input relation for the
    * `graft.llm.Multimodal` column pipeline. Fixture stages one blob
    * per document (bounded driver loop, fixture-staging only); the
    * query reads them back and fingerprints content. At 100 TB the
    * same reader runs with `pathGlobFilter`/`recursiveFileLookup`
    * over object storage, one task per file — binary payloads are
    * never split, so file sizing (≤ a few hundred MB) is the
    * parallelism knob. */
  def sourceBinaryFiles(s: SparkSession, d: String): DataFrame = {
    val dir = graft.util.TempDirs.create("graft_src_binary")
    t(s, d, "documents").filter(col("doc_id") < 20)
      .select(col("doc_id"), col("text")).collect()
      .foreach { r =>
        Files.write(dir.resolve(f"doc${r.getLong(0)}%04d.bin"),
          r.getString(1).getBytes("UTF-8"))
      }
    s.read.format("binaryFile").load(dir.toString)
      .select(
        regexp_extract(col("path"), "doc(\\d+)\\.bin", 1)
          .cast("long").as("doc_id"),
        col("length"),
        md5(col("content")).as("content_md5"))
      .orderBy(col("doc_id"))
  }

  /** Dynamic partition pruning — the RUNTIME companion of
    * [[sinkPartitionedPrune]]'s static case and the single biggest
    * scan-cost lever for star-schema joins at 100 TB: the dimension
    * side's filter is NOT a literal on the partition column (here:
    * "types whose volume exceeds the cross-type average" — a
    * data-derived predicate no optimizer can fold statically), so
    * partition pruning can only happen at RUNTIME, by broadcasting
    * the filtered dim keys and turning them into an IN filter on the
    * fact scan's partition column. Spark plans exactly that
    * (`PartitionFilters: [... dynamicpruningexpression(event_type IN
    * dynamicpruning#...)]`, PlanSpec-pinned): only the surviving
    * types' directories are read — at 1000 partitions × 100 GB each,
    * the difference between scanning 2 and scanning 1000.
    *
    * The dim predicate is all-integer (n_types·n_type > n_all — no
    * average division) and non-vacuous at every sf (a proper subset
    * of types passes). Oracle replays the rule over the unpartitioned
    * table — results are layout-independent. */
  def joinDppPrune(s: SparkSession, d: String): DataFrame = {
    val dir = graft.util.TempDirs.create("graft_dpp").toString
    t(s, d, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    // totals via an unbounded window over the ≤|types| aggregate (NOT
    // a cross join: a nested-loop join inside the filtering subtree
    // keeps Spark's PartitionPruning rule from planting the pruning
    // subquery; the window form is also the cheaper plan)
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val dim = t(s, d, "events").groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_type"))
      .withColumn("n_all", sum(col("n_type")).over(all))
      .withColumn("n_types", count(lit(1)).over(all))
      .filter(col("n_type") * col("n_types") > col("n_all"))
      .select(col("event_type"))
    s.read.parquet(dir)
      // the broadcast hint pins the VALUE-SPACE-bounded dim as the
      // build side (at fixture scale Spark would otherwise broadcast
      // the tiny fact and DPP could not fire; at 100 TB the fact side
      // is never the smaller one, but the hint makes the plan the
      // 100 TB plan at every sf)
      .join(broadcast(dim), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,4)")), 2)
          .cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** PERMISSIVE-mode malformed-input handling — the contract that
    * makes a 100 TB ingest survivable: corrupt records land in
    * `_corrupt_record` instead of failing the job (the engine-level
    * generalization of the reference's per-event try/except isolation,
    * reference src/function_app.py:421-423). The fixture corrupts a
    * DETERMINISTIC subset (every doc_id % 7 == 0 loses its closing
    * brace), so the oracle can replay the rule: good rows keep their
    * fields, bad rows surface raw text in the corrupt column, and
    * nothing is dropped. One scan, one partial+final agg; per-row
    * parse failure never touches other rows' outcome. */
  def sourceJsonPermissive(s: SparkSession, d: String): DataFrame = {
    val dir = graft.util.TempDirs.create("graft_src_permissive").toString
    t(s, d, "documents")
      .select(concat(
        lit("{\"doc_id\":"), col("doc_id").cast("string"),
        lit(",\"lang\":\""), col("lang"),
        when(col("doc_id") % 7 === 0, lit("")).otherwise(lit("\"}"))
      ).as("value"))
      .write.mode("overwrite").text(dir)
    s.read
      .schema("doc_id LONG, lang STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("_corrupt_record")).as("n_corrupt"),
        count(col("doc_id")).as("n_parsed"),
        sum(when(col("_corrupt_record").isNull, col("doc_id"))).as("sum_good_ids"))
  }

  /** Raw-text source (`spark.read.text`): one row per line — the
    * landing format for raw corpus dumps before any schema exists.
    * Round-trips documents.text (no embedded newlines in the fixture)
    * through a text write+read; the line count and content equality are
    * what the oracle checks. Splittable at scale like CSV; the schema
    * is fixed (`value: string`), so projection happens downstream. */
  def sourceTextRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = graft.util.TempDirs.create("graft_src_text").toString
    t(s, d, "documents").select(col("text"))
      .write.mode("overwrite").text(dir)
    s.read.text(dir)
      .groupBy(col("value").as("text")).agg(count(lit(1)).as("n"))
      .orderBy(col("text"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "source_nested_parquet" -> (sourceNestedParquet _),
    "source_csv_roundtrip" -> (sourceCsvRoundtrip _),
    "source_json_roundtrip" -> (sourceJsonRoundtrip _),
    "source_orc_roundtrip" -> (sourceOrcRoundtrip _),
    "source_xml_roundtrip" -> (sourceXmlRoundtrip _),
    "source_text_roundtrip" -> (sourceTextRoundtrip _),
    "source_json_permissive" -> (sourceJsonPermissive _),
    "source_binary_files" -> (sourceBinaryFiles _),
    "source_parquet_evolution" -> (sourceParquetEvolution _),
    "ingest_schema_drift_report" -> (ingestSchemaDriftReport _),
    "sink_partitioned_prune" -> (sinkPartitionedPrune _),
    "join_dpp_prune" -> (joinDppPrune _),
    "source_csv_dialect" -> (sourceCsvDialect _)
  )

  private val oracle =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders WHERE o_totalprice > 200000.0
      |ORDER BY o_orderkey""".stripMargin

  val oracles: Map[String, String] = Map(
    // the drift report derived from the even/odd staging semantics:
    // batch a wrote 2 columns, batch b wrote 3 — presence follows
    "ingest_schema_drift_report" ->
      """WITH a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders
        |  WHERE o_orderkey % 2 = 0
        |), b AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders
        |  WHERE o_orderkey % 2 = 1
        |)
        |SELECT * FROM (
        |  SELECT 'a' AS batch, 'o_orderkey' AS column_name,
        |    n AS n_rows, n AS n_nonnull, TRUE AS present FROM a
        |  UNION ALL
        |  SELECT 'a', 'o_orderstatus', n, CAST(0 AS BIGINT), FALSE
        |  FROM a
        |  UNION ALL
        |  SELECT 'a', 'o_totalprice', n, n, TRUE FROM a
        |  UNION ALL
        |  SELECT 'b', 'o_orderkey', n, n, TRUE FROM b
        |  UNION ALL
        |  SELECT 'b', 'o_orderstatus', n, n, TRUE FROM b
        |  UNION ALL
        |  SELECT 'b', 'o_totalprice', n, n, TRUE FROM b
        |)
        |ORDER BY batch, column_name""".stripMargin,
    // the staged nested file carries orders verbatim inside the struct,
    // so the flat replay on the base table is exact
    "source_nested_parquet" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
        |       AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "source_csv_roundtrip" -> oracle,
    "source_json_roundtrip" -> oracle,
    "source_orc_roundtrip" -> oracle,
    "source_xml_roundtrip" -> oracle,
    "source_text_roundtrip" ->
      """SELECT text, COUNT(*) AS n FROM documents
        |GROUP BY text ORDER BY text""".stripMargin,
    "source_json_permissive" ->
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(*) FILTER (WHERE doc_id % 7 = 0) AS n_corrupt,
        |  COUNT(*) FILTER (WHERE doc_id % 7 <> 0) AS n_parsed,
        |  CAST(SUM(doc_id) FILTER (WHERE doc_id % 7 <> 0) AS BIGINT)
        |    AS sum_good_ids
        |FROM documents""".stripMargin,
    "source_binary_files" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS length,
        |  md5(text) AS content_md5
        |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin,
    "source_parquet_evolution" ->
      """SELECT batch, o_orderstatus, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
        |       AS DOUBLE) AS sum_price
        |FROM (
        |  SELECT 'a' AS batch, o_orderkey, o_totalprice,
        |         CAST(NULL AS VARCHAR) AS o_orderstatus
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT 'b', o_orderkey, o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 2 = 1
        |)
        |GROUP BY batch, o_orderstatus
        |ORDER BY batch, o_orderstatus""".stripMargin,
    "sink_partitioned_prune" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
        |    AS sum_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY event_type""".stripMargin,
    "join_dpp_prune" ->
      """WITH pt AS (
        |  SELECT event_type, COUNT(*) AS n_type FROM events
        |  GROUP BY event_type),
        |tot AS (
        |  SELECT SUM(n_type) AS n_all, COUNT(*) AS n_types FROM pt),
        |dim AS (
        |  SELECT event_type FROM pt CROSS JOIN tot
        |  WHERE n_type * n_types > n_all)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
        |    AS sum_value
        |FROM events JOIN dim USING (event_type)
        |GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin,
    "source_csv_dialect" ->
      """SELECT doc_id, lang, text FROM documents
        |ORDER BY doc_id""".stripMargin
  )
}
