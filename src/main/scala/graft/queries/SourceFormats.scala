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
    val dir = Files.createTempDirectory(s"graft_src_$fmt").toString
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
    val dir = Files.createTempDirectory("graft_src_permissive").toString
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
    val dir = Files.createTempDirectory("graft_src_text").toString
    t(s, d, "documents").select(col("text"))
      .write.mode("overwrite").text(dir)
    s.read.text(dir)
      .groupBy(col("value").as("text")).agg(count(lit(1)).as("n"))
      .orderBy(col("text"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "source_csv_roundtrip" -> (sourceCsvRoundtrip _),
    "source_json_roundtrip" -> (sourceJsonRoundtrip _),
    "source_orc_roundtrip" -> (sourceOrcRoundtrip _),
    "source_xml_roundtrip" -> (sourceXmlRoundtrip _),
    "source_text_roundtrip" -> (sourceTextRoundtrip _),
    "source_json_permissive" -> (sourceJsonPermissive _)
  )

  private val oracle =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders WHERE o_totalprice > 200000.0
      |ORDER BY o_orderkey""".stripMargin

  val oracles: Map[String, String] = Map(
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
        |  SUM(doc_id) FILTER (WHERE doc_id % 7 <> 0) AS sum_good_ids
        |FROM documents""".stripMargin
  )
}
