package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions registers the engine's SQL functions via the standard
  * SparkSessionExtensions hook (spark.sql.extensions). */
class ExtensionsSpec extends AnyFunSuite {

  test("all registered functions resolve and evaluate through SQL") {
    val spark = TestSpark.spark
    graft.ingest.Codecs.register(spark)
    val row = spark.sql(
      """SELECT
        |  clean_base64('?b?2s=') AS cb,
        |  json_shape('[1,2]') AS js,
        |  try_utf8_decode(try_decompress(CAST('ok' AS BINARY))) AS td,
        |  vec_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |          CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS vd,
        |  vec_norm(CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS vn
        |""".stripMargin).head()
    assert(row.getString(0) == "b2s=")
    assert(row.getString(1) == "rows")
    assert(row.getString(2) == "ok")
    assert(row.getDouble(3) == 11.0)
    assert(row.getDouble(4) == 5.0)
  }

  test("vec_dot is null on dimension mismatch (zip_with contract)") {
    val spark = TestSpark.spark
    graft.ingest.Codecs.register(spark)
    val row = spark.sql(
      """SELECT vec_dot(CAST(array(1.0) AS ARRAY<FLOAT>),
        |               CAST(array(1.0, 2.0) AS ARRAY<FLOAT>)) AS v
        |""".stripMargin).head()
    assert(row.isNullAt(0))
  }

  test("extensions inject both custom functions without error") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // injection is buffered inside SparkSessionExtensions; a session
    // built with these extensions resolves the functions — equivalent
    // registry path is exercised end-to-end in TryDecompressSpec via
    // Codecs.register + SQL.
  }

  test("registered function resolves and evaluates through SQL") {
    val spark = TestSpark.spark
    val out = spark.sql(
      "SELECT try_utf8_decode(try_decompress(CAST('ok' AS BINARY))) AS v")
      .head().getString(0)
    assert(out == "ok")
  }
}
