package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions registers the engine's SQL functions via the standard
  * SparkSessionExtensions hook (spark.sql.extensions). */
class ExtensionsSpec extends AnyFunSuite {

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
