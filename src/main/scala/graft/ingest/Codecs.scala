package graft.ingest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{JsonShape, TryDecompress, TryUtf8Decode}

/** Column builders for the reference's payload decode chain
  * (reference src/function_app.py:118-127 clean_base64, :278 b64decode,
  * :129-144 try_decompress). Everything except `tryDecompress` is Spark
  * built-ins (codegen'd, pushdown-transparent).
  */
object Codecs {

  /** Register the engine's custom SQL functions on a session (idempotent).
    * After registration `try_decompress` is callable from SQL and via
    * [[tryDecompress]]. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "try_decompress", exprs => TryDecompress(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "try_utf8_decode", exprs => TryUtf8Decode(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_shape", exprs => JsonShape(exprs.head), "built-in")
  }

  /** Strip characters outside the base64 alphabet and re-pad to a
    * multiple of 4 (reference clean_base64, src/function_app.py:118-127).
    * Pure built-ins: two regexes + arithmetic padding. */
  def cleanBase64(c: Column): Column = {
    val cleaned = regexp_replace(c, "[^A-Za-z0-9+/=]", "")
    concat(cleaned, repeat(lit("="), (lit(4) - (length(cleaned) % 4)) % 4))
  }

  /** Base64 payload bytes that cannot possibly decode (a dangling single
    * base64 unit) → null instead of a task-killing decoder error; the
    * reference skips such messages (src/function_app.py:330-334). */
  def safeUnbase64(c: Column): Column = {
    val noPad = regexp_replace(c, "=", "")
    when((length(noPad) % 4) === 1, lit(null).cast("binary"))
      .otherwise(unbase64(c))
  }

  /** gzip → raw deflate → zlib → identity fallback (custom Catalyst
    * expression, see [[graft.functions.TryDecompress]]). Requires
    * [[register]] for SQL usage; this column builder works regardless. */
  def tryDecompress(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(TryDecompress(GraftBridge.expression(c)))
  }

  /** Binary → string, null on malformed UTF-8 (Spark 4's `decode` raises
    * an ANSI error; the reference skips the message instead). */
  def tryUtf8Decode(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(TryUtf8Decode(GraftBridge.expression(c)))
  }

  /** Streaming payload-shape classifier ("rows"/"columnar"/"single" —
    * custom expression, see [[graft.functions.JsonShape]]). */
  def jsonShape(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(JsonShape(GraftBridge.expression(c)))
  }

  /** Full decode chain: Data string → cleaned base64 → bytes →
    * decompressed bytes → UTF-8 payload string (null if undecodable). */
  def decodePayload(data: Column): Column =
    tryUtf8Decode(tryDecompress(safeUnbase64(cleanBase64(data))))
}
