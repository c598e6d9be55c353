package graft.ingest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{CleanBase64, JsonShape, TryDecompress, TryUtf8Decode}

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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "clean_base64", exprs => CleanBase64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => graft.functions.VecDot(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_norm", exprs => graft.functions.VecNorm(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "decode_payload",
      exprs => graft.functions.DecodePayload(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "try_unbase64",
      exprs => graft.functions.TryUnbase64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "deflate_length",
      exprs => graft.functions.DeflateLength(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_ngrams",
      exprs => {
        graft.functions.FunctionArgs.requireArity("char_ngrams", exprs, 2)
        graft.functions.CharNGrams(exprs(0),
          graft.functions.FunctionArgs.positiveIntLiteral(
            "char_ngrams", "n", exprs(1)))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_ngrams",
      exprs => {
        graft.functions.FunctionArgs.requireArity("token_ngrams", exprs, 2)
        graft.functions.TokenNGrams(exprs(0),
          graft.functions.FunctionArgs.positiveIntLiteral(
            "token_ngrams", "n", exprs(1)))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_misra_gries",
      exprs => {
        graft.functions.FunctionArgs.requireArity(
          "graft_misra_gries", exprs, 2)
        graft.functions.MisraGriesAgg(exprs(0),
          graft.functions.FunctionArgs.positiveIntLiteral(
            "graft_misra_gries", "k", exprs(1))).toAggregateExpression()
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ares_sample",
      exprs => {
        graft.functions.FunctionArgs.requireArity(
          "graft_ares_sample", exprs, 2)
        graft.functions.AresSampleAgg(exprs(0),
          graft.functions.FunctionArgs.positiveIntLiteral(
            "graft_ares_sample", "k", exprs(1))).toAggregateExpression()
      }, "built-in")
    // decode-chain fusion (see graft.plans.FuseDecodeChain); idempotent
    if (!spark.experimental.extraOptimizations.contains(graft.plans.FuseDecodeChain))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.FuseDecodeChain
  }

  /** Strip characters outside the base64 alphabet and re-pad to a
    * multiple of 4 (reference clean_base64, src/function_app.py:118-127).
    * Custom single-pass expression ([[graft.functions.CleanBase64]]) —
    * replaced the regexp_replace composition after profiling showed the
    * regex at ~5 s of a 12 s warm ingest pass (PERF.md). */
  def cleanBase64(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(CleanBase64(GraftBridge.expression(c)))
  }

  /** Total base64 decode: null instead of a task-killing decoder error
    * on any undecodable input — the reference skips such messages
    * (src/function_app.py:330-334). Until round 4 this was a
    * length-mod-4 guard over `unbase64`, which missed shapes like
    * pads-only "====" (the underlying MIME decoder throws "wrong
    * 4-byte ending unit"); [[graft.functions.TryUnbase64]] catches the
    * decoder's own rejection instead of predicting it. */
  def safeUnbase64(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      graft.functions.TryUnbase64(GraftBridge.expression(c)))
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
