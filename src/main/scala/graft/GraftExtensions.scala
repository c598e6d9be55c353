package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CleanBase64, JsonShape, TryDecompress, TryUtf8Decode, VecDot, VecNorm}

/** SparkSessionExtensions entry point — lets any user of the library
  * register the engine's custom SQL functions at session build time:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions()) ...
  * }}}
  *
  * The same registrations are available imperatively via
  * [[graft.ingest.Codecs.register]] for sessions created without
  * extensions (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("try_decompress"),
      new ExpressionInfo(classOf[TryDecompress].getName, "try_decompress"),
      (exprs: Seq[Expression]) => TryDecompress(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("try_utf8_decode"),
      new ExpressionInfo(classOf[TryUtf8Decode].getName, "try_utf8_decode"),
      (exprs: Seq[Expression]) => TryUtf8Decode(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("json_shape"),
      new ExpressionInfo(classOf[JsonShape].getName, "json_shape"),
      (exprs: Seq[Expression]) => JsonShape(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("clean_base64"),
      new ExpressionInfo(classOf[CleanBase64].getName, "clean_base64"),
      (exprs: Seq[Expression]) => CleanBase64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecNorm].getName, "vec_norm"),
      (exprs: Seq[Expression]) => VecNorm(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("decode_payload"),
      new ExpressionInfo(classOf[graft.functions.DecodePayload].getName,
        "decode_payload"),
      (exprs: Seq[Expression]) => graft.functions.DecodePayload(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("try_unbase64"),
      new ExpressionInfo(classOf[graft.functions.TryUnbase64].getName,
        "try_unbase64"),
      (exprs: Seq[Expression]) => graft.functions.TryUnbase64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("deflate_length"),
      new ExpressionInfo(classOf[graft.functions.DeflateLength].getName,
        "deflate_length"),
      (exprs: Seq[Expression]) => graft.functions.DeflateLength(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[graft.functions.CharNGrams].getName,
        "char_ngrams"),
      (exprs: Seq[Expression]) => {
        graft.functions.FunctionArgs.requireArity("char_ngrams", exprs, 2)
        graft.functions.CharNGrams(exprs(0),
          graft.functions.FunctionArgs.positiveIntLiteral(
            "char_ngrams", "n", exprs(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("token_ngrams"),
      new ExpressionInfo(classOf[graft.functions.TokenNGrams].getName,
        "token_ngrams"),
      (exprs: Seq[Expression]) => {
        graft.functions.FunctionArgs.requireArity("token_ngrams", exprs, 2)
        graft.functions.TokenNGrams(exprs(0),
          graft.functions.FunctionArgs.positiveIntLiteral(
            "token_ngrams", "n", exprs(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_misra_gries"),
      new ExpressionInfo(classOf[graft.functions.MisraGriesAgg].getName,
        "graft_misra_gries"),
      (exprs: Seq[Expression]) => {
        graft.functions.FunctionArgs.requireArity(
          "graft_misra_gries", exprs, 2)
        graft.functions.MisraGriesAgg(exprs(0),
          graft.functions.FunctionArgs.positiveIntLiteral(
            "graft_misra_gries", "k", exprs(1))).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_ares_sample"),
      new ExpressionInfo(classOf[graft.functions.AresSampleAgg].getName,
        "graft_ares_sample"),
      (exprs: Seq[Expression]) => {
        graft.functions.FunctionArgs.requireArity(
          "graft_ares_sample", exprs, 2)
        graft.functions.AresSampleAgg(exprs(0),
          graft.functions.FunctionArgs.positiveIntLiteral(
            "graft_ares_sample", "k", exprs(1))).toAggregateExpression()
      }))
    // collapse the composed decode chain into the fused expression
    ext.injectOptimizerRule(_ => graft.plans.FuseDecodeChain)
  }
}
