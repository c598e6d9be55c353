package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{CleanBase64, DecodePayload, TryDecompress, TryUnbase64, TryUtf8Decode}

/** Optimizer rule: collapse the canonical payload decode chain
  *
  * {{{
  *   try_utf8_decode(try_decompress(try_unbase64(clean_base64(x))))
  * }}}
  *
  * (the tree `graft.ingest.Codecs.decodePayload` builds) into the
  * single-pass [[graft.functions.DecodePayload]] expression. The
  * rewrite is exact — the fused expression runs the same four total
  * stages (see PayloadCodec) — it just skips the boxed hand-offs
  * between four Catalyst nodes. Any other composition (stages reused
  * individually, different order) is left untouched.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.GraftExtensions]]) and `experimental.extraOptimizations`
  * ([[graft.ingest.Codecs.register]]).
  */
object FuseDecodeChain extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case TryUtf8Decode(TryDecompress(TryUnbase64(cb: CleanBase64))) =>
        DecodePayload(cb.child)
    }
}
