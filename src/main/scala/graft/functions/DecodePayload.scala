package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused payload decode: clean base64 → total base64 decode →
  * decompression fallback → strict UTF-8, in ONE expression.
  *
  * Semantically identical to the four-expression composition built by
  * `graft.ingest.Codecs.decodePayload`
  * (`try_utf8_decode(try_decompress(try_unbase64(clean_base64(x))))`,
  * mirroring reference src/function_app.py:118-144,278-292) — but with
  * each stage feeding the next directly instead of a boxed
  * UTF8String/byte[] hand-off through four Catalyst nodes.
  *
  * Installed two ways (both in [[graft.ingest.Codecs.register]] /
  * [[graft.GraftExtensions]]): as the `decode_payload` SQL function,
  * and via the [[graft.plans.FuseDecodeChain]] optimizer rule, which
  * rewrites the composed four-expression tree into this one — so SQL
  * users composing the documented chain get the fusion for free.
  */
object PayloadCodec {
  /** Base64 decode via the SAME decoder Spark's UnBase64 uses
    * (java.util.Base64 MIME), but total: null instead of
    * IllegalArgumentException on undecodable input (dangling unit,
    * pads-only, misplaced padding). The reference SKIPS messages whose
    * payload fails to decode (src/function_app.py:281-292) — an error
    * that kills the task would be a fidelity break, and round-1..3's
    * length-mod-4 guard missed e.g. "====" (throws "wrong 4-byte
    * ending unit"). */
  def unbase64OrNull(s: UTF8String): Array[Byte] =
    try java.util.Base64.getMimeDecoder.decode(s.toString)
    catch { case _: IllegalArgumentException => null }

  def decode(s: UTF8String): UTF8String = {
    val bin = unbase64OrNull(Base64Cleaner.clean(s))
    if (bin == null) null
    else Utf8Codec.decodeOrNull(ZlibCodec.decompress(bin))
  }
}

/** StringType → BinaryType; see [[PayloadCodec.unbase64OrNull]]. */
case class TryUnbase64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "try_unbase64"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PayloadCodec.unbase64OrNull(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PayloadCodec.unbase64OrNull($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): TryUnbase64 =
    copy(child = newChild)
}

/** StringType → StringType; see [[PayloadCodec.decode]]. Produces null
  * from non-null input (undecodable payloads), so not null-intolerant. */
case class DecodePayload(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "decode_payload"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PayloadCodec.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PayloadCodec.decode($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): DecodePayload =
    copy(child = newChild)
}
