package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass base64 cleanup (reference clean_base64,
  * src/function_app.py:118-127): drop every byte outside
  * `[A-Za-z0-9+/=]`, then right-pad with '=' to a multiple of 4.
  *
  * Semantically identical to the regexp_replace + repeat composition in
  * `graft.ingest.Codecs` it replaces — but one branch-per-byte scan
  * instead of a java.util.regex pass over multi-KB payloads. On the
  * ingest hot path the regex version was ~5 s of a 12 s warm pass at
  * 50k envelopes (IngestProfile; see PERF.md), which is what justifies
  * the custom expression per the SURVEY §7.3 decision rule.
  * Base64 text is pure ASCII, so byte-wise filtering is exact.
  */
object Base64Cleaner {
  def clean(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val out = new Array[Byte](in.length + 3)
    var n = 0
    var i = 0
    while (i < in.length) {
      val c = in(i)
      val keep = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '/' || c == '='
      if (keep) { out(n) = c; n += 1 }
      i += 1
    }
    val pad = (4 - (n % 4)) % 4
    var p = 0
    while (p < pad) { out(n) = '='; n += 1; p += 1 }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }
}

/** StringType → StringType; see [[Base64Cleaner.clean]]. */
case class CleanBase64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "clean_base64"

  override def nullSafeEval(input: Any): Any =
    Base64Cleaner.clean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Base64Cleaner.clean($c)")

  override protected def withNewChildInternal(newChild: Expression): CleanBase64 =
    copy(child = newChild)
}
