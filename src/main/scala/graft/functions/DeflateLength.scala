package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Length of the zlib-deflated UTF-8 bytes of a string — the
  * compression-ratio quality signal corpus pipelines use (CCNet,
  * RefinedWeb: highly compressible text is repetitive/boilerplate;
  * incompressible text is noise — both tails get filtered). Only the
  * LENGTH leaves the expression, so no compressed payload is
  * materialized per row beyond the scratch buffer.
  *
  * Fixed compression level ⇒ deterministic for a given zlib (the JDK
  * bundles its own), which is why the query using this is rows-only
  * checked: DuckDB has no deflate to replay the oracle side.
  */
object DeflateCodec {
  def deflatedLength(s: UTF8String): Int = {
    val in = s.getBytes
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** StringType → IntegerType; see [[DeflateCodec.deflatedLength]]. */
case class DeflateLength(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_length"

  override def nullSafeEval(input: Any): Any =
    DeflateCodec.deflatedLength(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateCodec.deflatedLength($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLength =
    copy(child = newChild)
}
