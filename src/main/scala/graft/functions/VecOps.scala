package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Primitive-loop vector kernels for the similarity/dedup surface.
  *
  * These replace the `aggregate`/`zip_with` higher-order-function
  * compositions ([[graft.llm.Similarity.dot]] originally): HOF lambdas
  * are evaluated by the interpreter per ELEMENT (never codegen'd), so a
  * 64-dim dot product paid ~192 interpreted expression dispatches per
  * pair. These expressions stay inside whole-stage codegen (the loop is
  * one static JIT-friendly method call, same pattern as
  * [[Base64Cleaner]]) — per the SURVEY §7.3 decision rule, a custom
  * Expression is justified exactly when the built-in composition can't
  * reach codegen.
  *
  * Accumulation is sequential in array order with double arithmetic —
  * bit-identical to the HOF fold they replace (and to the DuckDB
  * oracles' `list_reduce` replay). Null ARRAYS propagate null
  * (nullIntolerant), and a dimension mismatch yields null — matching
  * `zip_with`'s null-padding contract, so a truncated/corrupt vector
  * falls out of every >= threshold filter instead of scoring with a
  * plausible-but-wrong partial dot product. Null ELEMENTS read as 0
  * (fixture embeddings are dense; the HOF path returned null for the
  * whole sum instead — a deviation documented here, not observable on
  * dense vectors).
  */
object VecMath {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = a.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }
}

/** (array<float>, array<float>) → double dot product; see [[VecMath]]. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // null also on dimension mismatch, even for non-nullable inputs
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else VecMath.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.VecMath.dot($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** array<float> → double L2 norm; see [[VecMath]]. */
case class VecNorm(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_norm"

  override def nullSafeEval(a: Any): Any =
    VecMath.norm(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecMath.norm($a)")

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}
