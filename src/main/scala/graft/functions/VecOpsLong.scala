package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType, StructField, StructType}

/** Integer-vector kernels for the quantized similarity/PQ surface — the
  * [[VecMath]] discipline extended to the BIGINT micro-unit arrays the
  * PQ/IVF/k-means family computes on. Each replaces an
  * `aggregate`/`zip_with`/`transform` higher-order-function composition
  * that the interpreter evaluates per ELEMENT (a PQ assignment paid
  * 8 subspaces x 16 centroids x 8 elements = 1024 interpreted lambda
  * dispatches per row); these run the same sequential loops as one
  * compiled method call inside whole-stage codegen. All arithmetic is
  * Java long — identical to the long arithmetic of the HOF folds they
  * replace (micro values <= 1e6, dots <= 6.4e13, squared distances
  * <= 2.6e14: far inside 2^63, so wrap/ANSI behavior is unreachable
  * either way).
  *
  * Null contract (the [[VecDot]] precedent): null ARRAY inputs
  * propagate null; a length mismatch yields null for the scalar
  * kernels (the HOF zip_with pads the shorter side with null elements
  * and the fold then returns null — same observable). Null ELEMENTS
  * follow each replaced composition: [[MicroQuant]] maps them to null
  * elements (`transform` + round(null) = null); the scalar folds
  * return null if any element is null (null poisons the HOF fold).
  */
object VecMathLong {
  /** round(CAST(f AS DOUBLE) * 1e6) CAST BIGINT, bit-identical to
    * Spark's Round(HALF_UP on scala BigDecimal) + Cast chain. */
  def quant(f: Float): Long =
    scala.math.BigDecimal(f.toDouble * 1000000d)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .toDouble.toLong
}

/** array<float> -> array<long>: per-element 1e-6 micro quantization
  * (round(x * 1e6) as bigint) in one compiled pass. */
case class MicroQuant(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "micro_quant"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (x.isNullAt(i)) null
        else VecMathLong.quant(x.getFloat(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" graft.functions.VecKernels.microQuant($a);")

  override protected def withNewChildInternal(newChild: Expression): MicroQuant =
    copy(child = newChild)
}

object VecKernels {
  def microQuant(x: ArrayData): ArrayData = {
    val n = x.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (x.isNullAt(i)) null
        else java.lang.Long.valueOf(VecMathLong.quant(x.getFloat(i)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Shared base for the (array<long>, array<long>) -> long folds. */
abstract class LongVecFold extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  // null on dimension mismatch or null element, like the HOF fold
  override def nullable: Boolean = true

  protected def fold(a: ArrayData, b: ArrayData): Any

  override def nullSafeEval(x: Any, y: Any): Any = {
    val a = x.asInstanceOf[ArrayData]
    val b = y.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else {
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        i += 1
      }
      fold(a, b)
    }
  }
}

/** Long dot product: aggregate(zip_with(a, b, (x, y) -> x * y), 0L, +). */
case class VecDotLong(left: Expression, right: Expression)
    extends LongVecFold {
  override def prettyName: String = "vec_dot_long"
  override protected def fold(a: ArrayData, b: ArrayData): Any = {
    var acc = 0L
    var i = 0
    val n = a.numElements()
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotl")
      s"""
         |Object $r = graft.functions.VecKernelDot.eval($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $r).longValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotLong =
    copy(left = newLeft, right = newRight)
}

object VecKernelDot {
  def eval(a: ArrayData, b: ArrayData): Object = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

/** Squared L2 distance:
  * aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0L, +). */
case class VecSqDistLong(left: Expression, right: Expression)
    extends LongVecFold {
  override def prettyName: String = "vec_sqdist_long"
  override protected def fold(a: ArrayData, b: ArrayData): Any = {
    var acc = 0L
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("sqdl")
      s"""
         |Object $r = graft.functions.VecKernelSqDist.eval($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $r).longValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSqDistLong =
    copy(left = newLeft, right = newRight)
}

object VecKernelSqDist {
  def eval(a: ArrayData, b: ArrayData): Object = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

/** Elementwise difference: zip_with(a, b, (x, y) -> x - y). Null on a
  * length mismatch (the zip_with null-padding observable for the
  * consumers, which feed [[PqBest]]); null elements stay null. */
case class VecSubLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sub_long"

  override def nullSafeEval(x: Any, y: Any): Any =
    VecKernelSub.eval(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("subl")
      s"""
         |Object $r = graft.functions.VecKernelSub.eval($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSubLong =
    copy(left = newLeft, right = newRight)
}

object VecKernelSub {
  def eval(a: ArrayData, b: ArrayData): Object = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (a.isNullAt(i) || b.isNullAt(i)) null
        else java.lang.Long.valueOf(a.getLong(i) - b.getLong(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** All-centroid distance structs:
  * array(struct(d2 = sqdist(vec, c_i), <id> = ids(i)) for each
  * centroid, in the given order) — the [[graft.llm.Similarity]]
  * cellStructs/coarse-cell array in one compiled pass; consumers keep
  * their array_min / array_sort (lexicographic (d2, id) argmin
  * semantics unchanged). Centroids are constructor literals (driver
  * model state), not child expressions. */
case class CellDists(child: Expression, cents: Seq[Seq[Long]],
    ids: Seq[Int], idField: String)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(cents.nonEmpty && cents.length == ids.length)
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d2", LongType, nullable = true),
    StructField(idField, IntegerType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_dists"

  @transient private lazy val centArr: Array[Array[Long]] =
    cents.map(_.toArray).toArray
  @transient private lazy val idArr: Array[Int] = ids.toArray

  override def nullSafeEval(x: Any): Any = {
    val v = x.asInstanceOf[ArrayData]
    val k = centArr.length
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      val cm = centArr(c)
      // null d2 on length mismatch or a null element — the zip_with
      // null-padding observable of the HOF struct it replaces
      var d2: Any = null
      if (v.numElements() == cm.length) {
        var acc = 0L
        var i = 0
        var ok = true
        while (i < cm.length && ok) {
          if (v.isNullAt(i)) ok = false
          else {
            val dd = v.getLong(i) - cm(i)
            acc += dd * dd
          }
          i += 1
        }
        if (ok) d2 = acc
      }
      out(c) = InternalRow(d2, idArr(c))
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CellDists =
    copy(child = newChild)
}

/** Per-subspace PQ argmin codes — [[graft.llm.Similarity.pqBestOn]] in
  * one compiled pass: for each of the `nSub` disjoint `subDim`-wide
  * slices, the (d2, id)-lexicographic argmin over every codebook
  * entry's matching slice. Output array<struct<d2: long, c: int>> of
  * length nSub, exactly the array_min(array(struct...)) composition it
  * replaces (ids ascend in codebook order, so keep-first-on-ties IS
  * the lexicographic tiebreak). Null vector propagates; a vector
  * shorter than nSub*subDim yields null (the sliced HOF would fold
  * null-padded slices into null d2 structs — loud, not load-bearing:
  * fixture vectors are fixed-dim, SimilaritySpec pins equality). */
case class PqBest(child: Expression, cents: Seq[Seq[Long]],
    ids: Seq[Int], nSub: Int, subDim: Int)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(cents.nonEmpty && cents.length == ids.length)
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d2", LongType, nullable = false),
    StructField("c", IntegerType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "pq_best"

  @transient private lazy val centArr: Array[Array[Long]] =
    cents.map(_.toArray).toArray
  @transient private lazy val idArr: Array[Int] = ids.toArray

  override def nullSafeEval(x: Any): Any = {
    val v = x.asInstanceOf[ArrayData]
    if (v.numElements() < nSub * subDim) return null
    var i = 0
    val tot = nSub * subDim
    while (i < tot) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Any](nSub)
    var m = 0
    while (m < nSub) {
      val off = m * subDim
      var bestD2 = Long.MaxValue
      var bestC = Int.MaxValue
      var c = 0
      while (c < centArr.length) {
        val cm = centArr(c)
        var d2 = 0L
        var j = 0
        while (j < subDim) {
          val dd = v.getLong(off + j) - cm(off + j)
          d2 += dd * dd
          j += 1
        }
        if (d2 < bestD2 || (d2 == bestD2 && idArr(c) < bestC)) {
          bestD2 = d2
          bestC = idArr(c)
        }
        c += 1
      }
      out(m) = InternalRow(bestD2, bestC)
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqBest =
    copy(child = newChild)
}

/** ADC lookup sum over PQ codes:
  * aggregate(zip_with(best, sequence(0, n-1),
  *   (b, m) -> lut[m][b.c]), 0L, +) — eight nibble-table lookups per
  * candidate as one compiled call. `lut` is a column
  * (array<array<long>>) because the IVF-PQ key selects the table per
  * coarse cell. */
case class AdcSum(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes = Seq(
    ArrayType(StructType(Seq(
      StructField("d2", LongType, nullable = false),
      StructField("c", IntegerType, nullable = false)))),
    ArrayType(ArrayType(LongType)))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "adc_sum"

  override def nullSafeEval(x: Any, y: Any): Any = {
    val best = x.asInstanceOf[ArrayData]
    val lut = y.asInstanceOf[ArrayData]
    var acc = 0L
    var m = 0
    val n = best.numElements()
    while (m < n) {
      val st = best.getStruct(m, 2)
      acc += lut.getArray(m).getLong(st.getInt(1))
      m += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSum =
    copy(left = newLeft, right = newRight)
}

/** Packed PQ code word: aggregate(zip_with(best, sequence(0, n-1),
  * (b, m) -> shiftleft(b.c, 4*m)), 0L, +) — nibbles are disjoint so
  * the sum is an OR. */
case class PqPack(child: Expression) extends UnaryExpression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes = Seq(ArrayType(StructType(Seq(
    StructField("d2", LongType, nullable = false),
    StructField("c", IntegerType, nullable = false)))))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_pack"
  override def nullSafeEval(x: Any): Any = {
    val best = x.asInstanceOf[ArrayData]
    var acc = 0L
    var m = 0
    val n = best.numElements()
    while (m < n) {
      acc += best.getStruct(m, 2).getInt(1).toLong << (4 * m)
      m += 1
    }
    acc
  }
  override protected def withNewChildInternal(newChild: Expression): PqPack =
    copy(child = newChild)
}

/** Reconstruction-error sum: aggregate(best, 0L, (acc, b) -> acc + b.d2). */
case class PqD2Sum(child: Expression) extends UnaryExpression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes = Seq(ArrayType(StructType(Seq(
    StructField("d2", LongType, nullable = false),
    StructField("c", IntegerType, nullable = false)))))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_d2_sum"
  override def nullSafeEval(x: Any): Any = {
    val best = x.asInstanceOf[ArrayData]
    var acc = 0L
    var m = 0
    val n = best.numElements()
    while (m < n) {
      acc += best.getStruct(m, 2).getLong(0)
      m += 1
    }
    acc
  }
  override protected def withNewChildInternal(newChild: Expression): PqD2Sum =
    copy(child = newChild)
}
