package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Signed-random-projection LSH signature kernel: `bits` hyperplane
  * sign bits packed into a long bucket id.
  *
  * The hyperplane entry for (table, bit b, dimension j) is the
  * Rademacher value derived from `xxhash64(table, b, j)` — EXACTLY the
  * bits Spark's `xxhash64(lit(table), lit(b), j)` produces (seed 42,
  * ints folded left via XXH64.hashInt), so this kernel is
  * value-identical to the `aggregate`/`zip_with`/`transform` HOF
  * composition it replaces in [[graft.llm.Similarity.srpBucket]]. The
  * HOF version re-derived every hyperplane entry per ROW through the
  * interpreter (bits × dim × ~4 expression dispatches per vector); the
  * kernel derives the sign matrix once per executor and the per-row
  * work is `bits` primitive dot products inside whole-stage codegen.
  *
  * The sign matrix is lazily sized to the vector dimensionality and
  * shared across tasks (volatile + synchronized grow — executor threads
  * race only on first touch).
  */
class SrpKernel(val table: Int, val bits: Int) extends Serializable {

  // (capacity, signs) — signs laid out as b * capacity + j
  @volatile @transient private var state: (Int, Array[Double]) = _

  private def sign(b: Int, j: Int): Double = {
    var h = 42L
    h = XXH64.hashInt(table, h)
    h = XXH64.hashInt(b, h)
    h = XXH64.hashInt(j, h)
    // pmod(h, 2) == 0 → +1, else -1 (matches the HOF's pmod branch)
    if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0
  }

  private def ensure(dim: Int): (Int, Array[Double]) = {
    val s = state
    if (s != null && s._1 >= dim) s
    else synchronized {
      val cur = state
      if (cur != null && cur._1 >= dim) cur
      else {
        val cap = math.max(dim, 64)
        val arr = new Array[Double](bits * cap)
        var b = 0
        while (b < bits) {
          var j = 0
          while (j < cap) { arr(b * cap + j) = sign(b, j); j += 1 }
          b += 1
        }
        val next = (cap, arr)
        state = next
        next
      }
    }
  }

  def bucket(a: ArrayData): Long = {
    val dim = a.numElements()
    val (cap, signs) = ensure(dim)
    var res = 0L
    var b = 0
    while (b < bits) {
      val off = b * cap
      var proj = 0.0
      var j = 0
      while (j < dim) {
        proj += a.getFloat(j).toDouble * signs(off + j)
        j += 1
      }
      if (proj >= 0) res += (1L << b)
      b += 1
    }
    res
  }
}

/** array<float> → long SRP bucket id; see [[SrpKernel]]. */
case class SrpBucket(child: Expression, table: Int, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "srp_bucket"

  @transient private lazy val kernel = new SrpKernel(table, bits)

  override def nullSafeEval(a: Any): Any =
    kernel.bucket(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpKernel", kernel,
      classOf[SrpKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.bucket($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}
