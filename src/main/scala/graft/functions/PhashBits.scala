package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** pHash kernel: 8×8 integer DCT-II of the first 64 character codes +
  * AC-mean thresholding, one compiled pass per row.
  *
  * Why a custom expression (SURVEY §7.3 decision rule, third strike
  * after CdcChunks and the jaccard kernels): the relational form —
  * a projected 64-element `px` array feeding 63 generated 64-term
  * sums — is correct but Catalyst's CollapseProject inlines the `px`
  * projection into every one of the 4096 term references, so each
  * `ascii(substring(text, i, 1))` re-executes per TERM and the scan
  * measured 68.9 s at sf0.1. This kernel extracts the codes once and
  * runs the 63×64 multiply-add in compiled Scala: same fixture-exact
  * integers, ~100× less work.
  *
  * Arithmetic contract (mirrored by the generated DuckDB oracle in
  * [[graft.llm.Multimodal]]): basis C[u][j] = round(cos(π(2j+1)u/16)
  * ·1e6) computed ONCE here on the driver; per-term literal is the
  * pre-multiplied C[u][j]·C[v][k] (≤ 1e12, so a 64-term sum of
  * ≤ 255·1e12 terms stays ≤ 1.63e16); the AC mean divides with the
  * +63e15/−1e15 offset so the dividend is positive (engines disagree
  * on negative integer division). Inputs shorter than 64 chars → null
  * (the query filters them anyway). ASCII fixture: char codes ==
  * ascii() of the oracle's one-char substrings.
  */
object PhashKernel {
  /** ×1e6 fixed-point DCT-II basis — the single shared definition the
    * oracle renders into literal digits. */
  val dctC: Array[Array[Long]] = Array.tabulate(8, 8)((u, j) =>
    math.round(math.cos(math.Pi * (2 * j + 1) * u / 16.0) * 1000000.0))

  /** The 63 AC coefficient positions (DC dropped). */
  val acPositions: Seq[(Int, Int)] =
    for { u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0 }
      yield (u, v)

  /** Flattened per-coefficient term weights: m(t)(j·8+k) =
    * C[u_t][j]·C[v_t][k]. */
  private val m: Array[Array[Long]] = acPositions.toArray.map {
    case (u, v) =>
      Array.tabulate(64)(i => dctC(u)(i / 8) * dctC(v)(i % 8))
  }

  def bits(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.length < 64) return null
    val px = new Array[Long](64)
    var i = 0
    while (i < 64) {
      val c = str.charAt(i).toLong
      // stub frames are byte strings: every pixel is 0..255. A char
      // outside that range is not a valid stub frame — return null
      // (the kernel's existing can't-hash contract) instead of letting
      // a ~2.6e20 accumulator silently wrap the Long mean (where the
      // BIGINT oracle would raise instead — round-12 advice)
      if (c > 255L) return null
      px(i) = c
      i += 1
    }
    val d = new Array[Long](63)
    var sum = 0L
    var t = 0
    while (t < 63) {
      val mt = m(t)
      var acc = 0L
      var j = 0
      while (j < 64) { acc += px(j) * mt(j); j += 1 }
      d(t) = acc
      sum += acc
      t += 1
    }
    val mean = (sum + 63000000000000000L) / 63L - 1000000000000000L
    val out = new Array[Byte](63)
    t = 0
    while (t < 63) {
      out(t) = if (d(t) > mean) '1' else '0'
      t += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** StringType → StringType (63-bit string); see [[PhashKernel.bits]]. */
case class PhashBits(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "phash_bits"

  override def nullSafeEval(input: Any): Any =
    PhashKernel.bits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // result can be null for short inputs even when the child is not
    val b = ctx.freshName("phb")
    nullSafeCodeGen(ctx, ev, c => s"""
      UTF8String $b = graft.functions.PhashKernel.bits($c);
      if ($b == null) { ${ev.isNull} = true; } else { ${ev.value} = $b; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PhashBits =
    copy(child = newChild)
}
