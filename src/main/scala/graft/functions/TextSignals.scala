package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled per-document signal kernels (round 15) — each collapses a
  * corpus-sized explode + aggregate pipeline into one O(len) pass
  * inside the scan stage, the [[CdcChunks]]/[[SceneCutL1]] discipline:
  * semantics and every output value are unchanged (equivalence pinned
  * by spec tests against the relational form they replace), only the
  * plan shape changes.
  */

/** 64-bit SimHash fingerprint of a space-tokenized document — bit i is
  * set iff the +1/−1 vote sum over token-hash bit i is positive.
  * Replaces the explode(split) + 64-column groupBy aggregate (round
  * 15: 64 sum(when) expressions per token row, ~64M aggregate updates
  * at sf0.1, partial-aggregated inside a single-split scan stage).
  * Tokenization is split(text, ' ') with limit −1 (trailing empties
  * kept — the [[TokenNGrams]] contract) through the SAME UTF8String
  * split path; token hashes are Spark's xxhash64 (XXH64, seed 42) over
  * the token's UTF-8 bytes, so fingerprints are bit-identical to the
  * relational form (DedupSpec pins equality). */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any =
    SimHashKernel.eval(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashKernel.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHashKernel {
  private val space = UTF8String.fromString(" ")

  def eval(text: UTF8String): Long = {
    // the exact split path of Spark's split(text, ' ', -1)
    val toks = text.split(space, -1)
    val votes = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      val h = XXH64.hashUnsafeBytes(
        tok.getBaseObject, tok.getBaseOffset, tok.numBytes, 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) != 0L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }
}

/** tempo_acf(text): the [[graft.llm.Multimodal.multimodalTempo]]
  * autocorrelation argmax as ONE generator row per document — replaces
  * the 64-sample explode + per-doc window sum + ×29 lag fan +
  * (doc, j) self-join + rank (a ~9M-row join at sf0.1) with an O(64×29)
  * integer loop inside the scan. Exactly the relational recipe:
  * x_i = ascii(substring(text, i, 1)) for i = 1..64 (Spark's Ascii =
  * codePointAt(0), replayed here with a code-point walk),
  * X_i = 64·x_i − Σx, r(ℓ) = Σ X_i·X_{i+ℓ}
  * over i with i+ℓ ≤ 64, argmax r over ℓ ∈ [4, 32] with ties to the
  * smallest lag, r0 = ΣX² riding along. Emits nothing for texts
  * shorter than 64 chars (the query's filter also guards). */
case class TempoAcf(child: Expression) extends Expression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def elementSchema: StructType = StructType(Seq(
    StructField("tempo_lag", IntegerType, nullable = false),
    StructField("r_peak", LongType, nullable = false),
    StructField("r0", LongType, nullable = false)))
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input")
  }
  override def prettyName: String = "tempo_acf"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val s = v.asInstanceOf[UTF8String].toString
    // x_i = ascii(substring(text, i, 1)) = the i-th CODE POINT (Spark's
    // Ascii is codePointAt(0) of the substring; substring counts code
    // points) — a proper code-point walk, so supplementary-plane chars
    // match too. length(text) also counts code points, so the <64
    // guard below mirrors the query's filter exactly.
    val x = new Array[Long](64)
    var sum = 0L
    var i = 0
    var ci = 0
    while (i < 64 && ci < s.length) {
      val cp = s.codePointAt(ci)
      x(i) = cp.toLong
      sum += cp
      ci += Character.charCount(cp)
      i += 1
    }
    if (i < 64) return Iterator.empty
    val xc = new Array[Long](64)
    var r0 = 0L
    i = 0
    while (i < 64) {
      xc(i) = 64L * x(i) - sum
      r0 += xc(i) * xc(i)
      i += 1
    }
    var bestLag = 0
    var bestR = Long.MinValue
    var lag = 4
    while (lag <= 32) {
      var r = 0L
      var j = 0
      while (j + lag < 64) {
        r += xc(j) * xc(j + lag)
        j += 1
      }
      if (r > bestR) { bestR = r; bestLag = lag }
      lag += 1
    }
    Iterator(InternalRow(bestLag, bestR, r0))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TempoAcf =
    copy(child = newChildren.head)
}
