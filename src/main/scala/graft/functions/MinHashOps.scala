package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** minhash_sig(text, n): the n seeded-xxhash64 MinHash minima over the
  * DISTINCT space-split tokens of `text`, as one compiled O(tokens·n)
  * pass inside the scan (round 15). Replaces the explode(array_distinct
  * (split)) + n-way min-aggregate pipeline — the signature build was
  * the most expensive stage of the whole minhash family (~2.5 s of
  * every minhash key, ~8.5 s of the write-once mh_sigs materialization
  * at sf0.1), with the n xxhash64(lit(i), tok) evaluations re-hashing
  * the seed integer per token row. Bit-identical: xxhash64(lit(i),
  * tok) folds as hashUnsafeBytes(tok, hashInt(i, 42)) — the integer
  * prefix is a constant per position, precomputed once; token
  * distinctness is SQL binary equality (UTF8String.equals). Null text
  * propagates null (the relational form dropped the row; callers
  * filter nulls to keep that observable). */
case class MinHashSig(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1)
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any =
    MinHashKernel.sig(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" graft.functions.MinHashKernel.sig($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashKernel {
  private val space = UTF8String.fromString(" ")
  // seeds(i) = xxhash64's fold of the IntegerType literal i at session
  // seed 42 — the constant prefix of xxhash64(lit(i), tok)
  private val maxPrecomputed = 64
  private val seeds: Array[Long] =
    Array.tabulate(maxPrecomputed)(i => XXH64.hashInt(i, 42L))

  def sig(text: UTF8String, n: Int): GenericArrayData = {
    val toks = text.split(space, -1)
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val seen = new java.util.HashSet[UTF8String]()
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (seen.add(tok)) {
        var i = 0
        while (i < n) {
          val seed = if (i < maxPrecomputed) seeds(i) else XXH64.hashInt(i, 42L)
          val h = XXH64.hashUnsafeBytes(
            tok.getBaseObject, tok.getBaseOffset, tok.numBytes, seed)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(mins)
  }
}

/** token_gram_hashes(text, k): one row (n_tokens, pos, h) per
  * overlapping k-token shingle, where h = xxhash64 (seed 42) of the
  * shingle's tokens joined with a single space — exactly
  * xxhash64(array_join(slice(split(text, ' '), pos, k), ' ')) — and
  * pos is 1-based. Replaces the transform(sequence(...))/slice/
  * array_join HOF fan of [[graft.llm.Dedup.dedupSubstringSpans]]
  * (interpreted per gram, O(len·k) UTF8String re-slicing) with one
  * O(len·k) compiled pass. Emits nothing when the document has fewer
  * than k tokens (mirrors the caller's size filter). */
case class TokenGramHashes(child: Expression, k: Int) extends Expression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k >= 1)
  override def children: Seq[Expression] = Seq(child)
  override def elementSchema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("pos", LongType, nullable = false),
    StructField("h", LongType, nullable = false)))
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input")
  }
  override def prettyName: String = "token_gram_hashes"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val toks = v.asInstanceOf[UTF8String]
      .split(TokenGramHashes.space, -1)
    val nTok = toks.length
    if (nTok < k) return Iterator.empty
    val tokBytes = new Array[Array[Byte]](nTok)
    var i = 0
    while (i < nTok) { tokBytes(i) = toks(i).getBytes; i += 1 }
    (0 to nTok - k).iterator.map { p =>
      var len = k - 1
      var j = p
      while (j < p + k) { len += tokBytes(j).length; j += 1 }
      val buf = new Array[Byte](len)
      var off = 0
      j = p
      while (j < p + k) {
        if (j > p) { buf(off) = ' '; off += 1 }
        val tb = tokBytes(j)
        System.arraycopy(tb, 0, buf, off, tb.length)
        off += tb.length
        j += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      InternalRow(nTok, (p + 1).toLong, h)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TokenGramHashes =
    copy(child = newChildren.head)
}

object TokenGramHashes {
  private[functions] val space = UTF8String.fromString(" ")
}

/** md5_prefix(s, nHex): the BIGINT value of the first `nHex` hex digits
  * of md5(s) — exactly CAST(conv(substring(md5(s), 1, nHex), 16, 10)
  * AS BIGINT) as one compiled call (round 15): the relational chain
  * materializes the 32-char hex string, substrings it, and re-parses
  * digits through conv's string machinery PER ROW; the token-bucket
  * idiom runs it once per TOKEN in the classifier/DSIR/feature-hash
  * family. Thread-local MessageDigest (the AresSampleAgg discipline).
  * nHex <= 15 keeps the value far inside Long. */
case class Md5Prefix(child: Expression, nHex: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nHex >= 1 && nHex <= 15)
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_prefix"

  override def nullSafeEval(a: Any): Any =
    Md5Kernel.prefix(a.asInstanceOf[UTF8String], nHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Kernel.prefix($c, $nHex)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix =
    copy(child = newChild)
}

object Md5Kernel {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def prefix(s: UTF8String, nHex: Int): Long =
    prefixBytes(s.getBytes, nHex)

  def prefixBytes(bytes: Array[Byte], nHex: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < nHex) {
      val b = d(i >> 1) & 0xFF
      val nib = if ((i & 1) == 0) b >> 4 else b & 0xF
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}

/** token_gram_md5(text, k, nHex): [[TokenGramHashes]] with the
  * winnowing family's md5-prefix gram hash — one row (pos, h) per
  * overlapping k-token shingle, h = [[Md5Prefix]](gram, nHex) of the
  * space-joined gram, pos 1-based. Emits nothing under k tokens. */
case class TokenGramMd5(child: Expression, k: Int, nHex: Int)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k >= 1 && nHex >= 1 && nHex <= 15)
  override def children: Seq[Expression] = Seq(child)
  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("h", LongType, nullable = false)))
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input")
  }
  override def prettyName: String = "token_gram_md5"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val toks = v.asInstanceOf[UTF8String].split(TokenGramHashes.space, -1)
    val nTok = toks.length
    if (nTok < k) return Iterator.empty
    val tokBytes = new Array[Array[Byte]](nTok)
    var i = 0
    while (i < nTok) { tokBytes(i) = toks(i).getBytes; i += 1 }
    (0 to nTok - k).iterator.map { p =>
      var len = k - 1
      var j = p
      while (j < p + k) { len += tokBytes(j).length; j += 1 }
      val buf = new Array[Byte](len)
      var off = 0
      j = p
      while (j < p + k) {
        if (j > p) { buf(off) = ' '; off += 1 }
        val tb = tokBytes(j)
        System.arraycopy(tb, 0, buf, off, tb.length)
        off += tb.length
        j += 1
      }
      InternalRow((p + 1).toLong, Md5Kernel.prefixBytes(buf, nHex))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TokenGramMd5 =
    copy(child = newChildren.head)
}
