package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating functions (Catalyst `Generator`s) for
  * n-gram extraction — the UDTF extension recipe, and a SHUFFLE
  * ELIMINATION: the previous relational route (posexplode single
  * units + lead() windows + concat) costs a full corpus exchange on
  * doc_id for the window sort; a generator emits the n-grams directly
  * inside the scan stage in one O(len) pass per row. (The
  * transform-lambda route it also replaces is worse still: per-element
  * `substring` seeks are O(len) each — O(len²)/row — and the
  * explode-inferred filter inlines the lambda twice; see PERF.md.)
  *
  * Both generators decode the UTF8String once and slide over the
  * decoded form — no quadratic seeks. `CharNGrams` slides over UTF-16
  * code units (identical to code points for BMP text; supplementary-
  * plane chars would need a codePoint walk — noted, not required by
  * the corpus).
  */
abstract class NGramsBase extends Expression with Generator
    with CodegenFallback {
  // extends Expression directly (the Stack-generator shape):
  // UnaryExpression's concrete eval(Any) cannot linearize with
  // Generator's narrowed eval(IterableOnce)
  def child: Expression
  override def children: Seq[Expression] = Seq(child)
  override def elementSchema: StructType =
    StructType(StructField("gram", StringType, nullable = false) :: Nil)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input")
  }
}

/** char_ngrams(text, n): one row per overlapping character n-gram. */
case class CharNGrams(child: Expression, n: Int) extends NGramsBase {
  require(n >= 1, "n must be positive")
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val s = v.asInstanceOf[UTF8String].toString
    if (s.length < n) Iterator.empty
    else (0 to s.length - n).iterator
      .map(i => InternalRow(UTF8String.fromString(s.substring(i, i + n))))
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CharNGrams =
    copy(child = newChildren.head)
  override def prettyName: String = "char_ngrams"
}

/** token_ngrams(text, n): one row per overlapping whitespace-token
  * n-gram (shingle), tokens re-joined with a single space. */
case class TokenNGrams(child: Expression, n: Int) extends NGramsBase {
  require(n >= 1, "n must be positive")
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    // limit -1 keeps trailing empty tokens — DuckDB string_split
    // semantics, which the gazetteer-NER oracle replays (round-12
    // advice: the Char overload drops trailing empties, a latent
    // divergence on texts with trailing/consecutive spaces)
    val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) Iterator.empty
    else (0 to toks.length - n).iterator.map { i =>
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      InternalRow(UTF8String.fromString(sb.toString))
    }
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TokenNGrams =
    copy(child = newChildren.head)
  override def prettyName: String = "token_ngrams"
}

/** cdc_chunks(text): one row per CONTENT-DEFINED chunk — boundaries
  * where the rolling 8-char polynomial hash (base 31, exact BIGINT)
  * hits 0 mod 64, i.e. the FastCDC/rsync boundary rule the
  * dedup_cdc_chunking key defines relationally in its oracle. One
  * O(len) pass per row with an INCREMENTAL window hash (subtract the
  * outgoing char's 31⁷ term, multiply, add) — the HOF/transform route
  * evaluated an interpreted 8-term lambda with per-position substring
  * seeks and measured 810 s at sf0.1; this generator does the same
  * work in 0.2 s (PERF.md round 11). Emits exactly the chunks the
  * SQL recipe keeps: every boundary closes a chunk, the non-empty
  * tail closes the last one. */
case class CdcChunks(child: Expression) extends NGramsBase {
  override def elementSchema: StructType =
    StructType(StructField("chunk", StringType, nullable = false) :: Nil)
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val s = v.asInstanceOf[UTF8String].toString
    if (s.isEmpty) return Iterator.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val p7 = 27512614111L // 31^7
    var h = 0L
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toLong
      h = if (i < 8) h * 31L + c
          else (h - s.charAt(i - 8).toLong * p7) * 31L + c
      if (i >= 7 && h % 64L == 0L) {
        out += InternalRow(UTF8String.fromString(s.substring(start, i + 1)))
        start = i + 1
      }
      i += 1
    }
    if (start < s.length)
      out += InternalRow(UTF8String.fromString(s.substring(start)))
    out.iterator
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CdcChunks =
    copy(child = newChildren.head)
  override def prettyName: String = "cdc_chunks"
}

/** scene_cut_l1(text): one row per FRAME TRANSITION of the stub video
  * — (tr, l1) where frames are 32-codepoint windows at stride 16 and
  * l1 is the character-histogram L1 distance between consecutive
  * frames (the [[graft.llm.Multimodal]] scene-cut signature).
  *
  * Shuffle elimination (round 13): the relational route exploded
  * |docs|·frames·32 char rows through FOUR hash-aggregate exchanges
  * (per-frame histogram, signed union, per-transition L1, per-doc
  * roll-up) — ~5M rows at sf0.1 — for a computation that never leaves
  * one document. This generator emits the (tr, l1) pairs in one
  * O(frames·32) pass inside the scan stage; only the final per-doc
  * roll-up shuffles, on |transitions| ≈ 30·|docs| narrow rows. Same
  * CdcChunks/TokenNGrams in-scan-generator discipline.
  *
  * Codepoint walk (not UTF-16 units): Spark's `substring`/`length`
  * count code points, and the relational form this replaces was
  * defined over them — supplementary-plane text hashes identically.
  * Histograms per transition are rebuilt fresh (2×32 map ops): at ~30
  * transitions/doc the constant factor is irrelevant and the code
  * stays obviously equal to the SQL definition. */
case class SceneCutL1(child: Expression) extends NGramsBase {
  import org.apache.spark.sql.types.{IntegerType, LongType}
  override def elementSchema: StructType =
    StructType(StructField("tr", IntegerType, nullable = false) ::
      StructField("l1", LongType, nullable = false) :: Nil)
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val cp = v.asInstanceOf[UTF8String].toString.codePoints().toArray
    val len = cp.length
    if (len < 96) return Iterator.empty
    val maxf = (len - 32) / 16
    def hist(f: Int): java.util.HashMap[Integer, Integer] = {
      val h = new java.util.HashMap[Integer, Integer](64)
      var i = f * 16
      val end = i + 32
      while (i < end) {
        h.merge(cp(i), 1, (a: Integer, b: Integer) => a + b)
        i += 1
      }
      h
    }
    (0 until maxf).iterator.map { tr =>
      val a = hist(tr)
      val b = hist(tr + 1)
      var l1 = 0L
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val bc = b.getOrDefault(e.getKey, 0)
        l1 += math.abs(e.getValue.toLong - bc.toLong)
      }
      val jt = b.entrySet().iterator()
      while (jt.hasNext) {
        val e = jt.next()
        if (!a.containsKey(e.getKey)) l1 += e.getValue.toLong
      }
      InternalRow(tr, l1)
    }
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SceneCutL1 =
    copy(child = newChildren.head)
  override def prettyName: String = "scene_cut_l1"
}
