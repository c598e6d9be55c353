package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, IOException}
import java.util.zip.{DataFormatException, GZIPInputStream, Inflater}

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Best-effort decompression codec mirroring the reference's
  * `try_decompress` (reference src/function_app.py:129-144): ordered
  * fallback gzip → raw deflate (zlib wbits=-15) → zlib-with-header →
  * identity. Total function — never throws; any failure returns the
  * input unchanged.
  */
object ZlibCodec {

  /** Java-callable entry point used by both interpreted eval and the
    * generated code (static forwarder keeps it codegen-friendly). */
  def decompress(data: Array[Byte]): Array[Byte] = {
    val viaGzip = tryGzip(data)
    if (viaGzip != null) return viaGzip
    val viaRaw = tryInflate(data, nowrap = true)
    if (viaRaw != null) return viaRaw
    val viaZlib = tryInflate(data, nowrap = false)
    if (viaZlib != null) return viaZlib
    data
  }

  // Native-resource hygiene (round-14 review): GZIPInputStream and
  // Inflater hold NATIVE zlib state (an inflater + 32 KB window) that
  // the GC only reclaims at finalization. decompress() runs once per
  // envelope, and the common non-gzip case used to abandon one
  // GZIPInputStream per call (and the DataFormatException path skipped
  // inf.end()) — at 50k envelopes/batch that is a steady native-memory
  // ramp on long-lived executors. Every path now releases in finally.

  private def tryGzip(data: Array[Byte]): Array[Byte] = {
    // the constructor itself reads the gzip header (throws on non-gzip
    // input — the COMMON case here), so it must sit inside the try and
    // the close must tolerate a never-assigned stream
    var in: GZIPInputStream = null
    try {
      in = new GZIPInputStream(new ByteArrayInputStream(data))
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } catch {
      case _: IOException | _: EOFException => null
    } finally if (in != null) in.close()
  }

  private def tryInflate(data: Array[Byte], nowrap: Boolean): Array[Byte] = {
    val inf = new Inflater(nowrap)
    try {
      inf.setInput(data)
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        // Truncated stream or preset-dictionary demand: not a clean
        // decompression — reject (the reference's zlib.decompress raises).
        else if (!inf.finished()) return null
      }
      out.toByteArray
    } catch {
      case _: DataFormatException => null
    } finally inf.end()
  }
}

/** Catalyst expression wrapping [[ZlibCodec.decompress]]: BinaryType →
  * BinaryType, null-intolerant, codegen'd via a static call so it stays
  * inside whole-stage codegen (no interpreted fallback on the hot path).
  *
  * Custom expression rationale (SURVEY.md §7.3): Spark has no built-in
  * decompression fallback chain, and expressing it as a Scala UDF would
  * break codegen and add serialization overhead per row.
  */
case class TryDecompress(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // (return type inferred — AbstractDataType is private[sql] in Spark 4)
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "try_decompress"

  override def nullSafeEval(input: Any): Any =
    ZlibCodec.decompress(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ZlibCodec.decompress($c)")

  override protected def withNewChildInternal(newChild: Expression): TryDecompress =
    copy(child = newChild)
}

/** Strict-UTF-8 decode that yields null on malformed input instead of the
  * ANSI error Spark 4's `decode` raises — the reference drops the message
  * on decode failure (src/function_app.py:281-292,330-334) and the
  * pipeline must never die on one bad payload.
  */
object Utf8Codec {
  def decodeOrNull(data: Array[Byte]): org.apache.spark.unsafe.types.UTF8String =
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      val s = dec.decode(java.nio.ByteBuffer.wrap(data)).toString
      org.apache.spark.unsafe.types.UTF8String.fromString(s)
    } catch {
      case _: java.nio.charset.CharacterCodingException => null
    }
}

/** BinaryType → StringType, null (not error) on malformed UTF-8. */
case class TryUtf8Decode(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "try_utf8_decode"
  // produces null from non-null input, so NOT null-intolerant
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Utf8Codec.decodeOrNull(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Utf8Codec.decodeOrNull($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): TryUtf8Decode =
    copy(child = newChild)
}
