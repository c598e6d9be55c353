package graft

import java.util.zip.{Deflater, GZIPOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZlibCodec

/** Decode-fallback semantics of the reference try_decompress
  * (src/function_app.py:129-144): first codec that succeeds wins, total
  * failure returns the input unchanged, never throws. */
class TryDecompressSpec extends AnyFunSuite {

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(b); g.close(); bos.toByteArray
  }

  private def deflate(b: Array[Byte], nowrap: Boolean): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, nowrap)
    d.setInput(b); d.finish()
    val buf = new Array[Byte](b.length * 2 + 1024)
    val n = d.deflate(buf); d.end()
    java.util.Arrays.copyOf(buf, n)
  }

  private val payload = """{"device_id":"d1","temp_c":21.5}""".getBytes("UTF-8")

  test("gzip payload decompresses") {
    assert(ZlibCodec.decompress(gzip(payload)).sameElements(payload))
  }

  test("raw deflate payload decompresses") {
    assert(ZlibCodec.decompress(deflate(payload, nowrap = true)).sameElements(payload))
  }

  test("zlib-with-header payload decompresses") {
    assert(ZlibCodec.decompress(deflate(payload, nowrap = false)).sameElements(payload))
  }

  test("uncompressed payload passes through unchanged") {
    assert(ZlibCodec.decompress(payload).sameElements(payload))
  }

  test("truncated gzip stream falls through to identity") {
    val truncated = gzip(payload).take(10)
    assert(ZlibCodec.decompress(truncated).sameElements(truncated))
  }

  test("empty input passes through") {
    assert(ZlibCodec.decompress(Array.emptyByteArray).sameElements(Array.emptyByteArray))
  }

  test("property: roundtrip for all three codecs, total on arbitrary bytes") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val bytes = new Array[Byte](rnd.nextInt(2048))
      rnd.nextBytes(bytes)
      // total function — never throws on arbitrary input
      ZlibCodec.decompress(bytes)
      assert(ZlibCodec.decompress(gzip(bytes)).sameElements(bytes))
      assert(ZlibCodec.decompress(deflate(bytes, nowrap = true)).sameElements(bytes))
      assert(ZlibCodec.decompress(deflate(bytes, nowrap = false)).sameElements(bytes))
    }
  }

  test("expression works end-to-end in SQL after registration") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(gzip(payload)).toDF("b")
    val out = df.selectExpr("try_decompress(b) AS d").as[Array[Byte]].head()
    assert(out.sameElements(payload))
  }
}
