package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions registers the engine's SQL functions via the standard
  * SparkSessionExtensions hook (spark.sql.extensions). */
class ExtensionsSpec extends AnyFunSuite {

  test("all registered functions resolve and evaluate through SQL") {
    val spark = TestSpark.spark
    graft.ingest.Codecs.register(spark)
    val row = spark.sql(
      """SELECT
        |  clean_base64('?b?2s=') AS cb,
        |  json_shape('[1,2]') AS js,
        |  try_utf8_decode(try_decompress(CAST('ok' AS BINARY))) AS td,
        |  vec_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |          CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS vd,
        |  vec_norm(CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS vn
        |""".stripMargin).head()
    assert(row.getString(0) == "b2s=")
    assert(row.getString(1) == "rows")
    assert(row.getString(2) == "ok")
    assert(row.getDouble(3) == 11.0)
    assert(row.getDouble(4) == 5.0)
  }

  test("vec_dot is null on dimension mismatch (zip_with contract)") {
    val spark = TestSpark.spark
    graft.ingest.Codecs.register(spark)
    val row = spark.sql(
      """SELECT vec_dot(CAST(array(1.0) AS ARRAY<FLOAT>),
        |               CAST(array(1.0, 2.0) AS ARRAY<FLOAT>)) AS v
        |""".stripMargin).head()
    assert(row.isNullAt(0))
  }

  test("FuseDecodeChain collapses the composed decode chain into decode_payload") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    graft.ingest.Codecs.register(spark)
    val df = spark.range(1)
      .select(concat(lit("??"), base64(lit("hello").cast("binary")), lit("!!"))
        .as("Data"))
      .select(graft.ingest.Codecs.decodePayload(col("Data")).as("p"))
    // rule fires: the optimized plan carries the fused expression, not
    // the four-stage composition (constant input would fold — the concat
    // over base64 of a literal DOES fold, so probe with a column too)
    val colDf = spark.range(3)
      .select(base64(col("id").cast("string").cast("binary")).as("Data"))
      .select(graft.ingest.Codecs.decodePayload(col("Data")).as("p"))
    val opt = colDf.queryExecution.optimizedPlan.toString
    assert(opt.contains("decode_payload"), opt)
    assert(!opt.contains("try_utf8_decode"), opt)
    assert(df.head().getString(0) == "hello")
    assert(colDf.collect().map(_.getString(0)).toSeq == Seq("0", "1", "2"))
  }

  test("fused decode_payload matches the composed chain on adversarial inputs") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    graft.ingest.Codecs.register(spark)
    import spark.implicits._
    def gz(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close(); bos.toByteArray
    }
    val b64 = java.util.Base64.getEncoder
    val samples = Seq(
      b64.encodeToString("plain".getBytes("UTF-8")),          // identity
      b64.encodeToString(gz("zipped payload")),               // gzip
      "??" + b64.encodeToString(gz("junk-wrapped")) + "!!",   // junk
      "A",                                                    // dangling unit
      "====",                                                 // pads only
      "",                                                     // empty
      b64.encodeToString(Array[Byte](-1, -2, -3))             // bad utf8
    )
    val df = samples.toDF("Data")
    // stage-by-stage ground truth, evaluated directly on the JVM (no
    // Catalyst, no fusion rule): what the four-expression composition
    // computes by construction
    import org.apache.spark.unsafe.types.UTF8String
    val composed = samples.map { s =>
      val cleaned = graft.functions.Base64Cleaner.clean(
        UTF8String.fromString(s))
      val bin = graft.functions.PayloadCodec.unbase64OrNull(cleaned)
      if (bin == null) null
      else {
        val utf8 = graft.functions.Utf8Codec.decodeOrNull(
          graft.functions.ZlibCodec.decompress(bin))
        if (utf8 == null) null else utf8.toString
      }
    }
    val fused = df
      .select(graft.ingest.Codecs.decodePayload(col("Data")).as("p"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(fused == composed, s"fused=$fused composed=$composed")
    assert(composed == Seq("plain", "zipped payload", "junk-wrapped",
      null, null, "", null))
  }

  test("extensions inject both custom functions without error") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // injection is buffered inside SparkSessionExtensions; a session
    // built with these extensions resolves the functions — equivalent
    // registry path is exercised end-to-end in TryDecompressSpec via
    // Codecs.register + SQL.
  }

  test("registered function resolves and evaluates through SQL") {
    val spark = TestSpark.spark
    val out = spark.sql(
      "SELECT try_utf8_decode(try_decompress(CAST('ok' AS BINARY))) AS v")
      .head().getString(0)
    assert(out == "ok")
  }
}
