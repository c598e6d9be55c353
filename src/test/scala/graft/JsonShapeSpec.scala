package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.JsonShapeProbe

/** The streaming shape probe must match the reference's classification
  * (reference src/function_app.py:149-159, 284-289) without parsing
  * payloads it can classify from the first token. */
class JsonShapeSpec extends AnyFunSuite {
  private def shape(s: String): String =
    JsonShapeProbe.shape(UTF8String.fromString(s)).toString

  test("top-level array is rows") {
    assert(shape("""[{"a":1},{"a":2}]""") == "rows")
    assert(shape("""  [1,2,3]""") == "rows")
    assert(shape("""[]""") == "rows")
  }

  test("object of arrays is columnar") {
    assert(shape("""{"a":[1,2],"b":["x",null]}""") == "columnar")
    assert(shape("""{"a":[]}""") == "columnar")
    assert(shape("""{"a":[[1],[2]]}""") == "columnar")
  }

  test("object with any non-array value is single") {
    assert(shape("""{"a":[1],"b":2}""") == "single")
    assert(shape("""{"a":1}""") == "single")
    assert(shape("""{}""") == "single") // empty dict: size>0 required
  }

  test("a string value starting with '[' is NOT an array (regex-probe bug)") {
    assert(shape("""{"a":"[not an array"}""") == "single")
  }

  test("scalars, garbage and trailing junk are single") {
    assert(shape(""""just a string"""") == "single")
    assert(shape("42") == "single")
    assert(shape("not json at all") == "single")
    assert(shape("""{"a":[1]} trailing""") == "single")
  }

  test("expression evaluates in a Spark plan and in SQL") {
    val spark = TestSpark.spark
    import spark.implicits._
    graft.ingest.Codecs.register(spark)
    val out = Seq("""[{"a":1}]""", """{"a":[1]}""", """{"a":1}""", "junk")
      .toDF("p")
      .selectExpr("json_shape(p) AS s")
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("rows", "columnar", "single", "single"))
  }
}
