package graft.functions

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Streaming JSON shape classifier (reference shape detection,
  * src/function_app.py:149-159, 284-289):
  *
  *  - top-level array                      → "rows"
  *  - object, every top-level value array  → "columnar"
  *  - any other valid JSON / garbage       → "single"
  *
  * Why a custom expression: the naive probe
  * (`from_json(payload, MapType)` + per-value regex) materializes and
  * fully parses every payload — and for the overwhelmingly common
  * "rows" case (top-level array) the map parse FAILS, paying Spark's
  * exception-driven bad-record path per row (~17 s of a 33 s stage at
  * 50k envelopes in IngestProfile). This probe reads just enough
  * tokens to classify: one token for arrays/scalars; field names +
  * `skipChildren` for objects. No materialization, no exceptions on
  * the happy path.
  *
  * Also stricter than the regex probe: an object value that is a
  * STRING starting with '[' is not mistaken for an array.
  */
object JsonShapeProbe {
  private val factory = new JsonFactory()
  private val ROWS = UTF8String.fromString("rows")
  private val COLUMNAR = UTF8String.fromString("columnar")
  private val SINGLE = UTF8String.fromString("single")

  def shape(payload: UTF8String): UTF8String =
    try {
      val parser = factory.createParser(payload.getBytes)
      try {
        parser.nextToken() match {
          case JsonToken.START_ARRAY => ROWS
          case JsonToken.START_OBJECT =>
            var nFields = 0
            var t = parser.nextToken()
            while (t == JsonToken.FIELD_NAME) {
              if (parser.nextToken() != JsonToken.START_ARRAY) return SINGLE
              parser.skipChildren()
              nFields += 1
              t = parser.nextToken()
            }
            // a complete object with no trailing garbage and >= 1 field
            if (t == JsonToken.END_OBJECT && parser.nextToken() == null &&
              nFields > 0) COLUMNAR
            else SINGLE
          case _ => SINGLE
        }
      } finally parser.close()
    } catch { case _: Exception => SINGLE }
}

/** StringType → StringType shape tag; see [[JsonShapeProbe.shape]]. */
case class JsonShape(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "json_shape"

  override def nullSafeEval(input: Any): Any =
    JsonShapeProbe.shape(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JsonShapeProbe.shape($c)")

  override protected def withNewChildInternal(newChild: Expression): JsonShape =
    copy(child = newChild)
}
