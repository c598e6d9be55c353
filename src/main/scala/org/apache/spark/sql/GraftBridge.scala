package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.StructType

/** Bridge into `private[sql]` surface needed by the graft engine's custom
  * Catalyst expressions (Spark 4 removed the public
  * `new Column(expr)` constructor in the Spark Connect refactor; classic
  * mode exposes the conversion via `classic.ExpressionUtils`, which is
  * package-private). Standard extension-library pattern.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `DataFrame` over an `RDD[InternalRow]` WITHOUT the external-Row
    * encode/decode round-trip of the public `createDataFrame(RDD[Row])`
    * (which deserializes every UTF8String/Decimal to its JVM mirror
    * only to re-encode it one operator later). Used by the total-order
    * machinery (`graft.queries.Ordered.withGlobalIndex`), whose input
    * IS already an internal-row RDD from `queryExecution.toRdd`. The
    * resulting `RDDScanExec` applies its own UnsafeProjection per row,
    * so reused/joined input rows are safe here, exactly as they are
    * for a data source scan. */
  def internalCreateDataFrame(s: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    s.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
