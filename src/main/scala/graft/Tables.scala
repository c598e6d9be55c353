package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loader for the driver-generated parquet fixtures
  * (`/root/testdata/sf*`, see FIXTURES.md §A).
  *
  * All queries take the sf dir as a parameter so the same definition runs
  * at any scale factor. At cluster scale the same call sites would point at
  * partitioned table roots; `spark.read.parquet` keeps predicate pushdown,
  * column pruning and partition pruning available to Catalyst.
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts arrives in whatever physical type the fixture generator
    // used for this round — TIMESTAMP(NANOS) reads as a nanos-since-epoch
    // long (spark.sql.legacy.parquet.nanosAsLong=true, set in
    // Verify/Bench/tests), TIMESTAMP(MICROS, isAdjustedToUTC=false) reads
    // as TIMESTAMP_NTZ. Normalize both to the session-UTC TimestampType
    // so every query sees the same type (and unix_micros the same
    // values), matching DuckDB's view of the data.
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
    else df
  }
}
