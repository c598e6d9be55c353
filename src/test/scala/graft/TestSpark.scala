package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for all specs (one JVM-wide session; scalatest
  * suites run sequentially in the forked JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        new java.io.File("target/spark-warehouse").getAbsolutePath)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.util.LogQuiet.suppressKnownBenign()
    graft.ingest.Codecs.register(s)
    s
  }
}
