package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev utility: print the formatted physical plan of one or more
  * SparkEntry queries. Usage:
  *   sbt "runMain graft.tools.Explain <sfDir> <query> [query...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ingest.Codecs.register(spark)
    args.tail.foreach { q =>
      println(s"========== $q ==========")
      println(graft.SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
