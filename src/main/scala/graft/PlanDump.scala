package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Formatted-plan dumper for PLANS.md maintenance: prints each named
  * query's `explain("formatted")` against the given sf dir.
  *
  * Usage: runMain graft.PlanDump <sfDir> <query> [query ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ingest.Codecs.register(spark)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"========== $n ==========")
      println(df.queryExecution.explainString(
        ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
