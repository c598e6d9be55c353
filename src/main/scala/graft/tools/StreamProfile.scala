package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: where do the ~2 s stream_* bench entries spend their
  * time — staging (quantiles + bucketed writes) or the streaming run
  * itself? Times each staging ingredient in isolation at the bench
  * dataset. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val ev = graft.Tables.t(spark, d, "events")
    time("events count (warm scan)") { ev.count() }
    time("events count again") { ev.count() }
    val withTsl = ev.withColumn("tsl", col("ts").cast("long"))
    time("approxQuantile err=0.0") {
      withTsl.stat.approxQuantile("tsl", Array(0.25, 0.5, 0.75), 0.0)
    }
    time("approxQuantile again") {
      withTsl.stat.approxQuantile("tsl", Array(0.25, 0.5, 0.75), 0.0)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_profile_stage")
    time("bucketed write (4 parts)") {
      ev.withColumn("bucket", (col("event_id") % 4).cast("int"))
        .repartition(4, col("bucket"))
        .write.partitionBy("bucket").mode("overwrite")
        .parquet(tmp.toString + "/w1")
    }
    time("bucketed write again") {
      ev.withColumn("bucket", (col("event_id") % 4).cast("int"))
        .repartition(4, col("bucket"))
        .write.partitionBy("bucket").mode("overwrite")
        .parquet(tmp.toString + "/w2")
    }
    time("coalesce(1) filtered write") {
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString + "/w3")
    }
    spark.stop()
  }
}
