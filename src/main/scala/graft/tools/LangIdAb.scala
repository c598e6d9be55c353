package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** A/B harness for the text_char_lang_id shapes (round 15): times the
  * two-pass/no-spread, two-pass/spread variants back to back in one
  * session so host contention hits both equally. Diagnostic only. */
object LangIdAb {
  private def trigrams(s: SparkSession, d: String, spread: Boolean): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val base0 = t(s, d, "documents").select(col("doc_id"), col("lang"), col("text"))
    // inline round-robin spread (the rejected variant, kept here so
    // the A/B stays reproducible)
    val base =
      if (spread && base0.rdd.getNumPartitions < s.sparkContext.defaultParallelism)
        base0.repartition(s.sparkContext.defaultParallelism)
      else base0
    base.select(col("doc_id"), col("lang"),
      GraftBridge.column(graft.functions.CharNGrams(
        GraftBridge.expression(col("text")), 3)).as("g"))
  }

  private def langId(s: SparkSession, d: String, spread: Boolean): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("g").asc)
    val profile = trigrams(s, d, spread).groupBy(col("lang"), col("g"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 50)
      .select(col("lang").as("profile_lang"), col("g"))
    val docTg = trigrams(s, d, spread)
      .select(col("doc_id"), col("lang"), col("g"))
      .distinct()
    val overlap = docTg.join(broadcast(profile), "g")
      .groupBy(col("doc_id"), col("lang"), col("profile_lang"))
      .agg(count(lit(1)).as("overlap"))
    val byOverlap = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("overlap").desc, col("profile_lang").asc)
    overlap
      .withColumn("rn", row_number().over(byOverlap))
      .filter(col("rn") === 1)
      .groupBy(col("lang"), col("profile_lang").as("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("lang_pred"))
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time(tag: String, f: () => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val c0 = bean.getProcessCpuTime
        val t0 = System.nanoTime()
        f().count()
        val dt = (System.nanoTime() - t0) / 1e9
        val dc = (bean.getProcessCpuTime - c0) / 1e9
        println(f"$tag run$i wall=$dt%.2f cpu=$dc%.2f")
        spark.catalog.clearCache()
      }
    }
    time("nospread", () => langId(spark, d, spread = false))
    time("spread  ", () => langId(spark, d, spread = true))
    spark.stop()
  }
}
