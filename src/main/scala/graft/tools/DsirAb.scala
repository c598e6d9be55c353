package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for sample_dsir's intermediate shape (round 15): the
  * (doc_id, lang, bucket) count table feeds BOTH the 1024-bucket fit
  * side and the per-doc score side. Current shape caches it; the
  * lang-id audit this round showed InMemory columnar encode of a
  * large count table can cost more than recomputing the generate.
  * Variants (identical results by construction — integer counts,
  * same fit/score expressions):
  *   A  cache (production shape)
  *   B  no cache — the explode+agg runs once per consumer
  * Each timed twice, interleaved, to share JIT and host noise. */
object DsirAb {
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
    val bean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time(tag: String)(f: => Unit): Unit = {
      val c0 = bean.getProcessCpuTime
      val t0 = System.nanoTime()
      f
      println(f"$tag%-22s wall=${(System.nanoTime() - t0) / 1e9}%6.2f " +
        f"cpu=${(bean.getProcessCpuTime - c0) / 1e9}%7.2f")
    }

    def db(s: SparkSession): DataFrame =
      s.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"), col("lang"),
          (org.apache.spark.sql.GraftBridge.column(graft.functions.Md5Prefix(
            org.apache.spark.sql.GraftBridge.expression(col("tok")), 6))
            % 1024L).as("bucket"))
        .groupBy(col("doc_id"), col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n"))

    def rest(dbRel: DataFrame, dbRel2: DataFrame): DataFrame = {
      val k = 100
      val bucketC = dbRel.groupBy(col("bucket")).agg(
        sum(col("n")).as("c_r"),
        sum(when(col("lang") === "en", col("n")).otherwise(0L)).as("c_t"))
      val totals = bucketC.agg(
        sum(col("c_r")).as("n_r"), sum(col("c_t")).as("n_t"))
      val logRatio = bucketC
        .crossJoin(broadcast(totals))
        .select(col("bucket"),
          expr("""CAST(ROUND(ln((CAST(c_t + 1 AS DOUBLE) *
                  (n_r + 1024)) /
                  (CAST(c_r + 1 AS DOUBLE) * (n_t + 1024))), 6)
                  AS DECIMAL(18,6))""").as("lr"))
      dbRel2
        .join(broadcast(logRatio), Seq("bucket"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("n").cast("decimal(12,0)") * col("lr")).as("wsum"))
        .orderBy(col("wsum").desc, col("doc_id"))
        .limit(k)
        .select(col("doc_id"), col("lang"),
          col("wsum").cast("double").as("dsir_w"))
        .orderBy(col("doc_id"))
    }

    (1 to 3).foreach { i =>
      time(s"A cache      #$i") {
        val c = db(spark).cache()
        rest(c, c).count(); ()
      }
      spark.catalog.clearCache()
      time(s"B two-pass   #$i") {
        val u = db(spark)
        rest(u, u).count(); ()
      }
      spark.catalog.clearCache()
      time(s"C locchkpt   #$i") {
        val c = db(spark).localCheckpoint()
        rest(c, c).count(); ()
      }
      spark.catalog.clearCache()
    }
    // result equality of the two shapes
    val c = db(spark).cache()
    val u = db(spark)
    val ra = rest(c, c); val rb = rest(u, u)
    println("diff rows = " +
      (ra.exceptAll(rb).count() + rb.exceptAll(ra).count()))
    spark.stop()
  }
}
