package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing of the ingest pipeline on the
  * IngestBench corpus — decode chain, shape detect, JSON parse,
  * stringify, parquet write — to find the per-row bottleneck. */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(50000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val raw = spark.range(n).mapPartitions(
      _.map(IngestBench.envelope(_, 20, 8))).toDF("value").cache()
    time("generate+cache")(raw.count())

    val cfg = graft.ingest.Pipeline.IngestConfig(outDir = "/tmp/ingest_profile_out")
    val envelopes = graft.ingest.Pipeline.parseEnvelopes(raw)
    // force real evaluation — count() alone prunes the computed columns
    time("parse envelopes (forced)")(
      envelopes.agg(sum(length(col("Data")))).head())
    time("clean_base64 only (forced)")(
      envelopes.select(graft.ingest.Codecs.cleanBase64(col("Data")).as("c"))
        .agg(sum(length(col("c")))).head())
    time("clean+unbase64 (forced)")(
      envelopes.select(unbase64(graft.ingest.Codecs.cleanBase64(col("Data"))).as("b"))
        .agg(sum(octet_length(col("b")))).head())
    val decoded = graft.ingest.Pipeline.decodeAndRoute(envelopes, cfg)
    time("full decode chain (forced)")(
      decoded.agg(sum(length(col("payload_str")))).head())
    time("decode + from_json map shape probe (forced)")(
      decoded.select(from_json(col("payload_str"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)).as("m"))
        .agg(count(col("m"))).head())
    time("route columns only (forced)")(
      decoded.agg(sum(length(col("folder"))), sum(length(col("tbl")))).head())
    time("decode + shape probe only (forced)")(
      graft.ingest.Pipeline.withShape(decoded)
        .agg(count(when(col("shape") === "rows", 1))).head())
    val shapedPlain = graft.ingest.Pipeline.withShape(decoded)
      .filter(col("payload_str").isNotNull)
      .select("folder", "source_db", "tbl", "shape", "payload_str")
    time("payload_str ONLY -> parquet write")(
      decoded.select("payload_str").write.mode("overwrite")
        .parquet("/tmp/ingest_profile_stage_p"))
    time("payload_str + shape -> parquet write")(
      graft.ingest.Pipeline.withShape(decoded)
        .select("payload_str", "shape").write.mode("overwrite")
        .parquet("/tmp/ingest_profile_stage_ps"))
    println("[profile] staging plan:\n" +
      shapedPlain.queryExecution.executedPlan.toString)
    time("decoded -> parquet staging write")(
      shapedPlain.write.mode("overwrite").parquet("/tmp/ingest_profile_stage"))
    time("re-read staged parquet (count forced)")(
      spark.read.parquet("/tmp/ingest_profile_stage")
        .agg(sum(length(col("payload_str")))).head())
    val shaped = shapedPlain.cache()
    time("shape detect + cache")(shaped.count())
    val payloads = shaped.filter(col("tbl") === "table0")
      .select("payload_str").as[String]
    val parsed = time("schema inference (1 route)")(spark.read.json(payloads))
    time("json parse count (1 route)")(parsed.count())
    val norm = graft.ingest.Normalize.stringifyAll(
      parsed.select(parsed.schema.fieldNames.filter(_ != "_corrupt_record")
        .map(col).toSeq: _*))
    time("parse+stringify+write (1 route)") {
      norm.write.mode("overwrite").option("maxRecordsPerFile", 2000)
        .parquet("/tmp/ingest_profile_out/t0")
    }
    time("write without maxRecordsPerFile") {
      norm.write.mode("overwrite").parquet("/tmp/ingest_profile_out/t0b")
    }
    spark.stop()
  }
}
