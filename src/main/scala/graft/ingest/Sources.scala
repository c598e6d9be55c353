package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Envelope stream sources (reference operator `source_eventhub`,
  * src/function_app.py:302-309: one Event Hub event body per
  * invocation). The engine consumes any source that yields one envelope
  * body string per row in a `value` column — everything downstream
  * ([[Pipeline.parseEnvelopes]] onward) is source-agnostic.
  *
  * Production: the Kafka/Event Hubs connector —
  * `spark.readStream.format("kafka")… selectExpr("CAST(value AS
  * STRING)")` — plugs in here unchanged; the connector jar is not in
  * this offline container, so only the file and in-memory sources are
  * exercised by tests (they share the exact downstream pipeline).
  */
object Sources {

  /** Streaming file source: one envelope JSON (or array) per line. */
  def fileText(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n.toLong))
    r.text(dir).select(col("value"))
  }

  /** Batch file source over the same layout (for reprocessing/backfill —
    * identical downstream semantics, Spark's batch/streaming unification). */
  def fileTextBatch(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(dir).select(col("value"))

  /** Normalize a Kafka-wire-shaped frame (binary `value` plus key/
    * topic/partition/offset metadata columns) to the envelope contract.
    * This is the ONE projection between `format("kafka").load()` and
    * [[Pipeline.parseEnvelopes]], factored out so tests can drive it
    * with a `MemoryStream` carrying Kafka's wire schema — the
    * connector-jar-gated branch and the tested branch share every
    * downstream instruction (see SourcesSpec "kafka wire schema"). */
  def fromWire(wire: DataFrame): DataFrame =
    wire.selectExpr("CAST(value AS STRING) AS value")

  /** Generic streaming source by format name, cast to the envelope
    * contract. Use `format = "kafka"` with the connector on the
    * classpath; `options` carries bootstrap servers/topic etc. */
  def stream(spark: SparkSession, format: String,
      options: Map[String, String]): DataFrame =
    fromWire(spark.readStream.format(format).options(options).load())

  /** Canonical Kafka connector option map (the reference's Event Hub
    * trigger, src/function_app.py:302-309 — Event Hubs exposes the
    * Kafka wire surface, so the same option names configure either).
    * `extra` passes through verbatim and wins on conflicts — the slot
    * for SASL/TLS auth, `maxOffsetsPerTrigger` rate caps,
    * `failOnDataLoss`, etc. */
  def kafkaOptions(bootstrapServers: String, subscribe: String,
      startingOffsets: String = "latest",
      extra: Map[String, String] = Map.empty): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> subscribe,
      "startingOffsets" -> startingOffsets) ++ extra

  /** Same map read from session conf, so a cluster user configures the
    * real source with spark-submit `--conf` alone — no code changes:
    * `spark.graft.kafka.bootstrapServers` / `.subscribe` /
    * `.startingOffsets` (optional, default latest), plus every
    * `spark.graft.kafka.option.<key>` forwarded verbatim as `<key>`. */
  def kafkaOptionsFromConf(spark: SparkSession): Map[String, String] = {
    val prefix = "spark.graft.kafka.option."
    val extra = spark.conf.getAll.collect {
      case (k, v) if k.startsWith(prefix) => k.stripPrefix(prefix) -> v
    }
    kafkaOptions(
      spark.conf.get("spark.graft.kafka.bootstrapServers"),
      spark.conf.get("spark.graft.kafka.subscribe"),
      spark.conf.getOption("spark.graft.kafka.startingOffsets")
        .getOrElse("latest"),
      extra)
  }

  /** The production entry point: `format("kafka")` + canonical options,
    * normalized to the envelope contract. Jar-gated — resolves once the
    * connector artifact is on the classpath; every downstream
    * instruction is the tested [[fromWire]] → Pipeline path. */
  def kafka(spark: SparkSession, bootstrapServers: String,
      subscribe: String, startingOffsets: String = "latest",
      extra: Map[String, String] = Map.empty): DataFrame =
    stream(spark, "kafka",
      kafkaOptions(bootstrapServers, subscribe, startingOffsets, extra))

  /** [[kafka]] configured entirely from session conf. */
  def kafkaFromConf(spark: SparkSession): DataFrame =
    stream(spark, "kafka", kafkaOptionsFromConf(spark))
}
