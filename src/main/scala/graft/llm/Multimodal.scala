package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Multimodal column handling (north-star scope, SURVEY.md §2.2 ⊕):
  * media as opaque `binary` columns with typed metadata structs, plus the
  * decode / feature-extract plumbing a media pipeline needs.
  *
  * STUB BOUNDARY: this container has no image/audio codecs, so the
  * decode step is a clearly-marked deterministic fake
  * ([[fakeDecodeFeatures]]) — real deployments swap in a codec behind
  * the same column contract (binary in → fixed-width feature struct
  * out). Everything around the stub — the schema (binary + metadata
  * struct), the batch shape (pure column expressions over partitioned
  * scans, no driver collect), and the downstream consumers — is real and
  * tested.
  *
  * Scale notes: binary payloads ride parquet as byte arrays; at 100 TB
  * the table is partitioned by media kind + date, metadata columns allow
  * pruning without touching payload bytes (columnar projection means a
  * metadata-only query never reads the blobs).
  */
object Multimodal {

  /** Deterministic fake "decoder" — stands in for image/audio decode.
    * Real impl would be a vectorized UDF over the binary column. */
  private def fakeDecodeFeatures(bin: org.apache.spark.sql.Column) = struct(
    octet_length(bin).as("n_bytes"),
    crc32(bin).as("checksum"),
    (crc32(bin) % 256).cast("int").as("fake_width"),
    (crc32(bin) % 192).cast("int").as("fake_height"))

  /** Documents re-cast as a multimodal table: text + binary payload +
    * typed metadata, with stubbed decode features and a metadata-only
    * projection (which never touches payload bytes). */
  def multimodalColumns(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("meta", struct(
        lit("text/plain").as("mime"),
        octet_length(col("payload")).as("n_bytes"),
        col("lang").as("lang")))
      .withColumn("features", fakeDecodeFeatures(col("payload")))
      .select(
        col("doc_id"),
        col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"),
        col("features.checksum").as("checksum"),
        col("features.fake_width").as("fake_width"),
        col("features.fake_height").as("fake_height"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_columns" -> (multimodalColumns _)
  )

  /** crc32 exists in both engines? DuckDB lacks crc32 — no oracle;
    * rows-only check. */
  val oracles: Map[String, String] = Map.empty
}
