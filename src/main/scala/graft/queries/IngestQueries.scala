package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.ingest.{Codecs, Pipeline, Routing}

/** Batch-oracled versions of the reference's ingest operators
  * (SURVEY.md §2.1 #3, #9, #10, #12, #14): base64 cleaning + decode,
  * route resolution, chunk numbering, stringify-normalization and
  * row-flattening — expressed over the deterministic test tables so the
  * DuckDB oracle can replay them. The streaming pipeline composition of
  * the same logic lives in `graft.ingest`.
  */
object IngestQueries {

  /** base64 → clean → decode round-trip (reference src/function_app.py:
    * 118-127,278). Pure built-ins: regexp_replace + repeat + unbase64. */
  def ingestBase64Roundtrip(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(
        col("doc_id"),
        // Spark's base64 emits MIME-chunked output (\r\n every 76 chars);
        // strip the wrapping for the canonical unchunked form.
        regexp_replace(base64(col("text").cast("binary")), "[\\r\\n]", "")
          .as("b64"),
        decode(unbase64(base64(col("text").cast("binary"))), "UTF-8").as("rt"))
      .orderBy(col("doc_id"))

  /** Strip non-base64 chars and re-pad to a multiple of 4
    * (reference clean_base64, src/function_app.py:118-127): the payload is
    * corrupted with junk chars and stripped padding, then recovered. */
  def ingestBase64Clean(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("corrupt",
        concat(lit("??"),
          regexp_replace(base64(col("text").cast("binary")), "=", ""),
          lit("!!")))
      .withColumn("padded", Codecs.cleanBase64(col("corrupt")))
      .select(
        col("doc_id"),
        col("padded"),
        decode(unbase64(col("padded")), "UTF-8").as("rt"))
      .orderBy(col("doc_id"))

  /** Route resolution (reference resolve_folder_and_table,
    * src/function_app.py:97-113): strip + keep `[a-zA-Z0-9._-]` in
    * Source, split on the FIRST dot into (db, table) else duplicate,
    * `unknown_db`/`unknown_table` for empty parts, sanitize all parts by
    * `_`-replacing illegal runs, fall back to a default folder when
    * Destination is empty. Inputs are synthesized from documents
    * (source/lang) and cycle through the adversarial shapes: all-illegal
    * Source (→ unknown_db/unknown_table), multi-dot, padded, dotless,
    * and Destinations with spaces/illegal runs (→ `_`). */
  def routeResolve(s: SparkSession, d: String): DataFrame = {
    val n5 = (col("doc_id") % 5).cast("string")
    val base = t(s, d, "documents")
      .withColumn("src_raw",
        when(col("doc_id") % 4 === 0, lit("!!!"))
          .when(col("doc_id") % 4 === 1,
            concat(col("source"), lit(".Tbl "), n5))
          .when(col("doc_id") % 4 === 2,
            concat(lit("  "), col("source"), lit("..Multi.Dot"), n5,
              lit("  ")))
          .otherwise(concat(lit("NoDotTable"), n5)))
      .withColumn("dest_raw",
        when(col("doc_id") % 3 === 0, lit(""))
          .when(col("doc_id") % 3 === 1,
            concat(lit("My Folder-"), col("lang")))
          .otherwise(concat(lit("x!!"), col("lang"))))
    Routing.withRoute(base, col("src_raw"), col("dest_raw"), "landing")
      .select(col("doc_id"), col("folder"), col("source_db"), col("tbl"))
      .orderBy(col("doc_id"))
  }

  /** Batch chunking to MAX_BATCH_SIZE rows (reference
    * src/function_app.py:379-401): explicit batch numbering over a total
    * order, aggregated per chunk so the oracle can verify sizes.
    *
    * Scale shape: the exact 0-based global row index comes from
    * [[Ordered.withGlobalIndex]] (repartitionByRange + per-partition
    * monotonically_increasing_id rank + broadcast prefix-sum of
    * per-partition counts — no single-partition window over the fact
    * table, every task parallel). The production sink chunks per-task
    * via `spark.sql.files.maxRecordsPerFile` (see
    * graft.ingest.Pipeline); this query pins the reference's explicit
    * MAX_BATCH_SIZE numbering semantics oracle-checkably. */
  def chunkBatches(s: SparkSession, d: String): DataFrame = {
    val keys = Seq(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"))
    Ordered.withGlobalIndex(t(s, d, "lineitem").select(keys: _*), keys, "rn")
      .withColumn("batch_number", expr("CAST(rn DIV 2000 AS INT)"))
      .groupBy(col("batch_number"))
      .agg(
        count(lit(1)).as("row_count"),
        min(col("l_orderkey")).as("min_key"),
        max(col("l_orderkey")).as("max_key"))
      .orderBy(col("batch_number"))
  }

  /** Type-erasing normalization (reference _normalize_columnar /
    * _rows_to_columnar, src/function_app.py:161-175,200-220): every cell
    * to string — numerics via fixed-point format, timestamps via explicit
    * ISO-style format (engine-portable, unlike raw double→string casts). */
  def normalizeStringify(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(
        col("o_orderkey"),
        col("o_custkey").cast("string").as("s_custkey"),
        col("o_orderstatus").as("s_status"),
        format_string("%.2f", col("o_totalprice")).as("s_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("s_orderdate"),
        col("o_orderpriority").as("s_priority"))
      .orderBy(col("o_orderkey"))

  /** Rows→columnar→rows round-trip (reference _flatten_decoded_rows +
    * _rows_to_columnar, src/function_app.py:193-220): group lineitems per
    * order into an array of structs, then explode back — identity on the
    * projected columns, which is exactly what the oracle asserts. */
  def rowsFlatten(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(struct(
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))))
        .as("rows"))
      .select(col("l_orderkey"), explode(col("rows")).as("r"))
      .select(
        col("l_orderkey"),
        col("r.l_linenumber").as("l_linenumber"),
        col("r.l_quantity").as("l_quantity"),
        col("r.l_extendedprice").as("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))

  /** Deterministic synthetic envelopes covering every payload variant of
    * FIXTURES.md §B (gzip/deflate/zlib/plain compression, rows/columnar/
    * scalar shapes, adversarial base64 junk). */
  def syntheticEnvelopes: Seq[String] = {
    import java.util.Base64
    def b64(b: Array[Byte]) = Base64.getEncoder.encodeToString(b)
    def gz(s: String) = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close(); bos.toByteArray
    }
    def deflate(s: String, nowrap: Boolean) = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, nowrap)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](65536)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val rowsPayload = """[{"device_id":"d1","temp_c":21.5,"ok":true,"tags":["a","b"]},{"device_id":"d2","temp_c":22.0,"ok":false,"tags":[]}]"""
    val columnarPayload = """{"device_id":["d3","d4"],"temp_c":[20.0,null]}"""
    val singlePayload = """{"device_id":"d5","temp_c":19.0}"""
    Seq(
      s"""{"MessageType":"Raw","Source":"factorydb.sensor_readings","Destination":"telemetry","Data":"${b64(gz(rowsPayload))}"}""",
      s"""{"MessageType":"Raw","Source":"factorydb.sensor_readings","Destination":"telemetry","Data":"${b64(deflate(columnarPayload, nowrap = true))}"}""",
      s"""{"MessageType":"Raw","Source":"factorydb.sensor_readings","Destination":"telemetry","Data":"??${b64(deflate(singlePayload, nowrap = false))}!!"}""",
      s"""{"MessageType":"Raw","Source":"otherdb.metrics","Destination":"","Data":"${b64(rowsPayload.getBytes("UTF-8"))}"}""",
      s"""[{"MessageType":"Raw","Source":"arraydb.t1","Destination":"arr","Data":"${b64(singlePayload.getBytes("UTF-8"))}"}]""",
      // adversarial (FIXTURES.md §B.5): dotless source duplicates into
      // both route parts; missing Data → null payload, dropped; source
      // of only illegal chars → routed to unknown_db/unknown_table and
      // PERSISTED (reference function_app.py:106-111); non-JSON body
      // → wrapped as {"Data": body}, undecodable, dropped
      s"""{"MessageType":"Raw","Source":"nodb_table","Destination":"plain","Data":"${b64(singlePayload.getBytes("UTF-8"))}"}""",
      """{"MessageType":"Raw","Source":"missing.data","Destination":"x"}""",
      s"""{"MessageType":"Raw","Source":"!!!","Destination":"ok","Data":"${b64(singlePayload.getBytes("UTF-8"))}"}""",
      "this is not json at all")
  }

  /** Decode-chain round-trip through the custom TryDecompress expression.
    * Oracled since round 5 via a semantics-derived VALUES relation (the
    * routedCountsOracle pattern): every expected row follows from
    * FIXTURES.md §B and the reference's decode semantics — each
    * compressed variant (gzip / raw-deflate / zlib-with-junk) decodes
    * back to its known constant payload, plain base64 passes through,
    * and missing-Data / non-JSON bodies yield NULL payloads. */
  def ingestTryDecompress(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val raw = s.createDataset(syntheticEnvelopes).toDF("value")
    Pipeline.decodeAndRoute(Pipeline.parseEnvelopes(raw),
        Pipeline.IngestConfig(outDir = "", destinationFallback = "landing"))
      .select(col("Source"), col("folder"), col("source_db"), col("tbl"),
        col("payload_str"))
      .orderBy(col("folder"), col("source_db"), col("tbl"), col("payload_str"))
  }

  /** Full pipeline → partitioned parquet → read-back (no oracle; the
    * driver checks rows>0, the scalatest E2E spec checks contents). */
  def sinkParquetRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val out = graft.util.TempDirs.create("graft_sink_roundtrip").toString
    val raw = s.createDataset(syntheticEnvelopes).toDF("value")
    Pipeline.ingest(s, raw, Pipeline.IngestConfig(outDir = out))
    s.read.parquet(out)
      .groupBy(col("folder"), col("source_db"), col("table"))
      .agg(count(lit(1)).as("rows_written"))
      .orderBy(col("folder"), col("source_db"), col("table"))
  }

  /** Ingest → many chunked files → compact → few files, same rows
    * (no oracle; deterministic: file counts are reported as relations
    * to avoid task-parallelism-dependent absolute numbers). */
  def compactRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val out = graft.util.TempDirs.create("graft_compact_rt").toString
    val envs = (0 until 300).map { i =>
      val b64 = java.util.Base64.getEncoder.encodeToString(
        s"""{"k":$i,"v":"doc$i"}""".getBytes("UTF-8"))
      s"""{"MessageType":"Raw","Source":"db.t${i % 3}","Destination":"c","Data":"$b64"}"""
    }
    Pipeline.ingest(s, envs.toDF("value"),
      Pipeline.IngestConfig(outDir = out, maxRecordsPerFile = 10))
    val reports = graft.ingest.Compact.compactAll(s, out).compacted
    reports.map(r => (r.path.split("/table=").last, r.rows,
        r.filesAfter, r.filesBefore > r.filesAfter))
      .toDF("table", "rows", "files_after", "compacted_smaller")
      .orderBy(col("table"))
  }

  /** Lakehouse latest-wins upsert — the CDC merge that sits next to
    * compaction in table maintenance: a changes batch (1/5 of events by
    * id, standing in for the incremental feed) merges into the base
    * table; per key the winning row is max (ts, event_id). Expressed as
    * union + rank-1 filter so Spark plans a WindowGroupLimit: each map
    * task keeps only its local per-key latest BEFORE the exchange, so
    * the shuffle carries ~|keys| rows per task, not the full history —
    * the property that makes merge-on-read viable at 100 TB. (A real
    * lakehouse would also prune base files by the changes' key range;
    * file-level pruning is demonstrated by scan_file_metadata.) */
  def mergeUpsertLatest(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
    val base = ev.filter(col("event_id") % 5 < 4)
      .withColumn("src", lit("base"))
    val changes = ev.filter(col("event_id") % 5 === 4)
      .withColumn("src", lit("change"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    base.unionByName(changes)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"),
        round(col("value"), 2).as("last_value"), col("src"))
      .orderBy(col("user_id"))
  }

  /** Full MERGE INTO semantics over a CDC batch — the lakehouse
    * upsert-with-tombstones shape that [[mergeUpsertLatest]]'s pure
    * last-writer-wins does not cover: a TARGET snapshot (each user's
    * state before the cut) merged with a CHANGES batch (events at/after
    * the cut, collapsed to latest-per-key with 'error' mapped to a
    * DELETE tombstone), via WHEN MATCHED UPDATE / WHEN MATCHED DELETE /
    * WHEN NOT MATCHED INSERT. Expressed as: per-side latest-per-key
    * windows (both partitioned on user_id) + ONE full-outer join on
    * user_id + case logic — the windows leave both sides hash-
    * partitioned on the join key, so the join adds no exchange. At
    * 100 TB the target side is the bucketed table from
    * join_bucketed_colocated's recipe and the whole merge runs with a
    * single shuffle of the (much smaller) change batch. */
  def mergeIntoCdc(s: SparkSession, d: String): DataFrame = {
    val cutMicros = 1705795200000000L // 2024-01-21 00:00:00 UTC
    // key = (user_id, k from the props JSON): ~100 k-values per user
    // keeps all four MERGE branches non-vacuous at every sf — keys
    // born after the cut INSERT, keys untouched after the cut are
    // kept, touched keys UPDATE, and a latest-is-'error' tombstone
    // DELETEs the row
    val ev = t(s, d, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .withColumn("tsu", unix_micros(col("ts")))
    val w = Window.partitionBy(col("user_id"), col("k"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val target = ev.filter(col("tsu") < cutMicros)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id").as("t_user"), col("k").as("t_k"),
        col("value").as("t_value"), col("event_id").as("t_eid"))
    val batch = ev.filter(col("tsu") >= cutMicros)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id").as("s_user"), col("k").as("s_k"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U"))
          .as("op"),
        col("value").as("s_value"), col("event_id").as("s_eid"))
    target.join(batch,
        col("t_user") === col("s_user") && col("t_k") === col("s_k"),
        "full")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        coalesce(col("t_user"), col("s_user")).as("user_id"),
        coalesce(col("t_k"), col("s_k")).as("k"),
        when(col("s_user").isNull, col("t_value")).otherwise(col("s_value"))
          .as("value"),
        when(col("s_user").isNull, lit("kept"))
          .when(col("t_user").isNull, lit("inserted"))
          .otherwise(lit("updated")).as("action"),
        when(col("s_user").isNull, col("t_eid")).otherwise(col("s_eid"))
          .as("last_event_id"))
      .orderBy(col("user_id"), col("k"))
  }

  /** SCD type-2 history build — the other half of CDC table
    * maintenance next to [[mergeUpsertLatest]]: from each user's event
    * stream, collapse consecutive repeats of the tracked attribute
    * (event_type) into change points, then derive validity intervals
    * [valid_from, valid_to) with lead(); the open interval is the
    * current version. Scale shape: ONE shuffle on user_id serves both
    * window passes (lag for change detection, lead/row_number for
    * intervals share the same partitioning AND ordering, so Catalyst
    * plans a single Exchange+Sort); per-key state is one row of
    * look-ahead, unbounded history safe. */
  def scd2History(s: SparkSession, d: String): DataFrame = {
    val byTs = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val changes = t(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byTs))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
    changes
      .withColumn("version", row_number().over(byTs))
      .withColumn("valid_from_us", unix_micros(col("ts")))
      .withColumn("valid_to_us", lead(unix_micros(col("ts")), 1).over(byTs))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from_us"), col("valid_to_us"), col("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scd2_history" -> (scd2History _),
    "merge_upsert_latest" -> (mergeUpsertLatest _),
    "merge_into_cdc" -> (mergeIntoCdc _),
    "compact_roundtrip" -> (compactRoundtrip _),
    "ingest_base64_roundtrip" -> (ingestBase64Roundtrip _),
    "ingest_base64_clean" -> (ingestBase64Clean _),
    "route_resolve" -> (routeResolve _),
    "chunk_batches" -> (chunkBatches _),
    "normalize_stringify" -> (normalizeStringify _),
    "rows_flatten" -> (rowsFlatten _),
    "ingest_try_decompress" -> (ingestTryDecompress _),
    "ingest_error_rates" -> (ingestErrorRates _),
    "shape_detect_columnar" -> (shapeDetectColumnar _),
    "sink_parquet_roundtrip" -> (sinkParquetRoundtrip _)
  )

  /** Per-route decode health — the error-isolation summary a
    * production ingest pipeline alerts on (reference behavior §2.1
    * #16: one bad envelope must not poison its batch — here the
    * dropped rows are COUNTED per route instead of killing the job):
    * for every resolved route, total envelopes, successfully decoded
    * payloads, drops (missing Data / undecodable body → NULL payload,
    * per function_app.py's silent-skip semantics), and the drop rate.
    * Same synthetic envelope fixture as [[ingestTryDecompress]], so
    * the oracle is the semantics-derived expectation, not an engine
    * dump. One pass, one route-key aggregate. */
  def ingestErrorRates(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val raw = s.createDataset(syntheticEnvelopes).toDF("value")
    Pipeline.decodeAndRoute(Pipeline.parseEnvelopes(raw),
        Pipeline.IngestConfig(outDir = "", destinationFallback = "landing"))
      .groupBy(col("folder"), col("source_db"), col("tbl"))
      .agg(count(lit(1)).as("n_envelopes"),
        count(col("payload_str")).as("n_decoded"))
      .withColumn("n_dropped", col("n_envelopes") - col("n_decoded"))
      .withColumn("drop_rate",
        expr("""ROUND(CAST(n_dropped AS DOUBLE)
                / CAST(n_envelopes AS DOUBLE), 6)"""))
      .orderBy(col("folder"), col("source_db"), col("tbl"))
  }

  /** Shape detection as a GATE row (round-10 directive #4 — §2.1 #7
    * graduates from spec-only to oracled): classify every decoded
    * payload of a synthesized mixed-shape envelope relation with the
    * [[graft.functions.JsonShape]] streaming probe (reference shape
    * rules, src/function_app.py:149-159, 284-289) and count per shape.
    * On top of the shared fixture, the extra envelopes pin the
    * BOUNDARY semantics: decodable-but-not-JSON bytes → "single", an
    * empty array is still "rows", a ZERO-field object is NOT columnar,
    * and one non-array value disqualifies an otherwise-columnar
    * object. The oracle is the semantics-derived VALUES expectation
    * (the ingest_error_rates pattern). One pass, one 4-row aggregate. */
  def shapeDetectColumnar(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import java.util.Base64
    def env(payload: String): String = {
      val b = Base64.getEncoder.encodeToString(payload.getBytes("UTF-8"))
      s"""{"MessageType":"Raw","Source":"shapedb.probe","Destination":"shapes","Data":"$b"}"""
    }
    val extras = Seq(
      env("not json {"),                // decodable garbage → single
      env("""{"a":[1,2],"b":["x"]}"""), // every value an array → columnar
      env("""[]"""),                    // empty top-level array → rows
      env("""{}"""),                    // zero-field object → single
      env("""{"a":[1],"b":2}"""))       // one scalar value → single
    val raw = s.createDataset(syntheticEnvelopes ++ extras).toDF("value")
    Pipeline.decodeAndRoute(Pipeline.parseEnvelopes(raw),
        Pipeline.IngestConfig(outDir = "", destinationFallback = "landing"))
      .withColumn("shape",
        when(col("payload_str").isNull, lit("undecoded"))
          .otherwise(graft.ingest.Codecs.jsonShape(col("payload_str"))))
      .groupBy(col("shape"))
      .agg(count(lit(1)).as("n_payloads"))
      .orderBy(col("shape"))
  }

  /** Shared by sink_parquet_roundtrip and stream_ingest_pipeline —
    * both route the same synthetic envelopes (batch vs 2-micro-batch
    * streaming) and must land the identical routed counts. */
  private[graft] val routedCountsOracle =
    """SELECT * FROM (VALUES
      |  ('arr', 'arraydb', 't1', CAST(1 AS BIGINT)),
      |  ('landing', 'otherdb', 'metrics', 2),
      |  ('ok', 'unknown_db', 'unknown_table', 1),
      |  ('plain', 'nodb_table', 'nodb_table', 1),
      |  ('telemetry', 'factorydb', 'sensor_readings', 5))
      |  AS t(folder, source_db, "table", rows_written)
      |ORDER BY folder, source_db, "table"""".stripMargin

  val oracles: Map[String, String] = Map(
    // semantics-derived expectation (NOT an engine dump): decode chain
    // per FIXTURES.md §B — gzip(rows), raw-deflate(columnar), junk-
    // wrapped zlib(single), plain b64; missing Data and non-JSON wrap
    // decode to NULL; routes per reference function_app.py:88-113
    "ingest_try_decompress" ->
      """SELECT * FROM (VALUES
        |  ('arraydb.t1', 'arr', 'arraydb', 't1',
        |   '{"device_id":"d5","temp_c":19.0}'),
        |  ('otherdb.metrics', 'landing', 'otherdb', 'metrics',
        |   '[{"device_id":"d1","temp_c":21.5,"ok":true,"tags":["a","b"]},{"device_id":"d2","temp_c":22.0,"ok":false,"tags":[]}]'),
        |  (CAST(NULL AS VARCHAR), 'landing', 'unknown_db',
        |   'unknown_table', CAST(NULL AS VARCHAR)),
        |  ('!!!', 'ok', 'unknown_db', 'unknown_table',
        |   '{"device_id":"d5","temp_c":19.0}'),
        |  ('nodb_table', 'plain', 'nodb_table', 'nodb_table',
        |   '{"device_id":"d5","temp_c":19.0}'),
        |  ('factorydb.sensor_readings', 'telemetry', 'factorydb',
        |   'sensor_readings',
        |   '[{"device_id":"d1","temp_c":21.5,"ok":true,"tags":["a","b"]},{"device_id":"d2","temp_c":22.0,"ok":false,"tags":[]}]'),
        |  ('factorydb.sensor_readings', 'telemetry', 'factorydb',
        |   'sensor_readings', '{"device_id":"d5","temp_c":19.0}'),
        |  ('factorydb.sensor_readings', 'telemetry', 'factorydb',
        |   'sensor_readings',
        |   '{"device_id":["d3","d4"],"temp_c":[20.0,null]}'),
        |  ('missing.data', 'x', 'missing', 'data',
        |   CAST(NULL AS VARCHAR)))
        |  AS t("Source", folder, source_db, tbl, payload_str)
        |ORDER BY folder, source_db, tbl, payload_str""".stripMargin,
    "scd2_history" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |), changes AS (
        |  SELECT user_id, ts, event_id, event_type
        |  FROM marked
        |  WHERE prev_type IS NULL OR prev_type <> event_type
        |)
        |SELECT user_id,
        |  CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
        |  event_type,
        |  epoch_us(ts) AS valid_from_us,
        |  lead(epoch_us(ts)) OVER w AS valid_to_us,
        |  lead(epoch_us(ts)) OVER w IS NULL AS is_current
        |FROM changes
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin,
    // semantics-derived shape census: syntheticEnvelopes decode to
    // rows=2 (gzip'd array + plain-b64 array), columnar=1, single=4
    // (3 single-object payloads + the "!!!"-routed one), undecoded=2
    // (missing Data, non-JSON body); the 5 extras add rows=1 ([]),
    // columnar=1, single=3 (garbage bytes, {}, mixed object)
    "shape_detect_columnar" ->
      """SELECT * FROM (VALUES
        |  ('columnar', CAST(2 AS BIGINT)),
        |  ('rows', 3),
        |  ('single', 7),
        |  ('undecoded', 2))
        |  AS t(shape, n_payloads)
        |ORDER BY shape""".stripMargin,
    // semantics-derived per-route decode health: drops are the
    // missing-Data envelope (missing.data) and the non-JSON body
    // (wrapped → unknown_db/unknown_table with NULL Source); all other
    // envelopes decode (FIXTURES.md §B)
    "ingest_error_rates" ->
      """SELECT * FROM (VALUES
        |  ('arr', 'arraydb', 't1',
        |   CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), 0.0),
        |  ('landing', 'otherdb', 'metrics', 1, 1, 0, 0.0),
        |  ('landing', 'unknown_db', 'unknown_table', 1, 0, 1, 1.0),
        |  ('ok', 'unknown_db', 'unknown_table', 1, 1, 0, 0.0),
        |  ('plain', 'nodb_table', 'nodb_table', 1, 1, 0, 0.0),
        |  ('telemetry', 'factorydb', 'sensor_readings', 3, 3, 0, 0.0),
        |  ('x', 'missing', 'data', 1, 0, 1, 1.0))
        |  AS t(folder, source_db, tbl, n_envelopes, n_decoded,
        |       n_dropped, drop_rate)
        |ORDER BY folder, source_db, tbl""".stripMargin,
    // VALUES oracle DERIVED from syntheticEnvelopes' semantics (not
    // from observed output): sensor_readings = 2 (rows payload) + 2
    // (columnar) + 1 (single) = 5; otherdb.metrics falls back to
    // `landing` with 2 rows; arraydb.t1 = 1; dotless `nodb_table`
    // duplicates into both route parts = 1; all-illegal "!!!" routes
    // to unknown_db/unknown_table and is PERSISTED (reference
    // function_app.py:106-111) = 1; missing-Data and non-JSON bodies
    // are dropped. Pins the full ingest→sink→read-back semantics.
    "sink_parquet_roundtrip" -> routedCountsOracle,
    // derived: 300 envelopes cycle i%3 over tables t0/t1/t2 (100 rows
    // each), written at maxRecordsPerFile=10 (10 files/table), then
    // compacted — 100 one-line rows fit one target file, so files_after
    // is 1 and every table strictly shrank
    "compact_roundtrip" ->
      """SELECT * FROM (VALUES
        |  ('t0', CAST(100 AS BIGINT), CAST(1 AS INTEGER), TRUE),
        |  ('t1', 100, 1, TRUE),
        |  ('t2', 100, 1, TRUE))
        |  AS t("table", rows, files_after, compacted_smaller)
        |ORDER BY "table"""".stripMargin,
    "merge_into_cdc" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type, value,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |  FROM events),
        |tgt AS (
        |  SELECT user_id AS t_user, k AS t_k, value AS t_value,
        |    event_id AS t_eid
        |  FROM e WHERE epoch_us(ts) < 1705795200000000
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, k
        |    ORDER BY ts DESC, event_id DESC) = 1),
        |chg AS (
        |  SELECT user_id AS s_user, k AS s_k,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    value AS s_value, event_id AS s_eid
        |  FROM e WHERE epoch_us(ts) >= 1705795200000000
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, k
        |    ORDER BY ts DESC, event_id DESC) = 1)
        |SELECT COALESCE(t_user, s_user) AS user_id,
        |  COALESCE(t_k, s_k) AS k,
        |  CASE WHEN s_user IS NULL THEN t_value ELSE s_value END AS value,
        |  CASE WHEN s_user IS NULL THEN 'kept'
        |       WHEN t_user IS NULL THEN 'inserted'
        |       ELSE 'updated' END AS action,
        |  CASE WHEN s_user IS NULL THEN t_eid ELSE s_eid END
        |    AS last_event_id
        |FROM tgt FULL JOIN chg ON t_user = s_user AND t_k = s_k
        |WHERE op IS NULL OR op <> 'D'
        |ORDER BY user_id, k""".stripMargin,
    "merge_upsert_latest" ->
      """WITH u AS (
        |  SELECT user_id, event_id, ts, event_type, value,
        |    CASE WHEN event_id % 5 = 4 THEN 'change' ELSE 'base' END AS src,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id AS last_event_id,
        |  event_type AS last_type, ROUND(value, 2) AS last_value, src
        |FROM u WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "ingest_base64_roundtrip" ->
      """SELECT doc_id,
        |  to_base64(encode(text)) AS b64,
        |  decode(from_base64(to_base64(encode(text)))) AS rt
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ingest_base64_clean" ->
      """WITH b AS (
        |  SELECT doc_id, text,
        |    '??' || replace(to_base64(encode(text)), '=', '') || '!!' AS corrupt
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, text,
        |    regexp_replace(corrupt, '[^A-Za-z0-9+/=]', '', 'g') AS cleaned
        |  FROM b),
        |p AS (
        |  SELECT doc_id, text,
        |    cleaned || repeat('=', CAST((4 - length(cleaned) % 4) % 4 AS INTEGER)) AS padded
        |  FROM c)
        |SELECT doc_id, padded, decode(from_base64(padded)) AS rt
        |FROM p ORDER BY doc_id""".stripMargin,
    "route_resolve" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0 THEN '!!!'
        |         WHEN doc_id % 4 = 1
        |           THEN source || '.Tbl ' || CAST(doc_id % 5 AS VARCHAR)
        |         WHEN doc_id % 4 = 2
        |           THEN '  ' || source || '..Multi.Dot' ||
        |                CAST(doc_id % 5 AS VARCHAR) || '  '
        |         ELSE 'NoDotTable' || CAST(doc_id % 5 AS VARCHAR) END AS src,
        |    CASE WHEN doc_id % 3 = 0 THEN ''
        |         WHEN doc_id % 3 = 1 THEN 'My Folder-' || lang
        |         ELSE 'x!!' || lang END AS dest
        |  FROM documents),
        |k AS (
        |  SELECT doc_id,
        |    regexp_replace(trim(src), '[^a-zA-Z0-9._-]', '', 'g') AS kept,
        |    trim(dest) AS dest
        |  FROM b),
        |c AS (
        |  SELECT doc_id, dest, strpos(kept, '.') AS dotpos,
        |    CASE WHEN strpos(kept, '.') > 0
        |      THEN substr(kept, 1, CAST(strpos(kept, '.') - 1 AS INTEGER))
        |      ELSE kept END AS db_raw,
        |    CASE WHEN strpos(kept, '.') > 0
        |      THEN substr(kept, CAST(strpos(kept, '.') + 1 AS INTEGER))
        |      ELSE kept END AS tbl_raw
        |  FROM k)
        |SELECT doc_id,
        |  regexp_replace(lower(CASE WHEN dest = '' THEN 'landing'
        |                            ELSE dest END),
        |    '[^a-z0-9_-]+', '_', 'g') AS folder,
        |  regexp_replace(lower(CASE WHEN db_raw = '' THEN 'unknown_db'
        |                            ELSE db_raw END),
        |    '[^a-z0-9_-]+', '_', 'g') AS source_db,
        |  regexp_replace(lower(CASE WHEN tbl_raw = '' THEN 'unknown_table'
        |                            ELSE tbl_raw END),
        |    '[^a-z0-9_-]+', '_', 'g') AS tbl
        |FROM c ORDER BY doc_id""".stripMargin,
    "chunk_batches" ->
      """WITH nr AS (
        |  SELECT l_orderkey,
        |    ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber, l_quantity,
        |                       l_extendedprice) - 1 AS rn
        |  FROM lineitem)
        |SELECT CAST(rn // 2000 AS INTEGER) AS batch_number,
        |       COUNT(*) AS row_count,
        |       MIN(l_orderkey) AS min_key,
        |       MAX(l_orderkey) AS max_key
        |FROM nr GROUP BY batch_number ORDER BY batch_number""".stripMargin,
    "normalize_stringify" ->
      """SELECT o_orderkey,
        |  CAST(o_custkey AS VARCHAR) AS s_custkey,
        |  o_orderstatus AS s_status,
        |  printf('%.2f', o_totalprice) AS s_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS s_orderdate,
        |  o_orderpriority AS s_priority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "rows_flatten" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin
  )
}
