package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch ingest pipeline — the Spark-first re-expression of the
  * reference's entire data plane (reference src/function_app.py:310-423):
  * envelope parse → base64 clean/decode → best-effort decompress → JSON
  * payload parse with shape detection → stringify-normalize → route →
  * chunked Snappy Parquet per (folder, source_db, table).
  *
  * Design for scale:
  *  - the decode chain is pure codegen'd expressions over one scan;
  *  - routing cardinality is bounded (it's a set of tables), so the
  *    driver-side loop over distinct routes is O(#tables), never O(rows);
  *  - each route's write is an independent distributed job (per-group
  *    error isolation like the reference's per-group try/except :416-417);
  *  - chunking via `maxRecordsPerFile` is per-task — no global window;
  *  - the streaming wrapper (graft.streaming) calls [[ingest]] from
  *    `foreachBatch`, making the micro-batch the failure domain.
  */
object Pipeline {

  /** Typed envelope (reference fields at src/function_app.py:98,106,273;
    * MessageType from the IoT route filter infra/iothub.tf:55). Use
    * [[typedEnvelopes]] where compile-time field safety pays; the
    * dynamic-schema stages stay DataFrame-typed (SURVEY.md §1.2). */
  case class Envelope(
      Source: Option[String],
      Destination: Option[String],
      Data: Option[String],
      MessageType: Option[String])

  /** Fixed envelope schema. */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("Source", StringType),
    StructField("Destination", StringType),
    StructField("Data", StringType),
    StructField("MessageType", StringType)))

  /** Parsed envelopes as a typed Dataset. */
  def typedEnvelopes(spark: SparkSession, raw: DataFrame): Dataset[Envelope] = {
    import spark.implicits._
    parseEnvelopes(raw).as[Envelope]
  }

  /** `includeMeta` adds the reference's parquet key/value metadata
    * (kind, row_count, batch_number, source_db, table, folder —
    * src/function_app.py:390-399, 405-413) as ordinary queryable columns
    * instead of file metadata (deviation SURVEY.md §7.4(a): columns
    * survive engine migrations and allow pruning). `_batch_number` is a
    * unique id per written file — unlike the reference's dense 0..n it
    * encodes (partition, chunk-in-partition), a documented deviation like
    * §7.4's file naming — and `_row_count` is that file's row count. */
  /** `typedMode = false` (fidelity, default): every cell stringified
    * exactly like the reference (SURVEY.md §1.2). `typedMode = true`
    * (engine mode): keep the inferred types — numbers stay numeric,
    * booleans boolean, nested values struct/array — for downstream
    * engines that want pushdown-able typed columns instead of byte
    * fidelity. Schema-union merge still null-pads either way. */
  /** `failOnRouteError = true` rethrows after the per-route isolation
    * pass instead of only reporting: REQUIRED under streaming
    * foreachBatch, where a swallowed route failure lets the checkpoint
    * commit and the source never replays the batch — the failed
    * route's rows would be lost forever (round-14 review). Batch
    * callers keep the report-and-continue default (partial progress is
    * the point of isolation there; the caller inspects the report). */
  case class IngestConfig(
      outDir: String,
      destinationFallback: String = "landing",
      maxRecordsPerFile: Int = 2000,
      compression: String = "snappy",
      messageType: Option[String] = None,
      includeMeta: Boolean = false,
      typedMode: Boolean = false,
      footerMeta: Boolean = false,
      listLayout: Boolean = false,
      failOnRouteError: Boolean = false)

  case class RouteResult(folder: String, sourceDb: String, table: String,
      rows: Long, kind: String)
  case class IngestReport(written: Seq[RouteResult], failed: Seq[(String, String)])

  /** Raw event bodies (one JSON envelope, a JSON array of envelopes, or
    * garbage per row in `value`) → one row per envelope. Non-JSON bodies
    * are wrapped as `{"Data": body}` (reference src/function_app.py:
    * 322-327). */
  def parseEnvelopes(raw: DataFrame): DataFrame = {
    val asArray = from_json(col("value"), ArrayType(envelopeSchema))
    val asObject = from_json(col("value"), envelopeSchema)
    val wrapped = struct(
      lit(null).cast(StringType).as("Source"),
      lit(null).cast(StringType).as("Destination"),
      col("value").as("Data"),
      lit(null).cast(StringType).as("MessageType"))
    raw
      .withColumn("env",
        explode(coalesce(asArray, array(coalesce(asObject, wrapped)))))
      .select(col("env.Source").as("Source"),
        col("env.Destination").as("Destination"),
        col("env.Data").as("Data"),
        col("env.MessageType").as("MessageType"))
  }

  /** Envelopes → decoded payload strings + route columns. One narrow
    * stage of codegen'd expressions; no shuffle. */
  def decodeAndRoute(envelopes: DataFrame, cfg: IngestConfig): DataFrame = {
    val filtered = cfg.messageType match {
      case Some(mt) => envelopes.filter(col("MessageType") === mt)
      case None => envelopes
    }
    Routing.withRoute(
        filtered.withColumn("payload_str", Codecs.decodePayload(col("Data"))),
        col("Source"), col("Destination"), cfg.destinationFallback)
  }

  /** Per-payload shape classification (reference shape detection
    * src/function_app.py:149-159,284-289): a JSON array is rows; an
    * object whose every top-level value is an array is columnar; any
    * other payload is a single row. Uses the streaming [[graft.functions
    * .JsonShape]] probe — the previous `from_json(MapType)` probe fully
    * parsed every payload and paid the bad-record exception path for
    * every rows-shaped one (17 s of a 33 s stage at 50k envelopes,
    * see PERF.md). */
  def withShape(decoded: DataFrame): DataFrame =
    decoded.withColumn("shape", Codecs.jsonShape(col("payload_str")))

  /** Typed mode appends inferred-type parquet to a fixed directory, so a
    * batch whose inference disagrees with what's already there (long in
    * batch 1, string in batch 2) would poison the directory: readers
    * resolve mixed footer types arbitrarily or break under mergeSchema.
    * Guard: compare against the existing footer before the append and
    * fail the ROUTE (isolated + reported like any route failure) instead
    * of writing. One driver-side footer read per route per typed batch.
    * A shared [[SchemaRegistry]] makes the steady state pass trivially
    * (the cached schema is stable across batches); on real type drift
    * the route fails loudly — rewrite the table (or run stringified
    * fidelity mode) rather than silently mixing types. */
  private def validateTypedAppend(spark: SparkSession, path: String,
      incoming: StructType): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return
    // "has data" means DATA FILES, not a bare directory: an aborted
    // write can leave an empty route dir behind, and reading it throws
    // "unable to infer schema" on every later batch — a permanently
    // poisoned route until someone hand-deletes the dir (round-14
    // review). Hidden/_temporary entries don't count as data.
    def hasDataFile(dir: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(dir).exists { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) false
        else if (st.isDirectory) hasDataFile(st.getPath)
        else st.getLen > 0
      }
    if (!hasDataFile(p)) return
    val existing = spark.read.parquet(path).schema
    val conflicts = incoming.fields.flatMap { f =>
      existing.fields.find(_.name == f.name)
        .filter(_.dataType != f.dataType)
        .map(ex => s"${f.name}: ${ex.dataType.simpleString} on disk vs " +
          s"${f.dataType.simpleString} incoming")
    }
    if (conflicts.nonEmpty)
      throw new IllegalStateException(
        s"typed-mode append would mix parquet types at $path " +
          s"(${conflicts.mkString("; ")}); rewrite the table or use " +
          "stringified mode")
  }

  /** Parse payloads with a cached schema, guarded against the sample
    * drift check's blind spot: rows the sample missed whose TYPES
    * drifted would silently null cells (the cached long can't hold
    * "abc"). A `_corrupt_record` probe column catches every such row
    * during the parse; any hit forces full re-inference, a widen-merge
    * into the registry, and one clean re-parse. New-columns-only drift
    * stays on the sample check's latency (extra JSON fields are not
    * corrupt — they parse silently). */
  private def parseChecked(spark: SparkSession, reg: SchemaRegistry,
      key: (String, String, String, String), schema: StructType,
      payloads: Dataset[String]): DataFrame = {
    if (!reg.corruptRecheck || schema.fields.isEmpty ||
        schema.fieldNames.contains("_corrupt_record"))
      return spark.read.schema(schema).json(payloads)
    val probe = StructType(
      schema.fields :+ StructField("_corrupt_record", StringType))
    val parsed = spark.read.schema(probe)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(payloads)
    val bad = parsed.filter(col("_corrupt_record").isNotNull).count()
    if (bad == 0L) parsed
    else {
      val merged = reg.reinferMerged(spark, key, payloads)
      spark.read.schema(merged).json(payloads)
    }
  }

  /** Reference per-file metadata (row_count, batch_number at
    * function_app.py:390-399) as columns, aligned with the files
    * `maxRecordsPerFile` actually produces: the writer closes a file
    * after every maxRecordsPerFile rows WITHIN a task, so chunk-in-task
    * numbering derived from `monotonically_increasing_id` (pid << 33 |
    * row-in-partition) matches file boundaries exactly — provided no
    * exchange sits between this projection and the write. The per-chunk
    * count joins back as a broadcast (one row per output FILE, i.e.
    * rows/maxRecordsPerFile — at extreme per-route scale a post-write
    * footer manifest is the alternative; parquet footers already carry
    * num_rows). The caller must pass a CACHED df so the two passes see
    * one materialized partition layout. */
  private def withBatchMeta(cached: DataFrame, cfg: IngestConfig): DataFrame = {
    val withId = cached.withColumn("_mid", monotonically_increasing_id())
    val chunk = floor(col("_mid").bitwiseAND(lit((1L << 33) - 1)) /
      cfg.maxRecordsPerFile.toLong).cast("long")
    // chunk < 2^33 for any maxRecordsPerFile >= 1, so shifting the pid
    // back up 33 bits keeps (pid, chunk) collision-free (pid < 2^30 —
    // a billion write tasks per route does not happen)
    val numbered = withId
      .withColumn("_batch_number",
        shiftleft(shiftright(col("_mid"), 33), 33) + chunk)
      .drop("_mid")
    val counts = numbered.groupBy("_batch_number")
      .agg(count(lit(1)).as("_row_count"))
    // broadcast join-back preserves the streamed side's partition layout
    // and row order — the file-boundary alignment depends on it
    numbered.join(broadcast(counts), Seq("_batch_number"))
  }

  /** Full batch ingest: returns what was written where. Failures are
    * isolated per route (reference :416-417) — one bad group never stops
    * the others.
    *
    * `registry`: optional per-route schema cache ([[SchemaRegistry]]).
    * Without it every (route, shape) subset pays a full inference scan
    * per batch (the reference's per-invocation dynamic schema); with it,
    * steady-state batches run a bounded sample check only, and full
    * re-inference happens on first sight and on drift. The streaming
    * wrapper passes one registry across all micro-batches. */
  /** `batchId`: when ingest runs inside a streaming `foreachBatch`,
    * pass the micro-batch id to make the sink IDEMPOTENT under replay —
    * each route writes to a `batch_id=<id>` subdirectory with
    * mode(overwrite), so a batch replayed after a crash between the
    * sink write and the checkpoint commit OVERWRITES its own output
    * instead of appending a duplicate copy. Together with
    * `failOnRouteError = true` (so a failed route fails the batch
    * BEFORE the checkpoint commits, forcing a replay) this upgrades
    * the pipeline from the reference's at-least-once retry to
    * exactly-once end-to-end (file source replays the identical rows;
    * the write is deterministic per batch). Batch callers omit it and
    * keep the flat append layout. Readers are unaffected: `batch_id`
    * surfaces as one more partition column under the route
    * directories. */
  def ingest(spark: SparkSession, rawBodies: DataFrame, cfg: IngestConfig,
      registry: Option[SchemaRegistry] = None,
      batchId: Option[Long] = None): IngestReport = {
    import spark.implicits._
    // CACHE FIRST, FILTER ABOVE THE CACHE. A filter placed under the
    // cache boundary gets pushed beneath the decode projection, where
    // FilterExec re-derives payload_str per predicate with NO
    // subexpression sharing — the decode chain (4 regex evaluations
    // deep) ran ~5x per row before this ordering (IngestProfile:
    // 29 s -> 8 s for the staging pass at 50k envelopes, see PERF.md).
    val staged = withShape(
      decodeAndRoute(parseEnvelopes(rawBodies), cfg)
        .select("folder", "source_db", "tbl", "payload_str"))
      .cache()
    val decoded = staged
      .filter(Routing.validRoute && col("payload_str").isNotNull)
    try {
      // Bounded cardinality: one row per (logical table, payload shape),
      // not per event — a single job discovers the work list, so empty
      // (route, shape) subsets never spawn inference jobs.
      val routeShapes = decoded
        .groupBy("folder", "source_db", "tbl", "shape").count()
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
        .groupBy { case (f, db, tbl, _) => (f, db, tbl) }
        .view.mapValues(_.map(_._4).toSet).toMap
      // Per-route jobs are independent — run them CONCURRENTLY (bounded
      // pool) so one route's small write doesn't leave the cluster idle;
      // Spark's scheduler interleaves the jobs' tasks. Error isolation is
      // unchanged: each future catches its own route's failure.
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val routeKeys = routeShapes.keys.toSeq.sorted
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(8, routeKeys.size)))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      def processRoute(folder: String, db: String, table: String)
          : Either[(String, String), RouteResult] =
        try {
          val group = decoded
            .filter(col("folder") === folder && col("source_db") === db &&
              col("tbl") === table)
          // Process each payload shape separately (columnar payloads must
          // explode, row payloads must not), then merge the normalized
          // halves with null padding — the reference's merge at :367-377.
          val presentShapes = routeShapes((folder, db, table))
          val halves = Seq("rows", "single", "columnar")
            .filter(presentShapes.contains).flatMap { shape =>
            val payloads = group.filter(col("shape") === shape)
              .select("payload_str").as[String]
            // Schema inference per route per shape per batch — the
            // reference's dynamic first-seen schema (:203-207). With a
            // registry, the cached schema replaces the full-data scan.
            val parsed = registry match {
              case Some(reg) =>
                val key = (folder, db, table, shape)
                val schema = reg.schemaFor(spark, key, payloads)
                parseChecked(spark, reg, key, schema, payloads)
              case None => spark.read.json(payloads)
            }
            val dataFields = parsed.schema.fields.filter(_.name != "_corrupt_record")
            if (dataFields.isEmpty) None // non-JSON payloads dropped (:290-292)
            else {
              val clean = parsed.select(dataFields.map(f => col(f.name)).toSeq: _*)
              val rows =
                if (shape == "columnar") Normalize.explodeColumnar(clean)
                else clean
              Some(shape ->
                (if (cfg.typedMode) rows else Normalize.stringifyAll(rows)))
            }
          }
          if (halves.isEmpty) {
            Right(RouteResult(folder, db, table, 0L, "empty"))
          } else {
            val kind = halves.map(_._1).distinct.sorted.mkString("+")
            val merged = Normalize.mergeColumnars(halves.map(_._2))
            val base = (if (cfg.includeMeta)
                merged.withColumn("_kind", lit(kind))
              else merged).cache()
            try {
              val n = base.count()
              val rowOut = if (cfg.includeMeta) withBatchMeta(base, cfg) else base
              // Opt-in byte-layout compat with the reference's writer
              // (src/function_app.py:234-241): one parquet ROW per
              // chunk, every column a LIST<STRING> holding the chunk's
              // stringified values with nulls and row order preserved.
              // OFF by default — the layout defeats row-group pruning
              // and is hostile at scale (SURVEY §1.2) — but with it a
              // reference consumer reads our files unchanged. Chunking
              // reuses the maxRecordsPerFile arithmetic on
              // monotonically_increasing_id, order inside each list is
              // pinned by sorting on that id (collect_list alone is
              // order-unstable), and nulls survive because they ride
              // struct fields, not bare list elements.
              // INVARIANT: the chunk id is pure bit surgery on _mid,
              // so it is fixed the moment _mid is projected — the
              // groupBy's shuffle cannot scramble membership. But _mid
              // is per-PARTITION (pid·2^33 + local index): any
              // repartition of rowOut BEFORE the _mid projection
              // changes chunk membership, and every partition tail
              // emits a short chunk. Boundaries therefore match a
              // reference run's strict MAX_BATCH_SIZE packing only
              // per-partition, not globally (same caveat as the row
              // layout's maxRecordsPerFile chunking); repartition(1)
              // per route if exact batch parity matters.
              val out =
                if (cfg.listLayout) {
                  val dataCols = rowOut.columns.toSeq
                  val chunkOf = shiftleft(shiftright(col("_mid"), 33), 33) +
                    floor(col("_mid").bitwiseAND(lit((1L << 33) - 1)) /
                      cfg.maxRecordsPerFile.toLong).cast("long")
                  val aggs = dataCols.map { c =>
                    transform(
                      array_sort(collect_list(struct(col("_mid").as("i"),
                        col(c).cast("string").as("v")))),
                      x => x.getField("v")).as(c)
                  }
                  rowOut.withColumn("_mid", monotonically_increasing_id())
                    .withColumn("_chunk", chunkOf)
                    .groupBy(col("_chunk"))
                    .agg(aggs.head, aggs.tail: _*)
                    .drop("_chunk")
                } else rowOut
              val routeDir = s"${cfg.outDir}/folder=$folder/source_db=$db/table=$table"
              if (cfg.typedMode) validateTypedAppend(spark, routeDir, out.schema)
              // Footer-metadata compat (reference src/function_app.py:
              // 251-254, 390-413 — parquet key/value schema metadata:
              // kind, row_count, folder, source_db, table): Spark
              // serializes the Catalyst schema INCLUDING per-field
              // Metadata into every file's footer under
              // `org.apache.spark.sql.parquet.row.metadata`, so
              // attaching the reference's k/v map as field metadata on
              // the first column reproduces the byte surface a footer
              // reader consumes. Per-CHUNK batch_number stays a
              // documented deviation (one write covers many files; the
              // _batch_number COLUMN carries it row-level instead).
              val withFooter =
                if (cfg.footerMeta) {
                  val kv = Map("kind" -> kind, "row_count" -> n.toString,
                    "folder" -> folder, "source_db" -> db,
                    "table" -> table) ++
                    batchId.map(id => "batch_number" -> id.toString)
                  val mb = new org.apache.spark.sql.types.MetadataBuilder()
                  kv.foreach { case (k, v) => mb.putString(k, v) }
                  val firstCol = out.schema.fields.head.name
                  out.withColumn(firstCol, col(firstCol).as(firstCol, mb.build()))
                } else out
              // replay-idempotent streaming sink: batch-scoped overwrite
              val (path, mode) = batchId match {
                case Some(id) => (s"$routeDir/batch_id=$id", "overwrite")
                case None => (routeDir, "append")
              }
              withFooter.write.mode(mode)
                .option("compression", cfg.compression)
                // compat layout: each single-row chunk table is its own
                // file — at most maxRecordsPerFile rows per chunk,
                // boundaries per-partition (see INVARIANT above)
                .option("maxRecordsPerFile",
                  if (cfg.listLayout) 1L else cfg.maxRecordsPerFile.toLong)
                .parquet(path)
              Right(RouteResult(folder, db, table, n, kind))
            } finally base.unpersist()
          }
        } catch {
          case e: Exception => Left(s"$folder/$db/$table" -> e.toString)
        }
      val results =
        try Await.result(
          Future.sequence(routeKeys.map { case (f, db, tbl) =>
            Future(processRoute(f, db, tbl))
          }), Duration.Inf)
        finally pool.shutdown()
      val report = IngestReport(
        results.collect { case Right(r) => r },
        results.collect { case Left(f) => f })
      if (cfg.failOnRouteError && report.failed.nonEmpty)
        throw new IllegalStateException(
          s"${report.failed.size} route(s) failed (failOnRouteError): " +
            report.failed.map { case (k, e) => s"$k: $e" }.mkString("; "))
      report
    } finally staged.unpersist()
  }
}
