package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Pipeline
import graft.queries.IngestQueries

/** E2E: synthetic envelopes (FIXTURES.md §B — every payload variant) →
  * full batch pipeline → partitioned string-typed parquet, re-read and
  * asserted (reference data plane src/function_app.py:310-423). */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("full ingest writes routed, chunked, string-typed parquet") {
    val out = Files.createTempDirectory("graft_pipeline_e2e").toString
    val raw = spark.createDataset(IngestQueries.syntheticEnvelopes).toDF("value")
    val report = Pipeline.ingest(spark, raw, Pipeline.IngestConfig(outDir = out))

    assert(report.failed.isEmpty, s"route failures: ${report.failed}")
    val routes = report.written.map(r => (r.folder, r.sourceDb, r.table)).toSet
    // telemetry/factorydb: gzip rows + deflate columnar + zlib single dict
    // landing/otherdb (empty Destination → fallback), arr/arraydb (array envelope)
    assert(routes == Set(
      ("telemetry", "factorydb", "sensor_readings"),
      ("landing", "otherdb", "metrics"),
      ("arr", "arraydb", "t1"),
      // dotless source duplicates into both parts (reference :102)
      ("plain", "nodb_table", "nodb_table"),
      // all-illegal source is PERSISTED under the unknown_* fallbacks
      // (reference :106-111), not dropped
      ("ok", "unknown_db", "unknown_table")))

    val tele = spark.read.parquet(s"$out/folder=telemetry/source_db=factorydb/table=sensor_readings")
    // 2 rows (gzip) + 2 rows (columnar deflate) + 1 row (zlib single)
    assert(tele.count() == 5)
    assert(tele.schema.fields.forall(_.dataType.typeName == "string"))
    val d1 = tele.filter(col("device_id") === "d1").head()
    assert(d1.getAs[String]("temp_c") == "21.5")
    assert(d1.getAs[String]("ok") == "true")
    assert(d1.getAs[String]("tags") == """["a","b"]""")
    // columnar null survives (d4's temp_c)
    assert(tele.filter(col("device_id") === "d4" && col("temp_c").isNull).count() == 1)

    // dropped adversarial cases: non-JSON body (wrapped, undecodable)
    // and missing Data key (null payload) — neither appears; the
    // all-illegal-chars source lands under unknown_db/unknown_table
    val all = spark.read.parquet(out)
    assert(all.count() == 5 + 2 + 1 + 1 + 1)
  }

  test("footerMeta embeds the reference's key/value metadata in every parquet footer") {
    // Reference byte surface (src/function_app.py:251-254, 390-413):
    // kind, row_count, folder, source_db, table as parquet key/value
    // schema metadata. Spark serializes field Metadata into each file's
    // footer under org.apache.spark.sql.parquet.row.metadata — read one
    // file back with parquet-hadoop and assert the k/v round-trips.
    val out = Files.createTempDirectory("graft_pipeline_footer").toString
    val raw = spark.createDataset(IngestQueries.syntheticEnvelopes).toDF("value")
    val report = Pipeline.ingest(spark, raw,
      Pipeline.IngestConfig(outDir = out, footerMeta = true),
      batchId = Some(7L))
    assert(report.failed.isEmpty, s"route failures: ${report.failed}")

    val dir = new java.io.File(
      s"$out/folder=telemetry/source_db=factorydb/table=sensor_readings/batch_id=7")
    val pq = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(pq.nonEmpty, s"no parquet files under $dir")
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(pq.head.getAbsolutePath),
      spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val kv = reader.getFooter.getFileMetaData.getKeyValueMetaData
      val schemaJson = kv.get("org.apache.spark.sql.parquet.row.metadata")
      assert(schemaJson != null, s"no spark schema in footer: $kv")
      val st = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      val md = st.fields.head.metadata
      assert(md.getString("folder") == "telemetry")
      assert(md.getString("source_db") == "factorydb")
      assert(md.getString("table") == "sensor_readings")
      assert(md.getString("row_count") == "5")
      assert(md.getString("batch_number") == "7")
      assert(md.getString("kind").nonEmpty)
    } finally reader.close()
  }

  test("typed engine mode preserves inferred types instead of stringifying") {
    val out = Files.createTempDirectory("graft_pipeline_typed").toString
    val raw = spark.createDataset(IngestQueries.syntheticEnvelopes).toDF("value")
    val report = Pipeline.ingest(spark, raw,
      Pipeline.IngestConfig(outDir = out, typedMode = true))
    assert(report.failed.isEmpty, s"route failures: ${report.failed}")
    val tele = spark.read.parquet(
      s"$out/folder=telemetry/source_db=factorydb/table=sensor_readings")
    val types = tele.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("temp_c") == "double", types)
    assert(types("ok") == "boolean", types)
    assert(types("tags").startsWith("array"), types)
    val d1 = tele.filter(col("device_id") === "d1").head()
    assert(d1.getAs[Double]("temp_c") == 21.5)
    assert(d1.getAs[Boolean]("ok"))
  }

  test("single-row columnar compat writer round-trips through explodeColumnar") {
    import graft.ingest.Normalize
    val df = Seq((1, "a", 1.5), (2, "b", 2.5), (3, null, 3.5)).toDF("i", "s", "d")
    val one = Normalize.toSingleRowColumnar(df.orderBy("i"))
    assert(one.count() == 1)
    // every cell is the whole column as LIST<STRING> (reference :234-241)
    val row = one.head()
    assert(row.getSeq[String](0) == Seq("1", "2", "3"))
    assert(row.getSeq[String](1) == Seq("a", "b", null))
    val back = Normalize.explodeColumnar(one)
    assert(back.count() == 3)
    assert(back.columns.toSeq == Seq("i", "s", "d"))
  }

  test("maxRecordsPerFile chunks output files at the batch size") {
    val out = Files.createTempDirectory("graft_pipeline_chunk").toString
    val rows = (1 to 25).map(i => s"""{"v":$i}""").mkString("[", ",", "]")
    val b64 = java.util.Base64.getEncoder.encodeToString(rows.getBytes("UTF-8"))
    val env = s"""{"Source":"db.big","Destination":"f","Data":"$b64"}"""
    val raw = spark.createDataset(Seq(env)).toDF("value")
    val report = Pipeline.ingest(spark, raw,
      Pipeline.IngestConfig(outDir = out, maxRecordsPerFile = 10))
    assert(report.written.map(_.rows).sum == 25)
    val dir = new java.io.File(s"$out/folder=f/source_db=db/table=big")
    val parts = dir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts >= 3, s"expected >=3 chunked files, got $parts")
    assert(spark.read.parquet(dir.toString).count() == 25)
  }

  test("listLayout compat sink: one single-row LIST<STRING> parquet per chunk, lossless") {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val out = Files.createTempDirectory("graft_pipeline_list").toString
    val rows = (1 to 25).map(i =>
      s"""{"v":$i,"w":${if (i % 7 == 0) "null" else s""""x$i""""}}""")
      .mkString("[", ",", "]")
    val b64 = java.util.Base64.getEncoder.encodeToString(rows.getBytes("UTF-8"))
    val env = s"""{"Source":"db.compat","Destination":"f","Data":"$b64"}"""
    val report = Pipeline.ingest(spark,
      spark.createDataset(Seq(env)).toDF("value"),
      Pipeline.IngestConfig(outDir = out, maxRecordsPerFile = 10,
        listLayout = true))
    assert(report.written.map(_.rows).sum == 25)
    val dir = new java.io.File(s"$out/folder=f/source_db=db/table=compat")
    val parts = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    // reference byte shape (src/function_app.py:234-241, 382-401): one
    // single-row table per MAX_BATCH_SIZE chunk, every column LIST<STRING>
    assert(parts.length >= 3, parts.length.toString)
    parts.foreach { f =>
      assert(spark.read.parquet(f.toString).count() == 1, f.getName)
    }
    // chunk-arithmetic invariant (round 8): membership is pure bit
    // surgery on the partition-local monotonically_increasing_id, so
    // every chunk holds AT MOST maxRecordsPerFile rows, but partition
    // tails may run short — boundaries are per-partition, not the
    // reference's strict global MAX_BATCH_SIZE packing (documented at
    // the sink; repartition(1) per route when exact parity matters)
    val sizes = parts.map(f => spark.read.parquet(f.toString)
      .select(size(col("v"))).head().getInt(0)).toSeq
    assert(sizes.forall(n => n >= 1 && n <= 10), sizes.mkString(","))
    assert(sizes.sum == 25, sizes.mkString(","))
    val df = spark.read.parquet(dir.toString)
    assert(df.schema.fields.forall(f =>
      f.dataType == ArrayType(StringType, containsNull = true)), df.schema.treeString)
    // flattening recovers every record, values stringified, nulls kept
    val back = graft.ingest.Normalize.explodeColumnar(df)
    assert(back.count() == 25)
    assert(back.select("v").collect().map(_.getString(0)).toSet ==
      (1 to 25).map(_.toString).toSet)
    assert(back.filter(col("w").isNull).count() == 3)
  }

  test("per-group error isolation: a bad route never blocks good ones") {
    // A payload that decodes to valid JSON for one route plus an envelope
    // whose Data is valid base64 of invalid UTF-8/JSON for another route.
    val ok = s"""{"Source":"gooddb.t","Destination":"f","Data":"${
      java.util.Base64.getEncoder.encodeToString("""{"a":1}""".getBytes)}"}"""
    val bad = s"""{"Source":"baddb.t","Destination":"f","Data":"${
      java.util.Base64.getEncoder.encodeToString(Array[Byte](-1, -2, -3))}"}"""
    val out = Files.createTempDirectory("graft_pipeline_err").toString
    val report = Pipeline.ingest(spark,
      spark.createDataset(Seq(ok, bad)).toDF("value"),
      Pipeline.IngestConfig(outDir = out))
    val good = report.written.filter(_.sourceDb == "gooddb")
    assert(good.nonEmpty && good.head.rows == 1)
  }

  test("failOnRouteError rethrows a route failure (streaming contract)") {
    // two healthy routes; route f2's folder path is pre-created as a
    // FILE so its parquet write deterministically fails. Default config
    // reports and continues (batch isolation); failOnRouteError = true
    // must rethrow so a streaming foreachBatch fails BEFORE the
    // checkpoint commits and the batch replays (round-14 review: a
    // swallowed route failure under streaming loses the route's rows
    // forever).
    def env(dest: String, db: String) =
      s"""{"Source":"$db.t","Destination":"$dest","Data":"${
        java.util.Base64.getEncoder.encodeToString("""{"a":1}""".getBytes)}"}"""
    val out = Files.createTempDirectory("graft_pipeline_fail").toString
    Files.write(java.nio.file.Paths.get(out, "folder=f2"),
      "not a dir".getBytes)
    val rows = spark.createDataset(
      Seq(env("f1", "adb"), env("f2", "bdb"))).toDF("value")
    val report = Pipeline.ingest(spark, rows,
      Pipeline.IngestConfig(outDir = out))
    assert(report.failed.nonEmpty, "f2 route should have failed")
    assert(report.written.exists(_.sourceDb == "adb"))
    intercept[IllegalStateException] {
      Pipeline.ingest(spark, rows,
        Pipeline.IngestConfig(outDir = out, failOnRouteError = true))
    }
  }
}
