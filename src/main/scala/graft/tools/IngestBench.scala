package graft.tools

import org.apache.spark.sql.SparkSession

/** Ingest-throughput bench for the reference's core workload: envelope
  * JSON → decode → normalize → route → partitioned parquet
  * (graft.ingest.Pipeline). The reference processes ONE event per
  * Python invocation with a per-event blob write (reference
  * src/function_app.py:302-423); this measures the Spark pipeline's
  * bulk rate on the same envelope format.
  *
  * Envelopes are generated DISTRIBUTED (mapPartitions over a range — no
  * driver-side corpus), deterministic by id: three compression variants
  * (gzip / raw-deflate / plain base64) cycling per id, rows-shape JSON
  * payloads, spread over `routes` logical tables.
  *
  * Usage: sbt "runMain graft.tools.IngestBench [nEnvelopes] [rowsPer] [routes]"
  * Prints one JSON line per timed pass: cold (first sight — full schema
  * inference per route) and warm (registry steady state — sample check
  * only).
  */
object IngestBench {

  def envelope(id: Long, rowsPer: Int, routes: Int): String = {
    import java.util.Base64
    val route = id % routes
    val rows = (0 until rowsPer).map { r =>
      s"""{"device_id":"dev${id % 1000}","seq":${id * rowsPer + r},""" +
        s""""temp_c":${20 + (id + r) % 15}.5,"ok":${(id + r) % 2 == 0},""" +
        s""""tags":["t${r % 5}","route$route"]}"""
    }.mkString("[", ",", "]")
    val bytes = (id % 3) match {
      case 0 =>
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(rows.getBytes("UTF-8")); g.close(); bos.toByteArray
      case 1 =>
        val d = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        d.setInput(rows.getBytes("UTF-8")); d.finish()
        val buf = new Array[Byte](rows.length * 2 + 64)
        val n = d.deflate(buf); d.end()
        java.util.Arrays.copyOf(buf, n)
      case _ => rows.getBytes("UTF-8")
    }
    val b64 = Base64.getEncoder.encodeToString(bytes)
    s"""{"MessageType":"Raw","Source":"benchdb.table$route",""" +
      s""""Destination":"bench","Data":"$b64"}"""
  }

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(50000L)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(20)
    val routes = args.lift(2).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // registers the custom functions AND the FuseDecodeChain optimizer
    // rule — the ingest hot path decodes through the fused expression,
    // same as Verify/Bench sessions
    graft.ingest.Codecs.register(spark)
    import spark.implicits._

    val raw = spark.range(n).mapPartitions(
      _.map(envelope(_, rowsPer, routes))).toDF("value").cache()
    raw.count() // materialize generation outside the timed window

    // driftCheckInterval=2: pass 2 trusts the cache with ZERO inference
    // jobs, pass 3 runs the periodic sample drift check — the three
    // steady-state modes in one run
    val registry = new graft.ingest.SchemaRegistry(driftCheckInterval = 2)
    Seq("cold", "warm_trusted", "warm_checked").foreach { pass =>
      val out = java.nio.file.Files
        .createTempDirectory(s"graft_ingest_bench_$pass").toString
      val cfg = graft.ingest.Pipeline.IngestConfig(outDir = out)
      val t0 = System.nanoTime()
      val report = graft.ingest.Pipeline.ingest(spark, raw, cfg, Some(registry))
      val sec = (System.nanoTime() - t0) / 1e9
      val rowsOut = report.written.map(_.rows).sum
      println(f"""{"metric":"ingest_$pass","envelopes":$n,""" +
        f""""rows":$rowsOut,"sec":$sec%.2f,""" +
        f""""env_per_sec":${n / sec}%.0f,"rows_per_sec":${rowsOut / sec}%.0f,""" +
        f""""routes":${report.written.size},"failed":${report.failed.size}}""")
    }
    raw.unpersist()
    spark.stop()
  }
}
