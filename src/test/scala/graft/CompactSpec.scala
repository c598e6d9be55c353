package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ingest.{Compact, Pipeline}

/** Compaction must shrink file counts without changing a single row. */
class CompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("compact rewrites a chunked ingest output to few files, same rows") {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft_compact").toString
    // many small files: 2 routes x 200 single-row payloads, 10 rows/file
    val envs = (0 until 400).map { i =>
      val b64 = java.util.Base64.getEncoder.encodeToString(
        s"""{"k":$i,"v":"x$i"}""".getBytes("UTF-8"))
      s"""{"MessageType":"Raw","Source":"db.t${i % 2}","Destination":"c","Data":"$b64"}"""
    }
    Pipeline.ingest(spark, envs.toDF("value"),
      Pipeline.IngestConfig(outDir = out, maxRecordsPerFile = 10))
    val before = spark.read.parquet(out)
      .select("k", "v", "folder", "source_db", "table")
      .collect().map(_.toString).sorted

    val reports = Compact.compactAll(spark, out, targetRecordsPerFile = 1000000L)
    assert(reports.size == 2)
    reports.foreach { r =>
      assert(r.filesBefore >= 20, r) // 200 rows / 10 per file
      assert(r.filesAfter == 1, r)
      assert(r.rows == 200L, r)
    }
    val after = spark.read.parquet(out)
      .select("k", "v", "folder", "source_db", "table")
      .collect().map(_.toString).sorted
    assert(after.sameElements(before))
  }

  test("compactTable leaves the directory intact when the read fails") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_compact_bad").toString
    intercept[Exception] {
      Compact.compactTable(spark, s"$dir/nonexistent")
    }
  }
}
