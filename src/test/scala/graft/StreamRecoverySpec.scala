package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{Pipeline, SchemaRegistry}

/** Exactly-once recovery: the streaming ingest resumed from its
  * checkpoint must process each input file exactly once — the engine's
  * documented improvement over the reference's at-least-once retry
  * (SURVEY.md §7.4: re-raise platform retry + same-second filename
  * overwrites, reference src/function_app.py:421-423,230,346). */
class StreamRecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def envelope(i: Int): String = {
    val b64 = java.util.Base64.getEncoder.encodeToString(
      s"""{"k":$i,"v":"row$i"}""".getBytes("UTF-8"))
    s"""{"MessageType":"Raw","Source":"db.t","Destination":"rec","Data":"$b64"}"""
  }

  private def runOnce(inDir: String, outDir: String, ckpt: String,
      registry: SchemaRegistry): Unit = {
    val q = graft.ingest.Sources.fileText(spark, inDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Pipeline.ingest(spark, batch,
          Pipeline.IngestConfig(outDir = outDir), Some(registry)); ()
      }
      .start()
    q.awaitTermination()
  }

  /** One AvailableNow pass with the batch-scoped idempotent sink
    * (`batchId` threaded through) and an optional injected crash AFTER
    * the sink write of a chosen micro-batch — i.e. between the output
    * becoming durable and the checkpoint committing the epoch, the
    * window where a naive append sink duplicates on replay. */
  private def runIdempotent(inDir: String, outDir: String, ckpt: String,
      registry: SchemaRegistry, crashAfterBatch: Option[Long]): Unit = {
    val q = graft.ingest.Sources
      .fileText(spark, inDir, maxFilesPerTrigger = Some(1))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        Pipeline.ingest(spark, batch,
          Pipeline.IngestConfig(outDir = outDir), Some(registry),
          batchId = Some(id))
        if (crashAfterBatch.contains(id))
          throw new RuntimeException(s"injected crash after batch $id")
        ()
      }
      .start()
    q.awaitTermination()
  }

  test("mid-batch crash after sink write, before commit: replay is exactly-once") {
    val inDir = Files.createTempDirectory("graft_crash_in")
    val outDir = Files.createTempDirectory("graft_crash_out").toString
    val ckpt = Files.createTempDirectory("graft_crash_ckpt").toString
    val registry = new SchemaRegistry()
    // three files -> three micro-batches under maxFilesPerTrigger=1
    Files.write(inDir.resolve("a.txt"),
      (0 until 50).map(envelope).mkString("\n").getBytes("UTF-8"))
    Files.write(inDir.resolve("b.txt"),
      (50 until 80).map(envelope).mkString("\n").getBytes("UTF-8"))
    Files.write(inDir.resolve("c.txt"),
      (80 until 100).map(envelope).mkString("\n").getBytes("UTF-8"))
    inDir.resolve("a.txt").toFile.setLastModified(1700000000000L)
    inDir.resolve("b.txt").toFile.setLastModified(1700000060000L)
    inDir.resolve("c.txt").toFile.setLastModified(1700000120000L)

    // First attempt dies after batch 1's output is on disk but before
    // its epoch commits — the offset log still points at batch 1.
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runIdempotent(inDir.toString, outDir, ckpt, registry,
        crashAfterBatch = Some(1L))
    }
    assert(ex.getMessage.contains("injected crash"), ex.getMessage)
    // batch 1's rows ARE already in the output (the crash is after the
    // write) — this is exactly the state a naive append sink doubles
    val afterCrash = spark.read.parquet(outDir).count()
    assert(afterCrash >= 80L, s"crash landed before batch 1 wrote: $afterCrash")

    // Resume from the same checkpoint: batch 1 REPLAYS (uncommitted) and
    // must overwrite its own batch_id directory, then batch 2 runs.
    runIdempotent(inDir.toString, outDir, ckpt, registry,
      crashAfterBatch = None)
    val rows = spark.read.parquet(outDir)
    assert(rows.count() == 100L,
      s"expected exactly-once replay, got ${rows.count()} rows")
    // the batch oracle: every key exactly once, none lost
    assert(rows.groupBy(col("k")).count()
      .filter(col("count") =!= 1).count() == 0L)
    assert(rows.select(col("k")).distinct().count() == 100L)
  }

  test("resumed stream processes only new files; no duplicates, no loss") {
    val inDir = Files.createTempDirectory("graft_rec_in")
    val outDir = Files.createTempDirectory("graft_rec_out").toString
    val ckpt = Files.createTempDirectory("graft_rec_ckpt").toString
    val registry = new SchemaRegistry()

    Files.write(inDir.resolve("a.txt"),
      (0 until 50).map(envelope).mkString("\n").getBytes("UTF-8"))
    runOnce(inDir.toString, outDir, ckpt, registry)
    val afterFirst = spark.read.parquet(outDir).count()
    assert(afterFirst == 50L)

    // "driver restart": same checkpoint, a new file arrives
    Files.write(inDir.resolve("b.txt"),
      (50 until 80).map(envelope).mkString("\n").getBytes("UTF-8"))
    runOnce(inDir.toString, outDir, ckpt, registry)

    val rows = spark.read.parquet(outDir)
    assert(rows.count() == 80L) // a.txt NOT reprocessed, b.txt appended
    // every k exactly once
    assert(rows.groupBy(col("k")).count()
      .filter(col("count") =!= 1).count() == 0L)
    // steady state: the resumed batch was a registry cache hit
    assert(registry.fullInferCount == 1L)
  }
}
