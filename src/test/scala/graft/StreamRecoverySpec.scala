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
