package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{Pipeline, Skew}

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 10k rows, 90% on one hot key
    val large = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 7)
        .otherwise(lit(42L)).as("k"), col("id").as("v"))
    val small = Seq((42L, "hot"), (0L, "a"), (3L, "b")).toDF("k", "name")
    val plain = large.join(small, "k").select("k", "v", "name")
    val salted = Skew.saltedJoin(large, small, "k", n = 8,
      stableCols = Seq("v")).select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // every salt bucket of the hot key actually gets used
    val buckets = large.withColumn("s", Skew.salt(8, col("v")))
      .filter(col("k") === 42).select("s").distinct().count()
    assert(buckets == 8)
  }

  test("includeMeta adds the kind column to sink output") {
    val out = java.nio.file.Files.createTempDirectory("graft_meta").toString
    val env = s"""{"Source":"db.t","Destination":"f","Data":"${
      java.util.Base64.getEncoder.encodeToString("""{"a":1}""".getBytes)}"}"""
    Pipeline.ingest(spark, Seq(env).toDF("value"),
      Pipeline.IngestConfig(outDir = out, includeMeta = true))
    val df = spark.read.parquet(out)
    assert(df.columns.contains("_kind"))
    assert(df.select("_kind").head().getString(0) == "single")
  }

  test("includeMeta batch metadata aligns with the actual parquet files") {
    val out = java.nio.file.Files.createTempDirectory("graft_meta_b").toString
    // 25 single-payload envelopes for one route, chunked 10 per file
    val envs = (0 until 25).map { i =>
      s"""{"Source":"db.t","Destination":"f","Data":"${
        java.util.Base64.getEncoder.encodeToString(
          s"""{"a":$i}""".getBytes)}"}"""
    }
    val rep = Pipeline.ingest(spark, envs.toDF("value"),
      Pipeline.IngestConfig(outDir = out, includeMeta = true,
        maxRecordsPerFile = 10))
    assert(rep.failed.isEmpty)
    val dir = new java.io.File(s"$out/folder=f/source_db=db/table=t")
    val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    var total = 0L
    files.foreach { f =>
      val one = spark.read.parquet(f.getAbsolutePath)
      val metas = one.select("_batch_number", "_row_count")
        .distinct().collect()
      // every row of a file carries exactly its file's (batch, count)
      assert(metas.length == 1, s"${f.getName}: ${metas.mkString(",")}")
      assert(metas.head.getLong(1) == one.count(), f.getName)
      assert(one.count() <= 10)
      total += one.count()
    }
    assert(total == 25)
    // batch numbers are unique per file
    val bns = files.map(f => spark.read.parquet(f.getAbsolutePath)
      .select("_batch_number").head().getLong(0))
    assert(bns.distinct.length == files.length)
  }
}
