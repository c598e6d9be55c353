package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.ingest.{Pipeline, SchemaRegistry}

/** The streaming-ingest schema cache: steady-state batches must reuse
  * the cached schema (sample scan only), drift must trigger exactly one
  * full re-inference and widen/append fields. */
class SchemaRegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ds(rows: String*) = {
    import spark.implicits._
    spark.createDataset(rows)
  }

  private val key = ("f", "db", "t", "rows")

  test("identical batches: one full inference, then cache hits") {
    val reg = new SchemaRegistry()
    val s1 = reg.schemaFor(spark, key, ds("""{"a":1,"b":"x"}"""))
    val s2 = reg.schemaFor(spark, key, ds("""{"a":2,"b":"y"}"""))
    assert(s1 == s2)
    assert(reg.fullInferCount == 1)
    assert(reg.cacheHitCount == 1)
  }

  test("new field is drift: full re-infer, field appended") {
    val reg = new SchemaRegistry()
    reg.schemaFor(spark, key, ds("""{"a":1}"""))
    val s2 = reg.schemaFor(spark, key, ds("""{"a":1,"c":true}"""))
    assert(reg.fullInferCount == 2)
    assert(s2.fieldNames.toSeq == Seq("a", "c"))
    assert(s2("c").dataType == BooleanType)
  }

  test("type conflict widens to string; string absorbs later drift") {
    val reg = new SchemaRegistry()
    reg.schemaFor(spark, key, ds("""{"a":1}"""))
    val s2 = reg.schemaFor(spark, key, ds("""{"a":"one"}"""))
    assert(s2("a").dataType == StringType)
    // a string field covers any future scalar type — no more drift
    val full = reg.fullInferCount
    reg.schemaFor(spark, key, ds("""{"a":3.5}"""))
    assert(reg.fullInferCount == full)
  }

  test("type drift hiding beyond the sample window is not nulled (corrupt recheck)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val reg = new SchemaRegistry(sampleSize = 4)
    val out = java.nio.file.Files
      .createTempDirectory("graft_drift_recheck").toString
    def envs(payloads: Seq[String]) = payloads.map { p =>
      s"""{"Source":"db.t","Destination":"f","Data":"${
        java.util.Base64.getEncoder.encodeToString(p.getBytes)}"}"""
    }.toDF("value")
    // batch 1: k is long everywhere -> cached schema k: bigint
    Pipeline.ingest(spark, envs((0 until 20).map(i => s"""{"k":$i}""")),
      Pipeline.IngestConfig(outDir = out), Some(reg))
    // batch 2: drifted row sits far past the 4-row sample window
    val batch2 = (0 until 40).map(i => s"""{"k":$i}""") :+ """{"k":"abc"}"""
    Pipeline.ingest(spark, envs(batch2),
      Pipeline.IngestConfig(outDir = out), Some(reg))
    val vals = spark.read.parquet(s"$out/folder=f/source_db=db/table=t")
      .select("k").collect().map(_.getString(0))
    // before the recheck, "abc" parsed against bigint and became null
    assert(vals.contains("abc"), "drifted cell must survive, not null out")
    assert(!vals.contains(null))
    assert(reg.snapshot(("f", "db", "t", "single"))("k").dataType == StringType)
  }

  test("covers handles nested structs and arrays") {
    val reg = new SchemaRegistry()
    val cached = StructType(Seq(
      StructField("xs", ArrayType(LongType)),
      StructField("o", StructType(Seq(StructField("k", StringType))))))
    val sameShape = StructType(Seq(
      StructField("o", StructType(Seq(StructField("k", DoubleType))))))
    assert(reg.covers(cached, StructType(cached.fields.take(1))))
    assert(reg.covers(cached, sameShape)) // string leaf absorbs double
    val drifted = StructType(Seq(
      StructField("o", StructType(Seq(StructField("new", LongType))))))
    assert(!reg.covers(cached, drifted))
  }

  test("driftCheckInterval > 1 trusts the cache between checks") {
    val reg = new SchemaRegistry(driftCheckInterval = 3)
    (1 to 7).foreach { i =>
      reg.schemaFor(spark, key, ds(s"""{"a":$i}"""))
    }
    // batch 1: full infer (seq -> 1); batches 2-7 have seq 1..6:
    // sample checks fire at seq 3 and 6, the cache is trusted at
    // seq 1, 2, 4, 5 with zero jobs
    assert(reg.fullInferCount == 1)
    assert(reg.cacheHitCount == 2)
    assert(reg.trustHitCount == 4)
  }

  test("save/load round-trips the cache (streaming driver restart)") {
    val reg = new SchemaRegistry()
    reg.schemaFor(spark, ("f", "db", "t \"x\"", "rows"),
      ds("""{"a":1,"nested":{"k":[true]}}"""))
    reg.schemaFor(spark, ("g", "db2", "t2", "columnar"),
      ds("""{"xs":[1.5]}"""))
    val path = java.nio.file.Files.createTempFile("graft_reg", ".jsonl")
    reg.save(path)
    val reloaded = SchemaRegistry.load(path)
    assert(reloaded.snapshot == reg.snapshot)
    // warm after reload: same-shape batch is a cache hit, not re-inference
    reloaded.schemaFor(spark, ("g", "db2", "t2", "columnar"),
      ds("""{"xs":[2.5]}"""))
    assert(reloaded.fullInferCount == 0)
    assert(reloaded.cacheHitCount == 1)
  }

  test("registry keys are independent per route and shape") {
    val reg = new SchemaRegistry()
    reg.schemaFor(spark, ("f", "db", "t1", "rows"), ds("""{"a":1}"""))
    reg.schemaFor(spark, ("f", "db", "t2", "rows"), ds("""{"b":1}"""))
    assert(reg.fullInferCount == 2)
    assert(reg.snapshot.size == 2)
  }
}
