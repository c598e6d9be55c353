package graft.ingest

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.types._

/** Per-(route, shape) inferred-schema cache for the ingest pipeline.
  *
  * The reference re-discovers every payload's schema on every invocation
  * (first-seen column order, reference src/function_app.py:203-207) —
  * fine at one event per call, hostile at scale: `spark.read.json`
  * inference double-scans the payload subset per micro-batch. This
  * registry makes the steady state cheap:
  *
  *  - first batch for a route: full inference (exact reference
  *    semantics), schema cached;
  *  - later batches: infer over a bounded SAMPLE only; if the sample
  *    shows nothing the cached schema doesn't already cover, reuse the
  *    cache — no full-data inference job at all;
  *  - drift (sampled field missing from the cache, or type changed):
  *    full re-inference, then field-by-name merge — new fields append,
  *    conflicting types widen to StringType (the normalize stage
  *    stringifies everything anyway, SURVEY.md §1.2).
  *
  * Tradeoffs (documented, not hidden):
  *  - a NEW COLUMN appearing only in unsampled rows of a batch is
  *    invisible to the sample check (extra JSON fields parse silently),
  *    so it is picked up the first batch it reaches the sample, not
  *    necessarily its first batch. Raise `sampleSize` (or set it huge to
  *    force per-batch full inference) where that matters.
  *  - a TYPE CHANGE in unsampled rows would null those cells for the
  *    batch; with `corruptRecheck` (default) the pipeline parses with a
  *    `_corrupt_record` probe column and forces full re-inference +
  *    widen-merge when any row fails the cached schema, so no cell is
  *    silently nulled — at the cost of one typed parse pass per batch
  *    (cheap next to inference, but not zero). `corruptRecheck = false`
  *    restores zero-job trusted batches and re-opens that window.
  *
  * Thread-safe (TrieMap + atomics) — per-route jobs may run from
  * concurrent foreachBatch workers.
  */
final class SchemaRegistry(val sampleSize: Int = 256,
    val driftCheckInterval: Int = 1,
    val corruptRecheck: Boolean = true) {

  type Key = (String, String, String, String) // folder, source_db, table, shape

  private val cache = scala.collection.concurrent.TrieMap.empty[Key, StructType]
  private val batchSeq = scala.collection.concurrent.TrieMap.empty[Key, AtomicLong]
  private val fullInfers = new AtomicLong(0L)
  private val cacheHits = new AtomicLong(0L)
  private val trustHits = new AtomicLong(0L)

  /** How often full-data inference ran (first batch + drift only). */
  def fullInferCount: Long = fullInfers.get()

  /** How often the cached schema was reused with only a sample scan. */
  def cacheHitCount: Long = cacheHits.get()

  /** How often the cache was trusted with ZERO jobs (between drift
    * checks, `driftCheckInterval` > 1). */
  def trustHitCount: Long = trustHits.get()

  def snapshot: Map[Key, StructType] = cache.toMap

  /** Schema to parse this batch's payloads with. May run zero, one
    * (sample) or two (sample + full) inference jobs — see class doc.
    * With `driftCheckInterval` = k > 1 only every k-th batch per route
    * runs the sample drift check; the batches between trust the cache
    * outright (zero jobs) — the right trade when routes number in the
    * hundreds and schema change is rare. Drift detection latency grows
    * to ≤ k batches; raise k only where that is acceptable. */
  def schemaFor(spark: SparkSession, key: Key,
      payloads: Dataset[String]): StructType =
    cache.get(key) match {
      case None =>
        val full = infer(spark, payloads)
        fullInfers.incrementAndGet()
        batchSeq.getOrElseUpdate(key, new AtomicLong(0L)).incrementAndGet()
        cache.update(key, full)
        full
      case Some(cached) =>
        val seq = batchSeq.getOrElseUpdate(key, new AtomicLong(0L))
          .getAndIncrement()
        if (driftCheckInterval > 1 && seq % driftCheckInterval != 0) {
          trustHits.incrementAndGet()
          cached
        } else {
          val sampled = infer(spark, payloads.limit(sampleSize))
          if (covers(cached, sampled)) {
            cacheHits.incrementAndGet()
            cached
          } else {
            val full = infer(spark, payloads)
            fullInfers.incrementAndGet()
            val merged = mergeStructs(cached, full)
            cache.update(key, merged)
            merged
          }
        }
    }

  /** Forced full re-inference after a corrupt-record anomaly (a row the
    * cached schema cannot parse): infer over the WHOLE batch, widen-merge
    * into the cache, return the merged schema for a clean re-parse. A
    * payload that is genuinely unparseable (not drift) re-infers every
    * batch it appears in — bounded by the anomaly rate, which is the
    * right failure bias for an ingest path. */
  def reinferMerged(spark: SparkSession, key: Key,
      payloads: Dataset[String]): StructType = {
    val full = infer(spark, payloads)
    fullInfers.incrementAndGet()
    val merged = cache.get(key).map(mergeStructs(_, full)).getOrElse(full)
    cache.update(key, merged)
    merged
  }

  private def infer(spark: SparkSession, payloads: Dataset[String]): StructType =
    StructType(spark.read.json(payloads).schema.fields
      .filter(_.name != "_corrupt_record"))

  /** Does `cached` already describe everything `sampled` observed? */
  private[graft] def covers(cached: DataType, sampled: DataType): Boolean =
    (cached, sampled) match {
      case (c: StructType, s: StructType) =>
        s.fields.forall { sf =>
          c.fields.find(_.name == sf.name)
            .exists(cf => covers(cf.dataType, sf.dataType))
        }
      case (c: ArrayType, s: ArrayType) => covers(c.elementType, s.elementType)
      case (StringType, _) => true // string swallows any drifted scalar
      case (c, s) => c == s
    }

  /** Field-by-name union; conflicting leaf types widen to StringType. */
  private[graft] def mergeStructs(a: StructType, b: StructType): StructType = {
    val aNames = a.fields.map(_.name).toSet
    val updated = a.fields.map { af =>
      b.fields.find(_.name == af.name) match {
        case Some(bf) => StructField(af.name, mergeTypes(af.dataType, bf.dataType))
        case None => af
      }
    }
    val appended = b.fields.filterNot(f => aNames.contains(f.name))
    StructType(updated ++ appended)
  }

  private def mergeTypes(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (x: StructType, y: StructType) => mergeStructs(x, y)
    case (x: ArrayType, y: ArrayType) =>
      ArrayType(mergeTypes(x.elementType, y.elementType))
    case _ => StringType
  }

  /** Persist the cache as one JSON object per line: a JSON array key
    * [folder, db, table, shape] plus the schema as DataType.json. Pair
    * with [[SchemaRegistry.load]] so a restarted streaming driver
    * resumes with warm schemas instead of re-inferring every route
    * (store it next to the checkpoint dir). */
  def save(path: java.nio.file.Path): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val lines = cache.toSeq.sortBy(_._1).map { case ((f, db, t, sh), st) =>
      s"""{"key":[${q(f)},${q(db)},${q(t)},${q(sh)}],"schema":${st.json}}"""
    }
    java.nio.file.Files.write(path, lines.mkString("\n").getBytes("UTF-8"))
  }
}

object SchemaRegistry {
  /** Rebuild a registry from [[SchemaRegistry!.save]] output; missing
    * file → empty registry (cold start). The save format carries only
    * the schema cache, so the OPERATIONAL knobs must be re-passed here
    * — a restarted driver that called `load(path)` bare used to revert
    * silently to driftCheckInterval = 1 / corruptRecheck = true and pay
    * the per-batch checks its deployment had configured away (round-14
    * review). Pass the same values the original constructor got. */
  def load(path: java.nio.file.Path, sampleSize: Int = 256,
      driftCheckInterval: Int = 1,
      corruptRecheck: Boolean = true): SchemaRegistry = {
    val reg = new SchemaRegistry(sampleSize, driftCheckInterval,
      corruptRecheck)
    if (java.nio.file.Files.exists(path)) {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      java.nio.file.Files.readAllLines(path).forEach { line =>
        if (line.nonEmpty) {
          val node = mapper.readTree(line)
          val k = node.get("key")
          val st = DataType.fromJson(node.get("schema").toString)
            .asInstanceOf[StructType]
          reg.cache.update((k.get(0).asText(), k.get(1).asText(),
            k.get(2).asText(), k.get(3).asText()), st)
        }
      }
    }
    reg
  }
}
