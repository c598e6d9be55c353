package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for ingested tables.
  *
  * The reference's MAX_BATCH_SIZE contract (2,000 rows per file,
  * reference infra/function-app.tf:82, src/function_app.py:382-401)
  * is preserved at write time by `maxRecordsPerFile` — which at 100 TB
  * yields millions of tiny files per table. Compaction is the standard
  * second phase: rewrite a table directory into few large files sized
  * for scan efficiency, then atomically-ish swap directories. Query
  * semantics are unchanged (same rows, same schema); only file layout
  * differs.
  *
  * Uses the Hadoop FileSystem API for the swap, so the same code path
  * works on local disk, HDFS and object stores with a FS adapter.
  * The swap window (rename out → rename in) is the usual non-atomic
  * caveat of path-based tables; table formats with a metastore commit
  * (Iceberg/Delta) close it, at the cost of a format dependency.
  */
object Compact {

  case class CompactReport(path: String, rows: Long,
      filesBefore: Int, filesAfter: Int)

  /** Sweep result, mirroring [[Pipeline.IngestReport]]'s written/failed
    * split: one bad table never aborts the others. */
  case class CompactSweep(compacted: Seq[CompactReport],
      failed: Seq[(String, String)])

  private def parquetFiles(spark: SparkSession, dir: Path): Int = {
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir).count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Working-dir names are DOT-PREFIXED siblings: Spark/Hadoop's
    * default path filter hides names starting with '.' or '_' from both
    * file listing and partition discovery, so a reader of the live tree
    * during the rewrite/swap window (or after a crash) can never
    * partition-discover `batch_id=5__compact_bak` as a bogus partition
    * value and double-read batch 5 (round-14 review — the old
    * suffix-only names were visible siblings inside partitioned
    * layouts). */
  private def workPath(dir: Path, suffix: String): Path =
    new Path(dir.getParent, "." + dir.getName + suffix)

  /** Rewrite one table directory into ceil(rows / targetRecordsPerFile)
    * files. Returns what changed; on any failure the original directory
    * is left in place. */
  def compactTable(spark: SparkSession, tableDir: String,
      targetRecordsPerFile: Long = 1000000L): CompactReport = {
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    // Crash recovery: a previous run that died between rename(dir->bak)
    // and rename(tmp->dir) left the live dir missing with the data
    // stranded in bak — restore it before doing anything else. (A
    // dangling bak NEXT TO a live dir means the crash happened after the
    // second rename; the live dir wins and bak is deleted below.)
    val staleBak = workPath(dir, "__compact_bak")
    // legacy pre-dot-prefix bak name: danglingBaks surfaces it (its
    // stripPrefix(".") is a no-op on un-dotted names), so restore must
    // accept it too or the sweep reports a read failure on the missing
    // live dir instead of recovering the data (round-14 advice)
    val legacyBak = new Path(dir.getParent, dir.getName + "__compact_bak")
    if (!fs.exists(dir)) {
      val bakSrc =
        if (fs.exists(staleBak)) Some(staleBak)
        else if (fs.exists(legacyBak)) Some(legacyBak)
        else None
      bakSrc.foreach { b =>
        if (!fs.rename(b, dir))
          throw new java.io.IOException(
            s"compact: cannot restore dangling $b to $dir")
      }
    }
    val before = parquetFiles(spark, dir)
    val df = spark.read.parquet(tableDir)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(
      rows.toDouble / targetRecordsPerFile).toInt)
    val tmp = workPath(dir, "__compact_tmp")
    val bak = workPath(dir, "__compact_bak")
    fs.delete(tmp, true)
    df.repartition(nFiles).write.mode("overwrite").parquet(tmp.toString)
    // swap: live → bak, tmp → live, drop bak
    fs.delete(bak, true)
    if (!fs.rename(dir, bak))
      throw new java.io.IOException(s"compact: cannot move $dir aside")
    if (!fs.rename(tmp, dir)) {
      fs.rename(bak, dir) // roll back
      throw new java.io.IOException(s"compact: cannot move $tmp into place")
    }
    fs.delete(bak, true)
    CompactReport(tableDir, rows, before, parquetFiles(spark, dir))
  }

  /** Compact every `folder=/source_db=/table=` leaf under an ingest
    * output root (the layout [[Pipeline.ingest]] writes). Failures are
    * isolated per table — one unreadable leaf never aborts the sweep.
    * `__compact_tmp`/`__compact_bak` working dirs are excluded from leaf
    * discovery (they are not tables; a dangling bak whose live dir is
    * missing is recovered by [[compactTable]] on the LIVE path, which the
    * bak's name yields after stripping the suffix). */
  def compactAll(spark: SparkSession, outDir: String,
      targetRecordsPerFile: Long = 1000000L): CompactSweep = {
    val root = new Path(outDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def leaves(p: Path): Seq[Path] = {
      val allKids = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
      val kids = allKids.filterNot(n =>
        n.getName.contains("__compact_") || n.getName.startsWith("."))
      // a dir whose only children are __compact_* working dirs is NOT a
      // table leaf (reading it would partition-discover the bak/tmp)
      if (allKids.isEmpty) Seq(p)
      else kids.toSeq.flatMap(leaves)
    }
    // a dangling bak's live dir no longer lists as a leaf (it is gone) —
    // surface it by its live name so recovery runs
    def danglingBaks(p: Path): Seq[Path] =
      fs.listStatus(p).filter(_.isDirectory).map(_.getPath).toSeq.flatMap {
        case bak if bak.getName.endsWith("__compact_bak") =>
          val live = new Path(bak.getParent,
            bak.getName.stripPrefix(".").stripSuffix("__compact_bak"))
          if (fs.exists(live)) Seq.empty else Seq(live)
        case kid if kid.getName.contains("__compact_") => Seq.empty
        case kid => danglingBaks(kid)
      }
    if (!fs.exists(root)) CompactSweep(Seq.empty, Seq.empty)
    else {
      // Per-table rewrites are independent Spark jobs over disjoint
      // directories — run them CONCURRENTLY on a bounded pool (the
      // Pipeline.ingest route pattern) so one table's small rewrite
      // doesn't leave the cluster idle between jobs; the scheduler
      // interleaves their tasks. Error isolation is unchanged: each
      // future catches its own table's failure. Results keep the sorted
      // table order regardless of completion order.
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val tables = (leaves(root) ++ danglingBaks(root))
        .distinct.sortBy(_.toString)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(8, tables.size)))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val results =
        try Await.result(
          Future.sequence(tables.map { p => Future(
            try Right(compactTable(spark, p.toString, targetRecordsPerFile))
            catch { case e: Exception => Left(p.toString -> e.toString) })
          }), Duration.Inf)
        finally pool.shutdown()
      CompactSweep(
        results.collect { case Right(r) => r },
        results.collect { case Left(f) => f })
    }
  }
}
