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

  private def parquetFiles(spark: SparkSession, dir: Path): Int = {
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir).count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Rewrite one table directory into ceil(rows / targetRecordsPerFile)
    * files. Returns what changed; on any failure the original directory
    * is left in place. */
  def compactTable(spark: SparkSession, tableDir: String,
      targetRecordsPerFile: Long = 1000000L): CompactReport = {
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val before = parquetFiles(spark, dir)
    val df = spark.read.parquet(tableDir)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(
      rows.toDouble / targetRecordsPerFile).toInt)
    val tmp = new Path(tableDir + "__compact_tmp")
    val bak = new Path(tableDir + "__compact_bak")
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
    * output root (the layout [[Pipeline.ingest]] writes). */
  def compactAll(spark: SparkSession, outDir: String,
      targetRecordsPerFile: Long = 1000000L): Seq[CompactReport] = {
    val root = new Path(outDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def leaves(p: Path): Seq[Path] = {
      val kids = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
      if (kids.isEmpty) Seq(p)
      else kids.toSeq.flatMap(leaves)
    }
    if (!fs.exists(root)) Seq.empty
    else leaves(root).sortBy(_.toString)
      .map(p => compactTable(spark, p.toString, targetRecordsPerFile))
  }
}
