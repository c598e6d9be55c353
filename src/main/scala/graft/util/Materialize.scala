package graft.util

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once materialization of an expensive intermediate (the
  * dedup pair graph, the kNN edge list): the first consumer builds and
  * writes parquet, later consumers do a plain scan.
  *
  * Scope and staleness (round-5 advice): the cache key is
  * `tag : dir : content-fingerprint`, where the fingerprint hashes the
  * dataset directory's recursive (path, length, mtime) listing — so a
  * rewritten dataset under the same path misses the cache instead of
  * serving stale pairs. Temp dirs are registered with a shutdown hook
  * and deleted on JVM exit.
  *
  * Deployment shape: by default the parquet lands in a DRIVER-LOCAL
  * temp dir, which is correct for local[k] (bench/tests — one JVM) but
  * unreadable by executors on a multi-node cluster. There, set
  * `SPARK_GRAFT_MAT_DIR` to a shared filesystem/table location and the
  * intermediate becomes what it is at 100 TB anyway: a persisted table
  * every downstream consumer reads. (Entries under a shared root are
  * NOT deleted on exit — they are the shared artifact.)
  */
object Materialize {

  private val cache = new ConcurrentHashMap[String, String]()

  /** Builder thunks seen by [[tableFor]] — the PlanLintSpec registry
    * (round-13 directive #2): materialization hides a builder's plan
    * behind a parquet scan, which is exactly where round 12's one
    * all-pairs BNLJ hid from the surface-wide lint. Registration is
    * unconditional (cache hits re-register too), so the lint sees every
    * builder whose consumer ran this JVM, and plan-building a thunk
    * never executes it. [[bucketedTableFor]] builders are NOT here:
    * their `write` is a side-effecting saveAsTable, not a plan thunk —
    * BucketingSpec pins their (plain dimension-scan) shape directly. */
  private val builders = new ConcurrentHashMap[String, () => DataFrame]()

  private[graft] def builderThunks: Map[String, () => DataFrame] = {
    val b = Map.newBuilder[String, () => DataFrame]
    builders.forEach((k, v) => b += (k -> v))
    b.result()
  }

  private[graft] def unregisterBuilder(tag: String): Unit = {
    val _ = builders.remove(tag)
  }
  private val toDelete = java.util.Collections.newSetFromMap(
    new ConcurrentHashMap[Path, java.lang.Boolean]())

  sys.addShutdownHook {
    toDelete.forEach { root =>
      try {
        Files.walk(root).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { val _ = Files.deleteIfExists(p) })
      } catch { case _: Throwable => () }
    }
  }

  /** MD5 over the recursive (path, length, mtime) listing of `dir` —
    * metadata-only, O(#files) driver-side, the same listing cost Spark
    * pays to plan a scan of the directory. */
  def fingerprint(s: SparkSession, dir: String): String = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val md = java.security.MessageDigest.getInstance("MD5")
    def walk(path: HPath): Unit =
      fs.listStatus(path).sortBy(_.getPath.toString).foreach { st =>
        md.update(
          s"${st.getPath}|${st.getLen}|${st.getModificationTime}\n"
            .getBytes("UTF-8"))
        if (st.isDirectory) walk(st.getPath)
      }
    walk(p)
    md.digest().map("%02x".format(_)).mkString
  }

  /** Return `build()`'s result as a materialized parquet scan, building
    * at most once per (tag, dir, dir-content) per JVM. */
  def tableFor(s: SparkSession, tag: String, dir: String,
               build: () => DataFrame): DataFrame = {
    builders.put(tag, build)
    val key = s"$tag:$dir:${fingerprint(s, dir)}"
    val path = cache.computeIfAbsent(key, k => {
      val out = sys.env.get("SPARK_GRAFT_MAT_DIR") match {
        case Some(root) =>
          // shared root: a stable content-addressed subdir, kept on exit
          val sub = java.security.MessageDigest.getInstance("MD5")
            .digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString
          s"$root/graft_mat_${tag}_$sub"
        case None =>
          val p = Files.createTempDirectory(s"graft_mat_$tag")
          toDelete.add(p)
          p.toString
      }
      build().write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  private val bucketedBuildCounter =
    new java.util.concurrent.atomic.AtomicLong(0)

  /** Catalog-table analog of [[tableFor]] for BUCKETED tables (which
    * need `bucketBy` + `saveAsTable`, not a bare parquet path): the
    * first consumer per (tag, dir, dir-content) drops/writes a
    * uniquely-named catalog table via `write(name)`; later consumers
    * get a plain `s.table(name)` scan with ZERO writes — the
    * amortize-across-queries story bucketing exists for. The table
    * name is content-addressed, so a rewritten dataset under the same
    * path builds a NEW table instead of serving stale buckets, and
    * different datasets never clobber each other. Sessions cloned off
    * the same SparkContext share the catalog, so the cache is
    * JVM-wide like [[tableFor]]'s. On a real cluster the table lands
    * wherever `write` points it (a warehouse path all executors
    * read) — the same persisted-artifact shape as SPARK_GRAFT_MAT_DIR. */
  def bucketedTableFor(s: SparkSession, tag: String, dir: String,
      write: String => Unit): DataFrame = {
    val key = s"bkt:$tag:$dir:${fingerprint(s, dir)}"
    val table = cache.computeIfAbsent(key, k => {
      val sub = java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(8)
      val name = s"graft_bkt_${tag}_$sub"
      s.sql(s"DROP TABLE IF EXISTS $name")
      write(name)
      bucketedBuildCounter.incrementAndGet()
      name
    })
    s.table(table)
  }

  /** Test hook: how many bucketed-table builds have run in this JVM
    * (a second invocation on unchanged data must not move it). */
  private[graft] def bucketedBuilds: Long = bucketedBuildCounter.get()

  /** Test hook: drop every cached entry (local temp dirs stay
    * registered for exit-time deletion). */
  private[graft] def reset(): Unit = cache.clear()

  private[graft] def registeredForCleanup: Int = toDelete.size()
}
