package graft.util

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap

/** JVM-exit cleanup for per-invocation staging directories (round-14
  * review): the SourceFormats/IngestQueries staging queries each write
  * a table copy under a fresh temp dir per run, and Bench re-runs keys
  * 2-3×, so a bench+verify cycle used to strand dozens of data dirs in
  * /tmp until reboot. Same one-hook pattern as [[Materialize]]'s temp
  * roots and [[graft.streaming.StreamQueries]]'s staging queue — one
  * registered set, one shutdown hook, recursive delete. */
object TempDirs {

  private val toDelete = java.util.Collections.newSetFromMap(
    new ConcurrentHashMap[Path, java.lang.Boolean]())

  sys.addShutdownHook {
    toDelete.forEach { root =>
      // close the walk stream (it holds a directory handle) and keep
      // the catch narrow — per-dir failures skip only that dir
      try {
        val walk = Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { val _ = Files.deleteIfExists(p) })
        finally walk.close()
      } catch {
        case _: java.io.IOException | _: SecurityException => ()
      }
    }
  }

  /** `Files.createTempDirectory` + register for deletion at JVM exit. */
  def create(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    toDelete.add(p)
    p
  }
}
