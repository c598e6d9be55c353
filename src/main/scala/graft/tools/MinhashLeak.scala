package graft.tools

import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Diagnostic: repeated-run degradation witness for the minhash keys
  * (round 15). Runs dedup_fuzzy_minhash + a cheap canary N times and
  * prints per-iteration wall, process CPU, cumulative GC time, post-GC
  * heap, and JIT code-cache occupancy — discriminates heap-leak GC
  * thrash from code-cache exhaustion from plan-size growth when a key
  * gets slower the more often it runs inside one JVM. */
object MinhashLeak {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.LogQuiet.suppressKnownBenign()

    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val gcBeans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala
    val pools = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.asScala
    def gcMs: Long = gcBeans.map(_.getCollectionTime).sum
    def gcCount: Long = gcBeans.map(_.getCollectionCount).sum
    def poolUsed(name: String): Long =
      pools.filter(_.getName.contains(name)).map(_.getUsage.getUsed).sum
    def heapUsed: Long = {
      val m = java.lang.management.ManagementFactory.getMemoryMXBean
      m.getHeapMemoryUsage.getUsed
    }

    def report(tag: String): Unit = {
      println(f"$tag%-26s gc=${gcMs / 1000.0}%8.1fs n=${gcCount}%6d " +
        f"heap=${heapUsed / 1e6}%8.0fMB " +
        f"codecache=${(poolUsed("CodeHeap") + poolUsed("Code Cache")) / 1e6}%6.0fMB " +
        f"meta=${poolUsed("Metaspace") / 1e6}%6.0fMB")
    }

    def time(name: String)(f: => Unit): Unit = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      val dc = (osBean.getProcessCpuTime - c0) / 1e9
      println(f"$name%-26s wall=$dt%7.2fs cpu=$dc%8.2fs")
    }

    report("start")
    val n = args.headOption.map(_.toInt).getOrElse(4)
    time("mat sigs build+count") {
      println("sig rows = " + graft.llm.Dedup.materializedSigs(spark, d).count())
    }
    time("mat sigs re-count") {
      println("sig rows = " + graft.llm.Dedup.materializedSigs(spark, d).count())
    }
    time("sigPairs count") {
      println("pair rows = " + graft.llm.Dedup.sigPairs(
        graft.llm.Dedup.materializedSigs(spark, d)).count())
    }
    spark.catalog.clearCache()
    report("after pieces")
    (1 to n).foreach { i =>
      time(s"fuzzy_minhash #$i") {
        graft.llm.Dedup.dedupFuzzyMinhash(spark, d).count(); ()
      }
      spark.catalog.clearCache()
      time(s"canary #$i") {
        graft.SparkEntry.queries("agg_autocorrelation")(spark, d).count(); ()
      }
      spark.catalog.clearCache()
      report(s"after iter $i")
    }
    spark.stop()
  }
}
