package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 diagnostic: where does the multi-second process-CPU
  * constant of ACTIONS over tiny graph relations go? Times a ladder
  * of probes — plain range aggregates, the materialized edge scan,
  * each derived relation with and without AQE, and repeated identical
  * actions — so JIT/codegen/planning constants separate from plan
  * shape. Prints wall + process CPU + peak JIT compilation time delta
  * (from the JVM compilation MXBean, process-wide). */
object ActionCost {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val comp = java.lang.management.ManagementFactory.getCompilationMXBean
    def time(tag: String)(f: => Long): Unit = {
      val j0 = comp.getTotalCompilationTime
      val c0 = bean.getProcessCpuTime
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-34s wall=${(System.nanoTime() - t0) / 1e9}%6.2f " +
        f"cpu=${(bean.getProcessCpuTime - c0) / 1e9}%6.2f " +
        f"jit=${(comp.getTotalCompilationTime - j0) / 1e3}%6.2f rows=$n")
    }
    // baseline: trivial actions, repeated
    (1 to 3).foreach { i =>
      time(s"range-agg $i") {
        spark.range(100000).groupBy(col("id") % 97)
          .agg(count(lit(1))).count() }
    }
    val G = graft.queries.Graphs
    time("edges build+scan") { G.materializedEdges(spark, d).count() }
    (1 to 3).foreach { i =>
      time(s"edges scan $i") { G.materializedEdges(spark, d).count() } }
    val ue = G.undirected(G.materializedEdges(spark, d))
    (1 to 3).foreach { i => time(s"ue count $i") { ue.count() } }
    val deg = G.degreeTable(ue)
    (1 to 3).foreach { i => time(s"deg count $i") { deg.count() } }
    // same deg but from a localCheckpointed ue (plan truncated)
    val ueCk = ue.localCheckpoint()
    val degCk = G.degreeTable(ueCk)
    (1 to 3).foreach { i => time(s"deg-ck count $i") { degCk.count() } }
    spark.stop()
  }
}
