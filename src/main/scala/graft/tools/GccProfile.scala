package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-wise CPU profile of graph_clustering_coefficient vs
  * graph_triangles (round-15 diagnostic). */
object GccProfile {
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
    def time(tag: String)(f: => Long): Unit = {
      val c0 = bean.getProcessCpuTime
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-28s wall=${(System.nanoTime() - t0) / 1e9}%6.2f " +
        f"cpu=${(bean.getProcessCpuTime - c0) / 1e9}%6.2f rows=$n")
    }
    // warm the materialized edge table
    time("edges(build+scan)") {
      graft.queries.Graphs.materializedEdges(spark, d).count() }
    locally {
      import org.apache.spark.sql.functions._
      val G = graft.queries.Graphs
      val ue = G.undirected(G.materializedEdges(spark, d)).cache()
      time("ue count") { ue.count() }
      val deg = G.degreeTable(ue)
      time("deg count") { deg.count() }
      val oriented = G.orientedEdges(ue, deg)
      time("oriented count") { oriented.count() }
      time("wedges agg") {
        G.closedWedges(oriented).agg(count(lit(1))).collect()(0).getLong(0) }
      time("wedges agg again") {
        G.closedWedges(oriented).agg(count(lit(1))).collect()(0).getLong(0) }
      time("degAgg") {
        deg.agg(count(lit(1)).as("n"),
          expr("SUM(deg * (deg - 1) DIV 2)").as("w")).collect()(0).getLong(0) }
      spark.catalog.clearCache()
    }
    (1 to 2).foreach { i =>
      time(s"triangles full $i") {
        graft.queries.Graphs.graphTriangles(spark, d).count() }
      spark.catalog.clearCache()
      time(s"clustering full $i") {
        graft.queries.Graphs.graphClusteringCoefficient(spark, d).count() }
      spark.catalog.clearCache()
      time(s"edges scan $i") {
        graft.queries.Graphs.materializedEdges(spark, d).count() }
    }
    spark.stop()
  }
}
