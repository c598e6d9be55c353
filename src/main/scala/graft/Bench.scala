package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ingest.Codecs.register(spark)
    // untimed warm-up: JIT + codegen + file-index setup, so the first
    // timed query doesn't absorb session warm-up costs
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Optional comma-separated allowlist for local iteration (the
    // driver never sets it, so full-surface totals stay comparable)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val results = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // stable file artifact alongside stdout (stdout tails get truncated)
    val sfName = new java.io.File(sfDir).getName
    new java.io.File("target").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"target/bench_$sfName.json"),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
