package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: a bare session (none of our confs
  * or function registrations) calling SparkEntry.entry — guards against
  * entry() accidentally depending on session setup the driver doesn't do.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(10, truncate = false)
    println(s"[smoke] entry rows=$n")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
