package graft.tools

import org.apache.spark.sql.SparkSession
import graft.llm.Similarity

/** Diagnostic: prints the LSH top-10 overlap vs exact brute force at
  * each sf dir passed as an arg — the margin behind sim_search_lsh's
  * recall_ge_50 gate boolean (PERF.md round-9 investigation). */
object LshRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .appName("lsh-recall").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- args) {
      val exact = Similarity.simSearchTopk(spark, d)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val approx = Similarity.simSearchLsh(spark, d)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      println(s"LSH_RECALL $d overlap=${(exact & approx).size}/10")
    }
    spark.stop()
  }
}
