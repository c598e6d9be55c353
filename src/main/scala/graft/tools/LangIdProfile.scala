package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm A/B timing for text_char_lang_id (cold codegen excluded). */
object LangIdProfile {
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
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.llm.TextStats.textCharLangId(spark, d).count()
      println(f"run $i ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    spark.stop()
  }
}
