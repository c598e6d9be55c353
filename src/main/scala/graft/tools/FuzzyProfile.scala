package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: stage timing for dedup_fuzzy_cluster at the bench sf —
  * signature build + supernode contraction, band candidate join +
  * estimator filter, and the star-CC loop (INFO logs show per-round
  * edge counts) — to see which stage the 7-8 s actually rides. */
object FuzzyProfile {
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
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.llm.Dedup$", org.apache.logging.log4j.Level.INFO)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.llm", org.apache.logging.log4j.Level.INFO)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    time("full dedup_fuzzy_cluster") {
      graft.llm.Dedup.dedupFuzzyCluster(spark, d).count()
    }
    time("again (warm)") {
      graft.llm.Dedup.dedupFuzzyCluster(spark, d).count()
    }
    import org.apache.spark.sql.functions._
    val hashCols = (0 until 16).map(i => col(s"h$i"))
    val sigW = org.apache.spark.sql.expressions.Window
      .partitionBy(hashCols: _*)
    val withNode = time("sigs+window (cached)") {
      val w = graft.llm.Dedup.minhashSigs(spark, d)
        .withColumn("node", min(col("doc_id")).over(sigW))
        .withColumn("gsize", count(lit(1)).over(sigW))
        .cache()
      w.count(); w
    }
    val reps = withNode.filter(col("doc_id") === col("node"))
      .select(col("node").as("doc_id") +: hashCols: _*)
    val pairs = time("sigPairs(reps)") {
      val p = graft.llm.Dedup.sigPairs(reps)
        .select(col("a_id"), col("b_id")).cache()
      p.count(); p
    }
    val labels = time("twoPhaseLabels loop") {
      val l = graft.llm.Dedup.twoPhaseLabels(pairs).cache()
      l.count(); l
    }
    time("expansion + orderBy") {
      withNode
        .join(labels, col("node") === col("id"), "left")
        .filter(col("gsize") >= 2 || col("id").isNotNull)
        .select(col("doc_id"),
          coalesce(col("lbl"), col("node")).as("cluster_rep"))
        .orderBy(col("doc_id")).count()
    }
    spark.stop()
  }
}
