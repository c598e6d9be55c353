package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Scratch reproducer for the CC-loop originStats blowup (round 6).
  * Runs the adversarial stride-7 cycle (200 nodes, diameter 100 —
  * slow-converging under HashMin) through both CC algorithms and
  * times them; pre-fix this hung past 30 min in Catalyst BigInt
  * stats multiplication, post-fix it must complete in seconds. */
object DebugCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val edges = spark.range(200)
      .select(col("id").as("a_id"), ((col("id") + 7) % 200).as("b_id"))
      .union(Seq((300L, 301L), (301L, 302L)).toDF("a_id", "b_id"))

    val t0 = System.nanoTime()
    val hm = Dedup.propagateLabels(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(f"propagateLabels: n=${hm.size} t=${(System.nanoTime() - t0) / 1e9}%.1f s")
    val t1 = System.nanoTime()
    val tp = Dedup.twoPhaseLabels(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(f"twoPhaseLabels:  n=${tp.size} t=${(System.nanoTime() - t1) / 1e9}%.1f s")
    println(s"agree=${hm == tp} " +
      s"cycleLabelZero=${(0L until 200L).forall(i => hm.getOrElse(i, -1L) == 0L)} " +
      s"chain=${hm.get(300L)}/${hm.get(301L)}/${hm.get(302L)}")
    spark.stop()
  }
}
