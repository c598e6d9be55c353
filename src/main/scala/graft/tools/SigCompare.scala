package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: compare MinHashSig kernel signatures against the
  * pre-round-15 relational form (explode(array_distinct(split)) +
  * 16-way min aggregate) over the FULL bench corpus, and report the
  * banded candidate-pair count each signature set produces. */
object SigCompare {
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
    val nHashes = 16
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))

    // old relational form
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))
    val hashAggs = (0 until nHashes).map(i =>
      min(xxhash64(lit(i), col("tok"))).as(s"h$i"))
    val oldSigs = toks.groupBy(col("doc_id")).agg(hashAggs.head, hashAggs.tail: _*)

    // kernel form
    import org.apache.spark.sql.GraftBridge
    val sig = GraftBridge.column(graft.functions.MinHashSig(
      GraftBridge.expression(col("text")), nHashes))
    val newSigs = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), sig.as("sig"))
      .select(col("doc_id") +:
        (0 until nHashes).map(i => col("sig")(i).as(s"h$i")): _*)

    println("old rows = " + oldSigs.count())
    println("new rows = " + newSigs.count())
    val diff = oldSigs.exceptAll(newSigs).count() +
      newSigs.exceptAll(oldSigs).count()
    println("symmetric diff rows = " + diff)

    // band-bucket profile: top bucket sizes per signature set
    def bucketProfile(tag: String, sigs: org.apache.spark.sql.DataFrame): Unit = {
      val bandCols = (0 until 4).map { j =>
        struct(lit(j).as("band_id"),
          xxhash64((j * 4 until (j + 1) * 4).map(i => col(s"h$i")): _*)
            .as("band_hash"))
      }
      val bands = sigs.select(col("doc_id"),
        explode(array(bandCols: _*)).as("band"))
        .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
      val prof = bands.groupBy("band_id", "band_hash").count()
        .orderBy(desc("count")).limit(10).collect()
      println(s"$tag top band buckets: " + prof.map(_.getLong(2)).mkString(","))
      val nPairs = bands.groupBy("band_id", "band_hash").count()
        .select(sum(col("count") * (col("count") - 1) / 2).cast("long"))
        .collect()(0).getLong(0)
      println(s"$tag total raw band pairs (pre-distinct) = " + nPairs)
    }
    bucketProfile("old", oldSigs)
    bucketProfile("new", newSigs)

    // A/B: same sigPairs over old-form vs kernel-form signatures,
    // interleaved twice to share JIT warm-up and host noise
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time(name: String)(f: => Unit): Unit = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      val dc = (osBean.getProcessCpuTime - c0) / 1e9
      println(f"$name%-26s wall=$dt%7.2fs cpu=$dc%8.2fs")
    }
    (1 to 3).foreach { i =>
      val o = oldSigs.cache(); o.count()
      time(s"sigPairs(oldSigs) #$i") {
        graft.llm.Dedup.sigPairs(o).count(); ()
      }
      spark.catalog.clearCache()
      val nw = newSigs.cache(); nw.count()
      time(s"sigPairs(newSigs) #$i") {
        graft.llm.Dedup.sigPairs(nw).count(); ()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
