package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Multimodal

/** The multimodal stubs' contracts: the partition-batch resize path
  * (mapPartitions) preserves row count and honors the 64-byte thumbnail
  * budget; frame sampling emits exactly every 2nd 32-byte frame. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("resize is row-preserving and bounded by the thumbnail budget") {
    val docs = Tables.t(spark, sf, "documents")
    val out = Multimodal.multimodalResize(spark, sf).collect()
    assert(out.length == docs.count())
    assert(out.forall { r =>
      val n = r.getAs[Int]("n_bytes")
      val k = r.getAs[Int]("resized_bytes")
      k == math.min(64, n) && r.getAs[String]("thumb_md5").length == 32
    })
  }

  test("frame sample emits ceil(frames/2) rows per doc with in-range indexes") {
    import org.apache.spark.sql.functions._
    val perDoc = Multimodal.multimodalFrameSample(spark, sf)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("frame_idx").as("max_idx"))
    val expect = Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        ceil(octet_length(col("text").cast("binary")) / lit(32.0))
          .cast("long").as("nf"))
    val bad = perDoc.join(expect, "doc_id")
      .filter(col("n") =!= ceil(col("nf") / lit(2.0)).cast("long") ||
        col("max_idx") >= col("nf"))
      .count()
    assert(bad == 0L)
  }

  test("chunk_bytes: empty payload yields zero chunks, 65 bytes yield two") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // without the guard, sequence(0, ceil(0/64)-1) = sequence(0, -1)
    // descends through [0, -1] and fabricates two chunks for nothing
    val docs = Seq((1L, ""), (2L, "x" * 65), (3L, "y" * 64)).toDF("doc_id", "s")
      .select(col("doc_id"), col("s").cast("binary").as("payload"))
    val got = Multimodal.chunkBytesOf(docs)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), sum("chunk_len").as("b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!got.contains(1L), got.toString)
    assert(got(2L) == (2L, 65L) && got(3L) == (1L, 64L), got.toString)
  }

  test("ahash matches a byte-level driver replay and groups cover all docs") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.length >= 32)
    val expected = docs.map { case (id, text) =>
      val px = text.take(32).map(_.toInt)
      val sum = px.sum
      val bits = px.map(v => if (v * 32 >= sum) '1' else '0').mkString
      (id, bits)
    }
    val expGroups = expected.groupBy(_._2).map { case (h, rows) =>
      h -> (rows.map(_._1).min, rows.length.toLong)
    }
    val got = Multimodal.multimodalAhash(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expGroups,
      s"first diff: ${expGroups.find { case (k, v) => got.get(k) != Some(v) }}")
    assert(got.values.map(_._2).sum == docs.length.toLong)
  }
}
