package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Aggregates
import graft.llm.{Curation, Multimodal}

/** Brute-force replays for the round-9 batch-38 operators: ROC curve
  * points, banded dHash near-duplicates, and PPS systematic
  * sampling. Each recomputes the answer from the row-level
  * definition on collected sf0.001 data. */
class Round9lOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rnd(v: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  test("agg_roc_points replays the decade-threshold cells") {
    val ev = Tables.t(spark, sf, "events")
      .select("user_id", "value").collect()
      .map(r => (if (r.getLong(0) % 2 == 0) 1 else 0,
        math.floor(r.getDouble(1) / 10.0).toLong))
    val got = Aggregates.aggRocPoints(spark, sf).collect()
    assert(got.length == 9)
    for (r <- got) {
      val thr = r.getLong(0)
      val tp = ev.count(t0 => t0._1 == 1 && t0._2 >= thr).toLong
      val fp = ev.count(t0 => t0._1 == 0 && t0._2 >= thr).toLong
      val fn = ev.count(t0 => t0._1 == 1 && t0._2 < thr).toLong
      val tn = ev.count(t0 => t0._1 == 0 && t0._2 < thr).toLong
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        == ((tp, fp, fn, tn)), s"thr $thr")
      assert(r.getDouble(5) == rnd(tp.toDouble / (tp + fn).toDouble, 6))
      assert(r.getDouble(6) == rnd(fp.toDouble / (fp + tn).toDouble, 6))
    }
  }

  test("multimodal_near_dup replays the Hamming-ball pairs exactly") {
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.length >= 33)
    val hashes = docs.map { case (id, tx) =>
      val px = (1 to 33).map(i => tx.charAt(i - 1).toInt)
      val v = (1 to 32).foldLeft(0L) { (acc, i) =>
        acc * 2 + (if (px(i) > px(i - 1)) 1L else 0L)
      }
      (id, v)
    }
    // the ≤2 threshold is within the pigeonhole bound of 4 bands, so
    // the banded engine result must equal the FULL all-pairs scan
    val exp = (for {
      (a, va) <- hashes
      (b, vb) <- hashes
      if a < b
      h = java.lang.Long.bitCount(va ^ vb)
      if h <= 2
    } yield ((a, b), h)).toMap
    val got = Multimodal.multimodalNearDup(spark, sf).collect()
    assert(got.length == exp.size && got.nonEmpty)
    for (r <- got)
      assert(r.getInt(2) == exp((r.getLong(0), r.getLong(1))),
        s"${r.getLong(0)}/${r.getLong(1)}")
  }

  test("sample_pps_systematic replays the interval containment") {
    val docs = Tables.t(spark, sf, "documents")
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exp = docs.groupBy(_._1).toSeq.flatMap { case (src, xs) =>
      val sorted = xs.sortBy(_._2)
      val bigW = sorted.map(_._3).sum
      val cums = sorted.scanLeft(0L)((acc, t0) => acc + t0._3).tail
      for {
        ((_, id, w), cum) <- sorted.zip(cums)
        j <- 0L to 4L
        if 10 * (cum - w) < (2 * j + 1) * bigW
        if (2 * j + 1) * bigW <= 10 * cum
      } yield ((src, j), (id, w))
    }.toMap
    val got = Curation.samplePpsSystematic(spark, sf).collect()
    assert(got.length == exp.size && got.nonEmpty)
    for (r <- got) {
      val (id, w) = exp((r.getString(0), r.getLong(1)))
      assert(r.getLong(2) == id && r.getLong(3) == w,
        s"${r.getString(0)}/${r.getLong(1)}")
    }
  }
}
