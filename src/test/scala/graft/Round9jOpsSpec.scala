package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Curation, Similarity}

/** Brute-force replays for the round-9 batch-36 operators: triplet
  * hard-example mining, the per-dimension embedding health table,
  * and Warner randomized response. Each recomputes the answer from
  * the row-level definition on collected sf0.001 data. */
class Round9jOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rnd(v: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("sim_hard_negatives replays the two per-probe 1-heaps") {
    val rows = Tables.t(spark, sf, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toIndexedSeq))
    def cos(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      dot / (na * nb)
    }
    val probes = rows.filter(_._1 < 10)
    val corpus = rows.filter(_._1 >= 10)
    val exp = probes.map { case (pid, plabel, pv) =>
      val scored = corpus.map { case (id, l, v) =>
        (id, l, rnd(cos(v, pv), 6))
      }
      val neg = scored.filter(_._2 != plabel)
        .sortBy(t0 => (-t0._3, t0._1)).head
      val pos = scored.filter(_._2 == plabel)
        .sortBy(t0 => (t0._3, t0._1)).head
      pid -> (neg._1, neg._3, pos._1, pos._3,
        rnd(neg._3 - pos._3, 6))
    }.toMap
    val got = Similarity.simHardNegatives(spark, sf).collect()
    assert(got.length == exp.size && got.nonEmpty)
    for (r <- got) {
      val (ni, nc, pi, pc, mg) = exp(r.getLong(0))
      assert(r.getLong(1) == ni && r.getDouble(2) == nc,
        r.getLong(0).toString)
      assert(r.getLong(3) == pi && r.getDouble(4) == pc,
        r.getLong(0).toString)
      assert(r.getDouble(5) == mg, r.getLong(0).toString)
    }
  }

  test("embedding_dim_stats replays the per-dim micro moments") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val rows = Tables.t(spark, sf, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(x =>
        BigDecimal(x.toDouble * 1000000d)
          .setScale(0, HALF_UP).toLong).toIndexedSeq)
    val dims = rows.head.length
    val got = Similarity.embeddingDimStats(spark, sf).collect()
    assert(got.length == dims)
    for (r <- got) {
      val i = r.getInt(0)
      val vs = rows.map(_(i))
      val n = vs.length.toLong
      val s1 = vs.sum
      val s2 = vs.map(v => v * v).sum
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) == rnd(s1.toDouble / n.toDouble / 1e6, 6))
      assert(r.getDouble(3) == rnd((n.toDouble * s2.toDouble
        - s1.toDouble * s1.toDouble)
        / (n.toDouble * n.toDouble) / 1e12, 9), s"dim $i")
    }
  }

  test("privacy_randomized_response replays the seeded coin") {
    val ev = Tables.t(spark, sf, "events")
      .select("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val exp = ev.groupBy(_._1).map { case (ty, xs) =>
      val reps = xs.map { case (_, id, v) =>
        val b = if (v >= 50.0) 1L else 0L
        val h = java.lang.Long.parseLong(
          md5hex(s"rr|$id").substring(0, 6), 16) % 4
        (b, if (h < 3) b else 1L - b)
      }
      val n = reps.length.toLong
      val kTrue = reps.map(_._1).sum
      val kRep = reps.map(_._2).sum
      val pHat = (kRep.toDouble / n.toDouble - 0.25) / 0.5
      val pTrue = kTrue.toDouble / n.toDouble
      ty -> (n, kRep, rnd(pHat, 6), rnd(pTrue, 6),
        math.abs(pHat - pTrue) < 0.2)
    }
    val got = Curation.privacyRandomizedResponse(spark, sf).collect()
    assert(got.length == exp.size && got.nonEmpty)
    for (r <- got) {
      val (n, kRep, pHat, pTrue, cal) = exp(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == kRep, r.getString(0))
      assert(r.getDouble(3) == pHat && r.getDouble(4) == pTrue)
      assert(r.getBoolean(5) == cal && cal, r.getString(0))
    }
  }
}
