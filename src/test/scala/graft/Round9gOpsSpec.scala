package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Aggregates, Windows}
import graft.llm.{Similarity, TextStats}

/** Brute-force replays for the round-9 batch-33 operators: the
  * seasonal day-of-week index, the language-ID confusion matrix, the
  * frozen-center Calinski–Harabasz index, and BH FDR control over
  * the per-type permutation family. Each recomputes the answer from
  * the row-level definition on collected sf0.001 data. */
class Round9gOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rnd(v: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("window_seasonal_index replays the detrended dow residuals") {
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(ts AS DATE)").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val exp = ev.groupBy(_._1).toSeq.flatMap { case (ty, xs) =>
      val daily = xs.groupBy(_._2).map { case (d0, ys) =>
        (d0, ys.size.toLong)
      }.toSeq.sortBy(_._1.toEpochDay)
      daily.indices.flatMap { i =>
        if (i < 3 || i >= daily.length - 3) None
        else {
          // frame completeness in the engine is ROW-based (n7 = 7
          // physically present neighbors), matching this slice
          val frame = daily.slice(i - 3, i + 4)
          val resid = 7L * daily(i)._2 - frame.map(_._2).sum
          Some(((ty, daily(i)._1.getDayOfWeek.getValue % 7 + 1), resid))
        }
      }
    }.groupBy(_._1).map { case (k, xs) =>
      k -> (xs.length.toLong,
        rnd(xs.map(_._2).sum.toDouble / (7.0 * xs.length.toDouble), 6))
    }
    val got = Windows.windowSeasonalIndex(spark, sf).collect()
    assert(got.length == exp.size && got.nonEmpty)
    for (r <- got) {
      val (n, seas) = exp((r.getString(0), r.getInt(1)))
      assert(r.getLong(2) == n && r.getDouble(3) == seas,
        s"${r.getString(0)}/${r.getInt(1)}")
    }
  }

  test("text_langid_confusion replays the stopword-rule cells") {
    val stop = Set("the", "a", "of", "and", "to", "in")
    val docs = Tables.t(spark, sf, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val preds = docs.map { case (lang, tx) =>
      val toks = tx.split(" ", -1)
      val ratio = toks.count(stop.contains).toDouble / toks.length
      (lang, if (ratio > 0.05) "en" else "other")
    }
    val cells = preds.groupBy(identity)
      .map { case (k, xs) => k -> xs.length.toLong }
    val rowTot = preds.groupBy(_._1)
      .map { case (l, xs) => l -> xs.length.toLong }
    val got = TextStats.textLangidConfusion(spark, sf).collect()
    assert(got.length == cells.size && got.nonEmpty)
    for (r <- got) {
      val k = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == cells(k), k.toString)
      assert(r.getDouble(3)
        == rnd(cells(k).toDouble / rowTot(k._1).toDouble, 6),
        k.toString)
    }
  }

  test("embedding_calinski_harabasz replays the frozen-center index") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val rows = Tables.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000000d)
          .setScale(0, HALF_UP).toLong).toIndexedSeq))
    val cents = rows.filter(_._1 < 8).sortBy(_._1)
      .map(t0 => (t0._1.toInt, t0._2))
    val csum = cents.toSeq.map(_._2.toSeq).transpose.map(_.sum)
    val dev2 = cents.map { case (cell, cm) =>
      cell -> cm.zip(csum).map { case (a, sv) =>
        val dv = 8L * a - sv; dv * dv
      }.sum
    }.toMap
    val assigned = rows.map { case (_, m) =>
      cents.map { case (cell, cm) =>
        (m.zip(cm).map { case (a, b) => (a - b) * (a - b) }.sum, cell)
      }.min
    }
    val n = assigned.length.toLong
    val w = assigned.map(t0 => BigInt(t0._1)).sum
    val b64 = assigned.groupBy(_._2)
      .map { case (cell, xs) => BigInt(xs.length) * BigInt(dev2(cell)) }
      .sum
    val ch = rnd((b64.toDouble / 64.0 / 7.0) / (w.toDouble / (n - 8).toDouble), 6)
    val got = Similarity.embeddingCalinskiHarabasz(spark, sf).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == w.toDouble && r.getDouble(2) == b64.toDouble)
    assert(r.getDouble(3) == ch)
  }

  test("agg_bh_fdr replays permutation p-values and the step-up cut") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val ev = Tables.t(spark, sf, "events")
      .select("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(4, HALF_UP)))
    def arm(seed: String): Long =
      java.lang.Long.parseLong(md5hex(seed).substring(0, 6), 16) % 2
    def diff(cells: Iterable[(Long, Long, BigDecimal)],
        armOf: Long => Long): Double = {
      val by = cells.groupBy(c => armOf(c._1))
      val (s1, c1) = (by(1L).map(_._3).sum, by(1L).map(_._2).sum)
      val (s0, c0) = (by(0L).map(_._3).sum, by(0L).map(_._2).sum)
      s1.toDouble / c1 - s0.toDouble / c0
    }
    val byType = ev.groupBy(_._1).map { case (ty, xs) =>
      ty -> xs.groupBy(_._2).map { case (u, ys) =>
        (u, ys.size.toLong, ys.map(_._3).sum)
      }
    }
    val ps = byType.map { case (ty, cells) =>
      val obs = diff(cells, u => arm(u.toString))
      val nGe = (1 to 100).count { b =>
        math.abs(diff(cells, u => arm(s"${u}_$b"))) >= math.abs(obs)
      }
      ty -> (rnd(obs, 6), (nGe + 1).toLong)
    }
    val ranked = ps.toSeq.sortBy { case (ty, (_, p)) => (p, ty) }
      .zipWithIndex
    val istar = ranked.collect {
      case ((_, (_, p)), i) if p * 500 <= 505 * (i + 1) => p
    }.maxOption
    val got = Aggregates.aggBhFdr(spark, sf).collect()
    assert(got.length == ps.size && got.nonEmpty)
    for (r <- got) {
      val (obs, p) = ps(r.getString(0))
      assert(r.getDouble(1) == obs && r.getLong(2) == p, r.getString(0))
      assert(r.getDouble(3) == rnd(p.toDouble / 101.0, 6))
      assert(r.getBoolean(4) == istar.exists(p <= _), r.getString(0))
    }
  }
}
