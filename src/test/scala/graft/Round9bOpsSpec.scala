package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Aggregates, Graphs, Joins}
import graft.llm.{Curation, TextStats}

/** Brute-force replays for the round-9 batch-18 operators: tolerance
  * as-of, attribution carries, weighted median, t-closeness TVD,
  * modularity, and shingle novelty. Each recomputes the answer from
  * the row-level definition on collected sf0.001 data. */
class Round9bOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val events: Array[(Long, Long, Long, String)] =
    Tables.t(spark, sf, "events")
      .selectExpr("event_id", "unix_micros(ts)", "user_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("join_asof_tolerance replays latest-view-within-1h per purchase") {
    val views = events.filter(_._4 == "view")
    val exp = events.filter(_._4 == "purchase").map { p =>
      val cands = views.filter(v => v._3 == p._3 && v._2 <= p._2 &&
        v._2 >= p._2 - 3600000000L)
      val best = if (cands.isEmpty) None
        else Some(cands.maxBy(v => (v._2, v._1))._1)
      p._1 -> best
    }.toMap
    val got = Joins.joinAsofTolerance(spark, sf).collect()
    assert(got.length == exp.size)
    for (r <- got) {
      val want = exp(r.getLong(0))
      assert(Option(r.get(1)).map(_.asInstanceOf[Long]) == want,
        s"p_id ${r.getLong(0)}")
      assert(r.getBoolean(2) == want.isDefined)
    }
  }

  test("agg_attribution replays last-touch and linear credits") {
    val chans = Seq("click", "view", "signup", "error")
    val lastTouch = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    val linear = scala.collection.mutable.Map[String, BigDecimal]()
      .withDefaultValue(BigDecimal(0))
    for ((_, hist) <- events.groupBy(_._3)) {
      val ordered = hist.sortBy(e => (e._2, e._1))
      for (i <- ordered.indices if ordered(i)._4 == "purchase") {
        val prior = ordered.take(i).filter(e => chans.contains(e._4))
        if (prior.nonEmpty) {
          lastTouch(prior.last._4) += 1
          val n = prior.length
          for (c <- chans) {
            val cnt = prior.count(_._4 == c)
            linear(c) += BigDecimal(cnt.toDouble / n)
              .setScale(12, BigDecimal.RoundingMode.HALF_UP)
          }
        }
      }
    }
    val got = Aggregates.aggAttribution(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == chans.toSet)
    for (r <- got) {
      val c = r.getString(0)
      assert(r.getLong(1) == lastTouch(c), s"last_touch $c")
      assert(math.abs(r.getDouble(2) - linear(c).toDouble) < 1e-6,
        s"linear $c: ${r.getDouble(2)} vs ${linear(c)}")
    }
  }

  test("agg_weighted_median replays the sorted cumulative-weight pick") {
    val rows = Tables.t(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong,
        math.round(r.getDouble(2) * 100)))
    val exp = rows.groupBy(_._1).map { case (g, xs) =>
      val byV = xs.groupBy(_._2).view
        .mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val tot = byV.map(_._2).sum
      var cum = 0L
      val med = byV.collectFirst {
        case (q, w) if { cum += w; 2 * cum >= tot } => q
      }.get
      g -> (tot, med)
    }
    val got = Aggregates.aggWeightedMedian(spark, sf).collect()
    assert(got.length == exp.size)
    for (r <- got) {
      val (tot, med) = exp(r.getString(0))
      assert(r.getLong(1) == tot && r.getLong(2) == med, r.toString)
    }
  }

  test("privacy_t_closeness replays the TVD and release rule") {
    val docs = Tables.t(spark, sf, "documents")
      .selectExpr("lang", "n_chars DIV 100", "source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val n = docs.length.toLong
    val globalC = docs.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val got = Curation.privacyTCloseness(spark, sf).collect()
    val byGroup = docs.groupBy(d => (d._1, d._2))
    assert(got.length == byGroup.size)
    for (r <- got) {
      val g = byGroup((r.getString(0), r.getLong(1)))
      val ng = g.length.toLong
      val cg = g.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      // iterator: mapping over Map.keys (a Set) would collapse equal terms
      val num = globalC.iterator.map { case (v, cv) =>
        math.abs(cg.getOrElse(v, 0L) * n - cv * ng) }.sum
      assert(r.getLong(2) == ng && r.getLong(3) == num, r.toString)
      val tvd = num.toDouble / (2.0 * ng * n)
      assert(math.abs(r.getDouble(4) - tvd) < 1e-5)
      assert(r.getBoolean(5) == (2 * num <= ng * n))
    }
  }

  test("graph_modularity replays Q from brute edges + engine labels") {
    val edges = BruteKnn.undirectedEdges(spark, sf)
    val labels = Graphs.graphCommunityLpa(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = edges.size.toDouble
    val eIn = edges.count { case (u, v) => labels(u) == labels(v) }
    val deg = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for ((u, v) <- edges) { deg(u) += 1; deg(v) += 1 }
    val dc = deg.toSeq.groupBy(x => labels(x._1)).view
      .mapValues(_.map(_._2).sum).toMap
    val sumDc2 = dc.values.map(d => d * d).sum
    val q = eIn / m - sumDc2 / (4.0 * m * m)
    val row = Graphs.graphModularity(spark, sf).collect().head
    assert(row.getLong(0) == edges.size.toLong)
    assert(row.getLong(1) == eIn.toLong)
    assert(row.getLong(3) == sumDc2)
    assert(math.abs(row.getDouble(4) - q) < 1e-6)
  }

  test("text_ngram_novelty replays first-owner shingle fractions") {
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val shingles = docs.map { case (id, t0) =>
      val toks = t0.split(' ')
      id -> toks.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    }.toMap
    val firstOwner = shingles.toSeq.flatMap { case (id, gs) =>
      gs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val got = TextStats.textNgramNovelty(spark, sf).collect()
    assert(got.length == shingles.count(_._2.nonEmpty))
    for (r <- got) {
      val gs = shingles(r.getLong(0))
      val novel = gs.count(g => firstOwner(g) == r.getLong(0))
      assert(r.getLong(1) == gs.size.toLong, s"doc ${r.getLong(0)}")
      assert(r.getLong(2) == novel.toLong)
    }
  }
}
