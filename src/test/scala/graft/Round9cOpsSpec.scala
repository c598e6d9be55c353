package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Graphs, Joins, Windows}
import graft.llm.Similarity

/** Brute-force replays for the round-9 batch-19 operators: synchronous
  * k-core peel, the bucketed prior-window aggregate join, the grid-cell
  * spatial neighbor join, largest-remainder proration, and the
  * centroid silhouette. Each recomputes the answer from the row-level
  * definition on collected sf0.001 data — independently of both the
  * engine's decomposition and the DuckDB oracle's formulation. */
class Round9cOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("graph_kcore replays three synchronous peel rounds") {
    var edges = BruteKnn.undirectedEdges(spark, sf)
    var alive = edges.flatMap(e => Seq(e._1, e._2))
    val peeled = scala.collection.mutable.Map[Long, Int]()
    for (r <- 1 to 3) {
      val deg = scala.collection.mutable.Map[Long, Int]()
        .withDefaultValue(0)
      for ((u, v) <- edges) { deg(u) += 1; deg(v) += 1 }
      val out = alive.filter(n => deg(n) < 6)
      out.foreach(n => peeled(n) = r)
      alive = alive.filter(n => deg(n) >= 6)
      edges = edges.filter(e => alive(e._1) && alive(e._2))
    }
    val exp = peeled.toMap ++ alive.map(_ -> 0).toMap
    val got = Graphs.graphKcore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == exp)
  }

  test("join_window_aggregate replays the 1h prior-view band counts") {
    val events = Tables.t(spark, sf, "events")
      .selectExpr("event_id", "unix_micros(ts)", "user_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val views = events.filter(_._4 == "view")
    val exp = events.filter(_._4 == "purchase").map { p =>
      val band = views.filter(v => v._3 == p._3 &&
        v._2 >= p._2 - 3600000000L && v._2 < p._2)
      p._1 -> (band.length.toLong,
        if (band.isEmpty) None else Some(p._2 - band.map(_._2).max))
    }.toMap
    val got = Joins.joinWindowAggregate(spark, sf).collect()
    assert(got.length == exp.size)
    for (r <- got) {
      val (nv, gap) = exp(r.getLong(0))
      assert(r.getLong(1) == nv, s"p_id ${r.getLong(0)}")
      assert(Option(r.get(2)).map(_.asInstanceOf[Long]) == gap)
    }
  }

  test("join_geo_grid replays the Chebyshev neighbor counts") {
    def h(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 6), 16)
    }
    val pts = Tables.t(spark, sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
      .map(ck => (ck, h(s"lat|$ck") % 18000, h(s"lon|$ck") % 36000))
    val exp = pts.map { case (ck, la, lo) =>
      ck -> pts.count { case (bk, lb, ob) =>
        bk != ck && math.abs(la - lb) < 100 && math.abs(lo - ob) < 100 }
    }.toMap
    val got = Joins.joinGeoGrid(spark, sf).collect()
    assert(got.length == exp.size)
    for (r <- got)
      assert(r.getLong(3) == exp(r.getLong(0)).toLong,
        s"ck ${r.getLong(0)}")
  }

  test("window_allocate_remainder conserves cents and replays allocs") {
    val li = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        math.round(r.getDouble(2) * 100)))
    val tot = Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 100)).toMap
    val exp = li.groupBy(_._1).toSeq.flatMap { case (ok, xs) =>
      val tt = tot(ok)
      val ww = xs.map(_._3).sum
      val withBase = xs.map { case (_, ln, w) =>
        (ln, w, tt * w / ww, tt * w % ww) }
      val r = tt - withBase.map(_._3).sum
      val ranked = withBase.sortBy { case (ln, w, _, rem) =>
        (-rem, ln, w) }.zipWithIndex
      ranked.map { case ((ln, w, base, _), i) =>
        ((ok, ln, w), base + (if (i < r) 1L else 0L)) }
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val got = Windows.windowAllocateRemainder(spark, sf).collect()
    assert(got.length == li.length)
    assert(got.forall(_.getBoolean(4)), "exact flag")
    val gotAllocs = got.groupBy(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2)))
      .view.mapValues(_.map(_.getLong(3)).toSeq.sorted).toMap
    assert(gotAllocs == exp)
    // cents conservation, re-derived
    for ((ok, rows) <- got.groupBy(_.getLong(0)))
      assert(rows.map(_.getLong(3)).sum == tot(ok), s"order $ok")
  }

  test("embedding_silhouette replays (b-a)/b over the 8 centroids") {
    val em = Tables.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000000d)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray))
    val cents = em.filter(_._1 < 8).sortBy(_._1)
    val got = Similarity.embeddingSilhouette(spark, sf).collect()
    assert(got.length == em.length)
    val byId = em.toMap
    for (r <- got) {
      val m = byId(r.getLong(0))
      val d2s = cents.map { case (c, cm) =>
        (m.zip(cm).map { case (a, b) => (a - b) * (a - b) }.sum, c.toInt)
      }.sorted
      val (a2, cell) = d2s(0)
      val (b2, _) = d2s(1)
      assert(r.getInt(1) == cell && r.getLong(2) == a2 &&
        r.getLong(3) == b2, r.toString)
      val sil = (math.sqrt(b2.toDouble) - math.sqrt(a2.toDouble)) /
        math.sqrt(b2.toDouble)
      assert(math.abs(r.getDouble(4) - sil) < 1e-5)
    }
  }
}
