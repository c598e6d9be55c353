package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the kNN-graph analytics
  * ([[graft.queries.Graphs]]) — the oracle gate pins exact values; these
  * pin the graph-theoretic properties that must hold at ANY scale. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("degree histogram covers all nodes with degree >= 5") {
    val rows = graft.queries.Graphs.graphDegreeDistribution(spark, sf)
      .collect()
    val n = rows.map(_.getLong(1)).sum
    assert(n == 500, s"histogram mass $n != 500 nodes")
    // symmetrized 5-NN: undirected degree is at least the out-degree
    assert(rows.map(_.getLong(0)).min >= 5, rows.map(_.getLong(0)).min)
  }

  test("triangle counts match the naive closed-wedge count") {
    val df = graft.queries.Graphs.graphTriangles(spark, sf)
    val perNode = df.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // naive recount: adjacency sets on the driver (500 nodes only)
    import org.apache.spark.sql.functions._
    val edges = {
      val m = graft.Tables.t(spark, sf, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding").cast("array<double>"),
            x => floor(x * 1000000.0 + 0.5).cast("long")).as("q"))
      val a = m.select(col("vec_id").as("src"), col("q").as("qa"))
      val b = m.select(col("vec_id").as("dst"), col("q").as("qb"))
      val pairs = a.join(broadcast(b), col("src") =!= col("dst"))
        .select(col("src"), col("dst"),
          aggregate(zip_with(col("qa"), col("qb"), (x, y) => x * y),
            lit(0L), (acc, v) => acc + v).as("dot"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("dot").desc, col("dst"))
      pairs.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val naive = adj.map { case (node, nbrs) =>
      node -> nbrs.toSeq.combinations(2)
        .count { case Seq(a, b) => adj(a).contains(b) }.toLong
    }
    val mismatches = naive.filter { case (k, c) =>
      perNode.getOrElse(k, 0L) != c && (c != 0 || perNode.contains(k))
    }
    assert(mismatches.isEmpty, mismatches.take(5).toString)
    assert(naive.values.sum > 0, "fixture graph has no triangles at all")
  }

  test("link prediction only scores non-edges with shared neighbors") {
    val preds = graft.queries.Graphs.graphLinkPrediction(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(preds.nonEmpty && preds.forall(_._3 >= 1))
    // no predicted pair may be an existing undirected edge
    import org.apache.spark.sql.functions._
    val m = graft.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * 1000000.0 + 0.5).cast("long")).as("q"))
    val a = m.select(col("vec_id").as("src"), col("q").as("qa"))
    val b = m.select(col("vec_id").as("dst"), col("q").as("qb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("dot").desc, col("dst"))
    val edges = a.join(broadcast(b), col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        aggregate(zip_with(col("qa"), col("qb"), (x, y) => x * y),
          lit(0L), (acc, v) => acc + v).as("dot"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(preds.forall { case (u, v, _) => !edges.contains((u, v)) })
  }

  test("pagerank conserves mass within integer-truncation loss") {
    val rows = graft.queries.Graphs.graphPagerank(spark, sf).collect()
    assert(rows.length == 500)
    val total = rows.map(_.getLong(1)).sum
    val scale = 1000000000000L
    // each round loses <1 unit per (edge division + damping division +
    // teleport division) — bound generously at |V|*(k+2) per round * 5
    val maxLoss = 500L * 7 * 5
    assert(total <= scale && total >= scale - maxLoss,
      s"mass $total vs $scale (max loss $maxLoss)")
    // hubs exist: ranks are not uniform (the graph is irregular)
    assert(rows.map(_.getLong(1)).distinct.length > 1)
  }

  test("recursive-CTE reachability matches a driver BFS from seed 0") {
    import org.apache.spark.sql.functions._
    val layers = graft.queries.Graphs.graphReachabilityCte(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // driver BFS over the same undirected kNN edges
    val m = graft.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * 1000000.0 + 0.5).cast("long")).as("q"))
    val a = m.select(col("vec_id").as("src"), col("q").as("qa"))
    val b = m.select(col("vec_id").as("dst"), col("q").as("qb"))
    val pairs = a.join(broadcast(b), col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        aggregate(zip_with(col("qa"), col("qb"), (x, y) => x * y),
          lit(0L), (acc, v) => acc + v).as("dot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("dot").desc, col("dst"))
    val edges = pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    var frontier = Set(0L)
    var seen = Set(0L)
    val expect = scala.collection.mutable.Map(0 -> 1L)
    (1 to 3).foreach { h =>
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- seen
      if (frontier.nonEmpty) expect(h) = frontier.size.toLong
      seen ++= frontier
    }
    assert(layers == expect.toMap, s"got $layers expected $expect")
  }

  test("LPA labels match a driver replay of 3 synchronous rounds") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.Graphs.graphCommunityLpa(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same undirected kNN edges, rebuilt independently
    val m = graft.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * 1000000.0 + 0.5).cast("long")).as("q"))
    val a = m.select(col("vec_id").as("src"), col("q").as("qa"))
    val b = m.select(col("vec_id").as("dst"), col("q").as("qb"))
    val pairs = a.join(broadcast(b), col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        aggregate(zip_with(col("qa"), col("qb"), (x, y) => x * y),
          lit(0L), (acc, v) => acc + v).as("dot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("dot").desc, col("dst"))
    val edges = pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSeq }
    var lbl: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lbl = adj.map { case (n, nbrs) =>
        val counts = nbrs.map(lbl).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        // most frequent, ties to smallest label — the query's argmax
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    assert(got == lbl,
      s"first diff: ${lbl.find { case (k, v) => got.get(k) != Some(v) }}")
    // communities actually merged: fewer labels than nodes
    assert(got.values.toSet.size < got.size)
  }

  test("window_twap replays driver time-weighted means") {
    import org.apache.spark.sql.functions._
    val rows = graft.Tables.t(spark, sf, "events")
      .select(col("event_type"), col("ts").cast("date").cast("string"),
        unix_micros(col("ts")), col("event_id"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val expected = rows.groupBy(t => (t._1, t._2)).flatMap {
      case (k, es) =>
        val srt = es.sortBy(e => (e._3, e._4))
        val gaps = srt.zip(srt.tail).map { case (cur, nxt) =>
          (BigDecimal(cur._5).setScale(4, BigDecimal.RoundingMode.HALF_UP),
            nxt._3 - cur._3)
        }
        if (gaps.isEmpty) None
        else {
          val span = gaps.map(_._2).sum
          val pv = gaps.map { case (v, g) => v * BigDecimal(g) }.sum
          Some(k -> (gaps.length.toLong, span,
            BigDecimal(pv.toDouble / span.toDouble)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
    }
    val got = graft.queries.Windows.windowTwap(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == expected,
      s"first diff: ${expected.find { case (k, v) => got.get(k) != Some(v) }}")
  }
}
