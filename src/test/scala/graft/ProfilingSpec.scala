package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Semantic + plan checks for the profiling/maintenance/anomaly trio
  * (profile_columns, scd2_history, anomaly_zscore) on sf0.001.
  */
class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("profile_columns: one row per column, stats match direct queries") {
    val li = Tables.t(spark, sf, "lineitem")
    val got = graft.queries.Scans.profileColumns(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set(
      "l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus"))
    val n = li.count()
    val ndQty = li.select("l_quantity").distinct().count()
    val ndRf = li.select("l_returnflag").distinct().count()
    assert(got("l_quantity") == ((n, n, ndQty)))
    assert(got("l_returnflag") == ((n, n, ndRf)))
  }

  private def simplePlan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("simple"))

  test("profile_columns: each union leg scans only its own column, no Expand") {
    val p = plan(graft.queries.Scans.profileColumns(spark, sf))
    // four legs, each with a pruned single-column ReadSchema
    val schemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.size == 4, s"expected 4 pruned scans:\n$p")
    schemas.foreach(l =>
      assert("struct<[^,>]+>".r.findFirstIn(l).isDefined, s"not pruned: $l"))
    // the Expand-based multi-distinct path is 30x slower — must not appear
    assert(!p.contains("Expand"), p)
  }

  test("scd2_history: intervals tile each user's timeline; one exchange") {
    val df = graft.queries.IngestQueries.scd2History(spark, sf)
    val rows = df.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getString(2), r.getLong(3),
      if (r.isNullAt(4)) Long.MaxValue else r.getLong(4),
      r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, vs) =>
      val sorted = vs.sortBy(_._2)
      // versions are 1..k dense
      assert(sorted.map(_._2).toSeq == (1 to vs.length).toSeq, s"user $u")
      // exactly one current version, and it is the last
      assert(vs.count(_._6) == 1 && sorted.last._6, s"user $u")
      // valid_to of version i equals valid_from of version i+1
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 == b._4, s"user $u gap")
        case _ =>
      }
      // no two consecutive versions share the attribute value
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 != b._3, s"user $u no-op version")
        case _ =>
      }
    }
    // both window passes ride ONE shuffle on user_id (AQE prints the
    // initial plan after the final one — count the final section only)
    val p = simplePlan(df).split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$p")
  }

  test("anomaly_zscore: flags exactly the >2.5-sigma rows; stats broadcast back") {
    import org.apache.spark.sql.functions._
    val ev = Tables.t(spark, sf, "events")
      .select(col("event_id"),
        col("value").cast("decimal(19,4)").cast("double").as("v"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val expected = ev.groupBy(_._3).flatMap { case (_, xs) =>
      val n = xs.length
      val mean = xs.map(_._2).sum / n
      val sd = math.sqrt(xs.map(x => (x._2 - mean) * (x._2 - mean)).sum / (n - 1))
      xs.filter(x => math.abs((x._2 - mean) / sd) > 2.5).map(_._1).toSeq
    }.toSet
    val got = graft.queries.Aggregates.anomalyZscore(spark, sf).collect()
      .map(_.getLong(0)).toSet
    // brute force uses a different summation order; tolerate boundary
    // flips only (none expected at this fixture)
    assert(got == expected, s"diff: ${(got diff expected) ++ (expected diff got)}")
    val p = plan(graft.queries.Aggregates.anomalyZscore(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("window_mad_outlier: matches brute-force median/MAD flagging") {
    import org.apache.spark.sql.functions._
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val ev = Tables.t(spark, sf, "events")
      .select(col("event_id"),
        col("value").cast("decimal(19,4)").cast("double").as("v"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val expected = ev.groupBy(_._3).flatMap { case (_, xs) =>
      val med = medianOf(xs.map(_._2).toSeq)
      val mad = medianOf(xs.map(x => math.abs(x._2 - med)).toSeq)
      xs.filter(x => math.abs(x._2 - med) / (mad * 1.4826) > 3.5)
        .map(_._1).toSeq
    }.toSet
    val got = graft.queries.Aggregates.windowMadOutlier(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got == expected,
      s"extra=${got diff expected} missing=${expected diff got}")
  }

  test("agg_gini: closed form matches brute force; bounded in [0,1)") {
    val ev = Tables.t(spark, sf, "events")
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).map { case (tpe, xs) =>
      val counts = xs.groupBy(_._2).map { case (u, e) => (u, e.length.toLong) }
        .toSeq.sortBy { case (u, c) => (c, u) }
      val n = counts.length.toLong
      val total = counts.map(_._2).sum
      val rx = counts.zipWithIndex.map { case ((_, x), i) => (i + 1) * x }.sum
      val g = (2.0 * rx - (n + 1) * total) / (n.toDouble * total)
      tpe -> BigDecimal(g).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = graft.queries.Aggregates.aggGini(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (tpe, g) =>
      assert(math.abs(got(tpe) - g) < 1e-9, s"$tpe: ${got(tpe)} vs $g")
      assert(got(tpe) >= 0.0 && got(tpe) < 1.0, tpe)
    }
  }
}
