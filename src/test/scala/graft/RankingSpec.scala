package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Ranking

/** Brute-force semantic checks of the ranking/LM-scoring operators
  * against plain-Scala re-implementations on the sf0.001 fixture
  * (500 docs). Scala's Math.log is the same libm call Spark's `log`
  * expression makes, so expected values match to the bit before the
  * 6-decimal rounding.
  */
class RankingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val docs: Map[Long, Seq[String]] =
    Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("text_tfidf: top-3 per doc matches brute force") {
    val n = docs.size
    val df = docs.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    val expected = docs.map { case (id, toks) =>
      val tf = toks.groupBy(identity).map { case (t, xs) => t -> xs.size }
      val scored = tf.toSeq.map { case (t, f) =>
        (t, f, round6(f * (math.log((1.0 + n) / (1.0 + df(t))) + 1.0)))
      }
      id -> scored.sortBy { case (t, _, w) => (-w, t) }.take(3)
    }
    val got = Ranking.textTfidf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
      .groupBy(_._1)
    assert(got.keySet == docs.keySet)
    docs.keys.foreach { id =>
      val g = got(id).sortBy(_._2)
        .map(x => (x._3, x._4, x._5)).toSeq
      val e = expected(id).map { case (t, f, w) => (t, f.toLong, w) }
      assert(g == e, s"doc $id: got $g expected $e")
    }
  }

  test("text_bm25: matches brute force; only matching docs appear") {
    val q = Seq("spark", "data", "query")
    val n = docs.size
    val avgdl = docs.values.map(_.size.toLong).sum.toDouble / n
    val dfq = q.map(t => t -> docs.values.count(_.contains(t))).toMap
    val expected = docs.flatMap { case (id, toks) =>
      val dl = toks.size
      val terms = q.flatMap { t =>
        val tf = toks.count(_ == t)
        if (tf == 0) None
        else {
          val idf = math.log(1.0 + (n - dfq(t) + 0.5) / (dfq(t) + 0.5))
          Some(BigDecimal(round6(idf * (tf * 2.2) /
            (tf + (dl / avgdl * 0.75 + 0.25) * 1.2))))
        }
      }
      if (terms.isEmpty) None
      else Some(id -> (terms.size.toLong, terms.sum.toDouble))
    }
    val got = Ranking.textBm25(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, (nt, score)) =>
      assert(got(id)._1 == nt)
      assert(math.abs(got(id)._2 - score) < 1e-9, s"doc $id")
    }
  }

  test("text_bigram_lm: matches brute force; short docs score 0") {
    val bigrams = docs.toSeq.flatMap { case (id, toks) =>
      toks.sliding(2).filter(_.size == 2).map(p => (id, (p(0), p(1))))
    }
    val c2 = bigrams.groupBy(_._2).map { case (bg, xs) => bg -> xs.size }
    val c1 = c2.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val vocab = docs.values.flatten.toSet.size
    val expected = docs.map { case (id, toks) =>
      val bgs = toks.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
      if (bgs.isEmpty) id -> (0L, 0.0)
      else {
        val sum = bgs.map(bg => BigDecimal(round6(
          math.log((c2(bg) + 1.0) / (c1(bg._1) + vocab))))).sum
        id -> (bgs.size.toLong,
          BigDecimal(sum.toDouble / bgs.size)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val got = Ranking.textBigramLm(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == docs.keySet)
    expected.foreach { case (id, (nb, avg)) =>
      assert(got(id)._1 == nb, s"doc $id n_bigrams")
      assert(math.abs(got(id)._2 - avg) < 1e-9, s"doc $id avg_logp")
    }
  }

  test("sim_search_hybrid: rrf consistent with leg ranks; pools are heap top-k") {
    val df = graft.llm.Ranking.simSearchHybrid(spark, sf)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { case (id, rl, rd, rrf) =>
      assert(rl >= 1 && rl <= 50 && rd >= 1 && rd <= 50, s"doc $id ranks")
      val expect = BigDecimal(1.0 / (rl + 60) + 1.0 / (rd + 60))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rrf == expect, s"doc $id rrf")
    }
    // fused list is sorted by rrf desc
    assert(rows.map(_._4).toSeq == rows.map(_._4).sortBy(-_).toSeq)
    // both candidate pools cut with a top-k heap, not a global sort
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2, p)
  }

  test("text_char_lang_id: confusion rows cover every doc exactly once") {
    val langCounts = Tables.t(spark, sf, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val confusion = graft.llm.TextStats.textCharLangId(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // every document classified exactly once: row sums match lang counts
    val rowSums = confusion.groupBy(_._1)
      .map { case (l, xs) => l -> xs.map(_._3).sum }
    assert(rowSums == langCounts, s"$rowSums vs $langCounts")
    // predictions only ever name known languages
    assert(confusion.map(_._2).toSet.subsetOf(langCounts.keySet))
    // deterministic across evaluations
    val again = graft.llm.TextStats.textCharLangId(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(again.toSeq == confusion.toSeq)
  }

  test("embedding_random_projection: matches a JVM-side md5 replay") {
    import java.security.MessageDigest
    def sign(i: Int, j: Int): Long = {
      val md = MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${i}_$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if ("13579bdf".contains(hex.head)) -1L else 1L
    }
    val embs = Tables.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val got = graft.llm.Similarity
      .embeddingRandomProjection(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.size == embs.size * 8)
    // exact integer replay for every vector and output dim
    embs.foreach { case (id, e) =>
      (0 until 8).foreach { j =>
        val expect = e.indices.map(i =>
          sign(i, j) * math.round(e(i).toDouble * 1000000d)).sum
        assert(got((id, j)) == expect, s"vec $id dim $j")
      }
    }
  }

  test("text_g2_collocations: replays the 2x2 likelihood-ratio formula exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet)
    val nDocs = docs.length.toLong
    val df = docs.flatMap(_._2).groupBy(identity).map { case (t, xs) =>
      t -> xs.length.toLong
    }
    val got = graft.llm.Ranking.textG2Collocations(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.length == 15)
    got.foreach { case (a, b, cab, g2) =>
      assert(cab >= 5, "min-support floor")
      val bf = docs.count { case (_, toks) => toks(a) && toks(b) }.toLong
      assert(bf == cab, s"($a,$b) pair count: $cab vs brute-force $bf")
      val (ca, cb) = (df(a), df(b))
      def term(o: Long, r: Long, c: Long): Double =
        if (o > 0) o.toDouble * math.log(o.toDouble * nDocs /
          (r.toDouble * c)) else 0.0
      val expect = BigDecimal(2.0 * (term(cab, ca, cb) +
        term(ca - cab, ca, nDocs - cb) +
        term(cb - cab, nDocs - ca, cb) +
        term(nDocs - ca - cb + cab, nDocs - ca, nDocs - cb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(g2 - expect) <= 1e-4, s"($a,$b): $g2 vs $expect")
      // G² is a likelihood-ratio statistic: nonnegative up to rounding
      assert(g2 >= -1e-4, s"($a,$b): negative G² $g2")
    }
    // ranking is by (g2 desc, tok_a, tok_b)
    val sorted = got.sortBy { case (a, b, _, g2) => (-g2, a, b) }
    assert(got.toSeq == sorted.toSeq)
  }
}
