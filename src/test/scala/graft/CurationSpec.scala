package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Curation

/** Semantic properties of the corpus-curation operators, brute-forced
  * against Scala re-implementations on the sf0.001 fixture (500 docs).
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("pack_sequences: offsets stay under budget and bins are contiguous per lang") {
    val rows = Curation.packSequences(spark, sf)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, _, _, off) => off >= 0 && off < 256 })
    // replay the prefix sum per lang and re-derive (bin, offset)
    rows.groupBy(_._1).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._2).foreach { case (_, _, n, bin, off) =>
        assert(bin == cum / 256 && off == cum % 256)
        cum += n
      }
    }
  }

  test("split_train_holdout: exhaustive, deterministic, roughly 90/5/5") {
    val df = Curation.splitTrainHoldout(spark, sf).cache()
    val total = df.count()
    assert(total == 500L)
    val bySplit = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == total)
    // md5 is uniform: train should land well inside [80%, 98%]
    val train = bySplit.getOrElse("train", 0L).toDouble / total
    assert(train > 0.8 && train < 0.98, s"train fraction $train")
    // stable across evaluations (pure function of doc_id)
    val again = Curation.splitTrainHoldout(spark, sf).collect().toSeq
    assert(again == df.orderBy("doc_id").collect().toSeq)
  }

  test("text_dedup_lines: kept+removed covers all lines; removed lines are exactly the df>1 ones") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def lines(text: String): Seq[String] =
      text.split(" ").grouped(4).map(_.mkString(" ")).toSeq
    val dfreq = docs.toSeq.flatMap { case (id, t) => lines(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
    val expected = docs.map { case (id, t) =>
      val ls = lines(t)
      id -> ls.count(l => dfreq(l) <= 1)
    }
    val got = Curation.textDedupLines(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._1).toSet == docs.keySet)
    got.foreach { case (id, kept, removed) =>
      val ls = lines(docs(id))
      assert(kept + removed == ls.size, s"doc $id")
      assert(kept == expected(id), s"doc $id kept=$kept expected=${expected(id)}")
    }
    // the fixture's tiny vocabulary must actually produce boilerplate
    assert(got.map(_._3).sum > 0, "no boilerplate removed — test is vacuous")
  }

  test("text_contamination matches brute-force shingle intersection") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def grams(t: String): Set[String] =
      t.split(" ").sliding(4).map(_.mkString(" ")).toSet
    val bench = docs.filter(_._1 % 50 == 0).flatMap(d => grams(d._2)).toSet
    val expected = docs.filter(_._1 % 50 != 0)
      .map { case (id, t) => id -> grams(t).count(bench.contains) }
      .filter(_._2 > 0).toMap
    val got = Curation.textContamination(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.view.mapValues(_.toInt).toMap == expected)
  }

  test("embedding_centroid: n equals label count, dims equal vector length") {
    val e = Tables.t(spark, sf, "embeddings").cache()
    val dims = e.select(size(col("embedding"))).distinct()
      .collect().map(_.getInt(0))
    assert(dims.length == 1)
    val perLabel = e.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rows = Curation.embeddingCentroid(spark, sf).collect()
    assert(rows.length == perLabel.size * dims.head)
    rows.foreach { r =>
      assert(r.getLong(2) == perLabel(r.getInt(0)))
      assert(r.getInt(1) >= 0 && r.getInt(1) < dims.head)
    }
  }

  test("text_compression_ratio separates repetitive from diverse text") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.GraftBridge
    val defLen = (c: org.apache.spark.sql.Column) => GraftBridge.column(
      graft.functions.DeflateLength(GraftBridge.expression(c)))
    val docs = Seq(
      ("rep", "spam " * 200),
      ("div", (0 until 200).map(i => s"w${i * 7919 % 977}x$i").mkString(" "))
    ).toDF("k", "text")
      .select(col("k"), (defLen(col("text")).cast("double") /
        octet_length(col("text"))).as("ratio"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(docs("rep") < 0.1, docs.toString)   // boilerplate compresses away
    assert(docs("div") > docs("rep") * 3, docs.toString)
    // deterministic across evaluations (fixed level, bundled zlib)
    val again = graft.llm.TextStats.textDeflateRatio(spark, sf)
      .agg(sum(col("deflate_len"))).head().getLong(0)
    val again2 = graft.llm.TextStats.textDeflateRatio(spark, sf)
      .agg(sum(col("deflate_len"))).head().getLong(0)
    assert(again == again2)
    // the oracled entropy estimate ranks the same tails: a repetitive
    // doc's H0/8 floor sits below a diverse doc's
    val est = graft.llm.TextStats.textCompressionRatio(spark, sf)
      .agg(min(col("est_ratio")), max(col("est_ratio"))).head()
    assert(est.getDouble(0) > 0.0 && est.getDouble(1) <= 1.0, est.toString)
  }

  test("sample_domain_mix: rates cap at 1, smallest source keeps everything, sample is hash-exact") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val srcTokens = docs.groupBy(_._2).view
      .mapValues(_.map(_._3.split(" ", -1).length.toLong).sum).toMap
    val budget = srcTokens.values.min
    def hv(id: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .take(2).map("%02x".format(_)).mkString, 16)
    val expect = docs.collect {
      case (id, src, _)
        if hv(id).toDouble < budget.toDouble / srcTokens(src) * 65536.0 =>
        (id, src)
    }.toSet
    val got = Curation.sampleDomainMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expect)
    // the smallest source has rate exactly 1.0 → all its docs survive
    val minSrc = srcTokens.minBy(_._2)._1
    assert(docs.count(_._2 == minSrc) == got.count(_._2 == minSrc))
    assert(got.size < docs.length) // and at least one other source shrank
  }

  test("sample_weighted: exact A-Res replay picks the identical k-set") {
    import graft.llm.Curation
    // replay Efraimidis–Spirakis locally from the same md5-derived
    // uniforms and token weights; the distributed top-k must select
    // exactly this set (determinism + correctness of the key formula)
    val docs = Tables.t(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def key(id: Long, w: Long): BigDecimal = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      val v = java.lang.Long.parseLong(hex, 16)
      val u = (v.toDouble + 0.5) / 4503599627370496.0
      BigDecimal(math.log(u) / w)
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    }
    val expect = docs
      .map { case (id, text) => (id, text.split(" ", -1).length.toLong) }
      .map { case (id, w) => (id, w, key(id, w)) }
      .sortBy { case (id, _, k) => (k.unary_-, id) } // key desc, id asc
      .take(100).map(_._1).toSet
    val got = Curation.sampleWeighted(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got == expect,
      s"only-spark=${got -- expect} only-replay=${expect -- got}")
  }

  test("sort_zorder: interleaved bits decode back to both dimensions") {
    val rows = graft.queries.SortsSets.sortZorder(spark, sf)
      .limit(500).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (zx, zy, zval) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val dx = (0 until 16).map(i => ((zval >> (2 * i)) & 1L) << i).sum
      val dy = (0 until 16).map(i => ((zval >> (2 * i + 1)) & 1L) << i).sum
      assert(dx == zx && dy == zy)
    }
  }

  test("text_winnowing matches brute-force rightmost-min selection; density in [1/w, 1]") {
    val k = 3
    val w = 4
    val stride = 1000000L
    def gramHash(g: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 10), 16)
    }
    val expected = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .filter(_._2.length >= k + w - 1)
      .map { case (id, toks) =>
        val keys = (0 to toks.length - k).map { i =>
          val h = gramHash(toks.slice(i, i + k).mkString(" "))
          h * stride + (stride - (i + 1))
        }
        val sel = (w - 1 until keys.length)
          .map(j => keys.slice(j - w + 1, j + 1).min).distinct
        val nWin = (keys.length - w + 1).toLong
        (id, nWin, sel.length.toLong,
          BigDecimal(sel.length.toDouble / nWin)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          sel.map(_ / stride).sum,
          sel.map(mk => stride - mk % stride).max)
      }.sortBy(_._1)
    val got = graft.llm.TextStats.textWinnowing(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
    assert(got.length == expected.length)
    for ((g, e) <- got.zip(expected)) assert(g == e, s"got $g expected $e")
    // selection density: every window selects one fingerprint and one
    // fingerprint serves at most w windows
    for ((_, nWin, nFp, density, _, _) <- expected) {
      assert(nFp <= nWin && nFp * w >= nWin,
        s"density out of bounds: $nFp of $nWin windows")
      assert(density >= 1.0 / w - 1e-9 && density <= 1.0 + 1e-9)
    }
  }

  test("privacy_l_diversity: groups cover the corpus; flag is exactly l>=3") {
    val rows = Curation.privacyLDiversity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum == 500L, "group sizes must cover all docs")
    rows.foreach { case (_, _, n, l, diverse) =>
      assert(l <= n, "distinct sensitive values cannot exceed group size")
      assert(diverse == (l >= 3))
    }
    // the gate must be non-vacuous on the fixture: both outcomes occur
    assert(rows.exists(_._5) && rows.exists(!_._5))
  }

  test("sample_neyman_allocation: sums to budget, favors high-variance strata") {
    val rows = Curation.sampleNeymanAllocation(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.map(_._2).sum == 500L, "strata cover the corpus")
    assert(rows.map(_._4).sum == 100L, "allocations must sum to budget")
    rows.foreach { case (src, _, exact, alloc) =>
      // largest-remainder: every allocation within 1 of its real quota
      assert(math.abs(alloc - exact) < 1.0, s"$src: $alloc vs $exact")
      assert(alloc >= 0L)
    }
    // Neyman must deviate from proportional (equal N_h would give 5
    // each): at least one stratum gets a different share
    assert(rows.exists(_._4 != 5L), "allocation degenerated to proportional")
  }

  test("pack_efficiency agrees with pack_sequences' bin layout") {
    val packed = Curation.packSequences(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val eff = Curation.packEfficiency(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    packed.groupBy(_._1).foreach { case (lang, docs) =>
      val (nDocs, total, nBins, nStraddle, fill) = eff(lang)
      assert(nDocs == docs.length.toLong)
      assert(total == docs.map(_._2).sum)
      // bins touched = ceil(total/256) must equal last doc's end bin + 1
      assert(nBins == (total + 255) / 256)
      val straddlers = docs.count { case (_, n, _, off) => off + n > 256 }
      assert(nStraddle == straddlers.toLong, s"$lang straddlers")
      assert(fill > 0.5 && fill <= 1.0, s"$lang fill $fill")
    }
  }

  test("privacy_dp_count: noise is Laplace-bounded, non-degenerate, deterministic") {
    val spark2 = spark
    import spark2.implicits._
    val noisy = Curation.privacyDpCount(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val exact = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy($"lang", $"source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(noisy.length == exact.size)
    // 24-bit seed => |noise| <= ln(2^24) ~= 16.64; mechanism must
    // actually perturb (some group moves by >= 0.1)
    var perturbed = 0
    noisy.foreach { case (lang, src, nNoisy) =>
      val n = exact((lang, src)).toDouble
      assert(math.abs(nNoisy - n) <= 17.0, s"($lang,$src): $nNoisy vs $n")
      if (math.abs(nNoisy - n) >= 0.1) perturbed += 1
    }
    assert(perturbed > noisy.length / 2, "noise should move most groups")
    val again = Curation.privacyDpCount(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(noisy.toSeq == again.toSeq, "seeded noise must be deterministic")
  }

  test("split_group_holdout: no source straddles splits; totals cover the corpus") {
    // the no-leakage invariant: recompute each source's split from the
    // same hash rule and assert it is a FUNCTION of source alone
    val docs = graft.Tables.t(spark, sf, "documents")
      .select(col("source")).collect().map(_.getString(0))
    def splitOf(src: String): String = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(src.getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        dig.take(3).map("%02x".format(_)).mkString, 16)
      if (h < 13421773L) "train" else "holdout"
    }
    val perSource = docs.groupBy(identity).map { case (s0, xs) =>
      (s0, splitOf(s0), xs.length.toLong)
    }.toSeq
    val expected = perSource.groupBy(_._2).map { case (sp, rows) =>
      sp -> (rows.map(_._1).distinct.length.toLong, rows.map(_._3).sum)
    }
    val got = Curation.splitGroupHoldout(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == expected.keySet)
    for ((sp, (nSrc, nDocs)) <- expected)
      assert(got(sp)._1 == nSrc && got(sp)._2 == nDocs,
        s"$sp: got ${got(sp)} expected ($nSrc, $nDocs)")
    // both splits non-empty on the fixture (the 80/20 cut is real)
    assert(got.size == 2)
  }

  test("privacy_contribution_bounding: cap holds and only ever reduces") {
    val rows = Curation.privacyContributionBounding(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    for ((tpe, nUsers, raw, bounded) <- rows) {
      assert(bounded <= raw, s"$tpe: bound increased mass")
      assert(bounded <= nUsers * 3, s"$tpe: cap violated")
      assert(bounded >= nUsers, s"$tpe: every user contributes >= 1")
    }
    // the cap must actually bind somewhere on the fixture
    assert(rows.exists { case (_, _, raw, bounded) => bounded < raw })
  }

  test("privacy audits account for NULL-QI rows (null-safe group joins)") {
    import spark.implicits._
    // round-14 review: groupBy puts NULL-QI docs in their own group,
    // but a null-rejecting equality join back onto the group table
    // made them VANISH from the k-anonymity audit (neither suppressed
    // nor released) and zeroed their cell counts in t-closeness
    // (constant tvd = 0.5). A privacy gate must account for every row.
    val dir = java.nio.file.Files.createTempDirectory("graft_nullqi")
    dir.toFile.deleteOnExit()
    Seq(
      (1L, null.asInstanceOf[String], "web", 150L),
      (2L, null.asInstanceOf[String], "web", 151L),
      (3L, "en", "web", 150L),
      (4L, "en", null.asInstanceOf[String], 10L))
      .toDF("doc_id", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val ka = Curation.privacyKAnonymity(spark, dir.toString).collect()
    // every doc appears exactly once, including both NULL-QI classes
    assert(ka.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L), ka.toSeq)
    // docs 1,2 share the (NULL,web,1) group -> group_n = 2
    assert(ka.filter(r => r.getLong(0) <= 2)
      .forall(_.getAs[Long]("group_n") == 2L))
    val tc = Curation.privacyTCloseness(spark, dir.toString).collect()
    // the NULL-lang group's cell counts must be found (not coalesced
    // to 0): its sources are 100% web vs 75% web/25% NULL overall ->
    // tvd = 0.25 exactly, NOT the degenerate 0.5
    val nullGrp = tc.filter(r => r.isNullAt(0))
    assert(nullGrp.length == 1, tc.toSeq)
    assert(nullGrp.head.getAs[Double]("tvd") == 0.25, nullGrp.head)
  }
}
