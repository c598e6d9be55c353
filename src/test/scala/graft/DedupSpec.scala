package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

/** Scale-shape assertions for the dedup operators: candidate generation
  * must never be all-pairs, and corpus-sized join sides must never carry
  * a broadcast hint (a corpus broadcast OOMs every executor at 100 TB —
  * whether the tiny fixture side gets auto-broadcast by size is the
  * planner's business, the HINT is what must not exist).
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def broadcastHints(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case j: Join =>
        Seq(j.hint.leftHint, j.hint.rightHint).flatten
          .filter(_.strategy.isDefined).map(_.strategy.get.toString)
    }.flatten

  test("simhash banding finds exactly the brute-force Hamming<=3 pairs") {
    val fp = Dedup.simhashFingerprints(spark, sf).cache()
    val a = fp.select(col("doc_id").as("a_id"), col("simhash").as("a_fp"))
    val b = fp.select(col("doc_id").as("b_id"), col("simhash").as("b_fp"))
    // brute force is test-only ground truth (n=500 on the fixture)
    val brute = a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = Dedup.dedupSimhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(brute.nonEmpty, "fixture should contain near-dup pairs")
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size}: banding must be exact for the threshold")
  }

  test("simhash candidate generation is an equi join - no BNLJ/cartesian") {
    val p = physical(Dedup.dedupSimhash(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("embedding-cosine and minhash joins carry no broadcast hints") {
    assert(broadcastHints(Dedup.dedupEmbeddingCosine(spark, sf)).isEmpty)
    assert(broadcastHints(Dedup.dedupFuzzyMinhash(spark, sf)).isEmpty)
  }

  test("supernode-expanded minhash pairs equal the uncontracted form") {
    // the round-15 contraction: dedupFuzzyMinhash now bands GROUPS of
    // identical signatures and expands member pairs in-stage; this
    // pins set equality (ids + estimator values) against the direct
    // doc-level sigPairs it replaced, on the fixture plus a planted
    // exact-duplicate clique that forces multi-member groups
    import spark.implicits._
    val base = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val clique = base.filter(col("doc_id") < 3)
      .crossJoin(spark.range(2).select((col("id") + 800000L).as("k")))
      .select((col("doc_id") * 1000 + col("k")).as("doc_id"), col("text"))
    val docs = base.unionByName(clique)
    val direct = Dedup.sigPairsForTest(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val contracted = Dedup.expandedSigPairsForTest(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(direct.nonEmpty)
    assert(contracted == direct,
      s"contracted=${contracted.size} direct=${direct.size}")
  }

  test("minhash candidate generation has no BNLJ/cartesian either") {
    val p = physical(Dedup.dedupFuzzyMinhash(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("prefix-filtered jaccard == brute force on randomized near-dup corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val vocab = (0 until 400).map(i => s"w$i")
    // clusters of perturbed copies force >0.8 pairs; singletons force
    // misses; sizes 5..30 exercise every prefix length branch
    val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    var id = 0L
    (0 until 25).foreach { c =>
      val n = 5 + rnd.nextInt(26)
      val base = rnd.shuffle(vocab).take(n)
      val copies = 1 + rnd.nextInt(4)
      (0 until copies).foreach { _ =>
        val perturbed = base.map(t =>
          if (rnd.nextInt(20) == 0) vocab(rnd.nextInt(vocab.size)) else t)
        docs += ((id, perturbed.mkString(" "), s"l${c % 3}"))
        id += 1
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_jacprop")
    docs.toSeq.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("prop")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.dedupNgramJaccard(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute force over token SETS, same rounding and threshold
    val sets = docs.map { case (i, t, l) => (i, l, t.split(" ").toSet) }
    val expect = (for {
      (a, la, sa) <- sets; (b, lb, sb) <- sets
      if la == lb && a < b
      inter = (sa & sb).size
      jac = BigDecimal(inter.toDouble / (sa.size + sb.size - inter))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jac > 0.8
    } yield (a, b, jac)).toSet
    assert(got == expect,
      s"missing: ${expect -- got}; extra: ${got -- expect}")
    assert(expect.nonEmpty, "fixture produced no near-dup pairs")
  }

  test("ngram-jaccard df cutoff: inert above the fixture's max df, prunes below") {
    val base = Dedup.dedupNgramJaccard(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // fixture max document frequency is well under 1M: identical output
    val guarded = Dedup.dedupNgramJaccard(spark, sf, maxDf = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == base)
    // an aggressive cutoff may only REMOVE pairs (jaccard can only drop
    // when shared tokens leave the index), never invent them
    val tight = Dedup.dedupNgramJaccard(spark, sf, maxDf = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.subsetOf(base), s"extra pairs: ${tight -- base}")
  }

  test("theta-range join broadcasts the dimension side (supplier)") {
    val p = physical(graft.queries.Joins.joinThetaRange(spark, sf))
    // customer streams, supplier builds: BuildRight on the hinted side
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"), p)
  }

  test("bucketed range join is pure equi joins, same rows as the theta join") {
    val p = physical(graft.queries.Joins.joinRangeBucketed(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    val theta = graft.queries.Joins.joinThetaRange(spark, sf)
      .collect().map(_.toString).sorted
    val bucketed = graft.queries.Joins.joinRangeBucketed(spark, sf)
      .collect().map(_.toString).sorted
    assert(bucketed.sameElements(theta))
  }

  test("cluster assignment is transitive: both ends of every pair share a rep") {
    val reps = Dedup.dedupCluster(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.dedupNgramJaccard(spark, sf)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(reps(a) == reps(b), s"pair ($a,$b) split across clusters")
    }
    // every representative is a member of its own cluster
    reps.values.toSet.foreach { (rep: Long) => assert(reps(rep) == rep) }
  }

  test("fuzzy cluster closes every minhash pair transitively") {
    val reps = Dedup.dedupFuzzyCluster(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.dedupFuzzyMinhash(spark, sf)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(reps(a) == reps(b), s"pair ($a,$b) split across clusters")
    }
    reps.values.toSet.foreach { (rep: Long) => assert(reps(rep) == rep) }
  }

  test("two-phase star CC equals HashMin labels on the fixture graph") {
    val hashMin = Dedup.dedupCluster(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val twoPhase = Dedup.dedupClusterTwophase(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoPhase == hashMin)
  }

  test("two-phase star CC collapses a deep chain (diameter >> rounds)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a 1500-node path graph: diameter 1499 — the adversarial case the
    // scaladoc cites. Both algorithms must still produce one component
    // rooted at 0; the two-phase loop must converge in O(log n)
    // alternations, not O(diameter) (50 is the loop's hard cap, log2 of
    // 1500 is ~11 — assert well under the cap). localFinishEdges = 0
    // forces the DISTRIBUTED loops — this test exists to exercise the
    // alternation machinery, which the local-finish endgame would skip
    // at this size.
    val chain = spark.range(1499)
      .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
    spark.conf.set("spark.graft.cc.localFinishEdges", "0")
    try {
      val t0 = Dedup.twoPhaseLabels(chain)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(t0.size == 1500)
      assert(t0.values.forall(_ == 0L), t0.values.toSet.toString)
      val hm = Dedup.propagateLabels(chain)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(hm == t0)
      // the local-finish endgame (the default at this |E|) must agree
      // with both distributed loops edge-for-edge
      spark.conf.unset("spark.graft.cc.localFinishEdges")
      val local = Dedup.twoPhaseLabels(chain)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == t0)
      val localHm = Dedup.propagateLabels(chain)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(localHm == t0)
    } finally spark.conf.unset("spark.graft.cc.localFinishEdges")
  }

  test("local-finish cut-over mid-loop matches the fully-distributed labels") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // ring + chain + isolated pair: threshold 400 < |E| = 703 forces
    // at least one distributed alternation BEFORE the contracted edge
    // relation drops under the cap and the union-find takes over — the
    // mid-loop handoff path, which must be exact at any cut-over point
    val edges = spark.range(500)
      .select(col("id").as("a_id"), ((col("id") + 1) % 500).as("b_id"))
      .union(spark.range(200)
        .select((col("id") + 1000).as("a_id"), (col("id") + 1001).as("b_id")))
      .union(Seq((5000L, 5001L), (5001L, 5002L), (9000L, 9001L))
        .toDF("a_id", "b_id"))
    spark.conf.set("spark.graft.cc.localFinishEdges", "0")
    val full =
      try Dedup.twoPhaseLabels(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset("spark.graft.cc.localFinishEdges")
    spark.conf.set("spark.graft.cc.localFinishEdges", "400")
    val hybrid =
      try Dedup.twoPhaseLabels(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset("spark.graft.cc.localFinishEdges")
    assert(hybrid == full)
    assert(full.values.toSet == Set(0L, 1000L, 5000L, 9000L))
  }

  test("non-integral id graphs never take the local finish (stay distributed)") {
    import spark.implicits._
    // the union-find works over longs, so string ids must bypass the
    // cut-over (a numeric-string graph would otherwise take the NUMERIC
    // min where the star projection takes the LEXICOGRAPHIC one, and a
    // non-numeric one would crash on the cast) — round-14 review. "9"
    // vs "10" is the discriminating component: lexicographic min is
    // "10", numeric min would be 9.
    val edges = Seq(("9", "10"), ("10", "11"), ("a", "b"))
      .toDF("a_id", "b_id")
    // default threshold (2^20) would trigger the local finish at |E|=3
    // if the eligibility gate were missing
    val tp = Dedup.twoPhaseLabels(edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tp == Map("9" -> "10", "10" -> "10", "11" -> "10",
      "a" -> "a", "b" -> "a"), tp.toString)
    val hm = Dedup.propagateLabels(edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(hm == tp)
  }

  test("NULL-lang docs pair among themselves; NULL-text docs never pair") {
    import spark.implicits._
    // pins the engine's NULL contract, which the DuckDB oracles now
    // encode (round-14 review): xxhash64 SKIPS null inputs, so a NULL
    // lang contributes nothing to the token hashes — two NULL-lang
    // copies of the same text must pair (lang-insensitively among
    // themselves, not with any non-NULL lang), while a NULL text has no
    // token postings at all.
    val dir = java.nio.file.Files.createTempDirectory("graft_nulldocs")
    dir.toFile.deleteOnExit()
    Seq(
      (1L, "alpha beta gamma delta epsilon", null.asInstanceOf[String]),
      (2L, "alpha beta gamma delta epsilon", null.asInstanceOf[String]),
      (3L, "alpha beta gamma delta epsilon", "en"),
      (4L, "alpha beta gamma delta epsilon", "en"),
      (5L, null.asInstanceOf[String], "en"),
      (6L, null.asInstanceOf[String], "en"))
      .toDF("doc_id", "text", "lang")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val pairs = Dedup.dedupNgramJaccard(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)), pairs.toString)
  }

  test("CC loops run identically under reliable checkpointing") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // default path: localCheckpoint (non-replayable lineage — fine in
    // one JVM). Cluster path: spark.graft.checkpointDir switches ckpt()
    // to fault-tolerant checkpoint(); labels must be identical.
    val edges = spark.range(200)
      .select(col("id").as("a_id"), ((col("id") + 7) % 200).as("b_id"))
      .union(Seq((300L, 301L), (301L, 302L)).toDF("a_id", "b_id"))
    // force the distributed loops: this test pins the CHECKPOINT
    // machinery, which the local-finish endgame would skip at this |E|
    spark.conf.set("spark.graft.cc.localFinishEdges", "0")
    val local = Dedup.propagateLabels(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckpt_spec").toString
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      val reliable = Dedup.propagateLabels(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable == local)
      val twoPhase = Dedup.twoPhaseLabels(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(twoPhase == local)
      // the reliable path actually wrote checkpoint data
      assert(java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .findFirst().isPresent, dir)
    } finally {
      spark.conf.unset("spark.graft.checkpointDir")
      spark.conf.unset("spark.graft.cc.localFinishEdges")
    }
  }

  test("containment pairs match brute-force shingle sets; no all-pairs join") {
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    def shingles(toks: Seq[String]): Set[String] =
      if (toks.size < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    val sets = docs.map { case (id, t) => id -> shingles(t) }
    val ids = sets.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
      a = sets(i); b = sets(j)
      shared = (a intersect b).size
      if a.nonEmpty && b.nonEmpty && shared * 4 >= math.min(a.size, b.size)
    } yield (i, j, shared.toLong, a.size.toLong, b.size.toLong)).toSet
    val got = Dedup.dedupContainment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected,
      s"extra=${got diff expected} missing=${expected diff got}")
    // the plan must be an index equi-self-join, never a nested loop
    val p = Dedup.dedupContainment(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
  }

  test("containment df guard: planted hot shingle is evicted, candidate volume stays bounded") {
    // 80 sentinel docs share ONE out-of-vocab trigram (df 80 > cap 64).
    // Unguarded (cap = ∞) they quadratically blow up into C(80,2) =
    // 3160 full-containment pairs on a single shuffle key; the wired
    // guard evicts the hot shingle from the index, so they contribute
    // ZERO pairs and the natural output is byte-identical.
    val guarded = Dedup.dedupContainment(spark, sf).collect()
    val sentinelGuarded = guarded.filter(_.getLong(0) >= 950000000000L)
    assert(sentinelGuarded.isEmpty,
      s"guard failed to evict hot shingle: ${sentinelGuarded.length} pairs")
    val unguarded = Dedup.dedupContainment(spark, sf, Long.MaxValue).collect()
    val sentinelPairs = unguarded.filter(_.getLong(0) >= 950000000000L)
    assert(sentinelPairs.length == 3160,
      s"planted blow-up should be C(80,2)=3160, got ${sentinelPairs.length}")
    // natural pairs are untouched by the guard (max natural df 25 < 64)
    def natural(rs: Array[org.apache.spark.sql.Row]) =
      rs.filter(_.getLong(0) < 950000000000L)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    assert(natural(guarded) == natural(unguarded))
  }

  test("bloom membership: theory invariants hold and probe exactly matches the semi-join truth") {
    val r = Dedup.dedupBloomMembership(spark, sf).collect().head
    // no false negatives + planted member are Bloom-theory guarantees;
    // a red here means the build and probe disagree on keys or bytes
    assert(r.getAs[Boolean]("no_false_negatives"))
    assert(r.getAs[Boolean]("planted_member_detected"))
    assert(r.getAs[Boolean]("fp_below_1pct"))
    // non-vacuous: the planted copy makes at least one true member
    assert(r.getAs[Long]("n_true_members") >= 1L)
    assert(r.getAs[Long]("n_ref") > 0L && r.getAs[Long]("n_corpus") > 0L)
  }

  test("incremental minhash: exact cross dups always flagged, planted copy found") {
    val r = Dedup.dedupIncrementalMinhash(spark, sf).collect().head
    // identical text ⇒ identical signature ⇒ band collision + est 1.0:
    // flagging every exact cross duplicate is theory-guaranteed, and
    // the planted copy of corpus doc 1 makes the check non-vacuous
    assert(r.getAs[Boolean]("exact_cross_flagged"))
    assert(r.getAs[Boolean]("planted_dup_detected"))
    assert(r.getAs[Boolean]("flags_within_batch"))
    assert(r.getAs[Long]("n_exact_cross") >= 1L)
    assert(r.getAs[Long]("n_batch") > 0L && r.getAs[Long]("n_corpus") > 0L)
  }

  test("substring spans match brute-force interval union; plan stays key-shuffled") {
    val k = 5
    val docs = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    // brute-force ground truth: gram -> doc set, then the query's exact
    // island rule (new span when the pos gap exceeds k-1)
    val byGram = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    for ((id, toks) <- docs if toks.length >= k; i <- 0 to toks.length - k)
      byGram.getOrElseUpdate(toks.slice(i, i + k).mkString(" "),
        scala.collection.mutable.Set.empty) += id
    val dupGrams = byGram.collect { case (g, ids) if ids.size >= 2 => g }.toSet
    val expected = docs.flatMap { case (id, toks) =>
      if (toks.length < k) None
      else {
        val pos = (0 to toks.length - k)
          .filter(i => dupGrams(toks.slice(i, i + k).mkString(" ")))
          .map(_ + 1) // 1-based like the query
        if (pos.isEmpty) None
        else {
          val groups = pos.tail.foldLeft(List(List(pos.head))) {
            case (acc @ cur :: rest, p) =>
              if (p - cur.head <= k - 1) (p :: cur) :: rest
              else List(p) :: acc
            case (Nil, p) => List(List(p))
          }
          val spans = groups.map(g => (g.min, g.max + k - 1))
          val dupTokens = spans.map { case (s0, e0) => e0 - s0 + 1 }.sum
          Some((id, spans.size.toLong, dupTokens.toLong,
            spans.map { case (s0, e0) => e0 - s0 + 1 }.max.toLong,
            BigDecimal(dupTokens.toDouble / toks.length)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
      }
    }.sortBy(_._1)
    val df = Dedup.dedupSubstringSpans(spark, sf)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.length == expected.length,
      s"${got.length} docs with spans vs ${expected.length} expected")
    for ((g, e) <- got.zip(expected))
      assert((g._1, g._2, g._3, g._4) == (e._1, e._2, e._3, e._4) &&
        math.abs(g._5 - e._5) < 1e-9, s"got $g expected $e")
    assert(expected.nonEmpty, "fixture must contain cross-doc spans")
    // scale shape: gram join is a key shuffle (no hint, no all-pairs),
    // every window is partitioned by doc
    assert(broadcastHints(df).isEmpty)
    val p = physical(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    import org.apache.spark.sql.execution.window.WindowExec
    df.queryExecution.executedPlan.foreach {
      case w: WindowExec => assert(w.partitionSpec.nonEmpty, w.toString)
      case _ =>
    }
  }

  test("dedup_lsh_calibration: bins cover the pair graph, audits pass, theory exact") {
    val rows = Dedup.dedupLshCalibration(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val expBins = Dedup.dedupPairsMaterialize(spark, sf).collect()
      .map(r => math.floor(r.getDouble(2) * 10) / 10)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => r._1 -> r._2).toMap == expBins,
      "bin counts must partition the exact pair graph")
    rows.foreach { case (bin, _, theo, recallOk, exactAtOne) =>
      val expect = 1.0 - math.pow(1.0 - math.pow(bin, 4), 4)
      assert(math.abs(theo - expect) < 1e-5, s"bin $bin theory")
      assert(recallOk, s"bin $bin: banding under-delivered its recall bound")
      assert(exactAtOne, s"bin $bin: s=1 pair escaped its certain detection")
    }
  }

  test("url canonicalize matches an independent java.net.URI replay") {
    // brute-force replay: derive the same raw URLs, but canonicalize
    // through java.net.URI's parser instead of the query's string
    // algebra — an INDEPENDENT implementation of the same spec
    def md5hex24(s0: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        dig.take(3).map("%02x".format(_)).mkString, 16)
    }
    val docs = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, src) =>
      val h = md5hex24(s"u|$id")
      val raw = new StringBuilder
      raw ++= (if (h % 2 == 0) "http" else "HTTP")
      raw ++= "://"
      if ((h / 2) % 2 == 0) raw ++= "www."
      raw ++= (if ((h / 4) % 2 == 0) src.toUpperCase else src)
      raw ++= ".Example.COM"
      if ((h / 8) % 2 == 0) raw ++= ":80"
      raw ++= s"/docs/${id % 23}"
      if ((h / 16) % 2 == 0) raw ++= "/"
      raw ++= "?"
      if ((h / 128) % 2 == 0) raw ++= s"utm_source=feed${h % 3}&"
      raw ++= (if ((h / 32) % 2 == 0) "a=1&b=2" else "b=2&a=1")
      if ((h / 64) % 2 == 0) raw ++= "#sec1"
      val uri = new java.net.URI(raw.toString)
      val scheme = uri.getScheme.toLowerCase
      val host0 = uri.getHost.toLowerCase // URI drops the port for us
      val host = if (host0.startsWith("www.")) host0.drop(4) else host0
      val path0 = uri.getPath.replaceAll("/+$", "")
      val path = if (path0.isEmpty) "/" else path0
      val params = uri.getQuery.split("&")
        .filterNot(p => p.startsWith("utm") || p.startsWith("gclid=") ||
          p.startsWith("fbclid="))
        .sorted.mkString("&")
      (id, raw.toString, s"$scheme://$host$path?$params")
    }
    val expGroups = expected.groupBy(_._3).map { case (canon, rows) =>
      canon -> (rows.map(_._1).min, rows.length.toLong,
        rows.map(_._2).distinct.length.toLong)
    }
    val got = Dedup.dedupUrlCanonicalize(spark, sf).collect()
      .map(r => r.getString(1) ->
        (r.getLong(0), r.getLong(2), r.getLong(3))).toMap
    assert(got == expGroups,
      s"first diff: ${expGroups.find { case (k, v) => got.get(k) != Some(v) }} " +
        s"extra: ${got.keySet.diff(expGroups.keySet).take(3)}")
    // real dedup happened: variants collapsed into fewer canonical forms
    assert(got.values.exists(_._2 > 1))
  }

  test("stopword ratio matches a per-doc scala replay") {
    val stops = Set("the", "be", "to", "of", "and", "that", "have",
      "with", "it", "is")
    val docs = graft.Tables.t(spark, sf, "documents")
      .select(col("lang"), col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val expected = docs.groupBy(t => (t._1, t._2)).map { case (k, rows) =>
      val perDoc = rows.map { case (_, _, text) =>
        val toks = text.toLowerCase.split(" ", -1).filter(_.nonEmpty)
        (toks.length.toLong, toks.count(stops).toLong)
      }
      val nTok = perDoc.map(_._1).sum
      val nStop = perDoc.map(_._2).sum
      k -> (rows.length.toLong, nTok, nStop,
        perDoc.count { case (t0, s0) => s0 * 25 >= t0 }.toLong,
        BigDecimal(nStop.toDouble / nTok)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = graft.llm.TextStats.textStopwordRatio(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6))).toMap
    assert(got == expected,
      s"first diff: ${expected.find { case (k, v) => got.get(k) != Some(v) }}")
  }
}
