package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (SURVEY.md §4.2 / §7.1 step 7): the
  * optimizations the engine relies on at 100 TB must actually appear in
  * the plans — predicate pushdown into the parquet scan, column pruning,
  * broadcast-hash for dimension joins, TakeOrderedAndProject for top-k,
  * whole-stage codegen on the hot paths.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("scan_project_filter pushes the shipdate predicate into the scan") {
    val p = plan(graft.queries.Scans.scanProjectFilter(spark, sf))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_shipdate"), p)
    // column pruning: only 4 of 11 lineitem columns read
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"),
      readSchema)
  }

  test("sim_search_batch_topk keeps per-probe heaps before the exchange") {
    val p = plan(graft.llm.Similarity.simSearchBatchTopk(spark, sf))
    // one corpus pass for the whole probe batch: probes broadcast...
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    // ...and the rank filter runs as a WindowGroupLimit k-heap
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("source_nested_parquet prunes sibling struct fields and the array") {
    val p = plan(graft.queries.SourceFormats.sourceNestedParquet(spark, sf))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    // nestedSchemaPruning: the struct collapses to exactly its one
    // consumed leaf — no sibling leaves (key, status), no tags array
    assert(readSchema.contains("order:struct<price:double>"), readSchema)
    assert(!readSchema.contains("tags"), readSchema)
  }

  test("dimension join broadcasts (BroadcastHashJoin, no shuffle of nation)") {
    val p = plan(graft.queries.Joins.joinBroadcast(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("orders⋈customer picks a hash join strategy, not nested loop") {
    val p = plan(graft.queries.Joins.joinInnerEqui(spark, sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan(graft.queries.SortsSets.sortLimitTopk(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    // weighted sampling's A-Res selection is the same shape: per-task
    // k-heap on the hash-derived key, never a global sort of the corpus
    val pw = plan(graft.llm.Curation.sampleWeighted(spark, sf))
    assert(pw.contains("TakeOrderedAndProject"), pw)
  }

  test("flagship aggregation is partial+final hash aggregate (map-side combine)") {
    val p = plan(graft.queries.Aggregates.aggHashGroupby(spark, sf))
    // two HashAggregates around one Exchange = partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("Exchange"), p)
  }

  test("per-group top-k applies WindowGroupLimit before the shuffle") {
    val p = plan(graft.queries.Windows.windowTopKPerGroup(spark, sf))
    assert(p.contains("WindowGroupLimit"), p)
    // partial limit must run on the scan side of the exchange
    val partialIdx = p.indexOf("WindowGroupLimit")
    assert(partialIdx >= 0 && p.indexOf("Partial", partialIdx) >= 0, p)
  }

  test("arg-max selections (keep_best, asof_nearest) get WindowGroupLimit") {
    // both operators claim the rn=1 filter becomes a 1-heap per group
    // before the exchange — assert the rewrite actually fires
    val p1 = plan(graft.llm.Dedup.dedupKeepBest(spark, sf))
    assert(p1.contains("WindowGroupLimit"), p1)
    val p2 = plan(graft.queries.Joins.joinAsofNearest(spark, sf))
    assert(p2.contains("WindowGroupLimit"), p2)
  }

  test("dynamic partition pruning fires on a partition-keyed join") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.t(spark, sf, "orders")
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim filter is on a NON-key column, so the surviving partition
    // keys are only known at runtime — static constraint propagation
    // can't prune, a dynamicpruning subquery must
    val dim = Tables.t(spark, sf, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(avg(col("o_totalprice")).as("ap"))
      .filter(col("ap") > 150000.0)
    val joined = fact.join(broadcast(dim), "o_orderpriority")
      .agg(count(lit(1)).as("n"))
    // the scan's PartitionFilters must carry a dynamicpruning subquery —
    // at 100 TB this is what turns a full-table scan into one partition
    val p = joined.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"), p)
    val expected = Tables.t(spark, sf, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(avg(col("o_totalprice")).as("ap"), count(lit(1)).as("n"))
      .filter(col("ap") > 150000.0)
      .agg(sum(col("n"))).head().getLong(0)
    assert(joined.head().getLong(0) == expected)
  }

  test("join_dpp_prune: the oracled key's fact scan carries the runtime IN filter") {
    val p = graft.queries.SourceFormats.joinDppPrune(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"), p)
  }

  test("sim_search_pq_adc never shuffles the corpus") {
    val p = plan(graft.llm.Similarity.simSearchPqAdc(spark, sf))
    // top-10 via heap, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
    // the only exchange is the broadcast of the 1-row ADC table; the
    // corpus path is scan → narrow projection → heap
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("join_scd2_pointintime carries versions by window, zero joins") {
    val p = plan(graft.queries.Joins.joinScd2Pointintime(spark, sf))
    // the stacked-window carry must not plan any join operator at all
    assert(!p.contains("Join"), p)
    // two user-key exchanges: the dim branch's own SCD2 windows, and
    // the union re-shuffle for the carry window (a Union cannot inherit
    // one branch's partitioning); the only other exchange is the
    // presentation sort's range partitioning
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"$exchanges exchanges:\n$p")
  }

  test("join_bloom_prune injects a runtime bloom filter at cluster thresholds") {
    // at fixture statistics Spark rightly prefers broadcast (no bloom
    // needed); simulate cluster-scale stats: force the shuffle join and
    // drop the application-side scan floor so the injection condition
    // is the SELECTIVE dim filter, as it would be at 100 TB
    val overrides = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prev = overrides.keys.map(k => k -> spark.conf.get(k)).toMap
    try {
      overrides.foreach { case (k, v) => spark.conf.set(k, v) }
      val p = plan(graft.queries.Joins.joinBloomPrune(spark, sf))
      // formatted explain renders the injected bloom probe as
      // might_contain(Subquery …, xxhash64(l_orderkey, 42)) on the
      // fact-side Filter above the scan
      assert(p.contains("might_contain"), p)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("jaccard pair generation joins on prefix postings, never all-pairs") {
    // the direct pipeline (maxDf overload): the one-arg query reads the
    // write-once materialized pair parquet since round 5
    val p = plan(graft.llm.Dedup.dedupNgramJaccard(spark, sf, Long.MaxValue))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    // both the candidate self-join and the two verification joins must
    // be equi joins (hash or sort-merge)
    assert(p.contains("Join"), p)
  }

  test("corpus-sized dedup joins shuffle — no corpus broadcast") {
    // at fixture size the optimizer auto-broadcasts from size stats
    // (correct, and gone at scale); disabling the threshold simulates
    // corpus-scale statistics — the plan must then be a shuffle join,
    // proving no explicit broadcast hint pins the corpus side
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val p = plan(graft.llm.Dedup.dedupEmbeddingCosine(spark, sf))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert(!p.contains("BroadcastExchange"), p)
    } finally spark.conf.set(key, prev)
  }

  test("knn join keeps the per-vector top-3 heap before the final shuffle") {
    val p = plan(graft.llm.Similarity.simKnnJoin(spark, sf))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("vector kernels evaluate inside whole-stage codegen") {
    import org.apache.spark.sql.functions._
    val df = Tables.t(spark, sf, "embeddings")
      .select(graft.llm.Similarity.norm2(col("embedding")).as("n"))
      .filter(col("n") > 0)
    val exec = df.queryExecution.executedPlan.toString
    assert(exec.contains("*("), exec) // whole-stage codegen marker
    assert(df.count() > 0)
  }

  test("custom decode expressions constant-fold and stay in codegen") {
    import org.apache.spark.sql.functions._
    // literal input → Catalyst constant-folds the whole chain at plan
    // time, proving TryDecompress/TryUtf8Decode are optimizer-transparent
    val folded = plan(spark.range(1)
      .select(graft.ingest.Codecs.decodePayload(lit("aGVsbG8=")).as("p")))
    assert(folded.contains("hello AS p"), folded)
    // column input → the chain evaluates inside a codegen'd stage
    val df = spark.range(3)
      .select(base64(col("id").cast("string").cast("binary")).as("Data"))
      .select(graft.ingest.Codecs.decodePayload(col("Data")).as("p"))
    val exec = df.queryExecution.executedPlan.toString
    assert(exec.contains("*("), exec) // whole-stage codegen marker
    assert(df.collect().map(_.getString(0)).toSeq == Seq("0", "1", "2"))
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // Spark's InjectRuntimeFilter: when a shuffle join's build side
    // carries a selective predicate, the probe side scan gets a
    // might_contain(bloom_filter_agg(...)) filter — rows that cannot
    // join are dropped BEFORE the exchange. At 100 TB this is the
    // difference between shuffling the whole fact table and shuffling
    // the joining fraction. Local fixture sizes sit under the default
    // thresholds, so the test pins them low; production leaves defaults.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      val dim = Tables.t(spark, sf, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val fact = Tables.t(spark, sf, "orders")
      val joined = fact.join(dim, fact("o_custkey") === dim("c_custkey"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"), opt)
      assert(joined.count() > 0)
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("agg_retention shuffles the corpus once") {
    // one corpus exchange (groupBy user_id); the per-cohort rollup and
    // presentation sort move only #cohorts rows
    val p = plan(graft.queries.Aggregates.aggRetention(spark, sf))
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 3, p)
    assert(!p.contains("Join"), p) // the join-back formulation is gone
  }

  test("merge_upsert_latest keeps per-key latest before the exchange") {
    // rank-1 filter must plan as WindowGroupLimit: each map task drops
    // superseded rows locally, so the merge shuffle carries ~|keys|
    // rows per task, not the full history
    val exec = graft.queries.IngestQueries.mergeUpsertLatest(spark, sf)
      .queryExecution.executedPlan.toString
    assert(exec.contains("WindowGroupLimit"), exec)
    assert(!exec.contains("Join"), exec) // union + window, no join
  }

  test("composite_tpch_q10 takes the top-20 with a heap, nation broadcasts") {
    val exec = graft.queries.Composite.compositeTpchQ10(spark, sf)
      .queryExecution.executedPlan.toString
    assert(exec.contains("TakeOrderedAndProject"), exec)
    assert(exec.contains("BroadcastHashJoin"), exec)
    assert(!exec.contains("CartesianProduct") &&
      !exec.contains("BroadcastNestedLoopJoin"), exec)
  }

  test("sample_domain_mix broadcasts the rate table; the corpus never shuffles") {
    // the per-source rate table (#sources rows) must come back to the
    // corpus as a BroadcastHashJoin; the only corpus-wide exchanges are
    // the rate-aggregate's partial shuffle (#sources rows of output) and
    // the presentation orderBy
    val exec = graft.llm.Curation.sampleDomainMix(spark, sf)
      .queryExecution.executedPlan.toString
    assert(exec.contains("BroadcastHashJoin"), exec)
    assert(!exec.contains("SortMergeJoin"), exec)
    assert(!exec.contains("BroadcastNestedLoopJoin"), exec)
  }

  test("text_repetition is a single stage — no exchange anywhere") {
    // both repetition metrics are computed inside the row (HOFs over
    // the token array), so the operator must not shuffle at all; the
    // only allowed exchange is the presentation orderBy's range shuffle
    val df = graft.llm.Curation.textRepetition(spark, sf)
    val exec = df.queryExecution.executedPlan.toString
    val exchanges = exec.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, exec) // presentation sort only
    assert(!exec.contains("SortMergeJoin") && !exec.contains("HashAggregate"),
      exec)
  }

  test("text_gopher_quality is one projection over the scan — no shuffle") {
    // every Gopher rule is integer arithmetic inside the row; nothing
    // may aggregate or join. Only the presentation orderBy exchanges.
    val df = graft.llm.TextStats.textGopherQuality(spark, sf)
    val exec = df.queryExecution.executedPlan.toString
    val exchanges = exec.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, exec) // presentation sort only
    assert(!exec.contains("Join") && !exec.contains("HashAggregate"), exec)
  }

  test("sample_dsir executes ONE corpus token aggregate (AQE stage reuse)") {
    // the (doc_id, lang, bucket) aggregate feeds both the fit and the
    // score side; it must materialize once and be reused, not
    // recomputed — at 100 TB a recompute would double the only
    // corpus-sized job. Round 15: the shared intermediate is a
    // localCheckpoint (the cache's columnar encode cost 3–8× the rest
    // of the query — tools/DsirAb), so the invariant reads: the final
    // plan contains NO Generate (the token explode ran once, inside
    // the checkpoint materialization) and BOTH consumers scan the
    // checkpointed RDD.
    val df = graft.llm.Curation.sampleDsir(spark, sf)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(!fin.contains("Generate"), fin)
    val rddScans = fin.linesIterator.count(_.contains("Scan ExistingRDD"))
    assert(rddScans >= 2, s"ExistingRDD scan count=$rddScans\n$fin")
  }

  test("merge_into_cdc: full-outer merge reuses the window partitioning") {
    val p = plan(graft.queries.IngestQueries.mergeIntoCdc(spark, sf))
    assert(p.contains("SortMergeJoin FullOuter"), p)
    // rank-1 pushdown on BOTH latest-per-key sides (map-side top-1
    // before the shuffle), and exactly three exchanges total: one per
    // merge side + the presentation sort — the join itself adds none
    assert(p.linesIterator.count(_.matches("""\(\d+\) WindowGroupLimit.*""")) >= 4, p)
    val exchanges = p.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges <= 3, p)
  }

  test("sample_bottom_k is a per-task heap (TakeOrderedAndProject)") {
    val p = plan(graft.llm.Curation.sampleBottomK(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("join_bucketed_colocated: bucketed SMJ with no exchange below the join") {
    val df = graft.queries.Joins.joinBucketedColocated(spark, sf)
    val p = plan(df)
    assert(p.contains("SortMergeJoin"), p)
    // both scans are bucketed on the join key, so the ONLY exchange in
    // the whole plan is the post-join groupBy's — the join itself reads
    // bucket i against bucket i with no shuffle of either side. Count
    // the detail headers ("(n) Exchange") so tree + detail sections
    // aren't double-counted.
    val exchanges = p.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges <= 2, p) // groupBy hash + presentation sort only
    assert(p.contains("SelectedBucketsCount"), p)
  }

  test("sample_temperature windows over post-aggregate rows only") {
    // the single-partition window must sit ABOVE the per-source hash
    // aggregate (bounded rows), never over the raw corpus
    val p = plan(graft.llm.Curation.sampleTemperature(spark, sf))
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("Window"), p)
    val aggIdx = p.indexOf("HashAggregate")
    val winIdx = p.indexOf("Window")
    // formatted explain lists operators leaves-last; the window node
    // prints before the aggregate it consumes
    assert(winIdx < aggIdx, p)
  }

  test("scalar_variant is one projection over the scan — no extra stages") {
    // variant extraction must stay a narrow map (StructsToJsonEvaluator
    // keeps to_json(variant) out of whole-stage codegen, but the plan
    // shape — scan → project → presentation sort — is the contract)
    val df = graft.queries.Scalars.scalarVariant(spark, sf)
    val exec = df.queryExecution.executedPlan.toString
    val exchanges = exec.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, exec) // presentation sort only
    assert(!exec.contains("HashAggregate") && !exec.contains("Join"), exec)
    assert(df.count() > 0)
  }

  test("sf-linear tables (part/supplier) never pin a broadcast side") {
    // part is sf×200k and supplier sf×10k — at the 100 TB design point
    // neither fits an executor, so no composite query may HINT them as
    // the build side (a hint overrides AQE's size check). Simulate
    // cluster-scale statistics with threshold=-1: any BroadcastExchange
    // still in the plan can only come from an explicit hint, and none
    // of those subtrees may scan part or supplier. Fixed-size
    // nation/region hints legitimately survive.
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val qs = Seq(
        graft.queries.Composite.compositePartRevenue(spark, sf),
        graft.queries.Composite.compositeTpchQ14(spark, sf),
        graft.queries.Composite.compositeMarketShare(spark, sf),
        graft.queries.Composite.compositeTpchQ7(spark, sf))
      for (df <- qs) {
        val bcasts = df.queryExecution.sparkPlan.collect {
          case b: BroadcastExchangeExec => b
        }
        for (b <- bcasts) {
          val sub = b.treeString
          assert(!sub.contains("part.parquet") &&
            !sub.contains("supplier.parquet"), sub)
        }
      }
    } finally spark.conf.set(key, prev)
  }

  test("join_interval_overlap: banded recipe equals naive theta join, no BNLJ") {
    import org.apache.spark.sql.functions._
    val banded = graft.queries.Joins.joinIntervalOverlap(spark, sf)
    // plan: candidates must come from an equi join on (block, bucket)
    val p = banded.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    // naive reference: plain theta join on the same interval relations
    val us30d = 30L * 86400 * 1000000L
    val oc = Tables.t(spark, sf, "orders")
      .join(Tables.t(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey").as("k"), col("c_nationkey").as("nk"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("st"))
      .withColumn("en", col("st") + lit(us30d))
    val a = oc.filter(col("k") % 2 === 0)
      .select(col("nk"), col("k").as("a_key"), col("st").as("a_st"),
        col("en").as("a_en"))
    val b = oc.filter(col("k") % 2 === 1)
      .select(col("nk").as("b_nk"), col("k").as("b_key"),
        col("st").as("b_st"), col("en").as("b_en"))
    val naive = a.join(b, col("nk") === col("b_nk") &&
        col("a_st") < col("b_en") && col("b_st") < col("a_en"))
      .groupBy(col("nk"))
      .agg(count(lit(1)).as("n_overlaps"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = graft.queries.Joins.joinIntervalOverlap(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == naive, s"banded=$got naive=$naive")
  }

  test("range-frame queries: every window frame is growing (incremental)") {
    // Sliding RANGE frames are evaluated without retraction — O(rows ×
    // frame) rescans per partition. The trailing-band rewrites
    // (1-hour count/max, 10000-wide price band) must only use
    // unbounded-preceding lower bounds (Spark's incremental
    // UnboundedPrecedingWindowFunctionFrame); the non-subtractable max
    // rides a bucket decomposition with bounded fan-out / as-of lookups
    // instead of a frame.
    val plans = Seq(
      graft.queries.Windows.windowRangeInterval(spark, sf),
      graft.queries.Windows.windowRangeFrame(spark, sf))
      .map(_.queryExecution.executedPlan.toString)
    for (p <- plans) {
      val frames =
        """specifiedwindowframe\((\w+), ([^,]+),""".r.findAllMatchIn(p).toSeq
      assert(frames.nonEmpty, p)
      for (m <- frames)
        assert(m.group(2).startsWith("unboundedpreceding"), m.matched)
    }
  }

  test("window_rolling_median: no window frame at all — bounded day fan-out") {
    val df = graft.queries.Windows.windowRollingMedian(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("specifiedwindowframe"), p)
    // the 7-day fan-out is a Generate (explode) feeding a hash aggregate
    assert(p.contains("Generate") && p.contains("HashAggregate"), p)
  }

  test("empty-partitionBy windows only ever see bounded relations") {
    // The round-7 verdict's scale-killer class: a Window with no
    // partitionBy serializes its whole input through ONE task, so it
    // may only sit above something that bounds cardinality regardless
    // of corpus size — an aggregate over a fixed bucket/partition-id
    // domain (the prefix-sum offsets of the zipWithIndex
    // decomposition) or a limit/top-k head. The four queries below
    // each used to window the raw corpus-growing relation; assert the
    // rewrite holds for every global WindowExec in their plans.
    import org.apache.spark.sql.execution.window.WindowExec
    val dfs = Seq(
      "chunk_batches" -> graft.queries.IngestQueries.chunkBatches(spark, sf),
      "window_rfm" -> graft.queries.Windows.windowRfm(spark, sf),
      "text_vocab_growth" -> graft.llm.TextStats.textVocabGrowth(spark, sf),
      "text_zipf_fit" -> graft.llm.Ranking.textZipfFit(spark, sf),
      "agg_ks_test" -> graft.queries.Aggregates.aggKsTest(spark, sf),
      "agg_auc_rank" -> graft.queries.Aggregates.aggAucRank(spark, sf))
    for ((name, df) <- dfs) {
      val globals = df.queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      for (w <- globals) {
        val sub = w.child.treeString
        assert(sub.contains("HashAggregate") ||
          sub.contains("TakeOrderedAndProject") || sub.contains("Limit"),
          s"$name has a global window over an unbounded input:\n${w.treeString}")
      }
    }
  }

  test("text_js_divergence: no dense source×vocab grid — present pairs only") {
    // The zero cells are folded into a closed-form remainder, so the
    // plan must contain no CartesianProduct, and the only nested-loop
    // joins allowed are the house 1-row scalar broadcasts (corpus-N /
    // vocab-N) — never a vocab-sized relation on the broadcast side.
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val df = graft.llm.Ranking.textJsDivergence(spark, sf)
    val exec = df.queryExecution.executedPlan
    assert(!exec.toString.contains("CartesianProduct"), exec.toString)
    val bnljs = exec.collect { case b: BroadcastNestedLoopJoinExec => b }
    for (b <- bnljs) {
      val built = b.buildSide.toString match {
        case s if s.contains("Right") => b.right
        case _                        => b.left
      }
      // scalar aggregates broadcast a single row; a grid build side
      // would carry the token column through
      assert(built.treeString.contains("HashAggregate"), built.treeString)
      assert(!built.output.exists(_.name == "tok"), built.treeString)
    }
  }

  test("sim_search_ivf_pq never shuffles the corpus (IVFADC plan)") {
    val p = plan(graft.llm.Similarity.simSearchIvfPq(spark, sf))
    // cell assignment, residual encode, and ADC are all literal plan
    // state — no join of any kind; top-10 is a TakeOrdered head
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("agg_kmv_distinct keeps the bottom-64 heap before the exchange") {
    val p = plan(graft.queries.Aggregates.aggKmvDistinct(spark, sf))
    // the rank filter must compile to WindowGroupLimit — ≤ k rows per
    // cell per map task is the sketch's mergeability in the plan
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("text_ner_gazetteer broadcasts the dictionary, generates in-scan") {
    val p = plan(graft.llm.TextStats.textNerGazetteer(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Generate"), p) // TokenNGrams inside the scan stage
  }

  test("per-doc top-3 in text_keyword_rake is a WindowGroupLimit heap") {
    val p = plan(graft.llm.TextStats.textKeywordRake(spark, sf))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("privacy_dp_topk: noise table broadcast, per-lang 5-heap") {
    val p = plan(graft.llm.Curation.privacyDpTopk(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("multimodal_phash runs the kernel inside whole-stage codegen") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.GraftBridge
    // the kernel call must not break the codegen span of the scan
    // stage (PhashBits implements doGenCode) — a CodegenFallback here
    // would silently interpret the whole projection
    val df = Tables.t(spark, sf, "documents")
      .select(GraftBridge.column(graft.functions.PhashBits(
        GraftBridge.expression(col("text")))).as("b"))
      .filter(col("b").isNotNull)
    val exec = df.queryExecution.executedPlan.toString
    assert(exec.contains("*("), exec) // whole-stage codegen marker
    assert(df.count() > 0)
  }

  test("scan_agg_pushdown: COUNT/MIN/MAX answered from parquet footers") {
    // the scan itself must report the pushed aggregates — at 100 TB
    // this is a metadata walk instead of a corpus read
    val p = graft.queries.Scans.scanAggPushdown(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedAggregation: [COUNT(*)"), p.take(2000))
    assert(p.contains("MIN(l_orderkey)") && p.contains("MAX(l_quantity)"),
      p.take(2000))
  }

  test("knn edge builder: cell equi-joins only, no nested-loop, no corpus broadcast") {
    // round-13 directive #1 shape pin: the exact cell-pruned build must
    // never regress to an all-pairs corpus broadcast — every join is a
    // hash join (cell/src keys), the only broadcasts are the k-row
    // cellStats aggregate, and both top-5 windows are src-partitioned
    val plan = graft.queries.Graphs.knnBuild(spark, sf).edges
      .queryExecution.sparkPlan
    val s = plan.toString
    assert(!s.contains("BroadcastNestedLoopJoin"), s.take(2000))
    assert(!s.contains("CartesianProduct"), s.take(2000))
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    import org.apache.spark.sql.execution.window.WindowExec
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      windows.map(_.partitionSpec).mkString(","))
    // every EXPLICIT broadcast hint pins the k-row cellStats aggregate,
    // never a corpus relation (the PlanLint invariant-(d) check, shape-
    // exact here; the optimizer may additionally stats-broadcast small
    // FIXTURE relations without a hint — at scale those become shuffle
    // joins on their own, which is exactly why they carry no hint)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, Join}
    val qe = graft.queries.Graphs.knnBuild(spark, sf).edges.queryExecution
    val hinted = qe.optimizedPlan.collect { case j: Join => j }.flatMap { j =>
      Seq((j.hint.leftHint, j.left), (j.hint.rightHint, j.right)).collect {
        case (Some(h), side) if h.strategy.contains(BROADCAST) => side
      }
    }
    assert(hinted.nonEmpty)
    hinted.foreach { side =>
      assert(side.collectFirst { case a: Aggregate => a }.nonEmpty,
        s"hinted broadcast without an aggregate bounder:\n${side.treeString.take(1500)}")
    }
  }
}
