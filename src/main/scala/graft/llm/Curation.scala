package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Corpus-curation operators for training-data pipelines (north-star
  * scope, SURVEY.md §2.2 ⊕ — no reference counterpart; the reference
  * stops at raw ingest, src/function_app.py:302-423).
  *
  * Everything here is the batch shape a 100 TB curation run needs:
  *   - sequence packing and train/holdout splitting are single-window /
  *     single-projection plans (one shuffle or none);
  *   - boilerplate-line removal shuffles 8-byte line hashes, never text;
  *   - decontamination broadcasts the (small) benchmark side and keeps
  *     the corpus side shuffle-free until the final per-doc count.
  */
object Curation {

  /** Tokens per packed training sequence (small to exercise bin
    * boundaries at fixture doc lengths of ~56 tokens). */
  private val PackBudget = 256L

  /** GPT-style concat-and-chunk sequence packing: per language, docs are
    * concatenated in doc_id order and split into fixed `PackBudget`-token
    * bins; a doc starts at its running-token offset, so `bin` and
    * `offset_in_bin` are pure functions of the prefix sum (docs may
    * straddle a boundary — that is the concat-and-chunk contract).
    *
    * One window over `lang` = one shuffle. At 100 TB packing does not
    * need a single global order: partition the corpus into shards
    * (lang ⊗ hash bucket) and pack each shard independently — the same
    * prefix-sum window per shard, embarrassingly parallel. */
  def packSequences(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr(s"cum_before div $PackBudget").as("bin"),
        (col("cum_before") % PackBudget).as("offset_in_bin"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Training-shard manifest — the WebDataset-style shard builder one
    * level above [[packSequences]]: whole documents grouped into shards
    * by a cumulative token budget (docs never split across shards),
    * with per-shard doc count, token mass and boundary doc ids — the
    * manifest a dataloader consumes. shard_id is a pure function of
    * the per-lang prefix sum (integer div), so the assignment is
    * deterministic and mergeable; same shard-per-(lang ⊗ hash-bucket)
    * parallelism note as packSequences at 100 TB. */
  def packShardManifest(s: SparkSession, d: String): DataFrame = {
    val budget = 2048L
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr(s"cum_before div $budget").as("shard_id"))
      .groupBy(col("lang"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("shard_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("shard_id"))
  }

  /** Deterministic hash split into train/validation/test (90/5/5): the
    * bucket is the first 16 bits of md5(doc_id), so membership is a
    * pure per-row function — stable across runs, engines and cluster
    * sizes, and a new document joins a split without reshuffling old
    * ones (the property rand()-based splits lack). No shuffle at all:
    * a single codegen'd projection over the scan. */
  def splitTrainHoldout(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        (expr("conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10)")
          .cast("long") % 100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "validation")
          .otherwise("test"))
      .orderBy(col("doc_id"))

  /** GROUP-aware holdout split — the leakage-safe variant of
    * [[splitTrainHoldout]]: the hash bucket is computed on the SOURCE,
    * not the document, so every document of a source lands in the
    * same split. This is the split that keeps templated near-dups and
    * same-site rewrites from straddling train/eval (per-doc splits
    * leak: the eval set contains near-copies of training docs from
    * the same origin, inflating every metric). ~80/20 by the first
    * 24 md5 bits of the source name; membership is a pure per-row
    * function — stable across runs, engines and cluster sizes.
    *
    * Scale shape: the split assignment is one codegen'd projection;
    * the report is one map-side-combined aggregate to the 2-row split
    * space. CurationSpec asserts the no-straddle invariant (every
    * source appears in exactly one split). */
  def splitGroupHoldout(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("split",
        when(expr(
          "conv(substring(md5(source), 1, 6), 16, 10)").cast("long")
          < 13421773L, "train").otherwise("holdout"))
      .groupBy(col("split"))
      .agg(count_distinct(col("source")).as("n_sources"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("split"))

  /** Per-user contribution bounding — the step DP aggregation
    * REQUIRES before any noise calibration: the sensitivity of a
    * count to one user is however many rows that user contributed, so
    * an unbounded count cannot be privatized at all. Cap each user's
    * contribution per event type at k=3 (LEAST(c, 3) on the per-user
    * counts — at 100 TB this is the per-user reservoir/limit the
    * ingest pipeline applies); report raw vs bounded totals and the
    * mass the cap removed. Pairs with [[privacyDpCount]], whose
    * Laplace(1/ε) calibration is only valid AFTER this bound holds.
    *
    * All integer: per-(type, user) counts, integer LEAST, exact sums
    * to the bounded type space; one closing double division for the
    * retained fraction. Two map-side-combined aggregates, nothing
    * corpus-sized past the first. */
  def privacyContributionBounding(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("c")).as("n_raw"),
        sum(least(col("c"), lit(3L))).as("n_bounded"))
      .select(col("event_type"), col("n_users"), col("n_raw"),
        col("n_bounded"),
        round(col("n_bounded").cast("double") / col("n_raw"), 6)
          .as("retained_frac"))
      .orderBy(col("event_type"))

  /** C4-style boilerplate-line removal: each doc is segmented into
    * disjoint 4-token lines; a line occurring in more than one distinct
    * document is boilerplate (headers, nav, license blurbs) and is
    * dropped from every doc; survivors are reassembled in order.
    *
    * Scale shape: the document-frequency table groups and joins on
    * xxhash64(line) — 8 bytes shuffle per line, never the text; line
    * strings stay riding the (narrow) postings relation for reassembly.
    * Docs whose every line is boilerplate survive with n_kept = 0. */
  def textDedupLines(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    // cached: dfreq, kept, and totals all consume this relation —
    // uncached, Spark re-ran the corpus scan + line explode + hash
    // three times per run (round-14 review; sampleDsir's cached shared
    // explode is the in-file precedent). At deployment scale this is
    // the line-postings table every pass reads.
    val lines = docs
      .select(col("doc_id"),
        posexplode(expr(
          """transform(sequence(0, cast(ceil(size(toks) / 4.0) as int) - 1),
            |          i -> array_join(slice(toks, i * 4 + 1, 4), ' '))"""
            .stripMargin)).as(Seq("pos", "line")))
      .withColumn("h", xxhash64(col("line")))
      .cache()
    // Collision assumption (same as Dedup.scala's xxhash64 grouping
    // keys): two DISTINCT lines sharing a 64-bit hash would merge their
    // document frequencies and could drop a genuinely unique line. At
    // n lines the collision probability is ~n^2/2^65 — under 1e-6 up to
    // ~10^9 distinct lines — accepted for the 8-bytes-per-line shuffle.
    val dfreq = lines.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val kept = lines.join(dfreq, "h").filter(col("df") <= 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), " ")).as("clean_md5"))
    val totals = lines.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"))
    totals.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_md5"), md5(lit(""))).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** Benchmark decontamination: flag corpus docs sharing any 4-token
    * shingle with the held-out benchmark set (here: doc_id % 50 == 0
    * plays the benchmark). Per-doc shingles are dedup'd INSIDE the row
    * (array_distinct before explode — no shuffle spent on it), and the
    * benchmark side is broadcast: eval sets are MBs even when the corpus
    * is 100 TB, so the corpus never shuffles for the join; only the
    * contaminated survivors shuffle for the per-doc count. Production
    * uses 8-13-token shingles; the fixture's ~40-word vocabulary makes
    * 4 the size that actually produces collisions to count. */
  def textContamination(s: SparkSession, d: String): DataFrame = {
    val sh = t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 4)
      .select(col("doc_id"),
        explode(expr(
          """array_distinct(transform(sequence(1, size(toks) - 3),
            |                i -> array_join(slice(toks, i, 4), ' ')))"""
            .stripMargin)).as("g"))
    val bench = sh.filter(col("doc_id") % 50 === 0)
      .select(col("g")).distinct()
    sh.filter(col("doc_id") % 50 =!= 0)
      .join(broadcast(bench), "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated_grams"))
      .orderBy(col("doc_id"))
  }

  /** Per-label centroid of the embedding column, as (label, dim) rows.
    * Sums go through DECIMAL so they are order-independent (exact
    * arithmetic — safe under any partial-aggregation schedule); the
    * centroid divides the rounded exact sum as a double. posexplode
    * fans rows ×dims but partial aggregation collapses them map-side,
    * so the shuffle carries one row per (label, dim) per task. */
  def embeddingCentroid(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("double").cast("decimal(20,8)")).as("sum_dec"))
      // + 0.0 after the final ROUNDs: signed-zero normalization (the
      // window_zscore_rolling class; surfaced at sf0.001 by the
      // bit-exact gate, round 6). DECIMAL-rounded dim_sum cannot carry
      // -0.0, but the double division can.
      .select(col("label"), col("dim"), col("n"),
        (round(col("sum_dec"), 4).cast("double") + 0.0).as("dim_sum"),
        (round(round(col("sum_dec"), 6).cast("double") / col("n"), 4) + 0.0)
          .as("centroid"))
      .orderBy(col("label"), col("dim"))

  /** Temperature-scaled source mixing: the sampling weights a
    * multi-source training run draws with (temperature T = 2, i.e.
    * w ∝ p^(1/2)) — upsamples small sources, downsamples large ones.
    * sqrt (not pow) on purpose: IEEE 754 requires sqrt be correctly
    * rounded, so Spark and any oracle engine agree bit-for-bit, while
    * libm pow may differ in the last ulp. The plan is one hash
    * aggregate over the corpus (map-side partial: the shuffle carries
    * one row per source per task) and a single-partition window over
    * the per-source rows — #sources is tiny at any corpus scale, so
    * the window input is post-agg and bounded. Weight sums go through
    * DECIMAL, making the normalization order-independent. */
  def sampleTemperature(s: SparkSession, d: String): DataFrame = {
    val all = Window.partitionBy()
    t(s, d, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .withColumn("p",
        col("n_tokens").cast("double") /
          sum(col("n_tokens")).over(all).cast("double"))
      .withColumn("w", sqrt(col("p")).cast("decimal(20,10)"))
      .withColumn("mix",
        col("w").cast("double") /
          sum(col("w")).over(all).cast("double"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("p"), 6).as("p_natural"),
        round(col("mix"), 6).as("p_mix"),
        round(col("mix") / col("p"), 4).as("up_factor"))
      .orderBy(col("source"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1): fraction
    * of duplicate 4-token lines and the share of the most frequent
    * bigram — high values flag boilerplate/degenerate docs before
    * training. Both metrics are computed INSIDE the row with
    * higher-order functions over the token array: the whole operator is
    * one codegen'd projection — zero shuffles, embarrassingly parallel
    * at 100 TB (the per-row work is O(tokens²) on distinct bigrams,
    * bounded by document length, not corpus size). */
  def textRepetition(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("lines", expr(
        """transform(sequence(0, cast(ceil(size(toks) / 4.0) as int) - 1),
          |          i -> array_join(slice(toks, i * 4 + 1, 4), ' '))"""
          .stripMargin))
      // guard: sequence(1, 0) is DESCENDING in Spark (never empty), so a
      // 1-token doc must short-circuit to an empty bigram array
      .withColumn("bigrams", expr(
        """CASE WHEN size(toks) < 2 THEN array()
          |     ELSE transform(sequence(1, size(toks) - 1),
          |                    i -> concat(toks[i - 1], ' ', toks[i])) END"""
          .stripMargin))
      .select(col("doc_id"),
        size(col("lines")).as("n_lines"),
        round((size(col("lines")) - size(array_distinct(col("lines"))))
          .cast("double") / size(col("lines")), 4).as("dup_line_frac"),
        when(size(col("bigrams")) > 0, round(
          expr("""array_max(transform(array_distinct(bigrams),
                 |  x -> size(filter(bigrams, y -> y = x))))""".stripMargin)
            .cast("double") / size(col("bigrams")), 4))
          .as("top_bigram_frac"))
      .orderBy(col("doc_id"))

  /** Materialized domain-mixture resampling — the row-level companion to
    * [[sampleTemperature]] (which only computes the plan): every source
    * is downsampled to the token mass of the smallest source by
    * deterministic rejection sampling. A doc survives iff
    * `hash_frac(doc_id) < rate(source)`, with the hash fraction taken
    * from the first 16 bits of md5 (portable: DuckDB computes the same
    * md5, so the oracle reproduces the sample bit-for-bit — same trick
    * as split_train_holdout).
    *
    * Scale shape: one map-side-partial aggregate produces #sources rows;
    * the single-partition min-window runs over those bounded rows only
    * (same pattern as [[sampleTemperature]]); the rate table broadcasts
    * back onto the corpus, so the corpus itself is scanned once and
    * never shuffled — accept/reject is a codegen'd filter. */
  def sampleDomainMix(s: SparkSession, d: String): DataFrame = {
    val all = Window.partitionBy()
    val rates = t(s, d, "documents")
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("src_tokens"))
      .withColumn("rate",
        min(col("src_tokens")).over(all).cast("double") / col("src_tokens"))
    t(s, d, "documents")
      .select(col("doc_id"), col("source"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long").as("hv"))
      .join(broadcast(rates), "source")
      .filter(col("hv").cast("double") < col("rate") * lit(65536.0))
      .select(col("doc_id"), col("source"), col("hv"),
        round(col("rate"), 6).as("rate"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** Soft deduplication — instead of dropping duplicate documents,
    * downweight them so each CONTENT (not each copy) contributes one
    * unit of training mass: weight = 1/|cluster| over exact-content
    * clusters (md5 of text). The "weighted training" alternative to
    * hard dedup that recent data-curation work prefers for
    * near-boundary cases. Weight is emitted as an exact decimal
    * (1/n at scale 8, HALF_UP in both engines) so the oracle matches
    * bit-for-bit. One hash aggregate on the 16-byte digest + an
    * equi join back on the same digest key: the text itself never
    * shuffles, and the sizes table is CORPUS-cardinality (one row per
    * distinct content) so it must NOT be broadcast — the shuffle join
    * co-partitions both sides on the digest, and AQE may still pick
    * broadcast at small actual sizes. */
  def sampleDownweightDuplicates(s: SparkSession, d: String): DataFrame = {
    // planted copies (Dedup.withPlantedCopies): the corpus has no
    // natural exact duplicate, so the weight column was constant 1.0
    // at every sf (round-11 degeneracy lint) — the 3 sentinels give
    // the planted group weight 1/4 and the dup path a gate row
    val docs = graft.llm.Dedup.withPlantedCopies(s, d, 3)
      .select(col("doc_id"), md5(col("text")).as("text_md5"))
    val sizes = docs.groupBy(col("text_md5"))
      .agg(count(lit(1)).as("n_copies"))
    docs.join(sizes, "text_md5")
      .select(col("doc_id"), col("text_md5"), col("n_copies"),
        (lit(1).cast("decimal(18,8)") / col("n_copies"))
          .cast("decimal(18,8)").cast("double").as("weight"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic negative sampling for contrastive training: each
    * anchor document draws k=3 pseudo-random negatives via
    * md5(anchor·slot) mod n — with-replacement draws (standard for
    * in-batch negatives), anchor collisions shifted to the next id
    * (total function, no rejection loop). Hash-based draws are (a)
    * reproducible across engines/runs, (b) shard-stable — a worker
    * can regenerate any anchor's negatives without coordination —
    * which is why pipelines prefer them over seeded RNGs. Relies on
    * the fixture's contiguous doc_id 0..n−1 (asserted by count). One
    * narrow map + a 1-row broadcast; no shuffle. */
  def sampleNegativePairs(s: SparkSession, d: String): DataFrame = {
    val n = t(s, d, "documents").agg(count(lit(1)).as("n_docs"))
    t(s, d, "documents")
      .select(col("doc_id"), explode(sequence(lit(1), lit(3))).as("slot"))
      .crossJoin(broadcast(n))
      .withColumn("draw",
        conv(substring(md5(concat(col("doc_id").cast("string"), lit("_"),
          col("slot").cast("string"))), 1, 8), 16, 10).cast("long") %
          col("n_docs"))
      .withColumn("neg_id",
        when(col("draw") === col("doc_id"),
          (col("draw") + 1) % col("n_docs")).otherwise(col("draw")))
      .select(col("doc_id"), col("slot"), col("neg_id"))
      .orderBy(col("doc_id"), col("slot"))
  }

  /** Sliding-window document chunking — the RAG / long-context prep
    * step: each document splits into overlapping token windows
    * (window 32, stride 24 → 8-token overlap; the tail chunk may be
    * shorter). Chunk identity is emitted as the md5 of the re-joined
    * window, so the gate compares content without shipping chunk text,
    * and `chunk_idx = start/stride` is reproducible shard-locally —
    * any worker can re-derive a doc's chunks without coordination.
    * Plan shape: one Generate (explode of the start sequence) + a
    * narrow projection — O(tokens) per doc inside the scan stage, NO
    * shuffle at all; at 100 TB chunking is embarrassingly parallel
    * and this plan keeps it that way. */
  def textChunkSliding(s: SparkSession, d: String): DataFrame = {
    val window = 32
    val stride = 24
    t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0), greatest(col("n") - 1, lit(0)),
          lit(stride))).as("s"))
      .select(col("doc_id"),
        (col("s") / stride).cast("long").as("chunk_idx"),
        least(lit(window), col("n") - col("s")).cast("long")
          .as("n_chunk_tokens"),
        md5(array_join(slice(col("toks"), col("s") + 1, lit(window)), " "))
          .as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Deterministic weighted sampling WITHOUT replacement — the
    * quality/length-weighted corpus subsampling primitive (take k
    * documents with probability proportional to token mass):
    * Efraimidis–Spirakis A-Res (Inf. Proc. Letters 97(5), 2006) — per
    * row draw u ∈ (0,1), rank by key u^(1/w), keep the top k. Ranking
    * by ln(u)/w is the same order (ln is monotone), and u comes from
    * the first 13 hex digits of md5(doc_id) — 52 bits, so (v+0.5)/2^52
    * is EXACT in an IEEE double in both engines, reproducible and
    * shard-stable with no RNG coordination (the same hash-derived
    * discipline as split_train_holdout / sample_negative_pairs). The
    * one transcendental, ln, goes through the round-8 → DECIMAL
    * per-term discipline with a doc_id tiebreak, so both engines pick
    * the identical k-set. Scale shape: narrow map over the scan, then
    * `orderBy.limit(k)` → TakeOrderedAndProject — a per-partition
    * k-heap, NO global sort, nothing shuffled but k rows per task. */
  def sampleWeighted(s: SparkSession, d: String): DataFrame = {
    val k = 100
    t(s, d, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("w"))
      .withColumn("v",
        conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
          .cast("long"))
      .withColumn("u", (col("v").cast("double") + lit(0.5)) /
        lit(4503599627370496.0)) // 2^52 — exact double arithmetic
      .withColumn("es_key",
        round(log(col("u")) / col("w"), 8).cast("decimal(20,8)"))
      .orderBy(col("es_key").desc, col("doc_id")).limit(k)
      // emit as double: the gate bit-compares doubles, while DECIMAL
      // string forms differ across engines (trailing zeros); es_key is
      // strictly negative, so no ±0.0 hazard
      .select(col("doc_id"), col("w"), col("es_key").cast("double").as("es_key"))
      .orderBy(col("doc_id"))
  }

  /** Uniform k-of-N sampling as a bottom-k over a content hash: every
    * doc draws its "random" number as md5(doc_id|source) and the sample
    * is the k smallest. Deterministic (re-runs and engines agree),
    * uniform (md5 is uniform over keys), and — the 100 TB point — the
    * plan is TakeOrderedAndProject: each scan task keeps a local k-row
    * heap and the driver merges partitions' heads. No shuffle of the
    * corpus, no global sort, O(k) driver memory; a `ORDER BY rand()
    * LIMIT k` at 100 TB would be the same plan but non-reproducible,
    * and a full sort would shuffle everything for k rows. */
  def sampleBottomK(s: SparkSession, d: String): DataFrame = {
    val k = 200
    t(s, d, "documents")
      .select(col("doc_id"), col("source"),
        md5(concat_ws("|", col("doc_id"), col("source"))).as("h"))
      .orderBy(col("h"))
      .limit(k)
      .orderBy(col("doc_id"))
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al.,
    * NeurIPS'23): score every raw document by how target-like its
    * hashed-n-gram distribution is, weight = Σ_tokens log
    * p_target(bucket)/p_raw(bucket) with add-1 smoothing over 1024
    * md5-hashed unigram buckets, then keep the top-k. Target here =
    * the `lang='en'` slice, raw = the whole corpus (the paper's
    * formula, fixture-scale feature space).
    *
    * Float discipline (the perplexity/entropy house pattern): each
    * bucket's log-ratio is rounded once to DECIMAL(18,6); per-doc
    * weights are exact decimal sums of integer-count × decimal-term
    * products, so summation order cannot move a bit. The ln argument
    * is a quotient of exactly-representable integer products
    * (< 2^53 at any test sf), so both engines feed ln the identical
    * double.
    *
    * Scale shape — the paper's fit-then-score split collapsed to ONE
    * corpus job: the only corpus-sized work is the (doc_id, lang,
    * bucket) count aggregate, materialized ONCE via localCheckpoint
    * (MEMORY_AND_DISK, spill-safe) so the fit side (bucket totals →
    * 1024-row log-ratio table, broadcast back) and the score side
    * read the SAME result instead of re-running the token explode per
    * consumer — PlanSpec executes the query and asserts the shape (no
    * Generate in the final plan, two scans of the shared RDD).
    * localCheckpoint, not cache (round 15): the InMemoryRelation's
    * columnar encode of the bucket table cost 3–8× the rest of the
    * query at the bench sf (tools/DsirAb interleaved A/B: cache
    * ~8–24 s cpu/run, checkpoint ~1.4–4.9 s, identical results); the
    * checkpoint keeps the single-corpus-pass property that matters at
    * 100 TB without the encode. (Trade-off: a lost executor loses
    * checkpoint blocks instead of recomputing lineage — on a real
    * cluster the intermediate would live on shared storage like the
    * dedup family's materialized tables.) Selection is a
    * TakeOrderedAndProject heap. Nothing corpus-sized is ever
    * broadcast, re-scanned, or globally sorted. */
  def sampleDsir(s: SparkSession, d: String): DataFrame = {
    val k = 100
    val docs = t(s, d, "documents")
    val db = docs
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), col("lang"),
        // compiled md5-prefix bucket (round 15 — the conv/substring/
        // md5-hex chain ran per token; [[graft.functions.Md5Prefix]])
        (org.apache.spark.sql.GraftBridge.column(graft.functions.Md5Prefix(
          org.apache.spark.sql.GraftBridge.expression(col("tok")), 6))
          % 1024L).as("bucket"))
      .groupBy(col("doc_id"), col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val bucketC = db.groupBy(col("bucket")).agg(
      sum(col("n")).as("c_r"),
      sum(when(col("lang") === "en", col("n")).otherwise(0L)).as("c_t"))
    val totals = bucketC.agg(
      sum(col("c_r")).as("n_r"), sum(col("c_t")).as("n_t"))
    val logRatio = bucketC
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        // `1.0` literals parse as DECIMAL in BOTH engines (with
        // different division scales) — cast to DOUBLE explicitly so
        // both compute the identical IEEE quotient before ln
        expr("""CAST(ROUND(ln((CAST(c_t + 1 AS DOUBLE) *
                (n_r + 1024)) /
                (CAST(c_r + 1 AS DOUBLE) * (n_t + 1024))), 6)
                AS DECIMAL(18,6))""")
          .as("lr"))
    db
      .join(broadcast(logRatio), Seq("bucket"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("n").cast("decimal(12,0)") * col("lr")).as("wsum"))
      .orderBy(col("wsum").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("lang"),
        col("wsum").cast("double").as("dsir_w"))
      .orderBy(col("doc_id"))
  }

  /** k-anonymity suppression (Sweeney 2002) over the release quasi-
    * identifiers (lang, source, 100-char length bucket): any document
    * whose quasi-identifier group has fewer than k=5 members is
    * SUPPRESSED before the corpus ships — the privacy gate a
    * training-data release runs after PII redaction (re-identification
    * risk comes from rare attribute combinations, not just explicit
    * identifiers). All-integer decision (group count vs k), bit-exact.
    *
    * Scale shape: the group table is bounded by the quasi-identifier
    * VALUE SPACE (langs × sources × length buckets), not the corpus —
    * one map-side-combined aggregate collapses to it, and it
    * broadcasts back onto the corpus scan. No corpus shuffle at all:
    * two scans, zero exchanges of corpus-sized data. */
  def privacyKAnonymity(s: SparkSession, d: String): DataFrame = {
    val k = 5
    val docs = t(s, d, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        (col("n_chars") / lit(100L)).cast("long").as("len_bucket"))
    val groups = docs.groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("group_n"))
    // NULL-SAFE join keys (<=>): groupBy puts NULL-QI docs in their own
    // group, but a null-rejecting equality join would then drop exactly
    // those rows from the audit — a doc with an unknown lang/source
    // would ship neither suppressed nor released-with-audit (round-14
    // review). A privacy gate must account for every row.
    docs.as("d").join(broadcast(groups).as("g"),
        col("d.lang") <=> col("g.lang") &&
          col("d.source") <=> col("g.source") &&
          col("d.len_bucket") <=> col("g.len_bucket"))
      .select(col("doc_id"), col("d.lang").as("lang"),
        col("d.source").as("source"),
        col("d.len_bucket").as("len_bucket"), col("group_n"),
        (col("group_n") < k).as("suppressed"))
      .orderBy(col("doc_id"))
  }

  /** l-diversity audit (Machanavajjhala et al., ICDE'06) — the gate
    * k-anonymity misses: a group can be k-large yet reveal the
    * sensitive attribute if every member SHARES it (homogeneity
    * attack). Quasi-identifiers here are (lang, 100-char length
    * bucket); `source` plays the sensitive attribute; a group is
    * releasable only when it carries >= l = 3 distinct sensitive
    * values. All-integer decision (exact COUNT DISTINCT vs l),
    * bit-exact.
    *
    * Scale shape: output and all shuffled state are bounded by the
    * quasi-identifier VALUE SPACE (langs x length buckets), never the
    * corpus — one map-side-combined aggregate; the count-distinct is
    * over the bounded sensitive domain, so Spark's two-phase distinct
    * aggregate shuffles (QI, source) pairs, also value-space-bounded. */
  def privacyLDiversity(s: SparkSession, d: String): DataFrame = {
    val l = 3
    t(s, d, "documents")
      .select(col("lang"),
        (col("n_chars") / lit(100L)).cast("long").as("len_bucket"),
        col("source"))
      .groupBy(col("lang"), col("len_bucket"))
      .agg(count(lit(1)).as("group_n"),
        countDistinct(col("source")).as("l_distinct"))
      .select(col("lang"), col("len_bucket"), col("group_n"),
        col("l_distinct"), (col("l_distinct") >= l).as("diverse"))
      .orderBy(col("lang"), col("len_bucket"))
  }

  /** Differentially-private release counts (Dwork 2006): per
    * (lang, source) publication counts + Laplace(1/epsilon) noise,
    * epsilon = 1, sensitivity 1 — the histogram-release mechanism a
    * corpus card ships instead of exact counts. The noise draw is
    * DETERMINISTIC-SEEDED for the gate: u = (md5(group key) 24-bit
    * prefix + 0.5) / 2^24 in (0,1), then the standard inverse-CDF
    * Laplace transform -sgn(u-1/2)·ln(1-2|u-1/2|).
    *
    * PRIVACY CAVEAT (round-8 advice — this seeding is GATE-ONLY, not
    * a privacy mechanism): md5 of the released group key is a public
    * function, so anyone can recompute the noise and subtract it
    * exactly — as shipped the release provides NO differential
    * privacy; only the mechanism's calibration is exercised. Swapping
    * in a secret-keyed PRF fixes that for a SINGLE static release
    * only: per-key deterministic noise reused across repeated or
    * updated releases leaks count deltas exactly (the noise cancels
    * in the difference) and admits no composition accounting. Any
    * real DP deployment must draw FRESH randomness per release and
    * track the accumulated epsilon across releases.
    *
    * Float discipline: both engines derive the SAME 24-bit integer
    * from md5, so +, abs, * and the single ln all see identical IEEE
    * doubles; u can never be exactly 0.5 (the integer would need to
    * be 8388607.5), so the ln argument stays in (0,1]. One ROUND to 6
    * at the end.
    *
    * Scale shape: one map-side-combined aggregate to the bounded
    * (lang x source) value space; the noise is a scalar projection on
    * the group rows. No corpus-sized shuffle, nothing driver-side. */
  def privacyDpCount(s: SparkSession, d: String): DataFrame = {
    val uInt = conv(substring(
      md5(concat_ws("|", col("lang"), col("source"))), 1, 6), 16, 10)
      .cast("long")
    val u = (uInt.cast("double") + lit(0.5)) / lit(16777216.0)
    val noise = when(u >= 0.5, lit(-1.0)).otherwise(lit(1.0)) *
      log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))
    t(s, d, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
      .select(col("lang"), col("source"),
        round(col("n").cast("double") + noise, 6).as("n_noisy"))
      .orderBy(col("lang"), col("source"))
  }

  /** PPS systematic sampling (probability ∝ size, Madow 1949) — the
    * survey design that guarantees big documents proportional
    * representation with ZERO randomness-induced variance within the
    * frame order: lay the docs of each source on a line scaled by
    * n_chars, drop n = 5 equally-spaced picks at the half-open
    * midpoints (2j+1)·W/(2n), and take the doc whose weight interval
    * contains each pick. ALL-INTEGER selection: doc i takes pick j
    * iff 2n·cum_{i−1} < (2j+1)·W ≤ 2n·cum_i — no divisions anywhere.
    * One keyed (source) cumulative window over the corpus, a 5-way
    * fan of the doc table, integer comparisons. */
  def samplePpsSystematic(s: SparkSession, d: String): DataFrame = {
    val bySrc = Window.partitionBy(col("source"))
      .orderBy(col("doc_id")).rowsBetween(Long.MinValue, 0)
    val tot = Window.partitionBy(col("source"))
    t(s, d, "documents")
      .select(col("source"), col("doc_id"), col("n_chars").as("w"))
      .withColumn("cum", sum(col("w")).over(bySrc))
      .withColumn("big_w", sum(col("w")).over(tot))
      .select(col("source"), col("doc_id"), col("w"), col("cum"),
        col("big_w"), explode(sequence(lit(0L), lit(4L))).as("j"))
      .filter(expr("""10 * (cum - w) < (2 * j + 1) * big_w
                      AND (2 * j + 1) * big_w <= 10 * cum"""))
      .select(col("source"), col("j").as("pick"), col("doc_id"),
        col("w"))
      .orderBy(col("source"), col("pick"))
  }

  /** Randomized response (Warner 1965) — the LOCAL-DP mechanism that
    * completes the privacy family ([[privacyDpCount]] /
    * [[privacyDpHistogram]] are central-DP): each row reports its
    * true bit (value ≥ 50) with probability 3/4 and the flipped bit
    * with 1/4 (ε = ln 3 per report), and the aggregator debiases
    * p̂ = (p_obs − 1/4)/(1/2). The coin is the md5-seeded integer
    * h mod 4 < 3 — same GATE-ONLY seeding caveat as the rest of the
    * family (deterministic noise is recomputable; real deployments
    * draw fresh client-side randomness). Derived check: the debiased
    * estimate must land within 0.2 of the true rate (≈3σ of the
    * RR estimator at the smallest fixture's ~240 rows/type), pinned TRUE by the oracle. One conditional
    * aggregate; integer cells; double closures with identical text. */
  def privacyRandomizedResponse(s: SparkSession, d: String): DataFrame = {
    val h = conv(substring(
      md5(concat_ws("|", lit("rr"), col("event_id").cast("string"))),
      1, 6), 16, 10).cast("long") % 4L
    val bit = (col("value") >= lit(50.0)).cast("long")
    t(s, d, "events")
      .select(col("event_type"), bit.as("b"),
        when(h < 3L, bit).otherwise(lit(1L) - bit).as("rep"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("b")).as("k_true"),
        sum(col("rep")).as("k_rep"))
      .select(col("event_type"), col("n"), col("k_rep"),
        expr("""ROUND((CAST(k_rep AS DOUBLE) / CAST(n AS DOUBLE)
                - 0.25e0) / 0.5e0, 6)""").as("p_hat"),
        expr("ROUND(CAST(k_true AS DOUBLE) / CAST(n AS DOUBLE), 6)")
          .as("p_true"),
        expr("""ABS((CAST(k_rep AS DOUBLE) / CAST(n AS DOUBLE)
                - 0.25e0) / 0.5e0
                - CAST(k_true AS DOUBLE) / CAST(n AS DOUBLE))
                < 0.2e0""").as("calibrated"))
      .orderBy(col("event_type"))
  }

  /** Systematic sampling (every k-th element under a total order) —
    * the survey-sampling design that guarantees perfectly even
    * coverage of the ordered frame (vs hash sampling's binomial
    * jitter), used for eval slices that must span the full time
    * range. The global position comes from the distributed
    * total-order machinery ([[graft.queries.Ordered.withGlobalIndex]]
    * — range shuffle + zipWithIndex, never a single-partition
    * window); the step 997 is PRIME so the sample cannot alias
    * against any calendar or generator periodicity in the frame. */
  def sampleSystematic(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
    graft.queries.Ordered
      .withGlobalIndex(ev, Seq(col("ts_us").asc, col("event_id").asc),
        "i")
      .filter(col("i") % 997L === 0L)
      .select(expr("i DIV 997").as("pick"),
        col("event_id"), col("ts_us"))
      .orderBy(col("pick"))
  }

  /** τ-thresholded DP histogram ("stability histogram", Korolova et
    * al. 2009) — the release shape for histograms over UNKNOWN key
    * domains, where releasing an unperturbed support set already
    * leaks membership: add Laplace noise to every (event_type,
    * value-bucket) count, then release only cells whose NOISY count
    * clears τ = 10 (suppressed cells vanish, so rare combinations
    * never appear in the release). Same GATE-ONLY seeded-noise caveat
    * as [[privacyDpCount]] — md5-of-key noise is recomputable and
    * per-release-reused; real deployments need fresh randomness and
    * composition accounting. One hash aggregate to the bounded
    * (type × bucket) space; the noise and threshold are per-cell
    * scalars — no second shuffle. */
  def privacyDpHistogram(s: SparkSession, d: String): DataFrame = {
    val uInt = conv(substring(
      md5(concat_ws("|", lit("dph"), col("event_type"),
        col("bucket").cast("string"))), 1, 6), 16, 10).cast("long")
    val u = (uInt.cast("double") + lit(0.5)) / lit(16777216.0)
    val noise = when(u >= 0.5, lit(-1.0)).otherwise(lit(1.0)) *
      log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))
    t(s, d, "events")
      .select(col("event_type"),
        floor(col("value") / lit(5.0)).cast("long").as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("bucket"),
        round(col("n").cast("double") + noise, 6).as("n_noisy"))
      .filter(col("n_noisy") > lit(10.0))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** Neyman-optimal stratified-sampling allocation (Neyman 1934) —
    * the survey-sampling design for "how many docs should each source
    * contribute to a budget-n eval sample": n_h ∝ N_h·σ_h, which
    * minimizes the estimator variance at fixed budget (high-variance
    * sources get more slots than proportional allocation would give).
    * Integerization by largest-remainder so allocations sum EXACTLY
    * to the budget.
    *
    * Float discipline: N_h·σ_h = sqrt(N_h·Σx² − (Σx)²) — a
    * correctly-rounded sqrt of an EXACT integer — rounded once to
    * DECIMAL(18,6) so the cross-strata total is an exact decimal sum
    * (a double Σ over strata would be summation-order-dependent);
    * each quota is then one identical double expression, and floor/
    * fraction/rank decisions compare identically-derived doubles with
    * a source-name tiebreak.
    *
    * Scale shape: one map-side-combined aggregate to the bounded
    * source space; every window after it runs over |sources| rows
    * (the empty-partitionBy windows sit above the aggregate — the
    * PlanSpec class invariant). */
  def sampleNeymanAllocation(s: SparkSession, d: String): DataFrame = {
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_h"),
        sum(col("n_chars")).as("sx"),
        sum(col("n_chars") * col("n_chars")).as("sxx"))
      .withColumn("w6", expr(
        "CAST(ROUND(sqrt(CAST(n_h * sxx - sx * sx AS DOUBLE)), 6) AS DECIMAL(18,6))"))
      .withColumn("t6", sum(col("w6")).over(all))
      .withColumn("q", expr(
        "CAST(w6 AS DOUBLE) * 100.0 / CAST(t6 AS DOUBLE)"))
      .withColumn("base", floor(col("q")))
      .withColumn("frac", col("q") - floor(col("q")))
      .withColumn("rem", lit(100L) - sum(col("base")).over(all))
      .withColumn("rk", row_number().over(Window.partitionBy()
        .orderBy(col("frac").desc, col("source"))))
      .select(col("source"), col("n_h"),
        round(col("q"), 6).as("alloc_exact"),
        (col("base") + when(col("rk") <= col("rem"), 1L).otherwise(0L))
          .as("n_alloc"))
      .orderBy(col("source"))
  }

  /** Packing-efficiency diagnostic over [[packSequences]]'s
    * concat-and-chunk layout: per language, how full the
    * `PackBudget`-token bins are (fill = tokens/capacity — the
    * padding waste a dataloader pays) and how many documents straddle
    * a bin boundary (the attention-mask pollution concat-and-chunk
    * accepts). All integers from the SAME per-lang prefix sum
    * packSequences uses (a doc straddles iff offset + n_tokens >
    * budget), one rounded ratio at the end. One window + one
    * aggregate; same shard-parallel note as packSequences at 100 TB. */
  def packEfficiency(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("cum_before") % PackBudget + col("n_tokens")
          > PackBudget, 1L).otherwise(0L)).as("n_straddlers"))
      .withColumn("n_bins",
        expr(s"(total_tokens + ${PackBudget - 1}) div $PackBudget"))
      .select(col("lang"), col("n_docs"), col("total_tokens"),
        col("n_bins"), col("n_straddlers"),
        expr(s"""ROUND(CAST(total_tokens AS DOUBLE) /
                 (CAST(n_bins AS DOUBLE) * $PackBudget), 4)""")
          .as("fill_pct"))
      .orderBy(col("lang"))
  }

  /** Keyed pseudonymization with referential integrity — the GDPR
    * de-identification shape [[graft.llm.TextStats.textPiiRedact]]'s
    * destructive masking can't serve: every user_id maps to a STABLE
    * surrogate (md5 under a pipeline secret), so joins and per-user
    * aggregates still work on the pseudonymized output while the raw
    * id never leaves the boundary. The gate proves the integrity
    * property itself: grouping EVENTS by pseudonym must reproduce
    * exactly the per-user counts and value masses of grouping by the
    * raw id (count distinct pseudonyms = count distinct users — no
    * collisions at fixture scale — and the (n_events, value_mass)
    * multiset is preserved, compared via an order-independent
    * checksum of the per-pseudonym aggregate rows).
    *
    * The secret is a fixture literal here; production keys live in a
    * KMS and rotate — and as with [[privacyDpCount]], an UNKEYED hash
    * would be re-computable by anyone holding the id space, i.e. no
    * pseudonymization at all (documented, same caveat class). One
    * hash aggregate over the scan; pseudonyms are a projection. */
  def privacyPseudonymize(s: SparkSession, d: String): DataFrame = {
    val perP = t(s, d, "events")
      .select(md5(concat(lit("graft-secret-v1|"),
        col("user_id").cast("string"))).as("pseud"),
        col("value").cast("decimal(18,4)").as("v"))
      .groupBy(col("pseud"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("v")).as("mass"))
    perP.agg(
      count(lit(1)).as("n_pseudonyms"),
      sum(col("n_events")).as("n_events_total"),
      round(sum(col("mass")), 2).cast("double").as("value_mass_total"),
      sum(expr("""CAST(conv(substring(md5(concat_ws('|', pseud,
        |CAST(n_events AS STRING),
        |CAST(CAST(mass AS DECIMAL(18,4)) AS STRING))), 1, 6), 16, 10)
        |AS BIGINT)""".stripMargin.replace("\n", " ")))
        .as("rows_checksum"))
  }

  /** Stratified fixed-size sample: exactly k docs per language by
    * deterministic md5 priority — the eval-set construction shape
    * (fixed per-stratum budget, reproducible across runs), the
    * complement of [[sampleHashStratified]]'s Bernoulli fractions.
    *
    * Scale shape: a stratum can be most of a 100 TB corpus, so a
    * single window PARTITION BY lang would funnel the corpus into
    * |langs| tasks (the skew analogue of the banned global window).
    * Instead the per-stratum top-k decomposes: phase 1 takes the
    * per-(lang, 32-bucket) top-k (32× the parallelism, bounded 32·k
    * rows out per stratum — the global top-k of a stratum is provably
    * contained in the union of its buckets' top-ks); phase 2 re-ranks
    * only those ≤32·k survivors per stratum. The oracle replays the
    * single-window definition — same rows by construction. */
  def sampleStratifiedFixedK(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 20
    val pri = conv(substring(md5(concat(lit("strat"),
      col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
    val phase1 = Window
      .partitionBy(col("lang"), pmod(col("doc_id"), lit(32)))
      .orderBy(col("pri"), col("doc_id"))
    val phase2 = Window.partitionBy(col("lang"))
      .orderBy(col("pri"), col("doc_id"))
    t(s, d, "documents")
      .select(col("doc_id"), col("lang"), pri.as("pri"))
      .withColumn("rn1", row_number().over(phase1))
      .filter(col("rn1") <= k)
      .withColumn("rn", row_number().over(phase2))
      .filter(col("rn") <= k)
      .select(col("lang"), col("rn"), col("doc_id"))
      .orderBy(col("lang"), col("rn"))
  }

  /** t-closeness audit (Li et al., ICDE'07) — the release gate
    * [[privacyLDiversity]] misses: a group can hold l distinct sensitive
    * values yet still leak if its DISTRIBUTION over them differs sharply
    * from the corpus-wide one (skewness attack). Quasi-identifiers are
    * (lang, 100-char length bucket); `source` is the sensitive
    * attribute; the distance is total variation
    * TVD_g = Σ_v |c_gv/n_g − c_v/N| / 2, and a group releases only when
    * TVD ≤ t = 0.25. Both the distance NUMERATOR (Σ_v |c_gv·N − c_v·n_g|,
    * cross-multiplied) and the release decision (2·num ≤ n_g·N ⟺
    * num/(2·n_g·N) ≤ 1/4) are exact integers — no float ever decides a
    * release. The reported tvd double is display-only (one closing
    * expression).
    *
    * Scale shape: every relation after the first aggregate is bounded
    * by the QI × sensitive VALUE SPACE (langs × buckets × sources),
    * never the corpus; the dense grid comes from a cross join of two
    * value-space-bounded aggregates. One corpus pass total. */
  def privacyTCloseness(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("lang"),
        (col("n_chars") / lit(100L)).cast("long").as("len_bucket"),
        col("source"))
    val cell = docs.groupBy(col("lang"), col("len_bucket"), col("source"))
      .agg(count(lit(1)).as("c_gv"))
    val grp = docs.groupBy(col("lang"), col("len_bucket"))
      .agg(count(lit(1)).as("n_g"))
    val glob = docs.groupBy(col("source")).agg(count(lit(1)).as("c_v"))
    val nTot = docs.agg(count(lit(1)).as("n_tot"))
    // NULL-SAFE left-join keys (<=>): a NULL-QI (or NULL-source) group
    // exists in both grp and cell, but null-rejecting equality would
    // never match them — every such group's c_gv would coalesce to 0
    // and its TVD degenerate to the constant 0.5 in BOTH engines, a
    // wrong-but-gate-green audit row (round-14 review).
    grp.crossJoin(glob).crossJoin(nTot).as("g")
      .join(cell.as("c"),
        col("g.lang") <=> col("c.lang") &&
          col("g.len_bucket") <=> col("c.len_bucket") &&
          col("g.source") <=> col("c.source"), "left")
      .select(col("g.lang").as("lang"),
        col("g.len_bucket").as("len_bucket"), col("n_g"), col("n_tot"),
        abs(coalesce(col("c_gv"), lit(0L)) * col("n_tot") -
          col("c_v") * col("n_g")).as("term"))
      .groupBy(col("lang"), col("len_bucket"))
      .agg(max(col("n_g")).as("group_n"), max(col("n_tot")).as("n_tot"),
        sum(col("term")).as("num"))
      .select(col("lang"), col("len_bucket"), col("group_n"), col("num"),
        expr("""ROUND(CAST(num AS DOUBLE) /
                (2 * CAST(group_n AS DOUBLE) * n_tot), 6)""").as("tvd"),
        (col("num") * 2 <= col("group_n") * col("n_tot"))
          .as("releasable"))
      .orderBy(col("lang"), col("len_bucket"))
  }

  /** Effective sample size of the temperature-mixing importance
    * weights (Kong '92; the Kish design-effect form ESS = (Σw)²/Σw²) —
    * the degeneracy gate every importance-weighted pipeline
    * ([[sampleTemperature]], [[sampleDsir]]) should check before
    * trusting reweighted statistics: ESS/n near 1 means the weights
    * barely matter; near 1/n means a handful of examples dominate.
    * Per-document weight = the document's source up-factor (target
    * mix / natural share — the importance ratio of the temperature
    * resample), so Σw and Σw² collapse to SOURCE-level decimal
    * arithmetic: w_src is rounded to DECIMAL once (making every
    * downstream sum order-independent), the corpus contributes one
    * hash aggregate, and the ESS closes in one double expression.
    * sqrt (not pow) per the [[sampleTemperature]] IEEE note. */
  def aggWeightEss(s: SparkSession, d: String): DataFrame = {
    val all = Window.partitionBy()
    t(s, d, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .withColumn("p",
        col("n_tokens").cast("double") /
          sum(col("n_tokens")).over(all).cast("double"))
      .withColumn("wt", sqrt(col("p")).cast("decimal(20,10)"))
      .withColumn("mix",
        col("wt").cast("double") /
          sum(col("wt")).over(all).cast("double"))
      .withColumn("w", expr("CAST(ROUND(mix / p, 6) AS DECIMAL(15,6))"))
      .agg(sum(col("n_docs")).as("n"),
        count(lit(1)).as("n_sources"),
        sum(expr("CAST(n_docs AS DECIMAL(19,0)) * CAST(w AS DECIMAL(19,6))"))
          .as("sw"),
        sum(expr("""CAST(n_docs AS DECIMAL(19,0))
                    * CAST(w * w AS DECIMAL(19,12))""")).as("sw2"))
      .select(col("n"), col("n_sources"),
        col("sw").cast("double").as("sum_w"),
        expr("""ROUND(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                / CAST(sw2 AS DOUBLE), 4)""").as("ess"),
        expr("""ROUND(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                / CAST(sw2 AS DOUBLE) / CAST(n AS DOUBLE), 6)""")
          .as("ess_ratio"))
  }

  /** Rendezvous (highest-random-weight) shard routing — the
    * consistent-assignment primitive behind shard-stable data layouts
    * (Thaler & Ravishankar '98; what consistent hashing rings
    * approximate): each document goes to the shard with the highest
    * deterministic weight md5('shard|s|doc'), so adding/removing a
    * shard moves only 1/S of the keys and every worker computes the
    * same routing with NO coordination. Weights are the house
    * cross-engine hash; argmax is a struct-max over the S=5 bounded
    * shard set inside the scan (one codegen'd projection, zero
    * shuffles before the 5-group summary). Output: per-shard doc
    * count + key range — the balance audit a routing layer alerts
    * on. */
  def sampleRendezvousShard(s: SparkSession, d: String): DataFrame = {
    val shards = (0 until 5).map { i =>
      struct(
        expr(s"""CAST(conv(substring(md5(concat('shard|$i|',
                 CAST(doc_id AS STRING))), 1, 12), 16, 10) AS BIGINT)""")
          .as("w"),
        lit(i).as("shard"))
    }
    t(s, d, "documents")
      .select(col("doc_id"),
        array_max(array(shards: _*)).getField("shard").as("shard"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("shard"))
  }

  /** Leakage-safe GROUP k-fold assignment + balance audit — the
    * cross-validation split for grouped data ([[splitGroupHoldout]]'s
    * k-way generalization): every user's events land in ONE fold
    * (hash of the group key, never the row), and the audit reports
    * what a CV harness checks before trusting the folds — per-fold
    * user/event volumes and the positive-class base rate (class = the
    * user produced a high-value ≥ 200 event; the purchase outcome
    * saturates at 100%% in this fixture — round-10 degeneracy audit). Deterministic
    * md5 fold draw, exact counts, one closing division per fold.
    * Scale: one user reduction, one ≤k-row aggregate. */
  def sampleGroupKfold(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"),
        max(when(col("value") >= 200.0, 1L).otherwise(0L))
          .as("conv"))
      .withColumn("fold",
        conv(substring(md5(col("user_id").cast("string")), 1, 6), 16, 10)
          .cast("long") % 5L)
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_ev")).as("n_events"),
        sum(col("conv")).as("n_converted"))
      .select(col("fold"), col("n_users"), col("n_events"),
        col("n_converted"),
        expr("ROUND(CAST(n_converted AS DOUBLE) / n_users, 6)")
          .as("conv_rate"))
      .orderBy(col("fold"))

  /** Greedy k-center CORESET selection (Gonzalez 1985; the 2-approx
    * farthest-point heuristic modern data-selection pipelines run to
    * pick a geometrically-covering subset before expensive labeling
    * or training): seed at vec 0, then k−1 = 7 rounds each select the
    * point MAXIMIZING its distance to the chosen set (tiebreak min
    * vec_id), emitting the coverage radius the selection achieved —
    * the monotone non-increasing cover sequence IS the coreset
    * quality curve. Exactness: distances live in the micro-quantized
    * integer space (d² BIGINT, the kmeans_assign discipline), so
    * argmax and ties are exact. Scale: k passes over the corpus, each
    * one scan + a TakeOrdered(1) reduction against LITERAL center
    * vectors riding the plan (bounded model state, one collected row
    * per round) — the corpus never shuffles and never hosts a
    * cross-join; this is the canonical distributed Gonzalez shape.
    * Oracle: the identical greedy unrolled as 7 generated CTE
    * generations ([[graft.llm.TextStats]] trainLoopOracle
    * precedent). */
  def sampleCoresetKcenter(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val e = t(s, d, "embeddings")
      .select(col("vec_id"),
        GraftBridge.column(graft.functions.MicroQuant(
          GraftBridge.expression(col("embedding")))).as("micro"))
    val seed = e.filter(col("vec_id") === 0)
      .select(col("micro")).collect()(0).getSeq[Long](0).toIndexedSeq
    var centers =
      Vector[(Long, Seq[Long], Option[Long])]((0L, seed, None))
    for (_ <- 1 to 7) {
      // compiled kernel per center — the aggregate/zip_with HOF fold
      // paid |centers| x dim interpreted dispatches per row (round 15)
      val cells = centers.map { case (_, cm, _) =>
        GraftBridge.column(graft.functions.VecSqDistLong(
          GraftBridge.expression(col("micro")),
          GraftBridge.expression(typedLit(cm))))
      }
      val chosen = centers.map(_._1)
      val next = e
        .filter(!col("vec_id").isInCollection(chosen))
        .select(col("vec_id"), col("micro"),
          array_min(array(cells: _*)).as("md"))
        .orderBy(col("md").desc, col("vec_id"))
        .limit(1).collect()(0)
      centers = centers :+ ((next.getLong(0),
        next.getSeq[Long](1).toIndexedSeq, Some(next.getLong(2))))
    }
    val rows = centers.zipWithIndex.map { case ((id, _, cov), i) =>
      (i.toLong, id, cov)
    }
    s.createDataFrame(rows)
      .toDF("round", "vec_id", "cover_d2")
      .orderBy(col("round"))
  }

  /** The unrolled DuckDB greedy for [[sampleCoresetKcenter]]. */
  private[graft] lazy val coresetOracle: String = {
    def dist(prev: String, center: String) =
      s"""CAST(list_sum(list_transform(range(1, len(e.m) + 1),
         |    i -> (e.m[i] - c.m[i]) * (e.m[i] - c.m[i])))
         |    AS BIGINT)""".stripMargin
    val gens = (1 to 7).map { t =>
      val prevM = s"m${t - 1}"
      val exclude = (1 until t)
        .map(j => s"SELECT vec_id FROM s$j")
        .foldLeft("SELECT 0 AS vec_id")(_ + " UNION ALL " + _)
      s"""s$t AS (
         |  SELECT vec_id, md FROM $prevM
         |  WHERE vec_id NOT IN ($exclude)
         |  ORDER BY md DESC, vec_id LIMIT 1),
         |m$t AS (
         |  SELECT $prevM.vec_id,
         |    LEAST($prevM.md, ${dist(prevM, s"s$t")}) AS md
         |  FROM $prevM JOIN e ON e.vec_id = $prevM.vec_id
         |  CROSS JOIN (SELECT e2.m FROM e e2
         |    JOIN s$t ON e2.vec_id = s$t.vec_id) c)"""
        .stripMargin
    }.mkString(",\n")
    val rows = (1 to 7).map(t =>
      s"""  SELECT CAST($t AS BIGINT) AS round, vec_id,
         |    md AS cover_d2 FROM s$t""".stripMargin)
      .mkString("\n  UNION ALL\n")
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS m
       |  FROM embeddings),
       |m0 AS (
       |  SELECT e.vec_id,
       |    CAST(list_sum(list_transform(range(1, len(e.m) + 1),
       |      i -> (e.m[i] - c.m[i]) * (e.m[i] - c.m[i])))
       |      AS BIGINT) AS md
       |  FROM e CROSS JOIN (SELECT m FROM e WHERE vec_id = 0) c),
       |$gens
       |SELECT round, vec_id, cover_d2 FROM (
       |  SELECT CAST(0 AS BIGINT) AS round, CAST(0 AS BIGINT) AS vec_id,
       |    CAST(NULL AS BIGINT) AS cover_d2
       |  UNION ALL
       |$rows)
       |ORDER BY round""".stripMargin
  }

  /** Truncated two-sided geometric noise table for [[privacyDpQuantile]]:
    * P(k) ∝ (1/2)^|k| on |k| ≤ 8 (the geometric mechanism of Ghosh,
    * Roughgarden & Sundararajan, STOC'09 — the discrete-Laplace shape,
    * ε = ln 2 before truncation). Integer weights w(k) = 2^(8−|k|) sum
    * to W = 766; a uniform draw u ∈ [0, W) maps to k through exact
    * cumulative bounds in (|k|, k) enumeration order, so BOTH engines
    * run the identical integer bucket lookup — no log/exp ever crosses
    * an engine boundary (the continuous-Laplace dp_count key tolerates
    * float logs because one noise value never flips an argmax; a
    * rank-selection mechanism cannot). */
  private val dpNoiseTable: Seq[(Int, Long, Long)] = {
    val ordered = (-8 to 8).sortBy(k => (math.abs(k), k))
      .map(k => (k, 1L << (8 - math.abs(k))))
    val cum = ordered.scanLeft(0L) { case (acc, (_, w)) => acc + w }
    ordered.zip(cum.zip(cum.tail)).map { case ((k, _), (lo, hi)) =>
      (k, lo, hi)
    }
  }

  /** Quantile release in the SHAPE of the DP geometric mechanism: the
    * TRUE median rank is perturbed by two-sided geometric noise and the
    * value at the noisy rank is released (rank-perturbation is the
    * standard smooth-sensitivity-free quantile mechanism; truncation at
    * ±8 bounds the support). IMPORTANT (round-12 advice): the "noise"
    * here is a DETERMINISTIC function of the public group key
    * (md5(event_type) — the privacy_dp_count seeded-draw discipline),
    * so anyone can recompute and subtract it: this key demonstrates and
    * gate-verifies the mechanism's QUERY SHAPE, it does NOT provide a
    * differential-privacy guarantee. A production deployment draws the
    * geometric noise from a real RNG (one value per release); the plan,
    * the sensitivity analysis, and everything downstream are unchanged
    * — the seeded draw exists purely so the release is deterministic
    * and oracle-comparable.
    *
    * Shape: one grouped count, a 17-row broadcast noise-bucket lookup,
    * one per-type rank window, and a broadcast semi-filter picking ONE
    * row per type. The per-type sort window is the scale ceiling (5
    * types ⇒ 5 sort partitions); at 100 TB the rank selection rides
    * the house distributed-CDF decomposition instead (bucketed
    * prefix-sums over value ranges, the text_vocab_growth recipe) —
    * the mechanism algebra (count → noisy rank → value-at-rank) is
    * unchanged. */
  def privacyDpQuantile(s: SparkSession, d: String): DataFrame = {
    val noiseDf = s.createDataFrame(dpNoiseTable).toDF("k", "lo", "hi")
    val e = t(s, d, "events")
    val byType = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val ranked = e
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("r", row_number().over(byType).cast("long"))
    val pick = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("u",
        conv(substring(md5(col("event_type")), 1, 6), 16, 10)
          .cast("long") % lit(766L))
      .join(broadcast(noiseDf),
        col("u") >= col("lo") && col("u") < col("hi"))
      .select(col("event_type"), col("n"), col("k"),
        greatest(lit(1L),
          least(col("n"), expr("(n + 1) div 2") + col("k"))).as("rp"))
    ranked.join(broadcast(pick), Seq("event_type"))
      .filter(col("r") === col("rp"))
      .select(col("event_type"), col("n"), col("k").as("k_noise"),
        col("value").as("dp_median"))
      .orderBy(col("event_type"))
  }

  /** Top-k release in the SHAPE of the DP report-noisy-max mechanism
    * (Dwork & Roth §3.3, iterated k times): per-(lang, source) doc
    * counts get one two-sided geometric draw each ([[dpNoiseTable]],
    * seeded from md5('topk|'+lang+'|'+source) — a DISTINCT seed prefix
    * from the other dp keys so mechanisms never share randomness), and
    * the top-5 sources per lang by noisy count are released. As with
    * [[privacyDpQuantile]] (round-12 advice): the seeded draw is a
    * deterministic function of public keys — a reproducibility
    * stand-in so the gate can compare the release exactly, NOT a
    * privacy guarantee. Production swaps in real per-release
    * randomness; the query shape and sensitivity story are identical.
    *
    * Shape: one (lang, source) hash aggregate (value-space-bounded),
    * a 17-row broadcast bucket lookup, and a per-lang top-5 rank
    * filter Spark executes as a WindowGroupLimit 5-heap. Noise is
    * O(1) per GROUP, not per row — corpus-size-independent. */
  def privacyDpTopk(s: SparkSession, d: String): DataFrame = {
    val noiseDf = s.createDataFrame(dpNoiseTable).toDF("k", "lo", "hi")
    val noisy = t(s, d, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
      .withColumn("u",
        conv(substring(md5(concat_ws("|",
          lit("topk"), col("lang"), col("source"))), 1, 6), 16, 10)
          .cast("long") % lit(766L))
      .join(broadcast(noiseDf),
        col("u") >= col("lo") && col("u") < col("hi"))
      .select(col("lang"), col("source"),
        (col("n") + col("k")).as("n_noisy"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_noisy").desc, col("source"))
    noisy.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("rk"), col("source"), col("n_noisy"))
      .orderBy(col("lang"), col("rk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "privacy_dp_quantile" -> (privacyDpQuantile _),
    "privacy_dp_topk" -> (privacyDpTopk _),
    "sample_coreset_kcenter" -> (sampleCoresetKcenter _),
    "sample_group_kfold" -> (sampleGroupKfold _),
    "sample_rendezvous_shard" -> (sampleRendezvousShard _),
    "agg_weight_ess" -> (aggWeightEss _),
    "privacy_t_closeness" -> (privacyTCloseness _),
    "privacy_pseudonymize" -> (privacyPseudonymize _),
    "sample_stratified_fixed_k" -> (sampleStratifiedFixedK _),
    "split_group_holdout" -> (splitGroupHoldout _),
    "privacy_contribution_bounding" -> (privacyContributionBounding _),
    "privacy_k_anonymity" -> (privacyKAnonymity _),
    "privacy_l_diversity" -> (privacyLDiversity _),
    "privacy_dp_count" -> (privacyDpCount _),
    "privacy_dp_histogram" -> (privacyDpHistogram _),
    "sample_systematic" -> (sampleSystematic _),
    "privacy_randomized_response" -> (privacyRandomizedResponse _),
    "sample_pps_systematic" -> (samplePpsSystematic _),
    "sample_neyman_allocation" -> (sampleNeymanAllocation _),
    "pack_efficiency" -> (packEfficiency _),
    "sample_dsir" -> (sampleDsir _),
    "sample_bottom_k" -> (sampleBottomK _),
    "sample_weighted" -> (sampleWeighted _),
    "text_chunk_sliding" -> (textChunkSliding _),
    "sample_negative_pairs" -> (sampleNegativePairs _),
    "sample_downweight_duplicates" -> (sampleDownweightDuplicates _),
    "pack_sequences" -> (packSequences _),
    "pack_shard_manifest" -> (packShardManifest _),
    "sample_domain_mix" -> (sampleDomainMix _),
    "split_train_holdout" -> (splitTrainHoldout _),
    "text_dedup_lines" -> (textDedupLines _),
    "text_contamination" -> (textContamination _),
    "embedding_centroid" -> (embeddingCentroid _),
    "sample_temperature" -> (sampleTemperature _),
    "text_repetition" -> (textRepetition _)
  )

  /** VALUES rows rendered from [[dpNoiseTable]] so engine and oracle
    * share ONE noise-bucket definition (a drifting copy here would be
    * exactly the engine+oracle-agree failure the replay specs exist to
    * catch). */
  private val dpNoiseValues: String = dpNoiseTable
    .map { case (k, lo, hi) => s"($k, $lo, $hi)" }.mkString(", ")

  val oracles: Map[String, String] = Map(
    "privacy_dp_topk" ->
      (s"""WITH noise(k, lo, hi) AS (VALUES $dpNoiseValues),
        |c AS (
        |  SELECT lang, source, COUNT(*) AS n,
        |    CAST(('0x' || substring(md5(concat_ws('|', 'topk', lang,
        |      source)), 1, 6)) AS BIGINT) % 766 AS u
        |  FROM documents GROUP BY lang, source),
        |ny AS (
        |  SELECT c.lang, c.source, c.n + noise.k AS n_noisy
        |  FROM c JOIN noise ON c.u >= noise.lo AND c.u < noise.hi),
        |rk AS (
        |  SELECT lang, source, n_noisy,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY n_noisy DESC, source NULLS FIRST) AS rk
        |  FROM ny)
        |SELECT lang, CAST(rk AS INTEGER) AS rk, source, n_noisy
        |FROM rk WHERE rk <= 5
        |ORDER BY lang NULLS FIRST, rk""".stripMargin),
    "privacy_dp_quantile" ->
      (s"""WITH noise(k, lo, hi) AS (VALUES $dpNoiseValues),
        |st AS (
        |  SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
        |pick AS (
        |  SELECT st.event_type, st.n, noise.k,
        |    GREATEST(1, LEAST(st.n, (st.n + 1) // 2 + noise.k)) AS rp
        |  FROM st JOIN noise
        |    ON (CAST(('0x' || substring(md5(st.event_type), 1, 6))
        |          AS BIGINT) % 766) >= noise.lo
        |   AND (CAST(('0x' || substring(md5(st.event_type), 1, 6))
        |          AS BIGINT) % 766) < noise.hi),
        |ranked AS (
        |  SELECT event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS r
        |  FROM events)
        |SELECT p.event_type, p.n, p.k AS k_noise, r.value AS dp_median
        |FROM pick p JOIN ranked r
        |  ON r.event_type = p.event_type AND r.r = p.rp
        |ORDER BY p.event_type NULLS FIRST""".stripMargin),
    "sample_coreset_kcenter" -> coresetOracle,
    // group-keyed md5 fold draw, exact per-fold counts, one division
    "sample_group_kfold" ->
      """WITH u AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
        |    CAST(MAX(CASE WHEN value >= 200.0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS conv
        |  FROM events GROUP BY 1),
        |f AS (
        |  SELECT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
        |    1, 6)) AS BIGINT) % 5 AS fold, n_ev, conv
        |  FROM u)
        |SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(n_ev) AS BIGINT) AS n_events,
        |  CAST(SUM(conv) AS BIGINT) AS n_converted,
        |  ROUND(CAST(CAST(SUM(conv) AS BIGINT) AS DOUBLE) / COUNT(*), 6)
        |    AS conv_rate
        |FROM f GROUP BY 1 ORDER BY fold""".stripMargin,
    // HRW argmax replayed as ROW_NUMBER over the 5-way weight cross
    // join; identical md5 weights; (w DESC, shard DESC) = struct-max
    "sample_rendezvous_shard" ->
      """WITH a AS (
        |  SELECT doc_id, s.shard,
        |    CAST(('0x' || substring(md5('shard|' ||
        |      CAST(s.shard AS VARCHAR) || '|' ||
        |      CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS w
        |  FROM documents
        |  CROSS JOIN (VALUES (0), (1), (2), (3), (4)) s(shard)
        |), r AS (
        |  SELECT doc_id, shard FROM (
        |    SELECT doc_id, shard,
        |      ROW_NUMBER() OVER (PARTITION BY doc_id
        |        ORDER BY w DESC, shard DESC) AS rn
        |    FROM a) WHERE rn = 1
        |)
        |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM r GROUP BY shard ORDER BY shard""".stripMargin,
    // per-source up-factor rounded to DECIMAL once; ESS sums in exact
    // decimal; ONE closing double expression
    "agg_weight_ess" ->
      """WITH a AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |b AS (
        |  SELECT *,
        |    CAST(n_tokens AS DOUBLE) /
        |      CAST(SUM(n_tokens) OVER () AS DOUBLE) AS p
        |  FROM a),
        |c AS (
        |  SELECT *, CAST(sqrt(p) AS DECIMAL(20,10)) AS wt FROM b),
        |m AS (
        |  SELECT *,
        |    CAST(wt AS DOUBLE) / CAST(SUM(wt) OVER () AS DOUBLE) AS mix
        |  FROM c),
        |w AS (
        |  SELECT n_docs,
        |    CAST(ROUND(mix / p, 6) AS DECIMAL(15,6)) AS w
        |  FROM m),
        |agg AS (
        |  SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS n_sources,
        |    SUM(CAST(n_docs AS DECIMAL(19,0))
        |        * CAST(w AS DECIMAL(19,6))) AS sw,
        |    SUM(CAST(n_docs AS DECIMAL(19,0))
        |        * CAST(w * w AS DECIMAL(19,12))) AS sw2
        |  FROM w)
        |SELECT n, n_sources, CAST(sw AS DOUBLE) AS sum_w,
        |  ROUND(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
        |    / CAST(sw2 AS DOUBLE), 4) AS ess,
        |  ROUND(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
        |    / CAST(sw2 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ess_ratio
        |FROM agg""".stripMargin,
    // cross-multiplied integer TVD numerator over the dense QI×sensitive
    // grid; integer release decision (2·num ≤ n_g·N); display-only tvd
    "privacy_t_closeness" ->
      """WITH docs AS (
        |  SELECT lang, n_chars // 100 AS len_bucket, source
        |  FROM documents
        |), cell AS (
        |  SELECT lang, len_bucket, source,
        |    CAST(COUNT(*) AS BIGINT) AS c_gv
        |  FROM docs GROUP BY 1, 2, 3
        |), grp AS (
        |  SELECT lang, len_bucket, CAST(COUNT(*) AS BIGINT) AS n_g
        |  FROM docs GROUP BY 1, 2
        |), gsrc AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS c_v
        |  FROM docs GROUP BY 1
        |), ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM docs),
        |terms AS (
        |  SELECT grp.lang, grp.len_bucket, n_g, n_tot,
        |    ABS(COALESCE(c_gv, 0) * n_tot - c_v * n_g) AS term
        |  FROM grp CROSS JOIN gsrc CROSS JOIN ntot
        |  LEFT JOIN cell ON cell.lang IS NOT DISTINCT FROM grp.lang
        |    AND cell.len_bucket IS NOT DISTINCT FROM grp.len_bucket
        |    AND cell.source IS NOT DISTINCT FROM gsrc.source
        |), g AS (
        |  SELECT lang, len_bucket, MAX(n_g) AS group_n,
        |    MAX(n_tot) AS n_tot, CAST(SUM(term) AS BIGINT) AS num
        |  FROM terms GROUP BY 1, 2
        |)
        |SELECT lang, len_bucket, group_n, num,
        |  ROUND(CAST(num AS DOUBLE) /
        |    (2 * CAST(group_n AS DOUBLE) * n_tot), 6) AS tvd,
        |  num * 2 <= group_n * n_tot AS releasable
        |FROM g ORDER BY lang NULLS FIRST, len_bucket""".stripMargin,
    // the integrity proof: per-pseudonym aggregates reproduce the
    // per-user multiset; order-independent row checksum; decimal
    // stringified at full scale ('1.5000') identically on both engines
    "privacy_pseudonymize" ->
      """WITH p AS (
        |  SELECT md5('graft-secret-v1|' || CAST(user_id AS VARCHAR))
        |      AS pseud,
        |    CAST(value AS DECIMAL(18,4)) AS v
        |  FROM events),
        |g AS (
        |  SELECT pseud, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    SUM(v) AS mass
        |  FROM p GROUP BY pseud)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_pseudonyms,
        |  CAST(SUM(n_events) AS BIGINT) AS n_events_total,
        |  CAST(ROUND(SUM(mass), 2) AS DOUBLE) AS value_mass_total,
        |  CAST(SUM(CAST(('0x' || substring(md5(concat_ws('|', pseud,
        |    CAST(n_events AS VARCHAR),
        |    CAST(CAST(mass AS DECIMAL(18,4)) AS VARCHAR))), 1, 6))
        |    AS BIGINT)) AS BIGINT) AS rows_checksum
        |FROM g""".stripMargin,
    // single-window replay of the two-phase bucketed top-k (identical
    // rows by the containment property); 60-bit md5-prefix priority
    "sample_stratified_fixed_k" ->
      """WITH p AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substring(md5('strat' || CAST(doc_id AS
        |      VARCHAR)), 1, 15)) AS BIGINT) AS pri
        |  FROM documents
        |), r AS (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY pri, doc_id) AS rn
        |  FROM p
        |)
        |SELECT lang, rn, doc_id FROM r
        |WHERE rn <= 20 ORDER BY lang NULLS FIRST, rn""".stripMargin,
    // same 24-bit md5 source bucket; integer counts + exact sums
    "split_group_holdout" ->
      """WITH a AS (
        |  SELECT doc_id, source,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    CASE WHEN CAST(('0x' || substring(md5(source), 1, 6))
        |                AS BIGINT) < 13421773
        |         THEN 'train' ELSE 'holdout' END AS split
        |  FROM documents)
        |SELECT split, COUNT(DISTINCT source) AS n_sources,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        |FROM a GROUP BY split ORDER BY split""".stripMargin,
    // all-integer cap; one closing double division
    "privacy_contribution_bounding" ->
      """WITH c AS (
        |  SELECT event_type, user_id, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, COUNT(*) AS n_users,
        |  CAST(SUM(c) AS BIGINT) AS n_raw,
        |  CAST(SUM(LEAST(c, 3)) AS BIGINT) AS n_bounded,
        |  ROUND(CAST(SUM(LEAST(c, 3)) AS DOUBLE) /
        |        CAST(SUM(c) AS BIGINT), 6) AS retained_frac
        |FROM c GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,
    // same prefix-sum integers as pack_sequences; one rounded ratio
    "pack_efficiency" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT lang, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM d),
        |g AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |    CAST(SUM(CASE WHEN cum_before % 256 + n_tokens > 256
        |         THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
        |  FROM c GROUP BY lang)
        |SELECT lang, n_docs, total_tokens,
        |  (total_tokens + 255) // 256 AS n_bins, n_straddlers,
        |  ROUND(CAST(total_tokens AS DOUBLE) /
        |    (CAST((total_tokens + 255) // 256 AS DOUBLE) * 256), 4)
        |    AS fill_pct
        |FROM g ORDER BY lang NULLS FIRST""".stripMargin,
    // sqrt of exact integers rounded once to DECIMAL(18,6); exact
    // decimal total; identical quota/floor/rank double text
    "sample_neyman_allocation" ->
      """WITH m AS (
        |  SELECT source, COUNT(*) AS n_h, SUM(n_chars) AS sx,
        |    SUM(n_chars * n_chars) AS sxx
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT source, n_h,
        |    CAST(ROUND(sqrt(CAST(n_h * sxx - sx * sx AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS w6
        |  FROM m),
        |q AS (
        |  SELECT source, n_h,
        |    CAST(w6 AS DOUBLE) * 100.0 / CAST(SUM(w6) OVER () AS DOUBLE)
        |      AS q
        |  FROM w),
        |b AS (
        |  SELECT source, n_h, q, CAST(floor(q) AS BIGINT) AS base,
        |    q - floor(q) AS frac
        |  FROM q),
        |r AS (
        |  SELECT source, n_h, q, base, frac,
        |    100 - SUM(base) OVER () AS rem,
        |    ROW_NUMBER() OVER (ORDER BY frac DESC, source NULLS FIRST) AS rk
        |  FROM b)
        |SELECT source, n_h, ROUND(q, 6) AS alloc_exact,
        |  base + CASE WHEN rk <= rem THEN 1 ELSE 0 END AS n_alloc
        |FROM r ORDER BY source NULLS FIRST""".stripMargin,
    "privacy_l_diversity" ->
      """SELECT lang, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
        |  COUNT(*) AS group_n,
        |  COUNT(DISTINCT source) AS l_distinct,
        |  COUNT(DISTINCT source) >= 3 AS diverse
        |FROM documents
        |GROUP BY 1, 2
        |ORDER BY lang NULLS FIRST, len_bucket""".stripMargin,
    // integer interval-containment picks over keyed cumulative
    // weights; 2n = 10 scaling keeps every comparison integral
    "sample_pps_systematic" ->
      """WITH c AS (
        |  SELECT source, doc_id, n_chars AS w,
        |    SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(n_chars) OVER (PARTITION BY source) AS big_w
        |  FROM documents
        |), f AS (
        |  SELECT source, u.j AS pick, doc_id, w
        |  FROM c, LATERAL unnest(range(0, 5)) AS u(j)
        |  WHERE 10 * (cum - w) < (2 * u.j + 1) * big_w
        |    AND (2 * u.j + 1) * big_w <= 10 * cum
        |)
        |SELECT source, CAST(pick AS BIGINT) AS pick, doc_id,
        |  CAST(w AS BIGINT) AS w
        |FROM f ORDER BY source NULLS FIRST, pick""".stripMargin,
    // md5-seeded 3/4-keep coin per row; integer cells; debias and
    // calibration bound close in identical double expressions
    "privacy_randomized_response" ->
      """WITH r AS (
        |  SELECT event_type,
        |    CASE WHEN value >= 50e0 THEN 1 ELSE 0 END AS b,
        |    CASE WHEN CAST(('0x' || substring(md5('rr' || '|' ||
        |        CAST(event_id AS VARCHAR)), 1, 6)) AS BIGINT) % 4 < 3
        |      THEN CASE WHEN value >= 50e0 THEN 1 ELSE 0 END
        |      ELSE 1 - CASE WHEN value >= 50e0 THEN 1 ELSE 0 END
        |    END AS rep
        |  FROM events
        |), g AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(b) AS BIGINT) AS k_true,
        |    CAST(SUM(rep) AS BIGINT) AS k_rep
        |  FROM r GROUP BY 1
        |)
        |SELECT event_type, n, k_rep,
        |  ROUND((CAST(k_rep AS DOUBLE) / CAST(n AS DOUBLE)
        |    - 0.25e0) / 0.5e0, 6) AS p_hat,
        |  ROUND(CAST(k_true AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    AS p_true,
        |  ABS((CAST(k_rep AS DOUBLE) / CAST(n AS DOUBLE)
        |    - 0.25e0) / 0.5e0
        |    - CAST(k_true AS DOUBLE) / CAST(n AS DOUBLE))
        |    < 0.2e0 AS calibrated
        |FROM g ORDER BY event_type NULLS FIRST""".stripMargin,
    // naive global row_number replays the distributed zipWithIndex;
    // prime-step picks, integer DIV sample index
    "sample_systematic" ->
      """WITH r AS (
        |  SELECT event_id, epoch_us(ts) AS ts_us,
        |    ROW_NUMBER() OVER (ORDER BY epoch_us(ts), event_id) - 1 AS i
        |  FROM events
        |)
        |SELECT CAST(i // 997 AS BIGINT) AS pick, event_id, ts_us
        |FROM r WHERE i % 997 = 0 ORDER BY pick""".stripMargin,
    // bounded (type × bucket) aggregate + the dp_count seeded-Laplace
    // expression; τ-threshold on the NOISY count on both engines
    "privacy_dp_histogram" ->
      """WITH g AS (
        |  SELECT event_type,
        |    CAST(floor(value / 5e0) AS BIGINT) AS bucket,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |u AS (
        |  SELECT event_type, bucket, n,
        |    (CAST(CAST(('0x' || substring(md5(concat_ws('|', 'dph', event_type,
        |       CAST(bucket AS VARCHAR))), 1, 6))
        |       AS BIGINT) AS DOUBLE) + 0.5) / 16777216.0 AS u
        |  FROM g),
        |r AS (
        |  SELECT event_type, bucket,
        |    ROUND(CAST(n AS DOUBLE) +
        |      (CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END) *
        |      ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS n_noisy
        |  FROM u)
        |SELECT event_type, bucket, n_noisy FROM r
        |WHERE n_noisy > 10.0
        |ORDER BY event_type NULLS FIRST, bucket""".stripMargin,
    "privacy_dp_count" ->
      """WITH g AS (
        |  SELECT lang, source, COUNT(*) AS n FROM documents
        |  GROUP BY lang, source),
        |u AS (
        |  SELECT lang, source, n,
        |    -- cast to DOUBLE before the + 0.5: bare decimal literals
        |    -- would make this a DECIMAL division with engine-specific
        |    -- scale (the sample_dsir lesson)
        |    (CAST(CAST(('0x' || substring(md5(concat_ws('|', lang, source)), 1, 6))
        |       AS BIGINT) AS DOUBLE) + 0.5) / 16777216.0 AS u
        |  FROM g)
        |SELECT lang, source,
        |  ROUND(CAST(n AS DOUBLE) +
        |    (CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END) *
        |    ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS n_noisy
        |FROM u
        |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin,
    "privacy_k_anonymity" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source,
        |    CAST(n_chars // 100 AS BIGINT) AS len_bucket
        |  FROM documents),
        |g AS (
        |  SELECT lang, source, len_bucket, COUNT(*) AS group_n
        |  FROM d GROUP BY lang, source, len_bucket)
        |SELECT doc_id, d.lang, d.source, d.len_bucket, group_n,
        |  group_n < 5 AS suppressed
        |FROM d JOIN g
        |  ON d.lang IS NOT DISTINCT FROM g.lang
        |  AND d.source IS NOT DISTINCT FROM g.source
        |  AND d.len_bucket IS NOT DISTINCT FROM g.len_bucket
        |ORDER BY doc_id""".stripMargin,
    "sample_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substring(md5(tok), 1, 6)) AS BIGINT) % 1024
        |      AS bucket
        |  FROM toks),
        |rc AS (SELECT bucket, COUNT(*) AS c_r FROM b GROUP BY bucket),
        |tc AS (SELECT bucket, COUNT(*) AS c_t FROM b
        |       WHERE lang = 'en' GROUP BY bucket),
        |nr AS (SELECT COUNT(*) AS n_r FROM b),
        |nt AS (SELECT COUNT(*) AS n_t FROM b WHERE lang = 'en'),
        |lr AS (
        |  SELECT rc.bucket,
        |    CAST(ROUND(ln((CAST(COALESCE(c_t, 0) + 1 AS DOUBLE) *
        |      (n_r + 1024)) /
        |      (CAST(c_r + 1 AS DOUBLE) * (n_t + 1024))), 6)
        |      AS DECIMAL(18,6)) AS lr
        |  FROM rc LEFT JOIN tc ON rc.bucket = tc.bucket, nr, nt),
        |db AS (
        |  SELECT doc_id, lang, bucket, COUNT(*) AS n
        |  FROM b GROUP BY doc_id, lang, bucket),
        |w AS (
        |  SELECT doc_id, lang,
        |    SUM(CAST(n AS DECIMAL(12,0)) * lr) AS wsum
        |  FROM db JOIN lr USING (bucket) GROUP BY doc_id, lang)
        |SELECT * FROM (
        |  SELECT doc_id, lang, CAST(wsum AS DOUBLE) AS dsir_w
        |  FROM w ORDER BY wsum DESC, doc_id LIMIT 100)
        |ORDER BY doc_id""".stripMargin,
    "sample_bottom_k" ->
      """SELECT * FROM (
        |  SELECT doc_id, source,
        |    md5(concat_ws('|', doc_id, source)) AS h
        |  FROM documents ORDER BY h LIMIT 200)
        |ORDER BY doc_id""".stripMargin,
    "sample_weighted" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        |      AS BIGINT) AS v
        |  FROM documents),
        |keyed AS (
        |  SELECT doc_id, w,
        |    CAST(ROUND(ln((CAST(v AS DOUBLE) + 0.5) / 4503599627370496.0)
        |      / w, 8) AS DECIMAL(20,8)) AS es_key
        |  FROM b),
        |top AS (
        |  SELECT doc_id, w, es_key FROM keyed
        |  ORDER BY es_key DESC, doc_id LIMIT 100)
        |SELECT doc_id, w, CAST(es_key AS DOUBLE) AS es_key
        |FROM top ORDER BY doc_id""".stripMargin,
    "text_chunk_sliding" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents
        |), st AS (
        |  SELECT doc_id, t, n, UNNEST(range(0, greatest(n, 1), 24)) AS s
        |  FROM toks
        |)
        |SELECT doc_id, s // 24 AS chunk_idx,
        |  least(32, n - s) AS n_chunk_tokens,
        |  md5(array_to_string(list_slice(t, s + 1, least(s + 32, n)), ' '))
        |    AS chunk_md5
        |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,
    "sample_negative_pairs" ->
      """WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |draws AS (
        |  SELECT doc_id, slot,
        |    CAST(('0x' || substring(md5(
        |      CAST(doc_id AS VARCHAR) || '_' || CAST(slot AS VARCHAR)
        |    ), 1, 8)) AS BIGINT) % n.n_docs AS draw,
        |    n.n_docs
        |  FROM documents, LATERAL unnest([1, 2, 3]) AS u(slot)
        |  CROSS JOIN n
        |)
        |SELECT doc_id, slot,
        |  CASE WHEN draw = doc_id THEN (draw + 1) % n_docs
        |       ELSE draw END AS neg_id
        |FROM draws ORDER BY doc_id, slot""".stripMargin,
    "sample_downweight_duplicates" ->
      (s"WITH ${graft.llm.Dedup.plantedDocsCte(3)},\n" +
        """sizes AS (
        |  SELECT md5(text) AS text_md5, COUNT(*) AS n_copies
        |  FROM docs GROUP BY 1
        |)
        |SELECT doc_id, md5(text) AS text_md5, n_copies,
        |  CAST(CAST(CAST(1 AS DECIMAL(18,8)) / n_copies
        |       AS DECIMAL(18,8)) AS DOUBLE) AS weight
        |FROM docs JOIN sizes ON md5(text) = text_md5
        |ORDER BY doc_id""".stripMargin),
    "sample_domain_mix" ->
      """WITH src AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
        |  FROM documents GROUP BY source),
        |r AS (
        |  SELECT source,
        |    CAST(MIN(src_tokens) OVER () AS DOUBLE) / src_tokens AS rate
        |  FROM src),
        |h AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
        |         AS BIGINT) AS hv
        |  FROM documents)
        |SELECT h.doc_id, h.source, h.hv, ROUND(r.rate, 6) AS rate
        |FROM h JOIN r USING (source)
        |WHERE CAST(hv AS DOUBLE) < rate * 65536.0
        |ORDER BY h.source NULLS FIRST, h.doc_id""".stripMargin,
    "pack_shard_manifest" ->
      """WITH tk AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), pre AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
        |      ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before
        |  FROM tk
        |)
        |SELECT lang, cum_before // 2048 AS shard_id,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM pre GROUP BY 1, 2 ORDER BY 1 NULLS FIRST, 2""".stripMargin,
    "pack_sequences" ->
      s"""WITH c AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    CAST(COALESCE(SUM(len(string_split(text, ' '))) OVER (
         |      PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cum_before
         |  FROM documents)
         |SELECT doc_id, lang, n_tokens,
         |  cum_before // $PackBudget AS bin,
         |  cum_before % $PackBudget AS offset_in_bin
         |FROM c ORDER BY lang NULLS FIRST, doc_id""".stripMargin,
    "split_train_holdout" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
        |         AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 90 THEN 'train'
        |       WHEN bucket < 95 THEN 'validation'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    "text_dedup_lines" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |l AS (
        |  SELECT doc_id, i AS pos,
        |    array_to_string(toks[i * 4 + 1 : i * 4 + 4], ' ') AS line
        |  FROM d, LATERAL unnest(
        |    range(0, CAST(ceil(len(toks) / 4.0) AS BIGINT))) AS r(i)),
        |f AS (
        |  SELECT line, COUNT(DISTINCT doc_id) AS df FROM l GROUP BY line),
        |k AS (
        |  SELECT doc_id, COUNT(*) AS n_kept,
        |    md5(string_agg(l.line, ' ' ORDER BY pos)) AS clean_md5
        |  FROM l JOIN f USING (line) WHERE f.df <= 1 GROUP BY doc_id),
        |tot AS (
        |  SELECT doc_id, COUNT(*) AS n_lines FROM l GROUP BY doc_id)
        |SELECT t.doc_id,
        |  COALESCE(k.n_kept, 0) AS n_kept,
        |  t.n_lines - COALESCE(k.n_kept, 0) AS n_removed,
        |  COALESCE(k.clean_md5, md5('')) AS clean_md5
        |FROM tot t LEFT JOIN k USING (doc_id) ORDER BY doc_id""".stripMargin,
    "text_contamination" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 4),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    array_to_string(toks[i : i + 3], ' ') AS g
        |  FROM d, LATERAL unnest(range(1, len(toks) - 2)) AS r(i)),
        |ev AS (
        |  SELECT DISTINCT g FROM sh WHERE doc_id % 50 = 0)
        |SELECT doc_id, COUNT(*) AS n_contaminated_grams
        |FROM sh JOIN ev USING (g)
        |WHERE doc_id % 50 <> 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "embedding_centroid" ->
      """WITH e AS (
        |  SELECT label, i AS dim,
        |    CAST(CAST(embedding[i + 1] AS DOUBLE) AS DECIMAL(20,8)) AS vd
        |  FROM embeddings,
        |    LATERAL unnest(range(0, len(embedding))) AS r(i)),
        |a AS (
        |  SELECT label, dim, COUNT(*) AS n, SUM(vd) AS sum_dec
        |  FROM e GROUP BY label, dim)
        |SELECT label, CAST(dim AS INTEGER) AS dim, n,
        |  CAST(ROUND(sum_dec, 4) AS DOUBLE) + 0.0 AS dim_sum,
        |  ROUND(CAST(ROUND(sum_dec, 6) AS DOUBLE) / n, 4) + 0.0 AS centroid
        |FROM a ORDER BY label, dim""".stripMargin,
    "sample_temperature" ->
      """WITH a AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |b AS (
        |  SELECT *,
        |    CAST(n_tokens AS DOUBLE) /
        |      CAST(SUM(n_tokens) OVER () AS DOUBLE) AS p
        |  FROM a),
        |c AS (
        |  SELECT *, CAST(sqrt(p) AS DECIMAL(20,10)) AS w FROM b),
        |m AS (
        |  SELECT *,
        |    CAST(w AS DOUBLE) / CAST(SUM(w) OVER () AS DOUBLE) AS mix
        |  FROM c)
        |SELECT source, n_docs, n_tokens,
        |  ROUND(p, 6) AS p_natural,
        |  ROUND(mix, 6) AS p_mix,
        |  ROUND(mix / p, 4) AS up_factor
        |FROM m ORDER BY source NULLS FIRST""".stripMargin,
    "text_repetition" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |ln AS (
        |  SELECT doc_id,
        |    array_to_string(toks[i * 4 + 1 : i * 4 + 4], ' ') AS line
        |  FROM tk, LATERAL unnest(
        |    range(0, CAST(ceil(len(toks) / 4.0) AS BIGINT))) AS r(i)),
        |ls AS (
        |  SELECT doc_id, COUNT(*) AS n_lines,
        |    COUNT(DISTINCT line) AS n_distinct
        |  FROM ln GROUP BY doc_id),
        |bg AS (
        |  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g
        |  FROM tk, LATERAL unnest(range(1, len(toks))) AS r(i)),
        |bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g),
        |bs AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS tot
        |       FROM bc GROUP BY doc_id)
        |SELECT ls.doc_id,
        |  CAST(ls.n_lines AS INTEGER) AS n_lines,
        |  ROUND(CAST(ls.n_lines - ls.n_distinct AS DOUBLE) / ls.n_lines, 4)
        |    AS dup_line_frac,
        |  ROUND(CAST(bs.mx AS DOUBLE) / bs.tot, 4) AS top_bigram_frac
        |FROM ls LEFT JOIN bs USING (doc_id) ORDER BY doc_id""".stripMargin
  )
}
