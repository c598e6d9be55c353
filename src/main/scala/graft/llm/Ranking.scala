package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Corpus-relative term weighting and language-model scoring for
  * training-data curation (north-star scope, SURVEY.md §2.2 ⊕):
  * TF-IDF keyword extraction, BM25 relevance scoring and add-one
  * bigram language-model scoring over the `documents` table.
  *
  * These are the ranking/quality signals a data pipeline computes
  * corpus-wide before selection (keyword tags for mixing, BM25 for
  * retrieval-based filtering, LM logprob as a perplexity-style
  * quality score).
  *
  * Scale shape shared by all three: the corpus is scanned once and the
  * posting explode happens inside the scan stage; every statistics
  * side-table (document frequency, bigram counts, vocabulary size) is
  * VOCABULARY-bounded — sublinear in corpus size — so the joins back
  * to postings shuffle on token keys whose cardinality saturates while
  * the corpus grows. Nothing in these plans materializes an
  * all-pairs or corpus-squared relation.
  *
  * Cross-engine determinism: every irrational intermediate (ln) is
  * rounded to 6 decimals and cast to decimal BEFORE any sum, so
  * aggregation is exact and order-independent — a double sum of ln
  * values would hash-differently between Spark and DuckDB (different
  * reduction orders). The 1-ulp libm discrepancy risk survives only
  * inside a single rounded value, where it flips a 6th decimal with
  * probability ~1e-10 per value.
  */
object Ranking {

  /** TF-IDF keyword extraction: top-3 terms per document by
    * tf·(ln((1+N)/(1+df))+1) (smoothed idf, sklearn-style). The
    * per-document top-k is a rank-then-filter window on (weight desc,
    * token asc) — WindowGroupLimit keeps ≤ k rows per doc on the map
    * side before the final shuffle. */
  def textTfidf(s: SparkSession, d: String): DataFrame = {
    val toks = t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = toks.groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val n = t(s, d, "documents").agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("tok").asc)
    tf.join(df, "tok")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") *
          (log((lit(1) + col("n_docs")).cast("double") /
            (lit(1) + col("df")).cast("double")) + lit(1.0)), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("tok"), col("tf"), col("tfidf"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** The BM25 probe terms — a fixed retrieval query over the corpus
    * vocabulary (deterministic; a real pipeline parameterizes this). */
  private val bm25Query = Seq("spark", "data", "query")
  private val k1 = 1.2
  private val b = 0.75

  /** BM25 relevance of every document to a fixed term query:
    * score = Σ_q idf(q) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) with
    * idf = ln(1+(N−df+0.5)/(df+0.5)). avgdl is computed as an EXACT
    * decimal (sum of integer lengths / count) so the only double math
    * is per-term and per-row; per-term scores are rounded to decimals
    * before the ≤|Q|-term sum. Only documents containing ≥1 query term
    * appear (standard inverted-index behavior): the postings join is a
    * semi-filter on 3 tokens, so at 100 TB the scan is the only full
    * pass and everything downstream is |matching postings|-sized. */
  def textBm25(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val lens = docs.select(col("doc_id"),
      size(split(col("text"), " ")).as("dl"))
    val stats = lens.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl").cast("decimal(19,0)")).as("sum_dl"))
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok").isin(bm25Query: _*))
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
    val term = tf.join(broadcast(df), "tok")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("score_t",
        round(col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") +
            (col("dl") / col("avgdl") * b + (1.0 - b)) * k1), 6)
          .cast("decimal(18,6)"))
    term.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("score_t")).cast("double").as("bm25"))
      .orderBy(col("doc_id"))
  }

  /** Add-one-smoothed bigram language model trained on the corpus and
    * applied back to every document — the self-perplexity quality
    * signal (low average logprob = unusual token sequences = noise).
    * P(cur|prev) = (c2(prev,cur)+1)/(c1(prev)+V); per-doc score is the
    * mean bigram ln P. c2/c1/V are exact integer count tables bounded
    * by observed vocabulary (² at worst, in practice Zipf-small); each
    * ln is rounded → decimal before the exact per-doc sum. Documents
    * with <2 tokens score 0 with n_bigrams 0. */
  def textBigramLm(s: SparkSession, d: String): DataFrame = {
    val toksCol = col("toks")
    val bigramsExpr = when(size(toksCol) >= 2,
      transform(sequence(lit(1), size(toksCol) - 1),
        i => struct(element_at(toksCol, i).as("prev"),
          element_at(toksCol, i + 1).as("cur"))))
      .otherwise(array().cast("array<struct<prev:string,cur:string>>"))
    val docs = t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val inst = docs
      .select(col("doc_id"), explode(bigramsExpr).as("bg"))
      .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
    val c2 = inst.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("prev"))
      .agg(sum(col("c2")).as("c1"))
    val v = docs
      .select(explode(toksCol).as("tok"))
      .agg(countDistinct(col("tok")).as("vocab"))
    val scored = inst
      .join(c2, Seq("prev", "cur"))
      .join(c1, Seq("prev"))
      .crossJoin(broadcast(v))
      .withColumn("logp",
        round(log((col("c2") + lit(1)).cast("double") /
          (col("c1") + col("vocab")).cast("double")), 6)
          .cast("decimal(20,6)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("logp")).as("sum_logp"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(
          round(col("sum_logp").cast("double") / col("n_bigrams"), 4),
          lit(0.0)).as("avg_logp"))
      .orderBy(col("doc_id"))
  }

  /** Hybrid retrieval — the two-leg RAG/retrieval pattern: a lexical
    * leg (BM25 vs the fixed probe query) and a dense leg (cosine vs
    * the probe embedding, vec_id 0) are EACH cut to their top-50 by a
    * TakeOrderedAndProject heap — so no global sort and no full-corpus
    * window ever runs — then fused by reciprocal-rank over the bounded
    * candidate pool: rrf = 1/(60+r_lex) + 1/(60+r_dense) (Cormack et
    * al.'s k=60). Only docs in BOTH top-50 legs fuse (inner join), and
    * the pool window runs on ≤50 rows regardless of corpus size — at
    * 100 TB each leg is index-accelerated (inverted index / IVF) and
    * the fusion cost stays constant. */
  def simSearchHybrid(s: SparkSession, d: String): DataFrame = {
    val poolK = 50
    val lexPool = textBm25(s, d)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(poolK)
    val lex = lexPool
      .withColumn("r_lex", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))))
      .select(col("doc_id"), col("r_lex"))
    val e = t(s, d, "embeddings")
    val probe = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe"))
    val densePool = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id").as("doc_id"),
        round(Similarity.cosine(col("embedding"), col("probe")), 6).as("cos"))
      .orderBy(col("cos").desc, col("doc_id"))
      .limit(poolK)
    val dense = densePool
      .withColumn("r_dense", row_number().over(
        Window.orderBy(col("cos").desc, col("doc_id"))))
      .select(col("doc_id"), col("r_dense"))
    lex.join(dense, "doc_id")
      .withColumn("rrf",
        round(lit(1.0) / (col("r_lex") + lit(60)) +
          lit(1.0) / (col("r_dense") + lit(60)), 6))
      .select(col("doc_id"), col("r_lex"), col("r_dense"), col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(10)
  }

  /** Per-source distribution drift — Jensen-Shannon divergence between
    * each source's token distribution and the corpus distribution: the
    * domain-shift / contamination monitor a multi-source pipeline runs
    * per ingest batch. All probabilities are ratios of EXACT counts;
    * each per-pair JS term is double math on those exact inputs,
    * rounded → decimal before the per-source sum (the cross-engine
    * float discipline used throughout this module).
    *
    * Scale note: only PRESENT (source, token) pairs are materialized —
    * a plain equi-join of the per-source counts against the corpus
    * counts, so the plan carries O(Σ_s |vocab_s|) rows, not the dense
    * |sources| × |vocab| grid (which, per text_vocab_growth's Heaps'-
    * law memo, grows without bound at 100 TB). The zero cells are
    * analytically removable: with p=0 the JS term collapses to
    * (q/2)·ln 2, so a source's total zero-cell contribution is
    * (ln 2)/2 · (1 − covered_mass) where covered_mass =
    * Σ_{t present in s} c_t / n — computed from an EXACT BIGINT sum of
    * corpus counts over the pairs already in hand. One closed-form
    * remainder term per source replaces the entire zero-cell scan. */
  def textJsDivergence(s: SparkSession, d: String): DataFrame = {
    val toks = t(s, d, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val corpus = toks.groupBy(col("tok")).agg(count(lit(1)).as("c_t"))
    val corpusN = toks.agg(count(lit(1)).as("n"))
    val vocabN = corpus.agg(count(lit(1)).as("n_vocab"))
    val perSrc = toks.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c_st"))
    val srcN = toks.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    // present pairs only: equi-join on tok (vocab-bounded, shuffles on
    // the token key), then the bounded per-source totals
    val present = perSrc
      .join(corpus, "tok")
      .join(srcN, "source")
      .crossJoin(broadcast(corpusN))
      .withColumn("p", col("c_st").cast("double") / col("n_s"))
      .withColumn("q", col("c_t").cast("double") / col("n"))
      .withColumn("m", (col("p") + col("q")) / 2)
      .withColumn("term",
        round(
          (col("p") * log(col("p") / col("m"))) * 0.5 +
            (col("q") * log(col("q") / col("m"))) * 0.5, 6)
          .cast("decimal(20,6)"))
    present
      .groupBy(col("source"))
      .agg(sum(col("term")).as("sum_present"),
        sum(col("c_t")).as("covered_c"),
        max(col("n")).as("n"))
      // closed-form zero-cell remainder: (ln 2)/2 · (1 − covered mass),
      // rounded → decimal exactly like the per-pair terms. The constant
      // is a PINNED IEEE literal (not math.log: JVM Math.log has 1-ulp
      // slack, DuckDB's ln may differ in the last bit — a 1-ulp gap
      // could flip the round(...,6) boundary); the oracle uses the
      // same literal digits.
      .withColumn("rem",
        round(lit(0.34657359027997264) *
          (lit(1.0) - col("covered_c").cast("double") / col("n")), 6)
          .cast("decimal(20,6)"))
      .crossJoin(broadcast(vocabN))
      .select(col("source"),
        round((col("sum_present") + col("rem")).cast("double"), 4).as("js"),
        col("n_vocab"))
      .orderBy(col("source"))
  }

  /** Rank cap for [[textZipfFit]]'s head fit. */
  val zipfHeadRanks = 1000

  /** Zipf-law fit over the HEAD of the corpus rank-frequency curve —
    * the corpus-linguistics sanity check (natural text slopes near −1;
    * synthetic/templated corpora deviate): least-squares of ln(freq)
    * on ln(rank) using the agg_regression discipline — per-point logs
    * rounded → decimal, EXACT decimal sums, closed-form
    * slope/intercept as one double sequence.
    *
    * Scale shape: the vocabulary GROWS with the corpus (Heaps' law —
    * this repo's own text_vocab_growth diagnostic), so ranking ALL of
    * it through one global window is a single-task plan at 100 TB.
    * The fit only needs the distribution's head (the tail is where
    * Zipf deviates anyway), so the top-[[zipfHeadRanks]] types come
    * from a parallel TakeOrderedAndProject heap FIRST — the
    * tokenize_to_ids limit-first precedent — and the rank window runs
    * over that bounded relation only. Contract change (round 8): the
    * fit covers the top-1000 ranks and the count column is `n_head`,
    * not the full-vocabulary `n_vocab`; oracle updated in lockstep. */
  def textZipfFit(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("n").desc, col("tok"))
    t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(zipfHeadRanks)
      .withColumn("rank", row_number().over(w))
      .select(
        round(log(col("rank").cast("double")), 6)
          .cast("decimal(18,6)").as("x"),
        round(log(col("n").cast("double")), 6)
          .cast("decimal(18,6)").as("y"))
      .agg(count(lit(1)).as("k"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("k").as("n_head"),
        round((col("k") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (col("k") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")), 4)
          .as("zipf_slope"),
        round((col("sy").cast("double") -
          ((col("k") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (col("k") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double"))) *
            col("sx").cast("double")) / col("k"), 4).as("intercept"))
  }

  /** PMI collocation mining — token pairs that co-occur in documents
    * far more than independence predicts: pmi = ln(n·c_xy/(c_x·c_y))
    * over document-level co-occurrence, the classic phrase/collocation
    * detector. All counts exact (per-doc distinct tokens, pair counts
    * from the doc-keyed self-join — work is Σ per-doc |vocab|², never
    * corpus²); the single ln rounds to 4. A min-support floor keeps
    * rare-pair noise out. Top-15 by (pmi, pair). */
  def textPmiCollocations(s: SparkSession, d: String): DataFrame = {
    val docToks = t(s, d, "documents")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " ")))
        .as("tok"))
    val df = docToks.groupBy(col("tok"))
      .agg(count(lit(1)).as("c"))
    val n = t(s, d, "documents").agg(count(lit(1)).as("n_docs"))
    docToks.as("a")
      .join(docToks.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.tok") < col("b.tok"))
      .groupBy(col("a.tok").as("tok_a"), col("b.tok").as("tok_b"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
      // The unigram df table is vocabulary-sized and vocabulary grows
      // with the corpus (Heaps' law) — broadcasting it is unbounded at
      // 100 TB. Plain shuffle equi-joins instead: the pair side is
      // min-support-floored (tiny), so the shuffle is cheap, and AQE
      // may still choose broadcast when df genuinely fits.
      .join(df.withColumnRenamed("tok", "tok_a")
        .withColumnRenamed("c", "c_a"), "tok_a")
      .join(df.withColumnRenamed("tok", "tok_b")
        .withColumnRenamed("c", "c_b"), "tok_b")
      .crossJoin(broadcast(n))
      .select(col("tok_a"), col("tok_b"), col("c_ab"),
        round(log(col("c_ab").cast("double") * col("n_docs") /
          (col("c_a").cast("double") * col("c_b"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("tok_a"), col("tok_b"))
      .limit(15)
  }

  /** Dunning log-likelihood (G²) collocations — the significance-
    * aware companion of [[textPmiCollocations]]: PMI over-ranks rare
    * pairs (a 5/5 co-occurrence maxes PMI); G² scores the full 2×2
    * contingency table (Dunning, CL'93), G² = 2·Σ O·ln(O/E), so
    * abundant-but-dependent pairs rank where PMI's rare-pair bias
    * buries them. Same document-level co-occurrence counts and
    * min-support floor as PMI — work is Σ per-doc |vocab|², never
    * corpus².
    *
    * Float discipline: every observed/expected cell is a product of
    * EXACT integers (< 2^53 at any test sf), each of the four
    * O·ln(O·n/(r·c)) terms is written with a single division inside
    * the ln, zero cells short-circuit via CASE (0·ln0 := 0), and the
    * four-term sum has a fixed left-to-right shape in both engines.
    * One ROUND to 4 at the end.
    *
    * Scale shape: identical to PMI's — the unigram table shuffles
    * (never broadcasts — vocabulary grows with the corpus, Heaps'
    * law), the pair side is support-floored, the top-15 is a
    * TakeOrderedAndProject heap. */
  def textG2Collocations(s: SparkSession, d: String): DataFrame = {
    val docToks = t(s, d, "documents")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " ")))
        .as("tok"))
    val df = docToks.groupBy(col("tok"))
      .agg(count(lit(1)).as("c"))
    val n = t(s, d, "documents").agg(count(lit(1)).as("n_docs"))
    def term(o: String, r: String, c: String): String =
      s"""CASE WHEN $o > 0
         | THEN CAST($o AS DOUBLE) *
         |   ln(CAST($o AS DOUBLE) * n_docs / (CAST($r AS DOUBLE) * ($c)))
         | ELSE 0.0 END""".stripMargin
    docToks.as("a")
      .join(docToks.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.tok") < col("b.tok"))
      .groupBy(col("a.tok").as("tok_a"), col("b.tok").as("tok_b"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
      .join(df.withColumnRenamed("tok", "tok_a")
        .withColumnRenamed("c", "c_a"), "tok_a")
      .join(df.withColumnRenamed("tok", "tok_b")
        .withColumnRenamed("c", "c_b"), "tok_b")
      .crossJoin(broadcast(n))
      .select(col("tok_a"), col("tok_b"), col("c_ab"),
        expr(s"""ROUND(2.0 * (
                ${term("c_ab", "c_a", "c_b")} +
                ${term("c_a - c_ab", "c_a", "n_docs - c_b")} +
                ${term("c_b - c_ab", "n_docs - c_a", "c_b")} +
                ${term("n_docs - c_a - c_b + c_ab",
            "n_docs - c_a", "n_docs - c_b")}), 4)""").as("g2"))
      .orderBy(col("g2").desc, col("tok_a"), col("tok_b"))
      .limit(15)
  }

  /** Rank-biased overlap (Webber et al. 2010) between two term
    * rankings — the top-weighted similarity measure for comparing
    * retrieval/ranking heads (here: the global frequency top-20 vs
    * the lang='en' subcorpus top-20; how language-specific is the
    * head vocabulary?). Truncated RBO@20 with p = 1/2, chosen so
    * every weight (1−p)·p^(d−1) = 2^−d is an exact dyadic rational:
    * X_d (prefix-intersection size at depth d) is integral, each
    * term X_d/(d·2^d) is a small-integer division both engines
    * compute to the identical double, terms round@12 into an exact
    * DECIMAL sum (order-independent), one final round. The standard
    * p=.9 would need libm POWER — last-ulp divergence territory;
    * p=1/2 trades tail weight for bit-exactness (documented).
    *
    * Scale shape: both rankings are TakeOrderedAndProject k-heaps
    * over one token aggregate (never a global sort); everything
    * after is ≤20×20. */
  def textRboOverlap(s: SparkSession, d: String): DataFrame = {
    val k = 20
    val toks = t(s, d, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    def head(df: DataFrame, rankCol: String): DataFrame = df
      .orderBy(col("n").desc, col("tok"))
      .limit(k)
      .select(col("tok"),
        row_number().over(Window.orderBy(col("n").desc, col("tok")))
          .as(rankCol))
    val a = head(toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("n")), "ra")
    val b = head(toks.filter(col("lang") === "en").groupBy(col("tok"))
      .agg(count(lit(1)).as("n")), "rb")
    val depths = s.range(1, k + 1).select(col("id").as("dpt"))
    a.join(b, "tok")
      .select(greatest(col("ra"), col("rb")).as("m"))
      .join(broadcast(depths), col("dpt") >= col("m"))
      .groupBy(col("dpt")).agg(count(lit(1)).as("xd"))
      .select(col("dpt"), col("xd"),
        expr("CAST(ROUND(xd / CAST(dpt * CAST(pow(2, dpt) AS BIGINT)" +
          " AS DOUBLE), 12) AS DECIMAL(24,12))").as("term"))
      .agg(count(lit(1)).as("n_depths"), sum(col("xd")).as("sum_xd"),
        round(sum(col("term")).cast("double"), 6).as("rbo"))
  }

  /** Interpolated Kneser-Ney bigram probabilities (Kneser & Ney '95;
    * Chen & Goodman '99 — the standard n-gram smoothing, and the
    * counting core of a KenLM-style corpus LM build) for the corpus's
    * top-20 bigrams: P(cur|prev) = (max(c2−D,0) + D·N1+(prev·)·
    * N1+(·cur)/N1+(··)) / c1(prev) with absolute discount D = 0.75.
    * The novelty vs [[textBigramLm]]'s add-one model is the
    * CONTINUATION count N1+(·cur) — how many distinct contexts a word
    * follows — which is exactly the statistic that requires a second
    * aggregation over the bigram-TYPE relation, not the corpus
    * (Zipf-bounded, the same side-table class as c1/vocab).
    *
    * Scale shape: ONE corpus pass builds the (prev,cur) hash
    * aggregate; it is cached and every other statistic (c1, forward /
    * backward continuation counts, the global type count, the top-20
    * heap) derives from that bounded relation — the corpus is never
    * re-read. The head is a TakeOrderedAndProject heap BEFORE the
    * statistic joins, so joins run on 20 rows.
    *
    * Float discipline: every count is an exact BIGINT; D = 0.75 is an
    * exact binary fraction, c2−0.75 is exact in double below 2^53, and
    * P_KN closes in ONE identical double expression with a single
    * trailing ROUND(...,6). */
  def textKneserNey(s: SparkSession, d: String): DataFrame = {
    val toksCol = col("toks")
    val bigramsExpr = when(size(toksCol) >= 2,
      transform(sequence(lit(1), size(toksCol) - 1),
        i => struct(element_at(toksCol, i).as("prev"),
          element_at(toksCol, i + 1).as("cur"))))
      .otherwise(array().cast("array<struct<prev:string,cur:string>>"))
    val c2 = t(s, d, "documents")
      .select(split(col("text"), " ").as("toks"))
      .select(explode(bigramsExpr).as("bg"))
      .groupBy(col("bg.prev").as("prev"), col("bg.cur").as("cur"))
      .agg(count(lit(1)).as("c2"))
      .cache()
    val head20 = c2.orderBy(col("c2").desc, col("prev"), col("cur"))
      .limit(20)
    val c1 = c2.groupBy(col("prev"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("nfw"))
    val nbw = c2.groupBy(col("cur"))
      .agg(count(lit(1)).as("nbw"))
    val ntypes = c2.agg(count(lit(1)).as("n_types"))
    head20.join(c1, Seq("prev"))
      .join(nbw, Seq("cur"))
      .crossJoin(broadcast(ntypes))
      .select(col("prev"), col("cur"), col("c2"), col("c1"),
        col("nfw"), col("nbw"), col("n_types"),
        expr("""ROUND((GREATEST(CAST(c2 AS DOUBLE) - 0.75, 0e0)
                 + 0.75 * (CAST(nfw AS DOUBLE) * CAST(nbw AS DOUBLE)
                           / CAST(n_types AS DOUBLE)))
                / CAST(c1 AS DOUBLE), 6)""").as("p_kn"))
      .orderBy(col("c2").desc, col("prev"), col("cur"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_kneser_ney" -> (textKneserNey _),
    "text_rbo_overlap" -> (textRboOverlap _),
    "text_pmi_collocations" -> (textPmiCollocations _),
    "text_g2_collocations" -> (textG2Collocations _),
    "text_zipf_fit" -> (textZipfFit _),
    "text_js_divergence" -> (textJsDivergence _),
    "text_tfidf" -> (textTfidf _),
    "text_bm25" -> (textBm25 _),
    "text_bigram_lm" -> (textBigramLm _),
    "sim_search_hybrid" -> (simSearchHybrid _)
  )

  val oracles: Map[String, String] = Map(
    // exact BIGINT counts over the bigram-type relation; D=0.75 is an
    // exact binary fraction; ONE identical closing double + ROUND@6
    "text_kneser_ney" ->
      """WITH docs AS (
        |  SELECT string_split(text, ' ') AS toks FROM documents
        |), inst AS (
        |  SELECT toks[i] AS prev, toks[i + 1] AS cur
        |  FROM docs, LATERAL unnest(range(1, len(toks))) AS u(i)
        |  WHERE len(toks) >= 2
        |), c2 AS (
        |  SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS c2
        |  FROM inst GROUP BY 1, 2
        |), c1 AS (
        |  SELECT prev, CAST(SUM(c2) AS BIGINT) AS c1,
        |    CAST(COUNT(*) AS BIGINT) AS nfw
        |  FROM c2 GROUP BY 1
        |), bw AS (
        |  SELECT cur, CAST(COUNT(*) AS BIGINT) AS nbw FROM c2 GROUP BY 1
        |), nt AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM c2
        |), head AS (
        |  SELECT * FROM c2 ORDER BY c2 DESC, prev, cur LIMIT 20
        |)
        |SELECT prev, cur, c2, c1, nfw, nbw, n_types,
        |  ROUND((GREATEST(CAST(c2 AS DOUBLE) - 0.75, 0e0)
        |          + 0.75 * (CAST(nfw AS DOUBLE) * CAST(nbw AS DOUBLE)
        |                    / CAST(n_types AS DOUBLE)))
        |        / CAST(c1 AS DOUBLE), 6) AS p_kn
        |FROM head JOIN c1 USING (prev) JOIN bw USING (cur) CROSS JOIN nt
        |ORDER BY c2 DESC, prev, cur""".stripMargin,
    // p=1/2 dyadic weights: exact small-integer divisions, round@12
    // decimal sum, one final round (see textRboOverlap Scaladoc)
    "text_rbo_overlap" ->
      """WITH tok AS (
        |  SELECT lang, UNNEST(string_split(text, ' ')) AS tok
        |  FROM documents
        |), tk AS (SELECT lang, tok FROM tok WHERE tok <> ''),
        |a AS (
        |  SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok)
        |    AS ra
        |  FROM tk GROUP BY tok
        |  ORDER BY COUNT(*) DESC, tok LIMIT 20
        |), b AS (
        |  SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok)
        |    AS rb
        |  FROM tk WHERE lang = 'en' GROUP BY tok
        |  ORDER BY COUNT(*) DESC, tok LIMIT 20
        |), mm AS (
        |  SELECT GREATEST(ra, rb) AS m FROM a JOIN b USING (tok)
        |), x AS (
        |  SELECT d.range AS dpt, CAST(COUNT(*) AS BIGINT) AS xd
        |  FROM mm JOIN range(1, 21) d ON d.range >= mm.m
        |  GROUP BY 1
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_depths,
        |  CAST(SUM(xd) AS BIGINT) AS sum_xd,
        |  ROUND(CAST(SUM(CAST(ROUND(xd /
        |    CAST(dpt * CAST(pow(2, dpt) AS BIGINT) AS DOUBLE), 12)
        |    AS DECIMAL(24,12))) AS DOUBLE), 6) AS rbo
        |FROM x""".stripMargin,
    // identical four-term O·ln(O·n/(r·c)) text, fixed sum shape,
    // zero cells short-circuited, one ROUND to 4
    "text_g2_collocations" ->
      """WITH dt AS (
        |  SELECT DISTINCT doc_id, tok
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |), df AS (
        |  SELECT tok, COUNT(*) AS c FROM dt GROUP BY 1
        |), n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |pairs AS (
        |  SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS c_ab
        |  FROM dt a JOIN dt b
        |    ON a.doc_id = b.doc_id AND a.tok < b.tok
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5
        |), cells AS (
        |  SELECT tok_a, tok_b, c_ab, da.c AS c_a, db.c AS c_b, n_docs
        |  FROM pairs
        |  JOIN df da ON da.tok = tok_a
        |  JOIN df db ON db.tok = tok_b
        |  CROSS JOIN n
        |)
        |SELECT tok_a, tok_b, c_ab,
        |  ROUND(2.0 * (
        |    CASE WHEN c_ab > 0
        |     THEN CAST(c_ab AS DOUBLE) *
        |       ln(CAST(c_ab AS DOUBLE) * n_docs /
        |          (CAST(c_a AS DOUBLE) * (c_b)))
        |     ELSE 0.0 END +
        |    CASE WHEN c_a - c_ab > 0
        |     THEN CAST(c_a - c_ab AS DOUBLE) *
        |       ln(CAST(c_a - c_ab AS DOUBLE) * n_docs /
        |          (CAST(c_a AS DOUBLE) * (n_docs - c_b)))
        |     ELSE 0.0 END +
        |    CASE WHEN c_b - c_ab > 0
        |     THEN CAST(c_b - c_ab AS DOUBLE) *
        |       ln(CAST(c_b - c_ab AS DOUBLE) * n_docs /
        |          (CAST(n_docs - c_a AS DOUBLE) * (c_b)))
        |     ELSE 0.0 END +
        |    CASE WHEN n_docs - c_a - c_b + c_ab > 0
        |     THEN CAST(n_docs - c_a - c_b + c_ab AS DOUBLE) *
        |       ln(CAST(n_docs - c_a - c_b + c_ab AS DOUBLE) * n_docs /
        |          (CAST(n_docs - c_a AS DOUBLE) * (n_docs - c_b)))
        |     ELSE 0.0 END), 4) AS g2
        |FROM cells
        |ORDER BY g2 DESC, tok_a, tok_b LIMIT 15""".stripMargin,
    "text_pmi_collocations" ->
      """WITH dt AS (
        |  SELECT DISTINCT doc_id, tok
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |), df AS (
        |  SELECT tok, COUNT(*) AS c FROM dt GROUP BY 1
        |), n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |pairs AS (
        |  SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS c_ab
        |  FROM dt a JOIN dt b
        |    ON a.doc_id = b.doc_id AND a.tok < b.tok
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5
        |)
        |SELECT tok_a, tok_b, c_ab,
        |  ROUND(ln(CAST(c_ab AS DOUBLE) * n.n_docs /
        |    (CAST(da.c AS DOUBLE) * db.c)), 4) AS pmi
        |FROM pairs
        |JOIN df da ON da.tok = tok_a
        |JOIN df db ON db.tok = tok_b
        |CROSS JOIN n
        |ORDER BY pmi DESC, tok_a, tok_b LIMIT 15""".stripMargin,
    "text_zipf_fit" ->
      """WITH c AS (
        |  SELECT tok, COUNT(*) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1
        |), head AS (
        |  SELECT tok, n FROM c ORDER BY n DESC, tok LIMIT 1000
        |), pts AS (
        |  SELECT
        |    CAST(ROUND(ln(CAST(ROW_NUMBER() OVER
        |      (ORDER BY n DESC, tok) AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS x,
        |    CAST(ROUND(ln(CAST(n AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS y
        |  FROM head
        |), sums AS (
        |  SELECT COUNT(*) AS k, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx
        |  FROM pts
        |)
        |SELECT k AS n_head,
        |  ROUND((k * CAST(sxy AS DOUBLE) -
        |    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (k * CAST(sxx AS DOUBLE) -
        |     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4) AS zipf_slope,
        |  ROUND((CAST(sy AS DOUBLE) -
        |    ((k * CAST(sxy AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |     (k * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) *
        |    CAST(sx AS DOUBLE)) / k, 4) AS intercept
        |FROM sums""".stripMargin,
    "text_js_divergence" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents
        |), corpus AS (
        |  SELECT tok, COUNT(*) AS c_t FROM toks GROUP BY 1
        |), corpus_n AS (SELECT COUNT(*) AS n FROM toks),
        |vocab_n AS (SELECT COUNT(*) AS n_vocab FROM corpus),
        |per_src AS (
        |  SELECT source, tok, COUNT(*) AS c_st FROM toks GROUP BY 1, 2
        |), src_n AS (
        |  SELECT source, COUNT(*) AS n_s FROM toks GROUP BY 1
        |), terms AS (
        |  SELECT per_src.source, corpus.c_t, corpus_n.n,
        |    CAST(ROUND(
        |      ((CAST(c_st AS DOUBLE) / n_s) *
        |       ln((CAST(c_st AS DOUBLE) / n_s) /
        |          ((CAST(c_st AS DOUBLE) / n_s +
        |            CAST(c_t AS DOUBLE) / n) / 2))) * 0.5 +
        |      ((CAST(c_t AS DOUBLE) / n) *
        |       ln((CAST(c_t AS DOUBLE) / n) /
        |          ((CAST(c_st AS DOUBLE) / n_s +
        |            CAST(c_t AS DOUBLE) / n) / 2))) * 0.5,
        |    6) AS DECIMAL(20,6)) AS term
        |  FROM per_src
        |  JOIN corpus USING (tok)
        |  JOIN src_n ON src_n.source = per_src.source
        |  CROSS JOIN corpus_n
        |), agg AS (
        |  SELECT source, SUM(term) AS sum_present,
        |    SUM(c_t) AS covered_c, MAX(n) AS n
        |  FROM terms GROUP BY source
        |)
        |SELECT source,
        |  ROUND(CAST(sum_present +
        |    CAST(ROUND(0.34657359027997264 *
        |      (1.0 - CAST(covered_c AS DOUBLE) / n), 6)
        |      AS DECIMAL(20,6)) AS DOUBLE), 4) AS js,
        |  vocab_n.n_vocab AS n_vocab
        |FROM agg CROSS JOIN vocab_n ORDER BY source NULLS FIRST""".stripMargin,
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        |), df AS (
        |  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1
        |), n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |w AS (
        |  SELECT tf.doc_id, tf.tok, tf.tf,
        |    ROUND(tf.tf * (ln((1 + n.n_docs) / CAST(1 + df.df AS DOUBLE))
        |      + 1.0), 6) AS tfidf
        |  FROM tf JOIN df USING (tok) CROSS JOIN n
        |), r AS (
        |  SELECT doc_id, tok, tf, tfidf,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |                       ORDER BY tfidf DESC, tok ASC) AS rnk
        |  FROM w
        |)
        |SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, tok, tf, tfidf
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "text_bm25" ->
      """WITH lens AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
        |), stats AS (
        |  SELECT COUNT(*) AS n_docs,
        |         SUM(CAST(dl AS DECIMAL(19,0))) AS sum_dl
        |  FROM lens
        |), toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
        |  WHERE tok IN ('spark', 'data', 'query') GROUP BY 1, 2
        |), df AS (
        |  SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
        |), term AS (
        |  SELECT tf.doc_id,
        |    CAST(ROUND(
        |      ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5)) *
        |      (tf.tf * 2.2) /
        |      (tf.tf + (lens.dl /
        |          (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs)
        |          * 0.75 + 0.25) * 1.2), 6)
        |      AS DECIMAL(18,6)) AS score_t
        |  FROM tf JOIN df USING (tok) JOIN lens USING (doc_id)
        |  CROSS JOIN stats
        |)
        |SELECT doc_id, COUNT(*) AS n_terms,
        |  CAST(SUM(score_t) AS DOUBLE) AS bm25
        |FROM term GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "sim_search_hybrid" ->
      """WITH lens AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
        |), stats AS (
        |  SELECT COUNT(*) AS n_docs,
        |         SUM(CAST(dl AS DECIMAL(19,0))) AS sum_dl
        |  FROM lens
        |), toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
        |  WHERE tok IN ('spark', 'data', 'query') GROUP BY 1, 2
        |), df AS (
        |  SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
        |), term AS (
        |  SELECT tf.doc_id,
        |    CAST(ROUND(
        |      ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5)) *
        |      (tf.tf * 2.2) /
        |      (tf.tf + (lens.dl /
        |          (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs)
        |          * 0.75 + 0.25) * 1.2), 6)
        |      AS DECIMAL(18,6)) AS score_t
        |  FROM tf JOIN df USING (tok) JOIN lens USING (doc_id)
        |  CROSS JOIN stats
        |), bm25 AS (
        |  SELECT doc_id, CAST(SUM(score_t) AS DOUBLE) AS bm25
        |  FROM term GROUP BY doc_id
        |), lex50 AS (
        |  SELECT doc_id, bm25 FROM bm25
        |  ORDER BY bm25 DESC, doc_id LIMIT 50
        |), lex AS (
        |  SELECT doc_id,
        |    ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
        |  FROM lex50
        |), dense50 AS (
        |  SELECT vec_id AS doc_id,
        |    ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |      (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
        |       WHERE vec_id = 0)), 6) AS cos
        |  FROM embeddings WHERE vec_id <> 0
        |  ORDER BY cos DESC, vec_id LIMIT 50
        |), dense AS (
        |  SELECT doc_id,
        |    ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS r_dense
        |  FROM dense50
        |)
        |SELECT doc_id,
        |  CAST(r_lex AS INTEGER) AS r_lex,
        |  CAST(r_dense AS INTEGER) AS r_dense,
        |  ROUND(1.0 / (r_lex + 60) + 1.0 / (r_dense + 60), 6) AS rrf
        |FROM lex JOIN dense USING (doc_id)
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
    "text_bigram_lm" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), inst AS (
        |  SELECT doc_id, toks[i] AS prev, toks[i + 1] AS cur
        |  FROM docs, LATERAL unnest(range(1, len(toks))) AS u(i)
        |  WHERE len(toks) >= 2
        |), c2 AS (
        |  SELECT prev, cur, COUNT(*) AS c2 FROM inst GROUP BY 1, 2
        |), c1 AS (
        |  SELECT prev, SUM(c2) AS c1 FROM c2 GROUP BY 1
        |), v AS (
        |  SELECT COUNT(DISTINCT tok) AS vocab
        |  FROM (SELECT unnest(toks) AS tok FROM docs)
        |), scored AS (
        |  SELECT doc_id, COUNT(*) AS n_bigrams,
        |    SUM(CAST(ROUND(ln((c2.c2 + 1) /
        |      CAST(c1.c1 + v.vocab AS DOUBLE)), 6)
        |      AS DECIMAL(20,6))) AS sum_logp
        |  FROM inst JOIN c2 USING (prev, cur) JOIN c1 USING (prev)
        |  CROSS JOIN v
        |  GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  COALESCE(s.n_bigrams, 0) AS n_bigrams,
        |  COALESCE(ROUND(CAST(s.sum_logp AS DOUBLE) / s.n_bigrams, 4), 0.0)
        |    AS avg_logp
        |FROM docs d LEFT JOIN scored s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin
  )
}
