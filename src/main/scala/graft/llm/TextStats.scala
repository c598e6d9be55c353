package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Text analysis for training-data pipelines (north-star scope, SURVEY.md
  * §2.2 ⊕): per-document statistics, heuristic language ID, quality
  * scoring, regex token counting and content fingerprinting over the
  * `documents` table.
  *
  * All pure per-row built-in expressions over one scan — a single
  * codegen'd stage at any scale, no shuffle except the deterministic
  * output sort (dropped in production use).
  */
object TextStats {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")
  private val stopList = stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  def textStats(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(
        col("doc_id"), col("lang"),
        length(col("text")).as("n_chars_c"),
        size(split(col("text"), " ")).as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).as("n_uniq"),
        round(length(regexp_replace(col("text"), " ", "")).cast("double") /
          size(split(col("text"), " ")), 4).as("avg_tok_len"),
        round(expr(s"size(filter(split(text, ' '), t -> t IN $stopList))")
          .cast("double") / size(split(col("text"), " ")), 4).as("stop_ratio"))
      .orderBy(col("doc_id"))

  /** Heuristic n-gram language ID: stopword-density vote (the container
    * has no langid model; the heuristic is the operator shape). */
  def textLangId(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("stop_ratio",
        expr(s"size(filter(split(text, ' '), t -> t IN $stopList))")
          .cast("double") / size(split(col("text"), " ")))
      .select(
        col("doc_id"), col("lang"),
        round(col("stop_ratio"), 4).as("en_score"),
        when(col("stop_ratio") > 0.05, lit("en")).otherwise(lit("other"))
          .as("lang_pred"))
      .orderBy(col("doc_id"))

  /** Composite quality score: length saturation + lexical diversity. */
  def textQualityScore(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("len_score",
        least(lit(1.0), length(col("text")).cast("double") / 500.0))
      .withColumn("uniq_ratio",
        size(array_distinct(split(col("text"), " "))).cast("double") /
          col("n_tokens"))
      .select(
        col("doc_id"),
        round(col("len_score"), 4).as("len_score"),
        round(col("uniq_ratio"), 4).as("uniq_ratio"),
        // composite averages land exactly on .xxxx5 — decimal-route the
        // final rounding (same rule as money arithmetic, SKILL.md gotcha)
        round((col("len_score") * 0.5 + col("uniq_ratio") * 0.5)
          .cast("decimal(18,8)"), 4).cast("double").as("quality"))
      .orderBy(col("doc_id"))

  /** The rule-based curation gates shared by [[compositeCuration]] and
    * [[compositeCurationClassified]]: language filter (stopword-density
    * heuristic) + quality floor (length saturation + lexical
    * diversity). Pure per-row projection work — stays in the scan
    * stage; `text` is retained for the downstream dedup hash. */
  private def ruleGatedDocs(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("len_score",
        least(lit(1.0), length(col("text")).cast("double") / 500.0))
      .withColumn("uniq_ratio",
        size(array_distinct(split(col("text"), " "))).cast("double") /
          col("n_tokens"))
      .withColumn("quality",
        round((col("len_score") * 0.5 + col("uniq_ratio") * 0.5)
          .cast("decimal(18,8)"), 4).cast("double"))
      .withColumn("stop_ratio",
        expr(s"size(filter(split(text, ' '), t -> t IN $stopList))")
          .cast("double") / col("n_tokens"))
      .filter(col("quality") >= 0.5 && col("stop_ratio") > 0.05)

  /** Exact-dedup representative selection among gate survivors
    * (filter-then-dedup: only passing docs shuffle, and the shuffle
    * key is a 16-byte content hash, never the text). */
  private def dedupSurvivors(gated: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("text_md5"))
    gated
      .withColumn("text_md5", md5(col("text")))
      .withColumn("rep_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("rep_id"))
  }

  /** The end-to-end curation gate a training-data pipeline runs before
    * tokenization, composed from the operators above: language filter
    * (stopword-density heuristic), quality floor (length saturation +
    * lexical diversity), then exact-dedup representative selection among
    * the SURVIVORS. One scan stage + one hash shuffle at any scale. */
  def compositeCuration(s: SparkSession, d: String): DataFrame =
    dedupSurvivors(ruleGatedDocs(s, d))
      .select(col("doc_id"), col("lang"), col("quality"))
      .orderBy(col("doc_id"))

  /** The canonical text form — lowercase, collapse every
    * non-alphanumeric run to a single space, trim. THE definition both
    * [[textNormalize]] and [[Dedup.dedupCanonical]] key on; change it
    * here and both operators (and their oracles) must move together. */
  def canonicalText(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Text canonicalization — the normalize-before-dedup step of a
    * curation pipeline ([[canonicalText]]); single codegen'd regex
    * stage. */
  def textNormalize(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), canonicalText(col("text")).as("norm_text"))
      .orderBy(col("doc_id"))

  /** Regex token counting (BPE-ish pre-tokenizer split: word runs vs
    * single non-space symbols) + whitespace token count. */
  def textTokenCount(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        regexp_count(col("text"), lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"))
          .as("bpe_tokens"))
      .orderBy(col("doc_id"))

  /** Corpus-level rollup per (lang, source) — the dataset-card numbers
    * every training-data pipeline reports: doc/token/char volumes and
    * mean quality. One partial+final hash aggregate over one scan. */
  def corpusStats(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("uniq_ratio",
        size(array_distinct(split(col("text"), " "))).cast("double") /
          col("n_tokens"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(length(col("text"))).as("n_chars_sum"),
        round(avg(col("uniq_ratio")).cast("decimal(18,8)"), 4)
          .cast("double").as("avg_uniq_ratio"))
      .orderBy(col("lang"), col("source"))

  /** Corpus-relative token rarity — an IDF-flavored quality signal with
    * NO floating-point accumulation: per document,
    * `score = (n·N − Σ df(tok)) / (n·N)` where df is each token
    * occurrence's document frequency, n the doc's token count, N the
    * corpus size. Numerator and denominator are pure 64-bit integers,
    * so the only float op is the final division — both engines agree
    * bit-for-bit with no decimal scaffolding. Near 0 = stopword soup,
    * near 1 = rare-token-heavy (OCR garbage, gibberish).
    *
    * Scale shape: the df table is a hash aggregate over exploded
    * tokens (inverted-index pattern shared with text_contamination);
    * joining postings back to df shuffles on the token key — df fits
    * comfortably beside the corpus at any scale (vocabulary grows
    * sublinearly). The corpus-size scalar rides along as a broadcast
    * 1-row cross join, keeping the whole thing one DAG (no
    * driver-side count). */
  def textRarityScore(s: SparkSession, d: String): DataFrame = {
    val toks = t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val df = toks.groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val total = t(s, d, "documents").agg(count(lit(1)).as("n_corpus"))
    toks.join(df, "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("df")).as("sum_df"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_tokens"),
        round((col("n_tokens") * col("n_corpus") - col("sum_df"))
          .cast("double") /
          (col("n_tokens") * col("n_corpus")).cast("double"), 6)
          .as("rarity"))
      .orderBy(col("doc_id"))
  }

  /** Reproducible stratified sampling: up to 25 docs per language,
    * chosen by md5-of-id order — the hash-based sampler that is (a)
    * deterministic across engines/runs (seeded RNG samplers are not
    * portable), (b) uniform-ish regardless of id distribution, and (c)
    * one WindowGroupLimit per stratum before any final shuffle, so at
    * 100 TB each partition keeps <= k rows per stratum locally. */
  def sampleHashStratified(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byHash = Window.partitionBy(col("lang"))
      .orderBy(col("h"), col("doc_id"))
    t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rn", row_number().over(byHash))
      .filter(col("rn") <= 25)
      .select(col("doc_id"), col("lang"), col("rn"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Vocabulary-mapped tokenization — the text→ids step before
    * training: token ids are ranks in the corpus frequency table
    * (count desc, token asc — fully deterministic), OOV maps to -1.
    * Scale shape: the vocab is BOUNDED (top-k of a hash aggregate, a
    * broadcast-sized table no matter the corpus), the posting explode
    * happens inside the scan stage, and the per-doc id sequence is
    * rebuilt with one sort_array(collect_list(struct(pos,id))) — state
    * bounded by document length, never corpus size. Ids are emitted
    * comma-joined (scalar) for the oracle comparator. */
  def tokenizeToIds(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vocabSize = 100
    val toks = t(s, d, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("pos", "tok")))
    // top-k FIRST (TakeOrderedAndProject — a per-partition heap, no
    // global sort of the corpus vocabulary), then number the surviving
    // <= vocabSize rows; ordering is total (tok unique) so limit+rank
    // equals rank+filter exactly
    val vocab = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(vocabSize)
      .withColumn("id",
        row_number().over(Window.orderBy(col("n").desc, col("tok").asc)) - 1)
      .select(col("tok"), col("id"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("id"), lit(-1)).as("id"))
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("pos"), col("id")))),
          e => e.getField("id").cast("string")),
        ",").as("token_ids"))
      .orderBy(col("doc_id"))
  }

  /** Content fingerprints: full-text md5 plus min/max token-level md5
    * (a 1-function MinHash — the banded generalization is
    * `dedup_fuzzy_minhash`). */
  def docFingerprint(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(
        col("doc_id"),
        md5(col("text")).as("md5_full"),
        array_min(transform(split(col("text"), " "), t => md5(t)))
          .as("min_tok_md5"),
        array_max(transform(split(col("text"), " "), t => md5(t)))
          .as("max_tok_md5"))
      .orderBy(col("doc_id"))

  /** Corpus-level top-k bigram frequencies: per-doc bigram generation is
    * a pure array transform inside the scan stage (no shuffle), the
    * count is one hash aggregate on the bigram key, and top-k is
    * TakeOrderedAndProject — the n-gram-statistics recipe that holds at
    * 100 TB (a corpus has bounded distinct n-grams, so the exchange
    * carries |vocabulary²-observed|, not |tokens|). */
  def textNgramFreq(s: SparkSession, d: String): DataFrame = {
    // bigram generation via the custom [[graft.functions.TokenNGrams]]
    // Generator — one O(len) pass inside the scan, no intermediate
    // array, immune by construction to the HOF capture pitfall this
    // query originally documented (a lambda-captured split() is
    // re-evaluated per ELEMENT: 9.5 s at sf0.1; the guarded-projection
    // HOF got to ~1 s; the generator matches it with less machinery)
    import org.apache.spark.sql.GraftBridge
    t(s, d, "documents")
      .select(GraftBridge.column(graft.functions.TokenNGrams(
        GraftBridge.expression(col("text")), 2)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)
  }

  /** Vocabulary-growth curve (Heaps' law empirically) — cumulative
    * distinct-token count vs cumulative token mass in doc_id order:
    * the diagnostic behind every "never broadcast a vocabulary-sized
    * relation" rule in this repo (it shows the vocabulary genuinely
    * growing with the corpus), and the dedup signal (a flattening curve
    * means new docs add no new language). Each token's first-occurrence
    * doc is one vocabulary-keyed aggregate; the per-doc new-token
    * counts then ride the distributed-CDF recipe — the per-doc relation
    * GROWS with the corpus, so the running totals must not ride a
    * single-partition window: doc_ids are cut into ordered equi-width
    * buckets (ids are dense, so buckets balance; bucket count = the
    * session's shuffle parallelism, so the decomposition widens with
    * the cluster and the prefix-sum algebra is bucket-count-
    * invariant), each bucket prefix-sums locally in parallel (one
    * hash exchange on the bucket id), and a bounded per-bucket total
    * relation — the only empty-partitionBy window — broadcasts the
    * bucket offsets back. All integer, bit-identical to the oracle's
    * naive cumsum. */
  def textVocabGrowth(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val firstDoc = toks.groupBy(col("tok"))
      .agg(min(col("doc_id")).as("first_doc"))
    val newPerDoc = firstDoc.groupBy(col("first_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_new"))
    val tokPerDoc = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"))
    val perDoc = tokPerDoc.join(newPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val bounds = perDoc
      .agg(min(col("doc_id")).as("__lo"), max(col("doc_id")).as("__hi"))
    val nBuckets = graft.queries.Ordered.defaultParts(s)
    val bucketed = perDoc.crossJoin(broadcast(bounds))
      .withColumn("__bkt", expr(
        s"""CAST(((CAST(doc_id AS BIGINT) - __lo) * $nBuckets)
           | DIV (CAST(__hi AS BIGINT) - __lo + 1) AS INT)""".stripMargin))
    val localW = Window.partitionBy(col("__bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefixW = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("__bkt"))
      .agg(sum(col("n_toks")).as("__t"), sum(col("n_new")).as("__v"))
      .withColumn("__ot", coalesce(sum(col("__t")).over(prefixW), lit(0L)))
      .withColumn("__ov", coalesce(sum(col("__v")).over(prefixW), lit(0L)))
      .select(col("__bkt"), col("__ot"), col("__ov"))
    bucketed
      .withColumn("__ct", sum(col("n_toks")).over(localW))
      .withColumn("__cv", sum(col("n_new")).over(localW))
      .join(broadcast(offsets), "__bkt")
      .select(col("doc_id"),
        (col("__ot") + col("__ct")).as("cum_tokens"),
        (col("__ov") + col("__cv")).as("vocab_size"))
      .orderBy(col("doc_id"))
  }

  /** Per-document bigram-LM negative log-likelihood — THE perplexity
    * quality filter every pretraining pipeline runs (docs the corpus LM
    * finds surprising are boilerplate, garbled, or off-distribution).
    * The corpus bigram/unigram tables come from the [[graft.functions
    * .TokenNGrams]] generator (one O(len) pass in the scan stage); the
    * per-doc score joins each bigram to its Laplace-smoothed
    * conditional, ln((c_bg + 1)/(c_uni + V)). Both LM tables are
    * vocabulary-sized — shuffle joins, never broadcast (Heaps' law).
    * Each log term is rounded to DECIMAL(18,6) BEFORE the per-doc sum
    * (the agg_entropy discipline), so the irrational parts sum
    * order-independently and both engines agree exactly. Docs with < 2
    * tokens have no bigrams and drop out (documented). */
  def textPerplexity(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val docs = t(s, d, "documents")
    val bigrams = docs.select(col("doc_id"),
      GraftBridge.column(graft.functions.TokenNGrams(
        GraftBridge.expression(col("text")), 2)).as("bigram"))
    val bgCounts = bigrams.groupBy(col("bigram"))
      .agg(count(lit(1)).as("c_bg"))
    val unis = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c_uni"))
    val vocab = unis.agg(count(lit(1)).as("v"))
    bigrams
      .join(bgCounts, "bigram")
      .withColumn("tok", substring_index(col("bigram"), " ", 1))
      .join(unis, "tok")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        expr("CAST(ROUND(ln((c_bg + 1.0) / (c_uni + v)), 6) AS DECIMAL(18,6))")
          .as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("slp"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("ROUND(-CAST(slp AS DOUBLE) / n_bigrams, 4)").as("nll"))
      .orderBy(col("doc_id"))
  }

  /** Karp-Rabin polynomial rolling hash over the token stream
    * (acc·B + h(token) mod M) — the order-sensitive complement of the
    * min/max-token fingerprint above: equal only when token SEQUENCES
    * match, so it catches reorderings that set-style fingerprints miss.
    * Token hash = first 8 md5 hex digits (portable across engines);
    * one fold over the split array, single codegen'd stage. */
  def docRollingHash(s: SparkSession, d: String): DataFrame = {
    val M = 1000000007L
    val tokHashes = transform(split(col("text"), " "),
      tk => conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % M)
    t(s, d, "documents")
      .select(
        col("doc_id"),
        aggregate(tokHashes, lit(0L),
          (acc, v) => (acc * 31L + v) % M).as("rh"))
      .orderBy(col("doc_id"))
  }

  /** PII redaction (training-data scrubbing): email and phone patterns
    * replaced with placeholder tags. The PII-bearing text is synthesized
    * deterministically from the fixture (it contains none) so the oracle
    * can replay; a single codegen'd regex stage either way. */
  def textPiiRedact(s: SparkSession, d: String): DataFrame = {
    val txt = concat(
      lit("u"), col("doc_id").cast("string"), lit("@ex.com said "),
      substring(col("text"), 1, 40), lit(" call 555-01"),
      lpad((col("doc_id") % 100).cast("string"), 2, "0"))
    t(s, d, "documents")
      .select(
        col("doc_id"),
        regexp_replace(
          regexp_replace(txt,
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
          "\\d{3}-\\d{4,}", "<PHONE>").as("redacted"))
      .orderBy(col("doc_id"))
  }

  /** Edit distance between the actual source tag and a derived guess —
    * levenshtein exists natively in both engines. The guess uses
    * doc_id % 7 where the source tag is doc_id % 20: the two residues
    * agree for some ids and diverge by 1-2 digit edits for others, so
    * lev discriminates (the original % 20 guess reproduced the source
    * EXACTLY and lev was constant 0 at every sf — round-11
    * degeneracy lint). */
  def textEditDistance(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("guess", concat(lit("src"), (col("doc_id") % 7).cast("string")))
      .select(
        col("doc_id"), col("source"), col("guess"),
        levenshtein(col("source"), col("guess")).as("lev"),
        (col("source") === col("guess")).as("exact"))
      .orderBy(col("doc_id"))

  /** Compression-ratio quality signal (CCNet/RefinedWeb): estimated
    * compressed-size fraction per document. Very compressible
    * (ratio ≪ 1) means repetitive boilerplate; near-incompressible
    * (ratio ≈ 1) means noise/binary junk — both tails are filter
    * candidates. Since round 5 the QUERY reports the zeroth-order
    * entropy estimate H₀/8 bits-per-byte (the information-theoretic
    * floor any byte-level coder approaches), which is exact-integer
    * derivable and therefore ORACLED — the agg_entropy rounding
    * discipline (per-(doc,char) round-then-decimal before the sum)
    * makes the irrational terms order-independent cross-engine. The
    * true deflate-length variant stays available as
    * [[textDeflateRatio]] (spec-covered; DuckDB has no deflate, so it
    * cannot gate). */
  def textCompressionRatio(s: SparkSession, d: String): DataFrame = {
    val counts = t(s, d, "documents")
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        explode(split(col("text"), "")).as("ch"))
      // Spark's split uses Java limit -1, which keeps the zero-width
      // trailing match as an empty element; DuckDB's char split has no
      // such artifact — drop it so both engines count |text| chars
      .filter(col("ch") =!= "")
      .groupBy(col("doc_id"), col("n_bytes"), col("ch"))
      .agg(count(lit(1)).as("c"))
      .select(col("doc_id"), col("n_bytes"), col("c"),
        round(col("c") * log(col("c").cast("double")), 6)
          .cast("decimal(20,6)").as("clnc"))
    counts.groupBy(col("doc_id"), col("n_bytes"))
      .agg(sum(col("c")).cast("long").as("n_chars"),
        sum(col("clnc")).as("sclnc"))
      .select(col("doc_id"), col("n_bytes"), col("n_chars"),
        round((log(col("n_chars").cast("double")) -
          col("sclnc").cast("double") / col("n_chars")) /
          lit(8 * math.log(2.0)), 4).as("est_ratio"))
      // flag thresholds 0.5 / 0.52: the closed 31-word alnum corpus
      // confines H0/8 to [0.43, 0.534] at every sf, so the generic
      // web-corpus cuts (0.3 / 0.9) froze the verdict at 'ok' for
      // every document — a round-12 constant-label lint find. Filter
      // thresholds are corpus-tuned in production (CCNet cuts at
      // percentiles of the crawl); these sit at this fixture's ~p15
      // and ~p93 so all three labels appear at every sf. The flag
      // compares the ALREADY-ROUNDED est_ratio (a gate-verified
      // bit-identical double), so the label can never straddle
      // engines.
      .withColumn("flag",
        when(col("est_ratio") < 0.5, lit("repetitive"))
          .when(col("est_ratio") > 0.52, lit("incompressible"))
          .otherwise(lit("ok")))
      .orderBy(col("doc_id"))
  }

  /** True deflate compression ratio via the custom
    * [[graft.functions.DeflateLength]] expression — one codegen'd
    * projection, zero shuffles; the compressed bytes never materialize,
    * only their length. Library surface + CurationSpec coverage (no
    * oracle possible: DuckDB has no deflate). */
  def textDeflateRatio(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val defLen = GraftBridge.column(
      graft.functions.DeflateLength(GraftBridge.expression(col("text"))))
    t(s, d, "documents")
      .select(col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        defLen.as("deflate_len"))
      .withColumn("ratio",
        round(col("deflate_len").cast("double") /
          greatest(col("n_bytes"), lit(1)), 4))
      .withColumn("flag",
        when(col("ratio") < 0.3, lit("repetitive"))
          .when(col("ratio") > 0.9, lit("incompressible"))
          .otherwise(lit("ok")))
      .orderBy(col("doc_id"))
  }

  /** Char-trigram language identification, self-trained: per-language
    * trigram profiles (top-50 character 3-grams by corpus frequency,
    * deterministic (count desc, trigram asc) tiebreak) are built from
    * the labeled corpus, then every document is classified by profile
    * overlap — |doc's distinct trigrams ∩ lang profile| — argmax with
    * lang-asc tiebreak. Output is the confusion matrix. This is the
    * real n-gram langid shape (fastText/CLD-style features); logic is
    * ALL-INTEGER so the oracle matches exactly.
    *
    * Scale shape: profiles are bounded (50 × |langs|) and broadcast;
    * the corpus is scanned twice (train, classify) with the trigram
    * explode inside each scan stage; no corpus-sized shuffle except
    * the (doc × candidate-lang) overlap aggregate, whose keys are
    * |docs|·|langs|. The per-element substring lambda is O(1) per
    * char (unlike a split() capture — see dedup_containment note). */
  def textCharLangId(s: SparkSession, d: String): DataFrame = {
    // Trigrams come from the custom [[graft.functions.CharNGrams]]
    // Generator: one O(len) pass per row INSIDE the scan stage — no
    // shuffle at all. (History: a substring-in-transform lambda is
    // O(len²)/row via UTF8String seeks + explode-inferred filter
    // inlining; the posexplode+lead()-window rewrite fixed that but
    // still paid a full corpus exchange for the window sort. The
    // generator removes that exchange: 7.1 s → 2.3 s → 1.4 s warm at
    // sf0.1.)
    // Round-15 shape audit (tools/LangIdAb A/B, warm run3 at sf0.1):
    // the two-pass/no-spread shape below is the best of three tried —
    // a shared cached (doc, lang, g, n) count table paid ~3× the
    // second generator pass in InMemory columnar encode, and a
    // round-robin spread of the single-split scan RAISED process CPU
    // 6.5 → 15-25 s (32 concurrent generator tasks' allocation/GC
    // pressure) for no wall win. The serial generate is cheap enough
    // that the downstream aggregates dominate.
    def trigrams: DataFrame = {
      import org.apache.spark.sql.GraftBridge
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          GraftBridge.column(graft.functions.CharNGrams(
            GraftBridge.expression(col("text")), 3)).as("g"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("g").asc)
    val profile = trigrams.groupBy(col("lang"), col("g"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 50)
      .select(col("lang").as("profile_lang"), col("g"))
    // distinct() BEFORE the profile join is load-bearing: the top-50
    // profile trigrams are by construction the most FREQUENT ones, so
    // a join-first + countDistinct shape floods the aggregate with the
    // raw matched-occurrence stream (multiplied per profile lang that
    // shares g) — measured 1.7 → 4.0 s at sf0.1 when tried (round 14).
    // The per-doc distinct map-side-combines to the small (doc, g) set
    // before its one exchange; the overlap aggregate's keys are then
    // only |docs|·|langs|.
    val docTg = trigrams
      .select(col("doc_id"), col("lang"), col("g"))
      .distinct()
    val overlap = docTg.join(broadcast(profile), "g")
      .groupBy(col("doc_id"), col("lang"), col("profile_lang"))
      .agg(count(lit(1)).as("overlap"))
    val byOverlap = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("overlap").desc, col("profile_lang").asc)
    overlap
      .withColumn("rn", row_number().over(byOverlap))
      .filter(col("rn") === 1)
      .groupBy(col("lang"), col("profile_lang").as("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("lang_pred"))
  }

  /** Token burstiness — the variance-to-mean ratio of within-document
    * token frequencies: uniform prose sits near the Poisson baseline
    * (VMR≈1), keyword-stuffed or repetitive text spikes. Computed from
    * EXACT integer moments of the per-(doc, token) counts (k types,
    * Σf, Σf²) with one closing double formula — the same
    * order-independence discipline as the other corpus stats. Two
    * hash aggregates keyed by (doc, token) then doc. */
  def textBurstiness(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("f"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("k"),
        sum(col("f")).as("s1"),
        sum(col("f") * col("f")).as("s2"))
      .filter(col("k") > 1)
      .select(col("doc_id"), col("k"), col("s1").as("n_tokens"),
        round(
          ((col("s2").cast("double") -
            col("s1").cast("double") * col("s1").cast("double") /
              col("k")) / (col("k") - lit(1))) /
            (col("s1").cast("double") / col("k")), 4).as("vmr"))
      .orderBy(col("doc_id"))

  /** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken —
    * SIGMOD'03, the MOSS algorithm): per document, hash every k=3-token
    * gram, then in each window of w=4 consecutive gram hashes keep the
    * MINIMUM (rightmost on ties) — the canonical local fingerprinting
    * scheme with the guarantee that any verbatim match of at least
    * w + k - 1 tokens shares a selected fingerprint, at an expected
    * 2/(w+1) selection density. The third member of the fingerprint
    * family: [[docFingerprint]] is set-style (order-blind),
    * [[docRollingHash]] is whole-sequence, winnowing is POSITION-LOCAL
    * — the index shape that feeds substring-match detection
    * ([[Dedup.dedupSubstringSpans]] is the exhaustive-gram variant).
    *
    * Plan shape: one scan emits (doc, pos, gram-hash) via an O(len)
    * array transform; the rightmost-min-per-window selection is a
    * min() over a CONSTANT-width trailing ROWS frame partitioned by
    * doc (O(w)/row, w=4 — bounded, unlike the banned corpus-growing
    * sliding RANGE frames; no global window anywhere). Tie-break is
    * integer-encoded — key = h·10⁶ + (10⁶ − pos), min-key = min hash
    * then max pos — so both engines compare identical BIGINTs (no
    * cross-engine struct-ordering dependency). Docs are assumed
    * < 10⁶ grams (the encoding stride); fixture max is ~10³.
    * Output is the per-doc fingerprint summary (count, density,
    * checksum) so the gate row stays narrow; the selected set itself
    * is the distinct (pos, hash) pairs. */
  def textWinnowing(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 3
    val w = 4
    val stride = 1000000L
    // gram (pos, md5-prefix hash) rows from the compiled
    // [[graft.functions.TokenGramMd5]] generator (round 15: the
    // transform/slice/array_join/md5-hex fan was interpreted per
    // gram). Docs under k + w - 1 tokens fall out at the rn >= w
    // full-window filter exactly as the former size() pre-filter.
    val grams = t(s, d, "documents")
      .select(col("doc_id"),
        org.apache.spark.sql.GraftBridge.column(
          graft.functions.TokenGramMd5(
            org.apache.spark.sql.GraftBridge.expression(col("text")),
            k, 10))
          .as(Seq("pos", "h")))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val sel = grams
      .withColumn("key",
        col("h") * stride + (lit(stride) - col("pos")))
      .withColumn("mk", min(col("key")).over(byDoc.rowsBetween(-(w - 1), 0)))
      .withColumn("rn", row_number().over(byDoc))
      .filter(col("rn") >= w) // full windows only
      .select(col("doc_id"), col("mk"))
      .distinct()
    val nWin = grams.groupBy(col("doc_id"))
      .agg((count(lit(1)) - lit(w - 1)).as("n_windows"))
    sel.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fingerprints"),
        sum(expr(s"mk div ${stride}L")).as("fp_hash_sum"),
        max(lit(stride) - col("mk") % stride).as("last_fp_pos"))
      .join(nWin, "doc_id")
      .select(col("doc_id"), col("n_windows"), col("n_fingerprints"),
        round(col("n_fingerprints").cast("double") / col("n_windows"), 4)
          .as("density"),
        col("fp_hash_sum"), col("last_fp_pos"))
      .orderBy(col("doc_id"))
  }

  /** BPE merge-candidate statistics — the inner loop of byte-pair-
    * encoding vocabulary training (Sennrich et al., ACL'16): count
    * adjacent symbol pairs across the corpus (here the first
    * iteration: character bigrams inside words), weighted by word
    * frequency, and emit the top merge candidates. The trainer would
    * merge rank 1, re-count, repeat; one iteration is the
    * representative Spark shape because every iteration is this same
    * job on a rewritten vocabulary.
    *
    * Scale shape: tokens collapse to the DISTINCT-word vocabulary
    * FIRST (one corpus shuffle on the word), so the bigram explosion
    * runs over vocabulary-sized data (Heaps-law sublinear), weighted
    * by the exact word counts; pair totals are a second (tiny)
    * aggregate and selection is a TakeOrderedAndProject heap. The
    * corpus text itself is never exploded to character grams. */
  def tokenizeBpeMerges(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val k = 20
    val words = t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    words
      .select(col("n_w"),
        GraftBridge.column(graft.functions.CharNGrams(
          GraftBridge.expression(col("w")), 2)).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("n_w")).as("n_pair"),
        count(lit(1)).as("n_slots"))
      .orderBy(col("n_pair").desc, col("pair").asc)
      .limit(k)
      .orderBy(col("pair"))
  }

  /** Gopher-rule quality filter (Rae et al. 2021, "Scaling Language
    * Models", table A1): word-count bounds, mean-word-length band,
    * symbol-to-word ratio (# and ...), alphabetic-word fraction, and a
    * minimum distinct-stopword count. Every rule is evaluated in pure
    * integer arithmetic (mean-len ∈ [3,10] ⇔ 3n ≤ chars ≤ 10n, alpha
    * frac > 0.8 ⇔ 5·n_alpha > 4·n, symbol ratio < 0.1 ⇔ 10·sym < n) so
    * the gate bit-compares with no float rounding at all. One
    * projection over the scan, zero shuffles — the canonical
    * embarrassingly-parallel curation pass at 100 TB.
    *
    * Two thresholds are tuned to the fixture grain so the pass/fail
    * boundary is non-vacuous at every sf (docs are 10–99 words with at
    * most one distinct stopword): min words 50 → 30 and min distinct
    * stopwords 2 → 1. The rule STRUCTURE is Gopher's; production runs
    * would restore the paper's constants. */
  def textGopherQuality(s: SparkSession, d: String): DataFrame = {
    val stops = "'the','be','to','of','and','that','have','with'"
    t(s, d, "documents")
      .withColumn("words",
        expr("filter(split(lower(text), '\\\\s+'), w -> w != '')"))
      .withColumn("n_words", size(col("words")).cast("long"))
      .withColumn("word_chars",
        expr("aggregate(words, 0L, (a, w) -> a + length(w))"))
      .withColumn("n_alpha",
        expr("size(filter(words, w -> w rlike '[a-z]'))").cast("long"))
      .withColumn("n_symbols",
        (length(col("text")) -
          length(regexp_replace(col("text"), "#", ""))).cast("long") +
          expr("(length(text) - length(replace(text, '...', ''))) div 3"))
      .withColumn("stop_hits",
        expr(s"size(filter(array($stops), sw -> array_contains(words, sw)))")
          .cast("long"))
      .select(
        col("doc_id"), col("n_words"), col("word_chars"),
        col("n_alpha"), col("n_symbols"), col("stop_hits"),
        (col("n_words").between(30L, 100000L) &&
          col("word_chars") >= col("n_words") * 3L &&
          col("word_chars") <= col("n_words") * 10L &&
          col("n_symbols") * 10L < col("n_words") &&
          col("n_alpha") * 5L > col("n_words") * 4L &&
          col("stop_hits") >= 1L).as("passes"))
      .orderBy(col("doc_id"))
  }

  /** Stopword-mass ratio per (lang, source) — the classic C4/CCNet
    * language-confidence companion signal: real prose carries a
    * stable few percent of function-word mass, while boilerplate,
    * code, and mis-identified text carry almost none. Reported as an
    * aggregate quality profile per corpus slice (the curation
    * dashboard view), plus a per-doc pass count for the gate
    * "stopword mass ≥ 4%", decided in EXACT integer arithmetic
    * (25·n_stop ≥ n_tok ⇔ ratio ≥ 0.04) so the pass/fail bit can
    * never float-diverge across engines.
    *
    * Distinct from [[textGopherQuality]], which gates on the count of
    * DISTINCT stopwords present; this measures token MASS — the two
    * catch different failure modes (a doc repeating "the" 50 times
    * passes Gopher's distinct-count rule but reveals itself here).
    *
    * Float discipline: integer token/stopword counts, integer gate,
    * exact integer sums per group; ONE closing double division,
    * rounded once. Scale shape: one projection over the scan (the
    * stopword filter is an O(len) array op per row, no explode), one
    * map-side-combined aggregate to the bounded (lang × source) value
    * space. Zero corpus-sized shuffles. */
  def textStopwordRatio(s: SparkSession, d: String): DataFrame = {
    val stops = "'the','be','to','of','and','that','have','with','it','is'"
    t(s, d, "documents")
      .withColumn("toks",
        expr("filter(split(lower(text), ' '), w -> w != '')"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("n_stop",
        expr(s"size(filter(toks, w -> w IN ($stops)))").cast("long"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_stop")).as("n_stopwords"),
        sum(when(col("n_stop") * 25L >= col("n_tok"), 1L).otherwise(0L))
          .as("n_pass"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        col("n_stopwords"), col("n_pass"),
        round(col("n_stopwords").cast("double") / col("n_tokens"), 6)
          .as("stop_ratio"))
      .orderBy(col("lang"), col("source"))
  }

  /** Out-of-vocabulary rate per language against the corpus top-100
    * token vocabulary — the tokenizer-coverage diagnostic run before
    * committing a vocab: a slice whose OOV mass is high will shatter
    * into byte-level fallbacks at training time (token-budget blowup,
    * degraded quality), so per-slice OOV rates decide vocab size and
    * language mix. Shares [[tokenizeToIds]]'s vocabulary definition
    * exactly (count desc, token asc, top-100 — total order, so the
    * rank-100 cut is deterministic in both engines).
    *
    * Scale shape: the vocab is a bounded TakeOrderedAndProject head
    * over a hash aggregate (broadcast-sized at any corpus), the
    * membership probe is a broadcast left join inside the token scan,
    * and the rollup is one map-side-combined aggregate to |langs|
    * rows. Float discipline: integer token/OOV counts, one closing
    * double division, rounded once. */
  def textOovRate(s: SparkSession, d: String): DataFrame = {
    val toks = t(s, d, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
    // vocab cut at 10: the synthetic corpus has only ~31 distinct
    // tokens, so the previous top-100 cut covered EVERYTHING and the
    // OOV rate was identically 0 (round-10 degeneracy audit)
    val vocab = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(10)
      .select(col("tok"), lit(1).as("inv"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("inv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("lang"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6)
          .as("oov_rate"))
      .orderBy(col("lang"))
  }

  /** Feature-hashing (hashing-trick) collision audit — the check run
    * before shipping a hashed feature space (Weinberger et al. 2009):
    * map every distinct token to one of 256 buckets by a 24-bit md5
    * prefix mod 256, then measure the load each bucket carries
    * (distinct tokens = collision count, occurrences = mass). The
    * audit decides the bucket count: a bucket holding many distinct
    * high-mass tokens aliases unrelated features and hurts the model;
    * doubling buckets halves expected collisions.
    *
    * Scale shape: one token aggregate (vocab-sized — the Heaps'-law
    * relation, bounded far below the corpus), one hash aggregate to
    * exactly ≤256 rows. All integer: hash prefix, mod, counts; no
    * float anywhere. */
  def textFeatureHash(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .select(
        (md5Prefix(col("tok"), 6) % 256).as("bucket"),
        col("n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_distinct_tokens"),
        sum(col("n")).as("n_occurrences"))
      .orderBy(col("bucket"))

  /** Burrows' DELTA (Burrows 2002; Evert et al. 2017 for the modern
    * treatment) — the stylometric distance between SOURCES that
    * authorship attribution standardized on: z-score each source's
    * relative frequency of the k = 10 most common corpus words
    * (function words carry style, not topic), then Delta(a, b) =
    * mean |z_a − z_b| over those words. The source × source distance
    * matrix is the "which feeds share a template/author" triage next
    * to [[textSourceVocabJaccard]]'s set view. Exactness: counts and
    * token totals are integers; relative frequencies are round-6
    * DECIMALs; per word the z-score uses the cross-multiplied form
    * z = (ns·f − Σf)/√(ns·Σf² − (Σf)²) whose numerator and
    * discriminant are EXACT decimals (no rational mean enters — the
    * window_page_hinkley discipline), one sqrt per word, one round;
    * the pair sum Σ|z_a − z_b| is an exact decimal sum and the
    * closing mean is one division. A zero discriminant (a word
    * equally frequent in every source) contributes z = 0 — it
    * carries no style signal, documented. Scale: corpus-sized work
    * is ONE token scan feeding a vocab-bounded count (top-k selected
    * before the per-source aggregate, so an open vocabulary never
    * reaches the z stage) + one (source, word) aggregate; everything
    * after lives on |sources|·k rows. */
  def textBurrowsDelta(s: SparkSession, d: String): DataFrame = {
    val toks = t(s, d, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val top = toks.groupBy(col("w")).agg(count(lit(1)).as("cw"))
      .orderBy(col("cw").desc, col("w")).limit(10)
      .select(col("w"))
    val srcTok = toks.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val cw = toks.join(broadcast(top), Seq("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    // relative frequencies ride as INTEGER MICROS — fi =
    // round(10⁶·c/n) computed entirely in integer arithmetic
    // ((2a+b) DIV 2b), so sf/sf2/disc stay exact BIGINT/int128
    // quantities in both engines (a first cut summed DECIMAL(18,6)
    // squares: Spark clamps the Σf·Σf product at precision 38 while
    // DuckDB promotes differently — 6th-decimal drift at every sf)
    val f = srcTok.crossJoin(broadcast(top))
      .join(cw, Seq("source", "w"), "left")
      .select(col("source"), col("w"),
        expr("""(2 * COALESCE(c, 0) * 1000000 + n) DIV (2 * n)""")
          .as("fi"))
    val stats = f.groupBy(col("w"))
      .agg(count(lit(1)).as("ns"), sum(col("fi")).as("sf"),
        sum(col("fi") * col("fi")).as("sf2"))
      .withColumn("disc", expr(
        """CAST(ns AS DECIMAL(19,0)) * CAST(sf2 AS DECIMAL(19,0))
          | - CAST(sf AS DECIMAL(19,0)) * CAST(sf AS DECIMAL(19,0))"""
          .stripMargin))
    val z = f.join(broadcast(stats), Seq("w"))
      .select(col("source"), col("w"),
        expr("""CASE WHEN disc = 0 THEN CAST(0 AS DECIMAL(18,6))
                ELSE CAST(ROUND(CAST(ns * fi - sf AS DOUBLE)
                     / SQRT(CAST(disc AS DOUBLE)), 6)
                  AS DECIMAL(18,6)) END""").as("z"))
    z.as("a").join(z.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("k"),
        sum(expr("abs(a.z - b.z)")).as("sd"))
      // the closing mean rounds in EXACT integer micro space
      // ((2a+b) DIV 2b) — ROUND after a double division straddled a
      // representability midpoint on one sf0.001 pair
      .select(col("source_a"), col("source_b"),
        expr("""CAST((2 * CAST(sd * 1000000 AS DECIMAL(38,0)) + k)
                DIV (2 * k) AS DOUBLE) / 1000000""").as("delta"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Stylometric surface features per document — the register
    * fingerprints that feed style-aware curation and bot/boilerplate
    * triage next to [[textQualityScore]]'s fluency gates. The four
    * densities are chosen to CARRY SIGNAL on this corpus (round-10
    * degeneracy audit: the synthetic text is all-lowercase
    * letters + spaces, so caps/digit/punct densities are structurally
    * zero here — mean word length, short-word share, vowel density
    * and whitespace density all vary): every count is an exact
    * integer from one regex class count; each ratio closes in one
    * division. Pure in-scan projection, no shuffle. */
  def textStylometrics(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        regexp_count(col("text"), lit("[aeiou]")).cast("long")
          .as("n_vowels"),
        regexp_count(col("text"), lit(" ")).cast("long").as("n_spaces"),
        regexp_count(col("text"), lit("\\b[a-z]{1,2}\\b")).cast("long")
          .as("n_short"),
        regexp_count(col("text"), lit("[a-zA-Z0-9]")).cast("long")
          .as("n_alnum"),
        size(split(col("text"), " ")).cast("long").as("n_words"))
      .select(col("doc_id"), col("n_chars"), col("n_words"),
        expr("ROUND(CAST(n_vowels AS DOUBLE) / n_alnum, 6)")
          .as("vowel_ratio"),
        expr("ROUND(CAST(n_spaces AS DOUBLE) / n_chars, 6)")
          .as("space_ratio"),
        expr("ROUND(CAST(n_short AS DOUBLE) / n_words, 6)")
          .as("short_word_ratio"),
        expr("ROUND(CAST(n_alnum AS DOUBLE) / n_words, 4)")
          .as("avg_word_len"))
      .orderBy(col("doc_id"))

  /** The literal weight vector of the linear quality classifier — the
    * "trained model state" that ships WITH the job (the kmeans_assign
    * precedent: bounded model state as plan literals, never a join
    * against a weights table). 64 hashed-feature buckets (the
    * [[textFeatureHash]] space at 1/4 width), INTEGER micro-units
    * (w·10⁶) so every per-doc sum is an exact BIGINT; the generator
    * formula is just a compact way to write 64 fixed constants — the
    * oracle mirrors the identical closed form. */
  private val clfWeights: Array[Long] =
    Array.tabulate(64)(b => ((31L * b * b + 17L * b) % 2001L - 1000L) * 200L)

  /** Hashed-bag-of-words weight lookup: md5-prefix bucket (the
    * text_feature_hash hash) → literal weight. Pure codegen'd scan
    * work — the 64-element literal array folds into the plan. */
  /** Compiled md5-prefix bucket ([[graft.functions.Md5Prefix]]) —
    * bit-identical to CAST(conv(substring(md5(c), 1, nHex), 16, 10)
    * AS BIGINT) without the per-row hex-string round-trip. */
  private def md5Prefix(c: Column, nHex: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.functions.Md5Prefix(
      GraftBridge.expression(c), nHex))
  }

  private def clfWeightCol(tok: Column): Column =
    element_at(
      array(clfWeights.map(lit(_)): _*),
      ((md5Prefix(tok, 6) % 64L) + 1L).cast("int"))

  /** Per-doc classifier evidence: token count and the exact integer
    * weight sum. One (doc_id) hash aggregate with map-side combine —
    * the only shuffle the classifier ever does; the margin and the
    * keep decision both close over these two integers. */
  private def clfDocScores(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), col("lang"), clfWeightCol(col("tok")).as("w"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("sum_w"))

  /** ONE distributed training step of the hashed linear classifier —
    * the logistic-regression gradient pass that PRODUCES weights like
    * [[clfWeights]] (label: lang = 'en'; features: the same 64-bucket
    * hashed bag-of-words, mean-normalized): per doc, the margin and
    * σ(margin) come from exact integer evidence; per (doc, bucket),
    * the gradient contribution (σ(m)−y)·x/n is ONE deterministic
    * double expression ROUNDED then DECIMAL-summed per bucket (the
    * round-then-decimal discipline — gradient accumulation never
    * depends on partition order, the property a naive float SUM of
    * per-doc gradients silently lacks), and the SGD update closes per
    * bucket. Scale: one (doc, bucket) aggregate, one doc-keyed join,
    * one 64-row gradient aggregate — the textbook data-parallel
    * gradient shape (state O(buckets), never O(corpus)). */
  def textClassifierTrainStep(s: SparkSession, d: String): DataFrame = {
    val perDoc = clfDocScores(s, d)
      .select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        col("n_tokens"), col("sum_w"))
      .withColumn("err", expr(
        """1e0 / (1e0 + EXP(0e0 - CAST(sum_w AS DOUBLE)
          | / (1000000e0 * n_tokens))) - y""".stripMargin))
    val perDocBucket = t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"),
        (md5Prefix(col("tok"), 6) % 64L).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("x"))
    perDocBucket.join(perDoc, "doc_id")
      .withColumn("contrib", expr(
        """CAST(ROUND(err * x / CAST(n_tokens AS DOUBLE), 6)
          |  AS DECIMAL(24,6))""".stripMargin))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs_touched"),
        sum(col("contrib")).as("g_sum"))
      .withColumn("w_old",
        element_at(array(clfWeights.map(lit(_)): _*),
          (col("bucket") + 1L).cast("int")))
      .select(col("bucket"), col("n_docs_touched"), col("w_old"),
        expr("ROUND(CAST(g_sum AS DOUBLE), 6)").as("gradient"),
        expr("""ROUND(CAST(w_old AS DOUBLE) / 1000000e0
                - 0.1 * CAST(g_sum AS DOUBLE), 6)""").as("w_new"))
      .orderBy(col("bucket"))
  }

  /** BOUNDED SGD TRAINING LOOP — [[textClassifierTrainStep]] iterated
    * k = 3 steps (plus a final evaluation pass), completing the
    * train/infer pair into the loop a curation pipeline actually
    * runs. Iterative discipline (the graph_community_lpa / k-core
    * precedent): the (doc, bucket) design matrix plus per-doc label
    * is INVARIANT across steps, so it is built once and checkpointed
    * ([[graft.llm.Dedup.ckpt]]) — each step then runs exactly two
    * aggregates over it (per-doc margin, per-bucket gradient); the
    * corpus is never rescanned and no step's lineage compounds.
    * Weights are bounded model state (64 longs in integer micro
    * units), collected per step and re-entering the next step's plan
    * as literals (the kmeans_assign precedent) — per-step driver
    * state is O(buckets), never O(corpus). Exactness: margins close
    * over exact BIGINT Σw·x; per-doc loss ln(1+e^((1−2y)·m)) and the
    * gradient contribution are each ONE double expression rounded to
    * 6 dp then DECIMAL-summed (round-then-decimal — no
    * partition-order float sums); the weight update w −
    * round(0.1·g·10⁶) happens in exact decimal micro-units on both
    * engines (java BigDecimal HALF_UP ↔ DuckDB decimal ROUND, both
    * half-away-from-zero). Output: one row per step 0..3 with the
    * loss at the CURRENT weights and the gradient L1 norm — the
    * training curve itself, so the gate (and the degeneracy lint)
    * sees the loss strictly decrease. Oracle: the identical recipe
    * unrolled as 4 CTE generations. */
  def textClassifierTrainLoop(s: SparkSession, d: String): DataFrame = {
    val pdb0 = t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        (md5Prefix(col("tok"), 6) % 64L).as("bucket"))
      .groupBy(col("doc_id"), col("y"), col("bucket"))
      .agg(count(lit(1)).as("x"))
    val pdb = graft.llm.Dedup.ckpt(pdb0, rebuild = false)
    def wCol(w: Array[Long]): Column =
      element_at(array(w.map(lit(_)): _*),
        (col("bucket") + 1L).cast("int"))
    var w = clfWeights
    val curve = Seq.newBuilder[(Long, Double, Double)]
    for (step <- 0 to 3) {
      val perDoc = pdb.groupBy(col("doc_id"), col("y"))
        .agg(sum(wCol(w) * col("x")).as("swx"),
          sum(col("x")).as("nt"))
      // ONE collected job per step (round 15): the loss reduce rides the
      // gradient aggregate as a broadcast 1-row cross join — the former
      // two collects serialized 8 jobs over the checkpointed design
      // matrix into the step loop's critical path
      val lossRow = perDoc
        .select(expr(
          """CAST(ROUND(LN(1e0 + EXP((1 - 2 * y)
            |  * (CAST(swx AS DOUBLE) / (1000000e0 * nt)))), 6)
            |  AS DECIMAL(24,6))""".stripMargin).as("l"))
        .agg(sum(col("l")).as("ls"), count(lit(1)).as("n"))
      val stepRows = pdb.join(perDoc.select(col("doc_id"), col("nt"), expr(
          """1e0 / (1e0 + EXP(0e0 - CAST(swx AS DOUBLE)
            |  / (1000000e0 * nt))) - y""".stripMargin).as("err")),
          "doc_id")
        .withColumn("contrib", expr(
          """CAST(ROUND(err * x / CAST(nt AS DOUBLE), 6)
            |  AS DECIMAL(24,6))""".stripMargin))
        .groupBy(col("bucket")).agg(sum(col("contrib")).as("g"))
        .crossJoin(broadcast(lossRow))
        .collect()
      val loss = stepRows(0).getDecimal(2).doubleValue() /
        stepRows(0).getLong(3)
      val g = Array.fill(64)(java.math.BigDecimal.ZERO)
      stepRows.foreach(r => g(r.getLong(0).toInt) = r.getDecimal(1))
      val l1 = g.map(_.abs).reduce(_.add(_))
      curve += ((step.toLong, loss, l1.doubleValue()))
      if (step < 3)
        w = w.zipWithIndex.map { case (wv, b) =>
          wv - g(b).multiply(new java.math.BigDecimal(100000))
            .setScale(0, java.math.RoundingMode.HALF_UP)
            .longValueExact()
        }
    }
    s.createDataFrame(curve.result())
      .toDF("step", "loss", "grad_l1")
      .orderBy(col("step"))
  }

  /** Linear quality-classifier INFERENCE (the fastText-supervised
    * filter shape, Joulin et al. 2017: hashed bag-of-words × a linear
    * model, score = mean feature weight) — the standard learned-filter
    * step between the rule-based gates (gopher/stopword) and dedup in
    * a training-data pipeline. Weights are model-state literals
    * ([[clfWeights]]); the margin is sum_w/(10⁶·n_tokens); the keep
    * decision margin ≥ −0.04 (the measured 30th percentile of the
    * corpus margin distribution) is taken in the exact INTEGER
    * cross-multiplication 25·sum_w ≥ −10⁶·n_tokens, so no float ever
    * enters a filter. Per-lang audit output: doc counts, kept counts,
    * keep rate and the corpus-weighted mean margin, each closing in
    * ONE double expression over exact integer moments.
    * Scale: in-scan weight lookup, one (doc) aggregate, one ≤|langs|
    * aggregate — zero shuffles beyond the two aggregates; the model
    * rides the plan, so 1000 executors each score locally. */
  def textQualityClassifier(s: SparkSession, d: String): DataFrame =
    clfDocScores(s, d)
      .withColumn("kept",
        (col("sum_w") * 25L >= col("n_tokens") * -1000000L).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("kept")).as("n_kept"),
        sum(col("sum_w")).as("sw"),
        sum(col("n_tokens")).as("nt"))
      .select(col("lang"), col("n_docs"), col("n_kept"),
        expr("ROUND(CAST(n_kept AS DOUBLE) / n_docs, 6)").as("keep_rate"),
        expr("ROUND(CAST(sw AS DOUBLE) / (1000000e0 * nt), 6)")
          .as("avg_margin"))
      .orderBy(col("lang"))

  /** [[compositeCuration]] with the learned filter wired in between
    * the rule gates and dedup — the full modern curation chain
    * (heuristics → classifier → exact dedup, the C4→fastText→dedup
    * ordering): rule survivors join their classifier evidence on
    * doc_id, the integer margin gate drops low-scoring docs, and only
    * THEN do survivors shuffle on the content hash for representative
    * selection. Output adds the per-doc margin. Scale: the join is
    * doc_id ⋈ doc_id on two already-reduced relations (one shuffle
    * each side), dedup unchanged. */
  def compositeCurationClassified(s: SparkSession, d: String): DataFrame = {
    val scores = clfDocScores(s, d)
      .select(col("doc_id"), col("sum_w"), col("n_tokens").as("n_toks_clf"))
    dedupSurvivors(
      ruleGatedDocs(s, d)
        .join(scores, "doc_id")
        .filter(col("sum_w") * 25L >= col("n_toks_clf") * -1000000L))
      .select(col("doc_id"), col("lang"), col("quality"),
        expr("ROUND(CAST(sum_w AS DOUBLE) / (1000000e0 * n_toks_clf), 6)")
          .as("margin"))
      .orderBy(col("doc_id"))
  }

  /** CCNet-style perplexity terciles (Wenzek et al., LREC 2020): rank
    * every document by its LM score ([[textPerplexity]]'s bigram NLL)
    * and cut the corpus into head/middle/tail thirds — the sharding
    * CCNet ships so downstream consumers can sample by fluency
    * (head = most LM-like, tail = noisiest). The tercile is a GLOBAL
    * ntile over (nll, doc_id) — the [[graft.queries.Ordered]]
    * zipWithIndex + closed-form-ntile machinery, proved against the
    * engine NTILE by agg_gains_deciles' oracle and again here (the
    * oracle uses plain NTILE(3)). nll is the round-4 double both
    * engines agree on bit-for-bit, so the ranking can never diverge.
    * Scale: the ranking relation is one row per doc (already reduced
    * by the perplexity aggregate); one range shuffle + one ≤3-row
    * rollup. */
  def textPerplexityBuckets(s: SparkSession, d: String): DataFrame = {
    // checkpointed once (round 15): the per-doc NLL relation feeds the
    // count broadcast, the range-boundary sampling pass AND the ranged
    // shuffle — un-checkpointed, the bigram-NLL corpus aggregate
    // re-ran for each (3 executions at sf0.1)
    val ppl = graft.llm.Dedup.ckpt(textPerplexity(s, d), rebuild = false)
    val withN = ppl.crossJoin(
      broadcast(ppl.agg(count(lit(1)).as("n_all"))))
    val ranked = graft.queries.Ordered
      .withGlobalIndex(withN, Seq(col("nll"), col("doc_id")), "__idx")
      .withColumn("__rank", col("__idx") + 1)
    graft.queries.Ordered
      .ntileFromRank(ranked, "__rank", "n_all", 3, "bucket")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("n_bigrams"),
        min(col("nll")).as("nll_min"),
        max(col("nll")).as("nll_max"))
      .orderBy(col("bucket"))
  }

  /** Monroe–Colaresi–Quinn "Fightin' Words" log-odds with an
    * informative Dirichlet prior — which words distinguish one
    * subcorpus from the rest (here: lang='en' vs all other docs)?
    * The standard curation tool for diagnosing what a filter or a
    * source actually selects for, more robust than raw frequency
    * ratios because the prior (the combined corpus, α_w = y1+y2,
    * α0 = n1+n2) shrinks rare-word noise.
    *
    * With that prior choice every term is a ratio of INTEGER sums:
    * y1+α_w = 2y1+y2 and the denominator n1+α0−y1−α_w = 2n1+n2−2y1−y2,
    * so both engines compute identical doubles inside ONE closing
    * expression (two ln, one sqrt), rounded once.
    *
    * Scale shape: explode → one (word) hash aggregate with map-side
    * combine (conditional sums, no second pass per side); the totals
    * are a 1-row broadcast. Output is vocabulary-sized. */
  def textLogOdds(s: SparkSession, d: String): DataFrame = {
    val perW = t(s, d, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w"))
      .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("y1"),
        sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("y2"))
    val tot = perW.agg(sum(col("y1")).as("n1"), sum(col("y2")).as("n2"))
    perW.crossJoin(broadcast(tot))
      .select(col("w"), col("y1"), col("y2"),
        expr("""ROUND((LN((2*y1 + y2) /
                     CAST(2*n1 + n2 - 2*y1 - y2 AS DOUBLE)) -
                  LN((y1 + 2*y2) /
                     CAST(2*n2 + n1 - y1 - 2*y2 AS DOUBLE))) /
                 SQRT(CAST(1 AS DOUBLE) / (2*y1 + y2) +
                      CAST(1 AS DOUBLE) / (y1 + 2*y2)), 6)""").as("z"))
      .orderBy(col("z").desc, col("w"))
  }

  /** Pairwise vocabulary Jaccard between sources — the corpus-diff
    * matrix ("how much does src3's vocabulary overlap src7's?") that
    * drives source-mix decisions next to [[textLogOdds]]'s per-word
    * view. The (source, token) DISTINCT is the only corpus-sized work
    * (one shuffle); the self-join runs on the distinct vocab relation
    * keyed by token (inverted-index style — pairs meet only on shared
    * tokens, never |V_a|×|V_b|), per-source vocab sizes broadcast
    * back, |A∪B| = |A|+|B|−|A∩B| closes in integers with ONE division
    * per pair. Output is |sources|²-bounded. */
  def textSourceVocabJaccard(s: SparkSession, d: String): DataFrame = {
    val st = t(s, d, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()
    val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("vsz"))
    st.as("a").join(st.as("b"),
        col("a.tok") === col("b.tok") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(broadcast(sizes.select(col("source").as("src_a"),
        col("vsz").as("vsz_a"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"),
        col("vsz").as("vsz_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("n_inter"),
        col("vsz_a"), col("vsz_b"),
        expr("ROUND(n_inter / CAST(vsz_a + vsz_b - n_inter AS DOUBLE), 6)")
          .as("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Corpus-level Flesch-style readability per language — the curation
    * signal that separates listicle/boilerplate prose from long-form.
    * Sentence count = runs of terminal punctuation; syllable proxy =
    * vowel-group runs (the standard dictionary-free heuristic; the char
    * classes are identical literals in Java regex and RE2, so both
    * engines count the same runs). Per-doc counts are integers clamped
    * to ≥1; the Flesch formula closes over PER-LANGUAGE SUMS in one
    * double expression — never an order-dependent float average of
    * per-doc scores. One map-side-combined aggregate to |langs| rows;
    * the regex work is O(len) in-scan. */
  def textReadability(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("w"),
        greatest(
          expr("size(regexp_extract_all(text, '[.!?]+', 0))").cast("long"),
          lit(1L)).as("sn"),
        greatest(
          expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))")
            .cast("long"), lit(1L)).as("y"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_words"),
        sum(col("sn")).as("n_sents"), sum(col("y")).as("n_syll"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_sents"),
        col("n_syll"),
        expr("""ROUND(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
                 - 84.6 * (CAST(n_syll AS DOUBLE) / n_words), 4)""")
          .as("flesch"))
      .orderBy(col("lang"))

  /** Hapax-legomenon profile per language over BIGRAMS: the share of
    * the bigram vocabulary seen exactly once (and twice) — the
    * classic corpus-maturity diagnostic (a high hapax share means the
    * crawl is still surfacing new content; a collapsing one means
    * duplication or exhaustion; complements [[textVocabGrowth]]'s
    * trajectory with a point summary). BIGRAM level is the
    * discriminating cut for this fixture: the closed 31-word unigram
    * vocabulary has at most one corpus-level hapax at any sf (the
    * round-11 zero-counter lint caught `dis` frozen at 0), while the
    * ~960-bigram space leaves 10-110 hapax and 3-110 dislegomena per
    * language at every sf. Bigrams come from the O(len)
    * [[graft.functions.TokenNGrams]] generator inside the scan; one
    * (lang, bigram) count → |langs|-row rollup; all counts integer,
    * one closing double ratio. */
  def textHapaxRatio(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("lang"),
        org.apache.spark.sql.GraftBridge.column(
          graft.functions.TokenNGrams(
            org.apache.spark.sql.GraftBridge.expression(col("text")), 2))
          .as("bigram"))
      .groupBy(col("lang"), col("bigram")).agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("vocab"), sum(col("c")).as("n_bigrams"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("hapax"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("dis"))
      .select(col("lang"), col("vocab"), col("n_bigrams"), col("hapax"),
        col("dis"),
        expr("ROUND(CAST(hapax AS DOUBLE) / vocab, 6)").as("hapax_ratio"))
      .orderBy(col("lang"))

  /** Per-document n-gram novelty in corpus (doc_id) order — the
    * marginal-value curve of new data: what fraction of a document's
    * distinct trigram shingles has never appeared in any earlier
    * document. The running diagnostic behind "this crawl snapshot is
    * exhausted" decisions, complementing [[textVocabGrowth]] (unigram
    * vocabulary) with phrase-level novelty. Shape: shingles come from
    * the O(len) [[graft.functions.TokenNGrams]] generator inside the
    * scan; first ownership is ONE gram-keyed min aggregate; novelty is
    * a join back on the gram key — everything shuffles on gram/doc
    * keys, no windows, no corpus-order scan. */
  def textNgramNovelty(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val grams = t(s, d, "documents")
      .select(col("doc_id"),
        GraftBridge.column(graft.functions.TokenNGrams(
          GraftBridge.expression(col("text")), 3)).as("gram"))
      .distinct()
    val first = grams.groupBy(col("gram"))
      .agg(min(col("doc_id")).as("first_doc"))
    grams.join(first, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        expr("ROUND(CAST(n_novel AS DOUBLE) / n_grams, 6)").as("novelty"))
      .orderBy(col("doc_id"))
  }

  /** Corpus distinct-n diversity (the distinct-1/2 metric of Li et
    * al. '16, generalized to n=1..3) — the degeneracy signal run over
    * generated or scraped text before training on it: a boilerplate-
    * heavy or mode-collapsed corpus shows a low distinct-n ratio long
    * before perplexity moves. One corpus pass: the three gram
    * generators run inside the scan stage (struct-tagged, one
    * explode), then ONE hash aggregate per (n, gram) feeds the
    * distinct/total counts — gram keys shuffle once, Zipf-bounded
    * distinct side. Ratio is the single closing division. */
  def textDistinctNgrams(s: SparkSession, d: String): DataFrame = {
    // gram generation via the custom [[graft.functions.TokenNGrams]]
    // Generator (one O(len) codegen-stage pass in the scan) — the
    // transform-lambda route built each gram with interpreted
    // slice/concat_ws per position and was #2 in the whole bench
    // (5.4 s at sf0.1; generator + two-level aggregate: 1.2 s)
    import org.apache.spark.sql.GraftBridge
    def gramsOf(n: Int) = t(s, d, "documents")
      .select(GraftBridge.column(graft.functions.TokenNGrams(
        GraftBridge.expression(col("text")), n)).as("gram"))
      .select(lit(n).as("n"), col("gram"))
    gramsOf(1).unionAll(gramsOf(2)).unionAll(gramsOf(3))
      // two-level aggregate instead of COUNT(DISTINCT): the (n, gram)
      // pre-aggregate map-side-combines duplicate grams BEFORE the
      // shuffle (Zipf collapses most of the mass), where the
      // multi-distinct Expand form shuffled every gram instance twice
      // (measured 5.4 → 1.9 s at sf0.1; at 100 TB the combine is the
      // difference between shuffling gram instances and gram types)
      .groupBy(col("n"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("n"))
      .agg(sum(col("c")).as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"))
      .withColumn("distinct_ratio",
        expr("""ROUND(CAST(distinct_ngrams AS DOUBLE)
                / CAST(total_ngrams AS DOUBLE), 6)"""))
      .orderBy(col("n"))
  }

  /** Yule's characteristic K and Simpson's repeat rate per language —
    * the two classic lexical-richness constants (K is sample-size
    * invariant under the Poisson model; Simpson's D is the collision
    * probability of two token draws). Both close from the SAME two
    * integer moments of the word-frequency spectrum, N = Σc and
    * S2 = Σc²: K = 10⁴·(S2−N)/N², D = (S2−N)/(N·(N−1)). Shape: one
    * corpus tokenize → (lang, word) hash aggregate (map-side combine
    * collapses Zipf mass before the shuffle) → |langs|-row rollup;
    * all-integer moments, one closing double expression per constant. */
  def textYuleK(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("vocab"), sum(col("c")).as("n_tokens"),
        sum(col("c") * col("c")).as("s2"))
      .select(col("lang"), col("vocab"), col("n_tokens"),
        expr("""ROUND(1e4 * CAST(s2 - n_tokens AS DOUBLE)
                / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)),
                6)""").as("yule_k"),
        expr("""ROUND(CAST(s2 - n_tokens AS DOUBLE)
                / (CAST(n_tokens AS DOUBLE)
                   * CAST(n_tokens - 1 AS DOUBLE)), 9)""")
          .as("simpson_d"))
      .orderBy(col("lang"))

  /** Language-ID confusion matrix — the eval table every classifier
    * gate ships before its threshold goes to production: rerun
    * [[textLangId]]'s stopword-density rule, cross-tabulate predicted
    * vs labeled language, and row-normalize so each (actual, pred)
    * cell carries its share of the actual class (recall on the
    * diagonal). Integer cells from one hash aggregate + a keyed
    * window over the |langs×2| matrix; one double division per cell. */
  def textLangidConfusion(s: SparkSession, d: String): DataFrame = {
    val byLang = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
    t(s, d, "documents")
      .withColumn("stop_ratio",
        expr(s"size(filter(split(text, ' '), t -> t IN $stopList))")
          .cast("double") / size(split(col("text"), " ")))
      .select(col("lang"),
        when(col("stop_ratio") > 0.05, lit("en")).otherwise(lit("other"))
          .as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lang_total", sum(col("n")).over(byLang))
      .select(col("lang"), col("lang_pred"), col("n"),
        expr("ROUND(CAST(n AS DOUBLE) / CAST(lang_total AS DOUBLE), 6)")
          .as("row_share"))
      .orderBy(col("lang"), col("lang_pred"))
  }

  /** Gazetteer entity tagging — dictionary-based NER, the lexicon-join
    * flavor every corpus pipeline runs before model-based NER exists
    * for a domain (product names, chemical nouns, ticker symbols):
    * mentions are n-grams of the text that exactly match a typed
    * dictionary phrase. Reference scope ⊕ (training-data curation).
    *
    * Shape: bigram candidates come from the O(len)
    * [[graft.functions.TokenNGrams]] generator inside the scan (the
    * PERF.md generator discipline — no per-element lambda, no
    * intermediate array), and the dictionary is a literal 6-row
    * relation the planner broadcasts — mention detection is a
    * broadcast-hash semi-join per candidate gram, then one hash
    * aggregate on (source, entity), bounded by |sources|·|gazetteer|.
    * At 100 TB the same plan holds: real gazetteers (UMLS, product
    * catalogs) are millions of rows ≈ tens of MB — still broadcast
    * range; past that the join degrades gracefully to a shuffle on the
    * gram key, which is still |mentions|, never |tokens|². Overlapping
    * mentions are counted individually (each matching gram is a
    * mention) — the standard longest-match refinement is a window over
    * (doc, pos) this fixture's bigram-only lexicon never exercises. */
  def textNerGazetteer(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val gaz = s.createDataFrame(Seq(
      ("hash join", "OPERATOR"),
      ("table scan", "OPERATOR"),
      ("sort merge", "OPERATOR"),
      ("window batch", "OPERATOR"),
      ("key order", "CONCEPT"),
      ("data stream", "CONCEPT"))).toDF("entity", "entity_type")
    t(s, d, "documents")
      .select(col("doc_id"), col("source"),
        GraftBridge.column(graft.functions.TokenNGrams(
          GraftBridge.expression(col("text")), 2)).as("bigram"))
      .join(broadcast(gaz), col("bigram") === col("entity"))
      .groupBy(col("source"), col("entity"), col("entity_type"))
      .agg(count(lit(1)).as("n_mentions"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("source"), col("entity"))
  }

  /** RAKE keyword extraction (Rose et al. 2010) — the unsupervised
    * keyphrase scorer curation pipelines use to label what a document
    * is about: candidate phrases are maximal stopword-free token runs,
    * a word scores degree/frequency (degree = Σ length of the phrases
    * each occurrence sits in — words that live in long phrases score
    * high), and a phrase scores the sum of its words. Top-3 phrases
    * per doc. Reference scope ⊕.
    *
    * Integer end to end: per-word score is (1e6·deg) div freq and the
    * phrase score sums those micros, so both engines compute the
    * identical truncation sequence. Shape: every window/aggregate is
    * keyed by doc_id (+phrase/word) — per-DOC bounded work, hash
    * partitioned, nothing rides a global window; the per-doc top-3 is
    * a rank filter Spark executes as a WindowGroupLimit 3-heap before
    * the exchange. At 100 TB this is one shuffle on doc-keyed
    * composites of a corpus-proportional but narrow relation — the
    * text_winnowing class. */
  def textKeywordRake(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = t(s, d, "documents")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("is_stop", col("tok").isInCollection(stopwords))
    // phrase id = #stopword boundaries seen so far (per doc, by pos)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val members = toks
      .withColumn("phrase_id",
        sum(when(col("is_stop"), 1L).otherwise(0L)).over(byDoc))
      .filter(!col("is_stop"))
    val phraseLen = Window.partitionBy(col("doc_id"), col("phrase_id"))
    // checkpointed (round 15): the phrase join consumes this token
    // table on BOTH sides (members directly, word scores via the
    // groupBy), and column-pruning differences made the two exploded
    // subtrees non-identical — no exchange reuse, so the scan +
    // posexplode + doc_id exchange + two windows ran twice
    val withLen = graft.llm.Dedup.ckpt(members
      .withColumn("phrase_len", count(lit(1)).over(phraseLen)),
      rebuild = false)
    // word stats per doc: freq = occurrences, deg = Σ phrase_len
    val wordScore = withLen
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("f"), sum(col("phrase_len")).as("deg"))
      .select(col("doc_id"), col("tok"),
        expr("(1000000 * deg) div f").as("w_micro"))
    val phrases = withLen
      .join(wordScore, Seq("doc_id", "tok"))
      .groupBy(col("doc_id"), col("phrase_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          e => e.getField("tok")), " ").as("phrase"),
        sum(col("w_micro")).as("score_micro"))
    val rk = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("phrase"), col("phrase_id"))
    phrases
      .withColumn("rk", row_number().over(rk))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("phrase"), col("score_micro"))
      .orderBy(col("doc_id"), col("rk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_langid_confusion" -> (textLangidConfusion _),
    "text_yule_k" -> (textYuleK _),
    "text_distinct_ngrams" -> (textDistinctNgrams _),
    "text_ngram_novelty" -> (textNgramNovelty _),
    "text_readability" -> (textReadability _),
    "text_hapax_ratio" -> (textHapaxRatio _),
    "text_source_vocab_jaccard" -> (textSourceVocabJaccard _),
    "text_log_odds" -> (textLogOdds _),
    "text_perplexity_buckets" -> (textPerplexityBuckets _),
    "text_feature_hash" -> (textFeatureHash _),
    "text_oov_rate" -> (textOovRate _),
    "text_stopword_ratio" -> (textStopwordRatio _),
    "tokenize_bpe_merges" -> (tokenizeBpeMerges _),
    "text_gopher_quality" -> (textGopherQuality _),
    "text_winnowing" -> (textWinnowing _),
    "text_burstiness" -> (textBurstiness _),
    "text_char_lang_id" -> (textCharLangId _),
    "text_compression_ratio" -> (textCompressionRatio _),
    "text_edit_distance" -> (textEditDistance _),
    "text_stats" -> (textStats _),
    "text_lang_id" -> (textLangId _),
    "text_quality_score" -> (textQualityScore _),
    "text_normalize" -> (textNormalize _),
    "corpus_stats" -> (corpusStats _),
    "tokenize_to_ids" -> (tokenizeToIds _),
    "sample_hash_stratified" -> (sampleHashStratified _),
    "text_rarity_score" -> (textRarityScore _),
    "text_token_count" -> (textTokenCount _),
    "doc_fingerprint" -> (docFingerprint _),
    "doc_rolling_hash" -> (docRollingHash _),
    "text_ngram_freq" -> (textNgramFreq _),
    "text_perplexity" -> (textPerplexity _),
    "text_vocab_growth" -> (textVocabGrowth _),
    "text_pii_redact" -> (textPiiRedact _),
    "text_quality_classifier" -> (textQualityClassifier _),
    "text_classifier_train_step" -> (textClassifierTrainStep _),
    "text_classifier_train_loop" -> (textClassifierTrainLoop _),
    "text_burrows_delta" -> (textBurrowsDelta _),
    "text_stylometrics" -> (textStylometrics _),
    "composite_curation_classified" -> (compositeCurationClassified _),
    "composite_curation" -> (compositeCuration _),
    "text_ner_gazetteer" -> (textNerGazetteer _),
    "text_keyword_rake" -> (textKeywordRake _)
  )

  /** [[textClassifierTrainLoop]]'s oracle: the identical recipe
    * unrolled as four CTE generations (the graph_community_lpa
    * unrolled-rounds precedent), generated by the same loop shape
    * the engine runs so step count and step algebra cannot drift. */
  private lazy val trainLoopOracle: String = {
    val steps = (0 to 3).map { t =>
      s"""d$t AS (
         |  SELECT doc_id, y, CAST(SUM(w$t.wt * pdb.x) AS BIGINT) AS swx,
         |    CAST(SUM(pdb.x) AS BIGINT) AS nt
         |  FROM pdb JOIN w$t ON w$t.b = pdb.bucket GROUP BY 1, 2),
         |ls$t AS (
         |  SELECT SUM(CAST(ROUND(LN(1e0 + EXP((1 - 2 * y)
         |      * (CAST(swx AS DOUBLE) / (1000000e0 * nt)))), 6)
         |    AS DECIMAL(24,6))) AS ls, COUNT(*) AS n FROM d$t),
         |g$t AS (
         |  SELECT bucket, SUM(CAST(ROUND((1e0 / (1e0 + EXP(0e0
         |      - CAST(swx AS DOUBLE) / (1000000e0 * nt))) - d$t.y)
         |      * x / CAST(nt AS DOUBLE), 6) AS DECIMAL(24,6))) AS g
         |  FROM pdb JOIN d$t USING (doc_id) GROUP BY 1),
         |gl$t AS (SELECT SUM(ABS(g)) AS l1 FROM g$t),
         |w${t + 1} AS (
         |  SELECT w$t.b, w$t.wt - CAST(ROUND(COALESCE(g$t.g, 0)
         |      * 100000, 0) AS BIGINT) AS wt
         |  FROM w$t LEFT JOIN g$t ON g$t.bucket = w$t.b)"""
        .stripMargin
    }.mkString(",\n")
    val rows = (0 to 3).map { t =>
      s"""  SELECT CAST($t AS BIGINT) AS step,
         |    CAST((SELECT ls FROM ls$t) AS DOUBLE)
         |      / (SELECT n FROM ls$t) AS loss,
         |    CAST((SELECT l1 FROM gl$t) AS DOUBLE) AS grad_l1"""
        .stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH w0 AS (
       |  SELECT b, CAST(((31*b*b + 17*b) % 2001 - 1000) * 200
       |    AS BIGINT) AS wt
       |  FROM (SELECT unnest(generate_series(0, 63)) AS b)),
       |toks AS (
       |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |pdb AS (
       |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
       |    CAST(('0x' || substring(md5(tok), 1, 6)) AS BIGINT) % 64
       |      AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS x
       |  FROM toks GROUP BY 1, 2, 3),
       |$steps
       |SELECT step, loss, grad_l1 FROM (
       |$rows)
       |ORDER BY step""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "text_classifier_train_loop" -> trainLoopOracle,
    // identical top-10 selection, round-6 decimal relative
    // frequencies, cross-multiplied z, exact pair sums
    "text_burrows_delta" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |top AS (
        |  SELECT w FROM (
        |    SELECT w, COUNT(*) AS cw FROM toks GROUP BY w
        |    ORDER BY cw DESC, w LIMIT 10)),
        |st AS (SELECT source, COUNT(*) AS n FROM toks GROUP BY 1),
        |cw AS (
        |  SELECT source, w, COUNT(*) AS c FROM toks
        |  WHERE w IN (SELECT w FROM top) GROUP BY 1, 2),
        |f AS (
        |  SELECT st.source, top.w,
        |    (2 * COALESCE(cw.c, 0) * 1000000 + st.n) // (2 * st.n)
        |      AS fi
        |  FROM st CROSS JOIN top
        |  LEFT JOIN cw ON cw.source = st.source AND cw.w = top.w),
        |stats AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS ns,
        |    CAST(SUM(fi) AS BIGINT) AS sf,
        |    CAST(SUM(fi * fi) AS BIGINT) AS sf2,
        |    CAST(COUNT(*) AS DECIMAL(19,0))
        |      * CAST(CAST(SUM(fi * fi) AS BIGINT) AS DECIMAL(19,0))
        |      - CAST(CAST(SUM(fi) AS BIGINT) AS DECIMAL(19,0))
        |      * CAST(CAST(SUM(fi) AS BIGINT) AS DECIMAL(19,0)) AS disc
        |  FROM f GROUP BY w),
        |z AS (
        |  SELECT f.source, f.w,
        |    CASE WHEN disc = 0 THEN CAST(0 AS DECIMAL(18,6))
        |      ELSE CAST(ROUND(CAST(ns * fi - sf AS DOUBLE)
        |           / SQRT(CAST(disc AS DOUBLE)), 6)
        |        AS DECIMAL(18,6)) END AS z
        |  FROM f JOIN stats ON stats.w = f.w)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(CAST(2 * CAST(SUM(ABS(a.z - b.z)) * 1000000
        |        AS DECIMAL(38,0)) + COUNT(*) AS HUGEINT)
        |    // CAST(2 * COUNT(*) AS HUGEINT) AS DOUBLE) / 1000000
        |    AS delta
        |FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // text_lang_id's rule cross-tabulated; integer cells, one
    // division per row against the actual-class total
    "text_langid_confusion" ->
      s"""WITH p AS (
         |  SELECT lang,
         |    CASE WHEN CAST(len(list_filter(string_split(text, ' '),
         |         t -> t IN $stopList)) AS DOUBLE) /
         |         len(string_split(text, ' ')) > 0.05
         |         THEN 'en' ELSE 'other' END AS lang_pred
         |  FROM documents
         |), g AS (
         |  SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM p GROUP BY 1, 2
         |)
         |SELECT lang, lang_pred, n,
         |  ROUND(CAST(n AS DOUBLE)
         |    / CAST(SUM(n) OVER (PARTITION BY lang) AS DOUBLE), 6)
         |    AS row_share
         |FROM g ORDER BY lang NULLS FIRST, lang_pred NULLS FIRST""".stripMargin,
    // (lang, word) counts → integer N and S2 moments; one double
    // expression per richness constant, identical text both engines
    "text_yule_k" ->
      """WITH toks AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS word
        |  FROM documents
        |), c AS (
        |  SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM toks WHERE word <> '' GROUP BY 1, 2
        |), g AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS vocab,
        |    CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(SUM(c * c) AS BIGINT) AS s2
        |  FROM c GROUP BY 1
        |)
        |SELECT lang, vocab, n_tokens,
        |  ROUND(1e4 * CAST(s2 - n_tokens AS DOUBLE)
        |        / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)),
        |        6) AS yule_k,
        |  ROUND(CAST(s2 - n_tokens AS DOUBLE)
        |        / (CAST(n_tokens AS DOUBLE)
        |           * CAST(n_tokens - 1 AS DOUBLE)), 9) AS simpson_d
        |FROM g ORDER BY lang NULLS FIRST""".stripMargin,
    // same tokenization and space-joined gram keys; exact BIGINT
    // counts; ONE closing double division
    "text_distinct_ngrams" ->
      """WITH docs AS (
        |  SELECT string_split(text, ' ') AS toks FROM documents
        |), g AS (
        |  SELECT t.n, array_to_string(toks[u.i:u.i + t.n - 1], ' ')
        |    AS gram
        |  FROM docs
        |  CROSS JOIN (VALUES (1), (2), (3)) t(n)
        |  , LATERAL unnest(range(1, len(toks) - t.n + 2)) u(i)
        |  WHERE len(toks) >= t.n
        |)
        |SELECT n, CAST(COUNT(*) AS BIGINT) AS total_ngrams,
        |  CAST(COUNT(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
        |  ROUND(CAST(COUNT(DISTINCT gram) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS distinct_ratio
        |FROM g GROUP BY n ORDER BY n""".stripMargin,
    // distinct per-doc trigram shingles; first ownership = min doc_id
    // per gram; integer novel counts, one closing ratio
    "text_ngram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), grams AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS gram
        |  FROM toks WHERE len(t) >= 3
        |), first AS (
        |  SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY 1
        |), g AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |    CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_novel
        |  FROM grams JOIN first USING (gram) GROUP BY 1
        |)
        |SELECT doc_id, n_grams, n_novel,
        |  ROUND(CAST(n_novel AS DOUBLE) / n_grams, 6) AS novelty
        |FROM g ORDER BY doc_id""".stripMargin,
    // integer per-doc counts clamped ≥1; Flesch closes over per-lang
    // SUMS in one double expression (identical text both engines)
    "text_readability" ->
      """WITH perdoc AS (
        |  SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
        |    GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+'))
        |      AS BIGINT), 1) AS sn,
        |    GREATEST(CAST(len(regexp_extract_all(lower(text),
        |      '[aeiouy]+')) AS BIGINT), 1) AS y
        |  FROM documents
        |), g AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(w) AS BIGINT) AS n_words,
        |    CAST(SUM(sn) AS BIGINT) AS n_sents,
        |    CAST(SUM(y) AS BIGINT) AS n_syll
        |  FROM perdoc GROUP BY 1
        |)
        |SELECT lang, n_docs, n_words, n_sents, n_syll,
        |  ROUND(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
        |     - 84.6 * (CAST(n_syll AS DOUBLE) / n_words), 4) AS flesch
        |FROM g ORDER BY lang NULLS FIRST""".stripMargin,
    // (lang, word) counts → integer hapax/dis/vocab; one double ratio
    "text_hapax_ratio" ->
      """WITH toks AS (
        |  SELECT lang, string_split(text, ' ') AS ts FROM documents
        |), bg AS (
        |  SELECT lang, ts[i] || ' ' || ts[i + 1] AS bigram
        |  FROM toks, LATERAL unnest(range(1, len(ts))) AS u(i)
        |  WHERE len(ts) >= 2
        |), c AS (
        |  SELECT lang, bigram, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM bg GROUP BY 1, 2
        |), g AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS vocab,
        |    CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS hapax,
        |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis
        |  FROM c GROUP BY 1
        |)
        |SELECT lang, vocab, n_bigrams, hapax, dis,
        |  ROUND(CAST(hapax AS DOUBLE) / vocab, 6) AS hapax_ratio
        |FROM g ORDER BY lang NULLS FIRST""".stripMargin,
    // inverted-index pair meet on shared tokens; |A∪B| closed in
    // integers, one division per bounded pair row
    "text_source_vocab_jaccard" ->
      """WITH st AS (
        |  SELECT source, UNNEST(string_split(text, ' ')) AS tok
        |  FROM documents
        |), stc AS (
        |  SELECT DISTINCT source, tok FROM st WHERE tok <> ''),
        |sizes AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS vsz
        |  FROM stc GROUP BY 1
        |), pairs AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_inter
        |  FROM stc a JOIN stc b
        |    ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT src_a, src_b, n_inter,
        |  sa.vsz AS vsz_a, sb.vsz AS vsz_b,
        |  ROUND(n_inter / CAST(sa.vsz + sb.vsz - n_inter AS DOUBLE), 6)
        |    AS jaccard
        |FROM pairs
        |JOIN sizes sa ON pairs.src_a = sa.source
        |JOIN sizes sb ON pairs.src_b = sb.source
        |ORDER BY src_a, src_b""".stripMargin,
    // combined-corpus Dirichlet prior keeps every ratio integer/integer;
    // identical closing (2 ln, 1 sqrt) double expression on both engines
    "text_log_odds" ->
      """WITH tok AS (
        |  SELECT lang, UNNEST(string_split(text, ' ')) AS w
        |  FROM documents
        |), perw AS (
        |  SELECT w,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y1,
        |    CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y2
        |  FROM tok WHERE w <> '' GROUP BY 1
        |), tot AS (
        |  SELECT CAST(SUM(y1) AS BIGINT) AS n1,
        |    CAST(SUM(y2) AS BIGINT) AS n2 FROM perw
        |)
        |SELECT w, y1, y2,
        |  ROUND((LN((2*y1 + y2) /
        |       CAST(2*n1 + n2 - 2*y1 - y2 AS DOUBLE)) -
        |    LN((y1 + 2*y2) /
        |       CAST(2*n2 + n1 - y1 - 2*y2 AS DOUBLE))) /
        |   SQRT(CAST(1 AS DOUBLE) / (2*y1 + y2) +
        |        CAST(1 AS DOUBLE) / (y1 + 2*y2)), 6) AS z
        |FROM perw CROSS JOIN tot
        |ORDER BY z DESC, w""".stripMargin,
    // the perplexity CTE verbatim, then plain NTILE(3) on the round-4
    // nll — proving the distributed ntile machinery again on a
    // derived metric
    "text_perplexity_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i + 1])) AS bigram
        |  FROM toks WHERE len(t) >= 2),
        |bc AS (SELECT bigram, COUNT(*) AS c_bg FROM bg GROUP BY 1),
        |un AS (SELECT unnest(t) AS tok FROM toks),
        |uc AS (SELECT tok, COUNT(*) AS c_uni FROM un GROUP BY 1),
        |vc AS (SELECT COUNT(*) AS v FROM uc),
        |ppl AS (
        |  SELECT doc_id, COUNT(*) AS n_bigrams,
        |    ROUND(-CAST(SUM(CAST(ROUND(ln((c_bg + 1.0) / (c_uni + v)), 6)
        |      AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4) AS nll
        |  FROM bg JOIN bc USING (bigram)
        |  JOIN uc ON uc.tok = split_part(bigram, ' ', 1)
        |  CROSS JOIN vc
        |  GROUP BY doc_id),
        |r AS (
        |  SELECT n_bigrams, nll,
        |    CAST(NTILE(3) OVER (ORDER BY nll, doc_id) AS INTEGER)
        |      AS bucket
        |  FROM ppl)
        |SELECT bucket, COUNT(*) AS n_docs,
        |  CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
        |  MIN(nll) AS nll_min, MAX(nll) AS nll_max
        |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin,
    // all-integer: 24-bit md5 prefix mod 256, vocab counts, exact sums
    "text_feature_hash" ->
      """WITH v AS (
        |  SELECT tok, COUNT(*) AS n FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  GROUP BY tok)
        |SELECT CAST(('0x' || substring(md5(tok), 1, 6)) AS BIGINT) % 256
        |    AS bucket,
        |  COUNT(*) AS n_distinct_tokens,
        |  CAST(SUM(n) AS BIGINT) AS n_occurrences
        |FROM v GROUP BY 1 ORDER BY bucket""".stripMargin,
    // same total-order vocab cut as tokenize_to_ids; integer counts,
    // one closing double division
    "text_oov_rate" ->
      """WITH toks AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
        |    ORDER BY n DESC, tok ASC LIMIT 10)),
        |j AS (
        |  SELECT lang,
        |    CASE WHEN tok IN (SELECT tok FROM vocab) THEN 0 ELSE 1 END
        |      AS oov
        |  FROM toks)
        |SELECT lang, COUNT(*) AS n_tokens,
        |  CAST(SUM(oov) AS BIGINT) AS n_oov,
        |  ROUND(CAST(SUM(oov) AS DOUBLE) / COUNT(*), 6) AS oov_rate
        |FROM j GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin,
    // integer counts + integer gate (25*stop >= tok); exact BIGINT
    // sums; one identical closing double division
    "text_stopword_ratio" ->
      """WITH t AS (
        |  SELECT lang, source,
        |    len(list_filter(string_split(lower(text), ' '),
        |        w -> w <> '')) AS n_tok,
        |    len(list_filter(string_split(lower(text), ' '),
        |        w -> w <> '' AND w IN ('the','be','to','of','and','that',
        |                               'have','with','it','is'))) AS n_stop
        |  FROM documents)
        |SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(SUM(n_stop) AS BIGINT) AS n_stopwords,
        |  CAST(SUM(CASE WHEN n_stop * 25 >= n_tok THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_pass,
        |  ROUND(CAST(SUM(n_stop) AS DOUBLE) / SUM(n_tok), 6) AS stop_ratio
        |FROM t GROUP BY lang, source ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin,
    "tokenize_bpe_merges" ->
      """WITH words AS (
        |  SELECT w, COUNT(*) AS n_w FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) >= 2 GROUP BY w),
        |pairs AS (
        |  SELECT substring(w, CAST(i AS INTEGER), 2) AS pair, n_w
        |  FROM words,
        |    LATERAL unnest(range(1, length(w))) AS t(i))
        |SELECT * FROM (
        |  SELECT pair, CAST(SUM(n_w) AS BIGINT) AS n_pair,
        |    COUNT(*) AS n_slots
        |  FROM pairs GROUP BY pair
        |  ORDER BY n_pair DESC, pair ASC LIMIT 20)
        |ORDER BY pair""".stripMargin,
    "text_gopher_quality" ->
      """WITH w AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                w -> w <> '') AS words
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(words) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(words,
        |      w -> length(w))), 0) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(words,
        |      w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS n_alpha,
        |    CAST(length(text) - length(replace(text, '#', ''))
        |      + (length(text) - length(replace(text, '...', ''))) // 3
        |      AS BIGINT) AS n_symbols,
        |    CAST(len(list_filter(['the','be','to','of','and','that',
        |      'have','with'], sw -> list_contains(words, sw)))
        |      AS BIGINT) AS stop_hits
        |  FROM w)
        |SELECT doc_id, n_words, word_chars, n_alpha, n_symbols, stop_hits,
        |  (n_words BETWEEN 30 AND 100000
        |   AND word_chars >= n_words * 3 AND word_chars <= n_words * 10
        |   AND n_symbols * 10 < n_words
        |   AND n_alpha * 5 > n_words * 4
        |   AND stop_hits >= 1) AS passes
        |FROM m ORDER BY doc_id""".stripMargin,
    // zeroth-order entropy estimate — agg_entropy's exact-integer
    // rounding discipline (round per term, decimal sum) keeps the
    // irrational parts order-independent across engines
    "text_compression_ratio" ->
      """WITH ch AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    unnest(string_split(text, '')) AS ch
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, n_bytes, ch, COUNT(*) AS c
        |  FROM ch GROUP BY 1, 2, 3
        |), t AS (
        |  SELECT doc_id, n_bytes, c,
        |    CAST(ROUND(c * ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(20,6))
        |      AS clnc
        |  FROM f
        |), m AS (
        |  SELECT doc_id, n_bytes, CAST(SUM(c) AS BIGINT) AS n_chars,
        |    ROUND((ln(CAST(SUM(c) AS DOUBLE)) -
        |           CAST(SUM(clnc) AS DOUBLE) / SUM(c)) / (8 * ln(2)), 4)
        |      AS est_ratio
        |  FROM t GROUP BY 1, 2
        |)
        |SELECT doc_id, n_bytes, n_chars, est_ratio,
        |  CASE WHEN est_ratio < 0.5 THEN 'repetitive'
        |       WHEN est_ratio > 0.52 THEN 'incompressible'
        |       ELSE 'ok' END AS flag
        |FROM m ORDER BY doc_id""".stripMargin,
    "text_burstiness" ->
      """WITH f AS (
        |  SELECT doc_id, tok, COUNT(*) AS f
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2
        |), m AS (
        |  SELECT doc_id, COUNT(*) AS k, SUM(f) AS s1,
        |    SUM(f * f) AS s2
        |  FROM f GROUP BY 1
        |)
        |SELECT doc_id, k, CAST(s1 AS BIGINT) AS n_tokens,
        |  ROUND(((CAST(s2 AS DOUBLE) -
        |          CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / k) /
        |         (k - 1)) / (CAST(s1 AS DOUBLE) / k), 4) AS vmr
        |FROM m WHERE k > 1 ORDER BY doc_id""".stripMargin,
    "text_char_lang_id" ->
      """WITH tg AS (
        |  SELECT doc_id, lang, substr(text, i, 3) AS g
        |  FROM documents,
        |    LATERAL unnest(range(1, length(text) - 1)) AS u(i)
        |  WHERE length(text) >= 3
        |), prof AS (
        |  SELECT lang AS profile_lang, g FROM (
        |    SELECT lang, g, COUNT(*) AS n,
        |      ROW_NUMBER() OVER (PARTITION BY lang
        |        ORDER BY COUNT(*) DESC, g ASC) AS rnk
        |    FROM tg GROUP BY lang, g
        |  ) WHERE rnk <= 50
        |), doc_tg AS (
        |  SELECT DISTINCT doc_id, lang, g FROM tg
        |), overlap AS (
        |  SELECT doc_id, lang, profile_lang, COUNT(*) AS overlap
        |  FROM doc_tg JOIN prof USING (g)
        |  GROUP BY 1, 2, 3
        |), best AS (
        |  SELECT doc_id, lang, profile_lang,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY overlap DESC, profile_lang ASC NULLS FIRST) AS rn
        |  FROM overlap
        |)
        |SELECT lang, profile_lang AS lang_pred, COUNT(*) AS n_docs
        |FROM best WHERE rn = 1
        |GROUP BY lang, profile_lang
        |ORDER BY lang NULLS FIRST, lang_pred NULLS FIRST""".stripMargin,
    "text_edit_distance" ->
      """SELECT doc_id, source,
        |  'src' || CAST(doc_id % 7 AS VARCHAR) AS guess,
        |  CAST(levenshtein(source, 'src' || CAST(doc_id % 7 AS VARCHAR))
        |       AS INTEGER) AS lev,
        |  source = 'src' || CAST(doc_id % 7 AS VARCHAR) AS exact
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_stats" ->
      s"""SELECT doc_id, lang,
         |  CAST(length(text) AS INTEGER) AS n_chars_c,
         |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_uniq,
         |  ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE) /
         |        len(string_split(text, ' ')), 4) AS avg_tok_len,
         |  ROUND(CAST(len(list_filter(string_split(text, ' '),
         |        t -> t IN $stopList)) AS DOUBLE) /
         |        len(string_split(text, ' ')), 4) AS stop_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,
    // single-char-class counts via strip-and-measure (= match counts
    // for one-char classes); each ratio one division
    "text_stylometrics" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(length(text) - length(regexp_replace(text, '[aeiou]',
        |      '', 'g')) AS BIGINT) AS n_vowels,
        |    CAST(length(text) - length(regexp_replace(text, ' ',
        |      '', 'g')) AS BIGINT) AS n_spaces,
        |    CAST(len(regexp_extract_all(text, '\b[a-z]{1,2}\b'))
        |      AS BIGINT) AS n_short,
        |    CAST(length(text) - length(regexp_replace(text,
        |      '[a-zA-Z0-9]', '', 'g')) AS BIGINT) AS n_alnum,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        |  FROM documents)
        |SELECT doc_id, n_chars, n_words,
        |  ROUND(CAST(n_vowels AS DOUBLE) / n_alnum, 6) AS vowel_ratio,
        |  ROUND(CAST(n_spaces AS DOUBLE) / n_chars, 6) AS space_ratio,
        |  ROUND(CAST(n_short AS DOUBLE) / n_words, 6)
        |    AS short_word_ratio,
        |  ROUND(CAST(n_alnum AS DOUBLE) / n_words, 4) AS avg_word_len
        |FROM c ORDER BY doc_id""".stripMargin,
    // per-doc sigmoid error over exact evidence, per-(doc,bucket)
    // contribution rounded then DECIMAL-summed per bucket, SGD close
    "text_classifier_train_step" ->
      """WITH w AS (
        |  SELECT b, ((31*b*b + 17*b) % 2001 - 1000) * 200 AS wt
        |  FROM (SELECT unnest(generate_series(0, 63)) AS b)),
        |toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tw AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substring(md5(tok), 1, 6)) AS BIGINT) % 64 AS b
        |  FROM toks),
        |docs AS (
        |  SELECT doc_id, lang, COUNT(*) AS n_tokens,
        |    CAST(SUM(wt) AS BIGINT) AS sum_w
        |  FROM tw JOIN w USING (b) GROUP BY 1, 2),
        |perdoc AS (
        |  SELECT doc_id, n_tokens,
        |    1e0 / (1e0 + EXP(0e0 - CAST(sum_w AS DOUBLE)
        |      / (1000000e0 * n_tokens)))
        |      - (CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS err
        |  FROM docs),
        |pdb AS (
        |  SELECT doc_id, b AS bucket, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM tw GROUP BY 1, 2),
        |g AS (
        |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs_touched,
        |    SUM(CAST(ROUND(err * x / CAST(n_tokens AS DOUBLE), 6)
        |      AS DECIMAL(24,6))) AS g_sum
        |  FROM pdb JOIN perdoc USING (doc_id) GROUP BY 1)
        |SELECT g.bucket, n_docs_touched,
        |  CAST(w.wt AS BIGINT) AS w_old,
        |  ROUND(CAST(g_sum AS DOUBLE), 6) AS gradient,
        |  ROUND(CAST(w.wt AS DOUBLE) / 1000000e0
        |    - 0.1 * CAST(g_sum AS DOUBLE), 6) AS w_new
        |FROM g JOIN w ON w.b = g.bucket
        |ORDER BY bucket""".stripMargin,
    // literal linear model mirrored as the identical closed form:
    // bucket = 24-bit md5 prefix mod 64, weight in integer micro-units,
    // keep decision and margin both close over exact BIGINT moments
    "text_quality_classifier" ->
      """WITH w AS (
        |  SELECT b, ((31*b*b + 17*b) % 2001 - 1000) * 200 AS wt
        |  FROM (SELECT unnest(generate_series(0, 63)) AS b)),
        |toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tw AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substring(md5(tok), 1, 6)) AS BIGINT) % 64 AS b
        |  FROM toks),
        |docs AS (
        |  SELECT doc_id, lang, COUNT(*) AS n_tokens,
        |    CAST(SUM(wt) AS BIGINT) AS sum_w
        |  FROM tw JOIN w USING (b) GROUP BY 1, 2),
        |g AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |    CAST(SUM(CASE WHEN sum_w * 25 >= n_tokens * -1000000
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |    CAST(SUM(sum_w) AS BIGINT) AS sw,
        |    CAST(SUM(n_tokens) AS BIGINT) AS nt
        |  FROM docs GROUP BY 1)
        |SELECT lang, n_docs, n_kept,
        |  ROUND(CAST(n_kept AS DOUBLE) / n_docs, 6) AS keep_rate,
        |  ROUND(CAST(sw AS DOUBLE) / (1000000e0 * nt), 6) AS avg_margin
        |FROM g ORDER BY lang NULLS FIRST""".stripMargin,
    // the composite chain with the learned gate between rules and
    // dedup; margin replays the same integer evidence
    "composite_curation_classified" ->
      s"""WITH q AS (
         |  SELECT doc_id, lang, text,
         |    CAST(ROUND(CAST(
         |      LEAST(1.0, CAST(length(text) AS DOUBLE) / 500.0) * 0.5 +
         |      CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
         |      len(string_split(text, ' ')) * 0.5 AS DECIMAL(18,8)), 4)
         |      AS DOUBLE) AS quality,
         |    CAST(len(list_filter(string_split(text, ' '),
         |      t -> t IN $stopList)) AS DOUBLE) /
         |      len(string_split(text, ' ')) AS stop_ratio
         |  FROM documents),
         |w AS (
         |  SELECT b, ((31*b*b + 17*b) % 2001 - 1000) * 200 AS wt
         |  FROM (SELECT unnest(generate_series(0, 63)) AS b)),
         |tw AS (
         |  SELECT doc_id,
         |    CAST(('0x' || substring(md5(tok), 1, 6)) AS BIGINT) % 64 AS b
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |        FROM documents)),
         |sc AS (
         |  SELECT doc_id, COUNT(*) AS n_toks_clf,
         |    CAST(SUM(wt) AS BIGINT) AS sum_w
         |  FROM tw JOIN w USING (b) GROUP BY 1),
         |surv AS (
         |  SELECT q.doc_id, lang, quality, md5(text) AS text_md5,
         |    sc.sum_w, sc.n_toks_clf
         |  FROM q JOIN sc ON q.doc_id = sc.doc_id
         |  WHERE quality >= 0.5 AND stop_ratio > 0.05
         |    AND sum_w * 25 >= n_toks_clf * -1000000),
         |rep AS (
         |  SELECT doc_id, lang, quality, sum_w, n_toks_clf,
         |    MIN(doc_id) OVER (PARTITION BY text_md5) AS rep_id
         |  FROM surv)
         |SELECT doc_id, lang, quality,
         |  ROUND(CAST(sum_w AS DOUBLE) / (1000000e0 * n_toks_clf), 6)
         |    AS margin
         |FROM rep WHERE doc_id = rep_id ORDER BY doc_id""".stripMargin,
    "composite_curation" ->
      s"""WITH q AS (
         |  SELECT doc_id, lang, text,
         |    CAST(ROUND(CAST(
         |      LEAST(1.0, CAST(length(text) AS DOUBLE) / 500.0) * 0.5 +
         |      CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
         |      len(string_split(text, ' ')) * 0.5 AS DECIMAL(18,8)), 4)
         |      AS DOUBLE) AS quality,
         |    CAST(len(list_filter(string_split(text, ' '),
         |      t -> t IN $stopList)) AS DOUBLE) /
         |      len(string_split(text, ' ')) AS stop_ratio
         |  FROM documents),
         |surv AS (
         |  SELECT doc_id, lang, quality, md5(text) AS text_md5
         |  FROM q WHERE quality >= 0.5 AND stop_ratio > 0.05),
         |rep AS (
         |  SELECT doc_id, lang, quality,
         |    MIN(doc_id) OVER (PARTITION BY text_md5) AS rep_id
         |  FROM surv)
         |SELECT doc_id, lang, quality FROM rep
         |WHERE doc_id = rep_id ORDER BY doc_id""".stripMargin,
    "text_lang_id" ->
      s"""SELECT doc_id, lang,
         |  ROUND(CAST(len(list_filter(string_split(text, ' '),
         |        t -> t IN $stopList)) AS DOUBLE) /
         |        len(string_split(text, ' ')), 4) AS en_score,
         |  CASE WHEN CAST(len(list_filter(string_split(text, ' '),
         |       t -> t IN $stopList)) AS DOUBLE) /
         |       len(string_split(text, ' ')) > 0.05
         |       THEN 'en' ELSE 'other' END AS lang_pred
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality_score" ->
      """SELECT doc_id,
        |  ROUND(LEAST(1.0, CAST(length(text) AS DOUBLE) / 500.0), 4) AS len_score,
        |  ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
        |        len(string_split(text, ' ')), 4) AS uniq_ratio,
        |  CAST(ROUND(CAST(LEAST(1.0, CAST(length(text) AS DOUBLE) / 500.0) * 0.5 +
        |        CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
        |        len(string_split(text, ' ')) * 0.5 AS DECIMAL(18,8)), 4)
        |       AS DOUBLE) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "corpus_stats" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(SUM(length(text)) AS BIGINT) AS n_chars_sum,
        |  CAST(ROUND(CAST(AVG(CAST(len(list_distinct(string_split(text, ' ')))
        |    AS DOUBLE) / len(string_split(text, ' '))) AS DECIMAL(18,8)), 4)
        |    AS DOUBLE) AS avg_uniq_ratio
        |FROM documents GROUP BY lang, source
        |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin,
    "tokenize_to_ids" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok,
        |    generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        |freq AS (
        |  SELECT tok, count(*) AS n FROM toks GROUP BY tok),
        |vocab AS (
        |  SELECT tok,
        |    ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) - 1 AS id
        |  FROM freq QUALIFY id < 100)
        |SELECT doc_id,
        |  string_agg(CAST(COALESCE(v.id, -1) AS VARCHAR), ','
        |    ORDER BY pos) AS token_ids
        |FROM toks LEFT JOIN vocab v USING (tok)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_rarity_score" ->
      """WITH toks AS (
        |  SELECT doc_id, t.tok
        |  FROM documents, LATERAL unnest(string_split(text, ' ')) AS t(tok)),
        |df AS (
        |  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
        |tot AS (SELECT COUNT(*) AS n_corpus FROM documents),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n_tokens, SUM(df.df) AS sum_df
        |  FROM toks JOIN df USING (tok) GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        |  ROUND(CAST(n_tokens * n_corpus - sum_df AS DOUBLE) /
        |        CAST(n_tokens * n_corpus AS DOUBLE), 6) AS rarity
        |FROM agg, tot ORDER BY doc_id""".stripMargin,
    "sample_hash_stratified" ->
      """WITH h AS (
        |  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hh,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang, rn FROM h
        |WHERE rn <= 25 ORDER BY lang NULLS FIRST, rn""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
        |    AS norm_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]'))
        |       AS INTEGER) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_pii_redact" ->
      """WITH t AS (SELECT doc_id,
        |  'u' || doc_id || '@ex.com said ' || substr(text, 1, 40) ||
        |  ' call 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
        |    AS txt
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(txt,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |    '<EMAIL>', 'g'),
        |    '\d{3}-\d{4,}', '<PHONE>', 'g') AS redacted
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_vocab_growth" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents
        |), fd AS (
        |  SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY tok
        |), npd AS (
        |  SELECT first_doc AS doc_id, COUNT(*) AS n_new
        |  FROM fd GROUP BY 1
        |), tpd AS (
        |  SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY 1
        |)
        |SELECT tpd.doc_id,
        |  CAST(SUM(n_toks) OVER w AS BIGINT) AS cum_tokens,
        |  CAST(SUM(COALESCE(n_new, 0)) OVER w AS BIGINT) AS vocab_size
        |FROM tpd LEFT JOIN npd ON npd.doc_id = tpd.doc_id
        |WINDOW w AS (ORDER BY tpd.doc_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY tpd.doc_id""".stripMargin,
    // per-term round-6 decimal before the doc sum → order-independent;
    // only the final mean divides in double, identical text both sides
    "text_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i + 1])) AS bigram
        |  FROM toks WHERE len(t) >= 2),
        |bc AS (SELECT bigram, COUNT(*) AS c_bg FROM bg GROUP BY 1),
        |un AS (SELECT unnest(t) AS tok FROM toks),
        |uc AS (SELECT tok, COUNT(*) AS c_uni FROM un GROUP BY 1),
        |vc AS (SELECT COUNT(*) AS v FROM uc)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  ROUND(-CAST(SUM(CAST(ROUND(ln((c_bg + 1.0) / (c_uni + v)), 6)
        |    AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4) AS nll
        |FROM bg JOIN bc USING (bigram)
        |JOIN uc ON uc.tok = split_part(bigram, ' ', 1)
        |CROSS JOIN vc
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_ngram_freq" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i + 1])) AS bigram
        |  FROM toks WHERE len(t) >= 2)
        |SELECT bigram, count(*) AS n
        |FROM bg GROUP BY bigram
        |ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    "doc_rolling_hash" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_transform(string_split(text, ' '),
        |      t -> CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT)
        |           % 1000000007),
        |    (acc, v) -> (acc * 31 + v) % 1000000007) AS rh
        |FROM documents ORDER BY doc_id""".stripMargin,
    "doc_fingerprint" ->
      """SELECT doc_id,
        |  md5(text) AS md5_full,
        |  list_min(list_transform(string_split(text, ' '), t -> md5(t)))
        |    AS min_tok_md5,
        |  list_max(list_transform(string_split(text, ' '), t -> md5(t)))
        |    AS max_tok_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // identical winnowing decomposition: 3-gram 40-bit hashes, integer
    // tie-break key h*1e6 + (1e6 - pos), min over the trailing w=4 frame
    "text_winnowing" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 6),
        |g AS (
        |  SELECT doc_id, i AS pos,
        |    CAST(('0x' || substring(md5(
        |      toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]),
        |      1, 10)) AS BIGINT) AS h
        |  FROM docs, LATERAL unnest(range(1, len(toks) - 1)) AS u(i)),
        |kd AS (
        |  SELECT doc_id, pos, h * 1000000 + (1000000 - pos) AS key,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        |  FROM g),
        |m AS (
        |  SELECT doc_id, rn,
        |    MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mk
        |  FROM kd),
        |sel AS (
        |  SELECT DISTINCT doc_id, mk FROM m WHERE rn >= 4),
        |nw AS (
        |  SELECT doc_id, COUNT(*) - 3 AS n_windows FROM g GROUP BY doc_id),
        |fp AS (
        |  SELECT doc_id, COUNT(*) AS n_fingerprints,
        |    CAST(SUM(mk // 1000000) AS BIGINT) AS fp_hash_sum,
        |    MAX(1000000 - mk % 1000000) AS last_fp_pos
        |  FROM sel GROUP BY doc_id)
        |SELECT fp.doc_id, n_windows, n_fingerprints,
        |  ROUND(CAST(n_fingerprints AS DOUBLE) / n_windows, 4) AS density,
        |  fp_hash_sum, last_fp_pos
        |FROM fp JOIN nw ON fp.doc_id = nw.doc_id
        |ORDER BY fp.doc_id""".stripMargin,
    // bigrams from adjacent-position pairs (TokenNGrams semantics),
    // literal typed gazetteer, exact match, (source, entity) counts
    "text_ner_gazetteer" ->
      """WITH docs AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source,
        |    toks[CAST(i AS INTEGER)] || ' ' ||
        |    toks[CAST(i + 1 AS INTEGER)] AS bigram
        |  FROM docs, LATERAL unnest(range(1, len(toks))) AS u(i)),
        |gaz(entity, entity_type) AS (VALUES
        |  ('hash join', 'OPERATOR'), ('table scan', 'OPERATOR'),
        |  ('sort merge', 'OPERATOR'), ('window batch', 'OPERATOR'),
        |  ('key order', 'CONCEPT'), ('data stream', 'CONCEPT'))
        |SELECT g.source, gaz.entity, gaz.entity_type,
        |  COUNT(*) AS n_mentions, COUNT(DISTINCT g.doc_id) AS n_docs
        |FROM g JOIN gaz ON g.bigram = gaz.entity
        |GROUP BY 1, 2, 3
        |ORDER BY g.source NULLS FIRST, gaz.entity""".stripMargin,
    // same phrase segmentation (running stopword count), identical
    // (1e6·deg) // freq word micros, per-doc top-3 with the same
    // (score desc, phrase, phrase_id) tiebreak
    "text_keyword_rake" ->
      """WITH toks AS (
        |  SELECT doc_id, i - 1 AS pos, t[CAST(i AS INTEGER)] AS tok,
        |    t[CAST(i AS INTEGER)] IN
        |      ('the', 'a', 'of', 'and', 'to', 'in') AS is_stop
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t
        |        FROM documents),
        |    LATERAL unnest(range(1, len(t) + 1)) AS u(i)),
        |pid AS (
        |  SELECT doc_id, pos, tok, is_stop,
        |    SUM(CASE WHEN is_stop THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
        |  FROM toks),
        |members AS (
        |  SELECT doc_id, pos, tok, phrase_id
        |  FROM pid WHERE NOT is_stop),
        |wl AS (
        |  SELECT doc_id, pos, tok, phrase_id,
        |    COUNT(*) OVER (PARTITION BY doc_id, phrase_id) AS phrase_len
        |  FROM members),
        |ws AS (
        |  SELECT doc_id, tok,
        |    (1000000 * SUM(phrase_len)) // COUNT(*) AS w_micro
        |  FROM wl GROUP BY doc_id, tok),
        |ph AS (
        |  SELECT wl.doc_id, wl.phrase_id,
        |    string_agg(wl.tok, ' ' ORDER BY wl.pos) AS phrase,
        |    CAST(SUM(ws.w_micro) AS BIGINT) AS score_micro
        |  FROM wl JOIN ws
        |    ON ws.doc_id = wl.doc_id AND ws.tok = wl.tok
        |  GROUP BY wl.doc_id, wl.phrase_id),
        |rk AS (
        |  SELECT doc_id, phrase, score_micro,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY score_micro DESC, phrase, phrase_id) AS rk
        |  FROM ph)
        |SELECT doc_id, CAST(rk AS INTEGER) AS rk, phrase, score_micro
        |FROM rk WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin
  )
}
