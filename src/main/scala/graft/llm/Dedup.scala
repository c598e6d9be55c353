package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Deduplication operators for training-data pipelines (north-star scope,
  * SURVEY.md §2.2 ⊕): exact, n-gram Jaccard, embedding-cosine, MinHash-LSH
  * and SimHash near-dup detection over the `documents`/`embeddings`
  * tables.
  *
  * Scale design:
  *  - `dedup_exact` is one hash shuffle on the key — at 100 TB shuffle on
  *    a 128-bit content hash, not the text itself (exposed here as
  *    md5-keyed grouping for exactly that reason).
  *  - pairwise ops (`jaccard`, `cosine`) are quadratic candidate
  *    generation — correct at fixture scale, and the documented scale
  *    path is banding first (MinHash-LSH buckets / IVF cells) so pairs
  *    are generated per-bucket, not globally. `dedup_fuzzy_minhash` IS
  *    that scale path.
  *  - SimHash reduces each doc to 64 bits; near-dup = small Hamming
  *    distance; at scale candidates come from band-rotations of the
  *    fingerprint, not the all-pairs join used on fixtures.
  */
object Dedup {

  /** Exact dedup: canonical representative (min id) per distinct text,
    * keyed by content hash so the shuffle key is bounded-size. */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("text_md5"), col("n_copies"))
      .orderBy(col("doc_id"))

  /** Token-set Jaccard near-dup pairs within a language. */
  def dedupNgramJaccard(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        array_distinct(split(col("text"), " ")).as("toks"))
    val a = docs.select(col("doc_id").as("a_id"), col("lang"),
      col("toks").as("a_toks"))
    val b = docs.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
      col("toks").as("b_toks"))
    a.join(b, col("lang") === col("b_lang") && col("a_id") < col("b_id"))
      .withColumn("jac",
        round(size(array_intersect(col("a_toks"), col("b_toks")))
          .cast("double") /
          size(array_distinct(concat(col("a_toks"), col("b_toks")))), 4))
      .filter(col("jac") > 0.8)
      .select(col("a_id"), col("b_id"), col("jac"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Embedding-cosine near-dup pairs (brute force at fixture scale;
    * the IVF/LSH bucketed path is `sim_search_ivf`). */
  def dedupEmbeddingCosine(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings")
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    a.join(broadcast(b), col("a_id") < col("b_id"))
      .withColumn("cos", round(Similarity.cosine(col("a_emb"), col("b_emb")), 6))
      .filter(col("cos") > 0.4)
      .select(col("a_id"), col("b_id"), col("cos"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** MinHash-LSH near-dup join — the banded scale path: shingle →
    * hashed term frequencies → MinHash signatures → bucketed similarity
    * join (O(pairs-per-bucket), not O(n²)). No oracle: LSH is
    * probabilistic (fixed seed keeps it deterministic per run). */
  def dedupFuzzyMinhash(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, Tokenizer}
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val tok = new Tokenizer().setInputCol("text").setOutputCol("words")
    val tf = new HashingTF().setInputCol("words").setOutputCol("features")
      .setNumFeatures(1 << 16).setBinary(true)
    val featurized = tf.transform(tok.transform(docs))
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("sig")
      .setNumHashTables(4).setSeed(42L)
    val model = lsh.fit(featurized)
    model.approxSimilarityJoin(featurized, featurized, 0.3, "jaccard_dist")
      .select(
        col("datasetA.doc_id").as("a_id"),
        col("datasetB.doc_id").as("b_id"),
        round(col("jaccard_dist"), 4).as("jaccard_dist"))
      .filter(col("a_id") < col("b_id"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** 64-bit SimHash fingerprint per doc + nearest neighbor by Hamming
    * distance. No oracle (xxhash64 has no DuckDB equivalent); rows are
    * deterministic. */
  def dedupSimhash(s: SparkSession, d: String): DataFrame = {
    val tokens = t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1))
        .as(s"b$i")
    }
    val sims = tokens.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until 64).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val fp = sims.select(col("doc_id"), simhash.as("simhash"))
    val a = fp.select(col("doc_id").as("a_id"), col("simhash").as("a_fp"))
    val b = fp.select(col("doc_id").as("b_id"), col("simhash").as("b_fp"))
    a.join(broadcast(b), col("a_id") =!= col("b_id"))
      .withColumn("hamming", bit_count(col("a_fp").bitwiseXOR(col("b_fp"))))
      .groupBy(col("a_id"))
      .agg(min(struct(col("hamming"), col("b_id"))).as("nn"))
      .select(col("a_id").as("doc_id"), col("nn.b_id").as("nn_id"),
        col("nn.hamming").as("nn_hamming"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_embedding_cosine" -> (dedupEmbeddingCosine _),
    "dedup_fuzzy_minhash" -> (dedupFuzzyMinhash _),
    "dedup_simhash" -> (dedupSimhash _)
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT MIN(doc_id) AS doc_id, md5(text) AS text_md5,
        |       COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS t
        |  FROM documents)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  ROUND(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.t, b.t))), 4) AS jac
        |FROM toks a JOIN toks b
        |  ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE ROUND(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE) /
        |            len(list_distinct(list_concat(a.t, b.t))), 4) > 0.8
        |ORDER BY a_id, b_id""".stripMargin,
    "dedup_embedding_cosine" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                   CAST(b.embedding AS DOUBLE[])), 6) > 0.4
        |ORDER BY a_id, b_id""".stripMargin
  )
}
