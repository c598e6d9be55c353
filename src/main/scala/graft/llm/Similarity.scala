package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Similarity search over the `embeddings` table (north-star scope,
  * SURVEY.md §2.2 ⊕): brute-force cosine top-k as the exact baseline and
  * an IVF (inverted-file, k-means coarse quantizer) variant as the scale
  * path.
  *
  * Scale design: brute force is one broadcast (the probe) + one narrow
  * map + TakeOrderedAndProject — it scans everything but never shuffles
  * the corpus. IVF fits k centroids (tiny model), assigns each vector to
  * a cell (narrow map, cacheable/persistable as a bucketed table), and
  * probes only the nProbe nearest cells — at 100 TB the assignment is
  * written once, partitioned by cell id, so a query touches
  * nProbe/k of the data.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double
    * (pure higher-order built-ins, no UDF). */
  def dot(x: Column, y: Column): Column =
    aggregate(
      zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a float-array column, accumulated in double. */
  def norm2(x: Column): Column =
    sqrt(aggregate(x, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Exact brute-force cosine top-k vs the probe vector (vec_id=0). */
  def simSearchTopk(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings")
    val probe = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), col("label"),
        round(cosine(col("embedding"), col("probe")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  /** IVF-style approximate top-k: k-means coarse quantizer (seeded,
    * deterministic), probe the nearest cells only, brute-force inside.
    * No oracle — approximate by construction; rows are deterministic. */
  def simSearchIvf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // nProbe=k/2: the fixture embeddings are isotropic random (no
    // cluster structure), where IVF recall degrades fast with few
    // probes; real embedding corpora cluster and probe fewer cells
    val k = 16
    val nProbe = 8
    val e = t(s, d, "embeddings")
      .withColumn("features", array_to_vector(col("embedding")))
      .cache()
    try {
      val model = new KMeans().setK(k).setSeed(42L).setMaxIter(10)
        .setFeaturesCol("features").fit(e)
      val assigned = model.transform(e) // adds `prediction` = cell id
      val probeVec = e.filter(col("vec_id") === 0)
        .select("features").head().getAs[org.apache.spark.ml.linalg.Vector](0)
      val cells = model.clusterCenters.zipWithIndex
        .map { case (c, i) =>
          (i, org.apache.spark.ml.linalg.Vectors.sqdist(c, probeVec))
        }
        .sortBy(_._2).take(nProbe).map(_._1)
      val probe = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("probe"))
      assigned
        .filter(col("prediction").isin(cells.toSeq: _*) && col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id"), col("prediction").as("ivf_cell"),
          round(cosine(col("embedding"), col("probe")), 6).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    } finally e.unpersist()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_search_topk" -> (simSearchTopk _),
    "sim_search_ivf" -> (simSearchIvf _)
  )

  val oracles: Map[String, String] = Map(
    "sim_search_topk" ->
      """SELECT vec_id, label,
        |  ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
        |     WHERE vec_id = 0)), 6) AS cos
        |FROM embeddings WHERE vec_id <> 0
        |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
  )
}
