package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** Quality bound for the approximate similarity path: IVF with
  * nProbe=4 of k=16 cells must recover most of the exact top-10
  * (recall floor chosen loosely — the point is catching a broken
  * quantizer, not tuning the index on fixtures). */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("embedding_pca_project: orthonormal components, eigen-ordered variance, replayable scores") {
    val (mu, proj, eig) = graft.llm.Similarity.pcaModel(spark, sf)
    assert(proj.length == 4 && eig.length == 4)
    // eigenvalues descending and non-negative (covariance is PSD)
    assert(eig.sliding(2).forall { case Array(a, b) => a >= b - 1e-12 })
    assert(eig.forall(_ >= -1e-10))
    // components orthonormal
    for (i <- 0 until 4; j <- i until 4) {
      val dot = proj(i).zip(proj(j)).map { case (x, y) => x * y }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"<p$i,p$j> = $dot")
    }
    val rows = graft.llm.Similarity.embeddingPcaProject(spark, sf).collect()
      .map(r => r.getLong(0) ->
        Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    assert(rows.length == vecs.length)
    // scores replay as (x - mu) . w in micros
    val byId = rows.toMap
    vecs.foreach { case (id, emb) =>
      val got = byId(id)
      proj.zipWithIndex.foreach { case (w, c) =>
        val score = emb.indices.map(i => (emb(i).toDouble - mu(i)) * w(i)).sum
        assert(math.abs(got(c) - math.floor(score * 1e6 + 0.5).toLong) <= 1L)
      }
    }
    // per-component score variance tracks its eigenvalue
    val n = rows.length.toDouble
    (0 until 4).foreach { c =>
      val xs = rows.map(_._2(c).toDouble / 1e6)
      val m = xs.sum / n
      val variance = xs.map(x => (x - m) * (x - m)).sum / n
      assert(math.abs(variance - eig(c)) < math.max(1e-6, eig(c) * 0.01),
        s"pc${c + 1} variance $variance vs eigenvalue ${eig(c)}")
    }
  }

  test("embedding_covariance: upper triangle, non-negative diagonal, matches brute force") {
    val rows = graft.llm.Similarity.embeddingCovariance(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(f =>
        BigDecimal(f.toDouble).setScale(8, BigDecimal.RoundingMode.HALF_UP)))
    val dim = vecs.head.length
    assert(rows.size == dim * (dim + 1) / 2)
    val n = vecs.length.toDouble
    assert(rows.values.forall(_._1 == vecs.length.toLong))
    // brute-force a scattering of cells, including the full diagonal
    val cells = (0 until dim).map(i => (i, i)) ++
      Seq((0, 1), (0, dim - 1), (3, 17), (10, 40))
    cells.foreach { case (i, j) =>
      val sxy = vecs.map(v => v(i) * v(j)).sum
      val (si, sj) = (vecs.map(_(i)).sum, vecs.map(_(j)).sum)
      val cov = sxy.toDouble / n - (si.toDouble / n) * (sj.toDouble / n)
      val expect = math.floor(cov * 1e8 + 0.5).toLong
      assert(rows((i, j))._2 == expect, s"cell ($i,$j)")
      if (i == j) assert(rows((i, j))._2 >= 0L)
    }
  }

  test("IVF top-10 recall vs exact brute force >= 0.5") {
    val exact = Similarity.simSearchTopk(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = Similarity.simSearchIvf(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall (got $approx vs $exact)")
  }

  test("LSH top-10 recall vs exact brute force >= 0.5 and is deterministic") {
    val exact = Similarity.simSearchTopk(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = Similarity.simSearchLsh(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall too low: $recall (got $approx vs $exact)")
    val again = Similarity.simSearchLsh(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(approx == again, "LSH candidate set must be deterministic")
  }

  test("LSH bucket ids stay within [0, 2^bits)") {
    import org.apache.spark.sql.functions.col
    val e = Tables.t(spark, sf, "embeddings")
      .select(Similarity.srpBucket(col("embedding"), 0, 8).as("h"))
    val range = e.agg(
      org.apache.spark.sql.functions.min("h"),
      org.apache.spark.sql.functions.max("h")).head()
    assert(range.getLong(0) >= 0L && range.getLong(1) < 256L)
  }

  test("exact top-k cosine values are sorted and within [-1, 1]") {
    val cos = Similarity.simSearchTopk(spark, sf)
      .select("cos").collect().map(_.getDouble(0))
    assert(cos.forall(c => c >= -1.0 && c <= 1.0))
    assert(cos.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("mmr: first pick is the top cosine hit, picks distinct, scores blend correctly") {
    val top = Similarity.simSearchTopk(spark, sf).collect()
    val mmr = Similarity.simSearchMmr(spark, sf).collect()
    assert(mmr.length == 5)
    // step 1 has no diversity penalty → it must be the global top hit
    assert(mmr.head.getAs[Long]("vec_id") == top.head.getAs[Long]("vec_id"))
    assert(mmr.head.getAs[Double]("mmr_score") ==
      0.5 * mmr.head.getAs[Double]("rel"))
    val ids = mmr.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 5)
    // every later pick blends a diversity term bounded by cosine range:
    // score = λ·rel − (1−λ)·div with div ∈ [−1, 1]
    mmr.tail.foreach { r =>
      val delta = r.getAs[Double]("mmr_score") - 0.5 * r.getAs[Double]("rel")
      assert(delta.abs <= 0.5 + 1e-12, r.toString)
    }
  }

  test("MIPS norm-augmentation: aug-cosine ranking reproduces inner-product ranking") {
    import org.apache.spark.sql.functions._
    import Similarity.{cosine, dot, norm2}
    // the cosine half of the Bachrach/ALSH reduction claim, pinned
    // here because the QUERY ranks by the (bit-exact) augmented dot —
    // ranking by the float32-jittered aug_cos against the exact oracle
    // key would flake on near-ties (round-14 review). Rebuilds the
    // augmented space exactly as simSearchMipsAugmented does and
    // asserts the two orderings agree on the fixture's top 10.
    val e = graft.Tables.t(spark, sf, "embeddings")
    val corpus = e.filter(col("vec_id") =!= 0)
    val maxNorm = corpus.agg(max(norm2(col("embedding"))).as("m"))
    val probe = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe"))
    val scored = corpus
      .crossJoin(broadcast(maxNorm))
      .crossJoin(broadcast(probe))
      .withColumn("aug", concat(col("embedding"),
        array(sqrt(col("m") * col("m") -
          norm2(col("embedding")) * norm2(col("embedding"))).cast("float"))))
      .withColumn("aug_probe", concat(col("probe"), array(lit(0.0f))))
      .select(col("vec_id"),
        dot(col("embedding"), col("probe")).as("ip"),
        cosine(col("aug"), col("aug_probe")).as("aug_cos"))
      .cache()
    val byCos = scored.orderBy(col("aug_cos").desc, col("vec_id"))
      .limit(10).collect().map(_.getAs[Long]("vec_id")).toSeq
    val byIp = scored.orderBy(col("ip").desc, col("vec_id"))
      .limit(10).collect().map(_.getAs[Long]("vec_id")).toSeq
    scored.unpersist()
    assert(byCos == byIp, s"cos=$byCos ip=$byIp")
    // and the query itself agrees with the exact brute-force MIPS rows
    val q = Similarity.simSearchMipsAugmented(spark, sf)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(q == byIp, s"query=$q ip=$byIp")
  }
}
