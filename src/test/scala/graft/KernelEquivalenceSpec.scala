package graft

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 optimization guard: each compiled kernel that replaced a
  * relational/HOF pipeline must be BIT-IDENTICAL to the form it
  * replaced. The old recipes live here as the reference
  * implementations and are replayed over the fixture plus adversarial
  * planted strings (multi-space, trailing-space, empty, non-ASCII
  * BMP) — if a kernel ever drifts from the pinned semantics, these
  * fail before the oracle gate does. */
class KernelEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  private def plantedDocs: DataFrame = Seq(
    (1L, "a  b c"),           // consecutive spaces -> empty token
    (2L, "trailing space "),  // trailing empty token (split limit -1)
    (3L, ""),                 // empty text -> one empty token
    (4L, "café مرحبا x"), // 2- and 3-byte UTF-8
    (5L, "x"),
    (6L, ("naïve beat " * 12) + "tail pattern here ok!")
  ).toDF("doc_id", "text")

  /** The pre-round-15 relational SimHash fingerprint. */
  private def simhashRelational(docs: DataFrame): DataFrame = {
    val tokens = docs
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
    sims.select(col("doc_id"), simhash.as("simhash"))
  }

  private def simhashKernel(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      GraftBridge.column(graft.functions.SimHash64(
        GraftBridge.expression(col("text")))).as("simhash"))

  test("Md5Prefix equals conv(substring(md5(s), 1, n), 16, 10)") {
    val toks = Tables.t(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .unionByName(Seq("", "café", "مرحبا", "x y").toDF("tok"))
    for (n <- Seq(4, 6, 8, 10, 13)) {
      val kern = GraftBridge.column(graft.functions.Md5Prefix(
        GraftBridge.expression(col("tok")), n))
      val rel = expr(s"CAST(conv(substring(md5(tok), 1, $n), 16, 10) AS BIGINT)")
      assert(toks.filter(!(kern <=> rel)).count() == 0L, s"nHex=$n")
    }
  }

  test("TokenGramMd5 generator equals the md5 transform fan") {
    val k = 3
    for (docs <- Seq(Tables.t(spark, sf, "documents")
        .select(col("doc_id"), col("text")), plantedDocs)) {
      val rel = docs
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= k)
        .select(col("doc_id"),
          posexplode(expr(
            s"""transform(sequence(1, size(toks) - ${k - 1}),
               |  i -> cast(conv(substring(md5(
               |         array_join(slice(toks, i, $k), ' ')), 1, 10),
               |       16, 10) as bigint))""".stripMargin))
            .as(Seq("p0", "h")))
        .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("h"))
      val kern = docs.select(col("doc_id"),
        GraftBridge.column(graft.functions.TokenGramMd5(
          GraftBridge.expression(col("text")), k, 10))
          .as(Seq("pos", "h")))
      val diff = kern.as("x").join(rel.as("y"),
          col("x.doc_id") === col("y.doc_id") &&
            col("x.pos") === col("y.pos"), "full_outer")
        .filter(col("x.doc_id").isNull || col("y.doc_id").isNull ||
          !(col("x.h") <=> col("y.h")))
        .count()
      assert(diff == 0L)
    }
  }

  test("SimHash64 kernel equals the relational vote aggregate") {
    for (docs <- Seq(Tables.t(spark, sf, "documents")
        .select(col("doc_id"), col("text")), plantedDocs)) {
      val diff = simhashKernel(docs).as("k")
        .join(simhashRelational(docs).as("r"), Seq("doc_id"), "full_outer")
        .filter(!(col("k.simhash") <=> col("r.simhash")))
        .count()
      assert(diff == 0L)
    }
  }

  /** The pre-round-15 relational tempo/ACF pipeline. */
  private def tempoRelational(docs: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id"))
    val cx = docs
      .filter(length(col("text")) >= 64)
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(1, 64), i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))"))
          .as(Seq("i", "x")))
      .withColumn("xc", lit(64L) * col("x") - sum(col("x")).over(byDoc))
      .select(col("doc_id"), col("i").cast("long").as("i"), col("xc"))
    val r0 = cx.groupBy(col("doc_id"))
      .agg(sum(col("xc") * col("xc")).as("r0"))
    val a = cx.select(col("doc_id"), col("i"), col("xc").as("xa"))
      .withColumn("lag", explode(expr("sequence(4, 32)")))
      .select(col("doc_id"), col("lag"),
        (col("i") + col("lag")).as("j"), col("xa"))
    val b = cx.select(col("doc_id"), col("i").as("j"), col("xc").as("xb"))
    val rk = Window.partitionBy(col("doc_id"))
      .orderBy(col("r").desc, col("lag"))
    a.join(b, Seq("doc_id", "j"))
      .groupBy(col("doc_id"), col("lag"))
      .agg(sum(col("xa") * col("xb")).as("r"))
      .withColumn("rn", row_number().over(rk))
      .filter(col("rn") === 1)
      .join(r0, Seq("doc_id"))
      .select(col("doc_id"), col("lag").as("tempo_lag"),
        col("r").as("r_peak"), col("r0"))
  }

  private def tempoKernel(docs: DataFrame): DataFrame =
    docs.filter(length(col("text")) >= 64)
      .select(col("doc_id"),
        GraftBridge.column(graft.functions.TempoAcf(
          GraftBridge.expression(col("text"))))
          .as(Seq("tempo_lag", "r_peak", "r0")))

  test("TempoAcf generator equals the relational lag-join pipeline") {
    val planted = Seq(
      (100L, "ab" * 40),                         // strong period 2
      (101L, ("x" * 30) + ("ab cd! " * 10)),     // mixed
      (102L, "café über " * 12)        // 2-byte UTF-8 chars
    ).toDF("doc_id", "text")
    for (docs <- Seq(Tables.t(spark, sf, "documents")
        .select(col("doc_id"), col("text")), planted)) {
      val diff = tempoKernel(docs).as("k")
        .join(tempoRelational(docs).as("r"), Seq("doc_id"), "full_outer")
        .filter(!(col("k.tempo_lag") <=> col("r.tempo_lag")) ||
          !(col("k.r_peak") <=> col("r.r_peak")) ||
          !(col("k.r0") <=> col("r.r0")))
        .count()
      assert(diff == 0L)
    }
  }

  test("MinHashSig kernel equals the explode + 16-way min aggregate") {
    for (docs <- Seq(Tables.t(spark, sf, "documents")
        .select(col("doc_id"), col("text")), plantedDocs)) {
      val toks = docs
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
      val hashAggs = (0 until 16).map(i =>
        min(xxhash64(lit(i), col("tok"))).as(s"h$i"))
      val rel = toks.groupBy(col("doc_id")).agg(hashAggs.head, hashAggs.tail: _*)
      val sig = GraftBridge.column(graft.functions.MinHashSig(
        GraftBridge.expression(col("text")), 16))
      val kern = docs.filter(col("text").isNotNull)
        .select(col("doc_id"), sig.as("sig"))
        .select(col("doc_id") +:
          (0 until 16).map(i => col("sig")(i).as(s"h$i")): _*)
      val cond = (0 until 16)
        .map(i => !(col(s"k.h$i") <=> col(s"r.h$i")))
        .reduce(_ || _)
      val diff = kern.as("k").join(rel.as("r"), Seq("doc_id"), "full_outer")
        .filter(cond).count()
      assert(diff == 0L)
    }
  }

  test("TokenGramHashes generator equals the transform/slice/array_join fan") {
    val k = 5
    for (docs <- Seq(Tables.t(spark, sf, "documents")
        .select(col("doc_id"), col("text")), plantedDocs)) {
      val rel = docs
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= k)
        .select(col("doc_id"), size(col("toks")).as("n_tokens"),
          posexplode(expr(
            s"""transform(sequence(1, size(toks) - ${k - 1}),
               |  i -> xxhash64(array_join(slice(toks, i, $k), ' ')))"""
              .stripMargin))
            .as(Seq("p0", "h")))
        .select(col("doc_id"), col("n_tokens"),
          (col("p0") + 1).cast("long").as("pos"), col("h"))
      val kern = docs.select(col("doc_id"),
        GraftBridge.column(graft.functions.TokenGramHashes(
          GraftBridge.expression(col("text")), k))
          .as(Seq("n_tokens", "pos", "h")))
      val diff = kern.as("x").join(rel.as("y"),
          col("x.doc_id") === col("y.doc_id") &&
            col("x.pos") === col("y.pos"), "full_outer")
        .filter(col("x.doc_id").isNull || col("y.doc_id").isNull ||
          !(col("x.h") <=> col("y.h")) ||
          !(col("x.n_tokens") <=> col("y.n_tokens")))
        .count()
      assert(diff == 0L)
    }
  }

  /** MicroQuant vs the transform/round/cast lambda, and the long folds
    * vs their aggregate/zip_with forms, over the embeddings fixture. */
  test("MicroQuant and long-vector folds equal the HOF forms") {
    val e = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val micro = GraftBridge.column(graft.functions.MicroQuant(
      GraftBridge.expression(col("embedding"))))
    val microHof = transform(col("embedding"),
      x => round(x.cast("double") * 1000000d).cast("bigint"))
    assert(e.filter(!(micro <=> microHof)).count() == 0L)

    val m = e.select(col("vec_id"), micro.as("micro"))
    val dotK = GraftBridge.column(graft.functions.VecDotLong(
      GraftBridge.expression(col("micro")),
      GraftBridge.expression(col("micro"))))
    val dotHof = aggregate(transform(col("micro"), x => x * x),
      lit(0L), (acc, x) => acc + x)
    assert(m.filter(!(dotK <=> dotHof)).count() == 0L)

    val probe = m.orderBy(col("vec_id")).limit(1)
      .select(col("micro")).collect()(0).getSeq[Long](0)
    val sqK = GraftBridge.column(graft.functions.VecSqDistLong(
      GraftBridge.expression(col("micro")),
      GraftBridge.expression(typedLit(probe))))
    val sqHof = aggregate(zip_with(col("micro"), typedLit(probe),
      (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x)
    assert(m.filter(!(sqK <=> sqHof)).count() == 0L)
  }
}
