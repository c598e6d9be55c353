package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{Codecs, Routing}

/** Randomized contract checks (seeded — reproducible) for the decode and
  * routing layers, evaluated through Spark itself so the tested code
  * path is the real columnar one (SURVEY.md §5.3). */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(4242)

  test("property: clean∘base64 roundtrips arbitrary binary through Spark") {
    val blobs = (1 to 300).map { _ =>
      val b = new Array[Byte](rnd.nextInt(512)); rnd.nextBytes(b); b
    }
    val out = blobs.toDF("b")
      .select(
        col("b"),
        Codecs.safeUnbase64(Codecs.cleanBase64(
          concat(lit("!!"), base64(col("b")), lit("  ")))).as("rt"))
      .collect()
    out.foreach { r =>
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1)))
    }
  }

  test("property: ingest is total — random envelope soup never throws, valid rows conserved") {
    def b64(s: String) =
      java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
    val valid = (0 until 60).map { i =>
      s"""{"MessageType":"Raw","Source":"fz.t${i % 3}","Destination":"fz","Data":"${b64(s"""{"k":$i}""")}"}"""
    }
    val garbage = (0 until 60).map { _ =>
      (1 to rnd.nextInt(80)).map(_ => rnd.nextPrintableChar()).mkString
    }
    val halfBroken = (0 until 60).map { i =>
      rnd.nextInt(4) match {
        case 0 => s"""{"Source":"fz.t${i % 3}","Destination":"fz"}""" // no Data
        case 1 => s"""{"Source":"###","Destination":"fz","Data":"${b64("{}")}"}""" // bad route
        case 2 => s"""{"Source":"fz.bad","Destination":"fz","Data":"!!not-base64-rows!!"}"""
        case _ => s"""[{"Source":"fz.t${i % 3}","Destination":"fz","Data":"${b64(s"""{"k":${1000 + i}}""")}"}]"""
      }
    }
    val soup = rnd.shuffle(valid ++ garbage ++ halfBroken)
    val out = java.nio.file.Files.createTempDirectory("graft_fuzz").toString
    val report = graft.ingest.Pipeline.ingest(spark, soup.toDF("value"),
      graft.ingest.Pipeline.IngestConfig(outDir = out))
    assert(report.failed.isEmpty, report.failed)
    // every well-formed valid envelope lands exactly once
    val written = spark.read.parquet(out)
    val validKeys = written.select(col("k").cast("long")).collect()
      .map(_.getLong(0)).toSet
    assert((0 until 60).forall(i => validKeys.contains(i.toLong)))
    assert(written.count() == report.written.map(_.rows).sum)
  }

  test("property: CleanBase64 expression == the regex composition it replaced") {
    val strs = (1 to 300).map { _ =>
      (1 to rnd.nextInt(200)).map(_ => rnd.nextPrintableChar()).mkString
    } :+ "" :+ "====" :+ "a" :+ "ab" :+ "abc"
    val regexVersion = {
      val cleaned = regexp_replace(col("s"), "[^A-Za-z0-9+/=]", "")
      concat(cleaned, repeat(lit("="), (lit(4) - (length(cleaned) % 4)) % 4))
    }
    val rows = strs.toDF("s")
      .select(Codecs.cleanBase64(col("s")).as("fast"), regexVersion.as("ref"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1), r))
  }

  test("property: full decode chain recovers arbitrary UTF-8 under every codec") {
    def gz(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    def defl(b: Array[Byte], nowrap: Boolean) = {
      val d = new java.util.zip.Deflater(6, nowrap)
      d.setInput(b); d.finish()
      val buf = new Array[Byte](b.length * 2 + 1024)
      val n = d.deflate(buf); d.end(); java.util.Arrays.copyOf(buf, n)
    }
    val texts = (1 to 100).map(_ =>
      rnd.alphanumeric.take(rnd.nextInt(200)).mkString + "✓ü")
    val b64 = java.util.Base64.getEncoder
    val rows = texts.flatMap { t =>
      val raw = t.getBytes("UTF-8")
      Seq(
        (t, b64.encodeToString(raw)),
        (t, b64.encodeToString(gz(raw))),
        (t, b64.encodeToString(defl(raw, nowrap = true))),
        (t, b64.encodeToString(defl(raw, nowrap = false))))
    }
    val out = rows.toDF("expected", "data")
      .select(col("expected"), Codecs.decodePayload(col("data")).as("got"))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("property: route parts always land in the sanitized alphabet") {
    val junk = (1 to 300).map { _ =>
      val len = rnd.nextInt(30)
      val s = (1 to len).map(_ => rnd.nextPrintableChar()).mkString
      val d = if (rnd.nextBoolean()) null
              else (1 to rnd.nextInt(10)).map(_ => rnd.nextPrintableChar()).mkString
      (s, d)
    }
    val out = Routing.withRoute(junk.toDF("s", "d"), col("s"), col("d"), "landing")
      .select("folder", "source_db", "tbl", "d").collect()
    val ok = "^[a-z0-9_-]*$".r
    out.foreach { r =>
      // fallback applies only to MISSING/blank destinations (reference
      // :106-107); db/table fall back to unknown_db/unknown_table
      // (:110-111) so they are NEVER empty — no junk source is dropped
      if (r.isNullAt(3) || r.getString(3).trim.isEmpty)
        assert(r.getString(0) == "landing")
      assert(ok.findFirstIn(r.getString(0)).isDefined, r.getString(0))
      assert(ok.findFirstIn(r.getString(1)).isDefined, r.getString(1))
      assert(ok.findFirstIn(r.getString(2)).isDefined, r.getString(2))
      assert(r.getString(1).nonEmpty && r.getString(2).nonEmpty)
    }
  }

  test("pyStrip removes Unicode whitespace like Python str.strip()") {
    // NBSP-wrapped destination must route like its stripped form, not
    // turn the NBSP into a leading '_' (reference strip() is Unicode)
    val df = Seq(("db.tbl", "\u00A0Telemetry\u2028")).toDF("s", "d")
    val out = Routing.withRoute(df, col("s"), col("d"), "landing")
      .select("folder").head().getString(0)
    assert(out == "telemetry", out)
  }

  test("property: stringifyAll is total over parsed arbitrary JSON shapes") {
    val jsons = (1 to 100).map { i =>
      rnd.nextInt(4) match {
        case 0 => s"""{"a":$i,"b":[1,2,{"c":true}],"d":null}"""
        case 1 => s"""{"x":{"y":{"z":"$i"}},"w":${rnd.nextDouble()}}"""
        case 2 => s"""{"arr":[[1],[2,3]],"s":"t${i}"}"""
        case _ => s"""{"m":{"k$i":"v"},"n":${rnd.nextLong()}}"""
      }
    }
    val parsed = spark.read.json(jsons.toDS())
    val out = graft.ingest.Normalize.stringifyAll(parsed)
    assert(out.schema.fields.forall(_.dataType.typeName == "string"))
    assert(out.count() == 100)
  }

  test("property: fused decode_payload == stage-by-stage on random soup") {
    import org.apache.spark.unsafe.types.UTF8String
    // adversarial generator: valid base64 of (plain | gzip | deflate)
    // payloads, junk-wrapped variants, truncations, and raw noise
    val gen = (1 to 400).map { i =>
      val payload = s"""{"k":$i,"s":"${"x" * (i % 40)}"}"""
      val enc = java.util.Base64.getEncoder
      def gz(b: Array[Byte]) = {
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(b); g.close(); bos.toByteArray
      }
      i % 7 match {
        case 0 => enc.encodeToString(payload.getBytes("UTF-8"))
        case 1 => enc.encodeToString(gz(payload.getBytes("UTF-8")))
        case 2 => "??" + enc.encodeToString(payload.getBytes("UTF-8")) + "!!"
        case 3 => enc.encodeToString(payload.getBytes("UTF-8")).dropRight(
          rnd.nextInt(4) + 1) // truncation
        case 4 => val b = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(b)
          new String(b.map(x => (math.abs(x % 94) + 32).toByte), "US-ASCII")
        case 5 => "=" * (rnd.nextInt(8))
        case _ => ""
      }
    }
    val fused = gen.toDF("Data")
      .select(Codecs.decodePayload(col("Data")).as("p"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    val staged = gen.map { s =>
      val cleaned = graft.functions.Base64Cleaner.clean(
        UTF8String.fromString(s))
      val bin = graft.functions.PayloadCodec.unbase64OrNull(cleaned)
      if (bin == null) null
      else {
        val u = graft.functions.Utf8Codec.decodeOrNull(
          graft.functions.ZlibCodec.decompress(bin))
        if (u == null) null else u.toString
      }
    }
    assert(fused.toSeq == staged)
    // every well-formed input (cases 0-2) must decode to its payload
    gen.zip(fused).zipWithIndex.foreach { case ((_, out), idx) =>
      val i = idx + 1 // generator index is 1-based
      if (i % 7 <= 2)
        assert(out != null && out.contains(s""""k":$i"""), s"i=$i")
    }
  }

  test("n-gram registration validates arity and the static n argument") {
    Codecs.register(spark)
    // missing n -> the standard WRONG_NUM_ARGS AnalysisException, not an
    // opaque IndexOutOfBoundsException from the builder
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT char_ngrams('abc')").collect()
    }
    assert(e1.getMessage.contains("char_ngrams"), e1.getMessage)
    // non-foldable n -> NON_FOLDABLE_ARGUMENT, not a ClassCastException
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT token_ngrams('a b c', CAST(id AS INT)) FROM range(1)")
        .collect()
    }
    assert(e2.getMessage.contains("token_ngrams"), e2.getMessage)
    // any integral width is accepted: a LONG literal works like an INT
    val r = spark.sql("SELECT char_ngrams('abcd', CAST(3 AS BIGINT)) AS g")
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("abc", "bcd"), r.toString)
    // out-of-Int-range long must raise, not truncate (2^32+1 would
    // silently become n = 1 via Number.intValue)
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT char_ngrams('abc', 4294967297)").collect()
    }
    assert(e3.getMessage.contains("char_ngrams"), e3.getMessage)
    // size parameters must be >= 1 AT ANALYSIS TIME: graft_ares_sample
    // with k = 0 otherwise falls through `buf.size < k` onto an empty
    // heap's .head — a NoSuchElementException on the EXECUTOR
    for (sql <- Seq(
        "SELECT graft_ares_sample(CAST(id AS STRING), 0) FROM range(5)",
        "SELECT graft_misra_gries(CAST(id AS STRING), -3) FROM range(5)",
        "SELECT char_ngrams('abc', 0)")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(sql).collect()
      }
      assert(e.getMessage.contains(">= 1"), s"$sql => ${e.getMessage}")
    }
  }

  test("property: char_ngrams/token_ngrams match sliding-window semantics") {
    Codecs.register(spark)
    val alpha = "abc xyz "
    val texts = (1 to 200).map { i =>
      val len = rnd.nextInt(30)
      (i.toLong, (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    }
    val df = texts.toDF("id", "t")
    df.createOrReplaceTempView("ngram_prop")
    val charGot = spark.sql(
      "SELECT id, char_ngrams(t, 3) AS g FROM ngram_prop")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val tokGot = spark.sql(
      "SELECT id, token_ngrams(t, 2) AS g FROM ngram_prop")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    texts.foreach { case (id, t) =>
      val expectChar =
        if (t.length < 3) Seq.empty
        else t.sliding(3).toSeq
      assert(charGot.getOrElse(id, Seq.empty) == expectChar, s"id=$id [$t]")
      // limit -1: trailing empty tokens are KEPT — DuckDB string_split
      // semantics, the round-12-advice parity the generator adopted
      // (the Char-overload model here masked exactly that divergence)
      val toks = t.split(" ", -1)
      val expectTok =
        if (toks.length < 2) Seq.empty
        else toks.sliding(2).map(_.mkString(" ")).toSeq
      assert(tokGot.getOrElse(id, Seq.empty) == expectTok, s"id=$id [$t]")
    }
  }

  test("property: misra-gries guarantee on zipf-random streams") {
    Codecs.register(spark)
    (1 to 5).foreach { trial =>
      // zipf-ish: item k drawn with weight 1/k over 500 items
      val items = (1 to 500).toArray
      val weights = items.map(1.0 / _)
      val cum = weights.scanLeft(0.0)(_ + _).tail
      val total = cum.last
      val r2 = new scala.util.Random(1000 + trial)
      val stream = (1 to 20000).map { _ =>
        val x = r2.nextDouble() * total
        s"item${items(cum.indexWhere(_ >= x))}"
      }
      val n = stream.size.toLong
      val m = 20
      stream.toDF("tok").repartition(7).createOrReplaceTempView("mg_prop")
      val sketch = spark.sql(s"SELECT graft_misra_gries(tok, $m) FROM mg_prop")
        .collect().head.getMap[String, Long](0)
      assert(sketch.size <= m, s"trial $trial overflow")
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      exact.foreach { case (tok, c) =>
        // presence guarantee for true heavy hitters
        if (c > n / (m + 1))
          assert(sketch.contains(tok), s"trial $trial: $tok freq $c missing")
        // any stored count is a valid undercount within the bound
        sketch.get(tok).foreach { stored =>
          assert(stored <= c && c - stored <= n / (m + 1) + 1,
            s"trial $trial: $tok stored $stored true $c")
        }
      }
    }
  }

  test("property: growing-frame decompositions equal the naive sliding RANGE frames") {
    // The round-7 rewrites (trailing-1h count/max over time buckets,
    // trailing-10000 price band over price buckets) claim bit-identical
    // results to the sliding frames they replaced. Stress the claim on
    // adversarial data the fixture can't guarantee: exact bucket-edge
    // timestamps/prices, equal-key ties, sparse and dense keys.
    val dir = java.nio.file.Files.createTempDirectory("graft_prop_rf").toString
    val baseUs = 1700000000000000L
    val events = (1 to 3000).map { i =>
      val offs = rnd.nextInt(5) match {
        case 0 => rnd.nextInt(48).toLong * 600000000L  // exact 10-min edges
        case 1 => rnd.nextInt(8).toLong * 3600000000L  // exact hour edges
        case 2 => rnd.nextInt(200).toLong * 144000000L // repeating ties
        case _ => math.abs(rnd.nextLong()) % (8L * 3600000000L)
      }
      (i.toLong, baseUs + offs, rnd.nextInt(5).toLong, "e",
        rnd.nextInt(7) * 13.37, "{}")
    }
    events.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), expr("timestamp_micros(us)").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    spark.read.parquet(s"$dir/events.parquet")
      .createOrReplaceTempView("prop_ev_naive")
    val naiveEv = spark.sql(
      """SELECT event_id, COUNT(*) OVER w AS cnt_1h,
        |  ROUND(MAX(value) OVER w, 2) AS max_1h
        |FROM prop_ev_naive
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val gotEv = graft.queries.Windows.windowRangeInterval(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(gotEv.toSeq == naiveEv.toSeq)

    val orders = (1 to 3000).map { i =>
      val price = rnd.nextInt(4) match {
        case 0 => rnd.nextInt(12).toLong * 10000.0     // exact bucket edges
        case 1 => rnd.nextInt(12) * 10000.0 + 9999.999 // just under an edge
        case 2 => rnd.nextInt(60) * 2000.0             // repeating ties
        case _ => rnd.nextDouble() * 120000.0
      }
      (i.toLong, s"P${rnd.nextInt(3)}", price)
    }
    orders.toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    spark.read.parquet(s"$dir/orders.parquet")
      .createOrReplaceTempView("prop_ord_naive")
    val naiveOrd = spark.sql(
      """SELECT o_orderkey,
        |  COUNT(*) OVER w AS cnt_band, MAX(o_totalprice) OVER w AS max_band
        |FROM prop_ord_naive
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |  RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val gotOrd = graft.queries.Windows.windowRangeFrame(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(gotOrd.toSeq == naiveOrd.toSeq)
  }

  test("property: withGlobalIndex equals row_number on random multi-key data") {
    // The round-8 zipWithIndex decomposition (range partition →
    // per-partition monotonically_increasing_id rank → broadcast
    // prefix-sum) must reproduce the naive global row_number EXACTLY,
    // including duplicate keys (ties are broken arbitrarily but the
    // per-key index MULTISET must match), skew (many rows on one key),
    // and partition counts that don't divide the data evenly.
    import org.apache.spark.sql.expressions.Window
    val rows = (1 to 2000).map { i =>
      // skewed: ~25% of rows share key (7, 7)
      if (rnd.nextInt(4) == 0) (7L, 7L, i.toLong)
      else (rnd.nextInt(50).toLong, rnd.nextInt(20).toLong, i.toLong)
    }
    val df = rows.toDF("k1", "k2", "uid")
    for (parts <- Seq(1, 5, 32)) {
      val keys = Seq(col("k1"), col("k2"), col("uid"))
      val got = graft.queries.Ordered
        .withGlobalIndex(df, keys, "idx", parts)
        .select(col("k1"), col("k2"), col("uid"), col("idx"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
        .toMap
      val naive = df
        .withColumn("idx",
          (row_number().over(Window.orderBy(col("k1"), col("k2"), col("uid")))
            - 1).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
        .toMap
      assert(got == naive, s"parts=$parts")
    }
  }

  test("property: ntileFromRank equals SQL ntile for every n and k") {
    // closed-form bucket arithmetic vs the engine's ntile over a total
    // order — exhaustively for small n (covers n<k, n=k, remainders)
    // and spot-checked at larger n
    import org.apache.spark.sql.expressions.Window
    for (n <- (1 to 17) ++ Seq(100, 997); k <- Seq(2, 5, 7)) {
      val df = (1L to n.toLong).toDF("id")
      val naive = df
        .withColumn("t", ntile(k).over(Window.orderBy(col("id"))))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = graft.queries.Ordered.ntileFromRank(
          df.withColumn("rank", col("id"))
            .withColumn("n", lit(n.toLong)),
          "rank", "n", k, "t")
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("t")).toMap
      assert(got == naive, s"n=$n k=$k")
    }
  }
}
