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
}
