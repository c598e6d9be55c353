package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{Codecs, Normalize, Pipeline, Routing}

/** Unit coverage for base64 cleaning, route resolution, normalization
  * and the merge semantics (reference src/function_app.py:88-127,
  * 161-191, 97-113). */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- clean_base64 (reference :118-127) ---

  test("cleanBase64 strips junk and re-pads") {
    val df = Seq("??aGVsbG8!!", "aGVsbG8=", "YQ").toDF("s")
      .select(Codecs.cleanBase64(col("s")).as("c"))
    assert(df.as[String].collect().toSeq ==
      Seq("aGVsbG8=", "aGVsbG8=", "YQ=="))
  }

  test("cleanBase64 ∘ base64 is identity-compatible on valid input") {
    val texts = Seq("hello world", "", "ünïcødé ✓")
    val df = texts.toDF("t")
      .select(decode(Codecs.safeUnbase64(Codecs.cleanBase64(
        regexp_replace(base64(col("t").cast("binary")), "[\\r\\n]", ""))), "UTF-8").as("rt"))
    assert(df.as[String].collect().toSeq == texts)
  }

  test("safeUnbase64 nulls a dangling base64 unit instead of failing") {
    val df = Seq("A===").toDF("s").select(Codecs.safeUnbase64(col("s")).as("b"))
    assert(df.collect().head.isNullAt(0))
  }

  // --- route resolution (reference :88-113) ---

  private def route(src: String, dest: String): (String, String, String) = {
    val df = Routing.withRoute(
      Seq((Option(src), Option(dest))).toDF("s", "d"),
      col("s"), col("d"), "landing")
    val r = df.select("folder", "source_db", "tbl").head()
    (r.getString(0), r.getString(1), r.getString(2))
  }

  test("route: db.table split on first dot; later dots become _") {
    assert(route("FactoryDB.Sensor.Readings", "Telemetry") ==
      ("telemetry", "factorydb", "sensor_readings"))
  }

  test("route: no dot duplicates into both parts") {
    assert(route("plaintable", "f") == ("f", "plaintable", "plaintable"))
  }

  test("route: source keep-regex drops illegal chars, dest _-replaces") {
    // Source goes through the keep-regex (spaces/! removed pre-split,
    // reference :98-99); Destination only lower+run-replace (:88-92).
    assert(route("my db!.the table", "Fold er") ==
      ("fold_er", "mydb", "thetable"))
  }

  test("route: dest with spaces underscores, not strips (ref :88-92)") {
    assert(route("a.b", "My Folder") == ("my_folder", "a", "b"))
  }

  test("route: empty destination falls back") {
    assert(route("a.b", "") == ("landing", "a", "b"))
    assert(route("a.b", null) == ("landing", "a", "b"))
    assert(route("a.b", "   ") == ("landing", "a", "b"))
  }

  test("route: empty source falls back to unknown_db/unknown_table") {
    assert(route("", "x") == ("x", "unknown_db", "unknown_table"))
  }

  test("route: all-illegal source routes to unknown_* (persisted, not dropped)") {
    assert(route("!!!", "ok") == ("ok", "unknown_db", "unknown_table"))
  }

  test("route: whitespace-padded source is stripped before keep-regex") {
    assert(route("  Db.T1  ", "f") == ("f", "db", "t1"))
  }

  // --- normalization + merge (reference :161-191) ---

  test("stringifyAll erases every type to string, preserving nulls") {
    val df = Seq((1, 2.5, true, Some("s"), Seq(1, 2)), (2, 3.0, false, None, Seq.empty[Int]))
      .toDF("i", "d", "b", "s", "arr")
    val out = Normalize.stringifyAll(df)
    assert(out.schema.fields.forall(_.dataType.typeName == "string"))
    val r = out.orderBy("i").collect()
    assert(r(0).getString(0) == "1" && r(0).getString(1) == "2.5" &&
      r(0).getString(2) == "true" && r(0).getString(3) == "s" &&
      r(0).getString(4) == "[1,2]")
    assert(r(1).isNullAt(3))
  }

  test("mergeColumnars = union of columns with null padding, row counts add") {
    val a = Seq(("x", 1)).toDF("c1", "c2")
    val b = Seq(("y", true)).toDF("c1", "c3")
    val m = Normalize.mergeColumnars(Seq(a, b))
    assert(m.columns.toSet == Set("c1", "c2", "c3"))
    assert(m.count() == 2)
    val rows = m.orderBy("c1").collect()
    assert(rows(0).getString(0) == "x" && rows(0).getInt(1) == 1 && rows(0).isNullAt(2))
    assert(rows(1).getString(0) == "y" && rows(1).isNullAt(1) && rows(1).getBoolean(2))
  }

  test("explodeColumnar pivots equal-length arrays and null-pads ragged columns") {
    val df = spark.read.json(Seq(
      """{"a":["x","y"],"b":[1,2]}""",
      """{"a":["z"],"c":[true]}""").toDS())
    val out = Normalize.explodeColumnar(df).orderBy("a")
    val rows = out.collect()
    assert(out.columns.toSeq == Seq("a", "b", "c"))
    assert(rows.length == 3)
    assert(rows(0).getString(0) == "x" && rows(0).getLong(1) == 1 && rows(0).isNullAt(2))
    assert(rows(2).getString(0) == "z" && rows(2).isNullAt(1) && rows(2).getBoolean(2))
  }

  test("merge_into_cdc exercises every MERGE branch; tombstones delete") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.IngestQueries.mergeIntoCdc(spark, sf)
    val byAction = out.groupBy(col("action")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byAction.getOrElse("kept", 0L) > 0, byAction.toString)
    assert(byAction.getOrElse("updated", 0L) > 0, byAction.toString)
    assert(byAction.getOrElse("inserted", 0L) > 0, byAction.toString)
    // matched keys whose latest post-cut change is an 'error' tombstone
    // must be ABSENT from the merged state: the merged key count is
    // strictly below target-keys + batch-born keys
    val ev = graft.Tables.t(spark, sf, "events")
      .select(col("user_id"),
        org.apache.spark.sql.functions
          .get_json_object(col("props"), "$.k").cast("int").as("k"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("tsu"))
    val cut = 1705795200000000L
    val targetKeys = ev.filter(col("tsu") < cut)
      .select(col("user_id"), col("k")).distinct().count()
    val bornKeys = ev.groupBy(col("user_id"), col("k"))
      .agg(org.apache.spark.sql.functions.min(col("tsu")).as("first"))
      .filter(col("first") >= cut).count()
    assert(out.count() < targetKeys + bornKeys,
      s"${out.count()} vs $targetKeys + $bornKeys — no deletes happened")
  }
}
