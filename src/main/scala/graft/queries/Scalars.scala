package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Scalar-function surface (SURVEY.md §2.2 "Scalar functions").
  *
  * The reference's scalar usage is string sanitize regexes, base64, path
  * join, lower/strip, split-on-dot, JSON encode/decode, ISO timestamps
  * (reference src/function_app.py:19,81-92,102,118-127,167,213,282,346);
  * this module exposes the general engine surface those imply. All
  * expressions are Spark built-ins (whole-stage codegen'd, no UDFs);
  * every query is a pure per-row map over one scan — at scale these
  * pipeline into a single stage with the final sort as the only exchange.
  *
  * Cross-engine typing notes baked into the oracles: DuckDB length/len and
  * window/date_part results are BIGINT where Spark produces INT, so the
  * oracle casts; DuckDB regexp_replace needs the 'g' flag to match Spark's
  * replace-all.
  */
object Scalars {

  def scalarString(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select(
        col("c_custkey"),
        lower(col("c_name")).as("lo"),
        upper(col("c_mktsegment")).as("up"),
        substring(col("c_name"), 10, 5).as("sub"),
        trim(concat(lit("  "), col("c_name"), lit("  "))).as("tr"),
        concat(col("c_name"), lit("|"), col("c_mktsegment")).as("cc"),
        regexp_replace(col("c_name"), "0+", "0").as("rr"),
        // array outputs are serialized to a scalar string: the driver's
        // oracle comparator sorts pandas columns and crashes on raw arrays
        array_join(split(col("c_name"), "#"), ",").as("parts"),
        length(col("c_name")).as("ln"))
      .orderBy(col("c_custkey"))

  def scalarDate(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("dt"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dd"),
        to_date(date_trunc("month", col("o_orderdate"))).as("mon"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
          .as("days_since"),
        add_months(to_date(col("o_orderdate")), 3).as("plus3m"))
      .orderBy(col("o_orderkey"))

  def scalarMath(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(
        col("o_orderkey"),
        round(col("o_totalprice").cast("decimal(18,2)"), 0).cast("double").as("r0"),
        abs(col("o_totalprice") - 150000.0).as("dist"),
        ceil(col("o_totalprice")).as("ce"),
        floor(col("o_totalprice")).as("fl"),
        pmod(col("o_orderkey"), lit(7)).as("pm"),
        // pow differs from DuckDB's libm in the last ulp — round defensively
        round(pow(col("o_totalprice") / 100000.0, 2), 6).as("pw"),
        sqrt(col("o_totalprice")).as("sq"))
      .orderBy(col("o_orderkey"))

  def scalarArray(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(
        col("doc_id"),
        // serialized to scalars (comparator-safe); see scalarString note
        array_join(slice(split(col("text"), " "), 1, 5), ",").as("first5"),
        array_join(sort_array(slice(split(col("text"), " "), 1, 5)), ",")
          .as("sorted5"),
        size(split(col("text"), " ")).as("n_words"),
        array_contains(split(col("text"), " "), "spark").as("has_spark"),
        element_at(split(col("text"), " "), 1).as("first_word"))
      .orderBy(col("doc_id"))

  def scalarMap(s: SparkSession, d: String): DataFrame = {
    val m = map(
      lit("cust"), col("c_custkey").cast("string"),
      lit("nat"), col("c_nationkey").cast("string"))
    t(s, d, "customer")
      .select(
        col("c_custkey"),
        array_join(map_keys(m), ",").as("ks"),
        array_join(map_values(m), ",").as("vs"),
        element_at(m, "cust").as("cv"))
      .orderBy(col("c_custkey"))
  }

  /** Schema-full JSON parsing via from_json — the typed-struct
    * complement of [[scalarJson]]'s per-path extraction: one parse
    * yields every field at once (at scale, N path extractions re-parse
    * the string N times; from_json parses once), malformed rows yield
    * a null struct, and downstream code works with real columns. The
    * aggregate proves the parsed field behaves as a first-class int. */
  def scalarJsonTyped(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .withColumn("p", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")))
      .groupBy(col("event_type"))
      .agg(count(col("p.k")).as("n_parsed"),
        sum(col("p.k")).as("sum_k"),
        min(col("p.k")).as("min_k"),
        max(col("p.k")).as("max_k"))
      .orderBy(col("event_type"))

  def scalarJson(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("kv"),
        get_json_object(col("props"), "$.k").cast("int").as("ki"),
        get_json_object(col("props"), "$.missing").as("kmiss"))
      .orderBy(col("event_id"))

  /** VARIANT semi-structured surface (Spark 4 native type): parse_json
    * into the binary VARIANT encoding, typed extraction via
    * variant_get, canonical re-serialization via to_json, and the
    * try_/null-probe variants. VARIANT beats string re-parsing at scale
    * — the value is decoded once at ingest and every downstream
    * extraction is a binary field walk, not a JSON text parse; parquet
    * shreds it columnarly. Extraction outputs are scalars so the
    * DuckDB JSON oracle can replay them. */
  def scalarVariant(s: SparkSession, d: String): DataFrame = {
    val v = parse_json(col("props"))
    t(s, d, "events")
      .select(
        col("event_id"),
        variant_get(v, "$.k", "int").as("k_int"),
        variant_get(v, "$.k", "double").as("k_dbl"),
        variant_get(v, "$.k", "string").as("k_str"),
        try_variant_get(v, "$.missing", "int").as("k_missing"),
        to_json(v).as("canon_json"),
        try_parse_json(lit("{not json")).isNull.as("bad_parse_null"),
        // JSON-null vs missing-key distinction: props never carries a
        // JSON null, so probing it left this column constant false at
        // every sf (round-11 degeneracy lint) — probe a derived
        // variant that IS null on every 7th event instead
        is_variant_null(variant_get(
          parse_json(when(col("event_id") % 7 === 0,
            lit("""{"k":null}""")).otherwise(col("props"))),
          "$.k", "variant")).as("k_is_jnull"))
      .orderBy(col("event_id"))
  }

  /** Conditional expressions: CASE, coalesce, nullif, least/greatest. */
  def scalarConditional(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 250000.0, lit("high"))
          .when(col("o_totalprice") > 100000.0, lit("mid"))
          .otherwise(lit("low")).as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
          .as("status_or_open"),
        least(col("o_totalprice"), lit(200000.0)).as("capped"),
        greatest(col("o_custkey"), lit(100L)).as("floored"),
        (col("o_orderpriority") === "1-URGENT").as("is_urgent"))
      .orderBy(col("o_orderkey"))

  /** Struct (nested record) surface: creation, field access, nested
    * access, equality, struct-in-array element access. Structs are
    * Catalyst-native (no shredding cost — parquet stores them as nested
    * groups with per-field column pruning at scale). */
  def scalarStruct(s: SparkSession, d: String): DataFrame = {
    val o = struct(col("o_custkey").as("ck"), col("o_totalprice").as("tp"))
    val nested = struct(o.as("inner"), col("o_orderstatus").as("st"))
    t(s, d, "orders")
      .select(
        col("o_orderkey"),
        o.getField("tp").as("tp"),
        nested.getField("inner").getField("ck").as("ck"),
        nested.getField("st").as("st"),
        (struct(lit(1).as("a"), lit(2).as("b")) ===
          struct(lit(1).as("a"), lit(2).as("b"))).as("eq"),
        element_at(array(struct(col("o_custkey").as("k"))), 1)
          .getField("k").as("arr_k"))
      .orderBy(col("o_orderkey"))
  }

  /** Bitwise scalar surface: AND/OR/XOR/NOT, shifts, popcount. */
  def scalarBitwise(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(
        col("o_orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("band"),
        col("o_orderkey").bitwiseOR(lit(4096L)).as("bor"),
        col("o_orderkey").bitwiseXOR(col("o_custkey")).as("bxor"),
        shiftleft(col("o_orderkey"), 3).as("shl"),
        shiftright(col("o_orderkey"), 2).as("shr"),
        bit_count(col("o_orderkey")).as("bc"),
        bitwise_not(col("o_orderkey")).as("bnot"))
      .orderBy(col("o_orderkey"))

  /** Regex surface: group extract, first-match extract, match count,
    * partial-match predicate (both engines return '' on no match). */
  def scalarRegex(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(
        col("doc_id"),
        // '([a-z]+)ing' never matches this corpus's 31-word vocab —
        // the column was constant '' at every sf (round-11 degeneracy
        // lint); 'er' appears mid-word in order/filter/customer/merge,
        // so the extract discriminates per document
        regexp_extract(col("text"), "([a-z]+)er", 1).as("er_stem"),
        regexp_extract(col("source"), "[0-9]+", 0).as("src_num"),
        regexp_count(col("text"), lit("[aeiou]{2,}")).as("n_vruns"),
        col("text").rlike("data|model").as("has_kw"))
      .orderBy(col("doc_id"))

  /** Transcendental math (sin/cos/atan2/exp/ln) — rounded to 6 digits
    * since JVM Math and libm may differ in the final ulp. sin/cos add
    * +0.0 after the round on BOTH engines: a tiny negative input rounds
    * to -0.0 under DuckDB's binary round but to +0.0 under Spark's
    * BigDecimal round (sf0.1 sweep find); IEEE -0.0 + 0.0 = +0.0
    * normalizes both. */
  def scalarTrig(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(
        col("o_orderkey"),
        (round(sin(col("o_totalprice") / 100000.0), 6) + lit(0.0)).as("sn"),
        (round(cos(col("o_totalprice") / 100000.0), 6) + lit(0.0)).as("cs"),
        round(atan2(col("o_totalprice"), col("o_custkey").cast("double") + 1), 6).as("at2"),
        round(exp(col("o_totalprice") / 1000000.0), 6).as("ex"),
        round(log(col("o_totalprice")), 6).as("lg"))
      .orderBy(col("o_orderkey"))

  /** URL decomposition via parse_url (host/path/query) — URLs are
    * synthesized deterministically from fixture columns; the oracle
    * replays with anchored regexes (DuckDB has no parse_url). */
  def scalarUrl(s: SparkSession, d: String): DataFrame = {
    val url = concat(lit("https://"), col("source"),
      lit(".example.com/p/"), col("doc_id").cast("string"),
      lit("?q="), col("lang"))
    t(s, d, "documents")
      .select(
        col("doc_id"),
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY")).as("query"))
      .orderBy(col("doc_id"))
  }

  /** Hash functions shared with DuckDB (md5, sha256 hex). */
  def scalarHash(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("h_md5"),
        sha2(col("text").cast("binary"), 256).as("h_sha256"))
      .orderBy(col("doc_id"))

  /** ANSI-safe arithmetic: try_divide/try_add return null instead of
    * raising under Spark 4's ANSI mode — the fold-errors-to-null
    * contract a 100 TB batch needs (one poisoned row must not kill a
    * stage). The oracle replays the null semantics with explicit CASE
    * guards. */
  def scalarTryArith(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // null exactly where l_quantity = 25 (division by zero)
        round(expr("try_divide(l_extendedprice, l_quantity - 25.0)")
          .cast("decimal(18,4)"), 2).cast("double").as("div_q25"),
        round(expr("try_divide(l_extendedprice, l_quantity)")
          .cast("decimal(18,4)"), 2).cast("double").as("unit_price"),
        // overflows (-> null) exactly where l_quantity > 10
        expr("try_add(9223372036854775797L, CAST(l_quantity AS LONG))")
          .as("near_max_add"))
      // total order over EVERY output column: (l_orderkey,
      // l_linenumber) is non-unique in the fixture, and two tied rows
      // can share unit_price while differing in div_q25/near_max_add —
      // the positional gate compare would then flake on Spark's
      // partition-dependent tie order (round-14 review; the
      // filterPredicates discipline)
      .orderBy(col("l_orderkey"), col("l_linenumber"),
        col("unit_price"), col("div_q25"), col("near_max_add"))

  /** ANSI-safe cast coercion — the schema-normalization contract for
    * dirty landing data: `try_cast` yields null instead of failing
    * the task on malformed values. The fixture derives a
    * deterministic mix of castable and uncastable strings from
    * doc_id (clean int / alpha-prefixed / decimal-suffixed), so the
    * null pattern is exactly replayable. One projection over the
    * scan; same per-row isolation story as the decode chain. */
  def scalarTryCast(s: SparkSession, d: String): DataFrame =
    // the mix avoids decimal-string→int casts, where engines genuinely
    // diverge (DuckDB rounds '2.5', Spark nulls) — that divergence is
    // the reason a portable pipeline normalizes through DOUBLE first.
    // Bare-integer-string→DATE likewise diverges (Spark reads a 4+
    // digit string 'yyyy' as yyyy-01-01, DuckDB nulls — surfaced by
    // the sf0.1 sweep once doc_ids reached 4 digits), so digit-only
    // strings are guarded out of the date cast on BOTH engines
    t(s, d, "documents")
      .withColumn("raw",
        when(col("doc_id") % 3 === 0, col("doc_id").cast("string"))
          .when(col("doc_id") % 3 === 1,
            concat(lit("x"), col("doc_id").cast("string")))
          .otherwise(lit("2024-01-15")))
      .select(col("doc_id"), col("raw"),
        expr("try_cast(raw AS BIGINT)").as("as_int"),
        expr("try_cast(raw AS DOUBLE)").as("as_double"),
        expr("try_cast(CASE WHEN raw RLIKE '^[0-9]+$' THEN NULL " +
          "ELSE raw END AS DATE)").cast("string").as("as_date"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scalar_json_typed" -> (scalarJsonTyped _),
    "scalar_try_cast" -> (scalarTryCast _),
    "scalar_try_arith" -> (scalarTryArith _),
    "scalar_hash" -> (scalarHash _),
    "scalar_struct" -> (scalarStruct _),
    "scalar_regex" -> (scalarRegex _),
    "scalar_trig" -> (scalarTrig _),
    "scalar_url" -> (scalarUrl _),
    "scalar_bitwise" -> (scalarBitwise _),
    "scalar_conditional" -> (scalarConditional _),
    "scalar_string" -> (scalarString _),
    "scalar_date" -> (scalarDate _),
    "scalar_math" -> (scalarMath _),
    "scalar_array" -> (scalarArray _),
    "scalar_map" -> (scalarMap _),
    "scalar_json" -> (scalarJson _),
    "scalar_variant" -> (scalarVariant _)
  )

  val oracles: Map[String, String] = Map(
    "scalar_json_typed" ->
      """SELECT event_type,
        |  COUNT(CAST(json_extract_string(props, '$.k') AS INTEGER))
        |    AS n_parsed,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
        |    AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS INTEGER))
        |    AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS INTEGER))
        |    AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,
    "scalar_try_cast" ->
      """WITH raws AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id AS VARCHAR)
        |         WHEN doc_id % 3 = 1 THEN 'x' || CAST(doc_id AS VARCHAR)
        |         ELSE '2024-01-15' END AS raw
        |  FROM documents)
        |SELECT doc_id, raw,
        |  TRY_CAST(raw AS BIGINT) AS as_int,
        |  TRY_CAST(raw AS DOUBLE) AS as_double,
        |  CAST(TRY_CAST(CASE WHEN regexp_matches(raw, '^[0-9]+$')
        |    THEN NULL ELSE raw END AS DATE) AS VARCHAR) AS as_date
        |FROM raws ORDER BY doc_id""".stripMargin,
    "scalar_try_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity = 25 THEN NULL ELSE
        |    CAST(ROUND(CAST(l_extendedprice / (l_quantity - 25.0)
        |      AS DECIMAL(18,4)), 2) AS DOUBLE) END AS div_q25,
        |  CAST(ROUND(CAST(l_extendedprice / l_quantity
        |    AS DECIMAL(18,4)), 2) AS DOUBLE) AS unit_price,
        |  CASE WHEN CAST(l_quantity AS BIGINT) > 10 THEN NULL ELSE
        |    9223372036854775797 + CAST(l_quantity AS BIGINT) END
        |    AS near_max_add
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, unit_price NULLS FIRST,
        |  div_q25 NULLS FIRST, near_max_add NULLS FIRST""".stripMargin,
    "scalar_hash" ->
      """SELECT doc_id,
        |  md5(text) AS h_md5,
        |  sha256(text) AS h_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,
    "scalar_url" ->
      """WITH u AS (SELECT doc_id,
        |  'https://' || source || '.example.com/p/' || doc_id ||
        |  '?q=' || lang AS url
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
        |  regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
        |  regexp_extract(url, '\?(.*)$', 1) AS query
        |FROM u ORDER BY doc_id""".stripMargin,
    "scalar_trig" ->
      """SELECT o_orderkey,
        |  ROUND(SIN(o_totalprice / 100000.0), 6) + 0e0 AS sn,
        |  ROUND(COS(o_totalprice / 100000.0), 6) + 0e0 AS cs,
        |  ROUND(ATAN2(o_totalprice, o_custkey + 1), 6) AS at2,
        |  ROUND(EXP(o_totalprice / 1000000.0), 6) AS ex,
        |  ROUND(LN(o_totalprice), 6) AS lg
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_regex" ->
      """SELECT doc_id,
        |  regexp_extract(text, '([a-z]+)er', 1) AS er_stem,
        |  regexp_extract(source, '[0-9]+') AS src_num,
        |  CAST(len(regexp_extract_all(text, '[aeiou]{2,}')) AS INTEGER)
        |    AS n_vruns,
        |  regexp_matches(text, 'data|model') AS has_kw
        |FROM documents ORDER BY doc_id""".stripMargin,
    "scalar_struct" ->
      """SELECT o_orderkey,
        |  (struct_pack(ck := o_custkey, tp := o_totalprice)).tp AS tp,
        |  (struct_pack(inner := struct_pack(ck := o_custkey),
        |               st := o_orderstatus)).inner.ck AS ck,
        |  o_orderstatus AS st,
        |  struct_pack(a := 1, b := 2) = struct_pack(a := 1, b := 2) AS eq,
        |  ([struct_pack(k := o_custkey)])[1].k AS arr_k
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS band,
        |  o_orderkey | 4096 AS bor,
        |  xor(o_orderkey, o_custkey) AS bxor,
        |  o_orderkey << 3 AS shl,
        |  o_orderkey >> 2 AS shr,
        |  CAST(bit_count(o_orderkey) AS INTEGER) AS bc,
        |  ~o_orderkey AS bnot
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_conditional" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 250000.0 THEN 'high'
        |       WHEN o_totalprice > 100000.0 THEN 'mid'
        |       ELSE 'low' END AS bucket,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
        |  LEAST(o_totalprice, 200000.0) AS capped,
        |  GREATEST(o_custkey, 100) AS floored,
        |  o_orderpriority = '1-URGENT' AS is_urgent
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_string" ->
      """SELECT c_custkey,
        |  lower(c_name) AS lo,
        |  upper(c_mktsegment) AS up,
        |  substr(c_name, 10, 5) AS sub,
        |  trim('  ' || c_name || '  ') AS tr,
        |  c_name || '|' || c_mktsegment AS cc,
        |  regexp_replace(c_name, '0+', '0', 'g') AS rr,
        |  array_to_string(string_split(c_name, '#'), ',') AS parts,
        |  CAST(length(c_name) AS INTEGER) AS ln
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "scalar_date" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS dt,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS dd,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |       AS INTEGER) AS days_since,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_math" ->
      """SELECT o_orderkey,
        |  CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)), 0) AS DOUBLE) AS r0,
        |  ABS(o_totalprice - 150000.0) AS dist,
        |  CAST(CEIL(o_totalprice) AS BIGINT) AS ce,
        |  CAST(FLOOR(o_totalprice) AS BIGINT) AS fl,
        |  ((o_orderkey % 7) + 7) % 7 AS pm,
        |  ROUND(POWER(o_totalprice / 100000.0, 2), 6) AS pw,
        |  SQRT(o_totalprice) AS sq
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_array" ->
      """SELECT doc_id,
        |  array_to_string(list_slice(string_split(text, ' '), 1, 5), ',')
        |    AS first5,
        |  array_to_string(
        |    list_sort(list_slice(string_split(text, ' '), 1, 5)), ',')
        |    AS sorted5,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  string_split(text, ' ')[1] AS first_word
        |FROM documents ORDER BY doc_id""".stripMargin,
    "scalar_map" ->
      """SELECT c_custkey,
        |  'cust,nat' AS ks,
        |  CAST(c_custkey AS VARCHAR) || ',' || CAST(c_nationkey AS VARCHAR)
        |    AS vs,
        |  CAST(c_custkey AS VARCHAR) AS cv
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "scalar_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS kv,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS ki,
        |  json_extract_string(props, '$.missing') AS kmiss
        |FROM events ORDER BY event_id""".stripMargin,
    "scalar_variant" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_dbl,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(NULL AS INTEGER) AS k_missing,
        |  json_extract(props, '$')::VARCHAR AS canon_json,
        |  TRUE AS bad_parse_null,
        |  json_type(CASE WHEN event_id % 7 = 0 THEN '{"k":null}'
        |            ELSE props END, '$.k') = 'NULL' AS k_is_jnull
        |FROM events ORDER BY event_id""".stripMargin
  )
}
