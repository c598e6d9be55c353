package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Surface-wide OUTPUT-SIGNAL lint — the degeneracy analogue of
  * PlanLintSpec (round-10 directive #1). A cross-engine gate passes
  * whenever BOTH engines agree, including when they agree on a
  * content-free answer: the round-10 manual audit found 10 such keys
  * (any-purchase outcome saturated at 100%, per-(day,type) max ≥ 95
  * always true, …) and the fresh signal after re-cutting them exposed
  * a real algebra bug (Brier resolution missing a factor of N) that
  * degenerate data had masked for a full gate cycle. This spec makes
  * that audit permanent and machine-checked for every key and every
  * fixture regeneration.
  *
  * Executes EVERY SparkEntry key at sf0.001 and asserts per output:
  *  (a) at least one row;
  *  (b) no all-NULL column;
  *  (c) for outputs with ≥ 3 rows, no constant SIGNAL column —
  *      DOUBLE/FLOAT (statistics, rates) and BOOLEAN (verdicts) —
  *      with one global carve-out: BOOLEAN columns constant TRUE
  *      (derived-check PASS columns — constant true is their design;
  *      constant FALSE still flags). Integer counts, labels and keys
  *      are allowed to be constant (dense-fixture denominators like
  *      "all 15 users appear in every group" are honest audit
  *      columns, not the signal), BUT a ≥ 3-row output whose rows
  *      are ALL IDENTICAL is flagged regardless of type;
  *  (d) rate-named DOUBLE columns (rate/ratio/share/frac/pct/prob/
  *      recall/precision/coverage) whose non-null value set is inside
  *      {0, 1} — a saturated rate carries no signal regardless of row
  *      count (the any-purchase ≡ 1 class);
  *  (e) INTEGER columns constant at ZERO over ≥ 3 rows — the
  *      "detector that never fires" class (a dup counter, outlier
  *      counter or violation counter frozen at 0 reads exactly like
  *      a detector that works on clean data AND like one that is
  *      broken; round 11's dup family hid behind this shape).
  *      Constant NONZERO integers stay allowed (dense-fixture
  *      denominators) — EXCEPT where (f) applies;
  *  (f) verdict-named STRING or INTEGER columns (verdict/label/flag/
  *      class/status/outcome/decision/grade/mask/category) constant
  *      at ONE value over ≥ 3 rows — the nonzero sibling of (e): a
  *      classifier that answers "ok" everywhere or a mask frozen at
  *      15 carries no signal, and (c)/(e) only caught this shape for
  *      boolean/double/zero-valued columns (round-12 directive).
  *
  * Keys in [[checkSf]] are executed at sf0.01 instead: their sf0.001
  * output is degenerate purely from fixture SIZE (an empty TPC-H Q7
  * date×nation cut, a kNN radius with no neighbors at 1/10 density),
  * which the next size up already disproves — the override records
  * exactly which keys need volume, itself useful scale documentation.
  *
  * The exemption map IS the deliverable as much as the checks: it is
  * the complete written inventory of intentionally-constant outputs,
  * so the next fixture regeneration or key addition re-adjudicates
  * against an explicit list instead of tribal memory. Every entry
  * names the key, the column, and the reason. */
class DegeneracyLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** (key, column, kind) → why a constant / saturated value is the
    * intended semantics there. Keyed by KIND so each justification
    * waives only the degeneracy class it argues for (judge advice:
    * an intentionally-constant column must not absorb a future
    * all-NULL or zero-counter regression on the same column). Keep
    * justifications concrete — "mechanics of the encoding", not
    * "it's fine". */
  private val exempt: Map[(String, String, String), String] =
    DegeneracyExemptions.map

  /** key → why an empty output would be acceptable (none expected —
    * present for symmetry so a future genuinely-empty-by-design key
    * has a place to say so). */
  private val emptyOk: Map[String, String] = Map.empty

  /** Keys whose signal needs sf0.01 volume (sf0.001 is 1/10 density
    * and 1/10 history): each entry names the column that sparsity
    * zeroes out. Everything else runs at sf0.001. */
  private val checkSf: Map[String, String] = Map(
    "composite_tpch_q7" -> ("the 2-nation × 2-year lineitem cut is " +
      "empty at sf0.001; 14 rows at sf0.01"),
    "composite_tpch_q2" -> ("one qualifying supplier at sf0.001 " +
      "repeats across its 6 part rows; 11 distinct balances at sf0.01"),
    "join_spatial_knn" -> ("no neighbor inside the grid radius at " +
      "sf0.001 density (all-NULL nn); 117 distinct nns at sf0.01"),
    "join_geo_grid" -> ("0 in-radius neighbors everywhere at " +
      "sf0.001; counts 0..3 at sf0.01"),
    "agg_tost_equivalence" -> ("no arm pair clears the ±5.0 margin " +
      "at sf0.001 n; verdicts split true/false at sf0.01"),
    "window_bollinger" -> ("no 2σ band breach in 30 days of " +
      "sf0.001 volume; breaches appear at sf0.01"))

  private val rateName =
    java.util.regex.Pattern.compile(
      "(^|_)(rate|ratio|share|frac|fraction|pct|percent|prob|" +
        "recall|precision|coverage|purity)($|_|s$)")

  private val labelName =
    java.util.regex.Pattern.compile(
      "(^|_)(verdict|label|flag|class|status|outcome|decision|" +
        "grade|mask|category)($|_|s$|es$)")

  test("every key's sf0.001 output carries signal") {
    graft.ingest.Codecs.register(spark)
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    val usedExemptions =
      scala.collection.mutable.Set.empty[(String, String, String)]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val sfDir =
        if (checkSf.contains(name)) "/root/testdata/sf0.01" else sf
      val collected =
        try Right(fn(spark, sfDir).limit(100000).collect())
        catch { case t: Throwable =>
          Left(t.getClass.getSimpleName + ": " +
            Option(t.getMessage).getOrElse("").take(120))
        }
      collected match {
        case Left(err) => violations += s"$name: EXECUTION ERROR $err"
        case Right(rows) =>
          checkOne(name, rows, violations, usedExemptions)
      }
      spark.catalog.clearCache()
    }
    // stale exemptions are as misleading as missing ones: every entry
    // must still be load-bearing
    val stale = exempt.keySet
      .filter(k => SparkEntry.queries.contains(k._1)) -- usedExemptions
    stale.foreach(k => violations += s"${k._1}: exemption for column " +
      s"'${k._2}' no longer fires — delete or re-justify it")
    assert(violations.isEmpty,
      s"\n${violations.size} degeneracy violations:\n  " +
        violations.mkString("\n  "))
  }

  private def checkOne(
      name: String, rows: Array[Row],
      violations: scala.collection.mutable.ArrayBuffer[String],
      used: scala.collection.mutable.Set[(String, String, String)]): Unit = {
    if (rows.isEmpty) {
      if (!emptyOk.contains(name)) violations += s"$name: ZERO rows"
      return
    }
    val schema = rows.head.schema
    if (schema == null) return // typed Dataset rows without schema
    if (rows.length >= 3 && rows.distinct.length == 1) {
      if (exempt.contains((name, "*", "identical-rows")))
        used += ((name, "*", "identical-rows"))
      else violations += (s"$name: all ${rows.length} rows are the " +
        "IDENTICAL tuple")
    }
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val vals = rows.iterator.map(r =>
        if (r.isNullAt(i)) null else r.get(i)).toSeq
      val nonNull = vals.filter(_ != null)
      // kind-scoped lookup: an exemption waives ONLY the degeneracy
      // class its justification names
      def exempted(kind: String): Boolean =
        exempt.get((name, f.name, kind)) match {
          case Some(_) => used += ((name, f.name, kind)); true
          case None => false
        }
      if (nonNull.isEmpty) {
        if (!exempted("all-null"))
          violations += s"$name: column '${f.name}' is all-NULL"
      } else {
        val distinct = nonNull.distinct
        val constTrue = f.dataType == BooleanType &&
          distinct == Seq(true)
        val signalType = f.dataType == DoubleType ||
          f.dataType == FloatType || f.dataType == BooleanType
        if (rows.length >= 3 && distinct.size == 1 &&
            vals.forall(_ != null) && !constTrue && signalType) {
          if (!exempted("constant"))
            violations += (s"$name: column '${f.name}' is constant " +
              s"(${distinct.head}) over ${rows.length} rows")
        }
        val intType = f.dataType == LongType ||
          f.dataType == IntegerType || f.dataType == ShortType
        if (rows.length >= 3 && intType && vals.forall(_ != null) &&
            distinct.size == 1 &&
            distinct.head.asInstanceOf[Number].longValue() == 0L) {
          if (!exempted("zero-counter"))
            violations += (s"$name: integer column '${f.name}' is " +
              s"constant ZERO over ${rows.length} rows (a detector " +
              "that never fires)")
        }
        if (f.dataType == DoubleType &&
            rateName.matcher(f.name.toLowerCase).find()) {
          val sat = nonNull.forall(v =>
            v == 0.0d || v == 1.0d || v == -0.0d)
          if (sat && !exempted("saturated")) {
            violations += (s"$name: rate column '${f.name}' is " +
              s"saturated (values ⊆ {0,1} over ${rows.length} rows)")
          }
        }
        // check (f): a verdict/label/flag/class-named string or
        // integer column frozen at ONE value answers the same thing
        // for every row — the nonzero sibling of the zero-counter
        // class ("ok" everywhere, mask=15 everywhere); zero-valued
        // integers are already (e)'s finding, so skip them here
        val labelType = f.dataType == StringType || intType
        if (rows.length >= 3 && labelType && vals.forall(_ != null) &&
            distinct.size == 1 &&
            labelName.matcher(f.name.toLowerCase).find() &&
            !(intType &&
              distinct.head.asInstanceOf[Number].longValue() == 0L)) {
          if (!exempted("constant-label"))
            violations += (s"$name: ${f.dataType.simpleString} column " +
              s"'${f.name}' is a verdict/label constant at " +
              s"'${distinct.head}' over ${rows.length} rows")
        }
      }
    }
  }
}
