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
  *  (c) for outputs with ≥ 3 rows, no constant column — with two
  *      global carve-outs: BOOLEAN columns that are constant TRUE
  *      (derived-check PASS columns — constant true is their design;
  *      constant FALSE still flags) and columns whose per-key
  *      exemption below records why a constant is intentional;
  *  (d) rate-named DOUBLE columns (rate/ratio/share/frac/pct/prob/
  *      recall/precision/coverage) whose non-null value set is inside
  *      {0, 1} — a saturated rate carries no signal regardless of row
  *      count (the any-purchase ≡ 1 class).
  *
  * The exemption map IS the deliverable as much as the checks: it is
  * the complete written inventory of intentionally-constant outputs,
  * so the next fixture regeneration or key addition re-adjudicates
  * against an explicit list instead of tribal memory. Every entry
  * names the key, the column, and the reason. */
class DegeneracyLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** (key, column) → why a constant / saturated value is the intended
    * semantics there. Keep justifications concrete — "mechanics of the
    * encoding", not "it's fine". */
  private val exempt: Map[(String, String), String] = DegeneracyExemptions.map

  /** key → why an empty output would be acceptable (none expected —
    * present for symmetry so a future genuinely-empty-by-design key
    * has a place to say so). */
  private val emptyOk: Map[String, String] = Map.empty

  private val rateName =
    java.util.regex.Pattern.compile(
      "(^|_)(rate|ratio|share|frac|fraction|pct|percent|prob|" +
        "recall|precision|coverage|purity)($|_|s$)")

  test("every key's sf0.001 output carries signal") {
    graft.ingest.Codecs.register(spark)
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    val usedExemptions = scala.collection.mutable.Set.empty[(String, String)]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val collected =
        try Right(fn(spark, sf).limit(100000).collect())
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
      used: scala.collection.mutable.Set[(String, String)]): Unit = {
    if (rows.isEmpty) {
      if (!emptyOk.contains(name)) violations += s"$name: ZERO rows"
      return
    }
    val schema = rows.head.schema
    if (schema == null) return // typed Dataset rows without schema
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val vals = rows.iterator.map(r =>
        if (r.isNullAt(i)) null else r.get(i)).toSeq
      val nonNull = vals.filter(_ != null)
      def exempted(kind: String): Boolean =
        exempt.get((name, f.name)) match {
          case Some(_) => used += ((name, f.name)); true
          case None => false
        }
      if (nonNull.isEmpty) {
        if (!exempted("all-null"))
          violations += s"$name: column '${f.name}' is all-NULL"
      } else {
        val distinct = nonNull.distinct
        val constTrue = f.dataType == BooleanType &&
          distinct == Seq(true)
        if (rows.length >= 3 && distinct.size == 1 &&
            vals.forall(_ != null) && !constTrue) {
          if (!exempted("constant"))
            violations += (s"$name: column '${f.name}' is constant " +
              s"(${distinct.head}) over ${rows.length} rows")
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
      }
    }
  }
}
