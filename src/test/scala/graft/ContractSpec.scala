package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency checks — the failure modes these catch
  * are silent: an oracle keyed under a name with no matching query is
  * simply never gate-checked, and a misnamed query degrades to a
  * rows-only row without anyone noticing.
  */
class ContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every oracle key has a matching query key") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("declared keys are stable snake_case identifiers") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-snake-case keys: $bad")
  }

  test("rows-only (no-oracle) set is the explicitly documented one") {
    // additions to this set need a scalatest spec instead of an oracle;
    // shrinking it (oracling a member) is always welcome — update here.
    // Round 6 emptied it: the nine approximate/seeded members now ship
    // derived-check gate rows (exact-side quantities + invariant
    // booleans the oracle pins — see the *Check Scaladocs).
    val expected = Set.empty[String]
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(actual == expected,
      s"unexpected rows-only: ${actual -- expected}; newly oracled: ${expected -- actual}")
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("surface size matches the documented totals") {
    // update alongside SURVEY.md §2.3 "Totals" when adding queries
    assert(SparkEntry.queries.size == 479, SparkEntry.queries.size.toString)
    assert(SparkEntry.oracleSql.size == 479, SparkEntry.oracleSql.size.toString)
  }
}
