package graft

/** The written inventory of intentionally constant / saturated /
  * all-NULL output columns, keyed (query, column) → justification.
  * Referenced by [[DegeneracyLintSpec]]; an entry that stops firing
  * is itself flagged (stale-exemption check), so this list can only
  * describe the current surface. Grouped by adjudication class from
  * the round-10 degeneracy audit wave 2. */
object DegeneracyExemptions {
  val map: Map[(String, String), String] = Map.empty
}
