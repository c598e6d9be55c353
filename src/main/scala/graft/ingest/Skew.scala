package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is hot (PERF.md /
  * SURVEY.md §4.2: AQE's skew-join split handles sort-merge skew
  * automatically at runtime; explicit salting is the deterministic
  * fallback when AQE can't help — e.g. aggregations over a hot key, or
  * broadcast-ineligible skewed hash joins).
  *
  * Shape: the skewed (large) side gets a random-but-deterministic salt
  * in [0, n); the small side is replicated n ways; the join key becomes
  * (key, salt). Each hot key's rows now spread over n reducers.
  */
object Skew {

  /** Deterministic per-row salt derived from stable row content —
    * reproducible runs (no rand(), per the oracle-safety rule). */
  def salt(n: Int, stableCols: Column*): Column =
    pmod(xxhash64(stableCols: _*), lit(n.toLong)).cast("int")

  /** Salted equi join: `large ⋈ small` on `key`, spreading each key
    * over `n` partitions. `stableCols` must uniquely-ish identify large
    * rows (used only to derive the salt deterministically).
    *
    * Only large-side-preserving join types are legal: the small side is
    * REPLICATED n ways, so a right/full outer join would emit n copies
    * of every unmatched small-side row (one per salt replica) — and
    * `drop(replicated(key))` would null the key on those rows too. The
    * guard makes the misuse loud instead of silently n-fold wrong
    * (round-14 review). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, n: Int,
      stableCols: Seq[String], joinType: String = "inner"): DataFrame = {
    val safe = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti", "cross")
    require(safe(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin: join type '$joinType' would duplicate unmatched " +
        "replicated small-side rows n-fold; only inner/left/semi/anti " +
        "are salt-safe")
    val salted = large.withColumn("__salt",
      salt(n, stableCols.map(large(_)): _*))
    val replicated = small
      .withColumn("__salt", explode(lit((0 until n).toArray)))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("__salt") === replicated("__salt"),
        joinType)
      .drop(replicated(key)).drop(salted("__salt")).drop(replicated("__salt"))
  }
}
