package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order utilities — the zipWithIndex decomposition
  * that replaces every single-partition global window over a
  * corpus-sized relation (the one plan shape Windows.scala's header
  * rule forbids): `repartitionByRange` on the sort key gives ordered,
  * non-overlapping partitions; `sortWithinPartitions` orders each one;
  * `monotonically_increasing_id` (= partitionId·2^33 + local row
  * index, contiguous from 0 per task) yields the per-partition rank
  * with ZERO extra shuffle; a ≤`parts`-row per-partition count
  * relation turns local ranks into exact global ones via a broadcast
  * prefix-sum join. The only empty-partitionBy window runs over that
  * bounded count relation — never over the data. Used by
  * chunk_batches (reference MAX_BATCH_SIZE numbering,
  * function_app.py:379-401), window_rfm and text_vocab_growth.
  */
object Ordered {

  /** Appends `out` = the exact 0-based global index of each row under
    * the total order `keys` (which must be a total order — ties would
    * make the index nondeterministic, exactly as with `row_number`).
    * `keys` may carry sort directions (`col.desc`). The partition
    * count is pinned so AQE cannot coalesce between the two consumers
    * of the ranged subtree (ReuseExchange shares the one shuffle; both
    * consumers replay the same deterministic sort, so ids agree). */
  def withGlobalIndex(df: DataFrame, keys: Seq[Column], out: String,
      parts: Int = 32): DataFrame = {
    val ranged = df
      .repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .withColumn("__local", col("__mid").bitwiseAND(lit((1L << 33) - 1)))
    val offsets = ranged
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        coalesce(
          sum(col("__cnt")).over(Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__off"))
    ranged
      .join(broadcast(offsets), "__pid")
      .withColumn(out, col("__off") + col("__local"))
      .drop("__mid", "__pid", "__local", "__off")
  }

  /** `ntile(k)` recomputed from an exact 1-based global rank and the
    * total row count — SQL ntile's bucket sizes in closed form: with
    * q = n div k and r = n mod k, buckets 1..r hold q+1 rows and
    * buckets r+1..k hold q. Feeding it [[withGlobalIndex]]+1 gives
    * bit-identical ntile without the single-partition window. `rank`
    * and `n` must be column NAMES (the integer DIV arithmetic is
    * built with `expr`). */
  def ntileFromRank(df: DataFrame, rank: String, n: String, k: Int,
      out: String): DataFrame =
    df.withColumn("__q", expr(s"$n DIV $k"))
      .withColumn("__r", expr(s"$n % $k"))
      .withColumn("__cut", col("__r") * (col("__q") + 1))
      .withColumn(out, expr(
        s"""CAST(CASE WHEN $rank <= __cut
           |  THEN ($rank + __q) DIV (__q + 1)
           |  ELSE __r + ($rank - __cut + __q - 1) DIV __q END AS INT)"""
          .stripMargin))
      .drop("__q", "__r", "__cut")
}
