package graft.queries

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed total-order utilities — the zipWithIndex decomposition
  * that replaces every single-partition global window over a
  * corpus-sized relation (the one plan shape Windows.scala's header
  * rule forbids): `repartitionByRange` on the sort key gives ordered,
  * non-overlapping partitions; `sortWithinPartitions` orders each one;
  * `RDD.zipWithIndex` turns per-partition positions into exact global
  * indices with one lightweight count job and ZERO extra shuffles.
  * Used by chunk_batches (reference MAX_BATCH_SIZE numbering,
  * function_app.py:379-401), window_rfm and text_vocab_growth.
  *
  * WHY the RDD hop instead of a pure-DataFrame diamond (round-9 find):
  * the previous shape branched the ranged relation into an offsets
  * aggregate and a join consumer inside one plan, trusting
  * ReuseExchange to share the range shuffle. Column pruning makes the
  * two subtrees canonically UNEQUAL (the aggregate side prunes the
  * payload columns), so the exchange is NOT reused — each consumer
  * re-executes it, and range-boundary SAMPLING is seeded by RDD id,
  * i.e. nondeterministic across executions. When the fixture outgrows
  * the sample size (or at any real scale), the two executions pick
  * different boundaries and the stitched index is silently wrong.
  * `RDD.zipWithIndex` runs its count job over the SAME RDD instance,
  * so the counts come from the same materialized shuffle output as
  * the data pass — consistent by construction at any parallelism.
  */
object Ordered {

  /** The parallelism the total-order machinery runs at when the
    * caller doesn't pin one: the session's configured
    * `spark.sql.shuffle.partitions` — so on a 1000-executor cluster
    * the range shuffle fans out with the cluster instead of capping
    * at a literal. The RESULT is partition-count-invariant (the
    * global index is exact under a total order; ParallelismSpec
    * asserts bit-identical output across counts), so deriving from
    * config changes only the plan's width, never its answer. */
  def defaultParts(s: SparkSession): Int =
    s.conf.get("spark.sql.shuffle.partitions", "200").toInt.max(1)

  /** Appends `out` = the exact 0-based global index of each row under
    * the total order `keys` (which must be a total order — ties would
    * make the index nondeterministic, exactly as with `row_number`).
    * `keys` may carry sort directions (`col.desc`). The partition
    * count (`parts` ≤ 0 → [[defaultParts]], i.e. the session's
    * shuffle parallelism) is pinned explicitly so AQE cannot coalesce
    * the ranged shuffle. One range shuffle + one count job; the range
    * partitions are ordered and non-overlapping, so partition index
    * then local position IS the total order. */
  def withGlobalIndex(df: DataFrame, keys: Seq[Column], out: String,
      parts: Int = 0): DataFrame = {
    val p = if (parts > 0) parts else defaultParts(df.sparkSession)
    val sorted = df
      .repartitionByRange(p, keys: _*)
      .sortWithinPartitions(keys: _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    // Stay on InternalRow end to end (round-10): `.rdd` would
    // deserialize every row to a GenericRow at the codegen boundary
    // and `createDataFrame(RDD[Row])` would re-encode it — a full
    // ser/de of the fact table for ONE appended long. zipWithIndex
    // over `queryExecution.toRdd` keeps the same-RDD-instance
    // consistency argument (its count job runs on THIS RDD, i.e. the
    // same materialized range shuffle as the data pass) while the
    // per-row work drops to a 1-field JoinedRow append; the
    // RDDScanExec above re-projects to UnsafeRow per row, so the
    // reused wrapper rows are safe exactly as in a source scan.
    val indexed = sorted.queryExecution.toRdd.zipWithIndex()
      .mapPartitions { it =>
        val idxRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        it.map { case (r, i) =>
          idxRow.update(0, i)
          joined(r, idxRow): org.apache.spark.sql.catalyst.InternalRow
        }
      }
    GraftBridge.internalCreateDataFrame(sorted.sparkSession, indexed, schema)
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
