package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema normalization mirroring the reference's type-erasing
  * normalization and null-padded merge (reference src/function_app.py:
  * 161-175 `_normalize_columnar`, :177-191 `_merge_columnars`,
  * :200-220 `_rows_to_columnar`).
  *
  * Deviation (SURVEY.md §1.2, deliberate): rows stay rows — the engine
  * writes row-per-record parquet, not the reference's single-row
  * LIST<STRING> layout, which defeats row-group pruning and splitting at
  * scale. The *cell-level* semantics match: nested values become JSON
  * strings, timestamps ISO-8601, scalars decimal strings, nulls survive.
  */
object Normalize {

  /** Every column to StringType (null-preserving): struct/array/map →
    * JSON, timestamp/date → ISO-8601, everything else → cast. */
  def stringifyAll(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f => stringifyCell(col(f.name), f.dataType).as(f.name) }
    df.select(cols.toSeq: _*)
  }

  private def stringifyCell(c: Column, dt: DataType): Column = dt match {
    case _: StructType | _: ArrayType | _: MapType => to_json(c)
    case _: TimestampType => date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    case _: DateType => date_format(c, "yyyy-MM-dd")
    case _: StringType => c
    case _ => c.cast(StringType)
  }

  /** Union-all with null padding for columns missing on either side —
    * the reference's `_merge_columnars` (src/function_app.py:177-191). */
  def mergeColumnars(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Columnar-shape detection (reference `_is_columnar_dict`,
    * src/function_app.py:149-159): every top-level field is an array.
    * (The equal-lengths check happens implicitly at explode time.)
    * `_corrupt_record` is EXCLUDED from the test, mirroring
    * [[explodeColumnar]]'s filter — the old conjunct wiring made its
    * mere presence force `false` instead (round-14 review; the parse
    * probe column is metadata, not a data column). */
  def isColumnar(schema: StructType): Boolean = {
    val dataFields = schema.fields.filterNot(_.name == "_corrupt_record")
    dataFields.nonEmpty &&
      dataFields.forall(_.dataType.isInstanceOf[ArrayType])
  }

  /** COMPAT ONLY — the reference's physical layout
    * (`_columnar_to_single_row_table`, src/function_app.py:234-241):
    * one row where each cell is the whole column as a LIST<STRING>. The
    * engine deliberately writes row-per-record parquet instead
    * (SURVEY.md §1.2 — the single-row layout defeats row-group pruning
    * and splitting); this writer exists only for byte-shape parity
    * needs. Collapses to one partition — never use at scale. */
  def toSingleRowColumnar(df: DataFrame): DataFrame = {
    val one = stringifyAll(df).coalesce(1)
    // collect_list drops nulls; wrap each cell in a struct (a non-null
    // container) so the reference's null padding survives (:184-190)
    def cellList(c: String) =
      transform(collect_list(struct(col(c).as("v"))), s => s.getField("v")).as(c)
    one.agg(cellList(one.columns.head),
      one.columns.tail.map(cellList).toSeq: _*)
  }

  /** Pivot a columnar payload row ({col: [v, …]} per record) into rows:
    * null-pad absent columns to the record's length, zip, explode.
    * Ragged merges (different column sets per payload) surface here as
    * null arrays after schema union — exactly the reference's null
    * padding semantics (src/function_app.py:184-190). */
  def explodeColumnar(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.filter(_.name != "_corrupt_record")
    val len = greatest(
      fields.map(f => coalesce(size(col(f.name)), lit(0))).toSeq: _*)
    val filled = fields.map { f =>
      val elem = f.dataType.asInstanceOf[ArrayType].elementType
      coalesce(col(f.name), array_repeat(lit(null).cast(elem), len)).as(f.name)
    }
    df.select(filled.toSeq: _*)
      .select(inline(arrays_zip(fields.map(f => col(f.name)).toSeq: _*)))
  }
}
