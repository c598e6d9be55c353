package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Route resolution (reference resolve_folder_and_table,
  * src/function_app.py:97-113; keep-regex :19; sanitizers :88-92):
  * keep `[a-zA-Z0-9._-]` in Source, split on the FIRST dot into
  * (source_db, table) — no dot duplicates the whole string into both —
  * sanitize every part to lowercase `[a-z0-9_-]`, and fall back to a
  * configured folder when Destination is empty/null.
  *
  * All built-in expressions — fully codegen'd, and transparent to
  * Catalyst so filters on the derived `folder`/`tbl` columns still push
  * down through the projection (SURVEY.md §4.2(b)).
  */
object Routing {

  val KeepPattern = "[^a-zA-Z0-9._-]"
  val SanitizePattern = "[^a-z0-9_-]"

  def sanitize(c: Column): Column =
    regexp_replace(lower(c), SanitizePattern, "")

  /** Adds `folder`, `source_db`, `tbl` columns derived from a source
    * ("db.table") column and a destination (folder) column. */
  def withRoute(df: DataFrame, source: Column, dest: Column,
      fallbackFolder: String): DataFrame = {
    val kept = regexp_replace(coalesce(source, lit("")), KeepPattern, "")
    val dot = instr(kept, ".")
    val dbPart = when(dot > 0, substring_index(kept, ".", 1)).otherwise(kept)
    // Everything AFTER the first dot: drop dbPart + the dot itself.
    val tblPart = when(dot > 0, substr(kept, dot + 1)).otherwise(kept)
    df.withColumn("folder",
        when(dest.isNull || dest === "", lit(fallbackFolder))
          .otherwise(sanitize(dest)))
      .withColumn("source_db", sanitize(dbPart))
      .withColumn("tbl", sanitize(tblPart))
  }

  /** Valid route = non-empty folder and table
    * (reference src/function_app.py:339-341). */
  def validRoute: Column =
    length(col("folder")) > 0 && length(col("tbl")) > 0
}
