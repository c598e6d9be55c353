package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Route resolution (reference resolve_folder_and_table,
  * src/function_app.py:97-113; keep-regex :19; sanitizers :88-92):
  * strip the Source, keep `[a-zA-Z0-9._-]`, split on the FIRST dot into
  * (source_db, table) — no dot duplicates the whole string into both —
  * then sanitize every part by lowercasing and replacing each illegal
  * RUN with a single `_` (`re.sub(r'[^a-z0-9_-]+', '_', …)`), with
  * `unknown_db`/`unknown_table` fallbacks for empty parts (:106-111) so
  * an all-illegal Source still routes (the reference persists those
  * rows; dropping them would silently discard data). Destination falls
  * back to a configured folder when empty/null.
  *
  * All built-in expressions — fully codegen'd, and transparent to
  * Catalyst so filters on the derived `folder`/`tbl` columns still push
  * down through the projection (SURVEY.md §4.2(b)).
  */
object Routing {

  val KeepPattern = "[^a-zA-Z0-9._-]"
  val SanitizePattern = "[^a-z0-9_-]+"

  /** Python str.strip(): all leading/trailing whitespace, not just the
    * ASCII space that Spark's trim() removes. (?U) makes Java's \s
    * match Unicode whitespace (NBSP, U+2028, ...) like Python's —
    * EXCEPT the information separators U+001C-U+001F, which Python's
    * str.isspace()/strip() include but Java's Unicode \s (White_Space
    * property) does not; the explicit class closes that parity gap
    * (round-14 review: a ""-padded Destination must strip to ""
    * and take the fallback folder, not sanitize to "_"). */
  def pyStrip(c: Column): Column =
    regexp_replace(c, "(?U)^[\\s\\x1c-\\x1f]+|[\\s\\x1c-\\x1f]+$", "")

  /** Reference _sanitize_folder/_sanitize_table (function_app.py:88-92):
    * lowercase, then each run of chars outside [a-z0-9_-] becomes one
    * `_` — "My Folder" → "my_folder", never dropped. */
  def sanitize(c: Column): Column =
    regexp_replace(lower(pyStrip(c)), SanitizePattern, "_")

  /** Adds `folder`, `source_db`, `tbl` columns derived from a source
    * ("db.table") column and a destination (folder) column. Empty
    * db/table parts fall back to unknown_db/unknown_table BEFORE
    * sanitize, exactly like the reference (:106-111). */
  def withRoute(df: DataFrame, source: Column, dest: Column,
      fallbackFolder: String): DataFrame = {
    val kept =
      regexp_replace(pyStrip(coalesce(source, lit(""))), KeepPattern, "")
    val dot = instr(kept, ".")
    val dbRaw = when(dot > 0, substring_index(kept, ".", 1)).otherwise(kept)
    // Everything AFTER the first dot: drop dbRaw + the dot itself. Later
    // dots survive the split and sanitize to `_` ("a.b.c" → tbl "b_c").
    val tblRaw = when(dot > 0, substr(kept, dot + 1)).otherwise(kept)
    val rawDest = pyStrip(coalesce(dest, lit("")))
    df.withColumn("folder",
        sanitize(when(length(rawDest) > 0, rawDest)
          .otherwise(lit(fallbackFolder))))
      .withColumn("source_db",
        sanitize(when(length(dbRaw) > 0, dbRaw).otherwise(lit("unknown_db"))))
      .withColumn("tbl",
        sanitize(when(length(tblRaw) > 0, tblRaw)
          .otherwise(lit("unknown_table"))))
  }

  /** Valid route = non-empty folder and table (reference
    * src/function_app.py:339-341). With the unknown_table fallback the
    * table is never empty; only a missing Destination AND an empty
    * fallback folder can invalidate a route — matching the reference,
    * which persists all-illegal Sources under unknown_db/unknown_table. */
  def validRoute: Column =
    length(col("folder")) > 0 && length(col("tbl")) > 0
}
