package graft.ingest

/** Fail-fast typed configuration (reference `_req/_req_int/_req_bool/
  * _opt` + module-level validation block, src/function_app.py:24-38,
  * 44-58): every required setting is read and validated BEFORE any Spark
  * work starts — a missing setting kills the driver at construction, not
  * the 400th task of a running job.
  */
object Config {

  final case class Missing(key: String)
      extends RuntimeException(s"required setting '$key' is missing or empty")
  final case class Malformed(key: String, value: String, expected: String)
      extends RuntimeException(
        s"setting '$key'='$value' is not a valid $expected")

  def req(env: Map[String, String], key: String): String =
    env.get(key).map(_.trim).filter(_.nonEmpty).getOrElse(throw Missing(key))

  def reqInt(env: Map[String, String], key: String): Int = {
    val v = req(env, key)
    try v.toInt catch {
      case _: NumberFormatException => throw Malformed(key, v, "int")
    }
  }

  def reqBool(env: Map[String, String], key: String): Boolean =
    req(env, key).toLowerCase match {
      case "true" | "1" | "yes" => true
      case "false" | "0" | "no" => false
      case v => throw Malformed(key, v, "bool")
    }

  def opt(env: Map[String, String], key: String, default: String): String =
    env.get(key).map(_.trim).filter(_.nonEmpty).getOrElse(default)

  /** Build the validated ingest config from a settings map (env vars in
    * production — same keys as the reference's app settings,
    * infra/function-app.tf:80-87). */
  def ingestConfig(env: Map[String, String]): Pipeline.IngestConfig =
    Pipeline.IngestConfig(
      outDir = req(env, "OUTPUT_CONTAINER"),
      destinationFallback = opt(env, "DESTINATION_FALLBACK", "landing"),
      maxRecordsPerFile = reqInt(env, "MAX_BATCH_SIZE"),
      compression = opt(env, "PARQUET_COMPRESSION", "snappy").toLowerCase,
      // trimmed like every other setting: an untrimmed "Raw " would
      // equality-match nothing and silently ingest zero rows, and a
      // whitespace-only value must read as absent (round-14 review)
      messageType = env.get("MESSAGE_TYPE_FILTER").map(_.trim)
        .filter(_.nonEmpty),
      typedMode = env.get("TYPED_MODE").map(_.trim).filter(_.nonEmpty)
        .fold(false)(_ => reqBool(env, "TYPED_MODE")),
      footerMeta = env.get("FOOTER_META").map(_.trim).filter(_.nonEmpty)
        .fold(false)(_ => reqBool(env, "FOOTER_META")),
      listLayout = env.get("LIST_LAYOUT").map(_.trim).filter(_.nonEmpty)
        .fold(false)(_ => reqBool(env, "LIST_LAYOUT")))
}
