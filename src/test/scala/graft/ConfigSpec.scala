package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Config

/** Fail-fast config semantics (reference src/function_app.py:24-58). */
class ConfigSpec extends AnyFunSuite {

  private val good = Map(
    "OUTPUT_CONTAINER" -> "/data/out",
    "MAX_BATCH_SIZE" -> "2000",
    "PARQUET_COMPRESSION" -> "SNAPPY")

  test("valid settings build an IngestConfig with defaults applied") {
    val cfg = Config.ingestConfig(good)
    assert(cfg.outDir == "/data/out")
    assert(cfg.maxRecordsPerFile == 2000)
    assert(cfg.compression == "snappy")
    assert(cfg.destinationFallback == "landing")
    assert(cfg.messageType.isEmpty)
  }

  test("missing required setting fails fast with the key name") {
    val e = intercept[Config.Missing] {
      Config.ingestConfig(good - "OUTPUT_CONTAINER")
    }
    assert(e.getMessage.contains("OUTPUT_CONTAINER"))
  }

  test("empty/whitespace counts as missing") {
    intercept[Config.Missing] {
      Config.ingestConfig(good + ("OUTPUT_CONTAINER" -> "  "))
    }
  }

  test("malformed int fails fast with key and value") {
    val e = intercept[Config.Malformed] {
      Config.ingestConfig(good + ("MAX_BATCH_SIZE" -> "many"))
    }
    assert(e.getMessage.contains("MAX_BATCH_SIZE") && e.getMessage.contains("many"))
  }

  test("reqBool accepts common spellings and rejects junk") {
    assert(Config.reqBool(Map("k" -> "TRUE"), "k"))
    assert(!Config.reqBool(Map("k" -> "0"), "k"))
    intercept[Config.Malformed] { Config.reqBool(Map("k" -> "si"), "k") }
  }

  test("optional message-type filter is honored") {
    val cfg = Config.ingestConfig(good + ("MESSAGE_TYPE_FILTER" -> "Raw"))
    assert(cfg.messageType.contains("Raw"))
  }
}
