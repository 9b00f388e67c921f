package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{ConfigRegistry, ConfigMismatchException}

/** S5/J5/K5 — config registry semantics (reference generator.py:425-459;
  * reference tests test_store_config_new_file /
  * test_store_config_existing_mismatch).
  */
class ConfigRegistrySpec extends AnyFunSuite {

  private def tempRegistry(): (ConfigRegistry, java.nio.file.Path) = {
    val dir = Files.createTempDirectory("graft-config")
    val p = dir.resolve("config.json")
    (new ConfigRegistry(p), p)
  }

  test("first run writes the config file (test_store_config_new_file)") {
    val (reg, path) = tempRegistry()
    reg.storeOrValidate("test_collection", Map("forecast_frequency" -> "1days"))
    assert(Files.exists(path))
    assert(reg.readAll() ===
      Map("test_collection" -> Map("forecast_frequency" -> "1days")))
  }

  test("matching re-run passes, mismatch raises (test_store_config_existing_mismatch)") {
    val (reg, _) = tempRegistry()
    reg.storeOrValidate("test_collection", Map("forecast_frequency" -> "2days"))
    reg.storeOrValidate("test_collection", Map("forecast_frequency" -> "2days"))
    intercept[ConfigMismatchException] {
      reg.storeOrValidate("test_collection", Map("forecast_frequency" -> "1days"))
    }
  }

  test("a new collection merges into the existing file without touching others") {
    val (reg, _) = tempRegistry()
    reg.storeOrValidate("coll_a", Map("forecast_frequency" -> "1days"))
    reg.storeOrValidate("coll_b", Map("forecast_frequency" -> "6hours"))
    assert(reg.readAll() === Map(
      "coll_a" -> Map("forecast_frequency" -> "1days"),
      "coll_b" -> Map("forecast_frequency" -> "6hours")))
    intercept[ConfigMismatchException] {
      reg.storeOrValidate("coll_a", Map("forecast_frequency" -> "6hours"))
    }
  }

  test("written file is deterministic JSON parseable by Jackson") {
    val (reg, path) = tempRegistry()
    reg.storeOrValidate("b_coll", Map("z" -> "1", "a" -> "2"))
    val text = Files.readString(path)
    assert(text.contains("\"a\": \"2\""))
    // keys sorted → stable golden output
    assert(text.indexOf("\"a\"") < text.indexOf("\"z\""))
  }
}
