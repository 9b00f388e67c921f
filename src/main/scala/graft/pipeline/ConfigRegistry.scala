package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper

/** Config mismatch abort (ref stac/utils.py:13-14). */
final class ConfigMismatchException(msg: String) extends RuntimeException(msg)

/** Write-once run-config registry (S5/J5/K5, ref generator.py:425-459):
  *
  * The first run writes `config.json` capturing the per-collection
  * processing parameters; every later run for the same collection
  * validates its parameters against the stored ones and aborts with
  * [[ConfigMismatchException]] on any drift — the engine-side equivalent
  * of enforcing a fixed table schema across appends. Collections absent
  * from the stored file are merged in (the reference only validates when
  * the collection key already exists).
  *
  * Driver-side by design: the config is one tiny JSON document read once
  * per job, not data. Jackson (already on Spark's classpath) parses it;
  * writes are deterministic (sorted keys, 2-space indent like the
  * reference's orjson OPT_INDENT_2).
  */
final class ConfigRegistry(configPath: Path) {

  def this(path: String) = this(Paths.get(path))

  /** Validate-or-store, mirroring `_store_config`:
    *  - no file → write `{collection: params}`;
    *  - file exists, collection present → any difference raises;
    *  - file exists, collection absent → merge + rewrite.
    */
  def storeOrValidate(collection: String, params: Map[String, String]): Unit = {
    val existing = readAll()
    existing.get(collection) match {
      case Some(stored) =>
        if (stored != params)
          throw new ConfigMismatchException(
            s"Config does not match previous run for collection ($collection): " +
              s"stored=$stored attempted=$params")
      case None =>
        write(existing + (collection -> params))
    }
  }

  def readAll(): Map[String, Map[String, String]] = {
    if (!Files.exists(configPath)) return Map.empty
    val root = new ObjectMapper().readTree(Files.readString(configPath))
    root.properties().asScala.map { e =>
      e.getKey -> e.getValue.properties().asScala
        .map(p => p.getKey -> p.getValue.asText()).toMap
    }.toMap
  }

  private def write(all: Map[String, Map[String, String]]): Unit = {
    if (configPath.getParent != null) Files.createDirectories(configPath.getParent)
    val body = all.toSeq.sortBy(_._1).map { case (coll, params) =>
      val inner = params.toSeq.sortBy(_._1)
        .map { case (k, v) => s"    ${graft.Json.quote(k)}: ${graft.Json.quote(v)}" }
        .mkString("{\n", ",\n", "\n  }")
      s"  ${graft.Json.quote(coll)}: $inner"
    }.mkString("{\n", ",\n", "\n}")
    Files.writeString(configPath, body)
  }
}
