package graft

import graft.pipeline.{EnvConfig, Ingest, Preprocess}

/** CLI facade mirroring the reference's `envstacgen` command surface
  * (ref cli.py:13-66) so a user of the reference can switch 1:1:
  *
  *   graft.Cli preprocess <input...> --name <collection> \
  *     [--data-path D] [--forecast-frequency 1days] [--workers N] \
  *     [--no-compress] [--overwrite] [--stac-only]
  *   graft.Cli ingest [--catalog PATH] [--overwrite] [--dry-run]
  *   graft.Cli watch <dropDir> --name <collection> [--data-path D]
  *     [--interval 30s | --once] [preprocess flags...]
  *
  * `watch` is the engine's streaming superset of `preprocess`: a
  * file-watch Structured Streaming source over the drop directory
  * drives the identical batch pipeline per micro-batch
  * (StreamingPreprocess). `--once` drains what is currently there and
  * exits; otherwise the watch runs until interrupted, picking up each
  * new forecast drop at `--interval`.
  *
  * Quirk preserved (SURVEY §7.4.8): `--no-compress` mirrors the
  * reference's `-c` flag whose DEFAULT leaves DEFLATE ON and whose
  * presence turns compression OFF — the observable behavior, not the
  * reference's inverted variable naming. `--workers` is accepted for
  * interface parity but maps to Spark's own task parallelism (the
  * process pool it tuned does not exist here). Ingest resolves DB
  * settings exactly like the reference: `.env` discovery + environment,
  * fail-fast on missing POSTGRES_* variables (unless --dry-run).
  */
object Cli {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    try args.headOption match {
      case Some("preprocess") => preprocess(spark, args.drop(1))
      case Some("ingest") => ingest(spark, args.drop(1))
      case Some("watch") => watch(spark, args.drop(1))
      case other =>
        System.err.println(s"unknown command: ${other.getOrElse("<none>")}; " +
          "expected preprocess | ingest | watch")
        sys.exit(2)
    } finally spark.stop()
  }

  private def preprocess(spark: org.apache.spark.sql.SparkSession,
                         args: Array[String]): Unit = {
    val (flags, positional) = parse(args)
    require(positional.nonEmpty, "preprocess: no input locations given")
    val inputs = graft.source.Discovery.resolve(positional)
    // compress default ON; --no-compress turns DEFLATE off (cli.py:30-35,
    // generator.py:620 - behavior preserved, naming inversion not)
    val compress = !flags.contains("no-compress")
    val opts = Preprocess.Options(
      name = flags.getOrElse("name",
        sys.error("preprocess: --name <collection> is required")),
      dataPath = flags.getOrElse("data-path", "data"),
      catalogName = flags.getOrElse("catalog-name", "catalog"),
      forecastFrequency = flags.getOrElse("forecast-frequency", "1days"),
      fileServerUrl = EnvConfig.load().get("FILE_SERVER_URL"),
      stacOnly = flags.contains("stac-only"),
      overwrite = flags.contains("overwrite"),
      compress = compress,
      // ref generator.py:826: reproject COGs to EPSG:4326, default off
      reproject = flags.contains("reproject"))
    val glob = inputs.map(_.toString)
    val res = Preprocess.run(spark, glob.mkString(","), opts)
    println(s"preprocess: ${res.nItems} item(s), ${res.nSlices} slice(s) " +
      s"written, catalog at ${res.catalogRoot} " +
      s"(compression ${if (compress) "DEFLATE" else "NONE"})")
  }

  private def watch(spark: org.apache.spark.sql.SparkSession,
                    args: Array[String]): Unit = {
    val (flags, positional) = parse(args)
    require(positional.length == 1, "watch: exactly one drop directory")
    val opts = Preprocess.Options(
      name = flags.getOrElse("name",
        sys.error("watch: --name <collection> is required")),
      dataPath = flags.getOrElse("data-path", "data"),
      catalogName = flags.getOrElse("catalog-name", "catalog"),
      forecastFrequency = flags.getOrElse("forecast-frequency", "1days"),
      fileServerUrl = EnvConfig.load().get("FILE_SERVER_URL"),
      stacOnly = flags.contains("stac-only"),
      overwrite = flags.contains("overwrite"),
      compress = !flags.contains("no-compress"))
    val checkpoint = flags.getOrElse("checkpoint",
      s"${opts.dataPath}/_watch_checkpoint")
    val onBatch = (br: graft.streaming.StreamingPreprocess.BatchRun) =>
      println(s"watch: batch ${br.batchId} — ${br.nFiles} file(s) → " +
        s"${br.result.nItems} item(s)")
    val trigger =
      if (flags.contains("once"))
        org.apache.spark.sql.streaming.Trigger.AvailableNow()
      else org.apache.spark.sql.streaming.Trigger
        .ProcessingTime(normalizeInterval(flags.getOrElse("interval", "30 seconds")))
    val q = graft.streaming.StreamingPreprocess.start(
      spark, positional.head, checkpoint, opts, onBatch, trigger)
    q.awaitTermination()
  }

  private def ingest(spark: org.apache.spark.sql.SparkSession,
                     args: Array[String]): Unit = {
    val (flags, _) = parse(args)
    val catalogRoot = flags.getOrElse("catalog", "data/stac/catalog")
    val overwrite = flags.contains("overwrite")
    val client =
      if (flags.contains("dry-run"))
        new Ingest.DryRunClient(Set.empty, Set.empty)
      else {
        val cfg = EnvConfig.load()
        val dsn = EnvConfig.pgDsn(cfg) // fail-fast (ingest.py:37-55)
        val db = new Ingest.JdbcPgStacClient(s"jdbc:$dsn")
        // legacy API-mode probes behind STAC_API_URL (or --stac-api-url):
        // the reference routes existence checks through the STAC API when
        // configured, with a readiness gate first (dataloader.py:34-52)
        flags.get("stac-api-url").orElse(cfg.get("STAC_API_URL")) match {
          case Some(api) => Ingest.ApiModeClient.connect(api, db)
          case None => db
        }
      }
    val res = Ingest.run(spark, catalogRoot, client, overwrite)
    println(s"ingest: ${res.collectionsLoaded} collection(s) + " +
      s"${res.itemsLoaded} item(s) loaded; " +
      s"${res.collectionsSkipped}/${res.itemsSkipped} skipped")
  }

  /** `30s`/`5m`/`2h` shorthand → Spark interval syntax (`30 seconds`);
    * anything else (already-spelled-out intervals) passes through to
    * Trigger.ProcessingTime untouched.
    */
  private[graft] def normalizeInterval(s: String): String =
    "^(\\d+)\\s*([smh])$".r.findFirstMatchIn(s.trim) match {
      case Some(m) =>
        val unit = m.group(2) match {
          case "s" => "seconds"; case "m" => "minutes"; case _ => "hours"
        }
        s"${m.group(1)} $unit"
      case None => s
    }

  /** `--flag value` / `--flag` / positional split; boolean flags are the
    * ones whose next token is absent or another flag.
    */
  private[graft] def parse(args: Array[String]): (Map[String, String], Seq[String]) = {
    val flags = scala.collection.mutable.Map[String, String]()
    val positional = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        val key = a.drop(2)
        if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
          flags(key) = args(i + 1); i += 2
        } else { flags(key) = "true"; i += 1 }
      } else { positional += a; i += 1 }
    }
    (flags.toMap, positional.toSeq)
  }
}
