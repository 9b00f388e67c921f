package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Json

/** Versioned snapshot table: the commit-log layer that turns a pile of
  * parquet files into a TABLE with atomic appends and time travel —
  * the (deliberately minimal) Delta/Iceberg mechanism, built on the
  * same primitive those formats use at 100 TB: data files are
  * immutable and write-once, and a version IS a manifest file listing
  * exactly the data files visible at that version. Readers never list
  * the directory (an eventually-consistent object store lists late,
  * lists partial writes, and lists abandoned files from failed jobs);
  * they read `log/v{N}.json` and open precisely those files. A commit
  * is one write-then-atomic-rename of the next manifest, so a reader
  * sees v{N} entirely or not at all — on a real object store the
  * rename becomes a conditional put, with the SAME manifest contents.
  *
  * Manifests are COMPLETE snapshots (every visible file), not deltas:
  * O(files) bytes per version, but time travel and recovery need no
  * log replay, and scan planning is a single small read however long
  * the history — the right trade until file counts force Iceberg-style
  * manifest trees (note in [[Compaction]]: bin-compaction keeps file
  * counts bounded, which is what keeps THIS design flat).
  */
object SnapshotTable {

  /** Per-file min/max of one long-typed column, aligned with `files` —
    * the Iceberg-style column statistics that let ANY range predicate
    * on the stat column prune files, not just curve-key rectangles.
    */
  final case class Stats(col: String, mins: Seq[Long], maxs: Seq[Long])

  final case class Version(version: Long, files: Seq[String], rows: Long,
                           stats: Option[Stats] = None)

  private def logDir(path: String): Path = Paths.get(path, "log")

  private def manifestPath(path: String, v: Long): Path =
    logDir(path).resolve(s"v$v.json")

  /** Latest committed version, 0 if the table does not exist. */
  def latestVersion(path: String): Long = {
    val dir = logDir(path)
    if (!Files.isDirectory(dir)) return 0L
    val vs = Files.list(dir).iterator()
    var best = 0L
    vs.forEachRemaining { p =>
      val n = p.getFileName.toString
      if (n.startsWith("v") && n.endsWith(".json"))
        best = math.max(best, n.drop(1).dropRight(5).toLong)
    }
    best
  }

  def readVersion(spark: SparkSession, path: String, v: Long): Version = {
    val p = manifestPath(path, v)
    require(Files.exists(p), s"snapshot table $path has no version $v")
    val df = spark.read.json(p.toString)
    val r = df.collect().head
    val stats =
      if (df.columns.contains("stats_col"))
        Some(Stats(r.getAs[String]("stats_col"),
          r.getAs[scala.collection.Seq[Long]]("stats_min").toSeq,
          r.getAs[scala.collection.Seq[Long]]("stats_max").toSeq))
      else None
    Version(r.getAs[Long]("version"),
      r.getAs[scala.collection.Seq[String]]("files").toSeq,
      r.getAs[Long]("rows"), stats)
  }

  /** Commit `df` as the next version: new immutable data files under
    * `files/batch-{v}/`, then the manifest (previous visible files +
    * the new batch) written to a temp name and atomically renamed.
    * Returns the committed version number.
    */
  def append(df: DataFrame, path: String, numPartitions: Int,
             statsCol: Option[String] = None): Long = {
    val spark = df.sparkSession
    val prev = latestVersion(path)
    val v = prev + 1
    val batchDir = s"$path/files/batch-$v"
    val laidOut = statsCol match {
      // stats only prune when files hold tight ranges: range-partition
      // and sort by the stat column (the natural ingest order — a date
      // column arrives nearly sorted anyway)
      case Some(c) => df.repartitionByRange(numPartitions, col(c))
        .sortWithinPartitions(c)
      case None => df.repartition(numPartitions)
    }
    laidOut.write.mode("errorifexists").parquet(batchDir)
    // manifest facts derived from the WRITTEN files (one read-back
    // aggregation), recording what a reader will observe
    val perFile = spark.read.parquet(batchDir)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"),
        statsCol.map(c => min(col(c)).cast("long").as("mn"))
          .getOrElse(max(lit(0L)).as("mn")),
        statsCol.map(c => max(col(c)).cast("long").as("mx"))
          .getOrElse(max(lit(0L)).as("mx")))
      .collect().sortBy(_.getString(0))
    val newFiles = perFile.map(_.getString(0)).toSeq
    val newRows = perFile.map(_.getLong(1)).sum
    val base =
      if (prev == 0) Version(0, Seq.empty, 0)
      else readVersion(spark, path, prev)
    require(statsCol.isEmpty || base.files.isEmpty ||
        base.stats.exists(_.col == statsCol.get),
      s"stats column changed mid-table (was ${base.stats.map(_.col)})")
    val fields = scala.collection.mutable.ArrayBuffer(
      "version" -> v.toString,
      "rows" -> (base.rows + newRows).toString,
      "files" -> (base.files ++ newFiles).map(Json.quote)
        .mkString("[", ",", "]"))
    statsCol.foreach { c =>
      val baseMins = base.stats.map(_.mins).getOrElse(Seq.empty)
      val baseMaxs = base.stats.map(_.maxs).getOrElse(Seq.empty)
      fields += "stats_col" -> Json.quote(c)
      fields += "stats_min" -> (baseMins ++ perFile.map(_.getLong(2)))
        .mkString("[", ",", "]")
      fields += "stats_max" -> (baseMaxs ++ perFile.map(_.getLong(3)))
        .mkString("[", ",", "]")
    }
    val manifest = Json.obj(fields)
    Files.createDirectories(logDir(path))
    val tmp = logDir(path).resolve(s".v$v.json.tmp")
    Files.write(tmp, manifest.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(path, v), StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** Time-travel scan: exactly the files visible at `version`, plus
    * (filesRead, rowsExpected) so callers can assert isolation — a
    * v1 scan must not see v2's files however many exist on disk.
    */
  def scanAt(spark: SparkSession, path: String, version: Long)
      : (DataFrame, Int, Long) = {
    val ver = readVersion(spark, path, version)
    require(ver.files.nonEmpty, s"version $version is empty")
    // mergeSchema: appends may evolve the schema (added columns read
    // as null from older files) — the manifest, not file homogeneity,
    // defines the table
    (spark.read.option("mergeSchema", "true").parquet(ver.files: _*),
      ver.files.length, ver.rows)
  }

  /** Copy-on-write DELETE of stat-column range [lo, hi]: rewrite ONLY
    * the files whose manifest [min, max] intersects the range —
    * untouched files carry into the new version BY REFERENCE (zero
    * I/O), which is the entire economics of a 100 TB delete: dropping
    * one bad ingest day must not rewrite seven years. Survivor rows of
    * the hit files are rewritten into new files, and the next manifest
    * lists carried + rewritten files. Time travel is preserved: the
    * old version's manifest (and its files, which are never deleted
    * here — that is a separate retention sweep) still reads exactly
    * the pre-delete table. Returns (newVersion, filesRewritten,
    * filesTotalBefore).
    */
  def deleteStatsRange(spark: SparkSession, path: String, lo: Long,
                       hi: Long): (Long, Int, Int) = {
    val prev = latestVersion(path)
    require(prev > 0, s"snapshot table $path does not exist")
    val ver = readVersion(spark, path, prev)
    val st = ver.stats.getOrElse(throw new IllegalArgumentException(
      "copy-on-write delete needs column stats — append with statsCol"))
    val hitIdx = ver.files.indices.filter(i =>
      st.maxs(i) >= lo && st.mins(i) <= hi)
    val keepIdx = ver.files.indices.filterNot(hitIdx.contains)
    val v = prev + 1
    if (hitIdx.isEmpty) {
      // nothing intersects: the new version is the old file list
      val manifest = Json.obj(Seq(
        "version" -> v.toString, "rows" -> ver.rows.toString,
        "files" -> ver.files.map(Json.quote).mkString("[", ",", "]"),
        "stats_col" -> Json.quote(st.col),
        "stats_min" -> st.mins.mkString("[", ",", "]"),
        "stats_max" -> st.maxs.mkString("[", ",", "]")))
      val tmp = logDir(path).resolve(s".v$v.json.tmp")
      Files.write(tmp, manifest.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, manifestPath(path, v), StandardCopyOption.ATOMIC_MOVE)
      return (v, 0, ver.files.length)
    }
    val hitFiles = hitIdx.map(ver.files)
    val hitRows = spark.read.parquet(hitFiles: _*).count()
    val survivors = spark.read.parquet(hitFiles: _*)
      .filter(!col(st.col).between(lo, hi))
    val batchDir = s"$path/files/batch-$v"
    // keep the survivors' stat-order so their new stats stay tight
    survivors.repartitionByRange(math.max(hitIdx.length / 2, 1),
        col(st.col))
      .sortWithinPartitions(st.col)
      .write.mode("errorifexists").parquet(batchDir)
    val perFile = spark.read.parquet(batchDir)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"), min(col(st.col)).cast("long").as("mn"),
        max(col(st.col)).cast("long").as("mx"))
      .collect().sortBy(_.getString(0))
    val newRows = perFile.map(_.getLong(1)).sum
    val files = keepIdx.map(ver.files) ++ perFile.map(_.getString(0))
    val mins = keepIdx.map(st.mins) ++ perFile.map(_.getLong(2))
    val maxs = keepIdx.map(st.maxs) ++ perFile.map(_.getLong(3))
    val manifest = Json.obj(Seq(
      "version" -> v.toString,
      "rows" -> (ver.rows - hitRows + newRows).toString,
      "files" -> files.map(Json.quote).mkString("[", ",", "]"),
      "stats_col" -> Json.quote(st.col),
      "stats_min" -> mins.mkString("[", ",", "]"),
      "stats_max" -> maxs.mkString("[", ",", "]")))
    val tmp = logDir(path).resolve(s".v$v.json.tmp")
    Files.write(tmp, manifest.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(path, v), StandardCopyOption.ATOMIC_MOVE)
    (v, hitIdx.length, ver.files.length)
  }

  /** Stats-pruned range scan at `version`: open only the files whose
    * [min, max] on the manifest's stat column intersects [lo, hi],
    * with the exact BETWEEN as the residual predicate — Iceberg-style
    * file skipping on a plain data column, no curve key required.
    * Returns (relation, filesRead, filesTotal) for pruning assertions.
    */
  def scanStatsRange(spark: SparkSession, path: String, version: Long,
                     lo: Long, hi: Long): (DataFrame, Int, Int) = {
    val ver = readVersion(spark, path, version)
    val st = ver.stats.getOrElse(throw new IllegalArgumentException(
      s"version $version carries no column stats — append with statsCol"))
    val hit = ver.files.indices.filter(i =>
      st.maxs(i) >= lo && st.mins(i) <= hi).map(ver.files)
    val df =
      if (hit.isEmpty) spark.read.parquet(ver.files.head).limit(0)
      else spark.read.parquet(hit: _*)
    (df.filter(col(st.col).between(lo, hi)), hit.length, ver.files.length)
  }
}
