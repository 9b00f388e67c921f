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

  def wipe(dir: Path): Unit = if (Files.exists(dir)) {
    import scala.jdk.CollectionConverters._
    Files.walk(dir).iterator().asScala.toSeq.reverse
      .foreach(Files.deleteIfExists(_))
  }
}
