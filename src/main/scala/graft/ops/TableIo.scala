package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}

/** Storage interface for the [[SnapshotTable]] METADATA plane —
  * manifest commits, retention sweeps, existence probes, offset files.
  * The DATA plane (parquet batches, DV files, bloom-index JSON) always
  * goes through Spark and is storage-portable already; this trait is
  * what makes the COMMIT PROTOCOL portable: a table whose log can only
  * live on a POSIX filesystem is not deployable at the 100 TB design
  * point, where the log lives on an object store or HDFS.
  *
  * The load-bearing method is [[createExclusive]] — the conditional
  * put at the heart of optimistic concurrency. Each implementation
  * maps it to its store's native atomic-create:
  *  - [[NioTableIo]]: write a unique temp file, hard-link it to the
  *    target (`Files.createLink` atomically fails when the target
  *    exists — POSIX's if-none-match)
  *  - [[HadoopTableIo]]: `FileSystem.create(path, overwrite=false)`,
  *    which HDFS implements as an atomic namespace operation; S3A
  *    (Hadoop ≥3.4.1) maps it to a conditional PUT with
  *    `If-None-Match: *`
  * Both surface a racing writer's earlier commit as
  * [[java.nio.file.FileAlreadyExistsException]], so the commit/retry
  * logic upstream is implementation-blind.
  *
  * Path strings are whatever the caller uses for the table root —
  * plain POSIX paths route to [[NioTableIo]], URI-schemed paths
  * (`file:`, `hdfs:`, `s3a:`, …) route to [[HadoopTableIo]] — and the
  * same strings are handed to Spark for the data plane, which accepts
  * both forms. Manifest FILE entries are always full URIs (Spark's
  * `input_file_name` renders them so); every implementation must
  * accept them too.
  */
trait TableIo {

  /** True when `p` exists (file or directory). */
  def exists(p: String): Boolean

  def isDirectory(p: String): Boolean

  def mkdirs(p: String): Unit

  def readString(p: String): String

  /** Create-or-replace write (small metadata payloads only). */
  def write(p: String, content: String): Unit

  /** CONDITIONAL PUT: create `p` with `content` atomically, failing
    * with [[java.nio.file.FileAlreadyExistsException]] when `p`
    * already exists — never replacing. The primitive optimistic
    * concurrency is built on; see the trait doc for the per-store
    * mapping.
    */
  def createExclusive(p: String, content: String): Unit

  /** Replace `p` with `content` such that readers see either the old
    * or the new bytes, never torn ones (temp + rename).
    */
  def writeAtomic(p: String, content: String): Unit

  /** Immediate child NAMES of `dir` (not paths); empty when `dir`
    * does not exist. O(children) — callers keep listings
    * manifest-scale.
    */
  def listNames(dir: String): Seq[String]

  /** Immediate children of `dir` with directory flags and mtimes. */
  def listEntries(dir: String): Seq[TableIo.Entry]

  /** Every regular FILE under `dir`, recursively; empty when `dir`
    * does not exist.
    */
  def walkFiles(dir: String): Seq[TableIo.Entry]

  /** Delete a file if present; true when something was deleted. */
  def delete(p: String): Boolean

  /** Recursive delete of a directory tree (missing dir is a no-op). */
  def deleteDir(dir: String): Unit

  /** Move a file or directory tree to a DESTINATION THAT MUST NOT
    * EXIST — fails loudly when it does (never merges src under an
    * existing dst, the HDFS-rename footgun). The staged-commit
    * primitive atomic CTAS publishes through.
    */
  def rename(src: String, dst: String): Unit

  /** Canonical scheme-less absolute path for cross-source string
    * comparisons: manifest URIs (`file:///x`), `_metadata.file_path`
    * URIs (`file:/x`) and walked paths must all canonicalize equal
    * when they name the same file.
    */
  def canon(p: String): String
}

object TableIo {

  final case class Entry(path: String, name: String, isDir: Boolean,
                         size: Long, mtime: Long)

  private val schemeRe = "^[A-Za-z][A-Za-z0-9+.-]*:.*".r

  /** Route by path form: URI-schemed roots go through the Hadoop
    * FileSystem API (the deployable path — HDFS, S3A, GCS connectors,
    * and `file:` for local testing of the API), plain paths through
    * java.nio (the tested local default, whose conditional put is a
    * true atomic hard link). Manifest file entries are `file:` URIs
    * even for plain-path tables, so both impls accept URI inputs.
    */
  def forPath(path: String): TableIo =
    if (schemeRe.matches(path)) hadoopIo else nioIo

  lazy val nioIo: TableIo = new NioTableIo
  lazy val hadoopIo: TableIo = new HadoopTableIo
}

/** java.nio implementation — the local-filesystem default. Conditional
  * put = unique temp file + `Files.createLink` (atomic, fails-not-
  * replaces on POSIX).
  */
final class NioTableIo extends TableIo {
  import TableIo.Entry

  private def path(p: String): Path = Paths.get(p.stripPrefix("file:"))

  override def exists(p: String): Boolean = Files.exists(path(p))
  override def isDirectory(p: String): Boolean = Files.isDirectory(path(p))
  override def mkdirs(p: String): Unit = Files.createDirectories(path(p))

  override def readString(p: String): String =
    new String(Files.readAllBytes(path(p)), StandardCharsets.UTF_8)

  override def write(p: String, content: String): Unit = {
    Files.createDirectories(path(p).getParent)
    Files.write(path(p), content.getBytes(StandardCharsets.UTF_8))
  }

  override def createExclusive(p: String, content: String): Unit = {
    val target = path(p)
    Files.createDirectories(target.getParent)
    val tmp = target.getParent.resolve(
      s".${target.getFileName}.${java.util.UUID.randomUUID().toString.take(12)}.tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    try Files.createLink(target, tmp)
    finally Files.deleteIfExists(tmp)
  }

  override def writeAtomic(p: String, content: String): Unit = {
    val target = path(p)
    Files.createDirectories(target.getParent)
    val tmp = target.getParent.resolve(
      s".${target.getFileName}.${java.util.UUID.randomUUID().toString.take(12)}.tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  override def listNames(dir: String): Seq[String] = {
    val d = path(dir)
    if (!Files.isDirectory(d)) return Seq.empty
    val st = Files.list(d)
    try {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      st.iterator().forEachRemaining(p => buf += p.getFileName.toString)
      buf.toSeq
    } finally st.close()
  }

  override def listEntries(dir: String): Seq[Entry] = {
    val d = path(dir)
    if (!Files.isDirectory(d)) return Seq.empty
    val st = Files.list(d)
    try {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Entry]
      st.iterator().forEachRemaining { p =>
        val isDir = Files.isDirectory(p)
        buf += Entry(p.toString, p.getFileName.toString, isDir,
          if (isDir) 0L else Files.size(p),
          Files.getLastModifiedTime(p).toMillis)
      }
      buf.toSeq
    } finally st.close()
  }

  override def walkFiles(dir: String): Seq[Entry] = {
    val d = path(dir)
    if (!Files.isDirectory(d)) return Seq.empty
    val st = Files.walk(d)
    try {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Entry]
      st.iterator().forEachRemaining { p =>
        if (Files.isRegularFile(p))
          buf += Entry(p.toString, p.getFileName.toString, isDir = false,
            Files.size(p), Files.getLastModifiedTime(p).toMillis)
      }
      buf.toSeq
    } finally st.close()
  }

  override def delete(p: String): Boolean = Files.deleteIfExists(path(p))

  override def deleteDir(dir: String): Unit = {
    val d = path(dir)
    if (Files.exists(d)) graft.Work.wipe(d)
  }

  override def canon(p: String): String =
    path(p).toAbsolutePath.normalize().toString

  override def rename(src: String, dst: String): Unit = {
    val d = path(dst)
    if (Files.exists(d))
      throw new java.nio.file.FileAlreadyExistsException(dst)
    Files.createDirectories(d.getParent)
    Files.move(path(src), d)
    ()
  }
}

/** Hadoop `FileSystem` implementation — the deployable metadata plane.
  * Conditional put = `create(path, overwrite=false)`: an atomic
  * namespace operation on HDFS; a conditional PUT on S3A (Hadoop
  * ≥3.4.1); an exists-then-create on the local `file:` scheme (a
  * narrow non-atomic window acceptable for its only use here, API
  * testing — local production tables take the nio route). Hadoop's
  * own `FileAlreadyExistsException` (an IOException) is normalized to
  * [[java.nio.file.FileAlreadyExistsException]] so the commit/retry
  * logic upstream is implementation-blind.
  */
final class HadoopTableIo extends TableIo {
  import TableIo.Entry
  import org.apache.hadoop.fs.{FileSystem, Path => HPath}

  private def conf = org.apache.spark.SparkContext.getOrCreate()
    .hadoopConfiguration

  private def fsFor(p: String): (FileSystem, HPath) = {
    val hp = new HPath(p)
    (hp.getFileSystem(conf), hp)
  }

  override def exists(p: String): Boolean = {
    val (fs, hp) = fsFor(p); fs.exists(hp)
  }

  override def isDirectory(p: String): Boolean = {
    val (fs, hp) = fsFor(p)
    fs.exists(hp) && fs.getFileStatus(hp).isDirectory
  }

  override def mkdirs(p: String): Unit = {
    val (fs, hp) = fsFor(p); fs.mkdirs(hp); ()
  }

  override def readString(p: String): String = {
    val (fs, hp) = fsFor(p)
    val in = fs.open(hp)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  override def write(p: String, content: String): Unit = {
    val (fs, hp) = fsFor(p)
    val out = fs.create(hp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  override def createExclusive(p: String, content: String): Unit = {
    val (fs, hp) = fsFor(p)
    if (fs.getScheme == "file") {
      // RawLocalFileSystem's create(overwrite=false) is CHECK-THEN-ACT
      // — two concurrent writers can both pass the check and one
      // silently replaces the other's committed manifest (observed
      // under the concurrent-append spec). The local scheme has a true
      // conditional put: the nio hard-link primitive. Real deployment
      // schemes below have native atomic creates and take the
      // FileSystem path.
      TableIo.nioIo.createExclusive(
        fs.makeQualified(hp).toUri.getPath, content)
      return
    }
    // HDFS create(overwrite=false) is an atomic namespace op; S3A
    // (Hadoop >= 3.4.1) maps it to a conditional If-None-Match PUT
    val out =
      try fs.create(hp, false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          throw new FileAlreadyExistsException(p)
        case e: java.io.IOException
            if Option(e.getMessage).exists(_.toLowerCase
              .contains("already exists")) =>
          throw new FileAlreadyExistsException(p)
      }
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  override def writeAtomic(p: String, content: String): Unit = {
    val (fs, hp) = fsFor(p)
    val tmp = new HPath(hp.getParent,
      s".${hp.getName}.${java.util.UUID.randomUUID().toString.take(12)}.tmp")
    val out = fs.create(tmp, false)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // HDFS rename is atomic but refuses to replace: drop the old file
    // first. The brief absence window is fine for the offset files
    // this serves — a checkpoint has one consumer by contract.
    fs.delete(hp, false)
    if (!fs.rename(tmp, hp)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"atomic publish of $p failed")
    }
  }

  override def listNames(dir: String): Seq[String] = {
    val (fs, hp) = fsFor(dir)
    if (!fs.exists(hp)) return Seq.empty
    fs.listStatus(hp).toSeq.map(_.getPath.getName)
  }

  override def listEntries(dir: String): Seq[Entry] = {
    val (fs, hp) = fsFor(dir)
    if (!fs.exists(hp)) return Seq.empty
    fs.listStatus(hp).toSeq.map { st =>
      Entry(st.getPath.toString, st.getPath.getName, st.isDirectory,
        if (st.isDirectory) 0L else st.getLen, st.getModificationTime)
    }
  }

  override def walkFiles(dir: String): Seq[Entry] = {
    val (fs, hp) = fsFor(dir)
    if (!fs.exists(hp)) return Seq.empty
    val it = fs.listFiles(hp, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Entry]
    while (it.hasNext) {
      val st = it.next()
      buf += Entry(st.getPath.toString, st.getPath.getName,
        isDir = false, st.getLen, st.getModificationTime)
    }
    buf.toSeq
  }

  override def delete(p: String): Boolean = {
    val (fs, hp) = fsFor(p)
    fs.exists(hp) && fs.delete(hp, false)
  }

  override def deleteDir(dir: String): Unit = {
    val (fs, hp) = fsFor(dir)
    if (fs.exists(hp)) fs.delete(hp, true)
    ()
  }

  override def canon(p: String): String = {
    val (fs, hp) = fsFor(p)
    fs.makeQualified(hp).toUri.getPath
  }

  override def rename(src: String, dst: String): Unit = {
    val (fs, dp) = fsFor(dst)
    // HDFS rename onto an existing DIRECTORY silently moves src
    // UNDER it — guard first, so dst-exists is a loud failure
    if (fs.exists(dp))
      throw new java.nio.file.FileAlreadyExistsException(dst)
    fs.mkdirs(dp.getParent)
    val (_, sp) = fsFor(src)
    require(fs.rename(sp, dp), s"rename $src -> $dst failed")
  }
}
