package graft

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test-only FileSystem that mimics an object store's conditional-PUT
  * failure mode: exclusive create rejects an existing target with a
  * PLAIN IOException whose message says "already exists" (as S3-style
  * stores do through some connector versions), not Hadoop's typed
  * FileAlreadyExistsException — exercising HadoopTableIo's
  * message-normalization branch. Everything else is the local
  * filesystem under a non-`file` scheme.
  */
class MockObjectStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "graftmock"
  override def getUri: URI = URI.create("graftmock:///")

  // RawLocalFileSystem defers permission loading to `new File(uri)`,
  // which rejects the non-file scheme — return statuses with
  // permissions already materialized (as a real object-store
  // connector does; stores have no POSIX permissions to lazy-load)
  private def solid(st: org.apache.hadoop.fs.FileStatus)
      : org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(st.getLen, st.isDirectory,
      st.getReplication, st.getBlockSize, st.getModificationTime,
      st.getAccessTime,
      if (st.isDirectory) FsPermission.getDirDefault
      else FsPermission.getFileDefault,
      "", "", st.getPath)

  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    solid(super.getFileStatus(f))

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(solid)

  override def create(f: Path, permission: FsPermission,
                      overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    if (!overwrite && exists(f))
      throw new java.io.IOException(
        s"PUT failed: object already exists at $f (412)")
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }
}
