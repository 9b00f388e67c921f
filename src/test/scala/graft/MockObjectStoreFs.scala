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
