package graft.source

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** [[Hdf5.ByteSource]] over the Hadoop FileSystem API: positioned
  * `readFully` reads, so an executor task fetches exactly the header
  * ranges and chunk byte-ranges it needs — never the whole file. This is
  * what lifts the 2 GiB single-buffer ceiling off netCDF-4/HDF5 inputs
  * (the Zarr reader's metadata/chunk split applied to HDF5), and it works
  * identically on local disk, HDFS and object stores.
  *
  * Positioned reads do not move the stream's own pointer, so one open
  * stream serves the lazy row iterator for the lifetime of the partition
  * reader; callers own `close()`.
  */
final class FsByteSource(fs: FileSystem, path: HPath)
    extends Hdf5.ByteSource {
  private val in = fs.open(path)
  override val length: Long = fs.getFileStatus(path).getLen
  override def read(pos: Long, len: Int): Array[Byte] = {
    require(pos >= 0 && len >= 0 && pos + len <= length,
      s"read past EOF at $pos+$len ($path is $length bytes)")
    val out = new Array[Byte](len)
    in.readFully(pos, out, 0, len)
    out
  }
  override def close(): Unit = in.close()
}
