package graft

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite
import graft.source.Hdf5

/** The HDF5 reader paths our own writer never emits — superblock v2,
  * version-2 object headers (OHDR), link-message groups, and a
  * MULTI-LEVEL chunk B-tree — exercised against a fixture file crafted
  * byte-by-byte from the public spec (the "latest"-libver shapes h5py
  * produces). One 1-D float64 dataset `v` = [1,2,3,4], chunked 2 at a
  * time, indexed by a level-1 B-tree over two leaves.
  */
class Hdf5EdgeSpec extends AnyFunSuite {

  private def craft(): Array[Byte] = {
    val buf = ByteBuffer.allocate(453).order(ByteOrder.LITTLE_ENDIAN)
    def at(pos: Int): ByteBuffer = { buf.position(pos); buf }

    // ---- superblock v2 @0 (48 bytes)
    at(0)
    buf.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n'))
    buf.put(2.toByte)             // superblock version
    buf.put(8.toByte); buf.put(8.toByte) // offset/length sizes
    buf.put(0.toByte)             // flags
    buf.putLong(0L)               // base address
    buf.putLong(-1L)              // superblock extension: undefined
    buf.putLong(453L)             // EOF
    buf.putLong(426L)             // root group object header
    buf.putInt(0)                 // checksum (not verified by the reader)

    // ---- chunk payloads @48 and @64
    at(48); buf.putDouble(1.0); buf.putDouble(2.0)
    at(64); buf.putDouble(3.0); buf.putDouble(4.0)

    // ---- chunk B-tree leaves @80 and @160 (80 bytes each)
    def leaf(pos: Int, origin: Long, chunkAddr: Long): Unit = {
      at(pos)
      buf.put("TREE".getBytes); buf.put(1.toByte); buf.put(0.toByte)
      buf.putShort(1)
      buf.putLong(-1L); buf.putLong(-1L)
      buf.putInt(16); buf.putInt(0)        // stored size, filter mask
      buf.putLong(origin); buf.putLong(0L) // coords + elem pseudo-dim
      buf.putLong(chunkAddr)
      buf.putInt(0); buf.putInt(0)         // final key
      buf.putLong(origin + 2); buf.putLong(0L)
    }
    leaf(80, 0L, 48L)
    leaf(160, 2L, 64L)

    // ---- level-1 internal node @240 (112 bytes) — two leaf children
    at(240)
    buf.put("TREE".getBytes); buf.put(1.toByte); buf.put(1.toByte)
    buf.putShort(2)
    buf.putLong(-1L); buf.putLong(-1L)
    buf.putInt(0); buf.putInt(0); buf.putLong(0L); buf.putLong(0L)
    buf.putLong(80L)
    buf.putInt(0); buf.putInt(0); buf.putLong(2L); buf.putLong(0L)
    buf.putLong(160L)
    buf.putInt(0); buf.putInt(0); buf.putLong(4L); buf.putLong(0L) // final key

    // ---- dataset object header, version 2 @352 (74 bytes)
    at(352)
    buf.put("OHDR".getBytes)
    buf.put(2.toByte); buf.put(0.toByte)  // version, flags (1-byte size)
    buf.put(63.toByte)                    // size of chunk 0
    // dataspace v2: rank 1, dims [4]
    buf.put(1.toByte); buf.putShort(12); buf.put(0.toByte)
    buf.put(2.toByte); buf.put(1.toByte); buf.put(0.toByte); buf.put(1.toByte)
    buf.putLong(4L)
    // datatype: IEEE float64 LE
    buf.put(3.toByte); buf.putShort(20); buf.put(0.toByte)
    buf.put(0x11.toByte)
    buf.put(0x20.toByte); buf.put(0x3F.toByte); buf.put(0.toByte)
    buf.putInt(8)
    buf.putShort(0); buf.putShort(64)
    buf.put(52.toByte); buf.put(11.toByte); buf.put(0.toByte); buf.put(52.toByte)
    buf.putInt(1023)
    // layout v3 chunked: rank+1 = 2, btree @240, chunk dims [2, 8]
    buf.put(8.toByte); buf.putShort(19); buf.put(0.toByte)
    buf.put(3.toByte); buf.put(2.toByte); buf.put(2.toByte)
    buf.putLong(240L)
    buf.putInt(2); buf.putInt(8)
    buf.putInt(0) // checksum

    // ---- root group object header, version 2 @426 (27 bytes):
    // a single hard-link message to the dataset
    at(426)
    buf.put("OHDR".getBytes)
    buf.put(2.toByte); buf.put(0.toByte)
    buf.put(16.toByte)
    buf.put(6.toByte); buf.putShort(12); buf.put(0.toByte) // link message
    buf.put(1.toByte)  // link version
    buf.put(0.toByte)  // flags: 1-byte name length, hard link
    buf.put(1.toByte)  // name length
    buf.put('v'.toByte)
    buf.putLong(352L)  // dataset OH address
    buf.putInt(0)      // checksum

    buf.array()
  }

  test("superblock v2 + OHDR v2 + link-message group + 2-level chunk tree") {
    val bytes = craft()
    assert(Hdf5.isHdf5(bytes))
    val r = new Hdf5.Reader(bytes)
    assert(r.file.datasets.map(_.name) === Seq("v"))
    val ds = r.file.dataset("v").get
    assert(ds.dims === Seq(4))
    assert(ds.dtype.cls === Hdf5.ClsFloat && ds.dtype.size === 8)
    assert(ds.layout.isInstanceOf[Hdf5.Chunked])
    assert(ds.layout.asInstanceOf[Hdf5.Chunked].chunkDims === Seq(2))
    // the level-1 node recursion assembles both leaf chunks in order
    assert(r.readDoubles("v").toSeq === Seq(1.0, 2.0, 3.0, 4.0))
  }
}
