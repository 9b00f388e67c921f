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

  /** Symbol-table group whose B-tree fans out to TWO SNOD nodes — the
    * shape netCDF-4 produces once a group holds more than ~8 links,
    * which real forecast files (6-10 variables) sit right at.
    */
  private def craftMultiSnod(): Array[Byte] = {
    val buf = ByteBuffer.allocate(592).order(ByteOrder.LITTLE_ENDIAN)
    def at(pos: Int): ByteBuffer = { buf.position(pos); buf }

    // superblock v0 @0 (96 bytes)
    at(0)
    buf.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n'))
    buf.put(0.toByte); buf.put(0.toByte); buf.put(0.toByte); buf.put(0.toByte)
    buf.put(0.toByte)
    buf.put(8.toByte); buf.put(8.toByte)
    buf.put(0.toByte)
    buf.putShort(4); buf.putShort(16)
    buf.putInt(0)
    buf.putLong(0L); buf.putLong(-1L); buf.putLong(592L); buf.putLong(-1L)
    buf.putLong(0L); buf.putLong(552L) // root STE: name offset, OH addr
    buf.putInt(0); buf.putInt(0); buf.putLong(0L); buf.putLong(0L)

    // dataset payloads @96/@112
    at(96); buf.putDouble(1.5); buf.putDouble(2.5)
    at(112); buf.putDouble(3.5); buf.putDouble(4.5)

    // dataset object headers v1 @128/@232 (104 bytes each)
    def dsOh(pos: Int, dataAddr: Long): Unit = {
      at(pos)
      buf.put(1.toByte); buf.put(0.toByte)
      buf.putShort(3)     // dataspace, datatype, layout
      buf.putInt(1)
      buf.putInt(88)      // message block size
      buf.putInt(0)       // pad to 8
      // dataspace v1: rank 1, dims [2]
      buf.putShort(0x0001); buf.putShort(16)
      buf.putInt(0)
      buf.put(1.toByte); buf.put(1.toByte); buf.put(0.toByte); buf.put(0.toByte)
      buf.putInt(0)
      buf.putLong(2L)
      // datatype float64 LE
      buf.putShort(0x0003); buf.putShort(24)
      buf.putInt(0)
      buf.put(0x11.toByte)
      buf.put(0x20.toByte); buf.put(0x3F.toByte); buf.put(0.toByte)
      buf.putInt(8)
      buf.putShort(0); buf.putShort(64)
      buf.put(52.toByte); buf.put(11.toByte); buf.put(0.toByte); buf.put(52.toByte)
      buf.putInt(1023)
      buf.putInt(0)
      // layout v3 contiguous
      buf.putShort(0x0008); buf.putShort(24)
      buf.putInt(0)
      buf.put(3.toByte); buf.put(1.toByte)
      buf.putLong(dataAddr); buf.putLong(16L)
      (0 until 6).foreach(_ => buf.put(0.toByte))
    }
    dsOh(128, 96L)
    dsOh(232, 112L)

    // local heap @336 (56 bytes): names "a"@8, "b"@16
    at(336)
    buf.put("HEAP".getBytes)
    buf.put(0.toByte); buf.put(0.toByte); buf.put(0.toByte); buf.put(0.toByte)
    buf.putLong(24L); buf.putLong(1L); buf.putLong(336L + 32)
    buf.putLong(0L)
    buf.put('a'.toByte); (0 until 7).foreach(_ => buf.put(0.toByte))
    buf.put('b'.toByte); (0 until 7).foreach(_ => buf.put(0.toByte))

    // two SNODs @392/@440, one symbol each
    def snod(pos: Int, nameOff: Long, oh: Long): Unit = {
      at(pos)
      buf.put("SNOD".getBytes)
      buf.put(1.toByte); buf.put(0.toByte)
      buf.putShort(1)
      buf.putLong(nameOff); buf.putLong(oh)
      buf.putInt(0); buf.putInt(0)
      buf.putLong(0L); buf.putLong(0L)
    }
    snod(392, 8L, 128L)
    snod(440, 16L, 232L)

    // group B-tree @488: level 0, TWO SNOD children
    at(488)
    buf.put("TREE".getBytes)
    buf.put(0.toByte); buf.put(0.toByte)
    buf.putShort(2)
    buf.putLong(-1L); buf.putLong(-1L)
    buf.putLong(0L);  buf.putLong(392L) // key (before-all), SNOD A
    buf.putLong(16L); buf.putLong(440L) // key ("b"), SNOD B
    buf.putLong(16L)                    // final key

    // root object header v1 @552 (40 bytes): symbol-table message
    at(552)
    buf.put(1.toByte); buf.put(0.toByte)
    buf.putShort(1)
    buf.putInt(1)
    buf.putInt(24)
    buf.putInt(0)
    buf.putShort(0x0011); buf.putShort(16)
    buf.putInt(0)
    buf.putLong(488L); buf.putLong(336L)

    buf.array()
  }

  test("symbol-table group across TWO SNOD nodes resolves every link") {
    val r = new Hdf5.Reader(craftMultiSnod())
    assert(r.file.datasets.map(_.name).sorted === Seq("a", "b"))
    assert(r.readDoubles("a").toSeq === Seq(1.5, 2.5))
    assert(r.readDoubles("b").toSeq === Seq(3.5, 4.5))
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
