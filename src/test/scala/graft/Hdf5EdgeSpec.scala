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

  test("big-endian float64 payloads decode via the datatype's byte " +
    "order (third-party writers on BE systems)") {
    val bytes = craftMultiSnod()
    // flip both datasets' float64 datatype messages to big-endian
    // (bits byte 0x20 -> 0x21) and byte-swap their contiguous payloads
    val pat = Array[Byte](0x11, 0x20, 0x3F, 0x00)
    var flipped = 0
    var i = 0
    while (i + 4 <= bytes.length) {
      if (pat.indices.forall(j => bytes(i + j) == pat(j))) {
        bytes(i + 1) = 0x21; flipped += 1
      }
      i += 1
    }
    assert(flipped === 2, s"expected 2 datatype messages, patched $flipped")
    for (off <- Seq(96, 104, 112, 120)) {
      val tmp = java.util.Arrays.copyOfRange(bytes, off, off + 8)
      (0 until 8).foreach(j => bytes(off + j) = tmp(7 - j))
    }
    val r = new Hdf5.Reader(bytes)
    assert(r.readDoubles("a").toSeq === Seq(1.5, 2.5))
    assert(r.readDoubles("b").toSeq === Seq(3.5, 4.5))
  }

  // ---- SHARED messages (committed datatypes + the SOHM heap)

  import graft.source.{Hdf5Write, NetCdfFixture}

  private def sharedPair(): (Array[Byte], Array[Byte]) = {
    val (dims, gatts, vars) = NetCdfFixture.spec(nt = 2, ny = 8, nx = 8, nl = 3)
    // a numeric attribute: under sharedDatatype the writer types it by
    // the committed datatype through a v2 attr message (flag bit 0)
    val vars2 = vars.map(v => if (v.name == "sic_stddev")
      v.copy(numAttrs = Seq("graft_cal" -> 2.5)) else v)
    (Hdf5Write.write(dims, gatts, vars2, maxChunkElems = 8 * 8 * 3),
      Hdf5Write.write(dims, gatts, vars2, maxChunkElems = 8 * 8 * 3,
        sharedDatatype = true))
  }

  /** positions (message-header start) of every shared datatype record:
    * type=0x0003, size=16, flags bit 1, body = version 3 type 2
    */
  private def sharedRecordsAt(bytes: Array[Byte]): Seq[Int] = {
    val pat = Array[Byte](0x03, 0x00, 0x10, 0x00, 0x02, 0x00, 0x00, 0x00,
      0x03, 0x02)
    bytes.indices.filter(i => i + pat.length <= bytes.length &&
      pat.indices.forall(j => bytes(i + j) == pat(j)))
  }

  private def assertDecodesLikePlain(plain: Array[Byte],
                                     variant: Array[Byte]): Unit = {
    val rp = new Hdf5.Reader(plain)
    val rv = new Hdf5.Reader(variant)
    assert(rv.file.datasets.map(_.name).sorted ===
      rp.file.datasets.map(_.name).sorted)
    rp.file.datasets.foreach { ds =>
      val a = rp.readDoubles(ds.name); val b = rv.readDoubles(ds.name)
      assert(a.length === b.length, ds.name)
      a.indices.foreach(i => assert(
        java.lang.Double.doubleToLongBits(a(i)) ===
          java.lang.Double.doubleToLongBits(b(i)), s"${ds.name}($i)"))
      // attributes decode identically too (refs carry file-specific
      // addresses, so compare name/text/numeric payloads only)
      val dv = rv.file.dataset(ds.name).get
      assert(ds.attrs.map(x => (x.name, x.text, x.nums)) ===
        dv.attrs.map(x => (x.name, x.text, x.nums)), s"${ds.name} attrs")
    }
  }

  test("committed datatype: SHARED v3 type-2 records resolve through " +
    "the named type's object header, decoding bit-identically") {
    val (plain, shared) = sharedPair()
    assert(sharedRecordsAt(shared).nonEmpty,
      "fixture carries no shared datatype records")
    assertDecodesLikePlain(plain, shared)
  }

  test("shared record versions 1 and 2 (older files) resolve the same") {
    val (plain, shared) = sharedPair()
    val recs = sharedRecordsAt(shared)
    def addrAt(b: Array[Byte], p: Int): Long =
      ByteBuffer.wrap(b, p + 10, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
    // v1: version, type, 6 reserved, address (body fills all 16 bytes)
    val v1 = shared.clone()
    recs.foreach { p =>
      val addr = addrAt(v1, p)
      val body = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      body.put(1.toByte); body.put(2.toByte)
      (0 until 6).foreach(_ => body.put(0.toByte))
      body.putLong(addr)
      System.arraycopy(body.array(), 0, v1, p + 8, 16)
    }
    assertDecodesLikePlain(plain, v1)
    // v2: version, type, address (10 bytes + 6 pad)
    val v2 = shared.clone()
    recs.foreach { p =>
      val addr = addrAt(v2, p)
      val body = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      body.put(2.toByte); body.put(2.toByte); body.putLong(addr)
      System.arraycopy(body.array(), 0, v2, p + 8, 16)
    }
    assertDecodesLikePlain(plain, v2)
  }

  test("SOHM heap: SHARED v3 type-1 heap IDs resolve through the " +
    "superblock extension's shared-message table + fractal heap") {
    val (plain, shared) = sharedPair()
    val recs = sharedRecordsAt(shared)
    assert(recs.nonEmpty)

    // ---- appendix: FRHP + one direct block holding the float64
    // datatype message body + SMTB + a superblock-extension OH
    val frhpAddr = shared.length.toLong
    val dblockAddr = frhpAddr + 146
    val smtbAddr = dblockAddr + 40
    val extOhAddr = smtbAddr + 38
    val app = ByteBuffer.allocate(146 + 40 + 38 + 40)
      .order(ByteOrder.LITTLE_ENDIAN)
    // FRHP: 8-byte heap IDs (offSize 3 from 24 heap-size bits, lenSize
    // 4), unfiltered, root = ONE 512-byte direct block (curRows = 0)
    app.put("FRHP".getBytes); app.put(0.toByte)
    app.putShort(8)                    // heap ID length
    app.putShort(0)                    // I/O filter length
    app.put(0.toByte)                  // flags
    app.putInt(4096)                   // max managed object size
    (0 until 12).foreach(_ => app.putLong(0L)) // huge/free/managed stats
    app.putShort(4)                    // table width
    app.putLong(512L)                  // starting block size
    app.putLong(4096L)                 // max direct block size
    app.putShort(24)                   // max heap size (bits)
    app.putShort(1)                    // starting # rows
    app.putLong(dblockAddr)            // root block address
    app.putShort(0)                    // current rows: 0 = direct root
    app.putInt(0)                      // checksum (not verified)
    // FHDB: header (16 bytes with the 3-byte block offset), then the
    // 20-byte inline float64 datatype message BODY at heap offset 16
    app.put("FHDB".getBytes); app.put(0.toByte)
    app.putLong(frhpAddr)
    app.put(0.toByte); app.put(0.toByte); app.put(0.toByte) // block offset
    app.put(0x11.toByte); app.put(0x20.toByte); app.put(0x3F.toByte)
    app.put(0.toByte)
    app.putInt(8); app.putShort(0); app.putShort(64)
    app.put(52.toByte); app.put(11.toByte); app.put(0.toByte)
    app.put(52.toByte); app.putInt(1023)
    app.putInt(0)                      // checksum (not verified)
    // SMTB: one index — datatype flag, list index (unused by readers),
    // heap above
    app.put("SMTB".getBytes)
    app.put(0.toByte); app.put(1.toByte) // index version, type (list)
    app.putShort(0x0002)               // message type flags: datatype
    app.putInt(0)                      // minimum message size
    app.putShort(50); app.putShort(40) // list/B-tree cutoffs
    app.putShort(1)                    // number of messages
    app.putLong(-1L)                   // index address (list unwritten)
    app.putLong(frhpAddr)              // fractal heap address
    app.putInt(0)                      // checksum
    // superblock extension: v1 object header, one 0x0F message
    app.put(1.toByte); app.put(0.toByte)
    app.putShort(1)                    // message count
    app.putInt(1)                      // reference count
    app.putInt(24)                     // header size
    app.putInt(0)                      // pad to 8
    app.putShort(0x000F); app.putShort(16)
    app.putInt(0)                      // flags + reserved
    app.put(0.toByte)                  // shared-message-table version
    app.putLong(smtbAddr)              // table address
    app.put(1.toByte)                  // number of indexes
    (0 until 6).foreach(_ => app.put(0.toByte))

    val out = shared ++ app.array()
    // rewrite the superblock as v2 with the extension address (root OH
    // address carried over from the v0 entry at byte 64)
    val rootOh = ByteBuffer.wrap(shared, 64, 8)
      .order(ByteOrder.LITTLE_ENDIAN).getLong
    val sb = ByteBuffer.wrap(out, 8, 40).order(ByteOrder.LITTLE_ENDIAN)
    sb.put(2.toByte); sb.put(8.toByte); sb.put(8.toByte); sb.put(0.toByte)
    sb.putLong(0L); sb.putLong(extOhAddr); sb.putLong(out.length.toLong)
    sb.putLong(rootOh)
    // repoint every shared record at the SOHM heap: v3 type 1 + the
    // 8-byte managed heap ID (version 0, offset 16, length 20)
    recs.foreach { p =>
      val body = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      body.put(3.toByte); body.put(1.toByte)
      body.put(0.toByte)                                  // ID: managed v0
      body.put(16.toByte); body.put(0.toByte); body.put(0.toByte) // offset
      body.putInt(20)                                     // length
      System.arraycopy(body.array(), 0, out, p + 8, 16)
    }
    assertDecodesLikePlain(plain, out)
  }

  test("HUGE fractal-heap object: a type-1 heap ID resolves through the " +
    "heap's huge-object v2 B-tree to the shared datatype bytes") {
    val (plain, shared) = sharedPair()
    val recs = sharedRecordsAt(shared)
    assert(recs.nonEmpty)

    // ---- appendix: FRHP (no direct blocks, huge B-tree attached) +
    // the raw 20-byte datatype body + BTHD/BTLF with ONE type-1 record
    // (address, length, id=42) + SMTB + superblock-extension OH
    val frhpAddr = shared.length.toLong
    val bodyAddr = frhpAddr + 146
    val bthdAddr = bodyAddr + 20
    val btlfAddr = bthdAddr + 38
    val smtbAddr = btlfAddr + 34
    val extOhAddr = smtbAddr + 38
    val app = ByteBuffer.allocate(146 + 20 + 38 + 34 + 38 + 40)
      .order(ByteOrder.LITTLE_ENDIAN)
    // FRHP: huge-object B-tree in stats slot 2, NO root direct block
    app.put("FRHP".getBytes); app.put(0.toByte)
    app.putShort(8)                    // heap ID length
    app.putShort(0)                    // I/O filter length
    app.put(0.toByte)                  // flags
    app.putInt(16)                     // max managed size (tiny: all huge)
    app.putLong(43L)                   // next huge object ID
    app.putLong(bthdAddr)              // huge-object v2 B-tree
    (0 until 10).foreach(_ => app.putLong(0L))
    app.putShort(4)                    // table width
    app.putLong(512L)                  // starting block size
    app.putLong(4096L)                 // max direct block size
    app.putShort(24)                   // max heap size (bits)
    app.putShort(1)                    // starting # rows
    app.putLong(-1L)                   // root block address: none
    app.putShort(0)                    // current rows
    app.putInt(0)                      // checksum
    // the huge object itself: the raw float64 datatype message body
    app.put(0x11.toByte); app.put(0x20.toByte); app.put(0x3F.toByte)
    app.put(0.toByte)
    app.putInt(8); app.putShort(0); app.putShort(64)
    app.put(52.toByte); app.put(11.toByte); app.put(0.toByte)
    app.put(52.toByte); app.putInt(1023)
    // BTHD: record type 1 (huge, unfiltered, indirect), depth 0
    app.put("BTHD".getBytes); app.put(0.toByte)
    app.put(1.toByte)                  // B-tree type 1
    app.putInt(512)                    // node size
    app.putShort(24)                   // record size: addr+len+id
    app.putShort(0)                    // depth
    app.put(100.toByte); app.put(40.toByte) // split / merge percent
    app.putLong(btlfAddr)              // root node
    app.putShort(1)                    // root record count
    app.putLong(1L)                    // total records
    app.putInt(0)                      // checksum
    // BTLF: the one record
    app.put("BTLF".getBytes); app.put(0.toByte)
    app.put(1.toByte)
    app.putLong(bodyAddr); app.putLong(20L); app.putLong(42L)
    app.putInt(0)                      // checksum
    // SMTB (same shape as the managed-SOHM test)
    app.put("SMTB".getBytes)
    app.put(0.toByte); app.put(1.toByte)
    app.putShort(0x0002)
    app.putInt(0)
    app.putShort(50); app.putShort(40)
    app.putShort(1)
    app.putLong(-1L)
    app.putLong(frhpAddr)
    app.putInt(0)
    // superblock extension OH
    app.put(1.toByte); app.put(0.toByte)
    app.putShort(1)
    app.putInt(1)
    app.putInt(24)
    app.putInt(0)
    app.putShort(0x000F); app.putShort(16)
    app.putInt(0)
    app.put(0.toByte)
    app.putLong(smtbAddr)
    app.put(1.toByte)
    (0 until 6).foreach(_ => app.put(0.toByte))

    val out = shared ++ app.array()
    val rootOh = ByteBuffer.wrap(shared, 64, 8)
      .order(ByteOrder.LITTLE_ENDIAN).getLong
    val sb = ByteBuffer.wrap(out, 8, 40).order(ByteOrder.LITTLE_ENDIAN)
    sb.put(2.toByte); sb.put(8.toByte); sb.put(8.toByte); sb.put(0.toByte)
    sb.putLong(0L); sb.putLong(extOhAddr); sb.putLong(out.length.toLong)
    sb.putLong(rootOh)
    // repoint every shared record: v3 type 1 + a HUGE heap ID (type
    // bits 01, id number 42 little-endian in the remaining 7 bytes)
    recs.foreach { p =>
      val body = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      body.put(3.toByte); body.put(1.toByte)
      body.put(0x10.toByte)            // heap ID: version 0, type 1 huge
      body.put(42.toByte)              // id 42 LE
      (0 until 6).foreach(_ => body.put(0.toByte))
      System.arraycopy(body.array(), 0, out, p + 8, 16)
    }
    assertDecodesLikePlain(plain, out)
  }

  // ---- user-defined datatype classes: enum + compound (spec IV.A.2.d;
  // the netCDF-4 shapes h5py's enum_dtype / compound dtypes emit)

  /** Minimal one-dataset file: superblock v2 + contiguous data + OHDR v2
    * carrying an arbitrary datatype message body — the harness for
    * datatype-class parse tests (compound records, enum-of-int16).
    */
  private def craftTyped(dtBody: Array[Byte], data: Array[Byte],
                         dim: Int): Array[Byte] = {
    val dataAddr = 48
    val dsAddr = dataAddr + data.length
    val chunk0 = (4 + 12) + (4 + dtBody.length) + (4 + 18)
    require(chunk0 <= 255, s"chunk0 $chunk0 needs a 1-byte size")
    val dsSize = 4 + 2 + 1 + chunk0 + 4
    val rootAddr = dsAddr + dsSize
    val total = rootAddr + 27
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    def at(pos: Int): ByteBuffer = { buf.position(pos); buf }

    at(0)
    buf.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n'))
    buf.put(2.toByte)
    buf.put(8.toByte); buf.put(8.toByte)
    buf.put(0.toByte)
    buf.putLong(0L)
    buf.putLong(-1L)
    buf.putLong(total.toLong)
    buf.putLong(rootAddr.toLong)
    buf.putInt(0)

    at(dataAddr); buf.put(data)

    at(dsAddr)
    buf.put("OHDR".getBytes)
    buf.put(2.toByte); buf.put(0.toByte)
    buf.put(chunk0.toByte)
    // dataspace v2: rank 1, dims [dim]
    buf.put(1.toByte); buf.putShort(12); buf.put(0.toByte)
    buf.put(2.toByte); buf.put(1.toByte); buf.put(0.toByte); buf.put(1.toByte)
    buf.putLong(dim.toLong)
    // the datatype under test
    buf.put(3.toByte); buf.putShort(dtBody.length.toShort); buf.put(0.toByte)
    buf.put(dtBody)
    // layout v3 contiguous
    buf.put(8.toByte); buf.putShort(18); buf.put(0.toByte)
    buf.put(3.toByte); buf.put(1.toByte)
    buf.putLong(dataAddr.toLong); buf.putLong(data.length.toLong)
    buf.putInt(0) // checksum (not verified)

    at(rootAddr)
    buf.put("OHDR".getBytes)
    buf.put(2.toByte); buf.put(0.toByte)
    buf.put(16.toByte)
    buf.put(6.toByte); buf.putShort(12); buf.put(0.toByte)
    buf.put(1.toByte); buf.put(0.toByte); buf.put(1.toByte)
    buf.put('v'.toByte)
    buf.putLong(dsAddr.toLong)
    buf.putInt(0)

    buf.array()
  }

  private def float64Type(b: ByteBuffer): Unit = {
    b.put(0x11.toByte)
    b.put(0x20.toByte); b.put(0x3F.toByte); b.put(0.toByte)
    b.putInt(8)
    b.putShort(0); b.putShort(64)
    b.put(52.toByte); b.put(11.toByte); b.put(0.toByte); b.put(52.toByte)
    b.putInt(1023)
  }

  /** GCOL collection bytes: header + one object per payload (1-based
    * indices), 8-byte padded, exact collection size.
    */
  private def gcol(payloads: Seq[Array[Byte]]): Array[Byte] = {
    val objSizes = payloads.map(p => 16 + p.length + ((8 - p.length % 8) % 8))
    val total = 16 + objSizes.sum
    val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    b.put("GCOL".getBytes); b.put(1.toByte)
    b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
    b.putLong(total.toLong)
    payloads.zipWithIndex.foreach { case (p, i) =>
      b.putShort((i + 1).toShort); b.putShort(1); b.putInt(0)
      b.putLong(p.length.toLong)
      b.put(p)
      (0 until (8 - p.length % 8) % 8).foreach(_ => b.put(0.toByte))
    }
    b.array()
  }

  test("VLEN (class 9) datasets: ragged numeric rows and vlen strings " +
    "resolve through the global heap") {
    // --- numeric: 3 cells [1.5, 2.5], [], [7.25, -3.0, 0.125]
    val rows = Seq(Seq(1.5, 2.5), Seq.empty[Double], Seq(7.25, -3.0, 0.125))
    val payloads = rows.filter(_.nonEmpty).map { r =>
      val pb = ByteBuffer.allocate(r.length * 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      r.foreach(pb.putDouble); pb.array()
    }
    val gcolAddr = 48 + 3 * 16
    val desc = ByteBuffer.allocate(3 * 16).order(ByteOrder.LITTLE_ENDIAN)
    desc.putInt(2); desc.putLong(gcolAddr.toLong); desc.putInt(1)
    desc.putInt(0); desc.putLong(0L); desc.putInt(0) // empty cell
    desc.putInt(3); desc.putLong(gcolAddr.toLong); desc.putInt(2)
    val dt = ByteBuffer.allocate(8 + 20).order(ByteOrder.LITTLE_ENDIAN)
    dt.put(0x19.toByte) // v1, class 9 (vlen)
    dt.put(0.toByte); dt.put(0.toByte); dt.put(0.toByte) // sequence
    dt.putInt(16) // stored descriptor size
    float64Type(dt)
    val r = new Hdf5.Reader(craftTyped(dt.array(),
      desc.array() ++ gcol(payloads), 3))
    assert(r.file.dataset("v").get.dtype.cls === Hdf5.ClsVlen)
    assert(r.readVlenRows("v").map(_.toSeq).toSeq === rows)
    intercept[IllegalArgumentException] { r.readVlenStrings("v") }

    // --- strings: ["alpha", "", "βeta!"] (UTF-8 byte-length counts)
    val strs = Seq("alpha", "", "βeta!")
    val sPayloads = strs.filter(_.nonEmpty)
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sDesc = ByteBuffer.allocate(3 * 16).order(ByteOrder.LITTLE_ENDIAN)
    sDesc.putInt(sPayloads(0).length)
    sDesc.putLong(gcolAddr.toLong); sDesc.putInt(1)
    sDesc.putInt(0); sDesc.putLong(0L); sDesc.putInt(0)
    sDesc.putInt(sPayloads(1).length)
    sDesc.putLong(gcolAddr.toLong); sDesc.putInt(2)
    val sdt = ByteBuffer.allocate(8 + 8).order(ByteOrder.LITTLE_ENDIAN)
    sdt.put(0x19.toByte)
    sdt.put(0x01.toByte) // type 1: string
    sdt.put(1.toByte) // charset UTF-8
    sdt.put(0.toByte)
    sdt.putInt(16)
    sdt.put(0x13.toByte); sdt.put(0.toByte); sdt.put(0.toByte)
    sdt.put(0.toByte); sdt.putInt(1) // base: 1-byte string
    val rs = new Hdf5.Reader(craftTyped(sdt.array(),
      sDesc.array() ++ gcol(sPayloads), 3))
    assert(rs.readVlenStrings("v").toSeq === strs)
    intercept[IllegalArgumentException] { rs.readVlenRows("v") }
  }

  test("BITFIELD (class 4) datasets decode as unsigned integers; " +
    "OPAQUE (class 5) parses with its tag and stays non-numeric") {
    // bitfield16, little-endian, full precision: values 1, 32768, 48879
    val bdt = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    bdt.put(0x14.toByte) // v1, class 4
    bdt.put(0.toByte); bdt.put(0.toByte); bdt.put(0.toByte) // LE, no pad
    bdt.putInt(2) // size
    bdt.putShort(0); bdt.putShort(16) // bit offset + precision
    val bdata = ByteBuffer.allocate(6).order(ByteOrder.LITTLE_ENDIAN)
    bdata.putShort(1); bdata.putShort(0x8000.toShort)
    bdata.putShort(0xBEEF.toShort)
    val rb = new Hdf5.Reader(craftTyped(bdt.array(), bdata.array(), 3))
    val dsb = rb.file.dataset("v").get
    assert(dsb.dtype.cls === Hdf5.ClsBitfield)
    assert(rb.readDoubles("v").toSeq === Seq(1.0, 32768.0, 48879.0))
    val gb = new graft.source.GridFile.H5(
      craftTyped(bdt.array(), bdata.array(), 3))
    assert(gb.dtypeName("v") === "bitfield16")

    // opaque(sensor): 2 cells of 4 raw bytes; tag null-padded to 8
    val odt = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    odt.put(0x15.toByte) // v1, class 5
    odt.put(8.toByte); odt.put(0.toByte); odt.put(0.toByte) // tag len 8
    odt.putInt(4) // size
    odt.put("sensor".getBytes); odt.put(0.toByte); odt.put(0.toByte)
    val ro = new Hdf5.Reader(craftTyped(odt.array(),
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), 2))
    val dso = ro.file.dataset("v").get
    assert(dso.dtype.cls === Hdf5.ClsOpaque)
    assert(dso.dtype.opaqueTag === "sensor")
    intercept[IllegalArgumentException] { ro.readDoubles("v") }
    val go = new graft.source.GridFile.H5(craftTyped(odt.array(),
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), 2))
    assert(go.dtypeName("v") === "opaque(sensor)")
    assert(!go.isPayload("v", 1)) // the tidy scan skips, not crashes
  }

  test("COMPOUND v1 records: scalar + old-style array member stride out") {
    // {lo: f64 @0, bnds: f64[2] @8} — 24-byte records, dims [3]
    val dt = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    dt.put(0x16.toByte)                   // version 1, class 6
    dt.put(2.toByte); dt.put(0.toByte); dt.put(0.toByte) // 2 members
    dt.putInt(24)
    def memberV1(name: String, off: Int, ndims: Int, d0: Int): Unit = {
      val raw = name.getBytes("US-ASCII")
      dt.put(raw); (raw.length until 8).foreach(_ => dt.put(0.toByte))
      dt.putInt(off)
      dt.put(ndims.toByte); dt.put(0.toByte); dt.put(0.toByte); dt.put(0.toByte)
      dt.putInt(0)                        // dimension permutation
      dt.putInt(0)                        // reserved
      dt.putInt(d0); dt.putInt(0); dt.putInt(0); dt.putInt(0)
      float64Type(dt)
    }
    memberV1("lo", 0, 0, 0)
    memberV1("bnds", 8, 1, 2)
    val data = ByteBuffer.allocate(3 * 24).order(ByteOrder.LITTLE_ENDIAN)
    Seq((1.0, 10.0, 11.0), (2.0, 20.0, 21.0), (3.0, 30.0, 31.0)).foreach {
      case (lo, b0, b1) => data.putDouble(lo); data.putDouble(b0); data.putDouble(b1)
    }
    val dtb = java.util.Arrays.copyOf(dt.array(), dt.position())
    val r = new Hdf5.Reader(craftTyped(dtb, data.array(), 3))
    val ds = r.file.dataset("v").get
    assert(ds.dtype.cls === Hdf5.ClsCompound)
    assert(ds.dtype.members.map(_.name) === Seq("lo", "bnds"))
    assert(r.readMemberDoubles("v", "lo").toSeq === Seq(1.0, 2.0, 3.0))
    assert(r.readMemberDoubles("v", "bnds").toSeq ===
      Seq(10.0, 11.0, 20.0, 21.0, 30.0, 31.0))
    val g = new graft.source.GridFile.H5(craftTyped(dtb, data.array(), 3))
    assert(g.dtypeName("v") === "compound")
  }

  test("COMPOUND v3: unpadded names, minimal-width offsets, class-10 " +
    "array member") {
    // {t: f64 @0, bnds: f64[2] (array type) @8} — 24-byte records
    // v3 offsets: size 24 -> 1 byte each
    val dt = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    dt.put(0x36.toByte)                   // version 3, class 6
    dt.put(2.toByte); dt.put(0.toByte); dt.put(0.toByte)
    dt.putInt(24)
    dt.put('t'.toByte); dt.put(0.toByte)  // name, unpadded
    dt.put(0.toByte)                      // offset 0 in 1 byte
    float64Type(dt)
    "bnds".getBytes("US-ASCII").foreach(dt.put); dt.put(0.toByte)
    dt.put(8.toByte)                      // offset 8
    // array datatype v3: class 10, 1 dim of 2, base f64
    dt.put(0x3A.toByte)
    dt.put(0.toByte); dt.put(0.toByte); dt.put(0.toByte)
    dt.putInt(16)
    dt.put(1.toByte)                      // dimensionality (v3: no pad)
    dt.putInt(2)
    float64Type(dt)
    val data = ByteBuffer.allocate(2 * 24).order(ByteOrder.LITTLE_ENDIAN)
    Seq((0.5, 1.0, 2.0), (1.5, 3.0, 4.0)).foreach { case (t, b0, b1) =>
      data.putDouble(t); data.putDouble(b0); data.putDouble(b1)
    }
    val r = new Hdf5.Reader(craftTyped(
      java.util.Arrays.copyOf(dt.array(), dt.position()), data.array(), 2))
    val ds = r.file.dataset("v").get
    assert(ds.dtype.members.map(_.name) === Seq("t", "bnds"))
    assert(ds.dtype.members(1).tpe.cls === Hdf5.ClsArray)
    assert(ds.dtype.members(1).tpe.arrayDims === Seq(2))
    assert(r.readMemberDoubles("v", "t").toSeq === Seq(0.5, 1.5))
    assert(r.readMemberDoubles("v", "bnds").toSeq === Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("ENUM v3 of int16: unpadded names, sign-extended values, decode " +
    "through the base type") {
    val dt = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    dt.put(0x38.toByte)                   // version 3, class 8
    dt.put(2.toByte); dt.put(0.toByte); dt.put(0.toByte) // 2 members
    dt.putInt(2)
    // base: fixed int16 LE signed
    dt.put(0x10.toByte)
    dt.put(0x08.toByte); dt.put(0.toByte); dt.put(0.toByte)
    dt.putInt(2)
    dt.putShort(0); dt.putShort(16)
    dt.put('a'.toByte); dt.put(0.toByte)  // names unpadded in v3
    dt.put('b'.toByte); dt.put(0.toByte)
    dt.putShort((-1).toShort); dt.putShort(5)
    val data = ByteBuffer.allocate(3 * 2).order(ByteOrder.LITTLE_ENDIAN)
    data.putShort((-1).toShort); data.putShort(5); data.putShort((-1).toShort)
    val bytes = craftTyped(
      java.util.Arrays.copyOf(dt.array(), dt.position()), data.array(), 3)
    val r = new Hdf5.Reader(bytes)
    val ds = r.file.dataset("v").get
    assert(ds.dtype.cls === Hdf5.ClsEnum)
    assert(ds.dtype.enumNames === Seq("a", "b"))
    assert(ds.dtype.enumValues === Seq(-1L, 5L))
    assert(r.readDoubles("v").toSeq === Seq(-1.0, 5.0, -1.0))
    // the synthesized vocabulary attrs the relational layer reads
    assert(ds.attrText("enum_names").contains("a b"))
    assert(ds.attr("enum_values").get.nums === Seq(-1.0, 5.0))
    val g = new graft.source.GridFile.H5(bytes)
    assert(g.dtypeName("v") === "enum int16")
    assert(g.varAttrNums("v", "enum_values") === Seq(-1.0, 5.0))
  }

  test("ENUM writer round trip: enum-of-int8 mask variable through " +
    "Hdf5Write -> Reader, codes + vocabulary intact") {
    val mask = Array(0.0, 1.0, 2.0, 3.0, 0.0, 1.0)
    val vars = Seq(
      graft.source.NetCdf.VarSpec("t", Seq("t"), Seq(), Array(0.0, 1.0)),
      graft.source.NetCdf.VarSpec("y", Seq("y"), Seq(), Array(0.0, 1.0, 2.0)),
      graft.source.NetCdf.VarSpec("m", Seq("t", "y"),
        Seq("long_name" -> "mask"), mask))
    val bytes = graft.source.Hdf5Write.write(
      Seq("t" -> 2, "y" -> 3), Seq(), vars, enumVars = Set("m"))
    val r = new Hdf5.Reader(bytes)
    val ds = r.file.dataset("m").get
    assert(ds.dtype.cls === Hdf5.ClsEnum)
    assert(ds.dtype.size === 1)
    assert(ds.dtype.enumNames ===
      graft.source.Hdf5Write.EnumMembers.map(_._1))
    assert(ds.dtype.enumValues ===
      graft.source.Hdf5Write.EnumMembers.map(_._2.toLong))
    assert(r.readDoubles("m").toSeq === mask.toSeq)
    assert(ds.attrText("enum_names").contains("ocean ice land missing"))
    val g = new graft.source.GridFile.H5(bytes)
    assert(g.dtypeName("m") === "enum int8")
    assert(g.varAttrText("m", "long_name").contains("mask"))
  }

  test("compound fixture files open through GridFile: member reads, " +
    "type name, band exclusion") {
    val d = java.nio.file.Files.createTempDirectory("graft-comp")
    val glob = graft.source.NetCdfFixture.writeFilesCompound(d, n = 1, nRec = 4)
    val path = java.nio.file.Paths.get(glob.stripSuffix("/*.nc"))
      .resolve("bounds_00.nc")
    val g = graft.source.GridFile.open(
      java.nio.file.Files.readAllBytes(path))
    assert(g.varNames === Seq("time_bnds"))
    assert(g.dtypeName("time_bnds") === "compound")
    assert(!g.isPayload("time_bnds", 1)) // never a band payload
    assert(g.readMemberDoubles("time_bnds", "lo").toSeq ===
      Seq(0.0, 3600.0, 7200.0, 10800.0))
    assert(g.readMemberDoubles("time_bnds", "hi").toSeq ===
      Seq(3600.0, 7200.0, 10800.0, 14400.0))
    intercept[IllegalArgumentException] {
      g.readMemberDoubles("time_bnds", "nope")
    }
  }
}
