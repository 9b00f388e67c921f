package graft

import graft.source.{GridFile, Hdf5, Hdf5Write, NetCdfFixture}

/** Version-4 data layouts — the "latest"-format chunk indexes h5py and
  * libhdf5 emit (`libver='latest'`): Single Chunk when one chunk covers
  * the dataset, Fixed Array for fixed-shape multi-chunk datasets. The
  * writer renders both (real lookup3 checksums), pinning the reader
  * against structurally-valid files; parity with the v3 B-tree
  * rendering of identical content proves the index changes nothing
  * downstream.
  */
class V4LayoutSpec extends SparkSpec {

  private def bitEqual(a: Array[Double], b: Array[Double], tag: String): Unit = {
    assert(a.length === b.length, tag)
    a.indices.foreach(i => assert(
      java.lang.Double.doubleToLongBits(a(i)) ===
        java.lang.Double.doubleToLongBits(b(i)), s"$tag($i)"))
  }

  test("v4 Fixed Array rendering decodes bit-identically to the v3 B-tree") {
    val (dims, gatts, vars) = NetCdfFixture.spec(nt = 1, ny = 64, nx = 64, nl = 3)
    // small chunk budget → 8 chunks per payload → Fixed Array index
    val v4 = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars,
      maxChunkElems = 2048, v4Layout = true))
    val v3 = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars,
      maxChunkElems = 2048))
    val band = v4.file.dataset("sic_mean").get
    assert(band.layout.isInstanceOf[Hdf5.ChunkedFixedArray],
      s"expected Fixed Array, got ${band.layout.getClass.getSimpleName}")
    v3.file.datasets.foreach { ds =>
      bitEqual(v3.readDoubles(ds.name), v4.readDoubles(ds.name), ds.name)
    }
    assert(v4.file.dimNames(band) === Seq("time", "yc", "xc", "leadtime"))
  }

  test("v4 Single Chunk index (one chunk covers the dataset) decodes") {
    val (dims, gatts, vars) = NetCdfFixture.spec(nt = 1, ny = 8, nx = 8, nl = 3)
    val v4 = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars, v4Layout = true))
    val v3 = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars))
    assert(v4.file.dataset("sic_mean").get.layout
      .isInstanceOf[Hdf5.ChunkedSingle])
    v3.file.datasets.foreach { ds =>
      bitEqual(v3.readDoubles(ds.name), v4.readDoubles(ds.name), ds.name)
    }
  }

  test("PAGED Fixed Array (chunk count past one page) decodes bit-" +
    "identically — the shape any many-chunk archive variable produces") {
    val (dims, gatts, vars) = NetCdfFixture.spec(nt = 1, ny = 64, nx = 64, nl = 3)
    // 8 chunks per payload at this budget; page bits 1 → 2-entry pages
    // → 4 element pages per variable behind the bitmap'd data block
    val paged = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars,
      maxChunkElems = 2048, v4Layout = true, v4PageBits = 1))
    val plain = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars,
      maxChunkElems = 2048))
    plain.file.datasets.foreach { ds =>
      bitEqual(plain.readDoubles(ds.name), paged.readDoubles(ds.name), ds.name)
    }
    // slice pushdown works through pages too
    val full = paged.readDoubles("sic_mean")
    val sliced = paged.readDoublesSliced("sic_mean",
      Array(None, Some(10L), None, None))
    (0 until 64 * 3).foreach { j =>
      val idx = (10 * 64 * 3) + j
      assert(java.lang.Double.doubleToLongBits(sliced(idx)) ===
        java.lang.Double.doubleToLongBits(full(idx)), s"cell $idx")
    }
  }

  test("slice pushdown prunes chunks through the Fixed Array index") {
    val (dims, gatts, vars) = NetCdfFixture.spec(nt = 1, ny = 64, nx = 64, nl = 3)
    val v4 = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars,
      maxChunkElems = 2048, v4Layout = true))
    val full = v4.readDoubles("sic_mean")
    // pin yc index 40: dims (time, yc, xc, leadtime)
    val sliced = v4.readDoublesSliced("sic_mean",
      Array(None, Some(40L), None, None))
    val (nx, nl) = (64, 3)
    (0 until nx * nl).foreach { j =>
      val idx = (40 * nx * nl) + j
      assert(java.lang.Double.doubleToLongBits(sliced(idx)) ===
        java.lang.Double.doubleToLongBits(full(idx)), s"cell $idx")
    }
  }

  test("GridFile + tidy scan read a v4-layout netCDF-4 transparently") {
    val (dims, gatts, vars) = NetCdfFixture.spec(nt = 1, ny = 8, nx = 8, nl = 3)
    val bytes = Hdf5Write.write(dims, gatts, vars, v4Layout = true)
    val g = GridFile.open(bytes)
    assert(g.format === "hdf5" && g.isPayload("sic_mean", 4))
    val dir = Work.stableDir("v4nc")
    java.nio.file.Files.write(dir.resolve("v4_0.nc"), bytes)
    val tidy = graft.source.NetCdfSource.tidy(spark, s"$dir/*.nc")
    assert(tidy.count() === 2 * 1 * 3 * 8)
  }

  test("v4 DONT_FILTER_PARTIAL_BOUND_CHUNKS (flags bit 0) is rejected — " +
    "running the filter pipeline on unfiltered edge chunks would " +
    "silently mis-decode") {
    val (dims, gatts, vars) = NetCdfFixture.spec()
    val v4 = Hdf5Write.write(dims, gatts, vars, v4Layout = true)
    val pat = Seq[Byte](4, 2, 2, 4, 4) // ver cls flags ndims encLen
    val at = v4.toSeq.lastIndexOfSlice(pat)
    assert(at >= 0, "v4 single-chunk layout message not found")
    val patched = v4.clone()
    patched(at + 2) = (patched(at + 2) | 0x1).toByte
    val e = intercept[Exception] { Hdf5.read(patched) }
    assert(e.getMessage.contains("partial edge chunks"), e.getMessage)
  }

  test("unknown v4 index types fail loudly") {
    // flip the index-type byte of a real v4 single-chunk layout message
    // (1 → 6, past every defined index): the reader must reject, not
    // misread
    val (dims, gatts, vars) = NetCdfFixture.spec()
    val v4 = Hdf5Write.write(dims, gatts, vars, v4Layout = true)
    // layout message body starts ver=4 cls=2 flags=2 ndims=4 encLen=4;
    // object headers sit after the chunk payloads, so take the LAST
    // match to dodge any coincidental pattern inside compressed data
    val pat = Seq[Byte](4, 2, 2, 4, 4)
    val at = v4.toSeq.lastIndexOfSlice(pat)
    assert(at >= 0, "v4 single-chunk layout message not found")
    val patched = v4.clone()
    patched(at + 5 + 16) = 6 // index type byte after the 4×4-byte dims
    val e = intercept[Exception] { Hdf5.read(patched) }
    assert(e.getMessage.contains("unsupported") ||
      e.getMessage.contains("index type"), e.getMessage)
  }

  // ---- Extensible Array (ONE unlimited dim — h5py maxshape=(None,…))

  test("Extensible Array index (unlimited time) decodes bit-identically " +
    "to the v3 B-tree — index-block elements + inlined data blocks") {
    // 6 chunks: 2 inline in the index block, the rest in the data
    // blocks addressed straight from it
    val (dims, gatts, vars) = NetCdfFixture.spec(nt = 6, ny = 8, nx = 8, nl = 3)
    val ea = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars,
      maxChunkElems = 8 * 8 * 3, v4Layout = true, v4Index = 4,
      unlimitedDims = Set("time")))
    val v3 = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars,
      maxChunkElems = 8 * 8 * 3))
    val band = ea.file.dataset("sic_mean").get
    assert(band.layout.isInstanceOf[Hdf5.ChunkedExtArray],
      s"expected Extensible Array, got ${band.layout.getClass.getSimpleName}")
    assert(band.unlimited === Set(0), band.maxDims.toString)
    v3.file.datasets.foreach { ds =>
      bitEqual(v3.readDoubles(ds.name), ea.readDoubles(ds.name), ds.name)
    }
    assert(ea.file.dimNames(band) === Seq("time", "yc", "xc", "leadtime"))
  }

  test("Extensible Array with super blocks and PAGED data blocks (the " +
    "shape a grown appendable archive produces) decodes + slices") {
    // 70 chunks (grid 35×2) reach super block 3, whose 2×16-element
    // data blocks page at the fixture's 8-element page size
    val (dims, gatts, vars) = NetCdfFixture.spec(nt = 70, ny = 8, nx = 8, nl = 3)
    val ea = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars,
      maxChunkElems = 256, v4Layout = true, v4Index = 4,
      unlimitedDims = Set("time")))
    val v3 = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars,
      maxChunkElems = 256))
    v3.file.datasets.foreach { ds =>
      bitEqual(v3.readDoubles(ds.name), ea.readDoubles(ds.name), ds.name)
    }
    // hyperslab pushdown prunes chunks through the EA tiers: pin one
    // time step deep in the super-block region
    val full = ea.readDoubles("sic_mean")
    val sliced = ea.readDoublesSliced("sic_mean",
      Array(Some(60L), None, None, None))
    (0 until 8 * 8 * 3).foreach { j =>
      val idx = (60 * 8 * 8 * 3) + j
      assert(java.lang.Double.doubleToLongBits(sliced(idx)) ===
        java.lang.Double.doubleToLongBits(full(idx)), s"cell $idx")
    }
  }

  test("Extensible Array PAGED data block pointed straight from the " +
    "index block (no super block, no bitmap) decodes + slices") {
    // eaPageBits=2 → 4-element pages: the u=1 data block (8 elements,
    // addressed from the index block, below the super-block tier) pages.
    // 12 one-timestep chunks: 2 inline, 4 in the u=0 block, 6 realized
    // in the paged u=1 block (its trailing 2 elements stay undefined).
    val (dims, gatts, vars) = NetCdfFixture.spec(nt = 12, ny = 8, nx = 8, nl = 3)
    val ea = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars,
      maxChunkElems = 8 * 8 * 3, v4Layout = true, v4Index = 4,
      eaPageBits = 2, unlimitedDims = Set("time")))
    val v3 = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars,
      maxChunkElems = 8 * 8 * 3))
    v3.file.datasets.foreach { ds =>
      bitEqual(v3.readDoubles(ds.name), ea.readDoubles(ds.name), ds.name)
    }
    // slice pinned inside the paged block's SECOND page (chunk 9 is
    // element 7 of the u=1 block → page 1)
    val full = ea.readDoubles("sic_mean")
    val sliced = ea.readDoublesSliced("sic_mean",
      Array(Some(9L), None, None, None))
    (0 until 8 * 8 * 3).foreach { j =>
      val idx = (9 * 8 * 8 * 3) + j
      assert(java.lang.Double.doubleToLongBits(sliced(idx)) ===
        java.lang.Double.doubleToLongBits(full(idx)), s"cell $idx")
    }
  }

  test("Extensible Array geometry sweep: page sizes 1..16 elements x " +
    "several chunk counts decode bit-identically to the v3 B-tree") {
    // pageBits 0 (1-element pages — EVERY multi-element block pages,
    // including both index-block data blocks) through 4 (16-element
    // pages — nothing pages until super block 3); chunk counts placed
    // to end inside each tier
    for (pageBits <- Seq(0, 2, 4); nt <- Seq(3, 7, 20)) {
      val (dims, gatts, vars) = NetCdfFixture.spec(nt = nt, ny = 4, nx = 4,
        nl = 2)
      val ea = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars,
        maxChunkElems = 4 * 4 * 2, v4Layout = true, v4Index = 4,
        eaPageBits = pageBits, unlimitedDims = Set("time")))
      val v3 = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars,
        maxChunkElems = 4 * 4 * 2))
      v3.file.datasets.foreach { ds =>
        val a = v3.readDoubles(ds.name); val b = ea.readDoubles(ds.name)
        assert(a.length === b.length, s"$pageBits/$nt ${ds.name}")
        a.indices.foreach(i => assert(
          java.lang.Double.doubleToLongBits(a(i)) ===
            java.lang.Double.doubleToLongBits(b(i)),
          s"pageBits=$pageBits nt=$nt ${ds.name}($i)"))
      }
    }
  }

  test("GridFile + tidy scan read an Extensible Array netCDF-4 " +
    "transparently") {
    val (dims, gatts, vars) = NetCdfFixture.spec(nt = 3, ny = 8, nx = 8, nl = 3)
    val bytes = Hdf5Write.write(dims, gatts, vars,
      maxChunkElems = 8 * 8 * 3, v4Layout = true, v4Index = 4,
      unlimitedDims = Set("time"))
    val g = GridFile.open(bytes)
    assert(g.format === "hdf5" && g.isPayload("sic_mean", 4))
    val dir = Work.stableDir("eanc")
    java.nio.file.Files.write(dir.resolve("ea_0.nc"), bytes)
    val tidy = graft.source.NetCdfSource.tidy(spark, s"$dir/*.nc")
    assert(tidy.count() === 2 * 3 * 3 * 8)
  }

  test("a node size too small for the chunk records fails fast, not " +
    "an infinite depth search") {
    val (dims, gatts, vars) = NetCdfFixture.spec(nt = 4, ny = 8, nx = 8, nl = 3)
    // rank-4 chunk records are 48 bytes; a 64-byte node holds one per
    // leaf and ZERO internal records — the capacity recurrence stalls
    val e = intercept[IllegalArgumentException] {
      Hdf5Write.write(dims, gatts, vars, maxChunkElems = 8 * 8 * 3,
        v4Layout = true, v4Index = 5, denseNodeSize = 64,
        unlimitedDims = Set("time", "yc"))
    }
    assert(e.getMessage.contains("cannot index"), e.getMessage)
  }

  // ---- v2 B-tree chunk index (≥2 unlimited dims)

  test("v2 B-tree chunk index (two unlimited dims) decodes bit-" +
    "identically, through a depth-1 record tree") {
    val (dims, gatts, vars) = NetCdfFixture.spec(nt = 70, ny = 8, nx = 8, nl = 3)
    // 70 records of 48 bytes at node size 2048 (leaf cap 42) → depth 1
    val bt = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars,
      maxChunkElems = 256, v4Layout = true, v4Index = 5,
      unlimitedDims = Set("time", "yc")))
    val v3 = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars,
      maxChunkElems = 256))
    val band = bt.file.dataset("sic_mean").get
    assert(band.layout.isInstanceOf[Hdf5.ChunkedBtreeV2],
      s"expected v2 B-tree, got ${band.layout.getClass.getSimpleName}")
    assert(band.unlimited === Set(0, 1), band.maxDims.toString)
    v3.file.datasets.foreach { ds =>
      bitEqual(v3.readDoubles(ds.name), bt.readDoubles(ds.name), ds.name)
    }
    // slice pushdown through the record walk
    val full = bt.readDoubles("sic_mean")
    val sliced = bt.readDoublesSliced("sic_mean",
      Array(Some(33L), None, None, None))
    (0 until 8 * 8 * 3).foreach { j =>
      val idx = (33 * 8 * 8 * 3) + j
      assert(java.lang.Double.doubleToLongBits(sliced(idx)) ===
        java.lang.Double.doubleToLongBits(full(idx)), s"cell $idx")
    }
  }
}
