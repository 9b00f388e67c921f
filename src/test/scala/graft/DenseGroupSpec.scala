package graft

import graft.source.{GridFile, Hdf5, Hdf5Write, NetCdfFixture}

/** Dense (fractal-heap) group storage — the "latest"-format layout h5py
  * and libhdf5 emit once a group outgrows compact link storage, and the
  * first wall an arbitrary-HDF5 user used to hit here (the reader
  * rejected it through round 7). The writer can now emit the same
  * layout (real lookup3 name hashes + checksums), which pins the
  * reader's fractal-heap walk against a structurally-valid file; decode
  * parity with the symbol-table rendering of identical content proves
  * the link indirection changes nothing downstream.
  */
class DenseGroupSpec extends SparkSpec {

  private def denseBytes: Array[Byte] = {
    val (dims, gatts, vars) = NetCdfFixture.spec(nt = 1, ny = 8, nx = 8, nl = 3)
    Hdf5Write.write(dims, gatts, vars, denseRoot = true)
  }

  test("dense root group enumerates every link through the fractal heap") {
    val f = Hdf5.read(denseBytes)
    assert(f.datasets.map(_.name).toSet ===
      Set("time", "yc", "xc", "leadtime", "sic_mean", "sic_stddev"))
  }

  test("dense rendering decodes bit-identically to the symbol-table one") {
    val (dims, gatts, vars) = NetCdfFixture.spec(nt = 1, ny = 8, nx = 8, nl = 3)
    val dense = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars,
      denseRoot = true))
    val classic = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars))
    classic.file.datasets.foreach { ds =>
      val a = classic.readDoubles(ds.name)
      val b = dense.readDoubles(ds.name)
      assert(a.length === b.length, ds.name)
      a.indices.foreach(i => assert(
        java.lang.Double.doubleToLongBits(a(i)) ===
          java.lang.Double.doubleToLongBits(b(i)),
        s"${ds.name}($i)"))
    }
    // DIMENSION_LIST object references resolve across the dense layout
    val band = dense.file.dataset("sic_mean").get
    assert(dense.file.dimNames(band) === Seq("time", "yc", "xc", "leadtime"))
  }

  test("GridFile + tidy scan read a dense-group netCDF-4 transparently") {
    val g = GridFile.open(denseBytes)
    assert(g.format === "hdf5")
    assert(g.isPayload("sic_mean", 4))
    assert(g.varAttrText("yc", "units").contains("km"))
    // the manifest/tidy path accepts the file like any other rendering
    val dir = Work.stableDir("densenc")
    java.nio.file.Files.write(dir.resolve("dense_0.nc"), denseBytes)
    val tidy = graft.source.NetCdfSource.tidy(spark, s"$dir/*.nc")
    assert(tidy.count() === 2 * 1 * 3 * 8) // 2 vars x nt x nl x ny scanlines
  }

  test("dense (fractal-heap) ATTRIBUTES read back identically to the " +
    "compact rendering") {
    // many global attributes — the shape that makes h5py/libhdf5 spill
    // attribute storage out of the object header into a fractal heap +
    // type-8 name B-tree ("latest" format)
    val gatts = (0 until 12).map(i => f"attr_$i%02d" -> s"value $i") ++
      Seq("geospatial_bounds_crs" -> "EPSG:6931")
    val (dims, _, vars) = NetCdfFixture.spec(nt = 1, ny = 8, nx = 8, nl = 3)
    val dense = Hdf5Write.write(dims, gatts, vars, denseAttrs = true)
    val compact = Hdf5Write.write(dims, gatts, vars)
    val gd = GridFile.open(dense)
    val gc = GridFile.open(compact)
    gatts.foreach { case (k, v) =>
      assert(gd.gattText(k) === Some(v), k)
      assert(gd.gattText(k) === gc.gattText(k), k)
    }
    assert(gd.gattText("nope").isEmpty)
    // dense attrs + dense links compose (both heaps on one object)
    val both = GridFile.open(
      Hdf5Write.write(dims, gatts, vars, denseRoot = true, denseAttrs = true))
    assert(both.gattText("attr_07") === Some("value 7"))
    assert(both.varNames.toSet === gc.varNames.toSet)
    // and the full pipeline metadata path sees the dense-attr CRS
    val dir = Work.stableDir("denseattrnc")
    java.nio.file.Files.write(dir.resolve("da_0.nc"), dense)
    val man = graft.source.NetCdfSource.manifest(spark, s"$dir/*.nc")
    import org.apache.spark.sql.functions.col
    assert(man.filter(col("is_band")).select("crs").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("EPSG:6931"))
  }

  test("a dense group within one B-tree leaf enumerates (depth-0 control)") {
    val manyVars = (0 until 30).map { i =>
      graft.source.NetCdf.VarSpec(f"var_with_a_rather_long_name_$i%02d",
        Seq("yc"), Seq.empty, Array.tabulate(8)(_.toDouble + i))
    }
    val dims = Seq("yc" -> 8)
    val bytes = Hdf5Write.write(dims, Seq.empty,
      graft.source.NetCdf.VarSpec("yc", Seq("yc"), Seq.empty,
        Array.tabulate(8)(_.toDouble)) +: manyVars, denseRoot = true)
    val f = Hdf5.read(bytes)
    assert(f.datasets.length === 31)
    assert(f.dataset("var_with_a_rather_long_name_17").isDefined)
  }

  test("depth-1 v2 B-tree: a dense group beyond one leaf enumerates and " +
    "decodes through the BTIN internal node") {
    // node size 256 → 22-record leaves; 41 links → 2 leaves + 1 separator
    val manyVars = (0 until 40).map { i =>
      graft.source.NetCdf.VarSpec(f"v_$i%02d", Seq("yc"), Seq.empty,
        Array.tabulate(8)(x => x.toDouble + i))
    }
    val dims = Seq("yc" -> 8)
    val bytes = Hdf5Write.write(dims, Seq.empty,
      graft.source.NetCdf.VarSpec("yc", Seq("yc"), Seq.empty,
        Array.tabulate(8)(_.toDouble)) +: manyVars,
      denseRoot = true, denseNodeSize = 256)
    val r = new Hdf5.Reader(bytes)
    assert(r.file.datasets.length === 41)
    (0 until 40).foreach { i =>
      val name = f"v_$i%02d"
      assert(r.file.dataset(name).isDefined, name)
      assert(r.readDoubles(name).toSeq ===
        Array.tabulate(8)(x => x.toDouble + i).toSeq, name)
    }
  }

  test("depth-2 v2 B-tree: a very wide dense group walks BTIN-over-BTIN " +
    "with total-subtree counts in the child pointers") {
    // node size 64 → 4-record leaves, 2-record internals; capacities
    // are 4 (d0), 14 (d1), 44 (d2) — 41 links land at depth 2, where
    // pointers in the root gain the total-count field the depth-1
    // layout omits
    val manyVars = (0 until 40).map { i =>
      graft.source.NetCdf.VarSpec(f"v_$i%02d", Seq("yc"), Seq.empty,
        Array.tabulate(8)(x => x.toDouble + i))
    }
    val dims = Seq("yc" -> 8)
    val bytes = Hdf5Write.write(dims, Seq.empty,
      graft.source.NetCdf.VarSpec("yc", Seq("yc"), Seq.empty,
        Array.tabulate(8)(_.toDouble)) +: manyVars,
      denseRoot = true, denseNodeSize = 64)
    val r = new Hdf5.Reader(bytes)
    assert(r.file.datasets.length === 41)
    (0 until 40).foreach { i =>
      val name = f"v_$i%02d"
      assert(r.file.dataset(name).isDefined, name)
      assert(r.readDoubles(name).toSeq ===
        Array.tabulate(8)(x => x.toDouble + i).toSeq, name)
    }
  }

  test("depth-3 v2 B-tree: dense attributes recurse through three " +
    "internal levels") {
    // 17-byte attr records at node size 64: capacities 3/7/15/31 per
    // depth — 30 attrs force depth 3
    val gatts = (0 until 30).map(i => f"attr_$i%02d" -> s"value $i")
    val (dims, _, vars) = NetCdfFixture.spec(nt = 1, ny = 8, nx = 8, nl = 3)
    val g = GridFile.open(Hdf5Write.write(dims, gatts, vars,
      denseAttrs = true, denseNodeSize = 64))
    gatts.foreach { case (k, v) => assert(g.gattText(k) === Some(v), k) }
  }

  test("depth-1 v2 B-tree: dense attributes beyond one leaf all resolve") {
    // node size 256 → 14-record leaves; 30 attrs → 3 leaves + 2 separators
    val gatts = (0 until 30).map(i => f"attr_$i%02d" -> s"value $i")
    val (dims, _, vars) = NetCdfFixture.spec(nt = 1, ny = 8, nx = 8, nl = 3)
    val g = GridFile.open(Hdf5Write.write(dims, gatts, vars,
      denseAttrs = true, denseNodeSize = 256))
    gatts.foreach { case (k, v) => assert(g.gattText(k) === Some(v), k) }
  }

  private def manyVarSpec(n: Int)
      : (Seq[(String, Int)], Seq[graft.source.NetCdf.VarSpec]) = {
    val manyVars = (0 until n).map { i =>
      graft.source.NetCdf.VarSpec(f"v_$i%02d", Seq("yc"), Seq.empty,
        Array.tabulate(8)(x => x.toDouble + i))
    }
    (Seq("yc" -> 8),
      graft.source.NetCdf.VarSpec("yc", Seq("yc"), Seq.empty,
        Array.tabulate(8)(_.toDouble)) +: manyVars)
  }

  test("FILTERED fractal heap (deflated root direct block) enumerates " +
    "and decodes — the I/O-filtered dense-group variant") {
    val (dims, gatts, vars) = NetCdfFixture.spec(nt = 1, ny = 8, nx = 8, nl = 3)
    val filt = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars,
      denseRoot = true, denseHeapFiltered = true))
    val classic = new Hdf5.Reader(Hdf5Write.write(dims, gatts, vars))
    assert(filt.file.datasets.map(_.name).toSet ===
      classic.file.datasets.map(_.name).toSet)
    classic.file.datasets.foreach { ds =>
      val a = classic.readDoubles(ds.name)
      val b = filt.readDoubles(ds.name)
      assert(a.length === b.length, ds.name)
      a.indices.foreach(i => assert(
        java.lang.Double.doubleToLongBits(a(i)) ===
          java.lang.Double.doubleToLongBits(b(i)), s"${ds.name}($i)"))
    }
    val band = filt.file.dataset("sic_mean").get
    assert(filt.file.dimNames(band) === Seq("time", "yc", "xc", "leadtime"))
  }

  test("fractal heap with child INDIRECT blocks (doubling table past " +
    "maxDirectRows) enumerates every link") {
    // geometry 64/128/2: 3 direct rows cover 26 links; 41 links spill
    // into row 3's child indirect blocks — two of them
    val (dims, vars) = manyVarSpec(40)
    val bytes = Hdf5Write.write(dims, Seq.empty, vars,
      denseRoot = true, denseHeapGeom = Some((64L, 128L, 2)))
    val r = new Hdf5.Reader(bytes)
    assert(r.file.datasets.length === 41)
    (0 until 40).foreach { i =>
      val name = f"v_$i%02d"
      assert(r.readDoubles(name).toSeq ===
        Array.tabulate(8)(x => x.toDouble + i).toSeq, name)
    }
  }

  test("FILTERED fractal heap with child indirect blocks: deflated " +
    "direct blocks behind stored-size doubling-table entries") {
    val (dims, vars) = manyVarSpec(40)
    val bytes = Hdf5Write.write(dims, Seq.empty, vars,
      denseRoot = true, denseHeapGeom = Some((64L, 128L, 2)),
      denseHeapFiltered = true)
    val r = new Hdf5.Reader(bytes)
    assert(r.file.datasets.length === 41)
    (0 until 40).foreach { i =>
      val name = f"v_$i%02d"
      assert(r.readDoubles(name).toSeq ===
        Array.tabulate(8)(x => x.toDouble + i).toSeq, name)
    }
  }
}
