package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sink.CogWriter
import graft.source.{GridFile, Hdf5Write, NetCdf, ZarrCodec, ZarrFixture}

/** One logical array through every container the engine writes AND
  * reads: classic netCDF (CDF-1/2/5), netCDF-4/HDF5 (deflate+shuffle
  * chunked), zarr v2 (blosc) and v3 (zstd), and COG (DEFLATE tiles).
  * Every reader must return bit-identical doubles — the format layer
  * is interchangeable plumbing, not five approximations.
  */
class FormatParitySpec extends AnyFunSuite {

  private val H = 6; private val W = 5
  private def f(y: Int, x: Int): Double = y * 10 + x + 0.25
  private val flat = Array.tabulate(H * W)(i => f(i / W, i % W))

  test("CDF-1/2/5, HDF5, zarr v2, zarr v3, and COG all round-trip the " +
    "same grid to bit-identical doubles") {
    val dims = Seq("y" -> H, "x" -> W)
    val vars = Seq(NetCdf.VarSpec("v", Seq("y", "x"),
      Seq("units" -> "K"), flat))

    val classic = Seq(1, 2, 5).map { ver =>
      val bytes = NetCdf.write(dims, Seq("t" -> "parity"), vars, ver)
      val h = NetCdf.readHeader(bytes)
      NetCdf.readVariable(bytes, h, h.vars.find(_.name == "v").get).toSeq
    }

    val hdf5 = {
      val bytes = Hdf5Write.write(dims, Seq("t" -> "parity"), vars)
      GridFile.open(bytes).readDoubles("v").toSeq
    }

    val zarrV2 = {
      val store = Files.createTempDirectory("graft-parity-z2")
      ZarrFixture.write(store, "v", Seq(H, W), Seq(4, 3),
        value = idx => f(idx(0), idx(1)))
      val meta = ZarrCodec.readMeta(store).find(_.name == "v").get
      ZarrCodec.readArray(store, meta).toSeq
    }

    val zarrV3 = {
      val store = Files.createTempDirectory("graft-parity-z3")
      ZarrFixture.writeV3(store, "v", Seq(H, W), Seq(4, 3),
        value = idx => f(idx(0), idx(1)))
      val meta = ZarrCodec.readMeta(store).find(_.name == "v").get
      ZarrCodec.readArray(store, meta).toSeq
    }

    val cog = {
      val grid = Array.tabulate(H)(y => Array.tabulate(W)(x => f(y, x)))
      val bytes = CogWriter.write(
        Seq(CogWriter.Band("v", Map.empty) -> grid))
      CogReaderFlat(bytes)
    }

    val all = classic ++ Seq(hdf5, zarrV2, zarrV3, cog)
    for ((got, i) <- all.zipWithIndex) {
      assert(got.length === flat.length, s"container $i length")
      got.zip(flat).zipWithIndex.foreach { case ((a, b), j) =>
        assert(java.lang.Double.doubleToLongBits(a) ===
          java.lang.Double.doubleToLongBits(b),
          s"container $i cell $j: $a vs $b")
      }
    }
  }

  private def CogReaderFlat(bytes: Array[Byte]): Seq[Double] = {
    val t = graft.source.CogReader.read(bytes)
    val g = t.readBand(0, 0)
    (0 until H).flatMap(y => (0 until W).map(x => g(y)(x)))
  }
}
