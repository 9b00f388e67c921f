package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.source.{Blosc, NetCdf}
import graft.multimodal.Wav

/** Property-style round-trip fuzz over the pure-JVM codecs that have
  * BOTH sides in-repo: blosc (all cnames × shuffle modes × typesizes),
  * the classic netCDF writer (versions 1/2/5, NaN/±Inf payloads, odd
  * name/attr lengths driving the 4-byte padding paths), and the WAV
  * PCM writer. Seeded generators keep failures reproducible.
  */
class FuzzRoundTripSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0x5EED5EED)

  test("blosc: compress∘decompress is identity across cnames, shuffle " +
    "modes, typesizes, and awkward lengths (incl. sub-typesize tails)") {
    val cnames = Seq("lz4", "zlib", "zstd", "snappy", "blosclz")
    for (trial <- 0 until 75) {
      val ts = Seq(1, 2, 4, 8)(trial % 4)
      val cname = cnames((trial / 4) % 5)
      val mode = trial % 3 // 0 none, 1 byte-shuffle, 2 bit-shuffle
      // lengths straddle block boundaries and typesize remainders
      val len = Seq(0, 1, ts, ts * 7 + 3, 65536 - 1, 65536 + ts,
        200000 + trial)(trial % 7)
      val data = new Array[Byte](len)
      // compressible-ish data (runs + noise) exercises both the
      // compressed and the stored-raw stream paths
      var i = 0
      while (i < len) {
        data(i) = if ((i / 97) % 2 == 0) (i % 7).toByte else rnd.nextInt().toByte
        i += 1
      }
      val packed = Blosc.compress(data, ts, cname,
        shuffle = mode == 1, bitShuffle = mode == 2)
      val back = Blosc.decompress(packed)
      assert(back.sameElements(data),
        s"trial $trial: cname=$cname ts=$ts mode=$mode len=$len")
    }
  }

  test("szip: encode∘decode is identity across bit widths (incl. the " +
    "32/64-bit byte-stream mode), masks, and block geometries") {
    for (trial <- 0 until 60) {
      val bits = Seq(8, 16, 24, 32, 64)(trial % 5)
      val mask = Seq(128 | 32 | 8 | 1, 128 | 4 | 8, 128 | 32 | 16)(trial % 3)
      val (ppb, pps) = Seq((8, 8), (16, 64), (8, 32))(trial % 3)
      val cd = Seq(mask, bits, ppb, pps)
      val bytesPer = bits / 8
      val n = Seq(1, 7, 64, 200 + trial)(trial % 4) * bytesPer
      val data = new Array[Byte](n)
      var i = 0
      while (i < n) { // runs + noise: both rice regimes
        data(i) = if ((i / 53) % 2 == 0) (i % 5).toByte
                  else rnd.nextInt().toByte
        i += 1
      }
      val enc = graft.source.H5Filters.szipEncode(data, cd)
      val back = graft.source.H5Filters.szipDecode(enc, cd)
      assert(back.sameElements(data),
        s"trial $trial: bits=$bits mask=$mask ppb=$ppb pps=$pps n=$n")
    }
  }

  test("netCDF classic writer: random dims/attrs/values round-trip " +
    "through the reader at every envelope version (NaN and ±Inf " +
    "preserved; padding paths hit via odd name/attr lengths)") {
    val gen = for {
      ver <- Gen.oneOf(1, 2, 5)
      ny <- Gen.choose(1, 9)
      nx <- Gen.choose(1, 9)
      nameLen <- Gen.choose(1, 9) // drives 0-3 pad bytes
      attrLen <- Gen.choose(0, 11)
      nVars <- Gen.choose(1, 3)
    } yield (ver, ny, nx, nameLen, attrLen, nVars)
    for (case_ <- Gen.listOfN(40, gen).sample.get) {
      val (ver, ny, nx, nameLen, attrLen, nVars) = case_
      val dims = Seq("y" -> ny, "x" -> nx)
      val special = Array(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, -0.0, 1.7e308, 4.9e-324)
      val vars = (0 until nVars).map { vi =>
        val data = Array.tabulate(ny * nx)(i =>
          if ((i + vi) % 5 == 0) special((i + vi) % special.length)
          else rnd.nextDouble() * 2e3 - 1e3)
        NetCdf.VarSpec("v" * nameLen + vi, Seq("y", "x"),
          Seq("units" -> ("u" * attrLen)), data,
          numAttrs = Seq("scale_factor" -> rnd.nextDouble()))
      }
      val bytes = NetCdf.write(dims, Seq("t" -> ("g" * attrLen)), vars, ver)
      val h = NetCdf.readHeader(bytes)
      assert(h.version === ver)
      for (v <- vars) {
        val rv = h.vars.find(_.name == v.name).get
        val back = NetCdf.readVariable(bytes, h, rv)
        assert(back.length === v.data.length)
        back.zip(v.data).foreach { case (a, b) =>
          // NaN == NaN under bit comparison; -0.0 distinct from 0.0
          assert(java.lang.Double.doubleToLongBits(a) ===
            java.lang.Double.doubleToLongBits(b), s"$ver ${v.name}")
        }
        assert(rv.attr("units").map(_.text) === Some("u" * attrLen))
      }
    }
  }

  test("WAV PCM writer: write∘decode recovers samples to 16-bit " +
    "quantization accuracy, clipping out-of-range input") {
    for (trial <- 0 until 25) {
      val n = 1 + rnd.nextInt(2000)
      val samples = Array.tabulate(n)(_ => rnd.nextDouble() * 3 - 1.5)
      val rate = Seq(8000, 16000, 44100)(trial % 3)
      val Some(pcm) = Wav.decode(Wav.write(samples, rate))
      assert(pcm.sampleRate === rate && pcm.samples.length === n)
      samples.zip(pcm.samples).foreach { case (x, y) =>
        val clipped = math.max(-1.0, math.min(1.0, x))
        // encode rounds at ×32767, decode normalizes by 32768: the
        // worst case is half an encode LSB plus the 1/32768 scale skew
        assert(math.abs(y - clipped) <= 1.5 / 32768 + 1e-12,
          s"trial $trial: $x -> $y")
      }
    }
  }
}
