package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.source.Half

/** IEEE binary16: decode pinned against hand-derived bit patterns
  * (the reader-critical direction), encode by round-trip.
  */
class HalfSpec extends AnyFunSuite {

  test("decode: canonical bit patterns") {
    assert(Half.toDouble(0x3C00.toShort) === 1.0)
    assert(Half.toDouble(0xC000.toShort) === -2.0)
    assert(Half.toDouble(0x3555.toShort) === (1.0 + 341.0 / 1024.0) * 0.25) // ~1/3
    assert(Half.toDouble(0x7BFF.toShort) === 65504.0) // max finite
    assert(Half.toDouble(0x0400.toShort) === math.pow(2, -14)) // min normal
    assert(Half.toDouble(0x0001.toShort) === 5.9604644775390625e-8) // min sub
    assert(Half.toDouble(0x0000.toShort) === 0.0)
    assert(1.0 / Half.toDouble(0x8000.toShort) === Double.NegativeInfinity) // -0
    assert(Half.toDouble(0x7C00.toShort) === Double.PositiveInfinity)
    assert(Half.toDouble(0xFC00.toShort) === Double.NegativeInfinity)
    assert(Half.toDouble(0x7E00.toShort).isNaN)
  }

  test("encode/decode round-trips every finite bit pattern exactly") {
    (0 until 0x10000).foreach { i =>
      val bits = i.toShort
      val d = Half.toDouble(bits)
      if (!d.isNaN && !d.isInfinite) {
        val back = Half.fromDouble(d)
        // -0 and +0 keep their signs; everything else is bit-exact
        assert(back === bits, f"bits 0x$i%04x -> $d -> 0x${back & 0xFFFF}%04x")
      }
    }
    assert(Half.fromDouble(Double.NaN) === 0x7E00.toShort)
    assert(Half.fromDouble(1e9) === 0x7C00.toShort)
    assert(Half.fromDouble(-1e9) === 0xFC00.toShort)
  }

  test("encode: IEEE overflow boundary and ties-to-even (numpy float16 " +
    "parity)") {
    // overflow midpoint is 65520: below rounds DOWN to max finite
    assert(Half.fromDouble(65505.0) === 0x7BFF.toShort)
    assert(Half.fromDouble(65519.0) === 0x7BFF.toShort)
    assert(Half.fromDouble(65519.99) === 0x7BFF.toShort)
    assert(Half.fromDouble(65520.0) === 0x7C00.toShort)
    assert(Half.fromDouble(-65519.0) === 0xFBFF.toShort)
    // ties-to-even: midpoint between 1.0 (0x3C00) and 1+1/1024 goes to
    // the even mantissa; next midpoint rounds up to the even 2
    assert(Half.fromDouble(1.0 + 0.5 / 1024.0) === 0x3C00.toShort)
    assert(Half.fromDouble(1.0 + 1.5 / 1024.0) === 0x3C02.toShort)
  }
}
