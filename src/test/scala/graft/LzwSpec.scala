package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.source.CogReader

/** TIFF LZW decode, round-tripped against an independently written
  * canonical encoder (the libtiff rule: MSB-first packing, width bumps
  * when the next free code exceeds (1<<width)-2 — "early change").
  * Inputs sized to cross the 9→10→11-bit boundaries and to force a
  * mid-stream Clear code.
  */
class LzwSpec extends AnyFunSuite {

  /** Canonical TIFF LZW encoder (test-only). */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val Clear = 256; val Eoi = 257
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0L; var nbits = 0
    def put(code: Int, width: Int): Unit = {
      cur = (cur << width) | code; nbits += width
      while (nbits >= 8) {
        out.write(((cur >> (nbits - 8)) & 0xFF).toInt); nbits -= 8
      }
    }
    def flush(): Unit = if (nbits > 0) {
      out.write(((cur << (8 - nbits)) & 0xFF).toInt); nbits = 0
    }
    var table = scala.collection.mutable.Map[Seq[Byte], Int]()
    var free = 258; var width = 9
    def maxcode = (1 << width) - 2 // early change
    def reset(): Unit = { table.clear(); free = 258; width = 9 }
    put(Clear, width)
    var prefix = Seq.empty[Byte]
    data.foreach { b =>
      val next = prefix :+ b
      if (prefix.isEmpty || table.contains(next)) prefix = next
      else {
        put(if (prefix.length == 1) prefix.head & 0xFF else table(prefix), width)
        table(next) = free; free += 1
        if (free > maxcode + 1) width += 1
        if (free >= 4094) { put(Clear, width); reset() }
        prefix = Seq(b)
      }
    }
    if (prefix.nonEmpty)
      put(if (prefix.length == 1) prefix.head & 0xFF else table(prefix), width)
    put(Eoi, width)
    flush()
    out.toByteArray
  }

  private def roundTrip(data: Array[Byte]): Unit = {
    val enc = lzwEncode(data)
    assert(enc.length < data.length || data.length < 64) // it does compress
    val dec = CogReader.lzwDecode(enc, 0, enc.length, data.length)
    assert(dec.toSeq === data.toSeq)
  }

  test("short repetitive run (single width)") {
    roundTrip("abababababababab".getBytes)
  }

  test("KwKwK pattern") {
    roundTrip(Array.fill(64)(Array[Byte](7, 7)).flatten)
  }

  test("crosses the 9-to-10-bit early-change boundary") {
    // varied pairs generate one new table entry each: >300 entries
    val data = (0 until 1200).map(i => ((i * 37 + i / 7) % 251).toByte).toArray
    roundTrip(data)
  }

  test("crosses into 11 bits and a mid-stream clear") {
    val data = (0 until 20000).map(i => ((i * 131 + i / 3) % 253).toByte).toArray
    roundTrip(data)
  }
}
