package graft.source

import java.nio.{ByteBuffer, ByteOrder}

/** Blosc chunk codec, pure JVM — the DEFAULT compressor of zarr-python
  * v2 stores (numcodecs `Blosc(cname='lz4', clevel=5, shuffle=SHUFFLE)`),
  * previously rejected. Implemented from the public c-blosc 1.x chunk
  * format (README_CHUNK_FORMAT.rst): 16-byte header, per-block start
  * offsets, each block one or more int32-length-prefixed compressed
  * streams, byte-shuffle applied blockwise.
  *
  * Supported: inner codecs lz4 (via the lz4-java Spark ships), zlib,
  * zstd and snappy (via the snappy-java Spark ships); byte-shuffle AND
  * bit-shuffle (the fixed bitshuffle transform — byte-transpose, 8×8
  * bit-transpose per 64-bit word, bit-row regroup — applied blockwise
  * over the largest multiple of 8 elements, trailing bytes verbatim,
  * exactly c-blosc's `bitshuffle()`); the memcpy fallback; raw
  * (incompressible) streams; split blocks (c-blosc's forward-compat
  * rule: lz4/blosclz, typesize ≤ 16, blocksize/typesize ≥ 128, never
  * the leftover block); and the blosclz inner codec via [[BloscLz]]
  * (hand-pinned FastLZ-style token stream — see its parity caveat).
  */
object Blosc {

  private val CodecBloscLz = 0
  private val CodecLz4 = 1
  private val CodecSnappy = 2
  private val CodecZlib = 3
  private val CodecZstd = 4

  private val MaxSplits = 16
  private val MinBufferSize = 128

  private def lz4 = net.jpountz.lz4.LZ4Factory.safeInstance()

  private def splits(codec: Int, typesize: Int, blocksize: Int,
                     leftover: Boolean): Int =
    if ((codec == CodecBloscLz || codec == CodecLz4) && typesize > 1 &&
        typesize <= MaxSplits && blocksize / typesize >= MinBufferSize &&
        !leftover) typesize
    else 1

  def decompress(chunk: Array[Byte]): Array[Byte] = {
    require(chunk.length >= 16, s"blosc chunk of ${chunk.length} bytes")
    val bb = ByteBuffer.wrap(chunk).order(ByteOrder.LITTLE_ENDIAN)
    bb.get(); bb.get() // version, versionlz
    val flags = bb.get() & 0xFF
    val typesize = bb.get() & 0xFF
    val nbytes = bb.getInt()
    val blocksize = bb.getInt()
    val cbytes = bb.getInt()
    require(cbytes == chunk.length,
      s"blosc cbytes $cbytes != chunk length ${chunk.length}")
    val shuffled = (flags & 0x1) != 0
    val bitShuffled = (flags & 0x4) != 0
    require(!(shuffled && bitShuffled),
      "blosc chunk flags byte- AND bit-shuffle simultaneously")
    val out = new Array[Byte](nbytes)
    if ((flags & 0x2) != 0) { // pure memcpy of the ORIGINAL buffer
      System.arraycopy(chunk, 16, out, 0, nbytes)
      return out
    }
    val codec = (flags >> 5) & 0x7
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val bstarts = (0 until nblocks).map(_ => bb.getInt())
    var i = 0
    while (i < nblocks) {
      val bsize = math.min(blocksize, nbytes - i * blocksize)
      val leftover = bsize != blocksize
      val ns = splits(codec, typesize, blocksize, leftover)
      val block = new Array[Byte](bsize)
      var pos = bstarts(i)
      var boff = 0
      val per = bsize / ns
      var s = 0
      while (s < ns) {
        val streamLen = if (s == ns - 1) bsize - per * (ns - 1) else per
        val cb = ByteBuffer.wrap(chunk, pos, 4)
          .order(ByteOrder.LITTLE_ENDIAN).getInt()
        pos += 4
        if (cb == streamLen) // stored raw: compression did not gain
          System.arraycopy(chunk, pos, block, boff, streamLen)
        else codec match {
          case CodecBloscLz =>
            BloscLz.decompress(chunk, pos, cb, block, boff, streamLen)
          case CodecLz4 =>
            lz4.safeDecompressor()
              .decompress(chunk, pos, cb, block, boff, streamLen)
          case CodecZlib =>
            val inf = new java.util.zip.Inflater()
            inf.setInput(chunk, pos, cb)
            var o = boff
            var stalled = false
            while (o < boff + streamLen && !inf.finished() && !stalled) {
              val n = inf.inflate(block, o, boff + streamLen - o)
              if (n == 0 && inf.needsInput()) stalled = true else o += n
            }
            inf.end()
            require(o == boff + streamLen, "short zlib stream in blosc block")
          case CodecZstd =>
            com.github.luben.zstd.Zstd.decompressByteArray(
              block, boff, streamLen, chunk, pos, cb)
          case CodecSnappy =>
            val n = org.xerial.snappy.Snappy.uncompress(
              chunk, pos, cb, block, boff)
            require(n == streamLen,
              s"snappy stream of $n bytes, $streamLen expected")
          case other =>
            throw new IllegalArgumentException(s"blosc codec $other")
        }
        pos += cb
        boff += streamLen
        s += 1
      }
      val plain =
        if (shuffled && typesize > 1) unshuffle(block, typesize)
        else if (bitShuffled) bitUnshuffle(block, typesize)
        else block
      System.arraycopy(plain, 0, out, i * blocksize, bsize)
      i += 1
    }
    out
  }

  /** Compress with the same conventions [[decompress]] assumes — the
    * fixture/write side (cname: "lz4", "zlib" or "zstd").
    */
  def compress(data: Array[Byte], typesize: Int, cname: String = "lz4",
               level: Int = 5, shuffle: Boolean = true,
               blockSizeHint: Int = 65536,
               bitShuffle: Boolean = false): Array[Byte] = {
    val codec = cname match {
      case "blosclz" => CodecBloscLz
      case "lz4" => CodecLz4
      case "zlib" => CodecZlib
      case "zstd" => CodecZstd
      case "snappy" => CodecSnappy
      case other => throw new IllegalArgumentException(s"blosc cname $other")
    }
    require(!(shuffle && bitShuffle), "byte- and bit-shuffle are exclusive")
    val ts = math.max(1, typesize)
    // block size: a multiple of typesize, capped by the hint and nbytes
    val blocksize = {
      val b = math.min(math.max(blockSizeHint / ts * ts, ts),
        math.max(data.length, ts))
      if (b % ts == 0) b else b / ts * ts
    }
    val nblocks = math.max(1, (data.length + blocksize - 1) / blocksize)
    val bodies = Array.newBuilder[Array[Byte]]
    val bstarts = new Array[Int](nblocks)
    var cursorAt = 16 + 4 * nblocks
    var i = 0
    while (i < nblocks) {
      val bsize = math.min(blocksize, data.length - i * blocksize)
      val leftover = bsize != blocksize
      val raw = new Array[Byte](bsize)
      System.arraycopy(data, i * blocksize, raw, 0, bsize)
      val block =
        if (shuffle && ts > 1) shuffleBytes(raw, ts)
        else if (bitShuffle) bitShuffleBytes(raw, ts)
        else raw
      val ns = splits(codec, ts, blocksize, leftover)
      val per = bsize / ns
      val body = new java.io.ByteArrayOutputStream()
      var s = 0
      while (s < ns) {
        val streamLen = if (s == ns - 1) bsize - per * (ns - 1) else per
        val comp = codec match {
          case CodecLz4 =>
            val c = lz4.fastCompressor()
            val dst = new Array[Byte](c.maxCompressedLength(streamLen))
            val n = c.compress(block, s * per, streamLen, dst, 0, dst.length)
            java.util.Arrays.copyOf(dst, n)
          case CodecZlib =>
            val d = new java.util.zip.Deflater(level)
            d.setInput(block, s * per, streamLen); d.finish()
            val bos = new java.io.ByteArrayOutputStream()
            val tmp = new Array[Byte](8192)
            while (!d.finished()) bos.write(tmp, 0, d.deflate(tmp))
            d.end()
            bos.toByteArray
          case CodecZstd =>
            val src = java.util.Arrays.copyOfRange(block, s * per,
              s * per + streamLen)
            com.github.luben.zstd.Zstd.compress(src, level)
          case CodecBloscLz =>
            BloscLz.compress(block, s * per, streamLen)
          case CodecSnappy =>
            val dst = new Array[Byte](
              org.xerial.snappy.Snappy.maxCompressedLength(streamLen))
            val n = org.xerial.snappy.Snappy.rawCompress(
              block, s * per, streamLen, dst, 0)
            java.util.Arrays.copyOf(dst, n)
        }
        val (len, payload) =
          if (comp.length >= streamLen) // store raw: decoder keys off cb==len
            (streamLen, java.util.Arrays.copyOfRange(block, s * per,
              s * per + streamLen))
          else (comp.length, comp)
        val lb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        lb.putInt(len)
        body.write(lb.array()); body.write(payload)
        s += 1
      }
      bstarts(i) = cursorAt
      val bodyBytes = body.toByteArray
      bodies += bodyBytes
      cursorAt += bodyBytes.length
      i += 1
    }
    val total = cursorAt
    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    out.put(2.toByte) // format version
    out.put(1.toByte) // codec format version
    out.put((((codec << 5) | (if (shuffle && ts > 1) 1 else 0) |
      (if (bitShuffle) 4 else 0)) & 0xFF).toByte)
    out.put(ts.toByte)
    out.putInt(data.length)
    out.putInt(blocksize)
    out.putInt(total)
    bstarts.foreach(out.putInt)
    bodies.result().foreach(out.put)
    out.array()
  }

  private def shuffleBytes(data: Array[Byte], elem: Int): Array[Byte] = {
    val n = data.length / elem
    val out = new Array[Byte](data.length)
    var j = 0
    while (j < elem) {
      var i = 0
      while (i < n) { out(j * n + i) = data(i * elem + j); i += 1 }
      j += 1
    }
    var t = n * elem
    while (t < data.length) { out(t) = data(t); t += 1 }
    out
  }

  private def bitShuffleBytes(data: Array[Byte], elem: Int): Array[Byte] =
    BitShuffle.forward(data, elem)

  private def bitUnshuffle(data: Array[Byte], elem: Int): Array[Byte] =
    BitShuffle.reverse(data, elem)

  private def unshuffle(data: Array[Byte], elem: Int): Array[Byte] = {
    val n = data.length / elem
    val out = new Array[Byte](data.length)
    var j = 0
    while (j < elem) {
      var i = 0
      while (i < n) { out(i * elem + j) = data(j * n + i); i += 1 }
      j += 1
    }
    var t = n * elem
    while (t < data.length) { out(t) = data(t); t += 1 }
    out
  }
}

/** The bitshuffle transform (Masui's bitshuffle library) — shared by
  * blosc chunks (flag 0x4) and the HDF5 registered filter 32008: for n
  * elements of `elem` bytes (n rounded down to a multiple of 8; the
  * remainder is copied verbatim), output bit-plane (j, kk) at offset
  * (j*8 + kk) * n/8 holds bit kk (LSB-first) of byte j of every
  * element, element i landing in byte i/8 at bit i%8. This is the
  * composition of bitshuffle's three scalar passes (byte-transpose,
  * TRANS_BIT_8X8 per little-endian 64-bit word, bit-row regroup)
  * collapsed into its net layout.
  */
object BitShuffle {

  def forward(data: Array[Byte], elem: Int): Array[Byte] = {
    val n = (data.length / elem) & ~7
    val nbr = n / 8
    val out = new Array[Byte](data.length)
    var j = 0
    while (j < elem) {
      var kk = 0
      while (kk < 8) {
        val base = (j * 8 + kk) * nbr
        var m = 0
        while (m < nbr) {
          var b = 0
          var r = 0
          while (r < 8) {
            if ((data((8 * m + r) * elem + j) & (1 << kk)) != 0) b |= 1 << r
            r += 1
          }
          out(base + m) = b.toByte
          m += 1
        }
        kk += 1
      }
      j += 1
    }
    var t = n * elem
    while (t < data.length) { out(t) = data(t); t += 1 }
    out
  }

  def reverse(data: Array[Byte], elem: Int): Array[Byte] = {
    val n = (data.length / elem) & ~7
    val nbr = n / 8
    val out = new Array[Byte](data.length)
    var j = 0
    while (j < elem) {
      var kk = 0
      while (kk < 8) {
        val base = (j * 8 + kk) * nbr
        val mask = 1 << kk
        var m = 0
        while (m < nbr) {
          val b = data(base + m) & 0xFF
          if (b != 0) {
            var r = 0
            while (r < 8) {
              if ((b & (1 << r)) != 0) {
                val at = (8 * m + r) * elem + j
                out(at) = (out(at) | mask).toByte
              }
              r += 1
            }
          }
          m += 1
        }
        kk += 1
      }
      j += 1
    }
    var t = n * elem
    while (t < data.length) { out(t) = data(t); t += 1 }
    out
  }
}
