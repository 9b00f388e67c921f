package graft.source

import java.nio.{ByteBuffer, ByteOrder}

/** The dynamically-registered HDF5 filters modern archives carry via
  * `hdf5plugin` (h5py) / `HDF5_PLUGIN_PATH` — stream formats from the
  * filters' public reference sources:
  *
  *  - 32004 lz4 (HDF5Plugin-LZ4 `H5Zlz4.c`): 8-byte big-endian total
  *    decompressed size, 4-byte big-endian block size, then per block a
  *    4-byte big-endian compressed length + an lz4 block — a block whose
  *    compressed length equals its decompressed length is stored raw.
  *  - 32008 bitshuffle (`bshuf_h5filter.c` / `bitshuffle_core.c`):
  *    cd_values = [major, minor, elem_size, block_size_in_elems,
  *    compression]. With compression=2 (lz4): 8-byte BE total size +
  *    4-byte BE block size IN BYTES, then per block a 4-byte BE lz4
  *    length + lz4 data of one BIT-SHUFFLED block; blocks cover
  *    `block` elements (a multiple of 8), then one short block of the
  *    remaining elements rounded down to a multiple of 8, then the
  *    last `size % 8` elements RAW (uncompressed, unshuffled). With
  *    compression=0 the stream is just the blocked shuffle, no
  *    headers; the block size then comes from cd_values[3], falling
  *    back to the library default 8192/elem floored to a multiple of
  *    8 and no smaller than 128.
  *  - 32015 zstd: one plain zstd frame.
  *
  * Encoders exist for the writer/fixture side so specs can pin the
  * reader against independently-constructed streams.
  */
object H5Filters {

  private def lz4 = net.jpountz.lz4.LZ4Factory.safeInstance()

  // ---- 32004 ---------------------------------------------------------

  def lz4Decode(data: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.wrap(data).order(ByteOrder.BIG_ENDIAN)
    val total = b.getLong()
    require(total >= 0 && total <= Int.MaxValue, s"lz4 filter size $total")
    val blockSize = b.getInt()
    require(blockSize > 0, s"lz4 filter block size $blockSize")
    val out = new Array[Byte](total.toInt)
    var off = 0
    var pos = 12
    while (off < total) {
      val thisBlock = math.min(blockSize.toLong, total - off).toInt
      val cb = ByteBuffer.wrap(data, pos, 4).order(ByteOrder.BIG_ENDIAN).getInt()
      pos += 4
      if (cb == thisBlock) System.arraycopy(data, pos, out, off, thisBlock)
      else lz4.safeDecompressor().decompress(data, pos, cb, out, off, thisBlock)
      pos += cb
      off += thisBlock
    }
    out
  }

  def lz4Encode(data: Array[Byte], blockSize: Int = 65536): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val hdr = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
    hdr.putLong(data.length.toLong); hdr.putInt(blockSize)
    out.write(hdr.array())
    var off = 0
    while (off < data.length) {
      val thisBlock = math.min(blockSize, data.length - off)
      val c = lz4.fastCompressor()
      val dst = new Array[Byte](c.maxCompressedLength(thisBlock))
      val n = c.compress(data, off, thisBlock, dst, 0, dst.length)
      val (len, payload, payLen) =
        if (n >= thisBlock) (thisBlock, data, -1) else (n, dst, n)
      val lb = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
      lb.putInt(len)
      out.write(lb.array())
      if (payLen < 0) out.write(data, off, thisBlock) else out.write(dst, 0, n)
      off += thisBlock
    }
    out.toByteArray
  }

  // ---- 32008 ---------------------------------------------------------

  /** bitshuffle's `bshuf_default_block_size(elem)`. */
  def bshufDefaultBlockElems(elem: Int): Int = {
    val b = (8192 / elem) / 8 * 8
    math.max(b, 128)
  }

  def bitshuffleDecode(data: Array[Byte], cd: Seq[Int],
                       elemFallback: Int): Array[Byte] = {
    val elem = cd.lift(2).filter(_ > 0).getOrElse(elemFallback)
    val compression = cd.lift(4).getOrElse(0)
    compression match {
      case 2 | 3 => // per-block lz4 (2) or zstd (3), same framing
        val b = ByteBuffer.wrap(data).order(ByteOrder.BIG_ENDIAN)
        val total = b.getLong()
        require(total >= 0 && total <= Int.MaxValue && total % elem == 0,
          s"bitshuffle filter size $total (elem $elem)")
        val blockBytes = b.getInt()
        require(blockBytes > 0 && blockBytes % (8 * elem) == 0,
          s"bitshuffle block of $blockBytes bytes not 8*$elem-aligned")
        val out = new Array[Byte](total.toInt)
        val size = total.toInt / elem
        val blockElems = blockBytes / elem
        var pos = 12
        var off = 0 // elements written
        def takeBlock(nElems: Int): Unit = {
          val nBytes = nElems * elem
          val cb = ByteBuffer.wrap(data, pos, 4)
            .order(ByteOrder.BIG_ENDIAN).getInt()
          pos += 4
          val block = new Array[Byte](nBytes)
          if (compression == 2)
            lz4.safeDecompressor().decompress(data, pos, cb, block, 0, nBytes)
          else {
            val n = com.github.luben.zstd.Zstd.decompressByteArray(
              block, 0, nBytes,
              data, pos, cb)
            require(n == nBytes, s"bitshuffle zstd block: $n of $nBytes bytes")
          }
          pos += cb
          System.arraycopy(BitShuffle.reverse(block, elem), 0,
            out, off * elem, nBytes)
          off += nElems
        }
        while (size - off >= blockElems) takeBlock(blockElems)
        val shortBlock = (size - off) / 8 * 8
        if (shortBlock > 0) takeBlock(shortBlock)
        val leftover = (size - off) * elem
        if (leftover > 0)
          System.arraycopy(data, pos, out, off * elem, leftover)
        out
      case 0 =>
        val blockElems =
          cd.lift(3).filter(_ > 0).getOrElse(bshufDefaultBlockElems(elem))
        require(blockElems % 8 == 0,
          s"bitshuffle block of $blockElems elems not a multiple of 8")
        blockedBitshuffle(data, elem, blockElems, forward = false)
      case other => throw new IllegalArgumentException(
        s"bitshuffle filter compression $other unsupported (none/lz4/zstd)")
    }
  }

  /** The blocked transform shared by plain mode and the per-block lz4
    * mode's encoder: full blocks of `blockElems`, one short block of
    * the remainder floored to a multiple of 8, final `size % 8`
    * elements verbatim.
    */
  private def blockedBitshuffle(data: Array[Byte], elem: Int,
                                blockElems: Int,
                                forward: Boolean): Array[Byte] = {
    require(data.length % elem == 0,
      s"bitshuffle payload ${data.length} not element-aligned ($elem)")
    val size = data.length / elem
    val out = new Array[Byte](data.length)
    var off = 0
    def one(nElems: Int): Unit = {
      val nBytes = nElems * elem
      val block = java.util.Arrays.copyOfRange(data, off * elem,
        off * elem + nBytes)
      val t = if (forward) BitShuffle.forward(block, elem)
              else BitShuffle.reverse(block, elem)
      System.arraycopy(t, 0, out, off * elem, nBytes)
      off += nElems
    }
    while (size - off >= blockElems) one(blockElems)
    val shortBlock = (size - off) / 8 * 8
    if (shortBlock > 0) one(shortBlock)
    val leftover = (size - off) * elem
    if (leftover > 0)
      System.arraycopy(data, off * elem, out, off * elem, leftover)
    out
  }

  def bitshuffleEncode(data: Array[Byte], elem: Int,
                       blockElems0: Int = 0,
                       withLz4: Boolean = true,
                       zstd: Boolean = false): Array[Byte] = {
    val blockElems =
      if (blockElems0 > 0) blockElems0 else bshufDefaultBlockElems(elem)
    require(blockElems % 8 == 0, s"block of $blockElems elems")
    if (!withLz4 && !zstd) return blockedBitshuffle(data, elem, blockElems,
      forward = true)
    require(data.length % elem == 0,
      s"bitshuffle payload ${data.length} not element-aligned ($elem)")
    val size = data.length / elem
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val hdr = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
    hdr.putLong(data.length.toLong); hdr.putInt(blockElems * elem)
    out.write(hdr.array())
    var off = 0
    def one(nElems: Int): Unit = {
      val nBytes = nElems * elem
      val block = BitShuffle.forward(java.util.Arrays.copyOfRange(
        data, off * elem, off * elem + nBytes), elem)
      val (dst, n) =
        if (zstd) {
          val z = com.github.luben.zstd.Zstd.compress(block, 3)
          (z, z.length)
        } else {
          val c = lz4.fastCompressor()
          val d = new Array[Byte](c.maxCompressedLength(nBytes))
          (d, c.compress(block, 0, nBytes, d, 0, d.length))
        }
      val lb = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
      lb.putInt(n)
      out.write(lb.array()); out.write(dst, 0, n)
      off += nElems
    }
    while (size - off >= blockElems) one(blockElems)
    val shortBlock = (size - off) / 8 * 8
    if (shortBlock > 0) one(shortBlock)
    val leftover = (size - off) * elem
    if (leftover > 0) out.write(data, off * elem, leftover)
    out.toByteArray
  }

  // ---- 32015 ---------------------------------------------------------

  def zstdDecode(data: Array[Byte]): Array[Byte] = {
    val size = com.github.luben.zstd.Zstd.getFrameContentSize(data)
    if (size > 0 && size <= Int.MaxValue)
      com.github.luben.zstd.Zstd.decompress(data, size.toInt)
    else { // content size absent from the frame header: stream-decode
      val in = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(data))
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val tmp = new Array[Byte](65536)
      var n = in.read(tmp)
      while (n >= 0) { out.write(tmp, 0, n); n = in.read(tmp) }
      in.close()
      out.toByteArray
    }
  }

  def zstdEncode(data: Array[Byte], level: Int = 3): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(data, level)

  // ---- scale-offset (filter 6, H5Z_FILTER_SCALEOFFSET): packed-integer
  // climate data. Stream = 4-byte LE minbits, 1 byte recording the
  // writer's sizeof(unsigned long long), minval in that many LE bytes,
  // then each element as `minbits` bits MSB-first in one continuous
  // bitstream (output bytes little-endian, low `minbits` significant).
  // cd_values (H5Zscaleoffset.c set_local): [scale_type, scale_factor,
  // chunk nelmts, dtype class, dtype size, sign, byte order,
  // fill_defined, fill value bytes LE packed 4-per-word from index 8].
  // With a defined fill, the all-ones code marks fill cells; otherwise
  // value = code + minval (modular in the dtype width).

  private val SoFillDefined = 1

  def scaleOffsetDecode(data: Array[Byte], cd: Seq[Int]): Array[Byte] = {
    require(cd.length >= 8, s"scale-offset cd_values ${cd.length} < 8")
    val nelmts = cd(2)
    val cls = cd(3)
    val size = cd(4)
    val order = cd(6)
    val filavail = cd(7)
    require(cls == 0, // H5T_INTEGER
      "scale-offset float D/E-scale unsupported (integer scale only); " +
        "re-write the archive unpacked or with deflate")
    require(order == 0, "scale-offset over big-endian data unsupported")
    require(size >= 1 && size <= 8, s"scale-offset dtype size $size")
    var minbits = 0L
    (0 until 4).foreach(i => minbits |= (data(i).toLong & 0xFF) << (8 * i))
    val mvSize = math.min(8, data(4) & 0xFF)
    var minval = 0L
    (0 until mvSize).foreach(i =>
      minval |= (data(5 + i).toLong & 0xFF) << (8 * i))
    val payload = 5 + (data(4) & 0xFF)
    require(minbits >= 0 && minbits <= size * 8L,
      s"scale-offset minbits $minbits over $size-byte data")
    val out = new Array[Byte](nelmts * size)
    if (minbits == size * 8L) {
      System.arraycopy(data, payload, out, 0, out.length)
      return out
    }
    val filval =
      if (filavail == SoFillDefined)
        (0 until size).map(i =>
          ((cd(8 + i / 4).toLong >> (8 * (i % 4))) & 0xFF) << (8 * i)).sum
      else 0L
    val fillCode = if (minbits >= 64) -1L else (1L << minbits) - 1
    var bitPos = 0L
    def nextCode(): Long = { // minbits bits, MSB-first
      var v = 0L
      var got = 0
      while (got < minbits) {
        val byteAt = (bitPos >> 3).toInt
        val used = (bitPos & 7).toInt
        val avail = 8 - used
        val take = math.min(avail, (minbits - got).toInt)
        val bits = ((data(payload + byteAt) & 0xFF) >> (avail - take)) &
          ((1 << take) - 1)
        v = (v << take) | bits
        got += take
        bitPos += take
      }
      v
    }
    var i = 0
    while (i < nelmts) {
      val code = if (minbits == 0) 0L else nextCode()
      val value =
        if (filavail == SoFillDefined && minbits > 0 && code == fillCode)
          filval
        else code + minval // modular: only the low size*8 bits are kept
      var k = 0
      while (k < size) {
        out(i * size + k) = ((value >> (8 * k)) & 0xFF).toByte
        k += 1
      }
      i += 1
    }
    out
  }

  /** Encoder twin for round-trip fixtures: integer LE input, optional
    * defined fill value (mapped to the reserved all-ones code, exactly
    * the library's convention). Returns (stream, cd_values).
    */
  def scaleOffsetEncode(data: Array[Byte], size: Int,
                        fill: Option[Long] = None): (Array[Byte], Seq[Int]) = {
    require(data.length % size == 0, s"${data.length} % $size != 0")
    val n = data.length / size
    def at(i: Int): Long = {
      var v = 0L
      (0 until size).foreach(k => v |= (data(i * size + k).toLong & 0xFF) << (8 * k))
      v
    }
    val vals = (0 until n).map(at)
    val real = vals.filterNot(v => fill.exists(f => maskTo(f, size) == v))
    val minval = if (real.isEmpty) 0L else real.min
    val span = if (real.isEmpty) 0L else real.max - minval
    // enough bits for every offset code; with a defined fill the
    // all-ones code must stay distinct from real offsets
    var minbits = 0
    while (minbits < size * 8 &&
           ((1L << minbits) <= span ||
            (fill.isDefined && (1L << minbits) - 1 <= span))) minbits += 1
    if (fill.isDefined && minbits == 0) minbits = 1
    if (minbits > size * 8) minbits = size * 8
    val header = new Array[Byte](13)
    (0 until 4).foreach(i => header(i) = ((minbits >> (8 * i)) & 0xFF).toByte)
    header(4) = 8
    (0 until 8).foreach(i => header(5 + i) = ((minval >> (8 * i)) & 0xFF).toByte)
    val body =
      if (minbits == size * 8) data.clone()
      else if (minbits == 0) Array.empty[Byte]
      else {
        val out = new Array[Byte]((n.toLong * minbits / 8 + 1).toInt)
        var bitPos = 0L
        def put(code: Long): Unit = {
          var left = minbits
          while (left > 0) {
            val byteAt = (bitPos >> 3).toInt
            val used = (bitPos & 7).toInt
            val avail = 8 - used
            val take = math.min(avail, left)
            val bits = (code >> (left - take)) & ((1L << take) - 1)
            out(byteAt) = (out(byteAt) | (bits << (avail - take))).toByte
            left -= take
            bitPos += take
          }
        }
        if (minbits > 0) vals.foreach { v =>
          if (fill.exists(f => maskTo(f, size) == v)) put((1L << minbits) - 1)
          else put(v - minval)
        }
        out
      }
    val cdFill = fill.map { f =>
      (0 until (size + 3) / 4).map { w =>
        var cv = 0L
        (0 until 4).foreach { b =>
          val i = w * 4 + b
          if (i < size) cv |= ((f >> (8 * i)) & 0xFF) << (8 * b)
        }
        cv.toInt
      }
    }.getOrElse(Seq.fill((size + 3) / 4)(0))
    val cd = Seq(2 /* H5Z_SO_INT */, 0, n, 0 /* H5T_INTEGER */, size,
      1 /* signed */, 0 /* LE */,
      if (fill.isDefined) SoFillDefined else 0) ++ cdFill
    (header ++ body, cd)
  }

  private def maskTo(v: Long, size: Int): Long =
    if (size >= 8) v else v & ((1L << (8 * size)) - 1)

  // ---- nbit (filter 5, H5Z_FILTER_NBIT): elements whose datatype
  // carries H5Tset_precision < width are packed as `precision` bits
  // each, MSB-first in one continuous bitstream (the same bit order as
  // scale-offset; padding bits are NOT stored and come back zero).
  // cd_values (H5Znbit.c set_local): [total nparms, needs-compression
  // flag, chunk nelmts, then the datatype parms tree — for an ATOMIC
  // (class 1) type: size, byte order, precision, bit offset]. Compound
  // and array parms trees are out of scope (reject loudly).

  def nbitDecode(data: Array[Byte], cd: Seq[Int]): Array[Byte] = {
    require(cd.length >= 3, s"nbit cd_values ${cd.length} < 3")
    val flag = cd(1)
    val nelmts = cd(2)
    if (flag == 0) return data.clone() // full-precision: stored verbatim
    require(cd.length >= 8, s"nbit cd_values ${cd.length} < 8")
    require(cd(3) == 1,
      s"nbit datatype class ${cd(3)} unsupported (atomic only; " +
        "compound/array nbit trees not implemented)")
    val size = cd(4)
    val order = cd(5)
    val prec = cd(6)
    val off = cd(7)
    require(order == 0, "nbit over big-endian data unsupported")
    require(off == 0, s"nbit bit offset $off unsupported")
    require(prec >= 1 && prec <= size * 8, s"nbit precision $prec")
    val out = new Array[Byte](nelmts * size)
    if (prec == size * 8) {
      System.arraycopy(data, 0, out, 0, out.length)
      return out
    }
    var bitPos = 0L
    var i = 0
    while (i < nelmts) {
      var v = 0L
      var got = 0
      while (got < prec) {
        val byteAt = (bitPos >> 3).toInt
        val used = (bitPos & 7).toInt
        val avail = 8 - used
        val take = math.min(avail, prec - got)
        val bits = ((data(byteAt) & 0xFF) >> (avail - take)) &
          ((1 << take) - 1)
        v = (v << take) | bits
        got += take
        bitPos += take
      }
      var k = 0
      while (k < size) {
        out(i * size + k) = ((v >> (8 * k)) & 0xFF).toByte
        k += 1
      }
      i += 1
    }
    out
  }

  /** Encoder twin for fixtures: pack the low `prec` bits of each LE
    * element. Returns (stream, cd_values).
    */
  def nbitEncode(data: Array[Byte], size: Int, prec: Int)
      : (Array[Byte], Seq[Int]) = {
    require(data.length % size == 0 && prec >= 1 && prec <= size * 8)
    val n = data.length / size
    val cd = Seq(8, if (prec == size * 8) 0 else 1, n, 1, size, 0, prec, 0)
    if (prec == size * 8) return (data.clone(), cd)
    val out = new Array[Byte](((n.toLong * prec + 7) / 8).toInt)
    var bitPos = 0L
    (0 until n).foreach { i =>
      var v = 0L
      (0 until size).foreach(k =>
        v |= (data(i * size + k).toLong & 0xFF) << (8 * k))
      v &= (if (prec == 64) -1L else (1L << prec) - 1)
      var left = prec
      while (left > 0) {
        val byteAt = (bitPos >> 3).toInt
        val used = (bitPos & 7).toInt
        val avail = 8 - used
        val take = math.min(avail, left)
        val bits = (v >> (left - take)) & ((1L << take) - 1)
        out(byteAt) = (out(byteAt) | (bits << (avail - take))).toByte
        left -= take
        bitPos += take
      }
    }
    (out, cd)
  }

  /** HDF5's Fletcher-32 (H5_checksum_fletcher32): big-endian 16-bit
    * word sums folded every 360 words, odd trailing byte high-aligned,
    * double-reduced to 16 bits each.
    */
  def fletcher32(data: Array[Byte], len: Int): Int = {
    var sum1 = 0L
    var sum2 = 0L
    var pos = 0
    var words = len / 2
    while (words > 0) {
      var tlen = math.min(words, 360)
      words -= tlen
      while (tlen > 0) {
        sum1 += (((data(pos) & 0xFF) << 8) | (data(pos + 1) & 0xFF)).toLong
        pos += 2
        sum2 += sum1
        tlen -= 1
      }
      sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
      sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    }
    if (len % 2 == 1) {
      sum1 += ((data(pos) & 0xFF) << 8).toLong
      sum2 += sum1
      sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
      sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    }
    sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
    sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    ((sum2 << 16) | sum1).toInt
  }

  // ---- szip (filter 4, H5Zszip.c over the CCSDS extended-Rice coder):
  // cd_values = [options_mask, bits_per_pixel, pixels_per_block,
  // pixels_per_scanline]; the filter payload is a 4-byte LITTLE-endian
  // uncompressed byte count followed by a raw (headerless) CCSDS
  // stream. HDF5 always compresses in szip's "raw" mode
  // (SZ_RAW_OPTION_MASK 128); NN (32) selects the unit-delay
  // preprocessor, EC (4) entropy-only; LSB (8) / MSB (16) is the
  // sample byte order of the DECODED chunk (H5Zszip sets it from the
  // datatype's endianness). A scanline is one reference-sample
  // interval, byte-aligned in the stream (the original szip coded
  // scanlines independently — libaec's SZ-compatibility AEC_PAD_RSI).

  private final val SzMaskEc = 4
  private final val SzMaskLsb = 8
  private final val SzMaskNn = 32
  private final val SzMaskRaw = 128

  /** Byte-plane transpose of the 32/64-bit BYTE-STREAM mode (libaec
    * `sz_compat.c` `interleave_buffer`, the szip-compatibility layout
    * HDF5 ships today): szip does not Rice-code 32/64-bit samples
    * directly — it splits each word into its byte planes (all byte-0s,
    * then all byte-1s, ...) and codes the result as 8-bit samples, a
    * shuffle that groups bytes of similar entropy exactly like the
    * HDF5 shuffle filter. `forward` = interleave (encode side).
    *
    * Honest validation status: the 8-bit Rice layer underneath is
    * pinned by CcsdsSpec's external vectors, but THIS framing choice
    * (byte-plane interleave; ppb/pps applied to the byte stream as-is)
    * is validated by round-trip + crafted-file tests only — no
    * externally-produced szip-32 chunk exists in this environment. If
    * the convention were mis-remembered, a real NASA EOS szip-32 chunk
    * would decode to garbage or a framing error while every shipped
    * test passes. Residual risk is one layout convention (not a whole
    * container, which is why this shipped while LERC did not); the
    * closing fixture is any real szip-32 HDF5 chunk.
    */
  private def byteStreamTranspose(data: Array[Byte], wordSize: Int,
                                  forward: Boolean): Array[Byte] = {
    require(data.length % wordSize == 0,
      s"szip byte-stream payload ${data.length} not a whole number of " +
        s"$wordSize-byte words")
    val nWords = data.length / wordSize
    val out = new Array[Byte](data.length)
    var i = 0
    while (i < nWords) {
      var j = 0
      while (j < wordSize) {
        if (forward) out(j * nWords + i) = data(i * wordSize + j)
        else out(i * wordSize + j) = data(j * nWords + i)
        j += 1
      }
      i += 1
    }
    out
  }

  def szipDecode(data: Array[Byte], cd: Seq[Int]): Array[Byte] = {
    require(cd.length >= 4, s"szip cd_values ${cd.length} < 4")
    val (mask, bits, ppb, pps) = (cd(0), cd(1), cd(2), cd(3))
    require((mask & SzMaskRaw) != 0,
      "szip stream with an szip file header (no SZ_RAW_OPTION) " +
        "unsupported — HDF5's filter always writes raw mode")
    require(bits == 8 || bits == 16 || bits == 24 || bits == 32 ||
      bits == 64,
      s"szip bits-per-pixel $bits unsupported (8/16/24 direct, 32/64 " +
        "byte-stream; re-write with deflate or zstd, e.g. " +
        "h5repack -f GZIP=9, and re-scan)")
    require(ppb >= 2 && pps >= ppb && pps % ppb == 0,
      s"szip scanline $pps not a whole number of $ppb-pixel blocks " +
        "unsupported (partial-block scanline padding); re-write with " +
        "deflate — h5repack -f GZIP=9 — and re-scan")
    require(data.length >= 4, s"szip payload of ${data.length} bytes")
    val stored = ((data(0) & 0xFF) | ((data(1) & 0xFF) << 8) |
      ((data(2) & 0xFF) << 16) | ((data(3) & 0xFF).toLong << 24)).toLong
    require((mask & (SzMaskNn | SzMaskEc)) != 0,
      "szip options mask selects neither NN nor EC coding")
    // 32/64-bit data rides the BYTE-STREAM mode: byte-plane interleaved
    // words coded as 8-bit samples (libaec sz_compat); the sample-level
    // parameters (ppb, pps) apply to the byte stream as-is.
    val byteStream = bits == 32 || bits == 64
    val codedBits = if (byteStream) 8 else bits
    val bytesPer = codedBits / 8
    require(stored > 0 && stored <= Int.MaxValue && stored % (bits / 8) == 0,
      s"szip stored size $stored not a whole number of ${bits / 8}-byte " +
        "samples")
    val nSamples = (stored / bytesPer).toInt
    val p = Ccsds.Params(codedBits, ppb, pps / ppb,
      preprocess = (mask & SzMaskNn) != 0, signed = false, padRsi = true)
    val vals = Ccsds.decode(
      java.util.Arrays.copyOfRange(data, 4, data.length), nSamples, p)
    val out = new Array[Byte](stored.toInt)
    val lsbFirst = (mask & SzMaskLsb) != 0
    var i = 0
    while (i < nSamples) {
      val v = vals(i)
      var bI = 0
      while (bI < bytesPer) {
        val shift = if (lsbFirst) 8 * bI else 8 * (bytesPer - 1 - bI)
        out(i * bytesPer + bI) = ((v >> shift) & 0xFF).toByte
        bI += 1
      }
      i += 1
    }
    if (byteStream) byteStreamTranspose(out, bits / 8, forward = false)
    else out
  }

  /** Fixture/spec twin of [[szipDecode]]. */
  def szipEncode(data: Array[Byte], cd: Seq[Int]): Array[Byte] = {
    val (mask, bits, ppb, pps) = (cd(0), cd(1), cd(2), cd(3))
    val byteStream = bits == 32 || bits == 64
    val codedBits = if (byteStream) 8 else bits
    val coded =
      if (byteStream) byteStreamTranspose(data, bits / 8, forward = true)
      else data
    val bytesPer = codedBits / 8
    require(coded.length % bytesPer == 0, "payload not sample-aligned")
    val n = coded.length / bytesPer
    val lsbFirst = (mask & SzMaskLsb) != 0
    val vals = Array.tabulate(n) { i =>
      var v = 0L
      var bI = 0
      while (bI < bytesPer) {
        val shift = if (lsbFirst) 8 * bI else 8 * (bytesPer - 1 - bI)
        v |= (coded(i * bytesPer + bI) & 0xFFL) << shift
        bI += 1
      }
      v
    }
    val p = Ccsds.Params(codedBits, ppb, pps / ppb,
      preprocess = (mask & SzMaskNn) != 0, signed = false, padRsi = true)
    val stream = Ccsds.encode(vals, p)
    val hdr = Array[Byte](
      (data.length & 0xFF).toByte, ((data.length >> 8) & 0xFF).toByte,
      ((data.length >> 16) & 0xFF).toByte,
      ((data.length >> 24) & 0xFF).toByte)
    hdr ++ stream
  }
}
