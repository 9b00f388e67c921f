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
      case 2 =>
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
          lz4.safeDecompressor().decompress(data, pos, cb, block, 0, nBytes)
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
        s"bitshuffle filter compression $other unsupported (none/lz4)")
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
                       withLz4: Boolean = true): Array[Byte] = {
    val blockElems =
      if (blockElems0 > 0) blockElems0 else bshufDefaultBlockElems(elem)
    require(blockElems % 8 == 0, s"block of $blockElems elems")
    if (!withLz4) return blockedBitshuffle(data, elem, blockElems,
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
      val c = lz4.fastCompressor()
      val dst = new Array[Byte](c.maxCompressedLength(nBytes))
      val n = c.compress(block, 0, nBytes, dst, 0, dst.length)
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
}
