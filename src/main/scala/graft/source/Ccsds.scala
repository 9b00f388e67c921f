package graft.source

/** CCSDS 121.0-B Adaptive Entropy Coder (the "extended Rice" coder) —
  * the lossless compressor behind BOTH GRIB2 data template 5.42
  * (CCSDS/AEC packing, operational at ECMWF and DWD since libaec
  * replaced szip) and the HDF5 `szip` filter (id 4) that NASA EOS
  * archives (MODIS / AIRS / AMSR) carry. One bit-level implementation
  * from the published standard serves both wrappers; the reference
  * reads such files transparently through libhdf5/eccodes
  * (generator.py:485 opens archives without knowing their filters).
  *
  * Stream format (CCSDS 121.0-B-2 §5, matching libaec's raw mode — no
  * headers, MSB-first bitstream):
  *
  *  - Samples are n-bit integers (n = 1..32), grouped into blocks of J
  *    samples; r consecutive blocks form a reference sample interval
  *    (RSI). Each block is coded independently with a per-block option:
  *
  *    option ID (b bits: b = 3 for n ≤ 8, 4 for n ≤ 16, else 5):
  *      0            → low-entropy; 1 more bit: 0 = zero-block,
  *                     1 = second-extension
  *      1 … 2^b − 2  → sample splitting with k = ID − 1
  *      2^b − 1      → no compression (J raw n-bit samples)
  *
  *  - Sample splitting (§5.3.1): the J' coded samples' fundamental-
  *    sequence parts (value v = v '0's then a '1') are emitted FIRST,
  *    then the J' k-bit LSB remainders — block-interleaved, not
  *    per-sample.
  *  - Zero-block (§5.3.3): an FS codeword z encodes a run of all-zero
  *    blocks: z ≤ 3 → z+1 blocks; z = 4 → "remainder of segment" (all
  *    blocks to the next 64-block segment boundary, segments counted
  *    from the RSI start); z ≥ 5 → z blocks.
  *  - Second extension (§5.3.2): consecutive sample pairs (d0,d1) map
  *    to m = (d0+d1)(d0+d1+1)/2 + d1, FS-coded. J/2 codewords per
  *    block; when the block carries a reference sample the first
  *    pair's leading element is a placeholder the decoder discards.
  *  - Preprocessing (§4, the NN predictor): x̂ = previous sample;
  *    prediction error e = x − x̂ maps to non-negative
  *    m = 2e (0 ≤ e ≤ θ), 2|e|−1 (−θ ≤ e < 0), θ+|e| otherwise, with
  *    θ = min(x̂ − xmin, xmax − x̂). The first sample of every RSI is a
  *    reference sample stored raw (n bits) right after its block's
  *    option codeword (after the low-entropy extension bit when
  *    present); the predictor resets there.
  *  - `padRsi`: the bitstream is byte-aligned after every RSI — the
  *    szip scanline convention (libaec's AEC_PAD_RSI / SZ
  *    compatibility mode). GRIB2 carries the flag in octet 22 of
  *    template 5.42.
  *
  * The encoder exists so specs can pin the decoder against
  * independently-constructed streams and the GRIB2 writer can emit
  * 5.42 round-trips; it picks the cheapest option per block (including
  * zero-run coalescing) exactly so real decoders' option mix is
  * exercised.
  */
object Ccsds {

  final case class Params(
      bitsPerSample: Int,
      blockSize: Int,
      rsi: Int,
      preprocess: Boolean,
      signed: Boolean = false,
      padRsi: Boolean = false) {
    require(bitsPerSample >= 1 && bitsPerSample <= 32,
      s"CCSDS bits-per-sample $bitsPerSample unsupported (1..32)")
    require(blockSize >= 2 && blockSize <= 64 && blockSize % 2 == 0,
      s"CCSDS block size $blockSize unsupported (even, 2..64)")
    require(rsi >= 1 && rsi <= 4096, s"CCSDS RSI $rsi unsupported")

    val idLen: Int =
      if (bitsPerSample <= 8) 3 else if (bitsPerSample <= 16) 4 else 5
    val maxId: Int = (1 << idLen) - 1
    /** k beyond the sample width codes nothing real; both sides clamp. */
    val maxK: Int = math.min(maxId - 2, math.max(0, bitsPerSample - 2))
    val xMin: Long = if (signed) -(1L << (bitsPerSample - 1)) else 0L
    val xMax: Long =
      if (signed) (1L << (bitsPerSample - 1)) - 1
      else (1L << bitsPerSample) - 1
  }

  private final val RosCode = 4L
  private final val SegmentBlocks = 64

  // ---- bit I/O (MSB-first) -------------------------------------------

  private final class BitReader(val data: Array[Byte]) {
    var bit: Long = 0L
    def remaining: Long = data.length.toLong * 8 - bit
    def read(n: Int): Long = {
      require(remaining >= n, s"CCSDS stream exhausted (need $n bits, " +
        s"${remaining} left) — wrong coding parameters or truncated stream")
      var v = 0L
      var i = 0
      while (i < n) {
        val b = bit + i
        v = (v << 1) |
          ((data((b >> 3).toInt) >> (7 - (b & 7).toInt)) & 1)
        i += 1
      }
      bit += n
      v
    }
    /** Fundamental-sequence codeword: count '0's up to the '1'. */
    def readFs(): Long = {
      var v = 0L
      while ({
        require(remaining >= 1,
          "CCSDS stream exhausted inside an FS codeword — wrong coding " +
            "parameters or truncated stream")
        val b = bit
        bit += 1
        ((data((b >> 3).toInt) >> (7 - (b & 7).toInt)) & 1) == 0
      }) {
        v += 1
        require(v <= (1L << 34),
          "CCSDS FS codeword over 2^34 zeros — corrupt stream")
      }
      v
    }
    def alignByte(): Unit = { val r = bit & 7; if (r != 0) bit += 8 - r }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nb = 0
    def write(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >> k) & 1L)
        nb += 1
        if (nb == 8) { out.write(acc.toInt & 0xFF); acc = 0; nb = 0 }
        k -= 1
      }
    }
    def writeFs(v: Long): Unit = {
      var i = 0L
      while (i < v) { write(0, 1); i += 1 }
      write(1, 1)
    }
    def alignByte(): Unit = if (nb > 0) { write(0, 8 - nb) }
    def result(): Array[Byte] = { alignByte(); out.toByteArray }
  }

  // ---- prediction-error mapping (§4) ---------------------------------

  private def mapError(x: Long, prev: Long, p: Params): Long = {
    val e = x - prev
    val th = math.min(prev - p.xMin, p.xMax - prev)
    if (e >= 0 && e <= th) 2 * e
    else if (e < 0 && e >= -th) -2 * e - 1
    else th + math.abs(e)
  }

  private def unmapError(m: Long, prev: Long, p: Params): Long = {
    val th = math.min(prev - p.xMin, p.xMax - prev)
    val e =
      if (m <= 2 * th) { if ((m & 1) == 0) m / 2 else -((m + 1) / 2) }
      else if (th == p.xMax - prev) -(m - th)
      else m - th
    val x = prev + e
    require(x >= p.xMin && x <= p.xMax,
      s"CCSDS mapped delta $m decodes outside the $x sample range — " +
        "wrong coding parameters or corrupt stream")
    x
  }

  /** Inverse of m = s(s+1)/2 + d1 with s = d0 + d1 (§5.3.2). */
  private def unpair(m: Long): (Long, Long) = {
    var s = math.floor((math.sqrt(8.0 * m + 1) - 1) / 2).toLong
    // float sqrt can land one off at the triangle boundaries
    while ((s + 1) * (s + 2) / 2 <= m) s += 1
    while (s * (s + 1) / 2 > m) s -= 1
    val d1 = m - s * (s + 1) / 2
    (s - d1, d1)
  }

  // ---- decode --------------------------------------------------------

  /** Decode `nSamples` samples. Values are returned as Longs in the
    * sample's numeric range (sign-extended when `signed`).
    */
  def decode(stream: Array[Byte], nSamples: Int, p: Params): Array[Long] = {
    val J = p.blockSize
    val blocksTotal = (nSamples + J - 1) / J
    val out = new Array[Long](blocksTotal * J)
    val in = new BitReader(stream)
    var idx = 0
    var blocksDone = 0
    while (blocksDone < blocksTotal) {
      val rsiBlocks = math.min(p.rsi, blocksTotal - blocksDone)
      var prev = 0L
      var b = 0
      while (b < rsiBlocks) {
        val ref = p.preprocess && b == 0
        val id = in.read(p.idLen).toInt

        def readRef(): Long = {
          val raw = in.read(p.bitsPerSample)
          val x =
            if (p.signed && (raw & (1L << (p.bitsPerSample - 1))) != 0)
              raw - (1L << p.bitsPerSample)
            else raw
          out(idx) = x; idx += 1; prev = x
          x
        }
        def putMapped(m: Long): Unit = {
          // without preprocessing samples are coded as their raw n-bit
          // patterns (two's complement when signed)
          val x = if (p.preprocess) unmapError(m, prev, p)
                  else {
                    require(m < (1L << p.bitsPerSample),
                      s"CCSDS sample $m over the ${p.bitsPerSample}-bit " +
                        "range — wrong coding parameters or corrupt stream")
                    if (p.signed && (m & (1L << (p.bitsPerSample - 1))) != 0)
                      m - (1L << p.bitsPerSample)
                    else m
                  }
          out(idx) = x; idx += 1; prev = x
        }

        if (id == 0) {
          val ext = in.read(1)
          if (ref) readRef()
          if (ext == 0) { // zero-block run
            val z = in.readFs()
            val segEnd = ((b / SegmentBlocks) + 1) * SegmentBlocks
            val run =
              if (z == RosCode) math.min(segEnd, rsiBlocks) - b
              else if (z < RosCode) z.toInt + 1
              else z.toInt
            require(b + run <= rsiBlocks,
              s"CCSDS zero-block run $run crosses the RSI boundary " +
                s"($run blocks at block $b of $rsiBlocks)")
            var blk = 0
            while (blk < run) {
              val n = if (blk == 0 && ref) J - 1 else J
              var i = 0
              while (i < n) { putMapped(0L); i += 1 }
              blk += 1
            }
            b += run
          } else { // second extension
            val pairs = J / 2
            var pi = 0
            while (pi < pairs) {
              val m = in.readFs()
              val (d0, d1) = unpair(m)
              if (pi == 0 && ref) {
                // the leading element is the placeholder slot the
                // reference sample displaced — discard it
                putMapped(d1)
              } else { putMapped(d0); putMapped(d1) }
              pi += 1
            }
            b += 1
          }
        } else if (id == p.maxId) { // no compression: J raw samples,
          // the first of which IS the reference at an RSI start
          if (ref) readRef()
          var i = if (ref) 1 else 0
          while (i < J) { putMapped(in.read(p.bitsPerSample)); i += 1 }
          b += 1
        } else { // sample splitting, k = id − 1
          val k = id - 1
          if (ref) readRef()
          val n = if (ref) J - 1 else J
          val fs = new Array[Long](n)
          var i = 0
          while (i < n) { fs(i) = in.readFs(); i += 1 }
          i = 0
          while (i < n) {
            putMapped((fs(i) << k) | in.read(k))
            i += 1
          }
          b += 1
        }
      }
      blocksDone += rsiBlocks
      if (p.padRsi) in.alignByte()
    }
    if (out.length == nSamples) out
    else java.util.Arrays.copyOfRange(out, 0, nSamples)
  }

  // ---- encode --------------------------------------------------------

  /** Encode samples; the final partial block is padded by repeating the
    * last sample (decoders truncate by count). Option choice per block
    * is cost-based over zero-run / second-extension / k-split / raw.
    */
  def encode(samples: Array[Long], p: Params): Array[Byte] = {
    val J = p.blockSize
    require(samples.forall(x => x >= p.xMin && x <= p.xMax),
      s"sample outside ${p.bitsPerSample}-bit range")
    val blocksTotal = (samples.length + J - 1) / J
    val padded =
      if (samples.length == blocksTotal * J) samples
      else {
        val a = java.util.Arrays.copyOf(samples, blocksTotal * J)
        val last = if (samples.isEmpty) 0L else samples(samples.length - 1)
        java.util.Arrays.fill(a, samples.length, a.length, last)
        a
      }
    val w = new BitWriter
    var blocksDone = 0
    while (blocksDone < blocksTotal) {
      val rsiBlocks = math.min(p.rsi, blocksTotal - blocksDone)
      // preprocess the whole RSI: mapped deltas, slot 0 = raw reference
      val nS = rsiBlocks * J
      val base = blocksDone * J
      val pp = new Array[Long](nS)
      if (p.preprocess) {
        var prev = padded(base)
        pp(0) = padded(base) // reference (emitted raw)
        var i = 1
        while (i < nS) {
          pp(i) = mapError(padded(base + i), prev, p)
          prev = padded(base + i)
          i += 1
        }
      } else {
        val mask = if (p.bitsPerSample == 64) -1L
                   else (1L << p.bitsPerSample) - 1
        var i = 0
        while (i < nS) { pp(i) = padded(base + i) & mask; i += 1 }
      }

      var b = 0
      while (b < rsiBlocks) {
        val ref = p.preprocess && b == 0
        val lo = b * J + (if (ref) 1 else 0)
        val hi = (b + 1) * J
        def allZero(bi: Int): Boolean = {
          val s = bi * J + (if (p.preprocess && bi == 0) 1 else 0)
          var i = s; var z = true
          while (i < (bi + 1) * J && z) { z = pp(i) == 0; i += 1 }
          z
        }
        if (allZero(b)) {
          // coalesce the zero run, segment-bounded
          val segEnd = math.min(((b / SegmentBlocks) + 1) * SegmentBlocks,
            rsiBlocks)
          var run = 1
          while (b + run < segEnd && allZero(b + run)) run += 1
          val ros = b + run == segEnd && run > RosCode
          w.write(0, p.idLen); w.write(0, 1)
          if (ref) w.write(pp(0) & ((1L << p.bitsPerSample) - 1),
            p.bitsPerSample)
          if (ros) w.writeFs(RosCode)
          else if (run <= RosCode.toInt) w.writeFs(run - 1)
          else w.writeFs(run.toLong)
          b += run
        } else {
          // cost each option
          val n = hi - lo
          var bestK = -1
          var bestCost = Long.MaxValue
          var k = 0
          while (k <= p.maxK) {
            var c = p.idLen.toLong + n.toLong * (k + 1)
            var i = lo
            while (i < hi && c < bestCost) { c += (pp(i) >>> k); i += 1 }
            if (c < bestCost) { bestCost = c; bestK = k }
            k += 1
          }
          val rawCost = p.idLen.toLong + n.toLong * p.bitsPerSample
          // second extension: J/2 pairs (ref block: slot 0 as 0)
          var seCost = p.idLen.toLong + 1
          var pi = 0
          var seOk = true
          val seMs = new Array[Long](J / 2)
          while (pi < J / 2 && seOk) {
            val i0 = b * J + 2 * pi
            val d0 = if (ref && 2 * pi == 0) 0L else pp(i0)
            val d1 = pp(i0 + 1)
            val s = d0 + d1
            if (s > (1L << 16)) seOk = false // FS blowup guard
            else {
              seMs(pi) = s * (s + 1) / 2 + d1
              seCost += seMs(pi) + 1
            }
            pi += 1
          }
          val low = math.min(rawCost, math.min(bestCost,
            if (seOk) seCost else Long.MaxValue))
          if (seOk && seCost == low && seCost < rawCost &&
              seCost < bestCost) {
            w.write(0, p.idLen); w.write(1, 1)
            if (ref) w.write(pp(b * J) & ((1L << p.bitsPerSample) - 1),
              p.bitsPerSample)
            seMs.foreach(w.writeFs)
          } else if (bestCost <= rawCost) {
            w.write(bestK + 1, p.idLen)
            if (ref) w.write(pp(b * J) & ((1L << p.bitsPerSample) - 1),
              p.bitsPerSample)
            var i = lo
            while (i < hi) { w.writeFs(pp(i) >>> bestK); i += 1 }
            i = lo
            while (i < hi) {
              w.write(pp(i) & ((1L << bestK) - 1), bestK); i += 1
            }
          } else {
            w.write(p.maxId, p.idLen)
            if (ref) {
              w.write(pp(b * J) & ((1L << p.bitsPerSample) - 1),
                p.bitsPerSample)
              var i = lo
              while (i < hi) { w.write(pp(i), p.bitsPerSample); i += 1 }
            } else {
              var i = lo
              while (i < hi) { w.write(pp(i), p.bitsPerSample); i += 1 }
            }
          }
          b += 1
        }
      }
      blocksDone += rsiBlocks
      if (p.padRsi) w.alignByte()
    }
    w.result()
  }
}
