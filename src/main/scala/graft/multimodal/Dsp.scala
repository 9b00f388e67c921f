package graft.multimodal

/** Minimal DSP kernel for audio features: an iterative radix-2
  * Cooley–Tukey FFT (textbook construction — bit-reversal permutation
  * then log2(n) butterfly passes) and the power spectrum derived from
  * it. Pure JVM doubles, deterministic; DspSpec pins the transform
  * against a brute-force DFT and Parseval's identity, and q124 gates
  * the spectral features cross-engine from integer-quantized bins.
  */
object Dsp {

  /** In-place FFT of (re, im); n must be a power of two. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && n > 0 && (n & (n - 1)) == 0,
      s"FFT length $n must be a power of two")
    // bit-reversal permutation
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterfly passes
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = base + k
          val b = a + len / 2
          val xr = re(b) * cr - im(b) * ci
          val xi = re(b) * ci + im(b) * cr
          re(b) = re(a) - xr; im(b) = im(a) - xi
          re(a) += xr; im(a) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** One-sided power spectrum of the first `n` samples (rectangular
    * window): n/2 + 1 bins, bin k covering frequency k·rate/n. Powers
    * of the strictly-interior bins are doubled (the conjugate-symmetric
    * halves fold together), the standard one-sided convention.
    */
  def powerSpectrum(samples: Array[Double], n: Int): Array[Double] = {
    require(samples.length >= n, s"need $n samples, got ${samples.length}")
    val re = java.util.Arrays.copyOf(samples, n)
    val im = new Array[Double](n)
    fft(re, im)
    Array.tabulate(n / 2 + 1) { k =>
      val p = re(k) * re(k) + im(k) * im(k)
      if (k == 0 || k == n / 2) p else 2 * p
    }
  }
}
