package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Dsp

/** FFT kernel: brute-force DFT parity, Parseval's identity, linearity,
  * and the bin-centered-sine property q124's fixture leans on.
  */
class DspSpec extends AnyFunSuite {

  private def dft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n); val im = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val a = -2 * math.Pi * k * t / n
      re(k) += x(t) * math.cos(a)
      im(k) += x(t) * math.sin(a)
    }
    (re, im)
  }

  test("FFT matches the brute-force DFT on random input") {
    val rnd = new scala.util.Random(5)
    for (n <- Seq(8, 64, 256)) {
      val x = Array.fill(n)(rnd.nextDouble() * 2 - 1)
      val re = x.clone(); val im = new Array[Double](n)
      Dsp.fft(re, im)
      val (dr, di) = dft(x)
      for (k <- 0 until n) {
        assert(math.abs(re(k) - dr(k)) < 1e-8, s"n=$n re[$k]")
        assert(math.abs(im(k) - di(k)) < 1e-8, s"n=$n im[$k]")
      }
    }
  }

  test("Parseval: time-domain energy equals spectrum energy / n") {
    val rnd = new scala.util.Random(11)
    val n = 512
    val x = Array.fill(n)(rnd.nextDouble() * 2 - 1)
    val re = x.clone(); val im = new Array[Double](n)
    Dsp.fft(re, im)
    val timeE = x.map(v => v * v).sum
    val freqE = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum / n
    assert(math.abs(timeE - freqE) < 1e-8)
  }

  test("a bin-centered sine concentrates its power in exactly that bin") {
    val n = 1024
    for (k <- Seq(3, 40, 131, 500)) {
      val x = Array.tabulate(n)(t => math.sin(2 * math.Pi * k * t / n) * 0.7)
      val p = Dsp.powerSpectrum(x, n)
      val peak = p.indexOf(p.max)
      assert(peak === k)
      // all other bins are numerically negligible
      val rest = p.zipWithIndex.filter(_._2 != k).map(_._1).max
      assert(rest < p(k) * 1e-12)
    }
  }

  test("non-power-of-two lengths are rejected") {
    intercept[IllegalArgumentException] {
      Dsp.fft(new Array[Double](100), new Array[Double](100))
    }
  }
}
