package graft

import graft.tsa.SeriesMath
import org.scalatest.funsuite.AnyFunSuite

/** FFT + analytic-signal kernels behind the HT-method HHT. */
class FftSpec extends AnyFunSuite {

  test("fft round-trips (inverse of forward is identity)") {
    val n = 256
    val re = Array.tabulate(n)(i => math.sin(0.37 * i) + 0.2 * i % 3)
    val im = new Array[Double](n)
    val re0 = re.clone()
    SeriesMath.fft(re, im, inverse = false)
    SeriesMath.fft(re, im, inverse = true)
    re.zip(re0).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    im.foreach(v => assert(math.abs(v) < 1e-9))
  }

  test("fft of a pure tone peaks at its bin") {
    val n = 128
    val kTone = 9
    val re = Array.tabulate(n)(i => math.cos(2 * math.Pi * kTone * i / n))
    val im = new Array[Double](n)
    SeriesMath.fft(re, im, inverse = false)
    val mags = Array.tabulate(n)(i => math.hypot(re(i), im(i)))
    // a real cosine splits equally between bins k and n-k
    val top = mags.indexOf(mags.max)
    assert(top == kTone || top == n - kTone, s"peak at $top")
    assert(mags(kTone) > 10 * mags(kTone + 2))
  }

  test("analytic signal of a sine has ~unit envelope and correct freq") {
    val n = 512
    val f0 = 0.05
    val x = Array.tabulate(n)(i => math.sin(2 * math.Pi * f0 * i))
    val (re, im) = SeriesMath.analytic(x)
    // envelope ~1 away from edges
    val env = (32 until n - 32).map(i => math.hypot(re(i), im(i)))
    assert(math.abs(env.sum / env.size - 1.0) < 0.02)
    // phase advances by 2π f0 per sample
    val dphi = (100 until 400).map { i =>
      val a = math.atan2(im(i + 1), re(i + 1)) - math.atan2(im(i), re(i))
      if (a < -math.Pi) a + 2 * math.Pi else if (a > math.Pi) a - 2 * math.Pi else a
    }
    assert(math.abs(dphi.sum / dphi.size / (2 * math.Pi) - f0) < 1e-3)
  }
}
