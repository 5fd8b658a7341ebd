package graft

import graft.tsa.SeriesMath
import org.scalatest.funsuite.AnyFunSuite

/** Pure-Scala numerics behind the mapGroups operators, validated
  * against the reference's own test expectations
  * (reference tests/test_core.py, tests/test_decomposition.py). */
class SeriesMathSpec extends AnyFunSuite {

  test("median_dt of nonuniform samples is the median gap (ref test_core.py:18)") {
    // reference: TSeries([1, 3, 4]).median_dt == 1.5 — gaps (2, 1),
    // even count, mean of the middle pair
    assert(SeriesMath.medianDt(Array(1.0, 3.0, 4.0)) == 1.5)
    // odd gap count takes the middle gap exactly
    assert(SeriesMath.medianDt(Array(0.0, 1.0, 3.0, 6.0)) == 2.0)
  }

  test("spline envelope of a sine is ~constant 1 (ref test_core.py:36)") {
    val t = Array.tabulate(1001)(i => i * 0.1)
    val y = t.map(math.sin)
    val env = SeriesMath.envelopes(t, y, padWidth = 2)
    assert(env != null)
    val (upper, lower) = env
    // interior (away from edge effects)
    val err = (50 until 950).map(i => math.abs(upper(i) - 1.0)).max
    val errLo = (50 until 950).map(i => math.abs(lower(i) + 1.0)).max
    assert(err < 0.01, s"upper envelope err $err")
    assert(errLo < 0.01, s"lower envelope err $errLo")
  }

  test("envelope is insensitive to pad_width beyond the first extrema (ref test_core.py:44)") {
    // reference: get_envelope(pad_width=2) and pad_width=10 are
    // allclose — once the reflection covers the first/last extremum,
    // more padding cannot move the interior spline
    val t = Array.tabulate(1001)(i => i * 0.1)
    val y = t.map(math.sin)
    val (u2, l2) = SeriesMath.envelopes(t, y, padWidth = 2)
    val (u10, l10) = SeriesMath.envelopes(t, y, padWidth = 10)
    // full range: np.allclose order (rtol 1e-5); the natural-spline
    // end condition sits 2 vs 10 reflected extrema out, and its
    // influence decays geometrically toward the interior
    val du = (0 until 1001).map(i => math.abs(u2(i) - u10(i))).max
    val dl = (0 until 1001).map(i => math.abs(l2(i) - l10(i))).max
    assert(du < 2e-5, s"upper envelope moved with pad_width: $du")
    assert(dl < 2e-5, s"lower envelope moved with pad_width: $dl")
    // deep interior (>6 extrema from either edge): the boundary
    // influence of a cubic spline decays geometrically per knot
    // interval — two orders down from the edge deviation here
    val dui = (200 until 800).map(i => math.abs(u2(i) - u10(i))).max
    assert(dui < 1e-6, s"interior envelope moved with pad_width: $dui")
  }

  test("EMD separates two tones (ref test_decomposition.py shape)") {
    val n = 1000
    val t = Array.tabulate(n)(_.toDouble)
    val s2 = t.map(x => math.sin(2 * math.Pi * 0.065 * x))
    val s1 = t.map(x => math.sin(2 * math.Pi * 0.255 * x))
    val y = Array.tabulate(n)(i => s1(i) + s2(i))
    val modes = SeriesMath.emd(t, y)
    assert(modes.length >= 2, s"expected >=2 modes, got ${modes.length}")
    // first IMF ~ the fast tone, second ~ the slow tone (interior rrse)
    def rrse(a: Array[Double], b: Array[Double]) = {
      val idx = 50 until (n - 50)
      math.sqrt(idx.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum) /
        math.sqrt(idx.map(i => b(i) * b(i)).sum)
    }
    assert(rrse(modes(0), s1) < 0.2, s"fast tone rrse ${rrse(modes(0), s1)}")
    assert(rrse(modes(1), s2) < 0.2, s"slow tone rrse ${rrse(modes(1), s2)}")
  }

  test("butterworth bandpass keeps in-band, rejects out-of-band") {
    val fs = 1.0
    val sos = SeriesMath.butterBandpassSos(5, 0.05, 0.25, fs)
    val n = 2000
    val inBand = Array.tabulate(n)(i => math.sin(2 * math.Pi * 0.1 * i))
    val outBand = Array.tabulate(n)(i => math.sin(2 * math.Pi * 0.45 * i))
    def rms(a: Array[Double]) =
      math.sqrt(a.slice(200, n - 200).map(v => v * v).sum / (n - 400))
    val keep = SeriesMath.sosFiltFilt(sos, inBand)
    val kill = SeriesMath.sosFiltFilt(sos, outBand)
    assert(rms(keep) > 0.6, s"in-band rms ${rms(keep)}")
    assert(rms(kill) < 0.05, s"out-of-band rms ${rms(kill)}")
  }

  test("DQ instantaneous frequency of a pure sine (ref TEO expectation)") {
    val f0 = 0.02
    val t = Array.tabulate(3000)(_.toDouble)
    val y = t.map(x => math.sin(2 * math.Pi * f0 * x))
    val freq = SeriesMath.dqInstantFreq(t, y)
    val interior = freq.slice(100, 2900)
    val mean = interior.sum / interior.length
    assert(math.abs(mean - f0) < 0.002, s"mean inst freq $mean vs $f0")
  }

  test("cholesky solve recovers known solution") {
    val a = Array(
      Array(4.0, 2.0, 0.6),
      Array(2.0, 5.0, 1.5),
      Array(0.6, 1.5, 3.8))
    val x0 = Array(1.0, -2.0, 0.5)
    val b = a.map(row => row.zip(x0).map { case (u, v) => u * v }.sum)
    val l = SeriesMath.cholesky(a)
    assert(l != null)
    val x = SeriesMath.choleskySolve(l, b)
    x.zip(x0).foreach { case (got, exp) =>
      assert(math.abs(got - exp) < 1e-10)
    }
  }

  test("cholesky rejects non-positive-definite input") {
    val a = Array(Array(1.0, 2.0), Array(2.0, 1.0))
    assert(SeriesMath.cholesky(a) == null)
  }
}
