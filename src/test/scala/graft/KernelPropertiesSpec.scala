package graft

import graft.tsa.SeriesMath
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants of the pure numeric kernels behind the
  * mapGroups operators (scalacheck generators, fixed seed for
  * reproducibility). The example-based specs pin reference parity at
  * specific inputs; these pin the algebraic contracts — interpolation
  * through knots, factor·factorᵀ reconstruction, transform
  * round-trips — across randomized input families, which is where
  * boundary-index bugs (the round-9 Butterworth pole-pairing class)
  * hide.
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private val params = Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def assertHolds(name: String, p: Prop): Unit = {
    val r = check(params, p)
    assert(r.passed, s"$name: ${r.status}")
  }

  /** Strictly increasing knot vector with bounded gaps. */
  private val knotsGen: Gen[Array[Double]] = for {
    n <- Gen.choose(3, 20)
    gaps <- Gen.listOfN(n, Gen.choose(0.1, 10.0))
  } yield gaps.scanLeft(0.0)(_ + _).tail.toArray

  private def valuesGen(n: Int): Gen[Array[Double]] =
    Gen.listOfN(n, Gen.choose(-100.0, 100.0)).map(_.toArray)

  test("natural spline interpolates its knots and is C0/C1-continuous") {
    val gen = for {
      xs <- knotsGen
      ys <- valuesGen(xs.length)
    } yield (xs, ys)
    assertHolds("spline", Prop.forAll(gen) { case (xs, ys) =>
      val n = xs.length
      val (b, c, d) = splineOf(xs, ys)
      def seg(s: Int, x: Double): Double = {
        val dx = x - xs(s)
        ys(s) + b(s) * dx + c(s) * dx * dx + d(s) * dx * dx * dx
      }
      def dseg(s: Int, x: Double): Double = {
        val dx = x - xs(s)
        b(s) + 2.0 * c(s) * dx + 3.0 * d(s) * dx * dx
      }
      val scale = ys.map(math.abs).max.max(1.0)
      // each segment ends exactly at the next knot value (C0), and
      // adjacent segments agree on the first derivative there (C1)
      (0 until n - 1).forall { s =>
        math.abs(seg(s, xs(s + 1)) - ys(s + 1)) < 1e-8 * scale
      } && (0 until n - 2).forall { s =>
        val slopeScale = scale / 0.1 // max |y| over min gap
        math.abs(dseg(s, xs(s + 1)) - b(s + 1)) < 1e-8 * slopeScale
      }
    })
  }

  private def splineOf(xs: Array[Double], ys: Array[Double]) =
    SeriesMath.splineCoeffs(xs, ys)

  test("splineEval reproduces knot values through the segment lookup") {
    val gen = for {
      xs <- knotsGen
      ys <- valuesGen(xs.length)
    } yield (xs, ys)
    assertHolds("splineEval", Prop.forAll(gen) { case (xs, ys) =>
      val out = SeriesMath.splineEval(xs, ys, xs)
      val scale = ys.map(math.abs).max.max(1.0)
      out.indices.forall(i => math.abs(out(i) - ys(i)) < 1e-8 * scale)
    })
  }

  test("cholesky factor reconstructs K and solves K x = y") {
    val gen = for {
      n <- Gen.choose(2, 12)
      a <- Gen.listOfN(n * n, Gen.choose(-1.0, 1.0))
      y <- Gen.listOfN(n, Gen.choose(-10.0, 10.0))
    } yield (n, a.toArray, y.toArray)
    assertHolds("cholesky", Prop.forAll(gen) { case (n, aFlat, y) =>
      // K = A.T A + n I is symmetric positive definite by construction
      val k = Array.tabulate(n, n) { (i, j) =>
        var s = if (i == j) n.toDouble else 0.0
        var r = 0
        while (r < n) { s += aFlat(r * n + i) * aFlat(r * n + j); r += 1 }
        s
      }
      val kCopy = Array.tabulate(n, n)((i, j) => k(i)(j))
      val l = SeriesMath.cholesky(kCopy)
      l != null && {
        val recon = (0 until n).forall { i =>
          (0 until n).forall { j =>
            var s = 0.0
            var r = 0
            while (r < n) { s += l(i)(r) * l(j)(r); r += 1 }
            math.abs(s - k(i)(j)) < 1e-8 * (n + 1)
          }
        }
        val x = SeriesMath.choleskySolve(l, y)
        val solves = (0 until n).forall { i =>
          var s = 0.0
          var j = 0
          while (j < n) { s += k(i)(j) * x(j); j += 1 }
          math.abs(s - y(i)) < 1e-7 * (n + 1)
        }
        recon && solves
      }
    })
  }

  test("fft inverse round-trips and preserves energy (Parseval)") {
    val gen = for {
      logN <- Gen.choose(1, 8)
      re <- Gen.listOfN(1 << logN, Gen.choose(-10.0, 10.0))
      im <- Gen.listOfN(1 << logN, Gen.choose(-10.0, 10.0))
    } yield (re.toArray, im.toArray)
    assertHolds("fft", Prop.forAll(gen) { case (re0, im0) =>
      val n = re0.length
      val re = re0.clone(); val im = im0.clone()
      SeriesMath.fft(re, im, inverse = false)
      val eTime = re0.indices.map(i => re0(i) * re0(i) + im0(i) * im0(i)).sum
      val eFreq = re.indices.map(i => re(i) * re(i) + im(i) * im(i)).sum / n
      SeriesMath.fft(re, im, inverse = true)
      val roundTrip = re0.indices.forall { i =>
        math.abs(re(i) - re0(i)) < 1e-9 * n &&
          math.abs(im(i) - im0(i)) < 1e-9 * n
      }
      roundTrip && math.abs(eTime - eFreq) < 1e-7 * (eTime + 1.0)
    })
  }

  test("findPeaks reports exactly the strict interior local maxima " +
    "and findDips is its mirror") {
    val gen = for {
      n <- Gen.choose(3, 60)
      y <- Gen.listOfN(n, Gen.choose(-5.0, 5.0))
    } yield y.toArray
    assertHolds("peaks", Prop.forAll(gen) { y =>
      val peaks = SeriesMath.findPeaks(y, includeEdges = false).toSet
      val expected = (1 until y.length - 1)
        .filter(i => y(i) > y(i - 1) && y(i) > y(i + 1)).toSet
      val dips = SeriesMath.findDips(y, includeEdges = false).toSet
      val expectedDips = (1 until y.length - 1)
        .filter(i => y(i) < y(i - 1) && y(i) < y(i + 1)).toSet
      peaks == expected && dips == expectedDips
    })
  }

  test("spline envelopes pass through the interior extrema they knot") {
    val gen = for {
      n <- Gen.choose(40, 120)
      phase <- Gen.choose(0.0, 2.0 * math.Pi)
      amp <- Gen.choose(0.5, 5.0)
      freq <- Gen.choose(0.2, 0.8)
    } yield (n, phase, amp, freq)
    assertHolds("envelopes", Prop.forAll(gen) { case (n, phase, amp, freq) =>
      val t = Array.tabulate(n)(_.toDouble)
      val y = t.map(x => amp * math.sin(freq * x + phase))
      SeriesMath.envelopes(t, y, padWidth = 2) match {
        case null => true // too few extrema — nothing to check
        case (upper, lower) =>
          val peaks = SeriesMath.findPeaks(y, includeEdges = false)
          val dips = SeriesMath.findDips(y, includeEdges = false)
          peaks.forall(i => math.abs(upper(i) - y(i)) < 1e-8 * amp) &&
            dips.forall(i => math.abs(lower(i) - y(i)) < 1e-8 * amp)
      }
    })
  }

  test("medianDt equals the middle of the sorted gap distribution") {
    val gen = knotsGen
    assertHolds("medianDt", Prop.forAll(gen) { t =>
      val gaps = t.sliding(2).map(p => p(1) - p(0)).toArray.sorted
      val expect =
        if (gaps.length % 2 == 1) gaps(gaps.length / 2)
        else (gaps(gaps.length / 2 - 1) + gaps(gaps.length / 2)) / 2.0
      SeriesMath.medianDt(t) == expect
    })
  }
}
