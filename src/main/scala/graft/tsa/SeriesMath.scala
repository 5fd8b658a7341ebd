package graft.tsa

/** Plain-Scala numerical kernels used by the per-series `mapGroups`
  * operators (EMD sifting, Butterworth filtfilt, GP likelihoods).
  * These run inside executors on ONE series at a time — the 100 TB
  * axis is the number of series, so none of this touches the driver.
  */
object SeriesMath {

  /** Strict local maxima indices; include_edges mirrors reference
    * core.py:283 (Signal.find_peaks). */
  def findPeaks(y: Array[Double], includeEdges: Boolean): Array[Int] = {
    val out = Array.newBuilder[Int]
    if (includeEdges && y.length > 0) out += 0
    var i = 1
    while (i < y.length - 1) {
      if (y(i) > y(i - 1) && y(i) > y(i + 1)) out += i
      i += 1
    }
    if (includeEdges && y.length > 1) out += y.length - 1
    out.result()
  }

  def findDips(y: Array[Double], includeEdges: Boolean): Array[Int] =
    findPeaks(y.map(v => -v), includeEdges)

  /** Natural cubic spline through (xs, ys), evaluated at xq.
    * Replaces scipy.interpolate.splrep/splev in the envelope
    * interpolation (reference core.py:741 get_envelope). */
  /** Natural cubic spline coefficients over strictly increasing knots
    * (requires n ≥ 3): arrays (b, c, d) of length n−1 such that on
    * [xs(i), xs(i+1)] the spline is
    * S(x) = ys(i) + b(i)·dx + c(i)·dx² + d(i)·dx³ with dx = x − xs(i).
    * Second derivatives via the Thomas algorithm (natural boundary:
    * M0 = Mn−1 = 0). Shared by splineEval (the EMD envelope kernel)
    * and the ts_spline_coeffs query. */
  def splineCoeffs(xs: Array[Double], ys: Array[Double])
      : (Array[Double], Array[Double], Array[Double]) = {
    val n = xs.length
    val h = Array.tabulate(n - 1)(i => xs(i + 1) - xs(i))
    val alpha = new Array[Double](n)
    var i = 1
    while (i < n - 1) {
      alpha(i) = 3.0 * ((ys(i + 1) - ys(i)) / h(i) - (ys(i) - ys(i - 1)) / h(i - 1))
      i += 1
    }
    val l = new Array[Double](n); val mu = new Array[Double](n)
    val z = new Array[Double](n)
    l(0) = 1.0
    i = 1
    while (i < n - 1) {
      l(i) = 2.0 * (xs(i + 1) - xs(i - 1)) - h(i - 1) * mu(i - 1)
      mu(i) = h(i) / l(i)
      z(i) = (alpha(i) - h(i - 1) * z(i - 1)) / l(i)
      i += 1
    }
    val c = new Array[Double](n)
    i = n - 2
    while (i >= 1) { c(i) = z(i) - mu(i) * c(i + 1); i -= 1 }
    val b = new Array[Double](n - 1); val d = new Array[Double](n - 1)
    i = 0
    while (i < n - 1) {
      b(i) = (ys(i + 1) - ys(i)) / h(i) - h(i) * (c(i + 1) + 2.0 * c(i)) / 3.0
      d(i) = (c(i + 1) - c(i)) / (3.0 * h(i))
      i += 1
    }
    (b, c.take(n - 1), d)
  }

  def splineEval(xs: Array[Double], ys: Array[Double],
      xq: Array[Double]): Array[Double] = {
    val n = xs.length
    if (n == 0) return xq.map(_ => Double.NaN)
    if (n == 1) return xq.map(_ => ys(0))
    if (n == 2) {
      val m = (ys(1) - ys(0)) / (xs(1) - xs(0))
      return xq.map(x => ys(0) + m * (x - xs(0)))
    }
    val (b, c, d) = splineCoeffs(xs, ys)
    xq.map { x =>
      // segment lookup (xq need not be sorted); clamp to spline domain
      var lo = 0; var hi = n - 2
      if (x <= xs(0)) lo = 0
      else if (x >= xs(n - 1)) lo = n - 2
      else {
        while (lo < hi) {
          val mid = (lo + hi + 1) / 2
          if (xs(mid) <= x) lo = mid else hi = mid - 1
        }
      }
      val dx = x - xs(lo)
      ys(lo) + b(lo) * dx + c(lo) * dx * dx + d(lo) * dx * dx * dx
    }
  }

  /** Pad extrema by odd reflection about the series ends — mirrors
    * reference core.py:762 (pad mode="reflect", reflect_type="odd" on
    * time, plain reflect on value, then drop of the pivot samples). */
  def padExtrema(tx: Array[Double], ty: Array[Double], padWidth: Int,
      t0: Double, t1: Double): (Array[Double], Array[Double]) = {
    if (padWidth == 0 || tx.length < 2) return (tx, ty)
    val k = math.min(padWidth, tx.length - 1)
    val leftT = (1 to k).map(i => 2.0 * tx(0) - tx(i)).reverse.toArray
    val leftY = (1 to k).map(i => ty(i)).reverse.toArray
    val n = tx.length
    val rightT = (1 to k).map(i => 2.0 * tx(n - 1) - tx(n - 1 - i)).toArray
    val rightY = (1 to k).map(i => ty(n - 1 - i)).toArray
    (leftT ++ tx ++ rightT, leftY ++ ty ++ rightY)
  }

  /** Upper/lower cubic-spline envelopes through padded peaks/dips —
    * reference core.py:741 (get_envelope). Returns null when the
    * signal lacks extrema for interpolation. */
  /** Pad, then drop the edge pivot samples — the reference pads around
    * the signal edges and removes the edges themselves
    * (core.py:762 `.pad(...).drop([pad_width, -pad_width-1])`), so the
    * envelope is NOT forced through the boundary values. */
  private def padAndDrop(tx: Array[Double], ty: Array[Double], k: Int)
      : (Array[Double], Array[Double]) = {
    val (pt, py) = padExtrema(tx, ty, k, tx(0), tx.last)
    if (k == 0) return (pt, py)
    val n = tx.length
    val keep = pt.indices.filter(i => i != k && i != k + n - 1).toArray
    (keep.map(pt), keep.map(py))
  }

  /** The padded-extrema spline KNOTS behind `envelopes` — exposed so
    * ts_envelope can dump per-interval spline coefficients and replay
    * the evaluation declaratively. Returns ((upper knots t, y),
    * (lower knots t, y)), or null exactly when `envelopes` would. */
  def envelopeKnots(t: Array[Double], y: Array[Double], padWidth: Int)
      : ((Array[Double], Array[Double]), (Array[Double], Array[Double])) = {
    val pk = findPeaks(y, includeEdges = true)
    val dp = findDips(y, includeEdges = true)
    if (pk.length < 2 + padWidth || dp.length < 2 + padWidth) return null
    val (put, puy) = padAndDrop(pk.map(t), pk.map(y), padWidth)
    val (plt, ply) = padAndDrop(dp.map(t), dp.map(y), padWidth)
    if (put.length < 4 || plt.length < 4) return null
    ((put, puy), (plt, ply))
  }

  def envelopes(t: Array[Double], y: Array[Double], padWidth: Int)
      : (Array[Double], Array[Double]) = {
    val k = envelopeKnots(t, y, padWidth)
    if (k == null) return null
    val ((put, puy), (plt, ply)) = k
    (splineEval(put, puy, t), splineEval(plt, ply, t))
  }

  /** One EMD sift step — reference decomposition.py:45 (EMD.sift):
    * local mean + evaluation function sigma + extrema/zero counts. */
  def emdSift(t: Array[Double], y: Array[Double], padWidth: Int)
      : (Array[Double], Array[Double], Int, Int) = {
    val nPeaks = findPeaks(y, includeEdges = false).length
    val nDips = findDips(y, includeEdges = false).length
    var nZero = 0
    var i = 0
    while (i < y.length - 1) {
      if ((y(i) >= 0) != (y(i + 1) >= 0)) nZero += 1
      i += 1
    }
    val env = envelopes(t, y, padWidth)
    if (env == null) return null
    val (upper, lower) = env
    val mu = Array.tabulate(y.length)(j => (upper(j) + lower(j)) / 2.0)
    val amp = Array.tabulate(y.length)(j => (upper(j) - lower(j)) / 2.0)
    val sigma = Array.tabulate(y.length)(j =>
      math.abs(mu(j) / (if (amp(j) == 0.0) 1e-300 else amp(j))))
    (mu, sigma, nPeaks + nDips, nZero)
  }

  /** Full EMD — reference decomposition.py:72-117: sift until the
    * Rilling criteria hold, peel modes until the residue is monotonic.
    * Returns the list of IMFs (the residue is signal - sum(imfs)). */
  def emd(t: Array[Double], y: Array[Double], maxModes: Int = 8,
      maxIter: Int = 200, padWidth: Int = 2, theta1: Double = 0.05,
      theta2: Double = 0.5, alpha: Double = 0.05): List[Array[Double]] = {
    var residue = y.clone()
    var modes = List.empty[Array[Double]]
    var monotonic = y.length < 4
    while (!monotonic && modes.length < maxModes) {
      var mode = residue.clone()
      var isImf = false
      var it = 0
      var broke = false
      while (it < maxIter && !isImf && !broke) {
        emdSift(t, mode, padWidth) match {
          case null => broke = true
          case (mu, sigma, nExt, nZero) =>
            val fracAbove = sigma.count(_ > theta1).toDouble / sigma.length
            isImf = fracAbove < alpha && sigma.forall(_ < theta2) &&
              math.abs(nZero - nExt) <= 1
            if (!isImf) {
              var j = 0
              while (j < mode.length) { mode(j) -= mu(j); j += 1 }
            }
        }
        it += 1
      }
      if (broke && modes.isEmpty && it <= 1) monotonic = true
      else if (broke) monotonic = true
      else {
        modes = modes :+ mode
        var j = 0
        while (j < residue.length) { residue(j) -= mode(j); j += 1 }
        // next round stops if residue is monotonic (no extrema)
        monotonic = findPeaks(residue, includeEdges = false).isEmpty ||
          findDips(residue, includeEdges = false).isEmpty
      }
    }
    modes
  }

  /** Unwrapped instantaneous phase/freq of a normalized FM mode via
    * direct quadrature — reference timefrequency.py:109-116 (HHT DQ). */
  def dqInstantFreq(t: Array[Double], f: Array[Double]): Array[Double] = {
    val n = f.length
    val phi = new Array[Double](n)
    var i = 0
    while (i < n) {
      val c = math.max(-1.0, math.min(1.0, f(i)))
      phi(i) = math.atan2(math.sqrt(1.0 - c * c), c)
      i += 1
    }
    // sign correction by local gradient, then unwrap
    val corr = new Array[Double](n)
    i = 0
    while (i < n) {
      val g = if (i == 0) phi(1) - phi(0)
        else if (i == n - 1) phi(n - 1) - phi(n - 2)
        else (phi(i + 1) - phi(i - 1)) / 2.0
      corr(i) = if (g < 0) -phi(i) else phi(i)
      i += 1
    }
    val unwrapped = new Array[Double](n)
    unwrapped(0) = corr(0)
    i = 1
    while (i < n) {
      var d = corr(i) - corr(i - 1)
      while (d > math.Pi) d -= 2.0 * math.Pi
      while (d < -math.Pi) d += 2.0 * math.Pi
      unwrapped(i) = unwrapped(i - 1) + d
      i += 1
    }
    val freq = new Array[Double](n)
    i = 0
    while (i < n) {
      freq(i) =
        (if (i == 0) (unwrapped(1) - unwrapped(0)) / (t(1) - t(0))
         else if (i == n - 1) (unwrapped(n - 1) - unwrapped(n - 2)) / (t(n - 1) - t(n - 2))
         else (unwrapped(i + 1) - unwrapped(i - 1)) / (t(i + 1) - t(i - 1))) /
          (2.0 * math.Pi)
      i += 1
    }
    freq
  }

  // ----- Butterworth band-pass + filtfilt (reference core.py:776) -----

  private case class C(re: Double, im: Double) {
    def +(o: C) = C(re + o.re, im + o.im)
    def -(o: C) = C(re - o.re, im - o.im)
    def *(o: C) = C(re * o.re - im * o.im, re * o.im + im * o.re)
    def /(o: C) = {
      val d = o.re * o.re + o.im * o.im
      C((re * o.re + im * o.im) / d, (im * o.re - re * o.im) / d)
    }
    def abs2: Double = re * re + im * im
  }

  /** Digital Butterworth band-pass as cascaded biquads (poles via the
    * analog prototype → lp2bp → bilinear transform; zeros at z=±1 per
    * section; exact bilinear gain constant, so the response is the
    * textbook maximally-flat |Ha(j·2fs·tan(πf/fs))| with −3 dB at both
    * band edges). Order = 2·n poles: complex poles conjugate-paired
    * per section, the two REAL band-pass poles an odd-order design
    * produces paired together into one real-pole section (pairing
    * each with itself would square them — 2n+2 poles and a sagging
    * passband). */
  def butterBandpassSos(n: Int, fLo: Double, fHi: Double, fs: Double)
      : Array[Array[Double]] = {
    val w1 = 2.0 * fs * math.tan(math.Pi * fLo / fs)
    val w2 = 2.0 * fs * math.tan(math.Pi * fHi / fs)
    val wo = math.sqrt(w1 * w2)
    val bw = w2 - w1
    // analog prototype poles
    val proto = (0 until n).map { k =>
      val th = math.Pi * (2.0 * k + n + 1.0) / (2.0 * n)
      C(math.cos(th), math.sin(th))
    }
    // lp2bp: s -> (s^2 + wo^2)/(bw*s); poles p -> p*bw/2 ± sqrt((p*bw/2)^2 - wo^2)
    def csqrt(c: C): C = {
      val r = math.hypot(c.re, c.im)
      val a = math.sqrt((r + c.re) / 2.0)
      val b = math.signum(if (c.im == 0.0) 1.0 else c.im) * math.sqrt((r - c.re) / 2.0)
      C(a, b)
    }
    val bpPoles = proto.flatMap { p =>
      val pb = C(p.re * bw / 2.0, p.im * bw / 2.0)
      val disc = csqrt(C(pb.re * pb.re - pb.im * pb.im - wo * wo,
        2.0 * pb.re * pb.im))
      Seq(pb + disc, pb - disc)
    }
    // bilinear: z = (2fs + s) / (2fs - s)
    val zPoles = bpPoles.map(p => (C(2.0 * fs, 0) + p) / (C(2.0 * fs, 0) - p))
    // sections: conjugate pairs for complex poles, the reals (exactly
    // two for odd n, none for even) paired with EACH OTHER
    val tol = 1e-9
    val (reals, cplx) = zPoles.partition(p => math.abs(p.im) <= tol * math.hypot(p.re, p.im))
    val upper = cplx.filter(_.im > 0).sortBy(p => -p.abs2)
    val cplxSecs = upper.map { p =>
      // denominator (z - p)(z - conj(p)) = z^2 - 2Re(p) z + |p|^2
      Array(1.0, 0.0, -1.0, 1.0, -2.0 * p.re, p.abs2) // b0 b1 b2, a0 a1 a2
    }
    val realSecs = reals.map(_.re).sorted.grouped(2).map { g =>
      if (g.length == 2)
        Array(1.0, 0.0, -1.0, 1.0, -(g(0) + g(1)), g(0) * g(1))
      else Array(1.0, 0.0, -1.0, 1.0, -g(0), 0.0)
    }.toSeq
    val sos = (cplxSecs ++ realSecs).toArray
    // exact bilinear gain: H(z) = k (z-1)^n (z+1)^n / Π(z - zp) with
    // k = (bw·2fs)^n / Π(2fs - p_analog)  (real positive: poles are
    // LHP and closed under conjugation)
    var den = C(1.0, 0.0)
    bpPoles.foreach(p => den = den * (C(2.0 * fs, 0) - p))
    val g = math.pow(bw * 2.0 * fs, n) / math.sqrt(den.abs2)
    val gPer = math.pow(g, 1.0 / sos.length)
    sos.foreach { s => s(0) *= gPer; s(1) *= gPer; s(2) *= gPer }
    sos
  }

  private def sosForward(sos: Array[Array[Double]], x: Array[Double],
      zi: Array[Array[Double]]): Array[Double] = {
    var cur = x
    var k = 0
    while (k < sos.length) {
      val s = sos(k)
      val out = new Array[Double](cur.length)
      var w1 = zi(k)(0); var w2 = zi(k)(1)
      var i = 0
      while (i < cur.length) {
        // direct form II transposed
        val yi = s(0) * cur(i) + w1
        w1 = s(1) * cur(i) - s(4) * yi + w2
        w2 = s(2) * cur(i) - s(5) * yi
        out(i) = yi
        i += 1
      }
      cur = out
      k += 1
    }
    cur
  }

  /** scipy.signal.sosfilt_zi analog: per-section DF2T state whose
    * response to a unit-step input is the steady-state output from the
    * first sample, with the cumulative inter-section DC gain baked in.
    * Without it, a signal with a DC offset hits the cascade as a step
    * and the startup transient (far longer than the reflect padding
    * for narrow bands) corrupts the filtered series. */
  /** A double constant as a DuckDB-safe SQL literal: scientific
    * notation is lexed directly as DOUBLE, whereas a bare decimal
    * literal parses as DECIMAL and the DECIMAL→DOUBLE conversion
    * DOUBLE-ROUNDS (int mantissa → double, then ÷10^s in double) —
    * observed 1-ulp drift on cos(2π/16) that broke the FFT oracle's
    * bit-exactness. */
  private[tsa] def sqlDouble(v: Double): String = f"$v%.17e"

  /** Column analog of JVM `math.rint` (round-half-even on the BINARY
    * double) built from IEEE arithmetic alone: adding 2^52 forces the
    * FPU's round-to-nearest-even at the integer grid, subtracting it
    * back recovers the rounded value — exact for |x| < 2^51, far above
    * any 1e6-scaled series value in the corpus. Matches DuckDB
    * roundbankers(x, 0) bit-exactly, unlike Spark `bround`, which ties
    * on the SHORTEST DECIMAL representation via BigDecimal and can
    * differ by one grid step at a decimal .5 boundary whose exact
    * binary value is not a tie. Catalyst does not algebraically fold
    * floating-point (x + c) - c, so the magic-number round survives
    * optimization; all three terms stay inside whole-stage codegen.
    * The negative branch rounds |x| and negates so a negative input
    * rounding to zero yields -0.0 exactly like math.rint (and DuckDB
    * roundbankers) — the driver hashes the SERIALIZED value, where
    * -0.0 vs 0.0 is a mismatch. */
  private[graft] def rintCol(x: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, negate, when}
    val two52 = lit(4503599627370496.0)
    when(x >= 0, x + two52 - two52)
      .otherwise(negate(two52 - x - two52))
  }

  private[tsa] def sosStepZi(sos: Array[Array[Double]]): Array[Array[Double]] = {
    var scale = 1.0
    sos.map { s =>
      val h = (s(0) + s(1) + s(2)) / (s(3) + s(4) + s(5))
      val zi = Array(scale * (h - s(0)), scale * (s(2) - s(5) * h))
      scale *= h
      zi
    }
  }

  /** Zero-phase filtering: odd-reflect pad both ends (scipy padlen
    * 3·(2·sections+1)), forward pass from steady-state initial
    * conditions scaled by the first padded sample, reverse, forward
    * again (state scaled by the forward pass' last sample), reverse,
    * unpad — the scipy.signal.sosfiltfilt shape. */
  def sosFiltFilt(sos: Array[Array[Double]], x: Array[Double]): Array[Double] = {
    val zi = sosStepZi(sos)
    def scaled(v: Double) = zi.map(z => Array(z(0) * v, z(1) * v))
    val pad = math.min(3 * (2 * sos.length + 1), x.length - 1)
    if (pad <= 0) return sosForward(sos, x, scaled(if (x.isEmpty) 0.0 else x(0)))
    val left = (1 to pad).map(i => 2.0 * x(0) - x(i)).reverse
    val right = (1 to pad).map(i => 2.0 * x(x.length - 1) - x(x.length - 1 - i))
    val ext = (left ++ x ++ right).toArray
    val fwd = sosForward(sos, ext, scaled(ext(0)))
    val rev = fwd.reverse
    val bwd = sosForward(sos, rev, scaled(rev(0))).reverse
    bwd.slice(pad, pad + x.length)
  }

  /** Iterative radix-2 FFT (in-place, re/im pairs). n must be a power
    * of two. Standard Cooley–Tukey; used for the Hilbert transform. */
  def fft(re: Array[Double], im: Array[Double], inverse: Boolean): Unit = {
    val n = re.length
    if (n < 2) return
    // bit reversal
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
    var len = 2
    while (len <= n) {
      val ang = (if (inverse) 2.0 else -2.0) * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr = re(base + k + len / 2) * cr - im(base + k + len / 2) * ci
          val vi = re(base + k + len / 2) * ci + im(base + k + len / 2) * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
    if (inverse) {
      i = 0
      while (i < n) { re(i) /= n; im(i) /= n; i += 1 }
    }
  }

  /** Analytic signal via FFT (scipy.signal.hilbert semantics): zero
    * the negative frequencies, double the positive ones. Input length
    * is truncated to a power of two by the caller. Returns (re, im) =
    * (x, Hilbert(x)). */
  def analytic(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = x.clone(); val im = new Array[Double](n)
    fft(re, im, inverse = false)
    var i = 1
    while (i < n / 2) { re(i) *= 2.0; im(i) *= 2.0; i += 1 }
    i = n / 2 + 1
    while (i < n) { re(i) = 0.0; im(i) = 0.0; i += 1 }
    fft(re, im, inverse = true)
    (re, im)
  }

  /** Cholesky decomposition (lower), in place on a copy; returns null
    * if not positive definite. */
  def cholesky(a: Array[Array[Double]]): Array[Array[Double]] = {
    val n = a.length
    val l = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        var s = a(i)(j)
        var k = 0
        while (k < j) { s -= l(i)(k) * l(j)(k); k += 1 }
        if (i == j) {
          if (s <= 0.0) return null
          l(i)(i) = math.sqrt(s)
        } else l(i)(j) = s / l(j)(j)
        j += 1
      }
      i += 1
    }
    l
  }

  /** diag(K⁻¹) for K = L·Lᵀ: column i of L⁻¹ by forward substitution,
    * diag(K⁻¹)ᵢ = ‖L⁻¹eᵢ‖² — the denominators of the GP leave-one-out
    * identities (one O(n³/6) triangular sweep, no full inverse). */
  def choleskyInvDiag(l: Array[Array[Double]]): Array[Double] = {
    val n = l.length
    val diag = new Array[Double](n)
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      var s2 = 0.0
      var k = i
      while (k < n) {
        var s = if (k == i) 1.0 else 0.0
        var j = i
        while (j < k) { s -= l(k)(j) * x(j); j += 1 }
        x(k) = s / l(k)(k)
        s2 += x(k) * x(k)
        k += 1
      }
      diag(i) = s2
      i += 1
    }
    diag
  }

  /** Peak prominences (scipy.signal.peak_prominences analog, no wlen):
    * for each peak, scan left/right until a STRICTLY higher sample or
    * the signal edge, tracking the minimum over the traversed stretch;
    * prominence = y[peak] − max(leftMin, rightMin). Used by the
    * reference's acf_period_quality peak selection (core.py:835-837
    * picks the peak with the LARGEST PROMINENCE, not the tallest). */
  def peakProminences(y: Array[Double], peaks: Array[Int]): Array[Double] =
    peaks.map { p =>
      var leftMin = y(p)
      var i = p - 1
      while (i >= 0 && y(i) <= y(p)) {
        if (y(i) < leftMin) leftMin = y(i)
        i -= 1
      }
      var rightMin = y(p)
      i = p + 1
      while (i < y.length && y(i) <= y(p)) {
        if (y(i) < rightMin) rightMin = y(i)
        i += 1
      }
      y(p) - math.max(leftMin, rightMin)
    }

  /** Deterministic 2-D Nelder–Mead minimizer (standard ρ=1 χ=2 ψ=½ σ=½
    * coefficients, scipy-style initial simplex: each coordinate
    * perturbed by 5%, or 2.5e-4 when zero). Replaces
    * scipy.optimize.minimize in the acf_period_quality exp-cos fit
    * (reference core.py:849) — derivative-free and deterministic, so
    * every executor converges identically. */
  def nelderMead2(f: (Double, Double) => Double, x0: Double, y0: Double,
      maxIter: Int = 400): (Double, Double) = {
    def delta(v: Double) = if (v == 0.0) 2.5e-4 else v * 0.05
    var simplex = Array(
      Array(x0, y0),
      Array(x0 + delta(x0), y0),
      Array(x0, y0 + delta(y0)))
    var fv = simplex.map(p => f(p(0), p(1)))
    var it = 0
    while (it < maxIter &&
        (math.abs(fv(0) - fv(2)) > 1e-8 * (math.abs(fv(0)) + 1e-12) ||
         math.abs(simplex(0)(0) - simplex(2)(0)) +
           math.abs(simplex(0)(1) - simplex(2)(1)) > 1e-6)) {
      // order ascending by f (stable on ties: keep index order)
      val ord = fv.zipWithIndex.sortBy(_._1).map(_._2)
      simplex = ord.map(simplex)
      fv = ord.map(fv)
      val cx = (simplex(0)(0) + simplex(1)(0)) / 2.0
      val cy = (simplex(0)(1) + simplex(1)(1)) / 2.0
      val rx = cx + (cx - simplex(2)(0)); val ry = cy + (cy - simplex(2)(1))
      val fr = f(rx, ry)
      if (fr < fv(0)) {
        val ex = cx + 2.0 * (cx - simplex(2)(0))
        val ey = cy + 2.0 * (cy - simplex(2)(1))
        val fe = f(ex, ey)
        if (fe < fr) { simplex(2) = Array(ex, ey); fv(2) = fe }
        else { simplex(2) = Array(rx, ry); fv(2) = fr }
      } else if (fr < fv(1)) {
        simplex(2) = Array(rx, ry); fv(2) = fr
      } else {
        val (px, py, fBase) =
          if (fr < fv(2)) (rx, ry, fr) else (simplex(2)(0), simplex(2)(1), fv(2))
        val kx = cx + 0.5 * (px - cx); val ky = cy + 0.5 * (py - cy)
        val fk = f(kx, ky)
        if (fk < fBase) { simplex(2) = Array(kx, ky); fv(2) = fk }
        else {
          // shrink toward the best vertex
          var i = 1
          while (i < 3) {
            simplex(i) = Array(
              simplex(0)(0) + 0.5 * (simplex(i)(0) - simplex(0)(0)),
              simplex(0)(1) + 0.5 * (simplex(i)(1) - simplex(0)(1)))
            fv(i) = f(simplex(i)(0), simplex(i)(1))
            i += 1
          }
        }
      }
      it += 1
    }
    val bi = fv.zipWithIndex.minBy(_._1)._2
    (simplex(bi)(0), simplex(bi)(1))
  }

  /** np.median of consecutive diffs (even count → mean of middle two). */
  def medianDt(t: Array[Double]): Double = {
    val d = Array.tabulate(t.length - 1)(i => t(i + 1) - t(i)).sorted
    val n = d.length
    if (n == 0) 0.0
    else if (n % 2 == 1) d(n / 2)
    else (d(n / 2 - 1) + d(n / 2)) / 2.0
  }

  /** Boxcar smooth matching reference Signal.smooth(kernel="boxcar")
    * (core.py:419-429) + ndimage.convolve(mode="mirror"): odd width →
    * `width` unit taps / width; even width → `width+1` taps with
    * half-weight edges / width; mirror boundary reflects about the
    * edge SAMPLE (x[-1] = x[1], x[n] = x[n-2]). */
  def boxcarMirror(x: Array[Double], width: Int): Array[Double] = {
    val w: Array[Double] =
      if (width % 2 == 1) Array.fill(width)(1.0 / width)
      else {
        val a = Array.fill(width + 1)(1.0 / width)
        a(0) /= 2.0; a(width) /= 2.0
        a
      }
    val half = w.length / 2
    val n = x.length
    Array.tabulate(n) { i =>
      var s = 0.0
      var m = 0
      while (m < w.length) {
        var j = i + m - half
        while (j < 0 || j >= n) {
          if (j < 0) j = -j
          if (j >= n) j = 2 * (n - 1) - j
        }
        s += w(m) * x(j)
        m += 1
      }
      s
    }
  }

  /** Verbatim re-expression of reference TSeries.acf_period_quality
    * (core.py:809-853) on ONE raw (possibly non-uniformly sampled)
    * series — the reference never resamples: sosfiltfilt runs on the
    * value array as-is, the FFT-ACF (zero-padded 2×, so circular ≡
    * linear) reduces to the direct lag-product sum, and lag k maps to
    * the ORIGINAL timestamp offset t[k] − t[0]. Time unit must match
    * pMin/pMax (the p_max ≥ 20 smoothing threshold is unit-bearing —
    * day-scale in the reference's own tests).
    *
    * Returns (best_period, height = max peak PROMINENCE, quality). */
  def acfPeriodQualityRef(t: Array[Double], y: Array[Double],
      pMin: Double, pMax: Double): Option[(Double, Double, Double)] = {
    val n = t.length
    if (n < 8) return None
    val mdt = medianDt(t)
    if (!(mdt > 0)) return None
    // ml = np.searchsorted(t - t0, 2*p_max): count of lags < 2·p_max
    var ml = 0
    while (ml < n && t(ml) - t(0) < 2.0 * pMax) ml += 1
    if (ml < 3) return None
    val sos = butterBandpassSos(5, 1.0 / pMax, 1.0 / pMin, 1.0 / mdt)
    val filt = sosFiltFilt(sos, y)
    val mean = filt.sum / n
    val x = filt.map(_ - mean)
    var denom = 0.0
    var i = 0
    while (i < n) { denom += x(i) * x(i); i += 1 }
    if (!(denom > 0)) return None
    var acf = Array.tabulate(ml) { k =>
      var s = 0.0
      var j = 0
      while (j + k < n) { s += x(j) * x(j + k); j += 1 }
      s / denom
    }
    val lags = Array.tabulate(ml)(k => t(k) - t(0))
    if (pMax >= 20.0) { // core.py:831-834 (day-scale constant)
      val width = (pMax / 10.0).toInt
      if (width >= 1) {
        acf = boxcarMirror(acf, width)
        val mx = acf.max
        if (mx != 0.0) acf = acf.map(_ / mx)
      }
    }
    val peaks = findPeaks(acf, includeEdges = false)
    if (peaks.isEmpty) return None
    val proms = peakProminences(acf, peaks)
    var bi = 0
    i = 1
    while (i < proms.length) { if (proms(i) > proms(bi)) bi = i; i += 1 }
    val bestPer = lags(peaks(bi))
    val height = proms(bi)
    if (!(bestPer > 0)) return None
    val tauMax = 20.0 * pMax / bestPer
    def rss(logA: Double, logT: Double): Double = {
      val a = math.exp(logA)
      val tt = math.exp(logT)
      var s = 0.0
      var j = 0
      while (j < ml) {
        val m = a * math.exp(-lags(j) / tt) *
          math.cos(2.0 * math.Pi * lags(j) / bestPer)
        val d = acf(j) - m
        s += d * d
        j += 1
      }
      s
    }
    val (logAmp, logTau) = nelderMead2(rss, 0.0, math.log(bestPer * 2.0))
    val tau = math.min(math.exp(logTau), tauMax)
    val quality = (tau / bestPer) * (ml * height / rss(logAmp, math.log(tau)))
    Some((bestPer, height, quality))
  }

  /** Solve L Lᵀ x = b given lower-triangular L. */
  def choleskySolve(l: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = l.length
    val y = new Array[Double](n)
    var i = 0
    while (i < n) {
      var s = b(i)
      var k = 0
      while (k < i) { s -= l(i)(k) * y(k); k += 1 }
      y(i) = s / l(i)(i)
      i += 1
    }
    val x = new Array[Double](n)
    i = n - 1
    while (i >= 0) {
      var s = y(i)
      var k = i + 1
      while (k < n) { s -= l(k)(i) * x(k); k += 1 }
      x(i) = s / l(i)(i)
      i -= 1
    }
    x
  }
}
