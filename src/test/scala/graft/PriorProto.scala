package graft

import graft.tsa.SeriesMath

/** Scratch debug runner for the make_gaussian_prior port — parses the
  * spotted-star npy with plain NIO (no Spark) and prints the per-band
  * sweep + prior argmax so the verbatim test can be calibrated fast.
  * Not a test; kept out of the suite.
  */
object PriorProto {
  def loadNpy2d(path: String): (Array[Double], Array[Double]) = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(8)
    val hlen = bb.getShort() & 0xffff
    val header = new String(bytes, 10, hlen, "ASCII")
    val shape = "\\((\\d+), (\\d+)\\)".r.findFirstMatchIn(header).get
    val rows = shape.group(1).toInt; val cols = shape.group(2).toInt
    require(rows == 3, header)
    bb.position(10 + hlen)
    val t = Array.fill(cols)(bb.getDouble())
    val y = Array.fill(cols)(bb.getDouble())
    (t, y)
  }

  /** Replicates acfPeriodQualityRef's internals with diagnostics. */
  def debugBand(t: Array[Double], y: Array[Double],
      pMin: Double, pMax: Double): Unit = {
    val n = t.length
    val mdt = SeriesMath.medianDt(t)
    var ml = 0
    while (ml < n && t(ml) - t(0) < 2.0 * pMax) ml += 1
    val sos = SeriesMath.butterBandpassSos(5, 1.0 / pMax, 1.0 / pMin, 1.0 / mdt)
    val filt = SeriesMath.sosFiltFilt(sos, y)
    val mean = filt.sum / n
    val x = filt.map(_ - mean)
    val denom = x.map(v => v * v).sum
    var acf = Array.tabulate(ml) { k =>
      var s = 0.0; var j = 0
      while (j + k < n) { s += x(j) * x(j + k); j += 1 }
      s / denom
    }
    val lags = Array.tabulate(ml)(k => t(k) - t(0))
    if (pMax >= 20.0) {
      val width = (pMax / 10.0).toInt
      acf = SeriesMath.boxcarMirror(acf, width)
      val mx = acf.max
      if (mx != 0) acf = acf.map(_ / mx)
    }
    val peaks = SeriesMath.findPeaks(acf, includeEdges = false)
    val proms = SeriesMath.peakProminences(acf, peaks)
    val top = peaks.zip(proms).sortBy(-_._2).take(5)
    println(s"  ml=$ml top peaks (lagIdx, lagT, acf, prom): " +
      top.map { case (p, pr) => f"($p, ${lags(p)}%.3f, ${acf(p)}%.4f, $pr%.4f)" }.mkString(" "))
    val bi = proms.zipWithIndex.maxBy(_._1)._2
    val bestPer = lags(peaks(bi))
    def rss(logA: Double, logT: Double): Double = {
      val a = math.exp(logA); val tt = math.exp(logT)
      var s = 0.0; var j = 0
      while (j < ml) {
        val m = a * math.exp(-lags(j) / tt) * math.cos(2.0 * math.Pi * lags(j) / bestPer)
        val d = acf(j) - m; s += d * d; j += 1
      }
      s
    }
    val x0t = math.log(bestPer * 2.0)
    val (la, lt) = SeriesMath.nelderMead2(rss, 0.0, x0t)
    val tauMax = 20.0 * pMax / bestPer
    val tau = math.min(math.exp(lt), tauMax)
    println(f"  NM: logA=$la%.4f logTau=$lt%.4f (tau=${math.exp(lt)}%.2f) " +
      f"rssAtMin=${rss(la, lt)}%.4f tauMax=$tauMax%.2f tauClamped=$tau%.3f " +
      f"rssClamped=${rss(la, math.log(tau))}%.4f")
    // landscape slice: rss along logTau at logA = la and logA = 0
    val taus = Seq(0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 5.0, 6.0)
    println("  rss(logA=0, logTau=...): " +
      taus.map(v => f"$v%.1f:${rss(0.0, v)}%.3f").mkString(" "))
  }

  /** |H(e^{jw})| of the sos cascade at frequency f (cycles/unit). */
  def sosMag(sos: Array[Array[Double]], f: Double, fs: Double): Double = {
    val w = 2.0 * math.Pi * f / fs
    var re = 1.0; var im = 0.0
    sos.foreach { s =>
      val (c1, s1) = (math.cos(w), -math.sin(w))
      val (c2, s2) = (math.cos(2 * w), -math.sin(2 * w))
      val nr = s(0) + s(1) * c1 + s(2) * c2
      val ni = s(1) * s1 + s(2) * s2
      val dr = s(3) + s(4) * c1 + s(5) * c2
      val di = s(4) * s1 + s(5) * s2
      val qr = (nr * dr + ni * di) / (dr * dr + di * di)
      val qi = (ni * dr - nr * di) / (dr * dr + di * di)
      val r2 = re * qr - im * qi; im = re * qi + im * qr; re = r2
    }
    math.hypot(re, im)
  }

  /** Theoretical digital Butterworth bandpass magnitude via bilinear:
    * |Ha(j·W)| with W = 2·fs·tan(π f/fs), prewarped edges. */
  def butterTheory(f: Double, fLo: Double, fHi: Double, fs: Double, n: Int): Double = {
    def warp(g: Double) = 2.0 * fs * math.tan(math.Pi * g / fs)
    val (w1, w2) = (warp(fLo), warp(fHi))
    val wo2 = w1 * w2; val bw = w2 - w1
    val w = warp(f)
    val u = (w * w - wo2) / (bw * w)
    1.0 / math.sqrt(1.0 + math.pow(u, 2 * n))
  }

  def main(args: Array[String]): Unit = {
    val (t, y) = loadNpy2d("/root/reference/src/periodicity/data/spotted_star.npy")
    println(s"y head=${y.take(3).mkString(",")} mean=${y.sum / y.length} " +
      s"nan=${y.count(_.isNaN)}")
    // filter design validation: band 0 of the sweep
    locally {
      val mdt0 = SeriesMath.medianDt(t)
      val (fLo, fHi, fs) = (1.0 / 1.0, 1.0 / 0.24521072166862723, 1.0 / mdt0)
      val sos = SeriesMath.butterBandpassSos(5, fLo, fHi, fs)
      for (f <- Seq(0.5, 0.8, 1.0, 1.5, 2.0, 3.0, 4.078, 4.5, 5.0, 5.5)) {
        println(f"  f=$f%.3f c/d: |H|=${sosMag(sos, f, fs)}%.5f " +
          f"theory=${butterTheory(f, fLo, fHi, fs, 5)}%.5f")
      }
      // isolate: analog bandpass pole set vs closed form
      val n = 5
      def warp(g: Double) = 2.0 * fs * math.tan(math.Pi * g / fs)
      val (w1, w2) = (warp(fLo), warp(fHi))
      val wo = math.sqrt(w1 * w2); val bw = w2 - w1
      case class Z(re: Double, im: Double) {
        def +(o: Z) = Z(re + o.re, im + o.im)
        def -(o: Z) = Z(re - o.re, im - o.im)
        def *(o: Z) = Z(re * o.re - im * o.im, re * o.im + im * o.re)
        def abs = math.hypot(re, im)
      }
      def zsqrt(c: Z): Z = {
        val r = c.abs
        val a = math.sqrt((r + c.re) / 2.0)
        val b = math.signum(if (c.im == 0.0) 1.0 else c.im) * math.sqrt((r - c.re) / 2.0)
        Z(a, b)
      }
      val proto = (0 until n).map { k =>
        val th = math.Pi * (2.0 * k + n + 1.0) / (2.0 * n)
        Z(math.cos(th), math.sin(th))
      }
      val bp = proto.flatMap { p =>
        val pb = Z(p.re * bw / 2.0, p.im * bw / 2.0)
        val disc = zsqrt(pb * pb - Z(wo * wo, 0))
        Seq(pb + disc, pb - disc)
      }
      println("  bp poles (re, im, |p|): " +
        bp.map(p => f"(${p.re}%.3f, ${p.im}%.3f, ${p.abs}%.3f)").mkString(" "))
      // |Ha(jW)| from poles: bw^n |W|^n / Π|jW - p|
      def anaMag(fq: Double): Double = {
        val w = warp(fq)
        var num = math.pow(bw * w, n)
        var den = 1.0
        bp.foreach(p => den *= (Z(0, w) - p).abs)
        num / den
      }
      for (f <- Seq(1.0, 2.0, 3.0, 4.078))
        println(f"  analog f=$f%.3f: |Ha|=${anaMag(f)}%.5f theory=${butterTheory(f, fLo, fHi, fs, n)}%.5f")
    }
    val mdt = SeriesMath.medianDt(t)
    val baseline = t.last - t.head
    println(s"n=${t.length} mdt=$mdt baseline=$baseline")
    val bands = (0 until 8).map(k => math.pow(2.0, k))
    val pMin = math.max(bands.min / 10.0, 3.0 * mdt)
    println(s"pMin=$pMin surviving=${bands.filter(p => pMin < p && p < baseline / 2)}")
    val results = bands.zipWithIndex
      .filter { case (p, _) => pMin < p && p < baseline / 2 }
      .flatMap { case (pmax, k) =>
        val r = SeriesMath.acfPeriodQualityRef(t, y, pMin, pmax)
        println(f"band $k pmax=$pmax%8.1f -> $r")
        debugBand(t, y, pMin, pmax)
        r
      }
    val sumQ = results.map(r => math.max(r._3, 0.0)).sum
    val comps = results.flatMap { case (p, _, q0) =>
      val q = math.max(q0, 0.0)
      Seq((math.log(p), q * 0.8), (math.log(p / 2), q * 0.1),
        (math.log(2 * p), q * 0.1))
    }
    val logPs = Array.tabulate(1000)(i => -3.0 + 8.0 * i / 999.0)
    def prior(x: Double) = comps.map { case (mu, w) =>
      val z = (x - mu) / 0.1
      w * math.exp(-z * z / 2.0) / (math.sqrt(2 * math.Pi) * 0.1)
    }.sum / sumQ
    val pp = logPs.map(prior)
    val am = pp.indices.maxBy(pp)
    println(s"argmax=$am logP=${logPs(am)} period=${math.exp(logPs(am))}")
    val peaks = (1 until 999).filter(i => pp(i - 1) < pp(i) && pp(i + 1) < pp(i))
    println(s"peaks=${peaks.length} at periods ${peaks.map(i => f"${math.exp(logPs(i))}%.2f").mkString(", ")}")
  }
}
