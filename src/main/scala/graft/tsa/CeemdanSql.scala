package graft.tsa

import graft.dedup.Dedup

/** Full-chain DuckDB oracle for `ceemdan_dump` (round 11) — the last
  * sizeable rows-only compute kernel falls. Reference
  * decomposition.py:210 (CEEMDAN); graft kernel:
  * [[SeriesOps2.ceemdanCore]].
  *
  * What made this gateable now: the noise tier moved from a stateful
  * splitmix64 stream + raw Box-Muller (64-bit wrap-around arithmetic
  * DuckDB can't express without overflow, and libm log/cos whose
  * JVM-vs-C 1-ulp drift flips the sift's discrete extrema decisions)
  * to the gls_fap discipline: STATELESS md5-h60 uniforms —
  * bit-identical on both engines — with the Box-Muller result
  * quantized on the repo's 1e-6 rint grid. Downstream of the
  * quantized noise every operation is IEEE rational arithmetic
  * (spline sifts, means, stds, sqrt), which this replay reproduces
  * operand-for-operand, so the dump gate demands FULL bit-equality on
  * the raw doubles (hht_norm precedent).
  *
  * Replay structure (mirrors ceemdanCore statement-for-statement):
  *
  *  1. stride-subsample each series to ≤256 points (integer stride =
  *     len/256, indices 0, s, 2s, …), drop series shorter than 16;
  *  2. σ = population std, residue₀ = y/σ;
  *  3. noise(id,r,i) = rint(1e6·√(−2 ln u1)·cos(2π u2))/1e6 with
  *     u1 = (h60(id_r_i_a)+1)/2^60, u2 = h60(id_r_i_b)/2^60 — the
  *     2^60 scale is an exact exponent shift and int64→double rounds
  *     identically on both engines;
  *  4. noise EMD per (id, r): [[SeriesOps.emdRecGen]] with the
  *     ensemble parameters (maxModes=4, maxIter=15);
  *  5. per mode k ∈ 0..3 (unrolled — the ensemble loop is a fixed
  *     4-step recurrence): β = 0.2·std(residue); b = β/nsd for k=0
  *     (nsd>0) else β; noisy_r = residue + b·noiseMode_{r,k} (residue
  *     alone when the noise EMD produced < k+1 modes); one-mode EMD
  *     per (id, r) extracts mode_r (noisy itself when the sift broke
  *     immediately); µ(i) = Σ_r (noisy_r−mode_r)(i)/10 in the
  *     kernel's 0.0-seeded r-ascending fold order (a fixed-width
  *     first(·) FILTER pivot summed as the literal left-assoc chain);
  *     residue ← µ; the decomposition continues past k only when a
  *     maxModes=2 check-EMD of the new residue yields 2 modes
  *     (rimfs.length ≤ 1 stops the kernel's while loop).
  *
  * Cost shape: every recursion row carries one ≤256-point series;
  * rows leave the recursion exactly when the kernel's loops end.
  * The Spark kernel itself is untouched scale-wise — one mapGroups
  * pass per series, linear in series count. */
object CeemdanSql {
  private val P60 = "1152921504606846976.0" // 2^60, exact
  private val TwoPi = "6.283185307179586" // 2.0 * math.Pi, exact double

  private def h60(e: String): String = Dedup.h60Sql(e)

  /** The stateless quantized Box-Muller draw for sample i of
    * realization r of series id — twin of SeriesOps2.gaussianNoise. */
  private def noiseExpr(id: String, r: String, i: String): String = {
    val ha = h60(s"$id || '_' || $r || '_' || $i || '_a'")
    val hb = h60(s"$id || '_' || $r || '_' || $i || '_b'")
    s"""roundbankers(
       |      sqrt(-2.0 * ln((CAST($ha AS DOUBLE) + 1.0) / $P60))
       |      * cos($TwoPi * (CAST($hb AS DOUBLE) / $P60))
       |      * 1000000.0, 0) / 1000000.0""".stripMargin
  }

  /** 0.0-seeded left-fold sum of a list expression (Array.sum twin). */
  private def foldSum(l: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $l), (a, b) -> a + b)"

  /** Population std in the kernel's exact shape:
    * sqrt(Σ(v−mean)² / n) with mean = Σv / n, both 0.0-seeded folds.
    * `src` must expose the list as column `arr` and its length `na`;
    * emits columns (…, sd). */
  private def stdLayer(pre: String): String =
    s"""SELECT * EXCLUDE (ma),
       |  sqrt(${foldSum("list_transform(arr, v -> (v - ma) * (v - ma))")}
       |    / na) AS sd
       |FROM (SELECT *, ${foldSum("arr")} / na AS ma FROM ($pre))""".stripMargin

  /** One ensemble block for mode k: β from the residue table, the
    * k-th noise modes, the 10 noisy inputs, the one-mode extraction
    * recursion, and the (noisy, extracted) pairs. `resCte` exposes
    * (id, tarr, n, res). */
  private def block(k: Int, resCte: String): String = {
    val mean10 = (0 until 10)
      .map(r => s"d$r[i+1]")
      .foldLeft("CAST(0.0 AS DOUBLE)")((acc, d) => s"($acc + $d)")
    val pivots = (0 until 10)
      .map(r => s"first(df) FILTER (WHERE r = $r) AS d$r")
      .mkString(",\n       |    ")
    val core =
      s"""bt$k AS (
       |  SELECT id, tarr, n, res,
       |    0.2 * sd AS beta
       |  FROM (${stdLayer(s"SELECT id, tarr, n, res, res AS arr, n AS na FROM $resCte")})),
       |nm$k AS (
       |  SELECT id, r, arr AS nm, sd AS nsd
       |  FROM (${stdLayer(
        s"SELECT id, r, marr AS arr, len(marr) AS na FROM nemd WHERE accepted AND k = $k")})),
       |en$k AS MATERIALIZED (
       |  SELECT id, r, tarr, n, res,
       |    CASE WHEN nm IS NULL THEN res
       |         ELSE list_transform(range(n), i -> res[i+1] + bb * nm[i+1])
       |    END AS yarr
       |  FROM (
       |    SELECT b.id, z.r, b.tarr, b.n, b.res, m.nm,
       |      CASE WHEN $k = 0 AND m.nsd > 0 THEN b.beta / m.nsd
       |           ELSE b.beta END AS bb
       |    FROM bt$k b CROSS JOIN rz z
       |    LEFT JOIN nm$k m ON m.id = b.id AND m.r = z.r)),
       |${SeriesOps.emdRecGen(s"ex$k", s"en$k", Seq("id", "r"),
        maxModes = 1, maxIter = 15)},
       |md$k AS MATERIALIZED (
       |  SELECT e.id, e.r, e.tarr, e.n, e.res,
       |    e.yarr AS noisy, coalesce(x.marr, e.yarr) AS md
       |  FROM en$k e
       |  LEFT JOIN (SELECT id, r, marr FROM ex$k WHERE accepted) x
       |    ON x.id = e.id AND x.r = e.r)""".stripMargin
    val next = if (k == 3) "" else
      s""",
       |dk$k AS (
       |  SELECT id, r, tarr, n,
       |    list_transform(range(n), i -> noisy[i+1] - md[i+1]) AS df
       |  FROM md$k),
       |rs${k + 1} AS (
       |  SELECT id, tarr, n,
       |    list_transform(range(n), i -> $mean10 / 10.0) AS res
       |  FROM (
       |    SELECT id, first(tarr) AS tarr, first(n) AS n,
       |    $pivots
       |    FROM dk$k GROUP BY id)),
       |cb$k AS (SELECT id, tarr, res AS yarr FROM rs${k + 1}),
       |${SeriesOps.emdRecGen(s"ck$k", s"cb$k", Seq("id"),
        maxModes = 2, maxIter = 15)},
       |rs${k + 1}f AS MATERIALIZED (
       |  SELECT s.* FROM rs${k + 1} s
       |  JOIN (SELECT id FROM ck$k WHERE accepted
       |        GROUP BY id HAVING count(*) > 1) l ON l.id = s.id)"""
        .stripMargin
    core + next
  }

  val ceemdanDumpSql: String = {
    val blocks = (0 to 3)
      .map(k => block(k, if (k == 0) "rs0" else s"rs${k}f"))
      .mkString(",\n")
    val outs = (0 to 3)
      .map(k => s"SELECT id, $k AS kk, r, tarr, noisy, md FROM md$k")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH RECURSIVE
       |ser AS MATERIALIZED (${graft.Tables.seriesSql}),
       |b0 AS (
       |  SELECT id, list(t ORDER BY t, eid) AS t0,
       |    list(y ORDER BY t, eid) AS y0
       |  FROM ser GROUP BY 1),
       |sb AS (
       |  SELECT id, t0, y0, greatest(1, len(t0) // 256) AS stride,
       |    (len(t0) + greatest(1, len(t0) // 256) - 1)
       |      // greatest(1, len(t0) // 256) AS n
       |  FROM b0),
       |st AS MATERIALIZED (
       |  SELECT id, n,
       |    list_transform(range(n), j -> t0[j * stride + 1]) AS tarr,
       |    list_transform(range(n), j -> y0[j * stride + 1]) AS ys
       |  FROM sb WHERE n >= 16),
       |sg AS MATERIALIZED (
       |  SELECT id, tarr, n, sd AS sigma,
       |    list_transform(arr, v -> v / sd) AS yn
       |  FROM (${stdLayer("SELECT id, tarr, n, ys AS arr, n AS na FROM st")})
       |  WHERE sd > 0),
       |rs0 AS (SELECT id, tarr, n, yn AS res FROM sg),
       |rz AS (SELECT unnest(range(10)) AS r),
       |nzb AS MATERIALIZED (
       |  SELECT s.id, z.r, s.tarr,
       |    list_transform(range(s.n), i ->
       |      ${noiseExpr("s.id", "z.r", "i")}) AS yarr
       |  FROM rs0 s CROSS JOIN rz z),
       |${SeriesOps.emdRecGen("nemd", "nzb", Seq("id", "r"),
        maxModes = 4, maxIter = 15)},
       |$blocks,
       |outp AS (
       |  $outs)
       |SELECT o.id, CAST(o.kk AS INTEGER) AS k, CAST(o.r AS INTEGER) AS r,
       |  o.tarr[q.q + 1] AS t, o.noisy[q.q + 1] AS noisy,
       |  o.md[q.q + 1] AS md, g.sigma, g.yn[q.q + 1] AS res0
       |FROM outp o JOIN sg g ON g.id = o.id,
       |  LATERAL (SELECT unnest(range(len(o.noisy))) AS q) q"""
      .stripMargin
  }
}
