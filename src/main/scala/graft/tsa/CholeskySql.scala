package graft.tsa

/** DuckDB replay of the GP grid-MAP Cholesky chain (round 11).
  *
  * The five GP kernels (reference gp.py:269-539) were the repo's last
  * rows-only family: an O(n³) factorization per (series, trial
  * period). A recursive-CTE replay would materialize every
  * intermediate state row (n steps × n² list state — tens of GB at
  * the sf0.01 gate), which is what rounds 9-10 measured as the
  * blocker. The round-11 observation: `list_reduce` left folds keep
  * the accumulator TRANSIENT — nothing is materialized per step — so
  * the whole factorization runs as nested folds over flat DOUBLE[]
  * accumulators (the round-10 Thomas-solver pattern, taken from
  * scalar sums to a growing triangular matrix):
  *
  *   L = fold over rows i (acc = flat lower triangle, row-major);
  *     each row = fold over columns j ≤ i;
  *       each entry seeds a(i,j) and SUBTRACTS the l_ik·l_jk terms in
  *       ascending k — replicating SeriesMath.cholesky's `s -= …`
  *       sequence exactly (fold subtraction, not sum-then-subtract);
  *   forward/backward triangular solves and the interleaved
  *   (log l_ii, ½·yᵢ·αᵢ) log-likelihood fold follow the same shape.
  *
  * Bit-exactness: all +,−,×,÷,sqrt are IEEE-identical across engines;
  * per-period constants (ω, Q, damping) are Scala-computed `%.17e`
  * literals; only the libm exp/sin/cos in the kernel ENTRIES can
  * drift by ~1 ulp, and the diagonal noise floor (0.2·var) bounds the
  * condition number at ~5n, so the drift reaches the log-likelihood
  * at ≲1e-10 — far inside the kernel's 1e-3 rint grid. A failed
  * factorization (s ≤ 0) poisons the fold with NaN, mapped to the
  * kernel's −∞ before ranking (NaN would sort HIGHEST in DuckDB).
  *
  * Validated cell-exact against the Spark dumps at sf0.001/sf0.01
  * (3000/3000 rows incl. is_best) before wiring.
  */
private[tsa] object CholeskySql {

  private def B(e: String) = s"CAST($e AS BIGINT)"

  /** Subsample (stride to ≤`cap` points), demean, variance CTEs —
    * SeriesOps.perSeries ordering (t, eid) and the grid-MAP harness'
    * stats, ending in `st`(id, n, tarr, yarr, vy, noise). */
  def statsCtes(cap: Int): String =
    s"""ser AS MATERIALIZED (${graft.Tables.seriesSql}),
       |pos AS (SELECT id, t, y,
       |    row_number() OVER (PARTITION BY id ORDER BY t, eid) - 1 AS p
       |  FROM ser),
       |arr AS (SELECT id, list(t ORDER BY p) AS tarr0,
       |    list(y ORDER BY p) AS yarr0, count(*) AS n0
       |  FROM pos GROUP BY id),
       |sub0 AS (SELECT id, tarr0, yarr0, n0,
       |    (n0 + ${cap - 1}) // $cap AS stride FROM arr),
       |sub1 AS (SELECT id, stride, ((n0 - 1) // stride) + 1 AS n,
       |    tarr0, yarr0 FROM sub0),
       |samp AS (SELECT id, n,
       |    list_transform(range(n), q -> tarr0[q * stride + 1]) AS tarr,
       |    list_transform(range(n), q -> yarr0[q * stride + 1]) AS yraw
       |  FROM sub1 WHERE n >= 10),
       |st0 AS (SELECT id, n, tarr, yraw,
       |    list_reduce(list_prepend(0.0, yraw), (a, b) -> a + b) / n AS mean
       |  FROM samp),
       |st1 AS (SELECT id, n, tarr, yraw, mean,
       |    list_transform(yraw, v -> v - mean) AS yarr
       |  FROM st0),
       |st2 AS (SELECT id, n, tarr, yraw, mean, yarr,
       |    greatest(list_reduce(list_prepend(0.0,
       |      list_transform(yarr, v -> v * v)), (a, b) -> a + b) / n,
       |      1e-12) AS vy
       |  FROM st1),
       |st AS (SELECT id, n, tarr, yraw, mean, yarr, vy,
       |    0.2 * vy AS noise
       |  FROM st2)""".stripMargin

  /** The factorization + solves + log-likelihood CTE chain over a
    * source CTE `$src`(id, n, tarr, yarr, vy, noise, <grid cols>…).
    * `entry` is the signal-kernel SQL expression a(i,j) with `__D__`
    * standing for (tᵢ − tⱼ); it may reference vy and any grid column
    * via `s.`-free names (the chain exposes them through `kin`).
    * `keyCols` are carried through (e.g. "j, p"). Emits `llv` with
    * (id, keyCols…, n, tarr, yarr, mean, lmat, xrev, llr) — llr NaN
    * on a failed factorization. */
  def cholCtes(src: String, keyCols: Seq[String], entry: String,
      carry: Seq[String] = Nil): String = {
    val keys = (keyCols ++ carry).mkString(", ")
    val i = B("xi[1]")
    val j = B("xj[1]")
    val k = B("kk")
    def off(ix: String) = s"($ix * ($ix + 1)) // 2"
    def d(ai: String, bj: String) = s"(tarr[$ai + 1] - tarr[$bj + 1])"
    val entIJ = entry.replace("__D__", d(i, j))
    // seed a(i,j); fold subtracts l_ik·l_jk in ascending k (l_jk = the
    // FINISHED row j from the outer accumulator; for the diagonal
    // j = i the row IS the inner accumulator)
    def sCore(ljk: String) =
      s"""list_reduce(list_prepend(
         |              __SEED__,
         |              list_transform(range($j), kk ->
         |                rac[$k + 1] * $ljk)),
         |              (a, b) -> a - b)""".stripMargin
    val sDiag = sCore(s"rac[$k + 1]")
      .replace("__SEED__", s"$entIJ\n              + (noise + 1e-9 * vy)")
    val sOff = sCore(s"lmat0[${off(j)} + $k + 1]")
      .replace("__SEED__", entIJ)
    s"""kin AS (SELECT * FROM $src),
       |chol AS (SELECT id, $keys, n, tarr, yarr, mean, vy, noise,
       |    list_reduce(
       |      list_prepend(CAST([] AS DOUBLE[]),
       |        list_transform(range(n), ii -> [CAST(ii AS DOUBLE)])),
       |      (lmat0, xi) -> list_concat(lmat0,
       |        list_reduce(
       |          list_prepend(CAST([] AS DOUBLE[]),
       |            list_transform(range($i + 1), jj -> [CAST(jj AS DOUBLE)])),
       |          (rac, xj) -> list_concat(rac, [
       |            CASE WHEN $j = $i
       |            THEN (CASE WHEN $sDiag <= 0.0
       |              THEN 'NaN'::DOUBLE
       |              ELSE sqrt($sDiag) END)
       |            ELSE $sOff
       |              / lmat0[${off(j)} + $j + 1]
       |            END ])))) AS lmat
       |  FROM kin),
       |fwd AS (SELECT id, $keys, n, tarr, yarr, mean, vy, noise, lmat,
       |    list_reduce(
       |      list_prepend(CAST([] AS DOUBLE[]),
       |        list_transform(range(n), ii -> [CAST(ii AS DOUBLE)])),
       |      (ac, xi) -> list_concat(ac, [
       |        list_reduce(list_prepend(
       |          yarr[$i + 1],
       |          list_transform(range($i), kk ->
       |            lmat[${off(i)} + $k + 1] * ac[$k + 1])),
       |          (a, b) -> a - b)
       |        / lmat[${off(i)} + $i + 1] ])) AS ys
       |  FROM chol),
       |-- α back-substitution built back-to-front: ac[q+1] holds
       |-- x[n-1-q]; the inner terms walk k = i+1 … n-1 ASCENDING
       |-- (the kernel's subtraction order), reading x[k] = ac[n-k]
       |bwd AS (SELECT id, $keys, n, tarr, yarr, mean, vy, noise, lmat, ys,
       |    list_reduce(
       |      list_prepend(CAST([] AS DOUBLE[]),
       |        list_transform(range(n), q -> [CAST(n - 1 - q AS DOUBLE)])),
       |      (ac, xi) -> list_concat(ac, [
       |        list_reduce(list_prepend(
       |          ys[$i + 1],
       |          list_transform(range(n - 1 - $i), m ->
       |            lmat[(($i + 1 + ${B("m")}) * ($i + 2 + ${B("m")})) // 2
       |                 + $i + 1]
       |            * ac[n - ($i + 1 + ${B("m")})])),
       |          (a, b) -> a - b)
       |        / lmat[${off(i)} + $i + 1] ])) AS xrev
       |  FROM fwd),
       |llv AS (SELECT id, $keys, n, tarr, yarr, mean, vy, noise, lmat, xrev,
       |    list_reduce(
       |      list_prepend((-0.5 * n) * ${SeriesMath.sqlDouble(
                math.log(2.0 * math.Pi))},
       |        flatten(list_transform(range(n), ii -> [
       |          ln(lmat[${off(B("ii"))} + ${B("ii")} + 1]),
       |          0.5 * yarr[${B("ii")} + 1] * xrev[n - ${B("ii")}] ]))),
       |      (a, b) -> a - b) AS llr
       |  FROM bwd)""".stripMargin
  }

  /** Final projection shared by the grid maps: NaN → −∞ (the kernel's
    * failed-factorization value), first-max tie to the smallest grid
    * index, rint at the 1e-3 grid. */
  val gridMapSelect: String =
    s"""ll1 AS (SELECT id, j, p,
       |    CASE WHEN isnan(llr) THEN '-infinity'::DOUBLE ELSE llr END
       |      AS llr
       |  FROM llv),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY id
       |    ORDER BY llr DESC, j ASC) AS r FROM ll1)
       |SELECT id, p AS period,
       |  roundbankers(llr * 1000.0, 0) / 1000.0 AS loglik,
       |  CAST(CASE WHEN r = 1 THEN 1 ELSE 0 END AS INTEGER) AS is_best
       |FROM rk""".stripMargin

  /** Assemble a full grid-map oracle: `gridValues` rows are
    * (j, p, <extra literal cols>…), `entry` the signal kernel with
    * `__D__` (may reference vy and the grid columns by name). */
  def gridMapSql(cap: Int, gridCols: Seq[String], gridValues: Seq[String],
      entry: String): String =
    s"""WITH ${statsCtes(cap)},
       |grid(j, p${gridCols.map(", " + _).mkString}) AS (VALUES
       |  ${gridValues.mkString(",\n  ")}),
       |src0 AS (SELECT s.*, g.* FROM st s, grid g),
       |${cholCtes("src0", Seq("j", "p"), entry)},
       |${gridMapSelect}""".stripMargin
}
