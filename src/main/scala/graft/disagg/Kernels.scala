package graft.disagg

import breeze.linalg._

/** Dense linear-algebra kernels for temporal disaggregation — driver-side
  * (or executor-side in the many-series mode), Breeze-backed.
  *
  * 1:1 with the reference's numeric layer
  * (/root/reference/tsdisagg/ts_disagg.py:84-176) including its quirks:
  * the `(1+rho)` variance correction in the ML objective (ts_disagg.py:144)
  * is replicated verbatim because the R-golden outputs depend on it.
  *
  * Series lengths in the supported econometric regime are O(10^2..10^3)
  * (largest reference fixture n=474), so O(n^2) memory / O(n^3) solves on a
  * single node are the right tool; cluster scale comes from running MANY
  * independent series in parallel (see Disaggregate.manySeries), never from
  * distributing one series' linear algebra.
  */
object Kernels {

  /** Lower-bidiagonal difference matrix raised to the h-th power
    * (build_difference_matrix, ts_disagg.py:90-93). h=0 gives identity.
    */
  def differenceMatrix(n: Int, h: Int): DenseMatrix[Double] = {
    val d = DenseMatrix.eye[Double](n)
    var i = 1
    while (i < n) { d(i, i - 1) = -1.0; i += 1 }
    h match {
      case 0 => DenseMatrix.eye[Double](n)
      case 1 => d
      case _ =>
        var acc = d
        var k = 1
        while (k < h) { acc = acc * d; k += 1 }
        acc
    }
  }

  /** AR(1) Toeplitz covariance `rho^|i-j| * s2/(1-rho^2)`
    * (build_chao_lin_covariance, ts_disagg.py:100-107).
    */
  def chowLinCovariance(rho: Double, sigmaSq: Double, n: Int): DenseMatrix[Double] = {
    val scale = sigmaSq / (1.0 - rho * rho)
    // Toeplitz: precompute the scaled power ladder once (n multiplications)
    // instead of n^2 math.pow calls
    val pow = new Array[Double](n)
    var i = 0
    var acc = scale
    while (i < n) { pow(i) = acc; acc *= rho; i += 1 }
    DenseMatrix.tabulate(n, n)((i, j) => pow(math.abs(i - j)))
  }

  /** Litterman random-walk-AR(1) covariance
    * `s2 * (D' H' H D)^-1`, `H = I - rho*subdiag`
    * (build_litterman_covariance, ts_disagg.py:110-114).
    */
  def littermanCovariance(rho: Double, sigmaSq: Double, n: Int): DenseMatrix[Double] = {
    val d = differenceMatrix(n, 1)
    val h = DenseMatrix.tabulate(n, n) { (i, j) =>
      if (i == j) 1.0 else if (i == j + 1) -rho else 0.0
    }
    val a = d.t * h.t * h * d
    (a \ DenseMatrix.eye[Double](n)) * sigmaSq
  }

  /** Denton covariance `(D'D)^-1` with the optional proportional scaling
    * `D <- D diag(1/(x * mean(x)))` (build_denton_covariance,
    * ts_disagg.py:155-161).
    */
  def dentonCovariance(
      n: Int, x: DenseVector[Double], h: Int, proportional: Boolean): DenseMatrix[Double] = {
    var d = differenceMatrix(n, h)
    if (proportional) {
      val m = breeze.stats.mean(x)
      val inv = x.map(v => 1.0 / v / m)
      d = d * diag(inv)
    }
    (d.t * d) \ DenseMatrix.eye[Double](n)
  }

  /** Denton-Cholette distribution matrix W_θ — the x-block of the KKT
    * solution of  min x' D'D x  s.t.  C x = y  (the Cholette correction
    * slices the top h rows off the difference matrix,
    * build_denton_charlotte_distribution_matrix, ts_disagg.py:164-176; only
    * the used `w_theta = W[:n, n:]` block is computed — the reference's
    * dead statement at :174 is not ported, SURVEY.md §1.4).
    *
    * Solved by BANDED regularized elimination instead of the dense
    * (n+nl)² KKT LU: with A = D'D (bandwidth h, built from the h-difference
    * stencil in O(n h²) — never as a dense D'D product) and
    * M = A + ρ C'C (C'C is block-diagonal with blocks ≤ the conversion
    * factor, so M is banded SPD; ρ balances the two terms' scales and
    * cancels algebraically), the KKT solution is
    *   W_θ = M⁻¹ C' S⁻¹,  S = C M⁻¹ C'
    * for ANY ρ > 0: O(n w² + n w nl + n nl²) instead of O((n+nl)³) — the
    * n=2400 shape drops from ~3.9 s to ~50 ms (reference: 2.08 s). Equality
    * with the dense KKT is pinned in KernelsSpec across agg shapes.
    */
  def dentonCholetteDistribution(
      n: Int, nl: Int, c: DenseMatrix[Double], x: DenseVector[Double],
      h: Int, proportional: Boolean): DenseMatrix[Double] = {
    // column scalings s_j (proportional: D <- D diag(1/(x*mean(x))))
    val s = new Array[Double](n)
    if (proportional) {
      val m = breeze.stats.mean(x)
      var j = 0
      while (j < n) { s(j) = 1.0 / x(j) / m; j += 1 }
    } else java.util.Arrays.fill(s, 1.0)
    // h-th difference stencil: row i (i >= h) has (-1)^k binom(h,k) at col i-k
    val coef = new Array[Double](h + 1)
    coef(0) = 1.0
    var k = 1
    while (k <= h) { coef(k) = -coef(k - 1) * (h - k + 1).toDouble / k; k += 1 }
    // bandwidth: the A-part contributes h; the C'C part the widest row support
    var wC = 0
    var r = 0
    while (r < nl) {
      var lo = -1; var hi = -1
      var j = 0
      while (j < n) {
        if (c(r, j) != 0.0) { if (lo < 0) lo = j; hi = j }
        j += 1
      }
      if (lo >= 0 && hi - lo > wC) wC = hi - lo
      r += 1
    }
    val w = math.max(h, wC)
    val mMat = DenseMatrix.zeros[Double](n, n)
    // A = D'D from the stencil, band-filled in O(n h^2)
    var i = h
    while (i < n) {
      var k1 = 0
      while (k1 <= h) {
        val v1 = coef(k1) * s(i - k1)
        var k2 = 0
        while (k2 <= h) {
          mMat(i - k1, i - k2) += v1 * coef(k2) * s(i - k2)
          k2 += 1
        }
        k1 += 1
      }
      i += 1
    }
    // scale-balancing rho (cancels in W_theta; conditions M)
    var diagSum = 0.0
    var j = 0
    while (j < n) { diagSum += mMat(j, j); j += 1 }
    val rho = if (diagSum > 0.0) diagSum / n else 1.0
    // + rho C'C (block-diagonal band fill)
    r = 0
    while (r < nl) {
      var j1 = 0
      while (j1 < n) {
        val v1 = c(r, j1)
        if (v1 != 0.0) {
          var j2 = math.max(0, j1 - w)
          val jHi = math.min(n - 1, j1 + w)
          while (j2 <= jHi) {
            val v2 = c(r, j2)
            if (v2 != 0.0) mMat(j1, j2) += rho * v1 * v2
            j2 += 1
          }
        }
        j1 += 1
      }
      r += 1
    }
    val g = bandedSpdSolve(mMat, w, c.t)  // M^-1 C'  (n x nl)
    val sMat = c * g                      // S = C M^-1 C'  (nl x nl, SPD)
    (sMat \ g.t).t                        // G S^-1  (S symmetric)
  }

  /** Dense KKT reference implementation of [[dentonCholetteDistribution]] —
    * kept as the equality spec for the banded path (KernelsSpec).
    */
  def dentonCholetteDistributionDense(
      n: Int, nl: Int, c: DenseMatrix[Double], x: DenseVector[Double],
      h: Int, proportional: Boolean): DenseMatrix[Double] = {
    var d = differenceMatrix(n, h)(h until n, ::).toDenseMatrix
    if (proportional) {
      val m = breeze.stats.mean(x)
      val inv = x.map(v => 1.0 / v / m)
      d = d * diag(inv)
    }
    val dtd = d.t * d
    val w1 = DenseMatrix.vertcat(
      DenseMatrix.horzcat(dtd, c.t),
      DenseMatrix.horzcat(c, DenseMatrix.zeros[Double](nl, nl)))
    val rhs = DenseMatrix.vertcat(
      DenseMatrix.zeros[Double](n, nl), DenseMatrix.eye[Double](nl))
    val w = w1 \ rhs
    w(0 until n, ::).toDenseMatrix
  }

  /** Residual-distribution matrix `D = S C' (C S C')^-1`, computed as a solve
    * (build_distribution_matrix, ts_disagg.py:96-97).
    */
  def distributionMatrix(sigma: DenseMatrix[Double], c: DenseMatrix[Double]): DenseMatrix[Double] = {
    val csct = c * sigma * c.t
    (csct \ (c * sigma)).t
  }

  /** Denton distribution matrix without the dense `(D'D)^-1`: the Denton
    * covariance is `S = M^-1` with `M = D'D` BANDED (half-bandwidth h, since
    * the h-th difference matrix has h subdiagonals), so `S C'` is a banded
    * Cholesky solve and the distribution matrix follows from one nl x nl
    * solve — O(n h^2 + n h nl) instead of the O(n^3) explicit inverse.
    * Value-equal to `distributionMatrix(dentonCovariance(...), c)` (pinned
    * in KernelsSpec).
    */
  def dentonDistribution(
      n: Int, x: DenseVector[Double], h: Int, proportional: Boolean,
      c: DenseMatrix[Double]): DenseMatrix[Double] = {
    val d = differenceMatrix(n, h)
    if (proportional) {
      val mn = breeze.stats.mean(x)
      // column scaling D <- D diag(1/(x*mean(x))) in place: O(n^2), not a
      // dense n^3 product against a materialized diagonal matrix
      var j = 0
      while (j < n) {
        val s = 1.0 / x(j) / mn
        var i = 0
        while (i < n) { d(i, j) *= s; i += 1 }
        j += 1
      }
    }
    // banded M = D'D: M(i,j) = sum_k D(k,i) D(k,j), with at most h+1 terms
    // (rows of D have nonzeros only in columns [k-h, k])
    val m = DenseMatrix.zeros[Double](n, n)
    var i = 0
    while (i < n) {
      var j = math.max(0, i - h)
      while (j <= math.min(n - 1, i + h)) {
        var s = 0.0
        var k = math.max(i, j)
        val kMax = math.min(n - 1, math.min(i, j) + h)
        while (k <= kMax) { s += d(k, i) * d(k, j); k += 1 }
        m(i, j) = s
        j += 1
      }
      i += 1
    }
    val z = bandedSpdSolve(m, h, c.t) // S C' (n x nl)
    val csct = c * z
    (csct \ z.t).t
  }

  /** The two ML covariance families, as structure-aware product builders.
    *
    * The likelihood objective never needs the n x n covariance itself — only
    * `C S C'` (nl x nl) and `C S` (nl x n). For Litterman the precision matrix
    * `M = D' H' H D` is PENTADIAGONAL (product of two lower-bidiagonal
    * factors), so `S = s2 M^-1` is applied by building M in O(n) and solving
    * `M Z = C'` once per evaluation instead of inverting a dense n x n matrix
    * — this turns the 474-point fixture's per-eval cost from O(4n^3) into one
    * LU + nl triangular solves.
    */
  sealed trait MlCov
  case object ChowLinCov extends MlCov
  case object LittermanCov extends MlCov

  final case class CovProducts(csct: DenseMatrix[Double], cSigma: DenseMatrix[Double])

  /** Tridiagonal AR(1) precision: the Chow-Lin covariance
    * `S = s2/(1-rho^2) * rho^|i-j|` has the closed-form inverse
    * `S^-1 = (1/s2) * B` with `B = tridiag(-rho; 1, 1+rho^2, ..., 1+rho^2, 1; -rho)`
    * — so the ML objective never needs the dense n x n Toeplitz matrix: like
    * the Litterman fast path below, `C S` is one solve `B Z = C'` (O(n)
    * structure, one LU) instead of two dense n^2-sized products per
    * optimizer evaluation.
    */
  def chowLinPrecision(rho: Double, n: Int): DenseMatrix[Double] = {
    if (n == 1) return DenseMatrix((1.0 - rho * rho))
    val m = DenseMatrix.zeros[Double](n, n)
    var i = 0
    while (i < n) {
      m(i, i) = if (i == 0 || i == n - 1) 1.0 else 1.0 + rho * rho
      if (i + 1 < n) { m(i, i + 1) = -rho; m(i + 1, i) = -rho }
      i += 1
    }
    m
  }

  /** Pentadiagonal `M = (H D)' (H D)` with bands {1, -(1+rho), rho}. */
  def littermanPrecision(rho: Double, n: Int): DenseMatrix[Double] = {
    val a = -(1.0 + rho)
    val b = rho
    val m = DenseMatrix.zeros[Double](n, n)
    var j = 0
    while (j < n) {
      var d = 1.0
      if (j + 1 < n) d += a * a
      if (j + 2 < n) d += b * b
      m(j, j) = d
      if (j + 1 < n) {
        var o = a
        if (j + 2 < n) o += a * b
        m(j, j + 1) = o
        m(j + 1, j) = o
      }
      if (j + 2 < n) {
        m(j, j + 2) = b
        m(j + 2, j) = b
      }
      j += 1
    }
    m
  }

  /** Cholesky solve `A Z = R` for a symmetric positive-definite BANDED
    * matrix (half-bandwidth `w`; only the band of `a` is read). The banded
    * factor costs O(n w^2) and each RHS column O(n w) — for the tridiagonal
    * Chow-Lin and pentadiagonal Litterman precisions this replaces the
    * O(n^3) dense LU that dominated the per-evaluation cost (the optimizer
    * calls the objective 100-300 times).
    */
  def bandedSpdSolve(a: DenseMatrix[Double], w: Int, rhs: DenseMatrix[Double]): DenseMatrix[Double] = {
    val n = a.rows
    // column-oriented band storage: l(d)(j) = L(j+d, j), d = 0..w
    val l = Array.ofDim[Double](w + 1, n)
    var j = 0
    while (j < n) {
      // diagonal: L(j,j) = sqrt(A(j,j) - sum_k L(j,k)^2), k >= j-w
      var s = a(j, j)
      var k = math.max(0, j - w)
      while (k < j) { val v = l(j - k)(k); s -= v * v; k += 1 }
      val djj = math.sqrt(s)
      l(0)(j) = djj
      var d = 1
      while (d <= w && j + d < n) {
        val i = j + d
        var s2 = a(i, j)
        var k2 = math.max(0, i - w)
        while (k2 < j) { s2 -= l(i - k2)(k2) * l(j - k2)(k2); k2 += 1 }
        l(d)(j) = s2 / djj
        d += 1
      }
      j += 1
    }
    // forward + back substitution per RHS column
    val m = rhs.cols
    val z = DenseMatrix.zeros[Double](n, m)
    var cidx = 0
    while (cidx < m) {
      // L y = r
      var i = 0
      while (i < n) {
        var s = rhs(i, cidx)
        var d = 1
        while (d <= w && i - d >= 0) { s -= l(d)(i - d) * z(i - d, cidx); d += 1 }
        z(i, cidx) = s / l(0)(i)
        i += 1
      }
      // L' x = y
      i = n - 1
      while (i >= 0) {
        var s = z(i, cidx)
        var d = 1
        while (d <= w && i + d < n) { s -= l(d)(i) * z(i + d, cidx); d += 1 }
        z(i, cidx) = s / l(0)(i)
        i -= 1
      }
      cidx += 1
    }
    z
  }

  /** `C S C'` alone — the only covariance product the ML objective needs.
    * Skips materializing the nl x n `C S` (whose transpose-scale costs more
    * than every solve in the hot path); the full [[covProducts]] runs once
    * per series for the final distribution step, this runs per optimizer
    * evaluation.
    */
  def csctOnly(
      kind: MlCov, rho: Double, sigmaSq: Double, n: Int,
      c: DenseMatrix[Double]): DenseMatrix[Double] = {
    val (prec, w) = kind match {
      case ChowLinCov   => (chowLinPrecision(rho, n), 1)
      case LittermanCov => (littermanPrecision(rho, n), 2)
    }
    val z = bandedSpdSolve(prec, w, c.t) // n x nl
    (c * z) * sigmaSq
  }

  def covProducts(
      kind: MlCov, rho: Double, sigmaSq: Double, n: Int,
      c: DenseMatrix[Double]): CovProducts = kind match {
    case ChowLinCov =>
      val b = chowLinPrecision(rho, n)
      val z = bandedSpdSolve(b, 1, c.t) // n x nl, O(n * nl)
      val cs = z.t * sigmaSq // C S = s2 (B^-1 C')'
      CovProducts(cs * c.t, cs)
    case LittermanCov =>
      val m = littermanPrecision(rho, n)
      val z = bandedSpdSolve(m, 2, c.t) // n x nl, O(n * nl)
      val cs = z.t * sigmaSq // C S = s2 (M^-1 C')'
      CovProducts(cs * c.t, cs)
  }

  /** Apply S^-1 to a skinny matrix (for GLS standard errors). */
  def sigmaInv(kind: MlCov, rho: Double, sigmaSq: Double,
      x: DenseMatrix[Double]): DenseMatrix[Double] = kind match {
    case ChowLinCov   => (chowLinPrecision(rho, x.rows) * x) / sigmaSq
    case LittermanCov => (littermanPrecision(rho, x.rows) * x) / sigmaSq
  }

  /** GLS estimator (GLS_beta_hat, ts_disagg.py:117-131): one factorization of
    * `C S C'` reused for both right-hand sides via a single multi-column solve.
    */
  def glsBetaHat(
      sigma: DenseMatrix[Double], y: DenseVector[Double],
      x: DenseMatrix[Double], c: DenseMatrix[Double]): DenseVector[Double] =
    glsBetaHatFromCsct(c * sigma * c.t, y, x, c)

  def glsBetaHatFromCsct(
      csct: DenseMatrix[Double], y: DenseVector[Double],
      x: DenseMatrix[Double], c: DenseMatrix[Double]): DenseVector[Double] = {
    val cx = c * x
    val rhs = DenseMatrix.horzcat(cx, y.toDenseMatrix.t)
    val z = csct \ rhs // one LU, k+1 right-hand sides
    val z1 = z(::, 0 until cx.cols).toDenseMatrix
    val z2 = z(::, cx.cols).toDenseVector
    val a = cx.t * z1
    val b = cx.t * z2
    a \ b
  }

  /** Concentrated Gaussian log-likelihood (log_likelihood, ts_disagg.py:84-87). */
  def logLikelihood(nl: Int, csct: DenseMatrix[Double], ul: DenseVector[Double]): Double = {
    val ld = logdet(csct)._2
    -nl / 2.0 * math.log(2.0 * math.Pi) - 0.5 * (ld + (ul dot (csct \ ul)))
  }

  /** ML objective over (rho, sigma^2) (f_minimize, ts_disagg.py:134-152).
    * The `(1+rho)` rescaling of sigma^2 (ts_disagg.py:140-144) is the
    * reference's deliberate correction to match R `tempdisagg` — replicated
    * bit-for-bit.
    */
  def negLogLikObjective(
      rho: Double, sigmaSqRaw: Double,
      y: DenseVector[Double], x: DenseMatrix[Double], c: DenseMatrix[Double],
      kind: MlCov): Double = {
    val n = x.rows
    val nl = y.length
    val sigmaSq = (1.0 + rho) * sigmaSqRaw
    val csct = csctOnly(kind, rho, sigmaSq, n, c)
    val beta = glsBetaHatFromCsct(csct, y, x, c)
    val p = x * beta
    val ul = y - c * p
    -logLikelihood(nl, csct, ul)
  }

  /** GLS standard errors `sqrt(diag((X' S^-1 X)^-1))` (ts_disagg.py:452-455),
    * using the structure-aware S^-1 application for each covariance family.
    */
  def glsStdErrors(kind: MlCov, rho: Double, sigmaSq: Double,
      x: DenseMatrix[Double]): DenseVector[Double] = {
    val sInvX = sigmaInv(kind, rho, sigmaSq, x)
    val xtsx = x.t * sInvX
    val invM = xtsx \ DenseMatrix.eye[Double](xtsx.rows)
    DenseVector.tabulate(invM.rows)(i => math.sqrt(invM(i, i)))
  }
}
