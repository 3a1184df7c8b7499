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

  /** Denton-Cholette distribution matrix via the KKT block solve; the
    * Cholette correction slices the top h rows off the difference matrix
    * (build_denton_charlotte_distribution_matrix, ts_disagg.py:164-176;
    * only the used `w_theta = W[:n, n:]` block is computed — the reference's
    * dead statement at :174 is not ported, SURVEY.md §1.4).
    */
  def dentonCholetteDistribution(
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
    val w2 = DenseMatrix.vertcat(
      DenseMatrix.horzcat(dtd, DenseMatrix.zeros[Double](n, nl)),
      DenseMatrix.horzcat(c, DenseMatrix.eye[Double](nl)))
    val w = w1 \ w2
    w(0 until n, n until n + nl).toDenseMatrix
  }

  /** Residual-distribution matrix `D = S C' (C S C')^-1`, computed as a solve
    * (build_distribution_matrix, ts_disagg.py:96-97).
    */
  def distributionMatrix(sigma: DenseMatrix[Double], c: DenseMatrix[Double]): DenseMatrix[Double] = {
    val csct = c * sigma * c.t
    (csct \ (c * sigma)).t
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

  def covProducts(
      kind: MlCov, rho: Double, sigmaSq: Double, n: Int,
      c: DenseMatrix[Double]): CovProducts = kind match {
    case ChowLinCov =>
      val sigma = chowLinCovariance(rho, sigmaSq, n)
      val cs = c * sigma
      CovProducts(cs * c.t, cs)
    case LittermanCov =>
      val m = littermanPrecision(rho, n)
      val z = m \ c.t // n x nl
      val cs = z.t * sigmaSq // C S = s2 (M^-1 C')'
      CovProducts(cs * c.t, cs)
  }

  /** Apply S^-1 to a skinny matrix (for GLS standard errors). */
  def sigmaInv(kind: MlCov, rho: Double, sigmaSq: Double,
      x: DenseMatrix[Double]): DenseMatrix[Double] = kind match {
    case ChowLinCov   => chowLinCovariance(rho, sigmaSq, x.rows) \ x
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
    val prod = covProducts(kind, rho, sigmaSq, n, c)
    val beta = glsBetaHatFromCsct(prod.csct, y, x, c)
    val p = x * beta
    val ul = y - c * p
    -logLikelihood(nl, prod.csct, ul)
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
