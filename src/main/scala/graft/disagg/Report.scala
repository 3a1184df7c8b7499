package graft.disagg

import breeze.linalg.{DenseMatrix, DenseVector}

/** GLS regression report (print_regression_report,
  * /root/reference/tsdisagg/ts_disagg.py:179-210). Print-only — no golden
  * output depends on it. Student-t tail probabilities come from the
  * regularized incomplete beta function (standard continued-fraction
  * evaluation, e.g. Numerical Recipes §6.4 / DLMF 8.17).
  */
object Report {

  /** Regularized incomplete beta I_x(a, b) by Lentz's continued fraction. */
  def betainc(a: Double, b: Double, x: Double): Double = {
    if (x <= 0.0) return 0.0
    if (x >= 1.0) return 1.0
    val lbeta = breeze.numerics.lgamma(a) + breeze.numerics.lgamma(b) -
      breeze.numerics.lgamma(a + b)
    val front = math.exp(a * math.log(x) + b * math.log(1.0 - x) - lbeta)
    def cf(a: Double, b: Double, x: Double): Double = {
      val eps = 1e-15
      val fpmin = 1e-300
      var c = 1.0
      var d = 1.0 - (a + b) * x / (a + 1.0)
      if (math.abs(d) < fpmin) d = fpmin
      d = 1.0 / d
      var h = d
      var m = 1
      var done = false
      while (m <= 300 && !done) {
        val m2 = 2 * m
        var aa = m * (b - m) * x / ((a + m2 - 1.0) * (a + m2))
        d = 1.0 + aa * d
        if (math.abs(d) < fpmin) d = fpmin
        c = 1.0 + aa / c
        if (math.abs(c) < fpmin) c = fpmin
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1.0))
        d = 1.0 + aa * d
        if (math.abs(d) < fpmin) d = fpmin
        c = 1.0 + aa / c
        if (math.abs(c) < fpmin) c = fpmin
        d = 1.0 / d
        val del = d * c
        h *= del
        if (math.abs(del - 1.0) < eps) done = true
        m += 1
      }
      h
    }
    if (x < (a + 1.0) / (a + b + 2.0)) front * cf(a, b, x) / a
    else 1.0 - math.exp(b * math.log(1.0 - x) + a * math.log(x) -
      (breeze.numerics.lgamma(a) + breeze.numerics.lgamma(b) - breeze.numerics.lgamma(a + b))) *
      cf(b, a, 1.0 - x) / b
  }

  /** Student-t survival function P(T > t), df degrees of freedom. */
  def tSf(t: Double, df: Double): Double = {
    val x = df / (df + t * t)
    val tail = 0.5 * betainc(df / 2.0, 0.5, x)
    if (t >= 0) tail else 1.0 - tail
  }

  /** Student-t two-sided critical value t_{1-alpha/2, df} via bisection. */
  def tPpf(p: Double, df: Double): Double = {
    var lo = 0.0
    var hi = 1e3
    var i = 0
    while (i < 200) {
      val mid = (lo + hi) / 2.0
      if (1.0 - tSf(mid, df) < p) lo = mid else hi = mid
      i += 1
    }
    (lo + hi) / 2.0
  }

  def printRegressionReport(
      targetName: String,
      y: DenseVector[Double],
      x: DenseMatrix[Double],
      xNames: Seq[String],
      beta: Array[Double],
      rho: Double,
      sigmaSq: Double,
      stdBeta: Array[Double],
      c: DenseMatrix[Double],
      method: String): Unit = {
    val nObs = x.rows
    val k = x.cols
    val params = beta :+ rho :+ sigmaSq
    val degF = nObs - params.length
    println(s"Dependent Variable: $targetName")
    println(s"GLS Estimates using ${method.capitalize}'s covariance matrix")
    println(s"N = $nObs\t\tdf = $degF")

    val ul = y - c * (x * DenseVector(beta))
    val yMean = breeze.stats.mean(y)
    // reference mixes conventions (ts_disagg.py:188): np.var(ul) is the
    // POPULATION variance, (y - y.mean()).var() is pandas' SAMPLE variance
    val nl = ul.length
    val ulMean = breeze.stats.mean(ul)
    val ssRes = breeze.linalg.sum((ul - ulMean).map(v => v * v)) / nl
    val ssTot = breeze.stats.variance(y - yMean)
    val r2 = 1.0 - ssRes / ssTot
    val adjR2 = 1.0 - (1.0 - r2) * (nObs - 1.0) / (nObs - k - 1.0)
    println(f"Adj r2 = $adjR2%1.4f")
    println("")
    println(f"${"Variable"}%-15s${"coef"}%10s${"sd err"}%15s${"t"}%15s${"P > |t|"}%15s${"[0.025"}%15s${"0.975]"}%15s")
    println("-" * 100)
    val t05 = tPpf(1.0 - 0.05 / 2.0, degF.toDouble)
    for (i <- beta.indices) {
      val tStat = beta(i) / stdBeta(i)
      val pValue = tSf(math.abs(tStat), degF.toDouble)
      val ciLow = beta(i) - stdBeta(i) * t05
      val ciHigh = beta(i) + stdBeta(i) * t05
      val name = if (i < xNames.length) xNames(i) else s"x$i"
      println(f"$name%-15s${beta(i)}%10.4f${stdBeta(i)}%15.4f$tStat%15.4f$pValue%15.4f$ciLow%15.4f$ciHigh%15.4f")
    }
    println("")
    println(f"${"rho"}%-15s$rho%10.4f")
    println(f"${"sigma.sq"}%-15s$sigmaSq%10.4f")
  }
}
