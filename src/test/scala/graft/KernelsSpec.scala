package graft

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

import graft.disagg.{DisaggCore, Kernels, TsFrame}
import graft.time.Frequency

/** Kernel unit tests against the reference's inline R-derived goldens
  * (/root/reference/tests/test_computations.py).
  */
class KernelsSpec extends AnyFunSuite {

  def assertMatClose(got: DenseMatrix[Double], want: Array[Array[Double]], tol: Double): Unit = {
    assert(got.rows == want.length && got.cols == want.head.length)
    for (i <- want.indices; j <- want(i).indices)
      assert(math.abs(got(i, j) - want(i)(j)) <= tol * math.abs(want(i)(j)) + 1e-6,
        s"($i,$j): ${got(i, j)} != ${want(i)(j)}")
  }

  test("chow-lin covariance 3x3 at rho=0.95 (test_computations.py:14-24)") {
    val want = Array(
      Array(10.25641, 9.74359, 9.25641),
      Array(9.74359, 10.25641, 9.74359),
      Array(9.25641, 9.74359, 10.25641))
    assertMatClose(Kernels.chowLinCovariance(0.95, 1.0, 3), want, 1e-6)
  }

  test("litterman covariance 5x5 at rho=0.95 vs tempdisagg:::CalcQ_Lit (:27-39)") {
    val want = Array(
      Array(1.000000, 1.950000, 2.852500, 3.709875, 4.524381),
      Array(1.950000, 4.802500, 7.512375, 10.086756, 12.532418),
      Array(2.852500, 7.512375, 12.939256, 18.094793, 22.992554),
      Array(3.709875, 10.086756, 18.094793, 26.702429, 34.879682),
      Array(4.524381, 12.532418, 22.992554, 34.879682, 47.172454))
    assertMatClose(Kernels.littermanCovariance(0.95, 1.0, 5), want, 1e-6)
  }

  test("difference matrix and denton covariance shapes") {
    val d1 = Kernels.differenceMatrix(4, 1)
    assert(d1(0, 0) == 1.0 && d1(1, 0) == -1.0 && d1(1, 1) == 1.0 && d1(0, 1) == 0.0)
    val d2 = Kernels.differenceMatrix(4, 2)
    assert(d2(2, 0) == 1.0 && d2(2, 1) == -2.0 && d2(2, 2) == 1.0)
    val cov = Kernels.dentonCovariance(6, DenseVector.ones[Double](6), 1, proportional = true)
    assert(cov.rows == 6 && cov.cols == 6)
  }

  test("litterman fast path (pentadiagonal precision) equals the dense covariance") {
    val n = 7
    val rho = 0.7
    val s2 = 1.3
    val slow = Kernels.littermanCovariance(rho, s2, n)
    val c = DenseMatrix.tabulate(2, n)((i, j) => if (j / 4 == i) 1.0 else 0.0)
    val fast = Kernels.covProducts(Kernels.LittermanCov, rho, s2, n, c)
    val wantCs = c * slow
    val wantCsct = wantCs * c.t
    for (i <- 0 until 2; j <- 0 until n)
      assert(math.abs(fast.cSigma(i, j) - wantCs(i, j)) < 1e-8, s"cSigma($i,$j)")
    for (i <- 0 until 2; j <- 0 until 2)
      assert(math.abs(fast.csct(i, j) - wantCsct(i, j)) < 1e-8, s"csct($i,$j)")
  }

  test("GLS beta-hat vs tempdisagg:::CalcGLS golden (:42-67)") {
    val (lowTs, lowV) = Fixtures.datedValues("AL_Annual_Data_Shorter.csv")
    val (highTs, highV) = Fixtures.datedValues("AL_Quarterly_Data_Modified.csv")

    val lowFreq = Frequency.infer(lowTs).get
    assert(lowFreq.name == "YS-DEC")
    assert(Frequency.infer(highTs).map(_.name) == Some("QS-DEC"))

    val c0 = DisaggCore.buildConversionMatrix(lowTs, lowFreq, highTs, 4, "last")
    // data isn't aligned: tempdisagg drops the first low-frequency observation
    val c = c0(1 until c0.rows, ::).toDenseMatrix
    val y = DenseVector(lowV.drop(1))
    val n = highTs.length
    val x = DenseMatrix.tabulate(n, 2)((i, j) => if (j == 0) 1.0 else highV(i))

    val sigma = Kernels.chowLinCovariance(0.95, 1.0, n)
    val beta = Kernels.glsBetaHat(sigma, y, x, c)
    Fixtures.assertAllClose(beta.toArray, Array(908.6679748, 0.9772889), 1e-6, "GLS beta")
  }

  test("chow-lin tridiagonal precision is the exact inverse of the Toeplitz covariance") {
    import breeze.linalg._
    for (rho <- Seq(1e-5, 0.3, 0.63, 0.95, 1.0 - 1e-5); n <- Seq(1, 2, 7, 40)) {
      val s2 = 2.1
      val sigma = Kernels.chowLinCovariance(rho, s2, n)
      val prec = Kernels.chowLinPrecision(rho, n) / s2
      val prod = sigma * prec
      val err = max(breeze.numerics.abs(prod - DenseMatrix.eye[Double](n)))
      assert(err < 1e-8, s"rho=$rho n=$n max |Sigma*Prec - I| = $err")
    }
  }

  test("bandedSpdSolve matches the dense solve on seeded SPD banded systems") {
    import breeze.linalg._
    val rnd = new scala.util.Random(42)
    for (n <- Seq(5, 23, 60); w <- Seq(1, 2, 3)) {
      // SPD banded with half-bandwidth w: A = B B' + n*I, B lower-banded
      val b = DenseMatrix.zeros[Double](n, n)
      for (i <- 0 until n; j <- math.max(0, i - w) to i) b(i, j) = rnd.nextDouble() - 0.5
      val a = b * b.t + DenseMatrix.eye[Double](n) * n.toDouble
      val rhs = DenseMatrix.tabulate(n, 3)((_, _) => rnd.nextDouble())
      val dense = a \ rhs
      val banded = Kernels.bandedSpdSolve(a, w, rhs)
      val err = max(breeze.numerics.abs(dense - banded))
      assert(err < 1e-9, s"n=$n w=$w max diff $err")
    }
  }

  test("shared-Cholesky SPD helpers match dense solve and logdet") {
    import breeze.linalg._
    val rnd = new scala.util.Random(7)
    for (n <- Seq(4, 17, 40)) {
      val b = DenseMatrix.tabulate(n, n)((_, _) => rnd.nextDouble() - 0.5)
      val a = b * b.t + DenseMatrix.eye[Double](n) * n.toDouble
      val chol = cholesky(a)
      val rhs = DenseMatrix.tabulate(n, 2)((_, _) => rnd.nextDouble())
      val errM = max(breeze.numerics.abs((a \ rhs) - Kernels.spdSolveMat(chol, rhs)))
      assert(errM < 1e-9, s"n=$n spdSolveMat diff $errM")
      val v = DenseVector.tabulate(n)(_ => rnd.nextDouble())
      val errV = max(breeze.numerics.abs((a \ v) - Kernels.spdSolveVec(chol, v)))
      assert(errV < 1e-9, s"n=$n spdSolveVec diff $errV")
      val ldErr = math.abs(logdet(a)._2 - Kernels.spdLogDet(chol))
      assert(ldErr < 1e-9, s"n=$n logdet diff $ldErr")
      // packed precision builders == dense builders (band extraction)
      for (rho <- Seq(0.3, 0.95)) {
        val denseB = Kernels.chowLinPrecision(rho, n)
        val band = Kernels.chowLinPrecisionBand(rho, n)
        for (d <- 0 to 1; j <- 0 until n - d)
          assert(band(d)(j) == denseB(j + d, j), s"chowlin band d=$d j=$j")
        val denseL = Kernels.littermanPrecision(rho, n)
        val bandL = Kernels.littermanPrecisionBand(rho, n)
        for (d <- 0 to 2; j <- 0 until n - d)
          assert(bandL(d)(j) == denseL(j + d, j), s"litterman band d=$d j=$j")
      }
    }
  }

  test("banded denton distribution equals the dense-inverse formulation") {
    import breeze.linalg._
    val n = 20
    val x = DenseVector.tabulate(n)(i => 40.0 + 3.0 * math.sin(i * 0.4) + 0.5 * i)
    val c = DenseMatrix.zeros[Double](5, n)
    for (r <- 0 until 5; j <- 0 until 4) c(r, r * 4 + j) = 1.0
    for (h <- Seq(1, 2); prop <- Seq(true, false)) {
      val dense = Kernels.distributionMatrix(
        Kernels.dentonCovariance(n, x, h, prop), c)
      val banded = Kernels.dentonDistribution(n, x, h, prop, c)
      val err = max(breeze.numerics.abs(dense - banded))
      assert(err < 1e-8, s"h=$h prop=$prop max diff $err")
    }
  }

  test("banded denton-cholette KKT equals the dense KKT across agg shapes") {
    import breeze.linalg._
    val n = 48
    val nl = 11 // one incomplete trailing period left out, like the real mask
    val x = DenseVector.tabulate(n)(i => 40.0 + 3.0 * math.sin(i * 0.4) + 0.5 * i)
    // sum-style C (1s over factor-4 blocks), mean-style (1/4), first/last
    // (single entry at block start/end)
    def blockC(fill: (Int, Int) => Seq[(Int, Double)]): DenseMatrix[Double] = {
      val c = DenseMatrix.zeros[Double](nl, n)
      for (r <- 0 until nl; (j, v) <- fill(r, 4)) c(r, j) = v
      c
    }
    val shapes = Seq(
      "sum" -> blockC((r, f) => (0 until f).map(j => (r * f + j, 1.0))),
      "mean" -> blockC((r, f) => (0 until f).map(j => (r * f + j, 0.25))),
      "first" -> blockC((r, f) => Seq((r * f, 1.0))),
      "last" -> blockC((r, f) => Seq((r * f + f - 1, 1.0))))
    for ((name, c) <- shapes; h <- Seq(1, 2); prop <- Seq(true, false)) {
      val dense = Kernels.dentonCholetteDistributionDense(n, nl, c, x, h, prop)
      val banded = Kernels.dentonCholetteDistribution(n, nl, c, x, h, prop)
      val scale = max(breeze.numerics.abs(dense))
      val err = max(breeze.numerics.abs(dense - banded)) / scale
      assert(err < 1e-8, s"agg=$name h=$h prop=$prop max rel diff $err")
    }
  }

  test("conversion matrix row sums and groupBy equivalence (test_disaggregation.py:96-139)") {
    val lowTs = Fixtures.freqDates("2001-01-01", "YS", 5)
    val highTs = Fixtures.freqDates("2001-01-01", "QS", 20)
    for (agg <- Seq("sum", "mean", "first", "last")) {
      val c = DisaggCore.buildConversionMatrix(lowTs, Frequency.parseValidated("YS"), highTs, 4, agg)
      assert(c.rows == 5 && c.cols == 20)
      val rowSums = (0 until c.rows).map(i => (0 until c.cols).map(j => c(i, j)).sum)
      if (agg == "sum") assert(math.abs(rowSums.max - 4.0) < 1e-12)
      else assert(math.abs(rowSums.max - 1.0) < 1e-12)
      // matrix action == grouped aggregation over a ramp series
      val v = Array.tabulate(20)(_.toDouble + 1.0)
      val got = (0 until c.rows).map(i => (0 until c.cols).map(j => c(i, j) * v(j)).sum)
      val grouped = v.grouped(4).toArray
      val want = agg match {
        case "sum"   => grouped.map(_.sum)
        case "mean"  => grouped.map(g => g.sum / g.length)
        case "first" => grouped.map(_.head)
        case "last"  => grouped.map(_.last)
      }
      Fixtures.assertAllClose(got.toArray, want, 1e-12, s"C action $agg")
    }
  }

  test("incomplete high-freq groups produce all-zero C rows (ts_disagg.py:34-35)") {
    val lowTs = Fixtures.freqDates("2001-01-01", "YS", 3)
    val highTs = Fixtures.freqDates("2001-01-01", "QS", 10) // last year only has 2 quarters
    val c = DisaggCore.buildConversionMatrix(lowTs, Frequency.parseValidated("YS"), highTs, 4, "sum")
    assert((0 until c.cols).forall(j => c(2, j) == 0.0))
    assert((0 until c.cols).map(j => c(0, j)).sum == 4.0)
  }

  test("optimizer finds the bounded minimum of a smooth 2-d bowl") {
    val f = (p: Array[Double]) => {
      val a = p(0) - 0.3
      val b = p(1) - 2.0
      a * a + b * b + 0.5 * a * b
    }
    for (m <- Seq("nelder-mead", "powell", "l-bfgs-b")) {
      val r = graft.disagg.Optimizer.minimize(m, f, Array(0.8, 0.8),
        Array(1e-5, 1e-5), Array(1 - 1e-5, 1e10))
      assert(math.abs(r.x(0) - 0.3) < 1e-5, s"$m rho: ${r.x(0)}")
      assert(math.abs(r.x(1) - 2.0) < 1e-5, s"$m sigma: ${r.x(1)}")
    }
  }
}
