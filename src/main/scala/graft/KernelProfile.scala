package graft

import java.time.LocalDate
import breeze.linalg.{DenseMatrix, DenseVector}
import graft.disagg.{DisaggCore, Kernels, TsFrame}
import graft.time.Frequency

/** Throwaway profiling main for the n=4800 objective-eval components. */
object KernelProfile {
  def timeMs(label: String, reps: Int)(body: => Any): Unit = {
    (0 until 3).foreach(_ => body)
    val t0 = System.nanoTime()
    (0 until reps).foreach(_ => body)
    println(f"$label%-28s ${(System.nanoTime() - t0) / 1e6 / reps}%.1f ms")
  }
  def main(args: Array[String]): Unit = {
    val n = 4800
    val high = {
      val ts = Frequency.parseValidated("MS").nDatesFrom(LocalDate.of(1600, 1, 1), n)
      val cols = Seq(
        "x0" -> Array.tabulate(n)(i => 50.0 + 5.0 * math.sin(i * 0.3) + 0.2 * i),
        "x1" -> Array.fill(n)(1.0))
      TsFrame(ts, cols.map(_._1).toIndexedSeq, cols.map(_._2).toIndexedSeq)
    }
    val low = {
      val ts = Frequency.parseValidated("YS").nDatesFrom(LocalDate.of(1600, 1, 1), 400)
      TsFrame(ts, IndexedSeq("y"),
        IndexedSeq(Array.tabulate(400)(i => 100.0 + 10.0 * math.sin(i * 0.7) + i)))
    }
    val prep = DisaggCore.prepareInputs(low, Some(high), None, "chow-lin")
    val c = DisaggCore.buildConversionMatrix(prep.low.ts, prep.lowFreq,
      prep.high.ts, prep.factor, "sum")
    val mask = (0 until c.rows).filter(i => (0 until c.cols).exists(j => c(i, j) != 0.0))
    val ck = DenseMatrix.tabulate(mask.length, c.cols)((i, j) => c(mask(i), j))
    val y = DenseVector(mask.map(low.data(0)).toArray)
    val x = DenseMatrix.tabulate(n, 2)((i, j) => high.data(j)(i))

    val band = Kernels.chowLinPrecisionBand(0.8, n)
    val ct = ck.t
    timeMs("bandedSpdSolveB", 5) { Kernels.bandedSpdSolveB(band, ct) }
    val z = Kernels.bandedSpdSolveB(band, ct)
    timeMs("sparseRowProduct c*z", 5) { Kernels.sparseRowProduct(ck, z) }
    val csct = Kernels.sparseRowProduct(ck, z) * 1.44
    timeMs("csctOnly total", 5) { Kernels.csctOnly(Kernels.ChowLinCov, 0.8, 1.44, n, ck) }
    timeMs("glsBetaHatFromCsct", 5) { Kernels.glsBetaHatFromCsct(csct, y, x, ck) }
    val beta = Kernels.glsBetaHatFromCsct(csct, y, x, ck)
    val p = x * beta
    timeMs("x*beta", 5) { x * beta }
    timeMs("sparseRowProductVec", 5) { Kernels.sparseRowProductVec(ck, p) }
    val ul = y - Kernels.sparseRowProductVec(ck, p)
    timeMs("logLikelihood", 5) { Kernels.logLikelihood(400, csct, ul) }
    timeMs("objective total", 5) {
      Kernels.negLogLikObjective(0.8, 0.8, y, x, ck, Kernels.ChowLinCov)
    }
  }
}
