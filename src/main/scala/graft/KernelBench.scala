package graft

import java.time.LocalDate

import breeze.linalg.{DenseMatrix, DenseVector}

import graft.disagg.{DisaggCore, Kernels, TsFrame}
import graft.time.Frequency

/** Driver-side kernel microbenchmarks at the REFERENCE's own problem sizes,
  * so BENCH output is directly comparable to BASELINE.md:
  *
  *   - denton / denton-cholette A->Q end-to-end at n=144 (36 years)
  *     [baseline: 15.9 / 15.8 ms]
  *   - chow-lin objective, single evaluation at n=158, k=2
  *     [baseline: 0.9 ms]
  *   - litterman objective, single evaluation at n=474, k=2
  *     [baseline: 24.0 ms]
  *
  * Synthetic deterministic series (no RNG). Median of `reps` after a JIT
  * warmup.
  */
object KernelBench {

  private def syntheticLow(nYears: Int): TsFrame = {
    val ts = Frequency.parseValidated("YS").nDatesFrom(LocalDate.of(1975, 1, 1), nYears)
    val v = Array.tabulate(nYears)(i => 100.0 + 10.0 * math.sin(i * 0.7) + i)
    TsFrame(ts, IndexedSeq("y"), IndexedSeq(v))
  }

  private def syntheticHigh(freq: String, start: LocalDate, n: Int, k: Int): TsFrame = {
    val ts = Frequency.parseValidated(freq).nDatesFrom(start, n)
    val cols = (0 until k).map {
      case 0 => "x0" -> Array.tabulate(n)(i => 50.0 + 5.0 * math.sin(i * 0.3) + 0.2 * i)
      case j => s"x$j" -> Array.fill(n)(1.0)
    }
    TsFrame(ts, cols.map(_._1).toIndexedSeq, cols.map(_._2).toIndexedSeq)
  }

  private def medianMs(reps: Int, warmup: Int = 50)(body: => Unit): Double = {
    // generous warmup: these kernels are 0.3-10 ms, so even 50 iterations
    // cost well under a second, and the driver reads a single cold-JVM run
    // of this number — it must reflect C2-compiled code, not JIT warmup.
    // (The 100ms-class scaling kernels pass a smaller warmup — same code
    // paths are already C2-hot from the smaller shapes by then.)
    // The GC fence keeps a collection triggered by warmup garbage from
    // landing inside the timed loop (observed 0.7→1.3 ms run-to-run swings
    // on the chow-lin eval without it).
    (0 until warmup).foreach(_ => body)
    System.gc()
    val times = (0 until reps).map { _ =>
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e6
    }
    times.sorted.apply(reps / 2)
  }

  /** name -> median milliseconds. */
  def run(reps: Int = 31): Seq[(String, Double)] = {
    val low36 = syntheticLow(36)

    val dentonMs = medianMs(reps) {
      DisaggCore.run(low36, None, method = "denton", aggFunc = "sum")
    }
    val dcMs = medianMs(reps) {
      DisaggCore.run(low36, None, method = "denton-cholette", aggFunc = "sum")
    }

    // chow-lin objective at the exports_q shape: n=158 quarterly, k=2
    val highQ = syntheticHigh("QS", LocalDate.of(1972, 1, 1), 158, 2)
    val lowQ = syntheticLow(36)
    val prepQ = DisaggCore.prepareInputs(lowQ, Some(highQ), None, "chow-lin")
    val cQ = DisaggCore.buildConversionMatrix(prepQ.low.ts, prepQ.lowFreq,
      prepQ.high.ts, prepQ.factor, "sum")
    val maskQ = (0 until cQ.rows).filter(i => (0 until cQ.cols).exists(j => cQ(i, j) != 0.0))
    val cQk = DenseMatrix.tabulate(maskQ.length, cQ.cols)((i, j) => cQ(maskQ(i), j))
    val yQ = DenseVector(maskQ.map(lowQ.data(0)).toArray)
    val xQ = DenseMatrix.tabulate(158, 2)((i, j) => highQ.data(j)(i))
    val chowLinEvalMs = medianMs(reps) {
      Kernels.negLogLikObjective(0.8, 0.8, yQ, xQ, cQk, Kernels.ChowLinCov)
    }

    // litterman objective at the exports_m shape: n=474 monthly, k=2
    val highM = syntheticHigh("MS", LocalDate.of(1972, 1, 1), 474, 2)
    val lowM = syntheticLow(39)
    val prepM = DisaggCore.prepareInputs(lowM, Some(highM), None, "litterman")
    val cM = DisaggCore.buildConversionMatrix(prepM.low.ts, prepM.lowFreq,
      prepM.high.ts, prepM.factor, "sum")
    val maskM = (0 until cM.rows).filter(i => (0 until cM.cols).exists(j => cM(i, j) != 0.0))
    val cMk = DenseMatrix.tabulate(maskM.length, cM.cols)((i, j) => cM(maskM(i), j))
    val yM = DenseVector(maskM.map(lowM.data(0)).toArray)
    val xM = DenseMatrix.tabulate(474, 2)((i, j) => highM.data(j)(i))
    val littermanEvalMs = medianMs(reps) {
      Kernels.negLogLikObjective(0.8, 0.8, yM, xM, cMk, Kernels.LittermanCov)
    }

    // BASELINE.md scaling rows (reference, same shapes: Y→M synthetic):
    //   objective @ n=2400: 1.19 s/eval   denton-cholette @ n=2400: 2.08 s
    // The banded-precision/banded-KKT kernels are near-linear in n, so these
    // two metrics are where the asymptotic win over the dense reference
    // kernels is directly visible.
    val highBig = syntheticHigh("MS", LocalDate.of(1800, 1, 1), 2400, 2)
    val lowBig = {
      val ts = Frequency.parseValidated("YS").nDatesFrom(LocalDate.of(1800, 1, 1), 200)
      val v = Array.tabulate(200)(i => 100.0 + 10.0 * math.sin(i * 0.7) + i)
      TsFrame(ts, IndexedSeq("y"), IndexedSeq(v))
    }
    val prepB = DisaggCore.prepareInputs(lowBig, Some(highBig), None, "chow-lin")
    val cB = DisaggCore.buildConversionMatrix(prepB.low.ts, prepB.lowFreq,
      prepB.high.ts, prepB.factor, "sum")
    val maskB = (0 until cB.rows).filter(i => (0 until cB.cols).exists(j => cB(i, j) != 0.0))
    val cBk = DenseMatrix.tabulate(maskB.length, cB.cols)((i, j) => cB(maskB(i), j))
    val yB = DenseVector(maskB.map(lowBig.data(0)).toArray)
    val xB = DenseMatrix.tabulate(2400, 2)((i, j) => highBig.data(j)(i))
    val chowLinBigMs = medianMs(9) {
      Kernels.negLogLikObjective(0.8, 0.8, yB, xB, cBk, Kernels.ChowLinCov)
    }
    val littermanBigMs = medianMs(9) {
      Kernels.negLogLikObjective(0.8, 0.8, yB, xB, cBk, Kernels.LittermanCov)
    }
    val dcBigMs = medianMs(9) {
      DisaggCore.run(lowBig, None, method = "denton-cholette", aggFunc = "sum",
        targetFreq = Some("MS"))
    }

    // BASELINE.md's LARGEST scaling row (n=4800: reference 6.20 s/eval
    // objective, 12.45 s denton-cholette): the banded kernels stay
    // near-linear, so this is where the asymptotic gap is widest. Light
    // warmup — the same code paths are C2-hot from the n=2400 shapes.
    val high48 = syntheticHigh("MS", LocalDate.of(1600, 1, 1), 4800, 2)
    val low48 = {
      val ts = Frequency.parseValidated("YS").nDatesFrom(LocalDate.of(1600, 1, 1), 400)
      val v = Array.tabulate(400)(i => 100.0 + 10.0 * math.sin(i * 0.7) + i)
      TsFrame(ts, IndexedSeq("y"), IndexedSeq(v))
    }
    val prep48 = DisaggCore.prepareInputs(low48, Some(high48), None, "chow-lin")
    val c48 = DisaggCore.buildConversionMatrix(prep48.low.ts, prep48.lowFreq,
      prep48.high.ts, prep48.factor, "sum")
    val mask48 = (0 until c48.rows).filter(i => (0 until c48.cols).exists(j => c48(i, j) != 0.0))
    val c48k = DenseMatrix.tabulate(mask48.length, c48.cols)((i, j) => c48(mask48(i), j))
    val y48 = DenseVector(mask48.map(low48.data(0)).toArray)
    val x48 = DenseMatrix.tabulate(4800, 2)((i, j) => high48.data(j)(i))
    val chowLin48Ms = medianMs(7, warmup = 3) {
      Kernels.negLogLikObjective(0.8, 0.8, y48, x48, c48k, Kernels.ChowLinCov)
    }
    val litterman48Ms = medianMs(7, warmup = 3) {
      Kernels.negLogLikObjective(0.8, 0.8, y48, x48, c48k, Kernels.LittermanCov)
    }
    val dc48Ms = medianMs(7, warmup = 3) {
      DisaggCore.run(low48, None, method = "denton-cholette", aggFunc = "sum",
        targetFreq = Some("MS"))
    }

    Seq(
      "denton_a2q_n144_ms" -> dentonMs,
      "denton_cholette_a2q_n144_ms" -> dcMs,
      "chowlin_objective_eval_n158_ms" -> chowLinEvalMs,
      "litterman_objective_eval_n474_ms" -> littermanEvalMs,
      "chowlin_objective_eval_n2400_ms" -> chowLinBigMs,
      "litterman_objective_eval_n2400_ms" -> littermanBigMs,
      "denton_cholette_y2m_n2400_ms" -> dcBigMs,
      "chowlin_objective_eval_n4800_ms" -> chowLin48Ms,
      "litterman_objective_eval_n4800_ms" -> litterman48Ms,
      "denton_cholette_y2m_n4800_ms" -> dc48Ms)
  }
}
