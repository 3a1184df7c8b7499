package graft.disagg

import java.time.LocalDate

import breeze.linalg.{DenseMatrix, DenseVector}

import graft.time.{Calendar, FreqClass, Frequency}

/** A small column-oriented in-memory time-series frame: rows sorted by `ts`
  * ascending, one Array per column. This is the per-series working set — the
  * supported regime is n = O(10^2..10^3) rows per series (SURVEY.md §4.3), so
  * it lives comfortably on a driver or inside one executor task.
  */
final case class TsFrame(
    ts: IndexedSeq[LocalDate],
    columns: IndexedSeq[String],
    data: IndexedSeq[Array[Double]]) {
  require(columns.length == data.length, "column/data arity mismatch")
  require(data.forall(_.length == ts.length), "ragged TsFrame")
  def nRows: Int = ts.length
  def col(name: String): Array[Double] = data(columns.indexOf(name))
  def hasNaN: Boolean = data.exists(_.exists(_.isNaN))
  def renamed(from: String, to: String): TsFrame =
    copy(columns = columns.map(c => if (c == from) to else c))
}

/** Aggregation statistic the disaggregated series must respect when rolled
  * back up to the low frequency (AGG_FUNC, ts_disagg.py:20).
  */
object AggFunc {
  val all = Seq("sum", "mean", "first", "last")
}

final case class PreparedInputs(
    merged: TsFrame,
    low: TsFrame,
    high: TsFrame,
    factor: Int,
    lowFreq: Frequency,
    highFreq: Frequency)

final case class DisaggOutput(
    ts: IndexedSeq[LocalDate],
    values: Array[Double],
    name: String,
    optim: Option[Optimizer.Result],
    rho: Option[Double],
    sigmaSq: Option[Double],
    beta: Option[Array[Double]],
    stdBeta: Option[Array[Double]],
    droppedLowDates: Seq[LocalDate])

/** The full disaggregation pipeline on in-memory series — a faithful
  * re-derivation of /root/reference/tsdisagg/ts_disagg.py:213-472 (same
  * validation messages, same alignment/merge semantics, same numeric path),
  * expressed as a pure function so the Spark layer can run it once on the
  * driver (single series) or per group inside executors (many series).
  */
object DisaggCore {

  def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** Full outer equi-join of the two frames on ts (pd.merge how="outer",
    * ts_disagg.py:298); unmatched cells become NaN.
    */
  def outerJoin(low: TsFrame, high: TsFrame): TsFrame = {
    val allTs = (low.ts ++ high.ts).distinct.sorted
    val lowPos = low.ts.zipWithIndex.toMap
    val highPos = high.ts.zipWithIndex.toMap
    def expand(frame: TsFrame, pos: Map[LocalDate, Int]): IndexedSeq[Array[Double]] =
      frame.data.map { colArr =>
        allTs.map(t => pos.get(t).map(colArr).getOrElse(Double.NaN)).toArray
      }
    TsFrame(allTs, low.columns ++ high.columns, expand(low, lowPos) ++ expand(high, highPos))
  }

  /** prepare_input_dataframes (ts_disagg.py:213-299). `lowFreqHint` /
    * `highFreqHint` play the role of an explicit `index.freq`; when absent the
    * frequency is inferred from the timestamps like pandas `inferred_freq`.
    */
  def prepareInputs(
      low: TsFrame,
      high: Option[TsFrame],
      targetFreq: Option[String],
      method: String,
      lowFreqHint: Option[String] = None,
      highFreqHint: Option[String] = None): PreparedInputs = {

    if (low.hasNaN) fail("low_freq_df has missing values.")
    high.foreach { h =>
      if (h.hasNaN) fail("high_freq_df has missing values.")
      if (h.ts.head.isAfter(low.ts.head)) {
        val nMissing = low.ts.count(_.isBefore(h.ts.head))
        fail(
          s"Start date found on high frequency data ${h.ts.head} is after start " +
            s"date found on low frequency data ${low.ts.head}. Interpolation is not " +
            s"possible in this case, because there is no observed high frequency data associated with the first " +
            s"$nMissing low-frequency observations. " +
            s"Align the start date of these two dataframes and try again.")
      }
    }

    // Frequency resolution happens on alias STRINGS first and is only
    // validated against the supported Y/Q/M family afterwards, mirroring the
    // reference's ordering (ts_disagg.py:246-270) so the error-path messages
    // fire in the same sequence.
    // Inferable-but-unsupported spacings (daily, weekly) get a pandas-style
    // name so parseValidated raises the reference's NotImplementedError
    // analogue ("Only annual, quarterly and monthly frequencies are
    // supported, found W-MON") instead of the missing-index message
    // (validate_freqs, time_conversion.py:66-71).
    def inferName(ts: IndexedSeq[LocalDate]): Option[String] =
      Frequency.infer(ts).map(_.name).orElse {
        if (ts.length < 3) None
        else {
          val diffs = ts.sliding(2).map { case Seq(a, b) =>
            java.time.temporal.ChronoUnit.DAYS.between(a, b)
          }.toSeq
          if (diffs.forall(_ == 1L)) Some("D")
          else if (diffs.forall(_ == 7L))
            Some("W-" + ts.head.getDayOfWeek
              .getDisplayName(java.time.format.TextStyle.SHORT, java.util.Locale.ENGLISH)
              .toUpperCase(java.util.Locale.ENGLISH))
          else None
        }
      }

    val lowFreqStr = lowFreqHint.orElse(inferName(low.ts)).getOrElse(fail(
      "Low frequency dataframe does not have a valid time index with frequency information"))

    val highFreqStr: String = (high, targetFreq) match {
      case (None, None) => Frequency.parseValidated(lowFreqStr).stepDown.name
      case (None, Some(t)) => t
      case (Some(h), Some(t)) =>
        val inferred = highFreqHint.orElse(inferName(h.ts))
        val matches = (Frequency.parse(t), inferred.flatMap(Frequency.parse)) match {
          case (Some(a), Some(b)) => a == b
          case _                  => inferred.contains(t)
        }
        if (!matches)
          fail("User provided target_freq does not match frequency information found on indicator data high_freq_df.")
        t
      case (Some(h), None) =>
        highFreqHint.orElse(inferName(h.ts)).getOrElse(fail(
          "Indicator data high_freq_df does not have a valid time index with frequency information"))
    }

    // validate_freqs (time_conversion.py:66-71)
    val lowFreq = Frequency.parseValidated(lowFreqStr)
    val highFreq = Frequency.parseValidated(highFreqStr)
    val factor = lowFreq.factorTo(highFreq).getOrElse(fail(
      s"Unsupported frequency conversion ${lowFreq.cls.longName} -> ${highFreq.cls.longName}; " +
        "only yearly->quarterly, yearly->monthly and quarterly->monthly are supported."))

    val varName = low.columns.head
    val (lowName, highName) = Frequency.namesFrom(varName, lowFreq, highFreq)
    val lowOut = low.renamed(varName, lowName)

    val highOut: TsFrame = high match {
      case Some(h) => h
      case None if method == "denton" || method == "denton-cholette" =>
        val idx = Calendar.companionIndex(lowOut.ts, lowFreq, highFreq)
        TsFrame(idx, IndexedSeq(highName), IndexedSeq(Array.fill(idx.length)(1.0)))
      case None =>
        fail("high_freq_df can only be None for methods \"denton\" and \"denton-cholette\", otherwise a " +
          "dataframe of high-frequency indicators must be provided.")
    }

    val merged = outerJoin(lowOut, highOut)
    PreparedInputs(merged, lowOut, highOut, factor, lowFreq, highFreq)
  }

  /** build_conversion_matrix (ts_disagg.py:45-81): the (n_low x n_high)
    * aggregation matrix. High-frequency rows are grouped by their CALENDAR
    * year/quarter (anchors deliberately ignored — ts_disagg.py:60-63), groups
    * with a member count != factor get fill 0.0 (ts_disagg.py:34-35), `first`/
    * `last` mark a single time-ordered member.
    */
  def buildConversionMatrix(
      lowTs: IndexedSeq[LocalDate],
      lowFreq: Frequency,
      highTs: IndexedSeq[LocalDate],
      factor: Int,
      aggFunc: String): DenseMatrix[Double] = {
    val useYear = lowFreq.cls == FreqClass.Yearly
    def key(d: LocalDate): (Int, Int) =
      if (useYear) (d.getYear, 0) else (d.getYear, (d.getMonthValue - 1) / 3)

    val nLow = lowTs.length
    val nHigh = highTs.length
    // last low row wins on duplicate period keys, like the reference's dict
    // comprehension (ts_disagg.py:64-66)
    val periodToRow = scala.collection.mutable.LinkedHashMap.empty[(Int, Int), Int]
    lowTs.zipWithIndex.foreach { case (d, i) => periodToRow(key(d)) = i }

    val groups = scala.collection.mutable.LinkedHashMap.empty[(Int, Int), scala.collection.mutable.ArrayBuffer[Int]]
    highTs.zipWithIndex.foreach { case (d, j) =>
      groups.getOrElseUpdate(key(d), scala.collection.mutable.ArrayBuffer.empty[Int]) += j
    }

    val c = DenseMatrix.zeros[Double](nLow, nHigh)
    groups.foreach { case (k, idx) =>
      periodToRow.get(k).foreach { row =>
        var fill = aggFunc match {
          case "sum" | "first" | "last" => 1.0
          case "mean"                   => 1.0 / factor
          case _                        => fail("Invalid method")
        }
        if (idx.length != factor) fill = 0.0
        aggFunc match {
          case "first" => c(row, idx.head) = fill
          case "last"  => c(row, idx.last) = fill
          case _       => idx.foreach(j => c(row, j) = fill)
        }
      }
    }
    c
  }

  /** disaggregate_series (ts_disagg.py:302-472) minus the DataFrame I/O. */
  def run(
      low: TsFrame,
      high: Option[TsFrame],
      targetFreq: Option[String] = None,
      targetColumn: Option[String] = None,
      aggFunc: String = "sum",
      method: String = "denton-cholette",
      criterion: String = "proportional",
      h: Int = 1,
      optimizerMethod: String = "nelder-mead",
      verbose: Boolean = false,
      lowFreqHint: Option[String] = None,
      highFreqHint: Option[String] = None,
      optimizerOptions: Optimizer.Options = Optimizer.Options()): DisaggOutput = {

    if (!Seq("denton", "denton-cholette", "chow-lin", "litterman").contains(method))
      fail(s"Method should be one of 'denton', 'denton-cholette', 'chow-lin', 'litterman'. Got $method.")
    if (!Seq("proportional", "additive").contains(criterion))
      fail(s"Criterion should be one of 'proportional', 'additive'. Got $criterion")
    if (!AggFunc.all.contains(aggFunc))
      fail(s"agg_func should be one of 'mean', 'sum', 'first', 'last'. Got $aggFunc")

    val target = targetColumn.getOrElse(low.columns.head)
    val targetIdx = low.columns.indexOf(target)
    if (targetIdx < 0) fail(s"target_column $target not found in low_freq_df")

    val prep = prepareInputs(low, high, targetFreq, method, lowFreqHint, highFreqHint)
    import prep.{merged, factor}

    val c0 = buildConversionMatrix(prep.low.ts, prep.lowFreq, prep.high.ts, factor, aggFunc)
    val dropMask: Array[Boolean] =
      Array.tabulate(c0.rows)(i => (0 until c0.cols).forall(j => c0(i, j) == 0.0))
    val dropped = prep.low.ts.zipWithIndex.collect { case (d, i) if dropMask(i) => d }
    if (dropped.nonEmpty)
      System.err.println(
        s"Insufficent high-frequency data to decompose the following dates: ${dropped.mkString(", ")}")

    // y: target column of the merged frame, NaN rows (pure high-freq rows)
    // removed, then all-zero C rows removed (ts_disagg.py:406-407)
    val mergedTarget = merged.data(targetIdx)
    val yFull = mergedTarget.filterNot(_.isNaN)
    if (yFull.length != prep.low.nRows)
      fail("low-frequency observations did not align onto the high-frequency grid")
    val keep = (0 until yFull.length).filterNot(dropMask)
    val y = DenseVector(keep.map(yFull).toArray)
    val c = if (dropped.isEmpty) c0 else {
      val rows = keep
      DenseMatrix.tabulate(rows.length, c0.cols)((i, j) => c0(rows(i), j))
    }

    // X: every merged column except the target (ts_disagg.py:408)
    val xCols = merged.columns.indices.filterNot(_ == targetIdx)
    val n = merged.nRows
    val k = xCols.length
    if (n != prep.high.nRows)
      fail("low-frequency timestamps do not align onto the high-frequency grid; " +
        "indicator rows and merged rows differ")
    val x = DenseMatrix.tabulate(n, k)((i, j) => merged.data(xCols(j))(i))
    val nl = y.length

    var optim: Option[Optimizer.Result] = None
    var rhoOut: Option[Double] = None
    var sigmaOut: Option[Double] = None
    var betaOut: Option[Array[Double]] = None
    var stdOut: Option[Array[Double]] = None

    val proportional = criterion == "proportional"

    // The distribution matrix is only ever APPLIED to the single residual
    // vector ul, so each arm returns (p, applyD) and never materializes the
    // n x nl matrix: the O(nl^2 * n) multi-RHS backsubstitution becomes one
    // nl-sized solve per series (Kernels.dentonApply / dentonCholetteApply).
    val (p: DenseVector[Double], applyD: (DenseVector[Double] => DenseVector[Double])) = method match {
      case "denton" =>
        require(k == 1, s"denton supports exactly one indicator column, got $k")
        val xv = x(::, 0)
        (xv.copy, (ul: DenseVector[Double]) =>
          Kernels.dentonApply(n, xv, h, proportional, c, ul))
      case "denton-cholette" =>
        require(k == 1, s"denton-cholette supports exactly one indicator column, got $k")
        val xv = x(::, 0)
        (xv.copy, (ul: DenseVector[Double]) =>
          Kernels.dentonCholetteApply(n, nl, c, xv, h, proportional, ul))
      case _ =>
        val kind: Kernels.MlCov =
          if (method == "chow-lin") Kernels.ChowLinCov else Kernels.LittermanCov
        val obj = (params: Array[Double]) =>
          Kernels.negLogLikObjective(params(0), params(1), y, x, c, kind)
        val res = Optimizer.minimize(
          optimizerMethod, obj, Array(0.8, 0.8),
          lower = Array(1e-5, 1e-5), upper = Array(1.0 - 1e-5, 1e300),
          opts = optimizerOptions)
        optim = Some(res)
        val rho = res.x(0)
        val sigmaSq = res.x(1)
        rhoOut = Some(rho); sigmaOut = Some(sigmaSq)
        val prod = Kernels.covProducts(kind, rho, sigmaSq, n, c)
        val beta = Kernels.glsBetaHatFromCsct(prod.csct, y, x, c)
        val stdBeta = Kernels.glsStdErrors(kind, rho, sigmaSq, x)
        betaOut = Some(beta.toArray); stdOut = Some(stdBeta.toArray)
        if (verbose)
          Report.printRegressionReport(target, y, x, merged.columns.filterNot(_ == merged.columns(targetIdx)),
            beta.toArray, rho, sigmaSq, stdBeta.toArray, c, method)
        // D ul = S C' (C S C')^-1 ul: one nl-solve, then the (nl x n)
        // cSigma transpose-product — never the n x nl matrix
        (x * beta, (ul: DenseVector[Double]) => prod.cSigma.t * (prod.csct \ ul))
    }

    val ul = y - Kernels.sparseRowProductVec(c, p)
    val yHat = p + applyD(ul)

    DisaggOutput(merged.ts, yHat.toArray, target, optim, rhoOut, sigmaOut,
      betaOut, stdOut, dropped)
  }
}
