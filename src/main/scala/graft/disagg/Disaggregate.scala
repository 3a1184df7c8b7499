package graft.disagg

import java.sql.Timestamp
import java.time.{LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

// Row shapes for the many-series mode. Top-level and public: Catalyst's
// generated encoder classes live outside this package and cannot touch
// private case classes. LocalDateTime fields encode as TIMESTAMP_NTZ, so
// the per-series kernels see wall-clock dates regardless of the session or
// executor-JVM timezone.
case class KeyedLow(series_id: Long, ts: LocalDateTime, value: Double)
case class KeyedHigh(series_id: Long, ts: LocalDateTime, values: Array[Double])
case class KeyedOut(series_id: Long, ts: LocalDateTime, value: Double)

/** Spark-facing temporal disaggregation API — the engine's equivalent of the
  * reference's single public entry point `disaggregate_series`
  * (/root/reference/tsdisagg/ts_disagg.py:302-472).
  *
  * Two execution shapes:
  *  - [[series]]: one series. The frame is tiny (n = O(10^3)); it is collected
  *    once, the Breeze kernel runs on the driver, and the result is returned
  *    as a DataFrame. Spark's job here is I/O + validation pushdown, not the
  *    O(n^3) solve.
  *  - [[manySeries]]: millions of independent series keyed by an id column.
  *    Both inputs are co-partitioned by the key via `groupByKey.cogroup`
  *    (ONE shuffle each, then embarrassingly parallel kernels inside
  *    executors; no driver collect) — this is the 100 TB design: scale comes
  *    from series-parallelism, never from distributing one series' linear
  *    algebra (SURVEY.md §7.8).
  */
object Disaggregate {

  final case class Params(
      targetFreq: Option[String] = None,
      targetColumn: Option[String] = None,
      aggFunc: String = "sum",
      method: String = "denton-cholette",
      criterion: String = "proportional",
      h: Int = 1,
      optimizerMethod: String = "nelder-mead",
      verbose: Boolean = false,
      lowFreq: Option[String] = None,
      highFreq: Option[String] = None,
      optimizerOptions: Optimizer.Options = Optimizer.Options())

  // Time columns are routed through TIMESTAMP_NTZ before leaving Spark:
  // the NTZ external type is wall-clock (LocalDateTime), so the calendar
  // day a user sees is preserved no matter what spark.sql.session.timeZone
  // or the JVM default is. The Timestamp/Instant fallbacks below are only
  // reachable for values that bypassed the NTZ cast and interpret the
  // instant in UTC (the pinned session zone of this repo's harnesses).
  private[graft] def toLocalDate(v: Any): LocalDate = v match {
    case t: Timestamp => t.toInstant.atZone(ZoneOffset.UTC).toLocalDate
    case d: java.sql.Date => d.toLocalDate
    case d: LocalDate => d
    case dt: java.time.LocalDateTime => dt.toLocalDate // TIMESTAMP_NTZ external type
    case i: java.time.Instant => i.atZone(ZoneOffset.UTC).toLocalDate
    case other => throw new IllegalArgumentException(s"Unsupported time value $other")
  }

  /** Collect a (tsCol, value...) DataFrame into a sorted in-memory TsFrame.
    * Validation mirrors ts_disagg.py:216-231 (message text pinned by the
    * reference's error-path tests).
    */
  private[graft] def collectTsFrame(df: DataFrame, tsCol: String, role: String): TsFrame = {
    val schema = df.schema
    val tsField = schema.fields.find(_.name == tsCol)
    val isTime = tsField.exists(f => f.dataType match {
      case TimestampType | DateType | TimestampNTZType => true
      case _ => false
    })
    if (!isTime)
      DisaggCore.fail(s"No datetime index found on the dataframe passed as argument to $role.")
    val valueCols = schema.fields.filter(_.name != tsCol).map(_.name).toIndexedSeq
    val rows = df
      // NTZ cast: collected values become wall-clock LocalDateTime, immune
      // to the session/JVM timezone (a non-UTC zone would otherwise shift
      // every date by up to a day and corrupt calendar period keys)
      .select((col(tsCol).cast(TimestampNTZType) +:
        valueCols.map(c => col(c).cast(DoubleType))): _*)
      .orderBy(col(tsCol))
      .collect()
    val ts = rows.map(r => toLocalDate(r.get(0))).toIndexedSeq
    val data = valueCols.indices.map { j =>
      rows.map(r => if (r.isNullAt(j + 1)) Double.NaN else r.getDouble(j + 1))
    }
    TsFrame(ts, valueCols, data)
  }

  /** Single-series disaggregation: DataFrame in, DataFrame(ts, <target>) out. */
  def series(
      lowFreqDf: DataFrame,
      highFreqDf: Option[DataFrame] = None,
      tsCol: String = "ts",
      params: Params = Params()): DataFrame = {
    val spark = lowFreqDf.sparkSession
    val out = seriesOutput(lowFreqDf, highFreqDf, tsCol, params)
    toDataFrame(spark, out, tsCol)
  }

  /** Like [[series]] but returning the full result (optimizer diagnostics,
    * rho/sigma/beta estimates, dropped dates) — the `return_optim_res=True`
    * surface (ts_disagg.py:469-471).
    */
  def seriesOutput(
      lowFreqDf: DataFrame,
      highFreqDf: Option[DataFrame] = None,
      tsCol: String = "ts",
      params: Params = Params()): DisaggOutput = {
    val low = collectTsFrame(lowFreqDf, tsCol, "low_freq_df")
    val high = highFreqDf.map(collectTsFrame(_, tsCol, "high_freq_df"))
    DisaggCore.run(low, high, params.targetFreq, params.targetColumn, params.aggFunc,
      params.method, params.criterion, params.h, params.optimizerMethod, params.verbose,
      params.lowFreq, params.highFreq, params.optimizerOptions)
  }

  private[graft] def toDataFrame(spark: SparkSession, out: DisaggOutput, tsCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(tsCol, TimestampNTZType, nullable = false),
      StructField(out.name, DoubleType, nullable = false)))
    val rows = out.ts.zip(out.values).map { case (d, v) => Row(d.atStartOfDay(), v) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  // ---------------------------------------------------------------- manySeries

  /** Disaggregate many independent series in one distributed pass.
    *
    * `low`: (seriesCol, tsCol, valueCol); `high` (optional): (seriesCol,
    * tsCol, indicatorCols...). Each side shuffles ONCE on the series key;
    * the per-series kernel (tiny dense solves) runs inside `cogroup` tasks,
    * so throughput scales linearly with executors and no O(n^2) matrix ever
    * crosses the wire. Series whose kernel fails (bad calendar, singular
    * system) are skipped — at pipeline scale one poisoned series must not
    * kill the job — but never SILENTLY: every skip increments
    * `skippedSeries` (a named accumulator, visible in the Spark UI per
    * stage), so a pipeline can alert on data loss. Pass your own
    * accumulator to read the count after an action; otherwise a fresh
    * `graft.manySeries.skipped` accumulator is registered per call.
    */
  def manySeries(
      low: DataFrame,
      high: Option[DataFrame],
      seriesCol: String = "series_id",
      tsCol: String = "ts",
      valueCol: String = "value",
      indicatorCols: Seq[String] = Seq("indicator"),
      params: Params = Params(),
      skippedSeries: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = low.sparkSession
    import spark.implicits._
    val skipped = skippedSeries.getOrElse(
      spark.sparkContext.longAccumulator("graft.manySeries.skipped"))

    val lowDs: Dataset[KeyedLow] = low.select(
      col(seriesCol).cast(LongType).as("series_id"),
      col(tsCol).cast(TimestampNTZType).as("ts"),
      col(valueCol).cast(DoubleType).as("value")).as[KeyedLow]

    val highDs: Dataset[KeyedHigh] = high match {
      case Some(hdf) => hdf.select(
        col(seriesCol).cast(LongType).as("series_id"),
        col(tsCol).cast(TimestampNTZType).as("ts"),
        array(indicatorCols.map(c => col(c).cast(DoubleType)): _*).as("values")).as[KeyedHigh]
      case None => spark.emptyDataset[KeyedHigh]
    }

    val hasHigh = high.isDefined
    val indNames = indicatorCols.toIndexedSeq
    val p = params

    val out = lowDs.groupByKey(_.series_id).cogroup(highDs.groupByKey(_.series_id)) {
      (key, lowIt, highIt) =>
        // the ENTIRE per-series pipeline sits inside the try: a malformed
        // series (null timestamps, ragged indicators, bad calendar) is
        // skipped — at pipeline scale one poisoned series must not kill
        // the job
        try {
          implicit val ldtOrd: Ordering[LocalDateTime] =
            Ordering.by(d => d.toLocalDate.toEpochDay * 86400000000000L + d.toLocalTime.toNanoOfDay)
          val lowRows = lowIt.toArray.filter(_.ts != null).sortBy(_.ts)
          if (lowRows.isEmpty) Iterator.empty
          else {
            val lowFrame = TsFrame(
              lowRows.map(r => toLocalDate(r.ts)).toIndexedSeq,
              IndexedSeq(valueCol),
              IndexedSeq(lowRows.map(_.value)))
            val highFrame: Option[TsFrame] = if (!hasHigh) None else {
              val hr = highIt.toArray.filter(_.ts != null).sortBy(_.ts)
              if (hr.isEmpty) None
              else Some(TsFrame(
                hr.map(r => toLocalDate(r.ts)).toIndexedSeq,
                indNames,
                indNames.indices.map(j => hr.map(_.values(j)))))
            }
            val res = DisaggCore.run(lowFrame, highFrame, p.targetFreq, None, p.aggFunc,
              p.method, p.criterion, p.h, p.optimizerMethod, verbose = false,
              p.lowFreq, p.highFreq, p.optimizerOptions)
            res.ts.zip(res.values).iterator.map { case (d, v) =>
              KeyedOut(key, d.atStartOfDay(), v)
            }
          }
        } catch {
          // counted, not silent: accumulators from retried/speculative
          // tasks can overcount, so treat the value as an alert signal
          // (zero IS exact: no task ever skipped)
          case _: Exception => skipped.add(1L); Iterator.empty
        }
    }
    out.toDF(seriesCol, tsCol, valueCol)
  }
}
