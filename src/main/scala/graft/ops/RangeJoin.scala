package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Point-in-interval range join, Spark-first.
  *
  * Spark plans a raw `p.ts BETWEEN i.start AND i.end` theta join as a
  * broadcast nested loop (or worse, a cartesian) — O(|points| * |intervals|)
  * comparisons. Binning time into fixed-width buckets turns it into an
  * EQUI-join: each point owns exactly one bin, each interval explodes to the
  * bins it overlaps, and the shuffle/join cost scales with
  * |points| + |intervals| * (span/binWidth) + |matches| instead of the cross
  * product. A point meets an interval in at most one bin (the point's own),
  * so no post-join dedup is needed.
  *
  * Pick binWidth near the typical interval span: much smaller multiplies the
  * interval explode; much larger puts unrelated rows in one bucket and the
  * residual filter does the work.
  */
object RangeJoin {

  /** @param points    rows with a numeric/long `tsCol`
    * @param intervals rows with numeric/long `startCol` <= `endCol`
    * @param binWidth  bucket width in the same units as the columns
    * @return matched (point x interval) rows with the residual predicate
    *         `start <= ts <= end` applied
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      tsCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", expr(s"$tsCol div ${binWidth}L"))
    val i = intervals.withColumn("__bin",
      explode(sequence(expr(s"$startCol div ${binWidth}L"), expr(s"$endCol div ${binWidth}L"))))
    p.join(i, "__bin")
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bin")
  }

  /** INTERVAL×INTERVAL overlap join — the third member of the temporal-join
    * family (as-of = point×point, [[pointInInterval]] = point×interval).
    * Both sides explode to the bins they cover, the join is an equi-join on
    * the bin, and the half-open overlap predicate
    * `aStart < bEnd AND bStart < aEnd` filters residuals. Unlike the
    * point case, a pair can meet in several bins, so the join DEDUPES by
    * taking each pair in its FIRST shared bin — `greatest(aStart, bStart)
    * div binWidth == bin` — a pure predicate (no distinct shuffle; the
    * standard bin-join trick for overlap semantics).
    *
    * Cost: |A|·(spanA/bin) + |B|·(spanB/bin) exploded rows through one
    * equi-join shuffle — pick binWidth near the typical span.
    */
  def intervalOverlap(
      a: DataFrame,
      b: DataFrame,
      aStart: String, aEnd: String,
      bStart: String, bEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val ax = a.withColumn("__bin",
      explode(sequence(expr(s"$aStart div ${binWidth}L"), expr(s"$aEnd div ${binWidth}L"))))
    val bx = b.withColumn("__bin",
      explode(sequence(expr(s"$bStart div ${binWidth}L"), expr(s"$bEnd div ${binWidth}L"))))
    ax.join(bx, "__bin")
      .where(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .where(expr(s"greatest($aStart, $bStart) div ${binWidth}L") === col("__bin"))
      .drop("__bin")
  }

  /** Per-interval aggregation WITHOUT materializing the point×interval pair
    * set — the scale path when interval density makes |matches| explode.
    * [[pointInInterval]] (and any engine emitting pairs) pays O(|matches|),
    * which under a fixed time span grows ~quadratically with data volume
    * (the 1000× dir's measured failure mode, ROUND6_NOTES §9). When the
    * caller only needs per-interval totals, the classic sweep-line applies,
    * re-expressed as distributed prefix sums:
    *
    *   F(t) = (count, Σ value) over points with ts <= t
    *   agg([s, e]) = F(e) − F(s⁻)          (inclusive BETWEEN)
    *
    * Points (kind 1) and each interval's two boundary probes (start kind 0,
    * end kind 2) union into one frame bucketed by `ts div bucketWidth`;
    * running totals within a bucket are a PARALLEL window (partitionBy
    * bucket, orderBy (ts, kind)); per-bucket totals are read off each
    * bucket's physically-last windowed row (lead==null over the same sort —
    * no second scan, no extra sort), prefix-summed on the corpus-small
    * bucket frame (span/bucketWidth rows — the groups-sized
    * single-partition-window discipline) and broadcast back. F at a
    * boundary = bucket prefix + local running. Total cost: ONE shuffle of
    * |points| + 2|intervals| rows and an |intervals|-sized output — linear
    * at ANY interval density, and empty intervals are retained (count 0,
    * sum 0), which a pair join drops.
    *
    * Exactness under ties: boundary rows contribute zero to both running
    * sums, so permuting equal-(ts, kind) rows cannot perturb any kept
    * value; the kind order start < point < end at equal ts yields exactly
    * inclusive-BETWEEN. The value column accumulates as DECIMAL(18,4)
    * (order-independent, no float non-associativity), surfaced as
    * DECIMAL — callers route to double via the string cast discipline.
    *
    * @param idCols interval identity columns, unique per interval row
    * @return one row per interval: idCols + `n_points` (long) +
    *         `sum_value` (decimal)
    */
  def intervalAggSweep(
      points: DataFrame,
      intervals: DataFrame,
      tsCol: String,
      startCol: String,
      endCol: String,
      valueCol: String,
      idCols: Seq[String],
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(idCols.nonEmpty, "need at least one interval identity column")
    val dec = DecimalType(18, 4)
    val iSchema = intervals.schema
    def nullId(n: String) = lit(null).cast(iSchema(n).dataType).as(n)
    val ids = idCols.map(col)

    val pRows = points.select(Seq(
      col(tsCol).cast(LongType).as("__t"), lit(1).as("__kind"),
      lit(1L).as("__c"), col(valueCol).cast(dec).as("__v")) ++
      idCols.map(nullId): _*)
    val sRows = intervals.select(Seq(
      col(startCol).cast(LongType).as("__t"), lit(0).as("__kind"),
      lit(0L).as("__c"), lit(null).cast(dec).as("__v")) ++ ids: _*)
    val eRows = intervals.select(Seq(
      col(endCol).cast(LongType).as("__t"), lit(2).as("__kind"),
      lit(0L).as("__c"), lit(null).cast(dec).as("__v")) ++ ids: _*)
    val u = pRows.unionByName(sRows).unionByName(eRows)
      .withColumn("__bucket", expr(s"__t div ${bucketWidth}L"))

    val wOrd = Window.partitionBy(col("__bucket")).orderBy(col("__t"), col("__kind"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = u.select(Seq(col("__bucket"), col("__kind"),
      sum(col("__c")).over(wRun).as("__rc"),
      coalesce(sum(col("__v")).over(wRun), lit(0).cast(dec)).as("__rv"),
      lead(lit(1), 1).over(wOrd).as("__nx")) ++ ids: _*)

    // Bucket totals = each bucket's physically-last running row; prefix-sum
    // over the tiny bucket axis, excluding the bucket's own total.
    val bt = marked.where(col("__nx").isNull)
      .select(col("__bucket"), col("__rc").as("__bc"), col("__rv").as("__bv"))
    val wPre = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = bt.select(col("__bucket"),
      (sum(col("__bc")).over(wPre) - col("__bc")).as("__pc"),
      (sum(col("__bv")).over(wPre) - col("__bv")).as("__pv"))

    val f = marked.where(col("__kind") =!= 1)
      .join(broadcast(pre), Seq("__bucket"))
      .select(Seq(col("__kind"),
        (col("__pc") + col("__rc")).as("__fc"),
        (col("__pv") + col("__rv")).as("__fv")) ++ ids: _*)
    f.groupBy(ids: _*).agg(
      (max(when(col("__kind") === 2, col("__fc"))) -
        max(when(col("__kind") === 0, col("__fc")))).as("n_points"),
      (max(when(col("__kind") === 2, col("__fv"))) -
        max(when(col("__kind") === 0, col("__fv")))).as("sum_value"))
  }
}
