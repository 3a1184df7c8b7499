package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
