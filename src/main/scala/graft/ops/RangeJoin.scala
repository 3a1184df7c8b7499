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
}
