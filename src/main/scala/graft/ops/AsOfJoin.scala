package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the most recent right row with
  * `right.ts <= left.ts` within the same key partition.
  *
  * Spark has no native ASOF JOIN; the idiomatic composition is the
  * union-and-carry-forward shape:
  *
  *   1. tag both sides and union them (narrow, no join),
  *   2. one window pass per key ordered by (ts, side) — right rows sort
  *      before left rows at equal ts so `>=` semantics hold — carrying the
  *      last non-null right payload forward,
  *   3. keep the left rows.
  *
  * Cost: ONE shuffle on the key + a per-key sort — the same price as a
  * sort-merge join, with none of the range-explosion a theta-join
  * formulation would suffer. Skew follows key cardinality like any window.
  * DuckDB's native ASOF JOIN replays it for the oracle.
  */
object AsOfJoin {

  /** @param left      rows to annotate; must contain `keyCol` and `tsCol`
    * @param right     lookup side; must contain `keyCol`, `tsCol` and `payloadCols`
    * @param keyCol    equi-join key
    * @param tsCol     ordering column (any orderable numeric/timestamp)
    * @param payloadCols right columns carried onto the left rows (null when
    *                  no right row precedes)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(
        right.select(struct(payloadCols.map(col): _*)).schema.head.dataType))
    val rTagged = right
      .select((keyCol +: tsCol +: payloadCols).map(col): _*)
      .withColumn("__side", lit(0))
      .withColumn("__p", struct(payloadCols.map(col): _*))
    // align schemas: left keeps its own columns; right rows only need key/ts/payload
    val lNorm = lTagged.select(
      (leftCols.map(col) :+ col("__side") :+ col("__p")): _*)
    val rNorm = rTagged.select(
      (leftCols.map(c => (if (c == keyCol || c == tsCol) col(c) else lit(null).cast(left.schema(c).dataType)).as(c))
        :+ col("__side") :+ col("__p")): _*)
    val unioned = lNorm.unionByName(rNorm)
    // __p is the final tiebreaker: two right rows sharing (key, ts) would
    // otherwise carry a nondeterministic payload (the every-query-
    // deterministic contract); the struct comparison picks the greatest
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc, col("__p").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
    carried
      .where(col("__side") === 1)
      .select((leftCols.map(col) ++
        payloadCols.map(p => col("__asof").getField(p).as(s"asof_$p"))): _*)
  }

  /** BOTH as-of directions in ONE window sort: for every left row, the
    * most recent right row with `right.ts <= left.ts` (backward,
    * inclusive — the [[asOf]] semantics) AND the next right row with
    * `right.ts > left.ts` (forward, strict). The same union-and-carry
    * shape, with a second carry over the FOLLOWING frame: because right
    * rows sort before left rows at equal ts, the preceding-frame carry
    * sees equal-ts rights (inclusive) while the following-frame carry
    * does not (strict) — one ordering serves both directions, so the
    * whole bidirectional join costs one shuffle + one per-key sort (the
    * two window frames share the partitioning/ordering and plan over a
    * single Exchange+Sort). Nearest-neighbor selection is then a pure
    * projection on the two payloads.
    */
  def asOfBoth(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(
        right.select(struct(payloadCols.map(col): _*)).schema.head.dataType))
    val rTagged = right
      .select((keyCol +: tsCol +: payloadCols).map(col): _*)
      .withColumn("__side", lit(0))
      .withColumn("__p", struct(payloadCols.map(col): _*))
    val lNorm = lTagged.select(
      (leftCols.map(col) :+ col("__side") :+ col("__p")): _*)
    val rNorm = rTagged.select(
      (leftCols.map(c => (if (c == keyCol || c == tsCol) col(c) else lit(null).cast(left.schema(c).dataType)).as(c))
        :+ col("__side") :+ col("__p")): _*)
    val unioned = lNorm.unionByName(rNorm)
    val base = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc, col("__p").asc_nulls_first)
    val wBack = base.rowsBetween(Window.unboundedPreceding, 0)
    val wFwd = base.rowsBetween(0, Window.unboundedFollowing)
    unioned
      .withColumn("__back", last(col("__p"), ignoreNulls = true).over(wBack))
      .withColumn("__fwd", first(col("__p"), ignoreNulls = true).over(wFwd))
      .where(col("__side") === 1)
      .select((leftCols.map(col) ++
        payloadCols.map(p => col("__back").getField(p).as(s"back_$p")) ++
        payloadCols.map(p => col("__fwd").getField(p).as(s"fwd_$p"))): _*)
  }
}
