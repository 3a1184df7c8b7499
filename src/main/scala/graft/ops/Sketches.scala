package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Corpus-level sketch aggregation: a typed [[Aggregator]] that UNIONs
  * per-document MinHash signatures (elementwise min) into one signature per
  * group. A MinHash union is the signature of the union of the underlying
  * shingle sets, so two group signatures estimate the Jaccard similarity of
  * whole sub-corpora as (matching positions / k) — classic sketch algebra,
  * mergeable and therefore map-side combinable: the shuffle carries k longs
  * per group regardless of corpus size.
  */
object MinHashUnion extends Aggregator[(String, Array[Long]), Array[Long], Array[Long]] {
  val k = 64
  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
  override def reduce(b: Array[Long], row: (String, Array[Long])): Array[Long] = {
    val a = row._2
    var i = 0
    while (i < k && i < a.length) { if (a(i) < b(i)) b(i) = a(i); i += 1 }
    b
  }
  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k && i < b2.length) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }
  override def finish(b: Array[Long]): Array[Long] = b
  // ExpressionEncoder on both sides: the buffer crosses the partial-agg
  // shuffle, and a Java-serialized Array[Long] is ~3x the bytes of the
  // unsafe-row encoding (and skips codegen'd serialization)
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
}

private[ops] object ExpressionEncoderHelper {
  val arrayLong: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object Sketches {

  /** Per-group unified MinHash signatures + estimated pairwise Jaccard
    * between groups. Output: (group_a, group_b, est_jaccard), ordered.
    */
  def corpusSimilarity(
      docs: DataFrame,
      groupCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = docs
      .select(col(groupCol).as("grp"),
        Dedup.minhashSignature(Dedup.shingles(col(textCol)), MinHashUnion.k).as("sig"))
      .as[(String, Array[Long])]
      .groupByKey(_._1)
      .agg(MinHashUnion.toColumn.name("corpus_sig"))
      .toDF("grp", "corpus_sig")

    val a = sigs.select(col("grp").as("group_a"), col("corpus_sig").as("sa"))
    val b = sigs.select(col("grp").as("group_b"), col("corpus_sig").as("sb"))
    a.crossJoin(b)
      .where(col("group_a") <= col("group_b"))
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sa"), col("sb"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(MinHashUnion.k))
      .select(col("group_a"), col("group_b"), col("est_jaccard"))
      .orderBy(col("group_a"), col("group_b"))
  }
}
