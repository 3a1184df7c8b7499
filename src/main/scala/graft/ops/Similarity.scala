package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>), Spark-first:
  *
  *  - [[cosine]] is a pure codegen'd expression (zip_with product +
  *    aggregate fold — deterministic left-to-right summation, no UDF);
  *  - [[bruteForceTopK]] broadcasts the query vector inside the plan and is
  *    a single scan + TakeOrderedAndProject — the exact baseline;
  *  - [[ivfTopK]] is the scale path: vectors are pre-assigned to centroid
  *    buckets (one narrow scan; assignment is itself a broadcast join
  *    against the tiny centroid table), the query probes the closest
  *    `nProbe` buckets, and only those partitions are scanned. At 100 TB
  *    the bucket column is a partition key and pruning makes the probe
  *    touch ~nProbe/nBuckets of the data.
  *
  * Centroids are taken deterministically (lowest vec_ids) rather than from a
  * k-means pass — the plumbing and plan shape are the point; swapping in
  * trained centroids changes recall, not the dataflow.
  */
object Similarity {

  /** array<float> -> array<double>, the working type for all math. */
  def asDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** Cosine via the native codegen'd expressions (graft.functions.VectorOps)
    * — bit-equal to the HOF `aggregate(zip_with(...))` fold (left-to-right
    * summation) but inside WholeStageCodegen instead of interpreted lambdas.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorOps.cosine(a, b)

  private def prepared(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))

  /** Exact top-k by cosine against the vector with id `queryId`. */
  def bruteForceTopK(
      embeddings: DataFrame, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val e = prepared(embeddings)
    val q = e.where(col("vec_id") === queryId)
      .select(col("v").as("qv"))
    e.crossJoin(broadcast(q))
      .where(col("vec_id") =!= queryId)
      .select(col("vec_id"), cosine(col("v"), col("qv")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Deterministic IVF bucket assignment: nearest of the `nBuckets` centroid
    * vectors (the lowest vec_ids). Returns (vec_id, v, bucket).
    */
  def assignBuckets(embeddings: DataFrame, nBuckets: Int = 16): DataFrame = {
    val e = prepared(embeddings)
    val cents = e.where(col("vec_id") < nBuckets)
      .select(col("vec_id").as("bucket"), col("v").as("cv"))
    // broadcast nested-loop against the tiny centroid table (map-side), then
    // argmax per vector via max_by — one partial-aggregating shuffle, no
    // window sort; ties break to the lowest bucket id via (sim, -bucket)
    e.crossJoin(broadcast(cents))
      .withColumn("sim", cosine(col("v"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(
        max_by(struct(col("bucket"), col("v")),
          struct(col("sim"), -col("bucket"))).as("best"))
      .select(col("vec_id"), col("best.v").as("v"), col("best.bucket").as("bucket"))
  }

  /** IVF-style ANN: probe the `nProbe` centroid buckets closest to the
    * query, exact cosine within them.
    */
  def ivfTopK(
      embeddings: DataFrame, queryId: Long = 0L, k: Int = 10,
      nBuckets: Int = 16, nProbe: Int = 4): DataFrame = {
    val assigned = assignBuckets(embeddings, nBuckets)
    val e = prepared(embeddings)
    val q = e.where(col("vec_id") === queryId).select(col("v").as("qv"))
    val cents = e.where(col("vec_id") < nBuckets)
      .select(col("vec_id").as("bucket"), col("v").as("cv"))
    val probes = cents.crossJoin(broadcast(q))
      .select(col("bucket"), cosine(col("cv"), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("bucket").asc)
      .limit(nProbe)
      .select(col("bucket"))
    assigned
      .join(broadcast(probes), "bucket") // partition-pruning shape at scale
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= queryId)
      .select(col("vec_id"), cosine(col("v"), col("qv")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }
}
