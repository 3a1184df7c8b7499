package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Feature rows produced by the (stubbed) decoder. Top-level + public for
  * Catalyst encoders.
  */
case class MediaFeatures(
    doc_id: Long,
    n_bytes: Int,
    first_byte: Int,
    byte_mean: Double,
    feature_dim: Int)

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * decoded/feature-extracted per partition in batches.
  *
  * The real Spark shapes are here — binary column + metadata struct schema,
  * partition-wise batched processing via mapPartitions (the JVM analogue of
  * the `mapInPandas` batch contract: one iterator per partition, features
  * emitted row-per-media), and a repartition knob so decode parallelism is
  * independent of the upstream file layout.
  *
  * DECODE IS A STUB: the container has no image/audio codecs, so
  * [[decodeStub]] derives deterministic fake features (byte statistics) from
  * the payload. Swapping in a real codec changes only that function — the
  * schema, batching, and partitioning stay.
  */
object Multimodal {

  /** Synthesize a media table from documents: payload = utf-8 bytes of the
    * text (stand-in for image/audio bytes), metadata struct alongside.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(col("lang"), col("source"), col("n_chars")).as("meta"))

  /** STUB decoder: deterministic byte statistics standing in for a real
    * image/audio feature extractor.
    */
  def decodeStub(payload: Array[Byte]): MediaFeatures =
    MediaFeatures(
      doc_id = -1L,
      n_bytes = payload.length,
      first_byte = if (payload.nonEmpty) payload(0) & 0xFF else -1,
      byte_mean = if (payload.nonEmpty) payload.map(b => (b & 0xFF).toDouble).sum / payload.length else 0.0,
      feature_dim = 64)

  /** Frame sampling: split the payload into fixed-size chunks ("frames" —
    * stand-ins for video frames) and keep every `stride`-th one. The explode
    * happens lazily per row, so output size is bounded by payload/chunk/stride
    * and no full frame set ever materializes per task.
    */
  def frameSample(media: DataFrame, chunkBytes: Int = 32, stride: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast(LongType), col("media"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        payload.grouped(chunkBytes).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (chunk, idx) => (id, idx, chunk.length, chunk) }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes", "frame")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Resize stub: normalize payloads to a fixed byte length (truncate or
    * zero-pad) — the shape of an image-resize stage: fixed-dimension output
    * rows regardless of input size.
    *
    * Deliberately a codegen'd expression (binary `rpad` truncates AND
    * zero-pads in one builtin), NOT a typed Dataset map: the map variant
    * deserializes every payload to a JVM object and back, which measured
    * ~4 s at sf0.1 against ~0.5 s for the expression. Real resize kernels
    * that need native code belong in the [[extractFeatures]] mapPartitions
    * shape instead.
    */
  def resizeStub(media: DataFrame, targetBytes: Int = 64): DataFrame =
    media.select(col("doc_id").cast(LongType),
      lit(targetBytes).as("n_bytes"),
      expr(s"rpad(media, $targetBytes, X'00')").as("media"))

  /** Partition-batched decode: binary in, typed features out. `parallelism`
    * decouples decode tasks from the scan layout (decoders are CPU-bound;
    * at scale this is sized to cores, not to file splits).
    */
  def extractFeatures(media: DataFrame, parallelism: Int = 0): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val sized = if (parallelism > 0) media.repartition(parallelism) else media
    val ds: Dataset[MediaFeatures] = sized
      .select(col("doc_id").cast(LongType), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batch loop: a real decoder would amortize codec init across the
        // partition here — exactly the mapInPandas batch contract
        it.map { case (id, payload) => decodeStub(payload).copy(doc_id = id) }
      }
    ds.toDF().orderBy(col("doc_id"))
  }
}
