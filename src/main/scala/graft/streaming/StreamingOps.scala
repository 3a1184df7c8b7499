package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured-Streaming surface: the same windowed aggregations the batch
  * layer exposes, expressed as a streaming query so the engine covers
  * continuous ingestion. For the harness the parquet events table is driven
  * through `readStream` synchronously (memory sink + processAllAvailable);
  * on a cluster the identical plan runs against a file/Kafka source with a
  * watermark bounding state.
  */
object StreamingOps {

  /** One-day tumbling-window counts and sums by event_type over the events
    * stream. Returns the final (complete-mode) result as a batch DataFrame —
    * value-identical to the equivalent GROUP BY date_trunc('day', ts) batch
    * query, which is exactly what the DuckDB oracle replays.
    */
  def windowedEventCounts(spark: SparkSession, dir: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's parquet reader
    // rejects; read it as raw nanos and rebuild a microsecond timestamp
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the streaming file source wants a directory: point it at the table
    // dir and glob-filter to the events file
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))

    val name = s"stream_win_${System.identityHashCode(spark)}"
    spark.streams.active.filter(_.name == name).foreach(_.stop())
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .select(col("w.start").as("day"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("day"), col("event_type"))
  }
}
