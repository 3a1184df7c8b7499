package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Multimodal, Similarity, TextOps}

/** Invariant tests for the LLM-pipeline operators on the sf0.001 tables. */
class OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private def docs: DataFrame = spark.read.parquet(s"$dir/documents.parquet")
  private def embeddings: DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")

  test("minhash-LSH finds every pair the exact all-pairs Jaccard rates >= 0.9") {
    // ground truth: exact Jaccard across ALL pairs (no blocking) on 500 docs
    val withSh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val a = withSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = withSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val exact = a.crossJoin(b)
      .where(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val lsh = Dedup.minhashLshPairs(docs, threshold = 0.9)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(exact.nonEmpty, "testdata should contain near-duplicates")
    assert(exact.subsetOf(lsh), s"LSH missed ${exact -- lsh}")
    assert(lsh.subsetOf(exact), s"LSH emitted sub-threshold pairs ${lsh -- exact}")
  }

  test("simhash pairs respect the hamming bound and are deterministic") {
    val p1 = Dedup.simhashPairs(docs).collect()
    assert(p1.forall(_.getInt(2) <= 6))
    val p2 = Dedup.simhashPairs(docs).collect()
    assert(p1.map(_.toString).toSeq == p2.map(_.toString).toSeq)
  }

  test("IVF top-k scores are a subset of brute-force top-k x 3 (bounded recall loss)") {
    val brute = Similarity.bruteForceTopK(embeddings, 0L, 30)
      .collect().map(r => r.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(embeddings, 0L, 10)
      .collect().map(r => r.getLong(0))
    assert(ivf.length == 10)
    // every IVF hit must be a genuinely high-scoring vector
    assert(ivf.count(brute.contains) >= 8, s"IVF drifted: $ivf")
  }

  test("brute-force top-k is sorted descending and excludes the query") {
    val rows = Similarity.bruteForceTopK(embeddings, 0L, 10).collect()
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
    assert(!rows.map(_.getLong(0)).contains(0L))
  }

  test("streaming windowed counts equal the batch equivalent") {
    val streamed = graft.streaming.StreamingOps.windowedEventCounts(spark, dir)
      .collect().map(_.toString).sorted
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy("day", "event_type")
      .collect().map(_.toString).sorted
    assert(streamed.toSeq == batch.toSeq)
  }

  test("stateful streaming sessionization equals the batch/SQL formulation") {
    val stream = graft.streaming.StreamingOps.sessionizeStream(spark, dir)
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .collect().map(_.toString).sorted
    val batch = graft.streaming.StreamingOps.sessionizeBatch(spark, dir)
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .collect().map(_.toString).sorted
    assert(stream.length > 0)
    assert(stream.toSeq == batch.toSeq)
  }

  test("rolling fingerprint is order-sensitive, token-hash is not") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val fps = df.select(TextOps.rollingFingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fps(0) != fps(1))
    val sh = df.select(Dedup.shingles(col("text"), 1).as("sh"))
      .select(array_sort(col("sh"))).collect().map(_.getSeq[String](0))
    assert(sh(0) == sh(1))
  }

  test("multimodal features: byte stats of ascii payloads match char counts") {
    val media = Multimodal.mediaTable(docs)
    val feats = Multimodal.extractFeatures(media, parallelism = 4)
    val joined = feats.join(docs, "doc_id")
      .where(col("n_bytes") =!= length(col("text")))
      .count()
    assert(joined == 0, "ascii text: n_bytes must equal n_chars")
    assert(feats.count() == docs.count())
  }

  test("native NgramShingles equals the declarative HOF formulation") {
    val native = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val hof = docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"), Dedup.shinglesFromTokens(col("toks")).as("sh"))
    val joined = native.as("a").join(hof.as("b"), "doc_id")
      .where(col("a.sh") =!= col("b.sh"))
    assert(joined.count() == 0, "native shingles diverge from HOF semantics")
  }

  test("IVF buckets as a partition column prune the scan (the at-scale layout)") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf_buckets").toString
    ops.Similarity.assignBuckets(embeddings, 8)
      .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    val reread = spark.read.parquet(tmp).where(col("bucket").isin(1, 3))
    val plan = reread.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("bucket#") || plan.contains("bucket IN")),
      s"expected partition pruning in:\n${plan.take(800)}")
    val full = spark.read.parquet(tmp).count()
    val pruned = reread.count()
    assert(pruned < full && pruned > 0)
  }

  test("corpus minhash-union sketch: diagonal ~1, symmetric bounds, mergeable") {
    val sim = ops.Sketches.corpusSimilarity(docs).collect()
    val self = sim.filter(r => r.getString(0) == r.getString(1))
    assert(self.nonEmpty && self.forall(_.getDouble(2) == 1.0),
      "a corpus is identical to itself")
    assert(sim.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    // shared synthetic vocabulary -> cross-language corpora overlap heavily
    val cross = sim.filter(r => r.getString(0) != r.getString(1))
    assert(cross.nonEmpty && cross.forall(_.getDouble(2) > 0.0))
  }

  test("lang-id emits only profile languages and is stable") {
    val preds = docs.select(TextOps.langId(col("text")).as("l"))
      .groupBy("l").count().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(TextOps.langProfiles.map(_._1).toSet))
  }
}
