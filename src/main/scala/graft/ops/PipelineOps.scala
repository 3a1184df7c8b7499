package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-preparation operators a pretraining pipeline runs after dedup and
  * quality filtering: benchmark decontamination, context-window packing, and
  * mixture-weight (stratified) sampling. All three are deterministic —
  * hash-bucketed where the reference pipelines would use RNG — so every
  * result is replayable by the DuckDB oracle and stable under repartitioning,
  * task retries, and incremental reruns.
  */
object PipelineOps {

  /** Shared deterministic split bucket: pmod(md5_low64(doc_id), 100) — the
    * same assignment sample_split_deterministic emits, so "eval split" means
    * the same documents in both operators.
    */
  private def splitBucket = pmod(
    graft.functions.HashOps.md5Low64(col("doc_id").cast(StringType)),
    lit(100L)).cast(IntegerType)

  /** Benchmark decontamination (the GPT-3 appendix-C / PaLM shape): flag
    * every training document that shares any word n-gram with the held-out
    * eval split, so contaminated documents can be dropped before training.
    *
    * Scale shape: the eval side of the overlap join is a FIXED-SIZE set
    * (benchmark suites are megabytes no matter how big the corpus), so its
    * distinct shingles BROADCAST; the train side never shuffles shingles —
    * the only corpus-sized exchange is the per-doc overlap aggregation,
    * which partial-aggregates map-side. No O(N·M) pair stage anywhere.
    */
  def decontaminate(docs: DataFrame, n: Int = 8, evalMin: Int = 95): DataFrame = {
    val withBucket = docs.withColumn("bucket", splitBucket)
    val evalShingles = withBucket.filter(col("bucket") >= evalMin)
      .select(explode(Dedup.shingles(col("text"), n)).as("sh"))
      .distinct()
      .withColumn("hit", lit(1))
    val trainShingles = withBucket.filter(col("bucket") < evalMin)
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), n)).as("sh"))
    trainShingles
      .join(broadcast(evalShingles), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(LongType).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0))).cast(LongType).as("n_contaminated"))
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
        (col("n_contaminated").cast(DoubleType) / col("n_shingles"))
          .as("contamination_ratio"),
        (col("n_contaminated") > 0).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Concat-and-chunk context-window packing: documents are laid out
    * back-to-back in deterministic (doc_id) order and cut into fixed
    * token-budget packs — each doc's pack is floor(tokens_before / budget),
    * and `straddles` marks docs crossing a pack boundary (the rows a loss
    * mask would split).
    *
    * Scale shape: packing streams are PER-LANG (a global total order would
    * serialize the window into one partition); each lang shard packs
    * independently and in parallel, which is how multi-source pretraining
    * mixes are actually laid out. The window is a running sum over an
    * already-partitioned sort — one shuffle on lang.
    */
  def packTokenBudget(docs: DataFrame, budget: Int = 256): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), col("lang"),
        size(Dedup.tokens(col("text"))).cast(LongType).as("n_tokens"))
      .withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // integral DIV (not floor(x/y)): long-exact at any corpus size, where
      // double-routed division would lose bits past 2^52 total tokens
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("tokens_before"),
        expr(s"tokens_before DIV $budget").as("pack_id"),
        (expr(s"tokens_before DIV $budget") =!=
          expr(s"(tokens_before + n_tokens - 1) DIV $budget")).as("straddles"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Mixture-weight stratified sampling: keep a per-stratum fraction of
    * documents via a DETERMINISTIC ticket pmod(md5_low64('strat:'||doc_id),
    * 10000) < rate·10000 — the up/down-weighting step that turns raw corpus
    * proportions into a training mix. The 'strat:' salt makes the ticket
    * independent of the split bucket (the same doc_id must not correlate
    * across decisions). Pure per-row projection: zero shuffles before the
    * output sort, and — unlike rand()/sample() — the same documents survive
    * on any engine, partitioning, or retry.
    */
  def stratifiedSample(
      docs: DataFrame,
      rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    val ticket = pmod(
      graft.functions.HashOps.md5Low64(
        concat(lit("strat:"), col("doc_id").cast(StringType))),
      lit(10000L)).cast(IntegerType)
    val threshold = rates.foldLeft(lit((defaultRate * 10000).toInt)) {
      case (acc, (lang, rate)) =>
        when(col("lang") === lang, lit((rate * 10000).toInt)).otherwise(acc)
    }
    docs
      .select(col("doc_id"), col("lang"), ticket.as("ticket"),
        threshold.cast(IntegerType).as("threshold"))
      .withColumn("kept", col("ticket") < col("threshold"))
      .orderBy(col("doc_id"))
  }
}
