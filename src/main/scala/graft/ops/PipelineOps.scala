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

  /** Bloom-filter decontamination — the shape [[decontaminate]] takes when
    * even broadcasting the exact eval shingle SET is too big (multi-GB
    * benchmark suites, thousands of evals): the eval side compresses to an
    * m-bit Bloom filter (here 16384 bits — 2 KiB — via the OR-additive
    * [[graft.ops.BloomBits]] aggregator), and the train side probes k bit
    * positions per shingle with NO join at all — pure projection against a
    * closure literal. No false negatives by construction, so
    * `sound` (n_bloom_hits >= n_exact_hits) is deterministically TRUE;
    * false positives are real and the audit column counts them against the
    * exact broadcast-join path.
    *
    * m is the textbook ~10 bits/element regime (~1% FP at k=3), so the
    * audit shows a small nonzero false-positive count at test scale —
    * lossy enough to be a real Bloom filter, tight enough to be usable.
    */
  def decontaminateBloom(docs: DataFrame, n: Int = 8, evalMin: Int = 95): DataFrame = {
    import graft.ops.{BloomBits, Sketches}
    val spark = docs.sparkSession
    import spark.implicits._
    val withBucket = docs.withColumn("bucket", splitBucket)
    val evalShingles = withBucket.filter(col("bucket") >= evalMin)
      .select(explode(Dedup.shingles(col("text"), n)).as("sh"))
      .distinct()
    val bloom: Array[Long] =
      evalShingles.as[String].select(BloomBits.toColumn).head()
    val bits: Seq[Boolean] = (0 until BloomBits.mBits)
      .map(i => (bloom(i >> 6) >> (i & 63) & 1L) == 1L)
    val probe = (0 until BloomBits.kHashes).map { j =>
      element_at(typedLit(bits),
        (pmod(graft.functions.HashOps.md5Low64(
          concat(col("sh"), lit(j.toString))),
          lit(BloomBits.mBits)) + 1).cast("int"))
    }.reduce(_ && _)
    val trainShingles = withBucket.filter(col("bucket") < evalMin)
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), n)).as("sh"))
    trainShingles
      .join(broadcast(evalShingles.withColumn("hit", lit(1))), Seq("sh"), "left")
      .select(col("doc_id"), probe.as("bloom_hit_sh"),
        coalesce(col("hit"), lit(0)).as("exact_hit_sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(LongType).as("n_shingles"),
        sum(col("bloom_hit_sh").cast(LongType)).cast(LongType).as("n_bloom_hits"),
        sum(col("exact_hit_sh")).cast(LongType).as("n_exact_hits"))
      .select(col("doc_id"), col("n_shingles"), col("n_bloom_hits"),
        col("n_exact_hits"),
        (col("n_bloom_hits") > 0).as("bloom_contaminated"),
        (col("n_exact_hits") > 0).as("exact_contaminated"),
        (col("n_bloom_hits") - col("n_exact_hits")).as("n_false_positives"),
        (col("n_bloom_hits") >= col("n_exact_hits")).as("sound"))
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
      defaultRate: Double = 1.0,
      sorted: Boolean = true): DataFrame = {
    val ticket = pmod(
      graft.functions.HashOps.md5Low64(
        concat(lit("strat:"), col("doc_id").cast(StringType))),
      lit(10000L)).cast(IntegerType)
    val threshold = rates.foldLeft(lit((defaultRate * 10000).toInt)) {
      case (acc, (lang, rate)) =>
        when(col("lang") === lang, lit((rate * 10000).toInt)).otherwise(acc)
    }
    val out = docs
      .select(col("doc_id"), col("lang"), ticket.as("ticket"),
        threshold.cast(IntegerType).as("threshold"))
      .withColumn("kept", col("ticket") < col("threshold"))
    // sorted=false for streaming callers: a global ORDER BY is not allowed
    // on an append-mode stream, and the projection itself is identical
    if (sorted) out.orderBy(col("doc_id")) else out
  }

  /** Mixture-weight PLANNING — the step before [[stratifiedSample]]: given
    * target language shares for the training mixture, compute the
    * per-language sampling rate that realizes them by downsampling only
    * (the language most underrepresented relative to its target keeps
    * rate 1.0; everything else scales down proportionally — no
    * upsampling/duplication).
    *
    *   rate_l = (target_l / natural_l) / max_k(target_k / natural_k)
    *
    * Scale shape: ONE map-side-combined aggregation over the corpus
    * (lang, token-count sums), then windows over the |languages|-row
    * result. The empty-frame windows are a deliberate single-partition
    * reduction of an already-tiny post-agg frame (|langs| rows), not a
    * corpus-wide window. Every emitted double is a division/multiplication
    * of exact integers and literal targets in a fixed order, so the DuckDB
    * oracle lands on identical bits.
    */
  def mixtureWeights(
      docs: DataFrame,
      targets: Map[String, Double],
      defaultTarget: Double = 0.0): DataFrame = {
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val nTokens = size(split(trim(col("text")), "\\s+")).cast(LongType)
    val target = targets.foldLeft(lit(defaultTarget)) {
      case (acc, (l, t)) => when(col("lang") === l, lit(t)).otherwise(acc)
    }
    docs.select(col("lang"), nTokens.as("n"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("lang_tokens"))
      .withColumn("total_tokens", sum(col("lang_tokens")).over(w))
      .withColumn("target_share", target)
      .withColumn("natural_share",
        col("lang_tokens").cast(DoubleType) / col("total_tokens").cast(DoubleType))
      .withColumn("ratio", col("target_share") / col("natural_share"))
      .withColumn("sample_rate", col("ratio") / max(col("ratio")).over(w))
      .select(col("lang"), col("n_docs"), col("lang_tokens"),
        col("natural_share"), col("target_share"), col("sample_rate"),
        (col("lang_tokens").cast(DoubleType) * col("sample_rate"))
          .as("expected_tokens"))
      .orderBy(col("lang"))
  }

  /** UPSAMPLING mixture applier — the other half of [[mixtureWeights]]
    * (which realizes target shares by downsampling only): rates are
    * normalized so the most OVERrepresented language keeps rate 1.0 and
    * every other language repeats, n_copies = ⌊rate⌋ plus one stochastic
    * copy with probability frac(rate) decided by a deterministic per-doc
    * hash ticket (replication is therefore repartition/retry/engine
    * stable — rand() would resample on every replay and shift the
    * mixture, the pipeline_stratified_sample argument applied to
    * repetition). Emits the per-language before/after accounting; every
    * number is an exact long sum or one double division, and the achieved
    * after-shares land near the targets.
    *
    * Scale: rates are a |langs|-row broadcast; the copy decision is a
    * pure projection; one map-combined per-lang aggregation. The exploded
    * copy STREAM (sequence(1, n_copies) posexplode) is what a training
    * run would write — this query emits the accounting view the planner
    * checks.
    */
  def mixtureUpsample(
      docs: DataFrame,
      targets: Map[String, Double],
      defaultTarget: Double = 0.0,
      salt: String = "up"): DataFrame = {
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val nTokens = size(split(trim(col("text")), "\\s+")).cast(LongType)
    val target = targets.foldLeft(lit(defaultTarget)) {
      case (acc, (l, t)) => when(col("lang") === l, lit(t)).otherwise(acc)
    }
    val rates = docs.select(col("lang"), nTokens.as("n"))
      .groupBy(col("lang"))
      .agg(sum(col("n")).as("lang_tokens"))
      .withColumn("total_tokens", sum(col("lang_tokens")).over(w))
      .withColumn("target_share", target)
      .withColumn("ratio", col("target_share") /
        (col("lang_tokens").cast(DoubleType) / col("total_tokens").cast(DoubleType)))
      .withColumn("up_rate", col("ratio") / min(col("ratio")).over(w))
      .select(col("lang"), col("target_share"), col("up_rate"))
    val ticket = pmod(graft.functions.HashOps.md5Low64(
      concat(lit(salt + ":"), col("doc_id").cast(StringType))),
      lit(1000000L)).cast(DoubleType) / 1000000.0
    val frac = col("up_rate") - floor(col("up_rate")).cast(DoubleType)
    docs.select(col("doc_id"), col("lang"), nTokens.as("n"))
      .join(broadcast(rates), Seq("lang"))
      .withColumn("n_copies",
        floor(col("up_rate")).cast(LongType) +
          when(ticket < frac, 1L).otherwise(0L))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_copies")).as("n_copies_total"),
        sum(col("n")).as("tokens_before"),
        sum(col("n") * col("n_copies")).as("tokens_after"),
        first(col("up_rate")).as("up_rate"),
        first(col("target_share")).as("target_share"))
      .withColumn("share_after", col("tokens_after").cast(DoubleType) /
        sum(col("tokens_after")).over(w).cast(DoubleType))
      .select(col("lang"), col("n_docs"), col("n_copies_total"),
        col("tokens_before"), col("tokens_after"), col("up_rate"),
        col("target_share"), col("share_after"))
      .orderBy(col("lang"))
  }

  /** Dataset-version snapshot diff — the audit a lakehouse curation
    * pipeline runs between two corpus releases: which documents were
    * added / removed / changed. Version 2 is DERIVED deterministically
    * from v1 in the query's own derivation (the oracle de-vacuizing
    * pattern — built identically on both engines from doc_id alone):
    * bucket h = pmod(md5_low64('v2|'||doc_id), 20) removes h=0 docs,
    * rewrites h=1 docs (suffix marker), and spawns one new doc per h=2
    * doc at doc_id+10⁸ (disjoint from every natural id at any tested
    * decade).
    *
    * Scale shape: each side reduces to (key, 16-byte md5 fingerprint)
    * AT SCAN — document text never shuffles; the diff is ONE full-outer
    * equi-join on the snapshot key, co-partitioned for free when both
    * releases are bucketed by that key (the lakehouse layout), and the
    * emitted delta is the change set, not the corpus. The per-status
    * totals ride back on a broadcast of the ≤3-row count table.
    */
  def snapshotDiff(docs: DataFrame): DataFrame = {
    val joined = v1Fingerprints(docs)
      .join(v2Fingerprints(docs), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp2").isNull, "removed")
          .when(col("fp1").isNull, "added")
          .when(col("fp1") =!= col("fp2"), "changed")
          .otherwise("unchanged").as("status"))
    withStatusTotals(joined.where(col("status") =!= "unchanged"))
  }

  /** The v1 side of the diff: (doc_id, md5 fingerprint) at scan. */
  private[graft] def v1Fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("fp1"))

  /** The derived v2 release as (doc_id, fp2) — shared by the batch diff
    * and its streaming twin so the derivation cannot drift.
    */
  private[graft] def v2Fingerprints(docs: DataFrame): DataFrame = {
    val h = pmod(graft.functions.HashOps.md5Low64(
      concat(lit("v2|"), col("doc_id").cast(StringType))), lit(20L))
    val hd = docs.withColumn("h", h)
    val carried = hd.where(col("h") =!= 0)
      .select(col("doc_id"),
        md5(when(col("h") === 1, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text"))).as("fp2"))
    val added = hd.where(col("h") === 2)
      .select((col("doc_id") + lit(100000000L)).as("doc_id"),
        md5(concat(lit("added doc "), col("doc_id").cast(StringType)))
          .as("fp2"))
    carried.unionByName(added)
  }

  /** The derived v2 release as a full corpus frame (doc_id, text, lang,
    * source) — the materialized sibling of [[v2Fingerprints]] (same hash,
    * same drop/mutate/add arms) plus two drift plants the fingerprint view
    * cannot carry: bucket 3 nulls out `lang` (null-rate drift) and added
    * docs land with a NEW lang/source pair (distinct-count drift). Used by
    * diag_schema_drift; deterministic, so both engines rebuild it
    * identically (de-vacuizing pattern — every drift metric is guaranteed
    * a real signal to detect).
    */
  private[graft] def v2Corpus(docs: DataFrame): DataFrame = {
    val h = pmod(graft.functions.HashOps.md5Low64(
      concat(lit("v2|"), col("doc_id").cast(StringType))), lit(20L))
    val hd = docs.withColumn("h", h)
    val carried = hd.where(col("h") =!= 0)
      .select(col("doc_id"),
        when(col("h") === 1, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")).as("text"),
        when(col("h") === 3, lit(null).cast(StringType))
          .otherwise(col("lang")).as("lang"),
        col("source"))
    val added = hd.where(col("h") === 2)
      .select((col("doc_id") + lit(100000000L)).as("doc_id"),
        concat(lit("added doc "), col("doc_id").cast(StringType)).as("text"),
        lit("xx").as("lang"), lit("crawl_v2").as("source"))
    carried.unionByName(added)
  }

  /** Attach per-status totals and canonical order. A window count over
    * the ≤3 statuses, not a groupBy+self-join — the join form executed
    * the corpus-sized fingerprint join TWICE per action (once under the
    * counts side, once under the output side; review r6). The delta is
    * the change set, so the 3-partition window shuffle is delta-sized.
    */
  private[graft] def withStatusTotals(delta: DataFrame): DataFrame =
    delta.withColumn("status_total",
        count(lit(1)).over(Window.partitionBy(col("status"))))
      .select(col("doc_id"), col("status"), col("status_total"))
      .orderBy(col("doc_id"))
}
