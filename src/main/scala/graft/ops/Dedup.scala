package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for large text corpora, each built map-first so
  * the only shuffles are the ones the algorithm fundamentally needs:
  *
  *  - exact:      one shuffle on the content digest (hash-groupBy);
  *  - minhash:    signatures are computed per-row with codegen'd higher-order
  *                functions (no explode of shingles across rows!), then ONE
  *                shuffle on (band, bandKey) produces candidate buckets, and
  *                candidate pairs are verified with an exact Jaccard join —
  *                at 100 TB the band shuffle moves ~k*8 bytes/doc, not text;
  *  - simhash:    64-bit signature per row, banded into 16-bit keys, verified
  *                by Hamming distance (bit_count(xor)) — constant bytes/doc;
  *  - ngram:      exact 3-gram Jaccard within a blocking key, for
  *                oracle-checkable ground truth on candidate subsets.
  *
  * Everything is seeded deterministically; no RNG at runtime.
  */
object Dedup {

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Deterministic 1-in-[[SubsetK]] corpus subset for second-decade oracle
    * proofs of the pair/CC dedup family: the DuckDB all-pairs / recursive-CC
    * replays are quadratic, so at sf0.1 the FULL-corpus oracles blow the
    * gate budget and the family was value-proven only at sf0.01 (r6 VERDICT
    * #3). Restricting BOTH engines to pmod(md5_low64(doc_id), K) = 0 before
    * the pair stage shrinks the replay ~K² while the Spark side still runs
    * the identical banded/prefix/CC code path over the larger corpus's
    * data. md5 (not xxhash64) because the subset must replay hash-exactly
    * in DuckDB (`md5_number_lower` — the cross-engine-deterministic rule).
    *
    * Two PLANTED near-duplicate docs (ids −1/−2, identical text, built from
    * literals the same way in both engines) ride along so the subset's
    * ground truth can never be vacuously empty on a regenerated corpus —
    * a green row must die if the Spark pair stage regresses to empty.
    */
  val SubsetK = 4L
  val PlantedText =
    "graft planted near duplicate alpha beta gamma delta epsilon zeta"

  /** Subset filter + planted positives over the raw `documents` frame
    * (doc_id, text, lang, source, n_chars).
    */
  def subsetDocs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val planted = Seq(-1L, -2L)
      .map(id => (id, PlantedText, "xx", "planted", PlantedText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs
      .where(pmod(graft.functions.HashOps.md5Low64(col("doc_id").cast(StringType)),
        lit(SubsetK)) === 0L)
      .unionByName(planted)
  }

  /** Distinct word n-gram shingles from a MATERIALIZED token-array column.
    *
    * `toks` must be a plain column reference (project `tokens(text)` first):
    * an expression subtree referenced inside a higher-order-function lambda
    * is re-evaluated per element, so passing `split(...)` directly would
    * re-split the whole text for every shingle position — O(|tokens|^2)
    * per row (measured ~1 ms/doc on the 5k corpus before this split).
    */
  def shinglesFromTokens(toks: Column, n: Int = 3): Column =
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - n + 1),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array(concat_ws(" ", toks))))

  /** Distinct word n-gram shingles straight from text — one native pass
    * (graft.functions.NgramShingles), value-equal to the HOF formulation.
    */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.HashOps.ngramShingles(text, n)

  /** docs -> (idCol as doc_id, sh). */
  def withShingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"), shingles(col(textCol), n).as("sh"))

  /** k-permutation MinHash signature of a shingle array. Each shingle STRING
    * is hashed once (xxhash64 over its bytes); the k permutations re-hash
    * only the resulting 8-byte long inside a native one-pass expression
    * (graft.functions.MinHashSig) — O(|shingles|) string work +
    * O(k*|shingles|) primitive long work, no interpreted lambdas.
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    graft.functions.HashOps.minhashSig(
      transform(shingleCol, s => xxhash64(s)), k)

  /** MinHash-LSH near-duplicate pairs.
    *
    * @param numHashes signature length k
    * @param bands     LSH bands b (rows per band r = k/b); a pair sharing any
    *                  band bucket becomes a candidate
    * @param threshold exact-Jaccard verification threshold on shingle sets
    */
  def minhashLshPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7,
      maxBucket: Int = 256,
      checkpointDir: Option[String] = None): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    checkpointDir.foreach(docs.sparkSession.sparkContext.setCheckpointDir)

    // shingle -> hash -> signature in ONE corpus pass; nothing corpus-sized
    // is cached (a corpus-wide shingle persist is 100TB-scale state — the
    // candidate set below is re-shingled instead, which touches only docs
    // that actually collided in a band)
    val withSig = docs.select(col(idCol).as("doc_id"),
      minhashSignature(shingles(col(textCol)), numHashes).as("sig"))

    // ONE narrow shuffle: only (band, bandKey, doc_id) flows — shingle
    // arrays are NOT shipped through the 16-way band explode
    val banded = withSig.select(
      col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * r + 1, r)).as("key"))
      }: _*)).as("bk"))

    val candidatePairs = banded
      .select(col("bk.band"), col("bk.key"), col("doc_id"))
      .groupBy(col("band"), col("key"))
      .agg(collect_list(col("doc_id")).as("ids"))
      // mega-buckets are giant exact-dup clusters: at corpus scale the
      // O(|bucket|^2) pair explosion inside one task is the failure mode,
      // and dedup_exact already collapses those clusters in linear time —
      // so LSH skips buckets past the cap rather than detonating
      .where(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
      .select(explode(col("ids")).as("doc_a"), col("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
      .where(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      // the pair list feeds two consumers (candidate-id extraction + the
      // final verification join): materialize it once, eagerly. Unlike
      // persist(), a localCheckpoint'd RDD is ContextCleaner-eligible, so
      // repeated calls in one session do not accumulate pinned cache
      // blocks. checkpointDir switches to a RELIABLE checkpoint (survives
      // executor loss — the right mode on a real cluster).
      .transform(df =>
        if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint())

    // exact verification on HASH-typed shingles (array<long> — 8 bytes per
    // shingle instead of the string), recomputed for the candidate set only:
    // the join runs BEFORE the shingle projection, so only colliding docs
    // pay the shingling cost again
    val candIds = candidatePairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val candSh = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .join(candIds, "doc_id")
      .select(col("doc_id"),
        transform(shingles(col("text")), s => xxhash64(s)).as("hsh"))
    val shA = candSh.select(col("doc_id").as("doc_a"), col("hsh").as("sh_a"))
    val shB = candSh.select(col("doc_id").as("doc_b"), col("hsh").as("sh_b"))
    candidatePairs
      .join(shA, "doc_a")
      .join(shB, "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast(DoubleType) / col("uni"))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 64-bit SimHash of the token multiset: per-bit majority vote over
    * xxhash64(token), evaluated in one native pass
    * (graft.functions.SimHash). Per-row, no shuffle.
    */
  def simhash64(text: Column): Column =
    graft.functions.HashOps.simhash(
      graft.functions.HashOps.md5TokensLow64(tokens(text)))

  /** SimHash near-duplicate pairs: 4 bands of 16 bits for candidate
    * generation (any identical band → candidate), Hamming <= maxHamming via
    * bit_count(xor) for verification.
    *
    * With maxHamming <= 3 the output is EXACTLY the all-pairs answer, by
    * pigeonhole: <= 3 differing bits spread over 4 disjoint 16-bit bands
    * leave at least one band identical, so every qualifying pair is a
    * candidate — a deterministic (not probabilistic) recall guarantee,
    * which is what lets the DuckDB oracle recompute the same set from
    * scratch. Token hashes are MD5 low-64 (md5_number_lower bits) so the
    * signature itself replays cross-engine.
    *
    * `maxBucket` is the quadratic-blowup safety valve: buckets past it are
    * dropped (and with them the exactness claim for pairs whose every
    * shared band is a mega-bucket). The default is 8192, not 256, because
    * template-heavy corpora bias signature bits and legitimately pile
    * hundreds of NON-near-dup docs onto one 16-bit band key (the
    * 2026-08-13 testdata drop: max bucket 317 at sf0.1, 1073 at the 100×
    * dir — max-load growth, not linear), and a skipped bucket silently
    * breaks banded == all-pairs. An 8192 bucket is ~34M xor/bit_count
    * comparisons in one task (~sub-second) and 128 KB of (id, sig) state.
    * The honest asymptote: 4×16-bit bands are FORCED by the hamming<=3
    * pigeonhole over a 64-bit signature, so bucket sizes must grow with
    * the corpus — there are only 2^16 keys per band, and average bucket
    * population grows linearly past ~65k docs/band value. MEASURED on the
    * four-decade sweep (ROUND6_NOTES): sub-linear through 500k docs, then
    * e≈2.1 into the 5M-doc decade (531 s vs 44 s for the multi-table
    * variant). At that scale switch to [[simhashPairsBlocked]] — same
    * deterministic hamming<=3 recall via C(6,3) block-triple tables with
    * ~32-bit keys, 5× the candidate-generation volume, buckets that stay
    * small for ~2^16× longer — or collapse boilerplate upstream first
    * (exact/substring dedup).
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3,
      maxBucket: Int = 8192,
      failOnOverCap: Boolean = true): DataFrame = {
    val withSig = docs.select(col(idCol).as("doc_id"),
      simhash64(col(textCol)).as("sig"))
    val banded = withSig.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
      }: _*)).as("bk"))
    val keyed = banded
      .select(col("bk.band"), col("bk.key"), struct(col("doc_id"), col("sig")).as("d"))
    // SELF-ENFORCING exactness contract (r6 VERDICT #4): a bucket past
    // `maxBucket` is DROPPED by the valve below, and with it the
    // banded == all-pairs pigeonhole claim — silently. Refuse instead:
    // one map-combined count agg over the band keys (bounded ≤ 4·2^16
    // rows, recomputes only the native signature pass) checks max load
    // before any bucket is materialized. BucketLoad is the standalone
    // diagnostic; this is the same measure, in-line and fatal.
    if (failOnOverCap) {
      val r = keyed.groupBy(col("band"), col("key")).count()
        .agg(max(col("count")), count(when(col("count") > maxBucket, 1)))
        .head()
      val (maxLoad, overCap) = (r.getLong(0), r.getLong(1))
      if (overCap > 0) throw new IllegalStateException(
        s"simhashPairs: $overCap band bucket(s) exceed maxBucket=$maxBucket " +
          s"(max load $maxLoad) — dropping them silently breaks the " +
          "banded == all-pairs hamming<=3 guarantee on THIS corpus. Use " +
          "Dedup.simhashPairsBlocked (6-block/C(6,3) ~32-bit keys, same " +
          "deterministic recall), collapse boilerplate upstream first, or " +
          "pass failOnOverCap = false to accept documented pair loss.")
    }
    keyed
      .groupBy(col("band"), col("key"))
      .agg(collect_list(col("d")).as("ds"))
      .where(size(col("ds")) > 1 && size(col("ds")) <= maxBucket)
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .where(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Manku-style multi-table SimHash pairs — the 10^9-doc scale path the
    * 4×16 banding's scaladoc points to, WITHOUT giving up deterministic
    * recall.
    *
    * Layout: the 64-bit signature is split into 6 disjoint blocks
    * (11,11,11,11,10,10 bits); each of the C(6,3) = 20 block-triples is a
    * probe table whose key concatenates its three blocks (~32 bits). With
    * maxHamming <= 3, the flipped bits touch at most 3 of the 6 blocks, so
    * at least 3 blocks are clean and the table keyed on any triple of
    * clean blocks matches EXACTLY — the same pigeonhole proof as the
    * 4-band layout, so multi-table == banded == all-pairs, and the DuckDB
    * all-pairs oracle replays it unchanged.
    *
    * The trade vs `simhashPairs` (cf. Manku/Jain/Sarma, WWW'07 §3): 20
    * exploded rows/doc instead of 4 (5× candidate-generation shuffle
    * volume, still constant bytes/doc), in exchange for ~32-bit bucket
    * keys instead of 16-bit — template-skewed corpora that pile hundreds
    * of docs onto one 16-bit band key (317 at sf0.1, 1073 at the 100× dir
    * on the 2026-08-13 drop) need three biased blocks to agree
    * SIMULTANEOUSLY before a bucket grows, so the quadratic verify stays
    * bounded for several more decades before the `maxBucket` valve is in
    * sight. This is the variant to run past the point where 16-bit
    * mega-buckets approach the cap; below that, `simhashPairs` moves 5×
    * less data.
    */
  def simhashPairsBlocked(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3,
      maxBucket: Int = 8192): DataFrame =
    simhashPairsFromSigs(
      docs.select(col(idCol).as("doc_id"), simhash64(col(textCol)).as("sig")),
      maxHamming, maxBucket)

  /** The multi-table probe machinery of [[simhashPairsBlocked]] at
    * signature level (doc_id, sig) — one definition of the 6-block layout
    * and key packing, so the adversarial flip audit in OpsSpec exercises
    * the PRODUCTION layout rather than a private re-implementation.
    */
  private[graft] def simhashPairsFromSigs(
      withSig: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 8192): DataFrame = {
    require(maxHamming <= 3,
      "6-block/triple-table layout guarantees recall only for hamming <= 3")
    val widths = Seq(11, 11, 11, 11, 10, 10)
    val offsets = widths.scanLeft(0)(_ + _).init
    def block(i: Int): Column =
      shiftright(col("sig"), offsets(i)).bitwiseAND(lit((1L << widths(i)) - 1))
    val tables = (0 until 6).combinations(3).toSeq.zipWithIndex
    val probed = withSig.select(col("doc_id"), col("sig"),
      explode(array(tables.map { case (blks, tid) =>
        struct(lit(tid).as("tbl"),
          (shiftleft(block(blks(0)), 22)
            .bitwiseOR(shiftleft(block(blks(1)), 11))
            .bitwiseOR(block(blks(2)))).as("key"))
      }: _*)).as("tk"))
    probed
      .select(col("tk.tbl"), col("tk.key"),
        struct(col("doc_id"), col("sig")).as("d"))
      .groupBy(col("tbl"), col("key"))
      .agg(collect_list(col("d")).as("ds"))
      .where(size(col("ds")) > 1 && size(col("ds")) <= maxBucket)
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .where(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Exact n-gram Jaccard over a bounded candidate set (same `source`
    * blocking key) — the oracle-checkable ground-truth variant; O(B^2) per
    * block, so only usable where blocks are small.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      blockCol: String = "source",
      threshold: Double = 0.5,
      maxSpillBytes: Long = -1L): DataFrame = {
    // spill contract (r9 VERDICT #3, the jaccardPrefixPairs guard at this
    // operator's own expansion): the exploded index here ships the SHINGLE
    // STRING (~50 B/row at chars/6 rows ≈ 8×chars) on BOTH sides of the
    // (blk, s) self-join, so live shuffle files run ~2× the prefix-filter
    // shape → ×16
    guardIndexSpill(docs, "text", "ngramJaccardPairs",
      "Dedup.minhashLshPairs (dedup_minhash_lsh) or Dedup.jaccardPrefixPairs",
      maxSpillBytes, bytesPerChar = 16L)
    // inverted-index formulation: explode shingles, equi-join on
    // (block, shingle), count common shingles per pair, then
    // J = c / (|A| + |B| - c). Pairs sharing no shingle never materialize,
    // so the cost is driven by genuine overlap, not by O(B^2) array
    // intersections — and every operator (explode, shuffle join, count
    // aggregate) stays inside whole-stage codegen, unlike array_intersect
    // on higher-order-function results.
    val ex = docs.select(col(blockCol).as("blk"), col("doc_id"),
        shingles(col("text")).as("sh"))
      .withColumn("n", size(col("sh")))
      .select(col("blk"), col("doc_id"), col("n"), explode(col("sh")).as("s"))
    val a = ex.select(col("blk"), col("s"), col("doc_id").as("doc_a"), col("n").as("na"))
    val b = ex.select(col("blk"), col("s"), col("doc_id").as("doc_b"), col("n").as("nb"))
    a.join(b, Seq("blk", "s"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("c"))
      .withColumn("jaccard",
        col("c").cast(DoubleType) / (col("na") + col("nb") - col("c")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SELF-ENFORCING spill-footprint contract for exploded-shingle-index
    * operators (r8 VERDICT #5, the guardBlockLoad discipline): BEFORE
    * building the index, estimate its live shuffle footprint from the
    * corpus character count and refuse with a named alternative when it
    * exceeds the scratch disk — the decade-4 full-corpus run died ENOSPC
    * mid-query at ~60 GB free instead.
    *
    * Estimate: shingle count ≈ word count ≈ chars/6; an exploded index
    * row (doc_id, nsh, 3-word shingle string) serializes to ~48 B, and
    * local mode keeps every index-scale exchange's files on disk until
    * the query ends (the explode repartition, the df join + window sort,
    * the prefix repartition, and the two verification joins ≈ 4–6 live
    * copies, partially offset by shuffle lz4). Net ≈ chars × 8 — which
    * retrodicts the measured crash (16 GB text → >60 GB spill). The
    * character count comes from the n_chars metadata column when present
    * (a narrow column-pruned scan, never the text); a frame without it
    * pays one length() pass — still cheaper than dying at 80% progress.
    *
    * `maxSpillBytes`: −1 (the default at every call site) = audit
    * against the usable space of the Spark scratch dirs; 0 = disabled
    * (the caller has provisioned disk deliberately); >0 = explicit
    * budget (the unit-test surface). r10 ADVICE: the gate used to be
    * `>= 0`, silently disabling the default auto-audit — the production
    * path now measured by the huge-n_chars refusal test in OpsSpec.
    *
    * `bytesPerChar` is the OPERATOR's own live-spill expansion factor —
    * the jaccard-prefix retrodiction (×8) holds for indexes that ship the
    * shingle STRING through 4–6 live exchanges; operators shipping only
    * 8-byte hashes, or exploding window substrings at other densities,
    * pass their own factor (each call site documents its arithmetic).
    */
  /** @return the measured corpus character count (reusable by the caller
    *          for self-sizing decisions — one agg scan, not two). Measured
    *          even when the guard is disabled (`maxSpillBytes == 0`): only
    *          the budget CHECK is skipped — r11 ADVICE found the −1 return
    *          silently turned OFF the jaccard verify-stage widening in
    *          exactly the provisioned-disk/large-corpus scenario where the
    *          single-threaded intersect stage hurts most.
    */
  private[graft] def guardIndexSpill(docs: DataFrame, textCol: String,
      op: String, alternative: String, maxSpillBytes: Long,
      bytesPerChar: Long = 8L): Long = {
      val charsCol =
        if (docs.columns.contains("n_chars")) col("n_chars").cast(LongType)
        else length(col(textCol)).cast(LongType)
      val totalChars =
        docs.agg(coalesce(sum(charsCol), lit(0L))).head().getLong(0)
      if (maxSpillBytes == 0L) return totalChars
      val est = totalChars * bytesPerChar
      val budget =
        if (maxSpillBytes > 0L) maxSpillBytes
        else {
          val spark = docs.sparkSession
          // scratch-dir precedence mirrors Spark's own Utils
          // .getConfiguredLocalDirs: the SPARK_LOCAL_DIRS environment
          // variable OVERRIDES spark.local.dir (r9 ADVICE — a cluster
          // configured via the env var would otherwise have the guard
          // measuring the wrong disk), then the JVM tmpdir fallback
          val dirs = sys.env.get("SPARK_LOCAL_DIRS")
            .orElse(spark.conf.getOption("spark.local.dir"))
            .getOrElse(System.getProperty("java.io.tmpdir", "/tmp"))
            .split(",").map(_.trim).filter(_.nonEmpty)
          // a configured-but-not-yet-created local dir reports 0 usable
          // bytes — that's "unknown", not "full"; only existing dirs vote,
          // and with none measurable the guard abstains (Long.MaxValue)
          // rather than vetoing every corpus
          val measurable = dirs.map(new java.io.File(_))
            .filter(_.exists()).map(_.getUsableSpace).filter(_ > 0L)
          if (measurable.isEmpty) Long.MaxValue else measurable.min
        }
      if (est > budget) throw new IllegalStateException(
        s"$op: exploded shingle index would spill ~${est >> 20} MiB " +
          s"(corpus ${totalChars >> 20} MiB of text x ~$bytesPerChar) against " +
          s"${budget >> 20} MiB of scratch — refusing up front instead of " +
          s"dying ENOSPC mid-query. Use $alternative, provision scratch, " +
          "or pass maxSpillBytes deliberately.")
      totalChars
  }

  /** Global exact-Jaccard pairs by PREFIX FILTERING (Chaudhuri et al.
    * ICDE'06; Bayardo/Ma/Srikant WWW'07 "all-pairs"; Xiao et al. PPJoin) —
    * DETERMINISTIC recall with no blocking key and no signatures, the
    * third member of the Jaccard family next to [[ngramJaccardPairs]]
    * (exact but needs corpus-small blocks) and [[minhashLshPairs]]
    * (global but probabilistic, miss-prob ≈ 4e-10).
    *
    * Theorem (canonical prefix filter): order every doc's shingles by one
    * global total order — here (document frequency asc, shingle asc), the
    * rarest-first order that keeps boilerplate shingles OUT of prefixes —
    * and keep the first p = n − ceil(t·n) + 1 of each doc's n shingles.
    * If J(A,B) ≥ t then |A∩B| ≥ ceil(t·max(|A|,|B|)), so the globally
    * FIRST common shingle sits within the first |A|−|A∩B|+1 ≤ p positions
    * of BOTH docs: every qualifying pair shares a prefix shingle. The
    * threshold is an exact rational tNum/tDen and p uses integer
    * arithmetic ((n·tNum + tDen−1) div tDen) — a double ceil could round
    * UP at exact boundaries and silently shorten a prefix below the
    * theorem's bound.
    *
    * Cost: the df aggregation + one doc_id-partitioned window over the
    * exploded index (rows = Σ shingles), a candidate equi-join on PREFIX
    * shingles only (rare-first ordering keeps these buckets small — the
    * inverse of the simhash mega-bucket failure), a length filter
    * (t·na ≤ nb ≤ na/t, integer form), then exact-overlap verification
    * over candidates only. Never all-pairs on the Spark side; the DuckDB
    * all-pairs oracle replays the full output value-exactly.
    */
  def jaccardPrefixPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      tNum: Int = 7, tDen: Int = 10,
      n: Int = 3,
      parts: Int = 32,
      maxSpillBytes: Long = -1L): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, "threshold in (0, 1]")
    val totalChars = guardIndexSpill(docs, textCol, "jaccardPrefixPairs",
      "Dedup.subsetDocs (dedup_jaccard_prefix_subset)", maxSpillBytes)
    // HASHED index keys (r11 VERDICT #9, guide §2.3 narrower types): the
    // three index-scale exchanges ship h = xxhash64(shingle) longs instead
    // of ~25-byte shingle strings — index rows are (doc_id, nsh, h), three
    // longs, roughly halving exchange bytes and replacing string sorts /
    // string-key SMJs with long compares. Correctness WITHOUT a string
    // tiebreak: document frequency is counted per h-class and the window
    // uses rank() over (df, h) — rank is a deterministic function of the
    // row multiset (no arbitrary tie order), and for ANY total order ≤*
    // refining the (df, h) preorder, position≤*(x) ≥ rank(x), so the
    // rank-prefix is a SUPERSET of the theorem prefix under ≤* in every
    // doc. The guaranteed first-common shingle of a qualifying pair is
    // therefore in both rank-prefixes (its h likewise), candidates remain
    // a superset, and the exact array_intersect verification over TRUE
    // shingles makes the output identical — recall stays a theorem, not a
    // no-collision assumption. An h-collision can only merge df counts
    // (reordering the heuristic) or admit an extra candidate (verified
    // away); it can never drop a qualifying pair.
    val ex = docs
      .select(col(idCol).as("doc_id"), shingles(col(textCol), n).as("sh"))
      .select(col("doc_id"), size(col("sh")).cast(LongType).as("nsh"),
        explode(col("sh")).as("s"))
      .select(col("doc_id"), col("nsh"), xxhash64(col("s")).as("h"))
      .repartition(parts, col("h"))
    val dfreq = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
    val pref = ex.join(dfreq, Seq("h"))
      .repartition(parts, col("doc_id"))
      .withColumn("rn", rank().over(w))
      .where(col("rn") <=
        col("nsh") - expr(s"(nsh * $tNum + ${tDen - 1}) div $tDen") + lit(1L))
      .select(col("h"), col("doc_id"), col("nsh"))
      .repartition(parts, col("h"))
    // merge-hint the self-join: both sides are the IDENTICAL pref exchange,
    // so a sort-merge join reads it ONCE (ReusedExchange) — the planner's
    // own choice at scale. Left to statistics, a base-scale corpus (~2 MB
    // prefix frame) auto-broadcasts one side instead, which RE-DERIVES the
    // whole prefix chain (scan → explode → df join → window) for the
    // broadcast build: a duplicated subtree, not a cheaper join.
    val cand = pref.toDF("s", "doc_a", "na").hint("merge")
      .join(pref.toDF("s", "doc_b", "nb"), Seq("s"))
      .where(col("doc_a") < col("doc_b") &&
        col("nb") * tDen >= col("na") * tNum &&
        col("na") * tDen >= col("nb") * tNum)
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .dropDuplicates("doc_a", "doc_b")
    // exact-overlap verification over CANDIDATE pairs only: join the pair
    // list against per-doc shingle ARRAYS and count the overlap map-side
    // with size(array_intersect) — identical integers to the exploded
    // (doc_b, s) equi-join + groupBy it replaces (shingles are distinct
    // per doc, so matched-row count == intersection size), minus two
    // candidate-scale exchanges (the (doc_b, s) repartition and the final
    // groupBy): measured 7.0 → 2.0 s on the verify stage at sf0.1, where
    // 104k candidates funnel to 256 pairs. Shuffle volume is unchanged —
    // a doc's shingles ship once per candidate pair either way — only the
    // exchange count drops.
    val shMap = docs.select(col(idCol).as("doc_id"),
      shingles(col(textCol), n).as("sh"))
    // explicit width for the verify chain: AQE coalesces these exchanges by
    // COMPRESSED byte size (the candidate frame is ~2 MB of highly
    // repetitive pairs at sf0.1), but the stage's cost is the per-pair
    // array_intersect over full shingle arrays — measured as 2 near-single-
    // threaded ~0.9 s stages (StageProfile) while the rest of the query ran
    // 32-wide. Self-sized from the corpus chars the spill guard already
    // measured (~1 task per 50k chars — the verify stage's work is
    // candidates × per-doc shingle intersects, an order denser per corpus
    // char than the scan stages — capped at `parts`). A small corpus (the
    // _subset sibling) stays near AQE's own coalescing, where a forced
    // 32-way exchange measured +0.5 s of pure stage overhead.
    val vParts = math.min(parts.toLong, totalChars / 50000L).toInt
    // below ~8 tasks the forced exchange costs about what it saves
    // (measured +0.1-0.5 s on the quarter-corpus _subset) — leave tiny
    // corpora to AQE's coalescing
    val widened = if (vParts >= 8) cand.repartition(vParts, col("doc_a")) else cand
    val verified = widened
      .join(shMap.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        Seq("doc_a"))
      .join(shMap.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
        size(array_intersect(col("sh_a"), col("sh_b")))
          .cast(LongType).as("c"))
    verified
      // c/(na+nb−c) >= tNum/tDen in exact integers (equivalent to the
      // oracle's double compare for every feasible (c, union) — the nearest
      // non-equal rationals to tNum/tDen need ~1e16 denominators)
      .where(col("c") * (tDen + tNum) >= (col("na") + col("nb")) * tNum)
      .select(col("doc_a"), col("doc_b"),
        (col("c").cast(DoubleType) / (col("na") + col("nb") - col("c")))
          .as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Embedding-cosine near-duplicate pairs via random-hyperplane LSH —
    * exactly the [[minhashLshPairs]] shape over sign-bit band keys
    * (graft.functions.SignRandomProjection): per-row signatures, ONE narrow
    * (band, key, vec_id) shuffle, a maxBucket cap against mega-bucket
    * detonation, and exact-cosine verification joined back for the (small)
    * candidate set only. No O(N²) stage: random pairs scatter across
    * 2^bitsPerBand buckets per band, while pairs with cosine ≥ ~0.9 collide
    * in some band with probability ≥ 1-(1-(1-θ/π)^bitsPerBand)^bands
    * (≈ 0.96 at cosine 0.9, → 1 as cosine → 1 with the defaults).
    */
  def embeddingCosinePairs(
      embeddings: DataFrame,
      threshold: Double = 0.95,
      bands: Int = 16,
      bitsPerBand: Int = 16,
      maxBucket: Int = 256): DataFrame = {
    val e = embeddings.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("v"))

    // narrow band explode: only (vec_id, band, key) flows to the shuffle
    val banded = e.select(col("vec_id"),
        posexplode(graft.functions.VectorOps.signProjectionBands(
          col("v"), bands, bitsPerBand)))
      .toDF("vec_id", "band", "key")

    val candidatePairs = banded
      .groupBy(col("band"), col("key"))
      .agg(collect_list(col("vec_id")).as("ids"))
      .where(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
      .select(explode(col("ids")).as("vec_a"), col("ids"))
      .select(col("vec_a"), explode(col("ids")).as("vec_b"))
      .where(col("vec_a") < col("vec_b"))
      .dropDuplicates("vec_a", "vec_b")

    val va = e.select(col("vec_id").as("vec_a"), col("v").as("va"))
    val vb = e.select(col("vec_id").as("vec_b"), col("v").as("vb"))
    candidatePairs
      .join(va, "vec_a")
      .join(vb, "vec_b")
      .withColumn("cosine", Similarity.cosine(col("va"), col("vb")))
      .where(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Distributed connected components over a near-duplicate pair graph:
    * the alternating LARGE-STAR / SMALL-STAR algorithm (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14).
    *
    * Near-dup DEDUPLICATION needs components, not pairs — "keep one doc per
    * cluster" is only well-defined once transitive closure has merged
    * overlapping pairs (a~b, b~c => {a,b,c} is one cluster even when a!~c).
    *
    * Scale shape: no driver-side graph state and no quadratic stage — each
    * round is two min-aggregation shuffles keyed on node id, the edge set
    * never grows beyond its input size (large-star/small-star only ever
    * REPLACE an endpoint with a smaller one), and convergence takes
    * O(log^2 n) rounds on adversarial graphs (2 rounds on typical dup
    * clusters, which are near-cliques). MEASURED round-count law
    * (SCALESWEEP_1000x_r11, CcScale diameter sweep at fixed 1M edges):
    * 11/15/18/21 rounds at path diameter 10^3/10^4/10^5/10^6 — observed
    * convergence is ~log2(d)+1, i.e. Θ(log d) even on the adversarial
    * path, below the worst-case bound; elapsed is linear in rounds
    * (~3.2 s/round at that edge count on 16 cores), so the valve's cost
    * model is per-round edge-sized shuffles × a logarithmic round count.
    * Each round is localCheckpoint'd:
    * iterative lineage otherwise re-executes the whole history every action.
    *
    * Returns (doc_id, cluster_id) for every node that appears in `pairs`,
    * where cluster_id = min doc_id of the component.
    */
  /** Edge sets at or under this count label via a driver union-find;
    * larger graphs run the distributed large-star/small-star loop. Both
    * produce identical component-min labels, so results are
    * path-independent — the guard-with-fallback discipline, applied to
    * iteration overhead instead of memory.
    *
    * Driver footprint at the cap (r9 ADVICE, all primitive-typed now):
    * the union-find is index-compressed long/int arrays plus one
    * open-addressed long→int probe table — ~55 B per NODE at table load
    * ≥ 0.5, no boxing — and the edges arrive via `toLocalIterator`
    * (partition-at-a-time, never a full boxed Row array). The cap is
    * derived from the driver's actual heap: 256 B of budget per edge
    * (≤2 nodes/edge × ~55 B map+arrays, ×2 for the probe-table doubling
    * transient and the in-flight partition) bounds the peak at
    * ≤ maxMemory/2 even on a 1 GB default driver, and 5M edges stays the
    * ceiling — past that the distributed loop wins on elapsed anyway.
    *
    * The GRAFT_CC_DRIVER_CAP env var overrides the derived cap — the
    * measurement hook for sweeping the DISTRIBUTED valve at scale
    * (`GRAFT_CC_DRIVER_CAP=0 runMain graft.TimeQ dedup_clusters`) without
    * threading a parameter through every registered query.
    */
  private[graft] val ccDriverEdgeCap: Long =
    sys.env.get("GRAFT_CC_DRIVER_CAP").flatMap(_.toLongOption).getOrElse(
      math.min(5000000L, Runtime.getRuntime.maxMemory() / 256L))

  /** Component-min labels of an edge stream via primitive union-find:
    * node ids are index-compressed through an open-addressed long→int
    * table (linear probing, power-of-two capacity, load ≤ 0.5), unions
    * keep the smaller-ID root (so each tree's root IS the component min),
    * finds fully path-compress. Returns parallel (node_id, label) arrays
    * covering every endpoint exactly once — the same surface the
    * distributed [[connectedComponents]] loop emits, pinned equal in
    * OpsSpec. `sizeHint` pre-sizes the arrays (an edge count upper-bounds
    * nodes at 2×; growth doubles from there if exceeded).
    */
  private[graft] def driverMinLabels(
      edges: Iterator[(Long, Long)],
      sizeHint: Int = 1024): (Array[Long], Array[Long]) = {
    // pre-size the probe table from the hint but cap the upfront
    // allocation at 2M slots (24 MB) — doubling rehashes take over from
    // there, so a small graph never pays the worst-case footprint
    var cap = java.lang.Integer.highestOneBit(
      math.max(64, math.min(1 << 20, sizeHint * 4 - 1))) << 1
    var keys = new Array[Long](cap)
    var vals = new Array[Int](cap); java.util.Arrays.fill(vals, -1)
    var ids = new Array[Long](math.max(64, sizeHint))
    var parent = new Array[Int](ids.length)
    var n = 0
    def index(id: Long): Int = {
      var h = (java.lang.Long.hashCode(id * -7046029254386353131L)) & (cap - 1)
      while (vals(h) != -1 && keys(h) != id) h = (h + 1) & (cap - 1)
      if (vals(h) != -1) vals(h)
      else {
        if (n == ids.length) {
          ids = java.util.Arrays.copyOf(ids, n * 2)
          parent = java.util.Arrays.copyOf(parent, n * 2)
        }
        ids(n) = id; parent(n) = n
        if ((n + 1) * 2 > cap) { // rehash at load 0.5
          val (ok, ov, oc) = (keys, vals, cap)
          cap <<= 1
          keys = new Array[Long](cap)
          vals = new Array[Int](cap); java.util.Arrays.fill(vals, -1)
          var i = 0
          while (i < oc) {
            if (ov(i) != -1) {
              var j = (java.lang.Long.hashCode(
                ok(i) * -7046029254386353131L)) & (cap - 1)
              while (vals(j) != -1) j = (j + 1) & (cap - 1)
              keys(j) = ok(i); vals(j) = ov(i)
            }
            i += 1
          }
          var h2 = (java.lang.Long.hashCode(
            id * -7046029254386353131L)) & (cap - 1)
          while (vals(h2) != -1) h2 = (h2 + 1) & (cap - 1)
          keys(h2) = id; vals(h2) = n
        } else { keys(h) = id; vals(h) = n }
        n += 1
        n - 1
      }
    }
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (c != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val ra = find(index(a)); val rb = find(index(b))
      if (ra != rb) {
        if (ids(ra) < ids(rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    val outIds = java.util.Arrays.copyOf(ids, n)
    val labels = new Array[Long](n)
    var i = 0
    while (i < n) { labels(i) = ids(find(i)); i += 1 }
    (outIds, labels)
  }

  /** (doc_id, cluster_id) frame straight off [[driverMinLabels]]'
    * parallel primitive arrays: one broadcast of ~16 B/node read inside
    * mapPartitions — no boxed tuple Seq, no task-closure copy of the
    * arrays (r9 ADVICE's double-copy fix).
    */
  private[graft] def labelsFrame(
      spark: org.apache.spark.sql.SparkSession,
      ids: Array[Long], labels: Array[Long]): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((ids, labels))
    spark.range(0, ids.length.toLong, 1L,
        math.max(1, ids.length / 1000000 + 1))
      .mapPartitions { it =>
        val (is, ls) = bc.value
        it.map(i => (is(i.intValue), ls(i.intValue)))
      }
      .toDF("doc_id", "cluster_id")
  }

  /** `roundsOut`, when supplied, receives the number of distributed
    * large-star/small-star rounds the loop ran (0 on the driver fast
    * path) — the CcScale diameter sweep's measured round-count law
    * (SCALESWEEP_1000x_r11: rounds grow ~log2(diameter) at fixed edges,
    * the Kiveris et al. O(log² d) bound's observed shape).
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      maxIter: Int = 25,
      checkpointDir: Option[String] = None,
      driverEdgeCap: Long = ccDriverEdgeCap,
      roundsOut: Option[java.util.concurrent.atomic.AtomicInteger] = None)
      : DataFrame = {
    val spark = pairs.sparkSession
    // iterative-truncation primitive: localCheckpoint (zero-IO, executor
    // blocks — right for local[] and short loops) by default; passing
    // checkpointDir switches every round to RELIABLE checkpoints on shared
    // storage, which a real cluster needs — a local checkpoint dies with
    // its executor mid-loop. (setCheckpointDir creates a fresh UUID subdir
    // per invocation, so concurrent runs never collide.)
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def mat(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()

    // canonical orientation u > v (self-loops dropped)
    var edges = mat(pairs
      .select(greatest(col(aCol), col(bCol)).as("u"),
        least(col(aCol), col(bCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct())
    var it = 0
    // ONE aggregate action per round: |E| plus an order-independent set
    // fingerprint (exact decimal sum of per-edge hashes — decimal because
    // ANSI mode throws on Long-sum overflow). Fixpoint = count AND
    // fingerprint unchanged; this replaces the former per-round count +
    // except() pair, which ran a full extra distributed set-difference
    // every round. The round that FIRST reports convergence is then
    // confirmed with one exact except() (below), so the probabilistic
    // check gates work but never the final answer.
    def stats(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(
        count(lit(1)),
        coalesce(sum(xxhash64(col("u"), col("v")).cast(DecimalType(38, 0))),
          lit(0).cast(DecimalType(38, 0)))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    var (nEdges, fp) = stats(edges)
    // Capped driver fast path (the r9 streamCcRun relabel discipline,
    // generalized): a dup-pair graph is typically orders of magnitude
    // smaller than its corpus, and the distributed loop pays 4+ jobs of
    // per-round overhead regardless of edge count — 1–3 s per round on a
    // few thousand edges. At or under the cap, stream the canonical edge
    // set to the driver (toLocalIterator — partition at a time, never a
    // full boxed Row array) and union-find it in primitive arrays;
    // identical labels are pinned against the distributed loop in
    // OpsSpec. Over the cap — or whenever the caller asked for RELIABLE
    // checkpoints, the run-as-a-cluster-would mode — the distributed loop
    // below stays the path. `driverEdgeCap = 0` forces it (the specs'
    // distributed-coverage switch). The fast path also requires LongType
    // endpoints: the distributed loop is type-generic, and collecting a
    // non-Long id column here would both ClassCastException and silently
    // change the output column type (r9 ADVICE).
    val longTyped = edges.schema.fields.forall(_.dataType == LongType)
    if (nEdges > 0 && nEdges <= driverEdgeCap && checkpointDir.isEmpty
        && longTyped) {
      val (ids, labels) = driverMinLabels(
        edges.toLocalIterator().asScala.map(r => (r.getLong(0), r.getLong(1))),
        sizeHint = nEdges.toInt)
      return labelsFrame(spark, ids, labels)
    }
    // Per-partition LOCAL CONTRACTION before the loop was tried and
    // MEASURED OUT (r10): mapPartitions union-find emitting star edges is
    // label-preserving and cuts clique-shaped pair lists to ~nodes-1
    // edges per fragment — but the A/B at 20M clique edges read 63.3 s
    // WITH vs 53.6 s WITHOUT (CcScale, shape=clique, cap=0), because
    // LARGE-STAR's first round already performs exactly that min-
    // contraction globally at the same shuffle cost, so the pre-pass is
    // one extra full-edge repartition + distinct for nothing. Kept as a
    // note so it isn't re-tried; CcScale's `clique` shape is the harness
    // that would re-measure it.
    var converged = nEdges == 0L
    // size the iteration's shuffles to the EDGE set, not the corpus: the
    // dup-pair graph is typically orders of magnitude smaller than the
    // input, and running log^2(n) rounds at corpus parallelism pays
    // (rounds x stages x partitions) empty-task overhead — ~1M edges per
    // partition, capped at the session's configured parallelism. Sized via
    // EXPLICIT repartition on the loop frames, never by mutating the
    // session's shuffle-partition conf: that mutation leaked the shrunken
    // partition count to any query running concurrently on the session.
    // Each repartition below hash-partitions on u, which satisfies the
    // clustering requirement of the groupBy/join/distinct that follows it
    // (same-u rows land in one partition), so no additional Exchange at
    // session parallelism appears between them.
    val sessionParts =
      spark.conf.get("spark.sql.shuffle.partitions", "200").toLong
    val ccParts = math.max(1L,
      math.min(sessionParts, nEdges / 1000000L + 1L)).toInt
    while (!converged && it < maxIter) {
      // LARGE-STAR: every strictly-larger neighbor of u links to
      // min(N(u) + {u}) — one symmetrized min-agg shuffle + an equi-join
      val sym = edges.unionAll(
          edges.select(col("v").as("u"), col("u").as("v")))
        .repartition(ccParts, col("u"))
      val minsL = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(minsL, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .repartition(ccParts, col("u"))
        .distinct()
      // SMALL-STAR: u and all its (smaller) neighbors link to min(N(u)+{u})
      val minsS = large.groupBy("u").agg(min(col("v")).as("m"))
      val members = large.select(col("u"), col("v").as("x"))
        .unionAll(minsS.select(col("u"), col("u").as("x")))
        .repartition(ccParts, col("u"))
      val small = mat(members.join(minsS, "u")
        .where(col("x") =!= col("m"))
        .select(col("x").as("u"), col("m").as("v"))
        .repartition(ccParts, col("u"))
        .distinct())
      val (nSmall, fpSmall) = stats(small)
      // Exactness restored cheaply (r5 ADVICE): count+fingerprint is a
      // set-equality check only up to a sum-preserving hash collision, so
      // the FIRST round that reports convergence is confirmed with one
      // exact except() — counts already match, so an empty one-sided
      // difference proves set equality. One extra distributed job total
      // (on the convergence round only), not per round; a collision that
      // fooled the fingerprint just sends the loop around again.
      converged = nSmall == nEdges && fpSmall.compareTo(fp) == 0 &&
        small.except(edges).isEmpty
      nEdges = nSmall
      fp = fpSmall
      edges = small
      it += 1
    }
    roundsOut.foreach(_.set(it))
    // at the fixpoint the graph is a union of stars: (member -> root),
    // materialized so the caller's consumption never replays the loop.
    mat(edges.select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .unionAll(edges.select(col("v"), col("v")).distinct()
        .toDF("doc_id", "cluster_id"))
      .distinct())
  }

  /** Exact-substring duplication detector (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better" signal,
    * windowed): hash every full `w`-char window at stride `s` of the
    * normalized text and report windows occurring in ≥2 documents — verbatim
    * boilerplate that MinHash (whole-doc similarity) cannot see.
    *
    * Scale shape: a suffix array is a single-machine structure; strided
    * window hashes are its distributed stand-in — the blow-up is a bounded
    * len/s × 8-byte hash per doc (not len suffixes), windows hash inside ONE
    * native eval per row (Md5TokensLow64 over the window array), and the
    * only shuffle is the hash groupBy (count(*) partial-aggregates map-side;
    * the distinct-doc count runs Spark's standard two-phase distinct
    * aggregate). Hashes are MD5-low-64, so the oracle replays them with
    * md5_number_lower.
    */
  def substringDuplicateWindows(
      docs: DataFrame, w: Int = 32, s: Int = 16): DataFrame = {
    val prepped = docs
      .select(col("doc_id"), trim(lower(col("text"))).as("txt"))
      .withColumn("len", length(col("txt")))
      .where(col("len") >= w) // short docs are exact-dedup territory
    val winHashes = prepped.select(col("doc_id"),
      explode(graft.functions.HashOps.md5TokensLow64(
        transform(sequence(lit(0), expr(s"(len - $w) DIV $s")),
          i => col("txt").substr(i * s + 1, lit(w))))).as("win_hash"))
    winHashes
      .groupBy(col("win_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .where(col("n_docs") >= 2)
      .orderBy(col("win_hash"))
  }
}
