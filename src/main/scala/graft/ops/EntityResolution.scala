package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic entity resolution (record linkage): trace "dirty" records
  * (one corrupted digit in an ID-bearing string) back to their source rows
  * by pigeonhole-blocked candidate generation + edit-distance verification
  * + evidence-ranked best-match selection — the classic blocking/matching
  * ER pipeline (Fellegi–Sunter shape) expressed as one equi-join dataflow,
  * never all-pairs.
  *
  * Blocking with DETERMINISTIC recall: the canonical string carries a
  * 12-digit zero-padded key suffix, and each record emits 12
  * single-digit-EXCLUSION keys (kid i ↦ the other 11 digits) — the
  * FastSS/deletion-neighborhood shape for edit distance on fixed-width
  * IDs. A single-character substitution touches exactly one digit, so the
  * key excluding that digit matches verbatim on both sides (pigeonhole).
  * Each key pins 11 of 12 digits, so a block group holds AT MOST 10 keys
  * — candidate volume is O(N · 12) with a constant ≤10 group bound at
  * EVERY corpus scale (the first cut, 4 blocks of 3 digits, bounded
  * groups at 10³ and spent 97% of its x100 runtime on levenshtein over
  * ~10³-row candidate groups; 12×11-digit keys trade a 3× wider explode
  * for 100× fewer verifications). Because the canonical string derives
  * from the globally-unique key (not the copy-duplicated c_name), scaled
  * dirs get no cross-copy candidate blowup.
  *
  * The dirty feed is derived in-query (de-vacuizing pattern): ~1/4 of
  * records get digit p := (digit + 5) mod 10 at an md5-chosen position,
  * so ground truth is planted and the DuckDB oracle replays the feed
  * bit-for-bit. Match ranking is evidence-based: edit distance first,
  * then corroboration by the intact numeric attribute (acctbal), then the
  * key — a corrupted id that happens to equal ANOTHER valid record's id
  * (distance 0, wrong entity) deterministically out-ranks the true source,
  * and the emitted `correct` flag measures exactly that irreducible
  * ambiguity.
  */
object EntityResolution {

  /** Zero-padded digit width of the canonical id string. */
  private val D = 12

  /** 'Customer#' || lpad(custkey, 12, '0') — 21 chars, digits at 10..21. */
  private def canon(k: Column): Column =
    concat(lit("Customer#"), lpad(k.cast(StringType), D, "0"))

  private def signedMd5(c: Column): Column =
    graft.functions.HashOps.md5Low64(c)

  /** Twelve (kid, bkey) blocking rows per record: bkey = the 11 digits
    * EXCLUDING position kid (two substrings around the hole). */
  private def blockKeys(name: Column): Column = {
    val digits = substring(name, 10, D)
    array((0 until D).map { kid =>
      val key = concat(substring(digits, 1, kid),
        substring(digits, kid + 2, D))
      struct(lit(kid).as("kid"), key.as("bkey"))
    }: _*)
  }

  /** Clean side: (ck, bal, canon). */
  def cleanBase(customer: DataFrame): DataFrame = customer
    .select(col("c_custkey").cast(LongType).as("ck"),
      col("c_acctbal").as("bal"))
    .withColumn("canon", canon(col("ck")))

  /** The planted dirty feed: (dirty_id, dirty_bal, dirty_name). */
  def dirtyFeed(base: DataFrame): DataFrame = base
    .where(pmod(signedMd5(concat(lit("er-sel|"), col("canon"))),
      lit(4L)) === 0L)
    .withColumn("p",
      pmod(signedMd5(concat(lit("er-pos|"), col("canon"))),
        lit(D.toLong)).cast(IntegerType))
    .withColumn("dirty_name", concat(
      expr("substring(canon, 1, 9 + p)"),
      pmod(expr("cast(substring(canon, 10 + p, 1) as int)") + lit(5),
        lit(10)).cast(StringType),
      expr(s"substring(canon, 11 + p, $D)")))
    .select(col("ck").as("dirty_id"), col("bal").as("dirty_bal"),
      col("dirty_name"))

  /** Resolve the derived dirty feed against the clean customer table.
    * Output: (dirty_id, matched_custkey, dist, n_cand, correct), one row
    * per dirty record (the true source is always a candidate by the
    * pigeonhole, so no group is empty).
    */
  def resolve(customer: DataFrame): DataFrame = {
    val base = cleanBase(customer)
    resolveFeed(dirtyFeed(base), base).orderBy(col("dirty_id"))
  }

  /** The clean side's 12-row-per-record blocking index — the static build
    * side of [[resolveFeedBlocked]]'s candidate join. Split out so a
    * caller resolving MANY feeds against one base (the streaming member)
    * can explode + materialize it ONCE instead of paying the 12× explode
    * and its join shuffle per micro-batch (r9 VERDICT #4).
    */
  def blockedBase(base: DataFrame): DataFrame = base
    .select(col("ck"), col("bal"), col("canon"),
      explode(blockKeys(col("canon"))).as("k"))
    .select(col("ck"), col("bal"), col("canon"),
      col("k.kid").as("kid"), col("k.bkey").as("bkey"))

  /** Resolve an arbitrary dirty feed against a clean base. Each dirty
    * record's verdict depends ONLY on its own row plus the static clean
    * side — so the operator is chunking/arrival-order invariant, and the
    * streaming member (StreamingOps.streamEntityResolution) reuses this
    * per micro-batch and lands on the bit-identical result set.
    */
  def resolveFeed(dirty: DataFrame, base: DataFrame): DataFrame =
    resolveFeedBlocked(dirty, blockedBase(base))

  /** [[resolveFeed]] against a PRE-EXPLODED clean blocking index
    * ([[blockedBase]] output, possibly materialized/bucketed on
    * (kid, bkey) by the caller).
    */
  def resolveFeedBlocked(dirty: DataFrame, cleanKeys: DataFrame): DataFrame = {
    val dirtyKeys = dirty
      .select(col("dirty_id"), col("dirty_bal"), col("dirty_name"),
        explode(blockKeys(col("dirty_name"))).as("k"))
      .select(col("dirty_id"), col("dirty_bal"), col("dirty_name"),
        col("k.kid").as("kid"), col("k.bkey").as("bkey"))
    // candidate generation: ONE equi-join on the blocking key; a pair found
    // through several clean triples collapses via dropDuplicates
    val cand = dirtyKeys.join(cleanKeys, Seq("kid", "bkey"))
      .select(col("dirty_id"), col("dirty_bal"), col("dirty_name"),
        col("ck"), col("bal"), col("canon"))
      .dropDuplicates("dirty_id", "ck")
    // verification over candidates only — the expensive edit distance
    // never sees a non-candidate pair
    val verified = cand
      .withColumn("dist", levenshtein(col("dirty_name"), col("canon")))
      .where(col("dist") <= 1)
    val w = Window.partitionBy(col("dirty_id"))
    val ranked = verified
      .withColumn("bal_miss",
        when(col("bal") === col("dirty_bal"), 0).otherwise(1))
      .withColumn("n_cand", count(lit(1)).over(w))
      .withColumn("rk", row_number().over(
        w.orderBy(col("dist").asc, col("bal_miss").asc, col("ck").asc)))
    ranked.where(col("rk") === 1)
      .select(col("dirty_id"), col("ck").as("matched_custkey"),
        col("dist").cast(IntegerType).as("dist"),
        col("n_cand").cast(LongType).as("n_cand"),
        (col("ck") === col("dirty_id")).as("correct"))
  }
}
