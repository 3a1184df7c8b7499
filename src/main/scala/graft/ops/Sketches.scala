package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-level sketch aggregation: a typed [[Aggregator]] that UNIONs
  * per-document MinHash signatures (elementwise min) into one signature per
  * group. A MinHash union is the signature of the union of the underlying
  * shingle sets, so two group signatures estimate the Jaccard similarity of
  * whole sub-corpora as (matching positions / k) — classic sketch algebra,
  * mergeable and therefore map-side combinable: the shuffle carries k longs
  * per group regardless of corpus size.
  */
object MinHashUnion extends Aggregator[(String, Array[Long]), Array[Long], Array[Long]] {
  // 256, not 64: the corpus-similarity oracle pins |est − exact| ≤ 0.2, and
  // an accuracy bound must sit far above the estimator's σ (≤ 0.5/√k at
  // J = 0.5) or it measures the corpus, not the code — k=64 put the bound
  // at 3.2σ (≈2% chance of a spurious red per regenerated corpus across
  // ~15 group pairs); k=256 puts it at 6.4σ (≈1e-10). Still 2 KB/group.
  val k = 256
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
  val mapStringLong: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

/** MERGEABLE Misra-Gries heavy-hitters sketch (Agarwal et al., "Mergeable
  * Summaries", PODS'12): at most k counters per buffer, so the partial-agg
  * shuffle carries O(k) state per partition no matter how many distinct
  * tokens the corpus has — the 100 TB answer to "top tokens" when the exact
  * distinct-token table itself is too big to shuffle.
  *
  * Guarantees (any merge order): every token with true count > n/(k+1) is
  * in the final support, and each surviving estimate e satisfies
  * true - n/(k+1) <= e <= true.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]]
    with Serializable {
  override def zero: Map[String, Long] = Map.empty
  override def reduce(b: Map[String, Long], t: String): Map[String, Long] =
    b.get(t) match {
      case Some(c)            => b.updated(t, c + 1)
      case None if b.size < k => b.updated(t, 1L)
      // full and unseen: decrement every counter (classic MG step)
      case None => b.collect { case (tk, c) if c > 1 => tk -> (c - 1) }
    }
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from all, keep positives —
      // the mergeable-summaries pruning that preserves the MG error bound
      val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      sum.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }
  override def finish(b: Map[String, Long]): Map[String, Long] = b
  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoderHelper.mapStringLong
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoderHelper.mapStringLong
}

/** MERGEABLE Count-Min sketch (Cormode & Muthukrishnan 2005): d hash rows ×
  * w counters of PURELY ADDITIVE state, so unlike most sketches the final
  * counter matrix is merge-order INDEPENDENT (every cell is a plain sum of
  * indicator contributions) — the estimates are therefore deterministic and
  * replay EXACTLY in ANSI SQL, not merely within a theorem bound. Shuffle
  * state is d·w longs (512 B here) per partition regardless of
  * distinct-token count; estimates are one-sided (est >= true, always).
  * Hashes are md5-low-64 of token‖0x01‖rowDigit (the cross-engine
  * [[graft.functions.Md5Low64]] bits), so DuckDB rebuilds the identical
  * matrix.
  */
object CountMin extends Aggregator[String, Array[Long], Array[Long]] {
  val d = 4
  // w sized BELOW the test-corpus vocabulary on purpose: the audit then
  // shows genuinely lossy estimates (nonzero overcounts) rather than a
  // disguised exact counter. At production scale w = ceil(e / epsilon).
  val w = 16
  private val sep = "\u0001"

  def cell(token: String, j: Int): Int = {
    val m = (Sketches.md5Low64String(token + sep + j.toString) % w).toInt
    if (m < 0) m + w else m
  }

  override def zero: Array[Long] = new Array[Long](d * w)
  override def reduce(b: Array[Long], t: String): Array[Long] = {
    var j = 0
    while (j < d) { b(j * w + cell(t, j)) += 1; j += 1 }
    b
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }
  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
}

/** MERGEABLE K-Minimum-Values distinct-count sketch (Beyer et al.,
  * SIGMOD'07): the k smallest DISTINCT md5-low-64 hash values of the
  * group's elements. "k smallest of the union" is a deterministic function
  * of the underlying SET, so like [[CountMin]]/[[BloomBits]] the sketch is
  * merge-order independent and the estimate (k−1)/U(k) replays EXACTLY in
  * SQL (DuckDB: ORDER BY hash LIMIT k). O(k) state per group; typical
  * relative error 1/√(k−2) ≈ 12.7% at k = 64.
  *
  * Input is (group, value); the group rides along only because
  * KeyValueGroupedDataset.agg feeds the whole tuple.
  */
class KMinValues(k: Int)
    extends Aggregator[(String, String), Array[Long], Array[Long]]
    with Serializable {
  override def zero: Array[Long] = Array.empty[Long]

  private def insert(b: Array[Long], h: Long): Array[Long] = {
    if (b.length == k && h >= b(b.length - 1)) return b
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) return b // already present (distinct semantics)
    val ins = -pos - 1
    val out = new Array[Long](math.min(b.length + 1, k))
    var i = 0
    while (i < out.length) {
      out(i) = if (i < ins) b(i) else if (i == ins) h else b(i - 1)
      i += 1
    }
    out
  }

  override def reduce(b: Array[Long], t: (String, String)): Array[Long] =
    insert(b, Sketches.md5Low64String(t._2))
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var out = a
    var i = 0
    while (i < b.length) { out = insert(out, b(i)); i += 1 }
    out
  }
  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
}

/** One output row of [[Sketches.setIntersectionWith]] — top-level public
  * case class per the Dataset-encoder rule.
  */
case class SetAlgebraRow(
    pair: String,
    exact_a: Long, exact_b: Long, exact_inter: Long, exact_union: Long,
    est_a: Double, est_b: Double, est_inter: Double, est_union: Double,
    jaccard_est: Double,
    ok_inter: Boolean, ok_union: Boolean)

/** MERGEABLE Bloom filter (m bits as m/64 longs, k salted md5-low-64
  * hashes): OR-additive state, so like [[CountMin]] the final bit set is
  * merge-order independent (OR is commutative, associative, idempotent) and
  * every membership probe replays exactly in SQL. No false negatives by
  * construction — the deterministic half of the Bloom theorem; false
  * positives are data-dependent and the audit surfaces them explicitly.
  */
object BloomBits extends Aggregator[String, Array[Long], Array[Long]] {
  val mBits = 16384
  val kHashes = 3

  def bit(s: String, j: Int): Int = {
    // s + single-digit salt: unambiguous (equal total length forces equal s)
    val m = (Sketches.md5Low64String(s + j.toString) % mBits).toInt
    if (m < 0) m + mBits else m
  }

  override def zero: Array[Long] = new Array[Long](mBits / 64)
  override def reduce(b: Array[Long], s: String): Array[Long] = {
    var j = 0
    while (j < kHashes) {
      val i = bit(s, j)
      b(i >> 6) |= (1L << (i & 63))
      j += 1
    }
    b
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
}

/** MERGEABLE bottom-k sample sketch for quantile estimation (the bottom-k
  * / coordinated-sampling design of Cohen & Kaplan, PODS'07, applied to
  * rank queries): keep the k (hash, id, valueBits) triples with the
  * SMALLEST (md5-low-64 hash, id) composite keys of the row key. Like [[KMinValues]],
  * "k smallest of the union" is a deterministic function of the underlying
  * SET — merge-order INDEPENDENT — so the retained sample, and therefore
  * every quantile estimate read off it, replays EXACTLY in SQL
  * (row_number() OVER (ORDER BY hash) <= k), unlike GK/KLL summaries whose
  * retained points depend on merge order and survive only as an
  * error-bound boolean. The sample is uniform-without-replacement (a hash
  * permutation is exchangeable), so the DKW inequality bounds the rank
  * error: P(sup_q |F̂⁻¹ rank error| > ε) <= 2·exp(−2kε²) — at k = 256,
  * ε = 0.1 fails with probability < 1.2%, and on a FIXED corpus the
  * realized error is a deterministic, oracle-hashable number. O(k) state
  * per group through the partial-agg shuffle regardless of group size.
  *
  * Buffer layout: interleaved [h₀, id₀, bits₀, h₁, id₁, bits₁, …] sorted
  * by the COMPOSITE key (hash signed, then id) — exactly the oracle's
  * `ORDER BY hs, event_id` — value stored as raw IEEE bits. A replayed row
  * (same hash AND same id) is a no-op, but a true 64-bit hash collision
  * between DIFFERENT ids keeps both entries, matching the SQL row_number
  * tie-break bit-for-bit (r5 ADVICE: keying on hash alone dropped the
  * second colliding row while the oracle kept it).
  */
class BottomKSample(k: Int)
    extends Aggregator[(String, Long, Double), Array[Long], Array[Long]]
    with Serializable {
  override def zero: Array[Long] = Array.empty[Long]

  private def insert(b: Array[Long], h: Long, id: Long, bits: Long): Array[Long] = {
    val m = b.length / 3
    if (m == k) {
      val lh = b(3 * (m - 1))
      val lid = b(3 * (m - 1) + 1)
      if (h > lh || (h == lh && id >= lid)) return b // at/after last key: full
    }
    var lo = 0
    var hi = m
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val mh = b(3 * mid)
      if (mh < h || (mh == h && b(3 * mid + 1) < id)) lo = mid + 1 else hi = mid
    }
    if (lo < m && b(3 * lo) == h && b(3 * lo + 1) == id) return b // replay: no-op
    val nm = math.min(m + 1, k)
    val out = new Array[Long](3 * nm)
    System.arraycopy(b, 0, out, 0, 3 * lo)
    out(3 * lo) = h
    out(3 * lo + 1) = id
    out(3 * lo + 2) = bits
    val tailTriples = nm - lo - 1
    if (tailTriples > 0) System.arraycopy(b, 3 * lo, out, 3 * (lo + 1), 3 * tailTriples)
    out
  }

  override def reduce(b: Array[Long], t: (String, Long, Double)): Array[Long] =
    insert(b, Sketches.md5Low64String(t._2.toString), t._2,
      java.lang.Double.doubleToRawLongBits(t._3))
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var out = a
    var i = 0
    while (i < b.length / 3) {
      out = insert(out, b(3 * i), b(3 * i + 1), b(3 * i + 2)); i += 1
    }
    out
  }
  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
}

/** MERGEABLE HyperLogLog sketch (Flajolet, Fusy, Gandouet & Meunier,
  * AofA 2007) over pre-hashed 64-bit keys: m = 2^6 = 64 registers, each
  * holding the MAXIMUM leading-zero rank observed in its substream.
  *
  * Register layout (matching the SQL oracle bit-for-bit): for hash h,
  * index = low 6 bits (h & 63), word w = h >>> 6 (58 payload bits),
  * rank rho = (leading zeros of w within 58 bits) + 1, i.e. 59 -
  * bitlength(w), with rho = 59 for w == 0. "Max per register" is
  * idempotent AND commutative, so the register array is a deterministic
  * function of the underlying key SET — merge-order independent, duplicate
  * arrivals are no-ops, and (unlike GK/KLL) the ENTIRE sketch state
  * hash-replays in DuckDB via max() over the same bin()/shift arithmetic.
  * O(m) = 64 longs per group through the partial-agg shuffle regardless of
  * group size — the 100 TB distinct-count design when even KMV's k hashes
  * per group are too many or the stream cannot be re-keyed.
  */
object HyperLogLog extends Aggregator[(String, Long), Array[Long], Array[Long]] {
  val p = 6
  val m = 1 << p // 64 registers
  val maxRho = 64 - p + 1 // 59: w == 0

  def rho(w: Long): Int =
    if (w == 0L) maxRho else java.lang.Long.numberOfLeadingZeros(w) - p + 1

  override def zero: Array[Long] = new Array[Long](m)
  override def reduce(b: Array[Long], t: (String, Long)): Array[Long] = {
    val h = t._2
    val idx = (h & (m - 1)).toInt
    val r = rho(h >>> p)
    if (r > b(idx)) b(idx) = r
    b
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }
  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.arrayLong
}

object Sketches {

  /** JVM-side twin of the native [[graft.functions.Md5Low64]] expression
    * (little-endian read of MD5 digest bytes [8,16) over the UTF-8 bytes) —
    * DuckDB md5_number_lower reinterpreted signed. Used where the hash is
    * needed inside typed Aggregator code rather than a Column.
    */
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def md5Low64String(s: String): Long = {
    val d = md5Local.get()
    d.reset()
    val dig = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var b = 15
    while (b >= 8) { h = (h << 8) | (dig(b) & 0xFFL); b -= 1 }
    h
  }

  /** Exact top-N token counts audited against the Count-Min sketch: emits
    * (token, cnt, est, overcount, sketch_ok) where est is the CM point
    * estimate — bit-reproducible, so the oracle recomputes the whole
    * counter matrix and the same minima. `sketch_ok` pins the one-sided CM
    * guarantee est >= true, which holds deterministically.
    *
    * Scale: one token scan feeds both the sketch (O(d·w) state) and the
    * exact audit side (which exists only to grade the sketch at test
    * scale; at 100 TB only the sketch pass runs). The estimate lookup is a
    * broadcast of the tiny counter matrix as four literal arrays.
    */
  def countMinAudit(
      docs: DataFrame,
      textCol: String = "text",
      topN: Int = 10): DataFrame =
    countMinAuditWith(docs, countMinSketch(docs, textCol), textCol, topN)

  /** One distributed pass building the CM counter matrix. */
  def countMinSketch(docs: DataFrame, textCol: String = "text"): Array[Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(Dedup.tokens(col(textCol))).as("token"))
      .as[String].select(CountMin.toColumn).head()
  }

  /** The audit side against an already-built counter matrix (shared by the
    * batch query and the streaming accumulation, whose sketches are
    * bit-identical by additivity).
    */
  def countMinAuditWith(
      docs: DataFrame,
      sketch: Array[Long],
      textCol: String = "text",
      topN: Int = 10): DataFrame = {
    val toks = docs.select(explode(Dedup.tokens(col(textCol))).as("token"))
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val rowEst = (0 until CountMin.d).map { j =>
      val rowCounters = sketch.slice(j * CountMin.w, (j + 1) * CountMin.w).toSeq
      element_at(typedLit(rowCounters),
        (pmod(graft.functions.HashOps.md5Low64(
          concat(col("token"), lit("\u0001"), lit(j.toString))),
          lit(CountMin.w)) + 1).cast("int"))
    }
    counts.orderBy(col("cnt").desc, col("token").asc).limit(topN)
      .withColumn("est", least(rowEst: _*))
      .select(col("token"), col("cnt"), col("est"),
        (col("est") - col("cnt")).as("overcount"),
        (col("est") >= col("cnt")).as("sketch_ok"))
      .orderBy(col("cnt").desc, col("token").asc)
  }

  /** Sketch-based JOIN-SIZE estimation (the AMS/Count-Min inner-product
    * estimator, Alon–Matias–Szegedy '96 / Cormode–Muthukrishnan '05):
    * |R ⋈ S| on a key equals the frequency-vector inner product
    * Σ_k cntR(k)·cntS(k), and the CM estimate min_j Σ_w A[j][w]·B[j][w]
    * bounds it from ABOVE deterministically (hash collisions only add
    * cross terms) — the cardinality signal a planner wants at 100 TB
    * without scanning either side's join.
    *
    * Spark-first shape: each side's counter matrix is a plain
    * groupBy(j, cell).count() over md5-derived cells — map-side
    * combinable, bounded d·w-row output, NO typed-aggregator state — and
    * the d inner products fold on the driver from two ≤d·w-row collects.
    * The exact side (one count-count equi-join) exists to grade the
    * estimate at test scale. Every cell count replays in SQL via
    * md5_number_lower, so est, exact, and their ratio are all
    * VALUE-exact; `overestimate` (est ≥ exact) is the theorem surface and
    * holds deterministically, not probabilistically.
    */
  def joinSizeEstimate(events: DataFrame, typeA: String = "error",
      typeB: String = "click", d: Int = 4, w: Int = 8192): DataFrame = {
    val spark = events.sparkSession
    val sep = "\u0001"
    def keys(t: String) = events.where(col("event_type") === t)
      .select(col("user_id").cast(StringType).as("k"))
    def cells(t: String): Map[(Int, Int), Long] =
      keys(t)
        .select(col("k"), explode(typedLit((0 until d).toList)).as("j"))
        .select(col("j"),
          pmod(graft.functions.HashOps.md5Low64(
            concat(col("k"), lit(sep), col("j").cast(StringType))),
            lit(w.toLong)).cast(IntegerType).as("cell"))
        .groupBy(col("j"), col("cell")).agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val (ca, cb) = (cells(typeA), cells(typeB))
    val est = (0 until d).map { j =>
      var ip = BigInt(0)
      ca.foreach { case ((jj, cell), c) =>
        if (jj == j) ip += BigInt(c) * BigInt(cb.getOrElse((jj, cell), 0L))
      }
      ip
    }.min
    val cntA = keys(typeA).groupBy(col("k")).agg(count(lit(1)).as("ca"))
    val cntB = keys(typeB).groupBy(col("k")).agg(count(lit(1)).as("cb"))
    val row = cntA.join(cntB, "k")
      .agg(sum((col("ca") * col("cb")).cast(DecimalType(38, 0))).as("x"))
      .select(coalesce(col("x"), lit(0)).cast(DecimalType(38, 0)).as("x"))
      .head()
    val exact = BigInt(row.getDecimal(0).toBigInteger)
    val nA = keys(typeA).count()
    val nB = keys(typeB).count()
    import spark.implicits._
    // est/exact travel as BigInt-derived decimal STRINGS (a 100 TB join
    // size overflows int64 — toLong would truncate silently), and the
    // ratio is null-guarded: disjoint key sets give exact = 0, where a
    // division yields engine-dependent Infinity/NULL (r6 ADVICE; the
    // repo's zero-denominator rule).
    val ratio: Option[Double] =
      if (exact == 0) None
      else Some(java.lang.Double.parseDouble(est.toString) /
        java.lang.Double.parseDouble(exact.toString))
    Seq((nA, nB, exact.toString, est.toString, est >= exact, ratio))
      .toDF("n_a", "n_b", "exact_size", "cm_estimate", "overestimate", "ratio")
  }

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

  /** Exact top-N token counts audited against a Misra-Gries sketch.
    *
    * The EXACT side (token groupBy) exists to audit the sketch at test
    * scale — at 100 TB you would keep only the sketch pass (O(k) shuffle
    * state per partition). `sketch_ok` verifies the MG theorem on this
    * corpus: a supported token's estimate e obeys true - n/(k+1) <= e <=
    * true, an unsupported token obeys true <= n/(k+1). Both hold for EVERY
    * merge order, so the column is deterministically TRUE and
    * oracle-checkable even though the borderline support set itself is not.
    */
  /** Per-group distinct-count estimation via [[KMinValues]] over word
    * n-gram shingles, audited against the exact distinct count. The
    * estimate is (k−1)/U(k) with U(k) the k-th smallest hash normalized to
    * (0,1] — every arithmetic step (long→double cast, two divisions on
    * exactly-representable powers of two) is correctly rounded, so the
    * DOUBLE estimate itself is oracle-hashable, unlike HLL where only an
    * accuracy boolean survives. `sketch_ok` grades |est/exact − 1| ≤ 0.5
    * (4σ at k=64) — deterministic on fixed data since both engines compute
    * identical values.
    *
    * Scale: the shuffle carries ≤ k longs per group (the partial KMV
    * arrays), never the distinct-value set — the group-wise answer to
    * approx_count_distinct with a replayable surface.
    */
  def kmvDistinct(
      docs: DataFrame,
      groupCol: String = "lang",
      textCol: String = "text",
      n: Int = 3,
      k: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = docs.select(col(groupCol).as("grp"),
      explode(Dedup.shingles(col(textCol), n)).as("s"))
    val sketches = sh.as[(String, String)]
      .groupByKey(_._1)
      .agg(new KMinValues(k).toColumn.name("kmv"))
      .toDF("grp", "kmv")
    val exact = sh.distinct().groupBy(col("grp"))
      .agg(count(lit(1)).as("n_distinct"))
    val uK = (element_at(col("kmv"), k).cast("double") +
      lit(9.223372036854775808e18)) / lit(1.8446744073709552e19)
    sketches.join(exact, Seq("grp"))
      .select(col("grp").as(groupCol), col("n_distinct"),
        when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
          .otherwise(lit((k - 1).toDouble) / uK).as("est"))
      .withColumn("sketch_ok",
        abs(col("est") / col("n_distinct") - 1.0) <= 0.5)
      .orderBy(col(groupCol))
  }

  /** Per-group quantile estimation from the [[BottomKSample]] sketch,
    * audited against the exact quantiles. For each group and each q in
    * `qs`: the estimate is the sample value at rank ceil(q·m) of the
    * value-sorted sample (m = sample size); the audit computes the exact
    * quantile at rank ceil(q·n) of the full group, plus the estimate's
    * exact rank (count of values <= est) and the realized rank error
    * |rank/n − q| — deterministic on fixed data, so every column
    * hash-replays. `sketch_ok` pins the DKW ε = 0.1 band (k = 256:
    * violation probability < 1.2% per (group, q); on this corpus it holds,
    * and the realized errors are themselves part of the hashed surface).
    *
    * Scale: the sketch side shuffles <= 2k longs per group (partial
    * bottom-k arrays, map-side combined). The exact side (full-group
    * window sort + rank count) exists to GRADE the sketch at test scale —
    * at 100 TB only the sketch pass runs, and the answer is the tiny
    * estRows frame.
    */
  def quantileBottomK(
      events: DataFrame,
      k: Int = 256,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9)): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events.select(col("event_type"), col("event_id"), col("value"))
    val sketches = ev.as[(String, Long, Double)]
      .groupByKey(_._1)
      .agg(new BottomKSample(k).toColumn.name("bk"))
      .collect() // one O(k) buffer per group — the sketch IS the small answer
    quantileAuditWith(ev, sketches.toSeq, qs)
  }

  /** The audit side against already-built bottom-k buffers (shared by the
    * batch query and the streaming accumulation, whose merged sketches are
    * identical by merge-order independence — the [[CountMin]] sharing
    * pattern).
    */
  def quantileAuditWith(
      ev: DataFrame,
      sketches: Seq[(String, Array[Long])],
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9)): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    // one row per (group, q): decode + sort the O(k) sample driver-side
    val estRows = sketches.flatMap { case (et, bk) =>
      val values = Array.tabulate(bk.length / 3)(i =>
        java.lang.Double.longBitsToDouble(bk(3 * i + 2)))
      java.util.Arrays.sort(values)
      val m = values.length
      qs.map { q =>
        val idx = math.ceil(q * m).toInt
        (et, q, m, values(idx - 1))
      }
    }.toDF("event_type", "q", "sample_m", "est")

    val n = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("value"))
    val ranked = ev.select(col("event_type"), col("value"))
      .withColumn("vr", row_number().over(w))
    val exactQ = ranked.join(broadcast(n), Seq("event_type"))
      .crossJoin(broadcast(qs.toDF("q")))
      .where(col("vr").cast("long") === ceil(col("q") * col("n")))
      .select(col("event_type"), col("q"), col("value").as("exact_q"), col("n"))
    val estRank = ev.join(broadcast(estRows), Seq("event_type"))
      .groupBy(col("event_type"), col("q"))
      .agg(sum(when(col("value") <= col("est"), 1L).otherwise(0L))
        .as("est_rank"))
    estRows.join(exactQ, Seq("event_type", "q"))
      .join(estRank, Seq("event_type", "q"))
      .select(col("event_type"), col("q"), col("n"),
        col("sample_m").cast("int").as("sample_m"),
        col("est"), col("est_rank"), col("exact_q"),
        abs(col("est_rank").cast("double") / col("n") - col("q"))
          .as("rank_err"))
      .withColumn("sketch_ok", col("rank_err") <= 0.1)
      .orderBy(col("event_type"), col("q"))
  }

  def heavyHitters(
      docs: DataFrame,
      textCol: String = "text",
      k: Int = 32,
      topN: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(Dedup.tokens(col(textCol))).as("token"))
    val sketch: Map[String, Long] =
      toks.as[String].select(new MisraGries(k).toColumn).head()
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val n = counts.agg(sum(col("cnt"))).head().getLong(0)
    val bound = n.toDouble / (k + 1)
    counts.orderBy(col("cnt").desc, col("token").asc).limit(topN)
      .withColumn("est",
        coalesce(element_at(typedLit(sketch), col("token")), lit(0L)))
      .withColumn("sketch_ok",
        when(col("est") > 0,
          col("est") <= col("cnt") && (col("cnt") - col("est")) <= lit(bound))
          .otherwise(col("cnt") <= lit(bound)))
      .select(col("token"), col("cnt"), col("sketch_ok"))
      .orderBy(col("cnt").desc, col("token").asc)
  }

  /** Per-group distinct-count estimation via [[HyperLogLog]] over word
    * n-gram shingles, audited against the exact distinct count. The whole
    * value surface replays in SQL: the registers (max-rank per index is a
    * set-deterministic function — see [[HyperLogLog]]), the exact-integer
    * harmonic-sum numerator Z_num = Σᵢ 2^(59 − M[i]) accumulated in
    * DECIMAL(38,0) (a Long sum can exceed 2^63 when registers are empty
    * and ANSI would throw), and the raw estimate α₆₄·m²/(Z_num/2^59) —
    * the decimal crosses to DOUBLE via the string route (correctly rounded
    * on both engines), every multiplier is a power of two (exact scaling)
    * or the identically-computed α constant, and the single division is
    * IEEE-identical. The corpus keeps every group far out of the
    * small-range regime (zeros = 0, emitted and checkable), so the
    * linear-counting branch — whose ln() is NOT bit-replayable across
    * engines — never fires; production code would branch on the emitted
    * zeros column. hll_ok pins |est/exact − 1| ≤ 0.4 (≈3σ·1.04/√64);
    * deterministic on fixed data since both engines compute identical
    * doubles.
    *
    * Scale: O(m) = 64 longs per group through the partial-agg shuffle —
    * no distinct pass, no per-group hash retention; duplicates are
    * register-level no-ops. The exact side exists only to grade the
    * sketch at test scale.
    */
  def hllDistinct(
      docs: DataFrame,
      groupCol: String = "lang",
      textCol: String = "text",
      n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.ShiftLeft

    val sh = docs.select(col(groupCol).as("grp"),
      explode(Dedup.shingles(col(textCol), n)).as("s"))
    // no distinct pass: max-per-register is idempotent, duplicates are no-ops
    val hashed = sh.select(col("grp"),
      graft.functions.HashOps.md5Low64(col("s")).as("h")).as[(String, Long)]
    val regs = hashed.groupByKey(_._1)
      .agg(HyperLogLog.toColumn.name("regs"))
      .toDF("grp", "regs")

    val exact = sh.distinct().groupBy(col("grp"))
      .agg(count(lit(1)).as("n_distinct"))

    def pow2(e: Column): Column =
      Bridge.column(ShiftLeft(Bridge.expression(lit(1L)), Bridge.expression(e)))

    val zNum = aggregate(col("regs"), lit(0L).cast("decimal(38,0)"),
      (acc, r) => acc + pow2((lit(59L) - r).cast("int")).cast("decimal(38,0)"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(64.0))
    val est = alpha * lit(4096.0) * lit(5.76460752303423488e17) /
      zNum.cast("string").cast("double")

    regs.join(exact, Seq("grp"))
      .select(col("grp").as(groupCol), col("n_distinct"),
        concat_ws(",", transform(col("regs"), _.cast("string"))).as("registers"),
        size(filter(col("regs"), _ === 0L)).as("zeros"),
        array_max(col("regs")).cast("int").as("max_register"),
        est.as("est"))
      .withColumn("rel_err", abs(col("est") / col("n_distinct") - lit(1.0)))
      .withColumn("hll_ok", col("rel_err") <= lit(0.4))
      .orderBy(col(groupCol))
  }

  // ---------------------------------------------------------------------
  // θ-sketch SET ALGEBRA (the Apache DataSketches theta-sketch shape):
  // per-set KMV sketches answer |A|, |A∩B|, |A∪B| and Jaccard WITHOUT ever
  // materializing the sets together — the audience-overlap / cross-dataset
  // contamination estimate at 100 TB, where each set is sketched in its
  // own scan (even on different clusters/days) and only O(k) longs meet.
  // ---------------------------------------------------------------------

  /** k = 1024 by the σ-margin discipline: the intersection estimate's RSE
    * is ≈ √((2−J)/(J·k)) ≈ 9.4% at this corpus's J ≈ 0.2, so the claimed
    * 50% bound sits at 5.3σ (k = 256 put it at 2.7σ — a per-corpus coin
    * flip); the union estimate's RSE is 1/√(k−2) ≈ 3.1% vs a 35% claim
    * (11σ). 8 KB per set.
    */
  private[graft] val setAlgebraK = 1024

  /** The compared sets: per-event-type visitor-day sets — element =
    * "user|epochDay". Element strings exclude the type, so one element
    * hashes identically in every set and sketch entries intersect by raw
    * hash value.
    */
  private[graft] def setElements(events: DataFrame): DataFrame =
    events.where(col("event_type").isin("view", "click", "purchase"))
      .select(col("event_type").as("t"),
        concat(col("user_id").cast(StringType), lit("|"),
          expr("unix_micros(ts) div 86400000000").cast(StringType)).as("e"))

  /** One distributed pass building the per-set KMV sketches: map-side
    * combinable ([[KMinValues]]), ≤ k longs per partition per set through
    * the shuffle; the collect is the sanctioned O(sets·k) sketch buffer.
    */
  def setAlgebraSketches(events: DataFrame): Map[String, Array[Long]] = {
    val spark = events.sparkSession
    import spark.implicits._
    setElements(events).as[(String, String)]
      .groupByKey(_._1)
      .agg(new KMinValues(setAlgebraK).toColumn.name("kmv"))
      .collect().toMap
  }

  /** θ-sketch set-algebra estimates from already-built sketches, audited
    * against the exact answer (the [[quantileAuditWith]] sharing pattern —
    * the streaming accumulation lands on bit-identical arrays by
    * merge-order independence and reuses this assembly verbatim).
    *
    * Estimator (Dasu et al. / DataSketches): θ_X = normalized k-th
    * smallest hash of X (1.0 when |X| < k, i.e. the sketch is exact);
    * θ = min(θ_A, θ_B); candidates = sketch entries strictly below the
    * raw threshold; est = |candidates| / θ. Every step — long→double
    * casts, two divisions on exactly-representable powers of two, min,
    * count/θ — is correctly rounded, so the DOUBLE estimates themselves
    * hash-replay in SQL (the KMV discipline, not just an accuracy bit).
    *
    * Scale: the exact audit side (one distinct + one map-combined flags
    * agg) exists to GRADE the sketch at test scale; at 100 TB only the
    * sketch passes run and the answer is the 3-row frame.
    */
  /** KMV θ normalization shared by every theta-sketch consumer: 1.0 for a
    * non-full sketch (the sketch IS the set), else the k-th smallest hash
    * mapped to (0, 1] — both divisions on exactly-representable powers of
    * two, so the double replays in SQL. ONE definition; the set-algebra
    * and window-rollup oracles both depend on it staying bit-identical.
    */
  private[graft] def kmvTheta(arr: Array[Long], k: Int): Double =
    if (arr.length < k) 1.0
    else (arr(k - 1).toDouble + 9.223372036854775808e18) /
      1.8446744073709552e19

  def setIntersectionWith(
      events: DataFrame, sk: Map[String, Array[Long]]): DataFrame = {
    val spark = events.sparkSession
    val k = setAlgebraK
    // events-scale distinct sized by the repartition-before-distinct rule:
    // HashPartitioning(e) is a subset of the (t, e) clustering
    val parts = math.max(32L, events.count() / 2000000L).toInt
    val flags = setElements(events).repartition(parts, col("e")).distinct()
      .groupBy(col("e")).agg(
        max(when(col("t") === "view", 1).otherwise(0)).as("fv"),
        max(when(col("t") === "click", 1).otherwise(0)).as("fc"),
        max(when(col("t") === "purchase", 1).otherwise(0)).as("fp"))
    val pairs = Seq(
      ("click_purchase", "fc", "fp"),
      ("view_click", "fv", "fc"),
      ("view_purchase", "fv", "fp"))
    val aggCols = pairs.flatMap { case (p, fa, fb) => Seq(
      count(when(col(fa) === 1, 1)).as(s"a_$p"),
      count(when(col(fb) === 1, 1)).as(s"b_$p"),
      count(when(col(fa) === 1 && col(fb) === 1, 1)).as(s"i_$p"),
      count(when(col(fa) === 1 || col(fb) === 1, 1)).as(s"u_$p")) }
    val ex = flags.agg(aggCols.head, aggCols.tail: _*).collect()(0)

    def theta(arr: Array[Long]): Double = kmvTheta(arr, k)
    def kth(arr: Array[Long]): Option[Long] =
      if (arr.length < k) None else Some(arr(k - 1))
    def below(arr: Array[Long], thr: Option[Long]): Array[Long] =
      thr match { case Some(x) => arr.filter(_ < x); case None => arr }
    val typeOf = Map("fv" -> "view", "fc" -> "click", "fp" -> "purchase")

    val rows = pairs.map { case (p, fa, fb) =>
      val sa = sk.getOrElse(typeOf(fa), Array.empty[Long])
      val sb = sk.getOrElse(typeOf(fb), Array.empty[Long])
      val thrMin = (kth(sa), kth(sb)) match {
        case (Some(x), Some(y)) => Some(math.min(x, y))
        case (x, y) => x.orElse(y)
      }
      val thetaMin = math.min(theta(sa), theta(sb))
      val ba = below(sa, thrMin).toSet
      val bb = below(sb, thrMin).toSet
      val icnt = ba.intersect(bb).size
      val ucnt = ba.union(bb).size
      val estA = below(sa, kth(sa)).length.toDouble / theta(sa)
      val estB = below(sb, kth(sb)).length.toDouble / theta(sb)
      val estI = icnt.toDouble / thetaMin
      val estU = ucnt.toDouble / thetaMin
      val jac = if (ucnt == 0) 0.0 else estI / estU
      def g(c: String): Long = ex.getLong(ex.fieldIndex(c))
      val (exa, exb, exi, exu) =
        (g(s"a_$p"), g(s"b_$p"), g(s"i_$p"), g(s"u_$p"))
      SetAlgebraRow(p, exa, exb, exi, exu, estA, estB, estI, estU, jac,
        if (exi == 0L) icnt == 0 else math.abs(estI / exi - 1.0) <= 0.5,
        math.abs(estU / exu - 1.0) <= 0.35)
    }
    spark.createDataFrame(rows).orderBy("pair")
  }

  /** The batch query: sketches + audit in one call. */
  def setIntersection(events: DataFrame): DataFrame =
    setIntersectionWith(events, setAlgebraSketches(events))

  // ---------------------------------------------------------------------
  // TEMPORAL SKETCH ROLLUP: one KMV sketch per day answers the distinct
  // count of ANY day window by merging O(window) sketches — the
  // pre-aggregated sketch-table pattern every 100 TB metrics store uses
  // (daily sketches are tiny, raw events are not; no re-scan per window).
  // ---------------------------------------------------------------------

  /** Elements are distinct active (user, epoch-hour) slots — the activity
    * universe that scales with the corpus (plain user counts sit below k
    * at small SFs and would leave the estimator untested). Day key rides
    * as a string because [[KMinValues]] feeds (group, value) tuples.
    */
  private[graft] def activityElements(events: DataFrame): DataFrame =
    events.select(
      expr("unix_micros(ts) div 86400000000").cast(StringType).as("d"),
      concat(col("user_id").cast(StringType), lit("|"),
        expr("unix_micros(ts) div 3600000000").cast(StringType)).as("e"))

  /** Deterministic 1/16 USER subset of the events feed — the `*_subset`
    * discipline (Dedup.subsetDocs) applied to the window-distinct family:
    * at the top decade the full-N exact-grading audit is the linear-scan
    * asymptote (r7 1000× sweep: e₃ 1.10 was the audit, not the sketch
    * path), so the sibling restricts the ELEMENT UNIVERSE — sketches,
    * exact audit, and DuckDB oracle identically (md5_number_lower replays
    * the hash) — keeping the whole code path value-proven while the
    * measured exponent reflects the O(days·k) sketch rollup. User-level
    * (not element-level) restriction preserves day coverage, so the day
    * spine never goes vacuous (1035 subset events / 30 days at sf0.01).
    */
  private[graft] def windowDistinctSubsetOf(events: DataFrame): DataFrame =
    events.where(pmod(graft.functions.HashOps.md5Low64(
      concat(lit("wd:"), col("user_id").cast(StringType))), lit(16L)) === 0)

  /** One distributed pass building the per-DAY KMV sketches (k = 256: the
    * union estimate's RSE is 1/√(k−2) ≈ 6.3%, so the claimed 50% bound
    * sits at 8σ). O(days · k) driver state.
    */
  def windowDistinctSketches(events: DataFrame): Map[Long, Array[Long]] = {
    val spark = events.sparkSession
    import spark.implicits._
    activityElements(events).as[(String, String)]
      .groupByKey(_._1)
      .agg(new KMinValues(256).toColumn.name("kmv"))
      .collect().map { case (d, arr) => d.toLong -> arr }.toMap
  }

  /** Trailing-7-day distinct-activity estimates from the per-day sketches,
    * audited against the exact distributed answer. For each observed day,
    * the window sketch is the KMV merge of that day's and the previous six
    * days' sketches — "k smallest of the union" again, so the estimate is
    * a deterministic function of the underlying element sets and every
    * DOUBLE replays in SQL. The exact side explodes each (day, element)
    * to its ≤7 window days (linear, no range join) and counts distinct
    * per window; it exists to GRADE the rollup at test scale.
    */
  def windowDistinctWith(
      events: DataFrame, byDay: Map[Long, Array[Long]]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val k = 256
    val kmv = new KMinValues(k)
    val days = byDay.keys.toSeq.sorted
    val est = days.map { w =>
      val merged = days.filter(d => d >= w - 6 && d <= w)
        .map(byDay).reduce(kmv.merge)
      val th = kmvTheta(merged, k)
      val cb = if (merged.length < k) merged.length
        else merged.count(_ < merged(k - 1))
      (w, days.count(d => d >= w - 6 && d <= w).toLong, cb.toDouble / th)
    }.toDF("day", "window_days", "est")
    // the ×7 exploded audit shuffle self-sizes from the event count (the
    // graph_node_jaccard discipline — 70M exploded rows squeezed through
    // the fixed session width at the 100× decade, e₂ 1.21 before sizing);
    // HashPartitioning(w, e) satisfies the distinct-aggregate's first
    // phase, so the countDistinct adds no session-width exchange
    val nEv = events.count()
    val parts = math.max(32L, nEv * 7L / 2000000L).toInt
    // distinct (day, element) universe, materialized ONCE (r12): the day
    // spine AND the exploded exact count both consume it — un-materialized,
    // the reduce-side distinct aggregation ran once per consumer (the
    // exchange itself was reused, the agg above it was not). rowsHint nEv
    // upper-bounds the distinct count, so decade-scale universes take the
    // scratch-parquet branch instead of GB-scale checkpoint blocks.
    val elD = graft.util.Fs.materialize(
      events.select(
        expr("unix_micros(ts) div 86400000000").as("day"),
        concat(col("user_id").cast(StringType), lit("|"),
          expr("unix_micros(ts) div 3600000000").cast(StringType)).as("e"))
        // sized dedup: HashPartitioning(e) ⊂ the (day, e) clustering
        .repartition(parts, col("e"))
        .distinct(),
      nEv)
    val daysDf = elD.select(col("day")).distinct()
    val exact = elD
      .select(explode(sequence(col("day"), col("day") + 6)).as("w"), col("e"))
      .join(daysDf.withColumnRenamed("day", "w"), Seq("w"), "left_semi")
      .repartition(parts, col("w"), col("e"))
      .groupBy(col("w")).agg(countDistinct(col("e")).as("exact_distinct"))
    exact.join(broadcast(est), col("w") === col("day"))
      .select(col("day"), col("window_days"), col("exact_distinct"),
        col("est"),
        (abs(col("est") / col("exact_distinct") - 1.0) <= 0.5).as("sketch_ok"))
      .orderBy(col("day"))
  }

  /** The batch query: daily sketches + window rollup + audit. */
  def windowDistinct(events: DataFrame): DataFrame =
    windowDistinctWith(events, windowDistinctSketches(events))

  /** TEMPORAL QUANTILE ROLLUP — the p99-over-trailing-window question
    * answered from per-day [[BottomKSample]] sketches (the most-used
    * production variant of the daily-sketch-table pattern: latency/value
    * percentiles over any window without re-scanning raw events). The
    * retained sample is "k smallest event-id hashes of the union", so the
    * merged window sketch is a deterministic function of the window's
    * event SET and every read-off value replays in SQL. For each observed
    * day and q ∈ {0.5, 0.9}: est = sample value at rank ⌈q·m⌉ under the
    * (value, event_id) total order; the exact audit computes the true
    * window quantile, the estimate's exact rank and the realized rank
    * error, with the DKW ε = 0.1 band at k = 1024 (σ-margin discipline:
    * the sample-median SE is √(q(1−q)/k) ≈ 0.016, so the claimed band
    * sits at 6.4σ — k = 256 put it at 3.2σ and the realized max error
    * was already 0.064, a regenerated-corpus coin flip; the realized
    * errors are themselves hashed surface). Scale: sketches carry ≤ 3k
    * longs/day; the exploded audit grades the rollup at test scale.
    */
  private[graft] val windowQuantileK = 1024

  /** The per-day element frame of [[windowQuantile]] — ONE definition
    * shared with the streaming fold (same-oracle pairs share their
    * derivation).
    */
  private[graft] def windowQuantileElements(events: DataFrame): DataFrame =
    events.select(
      expr("unix_micros(ts) div 86400000000").cast(StringType).as("d"),
      col("event_id"), col("value"))

  /** One distributed pass building the per-day bottom-k sketches. */
  def windowQuantileSketches(events: DataFrame): Map[Long, Array[Long]] = {
    val spark = events.sparkSession
    import spark.implicits._
    windowQuantileElements(events)
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .agg(new BottomKSample(windowQuantileK).toColumn.name("bk"))
      .collect().map { case (d, arr) => d.toLong -> arr }.toMap
  }

  def windowQuantile(events: DataFrame): DataFrame =
    windowQuantileWith(events, windowQuantileSketches(events))

  /** Rollup + audit from already-built per-day sketches (the shared
    * assembly the streaming accumulation reuses verbatim — merged
    * day sketches are bit-identical by set determinism).
    */
  def windowQuantileWith(
      events: DataFrame, byDay: Map[Long, Array[Long]]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val k = windowQuantileK
    val bk = new BottomKSample(k)
    val days = byDay.keys.toSeq.sorted
    val qs = Seq(0.5, 0.9)
    // driver rollup: merge ≤7 day sketches per window, read off quantiles
    val est = days.flatMap { w =>
      val merged = days.filter(d => d >= w - 6 && d <= w)
        .map(byDay).reduce(bk.merge)
      val m = merged.length / 3
      val sample = (0 until m).map(i =>
        (java.lang.Double.longBitsToDouble(merged(3 * i + 2)),
          merged(3 * i + 1)))
        .sortBy { case (v, id) => (v, id) }
      qs.map { q =>
        val r = math.ceil(q * m).toLong
        (w, q, sample((r - 1).toInt)._1)
      }
    }.toDF("day", "q", "est")
    // exact audit, distributed — PRE-AGGREGATED (r11 VERDICT #6, guide
    // §1.2/§2.3 "aggregate before you shuffle"): the former shape exploded
    // every EVENT to its ≤7 windows and scanned that 7×|events| frame
    // TWICE (count stage + rank stage), i.e. two full events scans + two
    // event-scale shuffles. Value cardinality is corpus-bounded (the same
    // fact the count-based order statistic below already relies on), so
    // aggregate (day, value) → count FIRST — one map-combined pass over
    // the events scan — and explode only the ~10³×-smaller count frame.
    // est/exact_q/rank_err are bit-identical: summing day-counts over the
    // window is the same integer as counting exploded rows.
    val el = events.select(
      expr("unix_micros(ts) div 86400000000").as("d0"), col("value"))
    // one localCheckpoint/scratch materialization: pre feeds the day spine,
    // the window explode AND the rank stage (3 consumers — the genuinely-
    // multi-consumer bar); rowsHint |events|/50 is conservative vs the
    // measured ~10³× cardinality drop
    val nEvents = events.count()
    val preM = graft.util.Fs.materializeTracked(
      el.groupBy(col("d0"), col("value")).agg(count(lit(1)).as("c0")),
      nEvents / 50L)
    val pre = preM.df
    // audit shuffle width self-sized from the MEASURED pre-agg cardinality
    // (cheap count on the materialized frame), not the raw event count —
    // the exploded frame is 7×|pre| rows now, and an events-derived width
    // would over-partition it ~10³× at the big decades
    val parts = math.max(32L, pre.count() * 7L / 2000000L).toInt
    val daysDf = pre.select(col("d0").as("w")).distinct()
    import org.apache.spark.sql.expressions.{Window => W}
    // exact order statistic from per-(window, value) COUNTS, not a row-level
    // sort: the row_number formulation buffers an entire (w, q) partition
    // (the full 7-day exploded stream) in one window sort — ~7×10⁸ rows at
    // the 1000× decade across a handful of partitions, which exhausted the
    // execution pool (r7). The value whose cumulative range
    // [cum−c+1, cum] contains rank ceil(q·n) is BY CONSTRUCTION the same
    // value row_number() would have landed on (ties in `value` collapse to
    // one count row), so est/exact_q/rank_err are bit-identical.
    val cnt = pre
      .select(explode(sequence(col("d0"), col("d0") + 6)).as("w"),
        col("value"), col("c0"))
      .join(daysDf, Seq("w"), "left_semi")
      .repartition(parts, col("w"))
      .groupBy(col("w"), col("value")).agg(sum(col("c0")).as("c"))
      .localCheckpoint() // cum/exact AND rank consume cnt — compute once
    val cum = cnt
      .withColumn("cum", sum(col("c")).over(
        W.partitionBy(col("w")).orderBy(col("value"))))
      .withColumn("n", sum(col("c")).over(W.partitionBy(col("w"))))
    val exact = cum.crossJoin(broadcast(Seq(0.5, 0.9).toDF("q")))
      .withColumn("r", ceil(col("q") * col("n")).cast(LongType))
      .where(col("cum") - col("c") < col("r") && col("r") <= col("cum"))
      .select(col("w"), col("q"), col("value").as("exact_q"), col("n"))
    // est's rank from the SAME count frame: Σ c over values ≤ est is the
    // identical integer to counting exploded event rows ≤ est (est is a
    // sampled window value, so ≥1 count row always matches — the coalesce
    // is belt-and-braces for an empty-frame edge)
    val rank = cnt.join(broadcast(est), col("w") === col("day"))
      .groupBy(col("day"), col("q"), col("est"))
      .agg(coalesce(sum(when(col("value") <= col("est"), col("c"))), lit(0L))
        .as("est_rank"))
    val out = rank
      .join(exact, rank("day") === exact("w") && rank("q") === exact("q"))
      .select(col("day"), rank("q"), col("n").as("n_exact"),
        col("est"), col("exact_q"),
        abs(col("est_rank").cast(DoubleType) / col("n").cast(DoubleType)
          - rank("q")).as("rank_err"))
      .withColumn("sketch_ok", col("rank_err") <= 0.1)
      .orderBy(col("day"), rank("q"))
    preM.free()
    out
  }
}
