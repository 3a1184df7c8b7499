package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

/** Trained document-quality scoring: the linear core of a
  * fastText/RoBERTa-style quality classifier (the CCNet / LLaMA-pipeline
  * "learned filter" stage), reduced to its distributed essence — a ridge
  * regression fit by ONE aggregation pass and applied as a zero-shuffle
  * projection.
  *
  * Model: predict each document's function-word (stopword) occurrence
  * count from two cheap surface features, x1 = whitespace-token count and
  * x2 = character count. Natural text has a stable function-word rate, so
  * documents whose OBSERVED count falls far below the model's prediction
  * (most-negative residual) are boilerplate/keyword-stuffed/low-quality —
  * the residual is the quality score. This is deliberately the smallest
  * member of the family: the same sufficient-statistics shape scales to
  * any fixed feature set (p features = one p²-column aggregate).
  *
  * Why it scales: training is a single map-side-combinable `agg` of NINE
  * integer sums (the normal-equation entries XᵀX, Xᵀy) — O(p²) driver
  * state, no per-row weights, no iterations, no shuffle of anything but
  * one partial-agg row per task. Scoring broadcasts the three β
  * coefficients as plan literals and runs at scan speed. At 100 TB both
  * stages stream; nothing is ever collected but the 9 sums.
  *
  * Why it is oracle-exact (the graft cross-engine discipline):
  *  - every sufficient statistic is an EXACT integer (Long products
  *    summed into DECIMAL(38,0) — ANSI-safe, overflow-free to ~10³⁸);
  *  - the 3×3 ridge solve runs in exact BigInt arithmetic via Cramer's
  *    rule (A = XᵀX + λI stays integer for integer λ);
  *  - each β is ONE division of two correctly-rounded doubles, both
  *    obtained by STRING-parsing the exact integer determinants — the
  *    same route DuckDB takes (`CAST(CAST(det AS VARCHAR) AS DOUBLE)`),
  *    so β, ŷ = β₀+β₁x₁+β₂x₂ (same left-associated expression text on
  *    both engines) and the residual are bit-identical.
  *
  * Streaming twin: the sufficient statistics are PURELY ADDITIVE, so a
  * micro-batched corpus folds per-batch Stats into a driver accumulator
  * and lands on the bit-identical model under ANY chunking — the
  * stream_count_min additivity argument applied to model TRAINING
  * (continuous quality-model refresh over an arriving corpus).
  */
object QualityModel {

  /** Function words whose per-doc occurrence count is the regression
    * target. A superset of [[TextOps.gopherStopwords]] so the target
    * varies over more of the corpus (max 14 occurrences at sf0.01).
    */
  val stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "be", "with", "that",
      "is", "in", "for", "on")

  /** Exact integer sufficient statistics of the ridge system: XᵀX and
    * Xᵀy for X = [1, x1, x2]. Additive — `|+|` is the streaming merge.
    */
  final case class Stats(
      n: BigInt, s1: BigInt, s2: BigInt,
      s11: BigInt, s12: BigInt, s22: BigInt,
      t0: BigInt, t1: BigInt, t2: BigInt) {
    def |+|(o: Stats): Stats = Stats(n + o.n, s1 + o.s1, s2 + o.s2,
      s11 + o.s11, s12 + o.s12, s22 + o.s22,
      t0 + o.t0, t1 + o.t1, t2 + o.t2)
  }
  object Stats { val zero: Stats = Stats(0, 0, 0, 0, 0, 0, 0, 0, 0) }

  /** Per-document integer features from (doc_id, text, n_chars):
    * x1 = whitespace-token count ([[Dedup.tokens]], the corpus-wide
    * tokenization every text_* query shares), x2 = character count
    * (the `n_chars` column — authoritative, not re-derived), y = total
    * stopword-token occurrences. Pure projection; the token array is
    * materialized before the HOF lambda (re-evaluation rule).
    */
  def features(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("n_chars"),
        Dedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast(LongType).as("x1"),
        col("n_chars").cast(LongType).as("x2"),
        size(filter(col("toks"), w => w.isin(stopwords: _*)))
          .cast(LongType).as("y"))

  /** ONE aggregation job → the nine exact normal-equation sums. Products
    * are Long (≤ ~10⁸ per row), sums are DECIMAL(38,0): exact and
    * ANSI-overflow-free to 10³⁸ (Σx2² at 10¹¹ docs ≈ 3·10¹⁶).
    */
  def sufficient(feats: DataFrame): Stats = {
    val d38 = DecimalType(38, 0)
    def s(c: Column) = sum(c.cast(d38))
    val r = feats.agg(
      count(lit(1)).cast(d38).as("n"),
      s(col("x1")).as("s1"), s(col("x2")).as("s2"),
      s(col("x1") * col("x1")).as("s11"),
      s(col("x1") * col("x2")).as("s12"),
      s(col("x2") * col("x2")).as("s22"),
      s(col("y")).as("t0"),
      s(col("x1") * col("y")).as("t1"),
      s(col("x2") * col("y")).as("t2")).head()
    def b(i: Int): BigInt =
      if (r.isNullAt(i)) BigInt(0)
      else BigInt(r.getDecimal(i).toBigInteger)
    Stats(b(0), b(1), b(2), b(3), b(4), b(5), b(6), b(7), b(8))
  }

  /** Exact-integer Cramer solve of (XᵀX + λI)β = Xᵀy. Determinants are
    * BigInt (DuckDB twin: HUGEINT — term magnitude ~10³⁵ at sf0.1, well
    * under 1.7·10³⁸; unbounded here, so the Spark side holds at any
    * corpus size); β_i = parse(det_i)/parse(det), the correctly-rounded
    * string route both engines share. λ ≥ 1 keeps the system nonsingular
    * on any corpus, including an empty or constant-feature one.
    */
  def solve(st: Stats, lambda: Long = 1L): (Double, Double, Double) = {
    val l = BigInt(lambda)
    val (a11, a12, a13) = (st.n + l, st.s1, st.s2)
    val (a21, a22, a23) = (st.s1, st.s11 + l, st.s12)
    val (a31, a32, a33) = (st.s2, st.s12, st.s22 + l)
    val det = a11 * (a22 * a33 - a23 * a32) -
      a12 * (a21 * a33 - a23 * a31) + a13 * (a21 * a32 - a22 * a31)
    val det0 = st.t0 * (a22 * a33 - a23 * a32) -
      a12 * (st.t1 * a33 - a23 * st.t2) + a13 * (st.t1 * a32 - a22 * st.t2)
    val det1 = a11 * (st.t1 * a33 - a23 * st.t2) -
      st.t0 * (a21 * a33 - a23 * a31) + a13 * (a21 * st.t2 - st.t1 * a31)
    val det2 = a11 * (a22 * st.t2 - st.t1 * a32) -
      a12 * (a21 * st.t2 - st.t1 * a31) + st.t0 * (a21 * a32 - a22 * a31)
    def dd(x: BigInt) = java.lang.Double.parseDouble(x.toString)
    val dv = dd(det)
    (dd(det0) / dv, dd(det1) / dv, dd(det2) / dv)
  }

  /** Score the corpus against broadcast-literal coefficients and keep the
    * `topN` lowest-residual (most stopword-deficient = lowest-quality)
    * documents. ŷ is the SAME left-associated expression as the oracle's
    * `b0 + b1*x1 + b2*x2`; the global top-N is a TakeOrderedAndProject,
    * not a full sort.
    */
  def score(feats: DataFrame, beta: (Double, Double, Double),
      topN: Int = 100): DataFrame = {
    val yhat = lit(beta._1) +
      lit(beta._2) * col("x1").cast(DoubleType) +
      lit(beta._3) * col("x2").cast(DoubleType)
    feats.select(col("doc_id"),
        col("x1").cast(IntegerType).as("n_words"),
        col("x2").cast(IntegerType).as("n_chars"),
        col("y").cast(IntegerType).as("n_stop"),
        lit(beta._1).as("b0"), lit(beta._2).as("b1"), lit(beta._3).as("b2"),
        yhat.as("yhat"),
        (col("y").cast(DoubleType) - yhat).as("resid"))
      .orderBy(col("resid").asc, col("doc_id").asc)
      .limit(topN)
  }

  /** End-to-end batch run: one agg job to train, one projection to score. */
  def ridgeQuality(docs: DataFrame, lambda: Long = 1L,
      topN: Int = 100): DataFrame = {
    val f = features(docs)
    score(f, solve(sufficient(f), lambda), topN)
  }
}
