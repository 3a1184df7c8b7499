package graft.ops

/** Holt's linear-trend smoothing (level + trend double exponential
  * smoothing, Holt 1957) with α = β = 1/2, made ORACLE-EXACT by closed-form
  * integer coefficients: the recurrence
  *
  *   l_t = (y_t + l_{t-1} + b_{t-1}) / 2
  *   b_t = (l_t − l_{t-1} + b_{t-1}) / 2,   l_1 = y_1, b_1 = 0
  *
  * is LINEAR in the inputs, so over a window of length n both states are
  * exact rational dot products  l_n = (L·y)/4ⁿ  and  b_n = (B·y)/4ⁿ  with
  * INTEGER coefficient vectors L, B derived once at class-init by a BigInt
  * recurrence (α = β = 1/2 keeps every denominator a power of four). The
  * engines then share the same exact-real-arithmetic route as window_ewma:
  * integer numerator fold → ONE correctly-rounded string→double parse →
  * ONE division by the exactly-representable 4ⁿ·10⁴ — nothing else rounds,
  * so Spark and DuckDB land on bit-identical doubles.
  *
  * Scaled recurrence (denominator 4ᵗ): L_t = 2·(L_{t-1}+B_{t-1}) ⧺ 2^{2t−1},
  * B_t = (L_t − 4·L_{t-1} + 4·B_{t-1})/2 — divisibility holds because every
  * term is even (checked at generation). Σ L_t = 4ᵗ (level is an affine
  * combination with unit weight sum) and Σ B_t = 0; max |coef| at W=16 is
  * ~10¹¹, so a coef and a 10⁻⁴-fixed-point daily total multiply inside
  * DECIMAL(38,0)/HUGEINT with ~10¹⁴ headroom.
  */
object HoltTrend {

  /** Window cap (matches the EWMA family's bounded-window discipline). */
  val W = 16

  /** coefs(n-1) = (L, B) for window length n: level = L·y/4ⁿ, trend = B·y/4ⁿ. */
  lazy val coefs: Vector[(Vector[Long], Vector[Long])] = {
    var L = Vector(BigInt(4))
    var B = Vector(BigInt(0))
    val out = Vector.newBuilder[(Vector[Long], Vector[Long])]
    def emit(): Unit = {
      require(L.sum == BigInt(4).pow(L.length), "level weights must sum to 4^t")
      require(B.sum == 0, "trend weights must sum to 0")
      require((L ++ B).forall(_.abs <= BigInt(Long.MaxValue) / 1000000L),
        "coefficient outside the exact-product headroom")
      out += ((L.map(_.toLong), B.map(_.toLong)))
    }
    emit()
    for (t <- 2 to W) {
      val newL = L.lazyZip(B).map((a, b) => 2 * (a + b)) :+ (BigInt(1) << (2 * t - 1))
      val l4 = L.map(_ * 4) :+ BigInt(0)
      val b4 = B.map(_ * 4) :+ BigInt(0)
      val newB = newL.lazyZip(l4).lazyZip(b4).map { (a, lb, bb) =>
        val num = a - lb + bb
        require(num.testBit(0) == false, s"odd trend numerator at t=$t")
        num / 2
      }
      L = newL
      B = newB
      emit()
    }
    out.result()
  }

  /** The SQL literal for one coefficient table: [[4],[8,8],...]. */
  def sqlTable(side: ((Vector[Long], Vector[Long])) => Vector[Long]): String =
    coefs.map(c => side(c).mkString("[", ",", "]")).mkString("[", ",", "]")
}
