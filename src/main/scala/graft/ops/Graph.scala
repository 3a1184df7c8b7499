package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact iterative graph centrality (the generalized form of the
  * `graph_pagerank` query loop — r5 VERDICT asked for the demo-shaped
  * fixed-3-iteration loop to grow operator-grade options without touching
  * the oracle-replayed arithmetic).
  *
  * PageRank (Brin & Page, WWW'98) in scaled-LONG arithmetic: ranks carry
  * a 1e-9 fixed point (init = [[Base]] per node), per-edge contribution is
  * `r div outdeg`, and the damped update is
  * `(100−d)·1e7 + (d·inflow) div 100` — every step an exact nonnegative
  * integer division, identical under Spark's `div` and DuckDB's `//`, so a
  * fixed-iteration run hash-replays in SQL with no epsilon (the discipline
  * of the IVF k-means replay, ops/Similarity.scala). Σranks ≤ n·1e9 keeps
  * `d·Σ` far under 2⁶³ for n ≤ 10⁸ nodes — no ANSI overflow.
  *
  * Options beyond the replayed default:
  *
  *  - **Dangling-node mass redistribution** (`handleDangling = true`):
  *    nodes with no out-edges would otherwise leak their rank each round.
  *    Their mass joins a pool together with every node's indivisible
  *    out-division residue (`r mod outdeg` — integer division's analogue
  *    of float PageRank's rounding dust); the pool pays `pool div n` to
  *    every node and the final `pool mod n` to the smallest node id. The
  *    redistribution step therefore conserves total mass EXACTLY
  *    (Σ inflow == Σ rank, a `==` test, not a tolerance), and the damped
  *    update loses strictly less than one 1e-9 ulp per node to its final
  *    floor — the bound OpsSpec pins per iteration.
  *  - **Convergence termination** (`tolRaw > 0`): stop when
  *    max |r′ − r| ≤ tolRaw (exact integer compare, one node-sized agg
  *    action per round), instead of always running `maxIter` rounds.
  *
  * Scale shape: edges hash-partitioned by src and materialized once
  * ([[graft.util.Fs.materialize]] — scratch parquet past the footer-count
  * threshold, localCheckpoint below it; raw localCheckpoint of a 10⁸-edge
  * frame is the memory-pinned OOM class the 1000× decade exposed). Per
  * round one edge⋈rank equi-join (edge side co-located, only the
  * node-sized rank frame moves) + one map-combined sum by dst — 2
  * edge-sized shuffles, the CC-loop discipline (ops/Dedup.scala). The
  * damped update left-joins contrib against the once-materialized
  * `(node, outdeg)` frame, so `ranks` is referenced exactly ONCE per
  * round: with both knobs off there are no mid-loop actions and the whole
  * fixed-iteration run is ONE lazy plan (no per-round eager job — the
  * r5→r6 +49% regression was four eager checkpoint jobs per query), with
  * a lineage-bounding materialize every [[LineageEvery]] rounds for deep
  * loops. The knobs introduce one action per round (dangling pool agg /
  * convergence delta agg), so with either on, each round's ranks IS
  * materialized — otherwise round k's action would recompute rounds 1..k.
  * Dangling handling's O(n) aggregate sends 3 longs to the driver — the
  * sanctioned scalar-collect pattern; its pool share enters the plan as a
  * literal, so nothing node-sized crosses the driver.
  */
object Graph {
  /** Rank fixed-point base: 1.0 == 1e9 raw. */
  val Base = 1000000000L

  /** Lazy fixed-iteration runs materialize ranks every this-many rounds to
    * bound plan/lineage depth (each round adds 2 joins + 1 agg to the tree;
    * 8 rounds ≈ a 24-operator spine, well inside Catalyst's comfort zone).
    */
  val LineageEvery = 8

  /** @param edges  (src, dst) long-keyed directed edges
    * @param damping damping factor in percent (default 85 = 0.85)
    * @param maxIter iteration cap
    * @param handleDangling redistribute dangling + residue mass exactly
    * @param tolRaw  >0: stop once max |Δr| ≤ tolRaw (raw 1e-9 units)
    * @param rowsHint approximate edge count (a parquet footer count the
    *                 caller already has): past Fs.materialize's threshold,
    *                 the edge frame and any materialized rank frames go to
    *                 scratch parquet instead of localCheckpoint
    * @param nodeRowsHint approximate NODE count for the node-sized frames
    *                 (nd and per-round rank materializations); default −1
    *                 derives rowsHint/8 (a conservative avg-degree floor),
    *                 so small node sets keep the cheap localCheckpoint path
    *                 even when the edge set is past the bucketed-table
    *                 threshold (r7 ADVICE: reusing the edge hint paid a
    *                 bucketed parquet write per round for a frame orders of
    *                 magnitude smaller than the edges)
    * @param finalizeAndFree materialize the FINAL ranks (node-scale, one
    *                 eager job — the consumer would have executed the same
    *                 single plan anyway) and free the EDGE-scale e/nd
    *                 scratch before returning. Without it the returned lazy
    *                 plan references e and nd, so their scratch — 2·|edges|
    *                 rows, the dominant footprint at decade 3–4 — lives
    *                 until JVM exit and every extra consumer action re-runs
    *                 the whole loop. The r7 no-eager-jobs discipline is
    *                 untouched: this is one job at the END covering all
    *                 rounds, not a job per round.
    * @return (node, outdeg, r, iters) — r is the raw scaled rank, iters the
    *         literal number of rounds actually run (lets tests observe
    *         convergence-based termination; query projections drop it)
    */
  def pageRank(
      edges: DataFrame,
      damping: Int = 85,
      maxIter: Int = 3,
      handleDangling: Boolean = false,
      tolRaw: Long = 0L,
      parts: Int = 32,
      rowsHint: Long = 0L,
      nodeRowsHint: Long = -1L,
      finalizeAndFree: Boolean = false): DataFrame = {
    require(damping >= 1 && damping <= 99, "damping is an integer percent in [1, 99]")
    require(maxIter >= 1, "at least one iteration")
    import graft.util.Fs
    val nHint = if (nodeRowsHint >= 0L) nodeRowsHint else rowsHint / 8L
    val eH = Fs.materializeTrackedKeyed(edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")),
      parts, Seq("src"), rowsHint)
    val e = eH.df
    // node universe with out-degrees, materialized ONCE — every round's
    // damped update left-joins contrib against THIS frame (not against the
    // previous ranks), so the previous ranks frame is referenced exactly
    // once per round and the fixed-iteration path stays a single lazy plan.
    // ONE union-aggregate pass (r12, guide §1.2): the former
    // distinct(src ∪ dst) + groupBy(src) + left-join shape scanned the
    // edge frame three times (nodes-distinct 2×, deg 1×) and paid a
    // node-scale join — outdeg is just the count of src-side occurrences,
    // so summing a 1/0 endpoint flag in a single map-combined aggregation
    // produces the identical (node, outdeg) rows in two edge scans and no
    // join (measured: −12 s of task CPU at sf0.1 on the two derivation
    // stages).
    val ndH = Fs.materializeTrackedKeyed(
      e.select(col("src").as("node"), lit(1L).as("o"))
        .unionAll(e.select(col("dst").as("node"), lit(0L).as("o")))
        .groupBy("node").agg(sum(col("o")).as("outdeg")),
      parts, Seq("node"), nHint)
    val nd = ndH.df
    // each knob adds a driver ACTION per round (pool agg / delta agg) that
    // would otherwise recompute the whole lineage — only then pay the
    // per-round materialization the default path deliberately avoids
    val eager = handleDangling || tolRaw > 0L
    var ranks = nd.select(col("node"), col("outdeg"), lit(Base).as("r"))
    var prevMat: Option[Fs.Materialized] = None
    def setRanks(df: DataFrame, force: Boolean): Unit =
      if (force) {
        val m = Fs.materializeTrackedKeyed(df, parts, Seq("node"), nHint)
        // the new frame is fully written — round k−1's scratch copy is no
        // longer an input to anything; free it now instead of at JVM exit
        prevMat.foreach(_.free())
        prevMat = Some(m)
        ranks = m.df
      } else ranks = df
    if (eager) setRanks(ranks, force = true)
    // (100−d)·1e7 is exact for every integer percent — Base div 100 == 1e7
    val teleport = (100L - damping) * (Base / 100L)
    var it = 0
    var done = false
    while (it < maxIter && !done) {
      // contrib joins only rank rows that ARE sources (e.src ⊆ outdeg ≥ 1),
      // so `r div outdeg` can never divide by zero under ANSI.
      // The explicit repartition pins the aggregation exchange at `parts`
      // (REPARTITION_BY_NUM — AQE may not coalesce it): left to
      // ENSURE_REQUIREMENTS, AQE coalesced this exchange by its compressed
      // bytes (~2 MB → 8-10 tasks at sf0.1), and the SHRUNK partitioning
      // then mismatched the 32-way materialized e/nd frames, so every
      // round RE-SHUFFLED the edge frame to match (StageProfile: per-round
      // n=8-10 stages re-reading ~10 MB of shuffle that the keyed
      // materialization exists to avoid). groupBy adds no further exchange
      // (HashPartitioning(dst) satisfies its clustering), and downstream
      // joins stay co-partitioned with nd — the CLAUDE.md iterative-loop
      // shuffle rule, now applied at EVERY scale, not only when widening.
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .repartition(parts, col("dst"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      val inflow = nd.join(contrib, nd("node") === contrib("dst"), "left")
        .select(nd("node"), nd("outdeg"), coalesce(col("s"), lit(0L)).as("s"))
      val m =
        if (!handleDangling)
          inflow.select(col("node"), col("outdeg"), col("s").as("m"))
        else {
          // CaseWhen short-circuits, so `r % outdeg` never sees outdeg == 0
          val p = ranks.agg(
            coalesce(sum(when(col("outdeg") === 0L, col("r"))
              .otherwise(col("r") % col("outdeg"))), lit(0L)),
            count(lit(1)), min(col("node"))).head()
          val (pool, n, minNode) = (p.getLong(0), p.getLong(1), p.getLong(2))
          val sigma = pool / n
          val extra = pool % n
          inflow.select(col("node"), col("outdeg"),
            (col("s") + lit(sigma) +
              when(col("node") === minNode, lit(extra)).otherwise(lit(0L))).as("m"))
        }
      val next = m.select(col("node"), col("outdeg"),
        (lit(teleport) + expr(s"($damping * m) div 100")).as("r"))
      if (tolRaw > 0L) {
        val nextMat = Fs.materializeTrackedKeyed(next, parts,
          Seq("node"), nHint)
        val maxDelta = nextMat.df.select(col("node"), col("r").as("rn"))
          .join(ranks.select(col("node"), col("r").as("ro")), "node")
          .agg(max(abs(col("rn") - col("ro")))).head().getLong(0)
        done = maxDelta <= tolRaw
        prevMat.foreach(_.free())
        prevMat = Some(nextMat)
        ranks = nextMat.df
      } else
        setRanks(next, force = eager || (it + 1) % LineageEvery == 0)
      it += 1
    }
    val out = ranks.withColumn("iters", lit(it.toLong))
    if (!finalizeAndFree) out
    else {
      // one eager node-scale materialization of the final ranks, then free
      // the edge-scale scratch (e is 2·|edges| rows — the decade-3/4
      // footprint; the final frame is node-scale, orders of magnitude
      // smaller). The write executes the loop's single lazy plan exactly
      // once; every consumer action then reads the materialized frame
      // instead of re-running the loop. UNKEYED: the loop is over — no
      // downstream op joins on node, so a keyed bucketed layout would pay
      // a parts-wide exchange (512-way at the 1000× decade) for nothing;
      // the frame is written AS PRODUCED.
      val finH = Fs.materializeTracked(out, nHint)
      prevMat.foreach(_.free())
      ndH.free()
      eH.free()
      finH.df
    }
  }

  /** Synchronous min-label propagation over an undirected graph — the
    * community-seeding pass of large-scale graph clustering (Raghavan et
    * al., Phys. Rev. E 76, 2007, reduced to the deterministic min-rule so
    * a FIXED number of rounds hash-replays in unrolled SQL; the random
    * tie-breaking of the original is exactly what an oracle cannot pin).
    * After k rounds every node holds the minimum node id within k hops —
    * so rounds bound the propagation radius, and communities are
    * "k-hop min-id basins", a deterministic, replayable community notion.
    * Differs from connectedComponents (ops/Dedup.scala): CC iterates to a
    * FIXPOINT with star contractions (O(log²n) rounds, labels = true
    * components); this is the bounded-round, bounded-radius member the
    * label-prop family uses when one pass over a trillion-edge graph per
    * round is the budget.
    *
    * Scale shape (r9 VERDICT #6 — the round-overhead finding, third
    * occurrence): the raw update references the previous label frame THREE
    * times (two directed message joins + the node's own label), which
    * forced an eager materialization per round — 5 eager jobs per query,
    * pure fixed overhead on a bounded-round operator. Folding the node's
    * own label into a SELF-LOOPED SYMMETRIC adjacency frame S = E ∪ Eᵀ ∪
    * {(x,x)} makes the update `min over S-neighbors of lab` reference the
    * previous frame exactly ONCE per round (the iterative-loop
    * discipline): a fixed-round run is ONE lazy plan — S materialized once,
    * bucketed on the join key, one edge⋈label equi-join (edge side read in
    * place, only the node-sized label frame moves) + one map-combined min
    * per round, a lineage-bounding materialization every [[LineageEvery]]
    * rounds, and one final node-scale write that frees the edge-scale
    * scratch (the pageRank finalize shape).
    */
  /** @param rowsHint approximate edge count (a parquet footer count the
    *                  caller already has): past Fs.materialize's threshold,
    *                  loop intermediates go to scratch parquet instead of
    *                  localCheckpoint — memory-backed checkpoint blocks of
    *                  a 10⁸-edge graph pin storage against execution and
    *                  OOM (the 1000×-decade lesson)
    */
  def labelPropagation(edges: DataFrame, rounds: Int = 3,
      parts: Int = 32, rowsHint: Long = 0L, nodeRowsHint: Long = -1L): DataFrame = {
    require(rounds >= 1, "at least one round")
    import graft.util.Fs
    // node-sized frames take the node hint (default rowsHint/8 — see
    // pageRank's nodeRowsHint doc): per-round label frames are node-scale
    // and should keep the cheap localCheckpoint path at big edge scales
    val nHint = if (nodeRowsHint >= 0L) nodeRowsHint else rowsHint / 8L
    val el = edges
      .select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
    val nodes = el.select(col("u").as("node"))
      .unionAll(el.select(col("v").as("node"))).distinct()
    // self-looped symmetric adjacency, materialized ONCE and bucketed on
    // the round joins' key v: every round's edge side is read in place
    val sH = Fs.materializeTrackedKeyed(
      el.unionAll(el.select(col("v").as("u"), col("u").as("v")))
        .unionAll(nodes.select(col("node").as("u"), col("node").as("v"))),
      parts, Seq("v"), rowsHint * 2L)
    val s = sH.df
    // initial labels come off the self-loop rows of the materialized S —
    // no second distinct over the edge list, and the frame appears exactly
    // once (innermost) in the unrolled lazy plan
    var labels = s.where(col("u") === col("v"))
      .select(col("u").as("node"), col("u").as("lab"))
    var mat: Option[Fs.Materialized] = None
    for (r <- 1 to rounds) {
      // the previous frame is referenced ONCE: the self-loop in S carries
      // the node's own label into the min, so no unionAll(labels, ...)
      val prev = labels.select(col("node").as("n"), col("lab"))
      // pin the min-agg exchange at `parts` (the pageRank contrib note:
      // AQE coalesced it to ~5 tasks by compressed bytes, which then
      // forced a per-round RE-SHUFFLE of the 32-way materialized S to
      // match — 5.5 MB of shuffle per round that the keyed materialize
      // exists to avoid); the groupBy reuses this partitioning, and the
      // next round's join is co-partitioned with S again
      val next = s.join(prev, col("v") === col("n"))
        .select(col("u"), col("lab"))
        .repartition(parts, col("u"))
        .groupBy(col("u")).agg(min(col("lab")).as("lab"))
        .select(col("u").as("node"), col("lab"))
      if (r % LineageEvery == 0 && r < rounds) {
        // deep loops only: bound lineage, free the superseded copy
        val m = Fs.materializeTrackedKeyed(next, parts, Seq("node"), nHint)
        mat.foreach(_.free())
        mat = Some(m)
        labels = m.df
      } else labels = next
    }
    // one eager node-scale job executes the whole fixed-round lazy plan,
    // then the edge-scale scratch is no longer an input to anything
    // (r7 VERDICT #8). UNKEYED: the loop is over, no downstream op joins
    // on node (the pageRank finalize shape).
    val finH = Fs.materializeTracked(labels, nHint)
    mat.foreach(_.free())
    sH.free()
    finH.df
  }
}
