package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main for the connected-components paths at OVER-CAP scale
  * (r9 VERDICT #2): the driver union-find fast path carries every corpus
  * decade because contracted dup-pair graphs stay small, which left the
  * distributed large-star/small-star valve — the path a 10⁹-doc corpus
  * takes — with spec coverage but no scale measurement. This generates a
  * deterministic dup-shaped graph (no RNG: star clusters of 5 nodes — the
  * near-clique shape of real dup clusters — plus one 100k-node chain for
  * adversarial diameter) and times `Dedup.connectedComponents` at a chosen
  * cap.
  *
  * Usage: `runMain graft.CcScale [nEdges] [driverEdgeCap] [chainLen]`
  *   nEdges default 20e6 (4× the 5M cap), cap default 0 (forces the
  *   distributed loop); pass a cap ≥ nEdges to time the driver fast path
  *   on the same graph where it fits. chainLen (default 1000) sets the
  *   diameter component: rounds grow ~log2(chainLen) — the per-ROUND cost
  *   scales with edges, the round COUNT with diameter, and a real dup
  *   graph sits at diameter 2-3 (near-cliques), so the default keeps the
  *   measurement representative while still exercising multi-round
  *   convergence.
  */
object CcScale {
  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.flatMap(_.toLongOption).getOrElse(20000000L)
    val cap = args.lift(1).flatMap(_.toLongOption).getOrElse(0L)
    val chainArg = args.lift(2).flatMap(_.toLongOption).getOrElse(1000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val chain = chainArg
    // stars: edge i links node (i div 4)*5 + 1 + (i mod 4) -> (i div 4)*5
    val stars = spark.range(nEdges - chain).select(
      (expr("(id div 4) * 5") + 1 + pmod(col("id"), lit(4L))).as("doc_a"),
      expr("(id div 4) * 5").as("doc_b"))
    // one long chain on negative ids: -(k+1) -> -(k+2)
    val chainE = spark.range(chain).select(
      (-col("id") - 1).as("doc_a"), (-col("id") - 2).as("doc_b"))
    val edges = stars.unionAll(chainE)
    // the graph is deterministic, so its census is too — a timing row from
    // a run that got the labels WRONG is worse than no row (the
    // self-enforcing-diagnostic discipline): stars form ceil(E/4) clusters
    // (a trailing partial group is still one component), the chain adds 1
    val expComponents = (nEdges - chain + 3) / 4 + 1
    val expNodes = {
      val full = (nEdges - chain) / 4
      val rem = (nEdges - chain) % 4
      full * 5 + (if (rem > 0) rem + 1 else 0) + chain + 1
    }
    val runs = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      val labels = graft.ops.Dedup.connectedComponents(
        edges, driverEdgeCap = cap)
      val r = labels.agg(count(lit(1)), countDistinct(col("cluster_id")))
        .head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CCSCALE edges=$nEdges cap=$cap nodes=${r.getLong(0)} " +
        f"components=${r.getLong(1)} sec=$sec%.3f")
      require(r.getLong(0) == expNodes && r.getLong(1) == expComponents,
        s"census mismatch: got (${r.getLong(0)}, ${r.getLong(1)}), " +
          s"expected ($expNodes, $expComponents) — labels are wrong, " +
          "do not record this timing")
      sec
    }
    println(f"CCSCALE MIN edges=$nEdges cap=$cap sec=${runs.min}%.3f")
    spark.stop()
  }
}
