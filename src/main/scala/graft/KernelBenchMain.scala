package graft

/** Standalone runner for the kernel microbenchmarks (no Spark session) —
  * quick feedback while tuning graft.disagg.Kernels without paying the full
  * Bench query sweep.
  */
object KernelBenchMain {
  def main(args: Array[String]): Unit =
    KernelBench.run().toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"$k%-42s $v%10.3f ms")
    }
}
