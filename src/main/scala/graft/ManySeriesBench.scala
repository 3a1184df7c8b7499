package graft

import org.apache.spark.sql.SparkSession

/** Many-series throughput at an arbitrary series count:
  * `runMain graft.ManySeriesBench <nSeries> [nSeries...]` — the decade
  * ladder of the SURVEY §6 claim (N independent yearly series
  * disaggregated to quarterly inside cogroup tasks, one shuffle). Bench
  * pins the 10⁴/10⁵/10⁶ rungs every round; this main exists for one-off
  * higher rungs (10⁷ = the fourth decade) without inflating Bench's
  * per-round runtime.
  */
object ManySeriesBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ns = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1000000)
    ns.foreach { n =>
      val sec = Bench.manySeriesSec(spark, n)
      println(f"MANYSERIES n=$n%-9d sec=$sec%.3f")
    }
    spark.stop()
  }
}
