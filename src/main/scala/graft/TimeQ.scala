package graft

import org.apache.spark.sql.SparkSession

/** Time selected queries in isolation (steady-state: 2 runs, report both):
  * `SPARK_GRAFT_SF_DIR=... runMain graft.TimeQ name [name...]`.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { n =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $n%-30s cold=${times(0)}%.3f warm=${times(1)}%.3f")
    }
    spark.stop()
  }
}
