package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets Catalyst prune every computed
      // column that no aggregate references, under-measuring projection-heavy
      // queries — the noop writer materializes every output column
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // driver-side kernel microbenchmarks at the reference's own problem
    // sizes — directly comparable to the BASELINE.md rows
    val kernels = try KernelBench.run().map { case (k, v) => s"\"$k\":$v" }
      .mkString("{", ",", "}") catch { case _: Throwable => "{}" }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"kernels_ms":$kernels,"sf":"$sfDir"}""")
    spark.stop()
  }
}
