package graft

import org.apache.spark.sql.SparkSession

/** Print physical plans for selected queries so shuffle/broadcast/codegen
  * shape can be audited by eye (`runMain graft.PlanAudit [names...]`).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // sf0.001 keeps the audit fast, but auto-broadcast fires everywhere at
    // that size — for a bench-faithful plan pass SPARK_GRAFT_SF_DIR=sf0.1
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("dedup_embedding_cosine", "cube_revenue", "window_topk_per_group")
    names.foreach { n =>
      println(s"\n=== $n ===")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
